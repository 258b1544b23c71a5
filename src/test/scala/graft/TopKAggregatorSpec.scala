package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

/** Pure-logic tests for the partial top-k buffer (no Spark needed). */
class TopKAggregatorSpec extends AnyFunSuite {
  private val agg = new TopKAggregator(3)

  test("reduce keeps the k best by (score desc, id asc)") {
    val buf = Seq((0.9, 1L), (0.8, 2L), (0.7, 3L), (0.95, 4L), (0.7, 0L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq((0.95, 4L), (0.9, 1L), (0.8, 2L)))
  }

  test("merge of partial buffers equals reduce over the union") {
    val xs = Seq((0.5, 10L), (0.99, 11L), (0.75, 12L))
    val ys = Seq((0.85, 20L), (0.99, 9L), (0.1, 21L))
    val merged = agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce),
      ys.foldLeft(agg.zero)(agg.reduce))
    val direct = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    assert(merged == direct)
    // equal scores tie-break by ascending id
    assert(merged == Seq((0.99, 9L), (0.99, 11L), (0.85, 20L)))
  }

  test("buffers never exceed k") {
    val buf = (1 to 100).map(i => (i / 100.0, i.toLong)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
  }
}
