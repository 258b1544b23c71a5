package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted join: result-equivalence with the plain join, and the hot key's
  * rows actually spread across salt buckets. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = spark.range(10000)
    .select($"id",
      // 90% of rows land on key 0 — the skew
      when(pmod($"id", lit(10)) === 0, pmod($"id", lit(5)) + 1).otherwise(lit(0L))
        .as("k"))
  private lazy val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
    (4L, "d"), (5L, "e")).toDF("k", "label")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, Seq("k")).select($"id", $"k", $"label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", saltBy = "id", salts = 8)
      .select($"id", $"k", $"label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("the hot key's rows spread across many salt buckets") {
    val spread = big
      .withColumn("__salt", pmod(hash($"id"), lit(8)))
      .filter($"k" === 0L)
      .select(countDistinct($"__salt"))
      .as[Long].head()
    assert(spread == 8L, s"hot key only reached $spread of 8 salt buckets")
  }
}
