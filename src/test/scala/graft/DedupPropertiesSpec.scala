package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.TextOps

/** ScalaCheck properties for the dedup operators, run over GENERATED
  * corpora (written as documents-schema parquet, the operators' real input
  * shape), not just the fixed test tables:
  *
  *  - exact dedup collapses every distinct text to exactly one group
  *  - a verbatim duplicate agrees on ALL MinHash bands (LSH recall = 1 for
  *    identical docs — band hashes are functions of the text alone)
  *  - SimHash is word-order independent (integer bit-sums commute), so a
  *    shuffled copy always lands in the duplicate report
  */
object DedupPropertiesSpec extends Properties("dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case runs Spark jobs; keep it tight

  private lazy val spark = SparkSpec.session

  private val word = Gen.oneOf(
    "table", "row", "scan", "merge", "sort", "hash", "join", "batch",
    "window", "stream", "key", "value", "part", "line", "order")

  /** ≥3 words so the 3-shingle pipeline keeps the doc. */
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Write a generated corpus in the documents schema; return its dir. */
  private def corpusDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-prop").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "gen", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  property("exact dedup: one group per distinct text, all copies counted") =
    Prop.forAll(Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen))) { texts =>
      val rows = TextOps.queries("q41_exact_dedup")(spark, corpusDir(texts)).collect()
      // q41 doubles the corpus verbatim, so EVERY distinct text must form
      // one group whose size is 2x its input multiplicity
      val mult = texts.groupBy(identity).view.mapValues(_.size).toMap
      rows.length == mult.size &&
        rows.map(_.getLong(1)).sum == 2L * texts.length &&
        rows.forall(_.getLong(1) >= 2)
    }

  property("LSH: a verbatim duplicate shares all bands with its source") =
    Prop.forAll(docGen, Gen.chooseNum(0, 3)) { (doc, position) =>
      // corpus: some background docs + the doc + its verbatim copy
      val background = Seq("scan merge sort hash join", "key value part line order")
      val texts = (background.take(position) :+ doc) ++
        background.drop(position) :+ doc
      val rows = TextOps.queries("q42_minhash_lsh")(spark, corpusDir(texts)).collect()
      val srcId = texts.indexOf(doc).toLong
      val dupId = texts.lastIndexOf(doc).toLong
      // identical text -> identical signature -> collision in all 3 bands
      rows.exists(r => r.getLong(0) == srcId && r.getLong(1) == dupId &&
        r.getLong(2) == 3L)
    }

  property("SimHash is word-order independent") =
    Prop.forAll(docGen) { doc =>
      val shuffled = doc.split(" ").reverse.mkString(" ")
      val texts = Seq(doc, shuffled, "scan merge sort hash join window table")
      val rows = TextOps.queries("q43_simhash")(spark, corpusDir(texts)).collect()
      // doc and its reversal share a signature -> some group holds both,
      // i.e. a group with first_doc = 0 and n_docs >= 2 exists
      rows.exists(r => r.getLong(2) == 0L && r.getLong(1) >= 2L)
    }
}
