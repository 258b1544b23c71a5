package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.warehouse.{ColRange, SnapshotTable}

/** ScalaCheck properties for metadata scan pruning: over GENERATED tables
  * (random values incl. negatives, NULLs, ties, and empty-range bounds)
  * and random inclusive range filters, the pruned read must NEVER lose a
  * matching row — `readPruned(f) ∘ residual ≡ read ∘ residual` — across
  * every stat kind the sidecar records (long, double, string, date) and
  * across multi-file layouts where some files straddle the bounds. The
  * false-positive direction (keeping an extra file) is allowed by the
  * contract; the false-negative direction is a silent-wrong-answer class,
  * which is exactly what a property test should hammer. */
object StatsPruningPropertiesSpec extends Properties("statsPruning") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case writes a table + runs jobs

  private lazy val spark = SparkSpec.session

  private val strPool = Seq("alpha", "beta", "delta", "kappa", "omega", "zeta")

  private val rowGen: Gen[(Long, Double, String, Int)] = for {
    l <- Gen.chooseNum(-100L, 100L)
    d <- Gen.chooseNum(-50.0, 50.0)
    s <- Gen.oneOf(strPool)
    day <- Gen.chooseNum(0, 400) // days from 2025-01-01
  } yield (l, d, s, day)

  private def writeTable(rows: Seq[(Long, Double, String, Int)], nFiles: Int): SnapshotTable = {
    import spark.implicits._
    val dir = Files.createTempDirectory("prune-prop").toString
    val df = rows.toDF("l", "d", "s", "day")
      .withColumn("dt", date_add(lit(java.sql.Date.valueOf("2025-01-01")), col("day")))
      .drop("day")
      // every third l is NULL so all-null and mixed-null chunks both occur
      .withColumn("l", when(col("l") % 3 === 0, lit(null)).otherwise(col("l")))
    val t = new SnapshotTable(spark, s"$dir/tbl")
    t.createOrReplace(df.repartition(nFiles), sortBy = Seq("l"))
    t
  }

  private case class Range1(col: String, lo: Option[Any], hi: Option[Any]) {
    def colRange: ColRange = ColRange(col, lo, hi)
  }

  private val rangeGen: Gen[Range1] = Gen.oneOf(
    for { a <- Gen.chooseNum(-120L, 120L); b <- Gen.chooseNum(-120L, 120L) }
      yield Range1("l", Some(math.min(a, b)), Some(math.max(a, b))),
    for { a <- Gen.chooseNum(-60.0, 60.0); b <- Gen.chooseNum(-60.0, 60.0) }
      yield Range1("d", Some(math.min(a, b)), Some(math.max(a, b))),
    for { a <- Gen.oneOf(strPool); b <- Gen.oneOf(strPool) }
      yield Range1("s", Some(if (a <= b) a else b), Some(if (a <= b) b else a)),
    for { a <- Gen.chooseNum(-30, 430); b <- Gen.chooseNum(-30, 430) }
      yield {
        val d0 = java.sql.Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(math.min(a, b)))
        val d1 = java.sql.Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(math.max(a, b)))
        Range1("dt", Some(d0), Some(d1))
      },
    Gen.chooseNum(-120L, 120L).map(a => Range1("l", Some(a), None)),
    Gen.chooseNum(-60.0, 60.0).map(a => Range1("d", None, Some(a))))

  private def residual(df: org.apache.spark.sql.DataFrame, r: Range1) = {
    val c = col(r.col)
    val lo = r.lo.map(v => c >= lit(v)).getOrElse(lit(true))
    val hi = r.hi.map(v => c <= lit(v)).getOrElse(lit(true))
    df.filter(lo && hi)
  }

  private def key(row: org.apache.spark.sql.Row): String =
    (0 until row.length).map(i => String.valueOf(row.get(i))).mkString("|")

  property("readPruned ≡ full read + filter (residual auto-applied, no lost rows)") =
    Prop.forAll(
      Gen.chooseNum(20, 120).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.chooseNum(2, 5),
      rangeGen) { (rows, nFiles, r) =>
      val t = writeTable(rows, nFiles)
      try {
        // NO manual residual on the pruned side: since VERDICT r6 #5 the
        // read itself carries it, so extra rows AND lost rows both fail
        val (pruned, plan) = t.readPruned(Seq(r.colRange))
        val got = pruned.collect().map(key).sorted.toSeq
        val want = residual(t.read(), r).collect().map(key).sorted.toSeq
        (got == want) :| s"filter=$r kept=${plan.filesKept}/${plan.filesTotal} " +
          s"got=${got.size} want=${want.size}"
      } finally t.drop()
    }

  property("IS NOT NULL scan: pruned read ≡ full read filter") =
    Prop.forAll(
      Gen.chooseNum(20, 80).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.chooseNum(2, 5)) { (rows, nFiles) =>
      val t = writeTable(rows, nFiles)
      try {
        val (pruned, plan) = t.readPruned(Seq(ColRange("l", notNull = true)))
        val got = pruned.collect().map(key).sorted.toSeq
        val want = t.read().filter(col("l").isNotNull).collect().map(key).sorted.toSeq
        (got == want) :| s"kept=${plan.filesKept}/${plan.filesTotal}"
      } finally t.drop()
    }

  property("readWhere over random OR predicates ≡ full read + filter") =
    Prop.forAll(
      Gen.chooseNum(20, 120).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.chooseNum(2, 5),
      Gen.chooseNum(2, 3).flatMap(k => Gen.listOfN(k, rangeGen))) { (rows, nFiles, rs) =>
      val t = writeTable(rows, nFiles)
      try {
        // the disjunction of the generated ranges as one predicate Column —
        // the per-disjunct planner must prune per alternative and the
        // ORIGINAL predicate applies as the residual (VERDICT r9 #2)
        def one(r: Range1) = {
          val c = col(r.col)
          (r.lo.map(v => c >= lit(v)).toSeq ++ r.hi.map(v => c <= lit(v)).toSeq)
            .reduceOption(_ && _).getOrElse(lit(true))
        }
        val cond = rs.map(one).reduce(_ || _)
        val (pruned, plan) = t.readWhere(cond)
        val got = pruned.collect().map(key).sorted.toSeq
        val want = t.read().filter(cond).collect().map(key).sorted.toSeq
        (got == want) :| s"filters=$rs kept=${plan.filesKept}/${plan.filesTotal} " +
          s"got=${got.size} want=${want.size}"
      } finally t.drop()
    }

  property("readPrunedAny residual is the OR of per-alternative ANDs") =
    Prop.forAll(
      Gen.chooseNum(20, 80).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.chooseNum(2, 4),
      Gen.chooseNum(2, 3).flatMap(k => Gen.listOfN(k, rangeGen))) { (rows, nFiles, rs) =>
      val t = writeTable(rows, nFiles)
      try {
        val (pruned, plan) = t.readPrunedAny(rs.map(r => Seq(r.colRange)))
        val got = pruned.collect().map(key).sorted.toSeq
        val want = rs.map(residual(t.read(), _).collect().map(key).toSeq)
          .reduce(_ ++ _).distinct.sorted
        // per-alternative residuals may overlap: compare as SETS (the OR
        // residual dedups rows matching several alternatives by identity —
        // a row appears once per source row, so multiset compare via the
        // full read)
        val wantMs = t.read().collect().map(key).toSeq
          .filter(want.contains).sorted
        (got == wantMs) :| s"alts=$rs kept=${plan.filesKept}/${plan.filesTotal}"
      } finally t.drop()
    }

  property("appended files prune independently of the base's bounds") =
    Prop.forAll(
      Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen), rangeGen) { (a, b, r) =>
      import spark.implicits._
      val t = writeTable(a, 2)
      try {
        t.append(b.toDF("l", "d", "s", "day")
          .withColumn("dt", date_add(lit(java.sql.Date.valueOf("2025-01-01")), col("day")))
          .drop("day")
          .withColumn("l", when(col("l") % 3 === 0, lit(null)).otherwise(col("l")))
          .repartition(2))
        val (pruned, _) = t.readPruned(Seq(r.colRange))
        val got = pruned.collect().map(key).sorted.toSeq
        val want = residual(t.read(), r).collect().map(key).sorted.toSeq
        (got == want) :| s"filter=$r"
      } finally t.drop()
    }
}
