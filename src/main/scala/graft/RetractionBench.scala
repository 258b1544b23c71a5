package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.mv.MaterializedViewManager

/** Retraction-fold vs full-rebuild measurement for MV maintenance under
  * row-level DML (round 9): when a file-pruned DELETE lands on an MV's
  * base, the manager can either rebuild the aggregate from the whole base
  * or fold the CDC net changes as signed partials. This harness MEASURES
  * the gap instead of asserting it: one base table (range-partitioned
  * files, so the DELETE prunes to one file), two identical aggregate MVs
  * over it — one plain (takes the retraction path), one with min/max
  * partials (not retractable, forced to the full rebuild) — the same
  * one-file DELETE, one timed refresh each, results cross-checked against
  * a from-scratch recompute.
  *
  * The retraction cost is ∝ the changed files (CDC reads the replaced
  * file + the cow rewrite, the fold touches |keys| partials); the rebuild
  * cost is ∝ the base. The ratio therefore GROWS with base size — the
  * sf-style scale argument for retraction maintenance at 100 TB.
  *
  * Prints one JSON line; feeds the BENCH_NOTES retraction table.
  *
  * Usage: runMain graft.RetractionBench [nRows] [nFiles] [deleteRows]
  */
object RetractionBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = s"/root/repo/target/retrbench-${System.currentTimeMillis()}"
    val cat = new Catalog(spark, wh, "RETRBENCH")
    val mvm = new MaterializedViewManager(cat)
    // the bench MEASURES the retraction path (that measurement is where
    // the production crossover default comes from) — pin the policy to it
    mvm.retractionCrossoverRows = 0

    def base = spark.range(nRows)
      .select($"id", concat(lit("g"), pmod(hash($"id"), lit(20))).as("k"),
        ($"id" % 97).cast("double").as("amt"))
      .repartitionByRange(nFiles, $"id")

    // identical bases so neither refresh benefits from the other's cache
    val tR = cat.table("bench", "base_retr")
    tR.createOrReplace(base, sortBy = Seq("id"))
    val tF = cat.table("bench", "base_full")
    tF.createOrReplace(base, sortBy = Seq("id"))

    mvm.createAggMv("mv_retr", ("bench", "base_retr"), Seq("k"), Seq("amt"))
    // min/max partials force the non-retractable full-rebuild path on the
    // SAME refresh surface
    mvm.createAggMv("mv_full", ("bench", "base_full"), Seq("k"), Seq("amt"),
      minMaxCols = Seq("amt"))

    // the same FIXED-size DELETE on both bases: the change stays constant
    // while the base grows, which is the regime that separates the two
    // refresh costs (change ∝ vs base ∝)
    val cut = args.lift(2).map(_.toLong).getOrElse(10000L)
    val (delR, planR) = tR.deletePruned($"id" < lit(cut))
    val (delF, planF) = tF.deletePruned($"id" < lit(cut))
    require(delR == delF && planR.filesKept <= 2 && planF.filesKept <= 2,
      s"expected a one-file delete: $delR/$delF rows, " +
        s"${planR.filesKept}/${planR.filesTotal} and ${planF.filesKept}/${planF.filesTotal} files")

    val (modeR, secR) = time(mvm.refreshIncremental("mv_retr"))
    val (modeF, secF) = time(mvm.refreshIncremental("mv_full"))
    require(modeR == "retraction" && modeF == "full",
      s"expected retraction vs full, got $modeR vs $modeF")

    // both MVs must agree with a from-scratch recompute of their base
    def recompute(t: graft.warehouse.SnapshotTable) = t.read().groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"amt".cast("decimal(18,2)")).cast("decimal(18,2)").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    def mvState(n: String) = mvm.read(n)
      .select($"k", $"n_rows", $"sum_amt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    require(mvState("mv_retr") == recompute(tR), "retraction fold diverged")
    require(mvState("mv_full").map(x => (x._1, x._2)) ==
      recompute(tF).map(x => (x._1, x._2)), "full rebuild diverged")

    println(
      s"""{"metric":"mv_refresh_after_one_file_delete","rows":$nRows,"files":$nFiles,""" +
        s""""deleted_rows":$delR,"retraction_sec":${f"$secR%.3f"},""" +
        s""""full_rebuild_sec":${f"$secF%.3f"},""" +
        s""""speedup":${f"${secF / secR}%.2f"}}""")

    val p = new org.apache.hadoop.fs.Path(wh)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
