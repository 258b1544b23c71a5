package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-amplification measurement for DELETE-SIDECAR-fragmented tables —
  * the minor-compaction twin of [[ReadAmpBench]] (VERDICT r10 #2): a MoR
  * delete trickle accretes one `del` sidecar per statement; every read
  * then plans and anti-joins the whole live sidecar set, so scan cost
  * degrades with STATEMENT COUNT (not data volume) until housekeeping
  * folds them. This harness measures that curve: one 8-file table, a
  * `nDels`-statement single-key trickle, full-scan wall time sampled at
  * increasing sidecar counts, then `compactDeletes` (zero data I/O) and
  * the same scan again, then a full `compact` for reference.
  *
  * The signal BENCH_NOTES wants: post-fold scan time back at the
  * near-zero-sidecar level while the fold itself moved only sidecar
  * bytes — read cost FLAT vs statement count once maintenance runs.
  *
  * Usage: runMain graft.DelAmpBench [nDels] [nRows]
  */
object DelAmpBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nDels = args.headOption.map(_.toInt).getOrElse(32)
    val nRows = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = s"/root/repo/target/delamp-${System.currentTimeMillis()}"
    val t = new graft.warehouse.SnapshotTable(spark, wh)
    t.createOrReplace(
      spark.range(nRows)
        .select($"id", (hash($"id") % 1000).as("k"),
          ($"id" % 97).cast("double").as("v"))
        .repartitionByRange(8, $"id"),
      sortBy = Seq("id"))

    def scanSec(): Double = {
      def once = time(t.read().agg(count(lit(1)), sum($"v")).collect())._2
      once; math.min(once, once) // warm-up, then min of 2
    }

    val samplePoints = Set(1, 8, 16, nDels)
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    (1 to nDels).foreach { i =>
      val (n, _) = t.deleteByKeys(Seq("id"), Seq(i.toLong * 13L).toDF("id"))
      require(n == 1L, s"statement $i must match one row")
      if (samplePoints(i)) curve += ((i, scanSec()))
    }
    val (merges, foldSec) = time(t.compactDeletes())
    val afterFoldSec = scanSec()
    val afterFoldBatches = t.pendingDeleteBatches()
    val (_, compactSec) = time(t.compact())
    val afterCompactSec = scanSec()
    val rows = t.count()
    require(rows == nRows - nDels, s"fold/compact must not change rows: $rows")

    val curveJson = curve.map { case (c, s) =>
      s"""{"sidecars":$c,"scan_s":${math.round(s * 1000) / 1000.0}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"del_amp","curve":$curveJson,""" +
      s""""fold_s":${math.round(foldSec * 1000) / 1000.0},"merges":${merges.size},""" +
      s""""after_fold_batches":$afterFoldBatches,""" +
      s""""after_fold_scan_s":${math.round(afterFoldSec * 1000) / 1000.0},""" +
      s""""compact_s":${math.round(compactSec * 1000) / 1000.0},""" +
      s""""after_compact_scan_s":${math.round(afterCompactSec * 1000) / 1000.0},""" +
      s""""rows":$rows}""")

    val p = new org.apache.hadoop.fs.Path(wh)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
