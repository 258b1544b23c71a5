package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.services.MaintenanceService

/** Read-amplification measurement for append-fragmented tables (VERDICT
  * r6 #8 / r7 #2): a table ingested in micro-batches accretes one delta
  * snapshot per batch; every full scan unions the whole live chain, so
  * scan planning and I/O degrade as the chain grows until a maintenance
  * sweep compacts it. This harness MEASURES that curve instead of
  * asserting it: one table, `nBatches` appends, full-scan wall time
  * sampled at increasing chain lengths, then a
  * [[graft.services.MaintenanceService]] sweep and the same scan again.
  *
  * The scan is a full aggregate (count + sum through the noop-equivalent
  * collect of 1 row), so every file of every live snapshot is opened —
  * the read-amp signal is file/dir overhead, the quantity compaction
  * removes. Row count is constant throughout: time differences are
  * chain-shape only, never data-volume.
  *
  * Prints one JSON line; feeds the BENCH_NOTES read-amp table.
  *
  * Usage: runMain graft.ReadAmpBench [nBatches] [rowsPerBatch]
  */
object ReadAmpBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(50)
    val rowsPerBatch = args.lift(1).map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = s"/root/repo/target/readamp-${System.currentTimeMillis()}"
    val cat = new Catalog(spark, wh, "READAMP")
    val t = cat.table("bench", "ingested")

    def batch(i: Int) = spark.range(i * rowsPerBatch, (i + 1) * rowsPerBatch)
      .select($"id", (hash($"id") % 1000).as("k"),
        ($"id" % 97).cast("double").as("v"))

    // min-of-2 full scans: every live file opened, 1-row result
    def scanSec(): Double = {
      def once = time(t.read().agg(count(lit(1)), sum($"v")).collect())._2
      once; math.min(once, once) // first is warm-up, then min of 2
    }

    val samplePoints = Set(1, 5, 10, 25, nBatches)
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    t.createOrReplace(batch(0))
    if (samplePoints(1)) curve += ((1, scanSec()))
    (1 until nBatches).foreach { i =>
      t.append(batch(i))
      val chain = i + 1
      if (samplePoints(chain)) curve += ((chain, scanSec()))
    }
    val filesBefore = t.liveSnapshotDirs().size

    // the maintenance sweep: compact (chain > maxDeltas) + expire history
    val maint = new MaintenanceService(cat, maxDeltas = 4, keepSnapshots = 2)
    val ((compacted, expired), sweepSec) = time(maint.sweep())
    val afterSec = scanSec()
    val filesAfter = t.liveSnapshotDirs().size
    val rows = t.count()
    require(rows == nBatches * rowsPerBatch,
      s"sweep must not change row count: $rows vs ${nBatches * rowsPerBatch}")

    val curveJson = curve.map { case (c, s) =>
      s"""{"chain":$c,"scan_s":${math.round(s * 1000) / 1000.0}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"read_amp","curve":$curveJson,"sweep_s":${math.round(sweepSec * 1000) / 1000.0},""" +
      s""""compacted":$compacted,"expired":$expired,""" +
      s""""after_chain":$filesAfter,"after_scan_s":${math.round(afterSec * 1000) / 1000.0},""" +
      s""""dirs_before":$filesBefore,"rows":$rows,"rows_per_batch":$rowsPerBatch}""")

    val p = new org.apache.hadoop.fs.Path(wh)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
