package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replication-copy throughput probe (r12 verdict #1): cycle time of
  * `refreshPhysical` vs delta size, distributed-job path vs the forced
  * driver-sequential path — the evidence row for BENCH_NOTES that the
  * delta copy no longer serializes through one driver thread.
  *
  * Run: `sbt "runMain graft.CopyBench [rowsPerAppend] [nAppends]"`.
  * Each cycle replicates ONE fresh append of `rowsPerAppend` rows
  * written as 16 part files; the same delta is copied twice into two
  * secondaries — once with the distributed job (`copyJobThreshold` = 8,
  * the default) and once with the job disabled (threshold = MaxValue,
  * the pre-r13 driver loop) — and the per-cycle wall times print side
  * by side. */
object CopyBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val rowsPerAppend = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nAppends = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/root/repo/target/copybench"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    val pri = new graft.catalog.Catalog(spark, s"$base/pri", "pri")
    val secJob = new graft.catalog.Catalog(spark, s"$base/secj", "secj")
    val secDrv = new graft.catalog.Catalog(spark, s"$base/secd", "secd")
    pri.createSchema("cb")
    val t = pri.table("cb", "payload")

    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + rowsPerAppend).toDF("id")
        .withColumn("pad", md5(col("id").cast("string")))
        .withColumn("pad2", sha2(col("id").cast("string"), 256))
        .repartition(16)

    t.createOrReplace(batch(0L))
    val distributed = new graft.bcdr.ReplicationService(pri, secJob)
    distributed.createGroup("core", Seq(("cb", "payload")), includeViews = false)
    val driverOnly = new graft.bcdr.ReplicationService(pri, secDrv,
      copyJobThreshold = Int.MaxValue)
    driverOnly.createGroup("core", Seq(("cb", "payload")), includeViews = false)

    println(f"[copybench] rowsPerAppend=$rowsPerAppend nAppends=$nAppends")
    val (_, bj) = time(distributed.refreshPhysical("core"))
    val (_, bd) = time(driverOnly.refreshPhysical("core"))
    val sz0 = fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$base/pri")).getLength
    println(f"[copybench] bootstrap ${sz0 / 1e6}%.0f MB: job $bj%.2f s, driver $bd%.2f s")
    (1 to nAppends).foreach { i =>
      t.append(batch(i * rowsPerAppend))
      val deltaBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(
        s"$base/pri/cb/payload/snap-${"%05d".format(t.currentSnapshotId.get)}")).getLength
      val (nj, tj) = time(distributed.refreshPhysical("core"))
      val (nd, td) = time(driverOnly.refreshPhysical("core"))
      require(nj == nd && nj == 3, s"both paths ship 3 entries: $nj/$nd")
      println(f"[copybench] cycle $i delta ${deltaBytes / 1e6}%.0f MB: " +
        f"job $tj%.2f s (${deltaBytes / 1e6 / tj}%.0f MB/s), " +
        f"driver $td%.2f s (${deltaBytes / 1e6 / td}%.0f MB/s)")
    }
    // both secondaries byte-identical to the primary
    require(secJob.table("cb", "payload").snapshots() == t.snapshots())
    require(secDrv.table("cb", "payload").snapshots() == t.snapshots())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.stop()
  }
}
