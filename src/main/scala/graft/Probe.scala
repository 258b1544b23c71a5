package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-probe: times plan fragments to attribute cost (scan vs
  * agg vs decimal math). Not part of the library surface; run with
  * `sbt "runMain graft.Probe"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Per-statement floor dissection: `runMain graft.Probe mor2` times the
    // pruned read alone, a bare 1-row parquet write, and the full delete
    // statement, so scan vs write-job vs commit-machinery attribute.
    if (args.headOption.contains("mor2")) {
      val wh = s"/root/repo/target/probe-mor2-${System.currentTimeMillis()}"
      val t = new graft.warehouse.SnapshotTable(spark, wh)
      val orders = Tables.load(spark, sfDir, "orders")
      t.createOrReplace(
        orders.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
          .repartitionByRange(8, $"o_orderkey"), sortBy = Seq("o_orderkey"))
      val keys = orders.select($"o_orderkey").where($"o_orderkey" % 3 === 1)
        .orderBy($"o_orderkey").limit(100).collect().map(_.getLong(0)).toSeq
      def loop(name: String, n: Int)(f: Int => Unit): Unit = {
        val t0 = System.nanoTime()
        (0 until n).foreach(f)
        println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter")
      }
      loop("pruned read noop", 20) { i =>
        noop(t.readWhere($"o_orderkey" === keys(i))._1)
      }
      val oneFile = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(wh)).map(_.getPath).filter(_.endsWith(".parquet")).sorted.head
      }
      loop("raw 1-file scan+filter noop", 20) { i =>
        noop(spark.read.parquet(oneFile).filter($"o_orderkey" === keys(i)))
      }
      val knownSchema = spark.read.parquet(oneFile).schema
      loop("schema'd 1-file scan+filter", 20) { i =>
        noop(spark.read.schema(knownSchema).parquet(oneFile)
          .filter($"o_orderkey" === keys(i)))
      }
      loop("planFiles only", 20) { i =>
        t.readWhere($"o_orderkey" === keys(i)); ()
      }
      loop("bare 1-row parquet write", 20) { i =>
        spark.range(1).coalesce(1).write.mode("overwrite").parquet(s"$wh-w/$i")
      }
      loop("pruned read -> parquet write", 20) { i =>
        t.readWhere($"o_orderkey" === keys(i))._1
          .write.mode("overwrite").parquet(s"$wh-rw/$i")
      }
      loop("full deleteByKeys", 40) { i =>
        t.deleteByKeys(Seq("o_orderkey"), Seq(keys(i)).toDF("o_orderkey")); ()
      }
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      for (p <- Seq(wh, wh + "-w", wh + "-rw"))
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
      spark.stop()
      return
    }

    // Fine-grained floor dissection at a REALISTIC chain length:
    // `runMain graft.Probe mor3` builds a 50-delete chain first, then
    // times each component of a delete statement separately — metadata
    // (currentSnapshotId), plan construction, scan+sidecar-anti-join
    // execution, collect vs spark-write of the matched frame — so the
    // per-statement floor attributes exactly.
    if (args.headOption.contains("mor3")) {
      val wh = s"/root/repo/target/probe-mor3-${System.currentTimeMillis()}"
      val t = new graft.warehouse.SnapshotTable(spark, wh)
      val orders = Tables.load(spark, sfDir, "orders")
      t.createOrReplace(
        orders.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
          .repartitionByRange(8, $"o_orderkey"), sortBy = Seq("o_orderkey"))
      val keys = orders.select($"o_orderkey").where($"o_orderkey" % 3 === 1)
        .orderBy($"o_orderkey").limit(200).collect().map(_.getLong(0)).toSeq
      // build a realistic mid-trickle state: 50 live delete sidecars
      (0 until 50).foreach(i =>
        t.deleteByKeys(Seq("o_orderkey"), Seq(keys(i)).toDF("o_orderkey")))
      def loop(name: String, n: Int)(f: Int => Unit): Unit = {
        val t0 = System.nanoTime()
        (0 until n).foreach(f)
        println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter")
      }
      loop("currentSnapshotId", 100) { _ => t.currentSnapshotId }
      loop("readWhere construction", 20) { i =>
        t.readWhere($"o_orderkey" === keys(50 + i)); ()
      }
      loop("pruned read noop (chain 50)", 20) { i =>
        noop(t.readWhere($"o_orderkey" === keys(50 + i))._1)
      }
      loop("pruned read collect (chain 50)", 20) { i =>
        t.readWhere($"o_orderkey" === keys(50 + i))._1.collect(); ()
      }
      loop("pruned read -> spark write", 20) { i =>
        t.readWhere($"o_orderkey" === keys(50 + i))._1
          .write.mode("overwrite").parquet(s"$wh-rw/$i")
      }
      loop("full deleteByKeys (chain 50+)", 40) { i =>
        t.deleteByKeys(Seq("o_orderkey"), Seq(keys(50 + i)).toDF("o_orderkey")); ()
      }
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      for (p <- Seq(wh, wh + "-rw"))
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
      spark.stop()
      return
    }

    // MoR-trickle breakdown: `runMain graft.Probe mor` times every Nth
    // single-key delete statement so growth vs fixed overhead separates
    if (args.headOption.contains("mor")) {
      val wh = s"/root/repo/target/probe-mor-${System.currentTimeMillis()}"
      val t = new graft.warehouse.SnapshotTable(spark, wh)
      val orders = Tables.load(spark, sfDir, "orders")
      t.createOrReplace(
        orders.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
          .repartitionByRange(8, $"o_orderkey"), sortBy = Seq("o_orderkey"))
      val keys = orders.select($"o_orderkey").where($"o_orderkey" % 3 === 1)
        .orderBy($"o_orderkey").limit(100).collect().map(_.getLong(0)).toSeq
      val t0 = System.nanoTime()
      keys.zipWithIndex.foreach { case (k, i) =>
        val s0 = System.nanoTime()
        t.deleteByKeys(Seq("o_orderkey"), Seq(k).toDF("o_orderkey"))
        if (i % 10 == 0 || i == 99)
          println(f"[probe] stmt $i%3d  ${(System.nanoTime() - s0) / 1e9}%.3f s")
      }
      println(f"[probe] trickle total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      time("final read agg") { noop(t.read().groupBy($"o_orderstatus").count()) }
      time("CDC over trickle") {
        noop(t.rowChangesBetween(1L, t.currentSnapshotId.get).get.df)
      }
      time("compact") { t.compact(); () }
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      spark.stop()
      return
    }

    val li = Tables.load(spark, sfDir, "lineitem")
    // warm
    noop(li); noop(li)
    time("scan only (again)") { noop(li) }
    time("scan + count") { li.groupBy().count().write.format("noop").mode("overwrite").save() }
    time("scan + 1 double sum") { noop(li.groupBy($"l_returnflag").agg(sum($"l_quantity"))) }
    time("scan + 1 decimal sum") { noop(li.groupBy($"l_returnflag").agg(sum($"l_quantity".cast("decimal(18,2)")))) }
    time("q01 full") { noop(graft.operators.Aggregates.queries("q01_pricing_summary")(spark, sfDir)) }
    time("q01 full again") { noop(graft.operators.Aggregates.queries("q01_pricing_summary")(spark, sfDir)) }
    val rep = li.repartition(32).localCheckpoint(true)
    time("q01 aggs on pre-split input") {
      noop(rep
        .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).cast("decimal(18,6)")).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")))
    }
    spark.stop()
  }
}
