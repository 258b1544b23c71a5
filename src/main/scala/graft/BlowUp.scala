package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-test tooling: writes an N× synthetic blow-up of a testdata dir by
  * replicating the FACT tables with key shifts that preserve join
  * semantics — every key domain (custkey, orderkey, ...) gets ONE stride,
  * shared by every column referencing it, so copy i of orders points at
  * copy i of customer. The genuinely-small dims (region, nation) stay
  * as-is: multiplying a 25-row dim would create duplicate join keys and
  * measure fan-out, not scale. Dedup-sensitive text gets a per-copy suffix
  * so text operators see a 10× corpus, not 10 clones. Tables are copied
  * RAW (no events-ts conversion) so the output dir reads through
  * `Tables.load` exactly like driver testdata. Used for the per-query
  * scaling exponents between sf0.1 and 10× (VERDICT r2 "Next round" #8).
  *
  * Usage: runMain graft.BlowUp <srcSfDir> <outDir> <factor>
  */
object BlowUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // raw copy: keep events.ts as the original nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** One stride per key DOMAIN: next power of ten above the domain max. */
    def strideOf(name: String, c: String): Long = {
      val mx = raw(name).agg(max(col(c).cast("long"))).head().getLong(0)
      math.pow(10, math.ceil(math.log10(mx.toDouble + 1))).toLong
    }
    val sCust = strideOf("customer", "c_custkey")
    val sOrder = strideOf("orders", "o_orderkey")
    val sPart = strideOf("part", "p_partkey")
    val sSupp = strideOf("supplier", "s_suppkey")
    val sEvent = strideOf("events", "event_id")
    val sDoc = strideOf("documents", "doc_id")
    val sVec = strideOf("embeddings", "vec_id")

    def shifted(name: String, keyStrides: Map[String, Long],
        strCols: Seq[String] = Seq.empty): DataFrame =
      (0 until factor).map { i =>
        val copy = keyStrides.foldLeft(raw(name)) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i.toLong * stride))
        }
        strCols.foldLeft(copy)((df, c) =>
          if (i == 0) df else df.withColumn(c, concat(col(c), lit(s" #$i"))))
      }.reduce(_ unionAll _)

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> raw("region"),
      "nation" -> raw("nation"),
      "customer" -> shifted("customer", Map("c_custkey" -> sCust)),
      "supplier" -> shifted("supplier", Map("s_suppkey" -> sSupp)),
      "part" -> shifted("part", Map("p_partkey" -> sPart)),
      "orders" -> shifted("orders", Map("o_orderkey" -> sOrder, "o_custkey" -> sCust)),
      "lineitem" -> shifted("lineitem",
        Map("l_orderkey" -> sOrder, "l_partkey" -> sPart, "l_suppkey" -> sSupp)),
      "events" -> shifted("events", Map("event_id" -> sEvent, "user_id" -> sCust)),
      "documents" -> shifted("documents", Map("doc_id" -> sDoc), strCols = Seq("text")),
      "embeddings" -> shifted("embeddings", Map("vec_id" -> sVec)))

    plans.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[blowup] $name written")
    }
    spark.stop()
  }
}
