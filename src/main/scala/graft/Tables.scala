package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At 100 TB
  * these would be partitioned Iceberg/parquet table roots instead — every
  * reader here goes through `spark.read.parquet(path)`, which transparently
  * handles a directory of many files, so nothing downstream assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(path(dir, name))

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects by default — read nanos as long, rebuild micros with integer
    * `div`, not `/`: a double round-trip loses precision above 2^53 ns) and
    * native timestamp[us] (read as TIMESTAMP_NTZ). Branch on the OBSERVED
    * type so either generation loads to the same microsecond TimestampType
    * — the session TZ is UTC everywhere, so the NTZ→LTZ cast is
    * value-preserving and truncation toward zero matches DuckDB's
    * `CAST(ts AS TIMESTAMP)` µs truncation for post-epoch data; oracle SQL
    * that casts `ts` compares bit-identical either way. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case LongType => // legacy: epoch nanos as int64
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // current: native timestamp[us], no TZ
        raw.withColumn("ts", raw("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same bare names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
