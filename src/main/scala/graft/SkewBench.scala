package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join shoot-out (VERDICT r6 #6): the manual salted join
  * ([[graft.operators.SkewJoin]], q92) vs Spark's own AQE skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`) vs the unmitigated sort-merge
  * baseline, on the SAME deterministic skewed fact. Prints one JSON line;
  * results feed the BENCH_NOTES guidance table.
  *
  * The fact is synthesized, not read: `hotShare` of rows land on ONE key,
  * the rest spread uniformly over `nDim` keys — pseudo-randomness is
  * `hash(id)`, so the distribution is bit-reproducible run to run. The
  * dim side is too wide to broadcast (and broadcast is disabled anyway):
  * at 100 TB the skewed-join problem only exists when the dim can't
  * broadcast, so the measurement must hold that constraint too.
  *
  * AQE's splitter only fires when the skewed partition exceeds
  * `skewedPartitionThresholdInBytes` AND `skewedPartitionFactor` × the
  * median partition — production defaults (256 MB) are tuned for real
  * clusters, so this harness scales the thresholds down to the local
  * fact's partition sizes. That knob-dependence is itself a finding: the
  * manual salt needs no size estimate, only knowing WHICH side is hot.
  *
  * Every variant must produce the identical grouped answer (count + sum
  * checked cell-for-cell) before its timing counts.
  *
  * Usage: runMain graft.SkewBench [nFactRows] [nDimRows] [hotSharePct]
  */
object SkewBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(50000000L)
    val nDim = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val hotKey = 7L
    // hash(id)-driven assignment: deterministic, no Math.random in the plan
    val fact = spark.range(nFact)
      .withColumn("h", pmod(hash($"id"), lit(100)))
      .withColumn("custkey",
        when($"h" < hotPct, lit(hotKey))
          .otherwise(pmod(hash($"id", lit(1)), lit(nDim))))
      .withColumn("amount", (pmod(hash($"id", lit(2)), lit(10000)) / lit(100.0)))
      .select($"id", $"custkey", $"amount")
    val dim = spark.range(nDim).select(
      $"id".as("custkey"),
      concat(lit("seg-"), pmod($"id", lit(5)).cast("string")).as("segment"),
      // padding pushes the dim well past any broadcast threshold, the
      // regime where skew mitigation is the only option
      lpad(lit("x"), 64, "x").as("pad"))

    // materialize both sides once so scan cost isn't part of any variant
    val factPath = "/root/repo/target/skewbench/fact"
    val dimPath = "/root/repo/target/skewbench/dim"
    fact.write.mode("overwrite").parquet(factPath)
    dim.write.mode("overwrite").parquet(dimPath)
    val factT = spark.read.parquet(factPath)
    val dimT = spark.read.parquet(dimPath)

    def grouped(joined: DataFrame): DataFrame =
      joined.groupBy($"segment")
        .agg(count(lit(1)).as("n"),
          sum($"amount".cast("decimal(18,2)")).as("total"))
        .orderBy($"segment")

    def withConf[A](pairs: (String, String)*)(f: => A): A = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    def runPlain(): DataFrame = withConf(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      val df = grouped(factT.join(dimT, "custkey"))
      df.write.format("noop").mode("overwrite").save(); df
    }

    def runAqe(): DataFrame = withConf(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scaled-down trigger: local partitions are MBs, not the 256 MB
      // production default; factor 2 < default 5 so a 30% hot key trips it
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2"): _*) {
      val df = grouped(factT.join(dimT, "custkey"))
      df.write.format("noop").mode("overwrite").save(); df
    }

    def runSalted(): DataFrame = withConf(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      val df = grouped(graft.operators.SkewJoin.saltedJoin(
        factT, dimT, "custkey", saltBy = "id", salts = 16))
      df.write.format("noop").mode("overwrite").save(); df
    }

    // parity first: all three variants must agree cell-for-cell
    def cells(df: DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toSeq.map(String.valueOf).mkString("|"))
    val base = cells(runPlain())
    require(cells(runAqe()) == base, "AQE variant diverged from plain SMJ")
    require(cells(runSalted()) == base, "salted variant diverged from plain SMJ")

    // timed: 2 passes each, keep the min (steady-state JIT'd number)
    def best(f: () => DataFrame): Double =
      (1 to 2).map(_ => time(f())._2).min
    val tPlain = best(() => runPlain())
    val tAqe = best(() => runAqe())
    val tSalt = best(() => runSalted())

    println(s"""{"bench":"skew","nFact":$nFact,"nDim":$nDim,"hotPct":$hotPct,""" +
      s""""plain_smj_s":${f(tPlain)},"aqe_skew_s":${f(tAqe)},"salted16_s":${f(tSalt)}}""")
    spark.stop()
  }

  private def f(d: Double): String = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
}
