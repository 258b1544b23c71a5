package graft
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.mv._
object MvBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cat = new Catalog(spark, s"/tmp/mvbench/${java.util.UUID.randomUUID.toString.take(8)}", "B")
    val mvm = new MaterializedViewManager(cat)
    // 20M-row fact, 1000 x 30 key grain
    val fact = spark.range(100000000L).select(
      concat(lit("c"), (col("id") % 1000)).as("campaign"),
      concat(lit("d"), (col("id") % 30)).as("day"),
      (col("id") % 997).cast("double").as("cost"))
      .repartition(32)
    cat.table("ads", "impressions").createOrReplace(fact)
    mvm.createAggMv("imp_by_key", ("ads", "impressions"),
      Seq("campaign", "day"), Seq("cost"))
    def q() = cat.table("ads", "impressions").read()
      .groupBy($"campaign").agg(count(lit(1)).as("n"), sum($"cost").as("c"))
    def time(tag: String): Double = {
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime()-t0)/1e9; println(f"$tag: $s%.2f s"); s
    }
    spark.conf.set(MvRewrite.FlagKey, "false")
    time("warmup")
    val direct = (1 to 3).map(_ => time("direct")).min
    mvm.enableRewrite("imp_by_key")
    val routed = (1 to 3).map(_ => time("routed")).min
    println(f"RESULT direct=$direct%.2f routed=$routed%.2f speedup=${direct/routed}%.1fx")
    spark.stop()
  }
}
