package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and timed noop execution of
  * one or more named queries. `sbt "runMain graft.Explain <sfDir> q42 q44"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val full = SparkEntry.queries.keys.find(_.startsWith(n)).getOrElse(n)
      val df = SparkEntry.queries(full)(spark, sfDir)
      println(s"\n########## $full ##########")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[timing] $full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
