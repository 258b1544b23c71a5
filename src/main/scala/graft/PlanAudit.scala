package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints the formatted physical plan of the named
  * queries (SPARK_GRAFT_ONLY prefix filter, default all) at
  * SPARK_GRAFT_SF_DIR — the `.explain("formatted")` loop the build rule
  * prescribes after each operator goes green. Run with
  * `sbt "runMain graft.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
