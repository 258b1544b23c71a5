package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

class TablesSpec extends SparkSpec {

  test("all declared tables load") {
    Tables.all.foreach { t =>
      assert(Tables.load(spark, sfDir, t).schema.nonEmpty, s"$t failed to load")
    }
  }

  test("events.ts is normalized to microsecond TimestampType") {
    val schema = Tables.load(spark, sfDir, "events").schema
    assert(schema("ts").dataType == TimestampType,
      s"ts is ${schema("ts").dataType} — the TIMESTAMP(NANOS) fix regressed")
    assert(schema("event_id").dataType == LongType)
  }

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sfDir)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1)
    }
  }
}
