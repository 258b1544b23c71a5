package graft

/** The driver contract: every declared query runs, returns rows, and has a
  * DuckDB oracle twin with matching column names (the driver's hash compare
  * sorts columns by name — a name mismatch fails even when values match).
  */
class QueryContractSpec extends SparkSpec {

  /** Queries that intentionally omit an oracle (driver falls back to the
    * weaker rows-only check): sketch-based results no second engine
    * reproduces bit-for-bit. Every member needs a spec bounding its error
    * against an exact computation instead. */
  private val rowsOnly = Set("q90_approx_distinct", "q94_approx_percentiles")

  test("every query has an oracle twin") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, "empty schema")
      assert(df.columns.distinct.length == df.columns.length,
        s"duplicate column names: ${df.columns.mkString(",")}")
      assert(df.count() > 0, "no rows — the driver's smoke would flag this")
    }
  }
}
