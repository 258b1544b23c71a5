package graft

import graft.catalog.Catalog

/** SURVEY §3.1 entry point A: an analyst's SQL TEXT view, registered in
  * the catalog, must produce the same result as the DataFrame-built
  * flagship query (q27) — proving the SQL dialect surface and the
  * DataFrame surface are the same engine. */
class SqlEntrySpec extends SparkSpec {

  test("catalog SQL-text funnel view matches the DataFrame q27") {
    Tables.registerAll(spark, sfDir)
    val cat = new Catalog(spark, "/root/repo/target/test-wh/sqlentry", "prod")
    cat.createOrReplaceView("adv", "v_funnel",
      """WITH od AS (
           SELECT o_custkey AS od_k, to_date(o_orderdate) AS od_d,
                  count(1) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
           FROM orders GROUP BY 1, 2),
         ld AS (
           SELECT o_custkey AS ld_k, to_date(o_orderdate) AS ld_d,
                  count(1) AS n_items
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)
         SELECT c_custkey, c_name,
                coalesce(od_d, ld_d) AS date_key,
                coalesce(n_orders, 0) AS n_orders,
                coalesce(spend, CAST(0 AS DOUBLE)) AS spend,
                coalesce(n_items, 0) AS n_items
         FROM customer
         LEFT JOIN od ON c_custkey = od_k
         LEFT JOIN ld ON ld_k = c_custkey AND ld_d = od_d
         WHERE od_d IS NOT NULL OR ld_d IS NOT NULL
         ORDER BY c_custkey, date_key""")

    val viaSql = cat.queryView("adv", "v_funnel")
      .collect().map(r => (r.getLong(0), r.get(2).toString, r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    val viaDf = operators.Views.queries("q27_funnel_mv")(spark, sfDir)
      .select("c_custkey", "date_key", "n_orders", "spend", "n_items")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(viaSql == viaDf)
  }
}
