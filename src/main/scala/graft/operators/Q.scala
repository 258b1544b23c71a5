package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the declared query inventory.
  *
  * Every query in `graft.SparkEntry.queries` is paired with a DuckDB oracle
  * (`oracleSql`) that must hash-match cell-for-cell. Two disciplines make
  * that possible with floating-point data:
  *
  *   - '''Decimal-exact sums''': `SUM(double)` is order-dependent and Spark
  *     partial aggregation sums in nondeterministic order across partitions.
  *     All money-ish sums go through `CAST(x AS DECIMAL(18,s))` (exact,
  *     order-independent) and only the final result is cast back to double.
  *     Same expression on the DuckDB side → bit-identical outputs.
  *   - '''Total ordering''': every query ends in an ORDER BY over a unique
  *     key so row order is deterministic in both engines.
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Order-independent exact sum of a double column: decimal-cast, sum,
    * cast back. Identical semantics in DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average built from a decimal sum and an exact count; the single
    * double division at the end is IEEE-identical across engines. */
  def decAvg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1)))

  /** Exact integer-cents sum of a money column. Ratio metrics over cents
    * stay in integer arithmetic end-to-end — `ROUND` on a double whose
    * shortest decimal representation sits exactly on a .xx5 boundary rounds
    * differently in Spark (rounds the shortest representation, HALF_UP) vs
    * DuckDB (rounds the binary value), so money ratios must never go
    * through ROUND(double). */
  def decCents(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))) * lit(100)).cast("long")

  /** Multiset equality of two frames in ONE shuffle: rows union with
    * signed weights (+1 left, −1 right, aligned by name), one hash
    * aggregate nets them per distinct row, and equality ⟺ no group nets
    * non-zero. Exactly the predicate of the gate idiom it replaces —
    * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` is per-row count
    * equality — at one job / one exchange instead of two jobs each
    * carrying both sides through their own aggregation (both formulations
    * group rows with Spark's SQL equality, so NaN/±0.0 normalization is
    * identical). Verification cost in the replication/DML gates halves
    * without weakening the check. */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    a.withColumn("__w", lit(1L))
      .unionByName(b.select(cols.map(b.col): _*).withColumn("__w", lit(-1L)))
      .groupBy(cols.map(col): _*).agg(sum(col("__w")).as("__net"))
      .filter(col("__net") =!= lit(0L))
      .isEmpty
  }
}
