package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side's
  * rows, the shuffle sends that key's entire volume to a single reducer —
  * the straggler that dominates the stage at 100 TB. Salting splits each
  * hot key into `salts` sub-keys: the big side gets a RANDOM-but-
  * deterministic salt (hash of a unique column), the small side is
  * replicated once per salt value, and the join runs on (key, salt) — the
  * hot key's rows now spread across `salts` reducers.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) does this
  * automatically for sort-merge joins at runtime; this helper is for the
  * cases AQE can't touch — aggregations downstream of the join keyed on
  * the same hot key, or plans where the skew only materializes after a
  * transformation AQE has no stats for. Trade-off: the small side is
  * materialized `salts`×, so keep `salts` ≲ 32 and the small side small.
  */
object SkewJoin {

  /** Equi-join `big` ⋈ `small` on `key`, salted `salts` ways. `saltBy` must
    * be a column of `big` with high cardinality (a unique id) — the salt is
    * a deterministic hash of it, so results are reproducible run-to-run. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: String, salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltBy)), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(key) === replicated(key), joinType)
      .drop(replicated(key))
      .drop("__salt")
  }
}
