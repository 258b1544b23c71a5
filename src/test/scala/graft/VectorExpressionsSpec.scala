package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Native dot_f32 expression: codegen correctness, null handling, and
  * bit-identity with the interpreted HOF formulation. */
class VectorExpressionsSpec extends SparkSpec {

  private val hofDot =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""

  test("dot_f32 matches the HOF formulation bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val diffs = e.select(
      expr("dot_f32(a, b)").as("native"),
      expr(hofDot).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("dot_f32f64 matches the HOF formulation on float x double arrays") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)").as("b"))
    val diffs = e.select(
      expr("dot_f32f64(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("l2sq_f32 matches the HOF formulation bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val hofSq =
      """aggregate(zip_with(a, b, (x, y) ->
           (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
         CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val diffs = e.select(
      expr("l2sq_f32(a, b)").as("native"), expr(hofSq).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diffs == 0)
    // self-distance is exactly zero
    val self = e.select(expr("l2sq_f32(a, a)").as("d")).filter(col("d") =!= 0.0).count()
    assert(self == 0)
  }

  test("dot_f32 handles nulls and simple values") {
    GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").limit(1).createOrReplaceTempView("one_vec")
    val r = spark.sql(
      """SELECT dot_f32(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
                        CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
                dot_f32(CAST(NULL AS ARRAY<FLOAT>),
                        CAST(array(1.0) AS ARRAY<FLOAT>)) AS n""").collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.isNullAt(1))
  }

  test("l2sq_f64 matches the HOF formulation bit-for-bit on double arrays") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"),
        expr("transform(reverse(embedding), x -> CAST(x AS DOUBLE))").as("b"))
      .select(expr("l2sq_f64(a, b)").as("native"),
        expr("""aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
    val rows = e.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0))
    // ragged → NULL, matching the siblings' contract
    val ragged = spark.sql(
      """SELECT l2sq_f64(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
                         CAST(array(1.0) AS ARRAY<DOUBLE>)) AS d""").collect().head
    assert(ragged.isNullAt(0))
  }

  test("ragged inputs yield NULL in codegen for all three natives, matching the HOF") {
    GraftFunctions.register(spark)
    // slice off the last element so every row is a genuine length mismatch;
    // runs through whole-stage codegen (real scan, not constant folding)
    val e = Tables.load(spark, sfDir, "embeddings").limit(5)
      .select(col("embedding").as("a"),
        expr("slice(embedding, 1, size(embedding) - 1)").as("b"))
      .selectExpr("dot_f32(a, b) AS d", "l2sq_f32(a, b) AS l",
        "dot_f32f64(a, CAST(b AS ARRAY<DOUBLE>)) AS m",
        // the HOF the natives claim identity with must agree: NULL too
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS hof""")
    val rows = e.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)),
      "ragged inputs must yield NULL (never a truncated-prefix value)")
  }

  test("engine-identity constant functions resolve from session conf (F17)") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT current_account() AS a").collect().head.getString(0)
      == "GRAFT_PRIMARY")
    spark.conf.set("spark.graft.account", "GRAFT_SECONDARY")
    try {
      // the builder reads conf at analysis time, no re-register needed
      assert(spark.sql("SELECT current_account() AS a").collect().head.getString(0)
        == "GRAFT_SECONDARY")
    } finally spark.conf.unset("spark.graft.account")
  }

  test("optimizer rule rewrites the HOF dot idiom into native dot_f32") {
    GraftFunctions.register(spark) // installs the rule via extraOptimizations
    val df = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
      .selectExpr(
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d""")
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_f32"),
      "HOF pattern was not rewritten to the native expression")
    // rewritten results equal the direct native call
    val direct = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
      .selectExpr("dot_f32(a, b) AS d")
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      direct.collect().map(_.getDouble(0)).toSeq)
  }

  test("zorder2 interleaves bits: known values, codegen = interpreter = reference") {
    GraftFunctions.register(spark)
    import graft.functions.InterleaveBits
    // hand-checked Morton values: x bits land even, y bits odd
    assert(InterleaveBits.interleave(1, 0) == 1L)
    assert(InterleaveBits.interleave(0, 1) == 2L)
    assert(InterleaveBits.interleave(3, 3) == 15L)
    assert(InterleaveBits.interleave(2, 3) == 14L)
    assert(InterleaveBits.interleave(0xFFFFFFFFL, 0) == 0x5555555555555555L)
    // codegen path over a DF agrees with the reference implementation
    import spark.implicits._
    val rows = spark.range(0, 2048).select(
      (col("id") % 41).cast("int").as("x"), (col("id") % 59).cast("int").as("y"))
    val got = rows.selectExpr("x", "y", "zorder2(x, y) AS z").as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == InterleaveBits.interleave(x.toLong, y.toLong), s"($x, $y)")
    }
    // locality: z respects per-dimension monotonicity on aligned pairs
    assert(InterleaveBits.interleave(10, 7) < InterleaveBits.interleave(12, 7))
    assert(InterleaveBits.interleave(10, 7) < InterleaveBits.interleave(10, 9))
    // NULL propagates
    val n = spark.sql("SELECT zorder2(CAST(NULL AS INT), 3) AS z").collect()(0)
    assert(n.isNullAt(0))
  }

  test("the extensions-injected builder constructs a working expression") {
    // the canonical install path is spark.sql.extensions at builder time;
    // assert the builder GraftExtensions injects evaluates correctly.
    val (_, _, builder) = GraftFunctions.dotFunction
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit = Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType))
    assert(builder(Seq(lit, lit)).eval(null) == 5.0)
  }
}
