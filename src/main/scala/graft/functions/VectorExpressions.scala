package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the ANN hot loop: left-to-right double
  * dot product of two float32 vectors.
  *
  * This is the Catalyst-extension path SURVEY §2.11 reserves for the
  * similarity extensions: the `aggregate(zip_with(...))` higher-order
  * formulation is semantically identical but runs INTERPRETED (HOFs have no
  * codegen) and allocates an intermediate products array per row. This
  * expression generates a tight fused multiply-add loop inside whole-stage
  * codegen — no allocation, no virtual calls — which is the difference
  * between the brute-force scorer being memory-bound vs compute-bound at
  * 100 TB.
  *
  * Numerics: float32×float32 is exact in double and accumulation is
  * strictly left-to-right in double — bit-identical to both the HOF
  * formulation and DuckDB's sequential `list_reduce`, so oracle hashes are
  * unchanged. Ragged inputs (length mismatch) yield NULL — exactly what
  * `zip_with`'s null-padding makes the HOF yield — never a silently
  * truncated prefix computation (ADVICE r5 #5).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true // ragged inputs yield NULL

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Mixed-width sibling of [[DotProductF32]]: float32 vector × float64
  * vector (the IVF assignment shape — raw embeddings against
  * decimal-exact-mean centroids). Same left-to-right double accumulation,
  * same NULL-on-ragged-inputs contract. */
case class DotProductF32F64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true // ragged inputs yield NULL

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32f64 expects (array<float>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared-L2 sibling of [[DotProductF32]]: Σ (xᵢ−yᵢ)² over two float32
  * vectors, the PQ encode/ADC hot loop (q88). Same contract: differences
  * taken in double, accumulation strictly left-to-right in double —
  * bit-identical to the `aggregate(zip_with(...))` HOF it replaces and to
  * DuckDB's sequential `list_reduce`, so oracle hashes are unchanged; the
  * win is a fused codegen loop instead of an interpreted HOF allocating an
  * intermediate array per row (the encode pass runs it |corpus|×M×K
  * times). Ragged inputs yield NULL, matching the HOF (ADVICE r5 #5). */
case class L2SquaredF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true // ragged inputs yield NULL

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_f32 expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Float64 sibling of [[L2SquaredF32]]: Σ (xᵢ−yᵢ)² over two float64
  * vectors — the PQ k-means hot loop (q88), where subvectors and trained
  * centroids are both double arrays. Same contract: strictly left-to-
  * right double accumulation, bit-identical to the interpreted
  * `aggregate(zip_with(...))` HOF it replaces (and to DuckDB's
  * sequential `list_reduce`), NULL on ragged inputs. The training pass
  * runs it |corpus|×M×K times per Lloyd iteration — codegen vs
  * interpreted HOF is the difference between compute-bound and
  * allocation-bound there. */
case class L2SquaredF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true // ragged inputs yield NULL

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_f64 expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  private val dotInfo = new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32")
  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"dot_f32 expects 2 arguments, got ${children.length}")
    DotProductF32(children.head, children(1))
  }

  /** Idempotent per-session registration so `expr("dot_f32(a, b)")`
    * resolves in sessions not built with [[GraftExtensions]]. Also installs
    * the engine-identity constant functions (F17: the reference's
    * CURRENT_ACCOUNT / CURRENT_ORGANIZATION_NAME surface), resolved from
    * session conf at call time so primary/secondary sessions report their
    * own identity. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f32"), dotInfo, dotBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f32f64"),
      new ExpressionInfo(classOf[DotProductF32F64].getName, "dot_f32f64"),
      { children =>
        require(children.length == 2,
          s"dot_f32f64 expects 2 arguments, got ${children.length}")
        DotProductF32F64(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("l2sq_f32"),
      new ExpressionInfo(classOf[L2SquaredF32].getName, "l2sq_f32"),
      { children =>
        require(children.length == 2,
          s"l2sq_f32 expects 2 arguments, got ${children.length}")
        L2SquaredF32(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("l2sq_f64"),
      new ExpressionInfo(classOf[L2SquaredF64].getName, "l2sq_f64"),
      { children =>
        require(children.length == 2,
          s"l2sq_f64 expects 2 arguments, got ${children.length}")
        L2SquaredF64(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "zorder2"),
      { children =>
        require(children.length == 2,
          s"zorder2 expects 2 arguments, got ${children.length}")
        InterleaveBits(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      { children =>
        require(children.length == 2,
          s"bloom_might_contain expects (key, 'base64-filter'), got ${children.length} args")
        val b64 = children(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain: second argument must be a base64 string literal, got $other")
        }
        BloomMightContain(children.head, b64)
      })
    def const(fn: String, confKey: String, default: String): Unit =
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(fn),
        new ExpressionInfo(classOf[Literal].getName, fn),
        _ => Literal(spark.conf.get(confKey, default)))
    const("current_account", "spark.graft.account", "GRAFT_PRIMARY")
    const("current_organization_name", "spark.graft.organization", "GRAFT_ORG")
    if (!spark.experimental.extraOptimizations.contains(NativeDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeDotRewrite
  }

  /** For `SparkSessionExtensions.injectFunction`. */
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_f32"), dotInfo, dotBuilder)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) installs the engine's native
  * functions into every session derived from that builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotFunction)
    ext.injectOptimizerRule(_ => NativeDotRewrite)
  }
}
