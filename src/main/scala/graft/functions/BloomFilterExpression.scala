package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, 'base64-filter')` — membership probe against a
  * pre-built Bloom filter, the semi-join reduction that makes selective
  * joins cheap at 100 TB.
  *
  * The classic plan for `fact ⋈ small-selective-dim` shuffles (or at best
  * scans) every fact row, then throws almost all of them away at the join.
  * The runtime-filter plan — what Spark's own `InjectRuntimeFilter` builds
  * for shuffle joins, and what this expression makes explicit and
  * composable — aggregates the dim keys into a Bloom filter (dim-sized, one
  * pass) and applies it to the fact BEFORE the exchange, so the shuffle
  * carries only probable matches plus an fpp-bounded trickle of false
  * positives. The exact join downstream removes the false positives, which
  * is why the whole transform is RESULT-TRANSPARENT: the query's answer is
  * byte-identical with or without the filter (q108 proves it through the
  * DuckDB oracle, which runs the plain join).
  *
  * The filter travels as a base64 literal in the expression text (built
  * once on the driver from the dim side via `DataFrameStatFunctions
  * .bloomFilter` — Spark's standard sketch, distributed and mergeable), is
  * deserialized once per plan instance (`@transient lazy`), and is attached
  * to generated code via `addReferenceObj` — the probe itself is two hash
  * multiplications and a bit test per row, inside whole-stage codegen, no
  * boxing. NULL keys yield NULL (a NULL equi-join key can never match, and
  * the downstream join drops the row either way).
  *
  * The filter payload is carried as a base64 STRING field (not a raw
  * `Array[Byte]`): Scala case-class equality on arrays is reference-based,
  * which would make two identical probe expressions never `equals` each
  * other and silently defeat Catalyst canonicalization, common-subexpression
  * elimination, and cached-plan/exchange-reuse matching. Strings compare
  * structurally, so equal filters yield equal (and canonically equal)
  * expressions; the bytes are decoded once per plan instance in the lazy
  * val below.
  */
case class BloomMightContain(child: Expression, filterB64: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an int/long key, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(filterB64)))

  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
  }

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(asLong(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bf = ctx.addReferenceObj("graftBloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong((long) $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
