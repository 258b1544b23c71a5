package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.DotProductF32

/** ScalaCheck properties for the native dot product, evaluated directly at
  * the expression level (no Spark job per case — fast, hundreds of cases):
  *
  *  - agreement with an exact left-to-right reference implementation
  *  - commutativity (x·y = y·x holds in IEEE for same-order accumulation
  *    of identical products)
  *  - common-prefix semantics on unequal lengths (the documented contract)
  */
object DotProductPropertiesSpec extends Properties("dot_f32") {

  private val floatGen: Gen[Float] =
    Gen.chooseNum(-1000f, 1000f).map(f => f) // finite, well within range

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, floatGen)).map(_.toArray)

  private def native(a: Array[Float], b: Array[Float]): Double =
    DotProductF32(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType)))
      .eval(null).asInstanceOf[Double]

  private def reference(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  property("matches the left-to-right double reference exactly") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      java.lang.Double.compare(native(a, b), reference(a, b)) == 0
    }

  property("commutative") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      java.lang.Double.compare(native(a, b), native(b, a)) == 0
    }

  property("unequal lengths dot the common prefix") =
    Prop.forAll(vecGen, Gen.chooseNum(0, 64)) { (a, cut) =>
      val b = a.take(math.min(cut, a.length))
      java.lang.Double.compare(native(a, b), reference(a.take(b.length), b)) == 0
    }
}
