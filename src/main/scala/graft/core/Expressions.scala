package graft.core

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Semantically identical to the higher-order-function chain
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, v) => acc + v)` —
  * same left-to-right double accumulation (bitwise-equal results, so the
  * DuckDB `list_zip`+`list_sum` oracles keep hash-matching), same null
  * semantics (null array → null; unequal lengths → zip_with null-pads →
  * null; null element → null) — but it participates in whole-stage codegen,
  * which the HOF chain does not (interpreted lambda + a materialized zipped
  * array per row). On the exact-scoring path that difference is the whole
  * game: a 15k-query × 20k-item catalog is 300M dot products per predict,
  * and at 100 TB the brute-force oracle and the IVF re-scoring stage both
  * sit on this expression.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are guaranteed array<double> by the companion's inserted Casts
  // (ExpectsInputTypes is private[sql] in Spark 4, so typing is enforced
  // at construction instead of analysis)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column wrapper; accepts `array<float>` or `array<double>` inputs (the
    * inserted element-wise Cast is itself codegen'd and a no-op on
    * already-double arrays). */
  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a.cast("array<double>")),
      GraftExpressionBridge.expression(b.cast("array<double>"))))
}

/** First 60 bits of md5(input) as a non-negative long — bit-for-bit the
  * value of `conv(substring(md5(s), 1, 15), 16, 10)` (the portable-hash
  * recipe), but computed straight from the digest bytes: no 32-char hex
  * string, no substring slice, no base-16 string parse. Those three
  * allocations per row dominate when the hash runs per (query, item) pair
  * (weighted samplers: |queries| × |catalog| rows) or per shingle
  * (MinHash). The DuckDB oracles keep using the hex-string form — same
  * 60 bits either way (spec-pinned against the conv chain). */
case class Md5Prefix60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit big-endian prefix of the md5 digest: bytes 0-6 fully, plus the
    * high nibble of byte 7 — exactly the first 15 hex characters. */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) | ((b(2) & 0xffL) << 36) |
      ((b(3) & 0xffL) << 28) | ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)
  }

  def apply(c: Column): Column =
    GraftExpressionBridge.column(Md5Prefix60(
      GraftExpressionBridge.expression(c.cast("string"))))
}
