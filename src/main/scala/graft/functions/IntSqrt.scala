package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}
import org.apache.spark.sql.types.Decimal

/** Native exact integer square root: floor(sqrt(v)) for a non-negative
  * DECIMAL or BIGINT — the primitive behind every sqrt-needing exact
  * statistic (Matthews correlation, p-chart bands, Cohen's d).
  *
  * The SQL-ladder formulation (floor(sqrt(double)) plus a ±2 decimal
  * correction CASE, batch 113) costs five DECIMAL(38,0) multiplies per
  * row and tops out at ~1e21 where the double error exceeds the ladder;
  * this expression calls BigInteger.sqrt (Java 9+, exact for ANY
  * magnitude) and stays inside whole-stage codegen as a single static
  * call. Negative input → null (checked, not thrown, so it composes
  * under CASE without ANSI traps).
  */
case class IntSqrt(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_isqrt requires bigint or decimal, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_isqrt"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = v match {
    case d: Decimal => IntSqrt.sqrtDecimal(d)
    case l: java.lang.Long => if (l < 0) null else IntSqrt.sqrtLong(l)
    case l: Long => if (l < 0) null else IntSqrt.sqrtLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = IntSqrt.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, x => s"""
           |if ($x < 0L) { ${ev.isNull} = true; } else {
           |  ${ev.value} = $helper.sqrtLong($x);
           |}""".stripMargin)
      case _: DecimalType =>
        val r = ctx.freshName("isqrtRes")
        nullSafeCodeGen(ctx, ev, x => s"""
           |java.lang.Long $r = $helper.sqrtDecimal($x);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.longValue(); }""".stripMargin)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IntSqrt {
  /** Exact floor(sqrt(v)) for v >= 0; null for negative input. */
  def sqrtDecimal(d: Decimal): java.lang.Long = {
    val bd = d.toJavaBigDecimal
    // sign of the DECIMAL, not of its truncation: -0.5 truncates to
    // BigInteger zero (signum 0) and must still be rejected as negative
    if (bd.signum() < 0) null
    else {
      val r = bd.toBigInteger.sqrt()
      // sqrt of DECIMAL(38,0) can exceed Long for v > ~8.5e37; a root
      // with bitLength 63 still fits in a positive Long
      if (r.bitLength() > 63) null else java.lang.Long.valueOf(r.longValueExact())
    }
  }

  def sqrtLong(l: Long): Long = {
    // floor(Math.sqrt) is within 1 for the full long range; correct it
    var s = math.sqrt(l.toDouble).toLong
    while (s > 0 && s > l / s) s -= 1
    while ((s + 1) <= l / (s + 1)) s += 1
    s
  }
}
