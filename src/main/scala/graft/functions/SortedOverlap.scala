package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst intersection COUNT over two SORTED, de-duplicated
  * `array<string>` (or `array<long>`) columns — the verify kernel of
  * every exact set-similarity join (Jaccard / containment / overlap
  * predicates). The long variant is the 100 TB representation: token /
  * shingle sets hashed to 8-byte values (xxhash64) shuffle at a quarter
  * of the width of 32-hex digests and compare with one integer op.
  *
  * The built-in formulation `size(array_intersect(a, b))` builds a
  * hash set and an output array PER PAIR; on a similarity join the
  * verify runs once per candidate pair (millions to billions at
  * corpus scale), so those per-call allocations dominate. This
  * expression is a fused two-pointer merge walk inside whole-stage
  * codegen: zero allocation, O(|a|+|b|) comparisons, early exit when
  * either side is exhausted.
  *
  * PRECONDITION: both arrays ascending-sorted with no duplicates and
  * no null elements (stage with `sort_array(array_distinct(...))` —
  * one sort per ROW, amortized over all pairs that row joins). On
  * unsorted input the count is undefined — this is the documented
  * contract, checked nowhere for speed.
  *
  * Semantics: null if either array is null; result is the number of
  * common elements (= `size(array_intersect)` under the precondition).
  */
case class SortedOverlap(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) => true
      case _ => false
    }
    def elem(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType
    if (ok(left.dataType) && ok(right.dataType) &&
        elem(left.dataType) == elem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_overlap requires two array<string> or two array<long> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    if (elemIsLong) {
      while (i < nx && j < ny) {
        val c = java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (c == 0) { acc += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { acc += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val cmp =
        if (elemIsLong) s"java.lang.Long.compare($x.getLong($i), $y.getLong($j))"
        else s"$x.getUTF8String($i).compareTo($y.getUTF8String($j))"
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $cmp;
         |  if ($c == 0) { $acc++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedOverlap {
  /** Column-API entry; requires `graft.GraftExtensions` on the session. */
  def overlapNative(a: Column, b: Column): Column =
    call_function("graft_overlap", a, b)
}
