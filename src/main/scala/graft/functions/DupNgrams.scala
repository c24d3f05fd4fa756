package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native duplicate-n-gram counter: for an `array<string>` of tokens
  * and a window width n, the number of word n-grams that repeat —
  * `(L − n + 1) − |distinct n-grams|`, the quantity behind the
  * longest-repeated-run profile (t81) and any repetition-based text
  * quality rule (Gopher-style "fraction of duplicated n-grams").
  *
  * The built-in formulation
  * `size(transform(...)) − size(array_distinct(transform(...)))`
  * runs INTERPRETED — higher-order functions are CodegenFallback — and
  * `array_distinct` over string arrays walks pairwise, so a 100-token
  * document costs thousands of boxed comparisons per (doc, n) row.
  * This expression is one hash-set pass inside whole-stage codegen:
  * each window is joined with a single `concatWs` and probed against a
  * `HashSet[UTF8String]`, O(L·n) bytes and O(L) probes per row.
  *
  * Semantics: gram equality is ' '-joined string equality, which under
  * whitespace tokenization (`\S+` tokens — no token contains a space)
  * is exactly token-sequence equality, matching the transform-based
  * formulation bit-for-bit. NULL if either argument is NULL; n ≤ 0 or
  * L < n yields 0 (no windows → no duplicates — the `CASE WHEN
  * len >= n` guard of the SQL twin is built in). PRECONDITION: no
  * null elements (tokenizer output never contains them).
  */
case class DupNgrams(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val rightOk = right.dataType == IntegerType || right.dataType == LongType
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dupgrams requires (array<string>, int/bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dupgrams"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = b match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.toInt
      case x => x.asInstanceOf[Number].intValue()
    }
    DupNgrams.count(a.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) =>
      s"${ev.value} = graft.functions.DupNgrams.count($arr, (int)($n));")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DupNgrams =
    copy(left = newLeft, right = newRight)
}

object DupNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Duplicate count over the sliding n-windows of `arr`. */
  def count(arr: ArrayData, n: Int): Long = {
    if (n <= 0) return 0L
    val m = arr.numElements() - n + 1
    if (m <= 1) return 0L
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val window = new Array[UTF8String](n)
    var dup = 0L
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      val gram = if (n == 1) window(0) else UTF8String.concatWs(Space, window: _*)
      if (!seen.add(gram)) dup += 1L
      i += 1
    }
    dup
  }

  /** Column-API entry; requires `graft.GraftExtensions` on the session. */
  def dupNgramsNative(tokens: Column, n: Column): Column =
    call_function("graft_dupgrams", tokens, n)
}
