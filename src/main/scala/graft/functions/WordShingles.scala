package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram kernel: one pass over the raw UTF-8 bytes, no
  * per-element lambda dispatch. Must be called through the static-forwarder
  * class (object with no companion class) so generated code can reference
  * `graft.functions.ShingleKernel.eval(...)` directly.
  *
  * Tokenization contract = Spark's `split(text, " ")` (Java regex split,
  * limit −1): segments between single 0x20 bytes, leading/inner/trailing
  * empty tokens all kept, and the empty string yields one empty token.
  * Because every inter-token separator is EXACTLY one space, the join of
  * tokens i..i+n−1 with single spaces is byte-identical to the original
  * span [start(i), end(i+n−1)) — so each shingle is a slice of the input
  * buffer, never rebuilt. Dedup preserves first-occurrence order, matching
  * `array_distinct`.
  */
object ShingleKernel {
  def eval(text: UTF8String, n: Int): ArrayData = eval(text, n, true)

  /** Non-distinct variant: every window in order (the `explode(transform(
    * sequence(...)))` form of d15's weighted grams). */
  def evalAll(text: UTF8String, n: Int): ArrayData = eval(text, n, false)

  def eval(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (n < 1) throw new IllegalArgumentException(
      s"graft_shingles: n must be >= 1, got $n")
    val bytes = text.getBytes
    val len = bytes.length
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(new Array[Any](0))
    // token boundaries: starts(j) .. ends(j)
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = len
    if (!distinct) {
      val out = new Array[AnyRef](cnt)
      var s = 0
      while (s < cnt) {
        val from = starts(s)
        out(s) = UTF8String.fromBytes(bytes, from, ends(s + n - 1) - from)
        s += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String](cnt * 2)
    var s = 0
    while (s < cnt) {
      val from = starts(s)
      seen.add(UTF8String.fromBytes(bytes, from, ends(s + n - 1) - from))
      s += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}

/** `graft_shingles(text, n)` — the distinct word n-grams of `text`, in
  * first-occurrence order: the native, whole-stage-codegen form of
  *
  * {{{
  * array_distinct(transform(sequence(0, size(split(text,' ')) - n),
  *   i -> array_join(slice(split(text,' '), i + 1, n), ' ')))
  * }}}
  *
  * The higher-order form pays an interpreted lambda dispatch plus a
  * slice + array_join allocation per window (r12 measurement: ~17 s of
  * task time for 260k shingles at sf0.1 — the single dominant cost of the
  * whole dedup family); this kernel is one byte scan and one set insert
  * per window. Equality with the HOF form is property-tested in
  * WordShinglesSpec, including the empty-token edge cases of Java split
  * semantics (consecutive/leading/trailing spaces, empty string).
  *
  * Null semantics: null if either input is null (the HOF chain nulls
  * through identically). n must be a foldable positive integer. Texts with
  * fewer than n tokens produce an EMPTY array (callers' `size(...) >= n`
  * scan filter makes the row absent before this evaluates — same contract
  * either way).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure("graft_shingles requires a literal n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires (string, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleKernel.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

/** `graft_shingles_all(text, n)` — EVERY word n-gram window in order
  * (duplicates kept): the native form of `transform(sequence(0,
  * size(words) − n), i → array_join(slice(words, i+1, n), ' '))`, the
  * multiset d15's weighted Jaccard counts repetitions from. Same
  * tokenization contract and spec coverage as [[WordShingles]].
  */
case class WordShinglesAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure("graft_shingles_all requires a literal n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles_all requires (string, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles_all"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.evalAll(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleKernel.evalAll($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShinglesAll =
    copy(left = newLeft, right = newRight)
}
