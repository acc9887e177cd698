package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe with whole-stage codegen:
  * `graft_bloom_contains(serialized_filter, hash)`.
  *
  * Spark exposes no public `might_contain` function (its
  * `BloomFilterMightContain` is internal to runtime row-level filtering),
  * so the decontamination probe (graft.llm.Dedup.contaminationBloom) had
  * to run through a Scala UDF — boxing every 64-bit hash and breaking the
  * scan stage's codegen span. This expression keeps the probe inside
  * whole-stage codegen: the filter arrives as a FOLDABLE binary literal
  * (same shipping shape Spark itself uses for runtime bloom pushdown),
  * is deserialized ONCE per executor into a `@transient lazy val`, and
  * the generated code calls `mightContainLong` directly on the
  * referenced object — no boxing, no per-row deserialization, no UDF
  * node in the plan.
  *
  * Null semantics: standard binary-expression propagation (null filter or
  * null hash → null).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a foldable (constant) serialized " +
          "filter — deserialization happens once, not per row")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (binary, bigint) inputs, got $l and $r")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  /** None when the foldable filter literal evaluates to NULL — the
    * codegen path must then emit always-null code, not force a
    * deserialization NPE at plan compilation (the interpreted path gets
    * null propagation for free from nullSafeEval's framework).
    */
  @transient private lazy val filter: Option[BloomFilter] =
    Option(left.eval(null).asInstanceOf[Array[Byte]])
      .map(bytes => BloomFilter.readFrom(new ByteArrayInputStream(bytes)))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    // `a` (the filter bytes) is intentionally unused per row: the lazy
    // val above deserializes the foldable left side exactly once
    filter.get.mightContainLong(b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    filter match {
      case Some(f) =>
        val ref = ctx.addReferenceObj("graftBloom", f,
          classOf[BloomFilter].getName)
        nullSafeCodeGen(ctx, ev, (_, b) => s"${ev.value} = $ref.mightContainLong($b);")
      case None => // null filter literal → null result, per the doc contract
        import org.apache.spark.sql.catalyst.expressions.codegen.Block._
        ev.copy(code =
          code"""
            boolean ${ev.isNull} = true;
            boolean ${ev.value} = false;""")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
