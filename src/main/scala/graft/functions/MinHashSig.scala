package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel. Static-forwarder object (no companion class)
  * so generated code can call `graft.functions.MinHashKernel.eval(...)`.
  *
  * Bit-identity contract: uses the SAME spark-catalyst XXH64 statics the
  * builtin `xxhash64` expression dispatches to, composed exactly like the
  * higher-order form it replaces —
  * h(s) = hashUnsafeBytes(s, seed=42); rehash_i(h) = hashInt(i,
  * hashLong(h, 42)) (that is `xxhash64(h, lit(i))`'s child chain);
  * signature[i] = min over shingles. Per shingle the hashLong base is
  * computed once and the k rehashes are k hashInt finalizations — no
  * lambda dispatch, no intermediate arrays.
  */
object MinHashKernel {
  def eval(arr: ArrayData, k: Int): ArrayData = {
    if (k < 1) throw new IllegalArgumentException(
      s"graft_minhash: numHashes must be >= 1, got $k")
    val m = arr.numElements()
    // empty set -> all-null signature, matching array_min over an empty
    // transform result in the higher-order form
    if (m == 0) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) throw new IllegalArgumentException(
        s"graft_minhash: null shingle at index $j")
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      val base = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, base)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_minhash(shingle_set, numHashes)` — the per-document MinHash
  * signature: element i is min over the set of
  * `xxhash64(xxhash64(shingle), i)`, exactly the higher-order form
  *
  * {{{
  * array((0 until k).map(i =>
  *   array_min(transform(transform(set, s -> xxhash64(s)),
  *     h -> xxhash64(h, i)))))
  * }}}
  *
  * which pays k interpreted lambda dispatches PER SHINGLE plus k
  * intermediate arrays per row (k=64 in every LSH entry — measured as the
  * dominant signature-build cost of d3/d12/d18/t12/t38). Equality is
  * property-tested in MinHashSigSpec. Null semantics: null if either
  * input is null; empty sets produce an all-null signature (as the HOF
  * form does); null shingles fail loudly (shingleSets never emits them).
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure("graft_minhash requires a literal numHashes")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires (array<string>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashKernel.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHashKernel.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}
