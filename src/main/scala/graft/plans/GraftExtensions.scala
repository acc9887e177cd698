package graft.plans

import graft.functions.{BloomContains, DotProduct, KGramFold31, NfcNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`): registers the native
  * expressions so SQL and `call_function` resolve them. Library code
  * (e.g. [[graft.llm.Similarity.dot]]) detects registration on the active
  * session and falls back to built-in higher-order functions when the
  * extension is absent, so nothing hard-depends on it.
  */
object GraftExtensions {
  /** Whether a graft native function is registered on the ACTIVE session —
    * the one probe library code uses before choosing `call_function` over
    * the higher-order fallback. Centralized so a change to the detection
    * rule applies to every native/fallback fork at once.
    */
  def isInstalled(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists(name))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kgram31"),
      new ExpressionInfo(classOf[KGramFold31].getName, "graft_kgram31"),
      (children: Seq[Expression]) => KGramFold31(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => BloomContains(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    // free necessary-condition guard for levenshtein thresholds (see rule)
    ext.injectOptimizerRule(_ => new LevenshteinPrefilter)
  }
}
