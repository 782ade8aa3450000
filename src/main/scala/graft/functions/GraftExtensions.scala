package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers graft's native Catalyst expressions as SQL functions.
  * Activated via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (GraftSession sets it; spark-submit can too — no code changes needed on
  * a real cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom whole-operator path: logical TopKPerGroup → partial+final exec
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // opt-in rewrite of window-row_number top-k into the custom operator
    ext.injectOptimizerRule(s => graft.plans.TopKRewriteRule(s))
    // honest-statistics broadcast hints: recover stage-free dim broadcasts
    // from EXACT parquet footer row counts (estimates lie; footers don't)
    ext.injectOptimizerRule(s => graft.plans.HonestBroadcastRule(s))
    // thin SQL façade over the lake engine: MERGE INTO graft.ns.t,
    // CREATE TABLE graft.ns.t AS ..., and graft.ns.t [VERSION AS OF n]
    // reads inside any query — everything else delegates verbatim
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    // side-effect-free resolution of graft.<ns>.<t> references: the parser
    // leaves them as (3- or 4-part) UnresolvedRelations; this rule resolves
    // them in the analyzer — no parse-time temp views (VERDICT r14 #2)
    ext.injectResolutionRule(s => graft.sql.GraftRelationRule(s))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => ShingleHashes(t)
        case Seq(t, n) => ShingleHashes(t, intArg(n, "graft_shingle_hashes"))
        case _ => throw new IllegalArgumentException("graft_shingle_hashes(text[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => MinHashSig(h)
        case Seq(h, k) => MinHashSig(h, intArg(k, "graft_minhash_sig"))
        case _ => throw new IllegalArgumentException("graft_minhash_sig(hashes[, k])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash64(t)
        case _ => throw new IllegalArgumentException("graft_simhash64(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "graft_fingerprint64"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => Fingerprint64(t)
        case _ => throw new IllegalArgumentException("graft_fingerprint64(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => DeflateLen(t)
        case _ => throw new IllegalArgumentException("graft_deflate_len(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Sq].getName, "graft_l2sq"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => L2Sq(a, b)
        case _ => throw new IllegalArgumentException("graft_l2sq(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_min_k"),
      new ExpressionInfo(classOf[BoundedMinK].getName, "graft_min_k"),
      (args: Seq[Expression]) => args match {
        case Seq(x, k) => BoundedMinK(x, intArg(k, "graft_min_k"))
        case _ => throw new IllegalArgumentException("graft_min_k(x, k)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("graft_cosine(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_row_sum"),
      new ExpressionInfo(classOf[WideRowSum].getName, "graft_row_sum"),
      (args: Seq[Expression]) => args match {
        case cols if cols.nonEmpty => WideRowSum(cols)
        case _ => throw new IllegalArgumentException("graft_row_sum(col, ...)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => HyperplaneSig(v)
        case Seq(v, b) => HyperplaneSig(v, intArg(b, "graft_hyperplane_sig"))
        case _ => throw new IllegalArgumentException("graft_hyperplane_sig(vec[, bits])")
      }))
  }
}
