package graft.geo

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Expression-level optimizer rule: collapse an idempotent geometry
  * promote — `st_castto(st_castto(x, T), T)` re-parses the canonical
  * WKT the inner cast just printed, so the outer cast is a no-op
  * (promote of a T geometry to T is identity, printing is canonical,
  * null propagates). Spec-driven pipelines compose cleaners that can
  * produce this shape; at scan width the saved parse is real work. */
object CollapseRedundantGeoCast extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StCastTo(StCastTo(child, t1), t2) if t1.equalsIgnoreCase(t2) =>
        StCastTo(child, t1)
    }
}

/** SparkSessionExtensions wiring (SURVEY.md §7.3 escalation path (c)):
  * registers the geometry expressions as SQL functions and injects the
  * cast-collapse rule. Activate with
  * `.config("spark.sql.extensions", "graft.geo.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[StGeometryType].getName, name)

  /** Resolve a SQL argument that must be a foldable integral literal
    * (e.g. `shingle_set(text, 3)` — also accepts a BIGINT/SMALLINT
    * literal or cast). Non-foldable or non-integral arguments raise a
    * clear AnalysisException instead of a ClassCastException. */
  private def intArg(fn: String, e: Expression): Int = {
    def bad(what: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"$fn: second argument must be a foldable integer literal, got $what"))
    if (!e.foldable) bad(s"non-foldable expression ${e.sql}")
    (try e.eval() catch { case _: Exception => bad(s"unevaluable ${e.sql}") }) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => bad("NULL")
      case other => bad(s"${other.getClass.getSimpleName} $other")
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("st_geometrytype"), info("st_geometrytype"),
      (es: Seq[Expression]) => StGeometryType(es.head)))
    e.injectFunction((FunctionIdentifier("st_npoints"), info("st_npoints"),
      (es: Seq[Expression]) => StNPoints(es.head)))
    e.injectFunction((FunctionIdentifier("st_isvalid"), info("st_isvalid"),
      (es: Seq[Expression]) => StIsValid(es.head)))
    e.injectFunction((FunctionIdentifier("st_srid"), info("st_srid"),
      (es: Seq[Expression]) => StSrid(es.head)))
    // sketch/vector expressions (graft.functions) as SQL names too
    e.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (es: Seq[Expression]) => graft.functions.VecDot(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("vec_dist2"), info("vec_dist2"),
      (es: Seq[Expression]) => graft.functions.VecDist2(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => graft.functions.SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("vec_dist2_long"), info("vec_dist2_long"),
      (es: Seq[Expression]) => graft.functions.VecDist2Long(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("fingerprint64"), info("fingerprint64"),
      (es: Seq[Expression]) => graft.functions.Fingerprint64(es.head)))
    e.injectFunction((FunctionIdentifier("avg_token_len"), info("avg_token_len"),
      (es: Seq[Expression]) => graft.functions.AvgTokenLen(es.head)))
    // int-literal args resolved at registration (SQL: shingle_set(text, 3))
    e.injectFunction((FunctionIdentifier("shingle_set"), info("shingle_set"),
      (es: Seq[Expression]) => graft.functions.ShingleSet(es.head,
        intArg("shingle_set", es(1)))))
    e.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => graft.functions.MinHashSig(es.head,
        intArg("minhash_sig", es(1)))))
    e.injectFunction((FunctionIdentifier("create_ids"), info("create_ids"),
      (es: Seq[Expression]) => graft.functions.CreateIds(es.head, es(1))))
    e.injectOptimizerRule(_ => CollapseRedundantGeoCast)
    // materialized-summary rewrite (graft.plans): answers a
    // registered base table's exact-shape rollup from its persisted
    // summary frame — inert until SummaryRegistry.register
    e.injectOptimizerRule(_ => graft.plans.SummaryRewriteRule)
  }
}
