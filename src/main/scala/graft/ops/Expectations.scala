package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the reference's audit
  * checks (duplicate-open-versions, FK violations, reject-with-reason;
  * `dso_import` §2.3/§2.8) generalized into a composable rule surface
  * (the deequ/dbt-tests shape): each rule names a contract, the
  * checker returns ONE row per rule with its exact violation count.
  *
  * Scale design: all ROW-LOCAL rules (not-null, range, accepted
  * values, regex) compile into a SINGLE aggregate over ONE scan of
  * the table — a `sum(when(violated, 1))` lane per rule, map-side
  * combined, shuffling one partial row per partition regardless of
  * input size (PlanSpec pins the one-scan shape). Set-wide rules add
  * the minimal keyed plan each needs: `unique` one count-aggregate
  * (map-side combinable; violations = Σ(cnt−1) so the number is
  * independent of partitioning), `foreignKey` one LEFT ANTI join
  * against the parent keys (broadcast when small — AQE's choice).
  * Null FK values are NOT violations (SQL semantics: a null FK is
  * absent, not dangling); null uniqueness keys group like values
  * (engines agree). */
object Expectations {

  /** A named expectation over a single table. */
  sealed trait Rule { def name: String }
  /** `col` must be non-null. */
  final case class NotNull(name: String, col: String) extends Rule
  /** `col` (when non-null) must sit in [lo, hi]. */
  final case class InRange(name: String, col: String, lo: Long,
    hi: Long) extends Rule
  /** `col` (when non-null) must be one of `values`. */
  final case class AcceptedValues(name: String, col: String,
    values: Seq[String]) extends Rule
  /** `col` (when non-null) must match `pattern` (Java regex,
    * full-match). */
  final case class MatchesRegex(name: String, col: String,
    pattern: String) extends Rule
  /** The column tuple must be unique across the table; each extra
    * copy of a duplicated tuple counts one violation. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Every non-null `col` value must appear in `parentCol` of
    * `parent` (referential integrity). */
  final case class ForeignKey(name: String, col: String,
    parent: DataFrame, parentCol: String) extends Rule
  /** `lhs` must determine `rhs` (a functional dependency): each lhs
    * tuple mapping to d > 1 distinct non-null rhs values counts d−1
    * violations (the extra images). Null rhs values are absent, not
    * violations — an all-null group contributes 0. */
  final case class FunctionalDependency(name: String,
    lhs: Seq[String], rhs: String) extends Rule
  /** `valueCol` must be non-decreasing per `keyCol` in `ordCol`
    * order (version counters, event timestamps): each row whose
    * predecessor's value exceeds its own counts one violation. The
    * SEQUENTIAL rule kind — rides the skew-safe lag, so a mega-key
    * entity never lands in one task. Null values never violate (in
    * either position); `ordCol` unique non-null per key. */
  final case class Monotone(name: String, keyCol: String,
    ordCol: String, valueCol: String) extends Rule
  /** The batch's ROW COUNT must sit in [lo, hi] — the empty/truncated
    * /runaway-batch guard, the most common production fail-fast (an
    * upstream outage usually shows up as a suspiciously small batch
    * long before any per-row rule fires). Violations = the distance
    * OUTSIDE the bound (shortfall below `lo`, overage above `hi`,
    * 0 in bounds) so the count says how far off the batch was, not
    * just that it was. One count aggregate, map-side combinable. */
  final case class SizeBetween(name: String, lo: Long,
    hi: Long) extends Rule
  /** Intervals [startCol, endCol) must not overlap per `keyCol` —
    * the SCD2 validity-range contract: a row violates when its start
    * precedes the MAX end of all earlier-starting rows (not just its
    * immediate predecessor — chained containment counts). `ordCol`
    * must be a start-major unique total order (start·K + tiebreak);
    * the prior-max rides the skew-safe running max + lag, so a hot
    * key never lands in one task. Null starts/ends never violate
    * (an open-ended interval is the SCD2 "current" row — callers
    * wanting open rows checked coalesce an end sentinel first). */
  final case class NonOverlapping(name: String, keyCol: String,
    ordCol: String, startCol: String, endCol: String) extends Rule

  private def violatedExpr(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case InRange(_, c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case AcceptedValues(_, c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case MatchesRegex(_, c, p) =>
      col(c).isNotNull && !col(c).rlike("^(?:" + p + ")$")
    case _ => throw new IllegalArgumentException(
      s"${r.name}: not a row-local rule")
  }

  /** Check every rule; returns (rule, violations), one row per rule,
    * in the given rule order (`rule_ord` carries it so callers can
    * ORDER BY deterministically). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "Expectations.check: duplicate rule names")
    val spark = df.sparkSession
    val ord = rules.map(_.name).zipWithIndex.toMap
    val rowLocal = rules.collect {
      case r @ (_: NotNull | _: InRange | _: AcceptedValues |
                _: MatchesRegex) => r
    }
    val local: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        // coalesce like the keyed lanes: on an EMPTY input frame
        // sum(when(..)) is null, and a null violation count would
        // make requireClean's `> 0` filter pass vacuously and
        // callers' getLong NPE (ADVICE r12)
        val aggs = rowLocal.map(r =>
          coalesce(sum(when(violatedExpr(r), 1L).otherwise(0L)),
            lit(0L)).as(s"__v_${ord(r.name)}"))
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val stackExpr = s"stack(${rowLocal.size}, " + rowLocal.map(r =>
          s"'${r.name}', `__v_${ord(r.name)}`").mkString(", ") +
          ") AS (rule, violations)"
        Some(wide.select(expr(stackExpr)))
      }
    val keyed: Seq[DataFrame] = rules.collect {
      case SizeBetween(n, lo, hi) =>
        df.agg(count(lit(1)).as("__c"))
          .select(lit(n).as("rule"),
            when(col("__c") < lo, lit(lo) - col("__c"))
              .when(col("__c") > hi, col("__c") - lit(hi))
              .otherwise(lit(0L)).as("violations"))
      case Unique(n, cs) =>
        df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case ForeignKey(n, c, parent, pc) =>
        df.filter(col(c).isNotNull).select(col(c).as("__fk"))
          .join(parent.select(col(pc).as("__fk")).distinct(),
            Seq("__fk"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case FunctionalDependency(n, lhs, rhs) =>
        df.groupBy(lhs.map(col): _*)
          .agg(countDistinct(col(rhs)).as("__cd"))
          .agg(coalesce(sum(greatest(col("__cd") - 1L, lit(0L))),
            lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case Monotone(n, k, o, v) =>
        EventAnalytics.lagSkewSafe(
            df.select(col(k), col(o), col(v)), k, o, v, "__prev")
          .agg(coalesce(sum(when(col("__prev") > col(v), 1L)
            .otherwise(0L)), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case NonOverlapping(n, k, o, st, en) =>
        // running max of ends (value-major start order), then the
        // EXCLUSIVE prefix via lag: prior-max at a row = max end of
        // all earlier-starting rows. Both stages slice on the SAME
        // ord, so the GK bounds are estimated once and shared
        // (VERDICT r12 #3 — one approxQuantile pass, not two)
        val sel = df.select(col(k), col(o), col(st), col(en))
        val gkb = Some(EventAnalytics.sliceBoundsFor(sel, o))
        val cm = EventAnalytics.runningAggsSkewSafe(sel, k, o,
          Seq((en, "max", "__cme")), bounds = gkb)
        EventAnalytics.lagSkewSafe(cm, k, o, "__cme", "__priorMax",
          bounds = gkb)
          .agg(coalesce(sum(when(col(st) < col("__priorMax"), 1L)
            .otherwise(0L)), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
    }
    val all = (local.toSeq ++ keyed).reduce(_ unionByName _)
    // single rule: both sides' `rule` columns are foldable literals,
    // so the ord-attach equi join would fold keyless (a BNL) — and
    // the ordinal is trivially 0 anyway
    if (rules.size == 1)
      return all.select(lit(0L).as("rule_ord"), col("rule"),
        col("violations"))
    val ordDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rules.map(r => org.apache.spark.sql.Row(r.name,
          ord(r.name).toLong)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("rule_ord",
          org.apache.spark.sql.types.LongType, nullable = false))))
    all.join(broadcast(ordDf), Seq("rule")) // ≤|rules| rows
      .select(col("rule_ord"), col("rule"), col("violations"))
  }

  /** Fail-fast gate for the streaming ingests: returns a
    * `validateBatch` function (`StreamingIngest.scd2Ingest` and
    * friends) that throws BEFORE any snapshot mutation when a rule is
    * violated, naming every failing rule with its count — the
    * reference's abort semantics driven by the declarative rules
    * instead of a hand-written predicate. Cost: [[check]]'s plan on
    * the micro-batch (one fused scan + the keyed rules), one
    * ≤|rules|-row collect. */
  def requireClean(rules: Seq[Rule]): DataFrame => Unit = { batch =>
    val bad = wouldAbort(batch, rules)
      .collect()
      .map(r => s"${r.getString(1)}=${r.getLong(2)}")
    require(bad.isEmpty,
      s"expectations failed: ${bad.mkString(", ")}")
  }

  /** The exact frame [[requireClean]] collects before deciding to
    * abort — the VIOLATED rules only, `(rule_ord, rule, violations)`
    * with violations > 0. Split out so the fail-fast decision row
    * set is itself a checkable query (an abort path a driver gate
    * can replay without catching a throw): empty result ⇔ the batch
    * passes; each row is one rule [[requireClean]] would name. */
  def wouldAbort(batch: DataFrame, rules: Seq[Rule]): DataFrame =
    check(batch, rules).filter(col("violations") > 0L)
}
