package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Expand, Filter, Generate, GlobalLimit, Join, LeafNode, LocalLimit, LogicalPlan, Project, Repartition, Sort, SubqueryAlias, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Ordered-dump sort rewrite (optimization guide §2.4: "an `orderBy`
  * used only to make output deterministic" is the canonical accidental
  * exchange).
  *
  * Every driver-checkable query ends in a global `ORDER BY` over a
  * total order — the hash-compare contract, not a data-scale operator:
  * the ordered result is by construction driver-consumable (the driver
  * collects and hashes every row, and DuckDB replays the same ORDER
  * BY). A global sort plans as an `Exchange rangepartitioning(...)`,
  * and a range exchange must first SAMPLE its child to compute the
  * partition bounds — a separate Spark job that re-executes the whole
  * child plan up to the previous materialization point. For a
  * scan-shaped query (project/filter with no shuffle of its own) that
  * means every per-row expression — regex canonicalization, codec
  * work, hash sketches — runs TWICE per execution; for shuffle-shaped
  * queries it is still one extra job per query.
  *
  * This rule rewrites the dump sort to a single-partition local sort:
  *
  *   Sort(order, global = true, child)
  *     ==>  Sort(order, global = false, Repartition(1, shuffle, child))
  *
  * Row set and row order are IDENTICAL (the sort orders are total per
  * the oracle contract; a one-partition local sort IS a total order),
  * so query results and driver hashes are byte-unchanged — only the
  * physical plan differs: one round-robin exchange into one reduce
  * partition plus an in-partition sort, no sampling pass, no range
  * exchange. Upstream parallelism is untouched (the exchange boundary
  * keeps the child's own partitioning); only the final, output-sized
  * sort is single-task — exactly like the driver-side collect that
  * consumes it. Spark skips the round-robin determinism pre-sort for
  * numPartitions == 1 (SPARK-32820), so the exchange is a plain
  * gather.
  *
  * Deliberately NOT rewritten:
  *  - `Sort` directly under a `Limit` — planning turns
  *    `Limit(Sort(global))` into `TakeOrderedAndProject`, which is
  *    strictly better than any exchange; rewriting first would rob
  *    the top-k queries of that plan.
  *  - non-global sorts (`sortWithinPartitions`) — already local.
  *  - sorts whose child contains ANY exchange-inducing operator
  *    (aggregate, join, window, distinct, repartition...). Measured
  *    A/B (16-query subset, min-of-2 idle runs): for those shapes AQE
  *    has usually already coalesced the upstream shuffle to one
  *    partition, which satisfies the sort's required distribution
  *    outright — the trailing orderBy was ALREADY exchange-free, and
  *    adding a round-robin gather is a pure regression (+0.1..0.4 s
  *    per gate: q231/q246/q253/q260). The narrow (scan-shaped) class
  *    is where the sampling double-compute is real and the rewrite
  *    repeatably wins (q11 −0.27 s, q113 −0.31 s, q21 −0.12 s,
  *    q340 −0.18 s per gate) — so the rewrite fires ONLY when every
  *    node under the sort is a narrow operator (conservative
  *    whitelist; unknown node kinds disable the rewrite).
  *
  * Scale note (the 100 TB lens): this is a plan-shape choice for
  * ordered DUMPS, whose size is bounded by what a driver can hash —
  * not for sorting data-scale intermediates, which never pass through
  * a global Sort in this engine's operators. A deployment that truly
  * global-sorts large outputs can leave the rule unregistered (it is
  * opt-in per session via `experimental.extraOptimizations`, exactly
  * like [[SummaryRewriteRule]]). */
object OrderedDumpSortRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    // keep Limit(Sort) shapes intact for TakeOrderedAndProject —
    // recurse only below the protected sort
    case gl @ GlobalLimit(_, ll @ LocalLimit(_, s @ Sort(_, true, _, _))) =>
      gl.withNewChildren(Seq(ll.withNewChildren(Seq(
        s.withNewChildren(Seq(rewrite(s.child)))))))
    case ll @ LocalLimit(_, s @ Sort(_, true, _, _)) =>
      ll.withNewChildren(Seq(s.withNewChildren(Seq(rewrite(s.child)))))
    case s @ Sort(order, true, child, hint) if isNarrow(child) =>
      Sort(order, global = false,
        Repartition(1, shuffle = true, child), hint)
    case other => other.mapChildren(rewrite)
  }

  /** True when the subtree plans with no exchange of its own: a chain
    * of per-row operators over leaves — plus joins whose build side is
    * explicitly BROADCAST-hinted (the ops' `broadcast(...)` wrapping)
    * and whose streamed side is itself narrow: the streamed side never
    * shuffles, and the broadcast build is materialized once and
    * REUSED by the range sort's sampling pass, so the sampling job
    * re-runs the whole streamed scan — the same double-compute the
    * scan-shaped class pays. Whitelist, not blacklist — an operator
    * kind this rule has not reasoned about keeps the original global
    * sort. */
  private def isNarrow(p: LogicalPlan): Boolean = p match {
    case _: Project | _: Filter | _: Generate | _: Expand |
        _: Union | _: SubqueryAlias =>
      p.children.forall(isNarrow)
    case j: Join =>
      def bcast(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
        h.exists(_.strategy.contains(BROADCAST))
      (bcast(j.hint.leftHint) && isNarrow(j.right)) ||
        (bcast(j.hint.rightHint) && isNarrow(j.left))
    case _: LeafNode => true
    case _ => false
  }
}
