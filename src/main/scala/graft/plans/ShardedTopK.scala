package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: rewrite a rank-filtered window partitioned by a LONE
  * low-cardinality column into the exact two-phase sharded form of
  * [[graft.ops.Relational.groupTopK]].
  *
  * `row_number() OVER (PARTITION BY lang ORDER BY ...) <= k` funnels the
  * whole input into one reducer per language — the hot-reducer shape that
  * dies at 100 TB. Because the global top-k of a group is always contained
  * in the union of its per-shard top-ks, the window can be split into a
  * per-(group, hash shard) rank-and-cut (shards× the parallelism, each
  * reducer sees ~1/shards of the group) followed by the ORIGINAL window
  * over the ≤ shards×k survivors — bit-equal output for any total order,
  * and the original window's attribute ids are preserved so downstream
  * references are untouched.
  *
  * Opt-in by configuration, the way a site declares its dimension-like
  * columns once instead of rewriting every ad-hoc query:
  *
  *  - `spark.graft.topk.lowCardCols` — comma-separated column names the
  *    rule may treat as low-cardinality group keys (empty = rule off);
  *  - `spark.graft.topk.shards` — phase-1 shard count (default 64).
  *
  * Matched shape: `Filter(rank <= k | rank < k | rank = 1, [Project],
  * Window(row_number as rank, partition by ONE listed column, order))`.
  * The rank bound must be the ENTIRE filter condition (a conjunct that
  * also references other columns could filter survivors phase 1 already
  * dropped — those rewrites are left alone).
  */
object ShardedTopK {

  private val LowCardColsKey = "spark.graft.topk.lowCardCols"
  private val ShardsKey = "spark.graft.topk.shards"

  class RewriteRankFilter extends Rule[LogicalPlan] {

    private def lowCardCols: Set[String] =
      SQLConf.get.getConfString(LowCardColsKey, "")
        .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

    private def shards: Int =
      SQLConf.get.getConfString(ShardsKey, "64").toInt

    /** The filter bound `rank <= k` in its accepted spellings; returns k. */
    private def rankBound(cond: Expression, rank: Attribute): Option[Int] =
      cond match {
        case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k)
        case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k - 1)
        case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rank) => Some(k)
        case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rank) => Some(1)
        case EqualTo(IntegerLiteral(1), a: Attribute)
          if a.semanticEquals(rank) => Some(1)
        case _ => None
      }

    /** Already-rewritten guard: phase 1 leaves a Filter on `__r1` directly
      * beneath the (projected) original window child.
      */
    private def isPhase1(plan: LogicalPlan): Boolean = plan match {
      case Project(_, Filter(_, w: Window)) =>
        w.windowExpressions.exists(_.name == "__r1")
      case _ => false
    }

    /** row_number / rank / dense_rank are all two-phase-safe: a row's
      * per-shard rank never exceeds its global rank (its in-shard
      * predecessors are a subset of its global predecessors), so cutting
      * each shard at k keeps every row whose global rank ≤ k; and every
      * row strictly better than a global-top-k row is itself global-top-k,
      * so re-ranking the survivors reproduces the global ranks exactly.
      * Phase 1 MUST reuse the SAME ranking function — a row_number cut
      * under an original rank() would drop tied rows that globally tie
      * into the top k.
      */
    private def rankLike(fn: Expression): Boolean = fn match {
      case RowNumber() | Rank(_) | DenseRank(_) => true
      case _ => false
    }

    private def eligible(w: Window): Option[(Alias, Attribute)] = w match {
      case Window(Seq(a @ Alias(WindowExpression(fn, _), _)),
          Seq(p: Attribute), order, child, _)
        if rankLike(fn) && order.nonEmpty &&
          lowCardCols.contains(p.name.toLowerCase) &&
          !isPhase1(child) => Some((a, p))
      case _ => None
    }

    /** Phase 1: shard on the hash of the full row's order expressions +
      * group, rank within (group, shard), keep k, project the shard and
      * rank away again so the original window slots on top unchanged.
      */
    private def phase1(w: Window, k: Int): LogicalPlan = {
      val fn = w.windowExpressions.head match {
        case Alias(WindowExpression(f, _), _) => f
        case other => throw new IllegalStateException(s"unexpected $other")
      }
      val orderExprs = w.orderSpec.map(_.child)
      // hash of (group, order exprs): stable per row, spreads each group
      // across shards; ties hash together, which is safe — phase 1 keeps
      // k of them wherever they land.
      val shardAlias = Alias(
        Pmod(new XxHash64(w.partitionSpec ++ orderExprs),
          Literal(shards.toLong)), "__shard")()
      val withShard = Project(w.child.output :+ shardAlias, w.child)
      val spec = WindowSpecDefinition(
        w.partitionSpec :+ shardAlias.toAttribute, w.orderSpec,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
      val r1 = Alias(WindowExpression(fn, spec), "__r1")()
      val win1 = Window(Seq(r1), w.partitionSpec :+ shardAlias.toAttribute,
        w.orderSpec, withShard)
      val cut = Filter(LessThanOrEqual(r1.toAttribute, Literal(k)), win1)
      Project(w.child.output, cut)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (lowCardCols.isEmpty) return plan
      plan.transformUp {
        case f @ Filter(cond, w: Window) =>
          (for {
            (rankAlias, _) <- eligible(w)
            k <- rankBound(cond, rankAlias.toAttribute)
          } yield f.copy(child = w.copy(child = phase1(w, k)))).getOrElse(f)
        case f @ Filter(cond, p @ Project(_, w: Window)) =>
          (for {
            (rankAlias, _) <- eligible(w)
            k <- rankBound(cond, rankAlias.toAttribute)
          } yield f.copy(child =
            p.copy(child = w.copy(child = phase1(w, k))))).getOrElse(f)
      }
    }
  }
}
