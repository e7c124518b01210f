package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension: per-key top-k as a NATIVE physical
  * operator — the rung of the extension ladder above expressions
  * ([[DotProduct]] etc.) and rewrite rules ([[ShardedTopK]]).
  *
  * Semantics: keep, for every distinct key, the first `k` rows of that key
  * under a TOTAL `ORDER BY` — exactly `row_number() OVER (PARTITION BY key
  * ORDER BY o) <= k`, minus the rank column.
  *
  * Why a physical operator when the window (and its [[ShardedTopK]]
  * two-phase rewrite) already exists: both window forms SHUFFLE EVERY INPUT
  * ROW and then fully SORT each partition — O(n log n) movement of the
  * whole table — because a window must see its partition sorted. The top-k
  * answer needs neither. [[TopKPerKeyExec]] runs a bounded heap per key
  * inside each map partition (O(n log k), no sort, no spill pressure from
  * sorting), so the exchange carries at most `mapPartitions × keys × k`
  * survivor rows instead of the corpus; a second heap pass after the
  * key-clustered exchange merges the partials exactly. At 100 TB the
  * difference is "shuffle everything twice-sorted" vs "shuffle almost
  * nothing" — the same partial-then-final shape Spark's own
  * `TakeOrderedAndProject` uses for the keyless case, generalized per key.
  *
  * Memory contract: each map task retains ≤ distinct-keys-in-partition × k
  * rows (never more than its input). For key cardinalities where keys × k
  * approaches partition size, the heap state stops paying for itself and
  * the (spillable, sort-based) window form is the right plan — this
  * operator targets the low/mid-cardinality hot-reducer case.
  *
  * The logical node is opaque to the optimizer, so project/filter BELOW it
  * before calling (the API takes the already-pruned child).
  * Planned by [[TopKPlan.Strategy]], injected via [[graft.GraftExtensions]].
  */
object TopKPlan {

  /** Logical marker: top `k` rows per `keys` under total order `order`. */
  case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                        child: LogicalPlan) extends UnaryNode {
    require(k > 0, "top-k needs k > 0")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
      copy(child = newChild)
  }

  /** Plans the logical node as final-over-partial heap execs;
    * `EnsureRequirements` inserts the key-clustered exchange between them
    * (the final's required distribution), so only partial survivors move.
    */
  class Strategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(keys, order, k, child) =>
        TopKPerKeyExec(keys, order, k, partial = false,
          TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** One heap pass: per distinct key, retain the k first rows under
    * `order`. `partial = true` runs map-side on arbitrary partitioning;
    * the final pass requires key-clustered input and is exact because the
    * global top-k of a key is contained in the union of its per-partition
    * top-ks under any total order.
    */
  case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                            k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override def outputPartitioning = child.outputPartitioning

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val keyExprs = keys
      val sortOrder = order
      val limit = k
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, schema)
        val rowOrdering = GenerateOrdering.generate(sortOrder, schema)
        // max-heap of each key's current worst row: O(log k) replace-top
        val heapOrdering = rowOrdering.reverse
        val heaps = new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          var heap = heaps.get(keyProj(row))
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapOrdering)
            heaps.put(keyProj(row).copy(), heap)
          }
          if (heap.size < limit) heap.add(row.copy())
          else if (rowOrdering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values.iterator.asScala.flatMap(_.iterator.asScala)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  /** Rule lifting the logical node out of its hint encoding: the public
    * `df.hint("graft_topk", k, "key:c", "asc:c" | "desc:c", ...)` surface
    * ([[graft.ops.Relational.nativeTopK]] builds it) becomes [[TopKPerKey]]
    * during resolution — hints are the one stable public seam for smuggling
    * a custom logical operator into a plan without private Spark APIs.
    */
  class ResolveTopKHint extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case h @ UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("graft_topk") && child.resolved =>
        val k = params.head match {
          case Literal(i: Int, _) => i
          case Literal(i: Long, _) => i.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk: first parameter must be a literal int k, got $other")
        }
        def attr(c: String): Attribute = child.output
          .find(_.name.equalsIgnoreCase(c)).getOrElse(throw new
            IllegalArgumentException(s"graft_topk: column $c not in ${child.output}"))
        val specs: Seq[String] = params.tail.map {
          case Literal(s, _) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_topk: expected 'key:c'/'asc:c'/'desc:c' strings, got $other")
        }
        val keys = specs.collect { case s if s.startsWith("key:") =>
          attr(s.stripPrefix("key:")) }
        val order = specs.collect {
          case s if s.startsWith("asc:") =>
            SortOrder(attr(s.stripPrefix("asc:")), Ascending)
          case s if s.startsWith("desc:") =>
            SortOrder(attr(s.stripPrefix("desc:")), Descending)
        }
        if (keys.isEmpty || order.isEmpty) h
        else TopKPerKey(keys, order, k, child)
    }
  }
}
