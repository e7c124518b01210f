package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic incremental reads: a registry of (table path → run-id window)
  * plus an analyzer rule that injects the watermark predicate into every
  * scan of a registered table — the engine-side version of the reference
  * sed-substituting `$MIN_RUN_ID_CURRENT`/`$MAX_RUN_ID_CURRENT` into each
  * stored query (`KafkaScript_ConformToStaging.sh:135-139`): here the
  * *queries stay unmodified* and the watermark discipline is enforced
  * centrally, so no job can forget its incremental filter.
  *
  * The rule runs at analysis time, so the injected predicate flows through
  * the whole optimizer: on a run-partitioned layer table
  * (graft.pipeline.Pipeline.writeRun) it becomes partition pruning — the
  * 100 TB table contributes only the new run's partitions to the scan.
  */
object IncrementalRead {

  final case class RunWindow(column: String, lo: Long, hi: Long)

  private val registry = TrieMap.empty[String, RunWindow]

  private def normalize(path: String): String =
    path.stripSuffix("/").replaceFirst("^file:", "")

  /** Register a watermark window for every subsequent read of `path`. */
  def setWindow(path: String, column: String, lo: Long, hi: Long): Unit =
    registry.put(normalize(path), RunWindow(column, lo, hi))

  def clearWindow(path: String): Unit = registry.remove(normalize(path))
  def clearAll(): Unit = registry.clear()

  private[plans] def windowFor(paths: Seq[String]): Option[RunWindow] =
    paths.map(normalize).flatMap(registry.get).headOption

  private val Injected = TreeNodeTag[Boolean]("graft.watermark.injected")

  /** Analyzer rule: wrap registered file relations in the watermark filter.
    * Tag-guarded for fixpoint idempotence.
    */
  class InjectWatermark extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case rel: LogicalRelation if rel.getTagValue(Injected).isEmpty =>
        rel.relation match {
          case fs: HadoopFsRelation =>
            windowFor(fs.location.rootPaths.map(_.toString)) match {
              case Some(w) =>
                rel.output.find(_.name.equalsIgnoreCase(w.column)) match {
                  case Some(attr) =>
                    rel.setTagValue(Injected, true)
                    Filter(And(
                      GreaterThanOrEqual(attr, Literal(w.lo)),
                      LessThanOrEqual(attr, Literal(w.hi))), rel)
                  case None => rel
                }
              case None => rel
            }
          case _ => rel
        }
    }
  }
}
