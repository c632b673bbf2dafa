package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Shared plan-chain resolution for the metadata rewrites ([[MetaAgg]],
  * [[LimitPrune]]): walk a column-pruning chain (Projects of attributes
  * or attribute aliases, subquery aliases) down to a single graft-scan
  * relation, and resolve the chain's OUTPUT attributes to the
  * relation's COLUMN NAMES by exprId — never by name, because an alias
  * may rename (`SELECT v AS k`) and a name match would silently bind
  * the wrong column's metadata. */
private[core] object ScanChain {

  final case class Scan(lr: LogicalRelation, fs: HadoopFsRelation,
      index: GraftFileIndex, meta: TableMeta,
      /** exprId of an attribute visible ABOVE the chain → relation
        * column name. Attributes outside the map are not column refs. */
      names: Map[ExprId, String]) {
    def columnOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => names.get(a.exprId)
      case _ => None
    }
    /** The same chain with the relation reduced to a chunk subset —
      * output attributes unchanged, so references above stay valid. */
    def withChunks(plan: LogicalPlan, cs: Seq[ChunkMeta]): LogicalPlan =
      plan.transformUp {
        case l: LogicalRelation if l.eq(lr) =>
          l.copy(relation = fs.copy(location = index.withChunks(cs))(
            fs.sparkSession))
      }
  }

  /** `plan` iff it is NOTHING but column pruning/renaming over one
    * graft scan — no Filter, join, generator, or anything that changes
    * the row multiset. */
  def unapply(plan: LogicalPlan): Option[Scan] = plan match {
    case Project(exprs, child) if exprs.forall {
      case _: AttributeReference => true
      case Alias(_: AttributeReference, _) => true
      case _ => false
    } =>
      unapply(child).map { s =>
        val above = exprs.flatMap {
          case a: AttributeReference =>
            s.names.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(ar: AttributeReference, _) =>
            s.names.get(ar.exprId).map(al.exprId -> _)
        }.toMap
        s.copy(names = above)
      }
    case SubqueryAlias(_, child) => unapply(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex =>
          Some(Scan(lr, fs, g, g.tableMeta,
            lr.output.map(a => a.exprId -> a.name).toMap))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }
}
