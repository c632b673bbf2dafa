package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Ordered-limit chunk pruning: `ORDER BY <key prefix> LIMIT n` over a
  * graft scan reads only the chunks that can contain the top n rows.
  *
  * Chunks are disjoint and sorted by key, so the n smallest full keys
  * live in the shortest chunk-list PREFIX whose row counts sum to ≥ n
  * (the n largest in the matching SUFFIX, for descending). The head /
  * tail query every debugging session runs — `ORDER BY k LIMIT 10` —
  * then opens one or two files at ANY table size instead of
  * sort-shuffling the whole relation.
  *
  * Sound also when the ordering is a strict PREFIX of the key columns:
  * rows outside the kept chunks have full keys beyond every kept row,
  * hence prefix values ≥ (≤, for desc) every kept row's — they can tie,
  * never sort strictly before, so the kept chunks always contain a
  * valid top-n set and Sort+Limit above the reduced scan stays a
  * correct answer. Sort columns resolve to relation columns by exprId
  * through the pruning chain ([[ScanChain]]) — a renaming alias can
  * never bind the wrong column. Mixed directions, non-key orders,
  * filters, or anything but column pruning between limit and scan
  * leave the plan untouched; the Sort/Limit nodes themselves remain
  * (they re-sort the few kept chunks — trivial). */
object LimitPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case gl @ GlobalLimit(Literal(n: Int, _),
        ll @ LocalLimit(_, st @ Sort(order, true, child, _))) if n > 0 =>
      pruned(order, child, n.toLong) match {
        case Some(newChild) =>
          gl.copy(child = ll.copy(child = st.copy(child = newChild)))
        case None => gl
      }
  }

  private def pruned(order: Seq[SortOrder], child: LogicalPlan,
      n: Long): Option[LogicalPlan] = for {
    s <- ScanChain.unapply(child)
    m = s.meta
    if order.nonEmpty && order.length <= m.keyCols.length
    // every sort expression is the matching key column, in key order
    if order.zipWithIndex.forall { case (so, i) =>
      s.columnOf(so.child).contains(m.keyCols(i))
    }
    directions = order.map(_.direction).distinct
    if directions.length == 1
    keep <- {
      val asc = directions.head == Ascending
      val cs = if (asc) m.chunks else m.chunks.reverse
      var acc = 0L
      val kept = cs.takeWhile { c =>
        val need = acc < n; acc += c.rows; need
      }
      val sel = if (asc) kept else kept.reverse
      // only worth rewriting when it actually prunes
      if (sel.length < m.chunks.length) Some(sel) else None
    }
  } yield s.withChunks(child, keep)
}
