package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * pairwise near-dup detection (shingle Jaccard, embedding cosine, ...)
  * into "keep one representative per cluster" corpus dedup.
  *
  * Iterative min-label propagation WITH pointer jumping: each round
  * every node takes the minimum label among itself and its neighbors
  * (one shuffle join + aggregation), then shortcuts to its label's
  * label (one self-join) — the path-halving step that collapses chains,
  * bounding rounds at O(log diameter) instead of O(diameter). A
  * chain-of-n component converges in ~log2(n) rounds, so the 50-round
  * cap is unreachable for any physical graph (2^50 nodes). The driver
  * sees only a per-round checksum: labels are per-node monotone
  * non-increasing, so the label SUM is strictly decreasing until
  * fixpoint — no row-level change-detection join.
  */
object Components {

  /** `pairs` must have two numeric id columns `iCol` < `jCol` (each
    * undirected edge once). Returns (idName, cluster_id, sizeName):
    * every node of the graph labeled with its component's minimum id,
    * plus the component size; ordered by id. */
  def connectedComponents(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String, sizeName: String): DataFrame =
    connectedComponentsCounted(s, pairs, iCol, jCol, idName, sizeName)._1

  /** [[connectedComponents]] plus the ROUND COUNT it converged in — the
    * loop runs eagerly (per-round checksum actions), so the count is
    * exact at return. Exposed for the chain-graph scale pin
    * (ComponentsSpec): a 10k-node path must converge in O(log n) rounds
    * under path halving, where plain min-label propagation needs O(n)
    * and would hit the 50-round cap. */
  def connectedComponentsCounted(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String,
      sizeName: String): (DataFrame, Int) = {
    import s.implicits._
    // localCheckpoint (not cache): each round's state is REFERENCED
    // TWICE next round (propagate join + the path-halving self-join), so
    // an un-truncated lineage doubles every round — exponential plan
    // growth. Checkpointing cuts the plan at materialized blocks; the
    // per-round plan stays constant-size for any round count.
    // LAZY checkpoints where the NEXT action has a single path to the
    // frame (the checksum agg, which then materializes the checkpoint as
    // a side effect — one job instead of two); EAGER only where the next
    // job references the frame through TWO branches (lab1 feeds both
    // sides of the path-halving join — lazy there would compute each
    // partition twice, racing the cache).
    val edges = pairs.select(col(iCol).as("a"), col(jCol).as("b"))
      .union(pairs.select(col(jCol).as("a"), col(iCol).as("b")))
      .localCheckpoint(eager = false)
    // round-0 state folds the init INTO the first propagation: a node's
    // starting label is min(self, direct neighbors)
    var labels = edges.groupBy($"a".as("id"))
      .agg(least(min($"b"), first($"a")).as("lbl"))
      .localCheckpoint(eager = false)
    // checksum in DECIMAL(38,0): a LongType sum wraps at ~10^12 nodes
    // with 64-bit ids, and a wrapped collision could declare convergence
    // early; 38 digits hold any physical node count × id magnitude
    def checksum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum($"lbl".cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = checksum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val prop = edges.join(labels, $"a" === $"id")
        .select($"b".as("id"), $"lbl")
      val lab1 = labels.union(prop)
        .groupBy($"id").agg(min($"lbl").as("lbl"))
        .localCheckpoint()
      // path halving: lbl := lbl(lbl). Labels are node ids (every node
      // appears in `labels` — edges carry both directions), so the
      // jump target always resolves; left+coalesce keeps singletons of
      // the round-0 state safe anyway.
      val jump = lab1.select($"id".as("jid"), $"lbl".as("jlbl"))
      val next = lab1.join(jump, lab1("lbl") === jump("jid"), "left")
        .select(lab1("id"), coalesce($"jlbl", lab1("lbl")).as("lbl"))
        .localCheckpoint(eager = false)
      val s2 = checksum(next) // materializes next's checkpoint
      labels = next
      converged = s2.compareTo(prevSum) == 0
      prevSum = s2
      rounds += 1
    }
    val comp = labels.select($"id".as(idName), $"lbl".as("cluster_id"))
    val csz = comp.groupBy($"cluster_id").agg(count(lit(1)).as(sizeName))
    // no unpersist here: the returned plan reads the final checkpoint's
    // blocks lazily; intermediate round blocks are reclaimed by the
    // context cleaner once their RDDs go out of scope
    (comp.join(csz, "cluster_id")
      .select(col(idName), $"cluster_id", col(sizeName))
      .orderBy(col(idName)), rounds)
  }
}
