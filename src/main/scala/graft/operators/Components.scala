package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * pairwise near-dup detection (shingle Jaccard, embedding cosine, ...)
  * into "keep one representative per cluster" corpus dedup.
  *
  * Iterative min-label propagation: each round every node takes the
  * minimum label among itself and its neighbors — ONE shuffle join +
  * one aggregation per round, fully distributed; converges in
  * O(component diameter) rounds (near-dup clusters are small and
  * dense). The driver sees only a per-round checksum: labels are
  * per-node monotone non-increasing, so the label SUM is strictly
  * decreasing until fixpoint — no row-level change-detection join. If a
  * pathological graph chained deep components, the large-star/
  * small-star rewrite (same join shape) bounds rounds at O(log n).
  */
object Components {

  /** `pairs` must have two numeric id columns `iCol` < `jCol` (each
    * undirected edge once). Returns (idName, cluster_id, sizeName):
    * every node of the graph labeled with its component's minimum id,
    * plus the component size; ordered by id. */
  def connectedComponents(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String, sizeName: String): DataFrame = {
    import s.implicits._
    val edges = pairs.select(col(iCol).as("a"), col(jCol).as("b"))
      .union(pairs.select(col(jCol).as("a"), col(iCol).as("b")))
      .cache()
    // round-0 state folds the init INTO the first propagation: a node's
    // starting label is min(self, direct neighbors)
    var labels = edges.groupBy($"a".as("id"))
      .agg(least(min($"b"), first($"a")).as("lbl"))
      .cache()
    var prevSum = labels.agg(sum($"lbl")).first().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val prop = edges.join(labels, $"a" === $"id")
        .select($"b".as("id"), $"lbl")
      val next = labels.union(prop)
        .groupBy($"id").agg(min($"lbl").as("lbl"))
        .cache()
      val s2 = next.agg(sum($"lbl")).first().getLong(0)
      labels.unpersist()
      labels = next
      converged = s2 == prevSum
      prevSum = s2
      rounds += 1
    }
    val comp = labels.select($"id".as(idName), $"lbl".as("cluster_id"))
    val csz = comp.groupBy($"cluster_id").agg(count(lit(1)).as(sizeName))
    val out = comp.join(csz, "cluster_id")
      .select(col(idName), $"cluster_id", col(sizeName))
      .orderBy(col(idName))
    edges.unpersist()
    out
  }
}
