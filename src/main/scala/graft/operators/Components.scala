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
  *
  * Storage is BOUNDED across rounds: each round explicitly frees the
  * superseded round's checkpoint blocks (no waiting on the
  * ContextCleaner), so retained state is one label generation plus the
  * edge list regardless of round count. Durability at real-cluster
  * scale: every `spark.graft.cc.durableEvery` rounds the state anchors
  * through a RELIABLE checkpoint, and a mid-loop job failure (lost
  * executor holding local-checkpoint blocks) resumes from the anchor —
  * at most k−1 rounds replay instead of the whole job dying.
  */
object Components {

  /** `pairs` must have two numeric id columns `iCol` < `jCol` (each
    * undirected edge once). Returns (idName, cluster_id, sizeName):
    * every node of the graph labeled with its component's minimum id,
    * plus the component size; ordered by id. */
  def connectedComponents(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String, sizeName: String): DataFrame =
    connectedComponentsCounted(s, pairs, iCol, jCol, idName, sizeName)._1

  /** Every `durableEvery`-th round writes the label state through a
    * RELIABLE checkpoint (HDFS/S3 in a real deployment — set
    * `spark.sparkContext.setCheckpointDir`; a local temp dir is minted
    * when unset) instead of executor-block local checkpointing. This is
    * the real-cluster survival lever: local checkpoints truncate lineage
    * into executor memory/disk blocks, so ONE lost executor kills the
    * whole iterative job; with a durable anchor every k rounds, recovery
    * replays at most k−1 rounds. Conf `spark.graft.cc.durableEvery`
    * (default 8; ≤0 disables — the label-prop loop converges in
    * O(log diameter) rounds, so near-dup graphs rarely reach round 8 and
    * pay nothing locally). */
  private def durableEvery(s: SparkSession): Int =
    try s.conf.get("spark.graft.cc.durableEvery", "8").toInt
    catch { case _: NumberFormatException => 8 }

  /** Test seam: throw once at the START of the given (0-based) round,
    * simulating a lost-executor job failure mid-loop; cleared on fire. */
  @volatile private[operators] var injectRoundFailure: Option[Int] = None

  /** Observability seam: recoveries taken by the most recent
    * [[connectedComponentsCounted]] call (normally 0). */
  @volatile private[graft] var lastRecoveries: Int = 0

  /** [[connectedComponents]] plus the ROUND COUNT it converged in — the
    * loop runs eagerly (per-round checksum actions), so the count is
    * exact at return. Exposed for the chain-graph scale pin
    * (ComponentsSpec): a 10k-node path must converge in O(log n) rounds
    * under path halving, where plain min-label propagation needs O(n)
    * and would hit the 50-round cap. */
  def connectedComponentsCounted(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String,
      sizeName: String): (DataFrame, Int) = {
    val (raw, rounds) =
      connectedComponentsRaw(s, pairs, iCol, jCol, idName, sizeName)
    (raw.orderBy(col(idName)), rounds)
  }

  /** [[connectedComponentsCounted]] WITHOUT the final global sort — for
    * consumers that re-aggregate or re-sort anyway (keep-best selection
    * materializes the cluster table once; sorting it first is a wasted
    * full exchange+sort of corpus-proportional rows). */
  def connectedComponentsRaw(s: SparkSession, pairs: DataFrame,
      iCol: String, jCol: String, idName: String,
      sizeName: String): (DataFrame, Int) = {
    import s.implicits._
    import org.apache.spark.sql.GraftBridge
    val sc = s.sparkContext
    val durableK = durableEvery(s)
    def ensureCheckpointDir(): Unit =
      if (sc.getCheckpointDir.isEmpty) {
        // minted locally (no user-set dir): register for JVM-exit
        // deletion so bench/test reruns never accumulate checkpoint
        // data in tmp; a deployment that set its own (HDFS/S3) dir is
        // never touched
        val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-")
        graft.core.FsUtil.deleteAtExit(dir)
        sc.setCheckpointDir(dir.toString)
      }
    // localCheckpoint (not cache) on the loop-carried state: `labels` is
    // REFERENCED TWICE next round (propagate join + the union), so an
    // un-truncated lineage doubles every round — exponential plan
    // growth. Checkpointing cuts the plan at materialized blocks; the
    // per-round plan stays constant-size for any round count. LAZY
    // checkpoints throughout: each round's ONE action (the checksum agg)
    // materializes them as a side effect. Recovery rebuilds `edges` from
    // the caller's plan (its lineage is intact), so edges itself can
    // stay local.
    def buildEdges(): DataFrame =
      pairs.select(col(iCol).as("a"), col(jCol).as("b"))
        .union(pairs.select(col(jCol).as("a"), col(iCol).as("b")))
        .localCheckpoint(eager = false)
    var edges = buildEdges()
    // round-0 state folds the init INTO the first propagation: a node's
    // starting label is min(self, direct neighbors)
    def buildInit(): DataFrame = edges.groupBy($"a".as("id"))
      .agg(least(min($"b"), first($"a")).as("lbl"))
      .localCheckpoint(eager = false)
    var labels = buildInit()
    // checksum in DECIMAL(38,0): a LongType sum wraps at ~10^12 nodes
    // with 64-bit ids, and a wrapped collision could declare convergence
    // early; 38 digits hold any physical node count × id magnitude
    def checksum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum($"lbl".cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = checksum(labels)
    var converged = false
    var rounds = 0
    // the latest durable anchor: (frame, its checksum, its round) —
    // recovery resumes here; its checkpoint FILES are deleted when a
    // newer anchor lands (and at exit, unless the anchor IS the final
    // state), so at most one durable generation is retained
    var anchor: Option[(DataFrame, java.math.BigDecimal, Int)] = None
    var recoveries = 0
    while (!converged && rounds < 50) {
      try {
        injectRoundFailure.filter(_ == rounds).foreach { _ =>
          injectRoundFailure = None
          throw new org.apache.spark.SparkException(
            "injected round failure (test seam)")
        }
        val durable = durableK > 0 && (rounds + 1) % durableK == 0
        val prop = edges.join(labels, $"a" === $"id")
          .select($"b".as("id"), $"lbl")
        // lab1 is NOT checkpointed: its lineage is constant-depth (labels
        // and edges are materialized checkpoints), and its groupBy
        // EXCHANGE is canonically identical under both path-halving
        // branches, so exchange reuse computes the propagate join once —
        // the only duplicated work is the post-shuffle final aggregation,
        // cheaper than a second job barrier per round (the eager
        // checkpoint this replaces).
        val lab1 = labels.union(prop)
          .groupBy($"id").agg(min($"lbl").as("lbl"))
        // path halving: lbl := lbl(lbl). Labels are node ids (every node
        // appears in `labels` — edges carry both directions), so the
        // jump target always resolves; left+coalesce keeps singletons of
        // the round-0 state safe anyway.
        val jump = lab1.select($"id".as("jid"), $"lbl".as("jlbl"))
        val next0 = lab1.join(jump, lab1("lbl") === jump("jid"), "left")
          .select(lab1("id"), coalesce($"jlbl", lab1("lbl")).as("lbl"))
        val next =
          if (durable) { ensureCheckpointDir(); next0.checkpoint(eager = false) }
          else next0.localCheckpoint(eager = false)
        val s2 = checksum(next) // materializes next's checkpoint
        // round t is materialized — round t−1's blocks are superseded;
        // free them NOW instead of waiting on the nondeterministic
        // ContextCleaner (bounded retained storage for any round count)
        GraftBridge.freeCheckpoint(labels)
        if (durable) {
          anchor.foreach { case (a, _, _) =>
            GraftBridge.cleanReliableCheckpoint(sc, a) }
          anchor = Some((next, s2, rounds + 1))
        }
        labels = next
        converged = s2.compareTo(prevSum) == 0
        prevSum = s2
        rounds += 1
      } catch {
        case scala.util.control.NonFatal(e) if recoveries < 2 =>
          anchor match {
            case Some((a, aSum, aRound)) =>
              // lost-executor recovery: local blocks (edges, recent
              // label rounds) may be gone — rebuild edges from the
              // caller's intact lineage and resume from the durable
              // anchor's files; at most k−1 rounds replay. The round
              // counter REWINDS to the anchor's round, so the returned
              // count stays the exact propagation depth and a recovery
              // near the 50-round cap replays its full distance instead
              // of exiting with stale anchor labels.
              recoveries += 1
              edges = buildEdges()
              labels = a
              prevSum = aSum
              rounds = aRound
              converged = false
            case None => throw e
          }
      }
    }
    lastRecoveries = recoveries
    require(converged,
      s"connected components did not converge within the 50-round cap " +
        s"($rounds rounds run) — pathological graph or repeated failures")
    GraftBridge.freeCheckpoint(edges) // the returned plan reads only labels
    // at exit the anchor is superseded by later local rounds unless it
    // IS the final state (converged exactly on a durable round) — clean
    // its files in the superseded case; the temp checkpoint dir itself
    // is deleted at JVM exit
    anchor.foreach { case (a, _, _) =>
      if (!(a eq labels)) GraftBridge.cleanReliableCheckpoint(sc, a) }
    val comp = labels.select($"id".as(idName), $"lbl".as("cluster_id"))
    val csz = comp.groupBy($"cluster_id").agg(count(lit(1)).as(sizeName))
    (comp.join(csz, "cluster_id")
      .select(col(idName), $"cluster_id", col(sizeName)), rounds)
  }
}
