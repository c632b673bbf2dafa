package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins.
  *
  * Spark 4's AQE splits skewed partitions for sort-merge joins at
  * runtime, which covers most cases; explicit salting remains the tool
  * when (a) the skew is in a shuffle HASH join AQE won't split, or
  * (b) the skewed side feeds an aggregation pipeline where the salt can
  * ride through a partial pre-aggregation. This helper implements the
  * classic transform: fact rows get a pseudo-random salt in [0, n), the
  * (small, replicable) side is exploded n× with every salt value, and
  * the join adds the salt to the key — each hot key's rows spread over
  * n shuffle partitions instead of one. Join RESULTS are independent of
  * salt values, so the pseudo-randomness does not affect determinism of
  * query output.
  */
object Skew {

  private val SALT = "_graft_salt"

  /** Inner/left-variant equi-join of a skewed `fact` side against a
    * replicable `dim` side on `keys`, spreading each fact key over
    * `buckets` salt values. `dim` is replicated `buckets`× — keep it
    * the small side. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // the dim side is replicated buckets×, so join types that emit
    // unmatched DIM rows (right/full outer) would duplicate them — only
    // fact-driven join types preserve plain-join semantics under salt
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter",
      "leftsemi", "semi", "leftanti", "anti").contains(normalized),
      s"saltedJoin supports fact-driven join types (inner/left/semi/anti), got $joinType")
    val salted = fact.withColumn(SALT,
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val replicated = dim.withColumn(SALT,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    val cond: Column = (keys :+ SALT)
      .map(k => salted(k) === replicated(k)).reduce(_ && _)
    val dupCols = (keys :+ SALT).map(replicated(_))
    dupCols.foldLeft(salted.join(replicated, cond, joinType))(_.drop(_))
      .drop(SALT)
  }
}
