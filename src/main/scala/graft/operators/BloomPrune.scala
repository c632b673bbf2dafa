package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-shuffle pruning for selective joins.
  *
  * When a fact table joins a filtered dimension whose surviving keys are
  * a small fraction, the shuffle ships every fact row only to discard
  * most at the join. Building a Bloom filter over the dim keys and
  * filtering the fact side BEFORE the exchange cuts shuffle volume by
  * roughly the join selectivity at the cost of one aggregation over the
  * (small) dim side — the runtime-filter technique Spark applies to
  * broadcast joins, available here for shuffle joins and for reuse
  * across multiple consumers.
  *
  * False positives only (never drops a matching row), so correctness of
  * the downstream join is unaffected; fpp trades filter size for
  * residual shuffle volume.
  */
object BloomPrune {

  /** Fact rows whose `factKey` might be present among `dimKeys`.
    * `expectedDim` sizes the filter; fpp defaults to 1%. */
  def prefilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedDim: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val bloom = dim.stat.bloomFilter(dimKey, expectedDim, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val pred: Column = fact.schema(factKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val might = udf { (k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k)
        }
        might(col(factKey).cast("long"))
      case StringType =>
        val might = udf { (k: String) =>
          k != null && bc.value.mightContainString(k)
        }
        might(col(factKey))
      case other => throw new IllegalArgumentException(
        s"bloom prefilter supports integral/string keys, got $other")
    }
    fact.where(pred)
  }

  /** Convenience: prefiltered equi-join (inner). The join itself is left
    * to Catalyst/AQE; only the fact side arrives pruned. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedDim: Long): DataFrame =
    prefilter(fact, factKey, dim, dimKey, expectedDim)
      .join(dim, col(factKey) === dim(dimKey))
}
