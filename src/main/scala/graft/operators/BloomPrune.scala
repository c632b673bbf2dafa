package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

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
  * Built from Catalyst's NATIVE bloom expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair Spark's
  * runtime row-level filtering injects — so the probe participates in
  * whole-stage codegen (no ScalaUDF boxing in the hot fact-side path;
  * pinned in NorthStarSpec). Above Spark's runtime-filter size caps
  * (~4M items / 8 MB by default) the native aggregate would silently
  * clamp and saturate, so larger dims build through the sketch
  * library instead — correct pruning first, codegen where it's safe.
  *
  * False positives only (never drops a MATCHING row), so INNER and
  * LEFT SEMI joins downstream are unaffected; fpp trades filter size
  * for residual shuffle volume. Do NOT prefilter the preserved side of
  * an outer join or an anti join — those must also emit the non-matching
  * rows this filter removes.
  */
object BloomPrune {

  private def family(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => "integral"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"bloom prefilter supports integral/string keys, got $other")
    }
  }

  /** Fact rows whose `factKey` might be present among `dimKeys`.
    * `expectedDim` sizes the filter; fpp defaults to 1%. */
  def prefilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedDim: Long, fpp: Double = 0.01): DataFrame = {
    // insert and probe must use the SAME representation: both sides
    // widen integrals to long (XxHash64 hashes int and long bytes
    // differently) and a filter built from string keys probed with
    // longs would silently drop every match
    val fam = family(fact.schema(factKey).dataType)
    require(fam == family(dim.schema(dimKey).dataType),
      s"fact key and dim key must share a type family, " +
        s"got ${fact.schema(factKey).dataType} vs ${dim.schema(dimKey).dataType}")
    def keyed(c: org.apache.spark.sql.Column) =
      if (fam == "integral") c.cast("long") else c
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedDim, fpp)
    // BloomFilterAggregate silently CLAMPS to the runtime-filter caps
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits)
    // — above them the filter saturates and pruning quietly stops.
    // There, build with the sketch library (honors the requested size)
    // and probe through a broadcast, trading codegen for correct
    // pruning economics at large dims.
    // caps from SQLConf's registered entries (session value or Spark's
    // own default) — a hardcoded fallback literal could diverge from
    // BloomFilterAggregate's internal clamp across Spark upgrades and
    // silently saturate large filters again
    val (maxItems, maxBits) = GraftBridge.bloomFilterCaps(fact.sparkSession)
    if (expectedDim <= maxItems && numBits <= maxBits) {
      val agg = new BloomFilterAggregate(
        new XxHash64(Seq(GraftBridge.expression(keyed(col(dimKey))))),
        Literal(expectedDim), Literal(numBits)).toAggregateExpression()
      val bytes = dim.select(GraftBridge.column(agg).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      if (bytes == null) fact.where(lit(false)) // empty dim: nothing joins
      else fact.where(GraftBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType),
        new XxHash64(Seq(GraftBridge.expression(keyed(col(factKey))))))))
    } else if (fam == "integral") {
      val bloom = dim.select(keyed(col(dimKey)).as(dimKey))
        .stat.bloomFilter(dimKey, expectedDim, fpp)
      val bc = fact.sparkSession.sparkContext.broadcast(bloom)
      val might = udf { (k: java.lang.Long) =>
        k != null && bc.value.mightContainLong(k)
      }
      fact.where(might(col(factKey).cast("long")))
    } else {
      val bloom = dim.stat.bloomFilter(dimKey, expectedDim, fpp)
      val bc = fact.sparkSession.sparkContext.broadcast(bloom)
      val might = udf { (k: String) =>
        k != null && bc.value.mightContainString(k)
      }
      fact.where(might(col(factKey)))
    }
  }

  /** Convenience: prefiltered equi-join (inner). The join itself is left
    * to Catalyst/AQE; only the fact side arrives pruned. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedDim: Long): DataFrame = {
    val pruned = prefilter(fact, factKey, dim, dimKey, expectedDim)
    // resolve both key references against their own plans so a shared
    // column name cannot become AMBIGUOUS_REFERENCE
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
