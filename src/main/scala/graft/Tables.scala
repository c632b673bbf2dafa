package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts arrives as either parquet TIMESTAMP(NANOS) (older
      // generators; Spark surfaces it as int64 under nanosAsLong) or
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (newer generators;
      // Spark reads TIMESTAMP_NTZ). Normalize both to a session-TZ
      // timestamp — the session is pinned UTC, so wall-clock values
      // match what DuckDB yields for the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Widen a NARROW frame for per-row-expensive downstream work (LSH
    * signatures, per-gram digests, all-pairs dot products): a small
    * single-file parquet table plans as ONE scan task — and a session
    * cache built over it pins that single partition — so the expensive
    * projection runs single-threaded while the rest of the machine
    * idles (guide §2.5 "input skew — one huge unsplittable file ...
    * repartition immediately after the read"). Gated on the frame's
    * planned partition count: at real scale inputs arrive as thousands
    * of splits and this is the identity — it never coalesces an
    * already-parallel frame. Applied ONLY at sites whose downstream
    * per-row work measurably dominates (a blanket widen of the shared
    * sim/dedup caches was measured NET-NEGATIVE: three heavy consumers
    * won 3 s but ten cheap/iterative consumers paid ~0.2-1.7 s each in
    * added per-stage task overhead). Round-robin repartition is
    * deterministic (sort-before-repartition is on by default,
    * SPARK-23207), and every consumer is key-agg/join/sorted-output
    * shaped, so results are unchanged.
    *
    * The gate reads the planned partition count from the logical plan /
    * FileIndex ([[org.apache.spark.sql.GraftBridge.plannedScanPartitions]])
    * — never `df.rdd`, which compiles a second physical plan per call
    * and under AQE would execute upstream shuffle stages just to read
    * the count (ADVICE r14). Unrecognized shapes (anything with a
    * shuffle/join below) are treated as already-parallel: identity. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val planned =
      org.apache.spark.sql.GraftBridge.plannedScanPartitions(spark, df)
    if (planned.exists(_ < math.max(2, p / 2))) df.repartition(p) else df
  }
}
