package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Quiet A/B for agg_approx_distinct (VERDICT r14 #1a): the r14
  * tagged-union single KMV chain (inline below) vs the two-chain + join
  * shape (the DECLARED query — round 15 reverted to it after this tool
  * measured two-chain faster in 8/8 quiet interleaved reps, min 2.20 s
  * vs 2.45 s, corroborating the driver's 1.39 → 2.00 s). Interleaved
  * reps in one process, min + all samples printed. */
object KmvProfile {
  private val KmvK = 256
  private val KmvNum: Long = (KmvK - 1).toLong * (1L << 52)
  private val KmvSalts = 64

  /** The r14 tagged-union single-chain shape (reverted in round 15). */
  def taggedUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables(s, dir, "lineitem")
    val h = li
      .select($"l_returnflag", lit("p").as("t"),
        $"l_partkey".cast("long").as("v"))
      .unionByName(li.select($"l_returnflag", lit("o").as("t"),
        $"l_orderkey".cast("long").as("v")))
      .distinct()
      .select($"l_returnflag", $"t",
        conv(substring(md5($"v".cast("string")), 1, 13), 16, 10)
          .cast("long").as("h")).distinct()
    val nd = h.groupBy($"l_returnflag", $"t").agg(count(lit(1)).as("nd"))
    val bySalt = Window
      .partitionBy($"l_returnflag", $"t", pmod($"h", lit(KmvSalts)))
      .orderBy($"h")
    val cand = h.withColumn("rn", row_number().over(bySalt))
      .where($"rn" <= KmvK)
    val hk = cand.groupBy($"l_returnflag", $"t")
      .agg(get(array_sort(collect_list($"h")), lit(KmvK - 1)).as("hk"))
    val est = nd.join(hk, Seq("l_returnflag", "t"))
      .select($"l_returnflag", $"t",
        when($"nd" < KmvK, $"nd")
          .otherwise(expr(s"${KmvNum}L div hk")).as("est"))
    est.groupBy($"l_returnflag").pivot("t", Seq("p", "o"))
      .agg(first($"est"))
      .select($"l_returnflag", $"p".as("approx_parts"),
        $"o".as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").cache().count(): Unit

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "tagged-union (r14 shape)" -> (() => taggedUnion(spark, sfDir)),
      "two-chain+join (declared)" ->
        (() => graft.queries.Sketches.aggApproxDistinct(spark, sfDir)))

    def steal(): Long =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")), "UTF-8")
        .linesIterator.next().trim.split("\\s+")(8).toLong
      catch { case _: Throwable => -1L }

    // warm both shapes once (JIT/codegen), then interleave timed reps
    variants.foreach { case (_, f) => f().count(): Unit }
    val samples = scala.collection.mutable.Map.empty[String, Vector[(Double, Long)]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { i =>
      variants.foreach { case (label, f) =>
        val s0 = steal()
        val t0 = System.nanoTime()
        f().count(): Unit
        val sec = (System.nanoTime() - t0) / 1e9
        val sd = if (s0 < 0) -1 else steal() - s0
        samples(label) = samples(label) :+ ((sec, sd))
        println(f"rep $i [$label%-30s] $sec%6.3f s  steal=${sd}cs")
      }
    }
    samples.foreach { case (label, ss) =>
      println(f"== $label%-30s min ${ss.map(_._1).min}%6.3f s  " +
        f"samples ${ss.map(s => f"${s._1}%.3f").mkString(", ")}")
    }
    spark.stop()
  }
}
