package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core._

/** Throwaway format-stability probe: prints the table hash of a fixed
  * deterministic dataset — run before/after canonicalization changes to
  * prove the canonical format did not drift. */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("hash-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    def build(target: Long, n: Int): String = {
      val store = new FsStore(Files.createTempDirectory("graft-probe-").toString)
      val ops = new Ops(spark, store, target)
      val rows = (0 until n).map(i => Row(f"key$i%06d", (i * 37L) % 1000))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 16), schema)
      ops.fromDataFrame(df, Seq("k")).hash
    }
    println(s"PROBE t16 n2000 ${build(16, 2000)}")
    println(s"PROBE t64 n20000 ${build(64, 20000)}")
    println(s"PROBE t1M n5000 ${build(1L << 20, 5000)}")
    spark.stop()
  }
}
