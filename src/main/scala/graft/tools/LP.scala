package graft.tools
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.core.{FsStore, Ops}
object LP {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops = new Ops(spark, new FsStore(java.nio.file.Files.createTempDirectory("g-").toString), 32)
    val schema = StructType(Seq(StructField("k",LongType,false),StructField("v",LongType)))
    val ref = ops.fromDataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 1500L).map(k=>Row(k,k*7)),8),schema),Seq("k"))
    val q = ops.scan(ref).orderBy(col("k")).limit(10)
    println("[lp] " + q.queryExecution.optimizedPlan.treeString.split("\n").take(6).mkString(" | "))
  }
}
