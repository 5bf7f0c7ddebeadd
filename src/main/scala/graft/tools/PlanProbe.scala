package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = Seq((1L,2L),(2L,3L),(3L,1L)).toDF("src","dst")
      .repartition(8, col("src")).localCheckpoint()
    val shares = e.select(col("src").as("node"), col("dst"))
      .repartition(8, col("node")).localCheckpoint()
      .select(col("node").as("src"), col("dst").as("share"))
    val j = e.join(shares, "src")
    j.explain("formatted")
    spark.stop()
  }
}
