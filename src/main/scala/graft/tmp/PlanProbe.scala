package graft.tmp
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    println("=== ReusedExchange: " + p.contains("ReusedExchange"))
    println("=== FileScan count: " + p.sliding("FileScan".length).count(_ == "FileScan"))
    println(p)
  }
}
