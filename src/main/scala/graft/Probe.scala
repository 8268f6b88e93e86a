package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke runner for the driver contract surface (SparkEntry.entry).
  * Mirrors how the driver smoke-checks the flagship query: rows > 0.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(10, false)
    println(s"ENTRY ROWS: ${df.count()}")
    // drive it twice: entry must be idempotent (re-hydrates the collection)
    val df2 = SparkEntry.entry(spark)
    println(s"ENTRY ROWS 2ND RUN: ${df2.count()}")
    spark.stop()
  }
}
