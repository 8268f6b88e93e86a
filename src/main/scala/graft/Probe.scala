package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke/plan runner for the driver contract surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.headOption match {
      case Some("plans") =>
        Seq("q06_filter_range", "q11_knn_cosine", "q15_knn_batch",
            "q20_tpch_q1", "q21_topk_per_nation", "q30_minhash_candidates").foreach { q =>
          println(s"========== $q ==========")
          SparkEntry.queries(q)(spark, dir).explain("formatted")
        }
      case _ =>
        val df = SparkEntry.entry(spark)
        df.show(10, false)
        println(s"ENTRY ROWS: ${df.count()}")
        val df2 = SparkEntry.entry(spark)
        println(s"ENTRY ROWS 2ND RUN: ${df2.count()}")
    }
    spark.stop()
  }
}
