package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. AQE on, shuffle partitions sized to cores (not 200)
  * so small-stage scheduling overhead doesn't dominate local runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/IO paths once so the first timed query doesn't
    // absorb session startup (~3s otherwise); touches each bench input.
    Seq("documents", "embeddings", "lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // SPARK_GRAFT_BENCH_RUNS > 1 repeats the suite and keeps per-query MIN
    // (steady-state timing, less JIT/IO noise); default 1 = driver behavior
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt
    val results = (1 to runs).map { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }.reduce { (a, b) =>
      a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
