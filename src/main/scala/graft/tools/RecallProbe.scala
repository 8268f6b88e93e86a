package graft.tools
import graft.{GraftSession, Recall}
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]").appName("recall-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Recall.measure(spark, if (args.nonEmpty) args(0) else "/root/testdata/sf0.1")
      .foreach { case (k, v) => println(f"RECALL $k $v%.3f") }
    spark.stop(); sys.exit(0)
  }
}
