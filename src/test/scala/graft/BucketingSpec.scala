package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join plans with no shuffle on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(
        spark.read.parquet(sf("orders")), "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(
        spark.read.parquet(sf("lineitem")).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // row parity with the plain join
      val plain = spark.read.parquet(sf("orders")).join(
        spark.read.parquet(sf("lineitem")),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
