package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Bench-only scale-up: derives an sfN replica of an sf0.1 directory by
  * key-shifted replication, for the BASELINE.md scaling-factor measurement
  * (VERDICT r2 task 8). NOT test data — correctness still runs against the
  * driver-generated fixtures only.
  *
  * Shape-preserving by construction:
  *  - every scaled table expands IN PLACE via a broadcast `range(factor)`
  *    cross join (map-side, no shuffle, no union of N scans);
  *  - each key column shifts by `replica * cardinality` and every fact FK
  *    referencing a scaled table shifts by the SAME stride, so per-key join
  *    fan-out (lines per order, orders per customer, events per user) is
  *    identical to the source — a true horizontal scale-up, not key dilution;
  *  - `nation`/`region` copy unscaled (dimensions that do not grow with SF);
  *  - document text / embeddings replicate verbatim: the replica corpus
  *    deliberately carries cross-replica exact- and near-duplicate mass,
  *    which is precisely the load that stresses the LSH bucket-cap guard and
  *    the dedup pair-expansion paths the sf0.1 suite cannot see.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {

  /** Cardinalities of the sf0.1 key spaces (dense 0-based bigints; verified
    * against the fixtures). Strides use the table's own cardinality so
    * shifted key ranges tile without collision. */
  private val strides: Map[String, Long] = Map(
    "customer" -> 15000L, "orders" -> 150000L, "part" -> 20000L,
    "supplier" -> 1000L, "documents" -> 5000L, "embeddings" -> 2000L,
    "events" -> 100000L, "users" -> 1500L)

  private def replicate(spark: SparkSession, src: DataFrame, factor: Int,
                        shifts: Map[String, Long]): DataFrame = {
    val reps = broadcast(spark.range(factor.toLong).toDF("__r"))
    val exploded = src.crossJoin(reps)
    val shifted = shifts.foldLeft(exploded) { case (df, (colName, stride)) =>
      df.withColumn(colName, col(colName) + col("__r") * stride)
    }
    shifted.drop("__r")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = GraftSession.getOrCreate("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name -> $outDir/$name.parquet")
    }

    // fixed dimensions
    write("region", t("region"))
    write("nation", t("nation"))
    // scaled tables: own key + FKs to other scaled tables shift together
    write("customer", replicate(spark, t("customer"), factor,
      Map("c_custkey" -> strides("customer"))))
    write("supplier", replicate(spark, t("supplier"), factor,
      Map("s_suppkey" -> strides("supplier"))))
    write("part", replicate(spark, t("part"), factor,
      Map("p_partkey" -> strides("part"))))
    write("orders", replicate(spark, t("orders"), factor,
      Map("o_orderkey" -> strides("orders"), "o_custkey" -> strides("customer"))))
    write("lineitem", replicate(spark, t("lineitem"), factor,
      Map("l_orderkey" -> strides("orders"), "l_partkey" -> strides("part"),
          "l_suppkey" -> strides("supplier"))))
    write("documents", replicate(spark, t("documents"), factor,
      Map("doc_id" -> strides("documents"))))
    write("embeddings", replicate(spark, t("embeddings"), factor,
      Map("vec_id" -> strides("embeddings"))))
    // user_id stride = user cardinality, so events-per-user stays constant.
    // A TIMESTAMP(NANOS) fixture reads as a LONG of nanos (nanosAsLong);
    // writing it back raw would make the replica's column BIGINT — queries
    // survive, but the DuckDB oracles (written for a TIMESTAMP column)
    // would not. Round-trip through a micros timestamp so the replica
    // keeps the logical schema. A micros fixture already reads as a
    // timestamp type and passes through unchanged.
    val ev = replicate(spark, t("events"), factor,
      Map("event_id" -> strides("events"), "user_id" -> strides("users")))
    write("events", ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => ev
    })

    spark.stop()
  }
}
