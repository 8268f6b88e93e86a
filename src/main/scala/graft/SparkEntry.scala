package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.{Collection, CollectionCatalog}
import graft.functions.{Distances, TextAnalysis}
import graft.operators.{Ann, Assemble, ChromaFilter, Dedup, Events, HashingEmbedder, Knn, Lm, Mixture, Multimodal, Retrieval, Sketches, Skew, TfIdfSrpEmbedder}

/** Driver contract — see /root/repo/SURVEY.md §2.D + the builder prompt.
  *
  * Every query has BOTH a Spark implementation (left column of SURVEY §2.D)
  * and a DuckDB oracle (right column, `oracleSql`). Column names and types
  * are aligned pairwise; floats are rounded to 4 decimals; money aggregates
  * are DECIMAL(18,4); all outputs carry a total ORDER BY on a unique key.
  * Distance arithmetic is done in Double with identical operation order on
  * both engines (sequential fold over array index), so hashes match bitwise.
  */
object SparkEntry extends QueriesStore with QueriesRelational with QueriesText with QueriesCuration with QueriesAnn with QueriesRetrieval with QueriesStreaming {

  /** Flagship: the reference's WHOLE life on sf0.001 — wide input (the
    * CAS-table shape, README.md:75) through the validated Hydrator config
    * path (A15 gates → A2/A4 assembly → A9/A10 collection add with count
    * conservation) into a Chroma-style filtered kNN read (B6+B7). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val root = "/root/repo/target/entry-collections"
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    // wide-ize: embeddings as emb_0..emb_63 columns, the reference's input shape
    val wideCols = (0 until 64).map(j => element_at(col("embedding"), j + 1).as(s"emb_$j"))
    docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id") +: col("text") +: col("label") +: wideCols: _*)
      .createOrReplaceTempView("entry_wide")
    new CollectionCatalog(spark, root).deleteCollection("flagship")
    val coll = Hydrator.run(spark, HydrateConfig(
      inputTable = "entry_wide", textVar = "text", docId = "doc_id",
      embeddingPattern = "emb_", metadataColumn = Some("label"),
      collectionName = "flagship",
      persistentPath = Hydrator.resolvePersistentPath(s"sasserver:$root"),
      space = "cosine")).get
    require(coll.count() == 500L, "hydration count conservation failed")
    coll.query(headVec(emb, 0), 10,
      where = Some(ChromaFilter.Ne("rating", "999")))
  }

  /** The driver contract: every family composed (names are globally
    * unique — the size assertion would fail the build on a clash). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val fams = Seq(storeQueries, relationalQueries, textQueries, curationQueries, annQueries, retrievalQueries, streamingQueries)
    val all = fams.reduce(_ ++ _)
    require(all.size == fams.map(_.size).sum, "duplicate query key across families")
    all
  }

  def oracleSql: Map[String, String] = {
    val fams = Seq(storeOracles, relationalOracles, textOracles, curationOracles, annOracles, retrievalOracles, streamingOracles)
    val all = fams.reduce(_ ++ _)
    require(all.size == fams.map(_.size).sum, "duplicate oracle key across families")
    all
  }
}
