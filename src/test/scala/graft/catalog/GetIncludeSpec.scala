package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Chroma's `include=` projection contract on the long-form get, made
  * SCAN-real: the include set must reach the parquet ReadSchema, not just
  * the output column list. At 100 TB the embedding column is the bulk of
  * the store — a documents+metadatas page that still reads embeddings
  * would be a silent 10–50× IO regression invisible to value-level specs. */
class GetIncludeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val coll = {
    val cat = new CollectionCatalog(spark, tmpDir("get-include"))
    val c = cat.getOrCreateCollection("inc", "cosine")
    c.add(spark.range(200).select(
      col("id").cast("string").as("id"),
      array((0 until 8).map(i => (col("id") * (i + 1) % 97).cast("float") / 97f): _*)
        .as("embedding"),
      concat(lit("doc "), col("id")).as("document"),
      when(col("id") % 2 === 0, "en").otherwise("fr").as("lang"),
      (col("id") % 5).cast("int").as("stars")))
    c
  }

  private def readSchemaOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
  }

  test("documents+metadatas get prunes the embedding column from the scan") {
    val page = coll.get(limit = Some(10),
      include = Some(Set("documents", "metadatas")))
    assert(page.columns.toSeq == Seq("id", "document", "lang", "stars"))
    val rs = readSchemaOf(page)
    assert(rs.nonEmpty && !rs.contains("embedding"),
      s"embedding must not be read for a documents+metadatas get: $rs")
    assert(rs.contains("document") && rs.contains("lang"))
  }

  test("a filter column is still read, but only to gate rows — not returned") {
    val page = coll.get(where = Some(graft.operators.ChromaFilter.Eq("lang", "en")),
      limit = Some(5), include = Some(Set("documents")))
    assert(page.columns.toSeq == Seq("id", "document"))
    assert(page.count() == 5)
    val rs = readSchemaOf(page)
    assert(!rs.contains("embedding"), s"embedding read for a documents get: $rs")
  }

  test("include embeddings keeps the column; default include=None keeps everything") {
    val withEmb = coll.get(limit = Some(3), include = Some(Set("embeddings")))
    assert(withEmb.columns.toSeq == Seq("id", "embedding"))
    val full = coll.get(limit = Some(3))
    assert(full.columns.toSet == Set("id", "embedding", "document", "lang", "stars"))
  }

  test("getStruct pushes its include down — struct path never reads embeddings") {
    val s = coll.getStruct(limit = Some(10),
      include = Set("documents", "metadatas"))
    val rs = readSchemaOf(s)
    assert(rs.nonEmpty && !rs.contains("embedding"),
      s"getStruct(documents+metadatas) must not read embeddings: $rs")
    val row = s.collect().head
    assert(row.getSeq[String](row.fieldIndex("ids")).size == 10)
  }

  test("unknown include entries fail loudly") {
    val e = intercept[IllegalArgumentException] {
      coll.get(include = Some(Set("documents", "distnaces")))
    }
    assert(e.getMessage.contains("distnaces"))
  }
}
