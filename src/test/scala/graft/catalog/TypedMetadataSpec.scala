package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.ChromaFilter

/** Chroma's typed metadata (str/int/float/bool) on the MAP layout:
  * declared per-key types ([[Collection.declareMetadataTypes]] →
  * `meta:type:*` collection metadata) make the key resolver try_cast map
  * lookups, so `$eq` on an int compares as int and `$eq(flag, true)`
  * works at all. The flat typed-column layout needs none of this — its
  * parquet types ARE the declaration (ChromaFilterSpec covers that path). */
class TypedMetadataSpec extends SparkTestBase {

  private lazy val coll = {
    val cat = new CollectionCatalog(spark, tmpDir("typed-meta"))
    val c = cat.getOrCreateCollection("tm")
    c.add(spark.range(60).select(
      col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("embedding"),
      map(
        lit("stars"), (col("id") % 5).cast("string"),
        lit("score"), (col("id") % 7 / lit(2.0)).cast("string"),
        lit("flag"), (col("id") % 2 === 0).cast("string"),
        lit("note"), concat(lit("n"), col("id"))
      ).as("metadata")))
    c.declareMetadataTypes(Map(
      "stars" -> "long", "score" -> "double", "flag" -> "boolean"))
    c
  }

  test("$eq on a declared int key compares as int (not string)") {
    val ids = coll.get(where = Some(ChromaFilter.Eq("stars", 3)))
      .select("id").collect().map(_.getString(0).toLong).sorted
    assert(ids.toSeq == (0L until 60L).filter(_ % 5 == 3))
  }

  test("$gt on a declared int key is numeric — '10' > '9' territory") {
    // string comparison would put "4" > "10"; numeric must not
    val n = coll.get(where = Some(ChromaFilter.Gt("stars", 3))).count()
    assert(n == (0L until 60L).count(_ % 5 > 3))
  }

  test("$eq(flag, true) on a declared bool key works") {
    val n = coll.get(where = Some(ChromaFilter.Eq("flag", true))).count()
    assert(n == 30)
  }

  test("$lte on a declared double key compares numerically") {
    val n = coll.get(where = Some(ChromaFilter.Lte("score", 1.0))).count()
    assert(n == (0L until 60L).count(i => (i % 7) / 2.0 <= 1.0))
  }

  test("an UNdeclared key keeps the string-map semantics") {
    val n = coll.get(where = Some(ChromaFilter.Eq("note", "n7"))).count()
    assert(n == 1)
  }

  test("declared types survive a catalog reopen (meta.json round trip)") {
    val dir = tmpDir("typed-reopen")
    val c1 = new CollectionCatalog(spark, dir).getOrCreateCollection("r")
    c1.add(spark.range(10).select(col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("embedding"),
      map(lit("k"), (col("id") % 3).cast("string")).as("metadata")))
    c1.declareMetadataTypes(Map("k" -> "long"))
    val c2 = new CollectionCatalog(spark, dir).getCollection("r").get
    assert(c2.get(where = Some(ChromaFilter.Eq("k", 2))).count() == 3)
  }

  test("unsupported declared types fail loudly") {
    val e = intercept[IllegalArgumentException] {
      coll.declareMetadataTypes(Map("stars" -> "int128"))
    }
    assert(e.getMessage.contains("int128"))
  }

  test("an unparsable stored value just doesn't match (Chroma's typed semantics)") {
    val cat = new CollectionCatalog(spark, tmpDir("typed-garbage"))
    val c = cat.getOrCreateCollection("g")
    c.add(spark.range(4).select(col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("embedding"),
      map(lit("v"), when(col("id") < 2, col("id").cast("string"))
        .otherwise(lit("not-a-number"))).as("metadata")))
    c.declareMetadataTypes(Map("v" -> "long"))
    // ids 0,1 parse; 2,3 are garbage — they must neither match nor throw
    assert(c.get(where = Some(ChromaFilter.Gte("v", 0))).count() == 2)
  }
}
