package graft

import org.apache.spark.sql.functions._

import graft.catalog.{Collection, CollectionCatalog}
import graft.expressions.GraftExtensions
import graft.operators.HashingEmbedder

/** The DataFrame-returning SQL TABLE functions (`graft_bm25`,
  * `graft_hybrid`): a pure-SQL user drives the same collection read
  * paths — same plans, same gates — as a Scala caller. Pins: SQL ≡ API
  * equality for both functions, analyzer-aware query tokenization
  * through the SQL route, and loud failures on non-literal arguments
  * and unknown collections. */
class TableFunctionSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    ("1", "spark joins hash joins and more joins"),
    ("2", "hash tables back the hash join"),
    ("3", "stream processing with watermarks"),
    ("4", "sort merge join versus hash join under skew"))

  private def mkColl(root: String, name: String,
                     analyzer: Option[String] = None): Collection = {
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection(name, space = "cosine",
      metadata = analyzer.map(Collection.AnalyzerKey -> _).toMap)
    c.addDocuments(corpus.toDF("id", "document"), HashingEmbedder(8))
    c.buildKeywordIndex()
    c
  }

  test("graft_bm25 from SQL equals keywordTopK from the API") {
    val root = tmpDir("tvf-bm25")
    val c = mkColl(root, "k")
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM graft_bm25('$root', 'k', 'hash joins stream', 5)")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    val viaApi = c.keywordTopK(Seq("hash", "joins", "stream"), 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("graft_hybrid from SQL equals queryHybridText from the API") {
    val root = tmpDir("tvf-hyb")
    val c = mkColl(root, "h")
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hybrid('$root', 'h', 'hash joins', 3, 4)")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaApi = c.queryHybridText("hash joins", k = 3, fetchN = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaSql.toSet == viaApi.toSet && viaSql.nonEmpty)
  }

  test("graft_bm25 tokenizes the SQL query text with the collection's analyzer") {
    val root = tmpDir("tvf-ana")
    // punctuated corpus under the simple analyzer: a punctuated SQL query
    // must match — and would match NOTHING under whitespace tokens
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("a",
      metadata = Map(Collection.AnalyzerKey -> "simple"))
    c.add(Seq(("1", "Hash, joins!"), ("2", "streams.")).toDF("id", "document"))
    c.buildKeywordIndex()
    GraftExtensions.register(spark)
    val hits = spark.sql(
      s"SELECT id FROM graft_bm25('$root', 'a', 'HASH! (joins)', 2)")
      .collect().map(_.getString(0)).toSeq
    assert(hits == Seq("1"))
  }

  test("graft_bm25 where JSON: the SQL filter equals the Scala where") {
    val root = tmpDir("tvf-where")
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("w")
    c.add(Seq(
      ("1", "hash join", "en"), ("2", "hash hash", "fr"),
      ("3", "join scan", "en")).toDF("id", "document", "lang"))
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"""SELECT id, rnk, score FROM graft_bm25('$root', 'w', 'hash join', 5,
         |  '{"lang": "en"}')""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    val viaScala = c.keywordTopK(Seq("hash", "join"), 5,
        where = Some(graft.operators.ChromaFilter.Eq("lang", "en")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(viaSql == viaScala && viaSql.map(_._1).toSet == Set("1", "3"))
    // malformed JSON fails loudly at analysis
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$root', 'w', 'hash', 5, '{\"a\": }')").collect()
    }
    assert(bad.getMessage.contains("filter JSON"))
  }

  test("graft_rerank: the SQL three-stage path equals the Scala call") {
    val root = tmpDir("tvf-rr")
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("r", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join stream"), ("2", "hash table"), ("3", "join scan"),
      ("4", "stream hash")).toDF("id", "document"),
      graft.operators.HashingEmbedder(8))
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"SELECT id, rnk, score FROM graft_rerank('$root', 'r', 'hash join', 3, 4)")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    val viaScala = c.queryRerankText("hash join", k = 3,
        graft.operators.OverlapRerank(), fetchN = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(viaSql == viaScala && viaSql.head._1 == "1") // both terms hit doc 1
  }

  test("graft_knn from SQL equals queryText from the API, filters included") {
    val root = tmpDir("tvf-knn")
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("n", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join stream", "en"), ("2", "hash table scan", "fr"),
      ("3", "join scan probe", "en"), ("4", "stream hash state", "en"))
      .toDF("id", "document", "lang"), HashingEmbedder(8))
    GraftExtensions.register(spark)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    // plain: recorded-embedding kNN through SQL ≡ the Scala call
    val viaSql = rows(spark.sql(
      s"SELECT id, rnk, dist FROM graft_knn('$root', 'n', 'hash join', 3)"))
    val viaApi = rows(c.queryText(Seq("hash join"), k = 3)
      .select("id", "rnk", "dist"))
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // where JSON confines eligibility; '' skips a slot
    val filtered = rows(spark.sql(
      s"""SELECT id, rnk, dist FROM graft_knn('$root', 'n', 'hash join', 3,
         |  '{"lang": "en"}')""".stripMargin))
    val filteredApi = rows(c.queryText(Seq("hash join"), k = 3,
        where = Some(graft.operators.ChromaFilter.Eq("lang", "en")))
      .select("id", "rnk", "dist"))
    assert(filtered == filteredApi && !filtered.map(_._1).contains("2"))
    // whereDoc JSON in the trailing slot, where slot skipped with ''
    val docf = rows(spark.sql(
      s"""SELECT id, rnk, dist FROM graft_knn('$root', 'n', 'hash join', 3,
         |  '', '{"$$contains": "scan"}')""".stripMargin))
    val docfApi = rows(c.queryText(Seq("hash join"), k = 3,
        whereDoc = Some(graft.operators.ChromaFilter.Contains("scan")))
      .select("id", "rnk", "dist"))
    assert(docf == docfApi && docf.map(_._1).toSet == Set("2", "3"))
  }

  test("graft_maxsim from SQL equals queryMaxSimText from the API") {
    val root = tmpDir("tvf-ms")
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("m", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join stream hash"), ("2", "hash table scan"),
      ("3", "join join stream"), ("4", "stream stream hash join"))
      .toDF("id", "document"), HashingEmbedder(8))
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"SELECT id, score FROM graft_maxsim('$root', 'm', 'hash join', 3, 4)")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaApi = c.queryMaxSimText("hash join", k = 3, fetchN = 4)
      .select("id", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("graft_knn analysis-time failures are loud") {
    val root = tmpDir("tvf-knn-err")
    mkColl(root, "k") // keyword-only fixture: NO recorded embedding function?
    GraftExtensions.register(spark)
    // mkColl uses addDocuments → has an embedding function; a collection
    // hydrated via plain add has none — queryText's gate must fire
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val bare = cat.getOrCreateCollection("bare")
    bare.add(Seq(("1", "x")).toDF("id", "document"))
    val noEf = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_knn('$root', 'bare', 'x', 1)").collect()
    }
    assert(noEf.getMessage.contains("embedding function"))
    val nonLit = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_knn('$root', 'k', 'hash', 1 + 1)").collect()
    }
    assert(nonLit.getMessage.contains("integer literal"))
    val missing = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_knn('$root', 'nope', 'hash', 5)").collect()
    }
    assert(missing.getMessage.contains("no collection"))
    val badJson = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_knn('$root', 'k', 'hash', 5, '{\"a\": }')").collect()
    }
    assert(badJson.getMessage.contains("filter JSON"))
    // a where_document operator passed in the WHERE slot fails loudly
    // (the ChromaFilter shorthand gate), pointing at the right slot
    val wrongSlot = intercept[Exception] {
      spark.sql(
        s"""SELECT * FROM graft_knn('$root', 'k', 'hash', 5,
           |  '{"$$contains": "x"}')""".stripMargin).collect()
    }
    assert(wrongSlot.getMessage.contains("where_document"))
  }

  test("non-literal arguments and unknown collections fail loudly") {
    val root = tmpDir("tvf-err")
    mkColl(root, "k")
    GraftExtensions.register(spark)
    val nonLit = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$root', 'k', 'hash', 1 + 1)").collect()
    }
    assert(nonLit.getMessage.contains("integer literal"))
    val missing = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$root', 'nope', 'hash', 5)").collect()
    }
    assert(missing.getMessage.contains("no collection"))
  }
}
