package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.expressions.HashEmbed
import graft.operators.{ChromaFilter, Embedder, HashingEmbedder, Retrieval}

/** The server-side embedding surface (`add(documents=...)` /
  * `query(query_texts=...)`) and the MMR re-rank: hash-embedder
  * determinism + distributed-vs-driver parity, the collection function
  * binding, zero-vector rejection, and the greedy MMR trace. */
class EmbedderSpec extends SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): CollectionCatalog = {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ef-test").toString
    new CollectionCatalog(spark, root, numBuckets = 4)
  }

  // ---- HashEmbed / HashingEmbedder ----

  test("embedText (distributed) == embedOne (driver) on varied inputs") {
    val ef = HashingEmbedder(8)
    val texts = Seq(
      "the quick brown fox", "  leading and   multiple   spaces ",
      "tabs\tand\nnewlines", "UPPER Mixed loWer", "one", "",
      "café über naïve", "a b a b a")
    val dist = texts.toDF("t")
      .select(ef.embedText(col("t")).as("v")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val drv = texts.map(t => ef.embedOne(t).toSeq)
    assert(dist == drv)
  }

  test("embedding is signed-count valued, dim-wide, tokenization-exact") {
    val ef = HashingEmbedder(4)
    val v = ef.embedOne("x y x")
    assert(v.length == 4)
    // integral values, |sum of magnitudes| ≤ token count
    assert(v.forall(f => f == f.toInt.toFloat))
    assert(v.map(f => math.abs(f.toInt)).sum <= 3)
    // whitespace runs and empties don't contribute
    assert(ef.embedOne(" x  y \t x \n") == v)
    // case-insensitive
    assert(ef.embedOne("X Y x") == v)
  }

  test("HashEmbed matches the documented strhash/bucket/sign arithmetic") {
    def strhash(s: String): Long =
      s.zipWithIndex.map { case (c, i) => c.toLong * (((i * 131) % 997) + 1) }.sum
    val dim = 8
    val tok = "fox"
    val h = strhash(tok)
    val expected = Array.fill(dim)(0f)
    expected((h % dim).toInt) = if ((h / dim) % 2 == 0) 1f else -1f
    assert(HashEmbed.embed(tok, dim).toSeq == expected.toSeq)
  }

  test("embedText stays inside whole-stage codegen; SQL surface registered") {
    val ef = HashingEmbedder(8)
    val df = spark.range(100).selectExpr("CAST(id AS STRING) AS t")
      .select(ef.embedText(col("t")).as("v"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val unstarred = p.linesIterator
      .filter(l => l.contains(" Project [") || l.startsWith("Project ["))
      .filterNot(_.contains(") Project ["))
    assert(unstarred.isEmpty,
      s"embedding projection fell out of whole-stage codegen:\n$p")
    // native SQL function surface (the q44 route), live-session registration
    graft.expressions.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_hash_embed(lower('A b A'), 4) AS v")
      .head().getSeq[Float](0).toSeq
    assert(viaSql == HashingEmbedder(4).embedOne("A b A").toSeq)
  }

  test("Embedder.fromName round-trips and rejects unknown names") {
    val ef = HashingEmbedder(32)
    assert(Embedder.fromName(ef.name) == ef)
    intercept[IllegalArgumentException](Embedder.fromName("all-MiniLM-L6-v2"))
    intercept[IllegalArgumentException](Embedder.fromName("graft-hash-v1/abc"))
  }

  // ---- collection binding ----

  test("addDocuments embeds, records the binding, and queryText round-trips") {
    val coll = freshCatalog().getOrCreateCollection("ef", space = "cosine")
    val docs = Seq(
      ("1", "spark shuffles partitions", "en"),
      ("2", "ducks swim on the pond", "en"),
      ("3", "spark shuffles partitions wildly", "en"),
      ("4", "rien ne va plus", "fr")).toDF("id", "document", "lang")
    coll.addDocuments(docs, HashingEmbedder(16))
    assert(coll.meta.metadata("embedding_function") == "graft-hash-v1/16")
    assert(coll.count() == 4)
    // stored vectors are the embedder's output
    val stored = coll.get(ids = Seq("2")).select("embedding")
      .head().getSeq[Float](0).toSeq
    assert(stored == HashingEmbedder(16).embedOne("ducks swim on the pond"))
    // querying WITH the exact text of doc 1 must rank doc 1 first (cosine 0)
    val hits = coll.queryText(Seq("spark shuffles partitions"), k = 2)
      .orderBy("rnk").select("id").as[String].collect()
    assert(hits.head == "1")
    // prefilter composes
    val fr = coll.queryText(Seq("rien ne va"), k = 4,
      where = Some(ChromaFilter.Eq("lang", "fr")))
    assert(fr.select("id").as[String].collect().toSeq == Seq("4"))
  }

  test("a second addDocuments with a different function is rejected") {
    val coll = freshCatalog().getOrCreateCollection("ef2", space = "cosine")
    coll.addDocuments(Seq(("1", "a b c")).toDF("id", "document"), HashingEmbedder(8))
    val e = intercept[IllegalArgumentException] {
      coll.addDocuments(Seq(("2", "d e f")).toDF("id", "document"), HashingEmbedder(16))
    }
    assert(e.getMessage.contains("bound to embedding function"))
    // same function is fine
    coll.addDocuments(Seq(("2", "d e f")).toDF("id", "document"), HashingEmbedder(8))
    assert(coll.count() == 2)
  }

  test("queryText without a recorded function fails loudly") {
    val coll = freshCatalog().getOrCreateCollection("ef3", space = "cosine")
    coll.add(Seq(("1", "doc", Seq(1f, 2f))).toDF("id", "document", "embedding"))
    val e = intercept[IllegalStateException](coll.queryText(Seq("doc"), k = 1))
    assert(e.getMessage.contains("no registered embedding function"))
  }

  test("cosine-space zero-vector documents are rejected pre-commit") {
    val coll = freshCatalog().getOrCreateCollection("ef4", space = "cosine")
    // whitespace-only text → no tokens → zero vector
    val e = intercept[Exception] {
      coll.addDocuments(Seq(("1", "ok doc"), ("2", "   ")).toDF("id", "document"),
        HashingEmbedder(8))
    }
    assert(e.getMessage.contains("zero vector"))
    // the rejected version was abandoned: nothing committed, and NO
    // function binding left behind on the empty collection
    assert(coll.count() == 0)
    assert(!coll.meta.metadata.contains("embedding_function"))
    // ...so a retry with a different function is allowed
    coll.addDocuments(Seq(("1", "ok doc")).toDF("id", "document"), HashingEmbedder(16))
    assert(coll.meta.metadata("embedding_function") == "graft-hash-v1/16")
    // l2 space admits the zero-vector batch (distance defined everywhere)
    val l2 = freshCatalog().getOrCreateCollection("ef5", space = "l2")
    l2.addDocuments(Seq(("1", "ok doc"), ("2", "   ")).toDF("id", "document"),
      HashingEmbedder(8))
    assert(l2.count() == 2)
  }

  test("null documents are rejected pre-commit in EVERY space") {
    // a null document embeds to a null vector (HashEmbed is null-safe),
    // and null distances sort NULLS FIRST under ascending kNN order —
    // one committed null row would poison the top-k of every later
    // query. chromadb's add() raises on None documents the same way.
    for (space <- Seq("cosine", "l2", "ip")) {
      val coll = freshCatalog().getOrCreateCollection(s"nd-$space", space = space)
      val batch = Seq(("1", Some("ok doc")), ("2", None))
        .toDF("id", "document")
      val e = intercept[Exception](coll.addDocuments(batch, HashingEmbedder(8)))
      assert(e.getMessage.contains("null"), s"space=$space got: ${e.getMessage}")
      // abandoned pre-commit: nothing served, no binding left behind
      assert(coll.count() == 0)
      assert(!coll.meta.metadata.contains("embedding_function"))
    }
  }

  test("addDocuments rejects a function whose dim mismatches existing vectors") {
    val coll = freshCatalog().getOrCreateCollection("ef6", space = "cosine")
    coll.add(Seq(("1", "doc", Seq(1f, 2f))).toDF("id", "document", "embedding"))
    val e = intercept[IllegalArgumentException] {
      coll.addDocuments(Seq(("2", "more")).toDF("id", "document"), HashingEmbedder(8))
    }
    assert(e.getMessage.contains("dim"))
    assert(coll.count() == 1)
  }

  test("queryText rejects a zero-vector query text in cosine space") {
    val coll = freshCatalog().getOrCreateCollection("ef7", space = "cosine")
    coll.addDocuments(Seq(("1", "a b c")).toDF("id", "document"), HashingEmbedder(8))
    val e = intercept[IllegalArgumentException](coll.queryText(Seq("   "), k = 1))
    assert(e.getMessage.contains("zero vector"))
  }

  // ---- MMR ----

  // ---- fitted TF-IDF × SRP embedder ----

  private def fitCorpus = Seq(
    ("1", "spark shuffle join exchange"),
    ("2", "spark broadcast join"),
    ("3", "vector database index search"),
    ("4", "vector search recall"),
    ("5", "the the the spark the")).toDF("id", "document")

  test("TfIdfSrpEmbedder.fit: deterministic vocab (df desc, token asc), quantized idf, portable signs") {
    import graft.operators.TfIdfSrpEmbedder
    val ef = TfIdfSrpEmbedder.fit(fitCorpus, "document", dim = 8, vocabSize = 4)
    val m = ef.model
    assert(m.nDocs == 5)
    // df: spark=3, join=2, search=2, vector=2, everything else 1 →
    // top-4 by (df desc, token asc) = spark, join, search, vector
    assert(m.terms.toSeq == Seq("spark", "join", "search", "vector"))
    // idfQ = round(1000*(ln((5+1)/(df+1))+1))
    assert(m.idfQ.toSeq == Seq(
      Math.round(1000 * (math.log(6.0 / 4) + 1)).toInt,
      Math.round(1000 * (math.log(6.0 / 3) + 1)).toInt,
      Math.round(1000 * (math.log(6.0 / 3) + 1)).toInt,
      Math.round(1000 * (math.log(6.0 / 3) + 1)).toInt))
    // signs replay from the engine-portable polynomial
    assert(m.signs(0).toSeq ==
      (0 until 8).map(j => graft.expressions.TfIdfModel.signOf("spark", j)))
    // model round-trips through the sidecar text form
    val ef2 = Embedder.fromModelText(ef.modelText)
    assert(ef2.name == ef.name)
    assert(ef2.embedOne("spark vector join") == ef.embedOne("spark vector join"))
    // fit caps are loud
    intercept[IllegalArgumentException](
      TfIdfSrpEmbedder.fit(fitCorpus, "document", 8, TfIdfSrpEmbedder.MaxVocab + 1))
  }

  test("fitted embedText (distributed) == embedOne (driver); out-of-vocab and tf behave") {
    import graft.operators.TfIdfSrpEmbedder
    val ef = TfIdfSrpEmbedder.fit(fitCorpus, "document", dim = 8, vocabSize = 4)
    val texts = Seq("spark SPARK shuffle", "vector search", "nothing matches here", "")
    val dist = texts.toDF("t").select(ef.embedText(col("t")).as("v"))
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    val drv = texts.map(t => ef.embedOne(t).toSeq)
    assert(dist == drv)
    // tf folds: "spark spark" = 2 × "spark" vector
    val one = ef.embedOne("spark")
    assert(ef.embedOne("spark spark").toSeq == one.map(_ * 2).toSeq)
    // fully out-of-vocab text embeds to the zero vector
    assert(ef.embedOne("nothing matches here").forall(_ == 0f))
  }

  test("fitted function round-trips through the collection: sidecar persisted, reopened session resolves it") {
    import graft.operators.TfIdfSrpEmbedder
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("ft", "cosine")
    val ef = TfIdfSrpEmbedder.fit(fitCorpus, "document", dim = 8, vocabSize = 4)
    c.addDocuments(fitCorpus, ef)
    assert(c.meta.metadata("embedding_function") == ef.name)
    val hits = c.queryText(Seq("spark join"), k = 2)
      .orderBy("rnk").select("id").as[String].collect().toSeq
    // docs 1 and 2 both carry exactly {spark, join} of the vocab → equal
    // vectors, distance tie broken by id ascending
    assert(hits == Seq("1", "2"), s"nearest to 'spark join' should be 1,2 — got $hits")
    // a FRESH handle (new catalog over the same root) resolves the model
    // from the sidecar — stored and query vectors share one function
    val reopened = new CollectionCatalog(spark,
      c.toDF.inputFiles.head.replaceFirst("file:", "")
        .replaceAll("/ft/data_v.*$", "")).getCollection("ft").get
    assert(reopened.queryText(Seq("spark join"), k = 2)
      .orderBy("rnk").select("id").as[String].collect().toSeq == hits)
    // Embedder.fromName refuses to resolve a fitted name WITHOUT the model
    intercept[IllegalArgumentException](Embedder.fromName(ef.name))
  }

  test("fitted re-fit is rejected; same model re-adds fine; missing sidecar is loud") {
    import graft.operators.TfIdfSrpEmbedder
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("rf", "cosine")
    val ef = TfIdfSrpEmbedder.fit(fitCorpus, "document", dim = 8, vocabSize = 4)
    c.addDocuments(fitCorpus, ef)
    // same model, new ids → fine
    c.addDocuments(Seq(("6", "more spark join text")).toDF("id", "document"), ef)
    assert(c.count() == 6)
    // re-fit on different data → DIFFERENT model under the same name → loud
    val refit = TfIdfSrpEmbedder.fit(
      Seq(("x", "totally different corpus entirely")).toDF("id", "document"),
      "document", dim = 8, vocabSize = 4)
    val e = intercept[IllegalArgumentException](
      c.addDocuments(Seq(("7", "another spark doc")).toDF("id", "document"), refit))
    assert(e.getMessage.contains("DIFFERS"))
    // sidecar removal makes resolution loud, never silently wrong
    val root = c.toDF.inputFiles.head.replaceFirst("file:", "")
      .replaceAll("/rf/data_v.*$", "")
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "rf",
      graft.catalog.Collection.EmbedderSidecar))
    val e2 = intercept[IllegalArgumentException](c.queryText(Seq("spark"), k = 1))
    assert(e2.getMessage.contains("sidecar"))
  }

  test("fork carries the fitted model sidecar: the fork can queryText immediately") {
    import graft.operators.TfIdfSrpEmbedder
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("fs", "cosine")
    val ef = TfIdfSrpEmbedder.fit(fitCorpus, "document", dim = 8, vocabSize = 4)
    c.addDocuments(fitCorpus, ef)
    val f = cat.forkCollection("fs", "fs2")
    assert(f.queryText(Seq("vector search"), k = 1)
      .select("id").as[String].head() == "3")
  }

  test("mmr trades relevance for diversity and breaks ties by id") {
    // query q; a,b nearly parallel to q (redundant pair); c moderately
    // relevant but ANTI-correlated with a on the y-axis, so its marginal
    // score beats b's (whose redundancy with a eats its whole relevance)
    val q = Seq(1f, 0f, 0f)
    val rows = Seq(
      (1L, Seq(1f, 0.1f, 0f)),    // sim ~0.995
      (2L, Seq(1f, 0.11f, 0f)),   // sim ~0.994, redundant with 1
      (3L, Seq(0.3f, -0.9f, 0f))  // sim ~0.316, diverse
    ).toDF("id", "embedding")
    val plain = Retrieval.mmr(rows, "id", "embedding", q,
      k = 2, fetchN = 3, lambda = 1.0) // λ=1: pure relevance
    assert(plain.select("id").as[Long].collect().toSeq == Seq(1L, 2L))
    val diverse = Retrieval.mmr(rows, "id", "embedding", q,
      k = 2, fetchN = 3, lambda = 0.5)
    assert(diverse.select("id").as[Long].collect().toSeq == Seq(1L, 3L))
    // ranks are 1-based and ordered
    assert(diverse.select("rnk").as[Int].collect().toSeq == Seq(1, 2))
  }

  test("mmr yields at most candidate-count rows and validates args") {
    val rows = Seq((1L, Seq(1f, 0f))).toDF("id", "embedding")
    val r = Retrieval.mmr(rows, "id", "embedding", Seq(1f, 0f), k = 5, fetchN = 5)
    assert(r.count() == 1)
    intercept[IllegalArgumentException](
      Retrieval.mmr(rows, "id", "embedding", Seq(1f, 0f), k = 3, fetchN = 2))
    intercept[IllegalArgumentException](
      Retrieval.mmr(rows, "id", "embedding", Seq(1f, 0f), k = 0, fetchN = 2))
    intercept[IllegalArgumentException](
      Retrieval.mmr(rows, "id", "embedding", Seq(1f, 0f), k = 1, fetchN = 1, lambda = 1.5))
  }

  test("Collection.queryMmr == Retrieval.mmr over the same contents") {
    val coll = freshCatalog().getOrCreateCollection("mmr", space = "cosine")
    val batch = (0 until 20).map { i =>
      (i.toString, s"doc $i", Seq(math.cos(i * 0.3).toFloat,
        math.sin(i * 0.3).toFloat, (i % 5).toFloat))
    }.toDF("id", "document", "embedding")
    coll.add(batch)
    val q = Seq(1f, 0f, 1f)
    val viaColl = coll.queryMmr(q, k = 4, fetchN = 10)
      .select("rnk", "id", "mmr_score").collect().toSeq
    val direct = Retrieval.mmr(coll.toDF, "id", "embedding", q, k = 4, fetchN = 10)
      .select("rnk", "id", "score").collect().toSeq
    assert(viaColl == direct)
    // l2 collections reject MMR
    val l2 = freshCatalog().getOrCreateCollection("mmr2", space = "l2")
    l2.add(batch)
    intercept[IllegalArgumentException](l2.queryMmr(q, k = 2, fetchN = 4))
  }

  test("queryTextStruct: text form == vector form through the shared struct fold") {
    val coll = freshCatalog().getOrCreateCollection("qts", space = "cosine")
    coll.addDocuments(Seq(
      ("1", "spark shuffles partitions"),
      ("2", "ducks swim on the pond"),
      ("3", "compilers fold constants")).toDF("id", "document"),
      HashingEmbedder(16))
    val texts = Seq("spark shuffles", "pond ducks")
    val viaText = coll.queryTextStruct(texts, k = 2).orderBy("qid").collect().toSeq
    val viaVec = coll.queryStruct(texts.map(HashingEmbedder(16).embedOne), k = 2)
      .orderBy("qid").collect().toSeq
    assert(viaText == viaVec)
    // one row per query, ids rank-ordered, k-bounded lists
    assert(viaText.size == 2)
    assert(viaText.head.getSeq[String](viaText.head.fieldIndex("ids")).size == 2)
    // no binding → loud
    val bare = freshCatalog().getOrCreateCollection("qts2", space = "cosine")
    bare.add(Seq(("1", "d", Seq(1f, 0f))).toDF("id", "document", "embedding"))
    intercept[IllegalStateException](bare.queryTextStruct(Seq("x"), k = 1))
  }

  test("queryMmrText embeds through the recorded binding, == queryMmr of that vector") {
    val coll = freshCatalog().getOrCreateCollection("mmrt", space = "cosine")
    coll.addDocuments(Seq(
      ("1", "spark shuffles partitions"),
      ("2", "spark shuffles partitions wildly"),
      ("3", "ducks swim on the pond"),
      ("4", "compilers fold constants")).toDF("id", "document"),
      HashingEmbedder(16))
    val viaText = coll.queryMmrText("spark shuffles", k = 3, fetchN = 4)
      .select("rnk", "id", "mmr_score").collect().toSeq
    val viaVec = coll.queryMmr(HashingEmbedder(16).embedOne("spark shuffles"),
        k = 3, fetchN = 4)
      .select("rnk", "id", "mmr_score").collect().toSeq
    assert(viaText == viaVec)
    // no recorded binding → loud; zero-vector text → loud
    val bare = freshCatalog().getOrCreateCollection("mmrt2", space = "cosine")
    bare.add(Seq(("1", "d", Seq(1f, 0f))).toDF("id", "document", "embedding"))
    intercept[IllegalStateException](bare.queryMmrText("x", k = 1))
    intercept[IllegalArgumentException](coll.queryMmrText("   ", k = 1))
  }
}
