package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftColumnShim

/** Registration of the graft native expressions.
  *
  * Two paths:
  *  1. `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  *     build time — the standard SparkSessionExtensions route; makes
  *     `graft_cosine_dist(a,b)` etc. usable from plain SQL.
  *  2. `GraftExtensions.register(spark)` on a live session (the driver may
  *     hand us an already-built session) — same functions, same names.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.specs.foreach { case (name, space) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDistance].getName, name),
        (children: Seq[Expression]) => GraftExtensions.build(space, children)))
    }
    ext.injectFunction((
      FunctionIdentifier("graft_strhash"),
      new ExpressionInfo(classOf[StrHash].getName, "graft_strhash"),
      (children: Seq[Expression]) => GraftExtensions.buildStrHash(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[StrShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => GraftExtensions.buildShingles(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      (children: Seq[Expression]) => GraftExtensions.buildTextStats(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
      (children: Seq[Expression]) => GraftExtensions.buildHashEmbed(children)))
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(session => new IvfPruneRule(session))
  }
}

object GraftExtensions {

  private val specs: Seq[(String, String)] = Seq(
    "graft_dot" -> "dot",
    "graft_l2_dist" -> "l2",
    "graft_ip_dist" -> "ip",
    "graft_cosine_dist" -> "cosine")

  private def build(space: String, children: Seq[Expression]): VectorDistance = {
    require(children.length == 2, s"vector distance takes 2 args, got ${children.length}")
    VectorDistance(children.head, children(1), space)
  }

  private def buildStrHash(children: Seq[Expression]): StrHash = {
    require(children.length == 1, s"graft_strhash takes 1 arg, got ${children.length}")
    StrHash(children.head)
  }

  private def buildShingles(children: Seq[Expression]): StrShingles = {
    require(children.length == 2, s"graft_shingles takes (text, n), got ${children.length} args")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_shingles n must be an integer literal, got $other")
    }
    StrShingles(children.head, n)
  }

  private def buildTextStats(children: Seq[Expression]): TextStats = {
    require(children.length == 1, s"graft_text_stats takes 1 arg, got ${children.length}")
    // SQL surface fixes the stopword list to English — the Column-level
    // API (TextAnalysis.qualityStruct / TextStats direct) parameterizes it
    TextStats(children.head, graft.functions.TextAnalysis.stopwordList("en"))
  }

  private def buildHashEmbed(children: Seq[Expression]): HashEmbed = {
    require(children.length == 2,
      s"graft_hash_embed takes (lowered_text, dim), got ${children.length} args")
    val dim = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_hash_embed dim must be an integer literal, got $other")
    }
    HashEmbed(children.head, dim)
  }

  /** Column-level constructors (no registration needed). */
  def dist(space: String)(a: Column, b: Column): Column =
    GraftColumnShim.column(VectorDistance(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b), space))

  /** Engine-portable positional polynomial string hash (see [[StrHash]]). */
  def strHash(s: Column): Column =
    GraftColumnShim.column(StrHash(GraftColumnShim.expression(s)))

  // ---- DataFrame-returning TABLE functions: the RAG read path for pure
  // spark.sql users -------------------------------------------------------
  //
  // `SELECT * FROM graft_bm25('<root>', '<collection>', '<query text>', k[, whereJson])`
  // `SELECT * FROM graft_hybrid('<root>', '<collection>', '<text>', k[, fetchN[, whereJson]])`
  //
  // Each resolves the collection at ANALYSIS time (arguments must be
  // literals — they name an external store, not row data) and returns the
  // collection API's own plan: graft_bm25 = keywordTopK over the query
  // text tokenized with the collection's analyzer (sidecar-served when
  // current → O(matching postings)); graft_hybrid = queryHybridText (the
  // full keyword + recorded-embedding-function fusion). SQL users get the
  // same physical plans — and the same loud gates — as Scala callers.
  // The optional trailing argument is a Chroma-wire-format `where` JSON
  // ('{"lang": "en"}', '{"rating": {"$gte": 4}}', '{"$and": [...]}') —
  // [[graft.operators.ChromaFilter.whereFromJson]]'s grammar — applied as
  // the same prefilter the Scala API takes (keyword: between score fold
  // and rank; hybrid: both legs).

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.logical

  private def collectionOf(root: String, name: String): graft.catalog.Collection =
    new graft.catalog.CollectionCatalog(SparkSession.active, root)
      .getCollection(name).getOrElse(throw new NoSuchElementException(
        s"no collection '$name' under root '$root'"))

  private def buildBm25Tvf(children: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.length == 4 || children.length == 5,
      s"graft_bm25 takes (root, collection, querytext, k[, whereJson]), got ${children.length} args")
    val coll = collectionOf(strLit(children(0), "graft_bm25 root"),
      strLit(children(1), "graft_bm25 collection"))
    val terms = graft.operators.Retrieval.queryTerms(
      strLit(children(2), "graft_bm25 querytext"), coll.analyzer)
    require(terms.nonEmpty, "graft_bm25 query text has no tokens")
    val where = children.lift(4).map(e =>
      graft.operators.ChromaFilter.whereFromJson(strLit(e, "graft_bm25 where")))
    planOf(coll.keywordTopK(terms, intLit(children(3), "graft_bm25 k"), where = where))
  }

  private def buildHybridTvf(children: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.length >= 4 && children.length <= 6,
      s"graft_hybrid takes (root, collection, text, k[, fetchN[, whereJson]]), got ${children.length} args")
    val coll = collectionOf(strLit(children(0), "graft_hybrid root"),
      strLit(children(1), "graft_hybrid collection"))
    val k = intLit(children(3), "graft_hybrid k")
    val fetchN =
      if (children.length >= 5) intLit(children(4), "graft_hybrid fetchN") else 50
    val where = children.lift(5).map(e =>
      graft.operators.ChromaFilter.whereFromJson(strLit(e, "graft_hybrid where")))
    planOf(coll.queryHybridText(strLit(children(2), "graft_hybrid text"), k, fetchN,
      where = where))
  }

  /** `graft_rerank(root, collection, text, k[, fetchN[, whereJson]])` —
    * the full three-stage read path (retrieve → fuse → rerank) from pure
    * SQL. The scorer is fixed to [[graft.operators.OverlapRerank]]: SQL
    * has no channel for a function object, and the lexical rung is the
    * one deterministic scorer; model-backed rerankers are a Scala-API
    * concern (`queryRerankText(fn = new OnnxRerankFunction(...))`). */
  private def buildRerankTvf(children: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.length >= 4 && children.length <= 6,
      s"graft_rerank takes (root, collection, text, k[, fetchN[, whereJson]]), got ${children.length} args")
    val coll = collectionOf(strLit(children(0), "graft_rerank root"),
      strLit(children(1), "graft_rerank collection"))
    val k = intLit(children(3), "graft_rerank k")
    val fetchN =
      if (children.length >= 5) intLit(children(4), "graft_rerank fetchN") else 50
    val where = children.lift(5).map(e =>
      graft.operators.ChromaFilter.whereFromJson(strLit(e, "graft_rerank where")))
    planOf(coll.queryRerankText(strLit(children(2), "graft_rerank text"), k,
      graft.operators.OverlapRerank(), fetchN, where = where))
  }

  /** `graft_knn(root, collection, text, k[, whereJson[, whereDocJson]])` —
    * Chroma's `query(query_texts=[...])` from pure SQL, completing the
    * TVF quadrant (bm25 / hybrid / rerank / knn): embed the text with the
    * collection's RECORDED embedding function and rank by the collection
    * space's distance, served through the committed IVF/PQ index when
    * current (exact-scan fallback otherwise) — the same [[graft.catalog
    * .Collection.queryText]] plan, gates included, Scala callers get.
    * The two trailing filters are Chroma wire-format JSON (`where` then
    * `where_document`); pass `''` to skip a slot — SQL's positional
    * arguments have no other spelling of None (a typed NULL literal
    * would read as the string "null" under strLit's contract). */
  private def buildKnnTvf(children: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.length >= 4 && children.length <= 6,
      s"graft_knn takes (root, collection, text, k[, whereJson[, whereDocJson]]), got ${children.length} args")
    val coll = collectionOf(strLit(children(0), "graft_knn root"),
      strLit(children(1), "graft_knn collection"))
    val k = intLit(children(3), "graft_knn k")
    def optJson(i: Int, what: String): Option[String] =
      children.lift(i).map(e => strLit(e, what)).filter(_.nonEmpty)
    val where = optJson(4, "graft_knn where")
      .map(graft.operators.ChromaFilter.whereFromJson)
    val whereDoc = optJson(5, "graft_knn whereDoc")
      .map(graft.operators.ChromaFilter.whereDocFromJson)
    planOf(coll.queryText(Seq(strLit(children(2), "graft_knn text")), k,
      where, whereDoc))
  }

  /** `graft_maxsim(root, collection, text, k[, fetchN[, whereJson]])` —
    * the late-interaction staged path (BM25 shortlist → chunk → recorded-
    * embedding chunk vectors → per-term MaxSim) from pure SQL; same
    * argument grammar as graft_rerank (the other staged reranker). */
  private def buildMaxSimTvf(children: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.length >= 4 && children.length <= 6,
      s"graft_maxsim takes (root, collection, text, k[, fetchN[, whereJson]]), got ${children.length} args")
    val coll = collectionOf(strLit(children(0), "graft_maxsim root"),
      strLit(children(1), "graft_maxsim collection"))
    val k = intLit(children(3), "graft_maxsim k")
    val fetchN =
      if (children.length >= 5) intLit(children(4), "graft_maxsim fetchN") else 50
    val where = children.lift(5).map(e =>
      graft.operators.ChromaFilter.whereFromJson(strLit(e, "graft_maxsim where")))
    planOf(coll.queryMaxSimText(strLit(children(2), "graft_maxsim text"), k,
      fetchN, where = where))
  }

  private val tableFunctions: Seq[(String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    "graft_bm25" -> (buildBm25Tvf _),
    "graft_hybrid" -> (buildHybridTvf _),
    "graft_rerank" -> (buildRerankTvf _),
    "graft_knn" -> (buildKnnTvf _),
    "graft_maxsim" -> (buildMaxSimTvf _))

  /** Register the SQL functions + the IVF prune rule on a live session. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.functionRegistry
    specs.foreach { case (name, space) =>
      registry.createOrReplaceTempFunction(
        name, (children: Seq[Expression]) => build(space, children), "scala_udf")
    }
    registry.createOrReplaceTempFunction(
      "graft_strhash", (children: Seq[Expression]) => buildStrHash(children), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_shingles", (children: Seq[Expression]) => buildShingles(children), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_text_stats", (children: Seq[Expression]) => buildTextStats(children), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_hash_embed", (children: Seq[Expression]) => buildHashEmbed(children), "scala_udf")
    tableFunctions.foreach { case (name, builder) =>
      classic.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!classic.experimental.extraOptimizations.exists(_.isInstanceOf[IvfPruneRule]))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ new IvfPruneRule(spark)
  }
}
