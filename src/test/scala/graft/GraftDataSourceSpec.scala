package graft

import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog

/** The plain-Spark-SQL read surface: `spark.read.format("graft")` and
  * `CREATE TABLE ... USING graft` bind a collection's committed snapshot
  * to Spark's own parquet relation — content equals toDF, the internal
  * `pt` bucket axis never leaks, and the scan keeps the native pushdown
  * stack (ReadSchema pruning + PushedFilters), pinned here because a
  * hand-rolled reader losing them would be a silent 10-50x IO regression
  * at 100 TB. */
class GraftDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val root = tmpDir("dsv-root")
  private lazy val coll = {
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("ds")
    c.add(spark.range(100).select(
      col("id").cast("string").as("id"),
      concat(lit("doc "), col("id")).as("document"),
      array((0 until 4).map(i => (col("id") * (i + 1) % 13).cast("float")): _*)
        .as("embedding"),
      (col("id") % 7).cast("int").as("stars")))
    c
  }

  test("format(graft) content equals toDF; pt never leaks into the schema") {
    coll // force hydration
    val df = spark.read.format("graft")
      .option("root", root).option("name", "ds").load()
    assert(df.columns.toSet == Set("id", "document", "embedding", "stars"))
    assert(!df.columns.contains("pt"))
    val viaApi = coll.toDF.select("id", "document", "stars")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val viaSql = df.select("id", "document", "stars")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("path form load(root/name) binds the same relation") {
    coll
    val df = spark.read.format("graft").load(s"$root/ds")
    assert(df.count() == 100)
    assert(df.columns.toSet == Set("id", "document", "embedding", "stars"))
  }

  test("native pushdown survives: filter reaches PushedFilters, projection prunes ReadSchema") {
    coll
    val q = spark.read.format("graft")
      .option("root", root).option("name", "ds").load()
      .filter(col("stars") === 3).select("id", "document")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scanLines = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scanLines.contains("embedding"),
      s"projection must prune the embedding column from the scan: $scanLines")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("stars"),
      s"the stars filter must reach PushedFilters: $plan")
  }

  test("ids option prunes the LISTING to the ids' buckets; values need the caller's filter") {
    coll
    val full = spark.read.format("graft")
      .option("root", root).option("name", "ds").load()
    val pruned = spark.read.format("graft")
      .option("root", root).option("name", "ds")
      .option("ids", "7,13").load()
    // IO confinement: the bound file set shrinks to the ids' buckets
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"expected a bucket-confined binding, got ${pruned.inputFiles.length} of " +
        s"${full.inputFiles.length} files")
    // superset semantics: the caller's own id filter completes the read
    val rows = pruned.filter(col("id").isin("7", "13"))
      .select("id", "stars").collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    val api = coll.toDF.filter(col("id").isin("7", "13"))
      .select("id", "stars").collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == api.toSeq && rows.length == 2)
  }

  test("CREATE TABLE ... USING graft serves SQL-only users") {
    coll
    spark.sql("DROP TABLE IF EXISTS graft_ds")
    spark.sql(s"CREATE TABLE graft_ds USING graft OPTIONS (root '$root', name 'ds')")
    try {
      val n = spark.sql("SELECT count(*) AS n FROM graft_ds WHERE stars = 3")
        .collect().head.getLong(0)
      assert(n == coll.toDF.filter(col("stars") === 3).count())
    } finally spark.sql("DROP TABLE IF EXISTS graft_ds")
  }

  test("version option time-travels; binding pins the snapshot") {
    coll
    val v1 = coll.meta.version
    val before = spark.read.format("graft")
      .option("root", root).option("name", "ds").load()
    coll.upsert(Seq(("x1", "new doc", Seq(1f, 2f, 3f, 4f), 9))
      .toDF("id", "document", "embedding", "stars"))
    // the pre-mutation binding keeps serving its pinned snapshot
    assert(before.count() == 100)
    // explicit old version reads it too; current default sees the upsert
    val old = spark.read.format("graft").option("root", root)
      .option("name", "ds").option("version", v1.toString).load()
    assert(old.count() == 100)
    val cur = spark.read.format("graft")
      .option("root", root).option("name", "ds").load()
    assert(cur.count() == 101)
  }

  // ---------------------------------------------------------- write half

  test("write default mode creates (chromadb create_collection); a second save errors") {
    val r = tmpDir("dsw-create")
    val df = spark.range(10).select(col("id"),
      concat(lit("d"), col("id")).as("document"))
    df.write.format("graft").option("root", r).option("name", "w").save()
    val back = spark.read.format("graft").option("root", r).option("name", "w").load()
    assert(back.count() == 10)
    // id was canonicalized to string even though the input was bigint
    assert(back.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val e = intercept[IllegalStateException] {
      df.write.format("graft").option("root", r).option("name", "w").save()
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("append routes through add(): dup ids error loudly, new ids extend") {
    val r = tmpDir("dsw-append")
    def df(lo: Int, hi: Int) = spark.range(lo, hi).select(col("id"),
      concat(lit("d"), col("id")).as("document"))
    df(0, 10).write.format("graft").option("root", r).option("name", "w").save()
    df(10, 15).write.format("graft").option("root", r).option("name", "w")
      .mode("append").save()
    assert(spark.read.format("graft").option("root", r).option("name", "w")
      .load().count() == 15)
    val e = intercept[IllegalArgumentException] {
      df(5, 8).write.format("graft").option("root", r).option("name", "w")
        .mode("append").save()
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("append + upsert=true is latest-wins; overwrite replaces the whole collection") {
    val r = tmpDir("dsw-upsert")
    spark.range(10).select(col("id"), lit("old").as("document"))
      .write.format("graft").option("root", r).option("name", "w").save()
    spark.range(5, 12).select(col("id"), lit("new").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .mode("append").option("upsert", "true").save()
    val after = spark.read.format("graft").option("root", r).option("name", "w").load()
    assert(after.count() == 12)
    assert(after.filter(col("document") === "new").count() == 7)
    // overwrite: contents replaced as ONE replacing MVCC version (v1 add,
    // v2 upsert, v3 replace) — prior versions then reclaimed, identity kept
    spark.range(3).select(col("id"), lit("ow").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .mode("overwrite").save()
    val ow = spark.read.format("graft").option("root", r).option("name", "w").load()
    assert(ow.count() == 3 && ow.filter(col("document") === "ow").count() == 3)
    val cat = new CollectionCatalog(spark, r)
    val coll = cat.getCollection("w").get
    assert(coll.meta.version == 3)
    assert(coll.history() == Seq(3)) // superseded versions vacuumed
    // ignore: no-op on existing
    spark.range(100).select(col("id"), lit("ig").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .mode("ignore").save()
    assert(spark.read.format("graft").option("root", r).option("name", "w")
      .load().count() == 3)
  }

  test("write canonicalizes: embedding double[] casts to float[], missing id errors") {
    val r = tmpDir("dsw-canon")
    spark.range(8).select(col("id"),
      array(col("id").cast("double"), (col("id") * 2).cast("double")).as("embedding"))
      .write.format("graft").option("root", r).option("name", "w").save()
    val back = spark.read.format("graft").option("root", r).option("name", "w").load()
    assert(back.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val noId = intercept[IllegalArgumentException] {
      spark.range(3).select(col("id").as("key"))
        .write.format("graft").option("root", r).option("name", "w2").save()
    }
    assert(noId.getMessage.contains("'id' column"))
    val badEmb = intercept[IllegalArgumentException] {
      spark.range(3).select(col("id"), lit("x").as("embedding"))
        .write.format("graft").option("root", r).option("name", "w3").save()
    }
    assert(badEmb.getMessage.contains("array of numbers"))
  }

  test("failed overwrite preserves the prior committed state (atomic replace)") {
    val r = tmpDir("dsw-ow-atomic")
    spark.range(10).select(col("id"), lit("keep").as("document"))
      .write.format("graft").option("root", r).option("name", "w").save()
    // a batch that fails the gates (in-batch duplicate ids) must abandon
    // the claimed version — the old delete-then-recreate path had already
    // destroyed every prior version and index at this point
    val dup = intercept[IllegalArgumentException] {
      spark.range(6).select((col("id") % 3).as("id"), lit("bad").as("document"))
        .write.format("graft").option("root", r).option("name", "w")
        .mode("overwrite").save()
    }
    assert(dup.getMessage.contains("duplicate id"))
    val back = spark.read.format("graft").option("root", r).option("name", "w").load()
    assert(back.count() == 10)
    assert(back.filter(col("document") === "keep").count() == 10)
    // and a SUCCESSFUL overwrite keeps collection identity (metadata)
    val cat = new CollectionCatalog(spark, r)
    cat.getCollection("w").get.modifyMetadata(Map("team" -> "search"))
    spark.range(2).select(col("id"), lit("ow").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .mode("overwrite").save()
    assert(cat.getCollection("w").get.meta.metadata.get("team").contains("search"))
  }

  test("refresh=true keeps committed sidecars current across SQL writes") {
    val r = tmpDir("dsw-refresh")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("w")
    c.add(Seq(("1", "hash joins beat sort"), ("2", "stream processing"))
      .toDF("id", "document"))
    c.buildKeywordIndex()
    assert(c.hasKeywordIndex)
    // a SQL write WITHOUT refresh strands the sidecar (version-stale):
    // reads stay correct (scan fallback, logged loudly) but off-index
    Seq(("3", "hash tables everywhere")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "w")
      .mode("append").save()
    assert(!c.hasKeywordIndex)
    assert(c.keywordTopK(Seq("hash"), 5).collect()
      .map(_.getString(0)).toSet == Set("1", "3")) // correct via scan
    // WITH refresh=true the sidecar follows the commit — the q154-shape
    // read stays index-served, and the refresh is incremental (the
    // carried slices make it O(touched buckets))
    Seq(("4", "hash index probes")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "w")
      .mode("append").option("refresh", "true").save()
    assert(c.hasKeywordIndex)
    assert(c.keywordTopK(Seq("hash"), 5).collect()
      .map(_.getString(0)).toSet == Set("1", "3", "4"))
    // refreshIndexes() on a collection with no built families is a no-op
    val c2 = cat.getOrCreateCollection("w2")
    c2.add(Seq(("1", "x")).toDF("id", "document"))
    assert(c2.refreshIndexes().isEmpty)
    // overwrite + refresh=true: the refresh must run BEFORE the replace's
    // vacuum (vacuum reclaims superseded builds; a vacuum-first ordering
    // would leave the collection silently index-less)
    Seq(("9", "hash replaced corpus")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "w")
      .mode("overwrite").option("refresh", "true").save()
    assert(c.hasKeywordIndex)
    assert(c.keywordTopK(Seq("hash"), 5).collect()
      .map(_.getString(0)).toSet == Set("9"))
  }

  test("overwrite WITHOUT refresh: vacuum reclaims the builds, but the family marker keeps refresh=true able to rebuild") {
    val r = tmpDir("dsw-marker")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("m")
    c.add(Seq(("1", "hash joins"), ("2", "stream state")).toDF("id", "document"))
    c.buildKeywordIndex()
    // overwrite with refresh unset: every build goes version-stale and
    // vacuum reclaims them — the old failure mode left refreshIndexes()
    // with no committed build to DETECT the family by, so refresh=true
    // on the next write silently no-opped and the collection was
    // stranded index-less with no SQL-surface recovery
    Seq(("9", "hash replaced")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "m")
      .mode("overwrite").save()
    assert(!c.hasKeywordIndex)
    // the durable marker makes the family known: refresh=true rebuilds IN FULL
    Seq(("10", "hash again")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "m")
      .mode("append").option("refresh", "true").save()
    assert(c.hasKeywordIndex)
    assert(c.keywordTopK(Seq("hash"), 5).collect()
      .map(_.getString(0)).toSet == Set("9", "10"))
  }

  test("drop removes the durable family marker: refreshIndexes()/refresh=true honor the drop") {
    val r = tmpDir("dsw-drop")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("d")
    c.add(Seq(("1", "hash joins"), ("2", "stream state")).toDF("id", "document"))
    c.buildKeywordIndex()
    c.buildDocIndex()
    assert(c.hasKeywordIndex && c.hasDocIndex)
    // an explicit drop is user intent: the family must STAY dropped —
    // the marker used to survive, so refreshIndexes() (and any SQL write
    // with refresh=true) silently rebuilt the dropped index in full
    assert(c.dropKeywordIndex())
    assert(!c.hasKeywordIndex)
    assert(c.refreshIndexes() == Map("docindex" -> 0))
    assert(!c.hasKeywordIndex)
    assert(c.dropDocIndex())
    assert(c.refreshIndexes().isEmpty)
    assert(!c.hasDocIndex && !c.hasKeywordIndex)
    Seq(("3", "hash tables")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "d")
      .mode("append").option("refresh", "true").save()
    assert(!c.hasKeywordIndex && !c.hasDocIndex)
    // reads stay correct through the scan fallback
    assert(c.keywordTopK(Seq("hash"), 5).collect()
      .map(_.getString(0)).toSet == Set("1", "3"))
    // rebuilding explicitly re-records the family — refresh works again
    c.buildKeywordIndex()
    assert(c.hasKeywordIndex)
    Seq(("4", "hash probes")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "d")
      .mode("append").option("refresh", "true").save()
    assert(c.hasKeywordIndex)
  }

  test("dropIndex after overwrite: neither the marker nor stale builds resurrect the family") {
    val r = tmpDir("dsw-drop2")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("d2")
    c.add(Seq(("1", "hash joins")).toDF("id", "document"))
    c.buildKeywordIndex()
    // overwrite with refresh unset: every build goes version-stale and
    // the replace's vacuum reclaims them; only the durable marker remains
    Seq(("9", "hash replaced")).toDF("id", "document")
      .write.format("graft").option("root", r).option("name", "d2")
      .mode("overwrite").save()
    assert(!c.hasKeywordIndex)
    // drop with zero surviving builds: returns false (nothing deleted)
    // but MUST still clear the marker, else refreshIndexes() rebuilds
    assert(!c.dropKeywordIndex())
    assert(c.refreshIndexes().isEmpty)
    assert(!c.hasKeywordIndex)
  }

  test("overwrite space option: validated, and the hnsw:space mirror follows the re-point") {
    val r = tmpDir("dsw-space")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("s",
      metadata = Map("hnsw:space" -> "cosine"))
    assert(c.meta.space == "cosine")
    c.add(Seq(("1", Array(1f, 0f))).toDF("id", "embedding"))
    // a typo'd space must fail BEFORE any write work — the old path
    // committed it and every later vector query died at analysis
    val bad = intercept[Exception] {
      Seq(("2", Array(0f, 1f))).toDF("id", "embedding")
        .write.format("graft").option("root", r).option("name", "s")
        .mode("overwrite").option("space", "cosinee").save()
    }
    assert(bad.getMessage.contains("unknown space"))
    assert(c.meta.space == "cosine") // nothing committed
    // an explicit legal re-point rewrites the Chroma-convention mirror
    // in the same commit (a stale mirror would fail the next
    // modifyMetadata consistency gate and mislead convention readers)
    Seq(("2", Array(0f, 1f))).toDF("id", "embedding")
      .write.format("graft").option("root", r).option("name", "s")
      .mode("overwrite").option("space", "l2").save()
    assert(c.meta.space == "l2")
    assert(c.meta.metadata.get("hnsw:space").contains("l2"))
    c.modifyMetadata(Map("hnsw:space" -> "l2")) // gate passes: consistent
    // creation validates through the same gate
    val badCreate = intercept[Exception] {
      cat.getOrCreateCollection("s2", space = "dot")
    }
    assert(badCreate.getMessage.contains("unknown space"))
  }

  test("overwrite clears a recorded embedding-function binding (stale-vector guard)") {
    val r = tmpDir("dsw-ow-binding")
    val cat = new CollectionCatalog(spark, r, numBuckets = 4)
    val c = cat.getOrCreateCollection("w", space = "cosine")
    c.addDocuments(Seq(("1", "alpha"), ("2", "beta")).toDF("id", "document"),
      graft.operators.HashingEmbedder(8))
    assert(c.meta.metadata.contains("embedding_function"))
    assert(c.queryText(Seq("alpha"), k = 1).collect().nonEmpty)
    // replace with CALLER-provided vectors: the old binding describes the
    // replaced corpus — keeping it would embed queries with a function
    // these vectors never came from (silently meaningless distances)
    Seq(("9", "gamma", Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("id", "document", "embedding")
      .write.format("graft").option("root", r).option("name", "w")
      .mode("overwrite").save()
    val after = cat.getCollection("w").get
    assert(!after.meta.metadata.contains("embedding_function"))
    val e = intercept[IllegalStateException](after.queryText(Seq("x"), k = 1))
    assert(e.getMessage.toLowerCase.contains("embedding"))
    // vector reads still serve
    assert(after.query(Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 1).collect()
      .map(_.getString(0)).toSeq == Seq("9"))
  }

  test("CTAS: CREATE TABLE USING graft AS SELECT hydrates through the provider") {
    val r = tmpDir("dsw-ctas")
    spark.sql("DROP TABLE IF EXISTS graft_ctas")
    try {
      spark.sql(
        s"""CREATE TABLE graft_ctas USING graft OPTIONS (root '$r', name 'ct')
           |AS SELECT CAST(id AS STRING) AS id, concat('d', id) AS document
           |FROM range(20)""".stripMargin)
      assert(spark.sql("SELECT count(*) AS n FROM graft_ctas").collect().head.getLong(0) == 20)
      // and it is a real collection underneath
      val cat = new CollectionCatalog(spark, r)
      assert(cat.getCollection("ct").get.count() == 20L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ctas")
  }

  test("INSERT INTO is rejected at analysis — even single-leaf-dir snapshots stay inviolate") {
    val r = tmpDir("dsw-guard")
    // buckets=1 forces exactly one pt leaf dir — the only layout Spark's
    // single-path precondition would otherwise let through to a raw
    // parquet write into the committed version dir
    spark.range(6).select(col("id"), lit("x").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .option("buckets", "1").save()
    val cat = new CollectionCatalog(spark, r)
    val before = cat.getCollection("w").get.meta.version
    spark.sql("DROP TABLE IF EXISTS graft_guard")
    spark.sql(s"CREATE TABLE graft_guard USING graft OPTIONS (root '$r', name 'w')")
    try {
      intercept[Exception] {
        spark.sql("INSERT INTO graft_guard SELECT '99' AS id, 'smuggled' AS document")
      }
      // nothing landed: same version, same rows, no foreign files
      val c = cat.getCollection("w").get
      assert(c.meta.version == before)
      assert(c.count() == 6L)
      assert(c.toDF.filter(col("document") === "smuggled").count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_guard")
  }

  test("write into a tenant/database namespace") {
    val r = tmpDir("dsw-ns")
    spark.range(4).select(col("id"), lit("n").as("document"))
      .write.format("graft").option("root", r).option("name", "w")
      .option("tenant", "acme").option("database", "prod").save()
    val back = spark.read.format("graft").option("root", r).option("name", "w")
      .option("tenant", "acme").option("database", "prod").load()
    assert(back.count() == 4)
    // absent from the default namespace
    intercept[NoSuchElementException] {
      spark.read.format("graft").option("root", r).option("name", "w").load()
    }
  }

  test("missing / empty collections and bad options fail loudly") {
    coll
    intercept[NoSuchElementException] {
      spark.read.format("graft").option("root", root).option("name", "nope").load()
    }
    val cat = new CollectionCatalog(spark, root)
    cat.getOrCreateCollection("empty")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("root", root).option("name", "empty").load()
    }
    assert(e.getMessage.contains("empty"))
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("root", root).load() // name without root pair
    }
  }
}
