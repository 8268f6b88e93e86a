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
