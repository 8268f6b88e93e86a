package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** chromadb ≥0.4.15 tenant/database namespaces as path prefixes: same-name
  * collections in different namespaces are fully isolated (the store's
  * MVCC/claim/lease keys are full paths — no new protocol), the plain
  * single-namespace catalog never sees them, and database listing/deletion
  * behave like Chroma's client admin API. */
class NamespaceSpec extends SparkTestBase {
  import CollectionCatalog._

  private def addRows(c: Collection, n: Int, tag: String): Unit =
    c.add(spark.range(n).select(
      col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("embedding"),
      lit(tag).as("document")))

  test("same collection name in two namespaces: fully isolated contents") {
    val root = tmpDir("ns-iso")
    val a = forNamespace(spark, root, "team_a", "prod").getOrCreateCollection("docs")
    val b = forNamespace(spark, root, "team_b", "prod").getOrCreateCollection("docs")
    addRows(a, 5, "a"); addRows(b, 9, "b")
    assert(a.count() == 5 && b.count() == 9)
    assert(a.get().select("document").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    // and two databases of one tenant are isolated too
    val dev = forNamespace(spark, root, "team_a", "dev").getOrCreateCollection("docs")
    addRows(dev, 2, "dev")
    assert(a.count() == 5 && dev.count() == 2)
  }

  test("the plain single-namespace catalog never lists namespaced collections") {
    val root = tmpDir("ns-hidden")
    forNamespace(spark, root, "t", "db").getOrCreateCollection("hidden")
    val plain = new CollectionCatalog(spark, root)
    plain.getOrCreateCollection("visible")
    assert(plain.listCollections() == Seq("visible"))
  }

  test("listTenants / listDatabases reflect what was created") {
    val root = tmpDir("ns-list")
    forNamespace(spark, root, "t1", "db1").getOrCreateCollection("c")
    forNamespace(spark, root, "t1", "db2").getOrCreateCollection("c")
    forNamespace(spark, root, "t2", "db1").getOrCreateCollection("c")
    assert(listTenants(spark, root) == Seq("t1", "t2"))
    assert(listDatabases(spark, root, "t1") == Seq("db1", "db2"))
    assert(listDatabases(spark, root, "t3") == Nil)
  }

  test("deleteDatabase drops all of a database's collections, nothing else") {
    val root = tmpDir("ns-del")
    forNamespace(spark, root, "t", "gone").getOrCreateCollection("c1")
    forNamespace(spark, root, "t", "kept").getOrCreateCollection("c2")
    assert(deleteDatabase(spark, root, "t", "gone"))
    assert(!deleteDatabase(spark, root, "t", "gone"))
    assert(listDatabases(spark, root, "t") == Seq("kept"))
    assert(forNamespace(spark, root, "t", "kept").listCollections() == Seq("c2"))
  }

  test("defaults mirror Chroma's default_tenant/default_database") {
    val root = tmpDir("ns-default")
    forNamespace(spark, root).getOrCreateCollection("c")
    assert(listTenants(spark, root) == Seq(DefaultTenant))
    assert(listDatabases(spark, root, DefaultTenant) == Seq(DefaultDatabase))
  }

  test("invalid tenant/database names fail loudly (dot-led, slash, empty)") {
    val root = tmpDir("ns-bad")
    for (bad <- Seq(".hidden", "a/b", "", "-lead")) {
      val e = intercept[IllegalArgumentException] {
        forNamespace(spark, root, tenant = bad)
      }
      assert(e.getMessage.contains("invalid"))
    }
  }
}
