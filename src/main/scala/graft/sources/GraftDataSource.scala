package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

import graft.catalog.CollectionCatalog

/** `spark.read.format("graft")` — the plain-Spark-SQL read surface over
  * collections, so a SQL-only user (or `CREATE TABLE ... USING graft`)
  * reads a hydrated collection without touching the Scala API (SURVEY
  * A10's DSv2 note, read half; reference context: the hydrated artifact
  * is MEANT to be consumed by downstream query stacks — README.md:5).
  *
  * Usage:
  *   spark.read.format("graft").option("root", r).option("name", n).load()
  *   spark.read.format("graft").load("<root>/<name>")          // path form
  *   ...option("version", "3")                                  // time travel
  *   ...option("tenant", t).option("database", d)               // namespaces
  *   CREATE TABLE docs USING graft OPTIONS (root '...', name '...')
  *
  * Architecture: the provider resolves the collection's COMMITTED version
  * snapshot (meta → carry-manifest → physical `pt=<b>` leaf dirs) at
  * relation-bind time, then delegates to Spark's own parquet
  * HadoopFsRelation over those dirs. That buys the entire native scan
  * stack for free — column pruning (ReadSchema), predicate pushdown
  * (PushedFilters to rowgroup stats), whole-stage codegen, AQE — instead
  * of a hand-rolled PartitionReader that would have to re-implement all
  * of it. Leaf dirs are the scan ROOTS, so the internal `pt` bucket
  * column never infers into the schema (exactly `toDF`'s shape).
  *
  * Snapshot semantics: the file list is pinned at bind time — a SQL
  * table created over version V keeps reading V's files (they are
  * immutable copy-on-write dirs; `vacuum` respects carry reachability)
  * until re-resolved. That is the same snapshot isolation every other
  * read surface has, surfaced at the relation boundary.
  *
  * Writes go through the collection API (`add`/`upsert`/... — they need
  * the dup-id gate, the bucket merge, and the commit protocol); this
  * source is deliberately read-only, and INSERTs fail with Spark's
  * standard unsupported-write error for V1 relations without an
  * InsertableRelation.
  */
class GraftDataSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    // root + name, either explicit or as load("<root>/<name>")
    val (root, name) = (parameters.get("root"), parameters.get("name")) match {
      case (Some(r), Some(n)) => (r, n)
      case (None, None) =>
        val p = parameters.getOrElse("path", throw new IllegalArgumentException(
          "graft source needs options root+name, or load(\"<root>/<name>\")"))
        val path = new org.apache.hadoop.fs.Path(p)
        val parent = path.getParent
        require(parent != null, s"graft path '$p' has no parent — expected <root>/<name>")
        (parent.toString, path.getName)
      case _ => throw new IllegalArgumentException(
        "graft source needs BOTH root and name (or a single load path)")
    }
    val cat = (parameters.get("tenant"), parameters.get("database")) match {
      case (None, None) => new CollectionCatalog(spark, root)
      case (t, d) => CollectionCatalog.forNamespace(spark, root,
        t.getOrElse(CollectionCatalog.DefaultTenant),
        d.getOrElse(CollectionCatalog.DefaultDatabase))
    }
    val coll = cat.getCollection(name).getOrElse(throw new NoSuchElementException(
      s"no collection '$name' under root '$root'" +
        parameters.get("tenant").map(t => s" (tenant $t)").getOrElse("")))
    val m = coll.meta
    val version = parameters.get("version").map { v =>
      val n = scala.util.Try(v.trim.toInt).getOrElse(throw new IllegalArgumentException(
        s"graft option version='$v' is not an integer"))
      n
    }.getOrElse(m.version)
    require(version > 0,
      if (m.version == 0) s"collection '$name' is empty (never written) — nothing to bind"
      else s"graft option version must be >= 1, got $version")
    val dirs = coll.leafDataDirs(version)
    require(dirs.nonEmpty, s"collection '$name' version $version has no data dirs")
    // Spark's own parquet relation machinery over the resolved snapshot:
    // schema from footers (mergeSchema across buckets), full pushdown
    DataSource(
      sparkSession = spark,
      className = "parquet",
      paths = dirs,
      options = Map("mergeSchema" -> "true")
    ).resolveRelation()
  }
}
