package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.sources.ChromaRestSource

/** The ingress source against a REAL local HTTP server (JDK HttpServer),
  * both public chromadb API generations: paged executor-side reads, the
  * parallel-array response parse, one-call importInto through the add
  * gates (space carry-over, metadata carry-over, all-null column drop,
  * torn-import detection). Loopback ephemeral port — no network egress. */
class ChromaRestSourceSpec extends SparkTestBase {
  import spark.implicits._

  /** Rows the fake server holds: (id, document|null, embedding|null,
    * metadata|null). */
  private type Rec = (String, String, Seq[Float], Map[String, Any])

  private def metaJson(m: Map[String, Any]): String =
    m.map { case (k, v) => "\"" + k + "\":" + (v match {
      case s: String => "\"" + s + "\""
      case other => String.valueOf(other) // long / double / boolean
    })}.mkString("{", ",", "}")

  /** A fake Chroma serving `recs` for collection `name` on one API
    * generation: v2 answers the heartbeat 2xx, v1 404s it (the sink's
    * negotiation contract). Counts get() calls for the paging assert. */
  private def withFakeChroma[T](recs: Seq[Rec], name: String, gen: String,
                                space: String = "cosine",
                                withEmb: Boolean = true,
                                withDoc: Boolean = true,
                                countOverride: Option[Int] = None)(
      body: (String, AtomicInteger) => T): T = {
    val gets = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def getJson(off: Int, lim: Int): String = {
      val page = recs.slice(off, off + lim)
      val sb = new StringBuilder("{\"ids\":[")
      sb.append(page.map(r => jstr(r._1)).mkString(","))
      sb.append("]")
      if (withEmb) sb.append(",\"embeddings\":[").append(page.map(r =>
        if (r._3 == null) "null" else r._3.mkString("[", ",", "]"))
        .mkString(",")).append("]")
      else sb.append(",\"embeddings\":null")
      if (withDoc) sb.append(",\"documents\":[").append(page.map(r =>
        if (r._2 == null) "null" else jstr(r._2)).mkString(",")).append("]")
      sb.append(",\"metadatas\":[").append(page.map(r =>
        if (r._4 == null) "null" else metaJson(r._4)).mkString(",")).append("]")
      sb.append("}").toString
    }
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val reqBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      def num(key: String): Int =
        ("\"" + key + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(reqBody)
          .map(_.group(1).toInt).getOrElse(0)
      val v1 = path.startsWith("/api/v1/")
      if (path == "/api/v2/heartbeat")
        respond(ex, if (gen == "v2") 200 else 404,
          """{"nanosecond heartbeat": 1}""")
      else if (v1 != (gen == "v1")) respond(ex, 410, """{"error":"gone"}""")
      else if (path.endsWith(s"/collections/$name"))
        respond(ex, 200, s"""{"id":"cid-7","name":${jstr(name)},""" +
          s""""metadata":{"hnsw:space":${jstr(space)},"note":"kept","n":3}}""")
      else if (path.endsWith("/collections/cid-7/count"))
        respond(ex, 200, countOverride.getOrElse(recs.size).toString)
      else if (path.endsWith("/collections/cid-7/get")) {
        gets.incrementAndGet()
        respond(ex, 200, getJson(num("offset"), num("limit")))
      }
      else respond(ex, 404, s"""{"error":"nope: $path"}""")
    })
    server.setExecutor(null)
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", gets)
    finally server.stop(0)
  }

  private def recs(n: Int): Seq[Rec] = (0 until n).map { i =>
    (s"id$i",
      if (i % 11 == 5) null else s"doc $i text",
      Seq(i.toFloat, (i % 7).toFloat, 1f),
      if (i % 13 == 6) null
      else Map[String, Any]("lang" -> (if (i % 2 == 0) "en" else "fr"),
        "stars" -> (i % 5).toLong, "flagged" -> (i % 3 == 0)))
  }

  test("read: paged executor-side fetch reassembles the collection (v2)") {
    withFakeChroma(recs(57), "src", "v2") { (url, gets) =>
      val df = ChromaRestSource.read(spark, url, "src", pageSize = 10,
        parallelism = 4)
      assert(df.count() == 57)
      assert(gets.get() == 6, s"57 rows at pageSize 10 = 6 get() pages, got ${gets.get()}")
      val r = df.filter(col("id") === "id4")
        .select("document", "embedding", "metadata").head()
      assert(r.getString(0) == "doc 4 text")
      assert(r.getSeq[Float](1) == Seq(4f, 4f, 1f))
      assert(r.getMap[String, String](2) ==
        Map("lang" -> "en", "stars" -> "4", "flagged" -> "false"))
      // null document and null metadata rows survive as nulls
      assert(df.filter(col("document").isNull).count() == 5) // i%11==5, i<57
      assert(df.filter(col("metadata").isNull).count() == 4) // i%13==6, i<57
    }
  }

  test("read: v1 generation negotiates off the heartbeat 404 and serves the same rows") {
    withFakeChroma(recs(23), "src", "v1") { (url, _) =>
      val df = ChromaRestSource.read(spark, url, "src", pageSize = 8)
      assert(df.count() == 23)
      assert(df.select("id").as[String].collect().toSet ==
        (0 until 23).map(i => s"id$i").toSet)
    }
  }

  test("importInto: one call hydrates through the add gates, space + metadata carry") {
    withFakeChroma(recs(30), "src", "v2", space = "cosine") { (url, _) =>
      val root = tmpDir("restsrc-imp")
      val cat = new CollectionCatalog(spark, root, numBuckets = 4)
      val c = ChromaRestSource.importInto(cat, url, "src", localName = "local")
      assert(c.count() == 30)
      assert(c.space == "cosine")
      assert(c.meta.metadata("note") == "kept")
      assert(c.meta.metadata("n") == "3")
      assert(c.meta.metadata("imported_from").contains("/src"))
      // the hydrated collection answers queries: vector knn on the
      // imported embeddings and a metadata-filtered get
      val hit = c.query(Seq(4f, 4f, 1f), k = 1).select("id").head().getString(0)
      assert(hit == "id4")
      assert(c.get(where = Some(graft.operators.ChromaFilter.Eq("lang", "en")))
        .count() == recs(30).count(r => r._4 != null && r._4("lang") == "en"))
    }
  }

  test("importInto: a documents-less collection never grows an all-null document column") {
    val embOnly = recs(12).map(r => (r._1, null: String, r._3, r._4))
    withFakeChroma(embOnly, "vecs", "v2", withDoc = false) { (url, _) =>
      val root = tmpDir("restsrc-nodoc")
      val cat = new CollectionCatalog(spark, root, numBuckets = 4)
      val c = ChromaRestSource.importInto(cat, url, "vecs")
      assert(c.count() == 12)
      assert(!c.toDF.columns.contains("document"))
      assert(c.toDF.columns.contains("embedding"))
    }
  }

  test("importInto: a torn import (server count drifts) fails loudly") {
    // server claims 40 rows but serves only 30 — the conservation gate
    // must fail the import instead of adopting a hole
    withFakeChroma(recs(30), "src", "v2", countOverride = Some(40)) { (url, _) =>
      val root = tmpDir("restsrc-torn")
      val cat = new CollectionCatalog(spark, root, numBuckets = 4)
      val e = intercept[Exception] {
        ChromaRestSource.importInto(cat, url, "src")
      }
      assert(e.getMessage.contains("torn"))
    }
  }

  test("read: absent collection fails loudly, never creates") {
    withFakeChroma(recs(3), "src", "v2") { (url, _) =>
      val e = intercept[NoSuchElementException] {
        ChromaRestSource.read(spark, url, "nope")
      }
      assert(e.getMessage.contains("does not exist"))
    }
  }

  test("parseGetResponse: ragged parallel arrays and junk fail loudly") {
    intercept[Exception](ChromaRestSource.parseGetResponse(
      """{"ids":["a","b"],"documents":["x"]}"""))
    intercept[Exception](ChromaRestSource.parseGetResponse("""["no","object"]"""))
    intercept[Exception](ChromaRestSource.parseGetResponse("""{"documents":["x"]}"""))
    // null embeddings/documents arrays are the absent-include shape
    val rows = ChromaRestSource.parseGetResponse(
      """{"ids":["a"],"embeddings":null,"documents":null,"metadatas":[{"k":"v"}]}""")
    assert(rows.size == 1 && rows.head.getString(0) == "a")
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2))
  }
}
