package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.{Collection, CollectionCatalog}
import graft.functions.{Distances, TextAnalysis}
import graft.operators.{Ann, Assemble, ChromaFilter, Dedup, Events, HashingEmbedder, Knn, Lm, Mixture, Multimodal, Retrieval, Sketches, Skew, TfIdfSrpEmbedder}

/** Driver contract — see /root/repo/SURVEY.md §2.D + the builder prompt.
  *
  * Every query has BOTH a Spark implementation (left column of SURVEY §2.D)
  * and a DuckDB oracle (right column, `oracleSql`). Column names and types
  * are aligned pairwise; floats are rounded to 4 decimals; money aggregates
  * are DECIMAL(18,4); all outputs carry a total ORDER BY on a unique key.
  * Distance arithmetic is done in Double with identical operation order on
  * both engines (sequential fold over array index), so hashes match bitwise.
  */
object SparkEntry {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Store root for the write-path queries (q60/q63/q79), keyed by the
    * source dir so each scale gets its own artifacts. Unsigned-widened
    * hash: math.abs would collide two dirs whose hashes differ only in
    * sign (and is negative for Int.MinValue).
    *
    * Lives OUTSIDE the `target/verify-*` namespace on purpose: verify
    * OUTPUT dirs are cleaned between sweeps (`rm -rf target/verify-out*`
    * is the documented recipe), and r13's 271 s cold bench was exactly
    * this fingerprint cache being collateral damage of such a clean
    * (BASELINE.md r13 note) — every cached collection + index rebuilt
    * mid-bench. A one-time rename adopts a pre-r14 cache in place so the
    * move itself never forces the cold rebuild it exists to prevent. */
  private lazy val collectionsBase: String = {
    val base = new java.io.File("/root/repo/target/graft-collections")
    val legacy = new java.io.File("/root/repo/target/verify-collections")
    if (!base.exists() && legacy.exists()) legacy.renameTo(base)
    base.toString
  }
  private def verifyCollectionsRoot(dir: String): String =
    s"$collectionsBase/sf_${dir.hashCode.toLong & 0xffffffffL}"

  /** The fingerprint-cached keyword-indexed collection shared by q154 and
    * q157 (the sidecar BM25 read and the indexed hybrid fusion): the full
    * documents table hydrated THROUGH an incremental keyword-index
    * refresh (bulk add + build, then an upsert slice + refresh, which
    * rebuilds only touched id buckets and carries the rest by manifest). */
  private def kwxCollection(s: SparkSession, dir: String): Collection = {
    val docs = t(s, dir, "documents")
    val root = verifyCollectionsRoot(dir)
    val cat = new CollectionCatalog(s, root, numBuckets = 8)
    val fp = s"kwx1|$dir|n=${docs.count()}"
    val reusable = cat.getCollection("kwx").exists(c =>
      c.meta.metadata.get("source_fp").contains(fp) && c.hasKeywordIndex)
    val coll = if (reusable) cat.getCollection("kwx").get else {
      cat.deleteCollection("kwx")
      val c = cat.getOrCreateCollection("kwx")
      val all = docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"))
      c.add(all.filter(col("id").cast("long") % 7 =!= 3))
      c.buildKeywordIndex()
      c.upsert(all.filter(col("id").cast("long") % 7 === 3))
      val rebuilt = c.refreshKeywordIndex()
      require(rebuilt > 0, "kwx must exercise an incremental refresh")
      c.modifyMetadata(Map("source_fp" -> fp))
      c
    }
    require(coll.hasKeywordIndex, "kwx must serve through the keyword sidecar")
    coll
  }

  /** The fingerprint-cached ANALYZER collection for q161/q162: the
    * documents text with deterministic punctuation attached to every
    * token (`<<w1, w2, ..., wn...`) hydrated under the "simple" keyword
    * analyzer setting (`graft:analyzer` collection metadata — the rule a
    * punctuated natural-language RAG query needs), exercised through the
    * same incremental keyword-refresh discipline as [[kwxCollection]] so
    * the analyzer stamp rides the carry path too. */
  private def kwaCollection(s: SparkSession, dir: String): Collection = {
    val docs = t(s, dir, "documents")
    val root = verifyCollectionsRoot(dir)
    val cat = new CollectionCatalog(s, root, numBuckets = 8)
    val fp = s"kwa1|$dir|n=${docs.count()}"
    val reusable = cat.getCollection("kwa").exists(c =>
      c.meta.metadata.get("source_fp").contains(fp) && c.hasKeywordIndex)
    val coll = if (reusable) cat.getCollection("kwa").get else {
      cat.deleteCollection("kwa")
      val c = cat.getOrCreateCollection("kwa",
        metadata = Map(Collection.AnalyzerKey -> "simple"))
      val all = docs.select(col("doc_id").cast("string").as("id"),
        concat(lit("<<"), regexp_replace(col("text"), " ", ", "), lit("..."))
          .as("document"))
      c.add(all.filter(col("id").cast("long") % 7 =!= 3))
      c.buildKeywordIndex()
      c.upsert(all.filter(col("id").cast("long") % 7 === 3))
      val rebuilt = c.refreshKeywordIndex()
      require(rebuilt > 0, "kwa must exercise an incremental refresh")
      c.modifyMetadata(Map("source_fp" -> fp))
      c
    }
    require(coll.hasKeywordIndex && coll.analyzer == "simple",
      "kwa must serve through an analyzer-stamped keyword sidecar")
    coll
  }

  /** The fingerprint-cached hash-embedded + keyword-indexed collection
    * shared by q158 and q163 (the one-call hybrid, via the Scala API and
    * via the `graft_hybrid` SQL table function). */
  private def hyxCollection(s: SparkSession, dir: String): Collection = {
    val docs = t(s, dir, "documents")
    val root = verifyCollectionsRoot(dir)
    val cat = new CollectionCatalog(s, root, numBuckets = 8)
    val fp = s"hyx1|$dir|n=${docs.count()}"
    val reusable = cat.getCollection("hyx").exists(c =>
      c.meta.metadata.get("source_fp").contains(fp) && c.hasKeywordIndex)
    val coll = if (reusable) cat.getCollection("hyx").get else {
      cat.deleteCollection("hyx")
      val c = cat.getOrCreateCollection("hyx", space = "cosine")
      c.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document")), HashingEmbedder(16))
      c.buildKeywordIndex()
      c.modifyMetadata(Map("source_fp" -> fp))
      c
    }
    require(coll.hasKeywordIndex, "hyx must serve the keyword leg through the sidecar")
    coll
  }

  /** The fingerprint-cached PQ-indexed, hash-embedded collection shared
    * by q150 and q160 (text→PQ reads, and the both-legs-indexed hybrid). */
  private def qtpqCollection(s: SparkSession, dir: String): Collection = {
    val docs = t(s, dir, "documents")
    val root = verifyCollectionsRoot(dir)
    val cat = new CollectionCatalog(s, root, numBuckets = 8)
    val fp = s"qtpq1|$dir|n=${docs.count()}|embed=hash16|cs=0-7|ps=1-16|m=8"
    val reusable = cat.getCollection("qtpq").exists(c =>
      c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
    if (reusable) cat.getCollection("qtpq").get else {
      cat.deleteCollection("qtpq")
      val c = cat.getOrCreateCollection("qtpq", space = "cosine")
      c.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang")), HashingEmbedder(16))
      c.buildIndexPqSeeded((0L until 8L).map(_.toString),
        (1L to 16L).map(_.toString), m = 8)
      c.modifyMetadata(Map("source_fp" -> fp))
      c
    }
  }

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark only reads as a long
    * (nanos) via this legacy flag; DuckDB truncates the same values to µs.
    * All event-time arithmetic therefore happens on integer MICROSECONDS on
    * both engines — exact parity, no float drift. Sources may also carry a
    * true timestamp column (e.g. the ScaleUp replica's micros round-trip);
    * either physical type lands on the same canonical `us` basis. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    val us = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      // naive timestamps (timestamp[us] parquet with no tz) land as NTZ;
      // the session tz is pinned UTC (GraftSession), so the cast to
      // TIMESTAMP reinterprets the same wall-clock instant DuckDB's
      // epoch_us reads — exact micros parity
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
    raw.withColumn("us", us)
  }

  private[graft] def headVec(emb: DataFrame, id: Long): Seq[Float] =
    emb.filter(col("vec_id") === id).select("embedding").head().getSeq[Float](0)

  /** SURVEY §2.D rule 2c: every terminal rounded float goes through
    * [[Distances.roundz]] (round + signed-zero normalization). Spark's
    * BigDecimal round can't emit −0.0 today, but the rule is structural —
    * the +0.0 identity keeps query entries immune to any future rounding
    * path (and mirrors the `+ 0.0` every oracle ROUND carries). */
  private def roundz(c: Column, scale: Int): Column = Distances.roundz(c, scale)

  /** Shared export cache for the round-trip queries (q110/q118/q119): one
    * export per (fixture content, kind). Key = source CONTENT (mtime+size),
    * not the dir-path hash — a regenerated fixture or a colliding path
    * hash must never silently reuse a stale export; completeness = the
    * `_SUCCESS` marker (written last by the committer), so a killed
    * half-written export re-exports instead of hash-mismatching. All
    * probes through Hadoop FS, never java.io.File (the verify dir may be
    * remote one day — Ann.writeIvf's rationale). */
  private def cachedExport(s: SparkSession, dir: String, table: String,
                           kind: String)(write: String => Unit): String = {
    import org.apache.hadoop.fs.Path
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$dir/$table.parquet")
    val st = src.getFileSystem(hconf).getFileStatus(src)
    val tag = java.lang.Long.toHexString(
      st.getModificationTime ^ (st.getLen * 1315423911L))
    val path = s"/root/repo/target/verify-$kind/sf_$tag"
    if (!new Path(path).getFileSystem(hconf).exists(new Path(path, "_SUCCESS")))
      write(path)
    path
  }

  // ---- DuckDB-side distance SQL, mirroring graft.functions.Distances ----
  // (same Double casts, same index order, same 1 - dot/(sqrt*sqrt) shape)
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), j -> CAST($a[j+1] AS DOUBLE) * CAST($b[j+1] AS DOUBLE)))"
  private def sqlCos(a: String, b: String): String =
    s"1 - (${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
  private def sqlL2(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), j -> (CAST($a[j+1] AS DOUBLE) - CAST($b[j+1] AS DOUBLE)) * (CAST($a[j+1] AS DOUBLE) - CAST($b[j+1] AS DOUBLE))))"
  private def sqlIp(a: String, b: String): String = s"1 - ${sqlDot(a, b)}"

  /** DuckDB replay of [[graft.expressions.StrHash]] (the engine-portable
    * id hash; same form as the q58 oracle). */
  private def sqlStrHash(e: String): String =
    s"COALESCE(list_sum(list_transform(range(length($e)), " +
      s"i -> ascii(substr($e, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0)"

  /** DuckDB replay of Mixture's thresholdable spread of [[sqlStrHash]]
    * (31-bit clamp then multiplicative mix — see Mixture.idHash for why
    * the raw polynomial can neither be thresholded directly nor multiplied
    * unclamped). */
  private def sqlSpreadHash(e: String): String =
    s"(((${sqlStrHash(e)} % 2147483647) * 2654435761) % 1000000007)"

  /** DuckDB replay of Ann.srpBucket's fixed projection arithmetic. */
  private def sqlSrpBucket(v: String, dim: Int = 64, nBits: Int = 8,
      off: String = "0"): String =
    s"""CAST(list_sum(list_transform(range($nBits), b ->
       |  CASE WHEN list_sum(list_transform(range($dim), j ->
       |         CAST($v[j+1] AS DOUBLE)
       |         * (((1103515245 * ((b + $off)*$dim + j) + 12345) % 2001 - 1000) / 1000.0))) >= 0
       |       THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** DuckDB replay of [[graft.operators.Retrieval.bm25TopK]] ending in a
    * `kwtop(id, score, rnk)` CTE. Every numeric literal interpolates from
    * the SAME Scala double the Spark side computes with (shortest-roundtrip
    * toString), so both engines parse bit-identical constants — `k1 + 1`
    * in particular sits on a rounding boundary a hand-written `2.2` could
    * miss. The arithmetic parenthesization mirrors the Column expression
    * token for token; only IEEE-exact ops appear (log-free idf). */
  private def sqlBm25(n: Int, terms: Seq[String] = Seq("hash", "join", "stream"),
                      k1: Double = 1.2, b: Double = 0.75,
                      idExpr: String = "doc_id",
                      tokCte: Option[String] = None): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val toks = tokCte.getOrElse(
      s"""toks AS (SELECT $idExpr AS id,
         |              unnest(string_split_regex(lower(text), '\\s+')) AS term
         |              FROM documents)""".stripMargin)
    s"""WITH $toks,
       |dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY id),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot_dl FROM dl),
       |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks
       |       WHERE term IN ($termList) GROUP BY id, term),
       |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.id,
       |    ROUND((((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1}))
       |      / (tf + $k1 * (${1 - b} + ($b * CAST(dl AS DOUBLE) * n_docs) / CAST(tot_dl AS DOUBLE))), 6) AS s
       |    FROM tf JOIN dft USING (term) JOIN dl USING (id) CROSS JOIN stats),
       |kws AS (SELECT id, CAST(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS score
       |        FROM sc GROUP BY id),
       |kwtop AS (SELECT id, score, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk
       |          FROM kws ORDER BY score DESC, id LIMIT $n)""".stripMargin
  }

  /** The "simple" ANALYZER's toks CTE over the q161/q162 fixture corpus
    * (the documents text with deterministic punctuation attached:
    * `<<w1, w2, ..., wn...`): lowercase, whitespace split, strip
    * leading/trailing non-[letter/digit], drop empties — the literal
    * DuckDB replay of [[graft.operators.Retrieval.termsCol]]'s "simple"
    * rule (Java regex and RE2 agree on \\p{L}/\\p{N} classes). */
  private def sqlBm25SimpleToks(idExpr: String = "CAST(doc_id AS VARCHAR)"): String =
    s"""pdocs AS (SELECT $idExpr AS id,
       |       concat('<<', regexp_replace(text, ' ', ', ', 'g'), '...') AS ptext
       |       FROM documents),
       |rawt AS (SELECT id, unnest(string_split_regex(lower(ptext), '\\s+')) AS rt
       |         FROM pdocs),
       |stript AS (SELECT id,
       |       regexp_replace(regexp_replace(rt, '^[^\\p{L}\\p{N}]+', ''),
       |                      '[^\\p{L}\\p{N}]+$$', '') AS term
       |       FROM rawt),
       |toks AS (SELECT id, term FROM stript WHERE length(term) > 0)""".stripMargin

  private lazy val sqlHybridTextOracle: String = {
      val hash = sqlStrHash("tm")
      sqlBm25(50, idExpr = "CAST(doc_id AS VARCHAR)") + s""",
         |qt AS (SELECT 0 AS qid, 'hash join stream' AS qtext),
         |toks2 AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |          FROM documents),
         |tk2 AS (SELECT doc_id, $hash AS h FROM toks2 WHERE length(tm) > 0),
         |sums2 AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM tk2 GROUP BY doc_id, b),
         |grid2 AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |          CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs2 AS (SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |          FROM grid2 g LEFT JOIN sums2 s ON s.doc_id = g.doc_id AND s.b = g.b
         |          GROUP BY g.doc_id),
         |qtoks2 AS (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk2 AS (SELECT qid, $hash AS h FROM qtoks2 WHERE length(tm) > 0),
         |qsums2 AS (SELECT qid, CAST(h % 16 AS INTEGER) AS b,
         |                  SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |           FROM qtk2 GROUP BY qid, b),
         |qgrid2 AS (SELECT qq.qid, bb.b FROM (SELECT DISTINCT qid FROM qt) qq
         |           CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |qvecs2 AS (SELECT g.qid, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS qv
         |           FROM qgrid2 g LEFT JOIN qsums2 s ON s.qid = g.qid AND s.b = g.b
         |           GROUP BY g.qid),
         |cd2 AS (SELECT v.doc_id, ${sqlCos("v.v", "q.qv")} AS dist_raw
         |        FROM vecs2 v CROSS JOIN qvecs2 q),
         |vr AS (SELECT id, rnk FROM (SELECT CAST(doc_id AS VARCHAR) AS id,
         |         ROW_NUMBER() OVER (ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk
         |       FROM cd2) WHERE rnk <= 50)
         |SELECT COALESCE(k.id, v.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + k.rnk), 0) + COALESCE(1.0 / (60 + v.rnk), 0), 6) + 0.0 AS rrf
         |FROM kwtop k FULL OUTER JOIN vr v ON k.id = v.id
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    }

  private def sqlKnnSingle(distSql: String, extraWhere: String = ""): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |d AS (SELECT e.vec_id AS vec_id, $distSql AS dist_raw
       |      FROM embeddings e, q WHERE e.vec_id <> 0 $extraWhere)
       |SELECT vec_id, ROUND(dist_raw, 4) + 0.0 AS dist FROM d
       |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin

  private val enStop = TextAnalysis.stopwordList("en")
  private def sqlInList(ws: Seq[String]): String = ws.map("'" + _ + "'").mkString("(", ", ", ")")

  /** Flagship: the reference's WHOLE life on sf0.001 — wide input (the
    * CAS-table shape, README.md:75) through the validated Hydrator config
    * path (A15 gates → A2/A4 assembly → A9/A10 collection add with count
    * conservation) into a Chroma-style filtered kNN read (B6+B7). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val root = "/root/repo/target/entry-collections"
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    // wide-ize: embeddings as emb_0..emb_63 columns, the reference's input shape
    val wideCols = (0 until 64).map(j => element_at(col("embedding"), j + 1).as(s"emb_$j"))
    docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id") +: col("text") +: col("label") +: wideCols: _*)
      .createOrReplaceTempView("entry_wide")
    new CollectionCatalog(spark, root).deleteCollection("flagship")
    val coll = Hydrator.run(spark, HydrateConfig(
      inputTable = "entry_wide", textVar = "text", docId = "doc_id",
      embeddingPattern = "emb_", metadataColumn = Some("label"),
      collectionName = "flagship",
      persistentPath = Hydrator.resolvePersistentPath(s"sasserver:$root"),
      space = "cosine")).get
    require(coll.count() == 500L, "hydration count conservation failed")
    coll.query(headVec(emb, 0), 10,
      where = Some(ChromaFilter.Ne("rating", "999")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-A10: the hydration projection itself (join + id cast + metadata map)
    "q00_hydrate" -> ((s, dir) => {
      val docs = t(s, dir, "documents"); val emb = t(s, dir, "embeddings")
      docs.join(emb, col("doc_id") === col("vec_id"))
        .select(Assemble.idAsString("doc_id"), col("text").as("document"),
          size(col("embedding")).as("dim"),
          element_at(Assemble.metadataMap("label"), "rating").as("rating"))
        .orderBy("id")
    }),
    // A1,A5,A6: scan + project + cast
    "q01_scan_project_cast" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(Assemble.idAsString("doc_id"), col("text")).orderBy("id")),
    // A2,A4: wide-pattern projection + row-wise assembly with null drop
    "q02_wide_assemble_nulldrop" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val wideCols = (0 until 64).map { j =>
        when(pmod(col("vec_id") + lit(j), lit(17)) === 0, lit(null).cast("float"))
          .otherwise(element_at(col("embedding"), j + 1)).as(s"emb_$j")
      }
      val wide = emb.select(col("vec_id").as("doc_id") +: wideCols: _*)
      wide.select(col("doc_id"),
          size(Assemble.assembleVectorLike(wide, "emb_")).as("dim"))
        .orderBy("doc_id")
    }),
    // A11/B10: count
    "q03_count" -> ((s, dir) =>
      t(s, dir, "documents").agg(count(lit(1)).as("cnt"))),
    // B7 $eq (+ A5 cast)
    "q04_filter_eq" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .filter(ChromaFilter.Eq("label", 3).toColumn)
        .select(col("vec_id").cast("string").as("id")).orderBy("id")),
    // B7 $in
    "q05_filter_in" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(ChromaFilter.In("lang", Seq("en", "es")).toColumn)
        .select("doc_id").orderBy("doc_id")),
    // B7 $gt/$lte
    "q06_filter_range" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(ChromaFilter.And(Seq(
          ChromaFilter.Gt("n_chars", 100), ChromaFilter.Lte("n_chars", 200))).toColumn)
        .select("doc_id").orderBy("doc_id")),
    // B7 $and/$or/$ne/$gte
    "q07_filter_bool" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(ChromaFilter.And(Seq(
          ChromaFilter.Or(Seq(
            ChromaFilter.Eq("lang", "en"), ChromaFilter.Ne("source", "src0"))),
          ChromaFilter.Gte("n_chars", 64))).toColumn)
        .select("doc_id").orderBy("doc_id")),
    // B8 $contains
    "q08_doc_contains" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(ChromaFilter.Contains("scan").toColumn(col("text")))
        .select("doc_id").orderBy("doc_id")),
    // B8 $not_contains
    "q09_doc_not_contains" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(ChromaFilter.NotContains("scan").toColumn(col("text")))
        .agg(count(lit(1)).as("cnt"))),
    // B5 get with limit/offset
    "q10_get_limit_offset" -> ((s, dir) =>
      t(s, dir, "documents").select("doc_id", "lang")
        .orderBy("doc_id").offset(5).limit(10)),
    // B6/B9 cosine top-k
    "q11_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Knn.topK(emb, "vec_id", "embedding", headVec(emb, 0), 10, "cosine",
          excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // Quantized-corpus kNN (asymmetric: raw float query vs int8-
    // dequantized corpus) — the 4×-smaller scan a 100 TB vector table
    // wants; quantization arithmetic is IEEE-exact so the oracle replays
    // codes, scales, and distances value-for-value
    "q69_quantized_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // frame form: the per-row scale projects ONCE (the single-Column
      // composition re-evaluates the max-abs subtree per element)
      val dq = Ann.quantizeInt8Frame(emb, "vec_id", "embedding")
        .select(col("vec_id"),
          Ann.dequantizeInt8(struct(col("codes"), col("scale"))).as("embedding"))
      Knn.topK(dq, "vec_id", "embedding", headVec(emb, 0), 10, "cosine",
          excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // B9 squared-L2 top-k
    "q12_knn_l2" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Knn.topK(emb, "vec_id", "embedding", headVec(emb, 0), 10, "l2",
          excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // B9 inner-product top-k
    "q13_knn_ip" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Knn.topK(emb, "vec_id", "embedding", headVec(emb, 0), 10, "ip",
          excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // B6+B7 metadata-prefiltered kNN
    "q14_knn_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val lbl = emb.filter(col("vec_id") === 0).select("label").head().getInt(0)
      Knn.topK(emb, "vec_id", "embedding", headVec(emb, 0), 10, "cosine",
          preFilter = Some(ChromaFilter.Eq("label", lbl).toColumn),
          excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // B6 batch kNN (broadcast queries + per-query rank limit)
    "q15_knn_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Knn.topKBatch(emb, "vec_id", "embedding",
          emb.filter(col("vec_id").between(0, 4)), "vec_id", "embedding", 5, "cosine")
        .select(col("qid"), col("rnk"), col("vec_id")).orderBy("qid", "rnk")
    }),
    // C1 exact dedup (count distinct + keep-min-id dedup count)
    "q16_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.agg(countDistinct(col("text")).as("n_distinct")).crossJoin(
        Dedup.exactDedup(docs, Seq("text"), "doc_id").agg(count(lit(1)).as("n_after")))
    }),
    // B2 upsert latest-wins
    "q17_upsert_latest_wins" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val b1 = docs.select(col("doc_id"), col("text"), lit(1).as("batch"))
      val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), upper(col("text")).as("text"), lit(2).as("batch"))
      // latest-wins via row_number ≤ 1: Spark plans this as
      // WindowGroupLimit, which prunes every group to its top row ON THE
      // MAP SIDE before the shuffle — the scalable shape for a 100 TB
      // upsert stream. (A max_by(struct(batch, text)) agg is NOT better:
      // var-length buffers force SortAggregate, a full per-group sort.)
      val w = Window.partitionBy("doc_id").orderBy(col("batch").desc)
      b1.unionByName(b2)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("doc_id"), col("batch"), length(col("text")).as("n"))
        .orderBy("doc_id")
    }),
    // B4 delete = anti-join against an id list
    "q18_delete_antijoin" -> ((s, dir) => {
      import s.implicits._
      val doomed = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L).toDF("doc_id")
      t(s, dir, "documents").join(doomed, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("cnt"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
    }),
    // C4 hash aggregation
    "q19_agg_by_lang" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("cnt"), roundz(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang")),
    // C4 TPC-H Q1-ish aggregate scan. Money math is DECIMAL internally
    // (exact, fold-order-free) but the OUTPUT is cast to DOUBLE: the
    // driver's hash canonicalizes by value string, and DECIMAL('x.8100')
    // vs DuckDB-fetched float 'x.81' mismatch whenever the 4th decimal is
    // zero. decimal->double is deterministic on both engines (scaled
    // int < 2^53 converts exactly, one correctly-rounded divide).
    "q20_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
    // C4/C5 join + top-k per group
    "q21_topk_per_nation" -> ((s, dir) => {
      val tot = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)).as("total"))
      tot.withColumn("rnk", row_number().over(
          Window.partitionBy("n_name").orderBy(col("total").desc, col("c_custkey"))))
        .filter(col("rnk") <= 3)
        // rank on the exact decimal; ship the output as double (hash parity)
        .select(col("n_name"), col("rnk"), col("c_custkey"),
          col("total").cast("double").as("total"))
        .orderBy("n_name", "rnk")
    }),
    // C6/C7 time bucketing + JSON scalar (integer µs arithmetic).
    // FLOOR division, not `div` (truncation): they differ for pre-epoch
    // timestamps, and the DuckDB oracle's `//` floors. (us - pmod) div d
    // is exact integer floor-division.
    "q22_events_hourly_json" -> ((s, dir) =>
      events(s, dir)
        .groupBy(expr("(us - pmod(us, 3600000000)) div 3600000000").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(get_json_object(col("props"), "$.k").cast("int")).cast("long").as("sum_k"))
        .orderBy("hr", "event_type")),
    // C5 sessionization (lag + cumulative sum)
    "q23_sessionize" -> ((s, dir) => {
      val ev = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev.withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull
            || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_idx", sum(col("new_s")).over(w).cast("long"))
        .groupBy("user_id", "session_idx").agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_idx")
    }),
    // Text analysis: token counting (whitespace + BPE-ish)
    "q24_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws"),
          TextAnalysis.tokenCountBpeish(col("text")).as("n_bpeish"))
        .orderBy("doc_id")),
    // Text analysis: quality signals + composite score
    "q25_quality_score" -> ((s, dir) => {
      val q = TextAnalysis.qualityStruct(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
          q.getField("mean_tok_len").as("mean_tok_len"),
          q.getField("punct_ratio").as("punct_ratio"),
          q.getField("upper_ratio").as("upper_ratio"),
          q.getField("stopword_ratio").as("stopword_ratio"),
          TextAnalysis.qualityScore(col("text")).as("score"))
        .orderBy("doc_id")
    }),
    // Text analysis: language-ID heuristic (relational codegen form)
    "q26_langid" -> ((s, dir) =>
      TextAnalysis.langIds(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // Text analysis: rolling-hash fingerprint (relational codegen form;
    // identical values to the Column form — spec-cross-checked)
    "q27_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // C2 n-gram (word-set) Jaccard similarity over a sampled pair set
    "q28_jaccard_pairs" -> ((s, dir) => {
      val sample = t(s, dir, "documents").filter(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("id"), array_distinct(split(col("text"), " ")).as("toks"))
      sample.as("a").join(sample.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          roundz(Dedup.jaccard(col("a.toks"), col("b.toks")), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // C2 embedding-cosine near-dup pairs over a sampled set
    "q29_embedding_neardup" -> ((s, dir) => {
      val sample = t(s, dir, "embeddings").filter(pmod(col("vec_id"), lit(10)) === 0)
      // -Inf (not -1.0): float cosine can land epsilon below -1, and the
      // oracle applies NO similarity filter — every pair must survive
      Dedup.embeddingNearDup(sample, "vec_id", "embedding", Double.NegativeInfinity)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // C2 MinHash+LSH near-dup candidates, portable-hash + equality-bucket
    // form so a DuckDB oracle replays the whole signature pipeline.
    // 8 bands × 2 rows: candidate-permissive (the fixture has no exact
    // dups) while still pruning ~all of the 125k-pair cross product.
    "q30_minhash_candidates" -> ((s, dir) => {
      val sample = t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0)
      Dedup.minHashCandidates(sample, "doc_id", "text",
          shingleSize = 3, numHashes = 16, numBands = 8,
          hashFn = Dedup.portableHash)
        .orderBy("id_a", "id_b")
    }),
    // C2 SimHash 64-bit signatures, relational portable form (one codegen
    // pass: explode tokens → 64 conditional sums → bit assembly)
    "q31_simhash" -> ((s, dir) =>
      Dedup.simHashes(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy("doc_id")),
    // ANN scale path: IVF partition-pruned kNN, deterministic seeded form
    // (cells = first 8 corpus vectors, argmin-L2 assignment, nprobe=2) —
    // genuinely approximate, yet the whole index+probe path replays in the
    // DuckDB oracle. The k-means variant (Ann.buildIvf) remains the
    // library path when a fit is affordable.
    "q32_ivf_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
      Ann.queryIvf(m.assigned, m, "vec_id", "embedding", headVec(emb, 0), 10,
          nprobe = 2, space = "cosine", excludeIds = Seq(0L))
        .select(col("vec_id"), roundz(col("dist"), 4).as("dist"))
    }),
    // C2 embedding near-dup AT SCALE: SRP-LSH buckets confine the pair
    // expansion (q29's all-pairs form stays a verify primitive); the whole
    // bucket→pair→cosine path replays in the DuckDB oracle
    "q61_embedding_neardup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // The nBitsFor AUTO-SIZING dial under the oracle: bucket width sized
    // from the live corpus count (ceil-div + bit-length, integer-exact —
    // see nBitsFor's no-log rationale), then the same SRP pipeline as
    // q61. The emitted n_bits column pins the dial's own output, and the
    // oracle recomputes it from COUNT(*) with integer shifts — proving
    // the sizing rule itself is portable, not just one frozen width.
    "q113_autosized_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nb = Dedup.nBitsFor(emb.count(), targetBucket = 50)
      Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = nb)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"),
          lit(nb).as("n_bits"))
        .orderBy("id_a", "id_b")
    }),
    // Multi-probe recall dial: probes=2 additionally checks the bucket with
    // bit 0 flipped, reaching near-dup pairs that straddle one SRP
    // hyperplane (including rows that sit ALONE in their bucket) without
    // re-hashing anything — cost grows by one probed copy of side a only
    "q64_neardup_multiprobe" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8, probes = 2)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // Multi-TABLE recall dial: L=4 independent SRP tables (disjoint runs of
    // the projection sequence) union their candidate pairs — recall
    // 1−(1−p^nBits)^L, the standard LSH amplification for true near-dups
    // (p→1) while random pairs stay excluded. The whole per-table
    // bucket→union→cosine path replays in the oracle; measured recall for
    // all three SRP configurations lands in the bench recall block.
    "q82_neardup_multitable" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8, tables = 4)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // Ingest-time dedup gate: a batch (doc_id % 5 = 0) classified against
    // the already-stored corpus (the rest) — dup_exact / dup_near (LSH
    // band match + Jaccard >= 0.7) / kept. Every corpus pass is map-side
    // against a broadcast batch derivative; the corpus never shuffles.
    "q92_ingest_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dedupAgainstCorpus(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "doc_id", "text", minJaccard = 0.7,
          hashFn = Dedup.portableHash)
        .select(col("doc_id"), col("verdict"))
        .orderBy("doc_id")
    }),
    // SemDeDup (Abbas et al. 2023): seeded centroid cells (same
    // SQL-replayable assignment as q32/q60) confine the within-cell
    // pairwise cosine; a row drops iff a smaller-id cell-mate reaches
    // minSim. Cells, pairs and every keep decision replay in the oracle.
    // The cell count is SIZE-AWARE (Dedup.cellsFor — integer-only clamp
    // of n/250, the q148 dial discipline, recomputed by the oracle from
    // COUNT(*)): within-cell pair work is O(occupancy²), so the r12
    // posture of 16 pinned cells was quadratic in corpus growth — the
    // ORACLE now scales with the library path instead of fighting it.
    // Emitted as a column so the dial itself is hash-pinned.
    "q86_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nc = Dedup.cellsFor(emb.count())
      val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until nc.toLong)
      Dedup.semDedup(m.assigned, "vec_id", "embedding", minSim = 0.3)
        .select(col("vec_id"), col("cell"), lit(nc).cast("int").as("nc"))
        .orderBy("vec_id")
    }),
    // Embedding-space decontamination: the paraphrase-leakage check beside
    // q68's verbatim n-gram form. Eval vectors BROADCAST; the corpus side
    // pays one map-side nested-loop pass and never shuffles; only the
    // flagged aggregate exchanges. The eval set is label 0 CAPPED to the
    // first 500 ids — an eval/benchmark suite is FIXED-SIZE no matter how
    // far the corpus scales (the sf1 replica measured ×28 when both sides
    // grew with sf; with the cap the pass is linear in the corpus, which
    // is the real 100 TB shape).
    "q88_decontaminate_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.contaminatedEmbeddings(
          emb.filter(col("label") =!= 0), "vec_id", "embedding",
          emb.filter(col("label") === 0 && col("vec_id") < 500), "embedding",
          minSim = 0.3)
        .select(col("id").as("vec_id"), col("n_eval_hits"),
          roundz(col("max_sim"), 4).as("max_sim"))
        .orderBy("vec_id")
    }),
    // Gopher repetition filters (Rae et al. 2021 table A1): top-{2,3}-gram
    // char fraction + duplicate-5-gram char fraction per doc. Repetition
    // is per-document, so grams are counted in ONE compiled scan
    // (RepetitionStats) — ZERO shuffle; the explode→count→rollup form is
    // kept as the spec cross-check (its gram-string exchange measured ×34
    // at the sf10 step). Char sums stay integral until a single final
    // division, so the double output is fold-order-free on both engines.
    "q83_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // Token-budget sequence packing (concat-then-chunk causal-LM layout):
    // docs laid out in reshard order, each doc assigned to the sequence
    // its first token lands in. ONE per-shard window, integral `div`
    // math end to end — the assignment replays exactly in any engine.
    "q84_sequence_packing" -> ((s, dir) =>
      Mixture.packSequences(
        t(s, dir, "documents")
          .withColumn("n_tokens",
            TextAnalysis.tokenCount(coalesce(col("text"), lit("")))),
        "doc_id", "n_tokens", budget = 2048, nShards = 8)
        .orderBy("shard", "seq")),
    // The repetition gate: q83's signals composed into a keep/drop
    // decision with per-rule reasons at the published Gopher cutoffs.
    // Same zero-shuffle compiled scan; ~10% of the fixture drops.
    "q85_repetition_filter" -> ((s, dir) => {
      val f = TextAnalysis.repetitionFilter(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
          f.getField("keep").as("keep"),
          array_join(f.getField("reasons"), ",").as("reasons"))
        .orderBy("doc_id")
    }),
    // Origin-level curation: per-source mean quality score gates whole
    // sources — the domain-gate counterpart of q77's per-row rules (bad
    // origins whose individual pages squeak past row filters). The
    // per-source aggregate collapses map-side to ~|sources| rows and the
    // surviving-source table broadcasts back; the corpus never shuffles.
    "q87_source_quality_gate" -> ((s, dir) =>
      TextAnalysis.sourceQualityGate(t(s, dir, "documents"), "doc_id", "text",
          "source", minMeanScore = 0.71)
        .select(col("doc_id"), col("source"),
          roundz(col("src_score"), 4).as("src_score"))
        .orderBy("doc_id")),
    // Vocabulary-coverage signal: per-doc OOV rate against the corpus's
    // own top-1000 vocabulary (deterministic ties) — the vocab broadcasts,
    // the per-doc aggregate's exchange carries docs, never tokens.
    "q93_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovRate(t(s, dir, "documents"), "doc_id", "text",
          vocabSize = 1000)
        .select(col("doc_id"), col("n_tokens"),
          roundz(col("oov_rate"), 4).as("oov_rate"))
        .orderBy("doc_id")),
    // PII scrub audit: the fixture text carries no PII, so the query
    // PLANTS deterministic PII (email on ids ≡0 mod 3, phone mod 5, IPv4
    // mod 7 — all pure functions of fixture columns, replayed verbatim by
    // the oracle) and then detects + redacts it. Map-only: counts and the
    // scrubbed text come from codegen'd regexp expressions, no shuffle.
    "q94_pii_scrub" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact "), col("source"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-"), lpad(col("doc_id").cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".1")))
            .otherwise(lit(""))).as("ptext"))
      val st = TextAnalysis.piiStats(col("ptext"))
      planted.select(col("doc_id"),
          st.getField("n_emails").cast("long").as("n_emails"),
          st.getField("n_phones").cast("long").as("n_phones"),
          st.getField("n_ips").cast("long").as("n_ips"),
          TextAnalysis.piiScrub(col("ptext")).as("scrubbed"))
        .orderBy("doc_id")
    }),
    // Domain blocklist: URLs derived from fixture columns, blocklist
    // derived IN-ENGINE (spread-hash of the source ⇒ deterministic across
    // scales and engines), then the broadcast anti-join drop. The corpus
    // never shuffles — the 100 TB shape of every UT1-style domain filter.
    "q95_domain_blocklist" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/doc/"),
          col("doc_id").cast("string")))
      val blocked = d.select(col("source")).distinct()
        .filter(Mixture.spreadHash(col("source")) % 5 < 2)
        .select(concat(col("source"), lit(".example.com")).as("domain"))
      TextAnalysis.blockByDomain(d, "url", blocked)
        .select(col("doc_id"), col("domain"))
        .orderBy("doc_id")
    }),
    // Dedup DECISION end-to-end: LSH pairs → connected components → keep
    // the highest-quality member per cluster (ties → smallest id) via one
    // struct-max aggregate — no per-cluster window sort anywhere.
    "q96_cluster_reps" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", minSim = 0.2, dim = 64, nBits = 8)
      val clusters = Dedup.dupClusters(pairs, "id_a", "id_b")
      val scored = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      Dedup.clusterRepresentatives(clusters, "id", "cluster",
          scored, "doc_id", "score")
        .select(col("cluster"), col("n_members"), col("rep_id"),
          roundz(col("rep_score"), 4).as("rep_score"))
        .orderBy("cluster")
    }),
    // DSIR-style data selection: rank every doc by hashed-unigram
    // affinity to the English subset. Bucket table ≤256 rows, broadcasts;
    // per-doc exchange carries docs, never tokens.
    "q97_target_affinity" -> ((s, dir) =>
      TextAnalysis.targetAffinity(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", buckets = 256)
        .select(col("doc_id"), col("n_tokens"), col("s_t"), col("s_r"),
          roundz(col("affinity"), 6).as("affinity"))
        .orderBy("doc_id")),
    // C4 line filtering: the fixture has no newlines, so the query PLANTS
    // lines (newline every 7 tokens, terminal '.' on lines ending in a
    // chosen word set — both pure regex on fixture columns, replayed
    // verbatim by the oracle), then applies the compiled line rules.
    // Map-only: one LineFilterStats scan, no shuffle.
    "q98_c4_line_filter" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "((?:\\S+ ){6}\\S+) ", "$1\n"),
          "(data|join|merge|table)(\n|$)", "$1.$2").as("ptext"))
      val st = TextAnalysis.c4LineFilter(col("ptext"), minWords = 3,
        blocked = Seq("slow"))
      planted.select(col("doc_id"),
          st.getField("n_lines").as("n_lines"),
          st.getField("n_kept").as("n_kept"),
          st.getField("n_blocked").as("n_blocked"),
          st.getField("n_short").as("n_short"),
          st.getField("n_nopunct").as("n_nopunct"),
          st.getField("cleaned").as("cleaned"))
        .orderBy("doc_id")
    }),
    // Corpus-level line dedup (CCNet shape): 3-token planted lines give
    // ~19% cross-document duplicate mass on the fixture; keep-first is
    // the min (doc, idx) struct per line key, docs rebuild via the
    // compiled LinesAt scan. Line strings never cross an exchange.
    "q99_line_dedup" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((?:\\S+ ){2}\\S+) ", "$1\n").as("ptext"))
      Dedup.dedupLinesAcrossCorpus(planted, "doc_id", "ptext")
        .orderBy("doc_id")
    }),
    // Curation funnel audit: cumulative survivor counts + token mass per
    // gate, ONE corpus scan collapsing to a single row that explodes into
    // the per-stage table. The "no silent caps" report.
    "q100_curation_funnel" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextAnalysis.curationFunnel(d, Seq(
          "all" -> lit(true),
          "lang" -> col("lang").isin("en", "de"),
          "quality" -> (TextAnalysis.qualityScore(col("text")) >= 0.5),
          "length" -> size(split(col("text"), " ")).between(25, 90),
          "clean" -> !col("text").contains("slow")),
        metric = size(split(col("text"), " ")).cast("long"))
        .orderBy("stage_idx")
    }),
    // URL canonicalization + dedup: planted URLs vary case, default port,
    // tracking params and fragments over a shared 100-path space; the
    // regex canonical form collapses them and exactDedup keeps the first.
    "q101_url_canon_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), concat(
          lit("HTTPS://WWW.Example.COM"),
          when(col("doc_id") % 4 === 0, ":443").otherwise(""),
          lit("/doc/"), (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=feed&ref="), col("source"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("#sec")).otherwise(lit(""))).as("url"))
        .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
      Dedup.exactDedup(d, Seq("canon"), "doc_id")
        .select(col("doc_id"), col("canon")).orderBy("doc_id")
    }),
    // Winnowing fingerprints (MOSS): the position-robust sketch — shared
    // substrings ≥ k+w−1 chars guarantee a common entry. Map-only
    // compiled scan; the oracle replays gram hashing, rightmost-min
    // window selection and the distinct-sort in pure list SQL. The
    // sorted fingerprint list is emitted as a comma-joined STRING —
    // the driver's value-sort compare cannot hash an array column
    // (the same constraint that put q65 in long form).
    "q102_winnow_fingerprints" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.winnowFingerprints(col("text"), k = 12, w = 4).as("fps"))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fps"),
          array_join(col("fps").cast("array<string>"), ",").as("fps"))
        .orderBy("doc_id")),
    // KMV distinct-token estimate per lang: the oracled sketch path for
    // 100 TB cardinality — distinct (lang, hash) partial-aggregates,
    // rank ≤ k prunes map-side (WindowGroupLimit), the final exchange
    // carries ≤ k rows per group. k=16 < the fixture vocab so the
    // estimator branch (not the exact fallback) is what's pinned.
    "q103_kmv_distinct" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
      Sketches.kmvDistinct(tok, "lang", col("tk"), k = 16).orderBy("lang")
    }),
    // Count-min sketch heavy-hitter estimates: the corpus token stream
    // collapses to a d×w integer table (map-side-combinable groupBy,
    // final exchange ≤ d·w rows), then point estimates for a probe list
    // read min-over-rows from the finished sketch — the 100 TB
    // frequency-question shape where an exact vocabulary groupBy would
    // shuffle vocabulary-sized state. Every hash is the portable
    // strHash→clamp→spread chain, so build AND estimates replay
    // integer-exact in the oracle (est is an upper bound on exact_cnt —
    // both columns emitted, so the CMS guarantee itself is under test).
    "q135_cms_heavyhitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(
        explode(filter(split(lower(col("text")), "\\s+"),
          x => x =!= lit(""))).as("tok"))
      val sketch = Sketches.countMinSketch(toks, col("tok"), d = 4, w = 256)
      val probes = Seq("the", "vector", "table", "spark", "zzz-never-seen")
      val est = Sketches.countMinEstimate(sketch, probes, d = 4, w = 256)
      val exact = toks.groupBy(col("tok").as("token"))
        .agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("token"), "left")
        .na.fill(0L, Seq("exact_cnt"))
        .select(col("token"), col("est"), col("exact_cnt"))
        .orderBy("token")
    }),
    // Winnowing overlap pairs — the MOSS decision surface. DECLARED
    // BOUNDED VERIFY PRIMITIVE (like q28/q29): all-pairs over a FIXED
    // sample (mod-50 within doc_id < 5000 — the q88 lesson: a sample
    // that grows with the corpus makes all-pairs quadratic, ×16.7 at the
    // 10× replica before the cap) verifies the sketch-intersection
    // semantics; the scale path is explode + join on the fingerprint
    // (bucket-confined), the same shape as the LSH candidate paths.
    "q104_winnow_overlap" -> ((s, dir) => {
      val f = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("id"),
          TextAnalysis.winnowFingerprints(col("text"), k = 12, w = 4).as("fps"))
      f.as("a").join(f.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          size(array_intersect(col("a.fps"), col("b.fps"))).cast("long").as("n_shared"))
        .filter(col("n_shared") >= 1)
        .orderBy("id_a", "id_b")
    }),
    // Bigram LM predictability (the CCNet perplexity-filter primitive,
    // log-free so it oracles): corpus bigram/unigram counts on hashed
    // tokens, per-doc count-weighted mean of P(w_i | w_{i-1}). Every
    // exchange carries (id, h1, h2, k) longs, never token strings.
    "q105_bigram_lm" -> ((s, dir) =>
      Lm.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // One BPE training step: top-20 adjacent char pairs weighted by word
    // frequency — counted over the VOCAB (corpus collapses to (word, f)
    // first), the shape that makes iterated BPE affordable at 100 TB.
    "q106_bpe_merges" -> ((s, dir) =>
      Lm.bpeMergeCandidates(t(s, dir, "documents"), "text", topN = 20)
        .orderBy("rank")),
    // KMV pairwise overlap: per-lang k-min sketches → per-pair union /
    // Jaccard / intersection estimates — cross-source coverage at 100 TB
    // without any exact pairwise distinct-count. Same spread hash and
    // estimator constant as q103, so the whole chain replays.
    "q107_kmv_overlap" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
      Sketches.kmvPairwiseOverlap(tok, "lang", col("tk"), k = 16)
        .select(col("g_a").as("lang_a"), col("g_b").as("lang_b"),
          col("n_union_sketch"), col("j"), col("union_est"), col("inter_est"))
        .orderBy("lang_a", "lang_b")
    }),
    // Retention triangle over the event log: cohort = first-activity
    // day; the only corpus-sized exchange is the distinct (user, day)
    // collapse — bounded by users × days, not events.
    "q108_retention" -> ((s, dir) =>
      Events.retentionCohorts(events(s, dir), "user_id", "us")
        .orderBy("cohort_day", "day_offset")),
    // JSONL ingest round-trip: the corpus exports to line-delimited JSON
    // (the entry format of most LLM corpora) once per scale, then the
    // query reads it back with an EXPLICIT schema (no inference pass —
    // at 100 TB schema inference is a full extra scan) and aggregates.
    // The oracle aggregates the ORIGINAL table: a hash match proves the
    // write→read loop is lossless byte-for-byte through JSON escaping
    // (newlines, quotes, CJK) — not merely self-consistent.
    "q110_jsonl_roundtrip" -> ((s, dir) => {
      val path = cachedExport(s, dir, "documents", "jsonl") { p =>
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
          .write.mode("overwrite").json(p)
      }
      s.read.schema("doc_id LONG, lang STRING, text STRING").json(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"))
        .orderBy("lang")
    }),
    // CSV ingest round-trip, q110's pattern with the quoting semantics CSV
    // adds: the fixture text has no embedded newlines/quotes/commas, so a
    // constructed `gnarly` column (comma + double-quote + newline prefix)
    // forces the writer through quoting + escape + multi-line records. The
    // oracle aggregates the ORIGINAL table with the same construction — a
    // hash match proves write→multiLine-read lossless where CSV is
    // actually hard. Same content-keyed export cache, Hadoop-FS probes.
    "q118_csv_roundtrip" -> ((s, dir) => {
      val path = cachedExport(s, dir, "documents", "csv") { p =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            concat(lit("x,\"y\"\n"), col("text")).as("gnarly"))
          .write.mode("overwrite").csv(p)
      }
      s.read.schema("doc_id LONG, lang STRING, text STRING, gnarly STRING")
        .option("multiLine", "true").csv(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          sum(length(col("gnarly"))).cast("long").as("n_gnarly"))
        .orderBy("lang")
    }),
    // ORC ingest round-trip — the TYPED columnar sibling of q110/q118,
    // through the nested ARRAY<FLOAT> column: read back with an explicit
    // schema and aggregate with the q65 per-(label,pos) DECIMAL-mean fold
    // (pinned cross-engine at all four scales). The oracle runs the same
    // fold on the ORIGINAL parquet. NOT one whole-label element sum: the
    // per-element float→DECIMAL cast rounds differently between engines
    // on rare boundary values, and a 10⁵-element sum accumulates that
    // into the 4th decimal (measured on the sf1 replica's jittered
    // copies); per-(label,pos) means divide the same noise below ROUND(4).
    "q119_orc_roundtrip" -> ((s, dir) => {
      val path = cachedExport(s, dir, "embeddings", "orc") { p =>
        t(s, dir, "embeddings").write.mode("overwrite").orc(p)
      }
      s.read.schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT").orc(path)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          roundz(sum(col("e").cast(DecimalType(18, 6))).cast("double")
            / count(lit(1)), 4).as("m"))
        .orderBy("label", "pos")
    }),
    // The planted-twin ground-truth eval, ORACLED: Recall.plantedUnion's
    // deterministic jittered twins (cosine ≈ 0.97) union the fixture,
    // and the 4-table SRP near-dup path must recover the (v, twin)
    // pairs at minSim = 0.9 — the bench's trust metric as a
    // hash-checked query. FIXED id cap (vec_id < 500): the eval set
    // must not grow with the corpus (the q88/q104 lesson).
    "q109_planted_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      Dedup.embeddingNearDupLsh(Recall.plantedUnion(emb), "vec_id",
          "embedding", minSim = 0.9, dim = 64, nBits = 8, tables = 4)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // Corpus length-distribution report: exact per-lang percentiles over
    // the VALUE HISTOGRAM — the exchange carries distinct lengths, not
    // rows (Spark's own percentile agg buffers every row's value in its
    // aggregation state); one interpolation at the end, oracle-replayed.
    "q89_length_percentiles" -> ((s, dir) =>
      TextAnalysis.percentileProfile(t(s, dir, "documents"), "lang", "n_chars")
        .select(col("lang"), col("n"),
          roundz(col("p25"), 4).as("p25"), roundz(col("p50"), 4).as("p50"),
          roundz(col("p75"), 4).as("p75"), roundz(col("p95"), 4).as("p95"))
        .orderBy("lang")),
    // Grouped mean-pooling: ONE embedding per label (the doc-from-chunks /
    // class-centroid primitive every training pipeline needs). posexplode →
    // one shuffle on (label,pos) whose partial sums combine map-side (the
    // shuffle carries groups, not rows). Exact decimal sums + ONE double
    // division: fold-order-free. Oracled in LONG form (label,pos,m) — the
    // driver's compare sorts rows value-wise, which an array column can't
    // support; the array reassembly of the same numbers is spec-pinned
    // (AnnSpec "label centroid: long form reassembles").
    "q65_label_centroid" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy("label", "pos")
        .agg((sum(col("e").cast(DecimalType(18, 6))).cast("double")
          / count(lit(1))).as("m"))
        .select(col("label"), col("pos"), roundz(col("m"), 4).as("m"))
        .orderBy("label", "pos")),
    // Keyword retrieval: BM25-style scoring (log-free idf — IEEE-exact,
    // replayable), one explode pass, broadcast df/stats, decimal score fold
    "q66_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "stream"), 20)
        .select(col("id"), col("rnk"), roundz(col("score"), 4).as("score"))
        .orderBy("rnk")),
    // q66's SCALE PATH: the same BM25 top-k served through the persisted
    // keyword-stats sidecar (KeywordIndex — per-query cost O(matching
    // postings) on tp-pruned partitions, not q66's O(corpus) explode),
    // exercised THROUGH an incremental refresh (bulk add + build, then an
    // upsert slice + refreshKeywordIndex, which rebuilds only touched id
    // buckets and carries the rest by manifest). The shared score fold
    // makes the result hash-EQUAL to the scan-semantics oracle by
    // construction. Hydrate-once with the q112 fingerprint discipline.
    // The plain-Spark-SQL surface: a hydrated collection read back through
    // `spark.read.format("graft")` (RelationProvider → Spark's own parquet
    // relation over the carry-resolved snapshot leaf dirs), with a filter
    // + projection that must behave exactly like the scan-semantics
    // oracle. Pushdown (ReadSchema pruning, PushedFilters) is pinned by
    // GraftDataSourceSpec; this entry pins the VALUES end-to-end.
    "q155_dsv2_read" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      val fp = s"dsv1|$dir|n=${docs.count()}"
      val reusable = cat.getCollection("dsv").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp))
      if (!reusable) {
        cat.deleteCollection("dsv")
        val c = cat.getOrCreateCollection("dsv")
        c.add(docs.select(col("doc_id").cast("string").as("id"),
          col("text").as("document"), col("lang"), col("n_chars")))
        c.modifyMetadata(Map("source_fp" -> fp))
      }
      s.read.format("graft").option("root", root).option("name", "dsv").load()
        .filter(col("lang") === "en" && col("n_chars") > 200)
        .select(col("id"), col("lang"), col("n_chars"))
        .orderBy(col("id").cast("long"))
    }),
    "q154_kwindex_bm25" -> ((s, dir) =>
      kwxCollection(s, dir).keywordTopK(Seq("hash", "join", "stream"), 20)
        .select(col("id"), col("rnk"), roundz(col("score"), 4).as("score"))
        .orderBy("rnk")),
    // Hybrid retrieval THROUGH the sidecar: q67's reciprocal-rank fusion
    // with the keyword leg served index-confined (KeywordIndex via the
    // kwx collection — per-query cost O(matching postings), the shape a
    // RAG stack actually runs per user query at 100 TB) instead of q67's
    // O(corpus) re-explode. Fusion math identical; ids are the store's
    // STRINGS, so ranks/ties replay on VARCHAR order in the oracle.
    "q157_hybrid_rrf_indexed" -> ((s, dir) => {
      val kw = kwxCollection(s, dir)
        .keywordTopK(Seq("hash", "join", "stream"), 50)
        .select(col("id"), col("rnk"))
      val qv = headVec(t(s, dir, "embeddings"), 0)
      val vr = Knn.topK(t(s, dir, "embeddings"), "vec_id", "embedding",
          qv, 50, "cosine", excludeIds = Seq(0))
        .select(col("vec_id").cast("string").as("id"), row_number().over(
          Window.orderBy(col("dist"), col("vec_id"))).as("rnk"))
      Retrieval.rrf(Seq(kw, vr), "id", "rnk")
        .orderBy(col("rrf").desc, col("id")).limit(20)
    }),
    // The BATCH keyword read: one pruned sidecar read (union of the
    // batch's tp partitions + the stats partition) serves three queries —
    // the RAG serving shape (per-query index reads would re-list the same
    // files once per query). df stays GLOBAL per term, so each qid's rows
    // are exactly its single-query q154 answer; the oracle replays the
    // per-qid fold from the raw table (scan ≡ index by the shared fold).
    "q159_kwindex_bm25_batch" -> ((s, dir) =>
      kwxCollection(s, dir).keywordTopKBatch(Seq(
          Seq("hash", "join", "stream"),
          Seq("vector", "table"),
          Seq("index", "hash")), 10)
        .select(col("qid"), col("id"), col("rnk"),
          roundz(col("score"), 4).as("score"))
        .orderBy("qid", "rnk")),
    // The keyword ANALYZER setting end-to-end: the kwa collection stores
    // PUNCTUATED text under graft:analyzer=simple (one shared
    // lowercase+strip rule across the sidecar build, the scan path and
    // the query side — Retrieval.termsCol's single written form), and
    // the raw user terms arrive punctuated and mixed-case exactly as a
    // natural-language RAG query sends them ("Hash!" must match the
    // stored token "<<hash," — under the old whitespace-only rule it
    // matched NOTHING). Sidecar-served through an incremental refresh;
    // the oracle replays the identical strip rule in DuckDB.
    "q161_kwindex_analyzer" -> ((s, dir) =>
      kwaCollection(s, dir).keywordTopK(Seq("Hash!", "JOIN,", "(stream)"), 20)
        .select(col("id"), col("rnk"), roundz(col("score"), 4).as("score"))
        .orderBy("rnk")),
    // q157's hybrid fusion with the keyword leg under the analyzer: the
    // punctuated corpus + punctuated query terms served off the stamped
    // sidecar, rrf-fused with the exact cosine vector leg. Pins that the
    // analyzer changes ONLY tokenization — fusion arithmetic, rank
    // windows and tie-breaks replay verbatim.
    "q162_hybrid_analyzer" -> ((s, dir) => {
      val kw = kwaCollection(s, dir)
        .keywordTopK(Seq("Hash!", "JOIN,", "(stream)"), 50)
        .select(col("id"), col("rnk"))
      val qv = headVec(t(s, dir, "embeddings"), 0)
      val vr = Knn.topK(t(s, dir, "embeddings"), "vec_id", "embedding",
          qv, 50, "cosine", excludeIds = Seq(0))
        .select(col("vec_id").cast("string").as("id"), row_number().over(
          Window.orderBy(col("dist"), col("vec_id"))).as("rnk"))
      Retrieval.rrf(Seq(kw, vr), "id", "rnk")
        .orderBy(col("rrf").desc, col("id")).limit(20)
    }),
    // The full RAG read path as ONE collection call: queryHybridText —
    // the query text drives the keyword leg (corpus tokenization rule →
    // sidecar-served BM25 top-fetchN) AND the vector leg (the RECORDED
    // embedding function → exact cosine top-fetchN), fused by
    // reciprocal-rank fusion. The oracle replays the whole composition
    // from raw text: hash-embedding fit-free replay (q115's machinery),
    // the BM25 fold, both rank windows, and the rrf arithmetic.
    "q158_hybrid_text" -> ((s, dir) => {
      val coll = hyxCollection(s, dir)
      coll.queryHybridText("hash join stream", k = 20, fetchN = 50)
        .select(col("id"), roundz(col("rrf"), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
    }),
    // The TABLE-FUNCTION surface: q158's one-call hybrid driven from PURE
    // SQL text — `SELECT ... FROM graft_hybrid(root, name, text, k,
    // fetchN)` resolves the collection at analysis time and returns the
    // collection API's own plan (keyword sidecar + recorded embedding
    // function + rrf), so the SQL route is hash-equal to q158 by
    // construction. graft_bm25 is smoke-checked by ExtensionsSpec.
    "q163_hybrid_sql" -> ((s, dir) => {
      hyxCollection(s, dir) // same fixture; TVF resolves it by (root, name)
      graft.expressions.GraftExtensions.register(s)
      val root = verifyCollectionsRoot(dir)
      s.sql(
        s"""SELECT id, ROUND(rrf, 6) + 0.0 AS rrf
           |FROM graft_hybrid('$root', 'hyx', 'hash join stream', 20, 50)
           |ORDER BY rrf DESC, id""".stripMargin)
    }),
    // The plain-Spark-SQL WRITE surface (q155's other half): hydration
    // through `df.write.format("graft")` — overwrite (create fresh), a
    // disjoint append (add gates), then an overlapping latest-wins
    // upsert — read back through the same source. Every mode routes
    // through the collection API's own commit protocol; the oracle
    // replays the final merged state from the raw table.
    "q156_dsv2_write" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      def part(m: Long) = docs.filter(col("doc_id") % 3 === m)
        .select(col("doc_id").cast("string").as("id"),
          col("text").as("document"), col("lang"), col("n_chars"))
      part(0).write.format("graft").option("root", root).option("name", "dwr")
        .option("buckets", "8").mode("overwrite").save()
      part(1).write.format("graft").option("root", root).option("name", "dwr")
        .mode("append").save()
      docs.filter(col("doc_id") % 3 === 2 || col("doc_id") % 6 === 0)
        .select(col("doc_id").cast("string").as("id"),
          col("text").as("document"),
          when(col("doc_id") % 6 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
          col("n_chars"))
        .write.format("graft").option("root", root).option("name", "dwr")
        .mode("append").option("upsert", "true").save()
      s.read.format("graft").option("root", root).option("name", "dwr").load()
        .select(col("id"), col("lang"), col("n_chars"))
        .orderBy(col("id").cast("long"))
    }),
    // Hybrid retrieval: reciprocal-rank fusion of the keyword top-50 and
    // the vector top-50 — the standard combiner, and pure rank arithmetic,
    // so the fused scores replay exactly in the oracle
    "q67_hybrid_rrf" -> ((s, dir) => {
      val kw = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "stream"), 50).select(col("id"), col("rnk"))
      val qv = headVec(t(s, dir, "embeddings"), 0)
      val vr = Knn.topK(t(s, dir, "embeddings"), "vec_id", "embedding",
          qv, 50, "cosine", excludeIds = Seq(0))
        .select(col("vec_id").as("id"), row_number().over(
          Window.orderBy(col("dist"), col("vec_id"))).as("rnk"))
      Retrieval.rrf(Seq(kw, vr), "id", "rnk")
        .orderBy(col("rrf").desc, col("id")).limit(20)
    }),
    // Hybrid retrieval, score-aware form: min-max-normalized weighted
    // fusion of the SCORES (not just ranks — the published alternative to
    // q67's rrf) of the keyword top-50 and the vector top-50. Per-list
    // min/max are single-row broadcast aggregates; normalization +
    // weighting is IEEE-exact, so fused scores replay in the oracle.
    "q137_hybrid_minmax" -> ((s, dir) => {
      val kw = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "stream"), 50)
        .select(col("id"), col("score"))
      val qv = headVec(t(s, dir, "embeddings"), 0)
      val vr = Knn.topK(t(s, dir, "embeddings"), "vec_id", "embedding",
          qv, 50, "cosine", excludeIds = Seq(0))
        .select(col("vec_id").as("id"), (lit(1.0) - col("dist")).as("score"))
      Retrieval.fuseMinMax(Seq(kw -> 0.4, vr -> 0.6), "id", "score")
        .orderBy(col("fused").desc, col("id")).limit(20)
    }),
    // Corpus quantiles from a bottom-k hash sample (KMV on rows): the k=64
    // smallest-key-hash rows are a uniform sample; nearest-rank quantiles
    // over them estimate corpus quantiles with no global sort — the
    // exchange carries <= k rows (WindowGroupLimit map-side prune). The
    // sample membership is the portable spread hash, so the estimates
    // replay value-for-value in the oracle.
    "q138_bottomk_quantiles" -> ((s, dir) =>
      Sketches.bottomKQuantiles(t(s, dir, "documents"),
          col("doc_id"), col("n_chars"), k = 64,
          qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("q")),
    // Chunking: overlapping token windows — the chunk→embed→hydrate
    // precursor; map-only explode, every doc yields >= 1 chunk
    "q70_chunking" -> ((s, dir) =>
      TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_id")),
    // Benchmark decontamination: docs leaking any 8-gram of the "eval"
    // slice (deterministic doc_id % 97 sample stands in for a benchmark).
    // Eval shingles broadcast; corpus rows never shuffle.
    "q68_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminated(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 97 === 0).select(col("text")), "text", n = 8)
        .orderBy("id")
    }),
    // ANN: deterministic sign-random-projection buckets
    "q33_srp_bucket" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), Ann.srpBucket(col("embedding"), 64, 8).as("bucket"))
        .orderBy("vec_id")),
    // C6 tumbling window via window() (DECIMAL sums: fold-order-free)
    "q35_tumbling_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(timestamp_micros(col("us")), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("sum_value"))
        .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy("ws", "event_type")),
    // C4 TPC-H Q5-ish with the selective-dim-first plan: region→nation→
    // customer broadcasts reduce orders to the ASIA slice (~1/5), and that
    // slice is itself broadcast to the lineitem scan — the fact table
    // (the 100 TB side) is NEVER shuffled; every join on it is broadcast.
    "q36_region_revenue" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(asiaNations.select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
      val asiaOrders = t(s, dir, "orders")
        .join(broadcast(asiaCust.select("c_custkey", "n_name")),
          col("o_custkey") === col("c_custkey"))
      t(s, dir, "lineitem")
        .join(broadcast(asiaOrders.select("o_orderkey", "n_name")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("n_name")
    }),
    // Fact⋈fact via BUCKETED tables (Bucketing.scala in anger): both sides
    // are written bucketed+sorted by the join key, so the join itself plans
    // with ZERO Exchange — the shuffle is paid once at ingestion, the shape
    // that makes a repeated 100 TB fact⋈fact join affordable. PlanShapeSpec
    // pins the exchange-free join; the oracle pins the result.
    "q62_bucketed_join_revenue" -> ((s, dir) => {
      import graft.sources.Bucketing
      val tag = (dir.hashCode.toLong & 0xffffffffL).toString
      val (ot, lt) = (s"b_orders_$tag", s"b_lineitem_$tag")
      // ensure, not rewrite: the fixtures are immutable and the table names
      // carry the source identity (dir hash), so repeat runs in one session
      // reuse the ingested layout — the bucketing contract ("shuffle paid
      // once at ingestion") is exactly what the steady-state run measures
      Bucketing.ensureBucketed(s, t(s, dir, "orders"), ot, "o_orderkey", 8)
      Bucketing.ensureBucketed(s,
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        lt, "o_orderkey", 8)
      Bucketing.colocatedJoin(s, ot, lt, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),
    // Skew mitigation: salted join must be result-identical to the plain join
    "q37_salted_join_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      Skew.saltedJoin(t(s, dir, "orders"), cust, "o_custkey", numSalts = 8)
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).cast("double").as("total"),
          count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),
    // C4 fact⋈dim with the part table: revenue + avg list price per brand
    "q43_brand_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          // exact decimal sum + ONE double division: avg(double) would be
          // partial-agg fold-order dependent and could flip the 4th decimal
          roundz(sum(col("p_retailprice").cast(DecimalType(18, 4))).cast("double")
            / count(lit(1)), 4).as("avg_retail"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")),
    // SQL surface: the registered graft_* native functions, used from
    // plain spark.sql text (SparkSessionExtensions path, SURVEY §4.3)
    "q44_sql_function_api" -> ((s, dir) => {
      graft.expressions.GraftExtensions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("emb_v")
      val qv = headVec(t(s, dir, "embeddings"), 1)
      val qlit = qv.map(f => s"CAST($f AS FLOAT)").mkString("array(", ", ", ")")
      s.sql(
        s"""SELECT vec_id, ROUND(graft_l2_dist(embedding, $qlit), 4) AS dist
           |FROM emb_v WHERE vec_id <> 1
           |ORDER BY graft_l2_dist(embedding, $qlit), vec_id LIMIT 10""".stripMargin)
    }),
    // Corpus statistics: exact interpolated percentiles + distinct counts
    "q45_corpus_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(expr("percentile(n_chars, array(0.5D, 0.9D))").as("pct"),
          countDistinct(col("source")).as("n_sources"))
        .select(col("lang"),
          roundz(element_at(col("pct"), 1), 4).as("median_chars"),
          roundz(element_at(col("pct"), 2), 4).as("p90_chars"),
          col("n_sources"))
        .orderBy("lang")),
    // PII-style scrub: mask digit runs in the JSON payload
    "q49_redact" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          TextAnalysis.maskPattern(col("props"), "[0-9]+", "#").as("masked"))
        .orderBy("event_id")),
    // Repetition signal: distinct-token ratio (boilerplate scores low)
    "q50_repetition_ratio" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.distinctTokenRatio(col("text")).as("distinct_ratio"))
        .orderBy("doc_id")),
    // C4 full outer join: unmatched sides surface as nulls
    "q46_full_outer" -> ((s, dir) => {
      val cust = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      t(s, dir, "nation")
        .join(cust, col("n_nationkey") === col("c_nationkey"), "full_outer")
        .select(coalesce(col("n_name"), lit("<none>")).as("nation"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nation")
    }),
    // C4 rollup subtotals (grand total included; NULL markers coalesced so
    // cross-engine NULL ordering differences cannot bite)
    "q47_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).cast("double").as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("qty"))
        .orderBy("rf", "ls")),
    // C4 pivot: lang x source count matrix via Spark pivot
    "q48_pivot" -> ((s, dir) => {
      val srcs = Seq("src0", "src1", "src2", "src3")
      t(s, dir, "documents").groupBy("lang").pivot("source", srcs).count()
        .select(col("lang") +: srcs.map(sc => coalesce(col(sc), lit(0L)).as(sc)): _*)
        .orderBy("lang")
    }),
    // C4 set operations: EXCEPT / INTERSECT (distinct semantics)
    "q38_set_ops" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val en = docs.filter(col("lang") === "en").select("doc_id")
      val src0 = docs.filter(col("source") === "src0").select("doc_id")
      en.except(src0).agg(count(lit(1)).as("n_except")).crossJoin(
        en.intersect(src0).agg(count(lit(1)).as("n_intersect")))
    }),
    // Text normalization (canonical form for dedup)
    "q39_normalize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("norm"))
        .orderBy("doc_id")),
    // Dataset curation: deterministic stratified systematic sample (1-in-10
    // per language stratum, by id order — reproducible without RNG state)
    "q41_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(pmod(col("rn"), lit(10)) === 1)
        .select("doc_id", "lang", "rn").orderBy("doc_id")
    }),
    // LLM batch construction: greedy token packing into 512-token bins per
    // language stratum (running sum + integer division — exact both engines)
    "q42_token_packing" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("lang"),
          expr("(cum - n_tok) div 512").as("bin"))
        .orderBy("doc_id")
    }),
    // B3 update: replace non-null fields for existing ids (join + coalesce,
    // the Collection.update merge shape — null update fields leave the
    // current value in place)
    "q40_update_coalesce" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val upd = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id"), lit("xx").as("lang"),
          lit(null).cast("string").as("source"))
      docs.alias("c").join(upd.alias("u"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("u.lang"), col("c.lang")).as("lang"),
          coalesce(col("u.source"), col("c.source")).as("source"),
          col("c.n_chars").as("n_chars"))
        .orderBy("doc_id")
    }),
    // C6/C9 sliding window (1 h length, 30 min slide): every event lands
    // in exactly two windows
    "q51_sliding_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(timestamp_micros(col("us")), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("w.start")).as("ws"), col("event_type"), col("cnt"))
        .orderBy("ws", "event_type")),
    // Vocabulary build (LLM tokenizer prep): explode tokens → map-side
    // combinable count → top-k. The orderBy+limit plans as
    // TakeOrderedAndProject — no global sort of the vocabulary.
    "q52_vocab_topk" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(100)),
    // C5 quantile binning per stratum (ntile) — curriculum/quality buckets
    "q53_ntile_bins" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      t(s, dir, "documents").withColumn("bin", ntile(4).over(w))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("cnt"), max("n_chars").as("max_chars"))
        .orderBy("lang", "bin")
    }),
    // C2 end-to-end near-dedup: LSH candidates → shingle-Jaccard verify
    // (≥ 0.7) → keep-min-id survivors; the full documents table
    "q54_near_dedup" -> ((s, dir) =>
      Dedup.nearDedup(t(s, dir, "documents"), "doc_id", "text", 0.7,
          hashFn = Dedup.portableHash)
        .select("doc_id").orderBy("doc_id")),
    // C4 cube: all grouping-set combinations over (lang, source).
    // GROUPING() flags (not COALESCE alone) distinguish a genuine NULL
    // group from the subtotal row and restore a unique total-order key —
    // COALESCE-only output has duplicate sort keys if the data ever
    // carries NULLs, which breaks the determinism contract.
    "q55_cube" -> ((s, dir) =>
      t(s, dir, "documents").cube("lang", "source")
        .agg(count(lit(1)).as("cnt"),
          grouping(col("lang")).cast("int").as("g_lang"),
          grouping(col("source")).cast("int").as("g_source"))
        .select(
          when(col("g_lang") === 1, lit("ALL"))
            .otherwise(coalesce(col("lang"), lit("<null>"))).as("lang"),
          when(col("g_source") === 1, lit("ALL"))
            .otherwise(coalesce(col("source"), lit("<null>"))).as("source"),
          col("g_lang"), col("g_source"), col("cnt"))
        .orderBy("g_lang", "g_source", "lang", "source")),
    // TF-IDF-shaped distinctive-term extraction: tf/df scoring (exact
    // integer ratio — no log(), whose libm rounding differs across
    // engines). Single-space split matches the q24/q25 token convention
    // (and the oracle) exactly. df derives from the tf AGGREGATE — tf
    // already holds one row per distinct (doc, term), so no second
    // corpus pass. The df table is small relative to the corpus; AQE
    // broadcasts it at this scale (PlanShapeSpec) and would shuffle-join
    // past the broadcast limit at vocabulary extremes.
    "q56_distinctive_terms" -> ((s, dir) => {
      val tokens = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").cast("double").divide(col("df")).desc, col("term"))
      tf.join(dfq, Seq("term"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"),
          roundz(col("tf").cast("double") / col("df"), 4).as("score"))
        .orderBy("doc_id", "rnk")
    }),
    // As-of (temporal) join via window, no join at all: for every click,
    // the most recent strictly-earlier view by the same user — the
    // last(ignoreNulls) over an unbounded-preceding frame is one sort per
    // user partition, where a range-join formulation would be O(n²) per
    // user at corpus scale
    "q57_asof_prev_view" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("prev_view_us",
          last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "us", "prev_view_us")
        .orderBy("event_id")
    }),
    // Deterministic hash sampling: StrHash(id) mod 100 < rate — stable
    // across runs/engines/partitionings (unlike RNG-based sample()), the
    // reproducible-split primitive for train/eval carving at 100 TB
    "q58_hash_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(pmod(graft.expressions.GraftExtensions.strHash(
          col("doc_id").cast("string")), lit(100)) < 20)
        .select("doc_id", "lang").orderBy("doc_id")),
    // Curation: clip per-language length tails (outside [p05, p95]) — the
    // tiny quantile table broadcasts back onto the corpus scan. Quantiles
    // are ROUNDed to 4 decimals BEFORE comparing so both engines build
    // bit-identical fences (raw interpolated quantiles can differ in
    // final ulps); int n_chars vs double fences compares exactly.
    "q59_length_tail_clip" -> ((s, dir) => {
      val stats = t(s, dir, "documents").groupBy("lang")
        .agg(expr("percentile(n_chars, array(0.05D, 0.95D))").as("q"))
        .select(col("lang"),
          roundz(element_at(col("q"), 1), 4).as("p05"),
          roundz(element_at(col("q"), 2), 4).as("p95"))
      t(s, dir, "documents").join(broadcast(stats), Seq("lang"))
        .filter(col("n_chars") < col("p05") || col("n_chars") > col("p95"))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),
    // B6 at scale, END TO END through the collection store: hydrate the
    // embeddings into a persistent collection, build the seeded IVF index
    // (cell-partitioned sidecar layout), and answer kNN through the pruned
    // read path — the q32 arithmetic, but exercising buildIndex/query on
    // the artifact the reference's whole pipeline exists to produce.
    "q60_collection_ivf_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      // Hydrate-once / query-many: the artifact this query produces is a
      // PERSISTENT indexed collection — rebuilding it per invocation would
      // measure ingestion forever and the pruned read path never. A
      // fingerprint (store-format token + source dir + row count; fixtures
      // are immutable) guards the reuse: any mismatch — including a stale
      // artifact from an older store layout — drops and rebuilds.
      val fp = s"ivf2|$dir|n=${emb.count()}|cs=0-7"
      val reusable = cat.getCollection("ivfq").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("ivfq").get else {
        cat.deleteCollection("ivfq")
        val c = cat.getOrCreateCollection("ivfq", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        c.buildIndexSeeded((0L until 8L).map(_.toString))
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.query(headVec(emb, 0), 10, nprobe = 2)
        .select(col("id"), roundz(col("dist"), 4).as("dist"))
    }),
    // The STORE-side IVF-PQ (q139's composition as a collection index):
    // buildIndexPqSeeded writes the cell-partitioned build WITH a codes
    // column + codebook sidecar; queryPq ADC-scans (id, codes) inside the
    // probed cells — the embedding column stays unread until the fetchN
    // refine — then exact-cosine re-ranks. Same hydrate-once fingerprint
    // reuse as q60; ids are STRINGS here, so every tie-break is string
    // order in both engines.
    "q140_collection_pq_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      // fp = store-format/algo tag + source + BUILD PARAMS: any change to
      // encode/codebook semantics bumps the tag (pq1->pq2 flushed the r11
      // pre-commit build) and any re-seed/re-dial changes the param tail —
      // fingerprint reuse can never serve a stale build (VERDICT r11 #1b)
      val fp = s"pq2|$dir|n=${emb.count()}|cs=0-7|ps=1-16|m=8"
      val reusable = cat.getCollection("pqidx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("pqidx").get else {
        cat.deleteCollection("pqidx")
        val c = cat.getOrCreateCollection("pqidx", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        c.buildIndexPqSeeded((0L until 8L).map(_.toString),
          (1L to 16L).map(_.toString), m = 8)
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.queryPq(headVec(emb, 0), 10, nprobe = 2, fetchN = 30)
        .select(col("id"), col("adc"), col("dist"))
    }),
    // TRIPLE composition on one read (r8): a committed IVF index AND a
    // committed trigram-postings index AND a metadata `where` serve one
    // `query()` — cell pruning at the file listing, postings confinement
    // of the whereDoc, the verbatim predicate on the survivors, exact
    // cosine top-k inside. Each leg is oracled alone (q60, q112, q04-07);
    // this pins that their composition changes nothing: the oracle is the
    // plain scan-semantics replay over the FINAL corpus.
    "q126_ivf_docindex_where" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"ivfdx2|$dir|n=${emb.count()}|cs=0-7"
      val reusable = cat.getCollection("ivfdx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex && c.hasDocIndex)
      val coll = if (reusable) cat.getCollection("ivfdx").get else {
        cat.deleteCollection("ivfdx")
        val c = cat.getOrCreateCollection("ivfdx", "cosine")
        c.add(emb.join(docs, col("vec_id") === col("doc_id"))
          .select(col("vec_id").cast("string").as("id"), col("embedding"),
            col("text").as("document"), col("lang")))
        c.buildIndexSeeded((0L until 8L).map(_.toString))
        c.buildDocIndex()
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasIndex && coll.hasDocIndex,
        "q126 must compose both sidecar indexes")
      coll.query(headVec(emb, 2), 10, nprobe = 3,
          where = Some(ChromaFilter.In("lang", Seq("en", "fr", "es"))),
          whereDoc = Some(ChromaFilter.Contains("vector table")))
        .select(col("id"), roundz(col("dist"), 4).as("dist"), col("lang"))
    }),
    // The IVF index through INCREMENTAL REFRESH (r8): hydrate most of the
    // corpus, build the seeded index, upsert the held-out slice, then
    // refreshIndex() — only the touched id buckets re-run the argmin-L2
    // assignment (against the PRIOR build's centroids), every other
    // cell/pb slice hard-links forward. Assignment is a pure function of
    // (vector, centroids), so the refreshed index must serve exactly what
    // a full build with those seeds serves — the oracle replays seeded
    // assignment + probe choice + filtered cosine top-k over the FINAL
    // corpus, same as q60's discipline, plus a label prefilter composed
    // on the pruned path.
    // Index COMPACTION under the oracle: the collection takes the full
    // maintenance lifecycle — seeded IVF + postings build on a base
    // corpus, upsert of a held-out slice, incremental refresh of BOTH
    // sidecars, then compactIndexes() repacking both into manifest-free
    // single-file-per-slice builds — and the final query (IVF-pruned +
    // postings-confined + metadata where) must hash-match the same plain
    // replay a FRESH build serves (q126's oracle verbatim): maintenance
    // must never change answers.
    "q130_index_compaction_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"ivfcx2|$dir|n=${emb.count()}|cs=0-7"
      val reusable = cat.getCollection("ivfcx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex && c.hasDocIndex)
      val coll = if (reusable) cat.getCollection("ivfcx").get else {
        cat.deleteCollection("ivfcx")
        val c = cat.getOrCreateCollection("ivfcx", "cosine")
        val all = emb.join(docs, col("vec_id") === col("doc_id"))
          .select(col("vec_id").cast("string").as("id"), col("embedding"),
            col("text").as("document"), col("lang"))
        // hold out a slice containing NO seed ids (0-7): % 17 == 9
        c.add(all.filter(col("id").cast("long") % 17 =!= 9))
        c.buildIndexSeeded((0L until 8L).map(_.toString))
        c.buildDocIndex()
        c.upsert(all.filter(col("id").cast("long") % 17 === 9))
        require(c.refreshIndex() > 0, "q130 must exercise an IVF refresh")
        require(c.refreshDocIndex() > 0, "q130 must exercise a postings refresh")
        require(c.compactIndexes() == 2, "q130 must compact both builds")
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasIndex && coll.hasDocIndex,
        "q130 must serve from the compacted indexes")
      coll.query(headVec(emb, 2), 10, nprobe = 3,
          where = Some(ChromaFilter.In("lang", Seq("en", "fr", "es"))),
          whereDoc = Some(ChromaFilter.Contains("vector table")))
        .select(col("id"), roundz(col("dist"), 4).as("dist"), col("lang"))
    }),
    "q125_ivf_refresh_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"ivfr2|$dir|n=${emb.count()}|cs=0-7"
      val reusable = cat.getCollection("ivfr").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("ivfr").get else {
        cat.deleteCollection("ivfr")
        val c = cat.getOrCreateCollection("ivfr", "cosine")
        val all = emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label"))
        // hold out a slice that contains NO seed ids (0-7): % 17 == 9
        c.add(all.filter(col("id").cast("long") % 17 =!= 9))
        c.buildIndexSeeded((0L until 8L).map(_.toString))
        c.upsert(all.filter(col("id").cast("long") % 17 === 9))
        val rebuilt = c.refreshIndex()
        require(rebuilt > 0, "q125 must exercise an incremental IVF refresh")
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasIndex, "q125 must serve from the refreshed index")
      coll.query(headVec(emb, 1), 10, nprobe = 3,
          where = Some(ChromaFilter.In("label", Seq(0, 1, 2, 3, 4))))
        .select(col("id"), roundz(col("dist"), 4).as("dist"), col("label"))
    }),
    // B1-B5 END TO END through the copy-on-write store: add a base batch,
    // upsert (replacements + inserts), delete with ids AND a typed where
    // (Chroma's AND semantics), then a filtered get reading back the
    // parquet the store wrote — the commit protocol itself is under the
    // oracle, not just scalatest.
    "q63_collection_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      // the round-trip batch is ~260 rows regardless of sf (doc_id < 260):
      // 8 id-hash buckets right-sizes the file count for the store being
      // exercised; the commit protocol is identical at any bucket count
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("rt")
      val coll = cat.getOrCreateCollection("rt")
      coll.add(docs.filter(col("doc_id") < 200)
        .select(col("doc_id").cast("string").as("id"), col("text").as("document"),
          col("lang"), col("n_chars")))
      coll.upsert(docs.filter(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 260)
        .select(col("doc_id").cast("string").as("id"), upper(col("text")).as("document"),
          lit("xx").as("lang"), col("n_chars")))
      coll.delete(ids = Seq("5", "10", "15", "20"),
        where = Some(ChromaFilter.Gt("n_chars", 100)))
      coll.get(where = Some(ChromaFilter.In("lang", Seq("en", "es", "xx"))))
        .select(col("id"), col("lang"), col("n_chars"),
          length(col("document")).cast("int").as("n_doc"))
    }),
    // C9 watermark semantics, ORACLED: three microbatches through a
    // 1-hour-watermark tumbling window in APPEND mode. Timestamps are a
    // pure function of event_id (3 min apart — identical at every sf;
    // the fixture's own event times change density per scale), so batch
    // 1 (events 0-99, spanning ~5 h) leaves the watermark at ~3.95 h,
    // and batch 2's LATE copies of events 0-9 (windows ending <= 1 h)
    // hit evicted state and MUST drop — if either engine counted them
    // the per-window counts would differ. A final pusher row (+30 h)
    // flushes every real window; its own window never closes, so it
    // appears in no output. The oracle is the plain windowed count of
    // the 200 real events: the late-drop and the append-mode emission
    // set are exactly what the hash pins.
    // C9 stream-STREAM inner interval join — the two-stream state surface
    // (q78's batch interval join, live): even event_ids stream left, odd
    // ones right, joined on user_id with the right's event time within
    // [lts, lts + 4h]. Both sides watermarked (8h delay); after the
    // watermark push, a re-sent copy of the first left row MUST be
    // dropped (the late-data contract) — a surviving copy would duplicate
    // its pairs and hash-mismatch the oracle, so eviction itself is under
    // test. Driver-fed bounded fixture (MemoryStream), two data batches
    // so cross-batch matches exercise the buffered state.
    "q142_stream_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      val base = t(s, dir, "events").filter(col("event_id") < 1000)
        .select(col("event_id"), col("user_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // day-one base: a ts of EXACTLY epoch 0 equals Spark's initial
      // watermark and is pre-dropped in the first batch (event 0's pairs
      // silently vanish — found by the sf0.001 oracle diff)
      def ts(i: Long) = new java.sql.Timestamp(86400000L + i * 60000L)
      val lRows = base.filter(_._1 % 2 == 0).map { case (i, u) => (u, ts(i), i) }
      val rRows = base.filter(_._1 % 2 == 1).map { case (i, u) => (u, ts(i), i) }
      // a stream-stream join opens FOUR state stores per shuffle partition
      // per microbatch; at the session's 32 partitions the four batches
      // here pay ~512 store inits for a 1000-row driver-fed fixture —
      // fixed cost, not data. 8 partitions cut it 4× (measured 11.3 s →
      // see BASELINE r11). The override lives on a CLONED session (shared
      // SparkContext, isolated SQL conf), so concurrent work on the main
      // session never plans with it and no finally-restore can leak.
      val s2 = StreamingHydrator.streamingSession(s, partitions = 8)
      implicit val sqlc: org.apache.spark.sql.SQLContext = s2.sqlContext
      import s2.implicits._
      val lMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val rMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val qn = s"q142_out_${dir.hashCode.toLong & 0xffffffffL}"
      s2.catalog.dropTempView(qn)
      val joined = StreamingHydrator.intervalJoinStream(
        lMem.toDF().toDF("user_id", "lts", "l_event"),
        rMem.toDF().toDF("user_id", "rts", "r_event"),
        "user_id", "lts", "rts", delay = "8 hours", within = "4 hours")
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
      try {
        lMem.addData(lRows.filter(_._3 < 500).toIndexedSeq: _*)
        rMem.addData(rRows.filter(_._3 < 500).toIndexedSeq: _*)
        q.processAllAvailable()
        lMem.addData(lRows.filter(_._3 >= 500).toIndexedSeq: _*)
        rMem.addData(rRows.filter(_._3 >= 500).toIndexedSeq: _*)
        q.processAllAvailable()
        // advance BOTH watermarks far past the fixture, then re-send the
        // first left row: it sits days behind the watermark → dropped
        lMem.addData(Seq((999999L, ts(100000L), 999999L)): _*)
        rMem.addData(Seq((999999L, ts(100001L), 999998L)): _*)
        q.processAllAvailable()
        lMem.addData(lRows.take(1).toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      s2.table(qn).filter(col("l_event") < 999990L)
        .select(col("user_id"), col("l_event"), col("r_event"))
        .orderBy("user_id", "l_event", "r_event")
    }),
    // C9 stream-stream LEFT OUTER interval join — the null-emission-on-
    // watermark-expiry state path (the semantics Spark users hit right
    // after inner joins, historically the buggy one): q142's fixture and
    // late-drop discipline, but every UNMATCHED left row must ALSO emit,
    // exactly once, with null right columns, after both watermarks prove
    // its interval can no longer match. Null r_event is COALESCEd to -1
    // on both engines (hash-stable across NULL representations). The
    // oracle is the plain batch LEFT JOIN: matched pairs identical to
    // q142's inner replay, plus one -1 row per matchless left event.
    "q146_stream_stream_left_join" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      val base = t(s, dir, "events").filter(col("event_id") < 1000)
        .select(col("event_id"), col("user_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      def ts(i: Long) = new java.sql.Timestamp(86400000L + i * 60000L)
      val lRows = base.filter(_._1 % 2 == 0).map { case (i, u) => (u, ts(i), i) }
      val rRows = base.filter(_._1 % 2 == 1).map { case (i, u) => (u, ts(i), i) }
      // same state-store economics as q142 (4 stores/partition/batch):
      // 8 partitions on a cloned session, main session untouched
      val s2 = StreamingHydrator.streamingSession(s, partitions = 8)
      implicit val sqlc: org.apache.spark.sql.SQLContext = s2.sqlContext
      import s2.implicits._
      val lMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val rMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val qn = s"q146_out_${dir.hashCode.toLong & 0xffffffffL}"
      s2.catalog.dropTempView(qn)
      val joined = StreamingHydrator.intervalJoinStream(
        lMem.toDF().toDF("user_id", "lts", "l_event"),
        rMem.toDF().toDF("user_id", "rts", "r_event"),
        "user_id", "lts", "rts", delay = "8 hours", within = "4 hours",
        joinType = "left_outer")
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
      try {
        lMem.addData(lRows.filter(_._3 < 500).toIndexedSeq: _*)
        rMem.addData(rRows.filter(_._3 < 500).toIndexedSeq: _*)
        q.processAllAvailable()
        lMem.addData(lRows.filter(_._3 >= 500).toIndexedSeq: _*)
        rMem.addData(rRows.filter(_._3 >= 500).toIndexedSeq: _*)
        q.processAllAvailable()
        // push BOTH watermarks days past the fixture: every real left
        // row's interval expires, so the unmatched ones must now emit
        // their null rows (Spark runs the expiry sweep against the
        // watermark the PREVIOUS batch established — hence one more
        // batch below)
        lMem.addData(Seq((999999L, ts(100000L), 999999L)): _*)
        rMem.addData(Seq((999999L, ts(100001L), 999998L)): _*)
        q.processAllAvailable()
        // final round, two birds: a re-sent copy of the first left row
        // sits days behind the already-advanced watermark and must NOT
        // emit (the late-drop contract, unchanged by outer-ness — not
        // even a null-row consolation prize), while the riding nudge
        // pair keeps both watermarks moving so this batch's expiry
        // sweep flushes every remaining unmatched left row
        lMem.addData((lRows.take(1) ++ Seq((999999L, ts(100002L), 999997L))).toIndexedSeq: _*)
        rMem.addData(Seq((999999L, ts(100003L), 999996L)): _*)
        q.processAllAvailable()
      } finally q.stop()
      s2.table(qn).filter(col("l_event") < 999990L)
        .select(col("user_id"), col("l_event"),
          coalesce(col("r_event"), lit(-1L)).as("r_event"))
        .orderBy("user_id", "l_event", "r_event")
    }),
    // C1/C9 STREAMING DEDUP under the oracle (dropDuplicatesWithinWatermark,
    // the streaming form of q16's exact dedup): three classes of input —
    // originals, WITHIN-watermark duplicates (same id re-sent minutes
    // later, must dedup against buffered state), and a LATE duplicate
    // (re-sent hours behind the watermark, must be dropped by the
    // late-data contract, NOT re-emitted from evicted state). Duplicate
    // rows carry the ORIGINAL's event_type and only (id, event_type) is
    // emitted, so the survivor is value-identical whichever physical row
    // wins — the output is deterministic and the oracle is the plain
    // DISTINCT over the originals. A re-emitted late dup would add a
    // 301st row; a missed in-horizon dedup would add more — the row
    // count AND hash pin both failure modes.
    "q147_streaming_dedup_watermark" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      val base = t(s, dir, "events").filter(col("event_id") < 300)
        .select(col("event_id"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      def ts(i: Long) = new java.sql.Timestamp(86400000L + i * 180000L)
      def rows(lo: Long, hi: Long) = base
        .filter { case (i, _) => i >= lo && i < hi }
        .map { case (i, t) => (i.toString, ts(i), t) }
      val s2 = StreamingHydrator.streamingSession(s, partitions = 8)
      implicit val sqlc: org.apache.spark.sql.SQLContext = s2.sqlContext
      import s2.implicits._
      val mem = MemoryStream[(String, java.sql.Timestamp, String)]
      val qn = s"q147_out_${dir.hashCode.toLong & 0xffffffffL}"
      s2.catalog.dropTempView(qn)
      val deduped = StreamingHydrator.dedupedRows(
        mem.toDF().toDF("id", "ts", "event_type"), "ts", "1 hour")
      val q = deduped.writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
      try {
        // batch 1: originals 0-199 PLUS same-batch dups of 0-39 (+1 min,
        // same type) — state must collapse them on arrival
        val dups1 = rows(0, 40).map { case (id, t, ty) =>
          (id, new java.sql.Timestamp(t.getTime + 60000L), ty) }
        mem.addData((rows(0, 200) ++ dups1).toIndexedSeq: _*)
        q.processAllAvailable()
        // batch 2: originals 200-299, a CROSS-BATCH in-horizon dup of id
        // 199 — its original arrived in batch 1, so this dedup can only
        // come from BUFFERED STATE, never same-batch collapse (r12
        // ADVICE: a dup of 250 here shared a batch with its original and
        // left the cross-batch path untested). ts(199)+1 min sits above
        // batch 1's watermark (~ts(179)): in horizon, state still live.
        // Plus a LATE dup of id 0 — ~9.9 h behind that watermark, far
        // past the 1 h delay: the late-data contract must DROP it, not
        // re-emit it from evicted dedup state
        val lateDup = (base(0)._1.toString,
          new java.sql.Timestamp(ts(0).getTime + 120000L), base(0)._2)
        val crossBatchDup = (base(199)._1.toString,
          new java.sql.Timestamp(ts(199).getTime + 60000L), base(199)._2)
        mem.addData((rows(200, 300) ++ Seq(crossBatchDup, lateDup)).toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      s2.table(qn).select(col("id"), col("event_type"))
        .orderBy(col("id").cast("long"))
    }),
    "q111_streaming_watermark" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      import s.implicits._
      implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, dir, "events").filter(col("event_id") < 200)
        .select(col("event_id"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      def rows(lo: Long, hi: Long) = base
        .filter { case (i, _) => i >= lo && i < hi }
        .map { case (i, t) => (new java.sql.Timestamp(i * 180000L), t) }
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val qn = s"q111_out_${dir.hashCode.toLong & 0xffffffffL}"
      s.catalog.dropTempView(qn)
      val out = StreamingHydrator.windowedCounts(
        mem.toDF().toDF("ts", "event_type"), "ts", "1 hour", "1 hour")
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
      try {
        mem.addData(rows(0, 100): _*)
        q.processAllAvailable()
        mem.addData(rows(100, 200) ++ rows(0, 10): _*) // 0-9 = late copies
        q.processAllAvailable()
        mem.addData(Seq((new java.sql.Timestamp(30L * 3600000L), "___push")): _*)
        q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
        .select(expr("unix_micros(window_start) div 3600000000").as("hr"),
          col("event_type"), col("cnt"))
        .orderBy("hr", "event_type")
    }),
    // C9 END TO END: streaming hydration through the collection store —
    // a MemoryStream drained in THREE microbatches (overlapping ids across
    // batches, within-batch duplicate versions, one late old-version row),
    // committed per-microbatch by the foreachBatch upsert sink. The oracle
    // replays the sink's semantics in SQL: within a batch latest-ver wins
    // (the upsert's orderCol), across batches the LAST batch containing an
    // id wins (upsert = last-writer-wins, which is why the late row
    // REPLACES — the documented at-least-once contract of the sink).
    "q80_streaming_hydrate" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      import s.implicits._
      implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("stream80")
      val coll = cat.getOrCreateCollection("stream80")
      // bounded driver-side fixture (120 rows at any sf — MemoryStream is
      // driver-fed by design); ids sorted so batch slicing is stable
      val base = t(s, dir, "documents").filter(col("doc_id") < 120)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("doc"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      def rows(lo: Long, hi: Long, pre: String, ver: Long, b: Int) =
        base.filter { case (n, _) => n >= lo && n < hi }
          .map { case (n, doc) => (n.toString, s"$pre:$doc", ver, b) }
      val mem = MemoryStream[(String, String, Long, Int)]
      val ckpt = s"$root/q80_ckpt"
      val ckptPath = new org.apache.hadoop.fs.Path(ckpt)
      ckptPath.getFileSystem(s.sparkContext.hadoopConfiguration).delete(ckptPath, true)
      val q = StreamingHydrator.hydrate(
        mem.toDF().toDF("id", "document", "ver", "src_batch"),
        coll, ckpt, orderCol = Some("ver"),
        trigger = Trigger.ProcessingTime(0L)).start()
      try {
        mem.addData(rows(0, 60, "b1", 10, 1): _*)
        q.processAllAvailable()
        // overlap 30-89 + a within-batch duplicate (ids 30-34 at ver 21)
        mem.addData(rows(30, 90, "b2", 20, 2) ++ rows(30, 35, "b2r", 21, 2): _*)
        q.processAllAvailable()
        // overlap 60-119 + one LATE row: id 0 resurfaces with an OLD ver
        mem.addData(rows(60, 120, "b3", 30, 3) ++ rows(0, 1, "late", 5, 3): _*)
        q.processAllAvailable()
      } finally q.stop()
      coll.get().select(col("id"), col("document"), col("ver"), col("src_batch"))
        .orderBy(col("id").cast("long"))
    }),
    // CONTINUOUS hydration with CONTINUOUSLY-SERVEABLE indexes (r8): three
    // streamed microbatches upsert through hydrateIndexed, which refreshes
    // the postings index after EVERY batch (first batch = full build, the
    // rest incremental — only the batch's id buckets re-derive). The final
    // get($contains) is then served through an index that stayed current
    // across the whole stream; the oracle replays the final upsert state +
    // the verbatim contains, so index-freshness-under-streaming is what
    // the hash match proves.
    "q127_streaming_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      import s.implicits._
      implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      // hydrate-once (the q112 fingerprint discipline): the artifact is a
      // collection whose index was kept current by per-batch refreshes —
      // re-streaming per call would measure stream construction forever
      // and the indexed read path never. A fresh root (the driver's
      // Verify) always runs the stream once.
      val nDocs = t(s, dir, "documents").count()
      val fp = s"stream2|$dir|n=$nDocs"
      val reusable = cat.getCollection("stream127").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasDocIndex)
      val coll = if (reusable) cat.getCollection("stream127").get else {
        cat.deleteCollection("stream127")
        val c = cat.getOrCreateCollection("stream127")
        // bounded driver-side fixture (150 rows at any sf): MemoryStream
        // is driver-fed by design; ids sorted so batch slicing is stable
        val base = t(s, dir, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("doc"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        def rows(lo: Long, hi: Long, pre: String, ver: Long) =
          base.filter { case (n, _) => n >= lo && n < hi }
            .map { case (n, doc) => (n.toString, s"$pre:$doc", ver) }
        val mem = MemoryStream[(String, String, Long)]
        val ckpt = s"$root/q127_ckpt"
        val ckptPath = new org.apache.hadoop.fs.Path(ckpt)
        ckptPath.getFileSystem(s.sparkContext.hadoopConfiguration).delete(ckptPath, true)
        val q = StreamingHydrator.hydrateIndexed(
          mem.toDF().toDF("id", "document", "ver"),
          c, ckpt, orderCol = Some("ver"),
          trigger = Trigger.ProcessingTime(0L)).start()
        try {
          mem.addData(rows(0, 80, "s1", 10): _*)   // full index build
          q.processAllAvailable()
          mem.addData(rows(40, 120, "s2", 20): _*) // overlap → incremental refresh
          q.processAllAvailable()
          mem.addData(rows(120, 150, "s3", 30): _*) // append → incremental refresh
          q.processAllAvailable()
        } finally q.stop()
        require(c.hasDocIndex,
          "q127 must end with a committed index at the CURRENT version " +
            "(the per-batch refresh is the thing under test)")
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasDocIndex, "q127 must serve through the refreshed index")
      coll.get(whereDoc = Some(ChromaFilter.Contains("scan")))
        .select(col("id"), length(col("document")).cast("int").as("n_doc"))
        .orderBy(col("id").cast("long"))
    }),
    // B8 SCALE PATH: `get(where_document=$contains)` served through the
    // persisted trigram-postings index (DocIndex) — candidates come from
    // the gp-pruned postings read, then the verbatim contains re-check
    // runs on the confined set, so the hash must equal the plain-scan
    // oracle. Hydrate-once with the q60 fingerprint discipline: the
    // artifact is a persistent INDEXED collection; rebuilding per call
    // would measure ingestion forever and the index path never.
    "q112_docindex_contains" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      val fp = s"dix3|$dir|n=${docs.count()}"
      val reusable = cat.getCollection("dix").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasDocIndex)
      val coll = if (reusable) cat.getCollection("dix").get else {
        cat.deleteCollection("dix")
        val c = cat.getOrCreateCollection("dix")
        val all = docs.select(col("doc_id").cast("string").as("id"),
          col("text").as("document"), col("lang"), col("n_chars"))
        // hydrate in two stages THROUGH the incremental-refresh path
        // (r8): index the bulk, then upsert a slice and refreshDocIndex —
        // only the touched id buckets re-derive postings, the rest
        // hard-link from the previous build. Final content = the full
        // corpus either way, so the scan-semantics oracle is unchanged;
        // what's newly pinned is that a REFRESHED index still answers
        // bit-identically to the scan.
        c.add(all.filter(col("id").cast("long") % 7 =!= 3))
        c.buildDocIndex()
        c.upsert(all.filter(col("id").cast("long") % 7 === 3))
        val rebuilt = c.refreshDocIndex()
        require(rebuilt > 0, "q112 must exercise an incremental refresh")
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasDocIndex, "q112 must exercise the postings index")
      coll.get(whereDoc = Some(ChromaFilter.Contains("vector table")))
        .select(col("id"), col("lang"),
          length(col("document")).cast("int").as("n_doc"))
    }),
    // B7×B8 COMPOSED through the store surface: one `get` combining $nin +
    // $or + numeric-vs-map comparison + a where_document AND — the
    // ChromaFilter.predicate path over MAP-typed metadata (keyResolver →
    // element_at; numeric literals take the try_cast-double route). The
    // pieces are oracled individually in q04-q09; this pins their
    // composition and the map-lookup typing rules.
    "q114_composite_filter_get" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("cf")
      val coll = cat.getOrCreateCollection("cf")
      coll.add(docs.filter(col("doc_id") < 400)
        .select(col("doc_id").cast("string").as("id"), col("text").as("document"),
          map(lit("lang"), col("lang"),
            lit("n_chars"), col("n_chars").cast("string")).as("metadata")))
      coll.get(
          where = Some(ChromaFilter.And(Seq(
            ChromaFilter.Nin("lang", Seq("de", "fr")),
            ChromaFilter.Or(Seq(
              ChromaFilter.Gt("n_chars", 150),
              ChromaFilter.Eq("lang", "en")))))),
          whereDoc = Some(ChromaFilter.AndDoc(Seq(
            ChromaFilter.Contains("table"),
            ChromaFilter.NotContains("slow")))))
        .select(col("id"),
          element_at(col("metadata"), "lang").as("lang"),
          element_at(col("metadata"), "n_chars").cast("int").as("n_chars"),
          length(col("document")).cast("int").as("n_doc"))
    }),
    // The EMBEDDING-FUNCTION surface end-to-end (the one public chromadb
    // call shape the reference never uses, sas:177-190 always passes
    // vectors): `add(documents=...)` embeds server-side inside the write
    // scan (compiled HashEmbed — portable signed feature hashing), the
    // function binding is recorded in collection metadata, and
    // `query(query_texts=...)` resolves the SAME function for the query
    // side. The oracle recomputes every stored vector AND both query
    // vectors from raw text in SQL, then replays the filtered cosine
    // top-k — so storage, binding, and both embedding paths are all
    // hash-pinned.
    "q115_embedding_function" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("ef")
      val coll = cat.getOrCreateCollection("ef", space = "cosine")
      coll.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang")), HashingEmbedder(16))
      coll.queryText(
          Seq("vector database search index", "streaming join throughput"),
          k = 10, where = Some(ChromaFilter.In("lang", Seq("en", "es"))))
        .select(col("qid"), col("rnk"), col("id"),
          roundz(col("dist"), 4).as("dist"), col("lang"))
        .orderBy("qid", "rnk")
    }),
    // The FITTED embedding function end-to-end (the model-based analog
    // of q115's stateless hash embedder): TF-IDF × sign-random-projection
    // is TRAINED on the corpus (document frequencies → top-32 vocabulary,
    // idf quantized to integers at fit time, per-term projection signs
    // from the portable spread hash), the model persists as the
    // collection's sidecar, documents embed through it server-side, and
    // queryText embeds the query texts with the SAME persisted model.
    // The oracle replays the ENTIRE pipeline from raw text — fit
    // (df counts, vocab cut, idf quantization, sign derivation), corpus
    // embedding, query embedding, filtered L2 top-k — value-for-value:
    // integer-exact arithmetic is what makes a trained embedder oracle-
    // checkable at all.
    "q131_fitted_embedder" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("tfx")
      val coll = cat.getOrCreateCollection("tfx") // l2: zero vectors legal
      val ef = TfIdfSrpEmbedder.fit(docs, "text", dim = 16, vocabSize = 32)
      coll.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang")), ef)
      coll.queryText(
          Seq("vector database search index", "streaming join throughput"),
          k = 8, where = Some(ChromaFilter.In("lang", Seq("en", "es"))))
        .select(col("qid"), col("rnk"), col("id"),
          roundz(col("dist"), 4).as("dist"), col("lang"))
        .orderBy("qid", "rnk")
    }),
    // The fitted-embedder REFIT lifecycle end-to-end: hydrate the full
    // corpus through a model fitted on HALF of it (a deliberately
    // mis-trained binding), then refit() — which re-trains on the
    // current corpus, re-embeds every stored vector in one commit, and
    // swaps sidecar + fingerprint — and query through the re-fitted
    // model. The oracle replays ONLY the post-refit state (fit on the
    // full corpus, q131's replay shape at dim 12 / vocab 24): the
    // answers can only match if the rewrite really replaced every
    // vector the old model wrote.
    "q134_refit_embedder" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("rft")
      val coll = cat.getOrCreateCollection("rft") // l2: zero vectors legal
      val efA = TfIdfSrpEmbedder.fit(
        docs.filter(col("doc_id") % 2 === 0), "text", dim = 12, vocabSize = 24)
      coll.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang")), efA)
      coll.refit(vocabSize = 24)
      coll.queryText(
          Seq("vector database search index", "streaming join throughput"),
          k = 6, where = Some(ChromaFilter.In("lang", Seq("en", "fr"))))
        .select(col("qid"), col("rnk"), col("id"),
          roundz(col("dist"), 4).as("dist"), col("lang"))
        .orderBy("qid", "rnk")
    }),
    // r7's two features COMPOSED (the one pairwise composition r7 left
    // un-pinned): `query(query_texts=..., where_document=$contains)` —
    // the query text embeds through the collection's RECORDED embedding
    // function while the contains prefilter is served INDEX-CONFINED
    // through the trigram postings (DocIndex). Confinement is a superset
    // prefilter + verbatim re-check, so the hash must equal the
    // scan-semantics oracle, which replays BOTH the embedding (from raw
    // text, q115-style) and the contains filter. Hydrate-once with the
    // q112 fingerprint discipline — the artifact is a persistent indexed
    // collection, not per-call ingestion.
    "q124_querytext_docindex" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      val fp = s"qtd2|$dir|n=${docs.count()}|embed=hash16"
      val reusable = cat.getCollection("qtd").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasDocIndex)
      val coll = if (reusable) cat.getCollection("qtd").get else {
        cat.deleteCollection("qtd")
        val c = cat.getOrCreateCollection("qtd", space = "cosine")
        c.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
          col("text").as("document"), col("lang")), HashingEmbedder(16))
        c.buildDocIndex()
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      require(coll.hasDocIndex, "q124 must exercise the postings index")
      coll.queryText(
          Seq("vector database search index", "streaming join throughput"),
          k = 10, whereDoc = Some(ChromaFilter.Contains("vector table")))
        .select(col("qid"), col("rnk"), col("id"),
          roundz(col("dist"), 4).as("dist"), col("lang"))
        .orderBy("qid", "rnk")
    }),
    // Diversity-aware top-k: Maximal Marginal Relevance (Carbonell &
    // Goldstein 1998), the re-rank every RAG stack layers over plain kNN.
    // The candidate fetch is the distributed part (one scan → TakeOrdered
    // top-40); the greedy phase is a bounded driver-side primitive over
    // exactly those 40 rows. Selection ORDER and scores both hash-pin
    // against an unrolled per-step SQL replay — argmax, tie-break, and
    // the max-redundancy update all verified step by step.
    "q116_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Retrieval.mmr(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          headVec(emb, 0), k = 8, fetchN = 40, lambda = 0.5)
        .select(col("rnk"), col("vec_id"), roundz(col("score"), 4).as("score"))
        .orderBy("rnk")
    }),
    // The last two spec-equivalence-only read surfaces, composed and
    // ORACLED in one entry: queryMmrText (text → RECORDED embedding
    // function → pruned candidate fetch → bounded greedy MMR) side by
    // side with queryTextStruct (same text → same binding → Chroma's
    // parallel-list struct shape, re-exploded to long form — the
    // positional zip is itself under test). Rank i of the output carries
    // the i-th MMR pick AND the i-th plain-kNN hit; the oracle replays
    // BOTH from raw text — hash embed (q115's replay), filtered cosine
    // kNN, and the full unrolled MMR greedy trace (q116's stages over
    // hash-embedded vectors with STRING-id tie-breaks).
    "q133_mmrtext_struct" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("mmt")
      val coll = cat.getOrCreateCollection("mmt", space = "cosine")
      coll.addDocuments(docs.select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang")), HashingEmbedder(16))
      val text = "vector database search index"
      val mmr = coll.queryMmrText(text, k = 8, fetchN = 40, lambda = 0.5)
        .select(col("rnk"), col("id").as("mmr_id"),
          roundz(col("mmr_score"), 4).as("mmr_score"))
      val knn = coll.queryTextStruct(Seq(text), k = 8, include = Set("distances"))
        .select(posexplode(arrays_zip(col("ids"), col("distances"))))
        .select((col("pos") + 1).cast("int").as("rnk"),
          col("col.ids").as("knn_id"),
          roundz(col("col.distances"), 4).as("knn_dist"))
      mmr.join(knn, "rnk").orderBy("rnk")
    }),
    // ITERATED BPE training (Sennrich et al. 2016) — five greedy merge
    // rounds over the word-frequency vocabulary, each round's counts
    // computed over the PREVIOUS round's merged symbols, so the whole
    // train loop (counts → argmax → apply → recount) is hash-pinned by
    // the oracle's five unrolled stages. Corpus collapses to the vocab
    // first; the driver holds one best-pair row per round.
    "q122_bpe_train" -> ((s, dir) =>
      Lm.bpeTrain(t(s, dir, "documents"), "text", rounds = 5)
        .orderBy("rank")),
    // BPE ENCODE — the apply side of q122's training: a fixed ordered
    // merge list (with a CASCADE: t+h → th, then th+e → the, so order of
    // application is itself under test) tokenizes every document; output
    // is per-doc word and BPE-token counts. The merge chain runs over the
    // distinct-word vocabulary and broadcasts back — the corpus never
    // carries symbol strings through an exchange. The oracle replays the
    // same ordered one-pass replaces per vocab word.
    "q128_bpe_encode" -> ((s, dir) =>
      Lm.bpeEncode(t(s, dir, "documents"), "doc_id", "text",
          Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d")))
        .orderBy("doc_id")),
    // The reference's CONFIG surface driving the server-side-embedding
    // route end-to-end: HydrateConfig with `embeddingFunction` set (no
    // wide columns, pattern ignored), the A15 validation gates, the
    // documents-only projection with the reference's single-key metadata
    // map (sas:181 — key 'rating' wrapping the chosen column), count
    // conservation, then queryText through the recorded binding with a
    // metadata-map prefilter. The oracle recomputes storage + query
    // vectors from raw text and replays the filtered cosine top-k.
    "q121_hydrate_embed" -> ((s, dir) => {
      val root = verifyCollectionsRoot(dir)
      t(s, dir, "documents").createOrReplaceTempView("q121_docs")
      val cat = new CollectionCatalog(s, root)
      cat.deleteCollection("hef")
      val coll = Hydrator.run(s, HydrateConfig(
        inputTable = "q121_docs", textVar = "text", docId = "doc_id",
        embeddingPattern = "", metadataColumn = Some("lang"),
        collectionName = "hef", persistentPath = s"sasserver:$root",
        space = "cosine", embeddingFunction = Some("graft-hash-v1/16"))).get
      coll.queryText(Seq("distributed hash join"), k = 8,
          where = Some(ChromaFilter.Eq("rating", "en")))
        .select(col("qid"), col("rnk"), col("id"),
          roundz(col("dist"), 4).as("dist"),
          element_at(col("metadata"), "rating").as("rating"))
        .orderBy("rnk")
    }),
    // Zero-copy collection FORK through the MVCC store: the fork is born
    // as a hard-linked snapshot of the source's current version, then
    // DIVERGES (upsert + delete rewrite only the fork's own buckets) while
    // the source must stay bit-identical. Both sides read back through
    // get(); the oracle replays base vs base+mutations — isolation AND
    // divergence hash-pinned.
    "q120_collection_fork" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("fk"); cat.deleteCollection("fk2")
      val src = cat.getOrCreateCollection("fk")
      src.add(docs.filter(col("doc_id") < 300).select(
        col("doc_id").cast("string").as("id"), col("text").as("document"),
        col("lang"), col("n_chars")))
      val dst = cat.forkCollection("fk", "fk2")
      dst.upsert(docs.filter(col("doc_id") < 300 && col("doc_id") % 5 === 0)
        .select(col("doc_id").cast("string").as("id"),
          upper(col("text")).as("document"), lit("xx").as("lang"), col("n_chars")))
      dst.delete(ids = Seq("7", "11"))
      src.get().select(lit("src").as("side"), col("id"), col("lang"),
          length(col("document")).cast("int").as("n_doc"))
        .unionByName(dst.get().select(lit("fork").as("side"), col("id"),
          col("lang"), length(col("document")).cast("int").as("n_doc")))
        .orderBy("side", "id")
    }),
    // Export → import ROUND TRIP through plain parquet — the interchange
    // path that moves a collection between roots/clusters. The source is
    // hydrated (ids + documents + two metadata columns), exported, then
    // imported as a NEW collection THROUGH add's invariant gates (unique
    // non-null ids, uniform dims), and the imported side is read back via
    // get() — the oracle computes the same truth straight from the
    // documents table, so any row the round trip drops, duplicates, or
    // mutates hash-mismatches.
    "q129_export_import_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("xp"); cat.deleteCollection("xp2")
      val src = cat.getOrCreateCollection("xp")
      src.add(docs.filter(col("doc_id") < 250).select(
        col("doc_id").cast("string").as("id"), col("text").as("document"),
        col("lang"), col("n_chars")))
      val expDir = s"$root/xp_export"
      val p = new org.apache.hadoop.fs.Path(expDir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      src.export(expDir, "parquet")
      val back = cat.importCollection("xp2", expDir)
      back.get().select(col("id"), col("lang"), col("n_chars"),
          length(col("document")).cast("int").as("n_doc"))
        .orderBy("id")
    }),
    // Hard-negative mining (DPR-style): per query vector, the top-5
    // nearest corpus vectors with a DIFFERENT label — the negative-
    // sampling step of contrastive retriever training. One broadcast of
    // the 3-query table against one corpus scan; the label-mismatch
    // predicate applies before the rank window.
    "q117_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id").isin(0, 1, 2))
      Knn.hardNegatives(emb, "vec_id", "embedding", "label",
          queries, "vec_id", "embedding", "label", k = 5, space = "cosine")
        .select(col("qid"), col("rnk"), col("vec_id"),
          roundz(col("dist"), 4).as("dist"), col("label"))
        .orderBy("qid", "rnk")
    }),
    // Curation: weighted source-mixture sampling to a token budget — the
    // data-mixing step of training-corpus assembly. The per-source rate
    // table broadcasts back onto the corpus scan (the corpus never
    // shuffles); the keep decision is the portable id hash, so the whole
    // mixture replays in the oracle.
    "q71_source_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Mixture.sampleToBudget(docs, "doc_id", "source", "n_tok",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), budget = 2000L)
        .select(col("doc_id"), col("source"), roundz(col("rate"), 4).as("rate"))
        .orderBy("doc_id")
    }),
    // Temperature-scaled mixture (the multilingual-sampling rule): source
    // weights derived IN-ENGINE as sqrt(total tokens), normalized via an
    // order-free decimal sum — small sources upweighted, no giant source
    // dominating, and the whole rate computation replays in the oracle.
    "q90_temperature_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Mixture.sampleTemperature(docs, "doc_id", "source", "n_tok",
          alpha = 0.5, budget = 2000L)
        .select(col("doc_id"), col("source"), roundz(col("rate"), 4).as("rate"))
        .orderBy("doc_id")
    }),
    // Leakage-safe train/val/test assignment: the split is a pure hash of
    // the SOURCE, so every document of an origin lands in the same split
    // (i.i.d. row splits leak near-dups across the boundary). Map-only.
    "q91_group_split" -> ((s, dir) =>
      Mixture.groupSplit(t(s, dir, "documents"), "source",
          Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id")),
    // Curation: deterministic corpus shuffle into training shards — global
    // order and shard assignment are pure functions of the id, so the
    // shards are reproducible across runs/engines (and verifiable here)
    "q72_reshard" -> ((s, dir) =>
      Mixture.reshard(t(s, dir, "documents"), "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")),
    // Substring-level dedup signal (Lee et al. 2022): per-doc count of
    // 5-token passages that recur in other documents
    "q73_duplicate_passages" -> ((s, dir) =>
      Dedup.duplicatePassages(t(s, dir, "documents"), "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_dup_passages"), col("max_spread"))
        .orderBy("doc_id")),
    // CDC delta hydration: classify an incoming batch against current
    // contents; only real inserts/updates survive (the write an
    // incremental 100 TB pipeline would then apply — Hydrator.sync does,
    // spec-pinned; here the decision table itself is under the oracle)
    "q74_incremental_hydrate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val current = docs.filter(col("doc_id") < 200)
        .select(col("doc_id").cast("string").as("id"),
          col("text").as("document"), col("lang"))
      val incoming = docs.filter(col("doc_id") < 260)
        .select(col("doc_id").cast("string").as("id"),
          when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
            .otherwise(col("text")).as("document"),
          col("lang"))
      Hydrator.delta(current, incoming, "id", Seq("document", "lang"))
        .select(col("id"), col("action")).orderBy("id")
    }),
    // Curation: cluster-balanced diversity sample — ≤10 rows per seeded
    // IVF cell (q32's deterministic assignment), chosen by portable hash
    "q75_cluster_sample" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
      Mixture.cellBalancedSample(m.assigned, "vec_id", perCell = 10)
        .select(col("vec_id"), col("cell")).orderBy("vec_id")
    }),
    // Transitive dup clustering: connected components over the LSH
    // near-dup pairs (q61's pipeline) — cluster = min id, the canonical
    // representative cluster-level dedup keeps
    "q76_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", minSim = 0.2, dim = 64, nBits = 8)
      Dedup.dupClusters(pairs, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),
    // MVCC time travel UNDER THE ORACLE: snapshot-read the first committed
    // version after later mutations — the snapshot must be bit-identical
    // to the original batch, unaffected by the upsert and delete that
    // followed it (the COW version dir IS the snapshot; nothing is copied)
    "q79_time_travel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("tt")
      val coll = cat.getOrCreateCollection("tt")
      coll.add(docs.filter(col("doc_id") < 150)
        .select(col("doc_id").cast("string").as("id"), col("lang"), col("n_chars")))
      val v1 = coll.meta.version
      coll.upsert(docs.filter(col("doc_id") < 180)
        .select(col("doc_id").cast("string").as("id"),
          lit("zz").as("lang"), col("n_chars")))
      coll.delete(ids = Seq("1", "2", "3"))
      coll.toDFAt(v1).select(col("id"), col("lang"), col("n_chars")).orderBy("id")
    }),
    // MVCC storage hygiene END TO END: four mutations accumulate COW
    // versions and small files; compact() repacks into a fresh commit and
    // vacuum(keepHistory=1) drops everything older than the pre-compaction
    // snapshot. The result reads BOTH surviving states — the compacted
    // current and the retained snapshot — tagged and unioned, so the
    // oracle pins that compaction changed nothing and vacuum kept exactly
    // the history it promised.
    "q81_compact_vacuum" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("cv")
      val coll = cat.getOrCreateCollection("cv")
      coll.add(docs.filter(col("doc_id") < 100)
        .select(col("doc_id").cast("string").as("id"), col("lang"), col("n_chars")))
      coll.upsert(docs.filter(col("doc_id") < 40)
        .select(col("doc_id").cast("string").as("id"), lit("aa").as("lang"), col("n_chars")))
      coll.delete(ids = Seq("7", "8"))
      coll.upsert(docs.filter(col("doc_id").between(90, 119))
        .select(col("doc_id").cast("string").as("id"), lit("bb").as("lang"), col("n_chars")))
      val snapshot = coll.meta.version
      coll.compact()
      coll.vacuum(keepHistory = 1)
      coll.get().select(lit("current").as("src"), col("id"), col("lang"), col("n_chars"))
        .unionByName(coll.toDFAt(snapshot)
          .select(lit("snapshot").as("src"), col("id"), col("lang"), col("n_chars")))
        .orderBy(col("src"), col("id").cast("long"))
    }),
    // Interval (range) join via time-axis binning: purchase→click
    // attribution within a 1-hour lookback, equi-join on (user, bin) —
    // never the per-user cross product a theta-join would plan
    "q78_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("us").as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("us").as("c_us"))
      Events.intervalJoin(purchases, clicks, Seq("user_id"),
          "p_us", "c_us", 0L, 3600000000L)
        .select(col("p_id"), col("c_id"), col("user_id"),
          expr("(p_us - c_us) div 1000000").as("lag_s"))
        .orderBy("p_id", "c_id")
    }),
    // Curation: C4-style rule filter with per-rule drop reasons — the
    // audit trail a corpus report needs, not a bare boolean
    "q77_quality_filter" -> ((s, dir) => {
      val f = TextAnalysis.qualityFilter(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
          f.getField("keep").as("keep"),
          array_join(f.getField("reasons"), ",").as("reasons"))
        .orderBy("doc_id")
    }),
    // Multimodal with a REAL codec (no stub): payloads are genuine PNG
    // byte streams (deterministic pixel formula → javax.imageio encode),
    // and the query runs an ACTUAL ImageIO decode per row in the
    // per-partition batch shape, then per-channel raster means. PNG is
    // lossless on 8-bit RGB, so the oracle replays the features straight
    // from the pixel formula — the decode is verified end-to-end: any
    // codec corruption, channel swap, or dimension bug hash-mismatches.
    "q123_image_decode" -> ((s, dir) => {
      val media = Multimodal.syntheticPngFrame(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          roundz(col("mean_r"), 4).as("mean_r"),
          roundz(col("mean_g"), 4).as("mean_g"),
          roundz(col("mean_b"), 4).as("mean_b"))
        .orderBy("media_id")
    }),
    "q132_audio_decode" -> ((s, dir) => {
      val media = Multimodal.syntheticWavFrame(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeAudio(media).toDF()
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"),
          roundz(col("rms_l"), 4).as("rms_l"),
          roundz(col("rms_r"), 4).as("rms_r"))
        .orderBy("media_id")
    }),
    // IVF-PQ, the canonical composed ANN (FAISS's IVFPQ): the corpus is
    // cell-partitioned (q32's seeded IVF prunes WHICH rows) AND
    // code-compressed (q136's PQ shrinks WHAT each pruned row costs) —
    // ADC runs over the probed cells' codes only, then exact cosine
    // re-ranks the fetchN=30 shortlist. Both layers' determinism tricks
    // compose, so assignment, probe choice, encode, ADC and the final
    // re-rank ALL replay in the DuckDB oracle.
    "q139_ivfpq_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ivf = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
      val pq = Ann.buildPqSeeded(emb, "vec_id", "embedding",
        dim = 64, m = 8, seedIds = 1L to 16L)
      val encoded = Ann.pqEncode(ivf.assigned, "embedding", pq)
      Ann.queryIvfPq(encoded, ivf, pq, emb, "vec_id", "embedding",
          headVec(emb, 0), k = 10, nprobe = 2, fetchN = 30,
          space = "cosine", excludeIds = Seq(0L))
        .select(col("vec_id"), col("adc"), col("dist"))
    }),
    // The BATCH form of the store-side PQ read (q140's collection,
    // reused by fingerprint): one pruned codes-only scan serves BOTH
    // query vectors — per-query probe sets and ADC tables ride the
    // broadcast query frame, per-query shortlists prune under the
    // exchange, one join back re-ranks exactly. The oracle replays the
    // whole per-qid pipeline keyed by qid.
    "q144_collection_pq_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"pq2|$dir|n=${emb.count()}|cs=0-7|ps=1-16|m=8"
      val reusable = cat.getCollection("pqidx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("pqidx").get else {
        cat.deleteCollection("pqidx")
        val c = cat.getOrCreateCollection("pqidx", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        c.buildIndexPqSeeded((0L until 8L).map(_.toString),
          (1L to 16L).map(_.toString), m = 8)
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.queryPqBatch(Seq(headVec(emb, 0), headVec(emb, 17)),
          k = 10, nprobe = 2, fetchN = 30)
        .select(col("qid"), col("rnk"), col("id"), col("adc"), col("dist"))
        .orderBy("qid", "rnk")
    }),
    // The RESIDUAL IVF-PQ as the collection index (q141's construction
    // promoted to the store, the way q140 promoted q139): codes quantize
    // v − centroid(cell) under seed-residual codebooks, the sidecar's
    // residual flag routes queryPq through per-cell ADC tables, and the
    // exact cosine re-rank rides the same fetchN refine. String ids, no
    // self-exclusion — the store surface's semantics, q140's discipline.
    "q145_collection_pq_residual_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"pqr1|$dir|n=${emb.count()}|cs=0-7|ps=10-25|m=8"
      val reusable = cat.getCollection("pqridx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("pqridx").get else {
        cat.deleteCollection("pqridx")
        val c = cat.getOrCreateCollection("pqridx", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        // PQ seeds disjoint from cell seeds (a cell seed's residual is
        // the zero vector — q141's degeneracy argument)
        c.buildIndexPqResidualSeeded((0L until 8L).map(_.toString),
          (10L to 25L).map(_.toString), m = 8)
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.queryPq(headVec(emb, 0), 10, nprobe = 2, fetchN = 30)
        .select(col("id"), col("adc"), col("dist"))
    }),
    // SIZE-AWARE PQ DIALS under the oracle (the q113 nBitsFor discipline
    // for the PQ family): codebook width ksub = clamp(n/8, 16, 256) picks
    // the BUILD seeds, and queryPq's fetchN = 0 resolves the shortlist
    // width clamp(n/4, 4k, MaxFetchN) from the live corpus count — both
    // rules integer-only, both EMITTED as columns, and the oracle
    // recomputes both from COUNT(*) with truncating division — proving
    // the sizing rules are portable, not just one frozen dial. All cells
    // probed (nprobe = 8 of 8): this query pins the dials, q140 pins the
    // cell pruning. Recall at these defaults is measured per-bench
    // (Recall "q148" entry) — the frozen-dial 0.2 vs scaled ~1.0 gap is
    // exactly what the rule closes.
    "q148_pq_autodial_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val n = emb.count()
      val ksub = Ann.pqKsubFor(n)
      val fp = s"pqauto1|$dir|n=$n|cs=0-7|ps=1-$ksub|m=8"
      val reusable = cat.getCollection("pqauto").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("pqauto").get else {
        cat.deleteCollection("pqauto")
        val c = cat.getOrCreateCollection("pqauto", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        c.buildIndexPqSeeded((0L until 8L).map(_.toString),
          (1L to ksub.toLong).map(_.toString), m = 8)
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.queryPq(headVec(emb, 0), 10, nprobe = 8, fetchN = 0)
        .withColumn("ksub", lit(ksub))
        .withColumn("fetch_n", lit(Ann.pqFetchNFor(n, 10)))
    }),
    // The BATCH read of the residual store index (q144 : q140 ::
    // q149 : q145): one pruned codes-only scan serves both queries, but
    // the ADC tables are now per-(query, cell) — each query's broadcast
    // row carries a MAP cell → flattened residual lut for its probed
    // cells, rows pick their table by their own cell. Same collection as
    // q145 (fingerprint-shared).
    "q149_collection_pq_residual_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root)
      val fp = s"pqr1|$dir|n=${emb.count()}|cs=0-7|ps=10-25|m=8"
      val reusable = cat.getCollection("pqridx").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp) && c.hasIndex)
      val coll = if (reusable) cat.getCollection("pqridx").get else {
        cat.deleteCollection("pqridx")
        val c = cat.getOrCreateCollection("pqridx", "cosine")
        c.add(emb.select(col("vec_id").cast("string").as("id"),
          col("embedding"), col("label")))
        c.buildIndexPqResidualSeeded((0L until 8L).map(_.toString),
          (10L to 25L).map(_.toString), m = 8)
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.queryPqBatch(Seq(headVec(emb, 0), headVec(emb, 17)),
          k = 10, nprobe = 2, fetchN = 30)
        .select(col("qid"), col("rnk"), col("id"), col("adc"), col("dist"))
        .orderBy("qid", "rnk")
    }),
    // Server-side embedding × the PQ read path (q115's embedding
    // function composed with q144's codes-only scan): documents hydrate
    // through the recorded HashingEmbedder(16), the PQ index quantizes
    // the 16-dim hash embeddings (m=8, subDim=2), and queryTextPq embeds
    // the query texts through the SAME recorded binding, ADC-scans
    // codes inside the probed cells, exact-cosine re-ranks. The oracle
    // replays the entire composition from RAW TEXT: hash-embed (integral
    // counts — float32 and DOUBLE agree bit-for-bit), seeded assignment,
    // probe choice, encode, per-qid luts, both rank stages.
    "q150_querytext_pq" -> ((s, dir) =>
      qtpqCollection(s, dir).queryTextPq(
          Seq("vector database search index", "streaming join throughput"),
          k = 10, nprobe = 2, fetchN = 30)
        .select(col("qid"), col("rnk"), col("id"), col("adc"), col("dist"))
        .orderBy("qid", "rnk")),
    // Hybrid with BOTH legs index-confined — the 100 TB serving hybrid:
    // keyword leg through the tp-pruned keyword sidecar, vector leg
    // through the PQ-coded index (codes-only ADC scan in the probed
    // cells, exact refine). The vector leg's ranks are the PQ pipeline's
    // REFINED ranks, so the oracle replays the ENTIRE q150 construction
    // for the query text plus the BM25 fold, then fuses — every stage of
    // both approximate legs under one hash.
    "q160_hybrid_text_pq" -> ((s, dir) => {
      val coll = qtpqCollection(s, dir)
      if (!coll.hasKeywordIndex) coll.buildKeywordIndex()
      coll.queryHybridTextPq("hash join stream", k = 20, fetchN = 30,
          nprobe = 2, adcFetchN = 30)
        .select(col("id"), roundz(col("rrf"), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
    }),
    // Cross-version SCHEMA EVOLUTION through the store: batch 1 writes
    // (id, document, embedding); a later upsert introduces a NEW metadata
    // column (src) the original version never had. The union-by-name read
    // admits missing columns as NULL across the carry-manifest version
    // chain, and the evolved column is immediately filterable ($eq) and
    // pageable — the oracle computes the same truth from the documents
    // table with the same split.
    "q143_schema_evolution" -> ((s, dir) => {
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("evolve")
      val c = cat.getOrCreateCollection("evolve")
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id").cast("string").as("id"),
          coalesce(col("text"), lit("")).as("document"),
          array(col("doc_id").cast("float")).as("embedding"), col("source"))
      c.add(docs.filter(col("id").cast("long") < 150).drop("source"))
      // the evolving batch: 50 updated rows + 50 new, now WITH src
      c.upsert(docs.filter(col("id").cast("long") >= 100)
        .withColumnRenamed("source", "src"))
      // full page: pre-evolution rows read the new column as NULL; plus
      // the evolved column must FILTER (the where leg tags src5's rows)
      val tagged = c.get(where = Some(ChromaFilter.Eq("src", "src5")))
        .select(col("id"), lit(1L).as("matched_src5"))
      c.get().select(col("id"), coalesce(col("src"), lit("__pre")).as("src"))
        .join(tagged, Seq("id"), "left")
        .na.fill(0L, Seq("matched_src5"))
        .orderBy(col("id"))
    }),
    // Residual IVF-PQ — the FULL Jégou construction (q139 quantizes raw
    // vectors; this quantizes r = v − centroid(cell), so the codebooks
    // spend their resolution on what the cell has not already explained):
    // per-cell ADC tables on the residual query, chained-conditional
    // lookup per row, exact cosine re-rank. Every stage replays — the
    // residual subtraction is a double fold in element order on both
    // engines.
    "q141_ivfpq_residual_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ivf = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
      // PQ seeds DISJOINT from the cell seeds: a cell seed's residual is
      // the zero vector, and 7 zero codebook entries would waste half the
      // codebook (ties all resolving to the lowest zero code)
      val pq = Ann.buildPqResidualSeeded(ivf.assigned, "vec_id", "embedding",
        ivf.centroids, dim = 64, m = 8, seedIds = 10L to 25L)
      val encoded = Ann.pqEncodeResidual(ivf.assigned, "embedding", ivf.centroids, pq)
      Ann.queryIvfPqResidual(encoded, ivf, pq, emb, "vec_id", "embedding",
          headVec(emb, 0), k = 10, nprobe = 2, fetchN = 30,
          space = "cosine", excludeIds = Seq(0L))
        .select(col("vec_id"), col("adc"), col("dist"))
    }),
    // Multimodal: binary payload + typed metadata + (stub) decode features
    "q34_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.fakeMediaFrame(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          roundz(col("mean_byte"), 4).as("mean_byte"))
        .orderBy("media_id")
    }),
    // Product quantization, the memory-side ANN scale path (IVF prunes
    // WHICH rows, PQ shrinks WHAT each row costs — 64 floats → 8 codes
    // here, a 32× cut): seeded codebooks (subvectors of rows 1..16),
    // argmin-L2 encode, ADC shortlist from the code table alone, exact
    // cosine re-rank of the fetchN=30 survivors. Genuinely approximate —
    // yet seeds + element-order folds + round-to-6 decimal ADC sums make
    // encode, the lookup table, and BOTH ranking stages replay
    // value-for-value in the DuckDB oracle. m=8 (8-wide subspaces), the
    // config PqSpec measures at recall 9/10 on this corpus at fetchN=50.
    "q136_pq_adc_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = Ann.buildPqSeeded(emb, "vec_id", "embedding",
        dim = 64, m = 8, seedIds = 1L to 16L)
      val encoded = Ann.pqEncode(emb, "embedding", model)
      Ann.queryPqRefined(encoded, emb, model, "vec_id", "embedding",
          headVec(emb, 0), k = 10, fetchN = 30, space = "cosine",
          excludeIds = Seq(0L))
        .select(col("vec_id"), col("adc"), col("dist"))
    }),
    // REAL-SOURCE streaming hydration (r12 VERDICT #7): q80/q127 feed
    // MemoryStream from a driver-side collect — a test harness, not the
    // cluster shape. Here the input is a STAGED PARQUET DIRECTORY (an
    // executor-side write) drained through readStream.format("parquet")
    // with maxFilesPerTrigger=1 under AvailableNow: four microbatches
    // whose rows never pass through the driver, upserted by the same
    // foreachBatch sink. At 100 TB this is the hydration entry point a
    // real deployment runs (swap the dir for the landing bucket); the
    // oracle replays the staged subset's scan semantics, so the hash
    // proves the streamed store content equals the batch truth.
    "q151_file_stream_hydrate" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingHydrator
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      val fp = s"fstream1|$dir|n=${docs.count()}"
      val reusable = cat.getCollection("fstream").exists(c =>
        c.meta.metadata.get("source_fp").contains(fp))
      val coll = if (reusable) cat.getCollection("fstream").get else {
        cat.deleteCollection("fstream")
        val c = cat.getOrCreateCollection("fstream")
        val staged = cachedExport(s, dir, "documents", "q151src") { path =>
          docs.filter(col("doc_id") < 300)
            .select(col("doc_id").cast("string").as("id"),
              coalesce(col("text"), lit("")).as("document"), col("lang"),
              col("doc_id").as("ver"))
            .repartition(4).write.mode("overwrite").parquet(path)
        }
        val ckpt = s"$root/q151_ckpt"
        val ckptPath = new org.apache.hadoop.fs.Path(ckpt)
        ckptPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(ckptPath, true)
        val stream = s.readStream.format("parquet")
          .schema(s.read.parquet(staged).schema)
          .option("maxFilesPerTrigger", "1")
          .load(staged)
        val q = StreamingHydrator.hydrate(stream, c, ckpt,
          orderCol = Some("ver"), trigger = Trigger.AvailableNow()).start()
        q.awaitTermination() // AvailableNow drains the staged files and stops
        c.modifyMetadata(Map("source_fp" -> fp))
        c
      }
      coll.get().select(col("id"), col("lang"),
          length(col("document")).cast("int").as("n_doc"),
          col("ver"))
        .orderBy(col("id").cast("long"))
    }),
    // Chroma `include=` made SCAN-real (r12 VERDICT #5): a documents+
    // metadatas get must not read a single embedding byte — at 100 TB the
    // embedding column IS the collection's bulk. GetIncludeSpec pins the
    // pruned ReadSchema; this entry hash-pins the VALUES of the projected
    // page (filter + string-ordered paging + include interplay).
    "q152_get_include" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("inc152")
      val coll = cat.getOrCreateCollection("inc152", "cosine")
      coll.add(emb.join(docs, col("vec_id") === col("doc_id"))
        .filter(col("vec_id") < 400)
        .select(col("vec_id").cast("string").as("id"), col("embedding"),
          col("text").as("document"), col("lang"), col("n_chars")))
      val page = coll.get(
        where = Some(ChromaFilter.In("lang", Seq("en", "fr"))),
        limit = Some(50),
        include = Some(Set("documents", "metadatas")))
      require(!page.columns.contains("embedding"),
        "include=[documents,metadatas] must prune the embedding column")
      page.select(col("id"), length(col("document")).cast("int").as("n_doc"),
          col("lang"), col("n_chars"))
        .orderBy(col("id"))
    }),
    // TYPED metadata on the MAP layout (r12 VERDICT #6): Chroma metadata
    // is str/int/float/bool; a migrating user carrying the dict as ONE
    // MAP<STRING,STRING> column declares per-key types once
    // (declareMetadataTypes → meta:type:* collection metadata) and the
    // key resolver try_casts lookups — $eq on an int compares as int,
    // $eq(flagged, true) works at all (a bool literal against a string
    // map value is otherwise an ANSI cast error), and unparsable stored
    // values simply don't match (Chroma's typed behavior). The flat
    // typed-column layout needs none of this — parquet types ARE the
    // declaration (q04/q06 pin that path).
    "q153_typed_metadata" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = verifyCollectionsRoot(dir)
      val cat = new CollectionCatalog(s, root, numBuckets = 8)
      cat.deleteCollection("typed153")
      val coll = cat.getOrCreateCollection("typed153")
      coll.add(docs.filter(col("doc_id") < 400)
        .select(col("doc_id").cast("string").as("id"),
          coalesce(col("text"), lit("")).as("document"),
          map(
            lit("stars"), (col("doc_id") % 5).cast("string"),
            lit("rating"), ((col("doc_id") % 100) / lit(20.0)).cast("string"),
            lit("flagged"), (col("doc_id") % 3 === 0).cast("string")
          ).as("metadata")))
      coll.declareMetadataTypes(Map(
        "stars" -> "long", "rating" -> "double", "flagged" -> "boolean"))
      coll.get(where = Some(ChromaFilter.And(Seq(
          ChromaFilter.Eq("flagged", true),
          ChromaFilter.Gt("stars", 1),
          ChromaFilter.Lte("rating", 4.0)))))
        .select(col("id"),
          element_at(col("metadata"), "stars").cast("long").as("stars"),
          roundz(element_at(col("metadata"), "rating").cast("double"), 4)
            .as("rating"),
          element_at(col("metadata"), "flagged").cast("boolean").as("flagged"))
        .orderBy(col("id"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q00_hydrate" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, text AS document,
        |CAST(len(embedding) AS INTEGER) AS dim, CAST(label AS VARCHAR) AS rating
        |FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY id""".stripMargin,
    "q01_scan_project_cast" ->
      "SELECT CAST(doc_id AS VARCHAR) AS id, text FROM documents ORDER BY id",
    "q02_wide_assemble_nulldrop" ->
      """SELECT vec_id AS doc_id,
        |CAST(len(list_filter(list_transform(range(64),
        |  j -> CASE WHEN (vec_id + j) % 17 = 0 THEN NULL ELSE embedding[j+1] END),
        |  x -> x IS NOT NULL)) AS INTEGER) AS dim
        |FROM embeddings ORDER BY doc_id""".stripMargin,
    "q03_count" -> "SELECT COUNT(*) AS cnt FROM documents",
    "q04_filter_eq" ->
      "SELECT CAST(vec_id AS VARCHAR) AS id FROM embeddings WHERE label = 3 ORDER BY id",
    "q05_filter_in" ->
      "SELECT doc_id FROM documents WHERE lang IN ('en', 'es') ORDER BY doc_id",
    "q06_filter_range" ->
      "SELECT doc_id FROM documents WHERE n_chars > 100 AND n_chars <= 200 ORDER BY doc_id",
    "q07_filter_bool" ->
      """SELECT doc_id FROM documents
        |WHERE (lang = 'en' OR source <> 'src0') AND n_chars >= 64 ORDER BY doc_id""".stripMargin,
    "q08_doc_contains" ->
      "SELECT doc_id FROM documents WHERE contains(text, 'scan') ORDER BY doc_id",
    "q09_doc_not_contains" ->
      "SELECT COUNT(*) AS cnt FROM documents WHERE NOT contains(text, 'scan')",
    "q10_get_limit_offset" ->
      "SELECT doc_id, lang FROM documents ORDER BY doc_id LIMIT 10 OFFSET 5",
    "q11_knn_cosine" -> sqlKnnSingle(sqlCos("e.embedding", "q.qe")),
    "q69_quantized_knn" -> {
      // replay of Ann.quantizeInt8 ∘ dequantizeInt8: per-vector max-abs
      // scale, away-from-zero integer rounding (both engines), then the
      // q11 cosine shape over the reconstructed corpus
      s"""WITH sc AS (SELECT vec_id, embedding,
         |       list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |     FROM embeddings),
         |eq AS (SELECT vec_id,
         |       list_transform(embedding, x -> ROUND(CAST(x AS DOUBLE) /
         |         (CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END), 0)
         |         * (CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END)) AS de
         |     FROM sc),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id AS vec_id, ${sqlCos("e.de", "q.qe")} AS dist_raw
         |      FROM eq e, q WHERE e.vec_id <> 0)
         |SELECT vec_id, ROUND(dist_raw, 4) + 0.0 AS dist FROM d
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin
    },
    "q12_knn_l2" -> sqlKnnSingle(sqlL2("e.embedding", "q.qe")),
    "q13_knn_ip" -> sqlKnnSingle(sqlIp("e.embedding", "q.qe")),
    "q14_knn_filtered" -> sqlKnnSingle(sqlCos("e.embedding", "q.qe"),
      "AND e.label = (SELECT label FROM embeddings WHERE vec_id = 0)"),
    "q15_knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |           WHERE vec_id IN (0, 1, 2, 3, 4)),
         |d AS (SELECT q.qid, e.vec_id, ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |      FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, CAST(row_number() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, vec_id) AS INTEGER) AS rnk FROM d)
         |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "q16_dedup_exact" ->
      """SELECT (SELECT COUNT(DISTINCT text) FROM documents) AS n_distinct,
        |(SELECT COUNT(*) FROM (SELECT text, MIN(doc_id) FROM documents GROUP BY text)) AS n_after""".stripMargin,
    "q17_upsert_latest_wins" ->
      """WITH b1 AS (SELECT doc_id, text, 1 AS batch FROM documents),
        |b2 AS (SELECT doc_id, upper(text) AS text, 2 AS batch FROM documents WHERE doc_id % 3 = 0),
        |u AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY batch DESC) AS rn
        |      FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2))
        |SELECT doc_id, batch, CAST(length(text) AS INTEGER) AS n
        |FROM u WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q18_delete_antijoin" ->
      """SELECT COUNT(*) AS cnt, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE doc_id NOT IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)""".stripMargin,
    "q19_agg_by_lang" ->
      """SELECT lang, COUNT(*) AS cnt, ROUND(AVG(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q20_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_topk_per_nation" ->
      """WITH tot AS (
        |  SELECT n_name, c_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, c_custkey),
        |r AS (SELECT n_name, CAST(row_number() OVER
        |        (PARTITION BY n_name ORDER BY total DESC, c_custkey) AS INTEGER) AS rnk,
        |        c_custkey, total FROM tot)
        |SELECT n_name, rnk, c_custkey, CAST(total AS DOUBLE) AS total
        |FROM r WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin,
    "q22_events_hourly_json" ->
      """SELECT epoch_us(ts) // 3600000000 AS hr, event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,
    "q23_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us, event_id,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, CAST(SUM(new_s) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx FROM g)
        |SELECT user_id, session_idx, COUNT(*) AS n_events FROM s
        |GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "q24_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
        |CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_quality_score" ->
      s"""WITH q AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       tk -> lower(tk) IN ${sqlInList(enStop)})) AS DOUBLE) AS sw_hits,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
         |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper
         |  FROM documents),
         |r AS (SELECT doc_id,
         |  ROUND(n_chars / n_tokens, 4) AS mean_tok_len,
         |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
         |  ROUND(n_upper / n_chars, 4) AS upper_ratio,
         |  ROUND(sw_hits / n_tokens, 4) AS stopword_ratio,
         |  n_tokens FROM q)
         |SELECT doc_id, mean_tok_len, punct_ratio, upper_ratio, stopword_ratio,
         |  ROUND((LEAST(n_tokens / 20.0, 1.0) + LEAST(stopword_ratio * 5.0, 1.0)
         |        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS score
         |FROM r ORDER BY doc_id""".stripMargin,
    // q87: q25's per-doc score chain + a per-source decimal-mean gate;
    // the mean is an exact decimal sum with one final double division,
    // so the >= comparison replays bit-for-bit
    "q87_source_quality_gate" ->
      s"""WITH q AS (SELECT doc_id, source,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       tk -> lower(tk) IN ${sqlInList(enStop)})) AS DOUBLE) AS sw_hits,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct
         |  FROM documents),
         |r AS (SELECT doc_id, source,
         |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
         |  ROUND(sw_hits / n_tokens, 4) AS stopword_ratio,
         |  n_tokens FROM q),
         |s AS (SELECT doc_id, source,
         |  ROUND((LEAST(n_tokens / 20.0, 1.0) + LEAST(stopword_ratio * 5.0, 1.0)
         |        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS score
         |  FROM r),
         |m AS (SELECT source,
         |        CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS src_score
         |      FROM s GROUP BY source)
         |SELECT s.doc_id AS doc_id, s.source AS source,
         |       ROUND(m.src_score, 4) + 0.0 AS src_score
         |FROM s JOIN m ON s.source = m.source
         |WHERE m.src_score >= 0.71 ORDER BY doc_id""".stripMargin,
    // q93: top-1000 vocab (count desc, token asc at the boundary), then
    // per-doc OOV via the same left-join count
    "q93_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |voc AS (SELECT token FROM (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        |        ORDER BY cnt DESC, token LIMIT 1000)),
        |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |               SUM(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS oov
        |        FROM tok LEFT JOIN voc ON tok.token = voc.token GROUP BY doc_id)
        |SELECT d.doc_id AS doc_id, CAST(COALESCE(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       ROUND(CAST(agg.oov AS DOUBLE) / agg.n_tokens, 4) AS oov_rate
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY doc_id""".stripMargin,
    // q94: the identical plant (mod-3/5/7 on doc_id), identical regex
    // texts (interpolated from the SAME Scala constants the Spark side
    // compiles), identical replace order email → ip → phone
    "q94_pii_scrub" ->
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN ' contact ' || source || '@example.com' ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ELSE '' END
         |  || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END AS ptext
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(ptext, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(ptext, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(ptext, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(ptext,
         |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS scrubbed
         |FROM p ORDER BY doc_id""".stripMargin,
    // q95: same in-engine blocklist rule (spread-hash of source mod 5),
    // same authority-extraction regex
    "q95_domain_blocklist" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents),
         |bl AS (SELECT source || '.example.com' AS domain
         |       FROM (SELECT DISTINCT source FROM documents)
         |       WHERE ${sqlSpreadHash("source")} % 5 < 2),
         |x AS (SELECT doc_id,
         |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS domain
         |      FROM d)
         |SELECT doc_id, domain FROM x
         |WHERE domain NOT IN (SELECT domain FROM bl) ORDER BY doc_id""".stripMargin,
    // q97: same spread-hash bucketing, same division order
    // (s/T/n left-assoc), +0.0 normalizes IEEE -0.0 after ROUND
    "q97_target_affinity" ->
      s"""WITH tok AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
         |             ${sqlSpreadHash("tk")} % 256 AS b
         |             FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
         |                   FROM documents)),
         |bt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr, CAST(SUM(t) AS BIGINT) AS ct
         |       FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt FROM bt),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |               CAST(SUM(bt.ct) AS BIGINT) AS s_t, CAST(SUM(bt.cr) AS BIGINT) AS s_r
         |        FROM tok JOIN bt USING (b) GROUP BY doc_id)
         |SELECT d.doc_id AS doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens,
         |       agg.s_t AS s_t, agg.s_r AS s_r,
         |       ROUND(CAST(agg.s_t AS DOUBLE) / tot.tt / agg.n_tokens
         |             - CAST(agg.s_r AS DOUBLE) / tot.tr / agg.n_tokens, 6) + 0.0 AS affinity
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id CROSS JOIN tot
         |ORDER BY doc_id""".stripMargin,
    // q98: the identical plant (7-token lines, '.' on the same word set),
    // then the line rules as an index-lambda CASE chain with the same
    // precedence blocked → short → no-punct; rtrim replays the trailing-
    // punctuation strip before the blocklist lookup
    "q98_c4_line_filter" ->
      s"""WITH p AS (SELECT doc_id,
         |    regexp_replace(
         |      regexp_replace(text, '((?:\\S+ ){6}\\S+) ', '\\1' || chr(10), 'g'),
         |      '(data|join|merge|table)(\\n|$$)', '\\1.\\2', 'g') AS ptext
         |    FROM documents),
         |l AS (SELECT doc_id, string_split(ptext, chr(10)) AS lines FROM p),
         |c AS (SELECT doc_id, lines, list_transform(lines, ln ->
         |      CASE WHEN len(list_filter(string_split(ln, ' '),
         |                     w -> rtrim(lower(w), '.!?"') = 'slow')) > 0 THEN 1
         |           WHEN len(list_filter(string_split(ln, ' '), w -> w <> '')) < 3 THEN 2
         |           WHEN right(ln, 1) NOT IN ('.', '!', '?', '"') THEN 3
         |           ELSE 0 END) AS cats FROM l)
         |SELECT doc_id,
         |  CAST(len(cats) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(cats, x -> x = 0)) AS BIGINT) AS n_kept,
         |  CAST(len(list_filter(cats, x -> x = 1)) AS BIGINT) AS n_blocked,
         |  CAST(len(list_filter(cats, x -> x = 2)) AS BIGINT) AS n_short,
         |  CAST(len(list_filter(cats, x -> x = 3)) AS BIGINT) AS n_nopunct,
         |  COALESCE(array_to_string(list_filter(lines, (ln, i) -> cats[i] = 0),
         |           chr(10)), '') AS cleaned
         |FROM c ORDER BY doc_id""".stripMargin,
    // q99: identical plant, identical (h1, h2) line key (spread hash of
    // the line and its reverse), keep-first via lexicographic struct MIN,
    // reconstruction by indexing the split list with the sorted kept idxs
    "q99_line_dedup" ->
      s"""WITH p AS (SELECT doc_id,
         |    regexp_replace(text, '((?:\\S+ ){2}\\S+) ', '\\1' || chr(10), 'g') AS pt
         |    FROM documents),
         |l AS (SELECT doc_id, unnest(list_transform(string_split(pt, chr(10)),
         |             (x, i) -> {'idx': i - 1, 'line': x}), recursive := true)
         |      FROM p),
         |k AS (SELECT doc_id, idx, ${sqlSpreadHash("line")} AS h1,
         |             ${sqlSpreadHash("reverse(line)")} AS h2 FROM l),
         |kp AS (SELECT MIN({'d': doc_id, 'i': idx}) AS m FROM k GROUP BY h1, h2),
         |ag AS (SELECT m.d AS doc_id, list_sort(list(m.i)) AS idxs,
         |              CAST(COUNT(*) AS BIGINT) AS n_kept FROM kp GROUP BY m.d)
         |SELECT p.doc_id AS doc_id,
         |  CAST(len(string_split(p.pt, chr(10))) AS BIGINT) AS n_lines,
         |  COALESCE(a.n_kept, 0) AS n_kept,
         |  COALESCE(array_to_string(list_transform(a.idxs,
         |    i -> string_split(p.pt, chr(10))[i + 1]), chr(10)), '') AS cleaned
         |FROM p LEFT JOIN ag a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q100: the q25 qualityScore chain (same rounded ratios) feeding the
    // cumulative stage flags; each stage is a CASE-guarded sum over ONE
    // pass, UNION ALL'd into the funnel table
    "q100_curation_funnel" ->
      s"""WITH sq AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       tk -> lower(tk) IN ${sqlInList(enStop)})) AS DOUBLE) AS sw_hits,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct
         |  FROM documents),
         |sr AS (SELECT doc_id,
         |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
         |  ROUND(sw_hits / n_tokens, 4) AS stopword_ratio, n_tokens FROM sq),
         |score AS (SELECT doc_id,
         |  ROUND((LEAST(n_tokens / 20.0, 1.0) + LEAST(stopword_ratio * 5.0, 1.0)
         |        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS s
         |  FROM sr),
         |g AS (SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
         |             d.lang IN ('en', 'de') AS c2,
         |             d.lang IN ('en', 'de') AND score.s >= 0.5 AS c3,
         |             d.lang IN ('en', 'de') AND score.s >= 0.5
         |               AND len(string_split(d.text, ' ')) BETWEEN 25 AND 90 AS c4,
         |             d.lang IN ('en', 'de') AND score.s >= 0.5
         |               AND len(string_split(d.text, ' ')) BETWEEN 25 AND 90
         |               AND NOT contains(d.text, 'slow') AS c5
         |      FROM documents d JOIN score ON d.doc_id = score.doc_id)
         |SELECT 1 AS stage_idx, 'all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(SUM(nt) AS BIGINT) AS metric_sum FROM g
         |UNION ALL SELECT 2, 'lang', CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN c2 THEN nt ELSE 0 END) AS BIGINT) FROM g
         |UNION ALL SELECT 3, 'quality', CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN c3 THEN nt ELSE 0 END) AS BIGINT) FROM g
         |UNION ALL SELECT 4, 'length', CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN c4 THEN nt ELSE 0 END) AS BIGINT) FROM g
         |UNION ALL SELECT 5, 'clean', CAST(SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN c5 THEN nt ELSE 0 END) AS BIGINT) FROM g
         |ORDER BY stage_idx""".stripMargin,
    // q101: identical plant, identical regex chain in the same order
    // (fragment → tracking+repair → lowercase authority → default ports →
    // trailing slash), keep-first via MIN per canonical form
    "q101_url_canon_dedup" ->
      s"""WITH u AS (SELECT doc_id,
         |    'HTTPS://WWW.Example.COM'
         |    || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
         |    || '/doc/' || CAST(doc_id % 100 AS VARCHAR)
         |    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=' || source ELSE '' END
         |    || CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END AS url
         |    FROM documents),
         |t1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS x FROM u),
         |t2 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(x,
         |         '([?&])(?:utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*', '\\1', 'g'),
         |         '([?&])&+', '\\1', 'g'), '[?&]$$', '') AS x FROM t1),
         |t3 AS (SELECT doc_id,
         |         lower(regexp_extract(x, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
         |         || regexp_extract(x, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1) AS x FROM t2),
         |t4 AS (SELECT doc_id, regexp_replace(regexp_replace(x,
         |         '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2'),
         |         '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2') AS x FROM t3),
         |c AS (SELECT doc_id,
         |        regexp_replace(x, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$$', '\\1') AS canon
         |      FROM t4)
         |SELECT MIN(doc_id) AS doc_id, canon FROM c GROUP BY canon ORDER BY doc_id""".stripMargin,
    // q102: gram hashes are the per-gram positional polynomial; the
    // rightmost minimal of window i is found via list_position on the
    // REVERSED slice (first hit in reverse = rightmost in order); short
    // docs collapse to one window of all grams (win = min(w, n_grams))
    "q102_winnow_fingerprints" ->
      s"""WITH g AS (SELECT doc_id, list_transform(range(length(text) - 12 + 1),
         |    i -> list_sum(list_transform(range(12),
         |         j -> ascii(substr(text, CAST(i + j + 1 AS INTEGER), 1))
         |              * (((j * 131) % 997) + 1)))) AS gh
         |    FROM documents),
         |w2 AS (SELECT doc_id, gh, LEAST(4, len(gh)) AS win FROM g),
         |f AS (SELECT doc_id, CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_sort(list_distinct(list_transform(
         |          range(len(gh) - win + 1), i ->
         |            CAST(gh[i + win - list_position(list_reverse(gh[i+1:i+win]),
         |                 list_min(gh[i+1:i+win])) + 1] AS BIGINT)))) END AS fps
         |      FROM w2)
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
         |       COALESCE(array_to_string(fps, ','), '') AS fps
         |FROM f ORDER BY doc_id""".stripMargin,
    // q103: same spread hash, same rank-≤k minimum set, and the estimator
    // constant (k−1)·M interpolates from the SAME Scala double so both
    // engines divide bit-identical values
    "q103_kmv_distinct" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tk
         |             FROM documents),
         |dh AS (SELECT DISTINCT lang, ${sqlSpreadHash("tk")} AS h FROM tok),
         |rn AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r
         |       FROM dh),
         |kk AS (SELECT lang, h FROM rn WHERE r <= 16),
         |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |        CAST(MAX(h) AS BIGINT) AS h_k
         |      FROM kk GROUP BY lang)
         |SELECT lang, n_kept, h_k,
         |  CASE WHEN n_kept < 16 THEN CAST(n_kept AS DOUBLE)
         |       ELSE ROUND(${15.0 * 1000000007.0} / CAST(h_k AS DOUBLE), 6) END AS est
         |FROM a ORDER BY lang""".stripMargin,
    // q135: the count-min build AND its point estimates replayed
    // integer-exact — same strHash→31-bit-clamp→spread chain as the
    // mixture/embedding oracles, folded per CMS row multiplicatively
    // (the TfIdf sign construction) before mod-w. MIN over a LEFT-joined
    // cell count (COALESCE 0) mirrors the engine's missing-cell rule.
    "q135_cms_heavyhitters" -> {
      def cell(h: String, r: String) =
        s"(((($h * ($r + 1) + $r) % 2147483647) * 2654435761) % 1000000007) % 256"
      val th = sqlStrHash("tm")
      val ph = sqlStrHash("p.token")
      s"""WITH tk AS (SELECT tm FROM
         |        (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents) WHERE length(tm) > 0),
         |rows_ AS (SELECT unnest(range(4)) AS r),
         |cells AS (SELECT r.r AS r, ${cell(th, "r.r")} AS cell, COUNT(*) AS cnt
         |          FROM tk CROSS JOIN rows_ r GROUP BY 1, 2),
         |probes(token) AS (VALUES ('the'), ('vector'), ('table'), ('spark'),
         |                         ('zzz-never-seen')),
         |pc AS (SELECT p.token, r.r AS r, ${cell(ph, "r.r")} AS cell
         |       FROM probes p CROSS JOIN rows_ r),
         |est AS (SELECT pc.token, MIN(COALESCE(c.cnt, 0)) AS est
         |        FROM pc LEFT JOIN cells c ON c.r = pc.r AND c.cell = pc.cell
         |        GROUP BY pc.token),
         |ex AS (SELECT tm AS token, COUNT(*) AS exact_cnt FROM tk GROUP BY tm)
         |SELECT e.token, CAST(e.est AS BIGINT) AS est,
         |       CAST(COALESCE(x.exact_cnt, 0) AS BIGINT) AS exact_cnt
         |FROM est e LEFT JOIN ex x ON x.token = e.token
         |ORDER BY e.token""".stripMargin
    },
    // q104: the q102 fingerprint chain over the sampled docs, then
    // list_intersect sizes on a.id < b.id pairs
    "q104_winnow_overlap" ->
      s"""WITH g AS (SELECT doc_id, list_transform(range(length(text) - 12 + 1),
         |    i -> list_sum(list_transform(range(12),
         |         j -> ascii(substr(text, CAST(i + j + 1 AS INTEGER), 1))
         |              * (((j * 131) % 997) + 1)))) AS gh
         |    FROM documents WHERE doc_id % 50 = 0 AND doc_id < 5000),
         |w2 AS (SELECT doc_id, gh, LEAST(4, len(gh)) AS win FROM g),
         |f AS (SELECT doc_id, CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_sort(list_distinct(list_transform(
         |          range(len(gh) - win + 1), i ->
         |            CAST(gh[i + win - list_position(list_reverse(gh[i+1:i+win]),
         |                 list_min(gh[i+1:i+win])) + 1] AS BIGINT)))) END AS fps
         |      FROM w2)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(len(list_intersect(a.fps, b.fps)) AS BIGINT) AS n_shared
         |FROM f a JOIN f b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.fps, b.fps)) >= 1
         |ORDER BY id_a, id_b""".stripMargin,
    // q105: the bigram-LM chain replayed — hashed token lists, lateral
    // bigram unnest, per-doc distinct-bigram counts, corpus c2/c1 joins,
    // the ratio rounded to 6 BEFORE the exact decimal weighted fold, one
    // final double division (identical order of operations to Lm)
    "q105_bigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, list_transform(
         |      string_split(COALESCE(text, ''), ' '),
         |      tk -> CAST(${sqlSpreadHash("tk")} AS BIGINT)) AS hs FROM documents),
         |u AS (SELECT unnest(hs) AS h1 FROM tok),
         |c1 AS (SELECT h1, COUNT(*) AS c1 FROM u GROUP BY h1),
         |bp AS (SELECT doc_id, unnest(range(len(hs) - 1)) AS i, hs FROM tok),
         |bg AS (SELECT doc_id, hs[i+1] AS h1, hs[i+2] AS h2 FROM bp),
         |pd AS (SELECT doc_id, h1, h2, COUNT(*) AS k FROM bg GROUP BY 1, 2, 3),
         |c2 AS (SELECT h1, h2, SUM(k) AS c2 FROM pd GROUP BY 1, 2),
         |j AS (SELECT pd.doc_id, pd.k,
         |        CAST(ROUND(CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE), 6)
         |             AS DECIMAL(18,6)) AS r
         |      FROM pd JOIN c2 USING (h1, h2) JOIN c1 USING (h1)),
         |s AS (SELECT doc_id, SUM(r * k) AS sr, SUM(k) AS n FROM j GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(s.n, 0) AS BIGINT) AS n_bigrams,
         |       CAST(CAST(s.sr * 1000000 AS BIGINT) // s.n AS DOUBLE) / 1000000.0
         |         AS lm_score
         |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q106: word-frequency vocab, per-word char-pair unnest weighted by
    // f, count-desc/pair-asc rank — both engines compare pair strings as
    // raw bytes, so the tiebreak is identical
    "q106_bpe_merges" ->
      """WITH t AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w
        |           FROM documents),
        |v AS (SELECT w, COUNT(*) AS f FROM t WHERE length(w) >= 2 GROUP BY w),
        |cx AS (SELECT f, string_split(w, '') AS cs FROM v),
        |px AS (SELECT f, unnest(range(len(cs) - 1)) AS i, cs FROM cx),
        |p AS (SELECT cs[i+1] || '+' || cs[i+2] AS pair, f FROM px),
        |c AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM p GROUP BY pair),
        |r AS (SELECT pair, cnt,
        |        ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rank FROM c)
        |SELECT CAST(rank AS INTEGER) AS rank, pair, cnt FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // q107: q103's k-min sets per lang, then per-pair merged sketch,
    // KMV Jaccard and the same (k−1)·M estimator on the union's k-th min
    "q107_kmv_overlap" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tk
         |             FROM documents),
         |dh AS (SELECT DISTINCT lang, CAST(${sqlSpreadHash("tk")} AS BIGINT) AS h
         |       FROM tok),
         |rn AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r
         |       FROM dh),
         |mins AS (SELECT lang, list(h ORDER BY h) AS hs FROM rn WHERE r <= 16
         |         GROUP BY lang),
         |pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
         |         list_sort(list_distinct(a.hs || b.hs))[1:16] AS u,
         |         a.hs AS ha, b.hs AS hb
         |       FROM mins a JOIN mins b ON a.lang < b.lang),
         |e AS (SELECT lang_a, lang_b, CAST(len(u) AS BIGINT) AS n_union_sketch,
         |        ROUND(CAST(len(list_intersect(list_intersect(u, ha), hb)) AS DOUBLE)
         |              / CAST(len(u) AS DOUBLE), 6) AS j,
         |        CASE WHEN len(u) < 16 THEN CAST(len(u) AS DOUBLE)
         |             ELSE ROUND(${15.0 * 1000000007.0} / CAST(u[len(u)] AS DOUBLE), 6)
         |        END AS union_est
         |      FROM pr)
         |SELECT lang_a, lang_b, n_union_sketch, j, union_est,
         |       ROUND(j * union_est, 6) AS inter_est
         |FROM e ORDER BY lang_a, lang_b""".stripMargin,
    // q108: distinct (user, day) first, per-user min day = cohort, then
    // cohort sizes and per-offset activity — `//` on positive epoch
    // micros matches Spark's `div` exactly
    "q108_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |              epoch_us(ts) // 86400000000 AS d FROM events),
        |f AS (SELECT u, MIN(d) AS cohort_day FROM ud GROUP BY u),
        |sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
        |       FROM f GROUP BY cohort_day),
        |a AS (SELECT f.cohort_day, ud.d - f.cohort_day AS day_offset,
        |        CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM ud JOIN f USING (u) GROUP BY 1, 2)
        |SELECT a.cohort_day, a.day_offset, sz.cohort_n, a.n_active,
        |       ROUND(CAST(a.n_active AS DOUBLE) / CAST(sz.cohort_n AS DOUBLE), 6)
        |         AS retention
        |FROM a JOIN sz USING (cohort_day) ORDER BY cohort_day, day_offset""".stripMargin,
    // q111: the oracle counts the 200 real events per (hour, type) —
    // no late copies (their drop is the pinned semantic), no pusher
    // (its window never closes under the final watermark)
    "q111_streaming_watermark" ->
      """SELECT (event_id * 180000000) // 3600000000 AS hr, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events WHERE event_id < 200
        |GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,
    // q110: the oracle reads the ORIGINAL table — matching the Spark
    // side's export→import aggregate proves the JSONL loop lossless
    "q110_jsonl_roundtrip" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // q118/q119: the oracle aggregates the ORIGINAL table — the engine
    // side aggregates after a csv/orc write→read loop, so matching hashes
    // prove the loop lossless (quoting/escape/multi-line for CSV; nested
    // array-of-float bits for ORC).
    "q118_csv_roundtrip" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |       CAST(SUM(length('x,"y"' || chr(10) || text)) AS BIGINT) AS n_gnarly
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q119_orc_roundtrip" ->
      """SELECT label, i AS pos, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(embedding[CAST(i+1 AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 4) + 0.0 AS m
        |FROM embeddings, range(64) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    // q109: the twin construction replayed digit-for-digit (integer LCG
    // jitter, same double op order, REAL cast), then q82's multi-table
    // bucket→pair→cosine chain at the near-dup threshold
    "q109_planted_neardup" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
         |twin AS (SELECT b.vec_id + 10000000 AS vec_id,
         |           list_transform(range(64), j -> CAST(
         |             CAST(b.embedding[j+1] AS DOUBLE) * (1.0 + 0.4 *
         |               (CAST((1103515245*(b.vec_id*64 + j) + 12345) % 2001
         |                     - 1000 AS DOUBLE) / 1000.0))
         |             AS REAL)) AS embedding
         |         FROM base b),
         |u AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
         |b AS (SELECT vec_id AS id, embedding AS e, t.tbl AS tbl,
         |             ${sqlSrpBucket("embedding", off = "t.tbl*8")} AS bucket
         |      FROM u, (SELECT range AS tbl FROM range(4)) t),
         |ok AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket
         |       HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.tbl, b.bucket FROM b JOIN ok USING (tbl, bucket)),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.9 ORDER BY id_a, id_b""".stripMargin
    },
    // q89: the histogram-percentile chain replayed — per-lang cumulative
    // counts over distinct lengths, bracketing values per fraction, one
    // p·(n−1) interpolation (identical arithmetic to the Spark side)
    "q89_length_percentiles" -> {
      val ps = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75, "95" -> 0.95)
      val brackets = ps.map { case (nm, p) =>
        s"""MIN(CASE WHEN cum >= FLOOR($p*(n-1))+1 THEN v END) AS lo$nm,
           |        MIN(CASE WHEN cum >= CEIL($p*(n-1))+1 THEN v END) AS hi$nm""".stripMargin
      }.mkString(",\n        ")
      val outs = ps.map { case (nm, p) =>
        s"ROUND(lo$nm + ($p*(n-1) - FLOOR($p*(n-1))) * (hi$nm - lo$nm), 4) AS p$nm"
      }.mkString(",\n       ")
      s"""WITH h AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS c
         |           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (SELECT lang, v, c,
         |          SUM(c) OVER (PARTITION BY lang ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         |          SUM(c) OVER (PARTITION BY lang) AS n FROM h),
         |a AS (SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
         |        $brackets
         |      FROM cum GROUP BY lang)
         |SELECT lang, n,
         |       $outs
         |FROM a ORDER BY lang""".stripMargin
    },
    "q26_langid" -> {
      val langs = TextAnalysis.languages // sorted ascending
      val hits = langs.map { l =>
        s"CAST(len(list_filter(string_split(text, ' '), tk -> lower(tk) IN ${sqlInList(TextAnalysis.stopwordList(l))})) AS INTEGER) AS h_$l"
      }.mkString(",\n  ")
      val greatest = s"GREATEST(${langs.map("h_" + _).mkString(", ")})"
      val cases = langs.init.map(l => s"WHEN h_$l = g THEN '$l'").mkString(" ")
      s"""WITH h AS (SELECT doc_id, $hits FROM documents),
         |g AS (SELECT doc_id, ${langs.map("h_" + _).mkString(", ")}, $greatest AS g FROM h)
         |SELECT doc_id, CASE WHEN g = 0 THEN 'und' $cases ELSE '${langs.last}' END AS lang_pred
         |FROM g ORDER BY doc_id""".stripMargin
    },
    "q27_fingerprint" ->
      """SELECT doc_id, CAST(COALESCE(list_sum(list_transform(range(length(text)),
        |  i -> ascii(substr(text, CAST(i + 1 AS INTEGER), 1)) * ((i % 7) + 1))), 0) AS BIGINT) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q28_jaccard_pairs" ->
      """WITH s AS (SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents WHERE doc_id % 100 = 0),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / (len(a.toks) + len(b.toks) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) AS sim
        |      FROM s a, s b WHERE a.id < b.id)
        |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p ORDER BY id_a, id_b""".stripMargin,
    "q29_embedding_neardup" -> {
      val sim = s"${sqlDot("a.e", "b.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("b.e", "b.e")}))"
      s"""WITH s AS (SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 10 = 0),
         |p AS (SELECT a.id AS id_a, b.id AS id_b, $sim AS sim FROM s a, s b WHERE a.id < b.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p ORDER BY id_a, id_b""".stripMargin
    },
    "q33_srp_bucket" ->
      s"""SELECT vec_id, ${sqlSrpBucket("embedding")} AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    // q61: the LSH-bucketed embedding near-dup — bucket assignment (q33's
    // arithmetic), hot-bucket exclusion, in-bucket pairs, cosine >= t.
    "q61_embedding_neardup_lsh" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q113_autosized_lsh" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // nb replayed INTEGER-EXACT from COUNT(*): ceil-div via (+49)//50,
      // bit-length via the smallest k with 2^k >= buckets (shift compare,
      // no log — the libm-ceil trap nBitsFor's scaladoc documents)
      s"""WITH nbv AS (SELECT ((COUNT(*) + 49) // 50) AS buckets FROM embeddings),
         |nbx AS (SELECT CASE WHEN buckets <= 2 THEN 1
         |               ELSE (SELECT MIN(k) FROM range(1,63) s(k)
         |                     WHERE (CAST(1 AS BIGINT) << CAST(k AS INT)) >= buckets) END AS nb
         |        FROM nbv),
         |b AS (SELECT vec_id AS id, embedding AS e,
         |        CAST(list_sum(list_transform(range((SELECT nb FROM nbx)), b ->
         |          CASE WHEN list_sum(list_transform(range(64), j ->
         |                 CAST(embedding[j+1] AS DOUBLE)
         |                 * (((1103515245 * (b*64 + j) + 12345) % 2001 - 1000) / 1000.0))) >= 0
         |               THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bucket
         |      FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim, CAST((SELECT nb FROM nbx) AS INT) AS n_bits
         |FROM p WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q64_neardup_multiprobe" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // probes=2: side a is unioned with its bit-0-flipped bucket; the
      // occupancy floor drops to 1 (singletons stay reachable), DISTINCT
      // folds pairs found from both endpoints' probe sets
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) <= 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |pa AS (SELECT id, e, bucket FROM bb
         |       UNION ALL SELECT id, e, xor(bucket, 1) AS bucket FROM bb),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM pa a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q82_neardup_multitable" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // tables=4: each row hashes once per table with the table's own run
      // of the projection sequence (offset tbl*nBits); pairs join within
      // (tbl, bucket), DISTINCT folds pairs co-located in several tables
      // (their sim is the same double on both engines, so it collapses)
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e, t.tbl AS tbl,
         |             ${sqlSrpBucket("embedding", off = "t.tbl*8")} AS bucket
         |           FROM embeddings, (SELECT range AS tbl FROM range(4)) t),
         |ok AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket
         |       HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.tbl, b.bucket FROM b JOIN ok USING (tbl, bucket)),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    // q83: the zip-built grams replayed as 1-based list slicing; counts and
    // char sums stay integral, one final division per signal (identical
    // IEEE division of exact integers on both engines — no rounding needed).
    "q83_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, 2 AS n,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 1, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1])) AS gram FROM t
        |      UNION ALL
        |      SELECT doc_id, 3,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 2, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) FROM t
        |      UNION ALL
        |      SELECT doc_id, 5,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 4, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) FROM t),
        |c AS (SELECT doc_id, n, gram, COUNT(*) AS cnt, length(gram) AS glen,
        |             COUNT(*) * length(gram) AS chars
        |      FROM g GROUP BY doc_id, n, gram),
        |a AS (SELECT doc_id,
        |             MAX(CASE WHEN n = 2 THEN {'c': cnt, 'l': glen} END) AS s2,
        |             MAX(CASE WHEN n = 3 THEN {'c': cnt, 'l': glen} END) AS s3,
        |             SUM(CASE WHEN n = 5 AND cnt >= 2 THEN chars ELSE 0 END) AS d5
        |      FROM c GROUP BY doc_id),
        |nc AS (SELECT doc_id, length(COALESCE(text, '')) AS nc FROM documents)
        |SELECT nc.doc_id,
        |  CASE WHEN nc.nc = 0 THEN 0.0 ELSE COALESCE(s2.c * s2.l, 0) / CAST(nc.nc AS DOUBLE) END AS top2_frac,
        |  CASE WHEN nc.nc = 0 THEN 0.0 ELSE COALESCE(s3.c * s3.l, 0) / CAST(nc.nc AS DOUBLE) END AS top3_frac,
        |  CASE WHEN nc.nc = 0 THEN 0.0 ELSE COALESCE(d5, 0) / CAST(nc.nc AS DOUBLE) END AS dup5_frac
        |FROM nc LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q85: q83's frac pipeline -> rule list -> empty-text short-circuit,
    // exactly the q77 oracle pattern
    "q85_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, 2 AS n,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 1, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1])) AS gram FROM t
        |      UNION ALL
        |      SELECT doc_id, 3,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 2, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) FROM t
        |      UNION ALL
        |      SELECT doc_id, 5,
        |             unnest(list_transform(range(1, GREATEST(len(w) - 4, 0) + 1),
        |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) FROM t),
        |c AS (SELECT doc_id, n, gram, COUNT(*) AS cnt, length(gram) AS glen,
        |             COUNT(*) * length(gram) AS chars
        |      FROM g GROUP BY doc_id, n, gram),
        |a AS (SELECT doc_id,
        |             MAX(CASE WHEN n = 2 THEN {'c': cnt, 'l': glen} END) AS s2,
        |             MAX(CASE WHEN n = 3 THEN {'c': cnt, 'l': glen} END) AS s3,
        |             SUM(CASE WHEN n = 5 AND cnt >= 2 THEN chars ELSE 0 END) AS d5
        |      FROM c GROUP BY doc_id),
        |nc AS (SELECT doc_id, length(COALESCE(text, '')) AS nc FROM documents),
        |fr AS (SELECT nc.doc_id,
        |  COALESCE(s2.c * s2.l, 0) / CAST(nc.nc AS DOUBLE) AS t2,
        |  COALESCE(s3.c * s3.l, 0) / CAST(nc.nc AS DOUBLE) AS t3,
        |  COALESCE(d5, 0) / CAST(nc.nc AS DOUBLE) AS d5f
        |  FROM nc LEFT JOIN a USING (doc_id) WHERE nc.nc > 0),
        |r AS (SELECT doc_id, list_filter([
        |    CASE WHEN t2 > 0.20 THEN 'top2_repetitive' END,
        |    CASE WHEN t3 > 0.18 THEN 'top3_repetitive' END,
        |    CASE WHEN d5f > 0.15 THEN 'dup5_repetitive' END], x -> x IS NOT NULL) AS rs
        |  FROM fr),
        |f AS (SELECT d.doc_id,
        |        CASE WHEN d.text IS NULL OR length(d.text) = 0 THEN ['empty_text']
        |             ELSE r.rs END AS rs
        |      FROM documents d LEFT JOIN r USING (doc_id))
        |SELECT doc_id, len(rs) = 0 AS keep, COALESCE(array_to_string(rs, ','), '') AS reasons
        |FROM f ORDER BY doc_id""".stripMargin,
    "q70_chunking" ->
      """WITH t AS (SELECT doc_id, string_split_regex(COALESCE(text, ''), '\s+') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |        GREATEST(CAST(CEIL(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INTEGER), 1) AS nc FROM t),
        |c AS (SELECT doc_id, unnest(list_transform(range(nc), i -> {
        |        'cid': i,
        |        'txt': array_to_string(toks[CAST(i*24 + 1 AS INTEGER):CAST(i*24 + 32 AS INTEGER)], ' '),
        |        'nt':  LEAST(32, len(toks) - i*24)})) AS u
        |      FROM n)
        |SELECT doc_id, CAST(u.cid AS INTEGER) AS chunk_id, u.txt AS chunk_text,
        |       CAST(u.nt AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q68_decontaminate" ->
      """WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS toks FROM documents),
        |shl AS (SELECT id, CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(len(toks) - 7), i -> array_to_string(toks[i+1:i+8], ' ')) END AS shingles
        |        FROM t),
        |ev AS (SELECT DISTINCT unnest(shingles) AS sh FROM shl WHERE id % 97 = 0),
        |cs AS (SELECT id, unnest(shingles) AS sh FROM shl)
        |SELECT DISTINCT id FROM cs JOIN ev USING (sh) ORDER BY id""".stripMargin,
    "q66_bm25_topk" -> (sqlBm25(20) + "\nSELECT id, rnk, ROUND(score, 4) + 0.0 AS score FROM kwtop ORDER BY rnk"),
    // q154: the keyword-SIDECAR path must hash-match the plain scan — same
    // corpus, same scan-semantics oracle as q66, with the store's STRING
    // ids (rank ties therefore break on VARCHAR order in both engines)
    // q155: format("graft") read ≡ the collection's content (scan
    // semantics over the hydrated columns)
    "q155_dsv2_read" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 200 ORDER BY doc_id""".stripMargin,
    "q154_kwindex_bm25" -> (sqlBm25(20, idExpr = "CAST(doc_id AS VARCHAR)") +
      "\nSELECT id, rnk, ROUND(score, 4) + 0.0 AS score FROM kwtop ORDER BY rnk"),
    "q67_hybrid_rrf" -> {
      // vector side mirrors q11's cosine shape at k=50; fusion is pure
      // rank arithmetic (1/(60+rnk)), kw contribution folded first
      val cos = s"1 - (${sqlDot("e.embedding", "q.qe")} / (sqrt(${sqlDot("e.embedding", "e.embedding")}) * sqrt(${sqlDot("q.qe", "q.qe")})))"
      sqlBm25(50) + s""",
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vd AS (SELECT e.vec_id AS id, $cos AS dist
         |       FROM embeddings e, q WHERE e.vec_id <> 0),
         |vr AS (SELECT id, ROW_NUMBER() OVER (ORDER BY dist, id) AS rnk
         |       FROM vd ORDER BY dist, id LIMIT 50)
         |SELECT COALESCE(k.id, v.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + k.rnk), 0) + COALESCE(1.0 / (60 + v.rnk), 0), 6) AS rrf
         |FROM kwtop k FULL OUTER JOIN vr v ON k.id = v.id
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },
    // q157: q67's fusion replayed over the sidecar-served keyword leg —
    // the index must not change the keyword list (q154's contract), so
    // the only semantic difference is the store's STRING ids: ranks and
    // ties replay on VARCHAR order on both engines, the vector leg's
    // rank is computed on the numeric id (as in q67) then cast to join
    "q157_hybrid_rrf_indexed" -> {
      val cos = s"1 - (${sqlDot("e.embedding", "q.qe")} / (sqrt(${sqlDot("e.embedding", "e.embedding")}) * sqrt(${sqlDot("q.qe", "q.qe")})))"
      sqlBm25(50, idExpr = "CAST(doc_id AS VARCHAR)") + s""",
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vd AS (SELECT e.vec_id AS nid, $cos AS dist
         |       FROM embeddings e, q WHERE e.vec_id <> 0),
         |vr AS (SELECT CAST(nid AS VARCHAR) AS id,
         |              ROW_NUMBER() OVER (ORDER BY dist, nid) AS rnk
         |       FROM vd ORDER BY dist, nid LIMIT 50)
         |SELECT COALESCE(k.id, v.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + k.rnk), 0) + COALESCE(1.0 / (60 + v.rnk), 0), 6) AS rrf
         |FROM kwtop k FULL OUTER JOIN vr v ON k.id = v.id
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },
    // q161: the "simple" analyzer replayed in DuckDB — the SAME punctuated
    // corpus derivation (`<<w1, w2, ..., wn...`), the SAME strip rule
    // (lowercase, \s+ split, trim non-[letter/digit] edges, drop empties),
    // then sqlBm25's verbatim fold; the raw query terms "Hash!"/"JOIN,"/
    // "(stream)" normalize to hash/join/stream on the engine side, so the
    // oracle's term list is the analyzed form
    "q161_kwindex_analyzer" -> (sqlBm25(20, tokCte = Some(sqlBm25SimpleToks())) +
      "\nSELECT id, rnk, ROUND(score, 4) + 0.0 AS score FROM kwtop ORDER BY rnk"),
    // q162: q157's fusion oracle with the keyword leg under the analyzer
    // toks — fusion arithmetic, rank windows and VARCHAR tie-breaks are
    // q157's verbatim
    "q162_hybrid_analyzer" -> {
      val cos = s"1 - (${sqlDot("e.embedding", "q.qe")} / (sqrt(${sqlDot("e.embedding", "e.embedding")}) * sqrt(${sqlDot("q.qe", "q.qe")})))"
      sqlBm25(50, tokCte = Some(sqlBm25SimpleToks())) + s""",
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vd AS (SELECT e.vec_id AS nid, $cos AS dist
         |       FROM embeddings e, q WHERE e.vec_id <> 0),
         |vr AS (SELECT CAST(nid AS VARCHAR) AS id,
         |              ROW_NUMBER() OVER (ORDER BY dist, nid) AS rnk
         |       FROM vd ORDER BY dist, nid LIMIT 50)
         |SELECT COALESCE(k.id, v.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + k.rnk), 0) + COALESCE(1.0 / (60 + v.rnk), 0), 6) AS rrf
         |FROM kwtop k FULL OUTER JOIN vr v ON k.id = v.id
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },
    // q158: the one-call hybrid replayed end-to-end from the raw text —
    // the keyword leg is sqlBm25 over the collection's STRING ids (the
    // sidecar must not change it, q154's contract), the vector leg is
    // q115's hash-embed replay (integer-valued vectors → bit-equal
    // double cosine → identical ranks), fused with q67's rrf arithmetic.
    // q163: the SAME oracle — the graft_hybrid SQL table function must be
    // hash-equal to q158's Scala call (one plan, two entry surfaces)
    "q163_hybrid_sql" -> sqlHybridTextOracle,
    "q158_hybrid_text" -> sqlHybridTextOracle,
    // q159: the batch fold replayed per qid — qt(qid, term) fans the one
    // tf table out to the queries; df/dl/stats and the score expression
    // are sqlBm25's verbatim (GLOBAL df — document frequency is
    // query-independent), the fold key just widens to (qid, id)
    "q159_kwindex_bm25_batch" -> {
      val k1 = 1.2; val b = 0.75
      val qtVals = Seq(
        0 -> Seq("hash", "join", "stream"),
        1 -> Seq("vector", "table"),
        2 -> Seq("index", "hash"))
        .flatMap { case (qi, ts) => ts.map(t => s"($qi, '$t')") }.mkString(", ")
      val allTerms = Seq("hash", "join", "stream", "vector", "table", "index")
        .map(t => s"'$t'").mkString(", ")
      s"""WITH qt AS (SELECT * FROM (VALUES $qtVals) AS q(qid, term)),
         |toks AS (SELECT CAST(doc_id AS VARCHAR) AS id,
         |         unnest(string_split_regex(lower(text), '\\s+')) AS term FROM documents),
         |dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY id),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot_dl FROM dl),
         |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks
         |       WHERE term IN ($allTerms) GROUP BY id, term),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT qt.qid, tf.id,
         |    ROUND((((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1}))
         |      / (tf + $k1 * (${1 - b} + ($b * CAST(dl AS DOUBLE) * n_docs) / CAST(tot_dl AS DOUBLE))), 6) AS s
         |    FROM tf JOIN qt USING (term) JOIN dft USING (term) JOIN dl USING (id) CROSS JOIN stats),
         |kws AS (SELECT qid, id, CAST(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS score
         |        FROM sc GROUP BY qid, id),
         |kwtop AS (SELECT qid, id, score,
         |          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk FROM kws)
         |SELECT qid, id, rnk, ROUND(score, 4) + 0.0 AS score FROM kwtop
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },
    // q156: the final merged state after overwrite + append + overlapping
    // upsert through df.write.format("graft") — replayed from the raw
    // table (the %6==0 slice carries the upsert's replaced lang)
    "q156_dsv2_write" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id,
        |       CASE WHEN doc_id % 6 = 0 THEN 'xx' ELSE lang END AS lang,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q137: the min-max fusion replayed — per-list MIN/MAX over the same
    // 50-row lists, the identical (s − mn)/(mx − mn) normalization
    // (constant lists → 1), weights folded in the same written order
    "q137_hybrid_minmax" -> {
      val cos = s"1 - (${sqlDot("e.embedding", "q.qe")} / (sqrt(${sqlDot("e.embedding", "e.embedding")}) * sqrt(${sqlDot("q.qe", "q.qe")})))"
      sqlBm25(50) + s""",
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vd AS (SELECT e.vec_id AS id, 1 - ($cos) AS score
         |       FROM embeddings e, q WHERE e.vec_id <> 0),
         |vr AS (SELECT id, score FROM vd ORDER BY 1 - score, id LIMIT 50),
         |kmm AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM kwtop),
         |vmm AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM vr),
         |kn AS (SELECT id, 0.4 * (CASE WHEN mx = mn THEN 1.0
         |                              ELSE (score - mn) / (mx - mn) END) AS c0
         |       FROM kwtop, kmm),
         |vn AS (SELECT id, 0.6 * (CASE WHEN mx = mn THEN 1.0
         |                              ELSE (score - mn) / (mx - mn) END) AS c1
         |       FROM vr, vmm)
         |SELECT COALESCE(kn.id, vn.id) AS id,
         |  ROUND(COALESCE(c0, 0) + COALESCE(c1, 0), 6) + 0.0 AS fused
         |FROM kn FULL OUTER JOIN vn ON kn.id = vn.id
         |ORDER BY fused DESC, id LIMIT 20""".stripMargin
    },
    // q138: the bottom-k sample replayed — same spread hash of the key,
    // same (hash, value) sample order, same nearest-rank selection
    "q138_bottomk_quantiles" ->
      s"""WITH s AS (SELECT ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS h,
         |                  CAST(n_chars AS DOUBLE) AS v FROM documents),
         |samp AS (SELECT v FROM (SELECT v, row_number() OVER (ORDER BY h, v) AS rn
         |                        FROM s) WHERE rn <= 64),
         |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM samp),
         |n AS (SELECT COUNT(*) AS n_sample FROM samp),
         |qq AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q)
         |SELECT q, n_sample, v AS est
         |FROM qq CROSS JOIN n
         |JOIN ranked ON ranked.rn = GREATEST(1, CAST(CEIL(q * n_sample) AS BIGINT))
         |ORDER BY q""".stripMargin,
    "q65_label_centroid" ->
      """SELECT label, i AS pos,
        |  -- + 0.0 normalizes IEEE -0.0 (Spark's BigDecimal round drops
        |  -- the sign of rounded-to-zero negatives; DuckDB keeps it)
        |  ROUND(CAST(SUM(CAST(embedding[CAST(i+1 AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 4) + 0.0 AS m
        |FROM embeddings, range(64) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    // NOTE: byte-vs-codepoint parity of mean_byte relies on the fixture
    // text being ASCII (driver-generated, fixed); non-ASCII corpora would
    // need a bytes-based oracle (DuckDB lacks per-byte access on BLOB).
    "q34_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |ROUND(CAST(list_sum(list_transform(range(length(text)),
        |  i -> ascii(substr(text, CAST(i+1 AS INTEGER), 1)))) AS DOUBLE) / length(text), 4) AS mean_byte
        |FROM documents ORDER BY media_id""".stripMargin,
    // q123: the real-PNG decode replayed from the shared pixel formula
    // (PNG is lossless on 8-bit RGB, so decode∘encode = identity and the
    // formula IS the decoded raster). Integer pixel sums are exact in
    // both engines; ONE division by the fixed per-image pixel count
    // before ROUND(4) — group size never grows with the corpus.
    "q123_image_decode" ->
      """WITH px AS (
        |  SELECT d.doc_id, x.i AS x, y.i AS y
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(40)) AS i) x
        |  CROSS JOIN (SELECT unnest(range(16)) AS i) y
        |  WHERE x.i < 16 + (d.doc_id % 4) * 8)
        |SELECT doc_id AS media_id,
        |  CAST(16 + (doc_id % 4) * 8 AS INTEGER) AS width,
        |  CAST(16 AS INTEGER) AS height,
        |  ROUND(CAST(SUM((7 * doc_id + 3 * x + 5 * y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_r,
        |  ROUND(CAST(SUM((11 * doc_id + 13 * x + y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_g,
        |  ROUND(CAST(SUM((doc_id + x + 17 * y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_b
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // q132: the real-WAV decode replayed from the shared PCM sample
    // formula (PCM in a WAV container is lossless, so the formula IS the
    // decoded signal). Integer sums of squares are exact in both
    // engines; ONE division by the fixed per-clip frame count, then an
    // IEEE sqrt (correctly rounded in both) before ROUND(4). SUM is cast
    // to BIGINT — DuckDB integer SUM lands as HUGEINT/float64 otherwise.
    "q132_audio_decode" ->
      """WITH fr AS (
        |  SELECT d.doc_id, t.i AS t
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(2000)) AS i) t
        |  WHERE t.i < 800 + (d.doc_id % 4) * 400)
        |SELECT doc_id AS media_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(2 AS INTEGER) AS channels,
        |  CAST(800 + (doc_id % 4) * 400 AS BIGINT) AS n_frames,
        |  CAST((800 + (doc_id % 4) * 400) // 8 AS BIGINT) AS duration_ms,
        |  ROUND(SQRT(CAST(CAST(SUM(((3 * doc_id + 7 * t) % 2001 - 1000)
        |      * ((3 * doc_id + 7 * t) % 2001 - 1000)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*)), 4) AS rms_l,
        |  ROUND(SQRT(CAST(CAST(SUM(((5 * doc_id + 11 * t) % 2001 - 1000)
        |      * ((5 * doc_id + 11 * t) % 2001 - 1000)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*)), 4) AS rms_r
        |FROM fr GROUP BY doc_id ORDER BY media_id""".stripMargin,
    "q35_tumbling_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws, event_type,
        |COUNT(*) AS cnt,
        |CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q36_region_revenue" ->
      """SELECT n_name,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q37_salted_join_agg" ->
      """SELECT c_mktsegment,
        |CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total,
        |COUNT(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q62_bucketed_join_revenue" ->
      """SELECT o_orderpriority,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q44_sql_function_api" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
         |d AS (SELECT e.vec_id AS vec_id, ${sqlL2("e.embedding", "q.qe")} AS dist_raw
         |      FROM embeddings e, q WHERE e.vec_id <> 1)
         |SELECT vec_id, ROUND(dist_raw, 4) + 0.0 AS dist FROM d
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin,
    "q49_redact" ->
      """SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS masked
        |FROM events ORDER BY event_id""".stripMargin,
    "q50_repetition_ratio" ->
      """SELECT doc_id,
        |ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 4) AS distinct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q46_full_outer" ->
      """SELECT COALESCE(n_name, '<none>') AS nation, COALESCE(n_cust, 0) AS n_cust
        |FROM nation FULL OUTER JOIN
        |  (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |  ON n_nationkey = c_nationkey
        |ORDER BY nation""".stripMargin,
    "q47_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |COUNT(*) AS cnt,
        |CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q48_pivot" ->
      """SELECT lang,
        |COUNT(CASE WHEN source = 'src0' THEN 1 END) AS src0,
        |COUNT(CASE WHEN source = 'src1' THEN 1 END) AS src1,
        |COUNT(CASE WHEN source = 'src2' THEN 1 END) AS src2,
        |COUNT(CASE WHEN source = 'src3' THEN 1 END) AS src3
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q45_corpus_stats" ->
      """SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS median_chars,
        |ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
        |COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q43_brand_revenue" ->
      """SELECT p_brand,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_retail,
        |COUNT(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q38_set_ops" ->
      """SELECT
        |(SELECT COUNT(*) FROM (SELECT doc_id FROM documents WHERE lang = 'en'
        |  EXCEPT SELECT doc_id FROM documents WHERE source = 'src0')) AS n_except,
        |(SELECT COUNT(*) FROM (SELECT doc_id FROM documents WHERE lang = 'en'
        |  INTERSECT SELECT doc_id FROM documents WHERE source = 'src0')) AS n_intersect""".stripMargin,
    "q39_normalize" ->
      """SELECT doc_id,
        |trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM r WHERE rn % 10 = 1 ORDER BY doc_id""".stripMargin,
    "q42_token_packing" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |  SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT doc_id, lang, CAST((cum - n_tok) // 512 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "q40_update_coalesce" ->
      """SELECT c.doc_id AS doc_id, COALESCE(u.lang, c.lang) AS lang,
        |COALESCE(u.source, c.source) AS source, c.n_chars AS n_chars
        |FROM documents c LEFT JOIN
        |  (SELECT doc_id, 'xx' AS lang, CAST(NULL AS VARCHAR) AS source
        |   FROM documents WHERE doc_id % 7 = 0) u
        |  ON c.doc_id = u.doc_id
        |ORDER BY doc_id""".stripMargin,
    // sliding window starts are the two 30-min-aligned marks covering the
    // event (epoch-aligned, matching Spark's window() origin)
    "q51_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |x AS (SELECT event_type, unnest([
        |        (us // 1800000000) * 1800000000 - 1800000000,
        |        (us // 1800000000) * 1800000000]) AS ws FROM e)
        |SELECT ws, event_type, COUNT(*) AS cnt FROM x
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "q52_vocab_topk" ->
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    "q53_ntile_bins" ->
      """WITH b AS (SELECT lang, n_chars,
        |  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INTEGER) AS bin
        |  FROM documents)
        |SELECT lang, bin, COUNT(*) AS cnt, MAX(n_chars) AS max_chars
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "q56_distinctive_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |        CAST(row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term) AS INTEGER) AS rnk
        |      FROM tf JOIN df ON tf.term = df.term)
        |SELECT doc_id, rnk, term, ROUND(CAST(tf AS DOUBLE) / df, 4) AS score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q57_asof_prev_view" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
        |FROM events QUALIFY event_type = 'click' ORDER BY event_id""".stripMargin,
    "q58_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE COALESCE(list_sum(list_transform(range(length(CAST(doc_id AS VARCHAR))),
        |  i -> ascii(substr(CAST(doc_id AS VARCHAR), CAST(i + 1 AS INTEGER), 1))
        |       * (((i * 131) % 997) + 1))), 0) % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    "q59_length_tail_clip" ->
      """WITH st AS (SELECT lang, ROUND(quantile_cont(n_chars, 0.05), 4) AS p05,
        |                   ROUND(quantile_cont(n_chars, 0.95), 4) AS p95
        |            FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang AS lang, n_chars FROM documents d JOIN st ON d.lang = st.lang
        |WHERE n_chars < p05 OR n_chars > p95
        |ORDER BY doc_id""".stripMargin,
    // q30/q31: the dedup pipelines use the engine-portable StrHash
    // (graft.expressions.StrHash), so the ENTIRE signature pipeline —
    // shingling, hashing, permutations, banding, bucketing — replays in
    // DuckDB. p = 2^31−1; perm_k = ((k·1103515245 + 12345) mod (p−1)) + 1,
    // ((k·69069 + 362437) mod p), identical constants to Dedup.permA/B.
    "q30_minhash_candidates" -> {
      val P = 2147483647L
      s"""WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS toks
         |           FROM documents WHERE doc_id % 10 = 0),
         |sh AS (SELECT id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END) AS sh
         |       FROM t),
         |hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
         |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM sh),
         |sig AS (SELECT id, k,
         |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
         |        FROM hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
         |band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM sig GROUP BY id, k // 2),
         |big AS (SELECT band, rws FROM band GROUP BY band, rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM band a JOIN band b ON a.band = b.band AND a.rws = b.rws AND a.id < b.id
         |         LEFT JOIN big ON big.band = a.band AND big.rws = a.rws
         |         WHERE big.band IS NULL)
         |SELECT id_a, id_b FROM pair ORDER BY id_a, id_b""".stripMargin
    },
    "q31_simhash" -> {
      val P = 2147483647L
      s"""WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tk
         |           FROM documents WHERE doc_id % 10 = 0),
         |hh AS (SELECT doc_id, COALESCE(list_sum(list_transform(range(length(tk)),
         |         i -> ascii(substr(tk, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM t),
         |b AS (SELECT doc_id, j,
         |        SUM(CASE WHEN (((((j * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((j * 69069 + 362437) % $P)) % $P) * 2 >= $P
         |            THEN 1 ELSE -1 END) AS s
         |      FROM hh, (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j),
         |v AS (SELECT doc_id,
         |        SUM(CASE WHEN s > 0 THEN
         |          CASE WHEN j = 63 THEN -9223372036854775808 ELSE (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) END
         |          ELSE 0 END) AS sh
         |      FROM b GROUP BY doc_id)
         |SELECT doc_id, CAST(sh AS BIGINT) AS simhash FROM v ORDER BY doc_id""".stripMargin
    },
    // q54: replays the WHOLE near-dedup pipeline — exact pre-collapse
    // (text groups fold to their min id; the other members drop
    // unconditionally), then signatures, banding, bucket join, Jaccard
    // verification (exact: integer set sizes, one IEEE division on both
    // engines), keep-min-id anti join. The collapse is replayed so the
    // oracle matches the implementation's cap semantics on ANY data, not
    // only on corpora whose buckets stay under maxBucketSize.
    "q54_near_dedup" -> {
      val P = 2147483647L
      s"""WITH rep AS (SELECT MIN(doc_id) AS id, text FROM documents
         |             WHERE text IS NOT NULL GROUP BY text),
         |nonrep AS (SELECT d.doc_id AS id FROM documents d
         |           JOIN rep r ON d.text = r.text WHERE d.doc_id <> r.id),
         |t AS (SELECT id, string_split_regex(text, '\\s+') AS toks FROM rep),
         |shl AS (SELECT id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS shingles
         |        FROM t),
         |sh AS (SELECT id, unnest(shingles) AS sh FROM shl),
         |hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
         |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM sh),
         |sig AS (SELECT id, k,
         |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
         |        FROM hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
         |band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM sig GROUP BY id, k // 2),
         |big AS (SELECT band, rws FROM band GROUP BY band, rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM band a JOIN band b ON a.band = b.band AND a.rws = b.rws AND a.id < b.id
         |         LEFT JOIN big ON big.band = a.band AND big.rws = a.rws
         |         WHERE big.band IS NULL),
         |ds AS (SELECT id, list_distinct(shingles) AS dsh FROM shl),
         |drp AS (SELECT DISTINCT id_b AS id FROM pair
         |        JOIN ds x ON x.id = id_a JOIN ds y ON y.id = id_b
         |        WHERE CAST(len(list_intersect(x.dsh, y.dsh)) AS DOUBLE)
         |              / (len(x.dsh) + len(y.dsh) - len(list_intersect(x.dsh, y.dsh))) >= 0.7
         |        UNION SELECT id FROM nonrep)
         |SELECT doc_id FROM documents LEFT JOIN drp ON doc_id = drp.id
         |WHERE drp.id IS NULL ORDER BY doc_id""".stripMargin
    },
    "q55_cube" ->
      """SELECT
        |CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE COALESCE(lang, '<null>') END AS lang,
        |CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE COALESCE(source, '<null>') END AS source,
        |CAST(GROUPING(lang) AS INTEGER) AS g_lang,
        |CAST(GROUPING(source) AS INTEGER) AS g_source,
        |COUNT(*) AS cnt FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    // q60: q32's seeded-IVF arithmetic but through the collection store —
    // string ids (the collection's id type: ties and the final ORDER BY
    // sort lexicographically) and NO self-exclusion (Chroma's query()
    // returns the query point itself when it is in the collection).
    "q60_collection_ivf_knn" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |e0 AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding FROM embeddings),
         |d AS (SELECT e.id AS id, e.embedding AS embedding, c.cell AS cell,
         |             ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM e0 e, c),
         |a AS (SELECT id, embedding, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT c.cell FROM c, q ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell LIMIT 2),
         |cand AS (SELECT a.id AS id, a.embedding AS embedding FROM a
         |         WHERE a.cell IN (SELECT cell FROM pc)),
         |dd AS (SELECT id, ${sqlCos("cand.embedding", "q.qe")} AS dist_raw FROM cand, q)
         |-- + 0.0 normalizes IEEE -0.0 on the self-match row (DuckDB's ROUND
         |-- keeps the sign of a rounded-to-zero negative; Spark's drops it)
         |SELECT id, ROUND(dist_raw, 4) + 0.0 AS dist FROM dd
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q126: the triple composition replayed as plain scan semantics —
    // seeded assignment (q60 shape), probe 3 cells for vec 2's query,
    // then the contains + lang filters on the pruned candidates, cosine
    // top-10. Both indexes only confine IO; the oracle proves composition
    // preserves that.
    "q126_ivf_docindex_where" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |e0 AS (SELECT CAST(e.vec_id AS VARCHAR) AS id, e.embedding, d.text, d.lang
         |       FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         |dd0 AS (SELECT e.id AS id, e.embedding AS embedding, e.text AS text,
         |              e.lang AS lang, c.cell AS cell,
         |              ${sqlL2("e.embedding", "c.ce")} AS cd
         |       FROM e0 e, c),
         |a AS (SELECT id, embedding, text, lang, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cd, cell) AS rn FROM dd0)
         |      WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2),
         |pc AS (SELECT c.cell FROM c, q ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell LIMIT 3),
         |cand AS (SELECT a.id AS id, a.embedding AS embedding, a.lang AS lang FROM a
         |         WHERE a.cell IN (SELECT cell FROM pc)
         |           AND contains(a.text, 'vector table')
         |           AND a.lang IN ('en', 'fr', 'es')),
         |dd AS (SELECT id, lang, ${sqlCos("cand.embedding", "q.qe")} AS dist_raw FROM cand, q)
         |SELECT id, ROUND(dist_raw, 4) + 0.0 AS dist, lang FROM dd
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q131: the FITTED embedder replayed from raw text — fit (per-doc
    // distinct tokens → df → top-32 vocab by (df DESC, t ASC) → idfQ =
    // round(1000·(ln((N+1)/(df+1))+1)) → signs = parity of the spread of
    // strHash(t)·(j+1)+j), per-occurrence Σ idfQ·sign corpus/query
    // embedding, lang-filtered squared-L2 top-8 with (dist, id) ties.
    "q131_fitted_embedder" -> {
      val th = sqlStrHash("v.t")
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |dtok AS (SELECT doc_id, unnest(list_distinct(list_filter(
         |           string_split_regex(lower(text), '\\s+'), x -> length(x) > 0))) AS t
         |         FROM documents),
         |dfreq AS (SELECT t, COUNT(*) AS c FROM dtok GROUP BY t),
         |vocab AS (SELECT t, CAST(ROUND(1000 * (LN((n + 1.0) / (c + 1.0)) + 1.0)) AS BIGINT) AS w
         |          FROM dfreq, nn ORDER BY c DESC, t LIMIT 32),
         |axes AS (SELECT unnest(range(16)) AS j),
         |signs AS MATERIALIZED (SELECT v.t, v.w, a.j,
         |          CASE WHEN (((($th * (a.j + 1) + a.j) % 2147483647)
         |                      * 2654435761) % 1000000007) % 2 = 0
         |               THEN 1 ELSE -1 END AS s
         |          FROM vocab v CROSS JOIN axes a),
         |toks AS (SELECT doc_id, tm AS t FROM
         |           (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |            FROM documents) WHERE length(tm) > 0),
         |comp AS (SELECT k.doc_id, g.j, SUM(g.w * g.s) AS val
         |         FROM toks k JOIN signs g ON g.t = k.t GROUP BY k.doc_id, g.j),
         |grid AS (SELECT d.doc_id, a.j
         |         FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN axes a),
         |vecs AS (SELECT g.doc_id, list(CAST(COALESCE(c2.val, 0) AS DOUBLE) ORDER BY g.j) AS v
         |         FROM grid g LEFT JOIN comp c2 ON c2.doc_id = g.doc_id AND c2.j = g.j
         |         GROUP BY g.doc_id),
         |qt AS (SELECT * FROM (VALUES (0, 'vector database search index'),
         |                             (1, 'streaming join throughput')) AS q(qid, qtext)),
         |qtoks AS (SELECT qid, tm AS t FROM
         |            (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm
         |             FROM qt) WHERE length(tm) > 0),
         |qcomp AS (SELECT k.qid, g.j, SUM(g.w * g.s) AS val
         |          FROM qtoks k JOIN signs g ON g.t = k.t GROUP BY k.qid, g.j),
         |qgrid AS (SELECT qq.qid, a.j FROM (SELECT DISTINCT qid FROM qt) qq CROSS JOIN axes a),
         |qvecs AS (SELECT g.qid, list(CAST(COALESCE(c2.val, 0) AS DOUBLE) ORDER BY g.j) AS qv
         |          FROM qgrid g LEFT JOIN qcomp c2 ON c2.qid = g.qid AND c2.j = g.j
         |          GROUP BY g.qid),
         |cd AS (SELECT q.qid, v.doc_id, d.lang, ${sqlL2("v.v", "q.qv")} AS dist_raw
         |       FROM vecs v JOIN documents d ON d.doc_id = v.doc_id
         |       CROSS JOIN qvecs q WHERE d.lang IN ('en', 'es')),
         |r AS (SELECT qid, doc_id, lang, dist_raw, ROW_NUMBER() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk
         |      FROM cd)
         |SELECT qid, rnk, CAST(doc_id AS VARCHAR) AS id,
         |       ROUND(dist_raw, 4) + 0.0 AS dist, lang
         |FROM r WHERE rnk <= 8 ORDER BY qid, rnk""".stripMargin
    },
    // q134: the post-REFIT state replayed from scratch — the oracle fits
    // ONLY the final model (full corpus, dim 12, vocab 24, the exact
    // integer pipeline of q131) and never sees the half-corpus model the
    // engine hydrated with: the replay can only match if refit()'s
    // rewrite replaced every vector the old model wrote.
    "q134_refit_embedder" -> {
      val th = sqlStrHash("v.t")
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |dtok AS (SELECT doc_id, unnest(list_distinct(list_filter(
         |           string_split_regex(lower(text), '\\s+'), x -> length(x) > 0))) AS t
         |         FROM documents),
         |dfreq AS (SELECT t, COUNT(*) AS c FROM dtok GROUP BY t),
         |vocab AS (SELECT t, CAST(ROUND(1000 * (LN((n + 1.0) / (c + 1.0)) + 1.0)) AS BIGINT) AS w
         |          FROM dfreq, nn ORDER BY c DESC, t LIMIT 24),
         |axes AS (SELECT unnest(range(12)) AS j),
         |signs AS MATERIALIZED (SELECT v.t, v.w, a.j,
         |          CASE WHEN (((($th * (a.j + 1) + a.j) % 2147483647)
         |                      * 2654435761) % 1000000007) % 2 = 0
         |               THEN 1 ELSE -1 END AS s
         |          FROM vocab v CROSS JOIN axes a),
         |toks AS (SELECT doc_id, tm AS t FROM
         |           (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |            FROM documents) WHERE length(tm) > 0),
         |comp AS (SELECT k.doc_id, g.j, SUM(g.w * g.s) AS val
         |         FROM toks k JOIN signs g ON g.t = k.t GROUP BY k.doc_id, g.j),
         |grid AS (SELECT d.doc_id, a.j
         |         FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN axes a),
         |vecs AS (SELECT g.doc_id, list(CAST(COALESCE(c2.val, 0) AS DOUBLE) ORDER BY g.j) AS v
         |         FROM grid g LEFT JOIN comp c2 ON c2.doc_id = g.doc_id AND c2.j = g.j
         |         GROUP BY g.doc_id),
         |qt AS (SELECT * FROM (VALUES (0, 'vector database search index'),
         |                             (1, 'streaming join throughput')) AS q(qid, qtext)),
         |qtoks AS (SELECT qid, tm AS t FROM
         |            (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm
         |             FROM qt) WHERE length(tm) > 0),
         |qcomp AS (SELECT k.qid, g.j, SUM(g.w * g.s) AS val
         |          FROM qtoks k JOIN signs g ON g.t = k.t GROUP BY k.qid, g.j),
         |qgrid AS (SELECT qq.qid, a.j FROM (SELECT DISTINCT qid FROM qt) qq CROSS JOIN axes a),
         |qvecs AS (SELECT g.qid, list(CAST(COALESCE(c2.val, 0) AS DOUBLE) ORDER BY g.j) AS qv
         |          FROM qgrid g LEFT JOIN qcomp c2 ON c2.qid = g.qid AND c2.j = g.j
         |          GROUP BY g.qid),
         |cd AS (SELECT q.qid, v.doc_id, d.lang, ${sqlL2("v.v", "q.qv")} AS dist_raw
         |       FROM vecs v JOIN documents d ON d.doc_id = v.doc_id
         |       CROSS JOIN qvecs q WHERE d.lang IN ('en', 'fr')),
         |r AS (SELECT qid, doc_id, lang, dist_raw, ROW_NUMBER() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk
         |      FROM cd)
         |SELECT qid, rnk, CAST(doc_id AS VARCHAR) AS id,
         |       ROUND(dist_raw, 4) + 0.0 AS dist, lang
         |FROM r WHERE rnk <= 6 ORDER BY qid, rnk""".stripMargin
    },
    // q130: the refresh→compact lifecycle must serve EXACTLY the answers
    // a fresh build serves — q126's replay verbatim (same final corpus,
    // same seed assignment, same probes/filters): index maintenance is
    // answer-invariant by construction, and this pins it.
    "q130_index_compaction_knn" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |e0 AS (SELECT CAST(e.vec_id AS VARCHAR) AS id, e.embedding, d.text, d.lang
         |       FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         |dd0 AS (SELECT e.id AS id, e.embedding AS embedding, e.text AS text,
         |              e.lang AS lang, c.cell AS cell,
         |              ${sqlL2("e.embedding", "c.ce")} AS cd
         |       FROM e0 e, c),
         |a AS (SELECT id, embedding, text, lang, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cd, cell) AS rn FROM dd0)
         |      WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2),
         |pc AS (SELECT c.cell FROM c, q ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell LIMIT 3),
         |cand AS (SELECT a.id AS id, a.embedding AS embedding, a.lang AS lang FROM a
         |         WHERE a.cell IN (SELECT cell FROM pc)
         |           AND contains(a.text, 'vector table')
         |           AND a.lang IN ('en', 'fr', 'es')),
         |dd AS (SELECT id, lang, ${sqlCos("cand.embedding", "q.qe")} AS dist_raw FROM cand, q)
         |SELECT id, ROUND(dist_raw, 4) + 0.0 AS dist, lang FROM dd
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q125: seeded IVF through the REFRESHED index — identical replay
    // discipline to q60 over the FINAL corpus (the refresh's assignment
    // must equal a full build's: argmin-L2 against the same seed
    // centroids), probe 3 cells for vec 1's query, label prefilter on
    // the pruned candidates, filtered cosine top-10.
    "q125_ivf_refresh_knn" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |e0 AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding, label FROM embeddings),
         |d AS (SELECT e.id AS id, e.embedding AS embedding, e.label AS label, c.cell AS cell,
         |             ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM e0 e, c),
         |a AS (SELECT id, embedding, label, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
         |pc AS (SELECT c.cell FROM c, q ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell LIMIT 3),
         |cand AS (SELECT a.id AS id, a.embedding AS embedding, a.label AS label FROM a
         |         WHERE a.cell IN (SELECT cell FROM pc) AND a.label IN (0, 1, 2, 3, 4)),
         |dd AS (SELECT id, label, ${sqlCos("cand.embedding", "q.qe")} AS dist_raw FROM cand, q)
         |SELECT id, ROUND(dist_raw, 4) + 0.0 AS dist, label FROM dd
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q63: replays the whole store round-trip relationally — upsert =
    // batch ∪ (base anti batch); delete = NOT (ids AND where); get = the
    // final filtered state, id-ordered (string order, the store's id type).
    "q63_collection_roundtrip" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang, n_chars
        |              FROM documents WHERE doc_id < 200),
        |ups AS (SELECT CAST(doc_id AS VARCHAR) AS id, upper(text) AS document,
        |               'xx' AS lang, n_chars
        |        FROM documents WHERE doc_id % 3 = 0 AND doc_id < 260),
        |merged AS (SELECT * FROM ups UNION ALL
        |           SELECT b.* FROM base b WHERE b.id NOT IN (SELECT id FROM ups)),
        |kept AS (SELECT * FROM merged
        |         WHERE NOT (id IN ('5', '10', '15', '20') AND n_chars > 100))
        |SELECT id, lang, n_chars, CAST(length(document) AS INTEGER) AS n_doc
        |FROM kept WHERE lang IN ('en', 'es', 'xx') ORDER BY id""".stripMargin,
    // q112: the postings-INDEX path must hash-match the plain scan — the
    // index is a superset prefilter + verbatim re-check by construction,
    // so the oracle is simply the linear-scan semantics.
    "q112_docindex_contains" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang,
        |CAST(length(text) AS INTEGER) AS n_doc
        |FROM documents WHERE contains(text, 'vector table') ORDER BY id""".stripMargin,
    // q114: the composed B7×B8 predicate through Collection.get over
    // MAP-typed metadata. The map stores n_chars as a STRING; the numeric
    // $gt literal makes the engine try_cast both sides to double, which
    // on integer-valued strings is exactly the native integer comparison
    // replayed here.
    "q114_composite_filter_get" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang,
        |CAST(n_chars AS INTEGER) AS n_chars,
        |CAST(length(text) AS INTEGER) AS n_doc
        |FROM documents
        |WHERE doc_id < 400 AND NOT lang IN ('de', 'fr')
        |  AND (n_chars > 150 OR lang = 'en')
        |  AND contains(text, 'table') AND NOT contains(text, 'slow')
        |ORDER BY id""".stripMargin,
    // q115: the server-side embedding function replayed from RAW TEXT on
    // both the storage and the query side — signed feature hashing
    // (bucket = strhash % 16, sign = parity of strhash // 16) built into
    // per-doc vectors via a dense (doc × bucket) grid, then the filtered
    // cosine top-k. Vector values are integral counts, so the engine's
    // float32 storage and this DOUBLE replay agree bit-for-bit.
    "q115_embedding_function" -> {
      val hash = sqlStrHash("tm")
      s"""WITH qt AS (SELECT * FROM (VALUES (0, 'vector database search index'),
         |                                  (1, 'streaming join throughput')) AS q(qid, qtext)),
         |toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS (SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |         FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |         GROUP BY g.doc_id),
         |qtoks AS (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk AS (SELECT qid, $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT qid, CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY qid, b),
         |qgrid AS (SELECT qq.qid, bb.b FROM (SELECT DISTINCT qid FROM qt) qq
         |          CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |qvecs AS (SELECT g.qid, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS qv
         |          FROM qgrid g LEFT JOIN qsums s ON s.qid = g.qid AND s.b = g.b
         |          GROUP BY g.qid),
         |cd AS (SELECT q.qid, v.doc_id, d.lang, ${sqlCos("v.v", "q.qv")} AS dist_raw
         |       FROM vecs v JOIN documents d ON d.doc_id = v.doc_id
         |       CROSS JOIN qvecs q WHERE d.lang IN ('en', 'es')),
         |r AS (SELECT qid, doc_id, lang, dist_raw, ROW_NUMBER() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk
         |      FROM cd)
         |SELECT qid, rnk, CAST(doc_id AS VARCHAR) AS id,
         |       ROUND(dist_raw, 4) + 0.0 AS dist, lang
         |FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },
    // q124: q115's embed replay × q112's contains semantics — the
    // engine serves the contains through the postings index (superset
    // prefilter + verbatim re-check), so scan semantics ARE the oracle;
    // restricting the corpus CTE up front is valid because a document's
    // embedding depends only on its own text.
    "q124_querytext_docindex" -> {
      val hash = sqlStrHash("tm")
      s"""WITH qt AS (SELECT * FROM (VALUES (0, 'vector database search index'),
         |                                  (1, 'streaming join throughput')) AS q(qid, qtext)),
         |d AS (SELECT doc_id, text, lang FROM documents
         |      WHERE contains(text, 'vector table')),
         |toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM d),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT doc_id FROM d) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS (SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |         FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |         GROUP BY g.doc_id),
         |qtoks AS (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk AS (SELECT qid, $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT qid, CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY qid, b),
         |qgrid AS (SELECT qq.qid, bb.b FROM (SELECT DISTINCT qid FROM qt) qq
         |          CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |qvecs AS (SELECT g.qid, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS qv
         |          FROM qgrid g LEFT JOIN qsums s ON s.qid = g.qid AND s.b = g.b
         |          GROUP BY g.qid),
         |cd AS (SELECT q.qid, v.doc_id, d.lang, ${sqlCos("v.v", "q.qv")} AS dist_raw
         |       FROM vecs v JOIN d ON d.doc_id = v.doc_id
         |       CROSS JOIN qvecs q),
         |r AS (SELECT qid, doc_id, lang, dist_raw, ROW_NUMBER() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk
         |      FROM cd)
         |SELECT qid, rnk, CAST(doc_id AS VARCHAR) AS id,
         |       ROUND(dist_raw, 4) + 0.0 AS dist, lang
         |FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },
    // q150: the full text→PQ composition replayed from raw text — q115's
    // hash-embed CTEs produce the 16-dim vectors (integral counts, so
    // float32 and DOUBLE agree bit-for-bit), then q144's per-qid PQ
    // pipeline runs OVER those vectors: seeded assignment, per-qid probe
    // choice, encode at subDim=2, per-qid luts, decimal ADC, shortlist
    // and exact-cosine rank windows, string-id tie-breaks throughout
    "q150_querytext_pq" -> {
      val hash = sqlStrHash("tm")
      s"""WITH qt AS (SELECT * FROM (VALUES (0, 'vector database search index'),
         |                                  (1, 'streaming join throughput')) AS q(qid, qtext)),
         |toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS MATERIALIZED (
         |        SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |        FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |        GROUP BY g.doc_id),
         |qtoks AS (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk AS (SELECT qid, $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT qid, CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY qid, b),
         |qgrid AS (SELECT qq.qid, bb.b FROM (SELECT DISTINCT qid FROM qt) qq
         |          CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |qvecs AS MATERIALIZED (
         |         SELECT g.qid, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS qv
         |         FROM qgrid g LEFT JOIN qsums s ON s.qid = g.qid AND s.b = g.b
         |         GROUP BY g.qid),
         |cct AS (SELECT CAST(doc_id AS INTEGER) AS cell, v AS ce
         |        FROM vecs WHERE doc_id BETWEEN 0 AND 7),
         |cdist AS (SELECT ve.doc_id AS doc_id, cct.cell AS cell,
         |                 ${sqlL2("ve.v", "cct.ce")} AS cd
         |          FROM vecs ve, cct),
         |asg AS (SELECT doc_id, cell FROM
         |          (SELECT doc_id, cell, row_number() OVER (PARTITION BY doc_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |pc AS (SELECT qid, cell FROM
         |         (SELECT q.qid AS qid, c.cell AS cell,
         |                 row_number() OVER (PARTITION BY q.qid
         |                                    ORDER BY ${sqlL2("c.ce", "q.qv")}, c.cell) AS rn
         |          FROM cct c, qvecs q) WHERE rn <= 2),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(ve.doc_id - 1 AS INTEGER) AS code,
         |              list_transform(range(2), j -> ve.v[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS cv
         |       FROM vecs ve, sub WHERE ve.doc_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, ve.doc_id AS doc_id,
         |              list_transform(range(2), j -> ve.v[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS rv
         |       FROM vecs ve, sub),
         |enc AS (SELECT doc_id, s, code FROM (
         |          SELECT r.doc_id AS doc_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.doc_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |qs AS (SELECT q.qid AS qid, sub.s AS s,
         |              list_transform(range(2), j -> q.qv[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS qv
         |       FROM qvecs q, sub),
         |lut AS (SELECT qs.qid AS qid, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT l.qid AS qid, e.doc_id AS doc_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.doc_id = e.doc_id
         |        JOIN lut l ON l.s = e.s AND l.code = e.code
         |        JOIN pc p ON p.qid = l.qid AND p.cell = a.cell
         |        GROUP BY l.qid, e.doc_id),
         |short AS (SELECT qid, doc_id, adc FROM
         |            (SELECT qid, doc_id, adc,
         |                    row_number() OVER (PARTITION BY qid
         |                                       ORDER BY adc, CAST(doc_id AS VARCHAR)) AS rn
         |             FROM adc) WHERE rn <= 30),
         |ref AS (SELECT sh.qid AS qid, CAST(sh.doc_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("ve.v", "q.qv")} AS dist_raw
         |        FROM short sh JOIN vecs ve ON ve.doc_id = sh.doc_id
         |        JOIN qvecs q ON q.qid = sh.qid)
         |SELECT qid, rnk, id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM
         |  (SELECT qid, id, adc, dist_raw,
         |          row_number() OVER (PARTITION BY qid ORDER BY dist_raw, id) AS rnk
         |   FROM ref) WHERE rnk <= 10
         |ORDER BY qid, rnk""".stripMargin
    },
    // q160: the both-legs-indexed hybrid replayed end to end from the raw
    // text — the ENTIRE q150 PQ construction for 'hash join stream'
    // (hash-embed → seeded assignment → probe choice → encode → lut →
    // decimal ADC → shortlist → exact-cosine refine ranks) beside the
    // BM25 fold (sqlBm25's expressions verbatim, k-prefixed CTE names to
    // avoid collisions), fused with q67's rrf arithmetic
    "q160_hybrid_text_pq" -> {
      val hash = sqlStrHash("tm")
      val k1 = 1.2; val b = 0.75
      s"""WITH qt AS (SELECT * FROM (VALUES (0, 'hash join stream')) AS q(qid, qtext)),
         |toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS MATERIALIZED (
         |        SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |        FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |        GROUP BY g.doc_id),
         |qtoks AS (SELECT qid, unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk AS (SELECT qid, $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT qid, CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY qid, b),
         |qgrid AS (SELECT qq.qid, bb.b FROM (SELECT DISTINCT qid FROM qt) qq
         |          CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |qvecs AS MATERIALIZED (
         |         SELECT g.qid, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS qv
         |         FROM qgrid g LEFT JOIN qsums s ON s.qid = g.qid AND s.b = g.b
         |         GROUP BY g.qid),
         |cct AS (SELECT CAST(doc_id AS INTEGER) AS cell, v AS ce
         |        FROM vecs WHERE doc_id BETWEEN 0 AND 7),
         |cdist AS (SELECT ve.doc_id AS doc_id, cct.cell AS cell,
         |                 ${sqlL2("ve.v", "cct.ce")} AS cd
         |          FROM vecs ve, cct),
         |asg AS (SELECT doc_id, cell FROM
         |          (SELECT doc_id, cell, row_number() OVER (PARTITION BY doc_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |pc AS (SELECT qid, cell FROM
         |         (SELECT q.qid AS qid, c.cell AS cell,
         |                 row_number() OVER (PARTITION BY q.qid
         |                                    ORDER BY ${sqlL2("c.ce", "q.qv")}, c.cell) AS rn
         |          FROM cct c, qvecs q) WHERE rn <= 2),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(ve.doc_id - 1 AS INTEGER) AS code,
         |              list_transform(range(2), j -> ve.v[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS cv
         |       FROM vecs ve, sub WHERE ve.doc_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, ve.doc_id AS doc_id,
         |              list_transform(range(2), j -> ve.v[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS rv
         |       FROM vecs ve, sub),
         |enc AS (SELECT doc_id, s, code FROM (
         |          SELECT r.doc_id AS doc_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.doc_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |qs AS (SELECT q.qid AS qid, sub.s AS s,
         |              list_transform(range(2), j -> q.qv[CAST(sub.s*2 + j + 1 AS INTEGER)]) AS qv
         |       FROM qvecs q, sub),
         |lut AS (SELECT qs.qid AS qid, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT l.qid AS qid, e.doc_id AS doc_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.doc_id = e.doc_id
         |        JOIN lut l ON l.s = e.s AND l.code = e.code
         |        JOIN pc p ON p.qid = l.qid AND p.cell = a.cell
         |        GROUP BY l.qid, e.doc_id),
         |short AS (SELECT qid, doc_id, adc FROM
         |            (SELECT qid, doc_id, adc,
         |                    row_number() OVER (PARTITION BY qid
         |                                       ORDER BY adc, CAST(doc_id AS VARCHAR)) AS rn
         |             FROM adc) WHERE rn <= 30),
         |ref AS (SELECT sh.qid AS qid, CAST(sh.doc_id AS VARCHAR) AS id,
         |               ${sqlCos("ve.v", "q.qv")} AS dist_raw
         |        FROM short sh JOIN vecs ve ON ve.doc_id = sh.doc_id
         |        JOIN qvecs q ON q.qid = sh.qid),
         |vr AS (SELECT id, rnk FROM
         |         (SELECT id, dist_raw,
         |                 row_number() OVER (ORDER BY dist_raw, id) AS rnk
         |          FROM ref) WHERE rnk <= 30),
         |ktoks AS (SELECT CAST(doc_id AS VARCHAR) AS id,
         |          unnest(string_split_regex(lower(text), '\\s+')) AS term FROM documents),
         |kdl AS (SELECT id, COUNT(*) AS dl FROM ktoks GROUP BY id),
         |kstats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot_dl FROM kdl),
         |ktf AS (SELECT id, term, COUNT(*) AS tf FROM ktoks
         |        WHERE term IN ('hash', 'join', 'stream') GROUP BY id, term),
         |kdft AS (SELECT term, COUNT(*) AS df FROM ktf GROUP BY term),
         |ksc AS (SELECT ktf.id,
         |    ROUND((((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1}))
         |      / (tf + $k1 * (${1 - b} + ($b * CAST(dl AS DOUBLE) * n_docs) / CAST(tot_dl AS DOUBLE))), 6) AS s
         |    FROM ktf JOIN kdft USING (term) JOIN kdl USING (id) CROSS JOIN kstats),
         |kkws AS (SELECT id, CAST(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS score
         |         FROM ksc GROUP BY id),
         |kwtop AS (SELECT id, rnk FROM
         |            (SELECT id, score, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk
         |             FROM kkws) WHERE rnk <= 30)
         |SELECT COALESCE(kk.id, v.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + kk.rnk), 0) + COALESCE(1.0 / (60 + v.rnk), 0), 6) + 0.0 AS rrf
         |FROM kwtop kk FULL OUTER JOIN vr v ON kk.id = v.id
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },
    // q116: MMR's greedy trace unrolled — one (red, sc, sel, picked) CTE
    // block per rank, each stage's argmax computed from the SAME candidate
    // and pairwise-sim tables the engine's incremental max-redundancy
    // walks. Selection order, tie-breaks AND scores all hash-pin.
    // MATERIALIZED is load-bearing: each stage references picked_{i-1}
    // twice and DuckDB inlines CTEs by default — unrolled over 8 ranks
    // that's 2^8 re-evaluations of the candidate scan (minutes, not ms).
    "q116_mmr_rerank" -> {
      def sim(a: String, b: String) =
        s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
      val stages = (2 to 8).map { i =>
        s"""red_$i AS (SELECT p.ai AS vec_id, MAX(p.s) AS red FROM pairs p
           |  JOIN picked_${i - 1} pk ON p.bi = pk.vec_id GROUP BY p.ai),
           |sc_$i AS (SELECT c.vec_id, (0.5 * c.simq) - (0.5 * r.red) AS sc
           |  FROM cand c JOIN red_$i r ON r.vec_id = c.vec_id
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM picked_${i - 1})),
           |sel_$i AS (SELECT vec_id, $i AS rnk, sc FROM sc_$i
           |  ORDER BY sc DESC, vec_id LIMIT 1),
           |picked_$i AS MATERIALIZED (SELECT * FROM picked_${i - 1} UNION ALL SELECT * FROM sel_$i)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (SELECT e.vec_id, e.embedding AS v, ${sim("e.embedding", "q.qe")} AS simq
         |         FROM embeddings e, q WHERE e.vec_id <> 0
         |         ORDER BY simq DESC, e.vec_id LIMIT 40),
         |pairs AS MATERIALIZED (SELECT a.vec_id AS ai, b.vec_id AS bi, ${sim("a.v", "b.v")} AS s
         |          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |picked_1 AS MATERIALIZED (SELECT vec_id, 1 AS rnk, (0.5 * simq) - (0.5 * 0.0) AS sc
         |             FROM cand ORDER BY simq DESC, vec_id LIMIT 1),
         |$stages
         |SELECT rnk, vec_id, ROUND(sc, 4) + 0.0 AS score FROM picked_8 ORDER BY rnk"""
        .stripMargin
    },
    // q133: q115's hash-embed replay feeding BOTH read shapes — the
    // plain cosine kNN (the struct form's long-form content) and q116's
    // unrolled MMR greedy trace, with STRING-id tie-breaks throughout
    // (the store keys by string id, so argmax/rank ties order by the
    // CAST id, not the numeric doc_id). MATERIALIZED per the q116
    // inlining lesson.
    "q133_mmrtext_struct" -> {
      val hash = sqlStrHash("tm")
      def sim(a: String, b: String) =
        s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
      val stages = (2 to 8).map { i =>
        s"""red_$i AS (SELECT p.ai AS id, MAX(p.s) AS red FROM pairs p
           |  JOIN picked_${i - 1} pk ON p.bi = pk.id GROUP BY p.ai),
           |sc_$i AS (SELECT c.id, (0.5 * c.simq) - (0.5 * r.red) AS sc
           |  FROM cand c JOIN red_$i r ON r.id = c.id
           |  WHERE c.id NOT IN (SELECT id FROM picked_${i - 1})),
           |sel_$i AS (SELECT id, $i AS rnk, sc FROM sc_$i
           |  ORDER BY sc DESC, id LIMIT 1),
           |picked_$i AS MATERIALIZED (SELECT * FROM picked_${i - 1} UNION ALL SELECT * FROM sel_$i)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH qt AS (SELECT 'vector database search index' AS qtext),
         |toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS MATERIALIZED (
         |  SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |  FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |  GROUP BY g.doc_id),
         |qtoks AS (SELECT unnest(string_split_regex(lower(qtext), '\\s+')) AS tm FROM qt),
         |qtk AS (SELECT $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY b),
         |qvec AS MATERIALIZED (
         |  SELECT list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY bb.b) AS qv
         |  FROM (SELECT unnest(range(16)) AS b) bb
         |  LEFT JOIN qsums s ON s.b = bb.b),
         |cand AS MATERIALIZED (
         |  SELECT CAST(v.doc_id AS VARCHAR) AS id, v.v, ${sim("v.v", "q.qv")} AS simq
         |  FROM vecs v, qvec q ORDER BY simq DESC, id LIMIT 40),
         |pairs AS MATERIALIZED (
         |  SELECT a.id AS ai, b.id AS bi, ${sim("a.v", "b.v")} AS s
         |  FROM cand a JOIN cand b ON a.id <> b.id),
         |picked_1 AS MATERIALIZED (
         |  SELECT id, 1 AS rnk, (0.5 * simq) - (0.5 * 0.0) AS sc
         |  FROM cand ORDER BY simq DESC, id LIMIT 1),
         |$stages,
         |knn AS (SELECT CAST(v.doc_id AS VARCHAR) AS id,
         |               ${sqlCos("v.v", "q.qv")} AS dist,
         |               ROW_NUMBER() OVER (ORDER BY ${sqlCos("v.v", "q.qv")},
         |                                  CAST(v.doc_id AS VARCHAR)) AS rnk
         |        FROM vecs v, qvec q)
         |SELECT CAST(p.rnk AS INTEGER) AS rnk, p.id AS mmr_id,
         |       ROUND(p.sc, 4) + 0.0 AS mmr_score,
         |       k.id AS knn_id, ROUND(k.dist, 4) + 0.0 AS knn_dist
         |FROM picked_8 p JOIN knn k ON k.rnk = p.rnk
         |ORDER BY rnk""".stripMargin
    },
    // q122: the BPE train loop unrolled — per round: adjacent-pair counts
    // over the previous vocabulary, argmax with (cnt DESC, a, b) ties,
    // then ONE left-to-right non-overlapping replace applying the merge
    // (identical semantics in both engines; see Lm.bpeTrain's scaladoc).
    // v_r and best_r are each referenced twice → MATERIALIZED (the q116
    // inlining lesson). The apply stage LEFT-JOINs its best pair: an
    // exhausted round (no pairs left — engine stops gracefully) must pass
    // the vocabulary through unchanged, not annihilate it via a cross
    // join against an empty best; the COALESCE'd empty-pair pattern
    // ('   ') can never match a single-spaced symbol string.
    "q122_bpe_train" -> {
      val stages = (1 to 5).map { r =>
        s"""p_$r AS (SELECT sp[CAST(i+1 AS INTEGER)] AS a, sp[CAST(i+2 AS INTEGER)] AS b,
           |               SUM(f) AS cnt
           |        FROM (SELECT string_split(s, ' ') AS sp, f FROM v_${r - 1}) t,
           |             range(64) ix(i)
           |        WHERE i < len(sp) - 1 GROUP BY a, b),
           |best_$r AS MATERIALIZED (SELECT a, b, cnt FROM p_$r
           |                         ORDER BY cnt DESC, a, b LIMIT 1),
           |v_$r AS MATERIALIZED (
           |  SELECT trim(replace(' ' || v.s || ' ',
           |                      ' ' || COALESCE(bb.a, '') || ' ' || COALESCE(bb.b, '') || ' ',
           |                      ' ' || COALESCE(bb.a, '') || COALESCE(bb.b, '') || ' ')) AS s, v.f
           |  FROM v_${r - 1} v LEFT JOIN best_$r bb ON TRUE)""".stripMargin
      }.mkString(",\n")
      val mergeRows = (1 to 5).map(r =>
        s"SELECT $r AS rank, a || '+' || b AS pair, CAST(cnt AS BIGINT) AS cnt FROM best_$r")
        .mkString("\nUNION ALL\n")
      s"""WITH v_0 AS MATERIALIZED (
         |  SELECT array_to_string(list_transform(range(length(w)),
         |           i -> substr(w, CAST(i+1 AS INTEGER), 1)), ' ') AS s, f
         |  FROM (SELECT w, COUNT(*) AS f
         |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |        WHERE length(w) >= 2 AND length(w) < 64 GROUP BY w)),
         |$stages
         |SELECT * FROM (
         |$mergeRows
         |UNION ALL
         |SELECT 6 AS rank, '__symbols' AS pair,
         |       CAST(SUM(f * len(string_split(s, ' '))) AS BIGINT) AS cnt FROM v_5
         |) ORDER BY rank""".stripMargin
    },
    // q128: the encode replay — the SAME ordered one-pass replaces over
    // each distinct word's character symbols (q122's apply semantics),
    // word counts and summed token counts folded per doc; docs with no
    // words keep a (0, 0) row via the left join.
    "q128_bpe_encode" -> {
      val sym0 = "array_to_string(list_transform(range(length(w)), " +
        "i -> substr(w, CAST(i+1 AS INTEGER), 1)), ' ')"
      val symN = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"))
        .foldLeft(sym0) { case (s, (a, b)) =>
          s"trim(replace(' ' || $s || ' ', ' $a $b ', ' $a$b '))"
        }
      s"""WITH ww AS (SELECT doc_id, w FROM
         |  (SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
         |   FROM documents) WHERE w <> ''),
         |enc AS (SELECT w, len(string_split($symN, ' ')) AS tok
         |        FROM (SELECT DISTINCT w FROM ww)),
         |agg AS (SELECT ww.doc_id, COUNT(*) AS n_words, SUM(e.tok) AS n_tokens
         |        FROM ww JOIN enc e ON ww.w = e.w GROUP BY ww.doc_id)
         |SELECT d.doc_id, CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
         |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // q121: the Hydrator's embedding-function route — same signed
    // feature-hash replay as q115, one query text, metadata-map ('rating'
    // wraps lang, the reference's single-key quirk) prefilter.
    "q121_hydrate_embed" -> {
      val hash = sqlStrHash("tm")
      s"""WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |              FROM documents),
         |tk AS (SELECT doc_id, $hash AS h FROM toks WHERE length(tm) > 0),
         |sums AS (SELECT doc_id, CAST(h % 16 AS INTEGER) AS b,
         |                SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |         FROM tk GROUP BY doc_id, b),
         |grid AS (SELECT dd.doc_id, bb.b FROM (SELECT DISTINCT doc_id FROM documents) dd
         |         CROSS JOIN (SELECT unnest(range(16)) AS b) bb),
         |vecs AS (SELECT g.doc_id, list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b) AS v
         |         FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.b = g.b
         |         GROUP BY g.doc_id),
         |qtoks AS (SELECT unnest(string_split_regex(lower('distributed hash join'), '\\s+')) AS tm),
         |qtk AS (SELECT $hash AS h FROM qtoks WHERE length(tm) > 0),
         |qsums AS (SELECT CAST(h % 16 AS INTEGER) AS b,
         |                 SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
         |          FROM qtk GROUP BY b),
         |qvec AS (SELECT list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY bb.b) AS qv
         |         FROM (SELECT unnest(range(16)) AS b) bb
         |         LEFT JOIN qsums s ON s.b = bb.b),
         |cd AS (SELECT v.doc_id, d.lang, ${sqlCos("v.v", "q.qv")} AS dist_raw
         |       FROM vecs v JOIN documents d ON d.doc_id = v.doc_id
         |       CROSS JOIN qvec q WHERE d.lang = 'en'),
         |r AS (SELECT doc_id, lang, dist_raw, ROW_NUMBER() OVER
         |        (ORDER BY dist_raw, CAST(doc_id AS VARCHAR)) AS rnk FROM cd)
         |SELECT 0 AS qid, rnk, CAST(doc_id AS VARCHAR) AS id,
         |       ROUND(dist_raw, 4) + 0.0 AS dist, lang AS rating
         |FROM r WHERE rnk <= 8 ORDER BY rnk""".stripMargin
    },
    // q120: fork isolation + divergence — 'src' rows are the untouched
    // base, 'fork' rows are base with the upsert applied and two ids
    // deleted.
    "q120_collection_fork" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id, text, lang
        |              FROM documents WHERE doc_id < 300),
        |ups AS (SELECT CAST(doc_id AS VARCHAR) AS id, upper(text) AS text,
        |               'xx' AS lang
        |        FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0),
        |forked AS (SELECT * FROM ups UNION ALL
        |           SELECT b.* FROM base b WHERE b.id NOT IN (SELECT id FROM ups)),
        |fkept AS (SELECT * FROM forked WHERE id NOT IN ('7', '11'))
        |SELECT 'src' AS side, id, lang, CAST(length(text) AS INTEGER) AS n_doc FROM base
        |UNION ALL
        |SELECT 'fork' AS side, id, lang, CAST(length(text) AS INTEGER) AS n_doc FROM fkept
        |ORDER BY side, id""".stripMargin,
    // q129: export→import round trip — the imported collection must equal
    // the source-side truth computed directly from the documents table.
    "q129_export_import_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang, n_chars,
        |       CAST(length(text) AS INTEGER) AS n_doc
        |FROM documents WHERE doc_id < 250 ORDER BY id""".stripMargin,
    // q117: hard negatives — nearest different-label rows per query; the
    // cosine arithmetic and (dist, id) tie-break replay exactly as in the
    // kNN oracles, with the label-mismatch predicate in the pair stage.
    "q117_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |d AS (SELECT q.qid, e.vec_id, e.label,
         |             ${sqlCos("e.embedding", "q.qv")} AS dist_raw
         |      FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlabel),
         |r AS (SELECT qid, vec_id, label, dist_raw, ROW_NUMBER() OVER
         |        (PARTITION BY qid ORDER BY dist_raw, vec_id) AS rnk FROM d)
         |SELECT qid, rnk, vec_id, ROUND(dist_raw, 4) + 0.0 AS dist, label
         |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // q80: the streaming upsert sink's semantics in SQL — within a
    // microbatch the highest `ver` wins (upsert orderCol); across batches
    // the LAST batch containing an id wins (last-writer upsert, so the
    // late old-version row in batch 3 replaces batch 1's row for id 0)
    // q127: the stream's final upsert state (latest-ver-wins over the
    // three slices) + the verbatim contains — the engine must serve it
    // through the per-batch-refreshed postings index, which can only
    // confine IO, so scan semantics are the oracle.
    "q127_streaming_indexed" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n,
        |                     COALESCE(text, '') AS doc
        |              FROM documents WHERE doc_id < 150),
        |fin AS (
        |  SELECT id, n, 's1:' || doc AS document FROM base WHERE n < 40
        |  UNION ALL SELECT id, n, 's2:' || doc FROM base WHERE n BETWEEN 40 AND 119
        |  UNION ALL SELECT id, n, 's3:' || doc FROM base WHERE n BETWEEN 120 AND 149)
        |SELECT id, CAST(length(document) AS INTEGER) AS n_doc
        |FROM fin WHERE contains(document, 'scan') ORDER BY n""".stripMargin,
    "q80_streaming_hydrate" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n,
        |                     COALESCE(text, '') AS doc
        |              FROM documents WHERE doc_id < 120),
        |src AS (
        |  SELECT id, 'b1:' || doc AS document, CAST(10 AS BIGINT) AS ver,
        |         1 AS src_batch FROM base WHERE n < 60
        |  UNION ALL SELECT id, 'b2:' || doc, 20, 2 FROM base WHERE n BETWEEN 30 AND 89
        |  UNION ALL SELECT id, 'b2r:' || doc, 21, 2 FROM base WHERE n BETWEEN 30 AND 34
        |  UNION ALL SELECT id, 'b3:' || doc, 30, 3 FROM base WHERE n BETWEEN 60 AND 119
        |  UNION ALL SELECT id, 'late:' || doc, 5, 3 FROM base WHERE n = 0),
        |inb AS (SELECT id, document, ver, src_batch,
        |          row_number() OVER (PARTITION BY id, src_batch ORDER BY ver DESC) AS rn
        |        FROM src),
        |w AS (SELECT id, document, ver, src_batch FROM inb WHERE rn = 1),
        |last AS (SELECT id, MAX(src_batch) AS mb FROM w GROUP BY id)
        |SELECT w.id, w.document, w.ver, w.src_batch FROM w
        |JOIN last ON w.id = last.id AND w.src_batch = last.mb
        |ORDER BY CAST(w.id AS BIGINT)""".stripMargin,
    // q32: replays the full seeded-IVF path — assignment (argmin L2, ties
    // to lowest cell), probe choice (2 nearest cells to the query), and
    // the exact top-k inside the pruned cells.
    "q32_ivf_knn" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |d AS (SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cell AS cell,
         |             ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM embeddings e, c),
         |a AS (SELECT vec_id, embedding, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT c.cell FROM c, q ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell LIMIT 2),
         |cand AS (SELECT a.vec_id AS vec_id, a.embedding AS embedding FROM a
         |         WHERE a.cell IN (SELECT cell FROM pc) AND a.vec_id <> 0),
         |dd AS (SELECT vec_id, ${sqlCos("cand.embedding", "q.qe")} AS dist_raw FROM cand, q)
         |SELECT vec_id, ROUND(dist_raw, 4) + 0.0 AS dist FROM dd
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin,
    // q136: the full PQ pipeline replayed — per-subspace codebooks from
    // seed rows 1..16 (code = vec_id − 1), argmin-L2 encode (ties to the
    // lowest code), the query's ADC lookup table, the order-free
    // round-to-6 DECIMAL ADC fold, the fetchN=30 shortlist, and the
    // exact-cosine re-rank — every stage value-identical to the Spark
    // side because every distance folds in element order.
    "q136_pq_adc_knn" ->
      s"""WITH sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(e.vec_id - 1 AS INTEGER) AS code,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |       FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, e.vec_id AS vec_id,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |       FROM embeddings e, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |qs AS (SELECT sub.s AS s,
         |              list_transform(range(8), j -> q.qe[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |       FROM q, sub),
         |lut AS (SELECT c.s AS s, c.code AS code, ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
         |        WHERE e.vec_id <> 0 GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT 30),
         |ref AS (SELECT sh.vec_id AS vec_id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT vec_id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM ref
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin,
    // q139: q32's seeded-IVF assignment/probe CTEs composed with q136's
    // PQ encode/lut/ADC CTEs — the ADC stage additionally confines to the
    // probed cells via the assignment join, everything else verbatim
    "q139_ivfpq_knn" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cct.cell FROM cct, q
         |       ORDER BY ${sqlL2("cct.ce", "q.qe")}, cct.cell LIMIT 2),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(e.vec_id - 1 AS INTEGER) AS code,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |       FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, e.vec_id AS vec_id,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |       FROM embeddings e, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |qs AS (SELECT sub.s AS s,
         |              list_transform(range(8), j -> q.qe[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |       FROM q, sub),
         |lut AS (SELECT c.s AS s, c.code AS code, ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
         |        JOIN asg a ON a.vec_id = e.vec_id
         |        WHERE a.cell IN (SELECT cell FROM pc) AND e.vec_id <> 0
         |        GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT 30),
         |ref AS (SELECT sh.vec_id AS vec_id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT vec_id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM ref
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin,
    // q141: the residual construction replayed — residuals as double
    // element-order folds against each row's OWN cell centroid, residual
    // codebooks from the seeds' residuals, PER-CELL query luts (q − that
    // cell's centroid), adc joined through the row's cell
    "q141_ivfpq_residual_knn" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cct.cell FROM cct, q
         |       ORDER BY ${sqlL2("cct.ce", "q.qe")}, cct.cell LIMIT 2),
         |res AS MATERIALIZED (SELECT e.vec_id AS vec_id, a.cell AS cell,
         |              list_transform(range(64), j ->
         |                CAST(e.embedding[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS rv
         |       FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
         |       JOIN cct c ON c.cell = a.cell),
         |sub AS (SELECT unnest(range(8)) AS s),
         |rcb AS (SELECT sub.s AS s, CAST(r.vec_id - 10 AS INTEGER) AS code,
         |              list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |        FROM res r, sub WHERE r.vec_id BETWEEN 10 AND 25),
         |rsub AS (SELECT sub.s AS s, r.vec_id AS vec_id,
         |               list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |        FROM res r, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rsub r JOIN rcb c ON c.s = r.s) WHERE rn = 1),
         |qres AS (SELECT p.cell AS cell,
         |                list_transform(range(64), j ->
         |                  CAST(q.qe[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                  - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS qv
         |         FROM pc p JOIN cct c ON c.cell = p.cell, q),
         |qsub AS (SELECT qres.cell AS cell, sub.s AS s,
         |                list_transform(range(8), j -> qres.qv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |         FROM qres, sub),
         |lut AS (SELECT qsub.cell AS cell, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qsub.qv", "c.cv")}, 6) AS d6
         |        FROM rcb c JOIN qsub ON qsub.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.vec_id = e.vec_id
         |        JOIN lut l ON l.cell = a.cell AND l.s = e.s AND l.code = e.code
         |        WHERE e.vec_id <> 0 GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT 30),
         |ref AS (SELECT sh.vec_id AS vec_id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT vec_id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM ref
         |ORDER BY dist_raw, vec_id LIMIT 10""".stripMargin,
    // q143: schema evolution replayed — rows written before the column
    // existed read '__pre' (NULL coalesced); the evolved column filters
    // ($eq src5) exactly like a born-with column
    "q143_schema_evolution" ->
      """WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n, source
        |           FROM documents WHERE doc_id < 200)
        |SELECT id,
        |       CASE WHEN n >= 100 THEN source ELSE '__pre' END AS src,
        |       CAST(CASE WHEN n >= 100 AND source = 'src5' THEN 1 ELSE 0 END AS BIGINT)
        |         AS matched_src5
        |FROM d ORDER BY id""".stripMargin,
    // q142: the stream-stream join replayed relationally — the streaming
    // run must emit exactly the batch interval join's pairs (inner join
    // emits each match once; the dropped late duplicate adds none).
    // Event times are event_id minutes, so the window arithmetic is
    // integer seconds on both engines.
    "q142_stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 1000),
        |l AS (SELECT user_id, event_id AS l_event, event_id * 60 AS lsec
        |      FROM e WHERE event_id % 2 = 0),
        |r AS (SELECT user_id, event_id AS r_event, event_id * 60 AS rsec
        |      FROM e WHERE event_id % 2 = 1)
        |SELECT l.user_id AS user_id, l_event, r_event
        |FROM l JOIN r ON l.user_id = r.user_id
        |              AND rsec >= lsec AND rsec <= lsec + 14400
        |ORDER BY user_id, l_event, r_event""".stripMargin,
    // q147: streaming dedup replayed — one row per original id; the
    // within-watermark dups collapse and the late dup drops, so DISTINCT
    // over the originals IS the full truth (event_type is functionally
    // determined by event_id, so DISTINCT never manufactures ambiguity)
    "q147_streaming_dedup_watermark" ->
      """SELECT DISTINCT CAST(event_id AS VARCHAR) AS id, event_type
        |FROM events WHERE event_id < 300
        |ORDER BY CAST(id AS BIGINT)""".stripMargin,
    // q146: the LEFT OUTER replay — q142's pairs plus exactly one
    // r_event = -1 row per left event with no in-interval partner
    "q146_stream_stream_left_join" ->
      """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 1000),
        |l AS (SELECT user_id, event_id AS l_event, event_id * 60 AS lsec
        |      FROM e WHERE event_id % 2 = 0),
        |r AS (SELECT user_id, event_id AS r_event, event_id * 60 AS rsec
        |      FROM e WHERE event_id % 2 = 1)
        |SELECT l.user_id AS user_id, l_event,
        |       COALESCE(r_event, -1) AS r_event
        |FROM l LEFT JOIN r ON l.user_id = r.user_id
        |                   AND rsec >= lsec AND rsec <= lsec + 14400
        |ORDER BY user_id, l_event, r_event""".stripMargin,
    // q140: q139's replay against the COLLECTION's PQ index — string ids
    // (the store keys by string), NO self-exclusion (the collection query
    // surface has none), every tie-break in string order
    "q140_collection_pq_knn" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cct.cell FROM cct, q
         |       ORDER BY ${sqlL2("cct.ce", "q.qe")}, cct.cell LIMIT 2),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(e.vec_id - 1 AS INTEGER) AS code,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |       FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, e.vec_id AS vec_id,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |       FROM embeddings e, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |qs AS (SELECT sub.s AS s,
         |              list_transform(range(8), j -> q.qe[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |       FROM q, sub),
         |lut AS (SELECT c.s AS s, c.code AS code, ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
         |        JOIN asg a ON a.vec_id = e.vec_id
         |        WHERE a.cell IN (SELECT cell FROM pc)
         |        GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM adc
         |          ORDER BY adc, CAST(vec_id AS VARCHAR) LIMIT 30),
         |ref AS (SELECT CAST(sh.vec_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM ref
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q148: both PQ dials replayed INTEGER-EXACT from COUNT(*) —
    // truncating division + LEAST/GREATEST, no float ratio (the q113
    // shift-compare discipline) — then q136's encode/lut/ADC chain under
    // the derived ksub and a shortlist cut at the derived fetch_n. All
    // cells probed, so no IVF confinement CTEs; string-id tie-breaks
    // (store surface); 40 = 4·k at k=10.
    "q148_pq_autodial_knn" ->
      s"""WITH dial AS MATERIALIZED (
         |  SELECT CAST(LEAST(256, GREATEST(16, COUNT(*) // 8)) AS INTEGER) AS ksub,
         |         CAST(LEAST(65536, GREATEST(40, COUNT(*) // 4)) AS INTEGER) AS fetch_n
         |  FROM embeddings),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS MATERIALIZED (SELECT sub.s AS s, CAST(e.vec_id - 1 AS INTEGER) AS code,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |       FROM embeddings e, sub
         |       WHERE e.vec_id BETWEEN 1 AND (SELECT ksub FROM dial)),
         |rs AS (SELECT sub.s AS s, e.vec_id AS vec_id,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |       FROM embeddings e, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |qs AS (SELECT sub.s AS s,
         |              list_transform(range(8), j -> q.qe[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |       FROM q, sub),
         |lut AS (SELECT c.s AS s, c.code AS code, ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
         |        GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM
         |            (SELECT vec_id, adc,
         |                    row_number() OVER (ORDER BY adc, CAST(vec_id AS VARCHAR)) AS rn
         |             FROM adc) WHERE rn <= (SELECT fetch_n FROM dial)),
         |ref AS (SELECT CAST(sh.vec_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist,
         |       (SELECT ksub FROM dial) AS ksub,
         |       (SELECT fetch_n FROM dial) AS fetch_n
         |FROM ref ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q145: q141's residual replay against the COLLECTION's index —
    // string ids, NO self-exclusion (q140's store-surface discipline),
    // every tie-break in string order, terminal ROUND on both floats
    "q145_collection_pq_residual_knn" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pc AS (SELECT cct.cell FROM cct, q
         |       ORDER BY ${sqlL2("cct.ce", "q.qe")}, cct.cell LIMIT 2),
         |res AS MATERIALIZED (SELECT e.vec_id AS vec_id, a.cell AS cell,
         |              list_transform(range(64), j ->
         |                CAST(e.embedding[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS rv
         |       FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
         |       JOIN cct c ON c.cell = a.cell),
         |sub AS (SELECT unnest(range(8)) AS s),
         |rcb AS (SELECT sub.s AS s, CAST(r.vec_id - 10 AS INTEGER) AS code,
         |              list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |        FROM res r, sub WHERE r.vec_id BETWEEN 10 AND 25),
         |rsub AS (SELECT sub.s AS s, r.vec_id AS vec_id,
         |               list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |        FROM res r, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rsub r JOIN rcb c ON c.s = r.s) WHERE rn = 1),
         |qres AS (SELECT p.cell AS cell,
         |                list_transform(range(64), j ->
         |                  CAST(q.qe[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                  - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS qv
         |         FROM pc p JOIN cct c ON c.cell = p.cell, q),
         |qsub AS (SELECT qres.cell AS cell, sub.s AS s,
         |                list_transform(range(8), j -> qres.qv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |         FROM qres, sub),
         |lut AS (SELECT qsub.cell AS cell, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qsub.qv", "c.cv")}, 6) AS d6
         |        FROM rcb c JOIN qsub ON qsub.s = c.s),
         |adc AS (SELECT e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.vec_id = e.vec_id
         |        JOIN lut l ON l.cell = a.cell AND l.s = e.s AND l.code = e.code
         |        GROUP BY e.vec_id),
         |short AS (SELECT vec_id, adc FROM adc
         |          ORDER BY adc, CAST(vec_id AS VARCHAR) LIMIT 30),
         |ref AS (SELECT CAST(sh.vec_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh, embeddings e, q WHERE e.vec_id = sh.vec_id)
         |SELECT id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM ref
         |ORDER BY dist_raw, id LIMIT 10""".stripMargin,
    // q149: the residual batch replayed — q144's per-qid pipeline with
    // q145's per-cell residual luts: the lut CTE is keyed (qid, cell)
    // and only carries each query's PROBED cells, so the adc join's lut
    // membership IS the probe confinement
    "q149_collection_pq_residual_batch" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT 0 AS qid, embedding AS qe FROM embeddings WHERE vec_id = 0
         |      UNION ALL
         |      SELECT 1 AS qid, embedding AS qe FROM embeddings WHERE vec_id = 17),
         |pc AS (SELECT qid, cell FROM
         |         (SELECT q.qid AS qid, c.cell AS cell,
         |                 row_number() OVER (PARTITION BY q.qid
         |                                    ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell) AS rn
         |          FROM cct c, q) WHERE rn <= 2),
         |res AS MATERIALIZED (SELECT e.vec_id AS vec_id, a.cell AS cell,
         |              list_transform(range(64), j ->
         |                CAST(e.embedding[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS rv
         |       FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
         |       JOIN cct c ON c.cell = a.cell),
         |sub AS (SELECT unnest(range(8)) AS s),
         |rcb AS (SELECT sub.s AS s, CAST(r.vec_id - 10 AS INTEGER) AS code,
         |              list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |        FROM res r, sub WHERE r.vec_id BETWEEN 10 AND 25),
         |rsub AS (SELECT sub.s AS s, r.vec_id AS vec_id,
         |               list_transform(range(8), j -> r.rv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |        FROM res r, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rsub r JOIN rcb c ON c.s = r.s) WHERE rn = 1),
         |qres AS (SELECT p.qid AS qid, p.cell AS cell,
         |                list_transform(range(64), j ->
         |                  CAST(q.qe[CAST(j + 1 AS INTEGER)] AS DOUBLE)
         |                  - CAST(c.ce[CAST(j + 1 AS INTEGER)] AS DOUBLE)) AS qv
         |         FROM pc p JOIN cct c ON c.cell = p.cell
         |         JOIN q ON q.qid = p.qid),
         |qsub AS (SELECT qres.qid AS qid, qres.cell AS cell, sub.s AS s,
         |                list_transform(range(8), j -> qres.qv[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |         FROM qres, sub),
         |lut AS (SELECT qsub.qid AS qid, qsub.cell AS cell, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qsub.qv", "c.cv")}, 6) AS d6
         |        FROM rcb c JOIN qsub ON qsub.s = c.s),
         |adc AS (SELECT l.qid AS qid, e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.vec_id = e.vec_id
         |        JOIN lut l ON l.cell = a.cell AND l.s = e.s AND l.code = e.code
         |        GROUP BY l.qid, e.vec_id),
         |short AS (SELECT qid, vec_id, adc FROM
         |            (SELECT qid, vec_id, adc,
         |                    row_number() OVER (PARTITION BY qid
         |                                       ORDER BY adc, CAST(vec_id AS VARCHAR)) AS rn
         |             FROM adc) WHERE rn <= 30),
         |ref AS (SELECT sh.qid AS qid, CAST(sh.vec_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh JOIN embeddings e ON e.vec_id = sh.vec_id
         |        JOIN q ON q.qid = sh.qid)
         |SELECT qid, rnk, id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM
         |  (SELECT qid, id, adc, dist_raw,
         |          row_number() OVER (PARTITION BY qid ORDER BY dist_raw, id) AS rnk
         |   FROM ref) WHERE rnk <= 10
         |ORDER BY qid, rnk""".stripMargin,
    // q144: the batch PQ read replayed keyed by qid — per-query probe
    // sets (partitioned row_number), per-query luts over the shared
    // codebooks, per-query shortlists and rank windows, all over ONE
    // encode (the enc CTE is query-independent)
    "q144_collection_pq_batch" ->
      s"""WITH cct AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |             FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |cdist AS (SELECT e.vec_id AS vec_id, cct.cell AS cell,
         |                 ${sqlL2("e.embedding", "cct.ce")} AS cd
         |          FROM embeddings e, cct),
         |asg AS (SELECT vec_id, cell FROM
         |          (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |                                                   ORDER BY cd, cell) AS rn
         |           FROM cdist) WHERE rn = 1),
         |q AS (SELECT 0 AS qid, embedding AS qe FROM embeddings WHERE vec_id = 0
         |      UNION ALL
         |      SELECT 1 AS qid, embedding AS qe FROM embeddings WHERE vec_id = 17),
         |pc AS (SELECT qid, cell FROM
         |         (SELECT q.qid AS qid, c.cell AS cell,
         |                 row_number() OVER (PARTITION BY q.qid
         |                                    ORDER BY ${sqlL2("c.ce", "q.qe")}, c.cell) AS rn
         |          FROM cct c, q) WHERE rn <= 2),
         |sub AS (SELECT unnest(range(8)) AS s),
         |cb AS (SELECT sub.s AS s, CAST(e.vec_id - 1 AS INTEGER) AS code,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS cv
         |       FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 16),
         |rs AS (SELECT sub.s AS s, e.vec_id AS vec_id,
         |              list_transform(range(8), j -> e.embedding[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS rv
         |       FROM embeddings e, sub),
         |enc AS (SELECT vec_id, s, code FROM (
         |          SELECT r.vec_id AS vec_id, r.s AS s, c.code AS code,
         |                 row_number() OVER (PARTITION BY r.vec_id, r.s
         |                                    ORDER BY ${sqlL2("r.rv", "c.cv")}, c.code) AS rn
         |          FROM rs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
         |qs AS (SELECT q.qid AS qid, sub.s AS s,
         |              list_transform(range(8), j -> q.qe[CAST(sub.s*8 + j + 1 AS INTEGER)]) AS qv
         |       FROM q, sub),
         |lut AS (SELECT qs.qid AS qid, c.s AS s, c.code AS code,
         |               ROUND(${sqlL2("qs.qv", "c.cv")}, 6) AS d6
         |        FROM cb c JOIN qs ON qs.s = c.s),
         |adc AS (SELECT l.qid AS qid, e.vec_id AS vec_id,
         |               CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS adc
         |        FROM enc e JOIN asg a ON a.vec_id = e.vec_id
         |        JOIN lut l ON l.s = e.s AND l.code = e.code
         |        JOIN pc p ON p.qid = l.qid AND p.cell = a.cell
         |        GROUP BY l.qid, e.vec_id),
         |short AS (SELECT qid, vec_id, adc FROM
         |            (SELECT qid, vec_id, adc,
         |                    row_number() OVER (PARTITION BY qid
         |                                       ORDER BY adc, CAST(vec_id AS VARCHAR)) AS rn
         |             FROM adc) WHERE rn <= 30),
         |ref AS (SELECT sh.qid AS qid, CAST(sh.vec_id AS VARCHAR) AS id, sh.adc AS adc,
         |               ${sqlCos("e.embedding", "q.qe")} AS dist_raw
         |        FROM short sh JOIN embeddings e ON e.vec_id = sh.vec_id
         |        JOIN q ON q.qid = sh.qid)
         |SELECT qid, rnk, id, ROUND(adc, 4) + 0.0 AS adc, ROUND(dist_raw, 4) + 0.0 AS dist FROM
         |  (SELECT qid, id, adc, dist_raw,
         |          row_number() OVER (PARTITION BY qid ORDER BY dist_raw, id) AS rnk
         |   FROM ref) WHERE rnk <= 10
         |ORDER BY qid, rnk""".stripMargin,
    // q92: the cross-frame minhash/banding chain replayed per side (the
    // q54 machinery with batch/corpus sources), exact precedence over
    // near, the matched-bucket cap mirrored
    "q92_ingest_dedup" -> {
      val P = 2147483647L
      def side(n: String, pred: String) =
        s"""${n}_t AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS toks
           |           FROM documents WHERE $pred),
           |${n}_shl AS (SELECT id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS shingles
           |        FROM ${n}_t),
           |${n}_sh AS (SELECT id, unnest(shingles) AS sh FROM ${n}_shl),
           |${n}_hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
           |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
           |       FROM ${n}_sh),
           |${n}_sig AS (SELECT id, k,
           |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
           |        FROM ${n}_hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
           |${n}_band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM ${n}_sig GROUP BY id, k // 2),
           |${n}_ds AS (SELECT id, list_distinct(shingles) AS dsh FROM ${n}_shl)""".stripMargin
      s"""WITH ${side("b", "doc_id % 5 = 0")},
         |${side("c", "doc_id % 5 <> 0")},
         |ex AS (SELECT DISTINCT b.doc_id AS bid FROM documents b JOIN documents c
         |       ON b.text = c.text AND b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
         |big AS (SELECT c.band, c.rws FROM c_band c
         |        JOIN (SELECT DISTINCT band, rws FROM b_band) bb
         |          ON c.band = bb.band AND c.rws = bb.rws
         |        GROUP BY c.band, c.rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT c.id AS cid, b.id AS bid
         |         FROM c_band c JOIN b_band b ON c.band = b.band AND c.rws = b.rws
         |         LEFT JOIN big ON big.band = c.band AND big.rws = c.rws
         |         WHERE big.band IS NULL),
         |near AS (SELECT DISTINCT bid FROM pair
         |         JOIN c_ds x ON x.id = cid JOIN b_ds y ON y.id = bid
         |         WHERE CAST(len(list_intersect(x.dsh, y.dsh)) AS DOUBLE)
         |               / (len(x.dsh) + len(y.dsh) - len(list_intersect(x.dsh, y.dsh))) >= 0.7)
         |SELECT d.doc_id AS doc_id,
         |       CASE WHEN ex.bid IS NOT NULL THEN 'dup_exact'
         |            WHEN near.bid IS NOT NULL THEN 'dup_near'
         |            ELSE 'kept' END AS verdict
         |FROM documents d LEFT JOIN ex ON ex.bid = d.doc_id
         |LEFT JOIN near ON near.bid = d.doc_id
         |WHERE d.doc_id % 5 = 0 ORDER BY doc_id""".stripMargin
    },
    // q86: the seeded-cell assignment replayed (q32's `c`/`d`/`a` CTEs),
    // then SemDeDup's keep rule — drop iff a smaller-id cell-mate reaches
    // cosine sim 0.3 (sim = 1 − the cosine DISTANCE the helper builds).
    // The cell count replays Dedup.cellsFor's integer-only dial from
    // COUNT(*) (q148 discipline) — the oracle sizes cells WITH the corpus
    // instead of pinning 16 (r12's scale-weak posture: within-cell pair
    // work is occupancy², so pinned cells are quadratic in growth)
    "q86_semdedup" ->
      s"""WITH dial AS MATERIALIZED (
         |  SELECT CAST(LEAST(65536, GREATEST(16, COUNT(*) // 250)) AS INTEGER) AS nc
         |  FROM embeddings),
         |c AS MATERIALIZED (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND (SELECT nc FROM dial) - 1),
         |d AS (SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cell AS cell,
         |             ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM embeddings e, c),
         |a AS MATERIALIZED (SELECT vec_id, embedding, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |drops AS (SELECT DISTINCT x.vec_id AS vec_id FROM a x JOIN a y
         |          ON x.cell = y.cell AND y.vec_id < x.vec_id
         |          WHERE (1 - (${sqlCos("x.embedding", "y.embedding")})) >= 0.3)
         |SELECT a.vec_id AS vec_id, a.cell AS cell,
         |       (SELECT nc FROM dial) AS nc FROM a
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.vec_id = a.vec_id)
         |ORDER BY vec_id""".stripMargin,
    // q88: eval side = label 0 capped to the first 500 ids (fixed-size
    // benchmark suite), corpus side = the rest; per-corpus-row hit count
    // and max similarity against any eval vector
    "q88_decontaminate_embedding" ->
      s"""WITH ev AS (SELECT embedding AS ev FROM embeddings
         |            WHERE label = 0 AND vec_id < 500),
         |hits AS (SELECT e.vec_id AS vec_id,
         |                (1 - (${sqlCos("e.embedding", "ev.ev")})) AS sim
         |         FROM embeddings e, ev WHERE e.label <> 0),
         |flagged AS (SELECT vec_id, sim FROM hits WHERE sim >= 0.3)
         |SELECT vec_id, COUNT(*) AS n_eval_hits, ROUND(MAX(sim), 4) + 0.0 AS max_sim
         |FROM flagged GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q71_source_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS tot FROM d GROUP BY source),
         |r AS (SELECT source, LEAST(1.0, 2000.0 * (CASE source WHEN 'src0' THEN 0.5
         |        WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 0.2 ELSE 0.0 END) / tot) AS rate
         |      FROM tot)
         |SELECT d.doc_id AS doc_id, d.source AS source, ROUND(r.rate, 4) + 0.0 AS rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE ${sqlSpreadHash("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.rate * 1e6
         |ORDER BY doc_id""".stripMargin,
    // q90: the temperature-rate chain replayed — integral token totals,
    // IEEE sqrt weights, decimal-summed normalizer, then the same
    // budget·(w/wsum)/tot parenthesization as the Spark side
    "q90_temperature_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS tot FROM d GROUP BY source),
         |ws AS (SELECT CAST(SUM(CAST(sqrt(tot) AS DECIMAL(38,18))) AS DOUBLE) AS wsum FROM tot),
         |r AS (SELECT source,
         |        CASE WHEN sqrt(tot) = 0.0 OR wsum = 0.0 THEN 0.0
         |             ELSE LEAST(1.0, 2000.0 * (sqrt(tot) / wsum) / tot) END AS rate
         |      FROM tot, ws)
         |SELECT d.doc_id AS doc_id, d.source AS source, ROUND(r.rate, 4) + 0.0 AS rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE ${sqlSpreadHash("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.rate * 1e6
         |ORDER BY doc_id""".stripMargin,
    // q91: same spread hash over the GROUP key; thresholds are the very
    // doubles the Scala side folded (spliced, not re-derived in SQL)
    "q91_group_split" ->
      s"""WITH h AS (SELECT doc_id, source,
         |             ${sqlSpreadHash("source")} % 1000000 AS hh FROM documents)
         |SELECT doc_id, source,
         |       CASE WHEN hh < ${0.6 * 1e6} THEN 'train'
         |            WHEN hh < ${(0.6 + 0.2) * 1e6} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,
    "q72_reshard" ->
      s"""WITH h AS (SELECT doc_id, ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS hh
         |           FROM documents)
         |SELECT doc_id, CAST(hh % 8 AS INTEGER) AS shard,
         |       CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS INTEGER) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin,
    // q84: the packing layout replayed — same spread hash + per-shard
    // running token sum; integral // division, HUGEINT sums cast back
    "q84_sequence_packing" ->
      s"""WITH n AS (SELECT doc_id,
         |             CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS nt,
         |             ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS hh
         |           FROM documents),
         |c AS (SELECT CAST(hh % 8 AS INTEGER) AS shard, nt,
         |             CAST(SUM(nt) OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id
         |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM n)
         |SELECT shard, CAST((cum - nt) // 2048 AS BIGINT) AS seq,
         |       COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS seq_tokens
         |FROM c GROUP BY 1, 2 ORDER BY shard, seq""".stripMargin,
    "q73_duplicate_passages" ->
      """WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT id, unnest(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(len(toks) - 4), i -> array_to_string(toks[i+1:i+5], ' ')) END) AS passage
        |       FROM t),
        |rec AS (SELECT passage, COUNT(DISTINCT id) AS n_docs FROM sh
        |        GROUP BY passage HAVING COUNT(DISTINCT id) >= 2)
        |SELECT sh.id AS doc_id, COUNT(*) AS n_dup_passages, MAX(rec.n_docs) AS max_spread
        |FROM sh JOIN rec ON sh.passage = rec.passage
        |GROUP BY sh.id ORDER BY doc_id""".stripMargin,
    "q74_incremental_hydrate" ->
      """WITH cur AS (SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang
        |             FROM documents WHERE doc_id < 200),
        |inc AS (SELECT CAST(doc_id AS VARCHAR) AS id,
        |          CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS document, lang
        |        FROM documents WHERE doc_id < 260)
        |SELECT inc.id AS id, CASE WHEN cur.id IS NULL THEN 'insert' ELSE 'update' END AS action
        |FROM inc LEFT JOIN cur ON inc.id = cur.id
        |WHERE cur.id IS NULL OR inc.document IS DISTINCT FROM cur.document
        |   OR inc.lang IS DISTINCT FROM cur.lang
        |ORDER BY id""".stripMargin,
    "q75_cluster_sample" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |d AS (SELECT e.vec_id AS vec_id, c.cell AS cell, ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM embeddings e, c),
         |a AS (SELECT vec_id, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |h AS (SELECT vec_id, cell, ${sqlSpreadHash("CAST(vec_id AS VARCHAR)")} AS hh FROM a),
         |s AS (SELECT vec_id, cell,
         |        row_number() OVER (PARTITION BY cell ORDER BY hh, vec_id) AS rn FROM h)
         |SELECT vec_id, cell FROM s WHERE rn <= 10 ORDER BY vec_id""".stripMargin,
    // q79: the snapshot equals the first batch, full stop — the later
    // upsert/delete must be invisible to the versioned read
    "q79_time_travel" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang, n_chars FROM documents
        |WHERE doc_id < 150 ORDER BY id""".stripMargin,
    // q81: the mutation sequence replayed relationally; the same final
    // state appears TWICE (current after compact+vacuum, and the retained
    // pre-compaction snapshot) because compaction must not change content
    "q81_compact_vacuum" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n, lang, n_chars
        |              FROM documents WHERE doc_id < 100),
        |u1 AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n, 'aa' AS lang, n_chars
        |       FROM documents WHERE doc_id < 40),
        |m1 AS (SELECT * FROM u1 UNION ALL SELECT b.* FROM base b WHERE b.n >= 40),
        |m2 AS (SELECT * FROM m1 WHERE id NOT IN ('7', '8')),
        |u2 AS (SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS n, 'bb' AS lang, n_chars
        |       FROM documents WHERE doc_id BETWEEN 90 AND 119),
        |fin AS (SELECT id, n, lang, n_chars FROM u2
        |        UNION ALL SELECT m2.* FROM m2 WHERE m2.n < 90)
        |SELECT s.src, fin.id, fin.lang, fin.n_chars
        |FROM fin, (SELECT 'current' AS src UNION ALL SELECT 'snapshot') s
        |ORDER BY s.src, fin.n""".stripMargin,
    // q78: the oracle can afford the direct inequality join (small data);
    // the Spark side's binning must produce EXACTLY these pairs
    "q78_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
        |p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, us AS c_us FROM e WHERE event_type = 'click')
        |SELECT p_id, c_id, user_id, (p_us - c_us) // 1000000 AS lag_s
        |FROM p JOIN c USING (user_id)
        |WHERE p_us - c_us BETWEEN 0 AND 3600000000
        |ORDER BY p_id, c_id""".stripMargin,
    // q77: replays the rule stack on the same q25-shape signals; reasons
    // concatenate in rule order exactly like array_compact preserves it
    "q77_quality_filter" ->
      """WITH q AS (SELECT doc_id,
        |  CAST(length(text) AS DOUBLE) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
        |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |  ROUND(n_chars / n_tokens, 4) AS mtl,
        |  ROUND(n_punct / n_chars, 4) AS pr,
        |  ROUND(n_upper / n_chars, 4) AS ur FROM q),
        |f AS (SELECT doc_id, list_filter([
        |    CASE WHEN n_tokens < 5 THEN 'too_few_tokens' END,
        |    CASE WHEN n_tokens > 100000 THEN 'too_many_tokens' END,
        |    CASE WHEN mtl < 2.0 THEN 'short_tokens' END,
        |    CASE WHEN mtl > 12.0 THEN 'long_tokens' END,
        |    CASE WHEN pr > 0.3 THEN 'punct_heavy' END,
        |    CASE WHEN ur > 0.3 THEN 'upper_heavy' END], x -> x IS NOT NULL) AS rs
        |  FROM r),
        |-- null/empty short-circuit, mirroring the operator's empty_text rule
        |g AS (SELECT f.doc_id,
        |        CASE WHEN d.text IS NULL OR length(d.text) = 0 THEN ['empty_text']
        |             ELSE f.rs END AS rs
        |      FROM f JOIN documents d ON f.doc_id = d.doc_id)
        |SELECT doc_id, len(rs) = 0 AS keep, COALESCE(array_to_string(rs, ','), '') AS reasons
        |FROM g ORDER BY doc_id""".stripMargin,
    // q76: q61's pair pipeline, then connected components as a recursive
    // reachability closure — cluster = LEAST(self, min reachable id)
    "q76_dup_clusters" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH RECURSIVE b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b FROM bb a
         |      JOIN bb c ON a.bucket = c.bucket AND a.id < c.id
         |      WHERE $sim >= 0.2),
         |e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
         |reach(s, t) AS (SELECT s, t FROM e
         |                UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
         |SELECT s AS vec_id, LEAST(s, MIN(t)) AS cluster FROM reach
         |GROUP BY s ORDER BY vec_id""".stripMargin
    },
    // q96: the q76 component chain (same LSH buckets, same recursive
    // closure) joined to the q25 quality chain (same rounded ratios),
    // argmax via lexicographic struct MAX — ties break to smallest id
    // because the struct carries -id
    "q96_cluster_reps" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH RECURSIVE b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b FROM bb a
         |      JOIN bb c ON a.bucket = c.bucket AND a.id < c.id
         |      WHERE $sim >= 0.2),
         |e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
         |reach(s, t) AS (SELECT s, t FROM e
         |                UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
         |memb AS (SELECT s AS id, LEAST(s, MIN(t)) AS cluster FROM reach GROUP BY s),
         |sq AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       tk -> lower(tk) IN ${sqlInList(enStop)})) AS DOUBLE) AS sw_hits,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct
         |  FROM documents),
         |sr AS (SELECT doc_id,
         |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
         |  ROUND(sw_hits / n_tokens, 4) AS stopword_ratio,
         |  n_tokens FROM sq),
         |score AS (SELECT doc_id,
         |  ROUND((LEAST(n_tokens / 20.0, 1.0) + LEAST(stopword_ratio * 5.0, 1.0)
         |        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS s
         |  FROM sr),
         |j AS (SELECT m.cluster, m.id,
         |             COALESCE(score.s, CAST('-infinity' AS DOUBLE)) AS s
         |      FROM memb m LEFT JOIN score ON m.id = score.doc_id),
         |a2 AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         |              MAX({'s': s, 'i': -id}) AS best
         |       FROM j GROUP BY cluster)
         |SELECT cluster, n_members, CAST(-(best.i) AS BIGINT) AS rep_id,
         |       ROUND(best.s, 4) + 0.0 AS rep_score
         |FROM a2 ORDER BY cluster""".stripMargin
    },
    // q151: the staged subset's scan semantics — the streamed store must
    // equal the batch truth row for row (ver = doc_id rides the upsert)
    "q151_file_stream_hydrate" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, lang,
        |       CAST(length(COALESCE(text, '')) AS INTEGER) AS n_doc,
        |       doc_id AS ver
        |FROM documents WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,
    // q152: include=[documents,metadatas] page replay — filter, then the
    // STRING-ordered id paging (the store keys by string), then the
    // projected families; the embedding never appears (and GetIncludeSpec
    // pins that the engine never even reads it)
    "q152_get_include" ->
      """SELECT * FROM (
        |  SELECT CAST(e.vec_id AS VARCHAR) AS id,
        |         CAST(length(d.text) AS INTEGER) AS n_doc,
        |         d.lang, d.n_chars
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |  WHERE e.vec_id < 400 AND d.lang IN ('en', 'fr')
        |  ORDER BY CAST(e.vec_id AS VARCHAR) LIMIT 50)
        |ORDER BY id""".stripMargin,
    // q153: the typed-metadata predicate replayed on the GENERATING
    // arithmetic (stars = doc_id%5, rating = (doc_id%100)/20.0, flagged =
    // doc_id%3=0) — the engine filters the same values through the string
    // map + declared-type try_casts, so the hash proves the round trip
    "q153_typed_metadata" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id,
        |       doc_id % 5 AS stars,
        |       ROUND((doc_id % 100) / 20.0, 4) + 0.0 AS rating,
        |       (doc_id % 3 = 0) AS flagged
        |FROM documents
        |WHERE doc_id < 400 AND (doc_id % 3 = 0)
        |  AND (doc_id % 5) > 1 AND (doc_id % 100) / 20.0 <= 4.0
        |ORDER BY id""".stripMargin,
  )
}
