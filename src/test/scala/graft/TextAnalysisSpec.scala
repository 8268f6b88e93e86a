package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c.as("v")).head.getAs[T]("v")

  test("whitespace token count") {
    assert(one[Int]("a b c", TextAnalysis.tokenCount(col("text"))) == 3)
    assert(one[Int]("one", TextAnalysis.tokenCount(col("text"))) == 1)
  }

  test("BPE-ish token count splits words and punctuation") {
    assert(one[Int]("hello, world!", TextAnalysis.tokenCountBpeish(col("text"))) == 4)
    assert(one[Int]("a1b2", TextAnalysis.tokenCountBpeish(col("text"))) == 1)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String]("the cat and the dog of the house",
      TextAnalysis.langId(col("text"))) == "en")
    assert(one[String]("el perro y la casa de los gatos",
      TextAnalysis.langId(col("text"))) == "es")
    assert(one[String]("zzz qqq xxx", TextAnalysis.langId(col("text"))) == "und")
  }

  test("langId on null text returns null, not a confident wrong label") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("v")).head()
    assert(r.isNullAt(0))
  }

  test("relational langIds matches the Column form on the fixture + null text") {
    val docs = spark.read.parquet(sf("documents"))
    val lambda = docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .as[(Long, String)].collect().toMap
    val rel = TextAnalysis.langIds(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(lambda == rel)
    val withNull = Seq((1L, Some("the cat and the dog")), (2L, None))
      .toDF("doc_id", "text")
    val r = TextAnalysis.langIds(withNull, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r == Map(1L -> Some("en"), 2L -> None))
  }

  test("langId tie-break is language-code ascending") {
    // 'de' and 'en' both hit exactly once -> 'de' (ascending)
    assert(one[String]("der the zzz", TextAnalysis.langId(col("text"))) == "de")
  }

  test("quality struct fields") {
    val r = Seq("The cat, the dog.").toDF("text")
      .select(TextAnalysis.qualityStruct(col("text")).as("q"))
      .select("q.n_chars", "q.n_tokens", "q.punct_ratio").head()
    assert(r.getInt(0) == 17 && r.getInt(1) == 4)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 0.2)
  }

  test("quality score is in [0,1] and favors natural text") {
    val natural = one[Double]("the cat and the dog sat on the mat with a hat in the sun all day long today",
      TextAnalysis.qualityScore(col("text")))
    val junk = one[Double]("zzz", TextAnalysis.qualityScore(col("text")))
    assert(natural > junk)
    assert(natural <= 1.0 && junk >= 0.0)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    assert(one[String]("  Hello,   WORLD!! 42 ", TextAnalysis.normalize(col("text")))
      == "hello world 42")
    assert(one[String]("...", TextAnalysis.normalize(col("text"))) == "")
  }

  test("relational fingerprints match the Column form on the fixture corpus") {
    val docs = spark.read.parquet(sf("documents"))
    val lambda = docs.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val rel = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(lambda == rel)
  }

  test("fingerprint is order-sensitive and 0 for empty text") {
    val a = one[Long]("abc", TextAnalysis.fingerprint(col("text")))
    val b = one[Long]("cba", TextAnalysis.fingerprint(col("text")))
    assert(a != b)
    // "abc" = 97*1 + 98*2 + 99*3 = 590
    assert(a == 590L)
    assert(one[Long]("", TextAnalysis.fingerprint(col("text"))) == 0L)
  }

  test("chunking: overlapping windows cover every token; short docs = 1 chunk") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  // 10 tokens
      (2L, "a b")).toDF("doc_id", "text")       // shorter than one chunk
    // chunkTokens=4, overlap=1 -> step=3 -> ceil((10-1)/3) = 3 chunks
    val out = TextAnalysis.chunk(docs, "doc_id", "text", 4, 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)))
    // adjacent chunks share exactly `overlap` tokens; union covers all
    val c = out.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    assert(c(0).takeRight(1) == c(1).take(1) && c(1).takeRight(1) == c(2).take(1))
    assert(c.flatten.distinct.size == 10)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(docs, "doc_id", "text", 4, 4)
    }
  }

  test("qualityFilter: reasons name fired rules in order; keep = none fired") {
    import org.apache.spark.sql.functions.{array_join, col}
    val docs = Seq(
      (1L, "the cat sat on the mat today fine."),      // clean -> keep
      (2L, "a b"),                                     // too few + short tokens
      (3L, "SHOUTING VERY LOUDLY ALWAYS HERE OK!!!"),  // upper_heavy
      (4L, "w, x; y: z. q! r? s, t; u: v."),           // punct heavy + short
      (5L, null.asInstanceOf[String]),                 // null -> empty_text
      (6L, "")                                         // zero-length, no ANSI error
    ).toDF("doc_id", "text")
    val f = TextAnalysis.qualityFilter(col("text"))
    val out = docs.select(col("doc_id"), f.getField("keep").as("k"),
        array_join(f.getField("reasons"), ",").as("r"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, true, "")))
    assert(out(1)._2 == false && out(1)._3 == "too_few_tokens,short_tokens")
    assert(out(2)._2 == false && out(2)._3.contains("upper_heavy"))
    assert(out(3)._2 == false && out(3)._3.contains("punct_heavy"))
    assert(out(4) == ((5L, false, "empty_text")), "null text must drop, not pass")
    assert(out(5) == ((6L, false, "empty_text")), "empty text must drop without ANSI error")
  }

  test("graft_shingles and graft_text_stats are callable from SQL") {
    graft.expressions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_shingles('a b c d', 3) AS sh, s.st.* FROM
        |(SELECT graft_text_stats('The cat. X') AS st) s""".stripMargin)
      .collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // n_chars, n_tokens, n_punct, n_upper, n_stopwords ('The' hits 'the')
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      == ((10, 3, 1, 2, 1)))
  }

  test("compiled quality struct matches the HOF form on fixture + edge cases") {
    import org.apache.spark.sql.functions.col
    val fixture = spark.read.parquet(sf("documents")).select(col("text"))
    // "" is outside the domain: ANSI divides n_punct/n_chars by zero in
    // BOTH forms (the compiled path changes nothing there)
    val edges = Seq(" ", "  ", "a", "The THE the", "x  y", "trailing ",
      " leading", "ALL CAPS!!", "dots... and, punct; x:", null)
      .toDF("text")
    Seq(fixture, edges.toDF()).foreach { df =>
      val both = df.select(
        TextAnalysis.qualityStruct(col("text")).as("c"),
        TextAnalysis.qualityStructHof(col("text")).as("h"))
      val bad = both.filter(!(col("c") <=> col("h"))).count()
      assert(bad == 0, s"compiled/HOF divergence:\n${
        both.filter(!(col("c") <=> col("h"))).take(3).mkString("\n")}")
    }
  }

  test("repetitionSignals: Gopher top/dup n-gram char fractions by hand") {
    val docs = Seq(
      (1L, "a b a b a b"),     // "a b"x3 (9 ch), "a b a"x2 (10 ch), no dup 5-gram
      (2L, "x y z w v"),       // all distinct; single 5-gram occurs once
      (3L, "c c c c c c c"),   // degenerate repetition: fractions exceed 1
      (4L, "solo"),            // too short for any gram
      (5L, ""),                // empty -> all zero, no div-by-zero
      (6L, null: String),      // null -> all zero
      // MOST FREQUENT wins, not max char mass: "a a"x3 (9 ch) beats
      // "ccc ccc"x2 (14 ch) because 3 > 2 occurrences
      (7L, "a a a a ccc ccc ccc")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double, Double, Double)].collect()
    assert(r(0) == ((1L, 9.0 / 11, 10.0 / 11, 0.0)))
    assert(r(1) == ((2L, 3.0 / 9, 5.0 / 9, 0.0)))
    assert(r(2) == ((3L, 18.0 / 13, 25.0 / 13, 27.0 / 13)))
    assert(r(3) == ((4L, 0.0, 0.0, 0.0)))
    assert(r(4) == ((5L, 0.0, 0.0, 0.0)))
    assert(r(5) == ((6L, 0.0, 0.0, 0.0)))
    // doc 7: 19 chars; top2 = "a a" 3x3=9; top3 = "a a a" 2x5=10 (ties
    // "a a ccc"? no — that occurs once; "ccc ccc ccc" occurs once);
    // dup5: "a a a ccc ccc"? occurs once; no 5-gram repeats -> 0
    assert(r(6) == ((7L, 9.0 / 19, 10.0 / 19, 0.0)))
  }

  test("repetitionSignals: compiled scan matches the relational explode form") {
    val fixture = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val edges = Seq((1000L, " "), (1001L, "  "), (1002L, "a  b a  b"),
      (1003L, "trailing "), (1004L, " leading"), (1005L, "𝕏 y 𝕏 y 𝕏"),
      (1006L, null: String), (1007L, ""), (1008L, "x x x x x x"))
      .toDF("doc_id", "text")
    Seq(fixture, edges.toDF()).foreach { df =>
      val c = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      val h = TextAnalysis.repetitionSignalsExploded(df, "doc_id", "text")
      val diff = c.as("c").join(h.as("h"), "doc_id")
        .filter(!(col("c.top2_frac") <=> col("h.top2_frac")) ||
                !(col("c.top3_frac") <=> col("h.top3_frac")) ||
                !(col("c.dup5_frac") <=> col("h.dup5_frac")))
      assert(c.count() == h.count() && diff.count() == 0,
        s"compiled/relational divergence:\n${diff.take(3).mkString("\n")}")
    }
  }

  test("repetitionFilter gates on Gopher cutoffs with per-rule reasons") {
    val docs = Seq(
      (1L, "c c c c c c c"), // top2 18/13, top3 25/13, dup5 27/13: all fire
      (2L, (0 until 30).map(i => f"w$i%02d").mkString(" ")), // diverse: keep
      (3L, ""),              // empty -> empty_text, never a keep
      (4L, null: String)     // null  -> empty_text
    ).toDF("doc_id", "text")
    val f = TextAnalysis.repetitionFilter(col("text"))
    val r = docs.select(col("doc_id"), f.getField("keep"),
        array_join(f.getField("reasons"), ","))
      .orderBy("doc_id").as[(Long, Boolean, String)].collect()
    assert(r(0) == ((1L, false, "top2_repetitive,top3_repetitive,dup5_repetitive")))
    assert(r(1) == ((2L, true, "")))
    assert(r(2) == ((3L, false, "empty_text")))
    assert(r(3) == ((4L, false, "empty_text")))
  }

  test("sourceQualityGate drops the whole source, good pages included") {
    val good = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day for all of them to be out in the park with friends"
    val bad = "!!! ??? ;;; ::: !!!"
    val df = Seq(
      (1L, good, "goodsrc"), (2L, good, "goodsrc"),
      // badsrc mean = (1.0 + 0.25) / 2 = 0.625 < 0.7: doc 4 is itself
      // fine but its ORIGIN fails the gate — group semantics, not row
      (3L, bad, "badsrc"), (4L, good, "badsrc")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceQualityGate(df, "doc_id", "text", "source", 0.7)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val score = out.select("src_score").as[Double].head()
    assert(score >= 0.7 && score <= 1.0)
    // threshold below both means: everything survives, scores attached
    assert(TextAnalysis.sourceQualityGate(df, "doc_id", "text", "source", 0.5)
      .count() == 4)
  }

  test("oovRate: vocab boundary deterministic, rates exact, null text -> null rate") {
    // corpus counts: a=4, z=4, b=3, c=1, x=1, y=1 -> top-2 vocab = {a, z}
    val df = Seq(
      (1L, "a a a b b c"),   // in-vocab a,a,a -> 3/6 OOV
      (2L, "a b x y"),       // in-vocab a -> 3/4 OOV
      (3L, "z z z z"),       // fully in-vocab
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(df, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 6L), (2L, 4L), (3L, 4L), (4L, 0L)))
    assert(out(0).getDouble(2) == 0.5)
    assert(out(1).getDouble(2) == 0.75)
    assert(out(2).getDouble(2) == 0.0)
    assert(out(3).isNullAt(2))
    // tie at the boundary: c and d both count 1 with vocabSize=3 -> token
    // ascending keeps c; d is OOV
    val tie = Seq((1L, "a a b b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.oovRate(tie, "doc_id", "text", vocabSize = 3)
      .head()
    assert(r.getDouble(2) == 1.0 / 6)
  }

  test("piiStats counts and piiScrub redacts all three shapes; clean text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@sub.example.org and jo@a.io, dial 555-0192, host 10.0.255.1"),
      (2L, "no pii here at all"),
      (3L, "ip 192.168.1.1 then 555-1234 then 555-12345")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.piiStats(col("text")).as("st"),
      TextAnalysis.piiScrub(col("text")).as("scrubbed")).orderBy("id").collect()
    assert(out(0).getStruct(1).toSeq == Seq(2, 1, 1))
    assert(out(0).getString(2) ==
      "mail <EMAIL> and <EMAIL>, dial <PHONE>, host <IP>")
    assert(out(1).getStruct(1).toSeq == Seq(0, 0, 0))
    assert(out(1).getString(2) == "no pii here at all")
    // 555-12345 must NOT match \d{3}-\d{4}\b (trailing digit breaks the
    // boundary) — the count pins the word-boundary semantics
    assert(out(2).getStruct(1).toSeq == Seq(0, 1, 1))
    assert(out(2).getString(2) == "ip <IP> then <PHONE> then 555-12345")
  }

  test("urlDomain extracts the authority; blockByDomain anti-joins and keeps audit col") {
    val docs = Seq(
      (1L, "https://bad.example.com/a/b"),
      (2L, "http://good.example.com/"),
      (3L, "https://bad.example.com:8443/x"),  // port ⇒ different authority
      (4L, "not a url")
    ).toDF("id", "url")
    val blocked = Seq("bad.example.com").toDF("domain")
    val kept = TextAnalysis.blockByDomain(docs, "url", blocked)
      .select("id", "domain").orderBy("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    assert(kept(0).getString(1) == "good.example.com")
    assert(kept(1).getString(1) == "bad.example.com:8443")
    assert(kept(2).getString(1) == "")  // non-URL ⇒ empty authority, kept
  }

  test("targetAffinity: target-only tokens score above corpus-average, exact sums") {
    // buckets wide enough that the 4 distinct tokens never collide
    val df = Seq(
      (1L, "aa aa", true),   // pure target-side tokens
      (2L, "zz zz", false),  // pure non-target tokens
      (3L, "aa zz", false)   // mixed
    ).toDF("id", "text", "is_t")
    val out = TextAnalysis.targetAffinity(df, "id", "text", col("is_t"),
      buckets = 65536).orderBy("id").collect()
    // token totals: T_r = 6; target rows contribute T_t = 2 (both 'aa')
    // bucket counts: aa → (cr=3, ct=2), zz → (cr=3, ct=0)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 2L, 4L, 6L), (2L, 2L, 0L, 6L), (3L, 2L, 2L, 6L)))
    val aff = out.map(_.getDouble(4))
    assert(aff(0) == 4.0 / 2 / 2 - 6.0 / 6 / 2)   // +0.5
    assert(aff(1) == 0.0 / 2 / 2 - 6.0 / 6 / 2)   // -0.5
    assert(aff(2) == 2.0 / 2 / 2 - 6.0 / 6 / 2)   // 0.0
    assert(aff(0) > aff(2) && aff(2) > aff(1))
  }

  test("c4LineFilter: rule precedence, punctuation-stripped blocklist, count conservation") {
    val df = Seq(
      // kept, blocked (slow. strips to slow), short, no-punct, kept
      (1L, "the quick brown fox runs.\nthis line is slow.\ntiny one\nno punctuation here at all\nanother good line stays!"),
      (2L, ""),                       // one empty line -> short
      (3L, "a slow b\nslow"),         // blocked beats short: both have 'slow'
      (4L, "ends with quote \"")      // terminal quote counts as punctuation
    ).toDF("id", "text")
    val st = TextAnalysis.c4LineFilter(col("text"), minWords = 3, blocked = Seq("slow"))
    val out = df.select(col("id"), st.as("st")).orderBy("id").collect()
    def s(i: Int) = out(i).getStruct(1)
    assert(s(0).toSeq.drop(1) == Seq(5L, 2L, 1L, 1L, 1L))
    assert(s(0).getString(0) ==
      "the quick brown fox runs.\nanother good line stays!")
    assert(s(1).toSeq.drop(1) == Seq(1L, 0L, 0L, 1L, 0L) && s(1).getString(0) == "")
    // blocked is checked before short: the bare 'slow' line counts blocked
    assert(s(2).toSeq.drop(1) == Seq(2L, 0L, 2L, 0L, 0L))
    assert(s(3).toSeq.drop(1) == Seq(1L, 1L, 0L, 0L, 0L))
    // counts conserve on every row
    out.foreach { r =>
      val t = r.getStruct(1)
      assert(t.getLong(1) == t.getLong(2) + t.getLong(3) + t.getLong(4) + t.getLong(5))
    }
  }

  test("canonicalizeUrl: fragment, tracking params, case, default ports, root slash") {
    val cases = Seq(
      "https://a.com/p#sec" -> "https://a.com/p",
      "https://a.com/p?utm_source=x&q=1&utm_b=2" -> "https://a.com/p?q=1",
      "https://a.com/p?utm_a=1" -> "https://a.com/p",
      "HTTP://WWW.EXAMPLE.com/Path" -> "http://www.example.com/Path", // path case kept
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:80?q=1" -> "http://a.com?q=1",
      "https://a.com:8443/x" -> "https://a.com:8443/x",  // non-default port kept
      "https://a.com/" -> "https://a.com",
      "https://a.com/p/" -> "https://a.com/p/",          // only the bare root slash
      "not a url" -> "not a url")
    val out = cases.zipWithIndex.map { case ((u, _), i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(out == cases.map(_._2))
  }

  test("curationFunnel: cumulative stages, metric mass, empty input yields zero rows") {
    val df = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "de", 40L), (4L, "fr", 80L)
    ).toDF("id", "lang", "toks")
    val out = TextAnalysis.curationFunnel(df, Seq(
        "all" -> lit(true),
        "lang" -> col("lang").isin("en", "de"),
        "big" -> (col("toks") >= 20L)),
      metric = col("toks")).orderBy("stage_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, "all", 4L, 150L), (2, "lang", 3L, 70L), (3, "big", 2L, 60L)))
    // stages compose cumulatively: a row failing 'lang' never reaches 'big'
    val empty = TextAnalysis.curationFunnel(df.filter(lit(false)),
      Seq("all" -> lit(true)), metric = col("toks")).collect()
    assert(empty.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq((0L, 0L)))
  }

  test("winnowFingerprints: overlap guarantee, uniform-text collapse, short-text edges") {
    val k = 5; val w = 4
    val shared = "the winnowing guarantee holds here"  // >= k+w-1 = 8 chars
    val df = Seq(
      (1L, s"prefix one blah $shared and a tail x"),
      (2L, s"completely different head $shared other end"),
      (3L, "aaaaaaaaaaaaaaaaaaaa"),  // uniform: every gram identical
      (4L, "abc"),                   // shorter than k -> empty sketch
      (5L, "abcdefg")                // k <= len < k+w-1 -> one window
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("fps"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    // any shared substring of length >= k+w-1 yields a common fingerprint
    assert(out(0).toSet.intersect(out(1).toSet).nonEmpty)
    // uniform text: all grams hash equal -> exactly one distinct entry
    assert(out(2).length == 1)
    assert(out(3).isEmpty)
    assert(out(4).length == 1)
    // sketches are sorted distinct
    out.foreach(f => assert(f == f.distinct.sorted))
  }

  test("percentileProfile matches Spark's percentile aggregate exactly") {
    // duplicates, skew, and a non-trivial group mix — the histogram form
    // must reproduce the p·(n−1) interpolation bit-for-bit
    val rows = (1 to 97).map(i => ("a", (i * i % 37).toLong)) ++
      (1 to 13).map(i => ("b", (i * 7 % 5).toLong)) ++ Seq(("c", 42L))
    val df = rows.toDF("g", "v")
    val ours = TextAnalysis.percentileProfile(df, "g", "v",
        Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy("g").collect()
    val ref = df.groupBy("g")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.95))").as("ps"),
        count(lit(1)).as("n"))
      .orderBy("g").collect()
    ours.zip(ref).foreach { case (o, r) =>
      assert(o.getString(0) == r.getString(0))
      assert(o.getLong(1) == r.getLong(2))
      val refPs = r.getSeq[Double](1)
      Seq(2, 3, 4, 5).zipWithIndex.foreach { case (c, i) =>
        assert(o.getDouble(c) == refPs(i),
          s"group ${o.getString(0)} p${Seq(25, 50, 75, 95)(i)}: " +
            s"${o.getDouble(c)} != ${refPs(i)}")
      }
    }
  }

  test("percentileProfile: null exclusion, single-row group, bounds") {
    val df = Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)),
      ("b", Some(5L)), ("c", None)).toDF("g", "v")
    val out = TextAnalysis.percentileProfile(df, "g", "v", Seq(0.0, 0.5, 1.0))
      .orderBy("g").collect()
    // group c was all-NULL: gone; a has n=2 (null excluded); b is one row
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out(0).getLong(1) == 2 && out(0).getDouble(2) == 10.0 &&
      out(0).getDouble(3) == 15.0 && out(0).getDouble(4) == 20.0)
    assert(out(1).getLong(1) == 1 && out(1).getDouble(3) == 5.0)
    intercept[IllegalArgumentException] {
      TextAnalysis.percentileProfile(df, "g", "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.percentileProfile(df, "g", "v", Nil)
    }
  }

  test("repetitionSignals: custom ns drive the output column set") {
    val docs = Seq((1L, "p q p q")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text",
      topNs = Seq(2), dupNs = Seq(2, 3))
    assert(r.columns.toSeq == Seq("doc_id", "top2_frac", "dup2_frac", "dup3_frac"))
    val row = r.head()
    // "p q"x2 = 6 chars of 7; trigrams "p q p"/"q p q" both unique
    assert(row.getDouble(1) == 6.0 / 7 && row.getDouble(2) == 6.0 / 7
      && row.getDouble(3) == 0.0)
  }

  // the rule table a DuckDB replay of the identical patterns produces —
  // first-match-wins order, guards, and the honest es-rule outputs
  private val sStemTable = Seq(
    "studies" -> "study", "queries" -> "query",   // ies→y
    "ties" -> "tie",                               // ies guard → es rule
    "tables" -> "table", "nodes" -> "node",        // es→e
    "indexes" -> "indexe", "batches" -> "batche",  // es rule's honest output
    "joins" -> "join", "streams" -> "stream",      // s→''
    "focus" -> "focus", "class" -> "class",        // us/ss guards
    "is" -> "is", "as" -> "as",                    // minimum-stem guard
    "its" -> "it", "gas" -> "ga",                  // published-rule outputs
    "hash" -> "hash", "3.14s" -> "3.14s")          // no suffix / non-[a-z]

  test("sStemText: Harman rules, first match wins, guards hold") {
    val got = sStemTable.map(_._1).toDF("t")
      .select(TextAnalysis.sStemText(col("t"))).as[String].collect().toSeq
    assert(got == sStemTable.map(_._2))
    // multi-token text: per-token stemming, single-space rejoin, case fold
    val s = Seq("Spark JOINS  two tables").toDF("t")
      .select(TextAnalysis.sStemText(col("t"))).as[String].head()
    assert(s == "spark join two table")
  }

  test("sStemTerm: driver-side twin is bit-equal to the Column form") {
    val terms = sStemTable.map(_._1) ++ Seq("JOINS", "Queries", "Batches")
    val viaCol = terms.toDF("t")
      .select(TextAnalysis.sStemText(col("t"))).as[String].collect().toSeq
    assert(terms.map(TextAnalysis.sStemTerm) == viaCol)
  }
}
