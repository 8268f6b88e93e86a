package graft

import org.apache.spark.sql.functions._

import graft.operators.Lm

class LmSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramLmScore: hand-computed conditional probabilities") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab
      (2L, "a b"),     // bigram ab
      (3L, "x")        // no bigrams
    ).toDF("doc_id", "text")
    // c1: a=3, b=3, x=1; c2: ab=3, ba=1
    // P(ab)=3/3=1.0, P(ba)=1/3=0.333333 (rounded to 6)
    // doc1 = floor((2*1.0 + 1*0.333333)*1e6 / 3)/1e6 = 0.777777 (micro-unit
    // floor -- see Lm's half-boundary note); doc2 = 1.0; doc3 = null
    val rs = Lm.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "lm_score")
      .collect()
    assert(rs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 1L), (3L, 0L)))
    assert(rs(0).getDouble(2) == 0.777777)
    assert(rs(1).getDouble(2) == 1.0)
    assert(rs(2).isNullAt(2), "a doc without bigrams must score NULL, not 0")
  }

  test("bigramLmScore: null and empty text behave like no bigrams") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "w w"))
      .toDF("doc_id", "text")
    val rs = Lm.bigramLmScore(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(rs(0).getLong(1) == 0L && rs(0).isNullAt(2))
    assert(rs(1).getLong(1) == 0L && rs(1).isNullAt(2))
    // "w w": c2(ww)=1, c1(w)=2 -> 0.5
    assert(rs(2).getLong(1) == 1L && rs(2).getDouble(2) == 0.5)
  }

  test("TokenSpreadHashes: compiled scan equals split+spreadHash on edge shapes") {
    import org.apache.spark.sql.GraftColumnShim
    // leading/interior/trailing/consecutive spaces, empty, unicode —
    // the compiled pass must reproduce split(" ", limit -1) exactly
    val docs = Seq("a b", " a", "a ", "a  b", "", "中文 x", "solo")
      .toDF("text")
    val compiled = docs.select(GraftColumnShim.column(
      graft.expressions.TokenSpreadHashes(
        GraftColumnShim.expression(col("text")))).as("hs"))
    val hof = docs.select(transform(split(col("text"), " "),
      t => GraftColumnShim.column(graft.expressions.StrHash(
          GraftColumnShim.expression(t)))
        .mod(2147483647L).multiply(2654435761L).mod(1000000007L)).as("hs"))
    assert(compiled.collect().map(_.getSeq[Long](0)).toSeq ==
      hof.collect().map(_.getSeq[Long](0)).toSeq)
  }

  test("bpeMergeCandidates: vocab-weighted pair counts, ties break to the smaller pair") {
    val docs = Seq((1L, "aab aab c"), (2L, "bc aab")).toDF("doc_id", "text")
    // vocab (len >= 2): aab f=3, bc f=1; "c" is single-char -> excluded
    // pairs: a+a 3, a+b 3, b+c 1
    val rs = Lm.bpeMergeCandidates(docs, "text", topN = 20)
      .select("rank", "pair", "cnt").as[(Int, String, Long)].collect().toSeq
    assert(rs == Seq((1, "a+a", 3L), (2, "a+b", 3L), (3, "b+c", 1L)))
  }

  test("bpeMergeCandidates: counts characters, not bytes (multibyte-safe)") {
    val docs = Seq((1L, "中文 中文")).toDF("doc_id", "text")
    val rs = Lm.bpeMergeCandidates(docs, "text")
      .select("pair", "cnt").as[(String, Long)].collect().toSeq
    assert(rs == Seq(("中+文", 2L)))
  }

  test("bpeTrain: counts recompute over MERGED vocab; early exhaustion; summary row") {
    val docs = Seq((1L, "aab aab c"), (2L, "bc aab")).toDF("doc_id", "text")
    // vocab: aab f=3, bc f=1. Hand trace: r1 (a,a)3 -> 'aa b'; r2 (aa,b)3
    // -> 'aab'; r3 (b,c)1 -> 'bc'; r4 no pairs left -> stop early. Final
    // vocab is two single-symbol words -> weighted symbol count 4.
    val rs = Lm.bpeTrain(docs, "text", rounds = 5)
      .orderBy("rank").as[(Int, String, Long)].collect().toSeq
    assert(rs == Seq((1, "a+a", 3L), (2, "aa+b", 3L), (3, "b+c", 1L),
      (6, "__symbols", 4L)))
  }

  test("bpeTrain: single-pass replace semantics on a symbol run (documented)") {
    // 'aaaa' -> 'a a a a'. One non-overlapping pass merges ONE (a,a)
    // (the shared boundary space is consumed): 'aa a a' — canonical BPE
    // would merge two. Round 2 then merges the remaining (a,a) tie-win
    // ('a' < 'aa'): 'aa aa'. The spec pins this documented divergence.
    val run = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val rs = Lm.bpeTrain(run, "text", rounds = 2)
      .orderBy("rank").as[(Int, String, Long)].collect().toSeq
    assert(rs == Seq((1, "a+a", 3L), (2, "a+a", 1L), (3, "__symbols", 2L)))
  }

  test("bpeEncode: ordered cascading merges tokenize per doc; empty docs keep (0,0)") {
    val docs = Seq(
      (1L, "the thin cat"),       // the: t+h->'th e', th+e->'the' = 1 tok
      (2L, "  "),                  // whitespace-only -> (0, 0)
      (3L, null.asInstanceOf[String]),
      (4L, "hand")                 // a+n->'h an d', an+d->'h and' = 2 tok
    ).toDF("doc_id", "text")
    val got = Lm.bpeEncode(docs, "doc_id", "text",
        Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d")))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // thin: 't h i n' -> th -> 'th i n' -> in -> 'th in' = 2; cat: 'c a t' = 3
    assert(got == Seq((1L, 3L, 6L), (2L, 0L, 0L), (3L, 0L, 0L), (4L, 1L, 2L)),
      s"got $got")
    // ORDER matters: without the t+h merge first, th+e can never fire
    val unordered = Lm.bpeEncode(docs, "doc_id", "text", Seq(("th", "e")))
      .filter(col("doc_id") === 1).select("n_tokens").as[Long].head()
    assert(unordered == 10L, "th+e alone must not fire on raw chars")
  }
}
