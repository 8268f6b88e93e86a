package graft

import org.apache.spark.sql.functions.col
import graft.operators.ChromaFilter._

class ChromaFilterSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1, "en", "hello world"),
    ("b", 2, "es", "hola mundo"),
    ("c", 3, "en", "scan the table"),
    ("d", 4, "fr", "bonjour")
  ).toDF("id", "n", "lang", "doc")

  private def ids(w: Where): Set[String] =
    df.filter(w.toColumn).select("id").as[String].collect().toSet

  test("$eq / $ne")  { assert(ids(Eq("lang", "en")) == Set("a", "c"))
                       assert(ids(Ne("lang", "en")) == Set("b", "d")) }
  test("$gt / $gte") { assert(ids(Gt("n", 2)) == Set("c", "d"))
                       assert(ids(Gte("n", 2)) == Set("b", "c", "d")) }
  test("$lt / $lte") { assert(ids(Lt("n", 2)) == Set("a"))
                       assert(ids(Lte("n", 2)) == Set("a", "b")) }
  test("$in / $nin") { assert(ids(In("lang", Seq("en", "fr"))) == Set("a", "c", "d"))
                       assert(ids(Nin("lang", Seq("en", "fr"))) == Set("b")) }
  test("$and / $or") {
    assert(ids(And(Seq(Eq("lang", "en"), Gt("n", 1)))) == Set("c"))
    assert(ids(Or(Seq(Eq("lang", "fr"), Eq("n", 1)))) == Set("a", "d"))
    assert(ids(And(Seq(Or(Seq(Eq("lang", "en"), Eq("lang", "es"))), Lte("n", 2)))) == Set("a", "b"))
  }

  test("$contains / $not_contains on document") {
    def dids(w: WhereDocument): Set[String] =
      df.filter(w.toColumn(col("doc"))).select("id").as[String].collect().toSet
    assert(dids(Contains("scan")) == Set("c"))
    assert(dids(NotContains("scan")) == Set("a", "b", "d"))
    assert(dids(AndDoc(Seq(Contains("o"), NotContains("scan")))) == Set("a", "b", "d"))
    assert(dids(OrDoc(Seq(Contains("bonjour"), Contains("hola")))) == Set("b", "d"))
  }

  test("whereFromJson: Chroma wire shapes parse to the exact ADT") {
    assert(whereFromJson("""{"lang": "en"}""") == Eq("lang", "en"))
    assert(whereFromJson("""{"rating": {"$gte": 4}}""") == Gte("rating", 4L))
    assert(whereFromJson("""{"score": {"$lt": 2.5}}""") == Lt("score", 2.5))
    assert(whereFromJson("""{"ok": {"$eq": true}}""") == Eq("ok", true))
    assert(whereFromJson("""{"lang": {"$in": ["en", "fr"]}}""") ==
      In("lang", Seq("en", "fr")))
    assert(whereFromJson(
      """{"$and": [{"lang": "en"}, {"$or": [{"n": {"$gt": 1}}, {"n": {"$ne": 0}}]}]}""") ==
      And(Seq(Eq("lang", "en"), Or(Seq(Gt("n", 1L), Ne("n", 0L))))))
    // escapes survive
    assert(whereFromJson("""{"k": "a\"b\\cA"}""") == Eq("k", "a\"b\\cA"))
    // filtering behavior end-to-end matches hand-built nodes
    assert(ids(whereFromJson("""{"$and": [{"lang": "en"}, {"n": {"$gt": 1}}]}""")) == Set("c"))
  }

  test("whereFromJson: Chroma's validation rules fail loudly") {
    // two top-level keys need explicit $and
    intercept[IllegalArgumentException](whereFromJson("""{"a": 1, "b": 2}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": {"$gt": 1, "$lt": 5}}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": {"$like": "x"}}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"$and": "not-an-array"}"""))
    intercept[IllegalArgumentException](whereFromJson("""["not", "an", "object"]"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": 1} trailing"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": [1, 2]}""")) // array is not a scalar
    intercept[IllegalArgumentException](whereFromJson("""{"a": """))
    // empty operator lists: Chroma rejects them; And(Nil) would crash
    // with a bare empty.reduce and {"$in": []} would silently match nothing
    intercept[IllegalArgumentException](whereFromJson("""{"$and": []}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"$or": []}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": {"$in": []}}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"a": {"$nin": []}}"""))
    intercept[IllegalArgumentException](whereDocFromJson("""{"$and": []}"""))
    // a $-prefixed key with a scalar value is an operator in the wrong
    // position, not a metadata key — Chroma rejects it; the old shorthand
    // arm parsed Eq("$contains", ...) which silently matched nothing
    val e = intercept[IllegalArgumentException](
      whereFromJson("""{"$contains": "spark"}"""))
    assert(e.getMessage.contains("where_document"))
    intercept[IllegalArgumentException](whereFromJson("""{"$And": "x"}"""))
    intercept[IllegalArgumentException](whereFromJson("""{"$not_contains": "x"}"""))
    // ...and with an OPERATOR-OBJECT value too: {"$contains": {"$eq": "x"}}
    // used to slip past the shorthand-arm guard as Eq("$contains", "x")
    val eo = intercept[IllegalArgumentException](
      whereFromJson("""{"$contains": {"$eq": "x"}}"""))
    assert(eo.getMessage.contains("where_document"))
    intercept[IllegalArgumentException](
      whereFromJson("""{"$lang": {"$eq": "en"}}"""))
    intercept[IllegalArgumentException](
      whereFromJson("""{"$regex": {"$eq": "x"}}"""))
    // duplicate keys must not slip past exactly-one-key validation
    // last-wins ({"a":1,"a":2} used to parse as Eq(a, 2))
    val d = intercept[IllegalArgumentException](
      whereFromJson("""{"a": 1, "a": 2}"""))
    assert(d.getMessage.contains("duplicate key"))
    intercept[IllegalArgumentException](
      whereFromJson("""{"a": {"$gt": 1, "$gt": 5}}"""))
    intercept[IllegalArgumentException](
      whereDocFromJson("""{"$contains": "x", "$contains": "y"}"""))
  }

  test("whereDocFromJson: contains shapes") {
    assert(whereDocFromJson("""{"$contains": "spark"}""") == Contains("spark"))
    assert(whereDocFromJson("""{"$not_contains": "x"}""") == NotContains("x"))
    assert(whereDocFromJson("""{"$regex": "sp[a-z]+k"}""") ==
      MatchesRegex("sp[a-z]+k"))
    assert(whereDocFromJson("""{"$not_regex": "a\\d+b"}""") ==
      NotMatchesRegex("a\\d+b"))
    assert(whereDocFromJson(
      """{"$and": [{"$contains": "a"}, {"$not_contains": "b"}]}""") ==
      AndDoc(Seq(Contains("a"), NotContains("b"))))
    intercept[IllegalArgumentException](whereDocFromJson("""{"$eq": "x"}"""))
  }

  test("ordering ops on MAP-backed metadata compare numerically, never throw") {
    import org.apache.spark.sql.functions.element_at
    val m = Seq(
      ("a", Map("rating" -> "9.1")),
      ("b", Map("rating" -> "10")),
      ("c", Map("rating" -> "2")),
      ("d", Map("rating" -> "not-a-number"))).toDF("id", "metadata")
    val r: KeyResolver = k => element_at(col("metadata"), k)
    def got(w: Where): Set[String] =
      m.filter(w.toColumnWith(r)).select("id").as[String].collect().toSet
    // numeric literal: "10" > 3 (not lexicographic "10" < "9"-style order),
    // unparsable values simply don't match, and ANSI does not throw
    assert(got(Gt("rating", 3)) == Set("a", "b"))
    assert(got(Lte("rating", 9.1)) == Set("a", "c"))
    // string literal: documented string ordering on the string layout
    // ("9.1" > "3" and "not-a-number" > "3"; "10" and "2" sort below)
    assert(got(Gt("rating", "3")) == Set("a", "d"))
  }

  test("Eq/Ne/In on MAP-backed metadata: numeric literals never throw under ANSI") {
    import org.apache.spark.sql.functions.element_at
    val m = Seq(
      ("a", Map("rating" -> "5")),
      ("b", Map("rating" -> "5.0")),
      ("c", Map("rating" -> "7")),
      ("d", Map("rating" -> "unknown"))).toDF("id", "metadata")
    val r: KeyResolver = k => element_at(col("metadata"), k)
    def got(w: Where): Set[String] =
      m.filter(w.toColumnWith(r)).select("id").as[String].collect().toSet
    assert(got(Eq("rating", 5)) == Set("a", "b"))     // "5.0" == 5 numerically
    assert(got(Ne("rating", 5)) == Set("c"))          // unparsable -> no match
    assert(got(In("rating", Seq(5, 7))) == Set("a", "b", "c"))
    assert(got(Nin("rating", Seq(5))) == Set("c"))
    // getItem shape resolves as a map lookup too
    val r2: KeyResolver = k => col("metadata").getItem(k)
    assert(m.filter(Gt("rating", 6).toColumnWith(r2))
      .select("id").as[String].collect().toSet == Set("c"))
  }

  test("predicate combines where and where_document") {
    val p = predicate(Some(Eq("lang", "en")), Some(Contains("table")), col("doc")).get
    assert(df.filter(p).select("id").as[String].collect().toSeq == Seq("c"))
    assert(predicate(None, None, col("doc")).isEmpty)
  }

  test("metadata filters push down to the parquet scan") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = docs.filter(And(Seq(Eq("lang", "en"), Gt("n_chars", 100))).toColumn)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("IsNotNull(lang)"),
      s"filter not pushed:\n$plan")
  }
}
