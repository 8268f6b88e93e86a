package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.CollectionCatalog
import graft.operators.{ChromaFilter, DocIndex}
import graft.operators.ChromaFilter._

/** The where_document postings index (B8's scale path): gram algebra,
  * candidate superset soundness, index-vs-scan result equality through
  * Collection.get, plan confinement (partition pruning on gp), and the
  * MVCC lifecycle (stale index never consulted, vacuum reclaims builds). */
class DocIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    ("1", "the quick brown fox jumps"),
    ("2", "pack my box with five dozen jugs"),
    ("3", "quick boxes are brown"),
    ("4", "ox"), // shorter than a gram — candidate for nothing
    ("5", "slow brown turtle"),
    ("6", null: String))

  private def freshCatalog(): CollectionCatalog = {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "dix-test").toString
    new CollectionCatalog(spark, root, numBuckets = 4)
  }

  private def hydrated(): graft.catalog.Collection = {
    val c = freshCatalog().getOrCreateCollection("d")
    c.add(corpus.toDF("id", "document"))
    c
  }

  test("gramSets: OR-of-AND confinement algebra") {
    assert(DocIndex.gramSets(Contains("brown")) ==
      Some(Seq(Seq("bro", "row", "own"))))
    assert(DocIndex.gramSets(Contains("ox")).isEmpty)       // too short
    assert(DocIndex.gramSets(NotContains("brown")).isEmpty) // not confinable
    // AND: NotContains contributes nothing, Contains children intersect
    assert(DocIndex.gramSets(AndDoc(Seq(Contains("bro"), NotContains("x")))) ==
      Some(Seq(Seq("bro"))))
    assert(DocIndex.gramSets(AndDoc(Seq(Contains("bro"), Contains("own")))) ==
      Some(Seq(Seq("bro", "own"))))
    // OR: confinable only when every branch is
    assert(DocIndex.gramSets(OrDoc(Seq(Contains("bro"), Contains("jug")))) ==
      Some(Seq(Seq("bro"), Seq("jug"))))
    assert(DocIndex.gramSets(OrDoc(Seq(Contains("bro"), Contains("ox")))).isEmpty)
    assert(DocIndex.gramSets(OrDoc(Seq(Contains("bro"), NotContains("x")))).isEmpty)
  }

  test("candidates are a superset of true matches, and get() hash-matches the scan") {
    val c = hydrated()
    val scan = c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet
    assert(scan == Set("1", "3", "5"))
    c.buildDocIndex()
    assert(c.hasDocIndex)
    val indexed = c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet
    assert(indexed == scan)
    // substring straddling word boundary (grams include the space)
    assert(c.get(whereDoc = Some(Contains("quick b")))
      .select("id").as[String].collect().toSet == Set("1", "3"))
    // not-contains re-check still applies on the confined set
    assert(c.get(whereDoc = Some(AndDoc(Seq(Contains("brown"), NotContains("slow")))))
      .select("id").as[String].collect().toSet == Set("1", "3"))
    // unconfinable predicates fall back to the scan unchanged
    assert(c.get(whereDoc = Some(NotContains("brown")))
      .select("id").as[String].collect().toSet == Set("2", "4"))
  }

  test("requiredLiterals: conservative required-run extraction") {
    import DocIndex.requiredLiterals
    // plain literal ≡ contains
    assert(requiredLiterals("brown fox") == Some(Seq("brown fox")))
    // metachars break runs; both sides required
    assert(requiredLiterals("quick.*brown") == Some(Seq("quick", "brown")))
    assert(requiredLiterals("vector [a-z]+ table") ==
      Some(Seq("vector ", " table")))
    // vanishing quantifiers retract their atom
    assert(requiredLiterals("colou?r") == Some(Seq("colo", "r")))
    assert(requiredLiterals("ab*c") == Some(Seq("a", "c")))
    assert(requiredLiterals("ab{0,3}c") == Some(Seq("a", "c")))
    // + keeps its atom
    assert(requiredLiterals("ab+c") == Some(Seq("ab", "c")))
    // group contents are never required (may be alternated/optional)
    assert(requiredLiterals("(foo|bar)baz") == Some(Seq("baz")))
    assert(requiredLiterals("pre(opt)?post") == Some(Seq("pre", "post")))
    // escaped metachars are literals; class shorthands are not
    assert(requiredLiterals("a\\.b") == Some(Seq("a.b")))
    assert(requiredLiterals("a\\d+b") == Some(Seq("a", "b")))
    // anchors break runs but don't poison extraction
    assert(requiredLiterals("^start end$") == Some(Seq("start end")))
    // unconfinable shapes: top-level alternation, quote blocks,
    // unbalanced syntax, nothing-literal patterns
    assert(requiredLiterals("abc|def").isEmpty)
    assert(requiredLiterals("\\Qa.b\\E").isEmpty)
    assert(requiredLiterals("[a-z").isEmpty)
    assert(requiredLiterals("a)b").isEmpty)
    assert(requiredLiterals("\\d+\\s*").isEmpty)
    assert(requiredLiterals("(abc)").isEmpty)
    // INLINE FLAGS poison literal requiredness ((?i) case-folds every
    // later byte) and special groups have their own grammars — any `(?`
    // must bail to the scan, never extract
    assert(requiredLiterals("(?i)vector table").isEmpty)
    assert(requiredLiterals("(?:vec)tor").isEmpty)
    assert(requiredLiterals("a(?=b)c").isEmpty)
    // MULTI-CHAR escapes (\\uXXXX, \\xNN, \\0nnn, \\cX, \\p{..},
    // backreferences) cannot be sized by the scanner — consuming two
    // chars would extract the TAIL as a fake literal ("0076ector") and
    // silently MISS true matches through the index
    assert(requiredLiterals("\\" + "u0076ector").isEmpty)
    assert(requiredLiterals("\\x76ector").isEmpty)
    assert(requiredLiterals("\\075ector").isEmpty)
    assert(requiredLiterals("\\cAvector").isEmpty)
    assert(requiredLiterals("\\p{L}ector").isEmpty)
    assert(requiredLiterals("(ab)\\1cd").isEmpty)
    // one-letter shorthands/anchors still just break the run
    assert(requiredLiterals("vec\\dtor") == Some(Seq("vec", "tor")))
    assert(requiredLiterals("vec\\btor") == Some(Seq("vec", "tor")))
  }

  test("$regex with case-insensitive/escape syntax serves scan-identically through the index") {
    val c = hydrated()
    c.buildDocIndex()
    // (?i) would have confined on lowercase trigrams and silently missed
    // docs; with the bail-out both paths give the verbatim rlike answer
    val pat = "(?i)QUICK b"
    val viaIndex = c.get(whereDoc = Some(MatchesRegex(pat)))
      .select("id").as[String].collect().toSet
    assert(viaIndex == Set("1", "3"))
    // u is 'u' — a confinement that extracted "075ick" would return
    // nothing; the bail-out serves the true matches
    assert(c.get(whereDoc = Some(MatchesRegex("q\\" + "u0075ick")))
      .select("id").as[String].collect().toSet == Set("1", "3"))
  }

  test("gramSets: $regex confines via required literals; $not_regex never") {
    assert(DocIndex.gramSets(MatchesRegex("brown")) ==
      Some(Seq(Seq("bro", "row", "own"))))
    // both required runs' grams land in ONE AND-set
    assert(DocIndex.gramSets(MatchesRegex("qui.*own")) == Some(Seq(Seq("qui", "own"))))
    // runs shorter than a gram contribute nothing; if none survive → scan
    assert(DocIndex.gramSets(MatchesRegex("a.*b")).isEmpty)
    assert(DocIndex.gramSets(MatchesRegex("abc|def")).isEmpty)
    assert(DocIndex.gramSets(NotMatchesRegex("brown")).isEmpty)
  }

  test("$regex through get(): index-confined equals scan, fallback included") {
    val c = hydrated()
    val pat = "qu[a-z]+k b" // requires 'qu' (too short) and 'k b' (gram 'k b')
    val scan = c.get(whereDoc = Some(MatchesRegex(pat)))
      .select("id").as[String].collect().toSet
    assert(scan == Set("1", "3"))
    c.buildDocIndex()
    assert(c.get(whereDoc = Some(MatchesRegex(pat)))
      .select("id").as[String].collect().toSet == scan)
    // confinable composite: regex AND not_contains
    assert(c.get(whereDoc = Some(AndDoc(Seq(
        MatchesRegex("bro[a-z]n"), NotContains("slow")))))
      .select("id").as[String].collect().toSet == Set("1", "3"))
    // unconfinable regex falls back to the scan, verbatim semantics
    assert(c.get(whereDoc = Some(MatchesRegex("jugs$|fox")))
      .select("id").as[String].collect().toSet == Set("1", "2"))
    assert(c.get(whereDoc = Some(NotMatchesRegex("b[or]o?wn")))
      .select("id").as[String].collect().toSet == Set("2", "4"))
  }

  test("index path is gp-partition-confined in the plan") {
    val c = hydrated()
    c.buildDocIndex()
    val plan = c.get(whereDoc = Some(Contains("brown")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("docindex_v"), "the postings read must appear in the plan")
    // the literal gp IN (...) list must reach the scan's partition filters
    assert(plan.contains("PartitionFilters") && plan.contains("gp"),
      s"expected gp partition pruning in:\n$plan")
  }

  test("mutation invalidates the index (stale postings never consulted)") {
    val c = hydrated()
    c.buildDocIndex()
    assert(c.hasDocIndex)
    c.upsert(Seq(("7", "a brand new brown bear")).toDF("id", "document"))
    assert(!c.hasDocIndex) // version moved past the build
    // falls back to the scan and still sees the new row
    assert(c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "3", "5", "7"))
    // rebuild re-adopts on the new version
    c.buildDocIndex()
    assert(c.hasDocIndex)
    assert(c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "3", "5", "7"))
  }

  test("vacuum reclaims superseded doc-index builds but keeps the live one") {
    val c = hydrated()
    c.buildDocIndex()
    c.buildDocIndex() // superseded build of the same version
    c.upsert(Seq(("8", "more text here")).toDF("id", "document"))
    c.buildDocIndex()
    val reclaimed = c.vacuum()
    assert(reclaimed >= 2) // old data version + at least the stale builds
    assert(c.hasDocIndex)
    assert(c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "3", "5"))
  }

  test("refreshDocIndex rebuilds only touched buckets, links the rest, hash-matches the scan") {
    val c = hydrated()
    c.buildDocIndex()
    val root = java.nio.file.Paths.get(c.get().inputFiles.head
      .stripPrefix("file:")).getParent // somewhere under <dir>/data_v...
    // mutate through two commits: one upsert (new id) + one delete —
    // touches at most 2 of the 4 id buckets vs the indexed version
    c.upsert(Seq(("7", "a brand new brown bear")).toDF("id", "document"))
    c.delete(ids = Seq("5"))
    assert(!c.hasDocIndex) // version moved past the build
    val rebuilt = c.refreshDocIndex()
    assert(rebuilt >= 1 && rebuilt <= 2,
      s"expected only the touched buckets to rebuild, got $rebuilt of 4")
    assert(c.hasDocIndex)
    // the refreshed index must serve the post-mutation truth: new row
    // found, deleted row gone, untouched rows intact
    assert(c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "3", "7"))
    // carry-forward is a manifest, not a rewrite: the new build records
    // unchanged gp/pb slices as entries pointing at the OLD build, whose
    // physical slice dirs really hold the bytes
    val dir = root.getParent.getParent // <collection dir>
    val newest = {
      val builds = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        builds.iterator.asScala
          .filter(_.getFileName.toString.startsWith("docindex_v"))
          .toSeq.sortBy(_.getFileName.toString).last
      } finally builds.close()
    }
    val carried = graft.catalog.Carry.read(
      graft.catalog.StoreIO.of(new org.apache.hadoop.fs.Path(newest.toString),
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(newest.toString))
    assert(carried.nonEmpty, "refresh must carry forward unchanged slices by manifest")
    carried.foreach { case (slice, owner) =>
      assert(owner.startsWith("docindex_v000001"),
        s"carried slice $slice must name the prior build, got $owner")
      assert(java.nio.file.Files.isDirectory(dir.resolve(owner).resolve(slice)),
        s"carried slice $slice missing under owner $owner")
    }
    // already current → no-op
    assert(c.refreshDocIndex() == 0)
    // after vacuum reclaims the indexed version (mutate FIRST so the
    // old build's version drops below the cutoff), refresh has no diff
    // basis left → full-rebuild fallback (numBuckets)
    c.upsert(Seq(("9", "yet more brown things")).toDF("id", "document"))
    c.vacuum()
    assert(c.refreshDocIndex() == 4)
    assert(c.get(whereDoc = Some(Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "3", "7", "9"))
  }

  test("short-doc and null-doc rows index to nothing but scan correctly") {
    val c = hydrated()
    c.buildDocIndex()
    // "ox" appears as a substring in docs 1/2/3 ("fox", "box", "boxes") but
    // the query is sub-gram — must take the scan path and still be right
    assert(c.get(whereDoc = Some(Contains("ox")))
      .select("id").as[String].collect().toSet == Set("1", "2", "3", "4"))
  }
}
