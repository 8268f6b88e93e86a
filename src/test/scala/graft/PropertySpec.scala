package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Distances
import graft.operators.{Dedup, Knn, Retrieval}

/** Property-based coverage (SURVEY §5.2): scalacheck generators produce the
  * inputs; each property is checked over the whole generated set in ONE
  * Spark job (per-case jobs would be pathologically slow).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-100f, 100f)).map(_.toSeq)
  private val nonZeroVecGen: Gen[Seq[Float]] =
    vecGen.retryUntil(v => v.exists(x => math.abs(x) > 1e-3))

  private lazy val vecs: Seq[(Long, Seq[Float])] =
    sample(Gen.listOfN(60, nonZeroVecGen), 7L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
  private lazy val vecDf = vecs.toDF("id", "vec")

  test("property: posZero is the identity except on -0.0; roundz never emits -0.0 bits") {
    // values spanning magnitudes, signs, and the rounding boundaries —
    // the in-expression negate keeps computed -0.0 alive before the
    // normalizer (UnsafeRow would scrub a stored one; NegativeZeroSweepSpec
    // documents that dead end)
    val doubles = sample(Gen.listOfN(300,
      Gen.chooseNum(-1e6, 1e6).map(x => x / 997.0)), 11L) ++
      Seq(0.0, 1e-9, -1e-9, 4.9999e-5, -4.9999e-5, 1.5, -1.5)
    val df = doubles.toDF("v")
    // identity: posZero(v) == v bitwise for every v except -0.0 (none
    // stored here — UnsafeRow normalizes — so bitwise equality must hold
    // for ALL rows)
    val changed = df.filter(
      Distances.posZero(col("v")) =!= col("v") ||
        col("v").cast("string") =!= Distances.posZero(col("v")).cast("string")
    ).count()
    assert(changed == 0, "posZero changed a non-negative-zero value")
    // roundz of the NEGATED values (computed -0.0 for v = 0.0, tiny
    // negatives rounding to zero for |v| < 0.5e-4): no output may carry
    // the sign bit on zero
    val negZeroOut = df.select(Distances.roundz(negate(col("v")), 4).as("r"))
      .filter(col("r") === 0.0 && col("r").cast("string").startsWith("-"))
      .count()
    assert(negZeroOut == 0, "roundz emitted a -0.0")
  }

  test("property: d(a,a)=0 (cosine ~0, l2 exactly 0) for all generated vectors") {
    val r = vecDf.select(
      max(abs(Distances.cosineDist(col("vec"), col("vec")))).as("c"),
      max(Distances.l2Sq(col("vec"), col("vec"))).as("l")).head()
    assert(r.getDouble(0) < 1e-9 && r.getDouble(1) == 0.0)
  }

  test("property: symmetry d(a,b)=d(b,a) over all pairs") {
    val pairs = vecDf.as("a").crossJoin(vecDf.as("b"))
    val bad = pairs.filter(
      Distances.cosineDist(col("a.vec"), col("b.vec")) =!=
        Distances.cosineDist(col("b.vec"), col("a.vec")) ||
      Distances.l2Sq(col("a.vec"), col("b.vec")) =!=
        Distances.l2Sq(col("b.vec"), col("a.vec"))).count()
    assert(bad == 0)
  }

  test("property: l2 >= 0 and cosine in [0,2] over all pairs") {
    val pairs = vecDf.as("a").crossJoin(vecDf.as("b"))
    val bad = pairs.filter(
      Distances.l2Sq(col("a.vec"), col("b.vec")) < 0 ||
      Distances.cosineDist(col("a.vec"), col("b.vec")) < -1e-12 ||
      Distances.cosineDist(col("a.vec"), col("b.vec")) > 2 + 1e-12).count()
    assert(bad == 0)
  }

  test("property: kNN result ⊆ corpus, size ≤ k, monotone, no better row left out") {
    val q = vecs(13)._2
    val k = 10
    val res = Knn.topK(vecDf, "id", "vec", q, k, "l2")
      .select("id", "dist").as[(Long, Double)].collect()
    assert(res.length == k && res.map(_._1).toSet.subsetOf(vecs.map(_._1).toSet))
    assert(res.map(_._2).toSeq == res.map(_._2).sorted.toSeq)
    // completeness: every row NOT in the result is at least as far as the kth
    val kth = res.last._2
    val better = vecDf.filter(!col("id").isin(res.map(_._1): _*))
      .filter(Distances.l2Sq(col("vec"), typedLit(q)) < kth).count()
    assert(better == 0)
  }

  test("property: native distance ≡ HOF reference on random vectors (all spaces)") {
    val pairs = vecDf.as("a").crossJoin(vecDf.as("b"))
    val bad = pairs.filter(
      Distances.cosineDist(col("a.vec"), col("b.vec")) =!=
        Distances.cosineDistHof(col("a.vec"), col("b.vec")) ||
      Distances.l2Sq(col("a.vec"), col("b.vec")) =!=
        Distances.l2SqHof(col("a.vec"), col("b.vec")) ||
      Distances.ipDist(col("a.vec"), col("b.vec")) =!=
        Distances.ipDistHof(col("a.vec"), col("b.vec")) ||
      Distances.dot(col("a.vec"), col("b.vec")) =!=
        Distances.dotHof(col("a.vec"), col("b.vec"))).count()
    assert(bad == 0)
  }

  test("property: dedup idempotent and keeps one row per key, for generated dup sets") {
    val texts = sample(Gen.listOfN(120, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta")), 11L)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Dedup.exactDedup(df, Seq("text"), "doc_id")
    val twice = Dedup.exactDedup(once, Seq("text"), "doc_id")
    assert(once.count() == texts.distinct.size)
    assert(once.select("doc_id").as[Long].collect().sorted.toSeq ==
      twice.select("doc_id").as[Long].collect().sorted.toSeq)
    // kept id is the minimum id of its group
    val kept = once.select("text", "doc_id").as[(String, Long)].collect().toMap
    texts.zipWithIndex.groupBy(_._1).foreach { case (t, grp) =>
      assert(kept(t) == grp.map(_._2).min)
    }
  }

  test("property: In/Nin partition the non-null domain") {
    import graft.operators.ChromaFilter
    val langs = sample(Gen.listOfN(200, Gen.oneOf("en", "es", "fr", "de", "pt")), 23L)
    val df = langs.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val inC = df.filter(ChromaFilter.In("lang", Seq("en", "fr")).toColumn).count()
    val ninC = df.filter(ChromaFilter.Nin("lang", Seq("en", "fr")).toColumn).count()
    assert(inC + ninC == 200)
  }

  test("property: whereFromJson parses every rendered Where AST back to itself") {
    import graft.operators.ChromaFilter
    import graft.operators.ChromaFilter._
    // render the wire form a Chroma client sends for a given AST — a
    // test-local twin of the grammar, so the property exercises the
    // parser over the whole shape space (nesting, operator objects,
    // shorthand Eq, escapes, number typing), not a fixed example set
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      } + "\""
    def jval(v: Any): String = v match {
      case s: String => jstr(s)
      case other => other.toString // Long / Double / Boolean
    }
    def render(w: Where): String = w match {
      case Eq(k, v)  => s"{${jstr(k)}: {\"$$eq\": ${jval(v)}}}"
      case Ne(k, v)  => s"{${jstr(k)}: {\"$$ne\": ${jval(v)}}}"
      case Gt(k, v)  => s"{${jstr(k)}: {\"$$gt\": ${jval(v)}}}"
      case Gte(k, v) => s"{${jstr(k)}: {\"$$gte\": ${jval(v)}}}"
      case Lt(k, v)  => s"{${jstr(k)}: {\"$$lt\": ${jval(v)}}}"
      case Lte(k, v) => s"{${jstr(k)}: {\"$$lte\": ${jval(v)}}}"
      case In(k, vs)  => s"{${jstr(k)}: {\"$$in\": [${vs.map(jval).mkString(", ")}]}}"
      case Nin(k, vs) => s"{${jstr(k)}: {\"$$nin\": [${vs.map(jval).mkString(", ")}]}}"
      case And(cs) => s"{\"$$and\": [${cs.map(render).mkString(", ")}]}"
      case Or(cs)  => s"{\"$$or\": [${cs.map(render).mkString(", ")}]}"
    }
    val key = Gen.oneOf("lang", "rating", "a b", "quo\"te", "unié")
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.oneOf("en", "x\"y", "back\\slash", "line\nbreak"),
      Gen.chooseNum(-1000L, 1000L),
      Gen.chooseNum(-10.5, 10.5).map(d => math.round(d * 4) / 4.0), // dyadic — toString round-trips
      Gen.oneOf(true, false))
    val leaf: Gen[Where] = for {
      k <- key; v <- scalar
      mk <- Gen.oneOf[(String, Any) => Where](Eq(_, _), Ne(_, _), Gt(_, _),
        Gte(_, _), Lt(_, _), Lte(_, _))
    } yield mk(k, v)
    val inLeaf: Gen[Where] = for {
      k <- key; vs <- Gen.nonEmptyListOf(scalar).map(_.take(4))
      mk <- Gen.oneOf[(String, Seq[Any]) => Where](In(_, _), Nin(_, _))
    } yield mk(k, vs)
    def tree(depth: Int): Gen[Where] =
      if (depth <= 0) Gen.oneOf(leaf, inLeaf)
      else Gen.frequency(
        3 -> leaf, 1 -> inLeaf,
        1 -> Gen.nonEmptyListOf(tree(depth - 1)).map(cs => And(cs.take(3))),
        1 -> Gen.nonEmptyListOf(tree(depth - 1)).map(cs => Or(cs.take(3))))
    val asts = sample(Gen.listOfN(80, tree(3)), 47L)
    asts.foreach { w =>
      val parsed = ChromaFilter.whereFromJson(render(w))
      assert(parsed == w, s"round-trip diverged for ${render(w)}: got $parsed")
    }
    // the shorthand form {"k": v} parses as Eq
    assert(ChromaFilter.whereFromJson("""{"lang": "en"}""") == Eq("lang", "en"))
  }

  test("property: requiredLiterals is SOUND — every matching doc contains every extracted literal") {
    import graft.operators.DocIndex
    // random regex ASTs over a tiny alphabet, rendered to patterns, and
    // random docs over the same alphabet: whenever the pattern MATCHES a
    // doc (partial match, rlike semantics), the doc must contain every
    // extracted required literal — the property the trigram confinement's
    // correctness rests on (a missed-match would be a silent wrong
    // answer through the index, not a slow one)
    val atom: Gen[String] = Gen.frequency(
      6 -> Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(4).mkString),
      1 -> Gen.const("."),
      1 -> Gen.const("[ab]"),
      1 -> Gen.const("\\d"),
      // multi-char escapes and inline flags: the extractor must bail
      // (None), never mis-extract — covered by the same soundness check
      1 -> Gen.oneOf("\\" + "u0061", "\\x62", "(?i)a", "(?:ab)"))
    val piece: Gen[String] = for {
      a <- atom
      q <- Gen.frequency(5 -> Gen.const(""), 1 -> Gen.const("*"),
        1 -> Gen.const("+"), 1 -> Gen.const("?"))
    } yield a + q
    val grouped: Gen[String] = for {
      l <- Gen.nonEmptyListOf(piece).map(_.take(3).mkString)
      r <- Gen.nonEmptyListOf(piece).map(_.take(3).mkString)
      q <- Gen.oneOf("", "?", "*")
    } yield s"($l|$r)$q"
    val pattern: Gen[String] =
      Gen.nonEmptyListOf(Gen.frequency(4 -> piece, 1 -> grouped))
        .map(_.take(5).mkString)
    val doc: Gen[String] =
      Gen.listOf(Gen.oneOf('a', 'b', 'c', 'a', 'b', '1', ' ')).map(_.take(24).mkString)
    val pats = sample(Gen.listOfN(600, pattern), 83L)
    val docs = sample(Gen.listOfN(60, doc), 89L)
    var matched = 0
    pats.foreach { p =>
      val re = java.util.regex.Pattern.compile(p)
      DocIndex.requiredLiterals(p).foreach { lits =>
        docs.foreach { d =>
          if (re.matcher(d).find()) {
            matched += 1
            lits.foreach(l => assert(d.contains(l),
              s"UNSOUND: '$d' matches /$p/ but lacks required literal '$l' " +
                s"(extracted ${lits.mkString("[", ",", "]")})"))
          }
        }
      }
    }
    assert(matched > 50, s"generator too weak: only $matched matching pairs")
  }

  test("property: jaccard(a,a)=1, jaccard bounded [0,1]") {
    val toks = sample(Gen.listOfN(40,
      Gen.nonEmptyListOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6")).map(_.toSeq)), 31L)
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    val selfBad = df.filter(Dedup.jaccard(col("toks"), col("toks")) =!= 1.0).count()
    assert(selfBad == 0)
    val pairs = df.as("a").crossJoin(df.as("b"))
    val rangeBad = pairs.filter(
      Dedup.jaccard(col("a.toks"), col("b.toks")) < 0 ||
      Dedup.jaccard(col("a.toks"), col("b.toks")) > 1).count()
    assert(rangeBad == 0)
  }

  test("property: int8 quantization error <= scale/2 and codes in [-127,127]") {
    import graft.operators.Ann
    val q = vecDf.select(col("id"), col("vec"),
        Ann.quantizeInt8(col("vec")).as("q"))
      .select(col("vec"), Ann.dequantizeInt8(col("q")).as("de"),
        col("q.scale").as("s"), col("q.codes").as("codes"))
    // one job checks every generated vector: worst |x - de_j| vs scale/2,
    // and the code range (round(x/scale) can only reach ±127 by design)
    val bad = q.filter(
      exists(zip_with(col("vec"), col("de"),
          (x, d) => abs(x.cast("double") - d) > col("s") / 2 + lit(1e-12)),
        identity) ||
      exists(col("codes"), c => abs(c) > 127)).count()
    assert(bad == 0)
  }

  test("property: dupClusters matches a local BFS reference on random graphs") {
    // one distributed run over the UNION of several random graphs (node ids
    // offset per graph so components cannot bridge graphs) — one Spark job,
    // many independent random cases
    val edgeGen = for {
      n <- Gen.chooseNum(2, 24)
      m <- Gen.chooseNum(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield es.distinct
    val graphs = sample(Gen.listOfN(12, edgeGen), 11L).zipWithIndex
      .map { case (es, g) => es.map { case (a, b) => (a + g * 1000L, b + g * 1000L) } }
    val allEdges = graphs.flatten
    // local reference: union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    // find() roots are always component minima here because unions always
    // point the larger root at the smaller — matching dupClusters' contract
    val got = Dedup.dupClusters(allEdges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("property: repetitionSignals matches a brute-force reference on random token streams") {
    // small vocab forces real repetition; lengths 0..12 hit every
    // too-short-for-n edge (0,1 tokens; exactly n tokens; n-1 tokens)
    val docGen = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "d")).map(_.mkString(" ")))
    val docs = sample(Gen.listOfN(80, docGen), 13L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    def grams(text: String, n: Int): Seq[String] = {
      val w = text.split(" ", -1) // Spark split keeps trailing empties
      if (w.length < n) Seq.empty
      else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
    }
    def topFrac(text: String, n: Int): Double =
      if (text.isEmpty) 0.0
      else {
        // most frequent gram; ties on count -> longest gram. NOTE: toSeq
        // first — mapping a Map to (cnt, len) pairs would collapse grams
        // that share a count into one entry
        val cs = grams(text, n).groupBy(identity).toSeq
          .map { case (g, o) => (o.length.toLong, g.length.toLong) }
        if (cs.isEmpty) 0.0
        else { val (c, l) = cs.max; (c * l).toDouble / text.length }
      }
    def dupFrac(text: String, n: Int): Double =
      if (text.isEmpty) 0.0
      else grams(text, n).groupBy(identity).collect {
        case (g, o) if o.length >= 2 => o.length.toLong * g.length
      }.sum.toDouble / text.length
    val want = docs.map { case (id, t) =>
      id -> ((topFrac(t, 2), topFrac(t, 3), dupFrac(t, 5)))
    }.toMap
    val got = graft.functions.TextAnalysis
      .repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Double, Double, Double)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(got.keySet == want.keySet)
    val bad = want.collect { case (id, w) if got(id) != w => (id, docs(id.toInt)._2, w, got(id)) }
    assert(bad.isEmpty, s"divergences: ${bad.take(5).mkString("\n")}")
  }

  // local replica of the engine-portable spread hash (StrHash + 31-bit
  // clamp + multiplicative mix) — the reference side of the sketch/LM
  // properties below hashes with the SAME formula, so collisions fold
  // identically on both sides
  private def localSpread(s: String): Long = {
    val raw = s.zipWithIndex.map { case (c, i) =>
      c.toLong * (((i * 131) % 997) + 1)
    }.sum
    ((raw % 2147483647L) * 2654435761L) % 1000000007L
  }

  test("property: retentionCohorts matches a local reference on random event sets") {
    val day = 86400000000L
    val evGen = for {
      u <- Gen.chooseNum(0L, 19L)
      d <- Gen.chooseNum(0L, 9L)
      off <- Gen.chooseNum(0L, day - 1)
    } yield (u, d * day + off)
    val events = sample(Gen.listOfN(300, evGen), 17L)
    val ud = events.map { case (u, us) => (u, us / day) }.distinct
    val cohort = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohort.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    val want = ud.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .map { case ((c, off), rows) =>
        val nAct = rows.size.toLong
        (c, off) -> ((sizes(c), nAct,
          BigDecimal.valueOf(nAct.toDouble / sizes(c).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    val got = graft.operators.Events
      .retentionCohorts(events.toDF("user_id", "us"), "user_id", "us")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (c, off, n, a, r) => (c, off) -> ((n, a, r)) }.toMap
    assert(got == want, s"retention divergence: ${(got.toSet diff want.toSet).take(3)}")
  }

  test("property: kmvPairwiseOverlap exact branch equals naive set ops on random groups") {
    // value pool of 20 << k = 32: every sketch is exhaustive, so union /
    // jaccard / intersection must be EXACT (over hashed values — the
    // reference hashes identically so collisions cancel)
    val rowGen = for {
      g <- Gen.oneOf("g0", "g1", "g2", "g3")
      v <- Gen.chooseNum(0, 19).map(i => s"value_$i")
    } yield (g, v)
    val rows = sample(Gen.listOfN(200, rowGen), 19L)
    val sets = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => localSpread(r._2)).toSet }
    val want = sets.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      val (u, i) = (sets(a) union sets(b), sets(a) intersect sets(b))
      val j = BigDecimal.valueOf(i.size.toDouble / u.size.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val uEst = u.size.toDouble
      (a, b) -> ((u.size.toLong, j, uEst,
        BigDecimal.valueOf(j * uEst)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = graft.operators.Sketches
      .kmvPairwiseOverlap(rows.toDF("g", "v"), "g", col("v"), k = 32)
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map { case (a, b, n, j, u, i) => (a, b) -> ((n, j, u, i)) }.toMap
    assert(got == want, s"overlap divergence: ${(got.toSet diff want.toSet).take(3)}")
  }

  test("property: bigramLmScore matches a local reference on random token docs") {
    val docGen = Gen.chooseNum(0, 10).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "d", "ee")).map(_.mkString(" ")))
    val docs = sample(Gen.listOfN(60, docGen), 23L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val hashed = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq.map(localSpread) }
    val c1 = hashed.flatMap(_._2).groupBy(identity).map { case (h, o) => h -> o.size.toLong }
    val bgs = hashed.map { case (id, hs) => id -> hs.zip(hs.drop(1)) }
    val c2 = bgs.flatMap(_._2).groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val want = bgs.map { case (id, bg) =>
      if (bg.isEmpty) id -> ((0L, None: Option[Double]))
      else {
        val sr = bg.map { p =>
          BigDecimal.valueOf(c2(p).toDouble / c1(p._1).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        val sm = (sr * BigDecimal(1000000)).toLongExact
        id -> ((bg.size.toLong,
          Some((sm / bg.size).toDouble / 1000000.0)))
      }
    }.toMap
    val got = graft.operators.Lm
      .bigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(got == want,
      s"LM divergence: ${(got.toSet diff want.toSet).take(3)} vs ${(want.toSet diff got.toSet).take(3)}")
  }

  test("property: hash-embed is a signed token count — L1 ≤ tokens, local ref agrees") {
    import graft.expressions.HashEmbed
    val textGen = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "x", "yz", "", " ")).map(_.mkString(" "))
    val texts = sample(Gen.listOfN(50, textGen), 11L)
    // local reference: per-token strhash/bucket/sign, independently coded
    def ref(t: String, dim: Int): Seq[Float] = {
      val acc = new Array[Int](dim)
      t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = tok.zipWithIndex.map { case (c, i) => c.toLong * (((i * 131) % 997) + 1) }.sum
        acc((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1 else -1)
      }
      acc.map(_.toFloat).toSeq
    }
    texts.foreach { t =>
      // exercise the CALLER path (embedOne lowercases, then embeds) so
      // subject and reference agree by construction: raw HashEmbed.embed
      // does NOT lowercase, and comparing it against a lowercasing ref
      // only passed by modular coincidence ('a'-'A' = 32 ≡ 0 mod 16 and
      // shifts h/16 by an even amount — any dim not dividing 32 breaks)
      val v = graft.operators.HashingEmbedder(16).embedOne(t)
      assert(v == ref(t, 16), s"embed mismatch on '$t'")
      val nTok = t.split("\\s+").count(_.nonEmpty)
      assert(v.map(f => math.abs(f.toInt)).sum <= nTok)
    }
  }

  test("property: mmr with λ=1 IS the plain similarity top-k; selection ⊆ candidates") {
    import graft.operators.Retrieval
    val q = sample(nonZeroVecGen, 23L)
    val relevance = Retrieval.mmr(vecDf, "id", "vec", q, k = 10, fetchN = 20, lambda = 1.0)
      .orderBy("rnk").select("id").as[Long].collect().toSeq
    val plainTopK = vecDf
      .select(col("id"), Distances.cosineSim(col("vec"), typedLit(q)).as("s"))
      .orderBy(col("s").desc, col("id")).limit(10)
      .select("id").as[Long].collect().toSeq
    assert(relevance == plainTopK)
    // any λ: selected ids are distinct and drawn from the top-fetchN pool
    val pool = vecDf
      .select(col("id"), Distances.cosineSim(col("vec"), typedLit(q)).as("s"))
      .orderBy(col("s").desc, col("id")).limit(20)
      .select("id").as[Long].collect().toSet
    val diverse = Retrieval.mmr(vecDf, "id", "vec", q, k = 10, fetchN = 20, lambda = 0.3)
      .select("id").as[Long].collect().toSeq
    assert(diverse.distinct.size == diverse.size)
    assert(diverse.toSet.subsetOf(pool))
  }

  test("property: KeywordIndex bm25 ≡ Retrieval scan bm25 bit-for-bit on random corpora") {
    // random corpora over a small vocabulary (guaranteed term overlap,
    // repeats → tf>1, shared terms → df>1) + random case/whitespace noise;
    // the sidecar must reproduce the scan's (id, rnk, score) EXACTLY —
    // raw doubles, not rounded — across several generated worlds
    val vocab = Vector("hash", "join", "stream", "sort", "merge", "SCAN", "Shuffle")
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
      sep <- Gen.oneOf(" ", "  ", " \t ")
    } yield ws.mkString(sep)
    for (seed <- 11L to 13L) {
      val texts = sample(Gen.listOfN(40, docGen), seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toString, t) }.toDF("id", "document")
      val terms = Seq("hash", "join", "scan") // note: lowercased query side
      val path = tmpDir(s"kwx-prop-$seed")
      graft.operators.KeywordIndex.writeWithPb(docs, "id", "document",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("id")), lit(3)), path)
      val scan = graft.operators.Retrieval.bm25TopK(docs, "id", "document", terms, 15)
        .collect().map(r => (r.getString(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
      val idx = graft.operators.KeywordIndex.bm25TopK(
          spark.read.parquet(path), terms, 15)
        .collect().map(r => (r.getString(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
      assert(idx.toSeq == scan.toSeq, s"seed $seed diverged")
    }
  }

  test("property: format(graft) write→read is lossless; upsert is latest-wins vs a map reference") {
    // random batches (int ids — the write canonicalizes to string),
    // create + overlapping upsert through the plain-SQL surface; the
    // read-back must equal the two-map merge a local reference computes
    val rowsGen = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0, 40)
        s <- Gen.chooseNum(0, 9)
      } yield (id, s))
    } yield rows.distinctBy(_._1) // base add rejects in-batch dup ids
    for (seed <- 41L to 43L) {
      val base = sample(rowsGen, seed)
      val up = sample(rowsGen, seed + 100)
      val r = tmpDir(s"dsw-prop-$seed")
      base.toDF("id", "stars").write.format("graft")
        .option("root", r).option("name", "p").option("buckets", "3").save()
      up.toDF("id", "stars").write.format("graft")
        .option("root", r).option("name", "p")
        .mode("append").option("upsert", "true").save()
      val expect = (base.map { case (i, s) => (i.toString, s) }.toMap ++
        up.map { case (i, s) => (i.toString, s) }.toMap).toSeq.sorted
      val got = spark.read.format("graft")
        .option("root", r).option("name", "p").load()
        .collect().map(x => (x.getString(0), x.getInt(1))).toSeq.sorted
      assert(got == expect, s"seed $seed diverged")
    }
  }

  test("property: rrf fusion — list-order invariant, local reference, rrfK monotone, deterministic order") {
    val ids = (0 until 40).map(i => f"d$i%02d")
    // three overlapping ranked lists: random 25-of-40 member sets, ranks
    // 1..25 in pick order (distinct per list — the rank-list contract)
    def genList(seed: Long): Seq[(String, Int)] =
      sample(Gen.pick(25, ids), seed).toSeq.zipWithIndex
        .map { case (id, i) => (id, i + 1) }
    val (a, b, c) = (genList(13L), genList(29L), genList(31L))
    val (da, db, dc) = (a.toDF("id", "rnk"), b.toDF("id", "rnk"), c.toDF("id", "rnk"))
    def fused(dfs: Seq[org.apache.spark.sql.DataFrame], k: Int = 60): Map[String, Double] =
      Retrieval.rrf(dfs, "id", "rnk", k).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val f = fused(Seq(da, db, dc))
    // 1. fusion is invariant under list order (score magnitudes are
    //    per-list; the outer merge is symmetric; round(6) absorbs the
    //    fold-order ulps)
    assert(f == fused(Seq(dc, da, db)))
    // 2. local reference: score(id) = Σ_lists 1/(60 + rnk), absent = 0,
    //    rounded exactly as the engine rounds (BigDecimal HALF_UP)
    def contrib(l: Seq[(String, Int)], id: String): Double =
      l.collectFirst { case (`id`, r) => 1.0 / (60.0 + r) }.getOrElse(0.0)
    val ref = (a ++ b ++ c).map(_._1).distinct.map { id =>
      id -> BigDecimal(contrib(a, id) + contrib(b, id) + contrib(c, id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(f == ref)
    // 3. rrfK monotonicity: a larger k shrinks every contribution, so no
    //    fused score may grow and the total strictly falls
    val f200 = fused(Seq(da, db, dc), 200)
    assert(f.keySet == f200.keySet)
    assert(f200.forall { case (id, s) => s <= f(id) })
    assert(f200.values.sum < f.values.sum)
    // 4. the presentation order (rrf DESC, id) is a total order: two
    //    independent runs collect the identical sequence
    def ordered() = Retrieval.rrf(Seq(da, db, dc), "id", "rnk")
      .orderBy(col("rrf").desc, col("id")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(ordered() == ordered())
  }
}
