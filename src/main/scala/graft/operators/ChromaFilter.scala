package graft.operators

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.functions._

/** The Chroma `where` / `where_document` filter language, translated to
  * Catalyst `Column` predicates.
  *
  * The reference hydrates a Chroma collection
  * (extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas:132,177-190) whose
  * public query API accepts:
  *   where:          $eq $ne $gt $gte $lt $lte $in $nin  +  $and $or
  *   where_document: $contains $not_contains
  * Here each operator is an ADT node that compiles to a plain `Column`, so the
  * whole predicate participates in Catalyst pushdown (reaches the parquet
  * scan as PushedFilters) — unlike Chroma, which evaluates it row-by-row in
  * SQLite.
  *
  * In Chroma, `where` keys name METADATA entries. A key resolver maps the
  * key to a Column: the default is a plain column reference (metadata stored
  * flat, the pushdown-friendly layout); collections carrying a
  * `MAP<STRING,STRING>` metadata column resolve misses via `element_at`
  * (see [[graft.catalog.Collection]]).
  */
object ChromaFilter {

  type KeyResolver = String => Column

  sealed trait Where {
    def toColumnWith(r: KeyResolver): Column
    final def toColumn: Column = toColumnWith(col)
  }

  private def isNumericLit(v: Any): Boolean = v match {
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double => true
    case _: java.math.BigDecimal => true
    case _: BigDecimal => true
    case _ => false
  }

  /** Contract for [[KeyResolver]] implementations: a resolver that serves
    * metadata from a string-valued MAP must build the lookup with
    * `element_at`/`try_element_at`/`getItem`/`get` (the shapes detected
    * here) so comparisons get Chroma's typed semantics. Flat typed
    * columns resolve as plain references and keep native comparisons
    * (and full scan pushdown). */
  private def isMapLookup(c: Column): Boolean =
    GraftColumnShim.isFunctionCall(c, Set("element_at", "try_element_at", "get")) ||
      GraftColumnShim.isExtractValue(c)

  /** Ordering-comparison operands, Chroma-typed. Chroma compares typed
    * metadata numerically; on the `MAP<STRING,STRING>` layout the stored
    * value is a string, so a numeric filter literal makes BOTH sides
    * try-cast to double — rows whose value doesn't parse simply don't
    * match (Chroma's typed behavior), instead of Spark's default
    * coercion, which orders lexicographically in the worst case
    * ("10" < "9") and can throw under ANSI on unparsable strings.
    * Typed flat columns keep the native comparison so the predicate still
    * reaches the parquet scan as a PushedFilter; string literals against
    * map values intentionally stay string-ordered (documented). */
  private def ordSides(c: Column, v: Any): (Column, Column) =
    if (isNumericLit(v) && isMapLookup(c)) (c.try_cast("double"), lit(v).cast("double"))
    else (c, lit(v))

  final case class Eq(key: String, v: Any)  extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l === rr } }
  final case class Ne(key: String, v: Any)  extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l =!= rr } }
  final case class Gt(key: String, v: Any)  extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l > rr } }
  final case class Gte(key: String, v: Any) extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l >= rr } }
  final case class Lt(key: String, v: Any)  extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l < rr } }
  final case class Lte(key: String, v: Any) extends Where { def toColumnWith(r: KeyResolver): Column = { val (l, rr) = ordSides(r(key), v); l <= rr } }
  // $in/$nin: an all-numeric value list against a map-backed key compares
  // numerically (same try_cast as the ordering ops); Chroma doesn't allow
  // mixed-type lists, so a mixed list just takes the native path
  private def toDouble(v: Any): Double = v match {
    case b: BigDecimal => b.toDouble
    case n: java.lang.Number => n.doubleValue
    case other => sys.error(s"not numeric: $other")
  }

  private def inSides(c: Column, vs: Seq[Any]): Column =
    if (vs.nonEmpty && vs.forall(isNumericLit) && isMapLookup(c))
      c.try_cast("double").isin(vs.map(toDouble): _*)
    else c.isin(vs: _*)

  final case class In(key: String, vs: Seq[Any])  extends Where { def toColumnWith(r: KeyResolver): Column = inSides(r(key), vs) }
  final case class Nin(key: String, vs: Seq[Any]) extends Where { def toColumnWith(r: KeyResolver): Column = !inSides(r(key), vs) }
  final case class And(cs: Seq[Where]) extends Where { def toColumnWith(r: KeyResolver): Column = cs.map(_.toColumnWith(r)).reduce(_ && _) }
  final case class Or(cs: Seq[Where])  extends Where { def toColumnWith(r: KeyResolver): Column = cs.map(_.toColumnWith(r)).reduce(_ || _) }

  sealed trait WhereDocument { def toColumn(docCol: Column): Column }

  final case class Contains(s: String) extends WhereDocument {
    def toColumn(docCol: Column): Column = docCol.contains(s)
  }
  final case class NotContains(s: String) extends WhereDocument {
    def toColumn(docCol: Column): Column = !docCol.contains(s)
  }
  /** `$regex` (current chromadb parity, beside `$contains`): partial-
    * match semantics — the document matches if the pattern matches ANY
    * substring (Chroma/SQLite REGEXP, DuckDB `regexp_matches`, Spark
    * `rlike` all agree on partial match). The pattern evaluates under
    * Spark's engine (java.util.regex); oracle-shared patterns must stay
    * inside the RE2-compatible subset (no lookaround/backrefs — the q167
    * pattern-sharing discipline). Confinable through the trigram postings
    * index via [[DocIndex.requiredLiterals]] (extracted required literal
    * runs → gram sets; anything non-extractable falls back to the scan,
    * and callers ALWAYS re-apply this verbatim predicate). */
  final case class MatchesRegex(pattern: String) extends WhereDocument {
    def toColumn(docCol: Column): Column = docCol.rlike(pattern)
  }
  final case class NotMatchesRegex(pattern: String) extends WhereDocument {
    def toColumn(docCol: Column): Column = !docCol.rlike(pattern)
  }
  final case class AndDoc(cs: Seq[WhereDocument]) extends WhereDocument {
    def toColumn(docCol: Column): Column = cs.map(_.toColumn(docCol)).reduce(_ && _)
  }
  final case class OrDoc(cs: Seq[WhereDocument]) extends WhereDocument {
    def toColumn(docCol: Column): Column = cs.map(_.toColumn(docCol)).reduce(_ || _)
  }

  /** Combine optional where + where_document into one pushdown-able predicate. */
  def predicate(
      where: Option[Where],
      whereDoc: Option[WhereDocument],
      docCol: Column,
      resolver: KeyResolver = col): Option[Column] = {
    val parts = where.map(_.toColumnWith(resolver)).toSeq ++
      whereDoc.map(_.toColumn(docCol)).toSeq
    parts.reduceOption(_ && _)
  }

  // ---- Chroma wire format: JSON → Where / WhereDocument -------------------
  //
  // The literal JSON shapes Chroma's HTTP API and clients send —
  //   {"lang": "en"}                      {"rating": {"$gte": 4}}
  //   {"lang": {"$in": ["en", "fr"]}}     {"$and": [w1, w2]}  {"$or": [...]}
  //   {"$contains": "spark"}              {"$not_contains": "x"}  (documents)
  // — parsed into the ADT above, so a pure-SQL surface (the graft_bm25 /
  // graft_hybrid table functions) and a future REST ingress share ONE
  // written form of the wire grammar. Chroma's own validation rules hold:
  // a where object has EXACTLY one key (conjunction is explicit $and), and
  // values are scalars (string / number / boolean). Numbers parse as Long
  // when integral, Double otherwise (Chroma's int/float metadata split).

  def whereFromJson(json: String): Where = {
    val (v, rest) = JsonMini.parse(json)
    JsonMini.requireEnd(rest, json)
    whereOf(v)
  }

  def whereDocFromJson(json: String): WhereDocument = {
    val (v, rest) = JsonMini.parse(json)
    JsonMini.requireEnd(rest, json)
    whereDocOf(v)
  }

  private def whereOf(v: Any): Where = v match {
    case obj: Map[_, _] =>
      val m = obj.asInstanceOf[Map[String, Any]]
      require(m.size == 1,
        s"a where object must have exactly one key (use $$and/$$or to combine), got ${m.keys.mkString(", ")}")
      m.head match {
        // Chroma rejects empty operator lists ("Expected ... to be a
        // non-empty list") — and And(Nil).toColumnWith would crash with a
        // bare empty.reduce, escaping the parser's loud-error contract
        case (op @ ("$and" | "$or"), vs: Seq[_]) if vs.isEmpty =>
          throw new IllegalArgumentException(s"$op expects a NON-EMPTY array of where objects")
        case ("$and", vs: Seq[_]) => And(vs.map(whereOf))
        case ("$or", vs: Seq[_])  => Or(vs.map(whereOf))
        case (op @ ("$and" | "$or"), bad) => throw new IllegalArgumentException(
          s"$op expects an array of where objects, got $bad")
        // any OTHER `$`-prefixed key is an operator in the wrong position
        // — whether its value is a scalar ({"$contains": "x"} passed as
        // where) or an operator object ({"$lang": {"$eq": "en"}} typo).
        // This arm must sit BEFORE the operator-object arm: metadata keys
        // may not start with '$', and Eq("$contains", ...) would silently
        // match nothing on the map layout.
        case (key, x) if key.startsWith("$") => throw new IllegalArgumentException(
          s"unknown where operator '$key' (value $x) — metadata keys may not start with '$$'" +
            (if (key == "$contains" || key == "$not_contains" ||
                 key == "$regex" || key == "$not_regex")
               "; document operators belong in where_document, not where" else ""))
        case (key, op: Map[_, _]) =>
          val o = op.asInstanceOf[Map[String, Any]]
          require(o.size == 1,
            s"operator object for '$key' must have exactly one operator, got ${o.keys.mkString(", ")}")
          o.head match {
            case ("$eq", x)  => Eq(key, scalar(x, key))
            case ("$ne", x)  => Ne(key, scalar(x, key))
            case ("$gt", x)  => Gt(key, scalar(x, key))
            case ("$gte", x) => Gte(key, scalar(x, key))
            case ("$lt", x)  => Lt(key, scalar(x, key))
            case ("$lte", x) => Lte(key, scalar(x, key))
            // Chroma: "$in/$nin value must be a non-empty list"; an empty
            // isin() would silently match nothing/everything instead
            case (op @ ("$in" | "$nin"), xs: Seq[_]) if xs.isEmpty =>
              throw new IllegalArgumentException(
                s"$op for key '$key' expects a NON-EMPTY array of scalars")
            case ("$in", xs: Seq[_])  => In(key, xs.map(scalar(_, key)))
            case ("$nin", xs: Seq[_]) => Nin(key, xs.map(scalar(_, key)))
            case (o2, x) => throw new IllegalArgumentException(
              s"unknown where operator '$o2' for key '$key' (value $x)")
          }
        case (key, x) => Eq(key, scalar(x, key)) // {"lang": "en"} shorthand
      }
    case other => throw new IllegalArgumentException(
      s"a where filter must be a JSON object, got $other")
  }

  private def whereDocOf(v: Any): WhereDocument = v match {
    case obj: Map[_, _] =>
      val m = obj.asInstanceOf[Map[String, Any]]
      require(m.size == 1,
        s"a where_document object must have exactly one key, got ${m.keys.mkString(", ")}")
      m.head match {
        case ("$contains", s: String)     => Contains(s)
        case ("$not_contains", s: String) => NotContains(s)
        case ("$regex", s: String)        => MatchesRegex(s)
        case ("$not_regex", s: String)    => NotMatchesRegex(s)
        case (op @ ("$and" | "$or"), vs: Seq[_]) if vs.isEmpty =>
          throw new IllegalArgumentException(s"$op expects a NON-EMPTY array")
        case ("$and", vs: Seq[_]) => AndDoc(vs.map(whereDocOf))
        case ("$or", vs: Seq[_])  => OrDoc(vs.map(whereDocOf))
        case (op, x) => throw new IllegalArgumentException(
          s"unknown where_document operator '$op' (value $x)")
      }
    case other => throw new IllegalArgumentException(
      s"a where_document filter must be a JSON object, got $other")
  }

  private def scalar(v: Any, key: String): Any = v match {
    case s: String => s
    case l: Long => l
    case d: Double => d
    case b: Boolean => b
    case other => throw new IllegalArgumentException(
      s"metadata filter values must be scalars; key '$key' got $other")
  }

  /** A minimal recursive-descent JSON reader for the wire filters: objects
    * → Map[String, Any] (insertion order irrelevant — filter objects are
    * single-key by contract), arrays → Seq[Any], strings with the standard
    * escapes, numbers → Long when integral / Double otherwise, true/false/
    * null. No dependency, deterministic errors with offsets. */
  private[graft] object JsonMini {
    def parse(s: String): (Any, Int) = value(s, ws(s, 0))

    def requireEnd(pos: Int, s: String): Unit = {
      val p = ws(s, pos)
      require(p == s.length, s"trailing content at offset $p in filter JSON: '$s'")
    }

    private def ws(s: String, i: Int): Int = {
      var p = i
      while (p < s.length && Character.isWhitespace(s(p))) p += 1
      p
    }

    private def value(s: String, i: Int): (Any, Int) = {
      require(i < s.length, s"unexpected end of filter JSON: '$s'")
      s(i) match {
        case '{' => obj(s, i + 1)
        case '[' => arr(s, i + 1)
        case '"' => str(s, i + 1)
        case 't' => require(s.startsWith("true", i), bad(s, i)); (true, i + 4)
        case 'f' => require(s.startsWith("false", i), bad(s, i)); (false, i + 5)
        case 'n' => require(s.startsWith("null", i), bad(s, i)); (null, i + 4)
        case c if c == '-' || c.isDigit => num(s, i)
        case _ => throw new IllegalArgumentException(bad(s, i))
      }
    }

    private def bad(s: String, i: Int) =
      s"unexpected character '${s(i)}' at offset $i in filter JSON: '$s'"

    private def obj(s: String, i0: Int): (Map[String, Any], Int) = {
      var p = ws(s, i0)
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      if (p < s.length && s(p) == '}') return (out.toMap, p + 1)
      while (true) {
        require(p < s.length && s(p) == '"', s"expected a key at offset $p in '$s'")
        val (k, p1) = str(s, p + 1)
        p = ws(s, p1)
        require(p < s.length && s(p) == ':', s"expected ':' at offset $p in '$s'")
        val (v, p2) = value(s, ws(s, p + 1))
        // last-wins would let {"a": 1, "a": 2} slip past the exactly-one-
        // key validation as Eq(a, 2) while two DISTINCT keys fail loudly
        require(!out.contains(k),
          s"duplicate key '$k' in filter JSON object: '$s'")
        out(k) = v
        p = ws(s, p2)
        require(p < s.length, s"unterminated object in filter JSON: '$s'")
        if (s(p) == '}') return (out.toMap, p + 1)
        require(s(p) == ',', s"expected ',' or '}' at offset $p in '$s'")
        p = ws(s, p + 1)
      }
      sys.error("unreachable")
    }

    private def arr(s: String, i0: Int): (Seq[Any], Int) = {
      var p = ws(s, i0)
      val out = Seq.newBuilder[Any]
      if (p < s.length && s(p) == ']') return (out.result(), p + 1)
      while (true) {
        val (v, p1) = value(s, p)
        out += v
        p = ws(s, p1)
        require(p < s.length, s"unterminated array in filter JSON: '$s'")
        if (s(p) == ']') return (out.result(), p + 1)
        require(s(p) == ',', s"expected ',' or ']' at offset $p in '$s'")
        p = ws(s, p + 1)
      }
      sys.error("unreachable")
    }

    private def str(s: String, i0: Int): (String, Int) = {
      val sb = new StringBuilder
      var p = i0
      while (p < s.length && s(p) != '"') {
        if (s(p) == '\\') {
          require(p + 1 < s.length, s"dangling escape in filter JSON: '$s'")
          s(p + 1) match {
            case 'u' =>
              require(p + 5 < s.length, s"bad \\u escape in filter JSON: '$s'")
              sb.append(Integer.parseInt(s.substring(p + 2, p + 6), 16).toChar); p += 6
            case 'n' => sb.append('\n'); p += 2
            case 't' => sb.append('\t'); p += 2
            case 'r' => sb.append('\r'); p += 2
            case 'b' => sb.append('\b'); p += 2
            case 'f' => sb.append('\f'); p += 2
            case c @ ('"' | '\\' | '/') => sb.append(c); p += 2
            case c => throw new IllegalArgumentException(
              s"unknown escape '\\$c' in filter JSON: '$s'")
          }
        } else { sb.append(s(p)); p += 1 }
      }
      require(p < s.length, s"unterminated string in filter JSON: '$s'")
      (sb.toString, p + 1)
    }

    private def num(s: String, i0: Int): (Any, Int) = {
      var p = i0
      if (p < s.length && s(p) == '-') p += 1
      while (p < s.length && (s(p).isDigit || "+-.eE".contains(s(p)))) p += 1
      val raw = s.substring(i0, p)
      val v: Any =
        if (raw.exists(c => c == '.' || c == 'e' || c == 'E')) raw.toDouble
        else scala.util.Try(raw.toLong).getOrElse(raw.toDouble)
      (v, p)
    }
  }
}
