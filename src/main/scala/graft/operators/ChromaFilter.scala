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
}
