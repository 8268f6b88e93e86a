package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference's hydration ETL, re-expressed as declarative Spark ops.
  *
  * Reference behavior (extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas):
  *  - sas:161  select every column whose name contains a substring pattern
  *             (`pandas.filter(like=pattern)`) — the wide embedding columns
  *  - sas:160-163  per row: zip matched columns into one dense vector,
  *             dropping nulls (`dropna().tolist()`)
  *  - sas:178  cast the doc-id column to string (`str(i)`)
  *  - sas:179  the text column becomes the document
  *  - sas:181  optional metadata column wrapped as `{"rating": v}` dicts
  *
  * Unlike the reference (which collects the whole distributed table into one
  * pandas process and loops row-at-a-time), every step here is a narrow
  * projection: no shuffle, no driver materialization, fully codegen'd.
  */
object Assemble {

  /** Columns of `df` whose name contains `pattern` (pandas `filter(like=)`). */
  def columnsLike(df: DataFrame, pattern: String): Seq[String] =
    df.columns.toSeq.filter(_.contains(pattern))

  /** Columns of `df` whose name matches regex (the sas:148 commented variant). */
  def columnsMatching(df: DataFrame, regex: String): Seq[String] = {
    val r = regex.r
    df.columns.toSeq.filter(c => r.findFirstIn(c).isDefined)
  }

  /** Dynamic projection by name pattern — resolved pre-plan from the schema. */
  def projectLike(df: DataFrame, pattern: String): DataFrame =
    df.select(columnsLike(df, pattern).map(col): _*)

  /** Row-wise dense-vector assembly with per-row null drop: the matched wide
    * columns become one ARRAY<FLOAT> with nulls removed (sas:160-163).
    * Ragged output dims are possible by design — validation happens at
    * add-time (SURVEY §7.4.1), exactly as Chroma would reject mixed dims.
    */
  def assembleVector(cols: Seq[String]): Column =
    filter(array(cols.map(c => col(c).cast("float")): _*), x => x.isNotNull)

  /** Assemble from a name pattern over the frame's schema. */
  def assembleVectorLike(df: DataFrame, pattern: String): Column =
    assembleVector(columnsLike(df, pattern))

  /** Doc-id stringification (sas:178 `str(i)`). */
  def idAsString(idCol: String): Column = col(idCol).cast(StringType).as("id")

  /** Metadata map with the reference's hardcoded single key (sas:181). */
  def metadataMap(metaCol: String, key: String = "rating"): Column =
    map(lit(key), col(metaCol).cast(StringType))

  /** Full hydration projection: wide input → collection-row shape
    * `(id STRING, document STRING, embedding ARRAY<FLOAT>, metadata MAP)`.
    * `metadataCol=None` mirrors the reference's no-metadata branch (sas:186).
    */
  def hydrationFrame(
      input: DataFrame,
      docIdCol: String,
      textCol: String,
      embeddingPattern: String,
      metadataCol: Option[String] = None): DataFrame = {
    val meta = metadataCol.fold(lit(null).cast("map<string,string>"))(metadataMap(_))
    input.select(
      idAsString(docIdCol),
      col(textCol).as("document"),
      assembleVectorLike(input, embeddingPattern).as("embedding"),
      meta.as("metadata"))
  }

  /** Documents-only hydration projection — the input shape of server-side
    * -embedding hydration (`add(documents=...)`, the public chromadb route
    * the reference never uses, sas:177-190 always passes vectors): no wide
    * columns, the embedding is computed by the collection's registered
    * [[graft.operators.EmbeddingFunction]] inside the add's write scan. */
  def documentsFrame(
      input: DataFrame,
      docIdCol: String,
      textCol: String,
      metadataCol: Option[String] = None): DataFrame = {
    val meta = metadataCol.fold(lit(null).cast("map<string,string>"))(metadataMap(_))
    input.select(
      idAsString(docIdCol),
      col(textCol).as("document"),
      meta.as("metadata"))
  }

  /** Uniform-dimension validation (Chroma add-time invariant, SURVEY §7.4.1):
    * returns the single dimension, or throws listing offending dims.
    * One map-side `size()` agg — no data movement beyond a tiny agg shuffle.
    */
  def validateUniformDim(df: DataFrame, vecCol: String): Int = {
    val dims = df.select(size(col(vecCol)).as("dim")).distinct().collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    if (dims.contains(-1)) throw new IllegalArgumentException(
      s"null embedding in '$vecCol' — Chroma add() requires a vector per row")
    if (dims.isEmpty) 0 // no rows: nothing to validate
    else if (dims.length != 1) throw new IllegalArgumentException(
      s"ragged embedding dimensions ${dims.sorted.mkString(",")} — Chroma add() requires uniform dim")
    else dims.head
  }
}
