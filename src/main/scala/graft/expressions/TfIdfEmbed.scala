package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A FITTED text-embedding model: TF-IDF term weighting over a corpus-
  * learned vocabulary, projected to `dim` axes by sign random projection
  * — the minimal genuinely TRAINED embedding function (its output
  * depends on corpus statistics, not just the input string), kept
  * integer-exact so it stays oracle-replayable:
  *
  *   - the vocabulary is the `vocabSize` highest-document-frequency
  *     tokens (ties by token ascending — deterministic),
  *   - idf is QUANTIZED at fit time: `idfQ = round(1000·(ln((N+1)/(df+1))+1))`
  *     — an integer recorded in the model, so embed-time arithmetic has
  *     no float fold anywhere,
  *   - the projection sign of term t on axis j is the parity of the
  *     multiplicative spread of `strHash(t)·(j+1) + j` — engine-portable
  *     integer arithmetic, replayable in plain SQL, precomputed per
  *     vocab term at fit time (see [[TfIdfModel.signOf]] for why naive
  *     parity schemes degenerate),
  *   - `v[j] = Σ_tokens idfQ(t)·sign(t,j)` (each OCCURRENCE adds once, so
  *     tf folds in) — an integer sum, order-free, exact in float32 while
  *     |v| < 2²⁴ (≈16.7M: a 1k-token doc of 10.0-idf terms reaches 10⁷).
  *
  * Tokenization matches [[HashEmbed]] exactly (Java `\s` runs over the
  * ALREADY-LOWERCASED input; same oracle-parity fixture constraint).
  *
  * The model is a value (Serializable) — the expression ships it to
  * executors as a codegen reference object; [[TfIdfModel.serialize]] /
  * [[TfIdfModel.deserialize]] give it a sidecar text form the collection
  * store persists next to the data (tokens cannot contain whitespace, so
  * a line-per-term TSV needs no escaping).
  */
final class TfIdfModel(
    val dim: Int,
    val nDocs: Long,
    val terms: Array[String],
    val idfQ: Array[Int],
    val signs: Array[Array[Byte]]) extends Serializable {

  require(dim > 0, s"embedding dim must be positive, got $dim")
  require(terms.length == idfQ.length && terms.length == signs.length,
    "model arrays must align")
  require(signs.forall(_.length == dim), "each sign row must have dim entries")

  def size: Int = terms.length

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) { m.put(terms(i), i); i += 1 }
    m
  }

  private[expressions] def lookup(t: String): Integer = index.get(t)

  def serialize(name: String): String = {
    val sb = new StringBuilder
    sb.append(name).append('\n')
    sb.append("dim ").append(dim).append('\n')
    sb.append("ndocs ").append(nDocs).append('\n')
    var i = 0
    while (i < terms.length) {
      sb.append(terms(i)).append('\t').append(idfQ(i)).append('\t')
      sb.append(new String(signs(i).map(b => if (b > 0) '+' else '-')))
      sb.append('\n')
      i += 1
    }
    sb.toString
  }
}

object TfIdfModel {

  /** [[StrHash]]'s polynomial, the shared JVM form (fit-time sign
    * derivation must equal the SQL replay exactly). */
  def strHash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h += s.charAt(i).toLong * (((i * 131) % 997) + 1); i += 1 }
    h
  }

  /** Sign of term `t` on axis `j`: the parity of the 31-bit-clamped
    * multiplicative spread (the `Mixture.idHash` construction, SQL form
    * `sqlSpreadHash`) of `strHash(t)·(j+1) + j`.
    *
    * Why not something simpler: [[strHash]] is LINEAR in char codes, so
    * its raw parity is a linear (useless) sign source, and any scheme
    * where the axis enters as a digit at a fixed string position makes
    * the hash linear in j too — the resulting sign rows of nearby terms
    * come out identical-or-opposite across ALL axes, and two equal-idf
    * terms then cancel whole documents to the zero vector (observed,
    * spec-pinned). Folding j in MULTIPLICATIVELY makes the per-axis
    * deltas between any two terms j-dependent before the nonlinear
    * double-mod spread, which kills the shared-carry structure. All
    * arithmetic stays in signed 64-bit (h < 2³¹ for sane terms, ×(j+1)
    * ≤ 2³⁷, clamp, ×2654435761 < 2⁶³) and replays in plain SQL. */
  def signOf(t: String, j: Int): Byte = {
    val x = strHash(t) * (j + 1) + j
    if (((x % 2147483647L) * 2654435761L) % 1000000007L % 2 == 0) 1 else -1
  }

  /** (name, model) from [[TfIdfModel.serialize]]'s text form. */
  def deserialize(text: String): (String, TfIdfModel) = {
    val lines = text.split('\n').filter(_.nonEmpty)
    require(lines.length >= 3, "malformed embedder model sidecar")
    val name = lines(0)
    // validate header prefixes: stripPrefix is a no-op on a non-matching
    // line, so a truncated/foreign sidecar would otherwise surface as a
    // bare NumberFormatException (or, with swapped headers, parse
    // silently wrong) instead of the malformed-sidecar message
    require(lines(1).startsWith("dim ") && lines(2).startsWith("ndocs "),
      "malformed embedder model sidecar: expected 'dim <n>' / 'ndocs <n>' header lines")
    val dim = lines(1).stripPrefix("dim ").trim.toInt
    val nDocs = lines(2).stripPrefix("ndocs ").trim.toLong
    val rows = lines.drop(3).map { l =>
      val parts = l.split('\t')
      require(parts.length == 3, s"malformed model row: $l")
      (parts(0), parts(1).toInt, parts(2).map(c => (if (c == '+') 1 else -1).toByte).toArray)
    }
    (name, new TfIdfModel(dim, nDocs, rows.map(_._1), rows.map(_._2), rows.map(_._3)))
  }
}

/** The compiled embed step over an already-lowercased string column —
  * the distributed form of the fitted model (one static call per row;
  * the surrounding projection stays inside whole-stage codegen, with the
  * model shipped once per task as a codegen reference object). */
case class TfIdfEmbed(child: Expression, model: TfIdfModel) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_tfidf_embed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TfIdfEmbed.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("tfidfModel", model,
      classOf[TfIdfModel].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TfIdfEmbed.compute($a, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TfIdfEmbed =
    copy(child = newChild)
}

object TfIdfEmbed {

  /** Shared by interpreted eval, codegen, and the driver-side
    * `embedOne` — ONE implementation, so query-text embedding can never
    * drift from stored embeddings. */
  def compute(s: UTF8String, model: TfIdfModel): GenericArrayData =
    new GenericArrayData(embed(s.toString, model))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def embed(str: String, model: TfIdfModel): Array[Float] = {
    val dim = model.dim
    val acc = new Array[Long](dim)
    var start = 0
    var i = 0
    while (i <= str.length) {
      if (i == str.length || isWs(str.charAt(i))) {
        if (i > start) { // flush a non-empty token
          val idx = model.lookup(str.substring(start, i))
          if (idx != null) {
            val ti = idx.intValue()
            val w = model.idfQ(ti).toLong
            val sg = model.signs(ti)
            var j = 0
            while (j < dim) { acc(j) += w * sg(j); j += 1 }
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat; j += 1 }
    out
  }
}
