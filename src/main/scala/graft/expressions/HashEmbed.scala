package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass signed feature-hashing text embedder (the
  * "hashing trick", Weinberger et al. 2009 — the same construction as
  * MLlib's HashingTF plus a sign hash): one compiled scan over the
  * (already lowercased) text produces a `dim`-wide dense vector,
  *
  *   tokens  = runs of non-whitespace (Java `\s` class — exactly
  *             Spark's `split(text, "\\s+")` with empties skipped)
  *   h(t)    = Σ code(t_i) · (((i·131) mod 997) + 1)     ([[StrHash]])
  *   bucket  = h mod dim
  *   sign    = +1 if (h div dim) even else −1
  *   v[b]    = Σ sign over tokens with bucket b
  *
  * Deterministic, vocabulary-free, and ENGINE-PORTABLE: every operation
  * is integer, so the exact vector replays in plain SQL
  * (`string_split_regex` + the sqlStrHash polynomial + `h % dim` /
  * `(h // dim) % 2`) — which is what lets server-side embedding be
  * oracled end-to-end (q115), unlike any float-weighted model embedder.
  * Values are integral counts |v[b]| ≤ token count < 2²⁴, so the float32
  * storage cast is EXACT and a Double-folding oracle reads back the
  * same values bit-for-bit.
  *
  * This closes the one public chromadb call shape the reference never
  * uses (`collection.add(documents=...)` without precomputed embeddings;
  * the reference always passes vectors, sas:177-190): the hydrated
  * collection can embed server-side via [[graft.operators.HashingEmbedder]].
  *
  * The input must already be lowercased (callers wrap with Spark's
  * `lower()`): lowercasing rules are the engine's own, pinned against
  * the oracle by the q66 BM25 tokenizer, not re-implemented here.
  */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0, s"embedding dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashEmbed.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // heavy lifting stays in one compiled static call; the projection
      // around it remains inside whole-stage codegen
      s"${ev.value} = graft.expressions.HashEmbed.compute($a, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {

  /** Shared by interpreted eval, codegen and the driver-side
    * [[graft.operators.HashingEmbedder.embedOne]] — ONE implementation,
    * so query-text embedding can never drift from stored embeddings. */
  def compute(s: UTF8String, dim: Int): GenericArrayData =
    new GenericArrayData(embed(s.toString, dim))

  /** Whitespace per Java's `\s` — the class Spark's `split(_, "\\s+")`
    * matches, so in-expression tokenization ≡ split-then-filter-empty.
    *
    * ORACLE-PARITY FIXTURE CONSTRAINT (q115/q121/q124): the DuckDB
    * replay tokenizes with RE2's `\s` (space/\t/\n/\f/\r — NO vertical
    * tab U+000B) and hashes chars via codepoint-based `ascii()`, while
    * this loop walks UTF-16 code units. Both diverge only on text
    * containing U+000B or non-BMP (astral) characters; the driver
    * fixtures are ASCII, which satisfies both. A non-ASCII corpus needs
    * either this class aligned to RE2's `\s` + codepoint iteration, or
    * an oracle that replays Java semantics. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def embed(str: String, dim: Int): Array[Float] = {
    val acc = new Array[Int](dim)
    var h = 0L
    var pos = 0
    var i = 0
    while (i <= str.length) {
      if (i == str.length || isWs(str.charAt(i))) {
        if (pos > 0) { // flush a non-empty token
          acc((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1 else -1)
          h = 0L; pos = 0
        }
      } else {
        h += str.charAt(i).toLong * (((pos * 131) % 997) + 1)
        pos += 1
      }
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat; j += 1 }
    out
  }
}
