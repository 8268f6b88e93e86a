package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass token spread-hash array:
  * `transform(split(text, " "), t -> spreadHash(t))` as ONE compiled
  * scan. `ArrayTransform` is CodegenFallback — the pinned q25/q77 lesson
  * is that a lambda in a hot projection evicts it from whole-stage
  * codegen and re-runs interpreted expression trees per element; this
  * expression keeps the q105 token-hashing projection compiled.
  *
  * Semantics are EXACTLY Spark's `split(text, " ")` with its default
  * limit −1 (single-space separator; leading/interior/trailing empty
  * segments all kept — an empty string yields one empty token of hash
  * 0), each segment hashed with the engine-portable chain of
  * [[StrHash]] + the 31-bit-clamped multiplicative spread
  * (`graft.operators.Mixture.spreadHash`):
  *
  *   raw(s)  = Σ code(s_i) · (((i·131) mod 997) + 1)
  *   h(s)    = ((raw mod (2³¹−1)) · 2654435761) mod (10⁹+7)
  *
  * All intermediates are nonnegative, so `%` = `pmod` and nothing can
  * overflow a signed 64-bit (raw < 2³¹ after the clamp; the product
  * stays < 2^62.4). The DuckDB replay is SparkEntry's `sqlSpreadHash`
  * over `string_split(text, ' ')` — value-for-value.
  */
case class TokenSpreadHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_spread_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenSpreadHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // heavy lifting stays in one compiled static call; the projection
      // around it remains inside whole-stage codegen
      s"${ev.value} = graft.expressions.TokenSpreadHashes.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenSpreadHashes =
    copy(child = newChild)
}

object TokenSpreadHashes {

  /** One pass over the UTF-16 units: accumulate the positional polynomial
    * per segment, emit the spread of it at every separator and at the
    * end. Positions restart at 0 in each segment, matching a split-then-
    * hash of the individual tokens. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // n separators -> n + 1 tokens, always >= 1
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val out = new Array[Long](nTok)
    var raw = 0L
    var pos = 0
    var t = 0
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') {
        out(t) = spread(raw); t += 1; raw = 0L; pos = 0
      } else {
        raw += c.toLong * (((pos * 131) % 997) + 1)
        pos += 1
      }
      i += 1
    }
    out(t) = spread(raw)
    new GenericArrayData(out)
  }

  private def spread(raw: Long): Long =
    ((raw % 2147483647L) * 2654435761L) % 1000000007L
}
