package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass text statistics: character count, token count
  * (single-space split, limit −1 — trailing/repeated separators yield
  * empty tokens, exactly like `split(text, " ")`), punctuation characters
  * (`.!?,;:`), uppercase A–Z characters, and stopword hits
  * (case-insensitive token equality against `stopwords`).
  *
  * Why an expression and not `functions._`: the quality-signal projection
  * (TextAnalysis.qualityStruct, q25) needs a token FILTER, and Spark's
  * higher-order `filter(split(...), lambda)` is CodegenFallback — it drops
  * the WHOLE projection out of whole-stage codegen, every output column
  * then re-evaluates its own `split` interpreted (no subexpression
  * elimination outside codegen), and the sf1 scale point showed that
  * projection ballooning superlinearly under allocation pressure. This
  * expression does one compiled scan per row, the surrounding arithmetic
  * stays in Catalyst, and whole-stage codegen CSEs the repeated
  * `TextStats(text)` references into one call.
  *
  * The reference computes none of this (its load path is row-at-a-time
  * pandas, sas:161-162); these are the corpus-quality signals a training
  * pipeline derives before hydration.
  */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  @transient private lazy val swArray: Array[String] = stopwords.toArray

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], swArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("graftSw", swArray, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextStats.compute($a, $swRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  /** One scan for the char-class counts, one segment walk for tokens. */
  def compute(u: UTF8String, stopwords: Array[String]): InternalRow = {
    val s = u.toString
    var nPunct = 0
    var nUpper = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':') nPunct += 1
      if (c >= 'A' && c <= 'Z') nUpper += 1
      i += 1
    }
    var nTok = 0
    var nSw = 0
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      nTok += 1
      // stopword hit iff lower(token) == stopword — the HOF reference's
      // exact semantics. ASCII tokens fold inline; any non-ASCII char
      // falls back to String.toLowerCase (what Spark's lower() uses under
      // the hood), because per-char folding differs on full-case mappings
      // (U+212A -> 'k', 'İ' -> "i̇") and would diverge from the
      // cross-checked reference. regionMatches(ignoreCase) is NOT
      // equivalent: it folds the stopword side too.
      val len = end - start
      var ascii = true
      var j = start
      while (j < end) { if (s.charAt(j) >= 128) { ascii = false; j = end } else j += 1 }
      if (ascii) {
        var k = 0
        while (k < stopwords.length) {
          val w = stopwords(k)
          if (w.length == len) {
            var m = 0
            var same = true
            while (same && m < len) {
              val c = s.charAt(start + m)
              val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
              if (lc != w.charAt(m)) same = false else m += 1
            }
            if (same) { nSw += 1; k = stopwords.length } else k += 1
          } else k += 1
        }
      } else if (len > 0) {
        val lowered = s.substring(start, end).toLowerCase
        var k = 0
        while (k < stopwords.length) {
          if (stopwords(k) == lowered) { nSw += 1; k = stopwords.length } else k += 1
        }
      }
      start = end + 1
    }
    // n_chars counts code points (Spark's length()); ASCII === s.length
    new GenericInternalRow(Array[Any](u.numChars(), nTok, nPunct, nUpper, nSw))
  }
}
