package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass C4-style line filter (Raffel et al. 2020, §2.2
  * "Colossal Clean Crawled Corpus" line rules): split the document on
  * newlines and keep only lines that (a) contain no blocklisted word,
  * (b) have at least `minWords` words, and (c) end in terminal
  * punctuation (`.` `!` `?` `"`). Returns the cleaned text (kept lines
  * re-joined with newlines) plus per-reason drop counts, so a curation
  * run can audit WHY mass disappeared — the same counts-not-booleans
  * contract as [[graft.functions.TextAnalysis.qualityFilter]].
  *
  * Rule precedence is fixed (blocked → short → no-punct): each dropped
  * line increments exactly one counter, so the counts always sum to
  * `n_lines - n_kept` and the oracle can replay the CASE chain verbatim.
  *
  * The blocklist check strips trailing terminal punctuation from each
  * lowercased word first (`"slow."` matches `slow`), because the very
  * punctuation rule this filter enforces glues `.` onto final words.
  *
  * Why an expression and not explode + filter + re-aggregate: line
  * filtering is intrinsically PER-DOCUMENT, and the relational form ships
  * every line through a doc-keyed re-aggregation shuffle — mostly-unique
  * keys defeat partial aggregation, so the exchange carries ~every line
  * STRING (the q83 lesson, measured ×34 at the sf1→sf10 step). One
  * compiled scan = zero shuffle, linear at any corpus size.
  */
case class LineFilterStats(child: Expression, minWords: Int, blocked: Seq[String])
    extends UnaryExpression {

  require(minWords >= 0, s"minWords must be non-negative, got $minWords")

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_blocked", LongType, nullable = false),
    StructField("n_short", LongType, nullable = false),
    StructField("n_nopunct", LongType, nullable = false)))

  override def prettyName: String = "graft_line_filter_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  @transient private lazy val blockedSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    blocked.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    LineFilterStats.compute(input.asInstanceOf[UTF8String], minWords, blockedSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftBlocked", blockedSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.LineFilterStats.compute($a, $minWords, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LineFilterStats =
    copy(child = newChild)
}

object LineFilterStats {

  /** `split(s, sep, -1)` semantics: "" → [""], empties preserved. */
  private def splitKeepEmpty(s: String, sep: Char): Array[String] = {
    val out = new java.util.ArrayList[String]()
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(sep, start)
      if (end < 0) end = s.length
      out.add(s.substring(start, end))
      start = end + 1
    }
    out.toArray(new Array[String](out.size))
  }

  private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '"'

  /** Category of one line: 0 kept, 1 blocked, 2 short, 3 no-punct. */
  private def lineCategory(line: String, minWords: Int,
      blocked: java.util.HashSet[String]): Int = {
    var words = 0
    var hit = false
    var i = 0
    while (i < line.length) {
      // skip separator run
      while (i < line.length && line.charAt(i) == ' ') i += 1
      if (i < line.length) {
        val start = i
        while (i < line.length && line.charAt(i) != ' ') i += 1
        words += 1
        if (!hit && !blocked.isEmpty) {
          // strip trailing terminal punctuation before the lookup
          var end = i
          while (end > start && isTerminal(line.charAt(end - 1))) end -= 1
          if (end > start && blocked.contains(
              line.substring(start, end).toLowerCase(java.util.Locale.ROOT)))
            hit = true
        }
      }
    }
    if (hit) 1
    else if (words < minWords) 2
    else if (line.isEmpty || !isTerminal(line.charAt(line.length - 1))) 3
    else 0
  }

  def compute(u: UTF8String, minWords: Int,
      blocked: java.util.HashSet[String]): InternalRow = {
    val lines = splitKeepEmpty(u.toString, '\n')
    val sb = new java.lang.StringBuilder
    var kept = 0L; var nBlocked = 0L; var nShort = 0L; var nPunct = 0L
    var i = 0
    while (i < lines.length) {
      lineCategory(lines(i), minWords, blocked) match {
        case 0 =>
          if (kept > 0) sb.append('\n')
          sb.append(lines(i))
          kept += 1
        case 1 => nBlocked += 1
        case 2 => nShort += 1
        case _ => nPunct += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), lines.length.toLong, kept,
      nBlocked, nShort, nPunct))
  }
}
