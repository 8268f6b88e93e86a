package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass Gopher repetition counters: for each n in
  * `topNs`, the character mass (occurrences × code-point length) of the
  * MOST FREQUENT word n-gram — among equally frequent grams the longest
  * wins, so the result is deterministic without ever naming the gram;
  * for each n in `dupNs`, the character mass of ALL n-grams occurring
  * ≥ 2 times. Tokenization is the single-space split with trailing
  * empties (`split(text, " ")` semantics), gram length counts code
  * points joined by single spaces — bit-identical to the relational
  * explode form ([[graft.functions.TextAnalysis.repetitionSignalsExploded]]).
  *
  * Why an expression and not explode+groupBy: repetition is intrinsically
  * PER-DOCUMENT, but the relational form ships every gram through a
  * cluster-wide counting shuffle — and on synthetic-diverse text partial
  * aggregation barely reduces, so the exchange carries ~n_grams rows. The
  * sf10 scale point measured that shape at ×34 wall for the sf1→sf10 step
  * (gram-string shuffle spill). This expression counts each document's
  * grams in one compiled scan with per-row bounded memory: zero shuffle,
  * embarrassingly parallel, linear at any corpus size.
  */
case class RepetitionStats(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
  require((topNs ++ dupNs).forall(_ >= 2), s"n-grams need n >= 2, got ${topNs ++ dupNs}")
  require(topNs.distinct == topNs && dupNs.distinct == dupNs,
    s"duplicate n within a role: topNs=$topNs dupNs=$dupNs")

  override def dataType: DataType = StructType(
    topNs.map(n => StructField(s"top${n}_chars", LongType, nullable = false)) ++
    dupNs.map(n => StructField(s"dup${n}_chars", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  @transient private lazy val topArr: Array[Int] = topNs.toArray
  @transient private lazy val dupArr: Array[Int] = dupNs.toArray

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String], topArr, dupArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val topRef = ctx.addReferenceObj("graftTopNs", topArr, "int[]")
    val dupRef = ctx.addReferenceObj("graftDupNs", dupArr, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($a, $topRef, $dupRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  /** `split(s, " ", -1)` semantics without the regex machinery:
    * "" → [""], trailing/repeated separators keep their empty tokens. */
  private def splitTokens(s: String): Array[String] = {
    val out = new java.util.ArrayList[String]()
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      out.add(s.substring(start, end))
      start = end + 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** (top n-gram char mass, duplicate n-gram char mass) for one doc.
    * Gram length counts CODE POINTS (Spark `length()` semantics) so the
    * result matches the relational form on non-BMP text too. */
  private def gramStats(w: Array[String], n: Int): Array[Long] = {
    if (w.length < n) return Array(0L, 0L)
    val counts = new java.util.HashMap[String, Array[Long]]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= w.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      val g = sb.toString
      val e = counts.get(g)
      if (e == null) counts.put(g, Array(1L, g.codePointCount(0, g.length).toLong))
      else e(0) += 1
      i += 1
    }
    // argmax by (count, length): the most frequent gram, ties to the
    // longest — NOT max of count×length, where a long rare gram could
    // outweigh the most frequent one (Gopher counts the top gram only)
    var bestCnt = 0L
    var bestLen = 0L
    var dup = 0L
    val it = counts.values.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e(0) > bestCnt || (e(0) == bestCnt && e(1) > bestLen)) {
        bestCnt = e(0); bestLen = e(1)
      }
      if (e(0) >= 2L) dup += e(0) * e(1)
    }
    Array(bestCnt * bestLen, dup)
  }

  def compute(u: UTF8String, topNs: Array[Int], dupNs: Array[Int]): InternalRow = {
    val w = splitTokens(u.toString)
    // an n appearing in both roles is computed once
    val memo = new java.util.HashMap[Integer, Array[Long]]()
    def statsFor(n: Int): Array[Long] = {
      val c = memo.get(n)
      if (c != null) c else { val s = gramStats(w, n); memo.put(n, s); s }
    }
    val out = new Array[Any](topNs.length + dupNs.length)
    var i = 0
    while (i < topNs.length) { out(i) = statsFor(topNs(i))(0); i += 1 }
    var j = 0
    while (j < dupNs.length) { out(topNs.length + j) = statsFor(dupNs(j))(1); j += 1 }
    new GenericInternalRow(out)
  }
}
