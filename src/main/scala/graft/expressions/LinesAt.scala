package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd document reconstruction from a kept-line index list: split
  * `text` on newlines and re-join (with newlines) only the 0-based line
  * indexes in `idxs`, which MUST be sorted ascending (the output preserves
  * document order, and the walk is a single two-pointer pass).
  *
  * This is the read-side half of corpus-level line dedup
  * ([[graft.operators.Dedup.dedupLinesAcrossCorpus]]): the shuffle side
  * reduces lines to fixed-width (hash, doc, idx) longs, and this
  * expression turns the per-doc surviving index array back into text at
  * scan time — line STRINGS never cross an exchange. Out-of-range indexes
  * are ignored (defensive; the dedup never produces them).
  */
case class LinesAt(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lines_at"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<int>), got ($l, $r)")
  }

  override def nullSafeEval(text: Any, idxs: Any): Any =
    LinesAt.compute(text.asInstanceOf[UTF8String], idxs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"${ev.value} = graft.expressions.LinesAt.compute($t, $a);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LinesAt =
    copy(left = newLeft, right = newRight)
}

object LinesAt {

  def compute(u: UTF8String, idxs: ArrayData): UTF8String = {
    val s = u.toString
    val n = idxs.numElements()
    val sb = new java.lang.StringBuilder
    var want = 0       // cursor into idxs
    var line = 0       // current 0-based line number
    var start = 0
    var appended = false
    while (start <= s.length && want < n) {
      var end = s.indexOf('\n', start)
      if (end < 0) end = s.length
      // idxs is sorted; skip entries below the current line (nulls in the
      // array are impossible by construction but would be skipped too)
      while (want < n && !idxs.isNullAt(want) && idxs.getInt(want) < line) want += 1
      if (want < n && !idxs.isNullAt(want) && idxs.getInt(want) == line) {
        if (appended) sb.append('\n')
        sb.append(s, start, end)
        appended = true
        want += 1
      }
      line += 1
      start = end + 1
    }
    UTF8String.fromString(sb.toString)
  }
}
