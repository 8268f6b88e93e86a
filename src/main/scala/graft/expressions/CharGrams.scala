package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd DISTINCT character n-grams: `"spark"`, n=3 →
  * `["spa", "par", "ark"]` (each gram once, first-occurrence order —
  * deterministic, and the dedup the consumer would otherwise pay an
  * `array_distinct` for happens inside the same compiled call).
  *
  * Grams are CASE-SENSITIVE and sliced on Java chars (UTF-16 units), the
  * same units `UTF8String.contains`/substring matching operate on for the
  * BMP; the one consumer ([[graft.operators.DocIndex]]) uses grams only as
  * a SUPERSET prefilter with a verbatim `contains` re-check, so gram-unit
  * choices can never change query results — only pruning effectiveness.
  *
  * Input shorter than n chars yields an EMPTY array (such a string cannot
  * contain any length-n substring; for the posting-list consumer this
  * correctly makes short docs candidates for nothing).
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // heavy lifting stays in one compiled static call; the projection
      // around it remains inside whole-stage codegen
      s"${ev.value} = graft.expressions.CharGrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: distinct + stable first-occurrence order
    val seen = new java.util.LinkedHashSet[String](math.min(s.length, 1024))
    var i = 0
    while (i <= s.length - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Driver-side gram extraction for QUERY strings (must match [[compute]]
    * exactly — same units, same distinct semantics). */
  def gramsOf(s: String, n: Int): Seq[String] = {
    if (s.length < n) return Nil
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= s.length - n) { seen.add(s.substring(i, i + n)); i += 1 }
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
  }
}
