package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling: `"a b c d"`, n=3 → `["a b c", "b c d"]`;
  * fewer than n tokens → one shingle of the whole (re-joined) token list.
  *
  * Semantics match the HOF form
  * ([[graft.operators.Dedup.wordShinglesHof]]): tokens =
  * `split(text, "\\s+")` (regex split, limit −1 like Spark's `split`),
  * shingles joined with a single space. The HOF form evaluates a `slice` +
  * `array_join` LAMBDA per shingle interpreted — ~100 interpreted calls
  * per document, the dominant cost of the MinHash signature pass at
  * corpus scale. Here the whole shingling is one compiled call.
  */
case class StrShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    StrShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // heavy lifting stays in one compiled static call; the projection
      // around it remains inside whole-stage codegen
      s"${ev.value} = graft.expressions.StrShingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): StrShingles =
    copy(child = newChild)
}

object StrShingles {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    // limit -1: keep trailing empties, matching Spark's split()
    val toks = ws.split(text.toString, -1)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
