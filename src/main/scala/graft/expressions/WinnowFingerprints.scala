package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing document fingerprint (Schleimer, Wilkerson &
  * Aiken 2003, "Winnowing: Local Algorithms for Document Fingerprinting"
  * — the MOSS algorithm): hash every character k-gram, slide a window of
  * `w` consecutive gram hashes, and in each window select the MINIMUM
  * hash, ties to the RIGHTMOST occurrence; re-selections of the same
  * position collapse. Returns the selected hashes as a sorted distinct
  * ARRAY<LONG> — the document's fingerprint sketch.
  *
  * Unlike the whole-document rolling hash (q27 — one bit flip changes
  * everything), winnowing guarantees any shared substring of length
  * ≥ k + w − 1 contributes at least one COMMON fingerprint, so partial
  * overlaps (quoted paragraphs, licence headers, copy-pasted sections)
  * surface as shared sketch entries. Overlap candidates then follow the
  * usual bucket-join shape: explode the sketch, join on the fingerprint,
  * pairs stay bucket-confined.
  *
  * The k-gram hash is the engine-portable positional polynomial of
  * [[StrHash]] restricted to the gram (weights restart per gram), so the
  * whole sketch replays in plain SQL on an independent engine. One pass
  * per row — O(len·k) hashing plus an O(len) monotonic-deque sliding
  * min — zero shuffle.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"k-gram length must be >= 1, got $k")
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  def compute(u: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = u.toString
    val nGrams = s.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])

    // positional polynomial per gram: Σ_j code(s[i+j]) · (((j·131)%997)+1)
    val gh = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h += s.charAt(i + j).toLong * (((j * 131) % 997) + 1)
        j += 1
      }
      gh(i) = h
      i += 1
    }

    // sliding-window min with rightmost tie-break: the deque holds gram
    // indexes with strictly increasing hash values; popping `>=` on push
    // means an equal newer hash evicts the older one, so the front is the
    // RIGHTMOST minimal of the window. Fewer grams than w = one window.
    val win = math.min(w, nGrams)
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var lastPos = -1
    i = 0
    while (i < nGrams) {
      while (tail > head && gh(deque(tail - 1)) >= gh(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != lastPos) {
        lastPos = deque(head)
        sel.add(gh(lastPos))
      }
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    new GenericArrayData(out)
  }
}
