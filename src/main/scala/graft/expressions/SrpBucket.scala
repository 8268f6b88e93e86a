package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd deterministic sign-random-projection LSH bucket.
  *
  * bit b of the bucket = sign of ⟨vec, r_(bitOffset+b)⟩ where
  *   r_b[j] = ((1103515245·(b·dim+j) + 12345) mod 2001 − 1000) / 1000
  * `bitOffset` selects a disjoint run of the same projection sequence, so
  * table t of a multi-table LSH uses bits t·nBits .. (t+1)·nBits−1 —
  * L independent hash tables from one formula, no extra state
  * — a fixed arithmetic pseudo-random sequence, reproducible on any engine
  * (the DuckDB oracle replays it with list arithmetic).
  *
  * Replaces the expression-tree form ([[graft.operators.Ann.srpBucketHof]]):
  * nBits·dim element terms (512 nodes for 8×64) cost seconds of codegen
  * compilation and defeat common-subexpression reuse; this emits one fused
  * double loop with identical operation order, so values are bit-identical
  * to the tree form and the oracle.
  *
  * Null contract: null array → null; any null element → null (the tree
  * form silently zeroed that bit — an unreliable signature; loud null is
  * the safer semantics, and fixtures carry no null elements).
  */
case class SrpBucket(child: Expression, dim: Int, nBits: Int, bitOffset: Int = 0)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
  require(dim >= 1, s"dim must be positive, got $dim")
  require(bitOffset >= 0, s"bitOffset must be non-negative, got $bitOffset")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bucket"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var j = 0
      while (j < n) {
        if (a.isNullAt(j)) return null
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val r = ((1103515245L * ((bitOffset + b).toLong * dim + j) + 12345L) % 2001L - 1000L) / 1000.0
        proj += x * r
        j += 1
      }
      if (proj >= 0) bucket |= 1L << b
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val proj = ctx.freshName("proj"); val bucket = ctx.freshName("bucket")
      val x = ctx.freshName("x"); val r = ctx.freshName("r")
      val getX = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |final int $n = java.lang.Math.min($dim, $a.numElements());
         |long $bucket = 0L;
         |for (int $b = 0; $b < $nBits && !${ev.isNull}; $b++) {
         |  double $proj = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    double $x = $getX;
         |    double $r = ((1103515245L * ((long) ($bitOffset + $b) * $dim + $j) + 12345L) % 2001L - 1000L) / 1000.0;
         |    $proj += $x * $r;
         |  }
         |  if (!${ev.isNull} && $proj >= 0) $bucket |= 1L << $b;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
