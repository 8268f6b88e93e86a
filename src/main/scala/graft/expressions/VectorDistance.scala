package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector distance over two ARRAY<FLOAT|DOUBLE> columns —
  * the SURVEY §4.3.1 replacement for the higher-order-function distance
  * Columns in [[graft.functions.Distances]].
  *
  * The HOF form (`aggregate(zip_with(...))`) is semantically right but
  * Spark evaluates lambda expressions interpreted, one element at a time,
  * outside whole-stage codegen. This expression emits a tight fused Java
  * loop (`doGenCode`) instead, keeping kNN scans inside WholeStageCodegen.
  *
  * Numerical contract (MUST match the HOF form and the DuckDB oracle
  * bit-for-bit): every element is cast to double before arithmetic; all
  * accumulations fold sequentially in ascending element order;
  * cosine = 1 − dot/(√na·√nb) with na/nb accumulated in the same order.
  *
  * Null contract (matches `aggregate(zip_with(...))`): null result if
  * either array is null, lengths differ (zip_with would pad with null),
  * or any element is null.
  *
  * spaces: "l2" (squared L2), "ip" (1−dot), "cosine", "dot" (raw).
  */
case class VectorDistance(left: Expression, right: Expression, space: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"vector_dist_$space"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!Seq("l2", "ip", "cosine", "dot").contains(space))
      TypeCheckResult.TypeCheckFailure(s"unknown space '$space'")
    else if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    val needNorms = space == "cosine"
    var acc = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      if (space == "l2") { val d = x - y; acc += d * d }
      else if (needNorms) { acc += x * y; na += x * x; nb += y * y }
      else acc += x * y
      i += 1
    }
    space match {
      case "l2"     => acc
      case "dot"    => acc
      case "ip"     => 1.0 - acc
      case "cosine" => 1.0 - acc / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("d")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // only cosine needs the norms — dot/ip must not pay 4 extra
      // multiplies per element in the fused hot loop
      val accumulate = space match {
        case "l2"     => s"double $d = $x - $y; $acc += $d * $d;"
        case "cosine" => s"$acc += $x * $y; $na += $x * $x; $nb += $y * $y;"
        case _        => s"$acc += $x * $y;"
      }
      val result = space match {
        case "l2"     => acc
        case "dot"    => acc
        case "ip"     => s"1.0 - $acc"
        case "cosine" => s"1.0 - $acc / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $getX;
         |    double $y = $getY;
         |    $accumulate
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $result;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistance =
    copy(left = newLeft, right = newRight)
}
