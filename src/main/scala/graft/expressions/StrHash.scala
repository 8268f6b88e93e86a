package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd positional polynomial string hash:
  *
  *   h(s) = Σ_{i=0}^{len-1}  code(s_i) · (((i·131) mod 997) + 1)
  *
  * This is the ENGINE-PORTABLE hash used by the oracled dedup operators
  * (MinHash shingle hashing, SimHash token hashing): unlike xxhash64 /
  * murmur3, the exact same value is computable in plain SQL on any engine
  * (`list_sum(list_transform(range(length(s)), i -> ascii(substr(s,i+1,1))
  * * (((i*131)%997)+1)))`), so signature pipelines can be verified
  * end-to-end against an independent oracle.
  *
  * Properties: values stay below 2^31 for strings under ~16 k chars
  * (code ≤ 0x10FFFF only for non-BMP; ASCII corpora keep terms ≤ 127·997),
  * so downstream `(a·h+b) mod p` permutation arithmetic cannot overflow a
  * signed 64-bit under ANSI mode. `code` is the UTF-16 unit (= codepoint
  * on the BMP; fixtures are ASCII where this equals any engine's ascii()).
  *
  * Not a quality general-purpose hash — for non-oracled production paths
  * prefer xxhash64 (better avalanche); the dedup operators take the hash
  * as a parameter for exactly that reason.
  */
case class StrHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_strhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h += s.charAt(i).toLong * (((i * 131) % 997) + 1)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h += (long) $s.charAt($i) * ((($i * 131) % 997) + 1);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StrHash =
    copy(child = newChild)
}
