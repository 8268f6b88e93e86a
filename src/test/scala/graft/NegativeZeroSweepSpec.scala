package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.D rule 2c, enforced over the WHOLE suite: no query output may
  * contain an IEEE −0.0 in any float column (top-level or one array level
  * deep). The driver's oracle compare is bit-sensitive, and −0.0 vs +0.0 is
  * invisible to value equality — CORRECTNESS_r12 failed exactly 5 PQ queries
  * on a rounded self-match distance whose DuckDB ROUND kept the sign while
  * Spark's BigDecimal round dropped it. Every terminal round now goes
  * through [[graft.functions.Distances.roundz]] (engine) and `ROUND + 0.0`
  * (oracle); this spec is the structural backstop that the ENGINE half of
  * that contract holds for every entry, including future ones, so the class
  * cannot recur unnoticed.
  *
  * Detection is pure SQL, no collect of data: a double d is −0.0 iff
  * `d = 0.0 AND cast(d AS STRING) LIKE '-%'` — comparisons treat the zeros
  * as equal but Double.toString keeps the sign ("-0.0"). The arithmetic
  * probes don't work in Spark: 1/d raises under ANSI, and Atan2/Hypot
  * normalize their operands with `+ 0.0` before calling Math.
  */
class NegativeZeroSweepSpec extends SparkTestBase {

  private def negZero(c: Column): Column =
    c.isNotNull && c === lit(0.0) && c.cast("string").startsWith("-")

  private def floatChecks(schema: StructType): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case DoubleType | FloatType => Seq(negZero(c.cast("double")))
        case ArrayType(DoubleType | FloatType, _) =>
          Seq(exists(c, x => negZero(x.cast("double"))))
        case _ => Nil
      }
    }

  test("the detector itself sees -0.0 and ignores +0.0 / nonzero / null") {
    import spark.implicits._
    // A -0.0 LITERAL cannot survive toDF: UnsafeRowWriter normalizes the
    // sign bit on every double write (SPARK-32110) — which is also why the
    // suite sweep below is a double guarantee, not a tautology: it holds
    // even for outputs produced off the UnsafeRow path (columnar/Arrow).
    // Exercise the detector on an IN-EXPRESSION −0.0 (negate(+0.0)) that
    // the filter consumes inside one codegen stage, before any row write.
    val df = Seq[(java.lang.Double, String)](
      (0.0, "neg-after-negate"), (-1e-9, "tiny"), (-1.5, "nonzero"), (null, "null"))
      .toDF("z", "tag")
    val hits = df.filter(negZero(negate(col("z"))))
      .select("tag").collect().map(_.getString(0))
    assert(hits.toSeq == Seq("neg-after-negate"))
    // and +0.0 itself is NOT flagged
    assert(df.filter(negZero(col("z"))).count() == 0)
  }

  test("roundz normalizes a DuckDB-style -0.0 input to +0.0") {
    import spark.implicits._
    // feed a LITERAL -0.0 through the normalizer (simulating a value that
    // arrived with the sign bit set, however produced) and check the bits
    val out = Seq(-0.0, 0.0, -1.5, 2.25).toDF("v")
      .select(graft.functions.Distances.posZero(col("v")).as("v"))
      .collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    assert(out.toSeq == Seq(0L, 0L,
      java.lang.Double.doubleToRawLongBits(-1.5),
      java.lang.Double.doubleToRawLongBits(2.25)))
  }

  test("no SparkEntry query output contains -0.0 at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val checks = floatChecks(df.schema)
      if (checks.nonEmpty) {
        val n = df.filter(checks.reduce(_ || _)).count()
        if (n > 0) offenders += s"$name ($n rows)"
      }
    }
    assert(offenders.isEmpty,
      s"queries emitting IEEE -0.0 (rule 2c violation): ${offenders.mkString(", ")}")
  }
}
