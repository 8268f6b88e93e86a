package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Vector distance functions over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` columns.
  *
  * Re-expresses the distance semantics of the hydrated Chroma collection
  * (reference: extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas:126-132
  * creates the collection whose `hnsw:space` ∈ {l2, ip, cosine}).
  *
  * Two equivalent implementations, same values bit-for-bit:
  *  - default: the codegen'd [[graft.expressions.VectorDistance]] Catalyst
  *    expression (fused Java loop inside WholeStageCodegen) — the hot path;
  *  - `*Hof`: higher-order-function Columns (`aggregate(zip_with(...))`) —
  *    interpreted, kept as the readable reference implementation and for
  *    cross-checking the native expression in tests.
  *
  * All arithmetic is done in Double regardless of the input element type,
  * folding sequentially in element order — matching a Double-folding oracle
  * engine exactly.
  */
object Distances {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ (codegen'd). */
  def dot(a: Column, b: Column): Column = GraftExtensions.dist("dot")(a, b)

  /** Σ aᵢ² — squared L2 norm (codegen'd). */
  def normSq(a: Column): Column = GraftExtensions.dist("dot")(a, a)

  /** Squared L2 distance Σ (aᵢ−bᵢ)² — Chroma's default `l2` space. */
  def l2Sq(a: Column, b: Column): Column = GraftExtensions.dist("l2")(a, b)

  /** Inner-product distance 1 − Σ aᵢ·bᵢ — Chroma's `ip` space. */
  def ipDist(a: Column, b: Column): Column = GraftExtensions.dist("ip")(a, b)

  /** Cosine distance 1 − (a·b)/(‖a‖·‖b‖) — Chroma's `cosine` space. */
  def cosineDist(a: Column, b: Column): Column = GraftExtensions.dist("cosine")(a, b)

  /** Cosine similarity (a·b)/(‖a‖·‖b‖). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Normalize IEEE signed zero: −0.0 → +0.0, every other value (incl.
    * NaN/Inf) unchanged, nulls propagate. SURVEY §2.D rule 2c — every
    * terminal rounded float the engine emits goes through this, because
    * the driver's oracle compare is BIT-sensitive: a self-match cosine
    * distance of ~−1e-9 rounds to −0.0 in DuckDB (IEEE round preserves
    * sign) but +0.0 in Spark (BigDecimal HALF_UP has no signed zero),
    * and the two zeros hash differently (CORRECTNESS_r12: q140/q144/
    * q145/q148/q149). `x + 0.0` is the branch-free IEEE identity that
    * maps −0.0 to +0.0. */
  def posZero(c: Column): Column = c + lit(0.0)

  /** Terminal round under rule 2c: round to `scale` AND normalize the
    * signed zero — the one way every query entry should emit a float. */
  def roundz(c: Column, scale: Int): Column = posZero(round(c, scale))

  /** Distance column by space name, mirroring Chroma's `hnsw:space` values. */
  def bySpace(space: String)(a: Column, b: Column): Column = space match {
    case "l2" | "ip" | "cosine" => GraftExtensions.dist(space)(a, b)
    case other => throw new IllegalArgumentException(
      s"unknown distance space '$other' (expected l2|ip|cosine)")
  }

  // ---- interpreted reference implementations (HOF) ----

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, x) => s + x)

  def normSqHof(a: Column): Column =
    aggregate(a, lit(0.0), (s, x) => s + d(x) * d(x))

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (s, x) => s + x)

  def ipDistHof(a: Column, b: Column): Column = lit(1.0) - dotHof(a, b)

  def cosineDistHof(a: Column, b: Column): Column =
    lit(1.0) - dotHof(a, b) / (sqrt(normSqHof(a)) * sqrt(normSqHof(b)))
}
