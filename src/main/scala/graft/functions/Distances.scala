package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance functions over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` columns.
  *
  * Re-expresses the distance semantics of the hydrated Chroma collection
  * (reference: extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas:126-132
  * creates the collection whose `hnsw:space` ∈ {l2, ip, cosine}) as Spark
  * higher-order-function Columns. These stay inside whole-stage codegen (no
  * UDFs) and fold sequentially per-row, so results are bit-stable for a given
  * element order.
  *
  * All arithmetic is done in Double regardless of the input element type:
  * each element is cast before multiply/subtract. This (a) avoids float32
  * accumulation error and (b) matches a Double-folding oracle engine exactly.
  */
object Distances {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ (Double accumulation, sequential fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, x) => s + x)

  /** Σ aᵢ² — squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (s, x) => s + d(x) * d(x))

  /** Squared L2 distance Σ (aᵢ−bᵢ)² — Chroma's default `l2` space. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (s, x) => s + x)

  /** Inner-product distance 1 − Σ aᵢ·bᵢ — Chroma's `ip` space. */
  def ipDist(a: Column, b: Column): Column = lit(1.0) - dot(a, b)

  /** Cosine distance 1 − (a·b)/(‖a‖·‖b‖) — Chroma's `cosine` space. */
  def cosineDist(a: Column, b: Column): Column =
    lit(1.0) - dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine similarity (a·b)/(‖a‖·‖b‖). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Distance column by space name, mirroring Chroma's `hnsw:space` values. */
  def bySpace(space: String)(a: Column, b: Column): Column = space match {
    case "l2"     => l2Sq(a, b)
    case "ip"     => ipDist(a, b)
    case "cosine" => cosineDist(a, b)
    case other    => throw new IllegalArgumentException(
      s"unknown distance space '$other' (expected l2|ip|cosine)")
  }
}
