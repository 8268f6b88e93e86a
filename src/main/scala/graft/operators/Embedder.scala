package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

import graft.expressions.HashEmbed

/** Server-side embedding functions for the collection store — the public
  * chromadb call shape the reference never exercises (it always passes
  * precomputed vectors, extras/Vector_Databases_Hydrate_ChromaDB_Collection
  * .sas:177-190): `collection.add(documents=...)` with the collection's
  * registered embedding function computing vectors, and
  * `collection.query(query_texts=...)` embedding the query the same way.
  *
  * The function is identified by NAME in collection metadata
  * (`embedding_function` key — chromadb likewise records the configured
  * function in the collection's configuration), so a session that reopens
  * the collection resolves the exact same embedder: stored vectors and
  * query vectors can never silently come from different functions
  * (chromadb raises the same conflict at get_or_create time).
  *
  * 100 TB shape: document embedding is a compiled per-row expression
  * ([[graft.expressions.HashEmbed]]) inside the add's own write scan —
  * no extra pass, no shuffle, no driver involvement; query texts are
  * embedded driver-side (a per-call handful of strings) by the SAME
  * shared implementation.
  */
sealed trait EmbeddingFunction {
  /** Stable identity recorded in collection metadata. */
  def name: String
  def dim: Int
  /** Distributed form: string column → ARRAY<FLOAT> embedding column. */
  def embedText(text: Column): Column
  /** Driver-side form for query texts — MUST agree bit-for-bit with
    * [[embedText]] (shared implementation, spec-pinned). */
  def embedOne(text: String): Seq[Float]
}

/** Deterministic signed feature-hashing embedder (see [[HashEmbed]]). */
final case class HashingEmbedder(dim: Int) extends EmbeddingFunction {
  require(dim > 0, s"embedding dim must be positive, got $dim")

  override def name: String = s"${Embedder.HashV1Prefix}$dim"

  override def embedText(text: Column): Column =
    GraftColumnShim.column(
      HashEmbed(GraftColumnShim.expression(lower(text)), dim))

  override def embedOne(text: String): Seq[Float] = {
    // lowercase through UTF8String — the EXACT routine Spark's `lower()`
    // applies in embedText (UTF8String.toLowerCase: ASCII fast path,
    // String.toLowerCase() slow path). A JVM-side Locale.ROOT
    // toLowerCase is NOT bit-identical to it under every default locale
    // (e.g. tr-TR dotted/dotless I), and stored-vs-query vectors from
    // different case mappings is exactly what the binding must prevent.
    HashEmbed.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(text)
        .toLowerCase.toString, dim).toSeq
  }
}

object Embedder {

  val HashV1Prefix = "graft-hash-v1/"

  /** Resolve a recorded collection embedding function by name — LOUD on an
    * unknown name: silently falling back to some default embedder would
    * query stored vectors with a different function (garbage distances,
    * no error). */
  def fromName(name: String): EmbeddingFunction = name match {
    case n if n.startsWith(HashV1Prefix) =>
      val d = n.stripPrefix(HashV1Prefix)
      val dim = scala.util.Try(d.toInt).getOrElse(throw new IllegalArgumentException(
        s"malformed embedding function name '$name' (expected ${HashV1Prefix}<dim>)"))
      HashingEmbedder(dim)
    case other => throw new IllegalArgumentException(
      s"unknown embedding function '$other' (known: ${HashV1Prefix}<dim>)")
  }
}
