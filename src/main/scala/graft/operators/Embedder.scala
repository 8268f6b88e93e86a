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

/** A FITTED embedding function: its behavior depends on corpus-learned
  * state (a model), not just its name — so the collection store must
  * persist the model alongside the data (the `_embedder.txt` sidecar)
  * and resolve the name THROUGH the collection, never from the name
  * alone. The model-based analog of chromadb's `embedding_function=`
  * with a trained encoder. */
sealed trait FittedEmbeddingFunction extends EmbeddingFunction {
  /** Sidecar text form ([[graft.expressions.TfIdfModel.serialize]] shape);
    * MUST round-trip through [[Embedder.fromModelText]]. */
  def modelText: String
}

/** TF-IDF × sign-random-projection embedder fitted on a corpus (see
  * [[graft.expressions.TfIdfModel]] for the integer-exact construction
  * that keeps a TRAINED, float-weighted-in-spirit model fully
  * oracle-replayable). Fit with [[TfIdfSrpEmbedder.fit]]. */
final case class TfIdfSrpEmbedder(model: graft.expressions.TfIdfModel)
    extends FittedEmbeddingFunction {

  override def name: String = s"${Embedder.TfIdfV1Prefix}${model.dim}"
  override def dim: Int = model.dim

  override def embedText(text: Column): Column =
    GraftColumnShim.column(graft.expressions.TfIdfEmbed(
      GraftColumnShim.expression(lower(text)), model))

  override def embedOne(text: String): Seq[Float] =
    // UTF8String lowercase for the same bit-parity reason as
    // HashingEmbedder.embedOne
    graft.expressions.TfIdfEmbed.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(text)
        .toLowerCase.toString, model).toSeq

  override def modelText: String = model.serialize(name)
}

object TfIdfSrpEmbedder {

  /** LOUD cap on the fit's driver-side vocabulary collect (same pattern
    * as Retrieval.MaxFetchN): 2¹⁶ terms × (term + dim sign bytes) is MBs;
    * a bigger vocabulary belongs in a different model family. */
  val MaxVocab = 65536

  /** Fit on a corpus: document frequencies over per-row DISTINCT tokens
    * (Spark's `split(lower(text), "\\s+")` tokenization — the engine's
    * own, shared with the embed step), vocabulary = top `vocabSize` by
    * (df DESC, token ASC), idf quantized to integers at fit time,
    * per-term projection signs precomputed from the engine-portable
    * StrHash. ONE distributed aggregation; the collect is ≤ vocabSize
    * rows by construction. */
  def fit(df: org.apache.spark.sql.DataFrame, textCol: String,
          dim: Int, vocabSize: Int): TfIdfSrpEmbedder = {
    require(dim > 0, s"embedding dim must be positive, got $dim")
    require(vocabSize > 0 && vocabSize <= MaxVocab,
      s"vocabSize must be in 1..$MaxVocab, got $vocabSize")
    val n = df.count()
    require(n > 0, "cannot fit an embedder on an empty corpus")
    val vocab = df
      .select(explode(array_distinct(filter(
        split(lower(col(textCol)), "\\s+"), t => t =!= lit("")))).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc)
      .limit(vocabSize)
      .collect() // bounded: ≤ vocabSize rows by construction
      .map(r => (r.getString(0), r.getLong(1)))
    val terms = vocab.map(_._1)
    val idfQ = vocab.map { case (_, dfreq) =>
      Math.round(1000.0 * (math.log((n + 1.0) / (dfreq + 1.0)) + 1.0)).toInt
    }
    val signs = terms.map(t =>
      Array.tabulate(dim)(j => graft.expressions.TfIdfModel.signOf(t, j)))
    TfIdfSrpEmbedder(new graft.expressions.TfIdfModel(dim, n, terms, idfQ, signs))
  }
}

object Embedder {

  val HashV1Prefix = "graft-hash-v1/"
  val TfIdfV1Prefix = "graft-tfidf-srp-v1/"

  /** Resolve a recorded collection embedding function by name — LOUD on an
    * unknown name: silently falling back to some default embedder would
    * query stored vectors with a different function (garbage distances,
    * no error). FITTED functions (tfidf) carry corpus-learned state the
    * name alone cannot reconstruct — resolve those through the
    * collection's model sidecar ([[fromModelText]]), never here. */
  def fromName(name: String): EmbeddingFunction = name match {
    case n if n.startsWith(HashV1Prefix) =>
      val d = n.stripPrefix(HashV1Prefix)
      val dim = scala.util.Try(d.toInt).getOrElse(throw new IllegalArgumentException(
        s"malformed embedding function name '$name' (expected ${HashV1Prefix}<dim>)"))
      HashingEmbedder(dim)
    case n if n.startsWith(TfIdfV1Prefix) =>
      throw new IllegalArgumentException(
        s"embedding function '$name' is FITTED — it must be resolved through its " +
          "collection's model sidecar, not by name")
    case other => throw new IllegalArgumentException(
      s"unknown embedding function '$other' (known: ${HashV1Prefix}<dim>, ${TfIdfV1Prefix}<dim>)")
  }

  /** Parse a FIT-SPEC name — `graft-tfidf-srp-v1/<dim>[?vocab=<n>]` —
    * the form config-driven surfaces (Hydrator) accept for a function
    * they can FIT on their own input. Returns (dim, vocabSize); the
    * binding recorded after the fit is the plain parameterless name.
    * None when the name is not a fit-spec at all; LOUD on a malformed
    * one (a typo'd vocab silently defaulting would fit a differently-
    * sized model than asked). */
  def fitSpec(name: String): Option[(Int, Int)] =
    if (!name.startsWith(TfIdfV1Prefix)) None
    else {
      val rest = name.stripPrefix(TfIdfV1Prefix)
      val (dimPart, vocab) = rest.indexOf('?') match {
        case -1 => (rest, DefaultVocabSize)
        case q =>
          val param = rest.substring(q + 1)
          require(param.startsWith("vocab="),
            s"malformed fit spec '$name' (expected ${TfIdfV1Prefix}<dim>?vocab=<n>)")
          (rest.substring(0, q),
            scala.util.Try(param.stripPrefix("vocab=").toInt).getOrElse(
              throw new IllegalArgumentException(
                s"malformed vocab size in fit spec '$name'")))
      }
      val dim = scala.util.Try(dimPart.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"malformed embedding dim in fit spec '$name'"))
      Some((dim, vocab))
    }

  /** Default vocabulary for config-driven fits ([[fitSpec]] without an
    * explicit `?vocab=`). */
  val DefaultVocabSize = 4096

  /** Rebuild a fitted function from its sidecar text; the recorded name
    * travels inside and must match the collection's binding. */
  def fromModelText(text: String): FittedEmbeddingFunction = {
    val (name, model) = graft.expressions.TfIdfModel.deserialize(text)
    require(name.startsWith(TfIdfV1Prefix),
      s"unknown fitted embedding function '$name' in model sidecar")
    val ef = TfIdfSrpEmbedder(model)
    require(ef.name == name,
      s"model sidecar name '$name' does not match its own dim ${model.dim}")
    ef
  }
}
