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
  /** Frame form of [[embedText]] — what every store write path calls.
    * Compiled-expression embedders keep the zero-overhead column path
    * (this default); batched MODEL functions override it with the
    * per-partition batch shape ([[ModelEmbeddingFunction.embedFrame]]). */
  def embedFrame(df: org.apache.spark.sql.DataFrame, textCol: String,
                 outCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn(outCol, embedText(col(textCol)))
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

/** The plug point for REAL model-backed embedding functions — the seam a
  * deployment fills with an ONNX Runtime session, a JNI-wrapped encoder,
  * or an RPC to a serving tier. The reference plans exactly this future
  * (auto-generated embeddings via "proprietary or open-source embedding
  * models", README.md:40, with `transformers` an optional dependency,
  * README.md:56); this offline build ships no model weights, so the
  * CONTRACT is the deliverable: implement [[embedBatch]], register the
  * instance under its binding name ([[Embedder.register]]) in every
  * driver process before opening collections bound to it, and every
  * store surface (addDocuments, queryText, streaming hydration) resolves
  * it exactly like the built-ins — binding recorded in collection
  * metadata, name conflicts loud.
  *
  * Batch shape: the distributed path hands [[embedBatch]] up to
  * [[batchSize]] non-null texts at a time from a per-partition iterator
  * (mapPartitions — ONE runtime call per batch, the input-tensor shape
  * an ONNX session wants), never one call per row. The function object
  * serializes into the task closure, so hold the runtime session in a
  * `@transient lazy val` — each executor JVM then opens its own on first
  * use (the standard ONNX-on-Spark pattern).
  *
  * Determinism, stated rather than hidden: real neural inference is
  * generally NOT bit-replayable across hardware (GPU kernels, FMA
  * contraction), so collections bound to a model function keep the
  * store's same-function guard but their vectors are not SQL-oracle-
  * replayable the way the built-in hash/TF-IDF functions are — which is
  * why the spec pins this seam with a deterministic toy model instead.
  */
trait ModelEmbeddingFunction extends EmbeddingFunction with Serializable {

  /** Max texts per [[embedBatch]] call (the inference tensor's leading
    * dimension). Override per model/hardware. */
  def batchSize: Int = 64

  /** One inference call: `texts.size <= batchSize`, never empty, no
    * nulls; returns exactly one `dim`-length vector per input, in input
    * order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  final override def embedOne(text: String): Seq[Float] = {
    val out = embedBatch(Seq(text))
    require(out.size == 1 && out.head.length == dim,
      s"embedding function '$name' returned ${out.size} vectors of dims " +
        s"${out.map(_.length).distinct.mkString(",")} for one text (dim=$dim)")
    out.head.toSeq
  }

  /** Row-at-a-time Column fallback (a batch-of-1 inference per row) so
    * the full EmbeddingFunction surface holds; every store write path
    * routes through the BATCHED [[embedFrame]] instead. */
  override def embedText(text: Column): Column =
    udf((t: String) => if (t == null) null else embedOne(t).toArray)
      .apply(text)

  /** The batched distributed form: per-partition iterator → grouped
    * [[batchSize]] chunks → one [[embedBatch]] call each. Null texts
    * never reach the model and map to null embeddings (the same
    * null-safety the compiled HashEmbed path has — the store's own
    * null-document gate then rejects them loudly pre-commit). Ragged or
    * miscounted model output fails the task, never commits. */
  override def embedFrame(df: org.apache.spark.sql.DataFrame, textCol: String,
                          outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
    val inSchema = df.schema
    require(!inSchema.fieldNames.contains(outCol),
      s"embedFrame output column '$outCol' already exists")
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val idx = inSchema.fieldIndex(textCol)
    val bs = batchSize
    require(bs > 0, s"batchSize must be positive, got $bs")
    val d = dim
    val nm = name
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { rows =>
        val texts = rows.collect { case r if !r.isNullAt(idx) => r.getString(idx) }
        val vecs = if (texts.isEmpty) Seq.empty[Array[Float]] else embedBatch(texts)
        require(vecs.size == texts.size,
          s"embedding function '$nm' returned ${vecs.size} vectors for ${texts.size} texts")
        vecs.foreach(v => require(v.length == d,
          s"embedding function '$nm' returned a ${v.length}-dim vector (dim=$d)"))
        val next = vecs.iterator
        rows.map { r =>
          val v: Any = if (r.isNullAt(idx)) null else next.next().toSeq
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
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

  /** Registered model-backed functions, by binding name (JVM-wide;
    * executors receive the instance via task closures, so only the
    * DRIVER registry participates in resolution). */
  private val registeredModels =
    new java.util.concurrent.ConcurrentHashMap[String, ModelEmbeddingFunction]()

  /** Register a [[ModelEmbeddingFunction]] under its binding name so
    * collections recording that name resolve it like a built-in. LOUD on
    * a reserved built-in prefix and on re-registering a name with a
    * DIFFERENT instance — silently swapping the model behind a live
    * binding would make stored and query vectors disagree with no error
    * (the exact failure the binding discipline exists to prevent). */
  def register(ef: ModelEmbeddingFunction): Unit = {
    require(!ef.name.startsWith(HashV1Prefix) && !ef.name.startsWith(TfIdfV1Prefix),
      s"embedding-function name '${ef.name}' uses a reserved built-in prefix")
    require(ef.dim > 0, s"embedding dim must be positive, got ${ef.dim}")
    val prev = registeredModels.putIfAbsent(ef.name, ef)
    require(prev == null || (prev eq ef),
      s"embedding function '${ef.name}' is already registered with a different " +
        "instance — unregister it first if the swap is intentional")
  }

  /** Remove a registered model function (tests, controlled swaps). */
  def unregister(name: String): Boolean = registeredModels.remove(name) != null

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
    case other => Option(registeredModels.get(other)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown embedding function '$other' (known: ${HashV1Prefix}<dim>, " +
          s"${TfIdfV1Prefix}<dim>, registered model functions: " +
          s"${java.util.Collections.list(registeredModels.keys()).toArray.mkString("[", ", ", "]")})"))
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
