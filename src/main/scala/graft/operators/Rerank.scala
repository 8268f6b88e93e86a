package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Candidate re-ranking — the third stage of the standard RAG serving
  * pipeline (retrieve → fuse → RERANK → read): a pluggable pairwise
  * scorer re-orders the ≤fetchN fused candidates against the query text.
  * Real stacks put a cross-encoder here (every query-doc pair scored
  * jointly — far more accurate than the bi-encoder's independent
  * vectors, and affordable exactly because the candidate set is tiny);
  * [[OverlapRerank]] is the deterministic lexical baseline that also
  * makes the stage SQL-oracle-replayable, [[OnnxRerankFunction]] the
  * reflection-gated real-model plug (the [[OnnxEmbeddingFunction]]
  * pattern on the cross-encoder shape).
  *
  * 100 TB shape: reranking is bounded by CONSTRUCTION — its input is a
  * fused candidate list (≤ fetchN rows by the retrieval contract), never
  * the corpus. The scoring still runs inside the plan (mapPartitions,
  * one [[RerankFunction.scoreBatch]] call per ≤batchSize rows — the
  * tensor shape a cross-encoder wants), so the document bytes of the
  * candidates never visit the driver.
  */
object Rerank {

  /** Re-rank a bounded candidate frame: `cands` carries (`idCol`,
    * `docCol`, `priorCol`) where prior is the retrieval-order rank
    * (1-based, the tie-break among equal scores — rerankers must be
    * STABLE on ties or equal-scored results shuffle run-to-run).
    * Returns (id, rnk, score), rnk 1..k by (score DESC, prior ASC).
    * Null documents fail loudly — a pairwise scorer cannot score an
    * absent text, and silently dropping candidates would under-fill k. */
  def rerank(cands: DataFrame, idCol: String, docCol: String,
             priorCol: String, query: String, fn: RerankFunction,
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val bs = fn.batchSize
    require(bs > 0, s"batchSize must be positive, got $bs")
    val nm = fn.name
    // loud at the BOUNDARY: a non-string doc column (binary, struct)
    // would otherwise surface as a bare ClassCastException deep inside
    // an executor task (cast("string") is no better — binary would cast
    // to garbage text and score silently wrong)
    require(cands.schema(docCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"rerank scores (query, TEXT) pairs — column '$docCol' is " +
        s"${cands.schema(docCol).dataType.simpleString}, not string")
    val in = cands.select(col(idCol).cast("string").as("id"),
      col(docCol).as("__doc"), col(priorCol).cast("int").as("__prior"))
    val scored = in.mapPartitions { it =>
      it.grouped(bs).flatMap { rows =>
        rows.foreach(r => require(!r.isNullAt(1),
          s"rerank function '$nm': candidate '${r.getString(0)}' has a null " +
            "document — rerank needs the document text"))
        val scores = fn.scoreBatch(query, rows.map(_.getString(1)))
        require(scores.size == rows.size,
          s"rerank function '$nm' returned ${scores.size} scores for ${rows.size} docs")
        rows.zip(scores).map { case (r, s) => (r.getString(0), r.getInt(2), s) }
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaDouble))
      .toDF("id", "__prior", "score")
    // bounded rank: the input is ≤ fetchN rows by the retrieval contract,
    // so the single-partition window sorts a client-sized list
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("__prior"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("score"))
  }
}

/** A pairwise (query, document) relevance scorer — the cross-encoder
  * seam. Serializable: the object rides the task closure; model-backed
  * implementations must hold native sessions in a JVM-singleton cache
  * (the [[OnnxEmbeddingFunction]] rule), never an instance field. */
trait RerankFunction extends Serializable {
  def name: String

  /** Max documents per [[scoreBatch]] call (the inference batch). */
  def batchSize: Int = 32

  /** One scoring call: `docs.size <= batchSize`, never empty, no nulls;
    * returns exactly one score per doc, in input order, higher = more
    * relevant to `query`. */
  def scoreBatch(query: String, docs: Seq[String]): Seq[Double]
}

/** The deterministic lexical baseline: score = |distinct query tokens ∩
  * distinct document tokens| (lowercase, whitespace split — one written
  * rule, replayed verbatim by a SQL oracle via list_intersect). Useful
  * in its own right as the zero-model rerank rung, and the fixture that
  * pins the stage's batching/ordering contracts offline. Lowercasing
  * goes through UTF8String — the exact routine Spark's `lower()`
  * applies — never the JVM default locale. */
final case class OverlapRerank() extends RerankFunction {
  override def name: String = "lexical-overlap"

  private def tokens(s: String): Set[String] =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString.split("\\s+").toSet.filter(_.nonEmpty)

  override def scoreBatch(query: String, docs: Seq[String]): Seq[Double] = {
    val q = tokens(query)
    docs.map(d => tokens(d).intersect(q).size.toDouble)
  }
}

/** ONNX-runtime-backed cross-encoder — the real-model plug for the
  * rerank seam, runtime-gated by reflection exactly like
  * [[OnnxEmbeddingFunction]] (compiles and runs without the jar;
  * CONSTRUCTION fails loudly when `ai.onnxruntime` is absent). The model
  * is expected to map `input_ids: int64[batch, maxLen]` (the caller's
  * `tokenizePair` encodes one query+doc pair per row — the standard
  * cross-encoder `[CLS] q [SEP] d [SEP]` shape) to a `float[batch]` or
  * `float[batch][1]` relevance score. Sessions live in the shared
  * JVM-singleton cache keyed by modelPath. Determinism caveat as stated
  * on [[ModelEmbeddingFunction]]: real inference is not bit-replayable,
  * so reranks through this function are spec-pinned only up to the
  * runtime gate offline. */
final class OnnxRerankFunction(
    modelPath: String,
    override val name: String,
    tokenizePair: (String, String) => Array[Long],
    maxLen: Int = 256,
    padId: Long = 0L,
    inputName: String = "input_ids",
    override val batchSize: Int = 32) extends RerankFunction {

  require(maxLen > 0, s"maxLen must be positive, got $maxLen")
  if (!OnnxEmbeddingFunction.runtimeAvailable)
    throw new IllegalStateException(
      s"OnnxRerankFunction('$name') needs the ONNX runtime on the " +
        s"classpath but ${OnnxEmbeddingFunction.RuntimeClass} is not " +
        "loadable — add the com.microsoft.onnxruntime:onnxruntime jar to " +
        "the driver and executor classpaths (e.g. spark-submit --jars), " +
        "or use OverlapRerank")

  override def scoreBatch(query: String, docs: Seq[String]): Seq[Double] = {
    val (env, session) = OnnxEmbeddingFunction.sessionFor(modelPath)
    val ids: Array[Array[Long]] = docs.map { d =>
      val raw = tokenizePair(query, d)
      if (raw.length >= maxLen) raw.take(maxLen)
      else raw ++ Array.fill(maxLen - raw.length)(padId)
    }.toArray
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val tensor = tensorCls
      .getMethod("createTensor", Class.forName(OnnxEmbeddingFunction.RuntimeClass),
        classOf[Object])
      .invoke(null, env, ids)
    try {
      val result = session.getClass
        .getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session, java.util.Collections.singletonMap(inputName, tensor))
      try {
        val first = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        first.getClass.getMethod("getValue").invoke(first) match {
          case m: Array[Float] => m.map(_.toDouble).toSeq
          case m: Array[Array[Float]] if m.forall(_.length == 1) =>
            m.map(_(0).toDouble).toSeq
          case other => throw new IllegalStateException(
            s"ONNX model '$modelPath' output 0 is ${other.getClass.getName}; " +
              "expected float[batch] or float[batch][1] relevance scores")
        }
      } finally result.getClass.getMethod("close").invoke(result)
    } finally tensorCls.getMethod("close").invoke(tensor)
  }
}
