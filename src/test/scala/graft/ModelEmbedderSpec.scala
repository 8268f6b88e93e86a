package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.operators.{Embedder, ModelEmbeddingFunction}

/** The model-backed embedding-function seam (the ONNX plug point): a
  * deterministic toy model stands in for a real runtime session, pinning
  * the batch SHAPE (one embedBatch call per partition chunk, never per
  * row), the registry binding rules, driver/executor value parity, null
  * routing, and the full store round trip (addDocuments → queryText)
  * through a registered function. */
object ModelEmbedderSpec {
  /** Deterministic "fake ONNX": vector = char-code stats. A static batch
    * counter observes the inference-call shape (local mode: executors
    * share the JVM, so the counter sees every task's calls). */
  val batchCalls = new AtomicInteger(0)
  val maxBatchSeen = new AtomicInteger(0)

  class ToyOnnxEmbedder(override val batchSize: Int = 4)
      extends ModelEmbeddingFunction {
    override def name: String = "toy-onnx-v1/4"
    override def dim: Int = 4
    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      require(texts.nonEmpty && texts.size <= batchSize,
        s"contract violation: got ${texts.size} texts for batchSize $batchSize")
      require(!texts.contains(null), "contract violation: null text reached the model")
      batchCalls.incrementAndGet()
      maxBatchSeen.updateAndGet(m => math.max(m, texts.size))
      texts.map { t =>
        val cs = t.map(_.toInt)
        Array[Float](t.length.toFloat,
          if (cs.isEmpty) 0f else cs.sum.toFloat,
          if (cs.isEmpty) 0f else cs.max.toFloat,
          t.count(_ == ' ').toFloat)
      }
    }
  }
}

class ModelEmbedderSpec extends SparkTestBase {
  import ModelEmbedderSpec._
  import spark.implicits._

  private def freshToy(): ToyOnnxEmbedder = {
    Embedder.unregister("toy-onnx-v1/4")
    val ef = new ToyOnnxEmbedder()
    Embedder.register(ef)
    ef
  }

  test("registry: resolve by name; reserved prefixes and silent swaps rejected") {
    val ef = freshToy()
    assert(Embedder.fromName("toy-onnx-v1/4") eq ef)
    // re-register of the SAME instance is idempotent
    Embedder.register(ef)
    // a different instance under the live name is loud
    val e = intercept[IllegalArgumentException] {
      Embedder.register(new ToyOnnxEmbedder())
    }
    assert(e.getMessage.contains("already registered"))
    val r = intercept[IllegalArgumentException] {
      Embedder.register(new ToyOnnxEmbedder() {
        override def name: String = Embedder.HashV1Prefix + "8"
      })
    }
    assert(r.getMessage.contains("reserved"))
    // unknown names still fail loud, naming the registered functions
    val u = intercept[IllegalArgumentException](Embedder.fromName("nope-v0/1"))
    assert(u.getMessage.contains("toy-onnx-v1/4"))
  }

  test("embedFrame batches per partition chunk — never one call per row") {
    val ef = freshToy()
    val docs = spark.range(10).select(col("id").cast("string").as("id"),
      concat(lit("text number "), col("id")).as("document")).coalesce(1)
    batchCalls.set(0); maxBatchSeen.set(0)
    val out = ef.embedFrame(docs, "document", "embedding")
    val rows = out.collect()
    assert(rows.length == 10)
    // 10 rows in ONE partition at batchSize 4 → exactly 3 inference calls
    assert(batchCalls.get() == 3, s"expected 3 batch calls, got ${batchCalls.get()}")
    assert(maxBatchSeen.get() == 4)
    // values: driver embedOne agrees element-for-element with the frame
    rows.foreach { r =>
      val t = r.getString(1)
      assert(r.getSeq[Float](2) == ef.embedOne(t),
        s"frame/driver divergence for '$t'")
    }
  }

  test("null texts never reach the model and map to null embeddings") {
    val ef = freshToy()
    val docs = Seq(("1", "alpha"), ("2", null), ("3", "beta"))
      .toDF("id", "document").coalesce(1)
    val out = ef.embedFrame(docs, "document", "embedding").collect()
      .map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(out == Map("1" -> false, "2" -> true, "3" -> false))
  }

  test("a lying model (wrong count / wrong dim) fails the task, never commits") {
    val bad = new ModelEmbeddingFunction {
      override def name = "toy-bad-v1/4"
      override def dim = 4
      override def embedBatch(texts: Seq[String]) =
        texts.map(_ => Array(1f, 2f)) // wrong dim
    }
    val docs = Seq(("1", "alpha")).toDF("id", "document")
    val e = intercept[org.apache.spark.SparkException] {
      bad.embedFrame(docs, "document", "embedding").collect()
    }
    assert(e.getMessage.contains("dim") ||
      Option(e.getCause).exists(_.getMessage.contains("dim")))
  }

  test("store round trip: addDocuments embeds BATCHED, queryText resolves the binding") {
    val ef = freshToy()
    val cat = new CollectionCatalog(spark, tmpDir("model-ef"), numBuckets = 4)
    val c = cat.getOrCreateCollection("m", "l2")
    val docs = spark.range(40).select(col("id").cast("string").as("id"),
      concat(lit("document body "), col("id")).as("document"))
    batchCalls.set(0)
    c.addDocuments(docs, ef)
    assert(batchCalls.get() > 0 && batchCalls.get() < 40,
      s"expected batched inference, got ${batchCalls.get()} calls for 40 rows")
    assert(c.meta.metadata.get("embedding_function").contains("toy-onnx-v1/4"))
    // queryText resolves through the registry and embeds with the SAME model
    val hits = c.queryText(Seq("document body 7"), k = 1)
      .select("id").as[String].collect()
    assert(hits.length == 1)
    // the stored vector is bit-equal to the driver-side embedding
    val stored = c.get(ids = Seq("7")).select("embedding")
      .collect().head.getSeq[Float](0)
    assert(stored == ef.embedOne("document body 7"))
    // an UNREGISTERED binding fails loud at query time (fresh JVM story)
    Embedder.unregister("toy-onnx-v1/4")
    val e = intercept[IllegalArgumentException](c.queryText(Seq("x"), k = 1))
    assert(e.getMessage.contains("toy-onnx-v1/4"))
  }

  test("OnnxEmbeddingFunction is runtime-gated: loud at construction without the jar") {
    // this sandbox has no onnxruntime jar BY DESIGN (zero extra deps) —
    // the real-model plug must fail at CONSTRUCTION, naming the missing
    // dependency and the wiring, never deep inside an executor task
    assert(!graft.operators.OnnxEmbeddingFunction.runtimeAvailable)
    val e = intercept[IllegalStateException] {
      new graft.operators.OnnxEmbeddingFunction(
        modelPath = "/models/encoder.onnx", name = "enc-v1", dim = 384,
        tokenize = _.split("\\s+").map(_.length.toLong))
    }
    assert(e.getMessage.contains("ai.onnxruntime"))
    assert(e.getMessage.contains("classpath"))
    // the behavioral contracts the class INHERITS (batching, null safety,
    // shape validation, store binding) are pinned above with the
    // deterministic toy — the only part the sandbox cannot drive is the
    // reflective OrtSession call itself
  }
}
