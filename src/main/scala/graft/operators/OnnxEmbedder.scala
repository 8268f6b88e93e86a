package graft.operators

/** ONNX-runtime-backed [[ModelEmbeddingFunction]] — the real-model plug
  * for the embedding seam (reference context: the hydrated collection is
  * meant to hold neural-model vectors, README.md:40,56; this repo itself
  * ships ZERO dependencies beyond Spark, so the runtime is an OPTIONAL
  * companion jar).
  *
  * RUNTIME-GATED BY REFLECTION: the class never links against
  * `ai.onnxruntime` — it resolves the runtime via `Class.forName` so this
  * library compiles and runs without the jar, and CONSTRUCTION (not first
  * inference, deep inside an executor task) fails loudly when the runtime
  * is absent, naming the dependency to add. Wiring: drop
  * `onnxruntime-<ver>.jar` on the driver AND executor classpaths
  * (`--jars onnxruntime.jar`), then
  *
  *   val ef = new OnnxEmbeddingFunction(
  *     modelPath = "/models/encoder.onnx",   // executor-readable path
  *     name = "my-encoder-v1", dim = 384,
  *     tokenize = myBpe.encodeIds(_))        // model-specific (e.g. Lm BPE)
  *   coll.addDocuments(df, ef)               // batched mapPartitions path
  *
  * Execution shape is [[ModelEmbeddingFunction]]'s: the function object
  * serializes into the task closure; each executor JVM opens ONE
  * OrtSession per modelPath on first use (a companion-object cache —
  * NOT an instance field, which would re-open a native session per task
  * and leak), and [[embedBatch]] makes ONE `session.run` per
  * ≤[[batchSize]] texts — the tensor shape an ONNX encoder wants. Token
  * ids pad/truncate to `maxLen` with `padId`.
  * The model is expected to map `input_ids: int64[batch, maxLen]` to a
  * POOLED `float[batch, dim]` first output; models emitting per-token
  * `[batch, seq, hidden]` need a pooling head exported into the graph.
  *
  * Determinism caveat (the [[ModelEmbeddingFunction]] contract, stated
  * not hidden): real neural inference is not bit-replayable across
  * hardware, so collections bound to this function keep the store's
  * same-function guard but are not SQL-oracle-replayable. The offline
  * test suite therefore pins THIS class only up to the runtime gate (the
  * sandbox has no onnxruntime jar); the batching/null/shape contracts it
  * inherits are pinned by the deterministic-toy ModelEmbedderSpec.
  */
final class OnnxEmbeddingFunction(
    modelPath: String,
    override val name: String,
    override val dim: Int,
    tokenize: String => Array[Long],
    maxLen: Int = 256,
    padId: Long = 0L,
    inputName: String = "input_ids",
    override val batchSize: Int = 64) extends ModelEmbeddingFunction {

  require(dim > 0, s"dim must be positive, got $dim")
  require(maxLen > 0, s"maxLen must be positive, got $maxLen")
  if (!OnnxEmbeddingFunction.runtimeAvailable)
    throw new IllegalStateException(
      s"OnnxEmbeddingFunction('$name') needs the ONNX runtime on the " +
        s"classpath but ${OnnxEmbeddingFunction.RuntimeClass} is not " +
        "loadable — add the com.microsoft.onnxruntime:onnxruntime jar to " +
        "the driver and executor classpaths (e.g. spark-submit --jars), " +
        "or use a built-in embedding function")

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    // JVM-SINGLETON session (companion cache): this function object rides
    // every task closure, so an instance-held lazy val would re-open a
    // native OrtSession per TASK and never close it — an unbounded
    // native-memory leak on executors
    val (env, session) = OnnxEmbeddingFunction.sessionFor(modelPath)
    val ids: Array[Array[Long]] = texts.map { t =>
      val raw = tokenize(t)
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
          case m: Array[Array[Float]] => m.toSeq
          case other => throw new IllegalStateException(
            s"ONNX model '$modelPath' output 0 is ${other.getClass.getName}; " +
              "expected float[batch][dim] — export a pooled-embedding head")
        }
      } finally result.getClass.getMethod("close").invoke(result)
    } finally tensorCls.getMethod("close").invoke(tensor)
  }
}

object OnnxEmbeddingFunction {

  /** The runtime's entry class — present iff the optional jar is wired. */
  val RuntimeClass = "ai.onnxruntime.OrtEnvironment"

  /** Whether the optional ONNX runtime is on this JVM's classpath. */
  def runtimeAvailable: Boolean =
    try { Class.forName(RuntimeClass); true }
    catch { case _: ClassNotFoundException => false }

  /** One OrtSession per (JVM, modelPath): the function object serializes
    * into every task closure, so the session must live OUTSIDE the
    * instance or each task would open (and leak) its own native session.
    * Process-lifetime by design — sessions are reused by every job the
    * executor runs and die with the JVM (the standard ONNX-on-Spark
    * pattern); closing on job end would race concurrent jobs sharing the
    * model. */
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, (AnyRef, AnyRef)]()

  private[operators] def sessionFor(modelPath: String): (AnyRef, AnyRef) =
    sessions.computeIfAbsent(modelPath, p => {
      val envCls = Class.forName(RuntimeClass)
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val session = envCls.getMethod("createSession", classOf[String]).invoke(env, p)
      (env, session)
    })
}
