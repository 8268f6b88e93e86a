package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads travel as opaque BINARY columns + a typed metadata struct, and
  * decode/feature-extraction runs per-partition over the binary batches.
  *
  * The decode step itself is a clearly-marked STUB (no codec libraries in
  * this environment): `decodeStub` derives deterministic pseudo-features
  * from the bytes. Everything AROUND it is the real Spark plumbing —
  * schema, partition-sized batching via typed `mapPartitions` (the JVM
  * analogue of arrow-batched Python UDFs), and hash repartitioning so one
  * partition's payload bytes fit executor memory at 100 TB.
  */
object Multimodal {

  /** One media row: payload + the typed metadata that travels with it. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  /** Extracted features (fixed schema regardless of modality). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, embedding: Array[Float])

  /** Media frame schema as a DataFrame (media_id, kind, payload, meta...). */
  def mediaSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.Encoders
    Encoders.product[MediaRow].schema
  }

  /** Derive a deterministic fake media table from any string column —
    * stands in for real image/audio bytes in tests and demos. */
  def fakeMediaFrame(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val bytes = t.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, bytes, width = 64 + (id % 4).toInt * 32,
          height = 64, sample_rate = 16000, duration_ms = bytes.length.toLong * 10)
      }
  }

  /** STUB decode + featurize: per-partition batch loop over binary payloads.
    * A real deployment swaps the body marked below for an actual codec call
    * (JNI/ONNX/…); the batching shape, schema, and partitioning are final.
    */
  def decodeStub(media: Dataset[MediaRow], embeddingDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // one partition = one decode batch; a real decoder would init its
      // codec/context HERE, once per partition, then stream rows through it
      rows.map { r =>
        // ---- STUB: deterministic pseudo-decode (replace with real codec) ----
        val n = r.payload.length
        var sum = 0L
        var i = 0
        while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        val emb = Array.tabulate(embeddingDim) { d =>
          var acc = 0L
          var j = d
          while (j < n) { acc += (r.payload(j) & 0xff).toLong * ((j % 7) + 1); j += embeddingDim }
          (acc % 1000L) / 1000.0f
        }
        // ---- end STUB ----
        MediaFeatures(r.media_id, r.kind, n, mean, emb)
      }
    }
  }

  /** STUB resize for image rows: a real implementation decodes, scales and
    * re-encodes; the stub rewrites the metadata and derives a payload whose
    * length scales with the target area — the schema/plumbing contract a
    * real resizer must satisfy (same row count, updated dims, new bytes). */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else {
        // ---- STUB: deterministic fake scale (replace with real codec) ----
        val scale = (w.toLong * h).toDouble / math.max(r.width.toLong * r.height, 1L)
        val n = math.max(1, (r.payload.length * scale).toInt)
        val resized = Array.tabulate(n)(i => r.payload(i % r.payload.length))
        // ---- end STUB ----
        r.copy(payload = resized, width = w, height = h)
      }
    }
  }

  /** Deterministic frame sampling for video rows: every `everyMs` ms of the
    * (stub) duration yields one frame index row — the explode shape a real
    * frame extractor produces. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    val df = media.toDF()
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)), lit(everyMs)))
          .as("frame_ts_ms"))
  }

  /** Repartition media by id hash so each decode batch is bounded — at
    * 100 TB the payload column dominates memory and a skewed partition
    * OOMs the decoder; explicit hash distribution keeps batches even. */
  def balanced(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartition(partitions, col("media_id"))
}
