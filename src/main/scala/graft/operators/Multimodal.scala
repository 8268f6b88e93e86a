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

  // ---- REAL image decode (no stub): javax.imageio PNG ----
  //
  // The one pure-JVM codec this container ships. The payloads are real,
  // decodable PNG byte streams (encoded below from a deterministic pixel
  // formula), and [[decodeImages]] runs an actual ImageIO decode per row
  // inside the same per-partition batch shape as [[decodeStub]] — so the
  // oracle can replay the FEATURES from the pixel formula (PNG is
  // lossless: decode ∘ encode = identity on 8-bit RGB), while the engine
  // path exercises a genuine codec: bytes → decoder → pixel statistics.

  /** Decoded per-image features: dimensions + exact per-channel means
    * (integer pixel sums divided once — IEEE-exact, oracle-replayable). */
  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** The deterministic pixel formula shared by the encoder and the
    * oracle: channel values of pixel (x, y) of image `id`. All inputs
    * are non-negative, so `%` agrees across engines. */
  @inline private[graft] def pxR(id: Long, x: Int, y: Int): Int = ((7 * id + 3 * x + 5 * y) % 256).toInt
  @inline private[graft] def pxG(id: Long, x: Int, y: Int): Int = ((11 * id + 13 * x + y) % 256).toInt
  @inline private[graft] def pxB(id: Long, x: Int, y: Int): Int = ((id + x + 17 * y) % 256).toInt
  private[graft] def widthOf(id: Long): Int = 16 + (id % 4).toInt * 8
  private[graft] val FixedHeight = 16

  /** Real PNG payloads from any id column: pixel (x,y) of image `id` is
    * the [[pxR]]/[[pxG]]/[[pxB]] formula, encoded through an actual
    * `javax.imageio` PNG writer per row (one compressed byte stream per
    * image, the exact thing a crawler-fed media column holds). Width
    * varies with id so decoders can't assume one shape. */
  def syntheticPngFrame(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id")).as[Long].mapPartitions { ids =>
      // encoder init once per partition (ImageIO scans its SPI registry
      // on first use; keep that out of the per-row loop)
      ids.map { id =>
        val w = widthOf(id)
        val h = FixedHeight
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ok = javax.imageio.ImageIO.write(img, "png", bos)
        require(ok, "no PNG writer available in this JVM")
        MediaRow(id, "image", bos.toByteArray, w, h, 0, 0L)
      }
    }
  }

  /** REAL decode + featurize: per-partition batch loop, each row through
    * `ImageIO.read` (an actual PNG inflate + filter reconstruction), then
    * one pass over the raster for per-channel means. Dimensions come from
    * the DECODED image, not the metadata — a real pipeline trusts the
    * bytes, not the sidecar. Undecodable payloads fail LOUDLY with the
    * offending media_id (a silent skip would under-count features). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for media_id=${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        ImageFeatures(r.media_id, w, h, sr / n, sg / n, sb / n)
      }
    }
  }
}
