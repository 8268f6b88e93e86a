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

  // ---- REAL audio decode (no stub): javax.sound.sampled WAV/PCM ----
  //
  // The second pure-JVM codec this container ships (the q123 PNG pattern
  // applied to audio): payloads are real RIFF/WAVE byte streams holding
  // 16-bit little-endian stereo PCM encoded from a deterministic integer
  // sample formula, and [[decodeAudio]] runs an actual
  // `AudioSystem.getAudioInputStream` container parse + PCM read per row.
  // PCM in a WAV container is lossless, so decode ∘ encode = identity on
  // the samples and the formula IS the decoded signal — the oracle
  // replays the FEATURES (frame counts, per-channel RMS) from the
  // formula in plain SQL while the engine path exercises a genuine
  // codec: bytes → parser → samples → signal statistics.

  /** Decoded per-clip features: container facts + exact per-channel RMS
    * (integer sums of squares divided once, then one IEEE sqrt — both
    * replayable bit-for-bit in SQL). */
  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long, rms_l: Double, rms_r: Double)

  /** The deterministic sample formula shared by the encoder and the
    * oracle: channel amplitudes of frame `t` of clip `id`, integers in
    * [-1000, 1000]. Inputs are non-negative before `%`, so the modulus
    * agrees across engines. */
  @inline private[graft] def pcmL(id: Long, t: Int): Int =
    (((3 * id + 7 * t) % 2001) - 1000).toInt
  @inline private[graft] def pcmR(id: Long, t: Int): Int =
    (((5 * id + 11 * t) % 2001) - 1000).toInt
  private[graft] def framesOf(id: Long): Int = 800 + (id % 4).toInt * 400
  private[graft] val WavSampleRate = 8000

  /** Real WAV payloads from any id column: frame `t` of clip `id` is the
    * [[pcmL]]/[[pcmR]] formula, packed as 16-bit little-endian stereo
    * PCM and written through an actual `javax.sound.sampled` WAVE writer
    * per row (one RIFF byte stream per clip, the exact thing a
    * crawler-fed audio column holds). Clip length varies with id so
    * decoders can't assume one shape. */
  def syntheticWavFrame(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id")).as[Long].mapPartitions { ids =>
      val fmt = new javax.sound.sampled.AudioFormat(
        WavSampleRate.toFloat, 16, 2, true, false) // signed, little-endian
      ids.map { id =>
        val n = framesOf(id)
        val bytes = new Array[Byte](n * 4)
        var t = 0
        while (t < n) {
          val l = pcmL(id, t); val r = pcmR(id, t)
          bytes(4 * t) = (l & 0xff).toByte
          bytes(4 * t + 1) = ((l >> 8) & 0xff).toByte
          bytes(4 * t + 2) = (r & 0xff).toByte
          bytes(4 * t + 3) = ((r >> 8) & 0xff).toByte
          t += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio", bos.toByteArray, 0, 0, WavSampleRate,
          n.toLong * 1000L / WavSampleRate)
      }
    }
  }

  /** REAL decode + featurize: per-partition batch loop, each row through
    * `AudioSystem.getAudioInputStream` (an actual RIFF/fmt-chunk parse),
    * then one pass over the PCM frames for per-channel sums of squares.
    * Format facts come from the DECODED stream, not the metadata — a
    * real pipeline trusts the bytes, not the sidecar. Undecodable or
    * non-16-bit-PCM payloads fail LOUDLY with the offending media_id. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"undecodable audio payload for media_id=${r.media_id}", e)
          }
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"media_id=${r.media_id}: expected 16-bit little-endian signed " +
            s"PCM, got $fmt")
        val nCh = fmt.getChannels
        val data = ais.readAllBytes()
        val nFrames = data.length / (2 * nCh)
        var sl = 0L; var sr2 = 0L
        var t = 0
        while (t < nFrames) {
          val base = t * 2 * nCh
          // little-endian 16-bit with sign restored by the Short cut
          val l = ((data(base + 1) << 8) | (data(base) & 0xff)).toShort.toInt
          sl += l.toLong * l
          if (nCh > 1) {
            val rv = ((data(base + 3) << 8) | (data(base + 2) & 0xff)).toShort.toInt
            sr2 += rv.toLong * rv
          }
          t += 1
        }
        val rate = fmt.getSampleRate.toInt
        val nd = math.max(nFrames, 1).toDouble
        AudioFeatures(r.media_id, rate, nCh, nFrames,
          nFrames.toLong * 1000L / rate,
          math.sqrt(sl.toDouble / nd), math.sqrt(sr2.toDouble / nd))
      }
    }
  }
}
