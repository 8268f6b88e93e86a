package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic slice: limit without orderBy may pick different rows on
  // each re-evaluation (feats and the join probe evaluate docs separately)
  private lazy val docs = spark.read.parquet(sf("documents")).orderBy("doc_id").limit(30)
  private lazy val media = Multimodal.fakeMediaFrame(docs, "doc_id", "text")

  test("media frame carries binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("width").dataType.typeName == "integer")
    val r = media.filter(col("media_id") === 0).head()
    assert(r.kind == "image" && r.payload.nonEmpty)
  }

  test("decode stub: fixed feature schema, deterministic values") {
    val f1 = Multimodal.decodeStub(media, embeddingDim = 8).collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.decodeStub(media, embeddingDim = 8).collect().map(f => f.media_id -> f).toMap
    assert(f1.keySet == f2.keySet)
    f1.foreach { case (id, f) =>
      assert(f.embedding.length == 8)
      assert(f.embedding.sameElements(f2(id).embedding)) // deterministic
      assert(f.n_bytes > 0 && f.mean_byte > 0)
    }
  }

  test("decoded features join back to the corpus (plumbing end-to-end)") {
    val feats = Multimodal.decodeStub(media).toDF()
    val joined = docs.join(feats, col("doc_id") === col("media_id"))
    assert(joined.count() == 30)
    // n_bytes counts UTF-8 BYTES — compare octet_length, not char length
    val bad = joined.filter(col("n_bytes") =!= octet_length(col("text"))).count()
    assert(bad == 0)
  }

  test("real PNG decode: ImageIO round-trip recovers the pixel formula exactly") {
    val ids = Seq(0L, 1L, 3L, 1000L, 123456789L).toDF("doc_id")
    val png = Multimodal.syntheticPngFrame(ids, "doc_id")
    // the payloads are REAL PNGs (magic bytes), not formula bytes
    png.collect().foreach { r =>
      assert(r.payload.take(4).sameElements(
        Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        s"media_id=${r.media_id} payload is not a PNG stream")
      assert(r.kind == "image")
    }
    val feats = Multimodal.decodeImages(png).collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(0L, 1L, 3L, 1000L, 123456789L))
    feats.foreach { case (id, f) =>
      val w = 16 + (id % 4).toInt * 8
      assert(f.width == w && f.height == 16, s"decoded dims for $id")
      // independent replay of the formula (same arithmetic the oracle runs)
      def mean(px: (Long, Int, Int) => Int): Double = {
        var s = 0L
        for (y <- 0 until 16; x <- 0 until w) s += px(id, x, y)
        s.toDouble / (w * 16)
      }
      assert(f.mean_r == mean(Multimodal.pxR), s"mean_r for $id")
      assert(f.mean_g == mean(Multimodal.pxG), s"mean_g for $id")
      assert(f.mean_b == mean(Multimodal.pxB), s"mean_b for $id")
    }
  }

  test("real decode fails loudly on an undecodable payload") {
    val bad = Seq(Multimodal.MediaRow(7L, "image", Array[Byte](1, 2, 3),
      1, 1, 0, 0L)).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeImages(bad).collect())
    assert(e.getMessage.contains("media_id=7") ||
      Option(e.getCause).exists(_.getMessage.contains("media_id=7")))
  }

  test("resize stub rewrites image dims and payload, leaves other kinds alone") {
    val resized = Multimodal.resizeStub(media, 32, 32)
    assert(resized.count() == media.count())
    val images = resized.filter(col("kind") === "image")
    assert(images.filter(col("width") =!= 32 || col("height") =!= 32).count() == 0)
    // non-image rows pass through untouched
    val audioBefore = media.filter(col("kind") === "audio")
      .select("media_id", "width").as[(Long, Int)].collect().toMap
    val audioAfter = resized.filter(col("kind") === "audio")
      .select("media_id", "width").as[(Long, Int)].collect().toMap
    assert(audioBefore == audioAfter)
    // payload length scales with area (stub contract)
    val r = resized.filter(col("kind") === "image").head()
    assert(r.payload.nonEmpty)
  }

  test("frame sampling explodes video rows on the time axis") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val kinds = media.filter(col("kind") === "video").count()
    assert(frames.count() >= kinds) // at least one frame per video
    assert(frames.columns.toSeq == Seq("media_id", "frame_ts_ms"))
    val neg = frames.filter(col("frame_ts_ms") < 0).count()
    assert(neg == 0)
  }

  test("balanced repartitioning spreads decode batches") {
    val parts = Multimodal.balanced(media, 4).rdd.getNumPartitions
    assert(parts == 4)
  }

  test("WAV round-trip: real container encode, real decode, formula-exact features") {
    val ids = Seq(0L, 1L, 5L, 42L)
    val clips = Multimodal.syntheticWavFrame(ids.toDF("doc_id"), "doc_id")
    // the payload is a genuine RIFF/WAVE stream, not raw PCM
    val first = clips.orderBy("media_id").head()
    assert(new String(first.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(first.payload.slice(8, 12), "US-ASCII") == "WAVE")
    val feats = Multimodal.decodeAudio(clips).collect()
      .map(f => f.media_id -> f).toMap
    ids.foreach { id =>
      val f = feats(id)
      val n = Multimodal.framesOf(id)
      assert(f.sample_rate == 8000 && f.channels == 2)
      assert(f.n_frames == n && f.duration_ms == n * 1000L / 8000)
      // decode ∘ encode = identity on PCM, so RMS equals the formula's
      def rms(s: Int => Int): Double =
        math.sqrt((0 until n).map(t => s(t).toLong * s(t)).sum.toDouble / n)
      assert(f.rms_l == rms(t => Multimodal.pcmL(id, t)),
        s"clip $id left-channel RMS diverged from the sample formula")
      assert(f.rms_r == rms(t => Multimodal.pcmR(id, t)))
    }
  }

  test("audio decode fails loudly on an undecodable payload") {
    val bad = Seq(Multimodal.MediaRow(9L, "audio", Array[Byte](0, 1, 2, 3),
      0, 0, 8000, 0L)).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeAudio(bad).collect())
    assert(e.getMessage.contains("media_id=9") ||
      Option(e.getCause).exists(_.getMessage.contains("media_id=9")))
  }
}
