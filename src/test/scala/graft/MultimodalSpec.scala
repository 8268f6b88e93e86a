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
}
