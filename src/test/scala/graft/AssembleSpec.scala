package graft

import org.apache.spark.sql.functions._
import graft.operators.Assemble

class AssembleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val wide = Seq(
    (1L, "t1", Some(1.0), Some(2.0), Some(3.0), 9.9),
    (2L, "t2", Some(4.0), None, Some(6.0), 8.8),   // ragged after null drop
    (3L, "t3", None, None, None, 7.7)
  ).toDF("doc_id", "text", "emb_0", "emb_1", "emb_2", "other")

  test("pattern projection selects only matching columns") {
    assert(Assemble.columnsLike(wide, "emb_") == Seq("emb_0", "emb_1", "emb_2"))
    assert(Assemble.projectLike(wide, "emb_").columns.toSeq == Seq("emb_0", "emb_1", "emb_2"))
  }

  test("regex column selection (sas:148 variant)") {
    assert(Assemble.columnsMatching(wide, "^emb_\\d+$") == Seq("emb_0", "emb_1", "emb_2"))
    assert(Assemble.columnsMatching(wide, "emb") == Seq("emb_0", "emb_1", "emb_2"))
  }

  test("row-wise assembly drops nulls per row (ragged by design)") {
    val dims = wide.select(col("doc_id"),
        size(Assemble.assembleVectorLike(wide, "emb_")).as("d"))
      .orderBy("doc_id").as[(Long, Int)].collect()
    assert(dims.toSeq == Seq((1L, 3), (2L, 2), (3L, 0)))
  }

  test("assembled values keep column order and cast to float") {
    val v = wide.filter(col("doc_id") === 1)
      .select(Assemble.assembleVectorLike(wide, "emb_").as("v"))
      .as[Seq[Float]].head()
    assert(v == Seq(1f, 2f, 3f))
  }

  test("id cast to string mirrors str(i)") {
    val ids = wide.select(Assemble.idAsString("doc_id")).as[String].collect().toSet
    assert(ids == Set("1", "2", "3"))
  }

  test("metadata map wraps one column under fixed key") {
    val m = wide.select(Assemble.metadataMap("other").as("m"))
      .select(element_at(col("m"), "rating")).as[String].collect().toSet
    assert(m == Set("9.9", "8.8", "7.7"))
  }

  test("hydrationFrame produces the collection-row shape") {
    val f = Assemble.hydrationFrame(wide, "doc_id", "text", "emb_", Some("other"))
    assert(f.columns.toSeq == Seq("id", "document", "embedding", "metadata"))
    val r = f.filter(col("id") === "1").head()
    assert(r.getString(1) == "t1")
    assert(r.getSeq[Float](2) == Seq(1f, 2f, 3f))
    assert(r.getMap[String, String](3) == Map("rating" -> "9.9"))
  }

  test("validateUniformDim rejects ragged vectors (Chroma add invariant)") {
    val f = Assemble.hydrationFrame(wide, "doc_id", "text", "emb_")
    val e = intercept[IllegalArgumentException] {
      Assemble.validateUniformDim(f, "embedding")
    }
    assert(e.getMessage.contains("ragged"))
    val uniform = wide.filter(col("doc_id") === 1)
    assert(Assemble.validateUniformDim(
      Assemble.hydrationFrame(uniform, "doc_id", "text", "emb_"), "embedding") == 3)
  }

  test("validateUniformDim: empty frame -> 0; null vector -> clear error") {
    val empty = wide.filter(col("doc_id") < 0)
    assert(Assemble.validateUniformDim(
      Assemble.hydrationFrame(empty, "doc_id", "text", "emb_"), "embedding") == 0)
    val withNullVec = Seq((1L, Some(Seq(1f))), (2L, None)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Assemble.validateUniformDim(withNullVec, "v")
    }
    assert(e.getMessage.contains("null embedding"))
  }
}
