package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** The trained quality-classifier rung: pure-integer batch-perceptron
  * training (the property that makes the fit oracle-replayable),
  * learnability on a separable token signal, scoring shape, and gates. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // separable corpus: "spam"-tokened docs are negative
  private val labeled = Seq(
    ("1", "good clean prose about joins", true),
    ("2", "more good content on hash tables", true),
    ("3", "spam spam buy now spam", false),
    ("4", "spam offer spam deal", false),
    ("5", "clean walkthrough of stream state", true),
    ("6", "now buy spam spam spam", false)).toDF("id", "text", "label")

  test("perceptron learns a separable token signal and scoring matches training semantics") {
    val w = QualityClassifier.trainPerceptron(labeled, "id", "text", "label",
      dim = 32, epochs = 3)
    assert(w.length == 33) // dim buckets + bias
    val scored = QualityClassifier.score(labeled, "id", "text", w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getString(3))).sortBy(_._1)
    // the seed set itself separates after 3 epochs
    val byId = scored.map(s => s._1 -> s._3).toMap
    assert(byId == Map("1" -> true, "2" -> true, "3" -> false,
      "4" -> false, "5" -> true, "6" -> false))
    assert(scored.forall { case (_, sc, kept, reason) =>
      kept == (sc > 0) &&
        reason == (if (kept) "kept" else "clf_negative") })
  }

  test("training is deterministic: same inputs, bit-identical integer weights") {
    val w1 = QualityClassifier.trainPerceptron(labeled, "id", "text", "label",
      dim = 16, epochs = 2)
    val w2 = QualityClassifier.trainPerceptron(
      labeled.repartition(7), "id", "text", "label", dim = 16, epochs = 2)
    assert(w1.toSeq == w2.toSeq) // integer folds are partitioning-proof
  }

  test("scoring generalizes off the seed set through shared token buckets") {
    val w = QualityClassifier.trainPerceptron(labeled, "id", "text", "label",
      dim = 32, epochs = 3)
    val fresh = Seq(("7", "spam spam spam spam spam spam"),
      ("8", "good clean hash joins")).toDF("id", "text")
    val m = QualityClassifier.score(fresh, "id", "text", w)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(m("7") == false && m("8") == true)
  }

  test("gates: bad dim/epochs/weights fail loudly; null text scores as empty") {
    intercept[IllegalArgumentException](QualityClassifier.trainPerceptron(
      labeled, "id", "text", "label", dim = 0))
    intercept[IllegalArgumentException](QualityClassifier.trainPerceptron(
      labeled, "id", "text", "label", epochs = 0))
    intercept[IllegalArgumentException](
      QualityClassifier.score(labeled, "id", "text", Array(1L)))
    val w = QualityClassifier.trainPerceptron(labeled, "id", "text", "label",
      dim = 16, epochs = 1)
    val nulls = Seq(("9", null: String)).toDF("id", "text")
    val r = QualityClassifier.score(nulls, "id", "text", w).collect().head
    assert(!r.isNullAt(1)) // '' tokenizes to one empty token + bias, never null
  }
}
