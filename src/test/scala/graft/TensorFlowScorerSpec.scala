package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PredictionPipeline, TensorFlowScorer}

/** The optional SavedModel scorer (M2's artifact-drop parity path).
  * The model artifact lives only in the reference's GCS bucket and the
  * TF jars are not vendored (no-new-deps build), so the REAL scoring
  * test self-skips unless both are present; the refusal path and the
  * pipeline seam always run.
  *
  * To run the full test: put the public libtensorflow 1.x jars on the
  * test classpath and `export GRAFT_TF_MODEL_DIR=/path/to/savedmodel`
  * (dir containing `saved_model.pb`, tag "serve", ops input_tensor /
  * dropout-keep_prob / output_tensor — the reference's contract). */
class TensorFlowScorerSpec extends AnyFunSuite with SparkSpec {

  test("without the TF jars, score refuses with instructions (no NoClassDefFoundError)") {
    assume(!TensorFlowScorer.available, "TF jars present — refusal path not reachable")
    val e = intercept[IllegalArgumentException] {
      TensorFlowScorer("/nonexistent").score(Seq(Array.fill(784)(0f)))
    }
    assert(e.getMessage.contains("libtensorflow"),
      "refusal must tell the user what to drop in")
  }

  test("the scorer plugs into predict() as a drop-in for DeterministicScorer") {
    // seam check, runnable everywhere: predict() accepts ANY Scorer;
    // an empty batch must be a no-op for the TF adapter even without
    // the jars (nothing to score — no reason to touch the classpath)
    assert(TensorFlowScorer("/nonexistent").score(Nil) === Nil)
    val s = spark
    import s.implicits._
    val features = Seq((1, "u1", Array.fill(784)(0.5f))).toDF("os", "uuid", "f")
    val out = PredictionPipeline.predict(features) // hermetic default
    assert(out.columns.toSeq === Seq("os", "uuid", "prediction", "score"))
  }

  test("SavedModel scoring matches the reference session semantics") {
    val modelDir = sys.env.get("GRAFT_TF_MODEL_DIR")
    assume(TensorFlowScorer.available, "TF jars absent — skipping")
    assume(modelDir.exists(d => new java.io.File(d, "saved_model.pb").isFile),
      "GRAFT_TF_MODEL_DIR not set or no saved_model.pb — skipping")
    val scorer = TensorFlowScorer(modelDir.get)
    val batch = (0 until 60).map(i => Array.tabulate(784)(k =>
      if ((k + i) % 7 == 0) 1f else 0f))
    val scores = scorer.score(batch)
    assert(scores.size === 60)
    assert(scores.forall(_.length === 10), "model must emit 10 scores per input")
    // determinism across calls (keep_prob = 1 → no dropout noise)
    assert(scorer.score(batch).zip(scores).forall { case (a, b) => a.sameElements(b) })
    // end-to-end through the batched predict() seam
    val s = spark
    import s.implicits._
    val features = batch.zipWithIndex
      .map { case (f, i) => (1, s"u$i", f) }.toDF("os", "uuid", "f")
    val out = PredictionPipeline.predict(features, scorer).collect()
    assert(out.length === 60)
  }
}
