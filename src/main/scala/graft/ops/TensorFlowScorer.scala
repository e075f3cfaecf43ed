package graft.ops

import graft.ops.PredictionPipeline.Scorer

/** OPTIONAL TensorFlow-backed [[PredictionPipeline.Scorer]] — makes M2
  * exact-score parity one artifact-drop away: the reference scores
  * with a TF 1.x SavedModel that lives only in its GCS bucket
  * (`utils/PathConfigs.java`), so the hermetic build ships
  * [[PredictionPipeline.DeterministicScorer]]; a user who HAS the
  * artifact drops (a) the model dir and (b) the public `libtensorflow`
  * jars on the classpath, and this adapter reproduces the reference's
  * session semantics exactly (`transforms/Predictions.java:146-169`):
  *
  *  - `SavedModelBundle.load(dir, "serve")` once per executor JVM
  *    (the `@Setup` analogue — cached per model dir);
  *  - feed `"input_tensor"` = the n×784 float batch;
  *  - feed `"dropout/keep_prob"` = a 1×1024 tensor of ones
  *    (`Predictions.java:163-168` — the model demands it; keep_prob 1
  *    means no dropout at inference);
  *  - fetch `"output_tensor"` → n×10 scores, tensors closed after
  *    every call (TF tensors are native allocations).
  *
  * Implemented via REFLECTION against the public TF Java API so this
  * repo compiles and tests with zero added dependencies (the build's
  * no-new-deps constraint): when `org.tensorflow.SavedModelBundle`
  * is absent, [[TensorFlowScorer.available]] is false and `score`
  * fails with instructions instead of a NoClassDefFoundError from
  * the middle of a task. TensorFlowScorerSpec runs the adapter only
  * when both the jars and a model dir (env `GRAFT_TF_MODEL_DIR`) are
  * present, and always pins the graceful-refusal path.
  *
  * Serializable by construction: only the model-dir STRING ships to
  * executors; the bundle loads lazily JVM-local (same reason the
  * reference marks its bundle `transient`).
  */
final case class TensorFlowScorer(modelDir: String) extends Scorer {

  override def score(batch: Seq[Array[Float]]): Seq[Array[Float]] = {
    if (batch.isEmpty) return Nil // nothing to score — don't touch the classpath
    require(TensorFlowScorer.available, TensorFlowScorer.Missing)
    TensorFlowScorer.score(modelDir, batch)
  }
}

object TensorFlowScorer {

  private[ops] val Missing =
    "org.tensorflow classes not on the classpath — drop the public " +
      "libtensorflow + libtensorflow_jni jars (TF 1.x Java API) next to " +
      "the Spark jars to enable the SavedModel scorer"

  /** True when the TF 1.x Java API is on the classpath. */
  def available: Boolean =
    try { Class.forName("org.tensorflow.SavedModelBundle"); true }
    catch { case _: Throwable => false }

  // one bundle per (JVM, modelDir) — the reference's @Setup analogue;
  // never closed (lives as long as the executor, like its Beam twin)
  private val bundles = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cls(n: String) = Class.forName(n)
  private lazy val bundleCls = cls("org.tensorflow.SavedModelBundle")
  private lazy val tensorCls = cls("org.tensorflow.Tensor")
  private lazy val sessionCls = cls("org.tensorflow.Session")
  private lazy val runnerCls = cls("org.tensorflow.Session$Runner")

  private def bundle(modelDir: String): AnyRef =
    bundles.computeIfAbsent(modelDir, dir =>
      // SavedModelBundle.load(String exportDir, String... tags) — tag
      // "serve", Predictions.java:131
      bundleCls.getMethod("load", classOf[String], classOf[Array[String]])
        .invoke(null, dir, Array("serve")).asInstanceOf[AnyRef])

  private[ops] def score(modelDir: String,
      batch: Seq[Array[Float]]): Seq[Array[Float]] = {
    val b = bundle(modelDir)
    val input: Array[Array[Float]] = batch.toArray
    val create = tensorCls.getMethod("create", classOf[Object])
    val createShaped = tensorCls.getMethod("create",
      classOf[Array[Long]], classOf[java.nio.FloatBuffer])
    val close = tensorCls.getMethod("close")
    // both tensors are NATIVE allocations; create them inside the try
    // with null-guarded closes so a failure between the two (bad TF
    // jar version, OOM) can't leak the already-created one — under
    // Spark task retries a per-batch leak accumulates off-heap
    var x: AnyRef = null
    var rate: AnyRef = null
    try {
      x = create.invoke(null, input)
      // keep_prob = ones(1, 1024): Predictions.java:163-168
      val ones = new Array[Float](1024)
      java.util.Arrays.fill(ones, 1f)
      rate = createShaped.invoke(null, Array(1L, 1024L),
        java.nio.FloatBuffer.wrap(ones))
      val session = bundleCls.getMethod("session").invoke(b)
      val runner = sessionCls.getMethod("runner").invoke(session)
      val feed = runnerCls.getMethod("feed", classOf[String], tensorCls)
      val fetch = runnerCls.getMethod("fetch", classOf[String])
      val run = runnerCls.getMethod("run")
      var r = feed.invoke(runner, "input_tensor", x)
      r = feed.invoke(r, "dropout/keep_prob", rate)
      r = fetch.invoke(r, "output_tensor")
      val out = run.invoke(r).asInstanceOf[java.util.List[AnyRef]].get(0)
      try {
        val pred = Array.ofDim[Float](batch.size, 10)
        tensorCls.getMethod("copyTo", classOf[Object]).invoke(out, pred)
        pred.toSeq
      } finally close.invoke(out)
    } finally {
      if (x != null) close.invoke(x)
      if (rate != null) close.invoke(rate)
    }
  }
}
