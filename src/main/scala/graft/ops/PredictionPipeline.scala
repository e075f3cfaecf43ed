package graft.ops

import graft.io.AdtechProtos
import graft.io.AdtechProtos._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference pipeline #2 (PredictionJob) re-expressed Spark-first
  * (`jobs2/PredictionJob.java:94-141`, `transforms/Features.java:55-131`,
  * `transforms/Predictions.java:129-225`):
  *
  *  decode Base64 profiles → drop defaults (F4) → duplicate-ID
  *  assertion on lowercased uuid (J4) → anti-join suspicious ids (J2)
  *  → deterministic 1/16 sample (F6: uuid[7]=='0') → 784-float
  *  feature vectors via broadcast IAPP map (M1, float math matching
  *  `utils/PredictionUtils.java:35-57` exactly — verified by
  *  PredictionParitySpec against the __Test11 oracle) → batched
  *  inference (M2: mapPartitions, per-executor model, batch 60).
  *
  * The reference's TF SavedModel artifact lives only in GCS, so exact
  * M2 score parity is gated on model availability: [[Scorer]] is the
  * seam (`transforms/Predictions.java:146-158` is one implementation;
  * [[DeterministicScorer]] is the hermetic default).
  */
object PredictionPipeline {

  /** Cap on the IAPP side input collected to the driver (~tens of MB
    * at this record size — generous for a genuine dim table, far below
    * driver-heap trouble). Overridable per session via
    * `graft.maxSideInputRows` (used by the guard spec). */
  val MaxSideInputRows: Long = 4L * 1000 * 1000

  /** 15 base 28×28 images (run-length `idx:byte` pairs, data extracted
    * from `utils/PredictionUtils.java:59-282`), value = byte/255f. */
  lazy val baseImages: Array[Array[Float]] = {
    val in = getClass.getResourceAsStream("/adtech/base_images.txt")
    require(in != null, "missing /adtech/base_images.txt")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    finally in.close()
    lines.map { line =>
      val img = new Array[Float](28 * 28)
      line.split(",").foreach { p =>
        val Array(i, v) = p.split(":")
        img(i.toInt) = v.toInt / 255.0f
      }
      img
    }
  }

  /** M1: the exact feature formula (float arithmetic, not double —
    * `PredictionUtils.java:41-56`; base image selected by
    * `upper(uuid)[0] % 15`, the pipeline-normative path, SURVEY §2.8). */
  def getInputFeatures(dp: DeviceProfileRec, iapp: Map[String, IappRec]): Array[Float] = {
    val totalPurchasers = iapp.valuesIterator.map(_.numPurchasers).sum
    val totalAmount = iapp.valuesIterator.map(_.totalAmount).sum
    val hits = dp.app.filter(a => iapp.contains(a.bundle))
    val intersectApp = hits.size.toLong
    val intersectPurchaser = hits.map(a => iapp(a.bundle).numPurchasers).sum
    val intersectAmount = hits.map(a => iapp(a.bundle).totalAmount).sum

    val f = baseImages(dp.uuid.toUpperCase.charAt(0) % 15).clone()
    f(486) = (0.0f + intersectApp) / (1.0f + iapp.size)
    f(686) = (0.0f + intersectApp) / (1.0f + dp.app.size)
    f(586) = (0.0f + intersectPurchaser) / (1.0f + totalPurchasers)
    f(777) = (0.0f + intersectAmount) / (1.0f + totalAmount)
    var i = 100
    while (i <= 700) { f(i) = (dp.firstAt % i).toFloat / i; i += 40 }
    f
  }

  // ---- decode sources (S2: Base64 proto per line) ----

  private def decodeLines[T: org.apache.spark.sql.Encoder](
      lines: Dataset[String], dec: Array[Byte] => T): Dataset[T] =
    lines.mapPartitions(_.flatMap { line =>
      try Some(dec(java.util.Base64.getDecoder.decode(line.trim)))
      catch { case _: IllegalArgumentException => None }
    })

  /** P2+F4: decode profiles, drop default instances
    * (`Features.java:75-77`). */
  def decodeDeviceProfiles(lines: Dataset[String]): Dataset[DeviceProfileRec] = {
    import lines.sparkSession.implicits._
    decodeLines(lines, AdtechProtos.decodeDeviceProfile)
      .filter(dp => !(dp.os == 0 && dp.uuid.isEmpty && dp.app.isEmpty && dp.geo.isEmpty))
  }

  def decodeSuspicious(lines: Dataset[String]): Dataset[DeviceIdRec] = {
    import lines.sparkSession.implicits._
    decodeLines(lines, AdtechProtos.decodeDeviceId)
  }

  def decodeIapp(lines: Dataset[String]): Dataset[IappRec] = {
    import lines.sparkSession.implicits._
    decodeLines(lines, AdtechProtos.decodeIapp)
      .filter(r => !(r.bundle.isEmpty && r.numPurchasers == 0 && r.totalAmount == 0))
  }

  /** J4 (job-2 flavor): duplicate check on (os, LOWER(uuid)) —
    * `Features.java:70-88`. */
  def assertNoDuplicateIdsLower(dps: Dataset[DeviceProfileRec]): Unit = {
    val dup = dps.groupBy(col("os"), lower(col("uuid")))
      .count().filter(col("count") > 1)
    require(dup.isEmpty, "CorruptedData: more than 1 DeviceProfile per DeviceId")
  }

  /** J2+F6+M1: blacklist anti-join, 1/16 deterministic sample, then
    * feature build with the IAPP map broadcast (the reference's
    * View.asMap side input, `Features.java:90-103`). Returns
    * (os, uuid, features). */
  def inputToModel(dps: Dataset[DeviceProfileRec], suspicious: Dataset[DeviceIdRec],
      iapp: Dataset[IappRec]): DataFrame = {
    val spark = dps.sparkSession
    import spark.implicits._
    assertNoDuplicateIdsLower(dps)
    // Reference side-input semantics (View.asMap, Features.java:90-103)
    // assume IAPP is a small dim table; nothing upstream enforces that,
    // and this is the engine's one driver-side collect of an input. A
    // distributed count gates it so an unbounded input fails with a
    // clear error instead of OOMing the driver. (The feature formula
    // needs global sums over the WHOLE map, so a broadcast join can't
    // replace the map without recomputing those sums per row.)
    val sideCap = spark.conf.getOption("graft.maxSideInputRows")
      .map(_.toLong).getOrElse(MaxSideInputRows)
    // persist around the count+collect pair so the guard doesn't
    // recompute the decode chain end to end a second time
    val iappP = iapp.persist()
    val iappMap = try {
      val iappCount = iappP.count()
      require(iappCount <= sideCap,
        s"IAPP side input has $iappCount rows (cap $sideCap): " +
          "not a broadcastable dim table — pre-aggregate it before inputToModel")
      spark.sparkContext.broadcast(
        iappP.collect().map(r => r.bundle -> r).toMap)
    } finally iappP.unpersist()
    dps
      .join(broadcast(suspicious.toDF()), Seq("os", "uuid"), "left_anti")
      .as[DeviceProfileRec]
      .filter(dp => dp.uuid.length > 7 && dp.uuid.charAt(7) == '0')
      .map(dp => (dp.os, dp.uuid, getInputFeatures(dp, iappMap.value)))
      .toDF("os", "uuid", "features")
  }

  /** M2 seam: batch-in, batch-out scoring function (n×784 → n×10). */
  trait Scorer extends Serializable {
    def score(batch: Seq[Array[Float]]): Seq[Array[Float]]
  }

  /** Hermetic default: fixed linear model over the 784 inputs, weights
    * from md5 nibbles (deterministic across runs/JVMs). */
  object DeterministicScorer extends Scorer {
    private def h4(seed: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (md.digest(seed.getBytes("UTF-8"))(0) >> 4) & 0xf
    }
    // Sparse weights (every 7th input) keep setup cheap but scores informative.
    @transient private lazy val w: Array[Array[Float]] =
      Array.tabulate(112, 10)((k, j) => ((h4(s"pw|$k|$j") - 7.5) / 8.0).toFloat)

    def score(batch: Seq[Array[Float]]): Seq[Array[Float]] = batch.map { x =>
      Array.tabulate(10) { j =>
        var s = 0.0f
        var k = 0
        while (k < 112) { s += x(k * 7) * w(k)(j); k += 1 }
        s
      }
    }
  }

  /** M2: batched inference. Model is a per-executor singleton (the
    * `@Setup` analogue); elements buffered to 60 per score call
    * (`BUFFER_MAX_SIZE`, `Predictions.java:132`); argmax ties break to
    * the smallest index (`Predictions.java:38-46`). */
  def predict(features: DataFrame, scorer: Scorer = DeterministicScorer): DataFrame = {
    import features.sparkSession.implicits._
    features.as[(Int, String, Array[Float])]
      .mapPartitions { it =>
        it.grouped(60).flatMap { batch =>
          val scores = scorer.score(batch.map(_._3))
          batch.iterator.zip(scores.iterator).map { case ((os, uuid, _), sc) =>
            var best = 0
            var j = 1
            while (j < sc.length) { if (sc(j) > sc(best)) best = j; j += 1 }
            (os, uuid, best, sc(best).toDouble)
          }
        }
      }
      .toDF("os", "uuid", "prediction", "score")
  }

  /** Pipeline #2 end-to-end from Base64 text lines. */
  def predictionJob(dpLines: Dataset[String], suspLines: Dataset[String],
      iappLines: Dataset[String], scorer: Scorer = DeterministicScorer): DataFrame =
    predict(inputToModel(decodeDeviceProfiles(dpLines),
      decodeSuspicious(suspLines), decodeIapp(iappLines)), scorer)
}
