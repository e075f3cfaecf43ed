package graft.io

import graft.io.AdtechProtos._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's sink surface (SURVEY.md §2.1):
  *  - S3: Base64 proto per text line (`utils/IOUtils.java:15-19`;
  *    one shard locally, runner-chosen shards on a cluster — here
  *    `shards=Some(1)` vs `None` = engine default parallelism).
  *  - S4: canonical proto-JSON predictions, field names preserved, no
  *    insignificant whitespace (`jobs2/PredictionJob.java:116-125`).
  *  - S5: the BigQuery table shape {os STRING (enum name), uuid
  *    STRING, prediction INTEGER, score FLOAT} as a parquet table
  *    sink (`jobs2/PredictionJob.java:88-92,128-138` — off-GCP
  *    equivalent per SURVEY §2.1).
  *
  * Encoding runs distributed (mapPartitions over [[ProtoWriter]]);
  * no driver-side collect anywhere.
  */
object AdtechSinks {

  private def shard(df: DataFrame, shards: Option[Int]): DataFrame =
    shards.fold(df)(n => df.coalesce(n))

  /** S3: DeviceProfiles (camelCase nested schema, as produced by
    * AdtechPipeline.deviceProfiles) → Base64 text lines. */
  def writeDeviceProfilesBase64(dps: DataFrame, path: String,
      shards: Option[Int] = Some(1)): Unit = {
    import dps.sparkSession.implicits._
    val lines = dps.as[DeviceProfileRec]
      .mapPartitions(_.map(r => ProtoWriter.toBase64(ProtoWriter.encodeDeviceProfile(r))))
    shard(lines.toDF("value"), shards).write.mode(SaveMode.Overwrite).text(path)
  }

  /** S3: AppProfiles → Base64 text lines. */
  def writeAppProfilesBase64(aps: DataFrame, path: String,
      shards: Option[Int] = Some(1)): Unit = {
    import aps.sparkSession.implicits._
    val lines = aps.as[AppProfileRec]
      .mapPartitions(_.map(r => ProtoWriter.toBase64(ProtoWriter.encodeAppProfile(r))))
    shard(lines.toDF("value"), shards).write.mode(SaveMode.Overwrite).text(path)
  }

  /** S3: suspicious DeviceIds → Base64 text lines. */
  def writeSuspiciousBase64(ids: DataFrame, path: String,
      shards: Option[Int] = Some(1)): Unit = {
    import ids.sparkSession.implicits._
    val lines = ids.as[DeviceIdRec]
      .mapPartitions(_.map(r => ProtoWriter.toBase64(ProtoWriter.encodeDeviceId(r))))
    shard(lines.toDF("value"), shards).write.mode(SaveMode.Overwrite).text(path)
  }

  /** S4: predictions (os, uuid, prediction, score) → proto-JSON text:
    * `{"id":{"os":<enum name>,"uuid":...},"prediction":n,"score":x}` —
    * field names preserved, no extra whitespace (to_json matches the
    * printer contract of `utils/ProtoUtils.java:50-59`). */
  def writePredictionsJson(preds: DataFrame, path: String,
      shards: Option[Int] = Some(1)): Unit = {
    val osName = when(col("os") === 1, "ANDROID")
      .when(col("os") === 2, "IOS").otherwise("UNKNOWN_OS_TYPE")
    val js = preds.select(to_json(struct(
      struct(osName.as("os"), col("uuid").as("uuid")).as("id"),
      col("prediction"), col("score"))).as("value"))
    shard(js, shards).write.mode(SaveMode.Overwrite).text(path)
  }

  /** The S5 row shape — ONE function feeding both the parquet
    * stand-in and the live [[BigQuerySink]], so the two can never
    * drift from the reference schema (`PredictionJob.java:88-92`). */
  private[io] def predictionTableShape(preds: DataFrame): DataFrame =
    preds.select(
      when(col("os") === 1, "ANDROID").when(col("os") === 2, "IOS")
        .otherwise("UNKNOWN_OS_TYPE").as("os"),
      col("uuid").cast("string").as("uuid"),
      col("prediction").cast("int").as("prediction"),
      col("score").cast("float").as("score"))

  /** S5: the BigQuery row shape as a parquet table. */
  def writePredictionsTable(preds: DataFrame, path: String): Unit =
    predictionTableShape(preds).write.mode(SaveMode.Overwrite).parquet(path)
}
