package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) corpus source — the de-facto
  * interchange format for LLM training corpora, ingested with the
  * reference's corrupt-input discipline (P1: decode, DROP corrupt
  * records, never abort — `transforms/DeviceProfiles.java` drops
  * undecodable protos the same way).
  *
  * Built on `spark.read.text` + `from_json` rather than
  * `spark.read.json` so the schema is ENFORCED, not inferred —
  * schema inference reads the data twice and silently widens types
  * at 100 TB (one outlier line turns a long column into string for
  * the whole corpus). A malformed line yields null from `from_json`
  * and is counted+dropped; a well-formed line missing required
  * fields is dropped by the same null check on those fields.
  */
object JsonlSource {

  /** @param requiredFields non-null fields a record must carry
    * @return (records, corrupt-or-incomplete line count) */
  def read(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String]): (DataFrame, Long) = {
    val raw = spark.read.text(path)
    val parsed = raw.select(from_json(col("value"), schema).as("r")).cache()
    val ok = requiredFields
      .foldLeft(parsed.filter(col("r").isNotNull)) { (df, f) =>
        df.filter(col(s"r.$f").isNotNull)
      }
      .select(col("r.*"))
    val total = parsed.count()
    val kept = ok.count()
    (ok, total - kept)
  }
}
