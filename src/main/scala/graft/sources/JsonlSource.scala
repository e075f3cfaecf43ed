package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  * the whole corpus). Corruption is detected via
  * `columnNameOfCorruptRecord`, NOT a null-struct check: permissive
  * `from_json` returns a PARTIALLY-parsed row for a malformed line
  * (a truncated `{"doc_id":7,"text":"ok","lang":` still yields
  * doc_id/text), so only the corrupt-record column reliably flags
  * it. Records missing `requiredFields` are dropped by the same
  * pass.
  */
object JsonlSource {

  /** @param requiredFields non-null fields a record must carry
    * @return (records, corrupt-or-incomplete line count) */
  def read(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String]): (DataFrame, Long) = {
    require(!schema.fieldNames.contains(LineSource.CorruptCol),
      s"${LineSource.CorruptCol} is reserved")
    val parseSchema =
      StructType(schema.fields :+ StructField(LineSource.CorruptCol, StringType))
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), parseSchema,
        Map("columnNameOfCorruptRecord" -> LineSource.CorruptCol)).as("r"))
    LineSource.keepAndCount(parsed, schema, requiredFields)
  }
}
