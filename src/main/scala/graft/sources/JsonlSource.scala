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
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), LineSource.parseSchema(schema),
        Map("columnNameOfCorruptRecord" -> LineSource.CorruptCol)).as("r"))
    LineSource.keepAndCount(parsed, schema, requiredFields)
  }

  /** STREAMING ingest of a growing JSONL directory — same enforced
    * schema and keep predicate as [[read]] (shared via
    * [[LineSource.okPredicate]]), but a stream has no single drop
    * count to return, so drops surface per micro-batch through the
    * Observation API: each `StreamingQueryProgress.observedMetrics`
    * carries `{lines, dropped}` under the `jsonl_ingest` key — the
    * operational feed a 100 TB/day ingest monitors and alerts on
    * (corrupt-rate spikes mean an upstream producer broke, and the
    * watcher must see it without re-reading the data). */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String]): DataFrame = {
    spark.readStream.text(path)
      .select(from_json(col("value"), LineSource.parseSchema(schema),
        Map("columnNameOfCorruptRecord" -> LineSource.CorruptCol)).as("r"))
      .withColumn("__ok", LineSource.okPredicate(requiredFields))
      .observe("jsonl_ingest",
        count(lit(1)).as("lines"),
        // coalesce: SUM over an empty micro-batch (an empty file
        // landing) is null — the alerting feed must read 0, not null
        coalesce(sum(when(col("__ok"), 0L).otherwise(1L)), lit(0L)).as("dropped"))
      .filter(col("__ok"))
      .select(schema.fieldNames.toIndexedSeq.map(f => col(s"r.$f")): _*)
  }
}
