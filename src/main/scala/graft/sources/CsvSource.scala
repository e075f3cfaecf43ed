package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV/TSV corpus source — [[JsonlSource]]'s corrupt-input discipline
  * (P1: decode, DROP corrupt records + COUNT them, never abort and
  * never infer) for the other ubiquitous dump format. The post-parse
  * keep/count machinery is shared with JsonlSource
  * ([[LineSource.keepAndCount]]) so the two can't drift.
  *
  * Schema is ENFORCED (no inference pass, no silent widening).
  * CSV's failure taxonomy (verified in CsvSourceSpec):
  *  - the parser flags via `columnNameOfCorruptRecord`: unparsable
  *    values for the declared type AND wrong arity in either
  *    direction (both fewer and more tokens than schema fields);
  *  - rows that PARSE cleanly but carry an empty (→ null) value in a
  *    required column — "1,,en" — are only caught by the
  *    required-fields check, the leg the parser cannot see.
  *
  * The default path parses `spark.read.text` lines with `from_csv`
  * (like JsonlSource): always a whole-line parse, so the returned
  * frame and the drop count can never disagree, blank lines are
  * visible (dropped + counted), and line splitting stays splittable.
  *
  * `header=true` / `multiLine=true` (RFC-4180 quoted newlines) need
  * Spark's CSV reader instead, whose lazy re-parses prune columns —
  * a row corrupt ONLY in a pruned column would pass the corrupt
  * filter it was counted as failing (documented Spark behavior:
  * "corrupt records can be different based on required set of
  * fields"). That branch therefore MATERIALIZES the kept frame —
  * spilled to parquet (under `graft.spillDir`, the app checkpoint
  * dir, or a local temp; see [[LineSource]]) while the full-schema
  * counting cache is alive, pinning the classification the count saw
  * — no session conf is touched, later reads cannot reclassify, and
  * executor storage stays O(1) at any corpus size. Two further
  * reader-branch behavior differences, by Spark's design: blank
  * lines are skipped BEFORE parsing (not visible in the drop count,
  * unlike the default path), and multiLine makes each file
  * non-splittable — the price of embedded newlines at 100 TB.
  */
object CsvSource {

  /** @param requiredFields non-null fields a record must carry
    * @return (records, corrupt-or-incomplete line count) */
  def read(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String], delimiter: String = ",",
      header: Boolean = false, multiLine: Boolean = false): (DataFrame, Long) = {
    val parseSchema = LineSource.parseSchema(schema)
    if (header || multiLine) {
      val parsed = spark.read
        .options(Map(
          "header" -> header.toString,
          "sep" -> delimiter,
          "multiLine" -> multiLine.toString,
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> LineSource.CorruptCol))
        .schema(parseSchema)
        .csv(path)
        .select(struct(parseSchema.fieldNames.toIndexedSeq.map(col): _*).as("r"))
      LineSource.keepAndCount(parsed, schema, requiredFields, materialize = true)
    } else {
      val parsed = spark.read.text(path)
        .select(from_csv(col("value"),
          parseSchema,
          Map("sep" -> delimiter,
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> LineSource.CorruptCol)).as("r"))
      LineSource.keepAndCount(parsed, schema, requiredFields)
    }
  }
}
