package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV/TSV corpus source — [[JsonlSource]]'s corrupt-input discipline
  * (P1: decode, DROP corrupt records + COUNT them, never abort and
  * never infer) for the other ubiquitous dump format.
  *
  * Schema is ENFORCED (no inference pass, no silent widening).
  * CSV's failure taxonomy (verified in CsvSourceSpec):
  *  - the parser flags via `columnNameOfCorruptRecord`: unparsable
  *    values for the declared type AND wrong arity in either
  *    direction (both fewer and more tokens than schema fields);
  *  - rows that PARSE cleanly but carry an empty (→ null) value in a
  *    required column — "1,,en" — are only caught by the
  *    required-fields check, the leg the parser cannot see;
  *  - blank lines are skipped by the reader BEFORE parsing and are
  *    therefore not visible in the drop count (unlike JsonlSource,
  *    whose text-based reader sees and counts them).
  */
object CsvSource {

  private val CorruptCol = "__corrupt"

  /** @param requiredFields non-null fields a record must carry
    * @return (records, corrupt-or-incomplete line count) */
  def read(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String], delimiter: String = ",",
      header: Boolean = false): (DataFrame, Long) = {
    require(!schema.fieldNames.contains(CorruptCol), s"$CorruptCol is reserved")
    val parseSchema = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read
      .options(Map(
        "header" -> header.toString,
        "sep" -> delimiter,
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol))
      .schema(parseSchema)
      .csv(path)
      .cache()
    try {
      val ok = requiredFields
        .foldLeft(parsed.filter(col(CorruptCol).isNull)) { (df, f) =>
          df.filter(col(f).isNotNull)
        }
        .select(schema.fieldNames.map(col): _*)
      val total = parsed.count()
      val kept = ok.count()
      (ok, total - kept)
    } finally parsed.unpersist()
  }
}
