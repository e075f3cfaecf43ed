package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** The shared keep/count step behind [[JsonlSource]] and
  * [[CsvSource]]: given a frame of parsed structs (one column `r`
  * whose fields are the target schema plus [[CorruptCol]]), drop
  * corrupt rows and rows missing required fields, and report exactly
  * how many were dropped. One implementation so the two line formats
  * can never drift in their counting contract. */
private[sources] object LineSource {

  val CorruptCol = "__corrupt"

  /** @return (records projected to `schema`, dropped-row count) */
  def keepAndCount(parsed: DataFrame, schema: StructType,
      requiredFields: Seq[String]): (DataFrame, Long) = {
    val cached = parsed.cache()
    try {
      val ok = requiredFields
        .foldLeft(cached.filter(col("r").isNotNull &&
          col(s"r.${CorruptCol}").isNull)) { (df, f) =>
          df.filter(col(s"r.$f").isNotNull)
        }
        .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
      val total = cached.count()
      val kept = ok.count()
      // the returned frame recomputes lazily; holding the parse cache
      // for the session would pin one copy per ingested corpus
      (ok, total - kept)
    } finally cached.unpersist()
  }
}
