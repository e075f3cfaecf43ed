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

  /** The single keep predicate: parsed struct present, not flagged
    * corrupt, every required field non-null. */
  def okPredicate(requiredFields: Seq[String]): org.apache.spark.sql.Column =
    requiredFields.foldLeft(
      col("r").isNotNull && col(s"r.${CorruptCol}").isNull) { (p, f) =>
      p && col(s"r.$f").isNotNull
    }

  /** @return (records projected to `schema`, dropped-row count) */
  def keepAndCount(parsed: DataFrame, schema: StructType,
      requiredFields: Seq[String]): (DataFrame, Long) = {
    val cached = parsed.cache()
    try {
      val ok = cached.filter(okPredicate(requiredFields))
        .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
      val total = cached.count()
      val kept = ok.count()
      // the returned frame recomputes lazily; holding the parse cache
      // for the session would pin one copy per ingested corpus
      (ok, total - kept)
    } finally cached.unpersist()
  }
}
