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

  /** The widened parse schema (target schema + corrupt column), with
    * the reserved-name guard — the ONE place the corrupt-column
    * contract lives. */
  def parseSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol), s"$CorruptCol is reserved")
    StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CorruptCol,
        org.apache.spark.sql.types.StringType))
  }

  /** The single keep predicate: parsed struct present, not flagged
    * corrupt, every required field non-null. */
  def okPredicate(requiredFields: Seq[String]): org.apache.spark.sql.Column =
    requiredFields.foldLeft(
      col("r").isNotNull && col(s"r.${CorruptCol}").isNull) { (p, f) =>
      p && col(s"r.$f").isNotNull
    }

  /** @param materialize eagerly SPILL the kept frame to parquet while
    *        the parse cache is alive — required when later lazy
    *        re-parses could classify rows DIFFERENTLY than the
    *        counting pass did (the CSV reader's column pruning); the
    *        default path leaves the frame lazy (whole-line parsers
    *        reclassify identically on recompute)
    * @return (records projected to `schema`, dropped-row count) */
  def keepAndCount(parsed: DataFrame, schema: StructType,
      requiredFields: Seq[String], materialize: Boolean = false): (DataFrame, Long) = {
    val cached = parsed.cache()
    try {
      val ok = cached.filter(okPredicate(requiredFields))
        .select(schema.fieldNames.toIndexedSeq.map(f => col(s"r.$f")): _*)
      val total = cached.count()
      // within this pass the cache holds FULL parsed rows, so the keep
      // classification is pruning-proof by construction; materialize
      // pins that classification for the caller's later reads too.
      // The spill is a distributed parquet write + plain re-read —
      // executor storage stays O(1) however big the corpus is (the
      // round-4 eager localCheckpoint pinned the WHOLE kept frame in
      // executor block storage: fine at GBs, a cliff at 100 TB), and
      // the returned frame is a splittable, pruning-friendly scan.
      val out = if (materialize) {
        val spark = parsed.sparkSession
        val path = spillRoot(spark).stripSuffix("/") +
          "/csv-keep-" + java.util.UUID.randomUUID()
        ok.write.parquet(path)
        spark.read.schema(schema).parquet(path)
      } else ok
      val kept = out.count()
      // the (lazy) returned frame recomputes on read; holding the parse
      // cache for the session would pin one copy per ingested corpus
      (out, total - kept)
    } finally cached.unpersist()
  }

  /** Spill location for materialized reads: `graft.spillDir` session
    * conf if set, else the app's reliable checkpoint dir (both must be
    * CLUSTER-VISIBLE storage on a real cluster), else a driver-local
    * temp dir — which is only correct in local mode, where executors
    * share the driver's filesystem, so the fallback REFUSES to run
    * under a cluster master: executors would write part files to
    * their own local disks and the driver's re-read would silently
    * return a partial frame. Spills live for the app's duration; the
    * dir is per-read (UUID), so periodic cleanup of the root is safe. */
  private def spillRoot(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption("graft.spillDir")
      .orElse(spark.sparkContext.getCheckpointDir)
      .getOrElse {
        require(spark.sparkContext.isLocal,
          "materialized CSV/TSV read on a cluster needs cluster-visible " +
            "spill storage: set graft.spillDir or sc.setCheckpointDir " +
            "(a driver-local temp dir would silently lose executor writes)")
        java.nio.file.Files.createTempDirectory("graft-spill").toString
      }
}
