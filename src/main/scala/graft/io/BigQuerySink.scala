package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** OPTIONAL live BigQuery sink — makes S5 one artifact-drop away (the
  * [[graft.ops.TensorFlowScorer]] pattern, applied to the last
  * partial in SURVEY.md §2.1): the reference's PredictionJob writes
  * its predictions table to BigQuery with WRITE_TRUNCATE +
  * CREATE_IF_NEEDED (`jobs2/PredictionJob.java:128-138`), which this
  * hermetic, off-GCP build cannot exercise — so the repo ships the
  * schema-identical parquet sink ([[AdtechSinks.writePredictionsTable]])
  * plus THIS adapter: a user who drops the public
  * `spark-bigquery-connector` jar next to the Spark jars (and runs
  * with GCP credentials) gets the live table write with the
  * reference's exact dispositions, because the connector maps
  * `SaveMode.Overwrite` to WRITE_TRUNCATE and creates the table when
  * absent — the same two dispositions PredictionJob pins.
  *
  * No compile-time dependency: availability is probed through Spark's
  * own data-source registry (the connector registers the short name
  * "bigquery" via ServiceLoader), so this file compiles and tests
  * with zero added jars, refuses with instructions when the connector
  * is absent, and needs NO code change across connector versions
  * (reflection against a provider class name would pin one version's
  * internal layout — the registry lookup is the stable seam).
  *
  * Both sinks share ONE row-shaping function, so the live table and
  * the parquet stand-in cannot drift from the reference's schema
  * {os STRING (enum name), uuid STRING, prediction INTEGER,
  * score FLOAT} (`jobs2/PredictionJob.java:88-92`).
  */
object BigQuerySink {

  private[io] val Missing =
    "no 'bigquery' data source on the classpath — drop the public " +
      "spark-bigquery-connector jar next to the Spark jars (and provide " +
      "GCP credentials) to enable the live BigQuery sink; the " +
      "schema-identical off-GCP stand-in is " +
      "AdtechSinks.writePredictionsTable"

  /** True when a data source registered under the short name
    * "bigquery" is resolvable in this session. */
  def available(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("bigquery", spark.sessionState.conf)
      true
    } catch {
      // NonFatal only: an OOM/interrupt during the probe must surface
      // as itself, not masquerade as "connector missing"
      case scala.util.control.NonFatal(_) => false
    }

  /** S5 live: predictions → BigQuery `table`
    * (`project.dataset.table`), WRITE_TRUNCATE + CREATE_IF_NEEDED via
    * the connector's documented `SaveMode.Overwrite` mapping. Extra
    * connector options (e.g. `temporaryGcsBucket` for the indirect
    * write path, `writeMethod=direct` for the Storage Write API) pass
    * through `options`. */
  def writePredictionsBigQuery(preds: DataFrame, table: String,
      options: Map[String, String] = Map.empty): Unit = {
    require(available(preds.sparkSession), Missing)
    AdtechSinks.predictionTableShape(preds)
      .write.format("bigquery").options(options)
      .mode(SaveMode.Overwrite).save(table)
  }
}
