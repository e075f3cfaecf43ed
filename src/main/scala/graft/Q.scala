package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   stable key — appears in CORRECTNESS/BENCH reports; never rename.
  * @param fn     the Spark implementation, `(session, sfDir) => result`.
  * @param oracle equivalent DuckDB SQL over the same parquet tables (bare table
  *               names). `None` → driver falls back to a rows-only check.
  * @param bench  include in the headline benchmark set run by [[Bench]].
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** All queries the engine exposes, grouped by module. */
object QueryRegistry {
  def all: Seq[Q] =
    graft.queries.RelationalQueries.qs ++
      graft.queries.ExtendedQueries.qs ++
      graft.queries.WindowQueries.qs ++
      graft.queries.ScalarQueries.qs ++
      graft.queries.ProfileQueries.qs ++
      graft.queries.DedupQueries.qs ++
      graft.queries.SimilarityQueries.qs ++
      graft.queries.TextQueries.qs ++
      graft.queries.TrainingDataQueries.qs ++
      graft.queries.MultimodalQueries.qs ++
      graft.queries.MLQueries.qs

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
