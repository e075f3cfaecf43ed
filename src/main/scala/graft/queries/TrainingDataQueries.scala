package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Training-data assembly: the steps between a clean corpus and model
  * input — chunking, sequence packing, benchmark decontamination.
  * (Cleaning itself is the dedup/quality family, q40-q54/q70-q78.)
  */
object TrainingDataQueries {

  /** Fixed-size overlapping chunking (window 100 chars, stride 80 →
    * 20-char overlap) — the RAG/embedding ingestion shape. Row-local
    * explode: chunk boundaries derive from the row alone, no shuffle,
    * linear at any scale. Chunks leave as (hash, len) — the payload
    * columns a real pipeline would carry forward. */
  private val chunking = Q(
    "q80_chunking",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, greatest(length(text), 1), 80), st -> " +
            "struct(st, substring(text, CAST(st AS INT), 100) AS chunk))")).as("c"))
        .select($"doc_id",
          (($"c.st" - 1) / 80).cast("long").as("chunk_idx"),
          md5($"c.chunk").as("chunk_hash"),
          length($"c.chunk").cast("long").as("chunk_len"))
    },
    Some("""WITH starts AS (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text), 1), 80)) AS st
        FROM documents)
      SELECT doc_id,
        CAST((st - 1) // 80 AS BIGINT) AS chunk_idx,
        md5(substr(text, CAST(st AS INTEGER), 100)) AS chunk_hash,
        CAST(length(substr(text, CAST(st AS INTEGER), 100)) AS BIGINT) AS chunk_len
      FROM starts"""))

  /** Concatenate-and-cut sequence packing (budget 4096 tokens): docs
    * stream in a deterministic order per shard (= lang here), a
    * running token total assigns each doc its offset and bin. Packing
    * is per-PARTITION by design — a global order would serialize the
    * window at scale; per-shard packing is what pretraining pipelines
    * actually do (each worker packs its shard independently). */
  private val sequencePack = Q(
    "q81_sequence_pack",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
      T.documents(s, d)
        .select($"lang", $"doc_id",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"))
        .withColumn("start_off", coalesce(sum($"n_tok").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", floor($"start_off" / 4096).cast("long"))
    },
    Some("""WITH t AS (SELECT lang, doc_id,
               CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tok
             FROM documents)
      SELECT lang, doc_id, n_tok,
        CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off,
        CAST(floor(CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) / 4096) AS BIGINT) AS bin
      FROM t"""))

  /** Benchmark decontamination: flag corpus docs sharing any 3-gram
    * shingle with a (small) benchmark set — here the first 5 docs
    * stand in for the eval set. The probe shingles BROADCAST (eval
    * sets are tiny); the corpus side streams through one equi-join,
    * never a cross product — the shape that holds when the corpus is
    * 100 TB and the benchmark is megabytes. */
  private val decontaminate = Q(
    "q82_decontaminate",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sh = T.documents(s, d)
        .filter(size(split(trim($"text"), "\\s+")) >= 3)
        .select($"doc_id", explode(expr("word_shingles(text, 3)")).as("sh"))
      val probe = sh.filter($"doc_id" < 5).select($"sh").distinct()
      sh.filter($"doc_id" >= 5)
        .join(broadcast(probe), "sh")
        .groupBy($"doc_id")
        .agg(countDistinct($"sh").as("n_contaminated_shingles"))
    },
    Some("""WITH words AS (SELECT doc_id, string_split_regex(trim(text),'\s+') ws FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(ws)-2),
               i -> array_to_string(ws[i:i+2],' ')))) AS sh
             FROM words WHERE len(ws) >= 3),
      probe AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
      SELECT s.doc_id, count(DISTINCT s.sh) AS n_contaminated_shingles
      FROM sh s JOIN probe p ON s.sh = p.sh
      WHERE s.doc_id >= 5 GROUP BY s.doc_id"""))

  def qs: Seq[Q] = Seq(chunking, sequencePack, decontaminate)
}
