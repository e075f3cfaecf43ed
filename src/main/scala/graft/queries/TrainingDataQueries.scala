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

  /** Deterministic global shuffle + contiguous sample indexing — the
    * step between a curated corpus and epoch sharding: every doc gets
    * a pseudo-random but REPRODUCIBLE position (`md5(doc_id)` as the
    * permutation key), a contiguous 1-based global index in that
    * order, and a round-robin shard assignment over the index. The
    * global index uses q32's value-derived two-level rank (the key's
    * leading 32 hex bits are uniform, so 1024 `width_bucket` buckets
    * stay balanced; per-bucket `row_number` + broadcast prefix-sum
    * offsets over ≤1026 rows) — ONE hash exchange, no
    * single-partition window, no placement-derived `zipWithIndex`
    * (see `WindowQueries.scala` q32 for why the alternatives are
    * unsound or plan-opaque). The md5 key is non-null by
    * construction, satisfying the pattern's non-null precondition.
    * Skew-free by design: unlike q32's data-valued sort key, a
    * cryptographic hash is uniform regardless of corpus shape. */
  private val shuffleIndex = Q(
    "q101_shuffle_index",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val nb = 1024
      val keyed = T.documents(s, d)
        .select($"doc_id", md5($"doc_id".cast("string")).as("shuffle_key"))
        // leading 8 hex chars → uniform value in [0, 2^32)
        .withColumn("bkt", expr(
          s"width_bucket(CAST(conv(substring(shuffle_key, 1, 8), 16, 10) AS DOUBLE), " +
            s"0.0, 4294967296.0, $nb)"))
      val local = keyed.withColumn("lrn", row_number().over(
        Window.partitionBy($"bkt").orderBy($"shuffle_key".asc, $"doc_id".asc)))
      val offsets = keyed.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(
          sum($"cnt").over(Window.orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      local.join(broadcast(offsets.select($"bkt", $"off")), "bkt")
        .select($"doc_id", $"shuffle_key",
          ($"off" + $"lrn").as("sample_idx"),
          (($"off" + $"lrn" - 1) % 8).as("shard_id"))
    },
    Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
      row_number() OVER w AS sample_idx,
      (row_number() OVER w - 1) % 8 AS shard_id
      FROM documents
      WINDOW w AS (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)"""))

  /** Corpus snapshot diff — the audit between two days of a living
    * corpus: which docs were ADDED, REMOVED, or CHANGED (content
    * digest differs). One co-partitioned full-outer join on the
    * primary key carrying only (id, digest) — at 100 TB both sides
    * hash-partition on `doc_id`, and with q89's bucketed layout the
    * Exchange disappears entirely; unchanged rows (the overwhelming
    * majority day-over-day) never leave the join. The two snapshots
    * here derive deterministically from the one `documents` table
    * (yesterday = ids ≢ 7 (mod 10); today = ids ≢ 3 (mod 10), with
    * every id ≡ 0 (mod 5) re-edited), same stand-in discipline as
    * q82's benchmark probe. */
  private val snapshotDiff = Q(
    "q102_snapshot_diff",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val old = docs.filter($"doc_id" % 10 =!= 7)
        .select($"doc_id", md5($"text").as("old_digest"))
      val cur = docs.filter($"doc_id" % 10 =!= 3)
        .select($"doc_id", md5(when($"doc_id" % 5 === 0,
          concat($"text", lit(" [edited v2]"))).otherwise($"text")).as("new_digest"))
      old.join(cur, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when($"old_digest".isNull, lit("added"))
            .when($"new_digest".isNull, lit("removed"))
            .when($"old_digest" =!= $"new_digest", lit("changed")))
        .filter($"status".isNotNull) // unchanged rows are not part of the delta
        .select($"doc_id", $"status", $"old_digest", $"new_digest")
    },
    Some("""WITH old AS (SELECT doc_id, md5(text) AS old_digest
               FROM documents WHERE doc_id % 10 <> 7),
      cur AS (SELECT doc_id,
                md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [edited v2]'
                         ELSE text END) AS new_digest
              FROM documents WHERE doc_id % 10 <> 3)
      SELECT coalesce(old.doc_id, cur.doc_id) AS doc_id,
        CASE WHEN old_digest IS NULL THEN 'added'
             WHEN new_digest IS NULL THEN 'removed'
             WHEN old_digest <> new_digest THEN 'changed' END AS status,
        old_digest, new_digest
      FROM old FULL OUTER JOIN cur ON old.doc_id = cur.doc_id
      WHERE old_digest IS NULL OR new_digest IS NULL
         OR old_digest <> new_digest"""))

  def qs: Seq[Q] = Seq(chunking, sequencePack, decontaminate,
    shuffleIndex, snapshotDiff)
}
