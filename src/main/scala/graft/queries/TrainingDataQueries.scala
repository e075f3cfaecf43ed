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

  /** Deterministic train/val/test split + stratification report: each
    * doc's split derives from the first hex char of `md5(doc_id)` —
    * '0'..'c' → train (13/16 ≈ 81%), 'd','e' → val (2/16), 'f' → test
    * (1/16) — so membership is REPRODUCIBLE across runs, clusters and
    * engines with no stored assignment table, and adding docs never
    * reshuffles existing ones (the property a stored random split
    * loses on every re-materialization). Output is the per-(lang,
    * split) report — doc counts, token mass, and the within-lang doc
    * fraction — i.e. the stratification evidence a pipeline gates on
    * before training. Row-local hash + one small agg + a window over
    * ≤3 rows per lang: no corpus shuffle beyond the report agg.
    * Leakage note: when docs share provenance (same crawl page,
    * same repo), key the hash on that GROUP column instead of doc_id
    * so near-copies can't straddle train/test. */
  private val splitReport = Q(
    "q106_split_report",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // assignment single-sourced in SplitRule (q127 leakage shares it)
      val assigned = T.documents(s, d).select(
        $"lang",
        SplitRule.assign($"doc_id").as("split"),
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"))
      assigned.groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .withColumn("frac_docs", $"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"lang")))
    },
    Some(s"""WITH a AS (SELECT lang,
        ${SplitRule.sqlCase("doc_id")} AS split,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
        FROM documents),
      g AS (SELECT lang, split, count(*) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM a GROUP BY 1, 2)
      SELECT lang, split, n_docs, n_tokens,
        CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang) AS frac_docs
      FROM g"""))

  /** Temperature-scaled source mixture (the mT5/XLM-R sampling rule):
    * per-source keep rates ∝ n^α / n with α = 0.5, total budget τ =
    * half the corpus — boosting small sources and damping dominant
    * ones instead of q96's flatten-to-the-minimum. keep_ppm(src) =
    * min(1e6, ⌊1e6 · τ·N·w / (n·S)⌋) with w = ⌊√n⌋ and S = Σw: the
    * weights are INTEGERS (floor of a correctly-rounded IEEE sqrt),
    * so S is an exact integer sum — no float-summation order to
    * diverge between engines — and the one double expression is
    * written in identical association order in both. Membership is
    * the q96 discipline: a doc's md5-derived ppm bucket against its
    * source's broadcast rate — counts-agg + tiny broadcast + row-local
    * hash filter, the corpus itself never shuffles at any scale. */
  private val temperatureMix = Q(
    "q107_temperature_mix",
    (s, d) => {
      import s.implicits._
      val counts = T.documents(s, d).groupBy($"source")
        .agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt($"n".cast("double"))))
      val tot = counts.agg(sum($"n").as("n_total"), sum($"w").as("s_w"))
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("keep_ppm", least(lit(1000000L),
          floor(lit(1000000.0) * $"n_total" * $"w" /
            (lit(2.0) * $"n" * $"s_w"))))
        .select($"source", $"keep_ppm")
      val bucket =
        conv(substring(md5($"doc_id".cast("string")), 1, 14), 16, 10)
          .cast("long") % 1000000
      T.documents(s, d).join(broadcast(rates), "source")
        .filter(bucket < $"keep_ppm")
        .select($"doc_id", $"source", $"keep_ppm")
    },
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      w AS (SELECT source, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
              CAST(sum(w) AS BIGINT) AS s_w FROM w),
      r AS (SELECT source, least(1000000,
              CAST(floor(1000000.0 * n_total * w / (2.0 * n * s_w)) AS BIGINT))
              AS keep_ppm
            FROM w CROSS JOIN t)
      SELECT d.doc_id, d.source, r.keep_ppm
      FROM documents d JOIN r USING (source)
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14) AS BIGINT)
            % 1000000 < r.keep_ppm"""))

  /** Epoch weights — the UP-sampling half of temperature mixing that
    * q96/q107 (pure downsamplers, keep_ppm capped at 1e6) cannot
    * express: with the full-corpus budget τ=1 redistributed by the
    * n^0.5 rule over LANGS (en dominates the fixture 218 vs 64), small
    * langs get rates ABOVE one (fr ≈ 1.36 → every doc once, plus a
    * deterministic 36%-Bernoulli second copy) while the dominant lang
    * drops below one (en ≈ 0.70). `n_copies` = ⌊rate⌋ + md5-Bernoulli
    * on the fraction is the per-doc repetition factor a packer
    * consumes (mT5's sampling-with-replacement, materialized as an
    * integer column); zero-copy docs leave the output. Same
    * engine-parity arithmetic as q107 (integer ⌊√n⌋ weights, one
    * identically-associated double expression, integer div/mod), same
    * zero-corpus-shuffle shape (tiny agg → broadcast rates → row-local
    * hash). E[Σ n_copies] = N. */
  private val epochWeights = Q(
    "q109_epoch_weights",
    (s, d) => {
      import s.implicits._
      val counts = T.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt($"n".cast("double"))))
      val tot = counts.agg(sum($"n").as("n_total"), sum($"w").as("s_w"))
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("rate_ppm",
          floor(lit(1000000.0) * $"n_total" * $"w" / ($"n" * $"s_w")))
        .select($"lang", expr("rate_ppm div 1000000").as("base"),
          ($"rate_ppm" % 1000000).as("frac_ppm"))
      val bucket =
        conv(substring(md5($"doc_id".cast("string")), 1, 14), 16, 10)
          .cast("long") % 1000000
      T.documents(s, d).join(broadcast(rates), "lang")
        .withColumn("n_copies",
          $"base" + when(bucket < $"frac_ppm", 1L).otherwise(0L))
        .filter($"n_copies" >= 1)
        .select($"doc_id", $"lang", $"n_copies")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      w AS (SELECT lang, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
              CAST(sum(w) AS BIGINT) AS s_w FROM w),
      r AS (SELECT lang,
              CAST(floor(1000000.0 * n_total * w / (n * s_w)) AS BIGINT)
                AS rate_ppm
            FROM w CROSS JOIN t),
      r2 AS (SELECT lang, rate_ppm // 1000000 AS base,
               rate_ppm % 1000000 AS frac_ppm FROM r)
      SELECT * FROM (
        SELECT d.doc_id, d.lang,
          base + CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14)
                             AS BIGINT) % 1000000 < frac_ppm
                 THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN r2 USING (lang))
      WHERE n_copies >= 1"""))

  /** Token-budget corpus selection: walk the corpus in q101's
    * deterministic shuffle order and keep documents until a global
    * token budget is exhausted — "give me B tokens of uniformly
    * sampled corpus" with a reproducible answer, the standard way a
    * training run takes a fixed-size slice of a much larger pool.
    *
    * The cut needs a GLOBAL running token sum in shuffle-key order,
    * and a naive `sum over (order by key)` window plans a
    * single-partition WindowExec — the q32 scale-killer. Same cure as
    * q101: the md5 key is uniform by construction, so 1024
    * hash-prefix buckets partition the order; each bucket computes
    * its local running sum in parallel, and the per-bucket token
    * totals (1024 rows, a broadcast) prefix-sum into bucket offsets.
    * One hash exchange over the corpus, windows bounded by corpus/1024
    * rows, bit-exact integer arithmetic at any scale. */
  private val tokenBudgetPack = Q(
    "q111_token_budget_pack",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val budget = 25000L
      val nb = 1024
      val keyed = T.documents(s, d)
        .select($"doc_id", md5($"doc_id".cast("string")).as("shuffle_key"),
          size(split(trim($"text"), "\\s+")).cast("long").as("tokens"))
        .withColumn("bkt", expr(
          s"width_bucket(CAST(conv(substring(shuffle_key, 1, 8), 16, 10) AS DOUBLE), " +
            s"0.0, 4294967296.0, $nb)"))
      val local = keyed.withColumn("lcum", sum($"tokens").over(
        Window.partitionBy($"bkt").orderBy($"shuffle_key".asc, $"doc_id".asc)))
      val offsets = keyed.groupBy($"bkt").agg(sum($"tokens").as("btok"))
        .withColumn("off", coalesce(
          sum($"btok").over(Window.orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      local.join(broadcast(offsets.select($"bkt", $"off")), "bkt")
        .withColumn("cum_tokens", $"off" + $"lcum")
        .filter($"cum_tokens" <= budget)
        .select($"doc_id", $"tokens", $"cum_tokens")
    },
    Some("""WITH t AS (SELECT doc_id,
        md5(CAST(doc_id AS VARCHAR)) AS k,
        CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS tokens
        FROM documents),
      c AS (SELECT doc_id, tokens,
        CAST(sum(tokens) OVER (ORDER BY k ASC, doc_id ASC) AS BIGINT)
          AS cum_tokens FROM t)
      SELECT doc_id, tokens, cum_tokens FROM c WHERE cum_tokens <= 25000"""),
    bench = true)

  /** Per-benchmark contamination report — q82 flags contaminated
    * corpus docs against ONE eval set; real pipelines decontaminate
    * against dozens and must report WHICH benchmark leaked and how
    * badly before deciding what to cut. Probe shingles carry a
    * benchmark tag (three stand-in eval sets: docs 0-14, bench_id =
    * doc_id % 3, same stand-in discipline as q82/q102); per benchmark:
    * contaminated-doc count, total and worst per-doc shingle overlap.
    *
    * Plan: the tagged probe broadcasts (eval sets are megabytes), the
    * corpus shingle stream pays one equi-join plus a two-level
    * aggregate — (bench, doc) partial+final, then the ≤|benchmarks|
    * rollup. A doc contaminated by several benchmarks counts toward
    * each (attribution, not dedup — q82/the curation job handle the
    * cut). Corpus is never shuffled before the match, same 100 TB
    * shape as q82. */
  private val decontamReport = Q(
    "q112_decontam_report",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sh = T.documents(s, d)
        .filter(size(split(trim($"text"), "\\s+")) >= 3)
        .select($"doc_id", explode(expr("word_shingles(text, 3)")).as("sh"))
      val probe = sh.filter($"doc_id" < 15)
        .select(($"doc_id" % 3).as("bench_id"), $"sh").distinct()
      sh.filter($"doc_id" >= 15)
        .join(broadcast(probe), "sh")
        .groupBy($"bench_id", $"doc_id")
        .agg(countDistinct($"sh").as("overlap"))
        .groupBy($"bench_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"overlap").as("n_hits"),
          max($"overlap").as("max_overlap"))
    },
    Some("""WITH words AS (SELECT doc_id, string_split_regex(trim(text),'\s+') ws FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(ws)-2),
               i -> array_to_string(ws[i:i+2],' ')))) AS sh
             FROM words WHERE len(ws) >= 3),
      probe AS (SELECT DISTINCT doc_id % 3 AS bench_id, sh FROM sh WHERE doc_id < 15),
      hits AS (SELECT p.bench_id, s.doc_id, count(DISTINCT s.sh) AS overlap
               FROM sh s JOIN probe p ON s.sh = p.sh
               WHERE s.doc_id >= 15 GROUP BY p.bench_id, s.doc_id)
      SELECT bench_id, count(*) AS n_docs,
             CAST(sum(overlap) AS BIGINT) AS n_hits,
             max(overlap) AS max_overlap
      FROM hits GROUP BY bench_id"""))

  /** Dataset card — the per-(source, lang, modality) summary table
    * every released training corpus ships with: document and token
    * counts, byte mass (chars AND payload bytes — the two diverge on
    * non-ASCII text and on real binary payloads), and how much of
    * each slice is exact-duplicated (corpus-WIDE digest counts, so a
    * doc mirrored across sources flags in both). The modality
    * dimension is [[MultimodalQueries.modality]]'s single-sourced
    * rule — a released multimodal corpus is priced per modality
    * first. All-integer statistics on purpose (bit-stable across
    * engines).
    *
    * Plan: one window over the text digest (count per md5 partition —
    * the same single shuffle q40 pays, here keyed for counting rather
    * than survivor selection), then the (source, lang, modality)
    * rollup whose partial aggregation collapses everything map-side
    * to the handful of slice rows. Two exchanges total at any scale;
    * nothing is collected or broadcast. */
  private val datasetCard = Q(
    "q114_dataset_card",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      T.documents(s, d)
        .withColumn("tok", size(split(trim($"text"), "\\s+")).cast("long"))
        .withColumn("dup_n", count(lit(1)).over(Window.partitionBy(md5($"text"))))
        .groupBy($"source", $"lang",
          MultimodalQueries.modality($"doc_id").as("modality"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"tok").as("total_tokens"),
          sum($"n_chars").as("total_chars"),
          sum(octet_length($"text").cast("long")).as("total_payload_bytes"),
          sum(when($"dup_n" >= 2, 1L).otherwise(0L)).as("n_exact_dup"))
    },
    Some(s"""WITH d AS (SELECT source, lang, n_chars,
        ${MultimodalQueries.modalitySqlCase("doc_id")} AS modality,
        CAST(strlen(text) AS BIGINT) AS pb,
        CAST(len(string_split_regex(trim(text),'\\s+')) AS BIGINT) AS tok,
        count(*) OVER (PARTITION BY md5(text)) AS dup_n
        FROM documents)
      SELECT source, lang, modality, count(*) AS n_docs,
        CAST(sum(tok) AS BIGINT) AS total_tokens,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(pb) AS BIGINT) AS total_payload_bytes,
        CAST(sum(CASE WHEN dup_n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup
      FROM d GROUP BY source, lang, modality"""))

  /** Packing-efficiency report: q81's per-shard concatenate-and-cut
    * assignment (the SAME registered fn — report and packer share
    * one code path) rolled up per shard: bins opened, token mass,
    * fill factor against the 4096 budget, and the count of docs
    * STRADDLING a bin boundary (each straddle is a document cut in
    * half at training time — the number a packing policy is judged
    * on; too many says the budget is small relative to doc length).
    * One per-shard aggregate over q81's output; nothing beyond q81's
    * own per-shard window touches the corpus. */
  private val packEfficiency = Q(
    "q131_pack_efficiency",
    (s, d) => {
      import s.implicits._
      sequencePack.fn(s, d)
        .withColumn("end_bin", floor(($"start_off" + $"n_tok" - 1) / 4096)
          .cast("long"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("total_tokens"),
          (max($"end_bin") + 1).as("n_bins"),
          sum(when($"end_bin" =!= $"bin", 1L).otherwise(0L))
            .as("n_straddlers"))
        .withColumn("fill_factor",
          $"total_tokens".cast("double") / ($"n_bins" * 4096))
    },
    Some(s"""WITH p AS (SELECT lang, n_tok, start_off, bin,
        CAST(floor((start_off + n_tok - 1) / 4096) AS BIGINT) AS end_bin
        FROM (${sequencePack.oracle.get}))
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        max(end_bin) + 1 AS n_bins,
        CAST(sum(CASE WHEN end_bin <> bin THEN 1 ELSE 0 END) AS BIGINT)
          AS n_straddlers,
        CAST(sum(n_tok) AS DOUBLE) / ((max(end_bin) + 1) * 4096) AS fill_factor
      FROM p GROUP BY lang"""))

  /** Chunk-granularity exact dedup: q80's fixed-window chunks (the
    * SAME registered fn) grouped by content hash, keeping every hash
    * appearing more than once — the RAG-index hygiene pass (a
    * repeated license paragraph embedded in hundreds of docs becomes
    * hundreds of identical retrieval chunks poisoning nearest-
    * neighbor lists) and the sub-document complement of q40
    * (whole-doc) and q119 (span cut). One digest-keyed aggregate —
    * the q40 discipline at chunk grain; the shuffle key is the md5,
    * never the chunk text. */
  private val chunkDedup = Q(
    "q133_chunk_dedup",
    (s, d) => {
      import s.implicits._
      chunking.fn(s, d)
        .groupBy($"chunk_hash")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct($"doc_id").as("n_docs"),
          min($"chunk_len").as("chunk_len"),
          min($"doc_id").as("first_doc"))
        .filter($"n_copies" >= 2)
    },
    Some(s"""WITH c AS (${chunking.oracle.get})
      SELECT chunk_hash, count(*) AS n_copies,
        count(DISTINCT doc_id) AS n_docs,
        CAST(min(chunk_len) AS BIGINT) AS chunk_len,
        min(doc_id) AS first_doc
      FROM c GROUP BY chunk_hash HAVING count(*) >= 2"""))

  def qs: Seq[Q] = Seq(chunking, sequencePack, decontaminate,
    shuffleIndex, snapshotDiff, splitReport, temperatureMix, epochWeights,
    tokenBudgetPack, decontamReport, datasetCard, packEfficiency,
    chunkDedup)
}
