package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` — training-data-pipeline
  * extension (the reference has no text ops beyond case folding,
  * SURVEY.md §2.7). Everything here is row-local expression work
  * inside whole-stage codegen: no shuffle, embarrassingly parallel,
  * the shape that scales linearly to 100 TB.
  */
object TextQueries {

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "人"))
  private val langs = Seq("en", "de", "es", "fr", "zh") // tie-break order

  private def sqlList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString("[", ",", "]")
  private def scoreExprSql(l: String) =
    s"len(list_filter(ws, w -> list_contains(${sqlList(stop(l))}, w)))"

  /** Language ID via stopword-hit scoring (an n-gram/wordlist
    * heuristic): per-language hit counts + argmax with deterministic
    * tie-break in `langs` order. */
  private val langId = Q(
    "q50_lang_id",
    (s, d) => {
      import s.implicits._
      val scored = T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .select($"doc_id" +: $"lang".as("true_lang") +:
          langs.map(l => size(filter($"ws",
            w => w.isInCollection(stop(l)))).cast("long").as(s"s_$l")): _*)
      val best = langs.map(l => col(s"s_$l")) // max score
      scored.withColumn("pred_lang",
        langs.foldRight(lit("??")) { (l, e) =>
          when(col(s"s_$l") === greatest(best: _*), lit(l)).otherwise(e)
        })
    },
    // Matching CASE chain: first lang (in `langs` order) hitting the max.
    Some(s"""WITH w AS (SELECT doc_id, lang, string_split_regex(trim(text),'\\s+') ws FROM documents),
      sc AS (SELECT doc_id, lang AS true_lang,
        ${langs.map(l => s"CAST(${scoreExprSql(l)} AS BIGINT) AS s_$l").mkString(", ")}
        FROM w)
      SELECT *, CASE
        ${langs.map(l => s"WHEN s_$l = greatest(${langs.map("s_" + _).mkString(",")}) THEN '$l'").mkString(" ")}
        ELSE '??' END AS pred_lang
      FROM sc"""))

  /** q51's feature+score frame, shared verbatim with q124's cut-curve
    * report so the two can never drift (the curateStream discipline:
    * one predicate, one code path). */
  private def qualityScored(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    T.documents(s, d)
      .withColumn("ws", split(trim($"text"), "\\s+"))
      .withColumn("n_words", size($"ws").cast("long"))
      .withColumn("avg_word_len",
        aggregate(transform($"ws", w => length(w).cast("double")),
          lit(0.0), (a, x) => a + x) / $"n_words")
      .withColumn("stop_ratio",
        size(filter($"ws", w => w.isInCollection(stop("en")))).cast("double") / $"n_words")
      // nullif: a zero-length text would hit ANSI DIVIDE_BY_ZERO the
      // moment anything actually evaluates quality (q51's own gate
      // dump projects it; a bare count() prunes it — which is why the
      // degenerate sweep only caught this via q124's aggregate).
      // Empty text → NULL ratio → NULL quality, the drop-at-the-seam
      // policy every filter downstream applies.
      .withColumn("punct_ratio",
        size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double") /
          nullif(length($"text"), lit(0)))
      .withColumn("quality",
        lit(1.0) / (lit(1.0) +
          exp(-(lit(0.02) * $"n_words" + lit(5.0) * $"stop_ratio"
            - lit(10.0) * $"punct_ratio" - lit(1.0)))))
  }

  /** Quality scoring: length / word / stopword / punctuation features
    * + a logistic composite — the classic pre-training text filter. */
  private val quality = Q(
    "q51_text_quality",
    (s, d) => {
      import s.implicits._
      qualityScored(s, d)
        .select($"doc_id", $"n_words", $"avg_word_len", $"stop_ratio",
          $"punct_ratio", $"quality")
    },
    Some(s"""WITH w AS (SELECT doc_id, text, string_split_regex(trim(text),'\\s+') ws FROM documents),
      f AS (SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        list_sum(list_transform(ws, x -> CAST(length(x) AS DOUBLE))) / len(ws) AS avg_word_len,
        CAST(len(list_filter(ws, x -> list_contains(${sqlList(stop("en"))}, x))) AS DOUBLE)
          / len(ws) AS stop_ratio,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
          / nullif(length(text), 0) AS punct_ratio
        FROM w)
      SELECT doc_id, n_words, avg_word_len, stop_ratio, punct_ratio,
        1.0 / (1.0 + exp(-(0.02*n_words + 5.0*stop_ratio - 10.0*punct_ratio - 1.0))) AS quality
      FROM f"""))

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (≤4-char alpha pieces, single digits, single punctuation) —
    * the ubiquitous "token budget" statistic. */
  private val tokenCount = Q(
    "q52_token_count",
    (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text",
          lit("[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("long").as("bpe_tokens"),
        (length($"text").cast("double") /
          size(regexp_extract_all($"text",
            lit("[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]"), lit(0)))).as("chars_per_token"))
    },
    Some("""SELECT doc_id,
      CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens,
      CAST(length(text) AS DOUBLE)
        / len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]')) AS chars_per_token
      FROM documents"""))

  /** Document fingerprinting: min rolling-window hash (8-char windows,
    * md5, lexicographic min — a 1-sample winnowing fingerprint) +
    * distinct-window count, via the native
    * [[graft.functions.RollingFingerprint]] expression (the
    * interpreted HOF formulation — transform+array_min over ~500
    * windows/doc — measured ~6× slower). Row-local; fingerprint
    * equality is then a cheap exact-dedup key at scale. */
  private val fingerprint = Q(
    "q53_fingerprint",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      T.documents(s, d)
        .withColumn("fp", expr("rolling_fingerprint(text)"))
        .select($"doc_id", $"fp.fingerprint".as("fingerprint"),
          $"fp.n_distinct_windows".as("n_distinct_windows"))
    },
    Some("""SELECT doc_id,
      list_aggregate(list_transform(generate_series(1, greatest(length(text)-7, 1)),
        i -> md5(substr(text, i, 8))), 'min') AS fingerprint,
      CAST(len(list_distinct(list_transform(generate_series(1, greatest(length(text)-7, 1)),
        i -> md5(substr(text, i, 8))))) AS BIGINT) AS n_distinct_windows
      FROM documents"""),
    bench = true)

  /** Corpus word frequency: explode → count → top-10 per language
    * (the vocabulary/Zipf statistic every text pipeline starts with;
    * partial+final hash agg then per-group top-k window). */
  private val wordFreq = Q(
    "q49_word_freq",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = T.documents(s, d)
        .select($"lang", explode(split(trim($"text"), "\\s+")).as("word"))
        .groupBy($"lang", $"word").agg(count(lit(1)).as("n"))
      counts.withColumn("rank", row_number().over(
          Window.partitionBy($"lang").orderBy($"n".desc, $"word".asc)))
        .filter($"rank" <= 10)
    },
    Some("""WITH c AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents),
      g AS (SELECT lang, word, count(*) AS n FROM c GROUP BY 1, 2)
      SELECT lang, word, n, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rank
        FROM g) WHERE rank <= 10"""))

  /** Text normalization: case folding, punctuation stripping,
    * whitespace collapsing — the canonical form fed to dedup
    * fingerprints (row-local, codegen'd). */
  private val normalize = Q(
    "q54_normalize",
    (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        regexp_replace(regexp_replace(lower(trim($"text")),
          "[^a-z0-9\\s]", ""), "\\s+", " ").as("norm_text"),
        md5(regexp_replace(regexp_replace(lower(trim($"text")),
          "[^a-z0-9\\s]", ""), "\\s+", " ")).as("norm_hash"))
    },
    Some("""SELECT doc_id,
      regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g') AS norm_text,
      md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm_hash
      FROM documents"""))

  /** TF-IDF top-5 terms per document. Term counting is ROW-LOCAL via
    * the native `word_counts` expression (a doc's words live in one
    * row — explode→groupBy(doc,word) would shuffle every token for
    * counts the row already determines); only document frequency
    * aggregates globally, and the per-token "posting shuffle" becomes
    * a per-distinct-term one. dl = Σtf rides along row-locally; n_docs
    * as a broadcast single-row cross join, never a collect. */
  private val tfidf = Q(
    "q67_tfidf",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.GraftExtensions.ensureRegistered(s)
      val docs = T.documents(s, d)
      val tf = docs
        .select($"doc_id",
          size(split(trim($"text"), "\\s+")).cast("long").as("dl"), // = Σtf
          explode(expr("word_counts(text)")).as("w"))
        .select($"doc_id", $"w.word".as("word"), $"w.tf".as("tf"), $"dl")
        // (uncached: recomputing the row-local explode twice is cheaper than materializing 1.5M rows)
      val dfq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      // broadcast(dfq): vocabulary-sized, fine for any real corpus
      // vocabulary; at open-vocab extremes drop the hint and Catalyst
      // falls back to a shuffle join on `word`
      val scored = tf.join(broadcast(dfq), "word").crossJoin(broadcast(nd))
        .withColumn("score",
          ($"tf".cast("double") / $"dl") *
            (log(($"n_docs".cast("double") + 1.0) / ($"df".cast("double") + 1.0)) + 1.0))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"score".desc, $"word".asc)).cast("long"))
        .filter($"rk" <= 5)
        .select($"doc_id", $"word", $"tf", $"score", $"rk")
    },
    Some("""WITH wx AS (SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS word
               FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM wx GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT t.doc_id, t.word, t.tf,
               (CAST(t.tf AS DOUBLE) / d.dl) *
                 (ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(f.df AS DOUBLE) + 1.0)) + 1.0) AS score
             FROM tf t JOIN dl d USING (doc_id) JOIN dfq f USING (word) CROSS JOIN nd n)
      SELECT doc_id, word, tf, score, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word ASC) AS BIGINT) AS rk
        FROM sc) WHERE rk <= 5"""),
    bench = true)

  /** BM25 (k1=1.2, b=0.75) for a fixed 3-term query — the ranked-
    * retrieval twin of q67. Postings for the query terms only (filter
    * BEFORE the aggregate: the shuffle carries 3 words' postings, not
    * the whole vocabulary); corpus stats (N, avgdl) broadcast. */
  private val bm25 = Q(
    "q68_bm25",
    (s, d) => {
      import s.implicits._
      val terms = Seq("the", "of", "and")
      graft.GraftExtensions.ensureRegistered(s)
      val docs = T.documents(s, d)
      // row-local counting (see q67): only the 3 query terms' counted
      // pairs survive the explode, dl is a plain expression
      val dl = docs.select($"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("dl"))
      val tf = docs
        .select($"doc_id", explode(expr("word_counts(text)")).as("w"))
        .select($"doc_id", $"w.word".as("word"), $"w.tf".as("tf"))
        .filter($"word".isInCollection(terms))
      val dfq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
      val stats = dl.agg(avg($"dl").as("avgdl"), count(lit(1)).as("n_docs"))
      tf.join(dl, "doc_id").join(dfq, "word").crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + ($"n_docs".cast("double") - $"df" + 0.5) / ($"df".cast("double") + 0.5)))
        .withColumn("tfc",
          ($"tf".cast("double") * (1.2 + 1.0)) /
            ($"tf".cast("double") + lit(1.2) * (lit(1.0 - 0.75) + $"dl".cast("double") / $"avgdl" * 0.75)))
        .groupBy($"doc_id")
        .agg(sum($"idf" * $"tfc").as("bm25"), count(lit(1)).as("n_terms_hit"))
    },
    Some("""WITH wx AS (SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS word
               FROM documents),
      dl AS (SELECT doc_id, count(*) AS dl FROM wx GROUP BY 1),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM wx
             WHERE word IN ('the', 'of', 'and') GROUP BY 1, 2),
      dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
      sc AS (SELECT t.doc_id,
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - t2.df + 0.5) / (CAST(t2.df AS DOUBLE) + 0.5)) AS idf,
               (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
                 (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + CAST(d.dl AS DOUBLE) / s.avgdl * 0.75)) AS tfc
             FROM tf t JOIN dl d USING (doc_id) JOIN dfq t2 USING (word) CROSS JOIN st s)
      SELECT doc_id, sum(idf * tfc) AS bm25, count(*) AS n_terms_hit
      FROM sc GROUP BY doc_id"""))

  /** Bigram frequency: the n-gram generalization of q49 (vocabulary →
    * collocation statistics). Bigrams built row-locally via
    * transform+slice, then one partial+final count shuffle. */
  private val bigramCounts = Q(
    "q69_bigram_counts",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .filter(size($"ws") >= 2)
        .select($"lang", explode(transform(
          sequence(lit(1), size($"ws") - 1),
          i => concat_ws(" ", slice($"ws", i, lit(2))))).as("bigram"))
        .groupBy($"lang", $"bigram").agg(count(lit(1)).as("n"))
      counts.withColumn("rank", row_number().over(
          Window.partitionBy($"lang").orderBy($"n".desc, $"bigram".asc)).cast("long"))
        .filter($"rank" <= 10)
    },
    Some("""WITH w AS (SELECT lang, string_split_regex(trim(text),'\s+') ws FROM documents),
      bg AS (SELECT lang, unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> array_to_string(ws[i:i+1], ' '))) AS bigram
             FROM w WHERE len(ws) >= 2),
      g AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
      SELECT lang, bigram, n, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS BIGINT) AS rank
        FROM g) WHERE rank <= 10"""))

  /** The PII patterns, single-sourced for q70's scrub and q132's
    * incidence report (Spark and DuckDB both read these literals). */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
  private val NumRe = "[0-9]{3,}"

  /** PII scrubbing: email-shaped tokens then long digit runs replaced
    * with typed placeholders (email pass FIRST — emails contain digit
    * runs), plus a redaction count for audit. Row-local regex work,
    * fully codegen'd, linear at any scale. */
  private val piiScrub = Q(
    "q70_pii_scrub",
    (s, d) => {
      import s.implicits._
      val emailRe = EmailRe
      val numRe = NumRe
      val scrubbed = regexp_replace(
        regexp_replace($"text", emailRe, "<EMAIL>"), numRe, "<NUM>")
      T.documents(s, d).select(
        $"doc_id",
        md5(scrubbed).as("scrubbed_hash"),
        (size(regexp_extract_all($"text", lit(emailRe), lit(0))) +
          size(regexp_extract_all(regexp_replace($"text", emailRe, "<EMAIL>"),
            lit(numRe), lit(0)))).cast("long").as("n_redactions"))
    },
    Some(s"""SELECT doc_id,
      md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
          '$NumRe', '<NUM>', 'g')) AS scrubbed_hash,
      CAST(len(regexp_extract_all(text, '$EmailRe'))
        + len(regexp_extract_all(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
            '$NumRe')) AS BIGINT) AS n_redactions
      FROM documents"""))

  /** Intra-document repetition filter (the Gopher-rules shape): share
    * of duplicate 3-word shingles within each doc; docs above 30%
    * flagged. Complements the CROSS-doc dedup family (q40-q44, q72) —
    * row-local, no shuffle, linear at any scale. */
  private val repetition = Q(
    "q76_repetition_filter",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .filter(size($"ws") >= 3)
        .withColumn("n_grams", (size($"ws") - 2).cast("long"))
        .withColumn("n_distinct", size(array_distinct(transform(
          sequence(lit(1), size($"ws") - 2),
          i => concat_ws(" ", slice($"ws", i, lit(3)))))).cast("long"))
        .select($"doc_id", $"n_grams", $"n_distinct",
          (lit(1.0) - $"n_distinct".cast("double") / $"n_grams").as("dup_ratio"),
          ((lit(1.0) - $"n_distinct".cast("double") / $"n_grams") > 0.3)
            .as("is_repetitive"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split_regex(trim(text),'\s+') ws FROM documents),
      g AS (SELECT doc_id,
              CAST(len(ws) - 2 AS BIGINT) AS n_grams,
              CAST(len(list_distinct(list_transform(generate_series(1, len(ws)-2),
                i -> array_to_string(ws[i:i+2], ' ')))) AS BIGINT) AS n_distinct
            FROM w WHERE len(ws) >= 3)
      SELECT doc_id, n_grams, n_distinct,
        1.0 - CAST(n_distinct AS DOUBLE) / n_grams AS dup_ratio,
        (1.0 - CAST(n_distinct AS DOUBLE) / n_grams) > 0.3 AS is_repetitive
      FROM g"""))

  /** Bigram language-model quality score (the CCNet/perplexity-filter
    * shape): score(doc) = mean over consecutive bigrams of
    * ln P(w₂|w₁), with P estimated from THIS corpus
    * (c(w₁w₂)/c(w₁·) over bigram positions) — low scores flag
    * machine-garbled/atypical text for quality filtering. No
    * smoothing needed: every doc bigram is by construction in the
    * corpus counts. Scale shape: two global count aggregations keyed
    * by bigram/unigram (bounded by vocabulary, not corpus size), one
    * keyed join per doc-bigram position, then a per-doc mean — every
    * shuffle is on a count key; nothing is quadratic and no model is
    * broadcast. Spark `log` and DuckDB `ln` are both natural log. */
  private val bigramLogProb = Q(
    "q92_bigram_logprob",
    (s, d) => {
      import s.implicits._
      val pos = T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .filter(size($"ws") >= 2)
        .select($"doc_id", explode(transform(
          sequence(lit(1), size($"ws") - 1),
          i => struct(element_at($"ws", i).as("w1"),
            concat_ws(" ", slice($"ws", i, lit(2))).as("bigram")))).as("p"))
        .select($"doc_id", $"p.w1", $"p.bigram")
      val c2 = pos.groupBy($"bigram").agg(count(lit(1)).as("c2"))
      val c1 = pos.groupBy($"w1").agg(count(lit(1)).as("c1"))
      pos.join(c2, "bigram").join(c1, "w1")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          avg(log($"c2".cast("double") / $"c1".cast("double"))).as("avg_logprob"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split_regex(trim(text),'\s+') ws FROM documents),
      pos AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> struct_pack(w1 := ws[i], bigram := array_to_string(ws[i:i+1], ' ')))) AS p
              FROM w WHERE len(ws) >= 2),
      fl AS (SELECT doc_id, p.w1 AS w1, p.bigram AS bigram FROM pos),
      c2 AS (SELECT bigram, count(*) AS c2 FROM fl GROUP BY 1),
      c1 AS (SELECT w1, count(*) AS c1 FROM fl GROUP BY 1)
      SELECT fl.doc_id, count(*) AS n_bigrams,
             avg(ln(c2.c2 * 1.0 / c1.c1)) AS avg_logprob
      FROM fl JOIN c2 USING (bigram) JOIN c1 USING (w1)
      GROUP BY fl.doc_id"""))

  /** Out-of-vocabulary rate against a fixed-size vocabulary: vocab =
    * the corpus's top-1000 words by frequency (ties broken by word),
    * per-doc OOV fraction = tokens outside it / tokens. The vocabulary
    * is a FIXED-SIZE broadcast regardless of corpus size (contrast
    * q45's corpus-growing query set, which needs its guard) — the
    * canonical quality-filter join shape at 100 TB: broadcast the
    * bounded dictionary, stream the corpus through a left-anti-style
    * membership probe, never shuffle the big side. */
  private val oovRate = Q(
    "q93_oov_rate",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .filter(size($"ws") >= 1)
        .select($"doc_id", explode($"ws").as("w"))
      // top-k via distributed TakeOrderedAndProject — an unpartitioned
      // row_number window would funnel the whole vocabulary through one
      // task's sort at scale
      val vocab = toks.groupBy($"w").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"w".asc).limit(1000)
        .select($"w", lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"doc_id", $"n_tokens", $"n_oov",
          ($"n_oov".cast("double") / $"n_tokens").as("oov_rate"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS w
        FROM documents WHERE len(string_split_regex(trim(text),'\s+')) >= 1),
      vocab AS (SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rk
        FROM toks GROUP BY w) WHERE rk <= 1000)
      SELECT t.doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*) AS oov_rate
      FROM toks t LEFT JOIN vocab v USING (w)
      GROUP BY t.doc_id"""))

  /** Per-language doc-length outlier trim (Tukey IQR fence): docs with
    * token counts outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] of their
    * language are flagged — the standard cleanup pass that drops
    * boilerplate stubs and runaway concatenations before training.
    * One per-language exact-percentile aggregate (5 languages → tiny
    * result, broadcast back), then a row-local fence test; the corpus
    * is scanned twice but never shuffled by doc. Spark `percentile`
    * and DuckDB `quantile_cont` share linear interpolation (q63
    * proved bit-parity). */
  private val lengthOutliers = Q(
    "q94_length_outliers",
    (s, d) => {
      import s.implicits._
      val lens = T.documents(s, d)
        .select($"doc_id", $"lang",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      val fences = lens.groupBy($"lang").agg(
        expr("percentile(n_tokens, 0.25)").as("q1"),
        expr("percentile(n_tokens, 0.75)").as("q3"))
        .select($"lang", ($"q1" - ($"q3" - $"q1") * 1.5).as("lo"),
          ($"q3" + ($"q3" - $"q1") * 1.5).as("hi"))
      lens.join(broadcast(fences), "lang")
        .select($"doc_id", $"lang", $"n_tokens",
          ($"n_tokens" < $"lo" || $"n_tokens" > $"hi").as("is_outlier"))
    },
    Some("""WITH lens AS (SELECT doc_id, lang,
        CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      f AS (SELECT lang,
              quantile_cont(n_tokens, 0.25) AS q1,
              quantile_cont(n_tokens, 0.75) AS q3
            FROM lens GROUP BY lang)
      SELECT l.doc_id, l.lang, l.n_tokens,
             (l.n_tokens < f.q1 - 1.5 * (f.q3 - f.q1)
              OR l.n_tokens > f.q3 + 1.5 * (f.q3 - f.q1)) AS is_outlier
      FROM lens l JOIN f USING (lang)"""))

  /** Data-mixing sampler: downsample every language to the smallest
    * stratum's size (the balance step of training-set mixture
    * construction). Rates derive FROM the data — per-language keep
    * probability min_n/n as integer ppm (bigint division, exact in
    * both engines; no float thresholds) — then a deterministic
    * md5-bucket Bernoulli per doc, so the sample is reproducible and
    * shuffle-free: counts are a tiny broadcast, the corpus streams
    * through one row-local filter. Extends q73 (fixed rates) to
    * data-derived rates. */
  private val mixtureSample = Q(
    "q96_mixture_sample",
    (s, d) => {
      import s.implicits._
      val counts = T.documents(s, d).groupBy($"lang").agg(count(lit(1)).as("n"))
      val minN = counts.agg(min($"n").as("min_n"))
      val rates = counts.crossJoin(broadcast(minN))
        .select($"lang", expr("min_n * 1000000 div n").as("keep_ppm"))
      val bucket =
        conv(substring(md5($"doc_id".cast("string")), 1, 14), 16, 10)
          .cast("long") % 1000000
      T.documents(s, d).join(broadcast(rates), "lang")
        .filter(bucket < $"keep_ppm")
        .select($"doc_id", $"lang", $"keep_ppm")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      m AS (SELECT min(n) AS min_n FROM c),
      r AS (SELECT lang, (min_n * 1000000) // n AS keep_ppm FROM c CROSS JOIN m)
      SELECT d.doc_id, d.lang, r.keep_ppm
      FROM documents d JOIN r USING (lang)
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14) AS BIGINT) % 1000000
            < r.keep_ppm"""))

  /** Corpus-wide heavy hitters: every token at >= 0.2% relative
    * frequency with its EXACT count, via the Misra–Gries
    * sketch-route-verify in [[graft.operators.HeavyHitters]] — the
    * shuffle carries <=k sketch entries per partition plus <=k exact
    * recount groups, never the full distinct-token key space (the
    * frequency analogue of q100's Bloom routing; contrast q49/q85,
    * which pay the full token shuffle for per-lang output). The
    * oracle is the plain exact SQL — the sketch is a cost device,
    * invisible in the result. */
  private val heavyHitters = Q(
    "q105_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select(explode(split(trim($"text"), "\\s+")).as("tok")).as[String]
      graft.operators.HeavyHitters.exactAbove(toks, 0.002)
    },
    Some("""WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      tot AS (SELECT count(*) AS n FROM w)
      SELECT tok, count(*) AS cnt FROM w CROSS JOIN tot
      GROUP BY tok, n
      HAVING count(*) >= greatest(1, CAST(ceil(0.002 * n) AS BIGINT))"""),
    bench = true)

  /** Per-language heavy hitters: q105's sketch-route-verify with the
    * Misra–Gries summary keyed by `lang`, each language thresholded
    * against its OWN token total (1%) — the per-corpus cut would let
    * a dominant language's volume drown a small one's hitters.
    * Contrast q49 (top-10 by rank, full token shuffle): this is
    * threshold-based, exact, and k-bounded on the wire. */
  private val heavyHittersPerLang = Q(
    "q108_heavy_hitters_per_lang",
    (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"lang", explode(split(trim($"text"), "\\s+")).as("tok"))
      graft.operators.HeavyHitters.exactAbovePerGroup(toks, "lang", "tok", 0.01)
    },
    Some("""WITH w AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents WHERE lang IS NOT NULL),
      tot AS (SELECT lang, count(*) AS n FROM w GROUP BY 1)
      SELECT w.lang, tok, count(*) AS cnt
      FROM w JOIN tot USING (lang)
      GROUP BY w.lang, tok, n
      HAVING count(*) >= greatest(1, CAST(ceil(0.01 * n) AS BIGINT))"""))

  /** Per-source length profile — the drift monitor a corpus pipeline
    * watches across ingests: when one source's token-length
    * distribution shifts (a scraper change, a new boilerplate
    * wrapper), the p50/p90 move long before aggregate totals do.
    * Spark's exact `percentile` ≡ DuckDB's `quantile_cont` (the q63
    * parity); per-group state is the source's distinct-value count
    * map — fine for per-source profiling where groups are modest.
    *
    * The "if a source ever grows past that" foot-gun is now a SWITCH,
    * not a doc note (round 9, VERDICT r8 #7): a cheap pre-pass
    * (map-side-combined count per source — k rows on the wire) sizes
    * the largest group, and past `graft.exactPercentileMaxGroup`
    * (default 5M rows) the aggregate flips to `approx_percentile`
    * (q65's bounded sketch, 10⁴ accuracy), cast to double so the
    * schema never drifts between modes. Gate scale stays far under
    * the default cap, so the oracle remains the exact quantile
    * (Q117FallbackSpec pins both modes). */
  private val sliceLengthProfile = Q(
    "q117_slice_length_profile",
    (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .withColumn("tok", size(split(trim($"text"), "\\s+")).cast("long"))
      val cap = s.conf.getOption("graft.exactPercentileMaxGroup")
        .map(_.toLong).getOrElse(5000000L)
      val maxGroup = toks.groupBy($"source").agg(count(lit(1)).as("n"))
        .agg(coalesce(max($"n"), lit(0L))).head().getLong(0)
      def pct(f: Double): org.apache.spark.sql.Column =
        if (maxGroup <= cap) expr(s"percentile(tok, $f)")
        else expr(s"CAST(approx_percentile(tok, $f, 10000) AS DOUBLE)")
      toks.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          pct(0.5).as("p50_tokens"),
          pct(0.9).as("p90_tokens"),
          avg($"tok").as("mean_tokens"))
    },
    Some("""WITH d AS (SELECT source,
        CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS tok
        FROM documents)
      SELECT source, count(*) AS n_docs,
        quantile_cont(tok, 0.5) AS p50_tokens,
        quantile_cont(tok, 0.9) AS p90_tokens,
        avg(tok) AS mean_tokens
      FROM d GROUP BY source"""))

  /** Gopher-style rule battery (published hard thresholds, Rae et al.
    * 2021 appendix A — public paper): word-count bounds, mean word
    * length band, alphabetic-word fraction, symbol-to-word ratio
    * (# / ellipsis), bullet-start and ellipsis-end line fractions,
    * plus the conjunction. Complements q51 (a soft logistic
    * composite) and q76 (intra-doc shingle repetition): these are the
    * explicit per-rule columns a curation report shows per document.
    * Row-local expression work inside whole-stage codegen — no
    * shuffle, linear at any scale; the line features split on \n
    * (this corpus is single-line, so they exercise the degenerate
    * 1-line case — the rules still evaluate, the fractions are 0). */
  private val gopherRules = Q(
    "q120_gopher_rules",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .withColumn("lines", split($"text", "\n"))
        .withColumn("n_words", size($"ws").cast("long"))
        .withColumn("mean_word_len",
          aggregate(transform($"ws", w => length(w).cast("double")),
            lit(0.0), (a, x) => a + x) / $"n_words")
        .withColumn("alpha_word_frac",
          size(filter($"ws", w => w.rlike("[A-Za-z]"))).cast("double") / $"n_words")
        .withColumn("symbol_ratio",
          size(regexp_extract_all($"text", lit("#|\\.\\.\\.|…"), lit(0)))
            .cast("double") / $"n_words")
        .withColumn("bullet_line_frac",
          size(filter($"lines", l => l.rlike("^\\s*[-*•]"))).cast("double") /
            size($"lines"))
        .withColumn("ellipsis_line_frac",
          size(filter($"lines", l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") /
            size($"lines"))
        .withColumn("passes_gopher",
          $"n_words".between(50L, 100000L) &&
            $"mean_word_len".between(3.0, 10.0) &&
            $"alpha_word_frac" >= 0.8 && $"symbol_ratio" <= 0.1 &&
            $"bullet_line_frac" <= 0.9 && $"ellipsis_line_frac" <= 0.3)
        .select($"doc_id", $"n_words", $"mean_word_len", $"alpha_word_frac",
          $"symbol_ratio", $"bullet_line_frac", $"ellipsis_line_frac",
          $"passes_gopher")
    },
    Some("""WITH w AS (SELECT doc_id, text,
        string_split_regex(trim(text),'\s+') AS ws,
        string_split(text, chr(10)) AS ls
        FROM documents),
      f AS (SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        list_sum(list_transform(ws, x -> CAST(length(x) AS DOUBLE))) / len(ws) AS mean_word_len,
        CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
          / len(ws) AS alpha_word_frac,
        CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
          / len(ws) AS symbol_ratio,
        CAST(len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*•]'))) AS DOUBLE)
          / len(ls) AS bullet_line_frac,
        CAST(len(list_filter(ls, x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS DOUBLE)
          / len(ls) AS ellipsis_line_frac
        FROM w)
      SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
        bullet_line_frac, ellipsis_line_frac,
        (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
          AND alpha_word_frac >= 0.8 AND symbol_ratio <= 0.1
          AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
          AS passes_gopher
      FROM f"""))

  /** Header-boilerplate (template) detection: docs sharing an
    * identical leading 5-word prefix within one source form a
    * template family — scraper headers, license banners, mirrored
    * article leads (47 docs at gate SF share such a prefix). Per doc:
    * the prefix, its family size, the template flag. Scale shape: one
    * map-side-combined count keyed by (source, prefix) — one record
    * per distinct template reaches the wire — then an equi-join back
    * on the same key. A corpus-dominating banner makes that join key
    * hot, which is exactly q88's salted-join regime (SkewedJoin);
    * not wired here because gate families are ≤3 docs and AQE's
    * skew-join split handles the first decade of growth. */
  private val templatePrefix = Q(
    "q121_template_prefix",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .filter(size($"ws") >= 5)
        .select($"doc_id", $"source",
          concat_ws(" ", slice($"ws", 1, 5)).as("prefix5"))
      val fam = docs.groupBy($"source", $"prefix5")
        .agg(count(lit(1)).as("family_size"))
      docs.join(fam, Seq("source", "prefix5"))
        .select($"doc_id", $"source", $"prefix5", $"family_size",
          ($"family_size" >= 2L).as("is_template"))
    },
    Some("""WITH p AS (SELECT doc_id, source,
        array_to_string(string_split_regex(trim(text),'\s+')[1:5],' ') AS prefix5
        FROM documents WHERE len(string_split_regex(trim(text),'\s+')) >= 5),
      f AS (SELECT source, prefix5, count(*) AS family_size FROM p GROUP BY 1,2)
      SELECT doc_id, p.source, p.prefix5, family_size,
        family_size >= 2 AS is_template
      FROM p JOIN f USING (source, prefix5)"""))

  /** Stratified exact-k deterministic sample: exactly 20 docs per
    * language, chosen by md5(doc_id) order — the eval-set carve that
    * needs a FIXED size per stratum (q73/q96's ppm-rate sampling
    * gives an expected fraction, not an exact count). Deterministic
    * and stable under corpus growth ONLY in the sense that re-running
    * the same snapshot reproduces it; additions can displace members
    * (an exact-k quota cannot be append-stable — that trade is the
    * point vs q106's hash-split). Scale: the rank ≤ k filter compiles
    * to WindowGroupLimit — every map task pre-drops to its local
    * top-k, so the exchange carries ≤ k·partitions rows per language,
    * never the stratum. */
  private val stratifiedTopK = Q(
    "q122_stratified_topk",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      T.documents(s, d)
        .withColumn("skey", md5($"doc_id".cast("string")))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"lang").orderBy($"skey")).cast("long"))
        .filter($"rn" <= 20)
        .select($"doc_id", $"lang", $"rn")
    },
    Some("""SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang, row_number() OVER (
          PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        FROM documents) WHERE rn <= 20"""))

  /** Quality-threshold cut curve: q51's logistic score (the SHARED
    * `qualityScored` frame — one code path, the two reports cannot
    * drift) bucketed into deciles, with per-bucket doc and token mass
    * plus the cumulative mass removed if the corpus were cut at each
    * bucket's upper edge — the table a curation run reads to price a
    * threshold before committing to it. Scale shape: value-derived
    * `width_bucket` keys (the q32 discipline — no rank, no global
    * sort of the corpus), ONE map-side-combined aggregate down to
    * ≤ 10 rows, and the running sums are a window over that
    * aggregated output — the q31-style post-aggregate global window
    * PlanShapeSpec's `bounded` walk permits. DuckDB side: the window
    * SUM yields HUGEINT — CAST to BIGINT (the q111 lesson). */
  private val qualityCutCurve = Q(
    "q124_quality_cut_curve",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // NULL quality (empty text via the nullif seam) → sentinel
      // bucket 0, BELOW every real bucket in BOTH engines — the q32
      // discipline (WindowQueries' sentinel note): Spark's window
      // default is NULLS FIRST but DuckDB's is NULLS LAST, so a raw
      // NULL bucket would put the running sums on divergent row
      // orders. Bucket 0 also reads correctly: unscoreable docs are
      // cut before any threshold.
      qualityScored(s, d)
        .withColumn("bucket",
          coalesce(expr("width_bucket(quality, 0D, 1D, 10)"), lit(0L)))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"n_words").as("n_tokens"))
        .withColumn("cum_docs_cut", sum($"n_docs").over(w))
        .withColumn("cum_tokens_cut", sum($"n_tokens").over(w))
        .select($"bucket", $"n_docs", $"n_tokens",
          $"cum_docs_cut", $"cum_tokens_cut")
    },
    Some(s"""WITH w AS (SELECT doc_id, text, string_split_regex(trim(text),'\\s+') ws FROM documents),
      f AS (SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        CAST(len(list_filter(ws, x -> list_contains(${sqlList(stop("en"))}, x))) AS DOUBLE)
          / len(ws) AS stop_ratio,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
          / nullif(length(text), 0) AS punct_ratio
        FROM w),
      q AS (SELECT n_words,
        1.0 / (1.0 + exp(-(0.02*n_words + 5.0*stop_ratio - 10.0*punct_ratio - 1.0))) AS quality
        FROM f),
      b AS (SELECT coalesce(CAST(floor(quality*10) AS BIGINT) + 1, 0) AS bucket,
        count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens
        FROM q GROUP BY 1)
      SELECT bucket, n_docs, n_tokens,
        CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs_cut,
        CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens_cut
      FROM b"""))

  /** Compression-ratio quality signal: zlib DEFLATE bytes over raw
    * UTF-8 bytes per document, via the native
    * [[graft.functions.DeflateRatio]] expression — the entropy-style
    * filter public corpus pipelines run beside word heuristics
    * (template spam compresses ≪ prose; pasted binary junk ≈ 1).
    * LZ77's 32 KiB window sees sub-word and long-range structure
    * q76's shingle distinctness can't. Row-local, thread-local
    * native state, linear at any scale.
    *
    * The registry's only ROWS-ONLY entry: no SQL engine exposes zlib
    * byte counts, so there is no DuckDB oracle to equal — the
    * behavioral contract (codegen ≡ interpreted, determinism, exact
    * byte accounting vs java.util.zip standalone, entropy ordering,
    * flag thresholds) is DeflateRatioSpec's job instead. */
  private val compressionRatio = Q(
    "q128_compression_ratio",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      T.documents(s, d)
        .withColumn("dr", expr("deflate_ratio(text)"))
        .select($"doc_id", $"dr.raw_bytes".as("raw_bytes"),
          $"dr.deflated_bytes".as("deflated_bytes"), $"dr.ratio".as("ratio"),
          ($"dr.ratio" < 0.3).as("is_low_entropy"),
          ($"dr.ratio" > 0.95).as("is_high_entropy"))
    },
    None)

  /** Zipf head-mass profile: token mass by count MAGNITUDE — for
    * each decimal-digit bucket of a token's corpus frequency (1–9,
    * 10–99, …), the number of distinct types, their token mass, and
    * the cumulative mass walking from the most frequent bucket down.
    * The vocabulary-design report (how much of the corpus does the
    * head cover? how heavy is the singleton tail?) that q49's top-10
    * and q105's threshold hitters both skip past. Scale shape: ONE
    * vocabulary-bounded count aggregate (the q49 shuffle), then
    * magnitude bucketing — the bucket key is the DIGIT COUNT of the
    * frequency, integer-exact in both engines, where
    * `floor(log10(c))` would ride a float edge (log10(1000) can
    * evaluate below 3.0) — and ≤ ~12-row post-aggregate windows for
    * the cumulative/total. No global rank anywhere: a top-N coverage
    * curve needs q32's two-level machinery, the magnitude profile
    * answers the same design question with none of it. */
  private val zipfProfile = Q(
    "q129_zipf_profile",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = T.documents(s, d)
        .select(explode(split(trim($"text"), "\\s+")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("c"))
      val byMag = counts
        .withColumn("digits", length($"c".cast("string")).cast("long"))
        .groupBy($"digits")
        .agg(count(lit(1)).as("n_types"), sum($"c").as("mass"))
      val down = Window.orderBy($"digits".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.orderBy($"digits".desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      byMag
        .withColumn("cum_mass", sum($"mass").over(down))
        .withColumn("frac_mass",
          $"mass".cast("double") / sum($"mass").over(all))
        .select($"digits", $"n_types", $"mass", $"cum_mass", $"frac_mass")
    },
    Some("""WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      c AS (SELECT tok, count(*) AS c FROM w GROUP BY tok),
      m AS (SELECT CAST(length(CAST(c AS VARCHAR)) AS BIGINT) AS digits,
              count(*) AS n_types, CAST(sum(c) AS BIGINT) AS mass
            FROM c GROUP BY 1)
      SELECT digits, n_types, mass,
        CAST(sum(mass) OVER (ORDER BY digits DESC) AS BIGINT) AS cum_mass,
        CAST(mass AS DOUBLE) / sum(mass) OVER () AS frac_mass
      FROM m"""))

  /** Language-ID confusion matrix: q50's predictions (the SAME
    * registered fn — the report cannot drift from the classifier it
    * evaluates, q126's discipline) rolled up to (true, predicted)
    * cells with counts and the within-true-language fraction — the
    * acceptance report for the wordlist classifier (which language
    * pairs bleed into each other, how often the '??' fallback
    * fires). The labeled corpus is the eval set; at 100 TB the same
    * rollup runs over a labeled holdout slice. One ≤k²-cell
    * aggregate plus a ≤k-row window — nothing corpus-sized past
    * q50's own row-local scoring. */
  private val langIdConfusion = Q(
    "q130_langid_confusion",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      langId.fn(s, d)
        .groupBy($"true_lang", $"pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("frac_of_true", $"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"true_lang")))
        .withColumn("is_hit", $"true_lang" === $"pred_lang")
    },
    Some(s"""WITH p AS (SELECT true_lang, pred_lang FROM (${langId.oracle.get})),
      g AS (SELECT true_lang, pred_lang, count(*) AS n_docs
            FROM p GROUP BY 1, 2)
      SELECT true_lang, pred_lang, n_docs,
        CAST(n_docs AS DOUBLE) /
          sum(n_docs) OVER (PARTITION BY true_lang) AS frac_of_true,
        true_lang = pred_lang AS is_hit
      FROM g"""))

  /** PII incidence report: per source, typed match counts (emails /
    * long digit runs — the SAME single-sourced patterns q70 scrubs
    * with, so incidence and scrub cannot disagree), affected-doc
    * counts, and redactions per 1k docs — the compliance evidence an
    * ingest review reads per feed before q70's scrub ever runs.
    * Row-local regex counting + one map-side-combined per-source
    * aggregate; nothing corpus-sized shuffles. The email pass is
    * counted on raw text, the digit pass on email-scrubbed text
    * (q70's ordering — an address's digits must not double-count). */
  private val piiIncidence = Q(
    "q132_pii_incidence",
    (s, d) => {
      import s.implicits._
      val scored = T.documents(s, d).select(
        $"source",
        size(regexp_extract_all($"text", lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(regexp_replace($"text", EmailRe, "<EMAIL>"),
          lit(NumRe), lit(0))).cast("long").as("n_nums"))
      scored.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_emails").as("n_emails"),
          sum($"n_nums").as("n_nums"),
          sum(when($"n_emails" + $"n_nums" > 0, 1L).otherwise(0L))
            .as("docs_with_pii"))
        .withColumn("redactions_per_1k_docs",
          ($"n_emails" + $"n_nums").cast("double") * 1000 / $"n_docs")
    },
    Some(s"""WITH f AS (SELECT source,
        CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(
          regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'), '$NumRe')) AS BIGINT) AS n_nums
        FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_emails) AS BIGINT) AS n_emails,
        CAST(sum(n_nums) AS BIGINT) AS n_nums,
        CAST(sum(CASE WHEN n_emails + n_nums > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS docs_with_pii,
        CAST(sum(n_emails) + sum(n_nums) AS DOUBLE) * 1000 / count(*)
          AS redactions_per_1k_docs
      FROM f GROUP BY source"""))

  /** Template-prefix STRIPPING — the application of q121's detection,
    * as q119's span cut is to q71's span detection: docs in a
    * template family lose their shared 5-word lead, singletons pass
    * untouched — header/banner removal that keeps the unique
    * remainder where whole-doc suppression would throw it away.
    * COMPOSED from q121 (the registered `templatePrefix.fn` /
    * `.oracle`, q125/q131/q133's discipline): detection and stripping
    * share one family definition, so a change to the prefix rule can
    * never desynchronize them. Join back to `documents` by doc_id
    * (q121's output already carries the ≥5-word filter), then a
    * row-local slice; the cleaned text ships with removal accounting
    * so downstream token budgets stay honest. */
  private val templateStrip = Q(
    "q138_template_strip",
    (s, d) => {
      import s.implicits._
      val det = templatePrefix.fn(s, d).select($"doc_id", $"is_template")
      T.documents(s, d)
        .join(det, Seq("doc_id"))
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .select($"doc_id", $"is_template",
          when($"is_template",
            concat_ws(" ", slice($"ws", lit(6), size($"ws") - 5)))
            .otherwise(trim($"text")).as("cleaned_text"),
          when($"is_template", 5L).otherwise(0L).as("removed_words"))
    },
    templatePrefix.oracle.map(det => s"""WITH det AS ($det)
      SELECT d.doc_id, det.is_template,
        CASE WHEN det.is_template
             THEN array_to_string(string_split_regex(trim(d.text),'\\s+')[6:], ' ')
             ELSE trim(d.text) END AS cleaned_text,
        CAST(CASE WHEN det.is_template THEN 5 ELSE 0 END AS BIGINT)
          AS removed_words
      FROM documents d JOIN det ON d.doc_id = det.doc_id"""))

  /** Full [[graft.operators.TextIndexStore]] lifecycle gate (the q146
    * pattern): index the corpus as TWO day appends into a scratch
    * store, then BM25-probe the committed index and require the
    * answer to equal the oracle's one-shot corpus scan — proving the
    * inverted layout (postings + inline dl + additive per-day stats)
    * loses nothing against computing BM25 from the raw text. The
    * probe itself reads ONLY the 3 query terms' postings (dt file
    * prune + word row-group prune on word-sorted files) and the
    * O(days) stats rows — the corpus text is never rescanned; that
    * is the retrieval serving shape at 100 TB. Scores sum matched
    * terms in query order (fixed conditional-sum chain in BOTH
    * engines — the q147 bit-stability discipline), so the rank-20
    * cut can never straddle a float reorder. */
  private val bm25StoreTopK = Q(
    "q149_bm25_store_topk",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val docs = T.documents(s, d)
      // probe terms = the corpus's top-3 words by total frequency
      // (ties word asc) — DERIVED, not hardcoded, so the gate stays
      // meaningful on any corpus (the ~sf1 replica's token mutation
      // prefixes every word — a stopword literal would probe an empty
      // posting list there). Exact integer counts → the rank is
      // deterministic and the oracle's tw CTE reproduces it; the
      // 3-row collect is the q146 driver-side query-shaping pattern.
      // Scope = the index's own indexable predicate (see docs0).
      val docs0 = docs.filter($"doc_id".isNotNull && $"text".isNotNull &&
        !$"text".rlike("^\\s*$"))
      val terms = docs0
        .select(explode(expr("word_counts(text)")).as("w"))
        .groupBy($"w.word".as("word")).agg(sum($"w.tf").as("n"))
        .orderBy($"n".desc, $"word".asc).limit(3)
        .collect().map(_.getString(0)).toSeq
      if (terms.isEmpty)
        Seq.empty[(Long, Double, Long, Int)]
          .toDF("doc_id", "bm25", "n_terms_hit", "rank")
      else {
        val root = java.nio.file.Files
          .createTempDirectory("graft-q149-textindex-").toString
        try {
          // pmod, not %: a negative doc_id must land in exactly one
          // day (the q146 rule)
          graft.operators.TextIndexStore.append(
            docs.filter(pmod($"doc_id", lit(2)) === 0), root, "day-1"): Unit
          graft.operators.TextIndexStore.append(
            docs.filter(pmod($"doc_id", lit(2)) === 1), root, "day-2"): Unit
          // terms arrive in frequency-rank order; topK's fixed-order
          // per-term sum therefore adds in the SAME order as the
          // oracle's trank CASE chain
          graft.operators.TextIndexStore.topK(s, root, terms, topK = 20)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some("""WITH docs0 AS (SELECT doc_id, text FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
          AND NOT regexp_matches(text, '^\s*$')),
      wx AS (SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS word
             FROM docs0),
      tw AS (SELECT word, trank FROM (
               SELECT word, row_number() OVER
                 (ORDER BY count(*) DESC, word ASC) AS trank
               FROM wx GROUP BY word) WHERE trank <= 3),
      dl AS (SELECT doc_id, count(*) AS dl FROM wx GROUP BY 1),
      st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM wx
             WHERE word IN (SELECT word FROM tw) GROUP BY 1, 2),
      dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT t.doc_id, w.trank,
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5)
                 / (CAST(f.df AS DOUBLE) + 0.5)) AS idf,
               (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
                 (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
                   + CAST(d.dl AS DOUBLE)
                     / (CAST(s.sum_dl AS DOUBLE) / s.n_docs) * 0.75)) AS tfc
             FROM tf t JOIN dl d USING (doc_id) JOIN dfq f USING (word)
             JOIN tw w USING (word) CROSS JOIN st s),
      ag AS (SELECT doc_id,
               coalesce(sum(CASE WHEN trank = 1 THEN idf * tfc END), 0.0)
               + coalesce(sum(CASE WHEN trank = 2 THEN idf * tfc END), 0.0)
               + coalesce(sum(CASE WHEN trank = 3 THEN idf * tfc END), 0.0)
                 AS bm25,
               count(*) AS n_terms_hit
             FROM sc GROUP BY doc_id)
      SELECT doc_id, bm25, n_terms_hit, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) rank
        FROM ag) WHERE rank <= 20"""))

  /** ORACLE-GATED TABLE-DRIVEN BATCHED BM25 (round 16) — the
    * correctness row for
    * [[graft.operators.TextIndexStore.topKBatchTable]], the batch
    * path where the queries are a DATAFRAME (qid, terms array) that
    * never touches the driver: the postings filter is a semi-join on
    * the batch's distinct words (guarded broadcast, shuffled-on-word
    * past the cap) and the (qid, word, pos) fan-out is the
    * posexploded table. The three queries are the nested prefixes of
    * the q149-derived top-3 corpus words ([w1], [w1 w2], [w1 w2 w3]),
    * so the oracle re-derives each qid's score as the corresponding
    * prefix of q149's fixed conditional-sum chain — folding only the
    * MATCHED contributions in pos order is bit-equal to the chain
    * with 0.0 placeholders (x + 0.0 is exact), the same argument the
    * driver-list batch's spec pins. Lifecycle identical to q149's
    * two-day store. */
  private val bm25BatchTable = Q(
    "q153_bm25_batch_table",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val docs = T.documents(s, d)
      val docs0 = docs.filter($"doc_id".isNotNull && $"text".isNotNull &&
        !$"text".rlike("^\\s*$"))
      val terms = docs0
        .select(explode(expr("word_counts(text)")).as("w"))
        .groupBy($"w.word".as("word")).agg(sum($"w.tf").as("n"))
        .orderBy($"n".desc, $"word".asc).limit(3)
        .collect().map(_.getString(0)).toSeq
      if (terms.isEmpty)
        Seq.empty[(Long, Long, Double, Long, Int)]
          .toDF("qid", "doc_id", "bm25", "n_terms_hit", "rank")
      else {
        val root = java.nio.file.Files
          .createTempDirectory("graft-q153-textbatch-").toString
        try {
          graft.operators.TextIndexStore.append(
            docs.filter(pmod($"doc_id", lit(2)) === 0), root, "day-1"): Unit
          graft.operators.TextIndexStore.append(
            docs.filter(pmod($"doc_id", lit(2)) === 1), root, "day-2"): Unit
          // nested-prefix queries: terms.take(i) never exceeds what
          // the corpus has, so a 2-word corpus makes qid 3 == qid 2 —
          // exactly what the oracle's trank <= i blocks compute
          val qtab = (1 to 3).map(i => (i.toLong, terms.take(i)))
            .toDF("qid", "terms")
          graft.operators.TextIndexStore.topKBatchTable(s, root, qtab,
              "qid", "terms", topK = 20)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some("""WITH docs0 AS (SELECT doc_id, text FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
          AND NOT regexp_matches(text, '^\s*$')),
      wx AS (SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS word
             FROM docs0),
      tw AS (SELECT word, trank FROM (
               SELECT word, row_number() OVER
                 (ORDER BY count(*) DESC, word ASC) AS trank
               FROM wx GROUP BY word) WHERE trank <= 3),
      dl AS (SELECT doc_id, count(*) AS dl FROM wx GROUP BY 1),
      st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM wx
             WHERE word IN (SELECT word FROM tw) GROUP BY 1, 2),
      dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT t.doc_id, w.trank,
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5)
                 / (CAST(f.df AS DOUBLE) + 0.5)) AS idf,
               (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
                 (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
                   + CAST(d.dl AS DOUBLE)
                     / (CAST(s.sum_dl AS DOUBLE) / s.n_docs) * 0.75)) AS tfc
             FROM tf t JOIN dl d USING (doc_id) JOIN dfq f USING (word)
             JOIN tw w USING (word) CROSS JOIN st s),
      agq AS (
        SELECT CAST(1 AS BIGINT) AS qid, doc_id,
               coalesce(sum(CASE WHEN trank = 1 THEN idf * tfc END), 0.0)
                 AS bm25,
               count(*) AS n_terms_hit
        FROM sc WHERE trank <= 1 GROUP BY doc_id
        UNION ALL
        SELECT CAST(2 AS BIGINT), doc_id,
               coalesce(sum(CASE WHEN trank = 1 THEN idf * tfc END), 0.0)
               + coalesce(sum(CASE WHEN trank = 2 THEN idf * tfc END), 0.0),
               count(*)
        FROM sc WHERE trank <= 2 GROUP BY doc_id
        UNION ALL
        SELECT CAST(3 AS BIGINT), doc_id,
               coalesce(sum(CASE WHEN trank = 1 THEN idf * tfc END), 0.0)
               + coalesce(sum(CASE WHEN trank = 2 THEN idf * tfc END), 0.0)
               + coalesce(sum(CASE WHEN trank = 3 THEN idf * tfc END), 0.0),
               count(*)
        FROM sc WHERE trank <= 3 GROUP BY doc_id)
      SELECT qid, doc_id, bm25, n_terms_hit, CAST(rank AS INTEGER) AS rank
      FROM (SELECT *, row_number() OVER
              (PARTITION BY qid ORDER BY bm25 DESC, doc_id ASC) rank
            FROM agq) WHERE rank <= 20"""))

  def qs: Seq[Q] = Seq(langId, quality, tokenCount, fingerprint, wordFreq,
    normalize, tfidf, bm25, bigramCounts, piiScrub, repetition,
    bigramLogProb, oovRate, lengthOutliers, mixtureSample, heavyHitters,
    heavyHittersPerLang, sliceLengthProfile, gopherRules, templatePrefix,
    stratifiedTopK, qualityCutCurve, compressionRatio, zipfProfile,
    langIdConfusion, piiIncidence, templateStrip, bm25StoreTopK,
    bm25BatchTable)
}
