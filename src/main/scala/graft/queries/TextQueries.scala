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

  /** Quality scoring: length / word / stopword / punctuation features
    * + a logistic composite — the classic pre-training text filter. */
  private val quality = Q(
    "q51_text_quality",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("ws", split(trim($"text"), "\\s+"))
        .withColumn("n_words", size($"ws").cast("long"))
        .withColumn("avg_word_len",
          aggregate(transform($"ws", w => length(w).cast("double")),
            lit(0.0), (a, x) => a + x) / $"n_words")
        .withColumn("stop_ratio",
          size(filter($"ws", w => w.isInCollection(stop("en")))).cast("double") / $"n_words")
        .withColumn("punct_ratio",
          size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double") /
            length($"text"))
        .withColumn("quality",
          lit(1.0) / (lit(1.0) +
            exp(-(lit(0.02) * $"n_words" + lit(5.0) * $"stop_ratio"
              - lit(10.0) * $"punct_ratio" - lit(1.0)))))
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
          / length(text) AS punct_ratio
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

  def qs: Seq[Q] = Seq(langId, quality, tokenCount, fingerprint, wordFreq, normalize)
}
