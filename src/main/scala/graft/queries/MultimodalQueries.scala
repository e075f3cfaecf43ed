package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque `binary` payload columns + typed
  * metadata, with decode/feature-extract as batched `mapPartitions`
  * over raw bytes — the Spark-side shape of an image/audio pipeline.
  *
  * The container has no image/audio codecs, so the "decode" step is a
  * deterministic byte-level feature extractor (clearly a stand-in —
  * swap [[decodeBatch]] for a real codec and the schema, batching and
  * partitioning stay identical). Payloads are synthesized from
  * `documents.text` bytes so the DuckDB oracle can recompute the same
  * features from character codes (corpus is ASCII).
  */
object MultimodalQueries {

  /** Deterministic synthetic MODALITY tag for a doc — the corpus has
    * no modality column, so one is derived from doc_id (stable across
    * engines and runs; 70% text / 20% image / 10% audio, a plausible
    * multimodal-corpus mix). Single-sourced here (SplitRule's
    * discipline): q114's card dimension, q141's mix report, and any
    * spec all read THIS rule, in both engines. */
  def modality(id: Column): Column =
    when(pmod(id, lit(10)) < 7, "text")
      .when(pmod(id, lit(10)) < 9, "image")
      .otherwise("audio")

  /** DuckDB form of [[modality]] (doc_id is non-negative, so `%`
    * agrees with Spark's pmod). */
  def modalitySqlCase(idExpr: String): String =
    s"""CASE WHEN $idExpr % 10 < 7 THEN 'text'
             WHEN $idExpr % 10 < 9 THEN 'image' ELSE 'audio' END"""

  /** The corpus's opaque payload column: `documents.text` bytes (the
    * container has no codecs, so payloads are synthesized — the
    * UTF-8 byte stream — which keeps every byte-level operator
    * oracle-checkable from character codes). Real deployments load a
    * parquet `binary` column here; everything downstream (grid hash,
    * banding, TFRecord packing) is bytes-only and does not change. */
  private[graft] def payloads(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.documents(s, d).select($"doc_id", $"text".cast("binary").as("payload"))
  }

  /** Band layout for [[phashPairs]]: the 63-bit grid signature splits
    * into 7 disjoint 9-bit bands, and the band VALUE is fused with
    * the payload's exact byte length. Pigeonhole: hamming ≤ 6 over
    * 63 bits forces ≥ 1 of the 7 bands identical, so banding +
    * verify is EXACTLY all-pairs-hamming≤6-same-length (q43's recall
    * argument). Same-length is the OPERATOR's semantics, not a
    * shortcut: a length change re-bins every grid cell, so the dHash
    * only ever detects same-size in-place edits (the post-exact-
    * dedup case — metadata rewritten inside an image, a frame
    * patched in a video) — and fusing the length into the join key
    * is also what makes the banding scale: 9-bit band values alone
    * have a 512-value space, whose chance collisions grow n²/512
    * per band (measured ×47 shuffle records on ×10 data before the
    * fusion; ~linear after). [[graft.operators.LshGuard]] caps the
    * residual pathology (a cap-wide SAME-length near-identical
    * family — q40/exact-dedup territory, the standard contract). */
  private[graft] val PhashBands = 7
  private[graft] val PhashBandBits = 9
  private[graft] val PhashMaxHamming = 6

  /** `(doc_id, sig, band, bv)` with `bv` = (9-bit band value ⊕ byte
    * length) fused into one long — the banded-join key table shared
    * by [[phashPairs]] (batch) and
    * [[graft.operators.DedupStore.ingestPhash]] (incremental).
    * Input needs `(doc_id, n_bytes, sig)` — [[sigFrom]]'s shape. */
  private[graft] def sigBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until PhashBands).map(b =>
          shiftleft(shiftright(col("sig"), b * PhashBandBits)
            .bitwiseAND(lit((1L << PhashBandBits) - 1)), 40)
            .bitwiseOR(col("n_bytes"))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")

  /** Banded near-dup pairs from a `(doc_id, n_bytes, sig)` frame —
    * factored out so q140 and the planted-twin spec run the
    * identical pipeline. Hot (band, bv) buckets beyond `maxBucket`
    * are skipped as candidate generators (LshGuard's contract; never
    * fires on gate data — widest measured bucket is single digits). */
  private[graft] def phashPairs(sigs: DataFrame,
      maxBucket: Int = graft.operators.LshGuard.DefaultMaxBucket): DataFrame = {
    val bands = graft.operators.LshGuard.pruneSelf(sigBands(sigs), maxBucket)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .distinct() // one pair can share several bands
  }

  /** The stand-in decoder: per payload → (n_bytes, unsigned byte sum,
    * mean byte). Batched like a real codec would be (amortizes model/
    * codec setup per batch, cf. SURVEY §2.8 M2 batching).
    *
    * NULL payloads are undecodable records and are DROPPED — the same
    * corrupt-drop policy the reference applies at its decode seam
    * (SURVEY §2.2 P3); a zero-length payload decodes to (0, 0, NULL
    * mean) rather than 0/0 = NaN. Neither occurs in the gate corpus
    * (oracle results unchanged); DegenerateInputSpec pins both. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Long, Long, Option[Double])] =
    batch.collect { case (id, bytes) if bytes != null =>
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      (id, bytes.length.toLong, sum,
        if (bytes.length == 0) None else Some(sum.toDouble / bytes.length))
    }

  /** Binary ingest → batched decode → per-payload features. The typed
    * `mapPartitions` is the genuine multimodal seam: binary in,
    * struct of features out, 32-element batches. */
  private val byteFeatures = Q(
    "q55_mm_byte_features",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id", $"text".cast("binary").as("payload"))
        .withColumn("__ok", $"payload".isNotNull)
        // corrupt-drop rate surfaces via observedMetrics
        // ("q55_decode_input" → {records, dropped}) — the decode
        // seam's operational feed; decodeBatch keeps its own null
        // guard as defense-in-depth for direct callers
        .observe("q55_decode_input",
          count(lit(1)).as("records"),
          coalesce(sum(when($"__ok", 0L).otherwise(1L)), lit(0L)).as("dropped"))
        .filter($"__ok")
        .drop("__ok")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.grouped(32).flatMap(decodeBatch))
        .toDF("doc_id", "n_bytes", "byte_sum", "mean_byte")
    },
    Some("""SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_bytes,
        CAST(list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1)))) AS BIGINT) AS byte_sum,
        CAST(list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1)))) AS DOUBLE)
          / length(text) AS mean_byte
      FROM documents WHERE text IS NOT NULL"""))

  /** Frame sampling: stride-sample ≤8 evenly spaced bytes from the
    * payload (the video-frame-sampling access pattern: seek, don't
    * scan). Pure expressions — row-local, no shuffle. */
  private val frameSample = Q(
    "q56_mm_frame_sample",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("stride", greatest(expr("length(text) div 8"), lit(1)))
        .select($"doc_id", $"stride".cast("long").as("stride"),
          // to_json: int payload serializes identically in DuckDB; raw
          // array cells break the driver's pandas row-sort
          to_json(expr("""transform(
              filter(sequence(0, 7), f -> 1 + f * stride <= length(text)),
              f -> ascii(substring(text, CAST(1 + f * stride AS INT), 1)))"""))
            .as("frames"))
    },
    Some("""SELECT doc_id,
        CAST(greatest(length(text) // 8, 1) AS BIGINT) AS stride,
        to_json(list_transform(
          list_filter(range(8), f -> 1 + f * greatest(length(text) // 8, 1) <= length(text)),
          f -> ascii(substr(text, CAST(1 + f * greatest(length(text) // 8, 1) AS INTEGER), 1)))) AS frames
      FROM documents"""))

  /** Signature frame from a `(doc_id, payload)` frame: filters to
    * ≥ 64-byte payloads (below that, grid cells go empty and the
    * gradient is noise) and computes the native
    * [[graft.functions.ByteGridHash]]. Row-local, no shuffle. */
  private[graft] def sigFrom(pl: DataFrame): DataFrame =
    pl.filter(length(col("payload")) >= 64)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        expr("byte_grid_dhash(payload)").as("sig"))

  /** DuckDB mirror of [[sigFrom]] over `table(doc_id, text)` —
    * parameterized so q139 (raw corpus) and q140 (planted view) run
    * ONE signature definition in both engines. */
  private def sigSqlOver(table: String): String =
    s"""d AS (SELECT doc_id, text, length(text) AS len
        FROM $table WHERE length(text) >= 64),
      c AS (SELECT doc_id, len, list_transform(range(64), i ->
              list_sum(list_transform(range((i*len)//64, ((i+1)*len)//64),
                p -> ascii(substr(text, CAST(p+1 AS INTEGER), 1))))) AS sums
            FROM d),
      sig AS (SELECT doc_id, CAST(len AS BIGINT) AS n_bytes,
        CAST(list_sum(list_transform(range(63), i ->
          CASE WHEN sums[CAST(i+1 AS INTEGER)] * (((i+2)*len)//64 - ((i+1)*len)//64)
                  > sums[CAST(i+2 AS INTEGER)] * (((i+1)*len)//64 - (i*len)//64)
               THEN 1::BIGINT << CAST(i AS INTEGER) ELSE 0::BIGINT END))
          AS BIGINT) AS sig
      FROM c)"""

  /** Per-payload perceptual-hash signature over the corpus; the
    * oracle recomputes the identical integer cross-multiplied
    * gradient bits from character codes. */
  private val phashSig = Q(
    "q139_mm_phash_sig",
    (s, d) => {
      graft.GraftExtensions.ensureRegistered(s)
      sigFrom(payloads(s, d))
    },
    Some(s"""WITH ${sigSqlOver("documents")}
      SELECT doc_id, n_bytes, sig FROM sig"""))

  /** Perceptual-hash near-dup over payload BYTES — the multimodal
    * twin of q42/q43: [[phashPairs]]' 7×9-bit banded equi-join,
    * hamming ≤ 6 verify over SAME-LENGTH payloads (the operator's
    * semantics — see [[sigBands]]). Pigeonhole makes banding exact
    * at this threshold, so the ORACLE IS THE ALL-PAIRS
    * SAME-LENGTH HAMMING SCAN — the recall contract itself, not a
    * re-statement of the banding
    * (fine for DuckDB at gate SF; the Spark side never plans a pair
    * scan — PlanShapeSpec's tripwire covers it like every dedup
    * query).
    *
    * Runs over a PLANTED view: the corpus's near-dups are word-level
    * edits whose byte insertions re-bin every downstream grid cell
    * (measured min hamming 13 — correctly invisible to a
    * position-sensitive gradient hash), so the raw corpus would gate
    * 0 = 0, proving nothing. Every doc_id ≡ 0 (mod 50) gains a
    * byte-twin (id → −(id+1), the negative mirror — collision-free
    * against any ×N replica's +k·10⁹ id shift; 3 bytes overwritten
    * in place — SAME length, the post-exact-dedup payload-edit case
    * this detector exists for); the gate then proves the banded pipeline finds
    * every planted twin AND nothing else, against exact all-pairs.
    * Codec-independent: this is the near-dup detector that works on
    * payloads the engine cannot decode. */
  /** The planted byte-twin payload view shared by q140 and q142:
    * corpus payloads plus a 3-byte in-place-edited twin (negative
    * mirror id) for every doc_id ≡ 0 (mod 50). */
  private def plantedPayloads(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = T.documents(s, d).select($"doc_id", $"text")
    val twins = docs
      .filter(pmod($"doc_id", lit(50)) === 0 && length($"text") >= 64)
      .select((-$"doc_id" - 1).as("doc_id"),
        concat(substring($"text", 1, 9), lit("zzz"),
          expr("substring(text, 13)")).as("text"))
    docs.unionByName(twins)
      .select($"doc_id", $"text".cast("binary").as("payload"))
  }

  private val plantedSql: String = """planted AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT -doc_id - 1, substr(text, 1, 9) || 'zzz' || substr(text, 13)
        FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 64)"""

  private val phashNearDup = Q(
    "q140_mm_phash_neardup",
    (s, d) => {
      graft.GraftExtensions.ensureRegistered(s)
      phashPairs(sigFrom(plantedPayloads(s, d)))
    },
    Some(s"""WITH $plantedSql,
      ${sigSqlOver("planted")}
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND a.n_bytes = b.n_bytes
      WHERE bit_count(xor(a.sig, b.sig)) <= 6"""),
    bench = true)

  /** Incremental multimodal near-dedup RULE, oracle-gated — the
    * [[graft.operators.DedupStore.ingestPhash]] suppression decision
    * on the q118 pattern (even docs stand in for the committed
    * store, odd + twin docs for the delta, no disk): a delta payload
    * is suppressed iff some STORE payload, or some SMALLER-id delta
    * payload, sits within hamming ≤ 6 of its byte-grid signature.
    * Spark runs the banded equi-join (7×9-bit, pigeonhole-exact at
    * this radius); the oracle is the all-pairs rule verbatim —
    * equality proves the banded incremental decision loses nothing.
    * Over the q140 planted view so the gate is non-vacuous: every
    * twin (delta, negative id) has its store original within radius.
    * Output: every sig-bearing delta doc with its verdict. */
  private val phashIncremental = Q(
    "q142_mm_phash_incremental",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sigs = sigFrom(plantedPayloads(s, d))
      val isDelta = $"doc_id" < 0 || pmod($"doc_id", lit(2)) === 1
      val delta = sigs.filter(isDelta)
      val bandsAll = sigBands(sigs).withColumn("__store", !isDelta)
      val suppressed = sigBands(delta).as("a").join(bandsAll.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
            && col("a.doc_id") =!= col("b.doc_id")
            && (col("b.__store") || col("b.doc_id") < col("a.doc_id")))
        .filter(expr("bit_count(a.sig ^ b.sig)") <= PhashMaxHamming)
        .select(col("a.doc_id")).distinct()
        .withColumn("__sup", lit(true))
      delta.join(suppressed, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"__sup", lit(false)).as("is_suppressed"))
    },
    Some(s"""WITH $plantedSql,
      ${sigSqlOver("planted")},
      del AS (SELECT doc_id, n_bytes, sig FROM sig
              WHERE doc_id < 0 OR doc_id % 2 = 1),
      sup AS (SELECT DISTINCT a.doc_id
              FROM del a JOIN sig b ON a.doc_id <> b.doc_id
                AND a.n_bytes = b.n_bytes
                AND (NOT (b.doc_id < 0 OR b.doc_id % 2 = 1)
                     OR b.doc_id < a.doc_id)
                AND bit_count(xor(a.sig, b.sig)) <= 6)
      SELECT del.doc_id, sup.doc_id IS NOT NULL AS is_suppressed
      FROM del LEFT JOIN sup ON del.doc_id = sup.doc_id"""),
    bench = true)

  /** Modality mix report: per [[modality]], doc and payload-byte
    * mass plus each modality's share of total corpus bytes — the
    * one-look answer to "what is this corpus made of" that a
    * multimodal training mix is planned from. One map-side-combined
    * aggregate to ≤3 rows; the share window runs over the aggregate
    * (the q31-style post-aggregate global window). */
  private val modalityMix = Q(
    "q141_mm_modality_mix",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      payloads(s, d)
        .select(modality($"doc_id").as("modality"),
          length($"payload").cast("long").as("pb"))
        .groupBy($"modality")
        .agg(count(lit(1)).as("n_docs"),
          sum($"pb").as("total_payload_bytes"),
          avg($"pb").as("mean_payload_bytes"))
        .withColumn("frac_bytes", $"total_payload_bytes".cast("double") /
          sum($"total_payload_bytes").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    },
    Some(s"""WITH p AS (SELECT ${modalitySqlCase("doc_id")} AS modality,
        CAST(strlen(text) AS BIGINT) AS pb FROM documents),
      g AS (SELECT modality, count(*) AS n_docs,
              CAST(sum(pb) AS BIGINT) AS total_payload_bytes,
              CAST(sum(pb) AS DOUBLE) / count(*) AS mean_payload_bytes
            FROM p GROUP BY modality)
      SELECT modality, n_docs, total_payload_bytes, mean_payload_bytes,
        CAST(total_payload_bytes AS DOUBLE) /
          sum(total_payload_bytes) OVER () AS frac_bytes
      FROM g"""))

  def qs: Seq[Q] = Seq(byteFeatures, frameSample, phashSig, phashNearDup,
    modalityMix, phashIncremental)
}
