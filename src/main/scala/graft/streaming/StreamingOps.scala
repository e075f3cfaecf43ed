package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9 — the reference is
  * batch-only; its schemas carry event-time millis, so the streaming
  * extension runs the same operators over unbounded input):
  *
  *  - watermarked tumbling/sliding window aggregation
  *  - session windows
  *  - the A1 DeviceProfile merge monoid as keyed streaming state
  *    (`flatMapGroupsWithState`) — the merge is associative/
  *    commutative (`utils/DeviceProfileUtils.java:186-240`), which is
  *    exactly what makes it streaming-aggregable.
  *
  * Scale notes: state is per-key and bounded (per-type counts are
  * capped maps; see MaxTypes); event-time timeout evicts idle keys so
  * state doesn't grow unboundedly at 100 TB/day (SURVEY §7.4 risk 7).
  */
object StreamingOps {

  /** Tumbling (or sliding, if `slide` given) windowed counts+sums with
    * a watermark: late rows beyond the watermark are dropped, state is
    * evicted once the watermark passes the window end. */
  def windowedAgg(events: DataFrame, window: String = "10 minutes",
      watermark: String = "30 minutes", slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => org.apache.spark.sql.functions.window(col("ts"), window, s)
      case None    => org.apache.spark.sql.functions.window(col("ts"), window)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Session windows (30-minute inactivity gap) per user — the
    * streaming twin of the batch gaps-and-islands q30. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on an id column: watermark-bounded
    * `dropDuplicates` — state holds one entry per id inside the
    * watermark horizon and is evicted past it (the streaming twin of
    * q40's hash-groupBy dedup; duplicate `event_id` = the corrupt
    * input the reference's schema docs call out, `event.proto:9-36`). */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCol)

  /** Windowed streaming heavy hitters — the ingest-time half of
    * q105's Misra–Gries sketch-route-verify ([[graft.operators
    * .HeavyHitters]]): per tumbling window, the same mergeable
    * summary runs as the streaming aggregate (partials merge into the
    * state store exactly as they merge across a batch shuffle), and
    * the window emits its ≤k survivors on watermark close as
    * `(win_start, win_end, tok, min_cnt)`.
    *
    * Contract — CANDIDATES, not exact counts: `min_cnt` is the MG
    * lower-bound count (never an overestimate), and every token with
    * in-window count > N_window/(k+1) is guaranteed present. The
    * exact-recount phase needs a second pass over data a stream has
    * already released, so it stays batch: run q105's phase 2 over the
    * persisted window slice when true counts matter. State per
    * window is one ≤k-entry map — bounded regardless of how many
    * distinct tokens the window saw. */
  def heavyHittersStream(docs: DataFrame, textCol: String = "text",
      window: String = "10 minutes", watermark: String = "30 minutes",
      k: Int = 100): DataFrame = {
    val sketch = udaf(new graft.operators.HeavyHitters.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"))
      .agg(sketch(col("tok")).as("summary"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        explode(col("summary")).as(Seq("tok", "min_cnt")))
  }

  /** Streaming dataset card — q114's ingest-time twin: per tumbling
    * window and (source, lang) slice, the doc/token/byte counters a
    * live ingest dashboard tracks. What it deliberately does NOT
    * carry over from batch q114: corpus-wide exact-dup attribution —
    * that requires unbounded per-digest state; the streaming
    * substitute is IN-WINDOW duplicate counting (`approx_count_
    * distinct` of the digest vs the row count), which bounds state to
    * one HLL per open (window, slice) group and is evicted by the
    * watermark. The full-history number stays batch q114's job.
    * State: one row of five counters per open (window, source, lang)
    * — slices are bounded vocabularies, so state is O(windows ×
    * slices), never O(docs). */
  def datasetCardStream(docs: DataFrame, textCol: String = "text",
      window: String = "10 minutes", watermark: String = "30 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("total_tokens"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        // floor at 0: the HLL (rsd ~5%) can OVERestimate distincts on a
        // large dup-free window, and a negative dup counter on a
        // dashboard reads as data corruption rather than sketch noise
        greatest(lit(0L),
          count(lit(1)) - approx_count_distinct(md5(col(textCol))))
          .as("approx_dup_excess"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("source"), col("lang"), col("n_docs"), col("total_tokens"),
        col("total_chars"), col("approx_dup_excess"))

  /** Streaming NEAR-dup suppression — the ingest-time twin of the
    * batch dedup family: key = native `simhash60` over the doc's
    * 3-word shingles, so near-identical docs (identical shingle
    * vote outcome; hamming-0 twins) collapse to one retained doc
    * inside the watermark horizon. Docs too short to shingle fall
    * back to an exact-text key (a separate key kind — the two key
    * spaces never collide). Deliberate streaming trade vs q43's
    * banded pair search: that needs a self-join (unbounded streaming
    * state); this keeps state at one 60-bit key per retained doc,
    * evicted by the watermark — recall limited to fingerprint-equal
    * twins, which is what ingest-time suppression is for (the full
    * banded sweep runs in batch behind it). */
  def nearDedupStream(docs: DataFrame, textCol: String = "text",
      watermark: String = "30 minutes"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs
      .withColumn("__kind",
        when(size(split(trim(col(textCol)), "\\s+")) >= 3, lit("sh"))
          .otherwise(lit("tx")))
      .withColumn("__key",
        when(col("__kind") === "sh",
          expr(s"simhash60(word_shingles($textCol, 3))"))
          .otherwise(xxhash64(col(textCol))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__kind", "__key")
      .drop("__kind", "__key")
  }

  final case class BandProbe(docId: Long, kind: String, band: Int, bv: Long,
      fp: Long, ts: java.sql.Timestamp)
  final case class BandVerdict(docId: Long, suppressed: Boolean, ts: java.sql.Timestamp)
  final case class BucketOwners(fps: List[Long])

  /** One bucket's fold step, pure for spec-ability: run `probes`
    * (pre-sorted by the caller) against the owner ring, newest owner
    * first. A probe within its hamming threshold of ANY ring owner is
    * suppressed; otherwise it claims a ring slot (oldest evicted past
    * `cap`). Returns (updated ring, verdicts in probe order). */
  private[graft] def foldBucket(owners0: List[Long], probes: Seq[BandProbe],
      cap: Int): (List[Long], Vector[BandVerdict]) = {
    var owners = owners0
    val out = probes.iterator.map { p =>
      val thresh = if (p.kind == "tx") 0 else 10
      if (owners.exists(o => java.lang.Long.bitCount(p.fp ^ o) <= thresh))
        BandVerdict(p.docId, suppressed = true, p.ts)
      else {
        owners = (p.fp :: owners).take(cap)
        BandVerdict(p.docId, suppressed = false, p.ts)
      }
    }.toVector
    (owners, out)
  }

  /** Spark's own interval parser, so every string `withWatermark`
    * accepts ("30 minutes", "10 sec", "1 hour 30 minutes", …) works
    * here identically — a hand-rolled unit match rejected legal
    * abbreviations like "min". */
  private def durationMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"calendar months are ambiguous in a watermark: $s")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** BANDED streaming near-dup suppression — the q43-grade-recall
    * upgrade of [[nearDedupStream]]: each doc emits its 11 SimHash
    * band keys (5×6-bit + 6×5-bit over the 60-bit fingerprint); a
    * keyed state per (band, value) bucket remembers a small FIFO RING
    * of the bucket's claimant fingerprints (up to `ownersPerBucket`,
    * default 4) inside the watermark horizon, and an arriving doc is
    * suppressed when ANY band bucket holds an owner within
    * hamming ≤ 10 of it (exact verify against the stored fingerprints
    * — a chance bucket collision past the hamming bound does NOT
    * suppress; instead the colliding doc claims a ring slot of its
    * own, evicting the OLDEST owner if the ring is full). By the q43
    * pigeonhole bound, a near-twin (hamming ≤ 10) of any ring owner
    * always lands in at least one of that owner's buckets, so
    * ring-owner twins are never missed while the owner holds its
    * slot. The round-4 one-owner-per-bucket cap let a doc B that
    * chance-collided (beyond threshold) with owner A pass WITHOUT
    * being recorded — a later twin of B whose only shared band was
    * that bucket slipped through; the ring closes that hole up to
    * ring depth (a doc suppressed in one band still claims its OTHER
    * band buckets — transitive suppression, same spirit as q72's
    * clustering). Docs too short to shingle fall back to an
    * exact-text bucket (band = −1, threshold hamming 0).
    *
    * CHECKPOINT COMPATIBILITY: the ring changed the state encoding
    * from the round-4 single `fp: Long` to `fps: List[Long]` — a
    * checkpoint written by the old code fails Spark's state-schema
    * check on restart. Restart such a query with a fresh checkpoint
    * dir (suppression state inside the watermark horizon rebuilds
    * from the stream; duplicates arriving during that warm-up window
    * can pass once). Spark surfaces the mismatch as a generic
    * state-schema error buried in a `StreamingQueryException` cause
    * chain; wrap `start()`/`awaitTermination()`/`processAllAvailable()`
    * in [[withCheckpointMigrationHint]] to get this migration note
    * rethrown with the actionable fix attached.
    *
    * State stays bounded for 100 TB/day ingest: at most
    * `ownersPerBucket` 8-byte fingerprints per non-empty band bucket
    * (32 bytes at the default), event-time-timed-out once the
    * watermark passes. The per-doc verdict (suppress iff any of its
    * 11 band probes matched) folds back in a watermark-bounded
    * tumbling-window aggregation — all 11 probes carry the doc's own
    * event time, so they land in one window deterministically; the
    * kept stream emits when the watermark passes that window.
    *
    * Spark's blanket chained-stateful-operator check
    * (`statefulOperator.checkCorrectness`) flags ANY
    * flatMapGroupsWithState feeding a stateful agg, because a generic
    * fMGWS may emit rows arbitrarily older than the watermark. This
    * one cannot: every verdict carries its input row's own event time
    * and is emitted in the same micro-batch the input arrives, so the
    * downstream agg sees exactly the lateness profile of a windowed
    * agg applied directly to the input — a doc later than the
    * watermark allowance is dropped on input, same as anywhere else.
    * The function therefore disables the check on the session (a
    * session-wide conf — Spark offers no per-query scope, and the
    * checker runs at query START, so the setting cannot be restored
    * after plan construction either). CALLER NOTE: if other streaming
    * queries in the same session rely on that checker, re-enable
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled`
    * after `.start()`ing this one.
    *
    * Returns (idCol, ts) of retained docs. */
  /** The chained-stateful-operator checker disable both banded
    * detectors need — safe for THESE chains (every verdict inherits
    * its input row's event time and batch, so the downstream agg sees
    * a plain windowed-agg lateness profile), loudly recorded because
    * the conf is session-wide and Spark offers no per-query scope. */
  private def disableChainedStatefulCheck(s: SparkSession, what: String): Unit = {
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prior = s.conf.getOption(checkKey)
    if (!prior.contains("false")) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$what: disabling $checkKey SESSION-WIDE " +
        s"(was ${prior.getOrElse("unset/true")}) — this chain is safe " +
        "(verdicts inherit input event time), but other streaming " +
        "queries in this session lose the check; re-enable it after " +
        ".start()ing this query if they rely on it")
    }
    s.conf.set(checkKey, "false")
  }

  def nearDedupStreamBanded(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", watermark: String = "30 minutes",
      verdictWindow: String = "1 minute", ownersPerBucket: Int = 4): DataFrame = {
    require(ownersPerBucket >= 1, "ownersPerBucket must be >= 1")
    val s = docs.sparkSession
    graft.GraftExtensions.ensureRegistered(s)
    import s.implicits._
    disableChainedStatefulCheck(s, "nearDedupStreamBanded")
    val wmMs = durationMs(watermark)
    // identity/time contract (round 13): a row with a NULL id or NULL
    // event time is DROPPED here — it has no identity to retain (the
    // output is (id, ts)) and no event time to watermark, and left in
    // it would reach the typed probe encoder whose non-nullable
    // docId: Long throws at encode time, wedging the stream on
    // permanent replay. Upstream must assign both; such rows are a
    // data bug to surface there, not a dedup verdict to invent here.
    val base = docs
      .filter(col(idCol).isNotNull && col("ts").isNotNull)
      .withColumn("__kind",
        when(size(split(trim(col(textCol)), "\\s+")) >= 3, lit("sh"))
          .otherwise(lit("tx")))
      .withColumn("__fp",
        when(col("__kind") === "sh",
          expr(s"simhash60(word_shingles($textCol, 3))"))
          .otherwise(xxhash64(col(textCol))))
      .select(col(idCol).cast("long").as("docId"), col("__kind").as("kind"),
        col("__fp").as("fp"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
    val probes = base.flatMap { case (id, kind, fp, ts) =>
      if (kind == "tx") Iterator.single(BandProbe(id, kind, -1, fp, fp, ts))
      else graft.functions.SimHashBands.bands(fp).iterator.zipWithIndex
        .map { case (bv, b) => BandProbe(id, kind, b, bv, fp, ts) }
    }
    val verdicts = probes.toDF()
      .withWatermark("ts", watermark)
      .as[BandProbe]
      .groupByKey(p => (p.kind, p.band, p.bv))
      .flatMapGroupsWithState[BucketOwners, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: earliest (ts, docId) claims
            val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.docId))
            val (owners, out) = foldBucket(
              state.getOption.map(_.fps).getOrElse(Nil), sorted, ownersPerBucket)
            if (owners.nonEmpty) state.update(BucketOwners(owners))
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + wmMs)
            out.iterator
          }
      }
    verdicts.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), verdictWindow), col("docId"))
      .agg(max(when(col("suppressed"), 1).otherwise(0)).as("sup"),
        max(col("ts")).as("doc_ts"))
      .filter(col("sup") === 0)
      .select(col("docId").as(idCol), col("doc_ts").as("ts"))
  }

  final case class CosProbe(docId: Long, t: Int, bucket: Long,
      vec: Seq[Float], ts: java.sql.Timestamp)
  final case class CosVerdict(docId: Long, suppressed: Boolean,
      ts: java.sql.Timestamp)
  final case class CosBucketOwners(vecs: List[Seq[Float]])

  /** One cosine bucket's fold step, pure for spec-ability — the
    * [[foldBucket]] shape with exact-cosine verification: probe
    * vectors arrive L2-NORMALIZED, so the verify is one dot product
    * against each ring owner (≥ `minCos` ⇒ suppressed); a
    * chance-bucket collision below the threshold claims a ring slot
    * of its own (oldest evicted past `cap`). Length-mismatched owners
    * never match (a dimension drift can't NaN the fold). */
  private[graft] def foldCosBucket(owners0: List[Seq[Float]],
      probes: Seq[CosProbe], cap: Int,
      minCos: Double): (List[Seq[Float]], Vector[CosVerdict]) = {
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    var owners = owners0
    val out = probes.iterator.map { p =>
      if (owners.exists(o => o.length == p.vec.length && dot(o, p.vec) >= minCos))
        CosVerdict(p.docId, suppressed = true, p.ts)
      else {
        owners = (p.vec :: owners).take(cap)
        CosVerdict(p.docId, suppressed = false, p.ts)
      }
    }.toVector
    (owners, out)
  }

  /** STREAMING SEMANTIC near-dedup — [[nearDedupStreamBanded]]'s
    * embedding twin, and the watermark-bounded form of
    * [[graft.operators.DedupStore.ingestCosine]]'s suppression rule
    * (q144's discipline): a vector within cosine ≥ `minCos` of an
    * earlier-arrived vector inside the watermark horizon is
    * suppressed, the SemDeDup cut the byte/shingle streams cannot
    * make. Candidates come from the SAME conf-driven SRP banding as
    * the batch family (`graft.cos.tables` × `graft.cos.bits`-bit
    * buckets, 'cos' salt — stream and store agree on geometry, so a
    * conf sized by the batch miss-budget math serves both); each
    * (table, bucket) keyed state holds a FIFO ring of up to
    * `ownersPerBucket` L2-normalized claimant vectors, and the verify
    * is EXACT cosine against the ring ([[foldCosBucket]]) — a chance
    * bucket collision never suppresses. Verdicts fold back per doc
    * through the same watermark-bounded tumbling window as the banded
    * detector (any bucket says suppress ⇒ suppressed; the safe
    * chained-stateful shape documented there).
    *
    * Recall envelope is q144's, NOT the phash family's pigeonhole
    * bound: SRP collision is probabilistic per pair (miss-all-tables
    * ≈ (1 − pᵇⁱᵗˢ)ᵗᵃᵇˡᵉˢ, executable via the batch family's
    * cosExpectedMisses) — size the conf pair for the corpus, exactly
    * as the store ingest documents. Additionally FIFO-bounded like
    * every ring detector: a twin of an EVICTED owner passes
    * (ownersPerBucket is the depth/memory trade).
    *
    * Rows with a NULL vector, a null ELEMENT, a zero norm, or a
    * non-finite norm cannot be banded or verified (the ingestCosine
    * NaN-poisoning rule) — they PASS THROUGH unsuppressed and claim
    * nothing, the engine's sig-less pass-through discipline at every
    * decode/sig seam. Rows with a NULL id or NULL event time are
    * DROPPED instead (both detectors, round 13): they have no
    * identity to retain and no time to watermark — non-null id/ts is
    * the input contract.
    *
    * CHECKPOINT COMPATIBILITY: the conf pair is baked into the
    * checkpointed STATE KEYS (`(table, bucket)`), so a
    * `graft.cos.tables`/`graft.cos.bits` flip across a checkpoint
    * restart silently strands every pre-restart ring owner (new
    * probes hash into a different key space; old owners linger until
    * timeout, matching nothing) — unlike the batch store, which
    * re-bands stored embeddings each ingest and absorbs conf flips
    * archive-wide. Pin the conf for a checkpoint's lifetime; to
    * resize, restart with a FRESH checkpoint dir (suppression state
    * inside the watermark horizon rebuilds from the stream, same
    * warm-up caveat as the banded detector's ring migration).
    *
    * State stays bounded for continuous ingest: at most
    * `ownersPerBucket` normalized float vectors (dim · 4 bytes each)
    * per non-empty (table, bucket), event-time-timed-out once the
    * watermark passes. Returns (idCol, ts) of retained rows. */
  def cosDedupStreamBanded(docs: DataFrame, embCol: String = "embedding",
      idCol: String = "vec_id", watermark: String = "30 minutes",
      verdictWindow: String = "1 minute", ownersPerBucket: Int = 4,
      minCos: Double = 0.9): DataFrame = {
    require(ownersPerBucket >= 1, "ownersPerBucket must be >= 1")
    require(minCos > 0.0 && minCos <= 1.0, s"minCos must be in (0, 1], got $minCos")
    val s = docs.sparkSession
    graft.GraftExtensions.ensureRegistered(s)
    import s.implicits._
    disableChainedStatefulCheck(s, "cosDedupStreamBanded")
    val wmMs = durationMs(watermark)
    val tables = graft.queries.DedupQueries.cosTables(s)
    val bits = graft.queries.DedupQueries.cosBits(s)
    // identity/time contract (round 13) — the nearDedupStreamBanded
    // rule: NULL id / NULL ts rows are dropped BEFORE the __ok split,
    // because BOTH downstream branches need them (the probe branch's
    // typed CosProbe encoder throws on a null docId — permanent
    // replay wedge — and the pass-through branch would emit a
    // null-id "retained" row no consumer can key on)
    val base = docs
      .filter(col(idCol).isNotNull && col("ts").isNotNull)
      .withColumn("__nrm", graft.functions.Vectors.norm(col(embCol)))
      // null-ELEMENT guard alongside the null/zero/non-finite-norm
      // rules: the native dot reads null slots as 0.0, so a ragged
      // [3, null, 4] row would norm fine and then kill the typed
      // encoder (vec is Seq[Float], non-nullable elements) — wedging
      // the stream on permanent replay. Such rows take the documented
      // sig-less pass-through instead.
      .withColumn("__ok", col(embCol).isNotNull &&
        !exists(col(embCol), x => x.isNull) && col("__nrm") > 0 &&
        !isnan(col("__nrm")) && col("__nrm") < lit(Double.PositiveInfinity))
    val probes = base.filter(col("__ok"))
      .select(col(idCol).cast("long").as("docId"),
        posexplode(expr(s"srp_sig($embCol, 'cos', $tables, $bits)"))
          .as(Seq("t", "bucket")),
        expr(s"transform($embCol, x -> CAST(CAST(x AS DOUBLE) / __nrm AS FLOAT))")
          .as("vec"),
        col("ts"))
      .select($"docId", $"t", $"bucket", $"vec", $"ts")
      .withWatermark("ts", watermark)
      .as[CosProbe]
    val verdicts = probes
      .groupByKey(p => (p.t, p.bucket))
      .flatMapGroupsWithState[CosBucketOwners, CosVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.docId))
            val (owners, out) = foldCosBucket(
              state.getOption.map(_.vecs).getOrElse(Nil), sorted,
              ownersPerBucket, minCos)
            if (owners.nonEmpty) state.update(CosBucketOwners(owners))
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + wmMs)
            out.iterator
          }
      }
    // sig-less rows bypass the stateful chain with a standing verdict
    val passThrough = base.filter(!col("__ok"))
      .select(col(idCol).cast("long").as("docId"),
        lit(false).as("suppressed"), col("ts"))
    verdicts.toDF().unionByName(passThrough)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), verdictWindow), col("docId"))
      .agg(max(when(col("suppressed"), 1).otherwise(0)).as("sup"),
        max(col("ts")).as("doc_ts"))
      .filter(col("sup") === 0)
      .select(col("docId").as(idCol), col("doc_ts").as("ts"))
  }

  /** The actionable fix for a round-4 checkpoint restarted under the
    * round-5 ring encoding — see the CHECKPOINT COMPATIBILITY note on
    * [[nearDedupStreamBanded]]. */
  val CheckpointMigrationMessage: String =
    "state-schema mismatch restarting a banded near-dup query: this " +
    "checkpoint was written by the pre-ring encoding (per-bucket " +
    "`fp: Long`); the multi-owner ring stores `fps: List[Long]` and " +
    "Spark cannot migrate flatMapGroupsWithState state in place. " +
    "Restart the query with a FRESH checkpoint directory — " +
    "suppression state inside the watermark horizon rebuilds from " +
    "the stream; duplicates arriving during that warm-up window can " +
    "pass once."

  /** True when `t`'s cause chain contains Spark's state-schema
    * incompatibility failure (error conditions
    * `STATE_STORE_{KEY,VALUE}_SCHEMA_NOT_COMPATIBLE` — Spark buries
    * them under a `StreamingQueryException`). */
  private[graft] def isStateSchemaMismatch(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).exists {
      case st: org.apache.spark.SparkThrowable =>
        Option(st.getCondition)
          .exists(c => c.startsWith("STATE_STORE_") && c.contains("SCHEMA"))
      case e =>
        Option(e.getMessage).exists(_.contains("StateSchemaNotCompatible"))
    }

  /** Runs `body` (typically `start()` + `awaitTermination()` /
    * `processAllAvailable()` on a banded near-dup query) and rethrows
    * Spark's state-schema-incompatibility failure with
    * [[CheckpointMigrationMessage]] attached — the raw Spark error
    * names the schemas but not the migration, and the operator knows
    * the checkpoint history its caller doesn't. Any other failure
    * passes through untouched. */
  def withCheckpointMigrationHint[T](body: => T): T =
    try body catch {
      case t: Throwable if isStateSchemaMismatch(t) =>
        throw new IllegalStateException(CheckpointMigrationMessage, t)
    }

  /** Stream-static enrichment join: the streaming twin of the
    * reference's broadcast side inputs (J3, `Features.java:90-103`) —
    * each micro-batch joins against the (small, broadcast) static
    * dimension; no stream-side state is kept. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys)

  /** Watermarked stream-stream interval join: rows of `right` landing
    * within `[0, maxDelayMin]` minutes after a matching `left` row
    * (e.g. click → purchase attribution over `events`). Both sides
    * buffer watermark-bounded state; the time-range predicate lets
    * Spark evict each side once the other's watermark passes —
    * without it, stream-stream state grows forever (the 100 TB
    * landmine). Columns: left must carry `lts`, right `rts`. */
  def correlate(left: DataFrame, right: DataFrame, key: String,
      maxDelayMin: Int = 10, watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("lts", watermark)
    val r = right.withWatermark("rts", watermark)
    l.join(r, expr(
      s"""l_$key = r_$key AND
          rts >= lts AND rts <= lts + INTERVAL $maxDelayMin MINUTES"""))
  }

  // ---- stateful running profiles (A1 as streaming state) ----

  final case class Ev(userId: Long, eventType: String, tsMicros: Long, value: Double)
  final case class TypeStat(cnt: Long, firstAt: Long, lastAt: Long)
  final case class ProfileState(firstAt: Long, lastAt: Long,
      perType: Map[String, TypeStat], totalValue: Double)
  final case class UserProfile(userId: Long, firstAt: Long, lastAt: Long,
      nTypes: Int, totalEvents: Long, totalValue: Double)

  /** Cap on per-key map growth — the unbounded-geo-set risk of the
    * reference's profile (SURVEY §7.4): beyond this many distinct
    * types, new types are folded into an overflow bucket. */
  val MaxTypes = 64
  private val Overflow = "\u0000overflow"

  /** The A1 merge step: fold one event into the running profile —
    * min/max timestamps + per-type (count, first, last). Associative
    * and commutative in event batches, mirroring `mergeDps`. */
  def mergeEvent(st: ProfileState, e: Ev): ProfileState = {
    val key =
      if (st.perType.contains(e.eventType) || st.perType.size < MaxTypes) e.eventType
      else Overflow
    val cur = st.perType.getOrElse(key, TypeStat(0L, Long.MaxValue, Long.MinValue))
    ProfileState(
      math.min(st.firstAt, e.tsMicros), math.max(st.lastAt, e.tsMicros),
      st.perType.updated(key, TypeStat(cur.cnt + 1,
        math.min(cur.firstAt, e.tsMicros), math.max(cur.lastAt, e.tsMicros))),
      st.totalValue + e.value)
  }

  val emptyState: ProfileState =
    ProfileState(Long.MaxValue, Long.MinValue, Map.empty, 0.0)

  /** Running per-user profiles via flatMapGroupsWithState (update
    * mode): emits the refreshed profile on every batch that touches
    * the key; idle keys evicted after `ttl` of event time. */
  def runningProfiles(events: Dataset[Ev], ttlMs: Long = 3600000L): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "30 minutes")
      .as[(Long, String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ProfileState, UserProfile](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, String, Long, Double, java.sql.Timestamp)],
         state: GroupState[ProfileState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = rows.foldLeft(state.getOption.getOrElse(emptyState)) { (s, r) =>
              mergeEvent(s, Ev(r._1, r._2, r._3, r._4))
            }
            state.update(st)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
            Iterator.single(UserProfile(userId, st.firstAt, st.lastAt,
              st.perType.size, st.perType.valuesIterator.map(_.cnt).sum, st.totalValue))
          }
      }
  }

  // ---- streaming funnel (q86's ordered steps as running state) ----

  final case class StepEv(userId: Long, eventType: String, tsMicros: Long)
  /** Step timestamps; -1 = unreached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelRow(userId: Long, depth: Int, t1: Long, t2: Long, t3: Long)

  /** Fold a batch of events into the funnel state. Events are applied
    * in event-time order; a step is accepted only strictly after the
    * previous step's time (q86's ordering rule), and an earlier
    * arrival may improve a step's time only while the NEXT step is
    * unreached — once a later step accepted, its predecessor is
    * frozen (otherwise the accepted chain could become unordered).
    * With all of a user's events in one batch this equals the batch
    * funnel exactly (spec'd); across batches it is the streaming
    * approximation every funnel-on-stream makes: late arrivals inside
    * the watermark refine what's still refinable. */
  def funnelFold(st: FunnelState, evs: Seq[(String, Long)]): FunnelState =
    evs.sortBy(_._2).foldLeft(st) { case (s, (tp, ts)) =>
      tp match {
        case "view" if s.t2 < 0 && (s.t1 < 0 || ts < s.t1) => s.copy(t1 = ts)
        case "click" if s.t1 >= 0 && ts > s.t1 && s.t3 < 0 && (s.t2 < 0 || ts < s.t2) =>
          s.copy(t2 = ts)
        case "purchase" if s.t2 >= 0 && ts > s.t2 && (s.t3 < 0 || ts < s.t3) =>
          s.copy(t3 = ts)
        case _ => s
      }
    }

  /** Running view→click→purchase funnel depth per user (update mode);
    * idle users evicted after `ttl` of event time. */
  def funnelStream(events: Dataset[StepEv], ttlMs: Long = 3600000L): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "30 minutes")
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = funnelFold(
              state.getOption.getOrElse(FunnelState(-1L, -1L, -1L)),
              rows.map(r => (r._2, r._3)).toSeq)
            state.update(st)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
            val depth = Seq(st.t1, st.t2, st.t3).count(_ >= 0)
            Iterator.single(FunnelRow(userId, depth, st.t1, st.t2, st.t3))
          }
      }
  }
}
