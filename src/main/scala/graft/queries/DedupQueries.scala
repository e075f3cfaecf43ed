package graft.queries

import graft.{Q, Tables => T}
import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface over the `documents` / `embeddings` tables —
  * the training-data-pipeline extension (no analogue in the reference,
  * whose only dup handling is the duplicate-ID *assertion*,
  * `transforms/AppProfiles.java:50-56`; here dups are first-class data).
  *
  * Five detectors, cheap→rich:
  *   exact (hash groupBy) → MinHash+LSH (bucketed candidates) →
  *   SimHash (hamming pairs) → n-gram Jaccard (inverted index) →
  *   embedding cosine.
  *
  * Scale design (100 TB): every candidate generator is an equi-join on
  * a derived key (text-hash / MinHash band / SimHash band / shingle /
  * SRP bucket), never an O(n²) cross product — the shuffle is bounded
  * by (key → docs-per-key). No registered plan contains a
  * CartesianProduct or BroadcastNestedLoopJoin (PlanShapeSpec
  * asserts this). All hashing is md5-based so the DuckDB oracle
  * reproduces results bit-for-bit (engine-native hash() functions
  * differ across engines).
  */
object DedupQueries {

  /** words → distinct 3-word shingle set, as one row-local column. */
  private def shingleCol(ws: Column): Column =
    array_distinct(transform(
      sequence(lit(1), size(ws) - 2),
      i => concat_ws(" ", slice(ws, i, lit(3)))))

  private def withShingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.ensureRegistered(s)
    // native word_shingles ≡ shingleCol (ExpressionSpec pins equality);
    // HOF lambdas interpret per shingle, the native loop JITs
    T.documents(s, d)
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("word_shingles(text, 3)").as("sset"))
  }

  private val shingleCte =
    """WITH words AS (SELECT doc_id, string_split_regex(trim(text),'\s+') ws FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
                    i -> array_to_string(ws[i:i+2],' '))) sset
             FROM words WHERE len(ws) >= 3)"""

  /** Universal-hash constants for MinHash — single source of truth in
    * [[graft.functions.MinHashSigImpl]], shared by the native
    * expression and (interpolated below) the DuckDB oracle. */
  private val MinhashP = graft.functions.MinHashSigImpl.P
  private def minhashADuck = graft.functions.MinHashSigImpl.a.mkString("[", ",", "]")
  private def minhashBDuck = graft.functions.MinHashSigImpl.b.mkString("[", ",", "]")

  /** Exact dedup: hash-groupBy on the full text. One shuffle keyed by
    * the 128-bit digest (never the raw text — at 100 TB the key must
    * be fixed-width); canonical survivor = min doc_id. */
  private val exactDedup = Q(
    "q40_dedup_exact",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("n_copies"))
    },
    Some("""SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc,
      count(*) AS n_copies FROM documents GROUP BY md5(text)"""))

  /** THE shared exact near-dup pair pipeline (q41/q72/q77/q78):
    * PPJoin-style prefix-filtered candidate generation + full
    * intersection-count verify.
    *
    * Shingles get a global rarity order (ascending document
    * frequency, shingle hash as tie-break); each doc joins only its
    * PREFIX — the first |s| − ⌈t·|s|⌉ + 1 shingles in that order —
    * because two sets with J ≥ t MUST share a prefix element under
    * any common total order (prefix-filtering theorem). At 100 TB
    * this bounds the self-join to the rarest slice of each posting
    * list (hot template shingles never join): a shuffle bounded by
    * Σ|prefix|·df instead of the Σdf² of a naive postings self-join,
    * while staying EXACT — which is why q41 and q77 share one oracle.
    * (Round 3 carried the naive join here; round 4 made the prefix
    * path the only candidate generator — PrefixFilterSpec pins both
    * result-parity with the naive formulation and the candidate-count
    * reduction.)
    *
    * Shingles travel as xxhash64 longs, not the raw ~20-byte strings:
    * fixed-width keys shrink every shuffle and make comparisons one
    * word. Results are unchanged absent a 64-bit collision
    * (P ≈ n²/2⁶⁴ per doc pair — negligible; the DuckDB oracle joins
    * raw strings, so exactness vs the oracle is modulo that bound).
    *
    * Two measured cost reductions vs the textbook formulation:
    *  - ONLY df ≥ 2 postings are ranked and joined. A df = 1 shingle
    *    can never match another doc, but under the (df asc, sh asc)
    *    rarity order every df = 1 shingle sorts before every df ≥ 2
    *    shingle — so a df ≥ 2 shingle's global prefix rank is just
    *    (doc's df = 1 count) + (rank among the doc's df ≥ 2
    *    shingles), and the heavy join/window shuffles carry only the
    *    df ≥ 2 slice (on a mostly-unique-shingle corpus, a small
    *    fraction of the postings — the full postings shuffle exactly
    *    once, for the df count itself);
    *  - verification is row-local: candidates join the per-doc
    *    HASHED SHINGLE ARRAY (one row per doc, not one per posting)
    *    and the intersection is `array_intersect` inside codegen —
    *    the shuffle carries |candidates| + 2·|docs| rows instead of
    *    re-exploding the full postings twice. */
  private[graft] def jaccardPairs(s: SparkSession, d: String,
      t: Double = 0.6): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.ensureRegistered(s)
    // fused native shingle+hash: one JIT loop per row (the
    // transform(..., x -> xxhash64(x)) HOF form interprets its lambda
    // per shingle — measured ~5× slower). Deliberately NOT cached:
    // hs is read 3× (postings + both verify sides) but recomputing the
    // native expression beats materializing fat array columns through
    // the in-memory store (re-measured round 5 with the array-based
    // verify: uncached 2.0 s end-to-end at sf0.1 vs 3.1 s with an hs
    // cache — same finding as round 3's postings-cache experiment at
    // this site). Also keep size() OUT of
    // this projection: collapsed projections evaluate the expression
    // once per derived column; sizes are O(1) reads downstream.
    val hs = T.documents(s, d)
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("word_shingle_hashes(text, 3)").as("hset"))
    val ex = hs.select($"doc_id", size($"hset").as("n"), explode($"hset").as("sh"))
    val dfreq2 = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2)
    // ONE ordered window spec for both rank and per-doc count: sharing
    // the (partition, order) pair puts r2 and n2 in a single WindowExec
    // pass over one sort (n2's frame widens to unbounded-unbounded —
    // count is order-insensitive, so the value is unchanged). The
    // round-4 form used an unordered second spec for n2, which planned
    // a second WindowExec; folding them measured 2.56 s → 2.03 s
    // end-to-end at sf0.1 (round-5 variant shootout; the no-window
    // collect_list+sort_array aggregate form and prefix/hs caches all
    // measured slower — 2.6-3.1 s).
    val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
    val ranked = ex.join(dfreq2, "sh") // inner: df >= 2 postings only
      .withColumn("r2", row_number().over(w))
      .withColumn("n2", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("plen", $"n" - ceil(lit(t) * $"n").cast("int") + 1)
    // global rank = (n - n2) df=1 shingles sorting first + r2
    val prefix = ranked
      .withColumn("pos", $"n" - $"n2" + $"r2")
      .filter($"pos" <= $"plen")
      .select($"doc_id", $"sh", $"n", $"pos")
    // PPJoin's two other EXACT pruning predicates ride on the join
    // (necessary conditions of J >= t — the oracle equality stays the
    // correctness proof):
    //  - length filter: |A∩B| <= min(na,nb) and J >= t force
    //    min >= t·max;
    //  - positional filter: a prefix match at positions (pa, pb)
    //    bounds the intersection by 1 + min(na−pa, nb−pb), which must
    //    reach alpha = ceil(t/(1+t)·(na+nb)).
    // Measured at sf0.1: 299k -> 69k candidate pairs (~4.4x) on a
    // corpus whose uniform doc lengths mute the length filter; the
    // positional filter is the one doing the cutting.
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id"
          && least($"a.n", $"b.n") >= lit(t) * greatest($"a.n", $"b.n")
          && lit(1) + least($"a.n" - $"a.pos", $"b.n" - $"b.pos")
            >= ceil(lit(t) / (1 + t) * ($"a.n" + $"b.n")))
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    cand
      .join(hs.select($"doc_id".as("doc_a"), size($"hset").as("na"), $"hset".as("ha")), "doc_a")
      .join(hs.select($"doc_id".as("doc_b"), size($"hset").as("nb"), $"hset".as("hb")), "doc_b")
      .select($"doc_a", $"doc_b", $"na", $"nb",
        size(array_intersect($"ha", $"hb")).as("c"))
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("jaccard"))
      .filter($"jaccard" >= t)
  }

  /** Exact n-gram Jaccard near-dup pairs:
    * |∩|/(|A|+|B|−|∩|) ≥ 0.6 over distinct 3-word shingles, via the
    * shared prefix-filtered pipeline ([[jaccardPairs]] — keyed joins
    * only, no cross product, hot shingles never self-join). The
    * oracle is the straightforward full inverted-index SQL; equality
    * proves the prefix filter drops nothing. */
  private val jaccardDedup = Q(
    "q41_dedup_jaccard",
    (s, d) => jaccardPairs(s, d),
    Some(s"""WITH $pairsCtes
      SELECT da AS doc_a, db AS doc_b, j AS jaccard FROM jpairs"""),
    bench = true)

  /** MinHash + LSH near-dup: k=24 signature via the native
    * [[graft.functions.MinHashSig]] Catalyst expression (universal
    * hash family (a_i·x+b_i) mod 2³¹−1 over a 56-bit md5 base — one
    * digest per shingle; a Kirsch-Mitzenmacher h1+i·h2 variant was
    * tried first and missed j=0.9 pairs: K-M is not min-wise
    * independent). Banded b=8×r=3 (≥99.7% recall at j≥0.8, few false
    * candidates on a shared-vocab corpus — r=2 measured 4× slower
    * from false-candidate verification). Candidates = docs sharing a
    * band bucket (equi-join on the band digest — the 100 TB-scale
    * candidate generator: shuffle is per-bucket, never per-pair),
    * then verified with exact Jaccard ≥ 0.6. Finds all 25 planted
    * near-dups at sf0.01.
    *
    * Buckets wider than [[graft.operators.LshGuard.maxBucket]] are
    * skipped as candidate generators (round 6) — a boilerplate family
    * of k near-identical docs would otherwise emit k²/2 in-bucket
    * pairs, the one way this plan detonates at crawl scale. Recall
    * contract + measured gate-data headroom (widest sf0.1 bucket: 4
    * docs vs the 256 default cap — the oracle never sees a pruned
    * bucket): see [[graft.operators.LshGuard]]. */
  private val minhashLsh = Q(
    "q42_dedup_minhash_lsh",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sh = withShingles(s, d).cache()
      val sig = sh.select($"doc_id", $"sset", expr("minhash_sig(sset)").as("sig"))
      // cache: the self-join below would otherwise recompute the whole
      // signature pipeline (md5 per shingle) once per side
      // banding factored to operators/IncrementalNearDedup.bandDigests
      // (round 5) so the incremental re-ingest path provably buckets
      // identically to this full recompute
      val bands = sig.select($"doc_id",
          posexplode(graft.operators.IncrementalNearDedup.bandDigests($"sig")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
        .cache()
      // hot-bucket guard (see scaladoc): occupancy agg + anti-join key
      // on (band, bv) — the same key the candidate join shuffles on
      val pruned = graft.operators.LshGuard.pruneSelf(
        bands, graft.operators.LshGuard.maxBucket(s))
      val cand = pruned.as("a").join(pruned.as("b"),
          $"a.band" === $"b.band" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      // row-local verification (round 17 — q41's measured form ported
      // here): candidates fetch the per-doc shingle ARRAYS (one row
      // per doc) and the intersection is `array_intersect` inside
      // codegen. The old explode+groupBy verify re-exploded the full
      // postings twice and shuffled every posting row by doc id; this
      // joins |candidates| + 2·|docs| rows. Identical output — sset is
      // array_distinct'd, so size(array_intersect) ≡ the matched-
      // posting count the groupBy computed.
      cand
        .join(sh.select($"doc_id".as("doc_a"), size($"sset").as("na"),
          $"sset".as("sa")), "doc_a")
        .join(sh.select($"doc_id".as("doc_b"), size($"sset").as("nb"),
          $"sset".as("sb")), "doc_b")
        .select($"doc_a", $"doc_b", $"na", $"nb",
          size(array_intersect($"sa", $"sb")).as("c"))
        .select($"doc_a", $"doc_b",
          ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("jaccard"))
        .filter($"jaccard" >= 0.6)
    },
    Some(s"""$shingleCte,
      xs AS (SELECT doc_id, sset, list_transform(sset, s ->
               CAST('0x'||substr(md5(s), 1, 14) AS BIGINT) % $MinhashP) xs FROM sh),
      mh AS (SELECT doc_id, sset, list_transform(range(24), i ->
               list_aggregate(list_transform(xs, x ->
                 ($minhashADuck[i+1] * x + $minhashBDuck[i+1]) % $MinhashP), 'min')) sig
             FROM xs),
      bands AS (SELECT doc_id, b,
                  md5(array_to_string(list_transform(sig[b*3+1:b*3+3], x -> CAST(x AS VARCHAR)),',')) bv
                FROM mh, (SELECT unnest(range(8)) b)),
      cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM bands a
               JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, len(sset) n FROM sh),
      ex AS (SELECT doc_id, unnest(sset) s FROM sh),
      common AS (SELECT c.da, c.db, count(*) cnt FROM cand c
                 JOIN ex a ON a.doc_id = c.da JOIN ex b ON b.doc_id = c.db AND b.s = a.s
                 GROUP BY 1,2)
      SELECT da AS doc_a, db AS doc_b, cnt*1.0/(sa.n + sb.n - cnt) AS jaccard
      FROM common JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      WHERE cnt*1.0/(sa.n + sb.n - cnt) >= 0.6"""),
    bench = true)

  /** SimHash near-dup: 60-bit fingerprint (bit j = sign of Σ over
    * shingle hashes of ±1 on bit j) via the native
    * [[graft.functions.SimHash60]] expression (one digest + one JIT
    * loop per shingle; the interpreted 60-lambda HOF form is kept as
    * the spec reference in ExpressionSpec), pairs at hamming ≤ 10.
    * The fingerprint build is row-local (no shuffle).
    *
    * Pair generation is EXACT banding, not a pair scan: the 60 bits
    * split into 11 disjoint bands (five 6-bit + six 5-bit). Two
    * fingerprints with hamming ≤ 10 differ in at most 10 bit
    * positions, and each differing bit falls in exactly one band — so
    * by pigeonhole at least one of the 11 bands is bit-identical.
    * Candidates = docs sharing any (band_idx, band_value), an
    * equi-join whose shuffle is bounded by docs-per-bucket (the same
    * shape as MinHash-LSH, q42), then an exact hamming verify. Unlike
    * LSH this loses nothing: recall is guaranteed 100% by the
    * pigeonhole bound, which is why the oracle below can stay the
    * exact all-pairs SQL. Hash = first 15 md5 hex chars as int64,
    * reproducible in DuckDB.
    *
    * [[graft.operators.LshGuard]] is deliberately NOT wired here:
    * pruning a hot band bucket would break the 100%-recall contract
    * this query advertises (and the all-pairs oracle checks). A
    * crawl-scale caller expecting ≥cap-sized boilerplate families
    * must choose: keep exactness and pay the k²/2 in-bucket pairs,
    * or apply `LshGuard.pruneSelf(bands, cap)` before the self-join
    * and accept the documented family-local recall loss — the same
    * trade q42 now makes by default. */
  private val simhash = Q(
    "q43_dedup_simhash",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val fp = withShingles(s, d)
        .select($"doc_id", expr("simhash60(sset)").as("fp"))
        .cache() // banding + verify both read it; one fingerprint pass
      // band layout shared with the property-tested pure helper
      val bands = fp.select($"doc_id", $"fp",
          posexplode(array(graft.functions.SimHashBands.defs.map { case (off, w) =>
            shiftright($"fp", off).bitwiseAND(lit((1L << w) - 1))
          }: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
      bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          expr("bit_count(a.fp ^ b.fp)").cast("long").as("hamming"))
        .filter($"hamming" <= 10)
        .distinct() // same pair can share several bands
    },
    Some(s"""$shingleCte,
      hs AS (SELECT doc_id, list_transform(sset, s -> CAST('0x'||substr(md5(s),1,15) AS BIGINT)) hlist FROM sh),
      fp AS (SELECT doc_id, CAST(list_sum(list_transform(range(60), j ->
               CASE WHEN list_sum(list_transform(hlist, h ->
                 CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
               THEN 1::BIGINT << j ELSE 0::BIGINT END)) AS BIGINT) f
             FROM hs)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.f, b.f)) <= 10"""))

  /** Multi-table signed-random-projection constants for q44 — md5
    * parity planes from [[graft.functions.SrpSigImpl]] (single source
    * of truth shared with the native `srp_sig` expression; salt "cos"
    * keeps this family independent of [[SimilarityQueries]]' q46
    * planes). 8 tables × 6 bits. */
  private val CosTables = 8
  private val CosBits = 6
  private val CosDim = 64

  /** Planted-twin perturbation for [[plantedEmbeddings]] — ONE
    * constant interpolated into BOTH engines' view definitions (so
    * the margin cannot drift between them): first element +0.15
    * yields planted cosines ≥ 0.9887 on this corpus. The margin is
    * the recall envelope's other knob (see [[cosExpectedMisses]]):
    * a bigger perturbation (smaller margin) needs more tables. */
  private[graft] val CosPlantMargin = 0.15

  /** SRP table count, conf-overridable (round 11): at ≥ sf100 the
    * per-pair miss probability × pair count approaches 1 and the
    * remedy is MORE TABLES — `graft.cos.tables` flips it without a
    * code change. Upward-safe for the gate: extra tables only ADD
    * candidates, and exact-cosine verification keeps the emitted set
    * identical wherever recall is already full. */
  private[graft] def cosTables(s: SparkSession): Int = {
    val t = s.conf.getOption("graft.cos.tables").map(_.toInt).getOrElse(CosTables)
    require(t >= 1 && t <= 64, s"graft.cos.tables must be in [1,64], got $t")
    t
  }

  /** SRP bits per table, conf-overridable (round 11): the BUCKET-SPACE
    * knob. Fixed bits carry an inherent n²/2^bits chance-candidate
    * term (random pairs agree on a 6-bit bucket with prob ~1/64), so
    * at archive scale the bucket space must grow with the corpus —
    * size bits ≳ log₂(n/capacity) and then re-size tables from
    * [[cosExpectedMisses]] (more bits cut per-table collision odds for
    * TRUE pairs too: at the planted margin, bits 6→12 needs tables
    * 8→16 to hold the same miss budget). Unlike `graft.cos.tables`
    * this knob is NOT unconditionally upward-safe — it removes
    * candidates — which is exactly why the budget math is executable
    * and DedupPairsSpec pins a scaled (bits, tables) config against
    * the default's gated result. */
  private[graft] def cosBits(s: SparkSession): Int = {
    val b = s.conf.getOption("graft.cos.bits").map(_.toInt).getOrElse(CosBits)
    require(b >= 1 && b <= 30, s"graft.cos.bits must be in [1,30], got $b")
    b
  }

  /** The q44 recall-envelope math as CODE, so a scale-up checks a
    * budget instead of rediscovering the derivation: expected planted
    * misses = n · (1 − a^bits)^tables with per-plane agreement
    * a = 1 − arccos(minCos)/π (the SRP collision probability —
    * Goemans–Williamson). DedupPairsSpec pins the budget at gate,
    * ~sf1-replica and sf100 scales. */
  private[graft] def cosExpectedMisses(nPairs: Long, minCos: Double,
      tables: Int, bits: Int): Double = {
    val agree = 1.0 - math.acos(minCos) / math.Pi
    nPairs * math.pow(1.0 - math.pow(agree, bits), tables)
  }

  /** The PLANTED embedding view q44 runs over: every vec_id ≡ 0
    * (mod 50) gains a near-duplicate twin (id → −(id+1) — the
    * NEGATIVE mirror, which no corpus id and no ×N replica's shifted
    * id space (+k·10⁹, make_bigsf/ScaleBench) can ever collide with;
    * first element +0.15 — float arithmetic identical across
    * engines: float(double(x) + 0.15) is the correctly-rounded sum
    * in both).
    * The raw synthetic table has NO near-dup cosine structure
    * (measured max pair cosine 0.51 at sf0.01), so without planting,
    * a recall gate is vacuous — this view gives the corpus genuine
    * near-dup pairs with a wide margin: planted cosines ≥ 0.9887,
    * the highest chance pair ≤ 0.60 (both measured at sf0.01 AND
    * sf0.1). Exposed for DedupPairsSpec so the spec's brute-force
    * baseline sees the identical view. */
  private[graft] def plantedEmbeddings(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = T.embeddings(s, d).select($"vec_id", $"embedding")
    val twins = base.filter(pmod($"vec_id", lit(50)) === 0)
      .select((-$"vec_id" - 1).as("vec_id"),
        concat(array(($"embedding".getItem(0) + lit(CosPlantMargin)).cast("float")),
          slice($"embedding", 2, CosDim - 1)).as("embedding"))
    base.unionByName(twins)
  }

  /** DuckDB form of [[plantedEmbeddings]] (same [[CosPlantMargin]]
    * constant — the views cannot drift). */
  private val plantedEmbSql: String =
    s"""planted AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT -vec_id - 1,
        list_prepend(CAST(CAST(embedding[1] AS DOUBLE) + $CosPlantMargin AS FLOAT), embedding[2:])
      FROM embeddings WHERE vec_id % 50 = 0)"""

  /** The exact all-pairs cosine-pair CTE body shared by every
    * cosine-pair-consuming oracle (q44 and q145's cluster closure) —
    * ONE copy of the planted view + norm + pair predicate, so the
    * oracles cannot drift from each other (the [[pairsCtes]]
    * discipline, applied to the embedding family). `cpairs` carries
    * the cosine. */
  /** Norm-annotated planted view — the drift-prone half of every
    * cosine oracle (view + norm definition), kept as ONE string so
    * q44/q144/q145 can share it even where their pair predicates
    * differ (q144's rule is orientation-aware and stays verbatim). */
  private val cosNormCte: String =
    """n AS (SELECT * FROM (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))) nrm
        FROM planted) WHERE nrm > 0 AND isfinite(nrm))"""

  private val cosPairsCtes: String =
    s"""$plantedEmbSql,
      $cosNormCte,
      cpairs AS (SELECT * FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          list_sum(list_transform(range($CosDim), i ->
            CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
            / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id)
        WHERE cosine >= 0.9)"""

  /** Recursive-CTE connected-components closure over a pair CTE — ONE
    * copy of the reachability SQL shared by q72 (Jaccard pairs) and
    * q145 (cosine pairs), so the two clustering oracles cannot drift
    * in what "component" means. Emits the final SELECT:
    * (idOut, cluster_root = min reachable id). */
  private def ccClosureSql(pairs: String, aCol: String, bCol: String,
      idOut: String): String =
    s"""edges AS (SELECT $aCol AS s, $bCol AS t FROM $pairs
                UNION ALL SELECT $bCol, $aCol FROM $pairs),
      nodes AS (SELECT DISTINCT s AS id FROM edges),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id)
      SELECT id AS $idOut, min(r) AS cluster_root FROM reach GROUP BY id"""

  /** Embedding-cosine near-dup pairs (cos ≥ 0.9) over the
    * [[plantedEmbeddings]] view: hyperplane-LSH candidate generation
    * (8 tables × 6-bit SRP buckets, equi-join per (table, bucket)) +
    * exact-cosine verification of every candidate.
    *
    * THE ORACLE IS EXACT ALL-PAIRS at the threshold — the recall
    * contract itself, not a re-statement of the bucketing (the
    * round-9 known-gap, closed by planting): equality proves the LSH
    * finds EVERY true ≥ 0.9 pair on this data and emits nothing
    * false. SRP-LSH has no pigeonhole bound, but collision is fully
    * deterministic (md5 planes), and at the planted margin
    * (cos ≥ 0.9887 → per-plane agreement 1 − arccos(0.9887)/π ≈
    * 0.952, per-table 0.952⁶ ≈ 0.74, miss-all-8 ≈ 0.26⁸ ≈ 2·10⁻⁵)
    * every planted pair collides — verified bit-exact at sf0.01,
    * sf0.1 AND the ~sf1 replica (408 planted pairs; expected misses
    * ≈ 0.009). SF ENVELOPE: unlike q140/q142's pigeonhole bound,
    * this equality is probabilistic-per-pair — at ≥ sf100 (~40k+
    * planted pairs) the expected miss count approaches 1 and a gate
    * at that scale should widen the margin ([[CosPlantMargin]] — one
    * shared constant in both view definitions) or add tables (conf
    * `graft.cos.tables` — [[cosTables]], no code change); the budget
    * math is executable ([[cosExpectedMisses]]) and DedupPairsSpec
    * pins it at gate, replica and sf100 scales. At the old 0.4 noise floor this config measured 21/59
    * recall scanning 12.4% of pair volume (100% recall at a noise
    * threshold provably requires ≥ brute-force work); the exact
    * quadratic baseline remains [[SimilarityQueries]]'s q45.
    *
    * [[graft.operators.LshGuard]] is not wired here because pruning
    * would change the gated result, and an embedding corpus has no
    * analogue of verbatim boilerplate families — identical vectors
    * come from identical inputs, which exact dedup upstream removes.
    * A caller bucketing raw crawl embeddings can still apply
    * `LshGuard.pruneSelf` to `tb` (renaming (t, bucket) to the
    * guard's (band, bv) key). */
  private val cosineNearDup = Q(
    "q44_dedup_cosine",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val e = plantedEmbeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        // usable vectors only (zero/NaN/Inf norms out), per the
        // ingestCosine rule and MIRRORED in [[cosNormCte]]: without
        // it a NaN-element vector passes `cosine >= t` (Spark orders
        // NaN above all doubles) and poisons the pair set
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
        .cache() // read by the bucket explode and both verify sides
      // native srp_sig: one JIT loop for all 48 plane dots per row
      // (the interpreted HOF fold was tables×bits×dim lambda calls);
      // table count is the conf-driven scale knob ([[cosTables]])
      val tb = e.select($"vec_id",
          posexplode(expr(s"srp_sig(embedding, 'cos', ${cosTables(s)}, ${cosBits(s)})")))
        .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
      val cand = tb.as("a").join(tb.as("b"),
          $"a.t" === $"b.t" && $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b")).distinct()
      cand
        .join(e.as("ea"), $"vec_a" === $"ea.vec_id")
        .join(e.as("eb"), $"vec_b" === $"eb.vec_id")
        .select($"vec_a", $"vec_b",
          Vectors.cosineWithNorms($"ea.embedding", $"eb.embedding", $"ea.nrm", $"eb.nrm")
            .as("cosine"))
        .filter($"cosine" >= 0.9)
    },
    Some(s"""WITH $cosPairsCtes
      SELECT vec_a, vec_b, cosine FROM cpairs"""))

  /** Incremental SEMANTIC near-dedup RULE, oracle-gated — the
    * [[graft.operators.DedupStore.ingestCosine]] suppression decision
    * on the q142 pattern (even vec_ids stand in for the committed
    * store, odd + planted twins for the delta, no disk): a delta
    * vector is suppressed iff some STORE vector, or some SMALLER-id
    * delta vector, sits at cosine ≥ 0.9. Spark runs q44's SRP-LSH
    * banded equi-join (conf-driven tables × 6-bit buckets) with exact
    * cosine verification of every candidate; the oracle is the
    * all-pairs rule verbatim — equality proves the banded incremental
    * decision loses nothing. Over the [[plantedEmbeddings]] view so
    * the gate is non-vacuous: every twin (delta, negative id) has its
    * store original at cos ≥ 0.9887, and the corpus noise floor
    * (≤ 0.60) keeps chance pairs out. Recall shares q44's
    * probabilistic-per-pair envelope ([[cosExpectedMisses]],
    * `graft.cos.tables`), NOT q142's pigeonhole bound — the two
    * incremental gates deliberately pin one detector of each kind.
    * Output: every delta vector with its verdict. */
  private val cosineIncremental = Q(
    "q144_cos_incremental",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val e = plantedEmbeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        // usable vectors only (zero/NaN/Inf norms out), per the
        // ingestCosine rule and MIRRORED in [[cosNormCte]]: without
        // it a NaN-element vector passes `cosine >= t` (Spark orders
        // NaN above all doubles) and poisons the pair set
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
        .cache()
      val isDelta = $"vec_id" < 0 || pmod($"vec_id", lit(2)) === 1
      val tb = e.select($"vec_id", isDelta.as("__delta"),
          posexplode(expr(s"srp_sig(embedding, 'cos', ${cosTables(s)}, ${cosBits(s)})")))
        .toDF("vec_id", "__delta", "t", "bucket")
      val cand = tb.filter($"__delta").as("a").join(tb.as("b"),
          $"a.t" === $"b.t" && $"a.bucket" === $"b.bucket"
            && (!$"b.__delta" || $"b.vec_id" < $"a.vec_id"))
        .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b")).distinct()
      val suppressed = cand
        .join(e.as("ea"), $"vec_a" === $"ea.vec_id")
        .join(e.as("eb"), $"vec_b" === $"eb.vec_id")
        .filter(Vectors.cosineWithNorms($"ea.embedding", $"eb.embedding",
          $"ea.nrm", $"eb.nrm") >= 0.9)
        .select($"vec_a".as("vec_id")).distinct()
        .withColumn("__sup", lit(true))
      e.filter(isDelta).select($"vec_id")
        .join(suppressed, Seq("vec_id"), "left")
        .select($"vec_id", coalesce($"__sup", lit(false)).as("is_suppressed"))
    },
    Some(s"""WITH $plantedEmbSql,
      $cosNormCte,
      del AS (SELECT * FROM n WHERE vec_id < 0 OR vec_id % 2 = 1),
      sup AS (SELECT DISTINCT a.vec_id FROM del a JOIN n b
        ON a.vec_id <> b.vec_id
        AND (NOT (b.vec_id < 0 OR b.vec_id % 2 = 1) OR b.vec_id < a.vec_id)
        AND list_sum(list_transform(range($CosDim), i ->
            CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.9)
      SELECT del.vec_id, sup.vec_id IS NOT NULL AS is_suppressed
      FROM del LEFT JOIN sup ON del.vec_id = sup.vec_id"""),
    bench = true)

  /** SEMANTIC near-dup CLUSTERS — q72's transitive closure applied to
    * the embedding family (SemDeDup keeps one document per semantic
    * cluster, and pairs alone under-merge: A~B, B~C may hold at
    * cos ≥ 0.9 while A~C misses): distributed min-label connected
    * components over q44's verified cosine pairs, composed from the
    * REGISTERED q44 fn so the pair semantics cannot drift (the
    * q121→q138 composition rule). Downstream survivor selection is
    * q78/q110's guarded broadcast shape, unchanged. Oracle:
    * recursive-CTE reachability over the SHARED [[cosPairsCtes]] —
    * the same one-copy discipline as the text family's
    * [[pairsCtes]]. */
  private val cosClusters = Q(
    "q145_cos_clusters",
    (s, d) => {
      import s.implicits._
      graft.operators.ConnectedComponents
        .label(cosineNearDup.fn(s, d).select($"vec_a", $"vec_b"))
        .select($"id".as("vec_id"), $"component".as("cluster_root"))
    },
    Some(s"""WITH RECURSIVE $cosPairsCtes,
      ${ccClosureSql("cpairs", "vec_a", "vec_b", "vec_id")}"""),
    bench = true)

  /** q41's pairs oracle, re-emitted as a CTE body shared by EVERY
    * pair-consuming oracle — q41/q72/q77/q78 and the round-9 reports
    * q125/q127 (DuckDB's WITH RECURSIVE needs every CTE in one list,
    * and keeping ONE copy of the candidate/verify SQL + threshold
    * means the oracles cannot drift from [[jaccardPairs]]).
    * `jpairs` carries the similarity; `pairs` is the id-only view.
    * (lazy: q41's Q val precedes this declaration — a strict val
    * would interpolate null into its oracle string.) */
  private lazy val pairsCtes = s"""${shingleCte.stripPrefix("WITH ")},
      sizes AS (SELECT doc_id, len(sset) n FROM sh),
      ex AS (SELECT doc_id, unnest(sset) s FROM sh),
      common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM ex a
                 JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
      jpairs AS (SELECT * FROM (
          SELECT da, db, c*1.0/(sa.n + sb.n - c) AS j
          FROM common JOIN sizes sa ON da = sa.doc_id
                      JOIN sizes sb ON db = sb.doc_id)
        WHERE j >= 0.6),
      pairs AS (SELECT da AS doc_a, db AS doc_b FROM jpairs)"""

  /** Near-dup CLUSTERS: connected components over the Jaccard≥0.6 pair
    * graph (pairs alone under-merge — A~B, B~C may hold while A~C
    * misses the threshold; canonical-survivor selection needs the
    * transitive closure). Pregel-style min-label propagation: each
    * round every node takes min(own root, neighbors' roots) — one
    * self-equi-join + one aggregate per round, converging in
    * O(component diameter) rounds (near-dup clusters are tiny, 2–3
    * rounds in practice). `localCheckpoint` truncates the growing
    * lineage each round (on a cluster: `checkpoint` to durable
    * storage). No step is quadratic and nothing is collected to the
    * driver — the same loop runs at 100 TB where a component fits no
    * single machine. Oracle: recursive-CTE reachability + min. */
  private val ccClusters = Q(
    "q72_cc_clusters",
    (s, d) => {
      import s.implicits._
      graft.operators.ConnectedComponents
        .label(jaccardPairs(s, d).select($"doc_a", $"doc_b"))
        .select($"id".as("doc_id"), $"component".as("cluster_root"))
    },
    Some(s"""WITH RECURSIVE $pairsCtes,
      ${ccClosureSql("pairs", "doc_a", "doc_b", "doc_id")}"""))

  /** Exact prefix-filtered Jaccard (the PPJoin family) — since round
    * 4 this IS [[jaccardPairs]] (the prefix filter became the one
    * shared candidate generator for q41/q72/q77/q78); the entry stays
    * registered under its own id as the named PPJoin surface.
    * Oracle: identical SQL to q41 — equality proves the prefix filter
    * is exact, modulo the 2⁻⁶⁴ xxhash64 shingle-collision bound
    * documented at [[jaccardPairs]] (the oracle joins raw shingle
    * strings; the engine joins their 64-bit hashes). */
  private val jaccardPrefix = Q(
    "q77_jaccard_prefix_filter",
    (s, d) => jaccardPairs(s, d),
    Some(s"""WITH $pairsCtes
      SELECT da AS doc_a, db AS doc_b, j AS jaccard FROM jpairs"""))

  /** Survivor selection — the step that actually SHRINKS the corpus:
    * left-join docs against the near-dup clusters (q72) and keep only
    * cluster canonicals (min doc_id) and untouched singletons. The
    * cluster table is usually tiny relative to the corpus (only docs
    * with a near-dup), so the join broadcasts and the corpus side
    * streams through untouched — the right shape when "docs" is
    * 100 TB and "dups" is a few percent. "Usually" is ENFORCED, not
    * assumed (round 9): [[graft.operators.BroadcastGuard]] counts the
    * checkpoint-backed cluster table and falls back to a plain
    * shuffled left join past `graft.maxBroadcastRows` — the raw-crawl
    * regime (30%+ dup rate) where a forced broadcast OOMs the driver.
    * Result-identical either way (SurvivorGuardSpec). */
  private val dedupPrune = Q(
    "q78_dedup_prune",
    (s, d) => {
      import s.implicits._
      val clusters = graft.operators.ConnectedComponents
        .label(jaccardPairs(s, d).select($"doc_a", $"doc_b"))
      val bc = graft.operators.BroadcastGuard.sized(clusters, "q78 near-dup clusters")
      T.documents(s, d)
        .join(bc(clusters), $"doc_id" === $"id", "left")
        .filter($"component".isNull || $"doc_id" === $"component")
        .select($"doc_id",
          coalesce($"component", $"doc_id").as("cluster_root"),
          $"component".isNotNull.as("had_dups"))
    },
    Some(s"""WITH RECURSIVE $pairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      nodes AS (SELECT DISTINCT s AS id FROM edges),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
      cc AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
      SELECT d.doc_id, coalesce(cc.root, d.doc_id) AS cluster_root,
             cc.id IS NOT NULL AS had_dups
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
      WHERE cc.id IS NULL OR d.doc_id = cc.root"""))

  /** Cross-doc repeated-SPAN coverage — the exact-substring-dedup
    * signal (the public "dedup training data by cutting long verbatim
    * repeats" recipe): per doc, the fraction of token POSITIONS
    * covered by some k=20-token span that also appears verbatim in
    * another doc. Complements q95 (distinct-shingle commonness) and
    * q41 (whole-doc similarity): this finds long verbatim overlap
    * even between globally-dissimilar docs — the quotes/licenses/
    * navigation-chrome case — and its output is the cut list shape
    * (how much of each doc is cuttable span).
    *
    * Shape at 100 TB: k-gram extraction is row-local; the df count
    * and the coverage join are keyed by the k-gram — same
    * inverted-index shuffle family as q95, no pair-shaped work. The
    * position explode multiplies covered grams by k; on real data
    * covered positions are a small corpus slice (and k-gram keys
    * would travel as fixed-width hashes like q41's — here they stay
    * raw strings so the DuckDB oracle joins identically). Spans
    * repeated only WITHIN one doc don't count (cross-doc df ≥ 2),
    * matching the dedup use case: self-repetition is q76's signal. */
  private val repeatedSpans = Q(
    "q71_repeated_spans",
    (s, d) => {
      import s.implicits._
      val k = 20
      val toks = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
      val grams = toks.filter(size($"ws") >= k)
        .select($"doc_id",
          posexplode(transform(sequence(lit(1), size($"ws") - (k - 1)),
            i => concat_ws(" ", slice($"ws", i, lit(k))))))
        .select($"doc_id", ($"pos" + 1).as("p"), $"col".as("g"))
        .cache() // read by the df-count branch AND the coverage join
        // (different join keys — no ReusedExchange; measured at sf0.1:
        // cached ~1.3 s vs ~1.7 s recomputing the k-gram concat twice)
      val shared = grams.select($"g", $"doc_id").distinct()
        .groupBy($"g").agg(count(lit(1)).as("ndocs"))
        .filter($"ndocs" >= 2)
        .select($"g")
      val covered = grams.join(shared, "g")
        .select($"doc_id", explode(sequence($"p", $"p" + (k - 1))).as("cp"))
        .groupBy($"doc_id").agg(countDistinct($"cp").as("covered"))
      toks.select($"doc_id", size($"ws").cast("long").as("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          coalesce($"covered", lit(0L)).as("covered_tokens"),
          (coalesce($"covered", lit(0L)).cast("double") / $"n_tokens")
            .as("dup_span_frac"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') ws
        FROM documents),
      pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 19)) p
              FROM t WHERE len(ws) >= 20),
      gr AS (SELECT doc_id, p, array_to_string(ws[p:p+19], ' ') g FROM pos),
      shared AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) nd
                                FROM gr GROUP BY g) WHERE nd >= 2),
      cov AS (SELECT doc_id, count(DISTINCT cp) covered FROM (
                SELECT doc_id, unnest(generate_series(p, p + 19)) cp
                FROM gr JOIN shared USING (g)) GROUP BY doc_id)
      SELECT t.doc_id, len(t.ws)::BIGINT AS n_tokens,
        CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
        coalesce(cov.covered, 0) * 1.0 / len(t.ws) AS dup_span_frac
      FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id"""))

  /** Boilerplate fraction (the C4-style template-contamination
    * signal): per doc, the share of its distinct 3-shingles that are
    * corpus-common (document frequency ≥ 5) — template/boilerplate
    * text scores high and gets down-weighted or cut before training.
    * Same inverted-index machinery as q41 (xxhash64 shingle keys), but
    * aggregated per doc instead of per pair: shingle-df is keyed by
    * the hash (vocabulary-bounded), the corpus joins it once — no
    * pair-shaped work at all. */
  private val boilerplate = Q(
    "q95_boilerplate_fraction",
    (s, d) => {
      import s.implicits._
      val ex = withShingles(s, d)
        .select($"doc_id", explode($"sset").as("sh0"))
        .select($"doc_id", xxhash64($"sh0").as("sh"))
      val df = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
      ex.join(df, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"df" >= 5, 1L).otherwise(0L)).as("n_common"))
        .select($"doc_id", $"n_shingles", $"n_common",
          ($"n_common".cast("double") / $"n_shingles").as("boilerplate_frac"))
    },
    Some(s"""$shingleCte,
      ex AS (SELECT doc_id, unnest(sset) AS s FROM sh),
      df AS (SELECT s, count(*) AS df FROM ex GROUP BY s)
      SELECT e.doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
             sum(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) * 1.0 / count(*) AS boilerplate_frac
      FROM ex e JOIN df USING (s)
      GROUP BY e.doc_id"""))

  /** Incremental ingest dedup — q40's day-over-day counterpart (as
    * q90 is for aggregation): new documents check against the
    * HISTORICAL corpus's fingerprint store instead of recomputing
    * dedup over all history. Base = docs with even doc_id standing in
    * for "already ingested"; their md5 digests are the store (16
    * bytes/doc — at 100 TB of corpus that is a slim table keyed for
    * one equi-join). Delta docs survive only if their digest misses
    * the store AND they aren't internal delta duplicates (min doc_id
    * wins).
    *
    * The store probe is [[graft.operators.BloomAntiJoin]] (round 5):
    * a Bloom filter over the store's hashed fingerprints routes the
    * delta so only true dupes plus the fpp sliver pay the anti-join
    * shuffle — the billion-fingerprint store regime where neither
    * side broadcasts as rows. Exactness is unchanged (the filter
    * routes, the anti-join decides), so the oracle stays the plain
    * SQL over the same split. */
  private val incrementalDedup = Q(
    "q100_incremental_dedup",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"doc_id", md5($"text").as("fp"))
      val store = docs.filter($"doc_id" % 2 === 0).select($"fp")
      val delta = docs.filter($"doc_id" % 2 === 1)
      graft.operators.BloomAntiJoin(delta, store, "fp")
        .groupBy($"fp").agg(min($"doc_id").as("doc_id"),
          count(lit(1)).as("n_delta_copies"))
        .select($"doc_id", $"fp", $"n_delta_copies")
    },
    Some("""WITH docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
      store AS (SELECT fp FROM docs WHERE doc_id % 2 = 0),
      delta AS (SELECT * FROM docs WHERE doc_id % 2 = 1)
      SELECT min(doc_id) AS doc_id, fp, count(*) AS n_delta_copies
      FROM delta WHERE fp NOT IN (SELECT fp FROM store)
      GROUP BY fp"""))

  /** Quality-keyed survivor selection — q78 keeps the MIN-id doc per
    * near-dup cluster; real curation keeps the BEST copy (the usual
    * policy: the longest version survives, truncated mirrors drop).
    * "Best" here is the whitespace-token count (q52's statistic) with
    * min doc_id breaking exact-length ties — an INTEGER key on
    * purpose: a float quality score computed independently by two
    * engines can flip last-ulp ties and make a hash gate flaky, while
    * token counts are bit-stable everywhere.
    *
    * Plan shape matches q78: clusters are tiny relative to the corpus
    * (only docs with a near-dup), so winner selection runs on the
    * clustered slice only — one broadcast inner join to fetch texts,
    * a window over components bounded by cluster count — and the full
    * corpus then streams through a single broadcast left-join. At
    * 100 TB the corpus side is never shuffled and the per-component
    * window never sees more rows than the dup population. The
    * smallness assumption is guarded, not trusted (round 9): ONE
    * count of the checkpoint-backed cluster table decides broadcast
    * vs shuffled-join fallback for all three cluster-bounded frames
    * (winners ≤ clusters, members = clusters rows) via
    * [[graft.operators.BroadcastGuard.Sized]] — on a majority-dup
    * corpus every hint drops and the same rows come back through
    * shuffled joins (SurvivorGuardSpec). */
  private val keepLongest = Q(
    "q110_dedup_keep_longest",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val clusters = graft.operators.ConnectedComponents
        .label(jaccardPairs(s, d).select($"doc_a", $"doc_b")) // (id, component)
      val bc = graft.operators.BroadcastGuard.sized(clusters, "q110 near-dup clusters")
      val docs = T.documents(s, d)
      val winners = docs.join(bc(clusters), $"doc_id" === $"id")
        .withColumn("tok", size(split(trim($"text"), "\\s+")).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"component").orderBy($"tok".desc, $"doc_id".asc)))
        .filter($"rk" === 1)
        .select($"component".as("wcomp"), $"id".as("wid"))
      val members = clusters.join(bc(winners), $"component" === $"wcomp")
        .select($"id", $"component", $"wid")
      docs.join(bc(members), $"doc_id" === $"id", "left")
        .filter($"component".isNull || $"doc_id" === $"wid")
        .select($"doc_id",
          coalesce($"component", $"doc_id").as("cluster_root"),
          $"component".isNotNull.as("had_dups"))
    },
    Some(s"""WITH RECURSIVE $pairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      nodes AS (SELECT DISTINCT s AS id FROM edges),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      ranked AS (SELECT c.id, c.component,
          row_number() OVER (PARTITION BY c.component
            ORDER BY len(string_split_regex(trim(d.text),'\\s+')) DESC, c.id ASC) AS rk
        FROM comp c JOIN documents d ON d.doc_id = c.id),
      winners AS (SELECT component, id AS wid FROM ranked WHERE rk = 1)
      SELECT d.doc_id,
             coalesce(c.component, d.doc_id) AS cluster_root,
             c.component IS NOT NULL AS had_dups
      FROM documents d
      LEFT JOIN comp c ON d.doc_id = c.id
      LEFT JOIN winners w ON c.component = w.component
      WHERE c.component IS NULL OR d.doc_id = w.wid"""),
    bench = true)

  /** Cluster-size distribution — the dedup run's diagnostic summary:
    * how many near-dup clusters exist at each size. The shape of this
    * histogram decides curation policy (a fat tail of large clusters
    * means templated/boilerplate families that exact dedup and q95
    * should own; mostly pairs means true near-dups that survivor
    * selection handles) and it is the first artifact to inspect when
    * a dedup pass removes more or less than expected.
    *
    * Plan: two k-bounded aggregates over the (tiny) cluster table —
    * count per component, then count per size. The corpus itself is
    * only touched by the shared [[jaccardPairs]] pipeline. */
  /** q115's rollup as a function of an ALREADY-BUILT pair table —
    * [[graft.jobs.CurationReportJob]] computes [[jaccardPairs]] once,
    * caches it, and feeds the three pair-consuming reports (q115/
    * q125/q127) from that one frame instead of re-running the
    * dominant shingle-join pipeline per report. */
  private[graft] def clusterSizesFrom(pairs: DataFrame): DataFrame =
    graft.operators.ConnectedComponents
      .label(pairs.select(col("doc_a"), col("doc_b")))
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  private val clusterSizeDist = Q(
    "q115_cluster_size_dist",
    (s, d) => clusterSizesFrom(jaccardPairs(s, d)),
    Some(s"""WITH RECURSIVE $pairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      nodes AS (SELECT DISTINCT s AS id FROM edges),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      csizes AS (SELECT component, count(*) AS cluster_size
                 FROM comp GROUP BY component)
      SELECT cluster_size, count(*) AS n_clusters
      FROM csizes GROUP BY cluster_size"""))

  /** Asymmetric CONTAINMENT dedup — |A∩B|/|A| ≥ t over 3-word
    * shingles: A's content is (mostly) inside B even when B is far
    * larger, the case symmetric Jaccard structurally misses (a doc
    * quoted whole inside a 10× digest has J ≈ 0.1 at containment
    * 1.0). The curation action differs too: the CONTAINED doc is the
    * redundant one.
    *
    * One-sided PPJoin: only the contained side carries a prefix —
    * C ≥ t means at most (1−t)·|A| of A's shingles miss B, so its
    * ⌊(1−t)·|A|⌋+1 rarest must pigeonhole-hit B; the container side
    * joins with FULL postings (any shingle of B can witness). The
    * df ≥ 2 slice is recall-safe exactly as in [[jaccardPairs]] (a
    * witness shingle is by definition shared). Length filter on the
    * join: c ≤ min ⇒ nb ≥ t·na; the positional filter is vacuous
    * here (pa ≤ plen already implies the remaining-suffix bound).
    * Verification row-local over the per-doc hash arrays. Cost is the
    * q71-style inverted-index join — keyed, never all-pairs; the
    * oracle is the full O(n²)-style SQL, equality proving exact
    * recall (modulo the 2⁻⁶⁴ xxhash64 collision bound).
    *
    * Skew guard (round 10): prefix rows whose shingle df exceeds
    * [[graft.operators.IncrementalContainment.maxShingleDf]] are
    * dropped — one boilerplate 3-gram in 30% of a crawl otherwise
    * turns the prefix ⋈ postings join quadratic on that key. Never
    * fires at gate SF (max df 25 at sf0.1 vs the 1024 default, so
    * the oracle equality stands); the recall contract is
    * [[graft.operators.IncrementalContainment.DefaultMaxShingleDf]]'s,
    * spec'd under a planted hot key in ContainSkewSpec. */
  private val containmentDedup = Q(
    "q116_containment_dedup",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.GraftExtensions.ensureRegistered(s)
      val t = 0.7
      val hs = T.documents(s, d)
        .filter(size(split(trim($"text"), "\\s+")) >= 3)
        .select($"doc_id", expr("word_shingle_hashes(text, 3)").as("hset"))
      val ex = hs.select($"doc_id", size($"hset").as("n"), explode($"hset").as("sh"))
      val dfreq2 = ex.groupBy($"sh").agg(count(lit(1)).as("df")).filter($"df" >= 2)
      val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
      val maxDf = graft.operators.IncrementalContainment.maxShingleDf(s)
      val prefix = ex.join(dfreq2, "sh")
        .withColumn("r2", row_number().over(w))
        .withColumn("n2", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("pos", $"n" - $"n2" + $"r2")
        .filter($"pos" <= $"n" - ceil(lit(t) * $"n").cast("int") + 1
          && $"df" <= maxDf) // hot-shingle skew guard, see scaladoc
        .select($"doc_id".as("__ca"), $"sh", $"n".as("na"))
      val postings = ex.join(dfreq2.select($"sh"), "sh")
        .select($"doc_id".as("__cb"), $"sh", $"n".as("nb"))
      val cand = prefix.join(postings, "sh")
        .filter($"__ca" =!= $"__cb" && $"nb" >= lit(t) * $"na")
        .select($"__ca", $"__cb").distinct()
      cand
        .join(hs.select($"doc_id".as("__ca"), $"hset".as("ha")), "__ca")
        .join(hs.select($"doc_id".as("__cb"), $"hset".as("hb")), "__cb")
        .select($"__ca".as("contained"), $"__cb".as("container"),
          (size(array_intersect($"ha", $"hb")).cast("double") / size($"ha"))
            .as("containment"))
        .filter($"containment" >= t)
    },
    Some(s"""$shingleCte,
      sizes AS (SELECT doc_id, len(sset) n FROM sh),
      ex AS (SELECT doc_id, unnest(sset) s FROM sh),
      common AS (SELECT a.doc_id ca, b.doc_id cb, count(*) c
                 FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
                 GROUP BY 1, 2)
      SELECT ca AS contained, cb AS container, c*1.0/sa.n AS containment
      FROM common JOIN sizes sa ON ca = sa.doc_id
      WHERE c*1.0/sa.n >= 0.7"""),
    bench = true)

  /** Incremental containment dedup — q116's day-over-day form, the
    * asymmetric cell of the incremental quadrant (q100 owns exact,
    * [[graft.operators.IncrementalNearDedup]] symmetric Jaccard): a
    * new ingest quoting an archived doc whole must be caught against
    * the persisted store, not by re-running batch q116 over all
    * history. Same even/odd standing-in-for-store/delta split as
    * q100; the operator ([[graft.operators.IncrementalContainment]])
    * emits every containment pair TOUCHING the delta, both
    * orientations — new-doc-redundant AND archived-doc-swallowed —
    * and the oracle is the full O(n²)-style SQL over the union
    * restricted to delta-touching pairs, so equality proves the
    * one-sided hash-order prefix probe is exact-recall (modulo the
    * 2⁻⁶⁴ xxhash64 bound, as q116). Store-internal pairs are
    * excluded: prior ingests already reported them.
    * IncrementalContainmentSpec fuzzes the same equivalence on random
    * corpora and proves store idempotency via
    * [[graft.operators.DedupStore.ingestContained]]. */
  private val incrementalContainment = Q(
    "q118_incremental_containment",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      graft.operators.IncrementalContainment.containedPairs(
        docs.filter($"doc_id" % 2 === 1),
        graft.operators.IncrementalNearDedup
          .shingleSets(docs.filter($"doc_id" % 2 === 0)))
    },
    Some(s"""$shingleCte,
      sizes AS (SELECT doc_id, len(sset) n FROM sh),
      ex AS (SELECT doc_id, unnest(sset) s FROM sh),
      common AS (SELECT a.doc_id ca, b.doc_id cb, count(*) c
                 FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
                 GROUP BY 1, 2)
      SELECT ca AS contained, cb AS container, c*1.0/sa.n AS containment
      FROM common JOIN sizes sa ON ca = sa.doc_id
      WHERE c*1.0/sa.n >= 0.7 AND (ca % 2 = 1 OR cb % 2 = 1)"""),
    bench = true)

  /** q118's guard fed the ROUND-11 FAST ROUTE: the store-side
    * occupancy arrives pre-aggregated
    * ([[graft.operators.IncrementalContainment.shingleDf]] — the
    * frame [[graft.operators.DedupStore.ingestContained]] persists
    * per day and reads back), so the guard folds only the delta's
    * counts. The oracle is IDENTICAL to q118's all-pairs SQL:
    * equality proves the pre-aggregated guard route changes nothing
    * — the drift this would catch is the two occupancy definitions
    * separating (e.g. a df table that double-counts a doc's repeated
    * shingle, or misses a day), which ContainSkewSpec pins on a
    * planted corpus and THIS gate pins against an independent
    * engine on the fixture corpus. */
  private val incrementalContainmentDf = Q(
    "q143_incremental_containment_dfguard",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val store = graft.operators.IncrementalNearDedup
        .shingleSets(docs.filter($"doc_id" % 2 === 0))
      graft.operators.IncrementalContainment.containedPairs(
        docs.filter($"doc_id" % 2 === 1), store,
        storeDf = Some(graft.operators.IncrementalContainment.shingleDf(store)))
    },
    incrementalContainment.oracle,
    bench = true)

  /** Span-CUT application — q71 measures which token positions are
    * covered by cross-doc verbatim k=20-token spans; this query
    * actually CUTS them, emitting each doc's cleaned text with the
    * covered positions removed plus the removal accounting — the
    * "cut long verbatim repeats" step itself (the public
    * exact-substring-dedup recipe applies cuts, it doesn't just score
    * them). Whole-doc suppression (q78/q110) is the wrong tool when
    * only a license header or navigation chrome repeats; this keeps
    * the unique remainder.
    *
    * Shape: identical inverted-index machinery to q71 (k-gram keys,
    * cross-doc df ≥ 2, per-doc covered-position explode) — one added
    * row-local reassembly: surviving (pos, token) pairs collect per
    * doc, `array_sort` orders them (struct sort on the leading int
    * field), `concat_ws` re-joins. The collect_list is per-DOC state
    * (bounded by doc length — the same bound the q117 percentile
    * switch guards at group level is inherent here: a doc's own
    * tokens already fit in one row's text field). Docs too short to
    * carry a k-gram, or with every span unique, pass through
    * verbatim; a doc covered END-TO-END collapses to the empty
    * string (removed == n_tokens — the q40-style exact dup caught at
    * span granularity). */
  private val spanCut = Q(
    "q119_span_cut",
    (s, d) => {
      import s.implicits._
      val k = 20
      val toks = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
      val pos = toks
        .select($"doc_id", posexplode($"ws"))
        .select($"doc_id", ($"pos" + 1).as("p"), $"col".as("tok"))
      val grams = toks.filter(size($"ws") >= k)
        .select($"doc_id",
          posexplode(transform(sequence(lit(1), size($"ws") - (k - 1)),
            i => concat_ws(" ", slice($"ws", i, lit(k))))))
        .select($"doc_id", ($"pos" + 1).as("p"), $"col".as("g"))
        .cache() // df-count branch AND coverage join (q71's measured trade)
      val shared = grams.select($"g", $"doc_id").distinct()
        .groupBy($"g").agg(count(lit(1)).as("ndocs"))
        .filter($"ndocs" >= 2)
        .select($"g")
      val covered = grams.join(shared, "g")
        .select($"doc_id", explode(sequence($"p", $"p" + (k - 1))).as("p"))
        .distinct()
      val kept = pos.join(covered, Seq("doc_id", "p"), "left_anti")
      val cleaned = kept.groupBy($"doc_id")
        .agg(count(lit(1)).as("kept_tokens"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct($"p", $"tok"))),
            x => x.getField("tok"))).as("cleaned_text"))
      toks.select($"doc_id", size($"ws").cast("long").as("n_tokens"))
        .join(cleaned, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          ($"n_tokens" - coalesce($"kept_tokens", lit(0L))).as("removed_tokens"),
          coalesce($"cleaned_text", lit("")).as("cleaned_text"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') ws
        FROM documents),
      pos AS (SELECT doc_id, unnest(generate_series(1, len(ws))) p FROM t),
      tok AS (SELECT doc_id, p, ws[p] tok FROM pos JOIN t USING (doc_id)),
      gpos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 19)) p
               FROM t WHERE len(ws) >= 20),
      gr AS (SELECT doc_id, p, array_to_string(ws[p:p+19], ' ') g FROM gpos),
      shared AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) nd
                                FROM gr GROUP BY g) WHERE nd >= 2),
      cov AS (SELECT DISTINCT doc_id, unnest(generate_series(p, p + 19)) p
              FROM gr JOIN shared USING (g)),
      kept AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok
               ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
      cl AS (SELECT doc_id, count(*) kept_tokens,
               string_agg(tok, ' ' ORDER BY p) cleaned_text
             FROM kept GROUP BY doc_id)
      SELECT t.doc_id, len(t.ws)::BIGINT n_tokens,
        len(t.ws)::BIGINT - coalesce(cl.kept_tokens, 0) AS removed_tokens,
        coalesce(cl.cleaned_text, '') AS cleaned_text
      FROM t LEFT JOIN cl ON t.doc_id = cl.doc_id"""))

  /** Shingle novelty vs a reference slice: the fraction of each doc's
    * distinct 3-shingles ABSENT from a designated reference
    * sub-corpus (source = 'src0' here; a real run points it at the
    * previous crawl or a trusted base corpus) — the "new information"
    * score that prioritizes fresh data over re-crawls and prices a
    * candidate source's marginal value before ingesting it. Related
    * to but distinct from q95 (boilerplate = HIGH-df shingles within
    * the corpus itself) and q82 (membership against a tiny broadcast
    * eval set): the reference here is corpus-scale, so membership is
    * a SHUFFLE equi-join on the shingle key, never a broadcast.
    * Scale shape: reference postings are distinct-deduped (bounded by
    * the reference's shingle vocabulary), every shuffle keys on a
    * shingle, cost Σ|sset| + Σdf — the q67/q95 inverted-index
    * discipline; a left join + null-count gives absence without an
    * anti-join's second pass over the probe side. */
  /** q123's reference side: the DISTINCT shingles of the src0 slice —
    * the one-off store-build cost the bench's q123_setup row prices. */
  private def q123Ref(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withShingles(s, d)
      .join(T.documents(s, d).select($"doc_id", $"source"), "doc_id")
      .filter($"source" === "src0")
      .select(explode($"sset").as("shingle")).distinct()
      .withColumn("in_ref", lit(true))
  }

  /** q123's scoring pass against an already-built reference — ONE code
    * path for the gated query and the bench's q123_probe row (the
    * q118/q125 split discipline: a probe that copy-pastes the
    * pipeline would silently measure dead code after a refactor).
    *
    * shuffle_hash, pinned: the reference slice is CORPUS-scale
    * (unlike q82's megabyte eval probe), so the stats-driven
    * broadcast AQE picks at gate SF is exactly the plan that OOMs
    * at 100 TB — and the regime flip it causes across scales
    * surfaced as a false ×96 in ScaleCheckSpec's record-growth
    * pin. One hash exchange per side, no sort, linear growth. */
  private def q123Score(s: SparkSession, d: String, ref: DataFrame): DataFrame = {
    import s.implicits._
    withShingles(s, d)
      .join(T.documents(s, d).select($"doc_id", $"source"), "doc_id")
      .select($"doc_id", $"source", explode($"sset").as("shingle"))
      .join(ref.hint("shuffle_hash"), Seq("shingle"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"in_ref".isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", $"n_novel".cast("double") / $"n_shingles")
  }

  private val shingleNovelty = Q(
    "q123_shingle_novelty",
    (s, d) => q123Score(s, d, q123Ref(s, d)),
    Some(s"""$shingleCte,
      e AS (SELECT sh.doc_id, d.source, unnest(sset) AS shingle
            FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
      r AS (SELECT DISTINCT shingle, TRUE AS in_ref FROM e WHERE source = 'src0')
      SELECT e.doc_id, count(*) AS n_shingles,
        CAST(count(*) FILTER (in_ref IS NULL) AS BIGINT) AS n_novel,
        CAST(count(*) FILTER (in_ref IS NULL) AS DOUBLE) / count(*) AS novelty
      FROM e LEFT JOIN r ON e.shingle = r.shingle
      GROUP BY e.doc_id"""),
    bench = true)

  /** Cross-source near-dup attribution matrix: near-dup PAIRS (the
    * shared [[jaccardPairs]] pipeline — same candidates, same
    * threshold as q41) attributed to the (source, source) pair that
    * produced them, unordered (least/greatest collapse), with pair
    * counts and mean similarity. This is the "who mirrors whom"
    * diagnostic a crawl operator reads before q78/q110 ever run: a
    * hot off-diagonal cell means two feeds syndicate the same
    * articles (fix the ingest), a hot diagonal cell means one source
    * re-serves its own content (fix the crawler). Scale shape: the
    * pair table is bounded by the true near-dup population; the
    * source attach is two doc_id-keyed equi-joins left stats-driven
    * (pairs broadcast when tiny, SMJ when a high-dup corpus grows
    * them — deliberately NOT a forced broadcast, the q110 lesson);
    * the final rollup is k² sources at most, map-side combined. */
  /** q125's rollup from an already-built pair table (see
    * [[clusterSizesFrom]]); `src` is `documents(doc_id, source)`. */
  private[graft] def dupSourceMatrixFrom(pairs: DataFrame, src: DataFrame): DataFrame =
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_x"),
        greatest(col("sa"), col("sb")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"), avg(col("jaccard")).as("mean_jaccard"))

  private val dupSourceMatrix = Q(
    "q125_dup_source_matrix",
    (s, d) => {
      import s.implicits._
      dupSourceMatrixFrom(jaccardPairs(s, d),
        T.documents(s, d).select($"doc_id", $"source"))
    },
    Some(s"""WITH $pairsCtes
      SELECT least(x.source, y.source) AS source_x,
             greatest(x.source, y.source) AS source_y,
             count(*) AS n_pairs, avg(j) AS mean_jaccard
      FROM jpairs p JOIN documents x ON p.da = x.doc_id
                    JOIN documents y ON p.db = y.doc_id
      GROUP BY 1, 2"""),
    bench = true)

  /** Train/test split LEAKAGE matrix: near-dup pairs (the shared
    * [[jaccardPairs]] pipeline, q41's threshold) attributed to the
    * split pair q106's deterministic md5 rule assigns their docs —
    * the eval-hygiene measurement behind q106's leakage note: a test
    * doc with a train near-twin inflates benchmark numbers exactly
    * like q82-style contamination, but from WITHIN the corpus, where
    * no external probe list can catch it. Cells with
    * `is_leak = true` (cross-split) are the damage; the within-split
    * diagonal is the denominator context. Same scale shape as q125:
    * pair table bounded by the dup population, two stats-driven
    * doc_id joins, ≤9-cell rollup. The fix the numbers motivate is
    * also q106's note: key the split hash on a provenance GROUP, not
    * the doc, so near-copies can't straddle. */
  /** q127's rollup from an already-built pair table (see
    * [[clusterSizesFrom]]); `splits` is `(doc_id, split)`. */
  private[graft] def splitLeakageFrom(pairs: DataFrame, splits: DataFrame): DataFrame =
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("pa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("pb")), "doc_b")
      .groupBy(least(col("pa"), col("pb")).as("split_x"),
        greatest(col("pa"), col("pb")).as("split_y"))
      .agg(count(lit(1)).as("n_pairs"), avg(col("jaccard")).as("mean_jaccard"))
      .withColumn("is_leak", col("split_x") =!= col("split_y"))

  private val splitLeakage = Q(
    "q127_split_leakage",
    (s, d) => {
      import s.implicits._
      // assignment single-sourced in SplitRule (q106 shares it)
      splitLeakageFrom(jaccardPairs(s, d),
        T.documents(s, d).select($"doc_id",
          SplitRule.assign($"doc_id").as("split")))
    },
    Some(s"""WITH $pairsCtes,
      sp AS (SELECT doc_id, ${SplitRule.sqlCase("doc_id")} AS split
             FROM documents)
      SELECT least(x.split, y.split) AS split_x,
             greatest(x.split, y.split) AS split_y,
             count(*) AS n_pairs, avg(j) AS mean_jaccard,
             least(x.split, y.split) <> greatest(x.split, y.split) AS is_leak
      FROM jpairs p JOIN sp x ON p.da = x.doc_id
                    JOIN sp y ON p.db = y.doc_id
      GROUP BY 1, 2"""))

  /** Directional containment source matrix: q116's containment pairs
    * (the SAME registered fn — q126's composition discipline)
    * attributed to (contained_source, container_source) ORDERED
    * cells — the asymmetric complement of q125's mirror matrix: a
    * hot A→B cell with a cold B→A cell says feed B WRAPS feed A's
    * content (aggregators, quote farms, boilerplate hosts), telling
    * the ingest which side to keep before any survivor policy runs.
    * Same scale shape as q125: pair table bounded by the containment
    * population, two stats-driven doc_id attach joins, ≤k²-cell
    * map-side-combined rollup. */
  private val containSourceMatrix = Q(
    "q137_contain_source_matrix",
    (s, d) => {
      import s.implicits._
      val src = T.documents(s, d).select($"doc_id", $"source")
      containmentDedup.fn(s, d)
        .join(src.select($"doc_id".as("contained"),
          $"source".as("contained_source")), "contained")
        .join(src.select($"doc_id".as("container"),
          $"source".as("container_source")), "container")
        .groupBy($"contained_source", $"container_source")
        .agg(count(lit(1)).as("n_pairs"),
          avg($"containment").as("mean_containment"))
    },
    Some(s"""WITH p AS (
        SELECT contained, container, containment
        FROM (${containmentDedup.oracle.get}))
      SELECT x.source AS contained_source, y.source AS container_source,
        count(*) AS n_pairs, avg(containment) AS mean_containment
      FROM p JOIN documents x ON p.contained = x.doc_id
             JOIN documents y ON p.container = y.doc_id
      GROUP BY 1, 2"""))

  /** Store-build/probe bench SPLITS (round-10): the three store-backed
    * bench queries pay a one-off store-side build whose cost hid
    * inside their first timed rep (BENCH_DETAIL r9: q118 18.0 s rep 1
    * vs 2.5 s steady, q123 9.9 s, q125 4.5 s) — trimmed stats drop
    * the outlier, so a PROBE-side regression was invisible round over
    * round. Each entry is (name, setup, probe): `setup` builds the
    * store-side frame (the amortized-once cost at daily cadence);
    * `probe` consumes the CACHED setup through the same operator path
    * the gated query runs, so the probe row prices exactly the
    * recurring per-ingest work. [[graft.Bench]] times them as
    * `qNNN_setup` / `qNNN_probe` rows (excluded from the headline
    * total — the combined rows keep the cross-round series). */
  private[graft] def benchSplits: Seq[(String,
      (SparkSession, String) => Seq[DataFrame],
      (SparkSession, String, Seq[DataFrame]) => DataFrame)] = Seq(
    // q118's setup builds BOTH store-side frames a real daily ingest
    // amortizes: the sets table AND (round 11) the pre-aggregated
    // shingle-df table the hot-key guard reads
    // ([[graft.operators.DedupStore.ingestContained]] persists it
    // per-day; here it stands in cached). The probe then prices
    // exactly the recurring per-ingest work: delta shingling, the
    // guard's delta-count fold, the candidate joins, verification.
    ("q118",
      (s, d) => {
        import s.implicits._
        val store = graft.operators.IncrementalNearDedup.shingleSets(
          T.documents(s, d).filter($"doc_id" % 2 === 0))
        Seq(store, graft.operators.IncrementalContainment.shingleDf(store))
      },
      (s, d, fr) => {
        import s.implicits._
        graft.operators.IncrementalContainment.containedPairs(
          T.documents(s, d).filter($"doc_id" % 2 === 1), fr(0),
          storeDf = Some(fr(1)))
      }),
    ("q123",
      (s, d) => Seq(q123Ref(s, d)),
      (s, d, fr) => q123Score(s, d, fr.head)),
    ("q125",
      (s, d) => Seq(jaccardPairs(s, d)),
      (s, d, fr) => dupSourceMatrixFrom(fr.head,
        T.documents(s, d).select(col("doc_id"), col("source")))))

  def qs: Seq[Q] = Seq(exactDedup, jaccardDedup, minhashLsh, simhash,
    cosineNearDup, cosineIncremental, cosClusters, repeatedSpans, ccClusters, jaccardPrefix, dedupPrune,
    boilerplate, incrementalDedup, keepLongest, clusterSizeDist,
    containmentDedup, incrementalContainment, incrementalContainmentDf,
    spanCut, shingleNovelty, dupSourceMatrix, splitLeakage,
    containSourceMatrix)
}
