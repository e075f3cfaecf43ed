package graft.queries

import graft.{Q, Tables => T}
import graft.functions.Vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>[64]`)
  * — training-data-pipeline extension (nearest the reference gets is
  * the broadcast feature-map probe, `transforms/Features.java:90-103`).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline; broadcast the (small)
  *    query set against the full table — O(|Q|·n) with no shuffle of
  *    the big side. Correct at any scale where |Q| is small.
  *  - hyperplane-LSH buckets: the 100 TB path. Each vector gets a
  *    6-bit signed-random-projection signature; candidates = same
  *    bucket (equi-join on the bucket key — shuffle is per-bucket).
  *    Deterministic: hyperplane signs derive from md5 parity, so the
  *    DuckDB oracle reproduces the same buckets exactly.
  */
object SimilarityQueries {

  private val NPlanes = 6
  private val Dim = 64

  /** The broadcast sides below (query set, IVF centroids) are derived
    * as `vec_id % 50` — 2% of the CORPUS, so they grow with it and
    * would break a naive broadcast silently at 100 TB. Round 3 made
    * the smallness assumption a hard guard (fail loudly past the
    * cap); round 4 replaces refusal with the real scale path:
    * CHUNKED broadcast. A distributed count (one pruned scan) sizes
    * the side; past the cap it splits into ⌈n/cap⌉ hash-chunks, each
    * broadcast separately, and callers union the per-chunk results
    * BEFORE any cross-chunk ranking window — so the result is
    * identical to the single-broadcast plan (the union covers the
    * whole small side; top-k ranks across all chunks). What chunking
    * actually bounds: each BROADCAST (driver build, torrent block,
    * per-join hash-relation build) stays under the cap and under
    * Spark's hard 8 GB per-broadcast limit. It does NOT shrink
    * aggregate executor STORAGE — all chunks belong to one unioned
    * query, so their broadcast blocks stay resident together for the
    * query's duration (≈ the full small side; processing chunks as
    * separate jobs with unpersist between them would bound that too,
    * at the price of one output pass per chunk), and each chunk
    * re-runs the small side's derivation scan plus one driver count.
    * Total compute stays the same O(n·|Q|) the exact algorithm costs
    * — chunking fixes per-broadcast limits, not work; the
    * cheaper-work paths remain q46/q47's bucketed candidates. */
  private val DefaultMaxBroadcastRows = 500000L
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private[graft] def broadcastChunks(df: org.apache.spark.sql.DataFrame,
      keyCol: org.apache.spark.sql.Column, what: String): Seq[org.apache.spark.sql.DataFrame] = {
    val cap = df.sparkSession.conf
      .getOption("graft.maxBroadcastRows").map(_.toLong)
      .getOrElse(DefaultMaxBroadcastRows)
    val n = df.count()
    if (n <= cap) Seq(broadcast(df))
    else {
      val nch = math.ceil(n.toDouble / cap).toInt
      log.warn(s"$what has $n rows (cap $cap) — chunked broadcast, $nch chunks")
      (0 until nch).map(i =>
        broadcast(df.filter(pmod(xxhash64(keyCol), lit(nch)) === i)))
    }
  }

  /** ±1 hyperplane weights from md5 parity of "plane|dim" — single
    * source of truth in [[graft.functions.SrpSigImpl]] (empty salt =
    * this family), interpolated into the DuckDB oracle and evaluated
    * natively on the Spark side by the `srp_sig` expression. */
  private lazy val wDuckArr = // DuckDB literal: list of lists
    (0 until NPlanes)
      .map(h => graft.functions.SrpSigImpl.planeWeights("", h, Dim)
        .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** Native single-table bucket: srp_sig's one JIT loop per row
    * replaces the interpreted planes×dim HOF fold (bit-equality
    * spec'd in ExpressionSpec). */
  private lazy val bucketSparkExpr = s"srp_sig(embedding, '', 1, $NPlanes)[0]"

  /** Exact brute-force cosine top-5 for each query vector
    * (vec_id % 50 == 0 — the query set grows with the table).
    * Query side is broadcast (chunked past the cap — see
    * [[broadcastChunks]]); big side is scanned once per chunk,
    * row-local dot products, then a per-query top-k window across all
    * chunks' |Q|·n rows. */
  private val bruteForceTopK = Q(
    "q45_ann_bruteforce",
    (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        // usable vectors only, per SIDE and before any join (the
        // ingestCosine NaN-poisoning rule): a NULL/zero-norm vector
        // has no defined similarity, and a NaN/Inf element would
        // otherwise rank FIRST in every top-k (Spark orders NaN above
        // all doubles). One O(n) filter; the oracle's n CTE mirrors
        // it, so the scopes stay provably identical.
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
      val qset = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_vec"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
      val scored = broadcastChunks(qset, $"q_vec", "ANN query set")
        .map(q => e.crossJoin(q)
          .filter($"vec_id" =!= $"q_vec")
          .select($"q_vec", $"vec_id",
            Vectors.cosineWithNorms($"q_emb", $"embedding", $"q_nrm", $"nrm").as("cosine")))
        .reduce(_ union _)
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"cosine".desc, $"vec_id".asc)))
        .filter($"rank" <= 5)
    },
    Some("""WITH n AS (SELECT * FROM (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))) nrm
        FROM embeddings) WHERE nrm > 0 AND isfinite(nrm)),
      q AS (SELECT vec_id q_vec, embedding q_emb, nrm q_nrm FROM n WHERE vec_id % 50 = 0),
      sc AS (SELECT q.q_vec, n.vec_id,
        list_sum(list_transform(range(64), i ->
          CAST(q.q_emb[i+1] AS DOUBLE) * CAST(n.embedding[i+1] AS DOUBLE)))
          / (q.q_nrm * n.nrm) AS cosine
        FROM n CROSS JOIN q WHERE n.vec_id <> q.q_vec)
      SELECT q_vec, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec ORDER BY cosine DESC, vec_id ASC) rank
        FROM sc) WHERE rank <= 5"""),
    bench = true)

  /** LSH-bucketed ANN: same queries/k, but candidates restricted to
    * the query's hyperplane bucket — approximate by design; results
    * are the deterministic bucketed answer in both engines. */
  private val lshTopK = Q(
    "q46_ann_lsh",
    (s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val e = T.embeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        // usable vectors only, per SIDE and before any join (the
        // ingestCosine NaN-poisoning rule): a NULL/zero-norm vector
        // has no defined similarity, and a NaN/Inf element would
        // otherwise rank FIRST in every top-k (Spark orders NaN above
        // all doubles). One O(n) filter; the oracle's n CTE mirrors
        // it, so the scopes stay provably identical.
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
        .withColumn("bucket", expr(bucketSparkExpr))
      val qset = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_vec"), $"embedding".as("q_emb"),
          $"nrm".as("q_nrm"), $"bucket")
      val scored = broadcastChunks(qset, $"q_vec", "ANN query set")
        .map(q => e.join(q, Seq("bucket"))
          .filter($"vec_id" =!= $"q_vec")
          .select($"q_vec", $"vec_id",
            Vectors.cosineWithNorms($"q_emb", $"embedding", $"q_nrm", $"nrm").as("cosine")))
        .reduce(_ union _)
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"cosine".desc, $"vec_id".asc)))
        .filter($"rank" <= 5)
    },
    Some(s"""WITH w AS (SELECT $wDuckArr m),
      n AS (SELECT * FROM (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))) nrm,
        CAST(list_sum(list_transform(range($NPlanes), h ->
          CASE WHEN list_sum(list_transform(range($Dim), d2 ->
                 CAST(embedding[d2+1] AS DOUBLE) * m[h+1][d2+1])) > 0
          THEN 1::BIGINT << (${NPlanes - 1} - h) ELSE 0::BIGINT END)) AS BIGINT) bucket
        FROM embeddings CROSS JOIN w) WHERE nrm > 0 AND isfinite(nrm)),
      q AS (SELECT vec_id q_vec, embedding q_emb, nrm q_nrm, bucket FROM n WHERE vec_id % 50 = 0),
      sc AS (SELECT q.q_vec, n.vec_id,
        list_sum(list_transform(range($Dim), i ->
          CAST(q.q_emb[i+1] AS DOUBLE) * CAST(n.embedding[i+1] AS DOUBLE)))
          / (q.q_nrm * n.nrm) AS cosine
        FROM n JOIN q USING (bucket) WHERE n.vec_id <> q.q_vec)
      SELECT q_vec, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec ORDER BY cosine DESC, vec_id ASC) rank
        FROM sc) WHERE rank <= 5"""))

  /** IVF-style ANN: coarse quantization. Centroids = the deterministic
    * vec_id%50==1 subset (at real scale: k-means output); every vector
    * is assigned to its max-cosine cell (one broadcast join — the
    * 100 TB partitioning step); queries probe their nprobe=2 best
    * cells and rank only those cells' members. Approximate by design;
    * deterministic and identical in both engines. */
  private val ivfTopK = Q(
    "q47_ann_ivf",
    (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        // usable vectors only, per SIDE and before any join (the
        // ingestCosine NaN-poisoning rule): a NULL/zero-norm vector
        // has no defined similarity, and a NaN/Inf element would
        // otherwise rank FIRST in every top-k (Spark orders NaN above
        // all doubles). One O(n) filter; the oracle's n CTE mirrors
        // it, so the scopes stay provably identical.
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
      val cents = e.filter($"vec_id" % 50 === 1)
        .select($"vec_id".as("cid"), $"embedding".as("c_emb"), $"nrm".as("c_nrm"))
      val centChunks = broadcastChunks(cents, $"cid", "IVF centroid set")
      // cell assignment: best centroid per vector — the rank window
      // runs over the UNION of all chunks, so chunking can't change
      // which centroid wins
      val wAssign = Window.partitionBy($"vec_id")
        .orderBy($"c_cos".desc, $"cid".asc)
      val assigned = centChunks
        .map(c => e.crossJoin(c)
          .select($"vec_id", $"embedding", $"nrm", $"cid",
            Vectors.cosineWithNorms($"embedding", $"c_emb", $"nrm", $"c_nrm").as("c_cos")))
        .reduce(_ union _)
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1)
        .select($"vec_id", $"embedding", $"nrm", $"cid")
      // queries probe nprobe=2 cells
      val wProbe = Window.partitionBy($"q_vec").orderBy($"c_cos".desc, $"cid".asc)
      val probes = centChunks
        .map(c => e.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("q_vec"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
          .crossJoin(c)
          .select($"q_vec", $"q_emb", $"q_nrm", $"cid",
            Vectors.cosineWithNorms($"q_emb", $"c_emb", $"q_nrm", $"c_nrm").as("c_cos")))
        .reduce(_ union _)
        .withColumn("rn", row_number().over(wProbe))
        .filter($"rn" <= 2)
        .select($"q_vec", $"q_emb", $"q_nrm", $"cid")
      val scored = probes.join(assigned, Seq("cid"))
        .filter($"vec_id" =!= $"q_vec")
        .select($"q_vec", $"vec_id",
          Vectors.cosineWithNorms($"q_emb", $"embedding", $"q_nrm", $"nrm").as("cosine"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"cosine".desc, $"vec_id".asc)))
        .filter($"rank" <= 5)
    },
    Some(s"""WITH n AS (SELECT * FROM (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))) nrm
        FROM embeddings) WHERE nrm > 0 AND isfinite(nrm)),
      c AS (SELECT vec_id cid, embedding c_emb, nrm c_nrm FROM n WHERE vec_id % 50 = 1),
      ac AS (SELECT n.vec_id, n.embedding, n.nrm, c.cid,
               list_sum(list_transform(range($Dim), i ->
                 CAST(n.embedding[i+1] AS DOUBLE) * CAST(c.c_emb[i+1] AS DOUBLE)))
                 / (n.nrm * c.c_nrm) c_cos
             FROM n CROSS JOIN c),
      assigned AS (SELECT vec_id, embedding, nrm, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cid ASC) rn FROM ac)
        WHERE rn = 1),
      qc AS (SELECT n.vec_id q_vec, n.embedding q_emb, n.nrm q_nrm, c.cid,
               list_sum(list_transform(range($Dim), i ->
                 CAST(n.embedding[i+1] AS DOUBLE) * CAST(c.c_emb[i+1] AS DOUBLE)))
                 / (n.nrm * c.c_nrm) c_cos
             FROM n CROSS JOIN c WHERE n.vec_id % 50 = 0),
      probes AS (SELECT q_vec, q_emb, q_nrm, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec ORDER BY c_cos DESC, cid ASC) rn FROM qc)
        WHERE rn <= 2),
      sc AS (SELECT p.q_vec, a.vec_id,
               list_sum(list_transform(range($Dim), i ->
                 CAST(p.q_emb[i+1] AS DOUBLE) * CAST(a.embedding[i+1] AS DOUBLE)))
                 / (p.q_nrm * a.nrm) cosine
             FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id <> p.q_vec)
      SELECT q_vec, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec ORDER BY cosine DESC, vec_id ASC) rank
        FROM sc) WHERE rank <= 5"""))

  /** Symmetric int8 quantization of embeddings (the storage/bandwidth
    * play for vector corpora): per-vector scale = 127/max|x|,
    * q = ⌊x·scale + 0.5⌋ (explicit floor-rounding — engine round()
    * half-way semantics differ, floor(x+0.5) is identical in both),
    * plus reconstruction-error stats. Row-local, codegen'd. */
  private val quantize = Q(
    "q48_embedding_quantize",
    (s, d) => {
      import s.implicits._
      T.embeddings(s, d)
        .withColumn("mx", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
        .filter($"mx" > 0.0 && !isnan($"mx") && $"mx" < lit(Double.PositiveInfinity))
        .withColumn("scale", lit(127.0) / $"mx")
        .select($"vec_id", $"scale",
          // to_json: int payload serializes identically in DuckDB; raw
          // array cells break the driver's pandas row-sort
          to_json(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT))"))
            .as("q8"),
          expr("""aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) ->
              greatest(a, abs(CAST(x AS DOUBLE)
                - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)))""")
            .as("max_abs_err"))
    },
    Some("""WITH m AS (SELECT vec_id, embedding,
        list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') mx
        FROM embeddings)
      SELECT vec_id, 127.0 / mx AS scale,
        to_json(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) AS INTEGER))) AS q8,
        list_aggregate(list_transform(embedding, x ->
          abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) / (127.0 / mx))), 'max') AS max_abs_err
      FROM m WHERE mx > 0.0 AND isfinite(mx)"""))

  /** Embedding centering statistics — the standard ANN preprocessing
    * pass (IVF cell balance and SRP bucket quality both improve on
    * mean-centered vectors; a far-off-center corpus wastes hyperplane
    * bits on the common offset): per-dimension corpus centroid, then
    * per vector its Euclidean distance to the centroid and its cosine
    * against the centroid direction — the two diagnostics that decide
    * whether centering is worth a reindex.
    *
    * Plan: the centroid is a Dim-row aggregate (posexplode → per-dim
    * avg, partial+final over 64 groups) reassembled into ONE array row
    * and broadcast back through the capped 1-row cross join (the q32
    * offsets shape); every per-vector term is then a row-local
    * zip_with/aggregate HOF. The corpus is never shuffled — at 100 TB
    * the only exchange carries 64·partitions partial sums. */
  private val centerStats = Q(
    "q113_embedding_center_stats",
    (s, d) => {
      import s.implicits._
      // dim guard (round 9): a ragged (short) vector would zip_with
      // null-pad against the centroid and NULL the stats while the SQL
      // oracle's per-dim sum silently skips missing dims — divergent
      // semantics on malformed input. Both sides now DROP off-dim rows
      // (a no-op on conforming corpora; malformed vectors are a data
      // bug to surface upstream, not to average over).
      // finite guard (round 12): unlike the row-local q08/q17 (where a
      // NaN vector poisons only its own row — honest output), ONE
      // NaN/Inf element here would NaN the per-dim centroid and poison
      // EVERY row's stats; both sides drop non-finite vectors (zero
      // norm stays — its NULL cosine is the deliberate nullif case).
      val emb = T.embeddings(s, d)
        .filter(size($"embedding") === Dim)
        .withColumn("__n2", Vectors.dot($"embedding", $"embedding"))
        .filter(!isnan($"__n2") && $"__n2" < lit(Double.PositiveInfinity))
        .select($"vec_id", transform($"embedding", x => x.cast("double")).as("e"))
      val mu = emb
        .select(posexplode($"e").as(Seq("pos", "v")))
        .groupBy($"pos").agg(avg($"v").as("m"))
        .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
        .select(transform($"pm", x => x.getField("m")).as("mu")) // 1 row
      emb.crossJoin(broadcast(mu))
        .withColumn("c", zip_with($"e", $"mu", (x, m) => x - m))
        .select($"vec_id",
          sqrt(aggregate($"c", lit(0.0), (a, x) => a + x * x))
            .as("dist_to_centroid"),
          // nullif: a zero-norm vector (or degenerate centroid) yields
          // NULL cosine in both engines instead of a divide-by-zero
          (aggregate(zip_with($"e", $"mu", (x, m) => x * m),
            lit(0.0), (a, x) => a + x) /
            nullif(sqrt(aggregate($"e", lit(0.0), (a, x) => a + x * x)) *
              sqrt(aggregate($"mu", lit(0.0), (a, x) => a + x * x)), lit(0.0)))
            .as("cos_to_centroid"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
               WHERE len(embedding) = $Dim
                 AND isfinite(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      dims AS (SELECT unnest(generate_series(1, $Dim)) AS i),
      m AS (SELECT i, avg(CAST(embedding[i] AS DOUBLE)) AS mu
            FROM e CROSS JOIN dims GROUP BY i),
      st AS (SELECT e.vec_id,
               sum((CAST(e.embedding[m.i] AS DOUBLE) - m.mu)
                 * (CAST(e.embedding[m.i] AS DOUBLE) - m.mu)) AS ss,
               sum(CAST(e.embedding[m.i] AS DOUBLE) * m.mu) AS em,
               sum(CAST(e.embedding[m.i] AS DOUBLE)
                 * CAST(e.embedding[m.i] AS DOUBLE)) AS ee,
               sum(m.mu * m.mu) AS mm
             FROM e CROSS JOIN m GROUP BY e.vec_id)
      SELECT vec_id, sqrt(ss) AS dist_to_centroid,
             em / nullif(sqrt(ee) * sqrt(mm), 0) AS cos_to_centroid
      FROM st"""))

  /** ANN recall report: per query vector, recall@5 of the LSH (q46)
    * and IVF (q47) candidate generators against the exact brute-force
    * answer (q45) — THE acceptance metric for an approximate index
    * (is nprobe/bit-budget enough for this corpus?), computed from
    * the three already-gated queries so the report can never disagree
    * with what the registry actually serves. Both approximations are
    * deterministic, so recall is a fact of the corpus, not an
    * estimate — and the oracle recomputes it from the three oracle
    * SQLs composed as subqueries (engines agree on each part, so
    * equality here proves the composition too). Scale shape: the
    * three top-k frames are |Q|·5 rows; everything after them is
    * (q_vec, vec_id)-keyed joins and a per-query aggregate on tiny
    * frames — the heavy lifting is the underlying queries' own
    * guarded plans. */
  private val annRecall = Q(
    "q126_ann_recall",
    (s, d) => {
      import s.implicits._
      val ex = bruteForceTopK.fn(s, d).select($"q_vec", $"vec_id")
      def recallOf(approx: org.apache.spark.sql.DataFrame, name: String) = {
        val a = approx.select($"q_vec", $"vec_id").withColumn("hit", lit(1L))
        ex.join(a, Seq("q_vec", "vec_id"), "left")
          .groupBy($"q_vec")
          .agg((sum(coalesce($"hit", lit(0L))).cast("double") /
            count(lit(1))).as(name))
      }
      recallOf(lshTopK.fn(s, d), "recall_lsh")
        .join(recallOf(ivfTopK.fn(s, d), "recall_ivf"), Seq("q_vec"))
    },
    Some(s"""WITH ex0 AS (SELECT q_vec, vec_id FROM (${bruteForceTopK.oracle.get})),
      l0 AS (SELECT q_vec, vec_id FROM (${lshTopK.oracle.get})),
      i0 AS (SELECT q_vec, vec_id FROM (${ivfTopK.oracle.get})),
      rl AS (SELECT e.q_vec, CAST(count(l.vec_id) AS DOUBLE)/count(*) AS recall_lsh
             FROM ex0 e LEFT JOIN l0 l ON e.q_vec = l.q_vec AND e.vec_id = l.vec_id
             GROUP BY e.q_vec),
      ri AS (SELECT e.q_vec, CAST(count(i.vec_id) AS DOUBLE)/count(*) AS recall_ivf
             FROM ex0 e LEFT JOIN i0 i ON e.q_vec = i.q_vec AND e.vec_id = i.vec_id
             GROUP BY e.q_vec)
      SELECT rl.q_vec, recall_lsh, recall_ivf FROM rl JOIN ri USING (q_vec)"""))

  /** Quantized-serving recall: top-5 cosine search run on q48's int8
    * RECONSTRUCTION (q = ⌊x·s + 0.5⌋ at s = 127/max|x|, then q/s —
    * the exact rule q48 gates, applied rather than reported) scored
    * for recall@5 against q45's float-exact answer — the acceptance
    * test for serving the index at 4 bytes → 1 byte per dimension:
    * recall ≈ 1 says the int8 copy can serve, the per-query rows say
    * WHICH queries degrade (boundary queries with near-tied
    * neighbors flip first). Same plan shape as q45 (chunk-guarded
    * broadcast query set, row-local arithmetic, per-query top-k
    * window); the reconstruction is array<double>, so the dot
    * product is the HOF fold ([[Vectors.dotHof]] — the native VecDot
    * is float-typed), acceptable here because the whole query is a
    * diagnostic, not a serving path. Both sides run over the SAME
    * quantizable scope (mx > 0, ONE `base` frame — q48's drop rule):
    * the baseline is RE-RANKED within that scope, not q45's answer
    * post-filtered — a post-filter would silently turn the metric
    * into recall@(5−k) whenever k zero-norm vectors top q45's NaN
    * ranks, because ranks 6+ of the quantizable sub-corpus were
    * never materialized to take their place. A no-op on conforming
    * corpora (scope == corpus); a true recall@5 on degenerate
    * ones. */
  private val quantizedRecall = Q(
    "q136_quantized_recall",
    (s, d) => {
      import s.implicits._
      val base = T.embeddings(s, d)
        .withColumn("mx", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
        .filter($"mx" > 0.0 && !isnan($"mx") && $"mx" < lit(Double.PositiveInfinity))
      def top5(vecs: org.apache.spark.sql.DataFrame, what: String) = {
        val qset = vecs.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("q_vec"), $"e".as("qe"), $"nrm".as("qn"))
        broadcastChunks(qset, $"q_vec", what)
          .map(q => vecs.crossJoin(q)
            .filter($"vec_id" =!= $"q_vec")
            .select($"q_vec", $"vec_id",
              (Vectors.dotHof($"qe", $"e") / ($"qn" * $"nrm")).as("cosine")))
          .reduce(_ union _)
          .withColumn("rank", row_number().over(
            Window.partitionBy($"q_vec").orderBy($"cosine".desc, $"vec_id".asc)))
          .filter($"rank" <= 5)
          .select($"q_vec", $"vec_id")
      }
      val exact = top5(base.select($"vec_id",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
        .withColumn("nrm", sqrt(Vectors.dotHof($"e", $"e"))),
        "int8-recall float query set")
      val approx = top5(base.select($"vec_id", expr(
        "transform(embedding, x -> floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) / (127.0 / mx))")
        .as("e"))
        .withColumn("nrm", sqrt(Vectors.dotHof($"e", $"e"))),
        "int8-recall recon query set")
        .withColumn("hit", lit(1L))
      exact.join(approx, Seq("q_vec", "vec_id"), "left")
        .groupBy($"q_vec")
        .agg((sum(coalesce($"hit", lit(0L))).cast("double") / count(lit(1)))
          .as("recall_int8"))
    },
    Some(s"""WITH m AS (SELECT vec_id, embedding,
        list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') mx
        FROM embeddings),
      nf AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM m WHERE mx > 0.0 AND isfinite(mx)),
      nf2 AS (SELECT vec_id, e,
        sqrt(list_sum(list_transform(e, x -> x * x))) nrm FROM nf),
      qf AS (SELECT vec_id q_vec, e qe, nrm qn FROM nf2 WHERE vec_id % 50 = 0),
      scf AS (SELECT q.q_vec, n.vec_id,
        list_sum(list_transform(range($Dim), i -> q.qe[i+1] * n.e[i+1]))
          / (q.qn * n.nrm) AS cosine
        FROM nf2 n CROSS JOIN qf q WHERE n.vec_id <> q.q_vec),
      ex0 AS (SELECT q_vec, vec_id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_vec ORDER BY cosine DESC, vec_id ASC) rank FROM scf)
        WHERE rank <= 5),
      r AS (SELECT vec_id, list_transform(embedding,
          x -> floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) / (127.0 / mx)) AS e
        FROM m WHERE mx > 0.0 AND isfinite(mx)),
      n AS (SELECT vec_id, e,
        sqrt(list_sum(list_transform(e, x -> x * x))) nrm FROM r),
      q AS (SELECT vec_id q_vec, e qe, nrm qn FROM n WHERE vec_id % 50 = 0),
      sc AS (SELECT q.q_vec, n.vec_id,
        list_sum(list_transform(range($Dim), i -> q.qe[i+1] * n.e[i+1]))
          / (q.qn * n.nrm) AS cosine
        FROM n CROSS JOIN q WHERE n.vec_id <> q.q_vec),
      ap AS (SELECT q_vec, vec_id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_vec ORDER BY cosine DESC, vec_id ASC) rank FROM sc)
        WHERE rank <= 5)
      SELECT e.q_vec, CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall_int8
      FROM ex0 e LEFT JOIN ap a ON e.q_vec = a.q_vec AND e.vec_id = a.vec_id
      GROUP BY e.q_vec"""))

  /** ORACLE-GATED trained-IVF SERVING probe (round 12) — the
    * CORRECTNESS row for the [[graft.operators.KMeans]] /
    * [[graft.operators.IvfIndex]] / [[graft.operators.IvfStore]]
    * family, until now the registry's only spec-gated-only operator
    * family. The gate exercises the REAL store lifecycle end-to-end:
    * `init` (k-means-trained frozen centroids) + two `append`ed days
    * into a scratch root, then a FULL probe (nprobe = k) of every
    * query vector. Full-probe IVF is EXACT global L2 top-k over the
    * committed union by construction — the pruning can only drop
    * cells the probe list excludes, and here it excludes none — so a
    * DuckDB brute-force L2 top-k oracle must match bit-for-bit
    * REGARDLESS of training quality (the IvfIndexSpec assertion,
    * lifted into the driver's independent-engine gate). What equality
    * proves: assignment loses no vector, day markers commit exactly
    * the appended rows, the probe's union-read + distance + ranking
    * reproduce exact semantics. What it deliberately does NOT grade:
    * recall at nprobe < k (that is q126/q136's report territory, and
    * IvfStoreSpec pins the file-pruning metrics).
    *
    * Queries are the vec_id % 50 slice COLLECTED to the driver —
    * [[graft.operators.IvfIndex.probe]]'s documented ANN serving
    * shape (requests arrive in small batches), size-guarded like
    * every driver-side collect in the engine. The scratch root lives
    * under java.io.tmpdir for exactly the call's duration: the probe
    * result is localCheckpoint-materialized (the frame outlives the
    * files), then the root is deleted — rerunning the gate leaks
    * nothing. Both engines read ONLY dim-conforming FINITE vectors
    * (the q113 ragged-row + finite rules;
    * [[graft.operators.KMeans.assign]] corrupt-drops both classes on
    * the Spark side anyway — round 13 extended it to NaN/Inf/null
    * elements, whose argmin cell is undefined — so the explicit
    * filter keeps the two scopes provably identical). */
  private val ivfStoreProbe = Q(
    "q146_ivf_store_probe",
    (s, d) => {
      import s.implicits._
      // ONE shared usability predicate (KMeans.usable) on the engine
      // side — the same filter the store's write path applies, so the
      // two scopes are identical by construction, not by parallel
      // maintenance; the oracle below mirrors it in SQL
      val e = T.embeddings(s, d)
        .filter(graft.operators.KMeans.usable("embedding", Dim) &&
          $"vec_id".isNotNull)
        .select($"vec_id", $"embedding")
      val qRows = e.filter($"vec_id" % 50 === 0).collect()
      require(qRows.length <= 100000,
        s"q146 query batch has ${qRows.length} vectors — the driver-side " +
          "probe shape is for small request batches; shard the query set")
      // totality on degenerate corpora: no conforming query vectors
      // (all-null/ragged embeddings) → the empty answer, not a k-means
      // seed failure — the oracle's CROSS JOIN is equally empty
      if (qRows.isEmpty)
        Seq.empty[(Long, Long, Double, Int)].toDF("qid", "vec_id", "dist2", "rank")
      else {
        val root = java.nio.file.Files
          .createTempDirectory("graft-q146-ivfstore-").toString
        try {
          graft.operators.IvfStore.init(e, "vec_id", "embedding", root,
            k = 8, iters = 3)
          // pmod, not %: a negative id's % 2 is -1 in Spark, which
          // would land it in NEITHER day while the oracle's cross
          // join still ranks it — pmod partitions every id
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 0), root, "day-1")
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 1), root, "day-2")
          val queries = qRows.map(r => (r.getLong(0),
            r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1).toSeq
          // probe in broadcast-cap-sized shards (|shard|·nprobe pair
          // rows per call — the probe guard's documented remedy);
          // per-query top-k is shard-independent, so the union is
          // exactly the single-call answer. One shard at gate SFs.
          val shard = math.max(1, (graft.operators.BroadcastGuard.cap(s) / 8).toInt)
          queries.grouped(shard)
            .map(qs0 => graft.operators.IvfStore.probe(s, root,
              "vec_id", "embedding", qs0, nprobe = 8, topK = 5))
            .reduce(_ unionByName _)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        WHERE len(embedding) = $Dim AND vec_id IS NOT NULL
          -- list_sum SKIPS null elements (Spark's HOF aggregate nulls
          -- the row) — the explicit null-element clause keeps the
          -- scopes identical on ragged-element corpora
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND isfinite(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id % 50 = 0),
      sc AS (SELECT q.qid, e.vec_id,
        list_sum(list_transform(range($Dim), i ->
          (CAST(e.embedding[i+1] AS DOUBLE) - CAST(q.qe[i+1] AS DOUBLE))
          * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(q.qe[i+1] AS DOUBLE)))) AS dist2
        FROM e CROSS JOIN q)
      SELECT qid, vec_id, dist2, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY dist2 ASC, vec_id ASC) rank FROM sc)
      WHERE rank <= 5"""),
    bench = true) // round 13: store-lifecycle timing tracked in BENCH_DETAIL

  // ---------------------------------------------------------------
  // Product quantization (q147/q148) — the MEMORY side of the 100 TB
  // ANN story. IVF (q47/q146) bounds how many pairs a probe touches;
  // PQ bounds what each touched pair costs: the corpus is encoded to
  // m=8 codeword indices (8 ints vs 64 floats — 8× fewer cells, ~32×
  // fewer bytes at byte codes), and scoring a pair is m lookups into
  // a per-query table (ADC, Jégou et al. TPAMI 2011) instead of a
  // dim-wide float kernel. The TRAINED path (per-subspace k-means)
  // is [[graft.operators.ProductQuantizer]], spec-gated in PqSpec;
  // these oracle twins fix the encode/ADC arithmetic itself with a
  // deterministic SAMPLED codebook (the q47 IVF-centroid discipline:
  // codewords = the vec_id % 25 = 3 slice, so DuckDB reproduces the
  // exact codes, distances and ranks — no k-means in the oracle).
  // ---------------------------------------------------------------

  private val PqM = 8 // subspaces; subDim = Dim / PqM = 8

  /** Exploded-subspace view shared by the q147/q148 Spark sides:
    * (id, s ∈ 0..7, 8-wide subvector slice). */
  private def pqSubs(df: org.apache.spark.sql.DataFrame, idAs: String,
      subAs: String): org.apache.spark.sql.DataFrame = {
    val subDim = Dim / PqM
    df.select(col("vec_id").as(idAs),
      posexplode(transform(sequence(lit(0), lit(PqM - 1)), sp =>
        slice(col("embedding"), sp * lit(subDim) + lit(1), lit(subDim)))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", subAs)
  }

  /** ADC top-5 candidate pairs (q_vec, vec_id, adc_d2), self excluded
    * — the body both q147 and q148 rank from.
    *
    * Plan: the codeword slice is chunk-broadcast (it is % of the
    * CORPUS, the q47 growth problem — chunks union before the argmin
    * window so chunking never changes a code); encode is then ONE
    * broadcast-hash join per chunk over the exploded corpus (row
    * count n·m·|codebook chunk|, all map-side); the per-query lookup
    * tables are |Q|·m·|codebook| rows built the same way; ADC itself
    * is an equi-join on (s, code) — the shuffle carries n·m·|Q|
    * slim rows into a (q_vec, vec_id) partial+final hash agg whose
    * 8 subspace terms are summed in FIXED index order (a chain of
    * one-row conditional sums, not a float-reorderable SUM), so the
    * double is bit-identical in both engines. */
  private def pqAdcPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val e = T.embeddings(s, d)
      .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
      // usable vectors only, per SIDE and before any join — the q45
      // scope rule; the oracles' n CTE mirrors it
      .filter($"nrm" > 0 && !isnan($"nrm") &&
        $"nrm" < lit(Double.PositiveInfinity))
    val cwChunks = broadcastChunks(
      pqSubs(e.filter($"vec_id" % 25 === 3), "cid", "csub"),
      $"cid", "PQ codeword set")
    def sub2 (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.operators.ProductQuantizer.d2(a, b)
    // encode the corpus: per (vec_id, s) the argmin codeword; the
    // rank window runs over the UNION of chunks (q47's rule)
    val wCode = Window.partitionBy($"vec_id", $"s")
      .orderBy($"d2c".asc, $"cid".asc)
    val codes = cwChunks
      .map(cw => pqSubs(e, "vec_id", "sub").join(cw, Seq("s"))
        .select($"vec_id", $"s", $"cid", sub2($"sub", $"csub").as("d2c")))
      .reduce(_ union _)
      .withColumn("rn", row_number().over(wCode))
      .filter($"rn" === 1)
      .select($"vec_id", $"s", $"cid")
    // per-query subspace lookup tables (queries stay FLOAT — asymmetric)
    val lut = cwChunks
      .map(cw => pqSubs(e.filter($"vec_id" % 50 === 0), "q_vec", "qsub")
        .join(cw, Seq("s"))
        .select($"q_vec", $"s", $"cid", sub2($"qsub", $"csub").as("qd2")))
      .reduce(_ union _)
    // ADC: m lookups per (query, corpus row), summed in index order
    val fixedOrderSum = (0 until PqM)
      .map(k => sum(when($"s" === k, $"qd2"))).reduce(_ + _)
    codes.join(lut, Seq("s", "cid"))
      .filter($"vec_id" =!= $"q_vec")
      .groupBy($"q_vec", $"vec_id")
      .agg(fixedOrderSum.as("adc_d2"))
  }

  /** Oracle CTE prefix shared by q147/q148 — the same encode/LUT/ADC
    * arithmetic in DuckDB (list folds are in-order left sums in both
    * engines; the 8 subspace terms add as an explicit fixed chain). */
  private lazy val pqOracleCtes: String = {
    val sd = Dim / PqM
    val fixedSum = (0 until PqM)
      .map(k => s"sum(CASE WHEN c.s = $k THEN l.qd2 END)").mkString(" + ")
    s"""WITH n AS (SELECT * FROM (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))) nrm
        FROM embeddings) WHERE nrm > 0 AND isfinite(nrm)),
      sp AS (SELECT unnest(range($PqM)) AS s),
      cs AS (SELECT vec_id, s, list_slice(embedding, s*$sd+1, s*$sd+$sd) AS sub
             FROM n CROSS JOIN sp),
      cw AS (SELECT vec_id AS cid, s, sub AS csub FROM cs WHERE vec_id % 25 = 3),
      ec AS (SELECT c.vec_id, c.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS d2
             FROM cs c JOIN cw w USING (s)),
      codes AS (SELECT vec_id, s, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
          ORDER BY d2 ASC, cid ASC) rn FROM ec) WHERE rn = 1),
      qsub AS (SELECT vec_id AS q_vec, s, sub AS qsub FROM cs WHERE vec_id % 50 = 0),
      lut AS (SELECT q.q_vec, q.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS qd2
             FROM qsub q JOIN cw w USING (s)),
      adc AS (SELECT l.q_vec, c.vec_id, $fixedSum AS adc_d2
             FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
             WHERE c.vec_id <> l.q_vec
             GROUP BY l.q_vec, c.vec_id)"""
  }

  /** PQ/ADC top-5 per query — codes, lookup tables and ranks all
    * reproduced exactly by the oracle (sampled codebook; see the
    * family comment above). */
  private val pqAdcTopK = Q(
    "q147_pq_adc_topk",
    (s, d) => {
      import s.implicits._
      pqAdcPairs(s, d)
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"adc_d2".asc, $"vec_id".asc)))
        .filter($"rank" <= 5)
    },
    Some(s"""$pqOracleCtes
      SELECT q_vec, vec_id, adc_d2, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec
          ORDER BY adc_d2 ASC, vec_id ASC) rank FROM adc) WHERE rank <= 5"""))

  /** recall@5 of the PQ/ADC answer vs the EXACT L2 top-5 (same
    * metric as the ADC estimate, so the recall isolates quantization
    * error — the number an operator reads before shipping a codebook;
    * the q126/q136 recall pattern).
    *
    * Honesty note: the SAMPLED codebook deliberately trades recall
    * for oracle reproducibility — on the gate corpora (near-isotropic
    * synthetic embeddings, m=8) it reads ~0.16 mean recall@5, and
    * that LOW number is the correct answer both engines must agree
    * on. Production recall comes from trained codebooks
    * ([[graft.operators.ProductQuantizer.train]] — PqSpec pins
    * recall 1.0 on separable data) and from re-ranking ADC
    * candidates with float vectors, exactly as IVF recall is q126's
    * measured number, not a constant. */
  private val pqRecall = Q(
    "q148_pq_recall",
    (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
        .filter($"nrm" > 0 && !isnan($"nrm") &&
          $"nrm" < lit(Double.PositiveInfinity))
      val qset = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_vec"), $"embedding".as("q_emb"))
      val exact = broadcastChunks(qset, $"q_vec", "PQ-recall query set")
        .map(q => e.crossJoin(q)
          .filter($"vec_id" =!= $"q_vec")
          .select($"q_vec", $"vec_id",
            graft.operators.ProductQuantizer.d2($"q_emb", $"embedding").as("l2")))
        .reduce(_ union _)
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"l2".asc, $"vec_id".asc)))
        .filter($"rank" <= 5)
        .select($"q_vec", $"vec_id")
      val approx = pqAdcPairs(s, d)
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_vec").orderBy($"adc_d2".asc, $"vec_id".asc)))
        .filter($"rank" <= 5)
        .select($"q_vec", $"vec_id").withColumn("hit", lit(1L))
      exact.join(approx, Seq("q_vec", "vec_id"), "left")
        .groupBy($"q_vec")
        .agg((sum(coalesce($"hit", lit(0L))).cast("double") / count(lit(1)))
          .as("recall_pq"))
    },
    Some(s"""$pqOracleCtes,
      pq5 AS (SELECT q_vec, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec
          ORDER BY adc_d2 ASC, vec_id ASC) rank FROM adc) WHERE rank <= 5),
      exd AS (SELECT q.q_vec, n.vec_id,
        list_sum(list_transform(range($Dim), i ->
          (CAST(q.qe[i+1] AS DOUBLE) - CAST(n.embedding[i+1] AS DOUBLE))
          * (CAST(q.qe[i+1] AS DOUBLE) - CAST(n.embedding[i+1] AS DOUBLE)))) AS l2
        FROM n CROSS JOIN (SELECT vec_id q_vec, embedding qe FROM n
          WHERE vec_id % 50 = 0) q
        WHERE n.vec_id <> q.q_vec),
      ex5 AS (SELECT q_vec, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec
          ORDER BY l2 ASC, vec_id ASC) rank FROM exd) WHERE rank <= 5)
      SELECT e.q_vec,
        CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS recall_pq
      FROM ex5 e LEFT JOIN pq5 p USING (q_vec, vec_id)
      GROUP BY e.q_vec"""))

  /** ORACLE-GATED PQ-ENCODED STORE SERVING (round 15) — the
    * CORRECTNESS row for [[graft.operators.IvfStore.adcProbe]]: the
    * q146 lifecycle (init + enablePq + two appended days into a
    * scratch root) probed through the CODES table at `nprobe = k`.
    * Full-probe ADC is EXACT brute force over the reconstructed
    * committed corpus (ADC distance ≡ L2 to the reconstruction — the
    * PqSpec identity; full probe excludes no cell — the q146
    * argument), so a DuckDB oracle that re-derives the codes, the
    * per-query lookup tables and the ADC sums must match bit-for-bit.
    * What equality proves: encode-at-append writes the argmin code of
    * every committed vector, codebooks round-trip the marker, the
    * probe's LUT + m-lookup fold reproduce exact ADC semantics, and
    * the codes table covers exactly the committed corpus. What it
    * does NOT grade: recall at nprobe < k (q148's territory) and
    * trained-codebook quality (PqSpec).
    *
    * Codebooks are the q147 deterministic SAMPLE (`vec_id % 25 = 3`
    * subvectors, cid-ordered so encode's ties-to-first = the oracle's
    * cid-ASC tie-break) — no k-means in the oracle; the trained path
    * is [[graft.operators.IvfStore.enablePq]]'s other overload,
    * spec-gated in IvfStorePqSpec. */
  private val ivfAdcProbe = Q(
    "q150_ivf_adc_probe",
    (s, d) => {
      import s.implicits._
      val sd = Dim / PqM
      val e = T.embeddings(s, d)
        .filter(graft.operators.KMeans.usable("embedding", Dim) &&
          $"vec_id".isNotNull)
        .select($"vec_id", $"embedding")
      val cwRows = e.filter($"vec_id" % 25 === 3).collect().sortBy(_.getLong(0))
      val qRows = e.filter($"vec_id" % 50 === 0).collect()
      require(cwRows.length.max(qRows.length) <= 100000,
        s"q150 driver-side sets (${cwRows.length} codewords, " +
          s"${qRows.length} queries) — shard past the serving-batch shape")
      if (cwRows.isEmpty || qRows.isEmpty)
        // no codewords (the oracle's codes CTE is empty) or no
        // queries: the empty answer in both engines
        Seq.empty[(Long, Long, Double, Int)].toDF("qid", "vec_id", "adc_d2", "rank")
      else {
        val books = (0 until PqM).map { sIdx =>
          cwRows.toSeq.map(r => r.getSeq[Float](1).map(_.toDouble)
            .slice(sIdx * sd, (sIdx + 1) * sd).toSeq)
        }
        val model = graft.operators.PqModel(Dim, PqM, books)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q150-ivfpq-").toString
        try {
          graft.operators.IvfStore.init(e, "vec_id", "embedding", root,
            k = 8, iters = 3)
          graft.operators.IvfStore.enablePq(s, root, model,
            residual = false): Unit
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 0), root, "day-1")
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 1), root, "day-2")
          val queries = qRows.map(r => (r.getLong(0),
            r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1).toSeq
          // the store shards the batch internally under the broadcast
          // cap since round 16 — one call, chunk-count-invariant
          graft.operators.IvfStore.adcProbe(s, root,
              "vec_id", queries, nprobe = 8, topK = 5)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some {
      val sd = Dim / PqM
      val fixedSum = (0 until PqM)
        .map(k => s"sum(CASE WHEN c.s = $k THEN l.qd2 END)").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        WHERE len(embedding) = $Dim AND vec_id IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND isfinite(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      sp AS (SELECT unnest(range($PqM)) AS s),
      cs AS (SELECT vec_id, s, list_slice(embedding, s*$sd+1, s*$sd+$sd) AS sub
             FROM e CROSS JOIN sp),
      cw AS (SELECT vec_id AS cid, s, sub AS csub FROM cs WHERE vec_id % 25 = 3),
      ec AS (SELECT c.vec_id, c.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS d2
             FROM cs c JOIN cw w USING (s)),
      codes AS (SELECT vec_id, s, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
          ORDER BY d2 ASC, cid ASC) rn FROM ec) WHERE rn = 1),
      qsub AS (SELECT vec_id AS qid, s, sub AS qsub FROM cs WHERE vec_id % 50 = 0),
      lut AS (SELECT q.qid, q.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS qd2
             FROM qsub q JOIN cw w USING (s)),
      adc AS (SELECT l.qid, c.vec_id, $fixedSum AS adc_d2
             FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
             GROUP BY l.qid, c.vec_id)
      SELECT qid, vec_id, adc_d2, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc_d2 ASC, vec_id ASC) rank FROM adc) WHERE rank <= 5"""
    })

  /** ORACLE-GATED RESIDUAL IVF-ADC SERVING (round 16) — the
    * correctness row for [[graft.operators.IvfStore.enablePq]]'s
    * `residual = true` path, the standard IVF-ADC form (codes
    * quantize `vec − assigned-cell centroid`; the probe's lookup
    * tables shift per (query, cell)). Everything the oracle must
    * re-derive is deterministic: CENTROIDS are the 8 id-smallest rows
    * of the `vec_id % 100 = 3` slice (committed via
    * [[graft.operators.IvfStore.initWithCentroids]] — cell assignment
    * is then the argmin DuckDB reproduces, ties to the lowest index,
    * the [[graft.operators.KMeans.assign]] rule), codebooks are the
    * same sampled slice (the q147/q150 discipline at 1/4 the width —
    * the oracle's encode CTE is the sweep's long pole and codebook
    * CONTENT is arbitrary for the identity), and full-probe residual
    * ADC is exact
    * brute force over `centroid + decoded residual` reconstructions —
    * so codes, per-cell LUTs and fixed-order ADC sums must match
    * bit-for-bit. What this adds over q150: the oracle now covers the
    * assignment → residual → encode → shifted-LUT chain, i.e. every
    * arithmetic seam the residual upgrade touched. Trained residual
    * codebooks (accuracy) are IvfStorePqSpec's territory. */
  private val ivfAdcResidualProbe = Q(
    "q151_ivf_adc_residual",
    (s, d) => {
      import s.implicits._
      val sd = Dim / PqM
      val e = T.embeddings(s, d)
        .filter(graft.operators.KMeans.usable("embedding", Dim) &&
          $"vec_id".isNotNull)
        .select($"vec_id", $"embedding")
      val cwRows = e.filter($"vec_id" % 100 === 3).collect().sortBy(_.getLong(0))
      val qRows = e.filter($"vec_id" % 50 === 0).collect()
      require(cwRows.length.max(qRows.length) <= 100000,
        s"q151 driver-side sets (${cwRows.length} codewords, " +
          s"${qRows.length} queries) — shard past the serving-batch shape")
      if (cwRows.isEmpty || qRows.isEmpty)
        Seq.empty[(Long, Long, Double, Int)].toDF("qid", "vec_id", "adc_d2", "rank")
      else {
        val books = (0 until PqM).map { sIdx =>
          cwRows.toSeq.map(r => r.getSeq[Float](1).map(_.toDouble)
            .slice(sIdx * sd, (sIdx + 1) * sd).toSeq)
        }
        val model = graft.operators.PqModel(Dim, PqM, books)
        val cents = cwRows.take(8)
          .map(r => r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
        val root = java.nio.file.Files
          .createTempDirectory("graft-q151-ivfpqres-").toString
        try {
          graft.operators.IvfStore.initWithCentroids(s, root, cents)
          graft.operators.IvfStore.enablePq(s, root, model,
            residual = true): Unit
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 0), root, "day-1")
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 1), root, "day-2")
          val queries = qRows.map(r => (r.getLong(0),
            r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1).toSeq
          graft.operators.IvfStore.adcProbe(s, root,
              "vec_id", queries, nprobe = cents.size, topK = 5)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some {
      val sd = Dim / PqM
      val fixedSum = (0 until PqM)
        .map(k => s"sum(CASE WHEN c.s = $k THEN l.qd2 END)").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        WHERE len(embedding) = $Dim AND vec_id IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND isfinite(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      sp AS (SELECT unnest(range($PqM)) AS s),
      cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ctr,
                  embedding AS cent
                FROM e WHERE vec_id % 100 = 3 ORDER BY vec_id LIMIT 8),
      dca AS (SELECT e.vec_id, c.ctr,
                list_sum(list_transform(range($Dim), i ->
                  (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cent[i+1] AS DOUBLE))
                  * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cent[i+1] AS DOUBLE))))
                  AS d2
              FROM e CROSS JOIN cents c),
      asgn AS (SELECT vec_id, ctr AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY d2 ASC, ctr ASC) rn FROM dca) WHERE rn = 1),
      rvec AS (SELECT e.vec_id, a.cell,
                 list_transform(range($Dim), i ->
                   CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cent[i+1] AS DOUBLE))
                   AS rv
               FROM e JOIN asgn a USING (vec_id)
                 JOIN cents c ON c.ctr = a.cell),
      cw AS (SELECT vec_id AS cid, s, list_slice(embedding, s*$sd+1, s*$sd+$sd)
               AS csub
             FROM e CROSS JOIN sp WHERE vec_id % 100 = 3),
      rs AS (SELECT vec_id, cell, s, list_slice(rv, s*$sd+1, s*$sd+$sd) AS rsub
             FROM rvec CROSS JOIN sp),
      ec AS (SELECT r.vec_id, r.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (r.rsub[i+1] - CAST(w.csub[i+1] AS DOUBLE))
                 * (r.rsub[i+1] - CAST(w.csub[i+1] AS DOUBLE)))) AS d2
             FROM rs r JOIN cw w USING (s)),
      codes AS (SELECT vec_id, s, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
          ORDER BY d2 ASC, cid ASC) rn FROM ec) WHERE rn = 1),
      qr AS (SELECT q.vec_id AS qid, c.ctr AS cell,
               list_transform(range($Dim), i ->
                 CAST(q.embedding[i+1] AS DOUBLE) - CAST(c.cent[i+1] AS DOUBLE))
                 AS qv
             FROM (SELECT * FROM e WHERE vec_id % 50 = 0) q CROSS JOIN cents c),
      qrs AS (SELECT qid, cell, s, list_slice(qv, s*$sd+1, s*$sd+$sd) AS qsub
              FROM qr CROSS JOIN sp),
      lut AS (SELECT r.qid, r.cell, r.s, w.cid,
                list_sum(list_transform(range($sd), i ->
                  (r.qsub[i+1] - CAST(w.csub[i+1] AS DOUBLE))
                  * (r.qsub[i+1] - CAST(w.csub[i+1] AS DOUBLE)))) AS qd2
              FROM qrs r JOIN cw w USING (s)),
      adc AS (SELECT l.qid, c.vec_id, $fixedSum AS adc_d2
              FROM codes c JOIN asgn a USING (vec_id)
                JOIN lut l ON l.cell = a.cell AND l.s = c.s AND l.cid = c.cid
              GROUP BY l.qid, c.vec_id)
      SELECT qid, vec_id, adc_d2, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc_d2 ASC, vec_id ASC) rank FROM adc) WHERE rank <= 5"""
    })

  /** ORACLE-GATED TABLE-DRIVEN ADC SERVING (round 16) — the
    * correctness row for [[graft.operators.IvfStore.adcProbeTable]],
    * the batch path where queries are a DATAFRAME and never touch the
    * driver (probed cells, LUTs and ADC folds all computed in the
    * plan; the query side rides a guarded broadcast and falls back to
    * a shuffled cell join past the cap). Same q150 lifecycle and
    * identity argument — full-probe raw ADC ≡ brute force over
    * reconstructions — so the oracle is q150's SQL at the cheap
    * `% 100 = 3` codeword slice; what THIS row proves over q150 is
    * that the in-plan LUT/probed-cell/fold arithmetic (HOFs over
    * codebook and centroid literals) is bit-identical to the
    * driver-built tables. The equality spec in IvfStorePqSpec pins
    * table == driver-list row-for-row including the residual mode and
    * the shuffled fallback; this row pins it against a second
    * engine. */
  private val ivfAdcProbeTable = Q(
    "q152_ivf_adc_probe_table",
    (s, d) => {
      import s.implicits._
      val sd = Dim / PqM
      val e = T.embeddings(s, d)
        .filter(graft.operators.KMeans.usable("embedding", Dim) &&
          $"vec_id".isNotNull)
        .select($"vec_id", $"embedding")
      // only the CODEBOOK is driver-side (a model is a literal by
      // nature); the queries stay a DataFrame end-to-end
      val cwRows = e.filter($"vec_id" % 100 === 3).collect().sortBy(_.getLong(0))
      require(cwRows.length <= 100000,
        s"q152 codebook slice (${cwRows.length} rows) past the literal shape")
      if (cwRows.isEmpty)
        Seq.empty[(Long, Long, Double, Int)].toDF("qid", "vec_id", "adc_d2", "rank")
      else {
        val books = (0 until PqM).map { sIdx =>
          cwRows.toSeq.map(r => r.getSeq[Float](1).map(_.toDouble)
            .slice(sIdx * sd, (sIdx + 1) * sd).toSeq)
        }
        val model = graft.operators.PqModel(Dim, PqM, books)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q152-ivfpqtab-").toString
        try {
          graft.operators.IvfStore.init(e, "vec_id", "embedding", root,
            k = 8, iters = 3)
          graft.operators.IvfStore.enablePq(s, root, model,
            residual = false): Unit
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 0), root, "day-1")
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 1), root, "day-2")
          val qtab = e.filter($"vec_id" % 50 === 0)
            .select($"vec_id".as("qid"),
              $"embedding".cast("array<double>").as("qv"))
          graft.operators.IvfStore.adcProbeTable(s, root, qtab,
              "qid", "qv", nprobe = 8, topK = 5)
            .localCheckpoint() // materialize before the root vanishes
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    },
    Some {
      val sd = Dim / PqM
      val fixedSum = (0 until PqM)
        .map(k => s"sum(CASE WHEN c.s = $k THEN l.qd2 END)").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        WHERE len(embedding) = $Dim AND vec_id IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND isfinite(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      sp AS (SELECT unnest(range($PqM)) AS s),
      cs AS (SELECT vec_id, s, list_slice(embedding, s*$sd+1, s*$sd+$sd) AS sub
             FROM e CROSS JOIN sp),
      cw AS (SELECT vec_id AS cid, s, sub AS csub FROM cs WHERE vec_id % 100 = 3),
      ec AS (SELECT c.vec_id, c.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(c.sub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS d2
             FROM cs c JOIN cw w USING (s)),
      codes AS (SELECT vec_id, s, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
          ORDER BY d2 ASC, cid ASC) rn FROM ec) WHERE rn = 1),
      qsub AS (SELECT vec_id AS qid, s, sub AS qsub FROM cs WHERE vec_id % 50 = 0),
      lut AS (SELECT q.qid, q.s, w.cid,
               list_sum(list_transform(range($sd), i ->
                 (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE))
                 * (CAST(q.qsub[i+1] AS DOUBLE) - CAST(w.csub[i+1] AS DOUBLE)))) AS qd2
             FROM qsub q JOIN cw w USING (s)),
      adc AS (SELECT l.qid, c.vec_id, $fixedSum AS adc_d2
             FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
             GROUP BY l.qid, c.vec_id)
      SELECT qid, vec_id, adc_d2, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc_d2 ASC, vec_id ASC) rank FROM adc) WHERE rank <= 5"""
    })

  def qs: Seq[Q] = Seq(bruteForceTopK, lshTopK, ivfTopK, quantize, centerStats,
    annRecall, quantizedRecall, ivfStoreProbe, pqAdcTopK, pqRecall, ivfAdcProbe,
    ivfAdcResidualProbe, ivfAdcProbeTable)
}
