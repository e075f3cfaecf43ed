package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs driven through MemoryStream — real
  * micro-batch execution with watermarks and state, not unit calls. */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  // ONE copy of the banded near-twin fixture, shared by the
  // cross-batch and restart tests: b is a hamming<=10 near twin of a,
  // c is far from both — asserted at use so a fixture edit (or a
  // simhash change) fails as a precondition, not as a misleading
  // suppression-assert
  private val nearTwinA = "the quick brown fox jumps over the lazy dog and runs far away home tonight while stars shine bright above the quiet hills tonight"
  private val nearTwinB = "the quick brown fox jumps over the lazy dog and runs far away home tonight while mouse shine bright above the quiet hills tonight"
  private val farC = "completely different words entirely here now with nothing shared at all today"
  private def requireNearTwinFixture(): Unit = {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    def fp(t: String): Long = spark.createDataset(Seq(t)).toDF("text")
      .select(expr("simhash60(word_shingles(text, 3))")).as[Long].head()
    val hamAB = java.lang.Long.bitCount(fp(nearTwinA) ^ fp(nearTwinB))
    assert(hamAB > 0 && hamAB <= 10, s"fixture texts: hamming(a,b)=$hamAB not in (0,10]")
    assert(java.lang.Long.bitCount(fp(nearTwinA) ^ fp(farC)) > 10,
      "fixture texts: c too close to a")
  }

  test("windowed agg with watermark aggregates by tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedAgg(df, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(1), "click", 1.0), (t(5), "click", 2.0), (t(12), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close all windows
      in.addData((t(120), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .selectExpr("unix_millis(win_start) div 60000 as start_min", "event_type", "n", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows.contains((0L, "click", 2L, 3.0)))
      assert(rows.contains((10L, "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming near-dup suppression: fingerprint twins collapse, distinct docs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingOps.nearDedupStream(df, "text", "30 minutes")
      .writeStream.format("memory").queryName("near_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData(
        (t(1), 1L, "the quick brown fox jumps over the lazy dog"),
        (t(2), 2L, "the quick brown fox jumps over the lazy dog"), // fingerprint twin
        (t(3), 3L, "completely different words entirely here now"),
        (t(4), 4L, "ab"),  // too short to shingle -> exact-text key
        (t(5), 5L, "ab"))  // exact twin of the short doc
      q.processAllAvailable()
      val kept = spark.table("near_dedup").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(1L) || kept.contains(2L))
      assert(!(kept.contains(1L) && kept.contains(2L)), "fingerprint twins must collapse")
      assert(kept.contains(3L), "distinct doc must survive")
      assert(kept.contains(4L) ^ kept.contains(5L), "short exact twins must collapse to one")
    } finally q.stop()
  }

  test("banded streaming near-dup: hamming<=10 near-twin suppressed across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    val (a, b, c) = (nearTwinA, nearTwinB, farC)
    requireNearTwinFixture()

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingOps.nearDedupStreamBanded(df, "text", "doc_id", "30 minutes")
      .writeStream.format("memory").queryName("banded_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(1), 1L, a), (t(2), 10L, "xy"))
      q.processAllAvailable() // batch 1: originals claim their buckets
      in.addData((t(3), 2L, b), (t(4), 3L, c), (t(5), 11L, "xy"))
      q.processAllAvailable() // batch 2: near-twin + distinct + short twin
      in.addData((t(120), 99L, "watermark flush row"))
      q.processAllAvailable() // push the watermark past batch-1/2 windows
      val kept = spark.table("banded_dedup").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(1L), "original must be retained")
      assert(!kept.contains(2L), "hamming<=10 near-twin must be suppressed cross-batch")
      assert(kept.contains(3L), "distinct doc must survive")
      assert(kept.contains(10L) && !kept.contains(11L),
        "short docs: exact twin suppressed via the text bucket")
    } finally q.stop()
  }

  test("cosine streaming near-dup: planted semantic twin suppressed cross-batch; sig-less rows pass through") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(41)
    def vec(): Seq[Float] = Seq.fill(32)(rnd.nextGaussian().toFloat)
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val vecA = vec()
    val twinA = vecA.updated(0, vecA.head + 0.3f) // the q144 plant shape
    val far = vec()
    // fixture preconditions: the twin is above threshold, noise below
    assert(cosine(vecA, twinA) >= 0.95, s"twin too far: ${cosine(vecA, twinA)}")
    assert(cosine(vecA, far) < 0.9 && cosine(twinA, far) < 0.9,
      s"noise fixture too close: ${cosine(vecA, far)}")

    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    // id 22 carries a null ELEMENT (injected below — Seq[Float] cannot
    // express one): the native dot reads null slots as 0.0, so without
    // the exists() guard the row norms fine and then kills the typed
    // encoder, wedging the stream on permanent replay
    val df = in.toDF().toDF("ts", "vec_id", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.when($"vec_id" === 22L,
          expr("transform(embedding, (x, i) -> IF(i = 1, NULL, x))"))
          .otherwise($"embedding"))
    val q = StreamingOps.cosDedupStreamBanded(df, "embedding", "vec_id", "30 minutes")
      .writeStream.format("memory").queryName("cos_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(1), 1L, vecA), (t(2), 20L, Seq.fill(32)(0f)))
      q.processAllAvailable() // batch 1: the original claims its buckets
      in.addData((t(3), 2L, twinA), (t(4), 3L, far),
        (t(5), 21L, null.asInstanceOf[Seq[Float]]), (t(6), 22L, vec()))
      q.processAllAvailable() // batch 2: twin + noise + sig-less rows
      in.addData((t(120), 99L, vec()))
      q.processAllAvailable() // push the watermark past the windows
      val kept = spark.table("cos_dedup").select("vec_id").as[Long].collect().toSet
      assert(kept.contains(1L), "original must be retained")
      assert(!kept.contains(2L), "cosine twin must be suppressed cross-batch")
      assert(kept.contains(3L), "below-threshold vector must survive")
      assert(kept.contains(20L) && kept.contains(21L) && kept.contains(22L),
        "zero-norm, null, and null-element vectors pass through unsuppressed (sig-less rule)")
    } finally q.stop()
  }

  test("identity/time contract: NULL id and NULL ts rows are dropped by both banded detectors, never wedging the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    import org.apache.spark.sql.functions.{col, lit, when}
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)

    // cosine detector: a usable vector with a NULL id previously
    // passed the __ok vector guard and reached the typed CosProbe
    // encoder, whose non-nullable docId: Long throws at encode time —
    // permanent replay wedge, the exact class the null-element guard
    // was added against
    val rnd = new scala.util.Random(47)
    def vec(): Seq[Float] = Seq.fill(32)(rnd.nextGaussian().toFloat)
    val inC = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val dfC = inC.toDF().toDF("ts", "vec_id", "embedding")
      .withColumn("vec_id",
        when(col("vec_id") === 30L, lit(null)).otherwise(col("vec_id")))
      .withColumn("ts",
        when(col("vec_id") === 31L,
          lit(null).cast("timestamp")).otherwise(col("ts")))
    val qc = StreamingOps.cosDedupStreamBanded(
        dfC, "embedding", "vec_id", "30 minutes")
      .writeStream.format("memory").queryName("cos_idts")
      .outputMode(OutputMode.Append()).start()
    try {
      inC.addData((t(1), 1L, vec()), (t(2), 30L, vec()), (t(3), 31L, vec()))
      qc.processAllAvailable()
      inC.addData((t(120), 99L, vec()))
      qc.processAllAvailable()
      val kept = spark.table("cos_idts").select("vec_id").as[Long].collect().toSet
      assert(kept.contains(1L), "normal row retained")
      assert(!kept.contains(31L), "null-ts row has no time to window — dropped")
      // and crucially: the query is alive and produced output (no
      // encoder wedge); null-id rows are simply absent
    } finally qc.stop()
    while (spark.streams.active.nonEmpty) Thread.sleep(50)

    // banded text detector shares the exposure through its typed
    // (Long, String, Long, Timestamp) base encoder
    val inN = MemoryStream[(java.sql.Timestamp, Long, String)]
    val dfN = inN.toDF().toDF("ts", "doc_id", "text")
      .withColumn("doc_id",
        when(col("doc_id") === 30L, lit(null)).otherwise(col("doc_id")))
    val qn = StreamingOps.nearDedupStreamBanded(
        dfN, "text", "doc_id", "30 minutes")
      .writeStream.format("memory").queryName("near_idts")
      .outputMode(OutputMode.Append()).start()
    try {
      inN.addData((t(1), 1L, nearTwinA), (t(2), 30L, farC))
      qn.processAllAvailable()
      inN.addData((t(120), 99L, "watermark flush row"))
      qn.processAllAvailable()
      val kept = spark.table("near_idts").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(1L), "normal row retained alongside the dropped null-id row")
    } finally qn.stop()
    while (spark.streams.active.nonEmpty) Thread.sleep(50)
  }

  test("stream/batch parity fuzz: cosDedupStreamBanded suppresses the same set as ingestCosine over a shuffled replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)

    // corpus: 48 well-separated random vectors + 12 planted twin PAIRS
    // (twin id = original + 1000, so batch's smaller-id rule and the
    // stream's earlier-arrival rule pick the SAME survivor when ts
    // follows id order) + two sig-less rows. Pair-only plants keep the
    // two disciplines' chain semantics out of scope: batch suppresses
    // against any smaller-id bucket sibling, the stream only against
    // ring CLAIMANTS — the sets can differ only via an A~B~C chain,
    // which gaussian noise at cos<0.9 pairwise cannot form.
    val rnd = new scala.util.Random(53)
    def vec(): Seq[Float] = Seq.fill(32)(rnd.nextGaussian().toFloat)
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val base = (1L to 48L).map(i => i -> vec()).toMap
    val twins = base.toSeq.sortBy(_._1).take(12).map { case (i, v) =>
      (i + 1000L) -> v.updated(0, v.head + 0.25f)
    }
    val all: Seq[(Long, Seq[Float])] =
      (base.toSeq ++ twins :+ (2001L -> null.asInstanceOf[Seq[Float]])
        :+ (2002L -> Seq.fill(32)(0f))).sortBy(_._1)
    // fixture preconditions: every plant above threshold, all noise
    // pairs below — assert so a drifted RNG fails loudly here
    twins.foreach { case (ti, tv) =>
      assert(cosine(base(ti - 1000L), tv) >= 0.92, s"plant $ti too far") }
    for { Seq((i, a), (j, b)) <- base.toSeq.sortBy(_._1).combinations(2) }
      assert(cosine(a, b) < 0.88, s"noise pair ($i,$j) too close: ${cosine(a, b)}")

    // BATCH path: one-day ingest into a scratch store
    val root = java.nio.file.Files
      .createTempDirectory("cos-parity-store").toString + "/cos"
    val delta = all.filter(_._2 != null).toDF("vec_id", "embedding")
      .unionByName(Seq((2001L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val batchKept = graft.operators.DedupStore
      .ingestCosine(delta, root, "2024-06-01", minCos = 0.9)
      .select("vec_id").as[Long].collect().toSet

    // STREAM path: same corpus, ts in id order, replayed SHUFFLED in
    // one batch (the fold sorts by (ts, docId), so arrival order
    // within the batch is immaterial — that is the property under
    // fuzz) — same session conf, so the SRP geometry is identical
    val ranked = all.map(_._1).sorted.zipWithIndex.toMap
    val shuffled = new scala.util.Random(59).shuffle(all)
    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val df = in.toDF().toDF("ts", "vec_id", "embedding")
    val q = StreamingOps.cosDedupStreamBanded(
        df, "embedding", "vec_id", "30 minutes", minCos = 0.9)
      .writeStream.format("memory").queryName("cos_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData(shuffled.map { case (i, v) =>
        (t(ranked(i).toLong + 1), i, v) })
      q.processAllAvailable()
      in.addData((t(100000), 9999L, vec()))
      q.processAllAvailable() // watermark flush
      val streamKept = spark.table("cos_parity")
        .select("vec_id").as[Long].collect().toSet - 9999L
      assert(streamKept === batchKept,
        s"stream/batch divergence: stream-only=${streamKept -- batchKept} " +
          s"batch-only=${batchKept -- streamKept}")
      // the suppressed set is exactly the planted twins, on both paths
      assert(all.map(_._1).toSet -- batchKept === twins.map(_._1).toSet)
    } finally q.stop()
    while (spark.streams.active.nonEmpty) Thread.sleep(50)
  }

  test("banded streaming near-dup: ring state survives a stop/restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    val (a, b) = (nearTwinA, nearTwinB)
    requireNearTwinFixture()
    val tmp = java.nio.file.Files.createTempDirectory("banded-restart").toString
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    def start() = StreamingOps.nearDedupStreamBanded(
      in.toDF().toDF("ts", "doc_id", "text"), "text", "doc_id", "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)

    val q1 = start()
    in.addData((t(1), 1L, a))
    q1.processAllAvailable()
    q1.stop()
    while (spark.streams.active.nonEmpty) Thread.sleep(50)

    val q2 = start() // restore the band-bucket rings
    in.addData((t(3), 2L, b), (t(4), 3L, farC))
    q2.processAllAvailable()
    in.addData((t(120), 99L, "watermark flush row"))
    q2.processAllAvailable()
    q2.stop()

    val kept = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L), "pre-restart original retained")
    assert(!kept.contains(2L),
      "near-twin of a PRE-RESTART owner must be suppressed — ring state restored")
    assert(kept.contains(3L), "post-restart distinct doc survives")
  }

  test("cosine streaming near-dup: ring state survives a stop/restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(43)
    def vec(): Seq[Float] = Seq.fill(32)(rnd.nextGaussian().toFloat)
    val vecA = vec()
    val twinA = vecA.updated(0, vecA.head + 0.3f)
    val tmp = java.nio.file.Files.createTempDirectory("cos-restart").toString
    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    def start() = StreamingOps.cosDedupStreamBanded(
      in.toDF().toDF("ts", "vec_id", "embedding"),
      "embedding", "vec_id", "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)

    val q1 = start()
    in.addData((t(1), 1L, vecA))
    q1.processAllAvailable()
    q1.stop()
    // drain before the second instance: an immediate restart can trip
    // the concurrent-checkpoint guard (the round-10 sharp edge)
    while (spark.streams.active.nonEmpty) Thread.sleep(50)

    val q2 = start() // restore the bucket rings from the checkpoint
    in.addData((t(3), 2L, twinA), (t(4), 3L, vec()))
    q2.processAllAvailable()
    in.addData((t(120), 99L, vec()))
    q2.processAllAvailable() // watermark flush
    q2.stop()

    val kept = spark.read.parquet(s"$tmp/out")
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(1L), "pre-restart original retained")
    assert(!kept.contains(2L),
      "twin of a PRE-RESTART owner must be suppressed — ring state restored")
    assert(kept.contains(3L), "post-restart distinct vector survives")
  }

  test("cosine bucket ring: exact verify, chance collisions claim slots, FIFO eviction, dim-mismatch never matches") {
    import graft.streaming.StreamingOps.{foldCosBucket, CosProbe}
    def unit(xs: Double*): Seq[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toSeq
    }
    def probe(id: Long, v: Seq[Float]) =
      CosProbe(id, 0, 0L, v, new java.sql.Timestamp(id * 60000L))
    val a = unit(1, 0, 0, 0)
    val b = unit(0, 1, 0, 0)            // cos(a,b)=0 — same bucket by construction
    val twinB = unit(0.05, 1, 0, 0)     // cos(b,twinB) ≈ 0.9988
    // exact verify: the chance-colliding b passes AND claims a slot;
    // the twin of the SECOND owner is then suppressed
    val (owners, v1) = foldCosBucket(Nil,
      Seq(probe(1, a), probe(2, b), probe(3, twinB)), cap = 4, minCos = 0.9)
    assert(v1.map(_.suppressed) == Vector(false, false, true))
    assert(owners == List(b, a), "both claimants recorded, newest first")
    // FIFO eviction: 4 mutually-far owners at cap 3 — oldest leaves,
    // its twin passes, a retained owner's twin is suppressed
    val fourth = unit(0, 0, 0, 1)
    val (ring, _) = foldCosBucket(Nil,
      Seq(probe(1, a), probe(2, b), probe(3, unit(0, 0, 1, 0)),
        probe(4, fourth)), cap = 3, minCos = 0.9)
    assert(ring.size == 3 && !ring.contains(a))
    assert(!foldCosBucket(ring, Seq(probe(9, unit(1, 0.05, 0, 0))),
      cap = 3, minCos = 0.9)._2.head.suppressed,
      "twin of the EVICTED owner passes (the documented ring cap)")
    assert(foldCosBucket(ring, Seq(probe(10, unit(0.05, 0, 0, 1))),
      cap = 3, minCos = 0.9)._2.head.suppressed,
      "twin of a retained owner suppressed")
    // a dimension-drifted probe can never match (and never NaNs)
    assert(!foldCosBucket(List(a), Seq(probe(11, unit(1, 0, 0))),
      cap = 3, minCos = 0.9)._2.head.suppressed)
  }

  test("bucket owner ring: second distinct owner is recorded, its twin suppressed") {
    import graft.streaming.StreamingOps.{foldBucket, BandProbe}
    def probe(id: Long, fp: Long) =
      BandProbe(id, "sh", 0, 0L, fp, new java.sql.Timestamp(id * 60000L))
    // fpA and fpB share a bucket (same band key by construction here)
    // but are far apart: hamming = 24 > 10. fpC is a near twin of fpB
    // (hamming 2 <= 10) and far from fpA.
    val fpA = 0L
    val fpB = 0xFFFFFFL            // 24 low bits set
    val fpC = 0xFFFFFCL            // fpB with 2 low bits cleared
    assert(java.lang.Long.bitCount(fpA ^ fpB) > 10)
    assert(java.lang.Long.bitCount(fpB ^ fpC) <= 10)
    assert(java.lang.Long.bitCount(fpA ^ fpC) > 10)
    // ring >= 2: B passes but claims the second slot; C is suppressed
    val (owners, verdicts) =
      foldBucket(Nil, Seq(probe(1, fpA), probe(2, fpB), probe(3, fpC)), cap = 4)
    assert(verdicts.map(_.suppressed) == Vector(false, false, true),
      "twin of the SECOND owner must be suppressed")
    assert(owners == List(fpB, fpA), "both distinct owners recorded, newest first")
    // cap = 1 keeps only the NEWEST claimant (B evicts A), so a twin
    // of A now slips — the capacity trade the ring depth buys back
    // (round 4's keep-the-ORIGINAL single owner had the mirror hole:
    // twins of B slipped)
    val fpA2 = 1L // hamming(A, A2) = 1, far from B
    assert(java.lang.Long.bitCount(fpB ^ fpA2) > 10)
    val (ring1, oneOwner) =
      foldBucket(Nil, Seq(probe(1, fpA), probe(2, fpB)), cap = 1)
    assert(ring1 == List(fpB), "cap=1: newest claimant evicts the original")
    assert(!foldBucket(ring1, Seq(probe(3, fpA2)), cap = 1)._2.head.suppressed,
      "cap=1 forgot A; its twin passes — ring depth >= 2 closes this")
    assert(oneOwner.map(_.suppressed) == Vector(false, false))
    // FIFO eviction past capacity: oldest owner leaves, its twin passes
    val far = Seq(0L, 0xFFFL << 12, 0xFFFL << 24, 0xFFFL << 36, 0xFFFL << 48)
    far.combinations(2).foreach { case Seq(x, y) =>
      assert(java.lang.Long.bitCount(x ^ y) > 10) }
    val (ring4, _) = foldBucket(Nil,
      far.zipWithIndex.map { case (f, i) => probe(i + 1, f) }, cap = 4)
    assert(ring4.size == 4 && !ring4.contains(0L), "oldest owner evicted at cap")
    val (_, evictedTwin) = foldBucket(ring4, Seq(probe(9, 1L)), cap = 4)
    assert(!evictedTwin.head.suppressed, "twin of the EVICTED owner passes (documented cap)")
    val (_, newestTwin) = foldBucket(ring4, Seq(probe(10, (0xFFFL << 48) ^ 3L)), cap = 4)
    assert(newestTwin.head.suppressed, "twin of a retained owner suppressed")
  }

  test("banded streaming near-dup: two owners sharing a bucket, twin of the second suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.ensureRegistered(spark)
    // fixture search: among seeded random texts, find A,B whose
    // fingerprints are FAR apart (hamming > 10) yet share at least one
    // SimHash band value — the two-distinct-owners-in-one-bucket shape
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform")
    val texts = Vector.fill(60)((1 to 24).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    def fpOf(t: String): Long = spark.createDataset(Seq(t)).toDF("text")
      .select(expr("simhash60(word_shingles(text, 3))")).as[Long].head()
    val fps = texts.map(t => t -> fpOf(t))
    val pair = (for {
      (ta, fa) <- fps.iterator
      (tb, fb) <- fps.iterator
      if ta < tb && java.lang.Long.bitCount(fa ^ fb) > 10 &&
        graft.functions.SimHashBands.bands(fa).zip(
          graft.functions.SimHashBands.bands(fb)).exists(p => p._1 == p._2)
    } yield (ta, tb, fb)).buffered.headOption
    assert(pair.isDefined, "fixture search found no band-sharing far pair")
    val (a, b, fpB) = pair.get
    // near twin of B: search one-word edits for a (0,10] hamming twin
    val c = (for {
      pos <- (4 until 20).iterator
      w <- Iterator("zulu", "whiskey", "xray", "yankee")
      cand = { val bw = b.split(" "); bw(pos) = w; bw.mkString(" ") }
      ham = java.lang.Long.bitCount(fpB ^ fpOf(cand))
      if ham > 0 && ham <= 10
    } yield cand).buffered.headOption
    assert(c.isDefined, "fixture search found no (0,10] one-word twin of b")

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingOps.nearDedupStreamBanded(df, "text", "doc_id", "30 minutes")
      .writeStream.format("memory").queryName("banded_ring")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(1), 1L, a))
      q.processAllAvailable() // A claims its buckets
      in.addData((t(2), 2L, b))
      q.processAllAvailable() // B collides with A's bucket(s) beyond the
                              // bound -> kept, claims ring slots
      in.addData((t(3), 3L, c.get))
      q.processAllAvailable() // twin of the SECOND owner
      in.addData((t(120), 99L, "watermark flush row"))
      q.processAllAvailable()
      val kept = spark.table("banded_ring").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(1L) && kept.contains(2L),
        "far-apart docs both retained (two distinct owners)")
      assert(!kept.contains(3L), "twin of the second owner must be suppressed")
    } finally q.stop()
  }

  test("streaming funnel: depth advances only in order, refines across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.StepEv]
    val q = StreamingOps.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode(OutputMode.Update()).start()
    try {
      def last(uid: Long): (Int, Long, Long, Long) =
        spark.table("funnel_state").filter($"userId" === uid)
          .orderBy($"depth".desc).select("depth", "t1", "t2", "t3")
          .as[(Int, Long, Long, Long)].head()
      // user 1: view@10, click@20 in one batch -> depth 2
      // user 2: click@10 with no view -> depth 0
      in.addData(StreamingOps.StepEv(1L, "view", 10L), StreamingOps.StepEv(1L, "click", 20L),
        StreamingOps.StepEv(2L, "click", 10L))
      q.processAllAvailable()
      assert(last(1L) == ((2, 10L, 20L, -1L)))
      assert(last(2L)._1 == 0)
      // purchase@15 precedes the accepted click@20 -> must NOT advance
      in.addData(StreamingOps.StepEv(1L, "purchase", 15L))
      q.processAllAvailable()
      assert(last(1L)._1 == 2)
      // purchase@30 follows click@20 -> depth 3
      in.addData(StreamingOps.StepEv(1L, "purchase", 30L))
      q.processAllAvailable()
      assert(last(1L) == ((3, 10L, 20L, 30L)))
      // user 2's missing view arrives -> later click must still be ignored
      // (it was never accepted; a FRESH click after the view advances)
      in.addData(StreamingOps.StepEv(2L, "view", 5L))
      q.processAllAvailable()
      assert(last(2L) == ((1, 5L, -1L, -1L)))
      in.addData(StreamingOps.StepEv(2L, "click", 50L))
      q.processAllAvailable()
      assert(last(2L) == ((2, 5L, 50L, -1L)))
    } finally q.stop()
  }

  /** The round-4 → round-5 state migration made loud: a checkpoint
    * whose per-key fMGWS state was written as `Long` (the r4
    * one-owner encoding) restarted under a `List[Long]` state (the r5
    * ring) trips Spark's state-schema check;
    * [[StreamingOps.withCheckpointMigrationHint]] must rethrow that —
    * and only that — with the actionable fresh-checkpoint message. */
  test("checkpoint migration: old-encoding state restarted under the ring fails with the actionable message") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-mig").toString
    val out = java.nio.file.Files.createTempDirectory("graft-out-mig").toString

    // run 1: state encoded as Long (the r4 shape), one committed batch
    // (file sink — the memory sink refuses checkpoint recovery)
    val in1 = MemoryStream[Long]
    val q1 = in1.toDS().groupByKey(_ % 4)
      .flatMapGroupsWithState[Long, Long](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          state.update(state.getOption.getOrElse(0L) + rows.size)
          Iterator.single(state.get)
      }
      .toDF("n")
      .writeStream.format("parquet").option("path", out)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt).start()
    try { in1.addData(1L, 2L, 3L); q1.processAllAvailable() } finally q1.stop()

    // run 2: same query shape, state now List[Long] (the r5 ring shape)
    val in2 = MemoryStream[Long]
    in2.addData(1L, 2L) // offset parity with run 1 so the restart batch has data
    val q2 = in2.toDS().groupByKey(_ % 4)
      .flatMapGroupsWithState[List[Long], Long](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          state.update(rows.map(identity).toList.take(4))
          Iterator.single(state.get.size.toLong)
      }
      .toDF("n")
      .writeStream.format("parquet").option("path", out)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt).start()
    val ex = intercept[IllegalStateException] {
      try StreamingOps.withCheckpointMigrationHint {
        in2.addData(4L, 5L)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(ex.getMessage === StreamingOps.CheckpointMigrationMessage)
    assert(StreamingOps.isStateSchemaMismatch(ex.getCause),
      "the original Spark failure must ride along as the cause")
    // non-schema failures pass through untouched
    val other = new RuntimeException("boom")
    val passed = intercept[RuntimeException](
      StreamingOps.withCheckpointMigrationHint(throw other))
    assert(passed eq other)
  }

  test("late rows beyond the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedAgg(df, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("late_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(5), "click", 1.0))
      q.processAllAvailable()
      in.addData((t(100), "click", 1.0)) // watermark → 90min; closes [0,10)
      q.processAllAvailable()
      in.addData((t(6), "click", 42.0)) // late beyond watermark → dropped
      in.addData((t(200), "click", 1.0))
      q.processAllAvailable()
      val n = spark.table("late_agg")
        .selectExpr("sum(n)").as[Long].collect().head
      assert(n == 2L, "late row must not be counted") // t(5) + t(100); t(6) dropped, t(200) window open
    } finally q.stop()
  }

  test("running profiles maintain the A1 merge state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.runningProfiles(in.toDS())
      .writeStream.format("memory").queryName("profiles")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Ev(7L, "click", us(1), 1.0), Ev(7L, "view", us(3), 2.0))
      q.processAllAvailable()
      in.addData(Ev(7L, "click", us(2), 4.0), Ev(9L, "click", us(5), 8.0))
      q.processAllAvailable()
      // last update per user wins (Update mode emits one row per touched key per batch)
      val last = spark.table("profiles")
        .as[StreamingOps.UserProfile].collect()
        .groupBy(_.userId).map { case (k, v) => k -> v.maxBy(_.totalEvents) }
      assert(last(7L).totalEvents == 3L)
      assert(last(7L).nTypes == 2)
      assert(last(7L).firstAt == us(1) && last(7L).lastAt == us(3))
      assert(last(7L).totalValue == 7.0)
      assert(last(9L).totalEvents == 1L)
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch against a broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.5), ("view", 0.5)).toDF("event_type", "weight")
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = StreamingOps.enrich(in.toDF().toDF("ts", "event_type", "value"), dim, Seq("event_type"))
      .selectExpr("event_type", "value * weight AS weighted")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((t(1), "click", 2.0), (t(2), "view", 4.0), (t(3), "error", 9.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").as[(String, Double)].collect().toSet
      assert(rows == Set(("click", 3.0), ("view", 2.0))) // inner join drops 'error'
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingOps.dedupStream(in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((1L, t(1), 1.0), (1L, t(2), 2.0), (2L, t(3), 3.0))
      q.processAllAvailable()
      in.addData((1L, t(4), 4.0), (3L, t(5), 5.0)) // 1 is a dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = StreamingOps.correlate(
      clicks.toDF().toDF("l_user", "lts"),
      buys.toDF().toDF("r_user", "rts", "amount"), "user")
    val q = joined.selectExpr("l_user", "amount")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      clicks.addData((1L, t(10)), (2L, t(10)))
      buys.addData((1L, t(15), 9.99), // within 10 min of user 1's click → match
        (2L, t(25), 5.0),             // 15 min after user 2's click → no match
        (3L, t(12), 7.0))             // no click at all
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((99L, t(200))); buys.addData((99L, t(300), 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib").as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 9.99)))
    } finally q.stop()
  }

  test("file sink + checkpoint: stop/restart resumes exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val in = MemoryStream[(Long, Double)]
    def start() = in.toDF().toDF("event_id", "value")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    in.addData((1L, 1.0), (2L, 2.0))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start() // restart from the checkpoint
    in.addData((3L, 3.0))
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(s"$tmp/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), "no loss, no duplication across restart")
  }

  test("streaming dataset card: per-(window, source, lang) counters with in-window dup excess") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val df = in.toDF().toDF("ts", "source", "lang", "text")
    val q = StreamingOps.datasetCardStream(df, "text", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("card")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData(
        (t(1), "web", "en", "one two three"),   // 3 tokens, 13 chars
        (t(2), "web", "en", "one two three"),   // exact dup of the above
        (t(3), "web", "en", "four five"),       // 2 tokens
        (t(4), "web", "de", "eins zwei"),       // other slice, same window
        (t(12), "web", "en", "later doc"))      // next window
      q.processAllAvailable()
      in.addData((t(120), "web", "en", "flush"))
      q.processAllAvailable()
      val rows = spark.table("card")
        .selectExpr("unix_millis(win_start) div 60000 as start_min",
          "source", "lang", "n_docs", "total_tokens", "total_chars",
          "approx_dup_excess")
        .as[(Long, String, String, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6, r._7))).toMap
      // window [0,10) en: 3 docs, 3+3+2 tokens, 13+13+9 chars, one dup
      // pair → excess 1 (HLL is exact at these cardinalities)
      assert(rows((0L, "web", "en")) === ((3L, 8L, 35L, 1L)))
      assert(rows((0L, "web", "de")) === ((1L, 2L, 9L, 0L)))
      assert(rows((10L, "web", "en")) === ((1L, 2L, 9L, 0L)))
    } finally q.stop()
  }

  test("windowed streaming heavy hitters: exact when k covers distinct; bounded and dominant-preserving when not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
    // k=100 >> distinct: the MG summary never evicts, counts are exact
    val q = StreamingOps.heavyHittersStream(df, "text", "10 minutes", "30 minutes", k = 100)
      .writeStream.format("memory").queryName("hh_win")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData(
        (t(1), "the cat and the dog"),
        (t(3), "the cat"),          // window [0,10): the=3 cat=2 and=1 dog=1
        (t(12), "dog dog dog bird")) // window [10,20): dog=3 bird=1
      q.processAllAvailable()
      in.addData((t(120), "flush")) // advance watermark, close both windows
      q.processAllAvailable()
      val rows = spark.table("hh_win")
        .selectExpr("unix_millis(win_start) div 60000 as start_min", "tok", "min_cnt")
        .as[(Long, String, Long)].collect().toSet
      assert(rows.contains((0L, "the", 3L)) && rows.contains((0L, "cat", 2L))
        && rows.contains((0L, "and", 1L)) && rows.contains((0L, "dog", 1L)))
      assert(rows.contains((10L, "dog", 3L)) && rows.contains((10L, "bird", 1L)))
    } finally q.stop()

    // k=2 under pressure across micro-batches: state stays <=k per
    // window, counts never overestimate, and the dominant token (count
    // > N/(k+1)) is guaranteed to survive the cross-batch state merges
    val in2 = MemoryStream[(java.sql.Timestamp, String)]
    val q2 = StreamingOps.heavyHittersStream(
        in2.toDF().toDF("ts", "text"), "text", "10 minutes", "30 minutes", k = 2)
      .writeStream.format("memory").queryName("hh_small")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in2.addData((t(1), "hot hot hot u1 u2"))
      q2.processAllAvailable() // batch 1 partial
      in2.addData((t(2), "hot hot hot u3 u4"))
      q2.processAllAvailable() // batch 2 merges into window state
      in2.addData((t(120), "flush"))
      q2.processAllAvailable()
      val rows = spark.table("hh_small")
        .filter("unix_millis(win_start) = 0")
        .select("tok", "min_cnt").as[(String, Long)].collect().toMap
      assert(rows.size <= 2, s"summary exceeded k: $rows")
      assert(rows.contains("hot"), s"dominant token lost: $rows")
      assert(rows("hot") <= 6L, s"MG count overestimated: $rows") // true count 6
    } finally q2.stop()
  }

  test("merge monoid: mergeEvent is order-insensitive (A1 commutativity)") {
    val evs = Seq(Ev(1, "a", 5, 1.0), Ev(1, "b", 2, 2.0), Ev(1, "a", 9, 3.0))
    val folded = evs.foldLeft(StreamingOps.emptyState)(StreamingOps.mergeEvent)
    evs.permutations.foreach { p =>
      val alt = p.foldLeft(StreamingOps.emptyState)(StreamingOps.mergeEvent)
      assert(alt == folded)
    }
    assert(folded.firstAt == 2 && folded.lastAt == 9)
    assert(folded.perType("a") == StreamingOps.TypeStat(2, 5, 9))
  }
}
