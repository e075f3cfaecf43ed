package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TfRecordSource
import graft.streaming.TfRecordStreamSink

/** RESTART-RECOVERY proof for the streaming exactly-once claims — a
  * real FILE source and a real checkpoint directory, not MemoryStream
  * (whose offsets die with the process and so can never exercise
  * recovery): the query is stopped MID-FEED, its checkpoint is rolled
  * back to a crash image (offsets written, sink commit absent — the
  * exact on-disk state a driver kill between the data write and the
  * commit leaves behind), more input arrives, and a NEW query
  * instance resumes from the checkpoint. The committed output must
  * equal the batch truth with no duplicated and no lost records —
  * the manifest protocol's actual claim, previously only argued.
  *
  * The crash image is constructed, not raced: delete the
  * checkpoint's `commits/<id>` (so the restart replays batch id —
  * Structured Streaming's recovery contract) and the sink's batch
  * manifest (so the batch's data files are uncommitted debris). A
  * genuine kill -9 between `writeBalanced` and the manifest rename
  * produces exactly this state.
  */
class StreamRecoverySpec extends AnyFunSuite with SparkSpec {

  // strictly increasing mtimes: the file source orders by timestamp,
  // and two sub-ms writes could otherwise swap batch assignment
  private val clock = new java.util.concurrent.atomic.AtomicLong(
    System.currentTimeMillis() - 60000)

  private def writeInput(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    val dst = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    dst.toFile.setLastModified(clock.addAndGet(2000)): Unit
  }

  /** stop() returns once the query signals termination, but the run's
    * checkpoint-usage registration can deregister a beat later — the
    * restart then trips Spark's concurrent-checkpoint guard. Drain
    * until the manager reports no active query before restarting. */
  private def stopAndDrain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.stop()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(spark.streams.active.isEmpty, "query did not deregister in 30s")
    spark.streams.resetTerminated()
  }

  /** Deletes go through the Hadoop FS: the local ChecksumFileSystem
    * keeps `.crc` sidecars, and a java.nio delete leaves the commit
    * file's stale sidecar behind — the replayed batch's commit write
    * then collides with it and Spark misreads the collision as a
    * concurrent query. */
  private def hDelete(p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(path, false)
  }

  private def crashImage(ckpt: String, out: String, batchId: Long): Unit = {
    assert(hDelete(s"$ckpt/commits/$batchId"),
      s"expected checkpoint commit $batchId to exist before rollback")
    assert(hDelete(f"$out/batch-$batchId%08d/_MANIFEST.json"),
      s"expected sink manifest for batch $batchId")
  }

  test("TfRecordStreamSink: kill mid-feed + restart from checkpoint = batch truth, no dup shards") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("srec-in").toString
    val out = Files.createTempDirectory("srec-out").toString
    val ckpt = Files.createTempDirectory("srec-ckpt").toString

    def lines(tag: String) = (1 to 20).map(i => s"$tag-record-$i")
    writeInput(in, "f1.txt", lines("a"))
    writeInput(in, "f2.txt", lines("b"))

    def startQuery() = TfRecordStreamSink.start(
      spark.readStream.option("maxFilesPerTrigger", "1").text(in)
        .select(encode($"value", "UTF-8").as("b")).as[Array[Byte]],
      out, ckpt, targetShardBytes = 256) // tiny target → several shards/batch

    val q1 = startQuery()
    try q1.processAllAvailable() finally stopAndDrain(q1) // batches 0,1 committed

    // crash image on the LAST batch: its offsets exist, its sink
    // commit does not — the restart must replay it over the debris
    crashImage(ckpt, out, batchId = 1L)
    writeInput(in, "f3.txt", lines("c")) // more feed arrives while "down"

    val q2 = startQuery()
    try q2.processAllAvailable() finally stopAndDrain(q2)

    // committed output ≡ the batch truth: every line exactly once
    val got = TfRecordSource
      .readFiles(spark, TfRecordStreamSink.committedFiles(spark, out))
      .map(new String(_, "UTF-8")).collect().toSeq
    val want = lines("a") ++ lines("b") ++ lines("c")
    assert(got.sorted === want.sorted,
      s"recovered stream lost or duplicated records: ${got.size} vs ${want.size}")
    assert(got.size === got.distinct.size, "duplicate records after replay")

    // no stray shards: every part file on disk is listed by exactly
    // one committed manifest (the replayed batch swept its debris)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.globStatus(new org.apache.hadoop.fs.Path(out, "batch-*/part-*"))
      .map(_.getPath.toUri.getPath).sorted
    val manifested = TfRecordStreamSink.committedFiles(spark, out)
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).sorted
    assert(onDisk.toSeq === manifested,
      "disk holds shards no manifest owns (or a manifest names a missing shard)")
  }

  test("IncrementalCurationJob.runStream: kill mid-feed + restart converges to the batch run") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("srec2-in").toString
    val root = Files.createTempDirectory("srec2-root").toString
    val ckpt = Files.createTempDirectory("srec2-ckpt").toString

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    // batch 0: two fresh docs; batch 1: an exact re-serve + a near-dup
    // + a fresh doc; batch 2 (arrives after the "crash"): another
    // re-serve + a fresh doc
    writeInput(in, "b0.csv", Seq(s"1|$base", s"2|$other"))
    writeInput(in, "b1.csv", Seq(
      s"10|$base",
      s"11|${base.replace("kappa", "lambda")}",
      s"12|a wholly new document about stream recovery checkpoints and manifests"))

    def startQuery() = graft.jobs.IncrementalCurationJob.runStream(
      spark.readStream.option("maxFilesPerTrigger", "1").text(in)
        .select(
          split($"value", "\\|").getItem(0).cast("long").as("doc_id"),
          split($"value", "\\|").getItem(1).as("text")),
      root, ckpt)

    val q1 = startQuery()
    try q1.processAllAvailable() finally stopAndDrain(q1)

    // crash image: batch 1's offsets committed but pretend the driver
    // died before the checkpoint commit — the stores DID commit their
    // "batch-000001" day (that is the realistic torn state: store
    // markers land inside foreachBatch, the checkpoint commit after
    // it). The replay must converge, not double-suppress or
    // double-append (the store protocol's self-exclusion claim).
    assert(hDelete(s"$ckpt/commits/1"))
    writeInput(in, "b2.csv", Seq(s"20|$other", s"21|finally a closing fresh document of the feed"))

    val q2 = startQuery()
    try q2.processAllAvailable() finally stopAndDrain(q2)

    def dayIds(day: String): Set[Long] = {
      val files = TfRecordSource.read(spark,
          s"$root/out/dt=$day/part-*")
        .map(new String(_, "UTF-8")).collect()
      files.map(j => """"doc_id":(\d+)""".r.findFirstMatchIn(j).get.group(1).toLong).toSet
    }
    // batch truth: 1,2 survive batch 0; 10 (exact) and 11 (near) die,
    // 12 survives batch 1 — IDENTICAL after the replay; 20 dies
    // against the archive, 21 survives batch 2
    assert(dayIds("batch-000000000") === Set(1L, 2L))
    assert(dayIds("batch-000000001") === Set(12L), "replayed batch must converge")
    assert(dayIds("batch-000000002") === Set(21L))
  }

  test("IncrementalCurationJob.runPayloadStream: kill between phash store marker and checkpoint commit + restart converges") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("srec3-in").toString
    val root = Files.createTempDirectory("srec3-root").toString
    val ckpt = Files.createTempDirectory("srec3-ckpt").toString

    // deterministic 128-byte pseudo-random payload per seed string —
    // md5-chained so distinct seeds give far-apart byte-grid sigs
    // (a constant-padded payload would have an all-zero gradient sig
    // and every doc would look like every other doc's twin)
    def payloadOf(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat((1 to 8).map(i => unhex(md5(concat(seed, lit(i.toString))))): _*)

    // batch 0: two fresh payloads; batch 1: a byte-identical re-serve
    // of seed-A + a fresh; batch 2 (arrives while "down"): a re-serve
    // of seed-B + a fresh
    writeInput(in, "p0.txt", Seq("1|pay-A", "2|pay-B"))
    writeInput(in, "p1.txt", Seq("10|pay-A", "12|pay-C"))

    def startQuery() = graft.jobs.IncrementalCurationJob.runPayloadStream(
      spark.readStream.option("maxFilesPerTrigger", "1").text(in)
        .select(
          split($"value", "\\|").getItem(0).cast("long").as("doc_id"),
          payloadOf(split($"value", "\\|").getItem(1)).as("payload")),
      root, ckpt)

    val q1 = startQuery()
    try q1.processAllAvailable() finally stopAndDrain(q1)

    // crash image — the torn state the verdict names: batch 1's PHASH
    // STORE day marker landed (it commits inside foreachBatch) but the
    // driver died before the CHECKPOINT commit. The replay re-runs the
    // committed store day; the protocol's own-day exclusion must make
    // it converge instead of self-suppressing the batch to zero (and
    // the export re-write must leave no duplicate shards).
    assert(hDelete(s"$ckpt/commits/1"))
    writeInput(in, "p2.txt", Seq("20|pay-B", "21|pay-D"))

    val q2 = startQuery()
    try q2.processAllAvailable() finally stopAndDrain(q2)

    def dayIds(day: String): Set[Long] =
      graft.sources.PayloadRecords.readCommitted(spark, s"$root/out/dt=$day")
        .select($"doc_id").as[Long].collect().toSet
    assert(dayIds("batch-000000000") === Set(1L, 2L))
    assert(dayIds("batch-000000001") === Set(12L),
      "replayed payload batch must converge (own-day exclusion), not self-suppress")
    assert(dayIds("batch-000000002") === Set(21L),
      "post-recovery batch must still suppress against the sig store")

    // store state converged too: one committed day per batch, and the
    // sig archive holds exactly the three survivors' signatures
    assert(graft.operators.DedupStore.committedDays(spark, s"$root/phash") ===
      Seq("batch-000000000", "batch-000000001", "batch-000000002"))
    val sigDocs = spark.read.parquet(s"$root/phash/sigs")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(sigDocs === Seq(1L, 2L, 12L, 21L),
      s"sig store must hold each survivor exactly once, got $sigDocs")

    // export dirs are manifest-exact: every part file is owned by the
    // day's manifest (readCommitted above already cross-checks counts;
    // this pins the no-stray-shards half)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (day <- Seq("batch-000000000", "batch-000000001", "batch-000000002")) {
      val parts = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/out/dt=$day", "part-*"))
      assert(parts.nonEmpty, s"$day export missing")
    }
  }

  test("runStream(embeddingCol): kill between cos store marker and checkpoint commit + restart converges") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("srec4-in").toString
    val root = Files.createTempDirectory("srec4-root").toString
    val ckpt = Files.createTempDirectory("srec4-ckpt").toString

    // axis-aligned embeddings: twins sit at cos ≈ 0.995 to their
    // original (well inside the SRP recall envelope), everything else
    // at ≤ ~0.1 — each verdict is decided by exactly one store
    val vA = "1,0,0,0,0,0,0,0";    val twinA = "0.99,0.1,0,0,0,0,0,0"
    val vB = "0,1,0,0,0,0,0,0";    val twinB = "0.1,0.99,0,0,0,0,0,0"
    val vC = "0,0,1,0,0,0,0,0";    val vD = "0,0,0,1,0,0,0,0"
    // batch 1's doc 10 carries FRESH text but a near-twin embedding:
    // every text stage passes it, only the cos store can kill it —
    // the SemDeDup case, under crash-replay
    writeInput(in, "e0.csv", Seq(
      s"1|alpha beta gamma delta epsilon zeta eta theta iota kappa|$vA",
      s"2|one two three four five six seven eight nine ten eleven|$vB"))
    writeInput(in, "e1.csv", Seq(
      s"10|completely fresh wording covering the very same archived story again|$twinA",
      s"12|an unrelated document about stream recovery for vector stores|$vC"))

    def startQuery() = graft.jobs.IncrementalCurationJob.runStream(
      spark.readStream.option("maxFilesPerTrigger", "1").text(in)
        .select(
          split($"value", "\\|").getItem(0).cast("long").as("doc_id"),
          split($"value", "\\|").getItem(1).as("text"),
          transform(split(split($"value", "\\|").getItem(2), ","),
            x => x.cast("float")).as("embedding")),
      root, ckpt, embeddingCol = Some("embedding"))

    val q1 = startQuery()
    try q1.processAllAvailable() finally stopAndDrain(q1)

    // crash image: batch 1's cos store day marker landed (it commits
    // inside foreachBatch, LAST of the five stages) but the driver
    // died before the checkpoint commit — the replay re-runs the
    // committed day and the own-day exclusion must converge it
    assert(hDelete(s"$ckpt/commits/1"))
    writeInput(in, "e2.csv", Seq(
      s"20|yet another new phrasing of the second archived article entirely|$twinB",
      s"21|a closing fresh document with its own embedding direction|$vD"))

    val q2 = startQuery()
    try q2.processAllAvailable() finally stopAndDrain(q2)

    // a SEQ, not a Set: a duplicated shard surviving the replay's
    // day-dir rewrite would surface as a repeated id here instead of
    // collapsing invisibly
    def dayIds(day: String): Seq[Long] = {
      val files = TfRecordSource.read(spark, s"$root/out/dt=$day/part-*")
        .map(new String(_, "UTF-8")).collect()
      files.map(j => """"doc_id":(\d+)""".r.findFirstMatchIn(j).get.group(1).toLong)
        .toSeq.sorted
    }
    assert(dayIds("batch-000000000") === Seq(1L, 2L))
    assert(dayIds("batch-000000001") === Seq(12L),
      "replayed batch must converge: the semantic twin dies, the fresh doc survives — exactly once")
    assert(dayIds("batch-000000002") === Seq(21L),
      "post-recovery batch must still suppress against the vector store")

    // vector-store state converged: one committed day per batch, each
    // survivor's vector exactly once
    assert(graft.operators.DedupStore.committedDays(spark, s"$root/cos") ===
      Seq("batch-000000000", "batch-000000001", "batch-000000002"))
    val vecDocs = spark.read.parquet(s"$root/cos/vecs")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(vecDocs === Seq(1L, 2L, 12L, 21L),
      s"vector store must hold each survivor exactly once, got $vecDocs")
  }

  test("runStream(ivfRoot): torn IVF batch invisible until replay; restart converges to ingestDay batch parity") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("srec5-in").toString
    val root = Files.createTempDirectory("srec5-root").toString
    val ckpt = Files.createTempDirectory("srec5-ckpt").toString
    val ivf = s"$root/ivf"

    val vA = "1,0,0,0,0,0,0,0";    val twinA = "0.99,0.1,0,0,0,0,0,0"
    val vB = "0,1,0,0,0,0,0,0";    val twinB = "0.1,0.99,0,0,0,0,0,0"
    val vC = "0,0,1,0,0,0,0,0";    val vD = "0,0,0,1,0,0,0,0"
    def emb(csv: String): Array[Float] =
      csv.split(",").map(_.toFloat)
    // frozen centroids are the caller's training decision — init once,
    // shared verbatim with the batch-parity root below
    def seedFrame = Seq((900L, emb(vA)), (901L, emb(vB)), (902L, emb(vC)))
      .toDF("doc_id", "embedding")
    graft.operators.IvfStore.init(seedFrame, "doc_id", "embedding", ivf,
      k = 2, iters = 2)

    val b0 = Seq(
      s"1|alpha beta gamma delta epsilon zeta eta theta iota kappa|$vA",
      s"2|one two three four five six seven eight nine ten eleven|$vB")
    val b1 = Seq(
      s"10|completely fresh wording covering the very same archived story again|$twinA",
      s"12|an unrelated document about stream recovery for vector stores|$vC")
    val b2 = Seq(
      s"20|yet another new phrasing of the second archived article entirely|$twinB",
      s"21|a closing fresh document with its own embedding direction|$vD")
    writeInput(in, "e0.csv", b0)
    writeInput(in, "e1.csv", b1)

    def startQuery() = graft.jobs.IncrementalCurationJob.runStream(
      spark.readStream.option("maxFilesPerTrigger", "1").text(in)
        .select(
          split($"value", "\\|").getItem(0).cast("long").as("doc_id"),
          split($"value", "\\|").getItem(1).as("text"),
          transform(split(split($"value", "\\|").getItem(2), ","),
            x => x.cast("float")).as("embedding")),
      root, ckpt, embeddingCol = Some("embedding"), ivfRoot = Some(ivf))

    val q1 = startQuery()
    try q1.processAllAvailable() finally stopAndDrain(q1)
    assert(graft.operators.IvfStore.committedDays(spark, ivf) ===
      Seq("batch-000000000", "batch-000000001"))

    // crash image, one notch deeper than srec4's: the driver dies
    // INSIDE batch 1's IVF append — the marker protocol retracts the
    // day marker before touching partitions, so the torn state on
    // disk is data (possibly partial) with NO marker. The day must be
    // invisible to probes until the replay recommits it.
    assert(hDelete(s"$ckpt/commits/1"))
    assert(hDelete(s"$ivf/_committed/batch-000000001"))
    assert(graft.operators.IvfStore.committedDays(spark, ivf) ===
      Seq("batch-000000000"), "torn batch must be probe-invisible")
    val qs = Seq(9000L -> Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(graft.operators.IvfStore.probe(spark, ivf, "doc_id", "embedding",
        qs, nprobe = 99, topK = 3).collect()
        .map(_.getLong(1)).toSet === Set(1L, 2L),
      "a probe during the outage must serve the committed days only")

    writeInput(in, "e2.csv", b2)
    val q2 = startQuery()
    try q2.processAllAvailable() finally stopAndDrain(q2)

    // the committed view (dt-filtered explicit-schema read — raw dirs
    // may hold debris): one day per batch, each survivor exactly once
    def ivfIds(r: String): Map[String, Seq[Long]] = {
      val days = graft.operators.IvfStore.committedDays(spark, r)
      spark.read
        .schema("doc_id LONG, embedding ARRAY<FLOAT>, dt STRING, cell INT")
        .parquet(s"$r/cells").filter($"dt".isin(days: _*))
        .select($"dt", $"doc_id").as[(String, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    }
    val streamed = ivfIds(ivf)
    assert(streamed === Map(
      "batch-000000000" -> Seq(1L, 2L),
      "batch-000000001" -> Seq(12L),
      "batch-000000002" -> Seq(21L)),
      s"replayed IVF day must converge (marker recommitted, no dup vectors): $streamed")

    // BATCH PARITY: the same three deltas through ingestDay against a
    // fresh store + IVF root (same frozen seed) must land the same
    // committed (day, id) content — the streaming path is the batch
    // path per micro-batch, not a parallel implementation
    val root2 = Files.createTempDirectory("srec5-root2").toString
    val ivf2 = s"$root2/ivf"
    graft.operators.IvfStore.init(seedFrame, "doc_id", "embedding", ivf2,
      k = 2, iters = 2)
    def frame(lines: Seq[String]) = lines
      .map { l => val p = l.split("\\|"); (p(0).toLong, p(1), emb(p(2))) }
      .toDF("doc_id", "text", "embedding")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (lines, i) =>
      graft.jobs.IncrementalCurationJob.ingestDay(frame(lines), root2,
        f"batch-$i%09d", stats = false, embeddingCol = Some("embedding"),
        ivfRoot = Some(ivf2))
    }
    assert(ivfIds(ivf2) === streamed,
      "streaming IVF co-append must match the batch ingestDay content")
  }
}
