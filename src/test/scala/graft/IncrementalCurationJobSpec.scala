package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.IncrementalCurationJob
import graft.sources.TfRecordSource

/** [[IncrementalCurationJob]] — daily curation against the three
  * persisted dedup stores. Each day-2 row is planted to be cut by
  * exactly one stage (quality, exact-vs-store, near-vs-store,
  * containment-vs-store), so the per-stage counts prove WHICH store
  * suppressed WHAT across days; the exports round-trip through the
  * real TFRecord reader; re-runs are idempotent.
  */
class IncrementalCurationJobSpec extends AnyFunSuite with SparkSpec {

  private def docs(ids: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.toDF("doc_id", "text")
  }

  private def ids(df: DataFrame): Set[Long] = {
    val s = spark
    import s.implicits._
    df.select($"doc_id").as[Long].collect().toSet
  }

  private def readDay(root: String, day: String): Set[Long] = {
    val s = spark
    import s.implicits._
    TfRecordSource.read(s, s"$root/out/dt=$day/part-*")
      .select(from_json(decode($"value", "UTF-8"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING")).as("r"))
      .select($"r.doc_id").as[Long].collect().toSet
  }

  // 30 words → 28 shingles: long enough that a 10-word quote is
  // containment-1.0 but Jaccard ~0.3 (below the 0.6 near threshold)
  private val archived = ("the quick brown fox jumps over the lazy dog near " +
    "the riverbank while autumn leaves drift slowly past the old stone " +
    "bridge where children often play games")
  private val other =
    "completely different content about distributed query engines and shuffle plans today"

  test("day 2 is curated against day 1's stores, stage by stage") {
    val root = Files.createTempDirectory("icur").toString
    val r1 = IncrementalCurationJob.ingestDay(
      docs(1L -> archived, 2L -> other), root, "2024-01-01",
      novelty = true)
    assert(r1.curated === 2 && r1.recordsWritten === 2)
    assert(readDay(root, "2024-01-01") === Set(1L, 2L))
    assert(r1.noveltyMean === 1.0, "day 1 vs an empty archive is all-new")

    val day2 = docs(
      10L -> archived,                                   // exact copy of stored 1
      11L -> other.replace("today", "tonight"),          // near-dup of stored 2
      12L -> archived.split(" ").take(10).mkString(" "), // quote of 1: containment 1.0, J ~0.3
      13L -> "tiny",                                     // quality cut
      14L -> "a brand new unique document about gardening tulips and rich soil beds")
    val r2 = IncrementalCurationJob.ingestDay(day2, root, "2024-01-02",
      novelty = true)
    assert(r2.input === 5)
    assert(r2.afterQuality === 4, "13 cut by the quality floor")
    assert(r2.afterExact === 3, "10 cut by the exact digest store")
    assert(r2.afterNear === 2, "11 cut by the near-dup band store")
    assert(r2.curated === 1, "12 cut by the containment store")
    assert(readDay(root, "2024-01-02") === Set(14L))
    // day 2 mixes archived re-serves (10: novelty 0) with fresh docs
    // (14: novelty 1) — the feed-pricing mean sits strictly between,
    // and re-running the committed day must not self-match it to 0
    assert(r2.noveltyMean > 0.0 && r2.noveltyMean < 1.0, r2.noveltyMean)
    val r2again = IncrementalCurationJob.ingestDay(day2, root, "2024-01-02",
      novelty = true)
    assert(math.abs(r2again.noveltyMean - r2.noveltyMean) < 1e-12,
      "re-run of a committed day self-matched its novelty")
  }

  test("intra-day cuts and cross-day chains compose") {
    val root = Files.createTempDirectory("icur2").toString
    IncrementalCurationJob.ingestDay(docs(1L -> archived), root, "d1")
    // 20/21 are intra-day exact twins (min id 20 survives), and both
    // are near-dups of stored 1 → the survivor still dies at NEAR
    val near = archived.replace("autumn", "spring")
    val r2 = IncrementalCurationJob.ingestDay(
      docs(21L -> near, 20L -> near, 22L -> other), root, "d2")
    assert(r2.afterExact === 2, "21 collapsed into 20 within the day")
    assert(r2.afterNear === 1, "20 then suppressed by stored 1")
    assert(r2.noveltyMean === -1.0,
      "novelty is opt-in: the archive-scale pass must not ride on a default ingest")
    assert(readDay(root, "d2") === Set(22L))
    // day 3: an exact copy of the day-2-CUT doc 20 is suppressed at
    // the EXACT stage — 20 was an exact-stage survivor, so its digest
    // is committed even though the near stage cut it later (the
    // store-append discipline: repeat offenders die at the cheapest
    // stage that can kill them)
    val r3 = IncrementalCurationJob.ingestDay(docs(30L -> near), root, "d3")
    assert(r3.afterExact === 0, "30's digest is already in the exact store")
    assert(r3.curated === 0 && r3.shards === 0)
  }

  test("runStream: micro-batches curate against the stores; batch id is the day") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("icur-stream").toString
    val ckpt = Files.createTempDirectory("icur-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = graft.jobs.IncrementalCurationJob.runStream(
      in.toDF().toDF("doc_id", "text"), root, ckpt)
    try {
      in.addData((1L, archived), (2L, other))
      q.processAllAvailable() // batch 0: both new → both survive
      in.addData(
        (10L, archived),                                   // exact copy of streamed 1
        (11L, archived.replace("autumn", "spring")),       // near-dup of 1
        (12L, archived.split(" ").take(10).mkString(" ")), // contained in 1
        (14L, "a brand new unique document about gardening tulips and rich soil beds"))
      q.processAllAvailable() // batch 1: only 14 survives the stores
      assert(readDay(root, "batch-000000000") === Set(1L, 2L))
      assert(readDay(root, "batch-000000001") === Set(14L))
      // every micro-batch committed its day markers in all three stores
      for (store <- Seq("exact", "near", "contain"))
        assert(graft.operators.DedupStore.committedDays(s, s"$root/$store")
          === Seq("batch-000000000", "batch-000000001"), store)
    } finally q.stop()
  }

  test("runStream(textIndexRoot): a streamed corpus is BM25-searchable as each micro-batch commits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("icur-stream-tix").toString
    val ckpt = Files.createTempDirectory("icur-ckpt-tix").toString
    val tix = s"$root/tix"
    val in = MemoryStream[(Long, String)]
    val q = graft.jobs.IncrementalCurationJob.runStream(
      in.toDF().toDF("doc_id", "text"), root, ckpt,
      textIndexRoot = Some(tix))
    def hits(terms: Seq[String]): Set[Long] =
      graft.operators.TextIndexStore.topK(spark, tix, terms, topK = 50)
        .select($"doc_id").as[Long].collect().toSet
    try {
      in.addData((1L, archived), (2L, other))
      q.processAllAvailable()
      assert(hits(Seq("riverbank")) === Set(1L),
        "batch-0 survivors searchable the moment the batch commits")
      in.addData((10L, archived), // exact copy — cut, never indexed
        (14L, "a brand new unique document about gardening tulips and rich soil beds"))
      q.processAllAvailable()
      assert(hits(Seq("riverbank")) === Set(1L))
      assert(hits(Seq("tulips")) === Set(14L))
      assert(graft.operators.TextIndexStore.committedDays(s, tix)
        === Seq("batch-000000000", "batch-000000001"))
      assert(graft.operators.TextIndexStore.corpusStats(s, tix)._1 === 3L)
    } finally q.stop()
  }

  test("runStream(ivfPointer): a mid-stream rebuild swap redirects the next micro-batch, no restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("icur-sptr").toString
    val ckpt = Files.createTempDirectory("icur-sptr-ckpt").toString
    val (ivfA, ivfB, ptr) = (s"$root/ivf-a", s"$root/ivf-b", s"$root/ptr")
    val rnd = new scala.util.Random(43)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    graft.operators.IvfStore.init(
      Seq((900L, vec()), (901L, vec()), (902L, vec()))
        .toDF("doc_id", "embedding"),
      "doc_id", "embedding", ivfA, k = 2, iters = 2)
    graft.operators.IvfStore.publishRoot(spark, ptr, ivfA)
    val in = MemoryStream[(Long, String, Array[Float])]
    val q = graft.jobs.IncrementalCurationJob.runStream(
      in.toDF().toDF("doc_id", "text", "embedding"), root, ckpt,
      embeddingCol = Some("embedding"), ivfPointer = Some(ptr))
    try {
      in.addData((1L, archived, vec()))
      q.processAllAvailable()
      assert(graft.operators.IvfStore.committedDays(s, ivfA) ===
        Seq("batch-000000000"))
      // operator rebuilds mid-stream; the RUNNING query's next batch
      // must land on the new root — per-batch pointer resolution is
      // the whole point
      graft.operators.IvfStore.rebuildVia(spark, ptr, ivfB, k = 2, iters = 2)
      in.addData((2L, other, vec()))
      q.processAllAvailable()
      assert(graft.operators.IvfStore.committedDays(s, ivfB) ===
        Seq("batch-000000000", "batch-000000001"),
        "rebuild carries batch 0; the post-swap batch appends to the new root")
      assert(graft.operators.IvfStore.committedDays(s, ivfA) ===
        Seq("batch-000000000"), "the stale root receives nothing after the swap")
    } finally q.stop()
  }

  test("payloadCol composes the phash stage: text OR payload near-dup suppresses; manifest carries per-stage counts") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("icur-pl").toString
    val rnd = new scala.util.Random(11)
    def blob(): Array[Byte] = Array.fill(4096)(rnd.nextInt().toByte)
    def twin(b: Array[Byte]): Array[Byte] = {
      val t = b.clone(); t(100) = (t(100) ^ 0x5a).toByte; t
    }
    val imgA = blob(); val imgB = blob()
    def withPayload(rows: (Long, String, Array[Byte])*): DataFrame =
      rows.toSeq.toDF("doc_id", "text", "payload")

    val r1 = IncrementalCurationJob.ingestDay(
      withPayload((1L, archived, imgA), (2L, other, imgB)),
      root, "d1", payloadCol = Some("payload"))
    assert(r1.curated === 2 && r1.afterContain === 2)
    assert(graft.operators.DedupStore.committedDays(spark, s"$root/phash")
      === Seq("d1"), "payload stage must commit its sig-store day")

    // day 2, each row planted for one verdict:
    //  10: fresh text + BYTE-TWIN of archived payload A → cut by PHASH
    //      (every text stage passes it — the case this stage exists for)
    //  11: near-dup TEXT + fresh payload → cut at NEAR (text stages
    //      still run first)
    //  14: fresh text + fresh payload → survives
    //  15: fresh text + NULL payload → no signature, passes untouched
    val day2 = withPayload(
      (10L, "a wholly fresh caption describing an image recrawled from the archive mirror", twin(imgA)),
      (11L, other.replace("today", "tonight"), blob()),
      (14L, "a brand new unique document about gardening tulips and rich soil beds", blob()))
      .unionByName(Seq((15L, "another fresh document whose record carries no payload bytes at all",
        null.asInstanceOf[Array[Byte]])).toDF("doc_id", "text", "payload"))
    val r2 = IncrementalCurationJob.ingestDay(day2, root, "d2",
      payloadCol = Some("payload"))
    assert(r2.afterNear === 3, "11 cut by the near-dup text store")
    assert(r2.afterContain === 3, "no containment cut this day")
    assert(r2.curated === 2, "10 cut by the phash payload store")
    assert(readDay(root, "d2") === Set(14L, 15L))
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/out/dt=d2", "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"after_contain\":3") &&
      manifest.contains("\"curated\":2"), manifest)

    // re-run converges (the phash day re-commits idempotently)
    val r2again = IncrementalCurationJob.ingestDay(day2, root, "d2",
      payloadCol = Some("payload"))
    assert(r2again === r2)

    // without payloadCol the report keeps its old meaning
    val r3 = IncrementalCurationJob.ingestDay(
      docs(20L -> "one more entirely novel document regarding alpine meadow flora"),
      root, "d3")
    assert(r3.afterContain === -1L && r3.curated === 1)
  }

  test("embeddingCol composes the semantic stage; with payloadCol the manifest carries every stage count") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("icur-emb").toString
    val rnd = new scala.util.Random(23)
    def blob(): Array[Byte] = Array.fill(4096)(rnd.nextInt().toByte)
    def btwin(b: Array[Byte]): Array[Byte] = {
      val t = b.clone(); t(100) = (t(100) ^ 0x5a).toByte; t
    }
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    def vtwin(v: Array[Float]): Array[Float] = {
      val t = v.clone(); t(0) = t(0) + 0.3f; t
    }
    val imgA = blob(); val imgB = blob()
    val vecA = vec(); val vecB = vec()
    def rows(rs: (Long, String, Array[Byte], Array[Float])*): DataFrame =
      rs.toSeq.toDF("doc_id", "text", "payload", "embedding")

    val r1 = IncrementalCurationJob.ingestDay(
      rows((1L, archived, imgA, vecA), (2L, other, imgB, vecB)),
      root, "d1", payloadCol = Some("payload"), embeddingCol = Some("embedding"))
    assert(r1.curated === 2 && r1.afterContain === 2 && r1.afterPhash === 2)
    assert(graft.operators.DedupStore.committedDays(spark, s"$root/cos")
      === Seq("d1"), "embedding stage must commit its vector-store day")

    // day 2, each row planted for exactly one verdict:
    //  10: fresh text + BYTE-TWIN payload + fresh vec   → cut at PHASH
    //  11: near-dup TEXT + fresh payload + fresh vec    → cut at NEAR
    //  12: fresh text + fresh payload + COSINE-TWIN vec → cut at COS
    //      (every byte/shingle stage passes it — the SemDeDup case
    //      this stage exists for)
    //  14: fresh everything                             → survives
    //  15: fresh text, NULL payload + NULL embedding    → passes untouched
    val day2 = rows(
      (10L, "a wholly fresh caption describing an image recrawled from the archive mirror", btwin(imgA), vec()),
      (11L, other.replace("today", "tonight"), blob(), vec()),
      (12L, "semantically identical coverage of the archived story rewritten word for word", blob(), vtwin(vecA)),
      (14L, "a brand new unique document about gardening tulips and rich soil beds", blob(), vec()))
      .unionByName(Seq((15L, "another fresh document whose record carries neither payload nor embedding",
        null.asInstanceOf[Array[Byte]], null.asInstanceOf[Array[Float]]))
        .toDF("doc_id", "text", "payload", "embedding"))
    val r2 = IncrementalCurationJob.ingestDay(day2, root, "d2",
      payloadCol = Some("payload"), embeddingCol = Some("embedding"))
    assert(r2.afterNear === 4, "11 cut by the near-dup text store")
    assert(r2.afterContain === 4, "no containment cut this day")
    assert(r2.afterPhash === 3, "10 cut by the phash payload store")
    assert(r2.curated === 2, "12 cut by the cosine vector store")
    assert(readDay(root, "d2") === Set(14L, 15L))
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/out/dt=d2", "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"after_contain\":4") &&
      manifest.contains("\"after_phash\":3") &&
      manifest.contains("\"curated\":2"), manifest)

    // re-run converges (both sig stores re-commit idempotently)
    val r2again = IncrementalCurationJob.ingestDay(day2, root, "d2",
      payloadCol = Some("payload"), embeddingCol = Some("embedding"))
    assert(r2again === r2)

    // embedding-only day: afterPhash stays -1 (no phash stage ran);
    // the cos store still suppresses across days — 20's vector is a
    // twin of d1's ARCHIVED vecB
    val r3 = IncrementalCurationJob.ingestDay(
      Seq((20L, "one more entirely novel document regarding alpine meadow flora",
        vtwin(vecB))).toDF("doc_id", "text", "embedding"),
      root, "d3", embeddingCol = Some("embedding"))
    assert(r3.afterPhash === -1L && r3.afterContain === 1 && r3.curated === 0,
      s"archived vector must suppress the d3 twin: $r3")
  }

  test("ivfRoot: survivors are probe-visible same-day, cos-cut twins never index, crash across the two markers recovers") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("icur-ivf").toString
    val ivf = s"$root/ivf"
    val rnd = new scala.util.Random(29)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    def vtwin(v: Array[Float]): Array[Float] = {
      val t = v.clone(); t(0) = t(0) + 0.3f; t
    }
    val vecA = vec(); val vecB = vec()
    def rows(rs: (Long, String, Array[Float])*): DataFrame =
      rs.toSeq.toDF("doc_id", "text", "embedding")

    // frozen centroids are a TRAINING decision — the caller inits; an
    // uninitialized root refuses at the first ingest, and ivfRoot
    // without a vector column refuses immediately
    intercept[IllegalArgumentException] {
      IncrementalCurationJob.ingestDay(docs(1L -> archived), root, "dx",
        ivfRoot = Some(ivf))
    }
    graft.operators.IvfStore.init(
      rows((900L, "seed", vecA), (901L, "seed", vecB),
        (902L, "seed", vec())).drop("text").toDF(),
      "doc_id", "embedding", ivf, k = 2, iters = 2)

    def probeIds(): Set[Long] =
      graft.operators.IvfStore.probe(spark, ivf, "doc_id", "embedding",
        Seq(7L -> vecA.map(_.toDouble)), nprobe = 99, topK = 50)
        .collect().map(_.getLong(1)).toSet

    val r1 = IncrementalCurationJob.ingestDay(
      rows((1L, archived, vecA), (2L, other, vecB)),
      root, "d1", embeddingCol = Some("embedding"), ivfRoot = Some(ivf))
    assert(r1.curated === 2)
    assert(graft.operators.IvfStore.committedDays(spark, ivf) === Seq("d1"))
    assert(probeIds() === Set(1L, 2L),
      "day-1 survivors must be ANN-servable the moment the day commits")

    // day 2: 12's vector is a cosine twin of ARCHIVED vecA — the cos
    // stage cuts it, so it must never reach the index; 14 is fresh
    val day2 = rows(
      (12L, "semantically identical coverage of the archived story rewritten word for word", vtwin(vecA)),
      (14L, "a brand new unique document about gardening tulips and rich soil beds", vec()))
    val r2 = IncrementalCurationJob.ingestDay(day2, root, "d2",
      embeddingCol = Some("embedding"), ivfRoot = Some(ivf))
    assert(r2.curated === 1, s"cos twin must be cut: $r2")
    assert(probeIds() === Set(1L, 2L, 14L),
      "exactly the curated survivors are indexed — never the cos-cut twin")

    // crash image ACROSS the two marker namespaces: the cos store's d2
    // committed, the IVF day marker did not (IvfStore.append retracts
    // it first) — the day is ANN-invisible, not half-indexed
    val hfs = new org.apache.hadoop.fs.Path(ivf)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.delete(new org.apache.hadoop.fs.Path(s"$ivf/_committed/d2"), false))
    assert(probeIds() === Set(1L, 2L), "uncommitted IVF day must be invisible")
    assert(graft.operators.DedupStore.committedDays(spark, s"$root/cos")
      === Seq("d1", "d2"), "the cos store's own commit is untouched")

    // the documented recovery: re-run the day — every dedup re-ingest
    // converges and the IVF re-append rewrites the day exactly once
    val r2again = IncrementalCurationJob.ingestDay(day2, root, "d2",
      embeddingCol = Some("embedding"), ivfRoot = Some(ivf))
    assert(r2again === r2)
    assert(probeIds() === Set(1L, 2L, 14L))
    val stored = spark.read.parquet(s"$ivf/cells")
      .select($"doc_id").as[Long].collect().toSeq
    assert(stored.size === stored.distinct.size,
      s"recovered day must hold each vector exactly once: $stored")

    // maintenance entry points walk the sixth root too
    val (dedupReports, ivfReport) =
      IncrementalCurationJob.compactStoresWithIvf(spark, root, ivf)
    assert(dedupReports.keySet === Set("exact", "near", "contain", "phash", "cos"))
    assert(ivfReport.mergedDay.isEmpty, "two days inside keepDays: nothing folds")
    val audits = IncrementalCurationJob.fsckStoresWithIvf(spark, root, ivf,
      deep = true)
    assert(audits.keySet === Set("exact", "near", "contain", "phash", "cos", "ivf"))
    assert(audits("ivf").forall(_.severity == "info"),
      s"healthy pipeline-fed IVF store must audit clean: ${audits("ivf")}")
  }

  test("textIndexRoot: survivors are BM25-searchable same-day, suppressed docs never index, crash recovers") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("icur-tix").toString
    val tix = s"$root/tix"
    def hits(terms: Seq[String]): Set[Long] =
      graft.operators.TextIndexStore.topK(spark, tix, terms, topK = 50)
        .select($"doc_id").as[Long].collect().toSet

    // day 1: both docs survive and are searchable the moment the day
    // commits — no init step exists for the text index (stateless)
    val r1 = IncrementalCurationJob.ingestDay(
      docs(1L -> archived, 2L -> other), root, "d1",
      textIndexRoot = Some(tix))
    assert(r1.curated === 2)
    assert(graft.operators.TextIndexStore.committedDays(spark, tix) === Seq("d1"))
    assert(hits(Seq("riverbank")) === Set(1L))
    assert(hits(Seq("shuffle")) === Set(2L))

    // day 2: 10 is an exact dup of archived doc 1 — cut by the exact
    // stage, so it must never reach the index; 14 is fresh
    val day2 = docs(10L -> archived,
      14L -> "a brand new unique document about gardening tulips and rich soil beds")
    val r2 = IncrementalCurationJob.ingestDay(day2, root, "d2",
      textIndexRoot = Some(tix))
    assert(r2.curated === 1, s"exact dup must be cut: $r2")
    assert(hits(Seq("riverbank")) === Set(1L),
      "the suppressed dup must never index — one copy of the archived text")
    assert(hits(Seq("tulips")) === Set(14L))

    // crash image across the marker namespaces: dedup stores
    // committed d2, the index marker did not (append retracts first)
    val hfs = new org.apache.hadoop.fs.Path(tix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.delete(new org.apache.hadoop.fs.Path(s"$tix/markers/d2"), false))
    assert(hits(Seq("tulips")) === Set.empty,
      "uncommitted index day must be search-invisible")
    // documented recovery: re-run the day; dedup re-ingests converge
    // and the index re-append rewrites the day exactly once
    val r2again = IncrementalCurationJob.ingestDay(day2, root, "d2",
      textIndexRoot = Some(tix))
    assert(r2again === r2)
    assert(hits(Seq("tulips")) === Set(14L))
    assert(graft.operators.TextIndexStore.corpusStats(spark, tix)._1 === 3L,
      "exactly the three curated survivors are indexed")
  }

  test("ivfPointer: each day resolves the published root, so a rebuild swap redirects the next ingest automatically") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("icur-ptr").toString
    val (ivfA, ivfB, ptr) = (s"$root/ivf-a", s"$root/ivf-b", s"$root/ptr")
    val rnd = new scala.util.Random(41)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    def rows(rs: (Long, String, Array[Float])*): DataFrame =
      rs.toSeq.toDF("doc_id", "text", "embedding")

    graft.operators.IvfStore.init(
      rows((900L, "s", vec()), (901L, "s", vec()), (902L, "s", vec()))
        .drop("text"),
      "doc_id", "embedding", ivfA, k = 2, iters = 2)
    graft.operators.IvfStore.publishRoot(spark, ptr, ivfA)

    // day 1 through the pointer lands on the root it publishes today
    IncrementalCurationJob.ingestDay(rows((1L, archived, vec())),
      root, "d1", embeddingCol = Some("embedding"), ivfPointer = Some(ptr))
    assert(graft.operators.IvfStore.committedDays(spark, ivfA) === Seq("d1"))

    // a rebuild swaps the pointer; the NEXT day must land on the new
    // root with no operator action — the writer-side half of the
    // zero-downtime story
    graft.operators.IvfStore.rebuildVia(spark, ptr, ivfB, k = 2, iters = 2)
    IncrementalCurationJob.ingestDay(rows((2L, other, vec())),
      root, "d2", embeddingCol = Some("embedding"), ivfPointer = Some(ptr))
    assert(graft.operators.IvfStore.committedDays(spark, ivfB) ===
      Seq("d1", "d2"), "rebuild carries d1; the post-swap ingest adds d2")
    assert(graft.operators.IvfStore.committedDays(spark, ivfA) === Seq("d1"),
      "the stale root must receive nothing after the swap")

    // explicit ivfRoot wins over the pointer (the Jobs.resolveIvfRoot
    // rule, enforced at the library layer too)
    IncrementalCurationJob.ingestDay(
      rows((3L, "a third unrelated document describing garden tools and " +
        "seasonal soil preparation for tulips", vec())),
      root, "d3", embeddingCol = Some("embedding"),
      ivfRoot = Some(ivfA), ivfPointer = Some(ptr))
    assert(graft.operators.IvfStore.committedDays(spark, ivfA) ===
      Seq("d1", "d3"))
    assert(graft.operators.IvfStore.committedDays(spark, ivfB) ===
      Seq("d1", "d2"))
  }

  test("re-running a committed day converges to identical output") {
    val root = Files.createTempDirectory("icur3").toString
    IncrementalCurationJob.ingestDay(docs(1L -> archived), root, "d1")
    val day2 = docs(10L -> archived, 14L ->
      "a brand new unique document about gardening tulips and rich soil beds")
    val a = IncrementalCurationJob.ingestDay(day2, root, "d2")
    val b = IncrementalCurationJob.ingestDay(day2, root, "d2")
    assert(a === b)
    assert(readDay(root, "d2") === Set(14L))
    // manifest on disk reflects the (re-)run
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/out/dt=d2", "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"curated\":1"), manifest)
  }
}
