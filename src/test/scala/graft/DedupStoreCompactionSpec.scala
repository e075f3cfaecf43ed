package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupStore

/** [[DedupStore.compact]] — daily cadence accumulates one partition
  * per day per table; compaction must bound the file count WITHOUT
  * changing a single probe result, and its crash windows must never
  * un-commit a day:
  *  - pre-marker crash → merged partitions are uncommitted debris,
  *    readers see the original days (the standard marker rule);
  *  - post-marker / pre-sweep crash → the marker's replaced-day list
  *    excludes the originals, so a still-present old marker cannot
  *    double-count; the next compact() heals the garbage.
  */
class DedupStoreCompactionSpec extends AnyFunSuite with SparkSpec {

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

  // per-day DISJOINT vocabularies: no accidental cross-day near-dups
  // (a shared base word-run at J >= 0.6 would silently empty later
  // days' survivor sets and blind the probe assertions)
  private def text(d: Int): String =
    (1 to 10).map(w => s"w${d}x$w").mkString(" ")
  private def text2(d: Int): String =
    (1 to 10).map(w => s"v${d}y$w").mkString(" ")

  private def simulateDays(root: String, n: Int): Unit =
    (1 to n).foreach { d =>
      DedupStore.ingest(
        docs((d * 100L) -> text(d), (d * 100L + 1) -> text2(d)),
        root, f"2024-01-$d%02d")
    }

  test("compaction bounds files, preserves probes, and survives its crash windows") {
    val rootC = Files.createTempDirectory("dsc-c").toString // compacted
    val rootU = Files.createTempDirectory("dsc-u").toString // control
    val n = 10
    simulateDays(rootC, n)
    simulateDays(rootU, n)

    val before = DedupStore.committedFileCount(spark, rootC)
    assert(before >= n, s"10 simulated days must leave >= $n files, got $before")

    val r = DedupStore.compact(spark, rootC, keepDays = 2)
    assert(r.mergedDay.isDefined && r.daysMerged === n - 2)
    // the 8-day tail folds to ⌈bytes/target⌉ = 1 file per table (tiny
    // data << target); the 2 retained days keep their own files —
    // total well under half the before count
    assert(r.filesAfter < r.filesBefore / 2, s"file count not bounded: $r")
    val hfs = new org.apache.hadoop.fs.Path(rootC)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("bands", "sets")) {
      val merged = new org.apache.hadoop.fs.Path(s"$rootC/$t/dt=${r.mergedDay.get}")
      val files = hfs.listStatus(merged).map(_.getPath.getName)
        .filterNot(f0 => f0.startsWith("_") || f0.startsWith("."))
      assert(files.length === 1, s"$t merged tail must be ONE file, got ${files.toSeq}")
    }
    assert(DedupStore.committedDays(spark, rootC).size === 3,
      "merged day + 2 retained days")

    // PROBE EQUIVALENCE: a new day ingested against the compacted
    // store suppresses exactly what the uncompacted control does —
    // one twin against the MERGED partition (day 3), one near-dup
    // (last word changed: 7/8 shared shingles, J = 7/9 >= 0.6)
    // against a RETAINED day (day 9) — both read paths exercised
    val day11 = docs(
      9990L -> text(3),
      9991L -> text(9).replace("w9x10", "zz"),
      9992L -> "entirely fresh content about compaction never archived anywhere")
    val sC = ids(DedupStore.ingest(day11, rootC, "2024-02-01"))
    val sU = ids(DedupStore.ingest(day11, rootU, "2024-02-01"))
    assert(sC === sU, s"compaction changed probe results: $sC vs $sU")
    assert(sC === Set(9992L))

    // novelty read-side also unchanged
    val nC = DedupStore.noveltyReport(day11, rootC, exceptDay = Some("2024-02-01"))
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(3)).toMap
    val nU = DedupStore.noveltyReport(day11, rootU, exceptDay = Some("2024-02-01"))
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(3)).toMap
    assert(nC === nU, "compaction changed novelty scores")

    // CRASH WINDOW post-marker/pre-sweep: resurrect an old day's
    // marker (as if the sweep died) — the committed view must still
    // exclude it (the merged marker's content replaces it), so rows
    // cannot double-count
    val f = new org.apache.hadoop.fs.Path(rootC)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ghost = new org.apache.hadoop.fs.Path(s"$rootC/_committed/2024-01-03")
    f.create(ghost, true).close()
    assert(!DedupStore.committedDays(spark, rootC).contains("2024-01-03"),
      "a replaced day's stale marker must stay excluded")
    // and the next compact() sweeps it
    DedupStore.compact(spark, rootC, keepDays = 2)
    assert(!f.exists(ghost), "sweep must clear replaced-day garbage")

    // CRASH WINDOW pre-marker: debris partitions under an uncommitted
    // merged name are invisible
    val debris = new org.apache.hadoop.fs.Path(s"$rootC/sets/dt=merged-99d-deadbeef0000")
    f.mkdirs(debris)
    val daysBefore = DedupStore.committedDays(spark, rootC)
    assert(DedupStore.committedDays(spark, rootC) === daysBefore)
    val sC2 = ids(DedupStore.noveltyReport(day11, rootC,
      exceptDay = Some("2024-02-01")).withColumnRenamed("doc_id", "doc_id"))
    assert(sC2 === nC.keySet, "uncommitted merged debris leaked into a read")
  }

  test("retention counts REAL days only; tiered compaction leaves the merged tier alone until the part bound") {
    // two review-caught hazards pinned together: (r10) merged-* names
    // sort after date names, so counting them in the keepDays tail
    // would shrink the protected window by one real day per
    // compaction; (r11) ALWAYS folding the prior merged partition
    // re-reads and re-writes the entire historical tail every run —
    // O(archive) churn per maintenance call. Tiered policy: new aged
    // days fold into a FRESH merged partition; the merged tier itself
    // folds only when one more partition would exceed
    // graft.store.maxMergedParts.
    val root = Files.createTempDirectory("dsc-ret").toString
    simulateDays(root, 4)
    val r1 = DedupStore.compact(spark, root, keepDays = 2)
    assert(r1.daysMerged === 2, s"$r1") // days 1-2; 3-4 retained
    (5 to 6).foreach { d =>
      DedupStore.ingest(docs((d * 100L) -> text(d)), root, f"2024-01-$d%02d")
    }
    val r2 = DedupStore.compact(spark, root, keepDays = 2)
    // tiered: only real days 3-4 fold — the prior merged partition is
    // NOT re-read (two merged partitions now coexist, both committed)
    assert(r2.daysMerged === 2, s"$r2")
    val days = DedupStore.committedDays(spark, root)
    assert(days.count(_.startsWith("merged-")) === 2,
      s"tiered compaction must leave the prior merged partition untouched: $days")
    assert(days.filterNot(_.startsWith("merged-")) ===
      Seq("2024-01-05", "2024-01-06"),
      s"recent real days must stay inside the retention window: $days")
    // both merged tiers still suppress
    val probe = docs(9000L -> text(1), 9001L -> text(3), 9002L -> text(42))
    assert(ids(DedupStore.ingest(probe, root, "2024-02-01")) === Set(9002L))

    // drive the tier over its part bound: with maxMergedParts=2, the
    // next fold must collapse BOTH merged partitions + the aged days
    // into one (the amortized-archive-churn moment)
    (7 to 8).foreach { d =>
      DedupStore.ingest(docs((d * 100L) -> text(d)), root, f"2024-01-$d%02d")
    }
    spark.conf.set("graft.store.maxMergedParts", "2")
    val r3 = try DedupStore.compact(spark, root, keepDays = 2)
    finally spark.conf.unset("graft.store.maxMergedParts")
    // merge set = 2 merged partitions + real days 2024-01-05/06 +
    // 2024-02-01 (now aged); 07-08 retained
    assert(r3.daysMerged === 5, s"$r3")
    val days3 = DedupStore.committedDays(spark, root)
    assert(days3.count(_.startsWith("merged-")) === 1,
      s"tier fold must collapse the merged partitions: $days3")
    // full history still suppresses after the tier fold
    val probe2 = docs(9100L -> text(1), 9101L -> text(5), 9102L -> text(77))
    assert(ids(DedupStore.ingest(probe2, root, "2024-02-02")) === Set(9102L))

    // TWO-GENERATION re-ingest protection (review-caught): day 01 was
    // folded into the first merged partition, the tier fold replaced
    // that partition, and the next compact's sweep GCs the inner
    // marker — the tier-fold marker's TRANSITIVE closure must keep
    // carrying day 01, or the re-ingest guard silently lapses right
    // when the data becomes unreachable
    DedupStore.compact(spark, root, keepDays = 2) // sweep runs first
    val e2 = intercept[IllegalStateException] {
      DedupStore.ingest(docs(1L -> text(1)), root, "2024-01-01")
    }
    assert(e2.getMessage.contains("self-suppress"))
  }

  test("re-ingesting a compacted day fails loudly instead of silently vanishing") {
    // round-10 advice: the day's rows live in the merged partition,
    // unreachable by the ingest's own-day exclusion — the re-run would
    // self-suppress to zero survivors and the data would quietly
    // disappear at the next sweep
    val root = Files.createTempDirectory("dsc-reingest").toString
    simulateDays(root, 5)
    assert(DedupStore.compact(spark, root, keepDays = 2).daysMerged === 3)
    val e = intercept[IllegalStateException] {
      DedupStore.ingest(docs(1L -> text(1)), root, "2024-01-02")
    }
    assert(e.getMessage.contains("keepDays"))
    // a day still inside the retention window re-ingests fine (its own
    // prior rows are excluded, so its content re-survives; a MERGED
    // day's twin still suppresses)
    assert(ids(DedupStore.ingest(docs(405L -> text(4), 407L -> text(2),
      406L -> text(55)), root, "2024-01-04")) === Set(405L, 406L))
    // and the other three disciplines refuse the same way
    val ex = intercept[IllegalStateException] {
      DedupStore.ingestExact(docs(1L -> text(1)), root, "2024-01-01")
    }
    assert(ex.getMessage.contains("self-suppress"))
    val ec = intercept[IllegalStateException] {
      DedupStore.ingestContained(docs(1L -> text(1)), root, "2024-01-03")
    }
    assert(ec.getMessage.contains("self-suppress"))
  }

  test("compacting a store with pre-postings-feature days never fabricates a complete postings table") {
    // the review-caught hazard: merging a MIX of postings-complete and
    // pre-feature days yields a postings/dt=merged-* dir that EXISTS
    // but lacks the pre-feature days' shingles — noveltyReport's
    // completeness check would trust it and mis-score re-served
    // archived content as novel
    val root = Files.createTempDirectory("dsc-post").toString
    simulateDays(root, 4)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // days 1-2 predate the postings feature
    for (d <- 1 to 2)
      f.delete(new org.apache.hadoop.fs.Path(f"$root/postings/dt=2024-01-$d%02d"), true)
    val r = DedupStore.compact(spark, root, keepDays = 1)
    assert(r.daysMerged === 3)
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      s"$root/postings/dt=${r.mergedDay.get}")),
      "an incomplete merged postings partition must not be written")
    // the reader falls back to the sets archive: a re-serve of a
    // PRE-FEATURE day's doc still scores novelty 0
    val nov = DedupStore.noveltyReport(docs(9000L -> text(1)), root)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(3)).toMap
    assert(nov(9000L) === 0.0,
      "archived pre-feature content mis-scored as novel — fast path trusted an incomplete merge")
  }

  test("compact is idempotent and a second call with nothing to merge is a no-op") {
    val root = Files.createTempDirectory("dsc-i").toString
    simulateDays(root, 5)
    val r1 = DedupStore.compact(spark, root, keepDays = 1)
    assert(r1.daysMerged === 4)
    val daysAfter = DedupStore.committedDays(spark, root)
    val r2 = DedupStore.compact(spark, root, keepDays = 1)
    // merged day + 1 retained = 2 committed days; dropRight(1) leaves
    // just the merged day → nothing to merge
    assert(r2.mergedDay.isEmpty && r2.daysMerged === 0)
    assert(DedupStore.committedDays(spark, root) === daysAfter)
  }

  test("IncrementalCurationJob.compactStores maintains all five store roots") {
    val root = Files.createTempDirectory("dsc-job").toString
    // letter-only per-day vocab: the job's quality floor demands
    // alpha ratio >= 0.5, which the digit-heavy w1x1 words fail
    def jobText(d: Int): String =
      (1 to 20).map(w => s"q${('a' + d).toChar}${('a' + w).toChar}zz").mkString(" ")
    (1 to 6).foreach { d =>
      graft.jobs.IncrementalCurationJob.ingestDay(
        docs((d * 100L) -> jobText(d)), root, f"2024-04-$d%02d",
        stats = false)
    }
    val reports = graft.jobs.IncrementalCurationJob
      .compactStores(spark, root, keepDays = 2)
    assert(reports.keySet === Set("exact", "near", "contain", "phash", "cos"))
    // every root folded its 4-day tail (exact always has digests;
    // near/contain may have fewer populated days but same day count)
    reports.foreach { case (name, r) =>
      if (name == "phash" || name == "cos")
        assert(r.daysMerged === 0, s"absent store must no-op: $r")
      else {
        assert(r.daysMerged === 4, s"$name: $r")
        assert(DedupStore.committedDays(spark, s"$root/$name").size === 3, name)
      }
    }
    // the maintained store still curates: a re-serve of a COMPACTED
    // day's doc dies at the exact stage
    val r = graft.jobs.IncrementalCurationJob.ingestDay(
      docs(999L -> (1 to 20).map(w => s"q${('a' + 2).toChar}${('a' + w).toChar}zz")
        .mkString(" ")), root, "2024-05-01")
    assert(r.afterExact === 0, "compacted digest store lost a day")
  }

  test("contain-store df table: compaction recomputes it from sets and heals pre-feature days") {
    val root = Files.createTempDirectory("dsc-df").toString
    val s = spark
    import s.implicits._
    (1 to 4).foreach { d =>
      DedupStore.ingestContained(
        docs((d * 100L) -> text(d), (d * 100L + 1) -> text2(d)),
        root, f"2024-03-$d%02d")
    }
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // every ingest committed its per-day df partition alongside sets
    for (d <- 1 to 4)
      assert(f.exists(new org.apache.hadoop.fs.Path(f"$root/df/dt=2024-03-$d%02d")),
        s"day $d must commit its df partition")
    // simulate a pre-feature day: delete day 1's df partition
    f.delete(new org.apache.hadoop.fs.Path(s"$root/df/dt=2024-03-01"), true)

    // compaction folds days 1-2 and RECOMPUTES the merged df from
    // their sets — the pre-feature day's counts are restored, not
    // silently missing (the postings-merge hazard, solved differently)
    val r = DedupStore.compact(spark, root, keepDays = 2)
    assert(r.daysMerged === 2, s"$r")
    val mergedDf = new org.apache.hadoop.fs.Path(s"$root/df/dt=${r.mergedDay.get}")
    assert(f.exists(mergedDf), "merged df partition must be recomputed from sets")
    val dfRows = spark.read.parquet(mergedDf.toString)
    // days 1+2 committed 4 docs x 10 words = 4 x 8 distinct 3-gram
    // shingles, all unique across disjoint vocabularies
    assert(dfRows.count() === 32)
    assert(dfRows.agg(org.apache.spark.sql.functions.max($"cnt")).head.getLong(0) === 1L)

    // and the healed store's df FAST path gives the SAME survivors as
    // an identical-content control store forced down the full-recount
    // FALLBACK (one missing df partition, never compacted): 9000 is a
    // whole-copy of a merged day's doc (containment 1.0 → drop); 9001
    // quotes a retained day's doc at 8/12 = 0.667 < 0.7 (survives);
    // 9002 is fresh
    val probe = docs(9000L -> text(1),
      9001L -> (text(2) + " plus a longer tail"), 9002L -> text(99))
    val fast = ids(DedupStore.ingestContained(probe, root, "2024-03-10"))
    val rootU = Files.createTempDirectory("dsc-df-u").toString
    (1 to 4).foreach { d =>
      DedupStore.ingestContained(
        docs((d * 100L) -> text(d), (d * 100L + 1) -> text2(d)),
        rootU, f"2024-03-$d%02d")
    }
    f.delete(new org.apache.hadoop.fs.Path(s"$rootU/df/dt=2024-03-01"), true)
    assert(ids(DedupStore.ingestContained(probe, rootU, "2024-03-10")) === fast,
      "df fast path diverged from the full-recount fallback")
    assert(fast === Set(9001L, 9002L), s"got $fast")
  }

  test("readers never touch replaced-day debris: ingest against a pending-sweep store survives poisoned standing dirs") {
    // the round-14 IVF drill's race, pinned on the DEDUP side: after a
    // fold, the replaced days' dirs stand until the next compact's
    // sweep, and an ingest's store-side listing racing that sweep died
    // on FileNotFound. readDays must list ONLY committed dirs — the
    // deterministic stand-in for any mid-sweep state is garbage bytes
    // in every standing replaced-day file: a reader that touches them
    // in any way dies, the committed view doesn't notice.
    val root = Files.createTempDirectory("dsc-debris").toString
    val ctl = Files.createTempDirectory("dsc-debris-ctl").toString
    simulateDays(root, 6)
    simulateDays(ctl, 6)
    val r = DedupStore.compact(spark, root, keepDays = 2)
    assert(r.mergedDay.isDefined && r.daysMerged === 4)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var poisoned = 0
    for (d <- 1 to 4) {
      val parts = Option(hfs.globStatus(new org.apache.hadoop.fs.Path(
        s"$root/*/dt=2024-01-0$d/part-*"))).getOrElse(Array.empty)
      parts.foreach { p =>
        val o = hfs.create(p.getPath, true)
        try o.write("not a parquet file".getBytes("UTF-8")) finally o.close()
        poisoned += 1
      }
    }
    assert(poisoned > 0, "replaced-day dirs should still stand pre-sweep")

    // day 7 probes the archive: a twin of a FOLDED day's doc must die
    // through the merged partition, a fresh doc survives — identical
    // verdicts to the debris-free control store
    val day7 = docs(900L -> text(3),
      901L -> (1 to 10).map(w => s"z7q$w").mkString(" "))
    val got = ids(DedupStore.ingest(day7, root, "2024-01-07"))
    val want = ids(DedupStore.ingest(day7, ctl, "2024-01-07"))
    assert(got === want && got === Set(901L),
      s"ingest over a pending-sweep store diverged: $got vs $want")
    // the novelty report reads the postings/sets side — same rule
    assert(DedupStore.noveltyReport(day7, root,
        exceptDay = Some("2024-01-07")).collect().nonEmpty)
  }

  test("normal ingests cannot use the reserved merged- day prefix") {
    val root = Files.createTempDirectory("dsc-r").toString
    val e = intercept[IllegalArgumentException] {
      DedupStore.ingest(docs(1L -> text(1)), root, "merged-evil")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
