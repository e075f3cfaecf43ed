package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotStore

/** SnapshotStore: incremental day-over-day merges equal the batch
  * recompute (the q90 monoid law, end-to-end THROUGH DISK), atomic
  * pointer semantics around crashes, vacuum retention, day-zero. */
class SnapshotStoreSpec extends AnyFunSuite with SparkSpec {

  // q90's profile monoid, reduced to its merge step: full-outer join,
  // least/greatest for the extrema, sums for the counters
  private def mergeProfiles(cur: DataFrame, delta: DataFrame): DataFrame = {
    val d = delta.select(col("user_id"), col("first_at").as("d_first"),
      col("last_at").as("d_last"), col("n_events").as("d_n"))
    cur.join(d, Seq("user_id"), "full")
      .select(col("user_id"),
        least(col("first_at"), col("d_first")).as("first_at"),
        greatest(col("last_at"), col("d_last")).as("last_at"),
        (coalesce(col("n_events"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_events"))
  }

  private def day(rows: (Long, Long, Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "first_at", "last_at", "n_events")
  }

  private def readAll(root: String) =
    SnapshotStore.read(spark, root, day().schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("two incremental upserts equal the batch recompute of the union") {
    val root = Files.createTempDirectory("snap-monoid").toString
    val d1 = day((1L, 10L, 20L, 3L), (2L, 15L, 15L, 1L))
    val d2 = day((2L, 5L, 30L, 2L), (3L, 40L, 41L, 4L))
    val v1 = SnapshotStore.upsert(root, d1, mergeProfiles)
    val v2 = SnapshotStore.upsert(root, d2, mergeProfiles)
    assert(v1 === 1L && v2 === 2L)
    assert(SnapshotStore.currentVersion(spark, root) === Some(2L))
    val batch = mergeProfiles(d1, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(readAll(root) === batch)
    assert(readAll(root) === Set(
      (1L, 10L, 20L, 3L), (2L, 5L, 30L, 3L), (3L, 40L, 41L, 4L)))
  }

  test("a crashed commit (orphan version, pointer not flipped) is invisible and not reused") {
    val root = Files.createTempDirectory("snap-crash").toString
    SnapshotStore.upsert(root, day((1L, 1L, 2L, 1L)), mergeProfiles)
    // simulate: v=2 written completely, crash BEFORE the pointer flip
    val orphan = new java.io.File(s"$root/v=00000002")
    assert(orphan.mkdirs())
    Files.write(orphan.toPath.resolve("part-bogus.parquet"), Array[Byte](9, 9))
    // readers still see v=1 — the orphan (even with garbage bytes) is unreachable
    assert(readAll(root) === Set((1L, 1L, 2L, 1L)))
    // the retry does not collide with the orphan: it becomes v=3
    val v = SnapshotStore.upsert(root, day((2L, 3L, 4L, 1L)), mergeProfiles)
    assert(v === 3L)
    assert(readAll(root) === Set((1L, 1L, 2L, 1L), (2L, 3L, 4L, 1L)))
    // vacuum(keep=1) sweeps the orphan and the superseded v=1
    assert(SnapshotStore.vacuum(spark, root, keep = 1) === Seq(1L, 2L))
    assert(readAll(root) === Set((1L, 1L, 2L, 1L), (2L, 3L, 4L, 1L)))
  }

  test("vacuum keeps the pointer target plus the newest keep-1 others") {
    val root = Files.createTempDirectory("snap-vac").toString
    (1 to 4).foreach(i =>
      SnapshotStore.upsert(root, day((i.toLong, 1L, 2L, 1L)), mergeProfiles))
    assert(SnapshotStore.vacuum(spark, root, keep = 2) === Seq(1L, 2L))
    val dirs = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(dirs.toSeq === Seq("v=00000003", "v=00000004"))
    assert(readAll(root).map(_._1) === Set(1L, 2L, 3L, 4L))
  }

  test("vacuum deletes a torn orphan unconditionally — it never consumes a keep slot") {
    // lineage [1,2,3], current=3, crashed-commit orphan v=4: the keep
    // budget must be spent on pointed lineage (retain 3 and 2, drop 1)
    // while the unreadable orphan is swept NOW, not one commit later
    val root = Files.createTempDirectory("snap-orphan").toString
    (1 to 3).foreach(i =>
      SnapshotStore.upsert(root, day((i.toLong, 1L, 2L, 1L)), mergeProfiles))
    val orphan = new java.io.File(s"$root/v=00000004")
    assert(orphan.mkdirs())
    Files.write(orphan.toPath.resolve("part-torn.parquet"), Array[Byte](9))
    assert(SnapshotStore.vacuum(spark, root, keep = 2) === Seq(1L, 4L))
    val dirs = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(dirs.toSeq === Seq("v=00000002", "v=00000003")) // rollback target survives
    assert(readAll(root).map(_._1) === Set(1L, 2L, 3L))
  }

  test("day zero: empty store reads as an empty frame; first upsert is the identity") {
    val root = Files.createTempDirectory("snap-zero").toString
    assert(readAll(root) === Set.empty)
    SnapshotStore.upsert(root, day((7L, 1L, 1L, 1L)), mergeProfiles)
    assert(readAll(root) === Set((7L, 1L, 1L, 1L)))
  }
}
