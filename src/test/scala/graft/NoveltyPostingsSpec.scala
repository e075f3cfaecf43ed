package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupStore

/** [[DedupStore.noveltyReport]]'s round-10 fast path: every ingest
  * commits a per-day `postings` table (the day's distinct shingle
  * hashes, one slim column), and the report anti-joins against it
  * instead of exploding + DISTINCTing the whole sets archive. The
  * fast path must be bit-identical to the legacy sets-derived path,
  * and a store with ANY pre-feature day (sets present, postings
  * absent) must transparently fall back — using postings there would
  * silently drop that day's shingles and inflate novelty.
  */
class NoveltyPostingsSpec extends AnyFunSuite with SparkSpec {

  private def docs(ids: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.toDF("doc_id", "text")
  }

  private def text(d: Int): String =
    (1 to 10).map(w => s"n${d}q$w").mkString(" ")

  private def report(delta: DataFrame, root: String): Map[Long, (Long, Long, Double)] =
    DedupStore.noveltyReport(delta, root)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("postings fast path ≡ legacy sets path, and mixed stores fall back") {
    val root = Files.createTempDirectory("npost").toString
    (1 to 4).foreach { d =>
      DedupStore.ingest(docs(
        (d * 10L) -> text(d), (d * 10L + 1) -> text(d + 100)),
        root, f"2024-03-$d%02d")
    }
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 4).foreach { d =>
      assert(f.exists(new org.apache.hadoop.fs.Path(
        f"$root/postings/dt=2024-03-$d%02d")),
        s"ingest must commit day $d's postings partition")
    }

    // probe: one archived re-serve (novelty 0), one half-overlap (text
    // shares nothing — fully novel), one fresh
    val probe = docs(
      900L -> text(2),                                  // all shingles archived
      901L -> (text(3).split(" ").take(5) ++ (1 to 5).map(i => s"fresh$i")).mkString(" "),
      902L -> "entirely new words never stored anywhere at all today")

    val fast = report(probe, root)
    assert(fast(900L)._3 === 0.0)
    assert(fast(902L)._3 === 1.0)
    assert(fast(901L)._3 > 0.0 && fast(901L)._3 < 1.0)

    // legacy path: delete ALL postings partitions — the report must
    // fall back to the sets archive and produce identical numbers
    assert(f.delete(new org.apache.hadoop.fs.Path(s"$root/postings"), true))
    val legacy = report(probe, root)
    assert(legacy === fast, "fast path diverged from the sets-derived truth")

    // mixed store: re-create postings for ONLY day 1 (as if days 2-4
    // predate the feature) — using the incomplete postings table
    // would drop days 2-4's shingles and mis-score doc 900 as novel;
    // the completeness check must route to the fallback instead
    DedupStore.ingest(docs(50L -> text(50)), root, "2024-03-05")
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/postings/dt=2024-03-05")))
    val mixed = report(probe, root)
    assert(mixed(900L)._3 === 0.0,
      "incomplete postings must not be trusted — day 2's shingles were only in sets")
    assert(mixed(902L)._3 === 1.0)
  }
}
