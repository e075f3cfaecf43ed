package graft

import graft.jobs.MixtureJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MixtureJob.assemble]] — the composed epoch-assembly contract:
  * temperature up/down-sampling, budget prefix cut, contiguous
  * indexing, shard balance, determinism.
  *
  * Fixture: 90 "en" docs vs 10 "fr" docs with the n^0.5 rule →
  * weights w_en = ⌊√90⌋ = 9, w_fr = ⌊√10⌋ = 3, s_w = 12, N = 100:
  * rate_fr = 100·3/(10·12) = 2.5 (every fr doc twice, half a third
  * time), rate_en = 100·9/(90·12) ≈ 0.833 (md5-Bernoulli keep).
  */
class MixtureJobSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    val en = (1 to 90).map(i =>
      (i.toLong, "en", s"english document number $i with some words"))
    val fr = (1 to 10).map(i =>
      (1000L + i, "fr", s"document francais numero $i avec des mots"))
    (en ++ fr).toDF("doc_id", "lang", "text")
  }

  test("temperature: fr up-samples to 2-3 copies, en down-samples to 0-1") {
    val s = spark
    import s.implicits._
    val out = MixtureJob.assemble(docs)
    val perDoc = out.groupBy($"doc_id", $"slice")
      .agg(max($"copy").as("copies")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fr = perDoc.filter(_._2 == "fr")
    assert(fr.length === 10, "every fr doc must appear (rate ≥ 2)")
    assert(fr.forall(d => d._3 == 2L || d._3 == 3L), s"fr copies: ${fr.toSeq}")
    assert(fr.exists(_._3 == 3L), "frac 0.5 should grant some third copies")
    val en = perDoc.filter(_._2 == "en")
    assert(en.forall(_._3 == 1L), "kept en docs carry exactly one copy")
    assert(en.length < 90 && en.length > 50,
      s"en keep-rate should sit near 0.833: ${en.length}/90")
    // E[total samples] = N = 100; md5-Bernoulli keeps it near
    val total = out.count()
    assert(total > 80 && total < 120, s"epoch size drifted: $total")
  }

  test("sample_idx is contiguous from 1 in shuffle-key order; shards balance") {
    val s = spark
    import s.implicits._
    val out = MixtureJob.assemble(docs, MixtureJob.Config(shards = 4))
    val idx = out.select($"sample_idx").as[Long].collect().sorted
    assert(idx.head === 1L && idx.last === idx.length.toLong,
      "index must be a contiguous 1-based range")
    val shardCounts = out.groupBy($"shard_id").count()
      .select($"count").as[Long].collect()
    assert(shardCounts.max - shardCounts.min <= 1,
      s"round-robin shards must balance within 1: ${shardCounts.toSeq}")
  }

  test("token budget cuts a prefix: kept max cum <= B < next sample's cum") {
    val s = spark
    import s.implicits._
    val full = MixtureJob.assemble(docs) // no budget
    val ordered = full.orderBy($"sample_idx")
      .select($"cum_tokens").as[Long].collect()
    val budget = ordered(ordered.length / 2) // cut mid-epoch
    val cut = MixtureJob.assemble(docs, MixtureJob.Config(tokenBudget = budget))
    val kept = cut.orderBy($"sample_idx")
      .select($"cum_tokens").as[Long].collect()
    assert(kept.last <= budget)
    assert(kept.length < ordered.length, "budget must actually cut")
    // the kept samples are exactly the full epoch's prefix
    assert(kept.toSeq === ordered.take(kept.length).toSeq,
      "budget cut must be a prefix of the unbudgeted shuffle order")
    assert(ordered(kept.length) > budget, "first excluded sample must overflow")
  }

  test("run(): shard-partitioned parquet layout + scalar summary (the --job=mixtureJob path)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixture").toString
    docs.write.mode("overwrite").parquet(s"$tmp/in")
    val summary = MixtureJob.run(spark, s"$tmp/in", s"$tmp/out",
      MixtureJob.Config(shards = 4))
    val back = spark.read.parquet(s"$tmp/out")
    val n = back.count()
    assert(summary === s"""{"samples":$n,"epoch_tokens":${
      back.agg(max($"cum_tokens")).head.getLong(0)},"shards":4}""")
    // partitioned layout: a trainer reads exactly its shard directory
    val shardDirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(shardDirs.toSeq === Seq("shard_id=0", "shard_id=1", "shard_id=2", "shard_id=3"))
    val viaDir = spark.read.parquet(s"$tmp/out/shard_id=1").count()
    assert(viaDir === back.filter($"shard_id" === 1).count())
  }

  test("deterministic: two assemblies are identical") {
    val s = spark
    import s.implicits._
    val a = MixtureJob.assemble(docs).orderBy($"sample_idx").collect().toSeq
    val b = MixtureJob.assemble(docs).orderBy($"sample_idx").collect().toSeq
    assert(a === b)
  }
}
