package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-row totality: the rows a 100 TB corpus ALWAYS contains
  * and clean synthetic gate data never exercises — NULL text, empty
  * and whitespace-only text, a one-word document (below every
  * shingle length), pathological repetition, non-ASCII/emoji text, a
  * NULL embedding and a zero-norm embedding (cosine denominator 0).
  *
  * The fixture plants exactly those rows in `documents`/`embeddings`
  * (TPC-H tables ride along as `limit(0)` — their totality is
  * [[EmptyCorpusSpec]]'s job) and runs the full registry, asserting
  * no query throws. Semantics under degeneracy are pinned only where
  * they are load-bearing:
  *
  *  - every native expression is `nullSafeEval` (NULL text → NULL
  *    signature → explode/joins drop the row — never a crash);
  *  - a zero-norm or null embedding must not poison ANN top-k: since
  *    round 12 the ANN family drops unusable vectors PER SIDE before
  *    any join (norm > 0, finite — the ingestCosine rule, mirrored
  *    in the DuckDB oracles), so an undefined similarity is never
  *    computed, never NULL-ranked, and a NaN/Inf element can never
  *    exploit Spark's NaN-sorts-first comparison order;
  *  - the quality floor cuts NULL text (predicate evaluates to NULL
  *    → filter drops), so downstream curation stages never see it.
  */
class DegenerateInputSpec extends AnyFunSuite with SparkSpec {

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-degen").toString
    val src = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.filterNot(Set("documents", "embeddings")).foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    // schemas must match the real tables, so derive them from sf0.001
    // and union the planted rows in by name.
    val docSchema = spark.read.parquet(s"$src/documents.parquet").schema
    val docs = Seq[(Long, String)](
      (1L, null),
      (2L, ""),
      (3L, "   \t  \n  "),
      (4L, "word"),
      (5L, Seq.fill(400)("badger").mkString(" ")),
      (6L, "héllo wörld 你好 世界 🙂 mixed script doc"),
      (7L, "a perfectly ordinary sentence with enough distinct words to shingle and rank normally today"))
      .toDF("doc_id", "text")
    val docFull = docs.select(docSchema.fields.map { f =>
      if (docs.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    docFull.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val embSchema = spark.read.parquet(s"$src/embeddings.parquet").schema
    // REAL column names (vec_id, embedding) — round 12: the original
    // fixture named these (doc_id, vec), which match nothing in the
    // embeddings schema, so the schema-fill below nulled EVERY cell
    // and the zero-norm / ragged-dim coverage was silently vacuous
    // (only the all-null row was ever exercised). Dim 16 ≠ the
    // corpus's 64 also exercises the ragged-width seams. vec_id 0 and
    // 50 land in the ANN family's %50 query sets so the zero-norm and
    // short-vector rows reach the query side too, not just the corpus
    // side.
    val dim = 16
    val embs = Seq[(Long, Seq[Float])](
      (1L, null),
      (0L, Seq.fill(dim)(0.0f)),                       // zero norm, a query id
      (50L, (0 until dim).map(i => (i + 1).toFloat)),  // ragged, a query id
      (4L, (0 until dim).map(i => (dim - i).toFloat)),
      // NaN/Inf ELEMENTS (round 12): Spark orders NaN above every
      // double, so an unguarded `score >= t` or top-k admits these
      // rows FIRST, and an ANSI CAST(NaN AS INT) throws — every
      // vector consumer must drop non-finite norms on both engine
      // sides (the ingestCosine rule)
      (6L, Float.NaN +: (1 until dim).map(i => i.toFloat)),
      (7L, Float.PositiveInfinity +: (1 until dim).map(i => i.toFloat)),
      // full-width NaN: passes every dim check, so the FINITE guards
      // (q58's serving drop, q113's centroid protection) are what
      // actually cut it
      (8L, Float.NaN +: (1 until 64).map(i => i.toFloat)))
      .toDF("vec_id", "embedding")
    val embFull = embs.select(embSchema.fields.map { f =>
      if (embs.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    embFull.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("all registry queries are total on degenerate documents/embeddings rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("zero-norm and null embeddings never reach ANN output on either pair side") {
    val out = SparkEntry.queries("q45_ann_bruteforce")(spark, dir)
    val rows = out.collect()
    // vec 0 is the zero vector (a QUERY id), vec 1 the null vector:
    // their similarity is undefined, and the per-side usable filter
    // must cut them BEFORE any pair forms — not rank, not crash,
    // not emit, on EITHER side.
    assert(!rows.exists(r => (0 until r.length).exists(i =>
      r.get(i) match { case d: Double => d.isNaN; case f: Float => f.isNaN; case _ => false })))
    assert(!rows.exists(r =>
      Seq(r.getLong(0), r.getLong(1)).exists(id => id == 0L || id == 1L)),
      s"zero-norm/null vectors leaked into ANN output: ${rows.mkString(", ")}")
    assert(!rows.exists(r => r.isNullAt(2)),
      "no NULL-cosine row may rank into the top-k")
  }

  test("drop seams report observed metrics: every cut is counted, none silent") {
    import scala.collection.mutable
    val seen = mutable.Map[String, (Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, row) =>
          seen.synchronized {
            seen(k) = (row.getAs[Long]("records"), row.getAs[Long]("dropped"))
          }
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries("q55_mm_byte_features")(spark, dir).count()
      SparkEntry.queries("q58_batched_inference")(spark, dir).count()
      // listener delivery is async; poll (the bus's waitUntilEmpty is private[spark])
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def both(): Boolean = seen.synchronized(
        seen.contains("q55_decode_input") && seen.contains("q58_inference_input"))
      while (!both() && System.nanoTime() < deadline) Thread.sleep(50)
      // 7 documents, 1 NULL payload; 7 embeddings, all invalid for the
      // model (NULL, zero-norm/NaN/Inf 16-dim, two normal 16-dim, one
      // 64-dim NaN — the full-width row only the FINITE check catches)
      assert(seen.synchronized(seen.get("q55_decode_input")) === Some((7L, 1L)))
      assert(seen.synchronized(seen.get("q58_inference_input")) === Some((7L, 7L)))
    } finally spark.listenerManager.unregister(listener)
  }

  test("hostile vectors corrupt-drop through the IVF write path: append stores none, probes and drift stay finite") {
    val s = spark
    import s.implicits._
    // the fixture's embeddings through the STORE lifecycle (round 13:
    // the round-12 sweep hardened the query families; this pins the
    // WRITE path) — usable rows are exactly {0 zero-norm, 4, 50}
    // (zero norm is fine under L2), while NULL (1), NaN-element (6),
    // Inf-element (7) and the 64-wide NaN row (8) must corrupt-drop
    // at [[KMeans.assign]]'s seam, never assign to an undefined cell.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-degen-ivf").toString + "/r"
    graft.operators.IvfStore.init(emb, "vec_id", "embedding", root,
      k = 2, iters = 2)
    graft.operators.IvfStore.append(emb, root, "2024-06-01")
    val stored = spark.read.parquet(s"$root/cells")
      .select($"vec_id").as[Long].collect().toSet
    assert(stored === Set(0L, 4L, 50L),
      s"append must store exactly the usable vectors, got $stored")
    val probed = graft.operators.IvfStore.probe(spark, root,
      "vec_id", "embedding",
      Seq(9000L -> (0 until 16).map(_.toDouble + 1).toArray),
      nprobe = 2, topK = 5).collect()
    assert(probed.map(_.getLong(1)).toSet.subsetOf(Set(0L, 4L, 50L)))
    assert(probed.forall(r => !r.isNullAt(2) && !r.getDouble(2).isNaN &&
      !r.getDouble(2).isInfinite), "probe distances must be defined")
    val drift = graft.operators.IvfStore.driftReport(spark, root).collect()
    assert(drift.length == 1 && drift.head.getLong(1) == 3L)
    val m = drift.head.getDouble(2)
    assert(!m.isNaN && !m.isInfinite, s"drift mean must stay finite: $m")
    assert(graft.operators.IvfStore.fsck(spark, root, deep = true).isEmpty,
      "a store fed hostile vectors through the REAL write path audits clean")
  }

  test("quality floor cuts NULL/empty/whitespace text; curation stays total") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val bench = Seq("benchmark eval sentence").toDF("text")
    val r = graft.jobs.CurationJob.curate(docs, bench)
    val kept = r.curated.select($"doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L),
      s"null/empty/whitespace text must not survive the quality floor; kept=$kept")
    assert(kept.contains(7L), "an ordinary document must survive")
  }
}
