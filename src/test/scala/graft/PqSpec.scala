package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqModel, ProductQuantizer => PQ}

/** ProductQuantizer: ADC scoring is EXACTLY brute-force distance to
  * the reconstruction (the scorer adds no approximation), encoding
  * ties break to the first codeword, training is deterministic and
  * recovers planted structure, the train cap samples deterministically,
  * and degenerate vectors corrupt-drop at every seam. */
class PqSpec extends AnyFunSuite with SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v").selectExpr("id", "cast(v as array<float>) as v")
  }

  /** Hand model: dim 4, m 2, three 2-dim codewords per subspace. */
  private val hand = PqModel(dim = 4, m = 2, codebooks = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(5.0, 5.0)),
    Seq(Seq(0.0, 1.0), Seq(2.0, 2.0), Seq(9.0, 0.0))))

  test("encode picks the per-subspace argmin codeword; ties go FIRST") {
    val df = vecDf(Seq(
      1L -> Seq(0.9f, 1.1f, 2.1f, 1.9f), // → (1, 1)
      2L -> Seq(5.2f, 4.8f, 0.1f, 0.9f), // → (2, 0)
      3L -> Seq(0.5f, 0.5f, 0f, 0f)))    // sub0 EQUIDISTANT to cw0/cw1 → 0
    val out = PQ.encode(df, hand, "v").select("id", "pq_codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) === Seq(1, 1))
    assert(out(2L) === Seq(2, 0))
    assert(out(3L).head === 0, s"tie must break to the first codeword: ${out(3L)}")
  }

  test("reconstruct concatenates the coded codewords, dim wide") {
    val df = vecDf(Seq(1L -> Seq(0.9f, 1.1f, 2.1f, 1.9f)))
    val rec = PQ.encode(df, hand, "v")
      .select(PQ.reconstruct(hand, col("pq_codes")).as("r"))
      .collect().head.getSeq[Double](0)
    assert(rec === Seq(1.0, 1.0, 2.0, 2.0))
  }

  test("ADC top-k == brute-force distance to the reconstruction (exact identity)") {
    val rnd = new scala.util.Random(11)
    val corpus = vecDf((0 until 60).map(i =>
      i.toLong -> Seq.fill(4)(rnd.nextFloat() * 4f - 2f)))
    val queries = vecDf((100 until 105).map(i =>
      i.toLong -> Seq.fill(4)(rnd.nextFloat() * 4f - 2f)))
      .withColumnRenamed("id", "q_id").withColumnRenamed("v", "qv")
    val coded = PQ.encode(corpus, hand, "v")
    val adc = PQ.adcTopK(coded, "id", "pq_codes", queries, "q_id", "qv",
      hand, topK = 3)
      .select("q_id", "id", "adc_d2", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute force: exact squared L2 of each float query to each reconstruction
    val brute = coded
      .select(col("id"), PQ.reconstruct(hand, col("pq_codes")).as("rec"))
      .crossJoin(queries)
      .select(col("q_id"), col("id"), PQ.d2(col("qv"), col("rec")).as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .groupBy(_._1._1).map { case (q, m) =>
        q -> m.toSeq.map { case ((_, id), d) => (d, id) }.sorted.take(3)
      }
    for (q <- 100L until 105L; k <- 1 to 3) {
      val (gotId, gotD2) = adc((q, k))
      val (wantD2, wantId) = brute(q)(k - 1)
      assert(gotId === wantId, s"q=$q rank=$k")
      assert(math.abs(gotD2 - wantD2) < 1e-9, s"q=$q rank=$k: $gotD2 vs $wantD2")
    }
  }

  /** 4 planted 8-dim blobs, m=2 subspaces: trained PQ must give
    * blob-mates identical codes and ADC recall 1.0 against exact. */
  test("trained codebooks separate planted blobs; ADC recall is exact on them") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Seq(
      Array.fill(8)(10.0), Array.fill(8)(-10.0),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0 else -10.0),
      Array.fill(8)(0.0))
    val rows = for (b <- 0 until 4; i <- 0 until 40) yield
      ((b * 40 + i).toLong, b,
        centers(b).map(c => (c + rnd.nextDouble() - 0.5).toFloat).toSeq)
    val df = rows.toDF("id", "blob", "v")
      .selectExpr("id", "blob", "cast(v as array<float>) as v")
      .repartition(5).cache()
    try {
      val model = PQ.train(df, "id", "v", dim = 8, m = 2, k = 4, iters = 4)
      assert(model.codebooks.forall(_.forall(_.length === 4)))
      val model2 = PQ.train(df, "id", "v", dim = 8, m = 2, k = 4, iters = 4)
      assert(model === model2, "training must be deterministic")
      val coded = PQ.encode(df, model, "v")
      val codesPerBlob = coded.groupBy($"blob")
        .agg(countDistinct($"pq_codes").as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(codesPerBlob.values.forall(_ === 1L),
        s"each blob must encode to ONE code word pair: $codesPerBlob")
      assert(coded.select($"pq_codes").distinct().count() === 4L)
      // ADC: each blob-center query must retrieve only blob-mates
      val queries = centers.zipWithIndex.map { case (c, i) =>
        (1000L + i, c.map(_.toFloat).toSeq)
      }.toDF("q_id", "qv").selectExpr("q_id", "cast(qv as array<float>) as qv")
      val top = PQ.adcTopK(coded, "id", "pq_codes", queries, "q_id", "qv",
        model, topK = 10)
        .join(coded.select($"id", $"blob"), "id")
        .groupBy($"q_id").agg(collect_set($"blob").as("blobs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      for (i <- 0 until 4)
        assert(top(1000L + i) === Seq(i), s"query $i: ${top(1000L + i)}")
    } finally { df.unpersist(); () }
  }

  /** The 100 TB composition: IVF prunes WHICH rows a probe scans
    * (cell partitions), PQ shrinks WHAT each scanned row costs
    * (codes + ADC). On separable data the one-cell ADC answer must
    * equal the full-corpus ADC answer while touching only the
    * probed cell's rows. */
  test("IVF cell pruning composes with ADC: one-cell probe = full answer on separable data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Seq(
      Array.fill(8)(10.0), Array.fill(8)(-10.0),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0 else -10.0),
      Array.fill(8)(0.0))
    val rows = for (b <- 0 until 4; i <- 0 until 30) yield
      ((b * 30 + i).toLong,
        centers(b).map(c => (c + rnd.nextDouble() - 0.5).toFloat).toSeq)
    val df = rows.toDF("id", "v")
      .selectExpr("id", "cast(v as array<float>) as v").cache()
    try {
      val cellModel = graft.operators.KMeans.train(df, "id", "v", k = 4, iters = 3)
      val pq = PQ.train(df, "id", "v", dim = 8, m = 2, k = 4, iters = 3)
      val coded = PQ.encode(
        graft.operators.KMeans.assign(df, cellModel.centroids, "v"), pq, "v")
        .cache()
      val query = Seq((9000L, centers(2).map(_.toFloat).toSeq))
        .toDF("q_id", "qv").selectExpr("q_id", "cast(qv as array<float>) as qv")
      // the query's nearest cell, then ADC only within it
      val qCell = graft.operators.KMeans
        .assign(query.withColumnRenamed("qv", "v"), cellModel.centroids, "v")
        .select($"cell").collect().head.getInt(0)
      val oneCell = coded.filter($"cell" === qCell)
      assert(oneCell.count() === 30L, "the probed cell must hold exactly its blob")
      val pruned = PQ.adcTopK(oneCell, "id", "pq_codes", query, "q_id", "qv",
        pq, topK = 10).select($"id", $"rank").collect()
        .map(r => r.getInt(1) -> r.getLong(0)).toMap
      val full = PQ.adcTopK(coded, "id", "pq_codes", query, "q_id", "qv",
        pq, topK = 10).select($"id", $"rank").collect()
        .map(r => r.getInt(1) -> r.getLong(0)).toMap
      assert(pruned === full,
        "cell pruning must not change the answer when the blob owns the cell")
      assert(full.values.forall(id => id >= 60L && id < 90L),
        "every hit comes from the query's blob")
    } finally { df.unpersist(); () }
  }

  test("train cap samples deterministically and still yields a usable model") {
    val rnd = new scala.util.Random(9)
    val df = vecDf((0 until 300).map(i =>
      i.toLong -> Seq.fill(4)(rnd.nextFloat()))).cache()
    try {
      spark.conf.set(PQ.MaxTrainRowsConf, "50")
      val capped = PQ.train(df, "id", "v", dim = 4, m = 2, k = 3, iters = 2)
      val capped2 = PQ.train(df, "id", "v", dim = 4, m = 2, k = 3, iters = 2)
      assert(capped === capped2, "capped training must stay deterministic")
      spark.conf.set(PQ.MaxTrainRowsConf, "0") // disabled → full corpus
      val full = PQ.train(df, "id", "v", dim = 4, m = 2, k = 3, iters = 2)
      assert(capped !== full,
        "a 50-row slice of 300 rows must not train the full-corpus model")
      assert(PQ.encode(df, capped, "v").count() === 300L)
    } finally {
      spark.conf.unset(PQ.MaxTrainRowsConf)
      df.unpersist(); ()
    }
  }

  test("degenerate vectors corrupt-drop through train, encode and adcTopK") {
    val s = spark
    import s.implicits._
    val good = (0 until 20).map(i => (i.toLong, Seq(1f * i, 2f, 3f, 4f)))
    val bad: Seq[(Long, Seq[Float])] = Seq(
      (100L, null), (101L, Seq(1f, 2f)), (102L, Seq(Float.NaN, 0f, 0f, 0f)),
      (103L, Seq(Float.PositiveInfinity, 0f, 0f, 0f)))
    val df = (good ++ bad).toDF("id", "v")
      .selectExpr("id", "cast(v as array<float>) as v")
    val model = PQ.train(df, "id", "v", dim = 4, m = 2, k = 2, iters = 2)
    assert(model.codebooks.flatten.flatten.forall(d =>
      !d.isNaN && !d.isInfinite), "no poisoned codeword")
    val coded = PQ.encode(df, model, "v")
    assert(coded.count() === 20L, "encode drops the 4 corrupt rows")
    val top = PQ.adcTopK(coded, "id", "pq_codes",
      df.withColumnRenamed("id", "q_id").withColumnRenamed("v", "qv"),
      "q_id", "qv", model, topK = 2)
    assert(top.select($"q_id").distinct().count() === 20L,
      "corrupt queries drop; no NaN query ranks")
    assert(top.filter(isnan($"adc_d2")).count() === 0L)
    // hand-made corpora: a NULL / wrong-width / out-of-range code
    // array must corrupt-drop, never claim rank 1 via a null distance
    // (Spark sorts nulls FIRST in an asc window)
    val sabotaged = coded.select($"id", $"pq_codes")
      .unionByName(Seq(
        (500L, null.asInstanceOf[Seq[Int]]),
        (501L, Seq(0)),            // wrong width
        (502L, Seq(99, 99)))       // out-of-range codes → null lookups
        .toDF("id", "pq_codes"))
    val top2 = PQ.adcTopK(sabotaged, "id", "pq_codes",
      df.limit(1).withColumnRenamed("id", "q_id").withColumnRenamed("v", "qv"),
      "q_id", "qv", model, topK = 3)
    val got2 = top2.select($"id").as[Long].collect().toSet
    assert(got2.intersect(Set(500L, 501L, 502L)).isEmpty,
      s"sabotaged rows must never rank: $got2")
    assert(top2.filter($"adc_d2".isNull).count() === 0L)
  }
}
