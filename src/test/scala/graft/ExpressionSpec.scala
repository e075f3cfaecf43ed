package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression specs: each custom Catalyst expression must be
  * bit-identical to its pure-SQL/HOF reference formulation, under
  * both codegen and interpreted evaluation. */
class ExpressionSpec extends AnyFunSuite with SparkSpec {

  private def withCodegen[T](enabled: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try f finally spark.conf.set(key, old)
  }

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c"),
      (3L, "tiny"),
      (4L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
  }

  test("minhash_sig == SQL universal-hash formulation (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    import graft.functions.MinHashSigImpl.{K, P, a, b}
    val aArr = a.mkString("array(", "L,", "L)")
    val bArr = b.mkString("array(", "L,", "L)")
    val base = docs
      .withColumn("ws", split(trim(col("text")), "\\s+"))
      .filter(size(col("ws")) >= 3)
      .withColumn("sset", array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", slice(col("ws"), i, lit(3))))))
    val q = base.select(
      expr("minhash_sig(sset)").as("native"),
      expr(s"""transform(sequence(0, ${K - 1}), i -> array_min(transform(
           transform(sset, s -> CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT) % ${P}L),
           x -> ($aArr[i] * x + $bArr[i]) % ${P}L)))""").as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codegen=$cg")
      }
    }
  }

  test("srp_sig == HOF multi-table SRP bucket fold (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val (tables, bits, dim) = (3, 4, 16)
    val emb = (0 until 24)
      .map(i => (i.toLong, Array.tabulate(dim)(j => math.sin(i * 31 + j).toFloat)))
      .toDF("vec_id", "embedding")
    for (salt <- Seq("", "cos")) {
      val wLit = (0 until tables * bits)
        .map(h => graft.functions.SrpSigImpl.planeWeights(salt, h, dim)
          .map(v => s"${v}D").mkString("array(", ",", ")"))
        .mkString("array(", ",", ")")
      val hof = s"""transform(sequence(0, ${tables - 1}), t ->
        aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, p) ->
          acc * 2 + CASE WHEN aggregate(
              zip_with($wLit[t * $bits + p], embedding, (w, x) -> w * CAST(x AS DOUBLE)),
              0D, (a, y) -> a + y) > 0
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END))"""
      val q = emb.select(
        expr(s"srp_sig(embedding, '$salt', $tables, $bits)").as("native"),
        expr(hof).as("ref"))
      for (cg <- Seq(true, false)) withCodegen(cg) {
        q.collect().foreach { r =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"salt=$salt codegen=$cg")
        }
      }
    }
  }

  test("simhash60 == SQL ±1-bit-vote formulation (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    val base = docs
      .withColumn("ws", split(trim(col("text")), "\\s+"))
      .filter(size(col("ws")) >= 3)
      .withColumn("sset", array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", slice(col("ws"), i, lit(3))))))
    val q = base.select(
      expr("simhash60(sset)").as("native"),
      expr("""aggregate(transform(sequence(0,59), j ->
          CASE WHEN aggregate(transform(
                 transform(sset, s -> cast(conv(substring(md5(s),1,15),16,10) AS BIGINT)),
                 h -> CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END),
               0, (a, x) -> a + x) > 0
          THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END),
        CAST(0 AS BIGINT), (a, x) -> a + x)""").as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), s"codegen=$cg"))
    }
  }

  test("rolling_fingerprint == SQL min-md5-window formulation") {
    GraftExtensions.ensureRegistered(spark)
    val q = docs.select(
      expr("rolling_fingerprint(text)").as("native"),
      expr("""named_struct(
          'fingerprint', array_min(transform(sequence(1, greatest(length(text)-7, 1)), i -> md5(substring(text, i, 8)))),
          'n_distinct_windows', CAST(size(array_distinct(transform(sequence(1, greatest(length(text)-7, 1)), i -> md5(substring(text, i, 8))))) AS BIGINT))""").as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach(r => assert(r.getStruct(0) == r.getStruct(1), s"codegen=$cg"))
    }
  }

  test("vec_dot == HOF zip_with+aggregate, bit-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "a", "b")
    val q = df.select(
      Vectors.dot(col("a"), col("b")).as("native"),
      Vectors.dotHof(col("a"), col("b")).as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1), s"codegen=$cg") // bit-exact, not approx
      }
    }
  }

  test("vec_l2d2 == HOF zip_with+aggregate, bit-exact incl. corrupt rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // well-formed rows + the corrupt classes the HOF nulls: width
    // mismatch (zip_with pads with null), a null element, NaN/Inf
    // elements (flow through arithmetic, NOT nulled)
    val base = (1 to 50).map(i => (i.toLong,
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = base.toDF("id", "a", "b")
      .union(Seq(
        (101L, Array.fill(63)(0.5f), Array.fill(64)(0.25)),          // width mismatch
        (102L, Array(1.0f, Float.NaN, 3.0f), Array(1.0, 2.0, 3.0)),  // NaN
        (103L, Array(1.0f, Float.PositiveInfinity), Array(1.0, 2.0)) // Inf
      ).toDF("id", "a", "b"))
      .union(Seq(104L).toDF("id")
        .select(col("id"),
          array(lit(1.0f), lit(null).cast("float")).as("a"),
          array(lit(1.0), lit(2.0)).as("b")))                        // null element
    val q = df.select(
      Vectors.l2d2(col("a"), col("b")).as("native"),
      Vectors.l2d2Hof(col("a"), col("b")).as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"codegen=$cg null parity")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
            s"codegen=$cg bit parity")
      }
    }
  }

  test("adc_fold == HOF zip_with+try_element_at+aggregate, incl. out-of-range/negative/null codes") {
    import spark.implicits._
    val lut: Array[Array[Double]] =
      Array(Array(1.0, 2.0, 4.0), Array(8.0, 16.0, 32.0))
    val rows = Seq(
      (1L, Array(0, 2)),      // in range
      (2L, Array(2, 0)),      // in range
      (3L, Array(3, 0)),      // idx 4 > len: out of range -> null
      (5L, Array(-3, 0)),     // idx -2: addresses from the END
      (6L, Array(-5, 0)),     // idx -4 < -len: out of range -> null
      (7L, Array(0)),         // width mismatch vs 2 LUT rows -> null
      (8L, Array(0, 1, 2)))   // width mismatch (long side) -> null
    val df = rows.toDF("id", "codes")
      .union(Seq(9L).toDF("id").select(col("id"),
        array(lit(0), lit(null).cast("int")).as("codes"))) // null code
      .withColumn("lut", typedLit(lut.map(_.toSeq).toSeq))
    val q = df.select(
      Vectors.adcFold(col("codes"), col("lut")).as("native"),
      Vectors.adcFoldHof(col("codes"), col("lut")).as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"codegen=$cg null parity")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
            s"codegen=$cg bit parity")
      }
    }
    // index-0 parity: code −1 THROWS in both formulations (element_at
    // index 0 is invalid even under try_element_at — the native fold
    // must not silently diverge to null on that input)
    val zeroIdx = Seq((4L, Array(-1, 0))).toDF("id", "codes")
      .withColumn("lut", typedLit(lut.map(_.toSeq).toSeq))
    for (c <- Seq(Vectors.adcFold(col("codes"), col("lut")),
        Vectors.adcFoldHof(col("codes"), col("lut")))) {
      val e = intercept[Exception](zeroIdx.select(c).collect())
      assert(e.getMessage.contains("INVALID_INDEX_OF_ZERO"),
        s"expected INVALID_INDEX_OF_ZERO, got: ${e.getMessage}")
    }
  }

  test("l2_argmin == HOF transform+array_min+array_position chain, incl. ties and corrupt rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val cents: Seq[Array[Double]] =
      Seq(Array(0.0, 0.0), Array(1.0, 1.0), Array(0.0, 0.0), Array(2.0, 2.0))
    // duplicate centroid 2 == centroid 0 forces argmin TIES: the
    // chain's array_position returns the FIRST match
    val vecs = (1 to 40).map(i => (i.toLong,
      Array.fill(2)(rnd.nextFloat() * 4 - 1)))
    val df = vecs.toDF("id", "v")
      .union(Seq((101L, Array.fill(3)(0.5f))).toDF("id", "v")) // wrong width
    val centArr = array(cents.map(c => lit(c)): _*)
    val refD2 = transform(centArr, c =>
      aggregate(
        zip_with(c, col("v"), (x, y) => {
          val dlt = x - y.cast("double"); dlt * dlt
        }),
        lit(0.0), (acc, x) => acc + x))
    val q = df.select(
      Vectors.l2ArgMin(col("v"), centArr).as("native"),
      struct(
        (array_position(refD2, array_min(refD2)) - 1).cast("int").as("cell"),
        array_min(refD2).as("dist2")).as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      q.collect().foreach { r =>
        val (n, f) = (r.getStruct(0), r.getStruct(1))
        assert(n.isNullAt(0) === f.isNullAt(0), s"codegen=$cg cell null parity")
        if (!n.isNullAt(0)) {
          assert(n.getInt(0) === f.getInt(0), s"codegen=$cg argmin cell")
          assert(java.lang.Double.doubleToRawLongBits(n.getDouble(1)) ==
            java.lang.Double.doubleToRawLongBits(f.getDouble(1)),
            s"codegen=$cg dist2 bit parity")
        }
      }
    }
  }

  test("word_shingles == HOF distinct-concat_ws-slice formulation (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    // edge inputs: tabs (trim is space-only → leading empty token),
    // repeated shingles (distinct order), multi-space runs, short docs
    val tricky = docs.union(Seq(
      (5L, "\tx y z w\t"),
      (6L, "a  b   c a  b   c"),
      (7L, " padded   with spaces ")
    ).toDF("doc_id", "text"))
    val q = tricky
      .filter(size(split(trim(col("text")), "\\s+")) >= 3) // HOF form needs ≥3 words
      .select(
        expr("word_shingles(text, 3)").as("native"),
        array_distinct(transform(
          sequence(lit(1), size(split(trim(col("text")), "\\s+")) - 2),
          i => concat_ws(" ", slice(split(trim(col("text")), "\\s+"), i, lit(3))))).as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = q.collect()
      assert(rows.length >= 5)
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"codegen=$cg")
      }
    }
    // sub-n-word docs: native form degrades to an empty set
    assert(spark.sql("SELECT word_shingles('tiny', 3)").head.getSeq[String](0).isEmpty)
  }

  test("word_shingle_hashes == transform(word_shingles, xxhash64) (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val tricky = docs.union(Seq(
      (5L, "\tx y z w\t"),
      (6L, "a  b   c a  b   c"),
      (7L, " padded   with spaces ")
    ).toDF("doc_id", "text"))
    val q = tricky.select(
      expr("word_shingle_hashes(text, 3)").as("native"),
      expr("transform(word_shingles(text, 3), x -> xxhash64(x))").as("ref"))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = q.collect()
      assert(rows.length >= 7)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codegen=$cg")
      }
    }
  }

  test("word_counts == explode+groupBy term counting (codegen + interpreted)") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val tricky = docs.union(Seq(
      (5L, "\tx y x\t"), (6L, "a a a b"), (7L, " one ")
    ).toDF("doc_id", "text"))
    tricky.createOrReplaceTempView("wc_docs")
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val native = spark.sql(
        """SELECT doc_id, w.word, w.tf FROM wc_docs
           LATERAL VIEW explode(word_counts(text)) AS w""")
        .as[(Long, String, Long)].collect().toSet
      val ref = tricky
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("word"))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
        .as[(Long, String, Long)].collect().toSet
      assert(native == ref, s"codegen=$cg")
    }
  }

  test("word_shingles/word_counts: random whitespace-heavy strings match a Scala reference") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \t cd  e \n"
    val texts = (1L to 40L).map { i =>
      (i, Seq.fill(6 + rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    def tokens(t: String): Array[String] =
      java.util.regex.Pattern.compile("\\s+")
        .split(t.replaceAll("^ +| +$", ""), -1) // space-only trim, like UTF8String.trim
    val refShingles = texts.map { case (i, t) =>
      val w = tokens(t)
      i -> w.indices.dropRight(2).map(j => s"${w(j)} ${w(j + 1)} ${w(j + 2)}").distinct.toSeq
    }.toMap
    val refCounts = texts.map { case (i, t) =>
      i -> tokens(t).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = texts.toDF("doc_id", "text")
    df.select($"doc_id", expr("word_shingles(text, 3)")).as[(Long, Seq[String])]
      .collect().foreach { case (i, got) => assert(got == refShingles(i), s"doc $i shingles") }
    df.select($"doc_id", expr("word_counts(text)")).as[(Long, Seq[(String, Long)])]
      .collect().foreach { case (i, got) =>
        assert(got.toMap == refCounts(i), s"doc $i counts")
        assert(got.map(_._1).distinct.size == got.size, s"doc $i distinctness")
      }
    // the fused hash variant must track word_shingles exactly on the
    // same adversarial inputs (per-element xxhash64, order preserved)
    df.select($"doc_id",
        expr("word_shingle_hashes(text, 3)").as("h"),
        expr("transform(word_shingles(text, 3), x -> xxhash64(x))").as("ref"))
      .as[(Long, Seq[Long], Seq[Long])]
      .collect().foreach { case (i, got, ref) =>
        assert(got == ref, s"doc $i shingle hashes")
      }
  }

  test("native expressions are usable from plain SQL after registration") {
    GraftExtensions.ensureRegistered(spark)
    docs.createOrReplaceTempView("expr_docs")
    val out = spark.sql(
      """SELECT doc_id, rolling_fingerprint(text).fingerprint AS fp,
         vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
         FROM expr_docs ORDER BY doc_id""").collect()
    assert(out.length == 4)
    assert(out.head.getDouble(2) == 11.0)
    // identical texts → identical fingerprints
    assert(out(0).getString(1) == out(3).getString(1))
  }
}
