package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q116's reason to exist: a doc quoted whole inside a much larger
  * doc has containment ≈ 1.0 but Jaccard ≈ |A|/|B| — far below any
  * sensible near-dup threshold, so the symmetric family (q41/q42/q43)
  * structurally cannot flag it. The gate corpus's template families
  * are near-symmetric, so the oracle equality alone never exercises
  * this case; here it is planted.
  */
class ContainmentSpec extends AnyFunSuite with SparkSpec {

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val quoted = (1 to 12).map(i => s"q$i").mkString(" ")  // the small doc
    val host = quoted + " " + (1 to 120).map(i => s"h$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    Seq((1L, quoted), (2L, host), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("full containment at tiny Jaccard: q116 flags what q41 cannot") {
    val s = spark
    import s.implicits._
    val contained = QueryRegistry.byName("q116_containment_dedup").fn(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // doc 1's 10 shingles all appear in doc 2 → containment 1.0, one
    // direction only (doc 2 is nowhere near contained in doc 1)
    assert(contained.contains((1L, 2L, 1.0)), s"missed full containment: $contained")
    assert(!contained.exists { case (a, b, _) => a == 2L && b == 1L },
      "containment must stay directional")
    assert(!contained.exists { case (a, b, _) => a == 3L || b == 3L },
      "the unrelated doc must stay clear")
    // the symmetric pipeline cannot see it: J = 10/130 ≈ 0.08
    val jaccard = QueryRegistry.byName("q41_dedup_jaccard").fn(spark, dir).count()
    assert(jaccard === 0L, "q41 flagging this pair would make q116 redundant")
  }
}
