package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contract for the `deflate_ratio` native expression —
  * the q128 rows-only query's gate, since no SQL engine exposes zlib
  * byte counts to oracle against. Pins invariants and orderings, not
  * magic byte constants (counts are deterministic per JDK zlib but
  * may shift across JDK upgrades). */
class DeflateRatioSpec extends AnyFunSuite with SparkSpec {

  private def withCodegen[T](enabled: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try f finally spark.conf.set(key, old)
  }

  private val repetitive = Seq.fill(300)("badger").mkString(" ")
  private val prose = "a perfectly ordinary sentence with enough distinct " +
    "words that the compressor finds some but not overwhelming redundancy " +
    "in the byte stream it walks over today"
  // fixed-seed pseudo-random alphanumerics: high-entropy, barely compresses
  private val highEntropy = {
    val rnd = new scala.util.Random(42)
    Seq.fill(600)(rnd.alphanumeric.head).mkString
  }

  private def frame = {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    Seq((1L, repetitive), (2L, prose), (3L, highEntropy),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", expr("deflate_ratio(text)").as("dr"))
      .select($"id", $"dr.raw_bytes", $"dr.deflated_bytes", $"dr.ratio")
  }

  test("exact byte accounting matches java.util.zip run standalone; codegen == interpreted") {
    def reference(s: String): (Long, Long) = {
      val bytes = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](64 * 1024)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      d.end()
      (bytes.length.toLong, out)
    }
    val expected = Map(1L -> reference(repetitive), 2L -> reference(prose),
      3L -> reference(highEntropy), 4L -> reference(""))
    for (cg <- Seq(true, false)) withCodegen(cg) {
      frame.collect().foreach { r =>
        val id = r.getLong(0)
        if (id == 5L) assert(r.isNullAt(1) && r.isNullAt(3), s"codegen=$cg")
        else {
          val (raw, out) = expected(id)
          assert(r.getLong(1) == raw, s"id=$id codegen=$cg raw")
          assert(r.getLong(2) == out, s"id=$id codegen=$cg deflated")
          if (raw == 0L) assert(r.isNullAt(3), s"id=$id codegen=$cg ratio-null")
          else assert(r.getDouble(3) == out.toDouble / raw, s"id=$id codegen=$cg")
        }
      }
    }
  }

  test("entropy ordering: repetitive << prose << high-entropy; ratio bounds sane") {
    val byId = frame.collect().map(r => r.getLong(0) -> r).toMap
    val rep = byId(1L).getDouble(3)
    val pro = byId(2L).getDouble(3)
    val ent = byId(3L).getDouble(3)
    assert(rep < 0.1, s"300x one word must crush: $rep")
    assert(rep < pro && pro < ent, s"ordering violated: $rep $pro $ent")
    assert(ent > 0.7, s"fixed-seed alphanumerics must resist: $ent")
    // q128's flag thresholds actually separate these fixtures
    assert(rep < 0.3 && ent > 0.3)
  }

  test("deterministic across runs and across a repartitioned (multi-thread) evaluation") {
    val a = frame.collect().sortBy(_.getLong(0)).map(_.toString)
    val b = frame.repartition(8).collect().sortBy(_.getLong(0)).map(_.toString)
    assert(a.sameElements(b))
  }
}
