package graft

import graft.operators.SkewedJoin
import org.scalatest.funsuite.AnyFunSuite

class SkewedJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join result equals the plain join on skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    // 90% of rows on one hot key
    val left = (1 to 2000).map(i =>
      (if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(50).toLong + 2, i.toLong))
      .toDF("k", "lval")
    val right = (1 to 52).map(i => (i.toLong, s"r$i")).toDF("k", "rval")

    val plain = left.join(right, Seq("k")).select("k", "lval", "rval")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SkewedJoin.innerSalted(left, right, Seq("k"), buckets = 8)
      .select("k", "lval", "rval").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "lval")
    val salts = left
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.concat_ws(" ",
              org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.monotonically_increasing_id())),
          org.apache.spark.sql.functions.lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8, "hot key must land in every bucket")
  }
}
