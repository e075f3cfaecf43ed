package graft

import graft.operators.Bucketing
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed join runs without a shuffle on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
      val b = (1 to 500).map(i => (i.toLong % 97, s"x$i")).toDF("k", "vb")
      Bucketing.writeBucketed(a, "bkt_a", Seq("k"), 8)
      Bucketing.writeBucketed(b, "bkt_b", Seq("k"), 8)

      val joined = Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // correctness: equals the plain join
      val expected = a.join(b, Seq("k")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
