package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TEMP (round-17 dev): stage-level timing of the jaccardPairs
  * pipeline. Not part of any gate; delete after the round. */
object Q41Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.ensureRegistered(spark)
    val t = 0.6
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q41prof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      val hs = graft.Tables.documents(spark, d)
        .filter(size(split(trim($"text"), "\\s+")) >= 3)
        .select($"doc_id", expr("word_shingle_hashes(text, 3)").as("hset"))
      phase("hs")(noop(hs))
      val ex = hs.select($"doc_id", size($"hset").as("n"), explode($"hset").as("sh"))
      phase("ex")(noop(ex))
      val dfreq2 = ex.groupBy($"sh").agg(count(lit(1)).as("df")).filter($"df" >= 2)
      phase("dfreq2")(noop(dfreq2))
      val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
      val ranked = ex.join(dfreq2, "sh")
        .withColumn("r2", row_number().over(w))
        .withColumn("n2", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("plen", $"n" - ceil(lit(t) * $"n").cast("int") + 1)
      val prefix = ranked
        .withColumn("pos", $"n" - $"n2" + $"r2")
        .filter($"pos" <= $"plen")
        .select($"doc_id", $"sh", $"n", $"pos")
      phase("prefix")(noop(prefix))
      val cand = prefix.as("a").join(prefix.as("b"),
          $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id"
            && least($"a.n", $"b.n") >= lit(t) * greatest($"a.n", $"b.n")
            && lit(1) + least($"a.n" - $"a.pos", $"b.n" - $"b.pos")
              >= ceil(lit(t) / (1 + t) * ($"a.n" + $"b.n")))
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      phase("cand")(noop(cand))
      val full = cand
        .join(hs.select($"doc_id".as("doc_a"), size($"hset").as("na"), $"hset".as("ha")), "doc_a")
        .join(hs.select($"doc_id".as("doc_b"), size($"hset").as("nb"), $"hset".as("hb")), "doc_b")
        .select($"doc_a", $"doc_b", $"na", $"nb",
          size(array_intersect($"ha", $"hb")).as("c"))
        .select($"doc_a", $"doc_b",
          ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("jaccard"))
        .filter($"jaccard" >= t)
      phase("full")(noop(full))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
