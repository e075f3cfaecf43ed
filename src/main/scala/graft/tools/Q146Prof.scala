package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP (round-17 dev): phase-level timing of the q146 IVF store
  * lifecycle. Not part of any gate; delete after the round. */
object Q146Prof {
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
    val Dim = 64
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q146prof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      val e = graft.Tables.embeddings(spark, d)
        .filter(graft.operators.KMeans.usable("embedding", Dim) &&
          $"vec_id".isNotNull)
        .select($"vec_id", $"embedding")
      val qRows = phase("collect-queries") {
        e.filter($"vec_id" % 50 === 0).collect()
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft-q146prof-").toString
      try {
        phase("init") {
          graft.operators.IvfStore.init(e, "vec_id", "embedding", root,
            k = 8, iters = 3)
        }
        phase("append-1") {
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 0), root, "day-1")
        }
        phase("append-2") {
          graft.operators.IvfStore.append(
            e.filter(pmod($"vec_id", lit(2)) === 1), root, "day-2")
        }
        val queries = qRows.map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1).toSeq
        val res = phase("probe-build") {
          graft.operators.IvfStore.probe(spark, root,
            "vec_id", "embedding", queries, nprobe = 8, topK = 5)
            .localCheckpoint()
        }
        phase("probe-noop") {
          res.write.format("noop").mode("overwrite").save()
        }
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
