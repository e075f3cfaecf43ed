package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: growth ratio of the TRAINED PQ path (fixed codebook) —
  * the linearity evidence ScaleBench can't provide because its probes
  * are registry queries and q147/q148's ORACLE shape carries a
  * corpus-sliced codebook (n²/25 encode by construction; excluded
  * there for the q44-oracle reason). This probe trains ONE model at
  * the base SF, then times encode + ADC top-5 with that same model at
  * the base and the ×10 replica — the production regime where
  * |codebook| is a constant. Usage:
  *   sbt "runMain graft.PqScaleProbe" (after a ScaleBench run built
  *   target/scale10, or SPARK_GRAFT_SCALE_DIR to point elsewhere). */
object PqScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale10")
    val model = graft.operators.ProductQuantizer.train(
      spark.read.parquet(s"$base/embeddings.parquet"),
      "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 3)
    def timeAt(dir: String): Double = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      // FIXED query set at both scales (copy-0 ids survive the
      // replica's key shift untouched): the growth ratio must measure
      // corpus growth alone, not |Q| riding along with it
      val queries = e.filter(col("vec_id") >= 0 && col("vec_id") < 2000 &&
          col("vec_id") % 250 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val t0 = System.nanoTime()
      val coded = graft.operators.ProductQuantizer
        .encode(e, model, "embedding")
      graft.operators.ProductQuantizer
        .adcTopK(coded, "vec_id", "pq_codes", queries, "q_id", "qv",
          model, topK = 5)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    timeAt(base) // warm-up (JIT + codegen for the literal codebooks)
    val s1 = (1 to 3).map(_ => timeAt(base)).min
    val s10 = (1 to 3).map(_ => timeAt(big)).min
    println(f"""{"probe":"pq_trained_encode_adc","small_s":$s1%.2f,"x10_s":$s10%.2f,"ratio":${s10 / s1}%.1f}""")
    spark.stop()
  }
}
