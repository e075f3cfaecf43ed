package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque `binary` payload columns + typed
  * metadata, with decode/feature-extract as batched `mapPartitions`
  * over raw bytes — the Spark-side shape of an image/audio pipeline.
  *
  * The container has no image/audio codecs, so the "decode" step is a
  * deterministic byte-level feature extractor (clearly a stand-in —
  * swap [[decodeBatch]] for a real codec and the schema, batching and
  * partitioning stay identical). Payloads are synthesized from
  * `documents.text` bytes so the DuckDB oracle can recompute the same
  * features from character codes (corpus is ASCII).
  */
object MultimodalQueries {

  /** The stand-in decoder: per payload → (n_bytes, unsigned byte sum,
    * mean byte). Batched like a real codec would be (amortizes model/
    * codec setup per batch, cf. SURVEY §2.8 M2 batching).
    *
    * NULL payloads are undecodable records and are DROPPED — the same
    * corrupt-drop policy the reference applies at its decode seam
    * (SURVEY §2.2 P3); a zero-length payload decodes to (0, 0, NULL
    * mean) rather than 0/0 = NaN. Neither occurs in the gate corpus
    * (oracle results unchanged); DegenerateInputSpec pins both. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Long, Long, Option[Double])] =
    batch.collect { case (id, bytes) if bytes != null =>
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      (id, bytes.length.toLong, sum,
        if (bytes.length == 0) None else Some(sum.toDouble / bytes.length))
    }

  /** Binary ingest → batched decode → per-payload features. The typed
    * `mapPartitions` is the genuine multimodal seam: binary in,
    * struct of features out, 32-element batches. */
  private val byteFeatures = Q(
    "q55_mm_byte_features",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id", $"text".cast("binary").as("payload"))
        .withColumn("__ok", $"payload".isNotNull)
        // corrupt-drop rate surfaces via observedMetrics
        // ("q55_decode_input" → {records, dropped}) — the decode
        // seam's operational feed; decodeBatch keeps its own null
        // guard as defense-in-depth for direct callers
        .observe("q55_decode_input",
          count(lit(1)).as("records"),
          coalesce(sum(when($"__ok", 0L).otherwise(1L)), lit(0L)).as("dropped"))
        .filter($"__ok")
        .drop("__ok")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.grouped(32).flatMap(decodeBatch))
        .toDF("doc_id", "n_bytes", "byte_sum", "mean_byte")
    },
    Some("""SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_bytes,
        CAST(list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1)))) AS BIGINT) AS byte_sum,
        CAST(list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1)))) AS DOUBLE)
          / length(text) AS mean_byte
      FROM documents WHERE text IS NOT NULL"""))

  /** Frame sampling: stride-sample ≤8 evenly spaced bytes from the
    * payload (the video-frame-sampling access pattern: seek, don't
    * scan). Pure expressions — row-local, no shuffle. */
  private val frameSample = Q(
    "q56_mm_frame_sample",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("stride", greatest(expr("length(text) div 8"), lit(1)))
        .select($"doc_id", $"stride".cast("long").as("stride"),
          // to_json: int payload serializes identically in DuckDB; raw
          // array cells break the driver's pandas row-sort
          to_json(expr("""transform(
              filter(sequence(0, 7), f -> 1 + f * stride <= length(text)),
              f -> ascii(substring(text, CAST(1 + f * stride AS INT), 1)))"""))
            .as("frames"))
    },
    Some("""SELECT doc_id,
        CAST(greatest(length(text) // 8, 1) AS BIGINT) AS stride,
        to_json(list_transform(
          list_filter(range(8), f -> 1 + f * greatest(length(text) // 8, 1) <= length(text)),
          f -> ascii(substr(text, CAST(1 + f * greatest(length(text) // 8, 1) AS INTEGER), 1)))) AS frames
      FROM documents"""))

  def qs: Seq[Q] = Seq(byteFeatures, frameSample)
}
