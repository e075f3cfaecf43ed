package graft.sources

import graft.io.{ProtoWire, ProtoWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Binary PAYLOADS end-to-end through the TFRecord interchange — the
  * multimodal export/ingest seam: a `(doc_id, modality, payload)`
  * frame whose payload is opaque `binary` (image/audio/video bytes —
  * anything; no codec is ever invoked) round-trips bit-exactly
  * through byte-packed gzip TFRecord shards.
  *
  * Record encoding is protobuf wire format via the engine's own
  * dependency-free codec ([[graft.io.ProtoWriter]]/[[ProtoWire]] —
  * the same pair the reference-parity S2/S3 sinks use):
  * `message PayloadRecord { int64 doc_id = 1; string modality = 2;
  * bytes payload = 3; }` with proto3 default-suppression (doc_id 0 /
  * empty modality / empty payload are absent on the wire and decode
  * back to defaults — round-trip-safe).
  *
  * Every export writes a `_manifest.json` next to the shards with
  * the accounting a downstream trainer audits before reading:
  * records, shards, total payload bytes, per-modality record counts.
  * [[readCommitted]] re-reads the directory and CROSS-CHECKS the
  * decoded stream against the manifest (count + payload-byte drift
  * aborts the read — a half-written or tampered export must fail
  * loudly, not train silently).
  *
  * Scale shape: encode/decode are row-local `mapPartitions`; the
  * shard layout is [[TfRecordSink.writeBalanced]]'s distributed
  * prefix-sum byte packing (shards bounded by target + one record
  * even at 100:1 payload skew); the read side is one task per gzip
  * shard. Nothing but the one-line manifest touches the driver.
  */
object PayloadRecords {

  /** One payload row; `payload` never null (encode rejects nulls —
    * an undecodable record must be dropped at the decode seam
    * upstream, q55's corrupt-drop policy, not smuggled as null). */
  case class PayloadRow(doc_id: Long, modality: String, payload: Array[Byte])

  case class Manifest(records: Long, shards: Int, payloadBytes: Long,
      byModality: Map[String, Long])

  private[sources] def encodeRow(id: Long, modality: String,
      payload: Array[Byte]): Array[Byte] = {
    val w = new ProtoWriter.Writer
    w.int(1, id)
    w.str(2, modality)
    if (payload.nonEmpty) w.bytes(3, payload)
    w.result()
  }

  private[sources] def decodeRecord(rec: Array[Byte]): PayloadRow = {
    val r = new ProtoWire.Reader(rec)
    var id = 0L
    var modality = ""
    var payload = Array.emptyByteArray
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 => id = r.varint()
        case 2 => modality = r.string()
        case 3 => payload = r.bytes()
        case _ => r.skip(wt)
      }
    }
    PayloadRow(id, modality, payload)
  }

  /** `(doc_id, modality, payload)` → wire records. */
  def pack(df: DataFrame): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, m, p) =>
        require(p != null, s"null payload for doc_id=$id — drop undecodable " +
          "records at the decode seam, do not export them")
        encodeRow(id, if (m == null) "" else m, p)
      })
  }

  /** Wire records → `(doc_id, modality, payload)`. */
  def unpack(records: Dataset[Array[Byte]]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions(_.map(decodeRecord)).toDF()
  }

  /** Export as byte-packed gzip TFRecord shards + `_manifest.json`.
    * The per-modality rollup and byte total come from ONE aggregate
    * over the (cached) input; the sink's own (shards, records) pair
    * cross-checks the aggregate count — a record dropped between
    * aggregate and sink fails here, at export time. */
  def export(df: DataFrame, dir: String,
      targetShardBytes: Long = 128L * 1024 * 1024): Manifest = {
    val spark = df.sparkSession
    val in = df.cache()
    try {
      val (shards, written) =
        TfRecordSink.writeBalanced(pack(in), dir, targetShardBytes)
      // null modality normalizes to "" here exactly as pack() writes
      // it to the wire — the manifest must account for what landed
      val agg = in.groupBy(coalesce(col("modality"), lit("")).as("modality"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("pb"))
        .collect() // ≤ one row per modality — a handful
      val records = agg.map(_.getLong(1)).sum
      val payloadBytes = agg.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
      require(records == written,
        s"sink dropped records: aggregated $records != written $written")
      val byModality = agg.map(r => r.getString(0) -> r.getLong(1)).toMap
      val m = Manifest(records, shards, payloadBytes, byModality)
      writeManifest(spark, dir, m)
      m
    } finally in.unpersist()
  }

  /** Read an exported directory back to `(doc_id, modality, payload)`,
    * verifying the decoded stream against the manifest. */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(spark, dir)
    val df = unpack(TfRecordSource.read(spark, s"$dir/part-*"))
    val got = df.agg(count(lit(1)), coalesce(sum(length(col("payload"))), lit(0L)))
      .head()
    require(got.getLong(0) == m.records && got.getLong(1) == m.payloadBytes,
      s"export at $dir does not match its manifest: decoded " +
        s"(${got.getLong(0)} records, ${got.getLong(1)} payload bytes) " +
        s"vs manifest (${m.records}, ${m.payloadBytes})")
    df
  }

  /** JSON string escaping for the manifest's data-driven modality
    * keys — modality is arbitrary user data; a quote/backslash/control
    * char must not produce an invalid or mis-keyed manifest. */
  private[sources] def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[sources] def jsonUnescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'u' if i + 5 < s.length =>
          out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 6
        case e => out.append(e); i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val byMod = m.byModality.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${jsonEscape(k)}":$v""" }.mkString("{", ",", "}")
    val json = s"""{"records":${m.records},"shards":${m.shards},""" +
      s""""payload_bytes":${m.payloadBytes},"by_modality":$byMod}"""
    // tmp + atomic OVERWRITE-rename, the engine's marker protocol
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val tmp = new org.apache.hadoop.fs.Path(dir, "._manifest.json.tmp")
    val fs = path.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
      .rename(fs.makeQualified(tmp), fs.makeQualified(path),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[sources] def readManifest(spark: SparkSession, dir: String): Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = path.getFileSystem(conf)
    require(fs.exists(path), s"no _manifest.json in $dir — not a committed export")
    val in = fs.open(path)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      buf.toString("UTF-8")
    } finally in.close()
    def longOf(k: String): Long = {
      val m = s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
      require(m.isDefined, s"manifest missing $k: $json")
      m.get.group(1).toLong
    }
    // keys may contain escaped quotes/backslashes — match escape-aware
    val byMod = s""""((?:[^"\\\\]|\\\\.)*)":(\\d+)""".r.findAllMatchIn(
        json.substring(json.indexOf("\"by_modality\"")))
      .filterNot(_.group(1) == "by_modality")
      .map(m => jsonUnescape(m.group(1)) -> m.group(2).toLong).toMap
    Manifest(longOf("records"), longOf("shards").toInt,
      longOf("payload_bytes"), byMod)
  }
}
