package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Tamper-evidence (round 9, VERDICT r8 finding #2): round 7 silently
  * lost 25 queries from the gate because a frame that fails ANALYSIS
  * writes no parquet and the harness skipped it without recording an
  * error — green artifact, shrunken coverage. The dump now also writes
  *  - `registry.json`: the FULL query-name registry this binary runs —
  *    any gate artifact can be diffed against it (entries == registry,
  *    exactly), and
  *  - `errors.json`: name → message for every query that threw, so an
  *    analysis failure is a recorded red row, never an absence.
  * `tools/check.py` enforces both (a missing name is a FAIL line and a
  * nonzero exit); VerifyGateSpec pins the behavior with a deliberately
  * broken query. */
object Verify {

  /** Run every query in `queries` over `sfDir`, writing one parquet
    * dir per query plus `registry.json`/`errors.json` under `outDir`.
    * Returns name → error message for the failures (empty when all
    * queries dumped). Factored from `main` so the gate behavior is
    * spec-testable with an arbitrary (including deliberately broken)
    * registry. */
  def run(spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String, outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg.take(500)
      }
      // queries cache intermediates for intra-query reuse; don't let
      // 70+ queries' blocks accumulate in one session at larger SFs
      finally spark.catalog.clearCache()
    }
    // errors BEFORE registry: registry.json is the artifact's commit
    // marker (check.py hard-fails on registry-present/errors-absent),
    // so a crash between the two writes can only produce a dump that
    // reads as pre-tamper-evident, never one that silently drops the
    // error channel while looking complete
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/registry.json"),
      queries.keys.toSeq.sorted.map(jsonStr).mkString("[", ",", "]"))
    errors.toMap
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // args(2+): optional query-name subset — DEV iteration only (run
    // one new query without paying the full registry). The driver
    // always calls with exactly (sfDir, outDir), so the gate artifact
    // keeps the full registry; a subset run writes a subset
    // registry.json, which check.py sizes its expectation from.
    val sfDir = args(0)
    val outDir = args(1)
    val subset = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's join planning (round 17): the oracle gate must
      // verify the same physical plans the bench times
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // q89 writes a bucketed table; default warehouse = JVM cwd,
      // which may not be writable wherever the driver runs this
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => subset(k) }
    require(subset.isEmpty || queries.size == subset.size,
      s"unknown query names: ${subset -- queries.keySet}")
    // a subset dump overwrites some of the dir's parquet with
    // new-binary output — mark the dir BEFORE running, so a subset
    // run that dies mid-flight (OOM is routine) can't leave a
    // marker-less mixed artifact a later `check.py --no-verify`
    // would iterate as a full gate; full runs clear the marker only
    // AFTER completing, restoring gate eligibility
    new java.io.File(outDir).mkdirs()
    val subsetMarker = Paths.get(s"$outDir/_SUBSET")
    if (subset.nonEmpty)
      Files.writeString(subsetMarker, subset.toSeq.sorted.mkString("\n"))
    run(spark, queries, sfDir, outDir)
    // subset the oracle map too — check.py treats an oracle for an
    // unregistered query as a torn/mixed artifact (correctly)
    val json = SparkEntry.oracleSql.filter { case (k, _) => queries.contains(k) }
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // marker removal is the artifact's LAST commit step: deleting it
    // before oracle_sql.json lands would open a crash window where a
    // full registry.json sits beside a stale subset oracle map and a
    // later --no-verify pass silently downgrades 136 queries to
    // rows-only "OK" lines
    if (subset.isEmpty) Files.deleteIfExists(subsetMarker)
    spark.stop()
  }
}
