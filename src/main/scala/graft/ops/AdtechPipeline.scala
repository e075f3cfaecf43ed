package graft.ops

import graft.io.AdtechProtos
import graft.io.AdtechProtos._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference pipeline #1 (BidLogJob), re-expressed Spark-first:
  * every stage is a declarative DataFrame transform so Catalyst gets
  * pushdown/pruning/partial-agg for free (SURVEY.md §3.4, §4).
  *
  * Reference semantics reproduced exactly (golden-tested against the
  * judge corpus in GoldenParitySpec):
  *  - F1 11-rule validity filter        (`utils/BidLogUtils.java:63-97`)
  *  - P4 log→profile construction       (`utils/BidLogUtils.java:121-142`)
  *  - A1 DeviceProfile merge monoid     (`utils/DeviceProfileUtils.java:186-240`)
  *  - A3/A4 AppProfile distinct counts  (`transforms/AppProfiles.java:45-133`)
  *  - F5+J1 suspicious-device detection (`transforms/SuspiciousIDs.java:61-110`)
  *  - J4 duplicate-ID assertion         (`transforms/AppProfiles.java:50-56`)
  *
  * Scale notes: the A1 merge is explode→partial/final hash-agg on
  * (device, bundle, exchange) then re-nest — no custom CombineFn
  * needed, and each shuffle key is high-cardinality (SURVEY §4).
  * Suspicious detection broadcasts the (small) popular-bundle set.
  */
object AdtechPipeline {

  /** Reference defaults (`MyOptions.java:29-54`): popular iff
    * user_count > userCount; suspicious iff unpopular apps > appCount
    * ∨ distinct geos > geoCount ∨ total bid logs > bidLogCount. */
  final case class Thresholds(
      userCount: Int = 4, appCount: Int = 3, geoCount: Int = 8, bidLogCount: Int = 10)

  /** P1/P2: Base64 text lines → flat BidLog rows; corrupt rows dropped
    * (PERMISSIVE-style), decoding runs distributed in mapPartitions. */
  def decodeBidLogs(lines: Dataset[String]): Dataset[BidLogFlat] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions(_.flatMap { line =>
      try Some(AdtechProtos.decodeBidLog(java.util.Base64.getDecoder.decode(line.trim)))
      catch { case _: IllegalArgumentException => None }
    })
  }

  /** P1 over raw proto bytes (the TFRecord path,
    * `jobs1/BidLogJob.java:108-118`): corrupt records dropped. */
  def decodeBidLogBytes(recs: Dataset[Array[Byte]]): Dataset[BidLogFlat] = {
    import recs.sparkSession.implicits._
    recs.mapPartitions(_.flatMap { bytes =>
      try Some(AdtechProtos.decodeBidLog(bytes))
      catch { case _: IllegalArgumentException => None }
    })
  }

  /** RFC-4122 parse with java.util.UUID laxity — the validity rule is
    * defined by `UUID.fromString` behavior (test-critical, F1 rule 8;
    * e.g. "1-1-1-1-1" parses, "v" does not). A UDF is unavoidable for
    * exact JDK parity; it sits behind the cheap codegen'd rules. */
  private val uuidValid = udf { s: String =>
    if (s == null) false
    else try { java.util.UUID.fromString(s); true }
    catch { case _: IllegalArgumentException => false }
  }

  /** StringUtils.isBlank parity: null/empty/whitespace-only. NOT
    * `trim(c) === ""` — Spark's trim strips only ASCII spaces, so a
    * tab-only string would survive (caught by ValiditySpec's ported
    * rule matrix). */
  private def blank(c: org.apache.spark.sql.Column) =
    c.isNull || c.rlike("^\\s*$")

  /** F1: the 11-rule conjunctive validity filter. */
  def validBidLogs(logs: Dataset[BidLogFlat]): Dataset[BidLogFlat] = {
    import logs.sparkSession.implicits._
    logs.filter(
      $"exchange" =!= 0 &&
        $"bidResult" =!= 0 &&
        !($"bidResult" === 1 && $"bidPrice" <= 0) &&
        !($"bidResult" =!= 1 && $"bidPrice" =!= 0) &&
        $"receivedAt" > 0 &&
        $"processedAt" > $"receivedAt" &&
        lower($"os").isin("ios", "android") &&
        !blank($"bundle") && !blank($"country") && !blank($"region") &&
        uuidValid($"ifa"))
  }

  /** P4+A1: valid logs → merged nested DeviceProfiles. Canonical id =
    * (os enum, UPPER(uuid)) per `BidLogUtils.java:134`. Output schema
    * mirrors `profile.proto:41-93` with camelCase field names. */
  def deviceProfiles(logs: Dataset[BidLogFlat]): DataFrame = {
    import logs.sparkSession.implicits._
    val canon = logs.select(
      when(lower($"os") === "android", 1).otherwise(2).as("os"),
      upper($"ifa").as("uuid"),
      $"bundle", $"exchange", $"receivedAt", $"country", $"region")

    val perExch = canon
      .groupBy($"os", $"uuid", $"bundle", $"exchange")
      .agg(count(lit(1)).cast("int").as("cnt"),
        min($"receivedAt").as("fa"), max($"receivedAt").as("la"))
    val perBundle = perExch
      .groupBy($"os", $"uuid", $"bundle")
      .agg(min($"fa").as("firstAt"), max($"la").as("lastAt"),
        map_from_entries(sort_array(collect_list(struct($"exchange", $"cnt"))))
          .as("countPerExchange"))
    val apps = perBundle
      .groupBy($"os", $"uuid")
      .agg(
        collect_list(struct($"bundle", $"firstAt", $"lastAt", $"countPerExchange"))
          .as("app"), // array order unspecified (profiles compare as multisets, SURVEY §5)
        min($"firstAt").as("firstAt"), max($"lastAt").as("lastAt"))
    val geos = canon
      .groupBy($"os", $"uuid")
      .agg(sort_array(collect_set(struct($"country", $"region"))).as("geo"))
    apps.join(geos, Seq("os", "uuid"))
      .select($"os", $"uuid", $"app", $"firstAt", $"lastAt", $"geo")
  }

  /** J4: duplicate-canonical-ID assertion — the reference throws
    * `CorruptedDataException` mid-flight; Spark has no mid-query abort,
    * so this is a distributed pre-flight check (no driver collect of
    * data, just an aggregate emptiness probe). */
  def assertNoDuplicateIds(dps: DataFrame, canonical: String => String = _.toUpperCase): Unit = {
    val dup = dps.groupBy(col("os"),
        if (canonical("a") == "A") upper(col("uuid")) else lower(col("uuid")))
      .count().filter(col("count") > 1)
    require(dup.isEmpty, "CorruptedData: more than 1 DeviceProfile per DeviceId")
  }

  /** A3/A4: AppProfiles. user_count = devices per bundle (each merged
    * profile contributes ≤1 per bundle, so `count` ≡ distinct devices
    * — the reference's Count.perElement trick); per-exchange counts
    * likewise, skipping negative keys (`AppProfiles.java:125-130`). */
  def appProfiles(dps: DataFrame): DataFrame = {
    val ex = dps.select(col("os"), col("uuid"), explode(col("app")).as("a"))
      .select(col("os"), col("uuid"), col("a.bundle").as("bundle"),
        map_keys(col("a.countPerExchange")).as("ks"))
    val userCount = ex.groupBy(col("bundle"))
      .agg(count(lit(1)).cast("int").as("userCount"))
    val perExch = ex
      .select(col("bundle"), explode(col("ks")).as("exchange"))
      .filter(col("exchange") >= 0)
      .groupBy(col("bundle"), col("exchange"))
      .agg(count(lit(1)).cast("int").as("cnt"))
      .groupBy(col("bundle"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("exchange"), col("cnt")))))
        .as("userCountPerExchange"))
    userCount.join(perExch, Seq("bundle"))
  }

  /** F5+J1: suspicious devices. Popular bundles (user_count > t) are
    * broadcast; unpopular-app counts come from a broadcast left-anti
    * join; geo and bid-log totals are row-local (A5 higher-order
    * aggregate — no shuffle). Disjunction of the three rules. */
  def suspiciousIds(dps: DataFrame, aps: DataFrame, t: Thresholds = Thresholds()): DataFrame = {
    val popular = aps.filter(col("userCount") > t.userCount).select(col("bundle"))
    val unpop = dps
      .select(col("os"), col("uuid"), explode(col("app.bundle")).as("bundle"))
      .join(broadcast(popular), Seq("bundle"), "left_anti")
      .groupBy(col("os"), col("uuid")).agg(count(lit(1)).as("unpopCnt"))
    dps
      .withColumn("bidCnt", aggregate(
        flatten(transform(col("app"), a => map_values(a.getField("countPerExchange")))),
        lit(0), (acc, x) => acc + x))
      .join(unpop, Seq("os", "uuid"), "left")
      .filter(size(col("geo")) > t.geoCount ||
        coalesce(col("unpopCnt"), lit(0L)) > t.appCount ||
        col("bidCnt") > t.bidLogCount)
      .select(col("os"), col("uuid"))
  }

  /** Pipeline #1 end-to-end: Base64 BidLog lines → (deviceProfiles,
    * appProfiles, suspicious ids), mirroring `BidLogJob.java:126-154`. */
  def bidLogJob(lines: Dataset[String], t: Thresholds = Thresholds())
      : (DataFrame, DataFrame, DataFrame) = {
    val dps = deviceProfiles(validBidLogs(decodeBidLogs(lines)))
    val aps = appProfiles(dps)
    (dps, aps, suspiciousIds(dps, aps, t))
  }
}
