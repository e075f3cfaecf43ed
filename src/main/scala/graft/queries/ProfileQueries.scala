package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Reference-shaped profile pipelines on the generic star schema: the
  * full nested DeviceProfile/AppProfile semantics (SURVEY.md §2.4
  * A1/A4; reference `utils/DeviceProfileUtils.java:186-240`,
  * `transforms/AppProfiles.java:58-111`) re-expressed relationally:
  * explode → groupBy partial/final hash agg → re-nest with
  * collect_list/sort_array. `events` plays the bid-log role:
  * user_id ≙ device, event_type ≙ app bundle, props.k ≙ exchange.
  *
  * Nested outputs use sorted arrays-of-structs rather than maps so
  * results are canonical (the reference enforces set semantics on geo
  * and per-bundle distinctness — `profile.proto:56-58, 89`; sorting
  * makes the multiset compare of SURVEY §5 a plain equality).
  */
object ProfileQueries {

  /** Full nested device-profile merge (A1): per user, per activity:
    * count, first/last timestamps, per-k counts — one row per user
    * with the complete nested profile. Two keyed aggregations, both
    * partial+final hash agg; the nested shape is assembled after the
    * last shuffle. */
  private val deviceProfileFull = Q(
    "q60_device_profile_full",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("k", coalesce(get_json_object($"props", "$.k").cast("int"), lit(-1)))
      val perK = ev.groupBy($"user_id", $"event_type", $"k")
        .agg(count(lit(1)).as("cnt"))
      val perType = perK.groupBy($"user_id", $"event_type")
        .agg(sort_array(collect_list(struct($"k", $"cnt"))).as("per_k"))
      val typeTimes = ev.groupBy($"user_id", $"event_type")
        .agg(min(unix_micros($"ts")).as("first_at"), max(unix_micros($"ts")).as("last_at"))
      typeTimes.join(perType, Seq("user_id", "event_type"))
        .groupBy($"user_id")
        .agg(
          min($"first_at").as("first_at"),
          max($"last_at").as("last_at"),
          to_json(sort_array(collect_list(
            struct($"event_type", $"first_at".as("type_first"),
              $"last_at".as("type_last"), $"per_k")))).as("activity"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, ts,
               coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k
             FROM events),
      perk AS (SELECT user_id, event_type, k, count(*) cnt FROM ev GROUP BY 1,2,3),
      pert AS (SELECT user_id, event_type,
                 list(struct_pack(k := k, cnt := cnt) ORDER BY k, cnt) per_k
               FROM perk GROUP BY 1,2),
      tt AS (SELECT user_id, event_type, min(epoch_us(ts)) first_at, max(epoch_us(ts)) last_at
             FROM ev GROUP BY 1,2)
      SELECT t.user_id, min(t.first_at) AS first_at, max(t.last_at) AS last_at,
        to_json(list(struct_pack(event_type := t.event_type, type_first := t.first_at,
               type_last := t.last_at, per_k := p.per_k)
             ORDER BY t.event_type, t.first_at, t.last_at))::VARCHAR AS activity
      FROM tt t JOIN pert p ON t.user_id = p.user_id AND t.event_type = p.event_type
      GROUP BY t.user_id"""))

  /** Full app-profile aggregation (A4): per event_type, distinct-user
    * total + per-k distinct-user breakdown. The reference's dense
    * int[24] CombineFn accumulator is subsumed by Spark's partial/
    * final hash agg over (type, k) then re-nest (SURVEY §4). */
  private val appProfileFull = Q(
    "q61_app_profile_full",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("k", coalesce(get_json_object($"props", "$.k").cast("int"), lit(-1)))
      val perK = ev.groupBy($"event_type", $"k")
        .agg(countDistinct($"user_id").as("users"))
      val nested = perK.groupBy($"event_type")
        .agg(to_json(sort_array(collect_list(struct($"k", $"users"))))
          .as("users_per_k"))
      val totals = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("user_count"))
      totals.join(nested, Seq("event_type"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type,
               coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k
             FROM events),
      perk AS (SELECT event_type, k, count(DISTINCT user_id) users FROM ev GROUP BY 1,2),
      nested AS (SELECT event_type,
                   to_json(list(struct_pack(k := k, users := users) ORDER BY k, users)) users_per_k
                 FROM perk GROUP BY 1),
      tot AS (SELECT event_type, count(DISTINCT user_id) user_count FROM ev GROUP BY 1)
      SELECT t.event_type, t.user_count, n.users_per_k
      FROM tot t JOIN nested n ON t.event_type = n.event_type"""))

  /** The same merge as a single-pass typed Aggregator (UDAF surface,
    * SURVEY §2.10) — one shuffle, partial merge on the map side,
    * nested activity JSON assembled in finish(). */
  private val profileUdaf = Q(
    "q62_profile_udaf",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts"))
        .as[(Long, String, Long)]
        .groupByKey(_._1)
        .agg(graft.operators.ProfileAggregator.merge.toColumn)
        .map { case (uid, o) => (uid, o.firstAt, o.lastAt, o.nTypes, o.totalEvents, o.activity) }
        .toDF("user_id", "first_at", "last_at", "n_types", "total_events", "activity")
    },
    Some("""WITH perType AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT e.user_id,
        min(epoch_us(e.ts)) AS first_at, max(epoch_us(e.ts)) AS last_at,
        CAST(count(DISTINCT e.event_type) AS INTEGER) AS n_types,
        count(*) AS total_events,
        any_value(p.act) AS activity
      FROM events e JOIN (
        SELECT user_id,
          to_json(list(struct_pack(event_type := event_type, cnt := cnt) ORDER BY event_type))::VARCHAR AS act
        FROM perType GROUP BY user_id) p ON e.user_id = p.user_id
      GROUP BY e.user_id"""))

  def qs: Seq[Q] = Seq(deviceProfileFull, appProfileFull, profileUdaf)
}
