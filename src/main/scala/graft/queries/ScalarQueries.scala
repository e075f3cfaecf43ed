package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.7): string / date / math /
  * JSON / codec functions, all codegen'd built-ins — the engine's
  * replacement for the reference's per-record `DoFn` logic
  * (`utils/BidLogUtils.java`, `utils/ProtoUtils.java`).
  */
object ScalarQueries {

  /** String-function battery (case canonicalization as in
    * `BidLogUtils.java:134`; blank-trim as in `StringUtils.isBlank`
    * call sites `BidLogUtils.java:90-96`). */
  private val stringFuncs = Q(
    "q33_string_funcs",
    (s, d) => {
      import s.implicits._
      T.customer(s, d).select(
        $"c_custkey",
        upper($"c_name").as("up"),
        lower($"c_name").as("lo"),
        // .cast("long") on int-valued funcs: DuckDB emits BIGINT here and
        // the driver's value-hash is dtype-sensitive
        length($"c_name").cast("long").as("len"),
        substring($"c_name", 1, 8).as("prefix"),
        concat_ws("|", $"c_name", $"c_mktsegment").as("joined"),
        lpad($"c_custkey".cast("string"), 10, "0").as("padded"),
        reverse($"c_name").as("rev"),
        regexp_replace($"c_name", "[0-9]+", "#").as("no_digits"),
        levenshtein($"c_name", $"c_mktsegment").cast("long").as("lev"))
    },
    Some("""SELECT c_custkey,
      upper(c_name) AS up, lower(c_name) AS lo, length(c_name) AS len,
      substr(c_name, 1, 8) AS prefix,
      concat_ws('|', c_name, c_mktsegment) AS joined,
      lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
      reverse(c_name) AS rev,
      regexp_replace(c_name, '[0-9]+', '#', 'g') AS no_digits,
      levenshtein(c_name, c_mktsegment) AS lev
      FROM customer"""))

  /** Date/time battery over epoch-comparable outputs (the reference keeps
    * raw epoch millis, `bid.proto:22-26`; the generalized engine exposes
    * calendar functions). */
  private val dateFuncs = Q(
    "q34_date_funcs",
    (s, d) => {
      import s.implicits._
      T.orders(s, d).select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        unix_micros(date_trunc("month", $"o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_2002"),
        unix_micros(($"o_orderdate" + expr("INTERVAL 90 DAYS")).cast("timestamp")).as("due_at"))
    },
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS yr,
      CAST(month(o_orderdate) AS INTEGER) AS mo,
      CAST(day(o_orderdate) AS INTEGER) AS dom,
      CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      epoch_us(date_trunc('month', o_orderdate)) AS month_start,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
      epoch_us(o_orderdate + INTERVAL 90 DAY) AS due_at
      FROM orders"""))

  /** JSON extraction from a string column (`events.props`). */
  private val jsonExtract = Q(
    "q35_json_extract",
    (s, d) => {
      import s.implicits._
      T.events(s, d).select(
        $"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
        .filter($"k".isNotNull)
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL"""))

  /** Base64 codec round-trip (P2/P3 analogue, `utils/ProtoUtils.java:22-42`
    * — the reference's interchange format for all intermediates). */
  private val base64Codec = Q(
    "q36_base64_codec",
    (s, d) => {
      import s.implicits._
      T.customer(s, d).select(
        $"c_custkey",
        base64($"c_name".cast("binary")).as("b64"),
        unbase64(base64($"c_name".cast("binary"))).cast("string").as("roundtrip"))
    },
    Some("""SELECT c_custkey, base64(encode(c_name)) AS b64,
      decode(from_base64(base64(encode(c_name)))) AS roundtrip
      FROM customer"""))

  /** Struct → canonical JSON text (S4 analogue: proto→JSON sink,
    * `utils/ProtoUtils.java:50-59` — field names preserved, no extra
    * whitespace; Spark `to_json` matches that contract). */
  private val toJsonSink = Q(
    "q37_to_json",
    (s, d) => {
      import s.implicits._
      T.events(s, d).select(
        $"event_id",
        to_json(struct($"event_id", $"event_type", $"user_id")).as("js"))
    },
    Some("""SELECT event_id,
      to_json(struct_pack(event_id := event_id, event_type := event_type, user_id := user_id)) AS js
      FROM events"""))

  /** Math battery: modulo/ratio arithmetic of the feature builder
    * (`PredictionUtils.java:45-54`) generalized. */
  private val mathFuncs = Q(
    "q38_math_funcs",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d).select(
        $"l_orderkey", $"l_linenumber",
        ($"l_orderkey" % 97).as("mod97"),
        ($"l_extendedprice" * $"l_discount").as("disc_amt"),
        floor($"l_extendedprice").as("fl"),
        ceil($"l_extendedprice").as("ce"),
        abs($"l_discount" - 0.05).as("dev"),
        greatest($"l_tax", $"l_discount").as("gmax"),
        least($"l_tax", $"l_discount").as("gmin"),
        pow($"l_quantity", 2.0).as("qty2"),
        sqrt($"l_extendedprice").as("sq"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      l_orderkey % 97 AS mod97,
      l_extendedprice * l_discount AS disc_amt,
      CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      abs(l_discount - 0.05) AS dev,
      greatest(l_tax, l_discount) AS gmax,
      least(l_tax, l_discount) AS gmin,
      pow(l_quantity, 2.0) AS qty2,
      sqrt(l_extendedprice) AS sq
      FROM lineitem"""))

  /** MapType surface: build, value-transform, and extract from map
    * columns (serialized via to_json — Spark and DuckDB agree
    * byte-for-byte on string/long map JSON). Row-local, codegen'd. */
  private val mapFuncs = Q(
    "q75_map_funcs",
    (s, d) => {
      import s.implicits._
      val m = map_from_arrays(
        array(lit("type"), lit("user")),
        array($"event_type", $"user_id".cast("string")))
      T.events(s, d).select(
        $"event_id",
        to_json(m).as("meta"),
        to_json(transform_values(m, (_, v) => upper(v))).as("meta_upper"),
        element_at(m, "type").as("etype"),
        size(map_keys(m)).cast("long").as("n_keys"))
    },
    Some("""SELECT event_id,
      to_json(map(['type','user'], [event_type, CAST(user_id AS VARCHAR)])) AS meta,
      to_json(map(['type','user'], [upper(event_type), upper(CAST(user_id AS VARCHAR))])) AS meta_upper,
      event_type AS etype,
      CAST(2 AS BIGINT) AS n_keys
      FROM events"""))

  def qs: Seq[Q] = Seq(stringFuncs, dateFuncs, jsonExtract, base64Codec,
    toJsonSink, mathFuncs, mapFuncs)
}
