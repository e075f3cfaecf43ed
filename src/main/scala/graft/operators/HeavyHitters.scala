package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequency heavy hitters at corpus scale via a two-phase
  * sketch-route-verify — the frequency analogue of
  * [[BloomAntiJoin]]'s routing discipline: a bounded mergeable sketch
  * finds a small CANDIDATE superset without shuffling the raw keys,
  * then an exact pass over only the candidates restores exactness.
  *
  * Phase 1 — Misra–Gries summary (Misra & Gries 1982; merge rule per
  * Agarwal et al., "Mergeable Summaries", PODS 2012) as a typed
  * [[Aggregator]], the §2.10 UDAF surface: `reduce` runs as the
  * map-side partial (one ≤k-entry map per partition), `merge`
  * combines partials across the exchange — so the shuffle carries at
  * most k entries PER PARTITION no matter how many distinct tokens
  * the corpus holds (vs a full `groupBy(token)` shuffling every
  * distinct token). The summary guarantees every item with true
  * count > N/(k+1) survives — a SUPERSET of the answer, never the
  * answer itself (surviving counts are underestimates).
  *
  * Phase 2 — the ≤k candidates (bounded driver metadata, same class
  * as q85's sketch row or the TfRecord sink's per-partition longs)
  * broadcast back as an equi-join filter; only candidate tokens are
  * exactly recounted (a shuffle of ≤k distinct keys) and the
  * threshold filter runs on TRUE counts. Output is therefore exactly
  * `SELECT tok, count(*) ... HAVING count(*) >= ceil(theta*N)` —
  * the sketch affects cost, never the result.
  *
  * Exactness argument (k = ceil(1/theta)): a token with true count
  * c >= t where t = max(1, ceil(theta*N)) has c >= N/k > N/(k+1), so
  * the MG guarantee keeps it in the merged summary; the exact recount
  * then assigns its true count and the filter decides on that. When
  * N <= k the summary is simply exact (no eviction ever fires while
  * the map holds < k entries and distinct <= N <= k).
  *
  * CALLER CONTRACT — `tokens` is evaluated TWICE (sketch+count pass,
  * then candidate recount). For tokens exploded straight off a
  * parquet scan that is the right trade (two cheap scans beat caching
  * a corpus-sized token column); cache beforehand only if the token
  * lineage is expensive.
  *
  * At 100 TB: phase 1's exchange is 32 partitions × k entries — KB,
  * not the multi-TB distinct-token shuffle a naive groupBy pays;
  * phase 2 shuffles ≤k groups. Driver traffic is one ≤k-entry map.
  */
object HeavyHitters {

  /** Misra–Gries buffer — a product wrapper so `Encoders.product`
    * serializes the partial between map and merge sides. */
  case class Summary(counts: Map[String, Long])

  /** Mergeable Misra–Gries summary over at most `k` tracked keys.
    * Decrement-all on insert-overflow (amortized O(1)/row: each
    * decrement round pays down prior insertions); merge sums the two
    * summaries then subtracts the (k+1)-th largest count and drops
    * non-positive entries (the PODS'12 mergeable-summaries rule,
    * which preserves the c > N/(k+1) survival guarantee). */
  final class MisraGries(k: Int) extends Aggregator[String, Summary, Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Summary = Summary(Map.empty)

    override def reduce(b: Summary, tok: String): Summary = {
      if (tok == null) return b // null tokens carry no frequency signal
      val m = b.counts
      m.get(tok) match {
        case Some(c)            => Summary(m.updated(tok, c + 1L))
        case None if m.size < k => Summary(m.updated(tok, 1L))
        case None => // full and new key: decrement every counter by 1
          Summary(m.collect { case (t, c) if c > 1L => t -> (c - 1L) })
      }
    }

    override def merge(x: Summary, y: Summary): Summary = {
      val sum = y.counts.foldLeft(x.counts) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) Summary(sum)
      else {
        // subtract the (k+1)-th largest count; at most k survive
        val kth = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        Summary(sum.collect { case (t, c) if c > kth => t -> (c - kth) })
      }
    }

    override def finish(b: Summary): Map[String, Long] = b.counts
    override def bufferEncoder: Encoder[Summary] = Encoders.product[Summary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Tokens whose relative frequency is at least `theta`, with their
    * EXACT counts — `(tok, cnt)` rows, cnt >= max(1, ceil(theta*N)).
    * See the object scaladoc for the two-phase plan and the caller
    * contract (`tokens` evaluates twice). */
  def exactAbove(tokens: Dataset[String], theta: Double): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1], got $theta")
    val spark = tokens.sparkSession
    import spark.implicits._
    val k = math.max(1, math.ceil(1.0 / theta).toInt)
    val toks = tokens.toDF("tok")

    // one job: the MG summary and N together (bounded driver result)
    val sketchAgg = udaf(new MisraGries(k), Encoders.STRING)
    val row = toks.agg(
      sketchAgg(col("tok")).as("sketch"), count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    if (n == 0L) return toks.select(col("tok"), lit(0L).as("cnt")).limit(0)
    val t = math.max(1L, math.ceil(theta * n).toLong)
    val candidates = row.getMap[String, Long](0).keys.toSeq // <= k

    toks.join(broadcast(candidates.toDF("tok")), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
  }

  /** Per-GROUP exact heavy hitters: for each value of `groupCol`,
    * every token at relative frequency >= `theta` WITHIN that group,
    * with exact counts — `(group, tok, cnt)` rows. Same two-phase
    * plan as [[exactAbove]] with the summary keyed by group: phase 1
    * is one grouped aggregation whose exchange carries <=k sketch
    * entries per (partition, group); phase 2 recounts only the
    * (group, candidate) pairs and thresholds each group against its
    * OWN total (so a small language's hitters aren't drowned by a
    * large one's volume — the per-corpus q105 cut would do exactly
    * that).
    *
    * `groupCol` must be LOW-CARDINALITY by contract (languages,
    * sources, shards — not doc ids): the driver holds one <=k-entry
    * summary per group, the same boundedness class as the broadcast
    * rate tables in q96/q107. NULL groups are excluded (a null group
    * is not a group — coalesce upstream if "unknown" should count as
    * one). `df` is evaluated twice (the [[exactAbove]] caller
    * contract). */
  def exactAbovePerGroup(df: DataFrame, groupCol: String, tokCol: String,
      theta: Double): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1], got $theta")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.max(1, math.ceil(1.0 / theta).toInt)
    val toks = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), col(tokCol).as("tok"))

    val sketchAgg = udaf(new MisraGries(k), Encoders.STRING)
    val perGroup = toks.groupBy($"grp")
      .agg(sketchAgg(col("tok")).as("sketch"), count(lit(1)).as("n"))
      .collect() // |groups| rows, each a <=k-entry map — bounded metadata
    if (perGroup.isEmpty)
      return toks.select($"grp".as(groupCol), $"tok", lit(0L).as("cnt")).limit(0)

    // group values are kept in their native type: the candidate frame
    // is built Row-wise under the input's own group field schema
    val grpField = toks.schema("grp")
    val candRows = perGroup.flatMap(r =>
      r.getMap[String, Long](1).keys.map(tok =>
        org.apache.spark.sql.Row(r.get(0), tok))).toSeq
    val cands = spark.createDataFrame(
      spark.sparkContext.parallelize(candRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        grpField,
        org.apache.spark.sql.types.StructField("tok",
          org.apache.spark.sql.types.StringType))))

    // per-group thresholds ride as a string-keyed map literal; the
    // String.valueOf driver key and the cast("string") probe agree for
    // the non-null primitive/string/date group types this is for
    val tMap = typedLit(perGroup.map { r =>
      String.valueOf(r.get(0)) ->
        math.max(1L, math.ceil(theta * r.getLong(2)).toLong)
    }.toMap)
    toks.join(broadcast(cands), Seq("grp", "tok"))
      .groupBy($"grp", $"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= element_at(tMap, $"grp".cast("string")))
      .select($"grp".as(groupCol), $"tok", $"cnt")
  }
}
