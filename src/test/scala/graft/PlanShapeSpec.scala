package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the scale-critical physical
  * properties (the things `.explain("formatted")` was iterated on):
  * filter pushdown reaching the parquet scan, column pruning, dims
  * broadcast instead of shuffled, top-k pre-limited before the window
  * shuffle, the as-of join's single big-side shuffle. A refactor that
  * silently loses one of these stays correct on 60k rows and falls
  * over at 100 TB — these specs fail instead. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def plan(name: String): String = {
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    QueryRegistry.byName(name).fn(spark, sf)
      .queryExecution.explainString(FormattedMode)
  }

  test("q01: shipdate filter pushed into the parquet scan; scan pruned to used columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "pruned column leaked into the scan")
  }

  test("q02: validity predicates reach the scan as pushed filters") {
    assert(plan("q02_validity_filter").contains("PushedFilters: [IsNotNull"))
  }

  test("q09/q11: semi and anti joins broadcast the small side") {
    assert(plan("q09_semi_join").contains("BroadcastHashJoin LeftSemi"))
    assert(plan("q11_blacklist_anti").contains("BroadcastHashJoin LeftAnti"))
  }

  test("q12: star join broadcasts every dimension") {
    val p = plan("q12_star_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "dimensions must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin"), "no dim should fall back to SMJ")
  }

  test("q22: per-group top-k pre-limits before the window shuffle") {
    // partial WindowGroupLimit (map side) + final after the exchange
    assert("WindowGroupLimit".r.findAllIn(plan("q22_topk_per_group")).size >= 2)
  }

  test("q122: stratified exact-k pre-limits before the stratum shuffle") {
    // rank<=k over md5 order must compile to the partial+final
    // WindowGroupLimit pair — map tasks drop to local top-k, so the
    // exchange carries <= k * partitions rows per language, never the
    // stratum (the scaladoc's scale claim, pinned)
    assert("WindowGroupLimit".r.findAllIn(plan("q122_stratified_topk")).size >= 2)
  }

  test("q124: cut-curve windows run over the aggregate, corpus shuffles once") {
    val p = plan("q124_quality_cut_curve")
    // ONE hash exchange: the bucket aggregate's partial->final pair
    // (the loader's round-robin spread and the window's
    // SinglePartition over <= 10 aggregated rows are both fine — the
    // trap is the corpus hashing more than once or sorting globally)
    assert("hashpartitioning".r.findAllIn(p).size <= 1,
      p.linesIterator.take(25).mkString("\n"))
    assert(p.contains("HashAggregate"), "bucket rollup must map-side combine")
  }

  test("q123: reference-postings membership join pins the shuffle regime") {
    // the ScaleCheck x96 lesson: AQE happily broadcasts the gate-SF
    // reference postings, flipping to SMJ one decade up — the
    // shuffle_hash hint must hold so the plan at gate SF IS the plan
    // at archive scale
    val p = plan("q123_shingle_novelty")
    assert(p.contains("ShuffledHashJoin"),
      "reference join must stay shuffle_hash at every scale")
    assert(!p.contains("BroadcastHashJoin LeftOuter"),
      "a broadcast reference join is the cross-scale regime flip")
  }

  test("q27: as-of join shuffles the unioned input exactly once") {
    val p = plan("q27_asof_join")
    assert(p.contains("Union"))
    // one Exchange for the union (the big side), one for the small
    // orders pre-dedup aggregate — nothing else
    assert("\\+- Exchange".r.findAllIn(p).size <= 2, p.linesIterator.take(20).mkString("\n"))
    assert("SortMergeJoin".r.findAllIn(p).isEmpty, "as-of must not plan a join at all")
  }

  test("q41/q43/q44/q77: no registered dedup plan carries a pair scan") {
    // q43 SimHash pairs come from 11-band pigeonhole banding, q44
    // cosine pairs from SRP bucket tables, q41/q77 candidates from
    // the PPJoin prefix equi-join (round 4) — all equi-joins; a
    // refactor reintroducing the O(n²) cross join fails here
    for (q <- Seq("q41_dedup_jaccard", "q43_dedup_simhash",
        "q44_dedup_cosine", "q71_repeated_spans",
        "q77_jaccard_prefix_filter")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian pair scan")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop pair scan")
    }
  }

  test("q118: incremental containment candidates are keyed equi-joins, never pair scans") {
    // both candidate generators (all-prefix ⋈ delta-postings and
    // delta-prefix ⋈ store-postings) key on the shingle hash; the
    // verification joins key on candidate ids — a refactor that
    // reintroduces a pair-shaped scan over store × delta fails here
    val p = plan("q118_incremental_containment")
    assert(!p.contains("CartesianProduct"), "q118 plans a cartesian pair scan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q118 plans a nested-loop pair scan")
  }

  test("q100: the store probe is Bloom-routed — might_contain rides the delta Filter") {
    // a revert to the plain left-anti (whole delta into the join)
    // loses the might_contain route; the definite-miss branch and the
    // exact-join branch union back together
    val p = plan("q100_incremental_dedup")
    assert(p.contains("might_contain"), "q100 lost the Bloom route")
    assert(p.contains("LeftAnti"), "q100 lost the exact anti-join backstop")
    assert(p.contains("Union"), "q100 should union the definite-miss and sliver branches")
  }

  test("q32: global ranks are range-partitioned — no full-table single-partition window") {
    val p = plan("q32_distribution_ranks")
    // the distributed two-level form: the big side shuffles ONCE, by
    // the value-derived width_bucket key, and the local rank window
    // is partitioned by it; the bounded offsets/total branches
    // broadcast back. All of it is visible to the SQL plan — that is
    // the point (the zipWithIndex variant hid the shuffle inside RDD
    // lineage and blinded this pin).
    assert(p.contains("width_bucket"), "lost the value-derived bucket key")
    assert(p.contains("hashpartitioning(bkt"),
      "the local-rank window must shuffle on the bucket key")
    // the full-row stream must shuffle exactly once: every Exchange
    // whose output carries c_custkey is the bkt hash exchange
    val exchanges = p.split("\\(\\d+\\) Exchange").drop(1)
      .map(_.linesIterator.take(3).mkString(" "))
    exchanges.filter(_.contains("c_custkey")).foreach { e =>
      assert(e.contains("hashpartitioning(bkt"),
        s"full-row exchange not keyed by bucket in q32: $e")
    }
    // a revert to the global Window.orderBy(...) function forms would
    // bring these back (whole table through one task)
    for (fn <- Seq("ntile(", "percent_rank(", "cume_dist("))
      assert(!p.contains(fn), s"$fn reappeared — single-partition global window")
  }

  test("all-plan scale tripwires: bounded global windows, no shuffle cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand,
      Generate, GlobalLimit, LocalLimit, LogicalPlan, UnaryNode, Window => LWindow}
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    // Two invariants walked over EVERY registered query's plan, so a
    // future query can't silently reintroduce either trap:
    //  - a Window with an empty partition spec runs its whole input
    //    through ONE task — only acceptable when the window's input
    //    is DOMINATED by an Aggregate/Limit (cardinality already
    //    reduced — q31: days). The walk descends only through unary
    //    nodes: an aggregate merely *somewhere* below (e.g. a tiny
    //    agg on one side of a join) must NOT excuse a global window
    //    over the join's full output;
    //  - a CartesianProduct is the shuffle cartesian — both sides
    //    big. (Condition-less joins are fine only as broadcast-NLJ
    //    against a capped side: 1-row aggregates, limit-capped or
    //    chunk-capped broadcast sets — q32/q47/q67/q68's shapes.)
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      // cardinality-INCREASING unary nodes un-bound whatever an
      // aggregate below them reduced (explode of collect_list, Expand
      // of grouping sets) — stop the descent
      case _: Generate | _: Expand => false
      case u: UnaryNode => bounded(u.child)
      case _ => false
    }
    val offenders = QueryRegistry.all.flatMap { q =>
      val qe = q.fn(spark, sf).queryExecution
      val windows = qe.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) =>
          s"${q.name}: global window over non-aggregated ${w.child.nodeName}"
      }
      val cartesian =
        if (qe.executedPlan.toString.contains("CartesianProduct"))
          Seq(s"${q.name}: CartesianProduct")
        else Nil
      windows ++ cartesian
    }
    assert(offenders.isEmpty, "scale tripwire hit:\n" + offenders.mkString("\n"))
  }

  test("q110: corpus reaches survivors through broadcast joins, winner rank pre-limits") {
    val p = plan("q110_dedup_keep_longest")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the full corpus must stream through a broadcast left-join")
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join here means the cluster table stopped broadcasting")
    // rk = 1 over (component) should compile to partial+final
    // WindowGroupLimit — the map side drops every non-winner row
    // before the component shuffle
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "winner selection lost its group-limit pre-filter")
  }

  test("q111: every corpus-carrying exchange is keyed by the shuffle bucket") {
    val p = plan("q111_token_budget_pack")
    assert(p.contains("hashpartitioning(bkt"),
      "the running-sum window must shuffle on the bucket key")
    // mirror q32's pin: any Exchange whose output carries doc_id is
    // either the bkt hash exchange or the documented single-file
    // loader spread (RoundRobin — absent at real scale)
    val exchanges = p.split("\\(\\d+\\) Exchange").drop(1)
      .map(_.linesIterator.take(3).mkString(" "))
    exchanges.filter(_.contains("doc_id")).foreach { e =>
      assert(e.contains("hashpartitioning(bkt") || e.contains("RoundRobinPartitioning"),
        s"full-row exchange not keyed by bucket in q111: $e")
    }
  }

  test("q88: the enrichment join is salted — shuffle key carries __salt") {
    val p = plan("q88_skewed_enrich")
    assert(p.contains("__salt"), "salted join key lost — hot keys re-concentrate")
    assert(p.contains("explode"), "small side must replicate per salt bucket")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q89: bucketed layout eliminates every shuffle Exchange") {
    val p = plan("q89_bucketed_distinct_counts")
    val tree = p.linesIterator.takeWhile(l => !l.startsWith("(1)")).mkString("\n")
    // BroadcastExchange of the agg outputs is allowed (stats-driven;
    // at scale those joins flip to exchange-free SMJ on the shared
    // bucket partitioning) — what bucketing must kill is data shuffle
    assert(!tree.linesIterator.exists(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange")),
      "bucket metadata should satisfy every distribution requirement:\n" + tree)
  }

  test("q93/q94: bounded dictionaries broadcast; the corpus side never cross-joins") {
    for (q <- Seq("q93_oov_rate", "q94_length_outliers")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q must broadcast the bounded side")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q97/q98/q99: TPC-H classics broadcast their dims, never cross-join") {
    for (q <- Seq("q97_tpch_q3", "q98_tpch_q5", "q99_tpch_q10")) {
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty, s"$q: dims must broadcast")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), q)
    }
    // Q3/Q10 must pre-limit under the sort (TakeOrderedAndProject),
    // not globally sort the aggregate output
    assert(plan("q97_tpch_q3").contains("TakeOrderedAndProject"))
    assert(plan("q99_tpch_q10").contains("TakeOrderedAndProject"))
  }

  test("runtime bloom filter fires on q97's order-lineitem join at shuffle scale") {
    // At 100 TB the orders side of Q3 outgrows any broadcast; the
    // shuffle join then relies on Spark's runtime bloom-filter
    // injection (selective date filter on the creation side prunes
    // the fact scan before the exchange). Simulate that regime
    // (injection thresholds floored) and pin that the engine's join
    // shape still QUALIFIES for injection — a rewrite that broke the
    // filtered equi-join form would silently lose this at scale.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = plan("q97_tpch_q3")
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        "no runtime bloom filter injected:\n" + p.linesIterator.take(30).mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("IVF store probe (q146's serving shape): file-pruned scan on both partition dims, map-side top-k before the single qid shuffle") {
    // the one headline plan the registry can't snapshot (q146's
    // registered frame is an eager lifecycle) — pinned from a store
    // fixture instead: this is the ANN SERVING shape, and at 100× the
    // load-bearing properties are (a) the scan prunes at the FILE
    // INDEX on both partition dims (uncommitted days and unprobed
    // cells contribute zero files), (b) the scan side reaches the
    // pair join with no exchange (pairs broadcast), (c) per-query
    // top-k pre-limits map-side, so the ONLY data shuffle carries
    // ≤ topK·partitions rows per query, never the probed cells
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("ps-ivf").toString + "/ivf"
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(8)(rnd.nextGaussian())
    val day1 = (0 until 60).map(i => i.toLong -> vec())
      .toDF("vec_id", "embedding")
    graft.operators.IvfStore.init(day1, "vec_id", "embedding", root,
      k = 4, iters = 2)
    graft.operators.IvfStore.append(day1, root, "2024-06-01")
    graft.operators.IvfStore.append(
      (200 until 260).map(i => i.toLong -> vec()).toDF("vec_id", "embedding"),
      root, "2024-06-02")
    val p = graft.operators.IvfStore.probe(spark, root, "vec_id", "embedding",
        (0 until 3).map(i => (9000L + i) -> vec()), nprobe = 2, topK = 5)
      .queryExecution.explainString(FormattedMode)

    // (a) both partition dims prune at the file index
    val pf = p.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters line in:\n$p"))
    assert(pf.contains("dt#") && pf.contains("cell#") && pf.contains(" IN "),
      s"probe scan must carry IN filters on dt AND cell: $pf")
    // data schema pruned to id + vector — dt/cell never read as data
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<double>>"),
      "probe scan lost its column pruning")
    // (b) pairs broadcast; no exchange between the scan and the join
    assert(p.contains("BroadcastHashJoin"), "pair join must broadcast")
    // (c) partial+final WindowGroupLimit around the one qid shuffle
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "per-query top-k lost its map-side pre-limit")
    val tree = p.linesIterator.takeWhile(l => !l.startsWith("(1)")).mkString("\n")
    val shuffles = tree.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      .toSeq
    assert(shuffles.size === 1,
      s"probe must shuffle exactly once (qid top-k):\n$tree")
    assert(p.contains("hashpartitioning(qid"),
      "the single shuffle must be keyed by qid")
  }

  test("IVF ADC probe (q150's serving shape): code-bytes-only file-pruned scan, broadcast LUT join, map-side top-k") {
    // the PQ twin of the q146 pin: same serving skeleton, but the
    // scanned table is CODES — at 100× the load-bearing property is
    // that the scan's ReadSchema carries m ints per row instead of
    // dim floats (the 32× byte claim, visible in the plan), with the
    // same dual partition-dim file pruning and single qid exchange
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("ps-ivfadc").toString + "/ivf"
    val rnd = new scala.util.Random(6)
    def vec() = Array.fill(8)(rnd.nextGaussian())
    val day1 = (0 until 60).map(i => i.toLong -> vec())
      .toDF("vec_id", "embedding")
    graft.operators.IvfStore.init(day1, "vec_id", "embedding", root,
      k = 4, iters = 2)
    graft.operators.IvfStore.append(day1, root, "2024-06-01")
    graft.operators.IvfStore.enablePq(spark, root, m = 2, k = 4, iters = 2): Unit
    graft.operators.IvfStore.append(
      (200 until 260).map(i => i.toLong -> vec()).toDF("vec_id", "embedding"),
      root, "2024-06-02")
    val p = graft.operators.IvfStore.adcProbe(spark, root, "vec_id",
        (0 until 3).map(i => (9000L + i) -> vec()), nprobe = 2, topK = 5)
      .queryExecution.explainString(FormattedMode)

    val pf = p.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters line in:\n$p"))
    assert(pf.contains("dt#") && pf.contains("cell#") && pf.contains(" IN "),
      s"ADC scan must carry IN filters on dt AND cell: $pf")
    // the scan reads CODE bytes: id + m-int codes, never the vector
    assert(p.contains("ReadSchema: struct<vec_id:bigint,pq_codes:array<int>>"),
      "ADC probe scan must read codes only:\n" +
        p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    assert(!p.contains("embedding"),
      "ADC probe plan must never touch the vector column")
    assert(p.contains("BroadcastHashJoin"), "LUT pair join must broadcast")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "per-query top-k lost its map-side pre-limit")
    val tree = p.linesIterator.takeWhile(l => !l.startsWith("(1)")).mkString("\n")
    val shuffles = tree.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      .toSeq
    assert(shuffles.size === 1,
      s"ADC probe must shuffle exactly once (qid top-k):\n$tree")
    assert(p.contains("hashpartitioning(qid"),
      "the single shuffle must be keyed by qid")
  }

  test("q05: the three distinct-count branches share one cached projection") {
    val p = plan("q05_distinct_counts")
    // count in the plan TREE only — the details section re-prints the
    // cached subtree (and its scan) once per referencing branch
    val tree = p.linesIterator.takeWhile(l => !l.startsWith("(1)")).mkString("\n")
    assert("InMemoryTableScan".r.findAllIn(tree).size >= 3,
      "all three aggregate branches must read the cached block")
  }
}
