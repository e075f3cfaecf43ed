package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-2 operator additions: connected components
  * (q72), native session_window boundaries (q74), stratified hash
  * sampling (q73). The DuckDB oracle gate proves end-to-end equality;
  * these pin the operator-level edge cases it can't isolate. */
class ExtendedOpsSpec extends AnyFunSuite with SparkSpec {

  test("connected components: chain + separate component + min labeling") {
    val spark2 = spark
    import spark2.implicits._
    // chain 1-2-3-4 (diameter 3 forces >1 propagation round), pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L)).toDF("a", "b")
    val got = operators.ConnectedComponents.label(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: ring converges (propagation must cross the cycle)") {
    val spark2 = spark
    import spark2.implicits._
    // 6-ring: 20-21-22-23-24-25-20; min label must travel both ways
    val ring = (20L to 24L).map(i => (i, i + 1)) :+ (25L, 20L)
    val got = operators.ConnectedComponents.label(ring.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === (20L to 25L).toSet && got.values.toSet === Set(20L))
  }

  test("connected components: two chains merged by a bridge edge") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq((5L, 6L), (7L, 8L), (6L, 7L)).toDF("a", "b")
    val got = operators.ConnectedComponents.label(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(5L))
  }

  test("connected components: 200-node path converges (needs log-diameter, not diameter, rounds)") {
    val spark2 = spark
    import spark2.implicits._
    val path = (1000L until 1199L).map(i => (i, i + 1))
    val got = operators.ConnectedComponents.label(path.toDF("a", "b"))
      .as[(Long, Long)].collect()
    assert(got.length == 200 && got.forall(_._2 == 1000L),
      s"unconverged: ${got.filter(_._2 != 1000L).take(5).toSeq}")
  }

  test("connected components: random graphs match a union-find reference") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle (test-only; tiny graphs)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      val got = operators.ConnectedComponents.label(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      // min-label CC: component id == min reachable id == union-find
      // root when unions always keep the smaller id
      assert(got === expected, s"trial $trial (n=$n)")
    }
  }

  test("connected components: local fast path and distributed loop agree") {
    // the round-9 fast path (driver union-find under
    // graft.cc.maxLocalEdges) must be label-identical to the Pregel
    // loop on the same graphs — force each path explicitly
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    def run(edges: Seq[(Long, Long)], cap: String): Map[Long, Long] = {
      spark2.conf.set("graft.cc.maxLocalEdges", cap)
      try operators.ConnectedComponents.label(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      finally spark2.conf.unset("graft.cc.maxLocalEdges")
    }
    for (trial <- 1 to 3) {
      val edges = Seq.fill(40 + trial * 20)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val local = run(edges, cap = "1000000")
      val dist = run(edges, cap = "0") // 0 edges allowed → loop path
      assert(local === dist, s"trial $trial: paths disagree")
    }
    // non-long ids always take the distributed path (no fast-path
    // collect semantics to get wrong on other key types)
    val strEdges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val got = operators.ConnectedComponents.label(strEdges.toDF("s", "t"))
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    // null-keyed edges are dropped identically on both paths — no
    // NPE on the fast path, no leaked (null, null) label row on the
    // distributed one
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("a", "b")
    for (cap <- Seq("1000000", "0")) {
      spark2.conf.set("graft.cc.maxLocalEdges", cap)
      try {
        val m = operators.ConnectedComponents.label(withNulls)
          .as[(Long, Long)].collect().toMap
        assert(m === Map(1L -> 1L, 2L -> 1L), s"cap=$cap: $m")
      } finally spark2.conf.unset("graft.cc.maxLocalEdges")
    }
  }

  test("session_window: touching windows merge, strictly-greater gap splits") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = 1700000000000000L // µs
    val mins = 60L * 1000000
    // u1: gap of exactly 30 min → windows TOUCH → one merged session;
    // u2: 30 min + 1 µs → 2 sessions; u3: 29 min → 1 session
    val events = Seq(
      (1L, t0), (1L, t0 + 30 * mins),
      (2L, t0), (2L, t0 + 30 * mins + 1),
      (3L, t0), (3L, t0 + 29 * mins)
    ).toDF("user_id", "us").select($"user_id", timestamp_micros($"us").as("ts"))
    val sessions = events
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(sessions === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("session_window: random event streams match strict-> gaps-and-islands") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val gapUs = 30L * 60 * 1000000
    val t0 = 1700000000000000L
    val events = (1 to 4).flatMap { u =>
      var t = t0
      (1 to 25).map { _ =>
        t += (rnd.nextInt(50) + 1) * 60L * 1000000 // 1-50 min steps
        (u.toLong, t)
      }
    }
    // reference islands: new session iff gap STRICTLY > 30 min
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > gapUs) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      u -> sessions.map(s => (s.min, s.max, s.size.toLong)).toSet
    }
    val got = events.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(min(unix_micros($"ts")).as("a"), max(unix_micros($"ts")).as("b"),
        count(lit(1)).as("n"))
      .select($"user_id", $"a", $"b", $"n")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(r => (r._2, r._3, r._4)).toSet }
    assert(got == expected)
  }

  test("funnel: out-of-order steps do not count toward depth") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    val h = 3600L * 1000000000L // ns
    val t0 = 1700000000L * 1000000000L
    // u1: view→click→purchase (depth 3); u2: click BEFORE view (depth 1);
    // u3: purchase before click (depth 2); u4: no view at all (absent)
    val rows = Seq(
      (1L, t0, 1L, "view", 0.0, "{}"), (2L, t0 + h, 1L, "click", 0.0, "{}"),
      (3L, t0 + 2 * h, 1L, "purchase", 0.0, "{}"),
      (4L, t0, 2L, "click", 0.0, "{}"), (5L, t0 + h, 2L, "view", 0.0, "{}"),
      (6L, t0, 3L, "view", 0.0, "{}"), (7L, t0 + h, 3L, "purchase", 0.0, "{}"),
      (8L, t0 + 2 * h, 3L, "click", 0.0, "{}"),
      (9L, t0, 4L, "purchase", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = QueryRegistry.byName("q86_funnel").fn(spark, dir)
      .select($"user_id", $"depth").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("stratified sample: per-stratum rates land near target and are deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (1L to 4000L).map(k => (k, if (k % 4 == 0) "AUTOMOBILE" else "OTHER"))
      .toDF("c_custkey", "c_mktsegment")
    val bucket =
      conv(substring(md5($"c_custkey".cast("string")), 1, 14), 16, 10)
        .cast("long") % 100
    val kept = rows
      .filter(bucket < when($"c_mktsegment" === "AUTOMOBILE", 10).otherwise(30))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val auto = kept("AUTOMOBILE").toDouble / 1000
    val other = kept("OTHER").toDouble / 3000
    assert(auto > 0.05 && auto < 0.15, s"auto rate $auto")
    assert(other > 0.25 && other < 0.35, s"other rate $other")
    // determinism: the same filter yields the same set, not a re-roll
    val again = rows
      .filter(bucket < when($"c_mktsegment" === "AUTOMOBILE", 10).otherwise(30))
      .count()
    assert(again === kept.values.sum)
  }
  test("q90: incremental merge equals a single-pass batch recompute (fixture)") {
    import spark.implicits._
    val sf = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val merged = QueryRegistry.byName("q90_incremental_merge").fn(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy($"user_id").agg(
        min(unix_micros($"ts")).as("f"), max(unix_micros($"ts")).as("l"),
        count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", $"value").otherwise(0.0)).as("pv"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(merged.keySet == batch.keySet)
    merged.foreach { case (u, (f, l, n, pv)) =>
      val (bf, bl, bn, bpv) = batch(u)
      assert((f, l, n) == ((bf, bl, bn)), s"user $u")
      assert(math.abs(pv - bpv) <= math.abs(bpv).max(1.0) * 1e-12, s"user $u pv")
    }
  }
}
