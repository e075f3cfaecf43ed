package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[Verify.run]]'s tamper-evidence contract (round 9, VERDICT r8 #3):
  * the round-7 incident was 25 queries vanishing from the gate because
  * an analysis failure writes no parquet and nothing recorded an error
  * — a GREEN artifact with silently shrunken coverage. These pins make
  * that class of loss structurally loud: a deliberately-broken query
  * must produce an err entry and a registry entry, never an absence.
  */
class VerifyGateSpec extends AnyFunSuite with SparkSpec {

  private def slurp(p: String): String = Files.readString(Paths.get(p))

  test("broken query yields an err row and stays in the registry") {
    val out = Files.createTempDirectory("vgate").toString
    val good = (s: org.apache.spark.sql.SparkSession, _: String) =>
      s.range(3).toDF("id")
    // unresolvable column → AnalysisException (the r7 failure class)
    val broken = (s: org.apache.spark.sql.SparkSession, _: String) =>
      s.range(3).toDF("id").select(col("no_such_column"))
    val errs = Verify.run(spark,
      Map("q_good" -> good, "q_broken" -> broken), "/unused-sf", out)

    assert(errs.keySet === Set("q_broken"))
    assert(errs("q_broken").nonEmpty, "error message must be recorded")

    val registry = slurp(s"$out/registry.json")
    assert(registry.contains("\"q_good\"") && registry.contains("\"q_broken\""),
      s"registry must list every query, broken or not: $registry")

    val errors = slurp(s"$out/errors.json")
    assert(errors.contains("\"q_broken\""), s"errors.json must name it: $errors")
    assert(!errors.contains("\"q_good\""), s"healthy query must not: $errors")

    assert(Files.exists(Paths.get(s"$out/q_good")), "good query still dumps")
    assert(!Files.exists(Paths.get(s"$out/q_broken")), "broken query has no dump")
  }

  test("all-green registry writes an empty errors map") {
    val out = Files.createTempDirectory("vgate2").toString
    val good = (s: org.apache.spark.sql.SparkSession, _: String) =>
      s.range(2).toDF("id")
    val errs = Verify.run(spark, Map("q_only" -> good), "/unused-sf", out)
    assert(errs.isEmpty)
    assert(slurp(s"$out/errors.json") === "{}")
    assert(slurp(s"$out/registry.json") === "[\"q_only\"]")
  }

  test("full registry round-trips: SparkEntry.queries size is recorded") {
    // the artifact-vs-registry equality check.py enforces is only as
    // good as the registry being the REAL query set — pin the wiring
    assert(SparkEntry.queries.size === QueryRegistry.all.size)
    assert(SparkEntry.queries.size >= 117, "registry must never shrink silently")
  }
}
