package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic train/val/test assignment, single-sourced for
  * every query that references split membership (q106's report,
  * q127's leakage matrix) — one predicate, one code path, one SQL
  * fragment, the qualityScored discipline applied to splits: first
  * hex char of `md5(doc_id)`, '0'..'c' → train (13/16 ≈ 81%),
  * 'd','e' → val (2/16), 'f' → test (1/16). Retuning the fractions
  * here retunes every consumer in both engines at once. */
private[graft] object SplitRule {

  def assign(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 1)
    when(h <= "c", "train").when(h <= "e", "val").otherwise("test")
  }

  def sqlCase(idExpr: String): String =
    s"""CASE WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
             WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
             ELSE 'test' END"""
}
