package graft.queries

import graft.Q

object DedupQueries {
  def qs: Seq[Q] = Seq()
}
