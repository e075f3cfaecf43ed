package graft.queries

import graft.Q

object MultimodalQueries {
  def qs: Seq[Q] = Seq()
}
