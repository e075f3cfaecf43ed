package graft.queries

import graft.Q

object ProfileQueries {
  def qs: Seq[Q] = Seq()
}
