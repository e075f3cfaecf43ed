package graft.queries

import graft.Q

object TextQueries {
  def qs: Seq[Q] = Seq()
}
