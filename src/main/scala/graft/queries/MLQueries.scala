package graft.queries

import graft.Q

object MLQueries {
  def qs: Seq[Q] = Seq()
}
