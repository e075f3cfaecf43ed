package graft.queries

import graft.Q

object SimilarityQueries {
  def qs: Seq[Q] = Seq()
}
