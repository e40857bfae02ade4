package graft.ops

/** Single source of truth for every engine operator exposed through the
  * driver contract (`graft.SparkEntry`). Keeping `queries` and `oracleSql`
  * derived from the same `Q` list guarantees they never drift.
  */
object QueryRegistry {
  def all: Seq[Q] =
    Relational.queries ++
      PipelineOps.queries ++
      TextOps.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      MultimodalOps.queries ++
      CurationOps.queries ++
      QualityOps.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
