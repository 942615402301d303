package graft.queries

/** North-star extension query groups (SURVEY.md §2.6) — filled in by the
  * dedup / similarity / text / multimodal / time-series modules.
  */
object DedupQueries { def defs: Seq[QueryDef] = Seq.empty }
object SimilarityQueries { def defs: Seq[QueryDef] = Seq.empty }
object TextQueries { def defs: Seq[QueryDef] = Seq.empty }
object MultimodalQueries { def defs: Seq[QueryDef] = Seq.empty }
object TimeSeriesQueries { def defs: Seq[QueryDef] = Seq.empty }
