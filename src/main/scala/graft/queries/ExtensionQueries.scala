package graft.queries

/** North-star extension query groups (SURVEY.md §2.6) — one object per
  * module family, wired into [[Registry]].
  */
object DedupQueries { def defs: Seq[QueryDef] = DedupQueriesImpl.defs }
object SimilarityQueries { def defs: Seq[QueryDef] = SimilarityQueriesImpl.defs }
object TextQueries { def defs: Seq[QueryDef] = TextQueriesImpl.defs }
object MultimodalQueries { def defs: Seq[QueryDef] = MultimodalQueriesImpl.defs }
object TimeSeriesQueries { def defs: Seq[QueryDef] = TimeSeriesQueriesImpl.defs }
object AnalyticsQueries { def defs: Seq[QueryDef] = AnalyticsQueriesImpl.defs }
object GraphQueries { def defs: Seq[QueryDef] = GraphQueriesImpl.defs }
object QualityQueries { def defs: Seq[QueryDef] = QualityQueriesImpl.defs }
