package graft.queries

/** LLM-data-pipeline extension operators (SURVEY.md §2.8): dedup,
  * similarity search, text analysis, multimodal columns.
  */
object Ext {
  val queries: Seq[Q] = Seq()
}
