package graft.queries

/** Reference-parity cleaning operators exposed as driver queries.
  * Populated alongside graft.clean / graft.schema (SURVEY.md §2.3–2.5).
  */
object Cleaning {
  val queries: Seq[Q] = Seq()
}
