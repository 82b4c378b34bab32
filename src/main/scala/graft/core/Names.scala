package graft.core

/** Identifier sanitization for sink table/column names
  * (reference: sanitize_bq_name, etl.py:206–222; dedup etl.py:662–669).
  */
object Names {
  val MaxNameLen = 300 // etl.py:222
  val MaxTableNameLen = 1024 // etl.py:1312

  /** etl.py:206–222 verbatim: trim → non-word chars to '_' → ensure
    * leading letter/underscore → '_unnamed' if empty → truncate to 300.
    * Note: Python's \w is unicode-aware; we use Java's UNICODE_CHARACTER_CLASS
    * equivalent (?U) to match.
    */
  def sanitize(raw: String): String = {
    var name = Option(raw).getOrElse("").trim
    name = name.replaceAll("(?U)[^\\w]", "_")
    if (name.nonEmpty && !name.matches("^[a-zA-Z_].*")) name = "_" + name
    if (name.isEmpty) name = "_unnamed"
    name.take(MaxNameLen)
  }

  /** Duplicate-name dedup after sanitization (etl.py:662–669): first
    * occurrence keeps the bare name; the Nth repeat gets suffix _N
    * (starting at _1).
    *
    * Two documented improvements over the reference's naive counter
    * (which can itself emit duplicates — BigQuery would reject them):
    * the suffix bumps until the candidate is globally unused (the
    * reference turns ["a","a_1","a"] into ["a","a_1","a_1"]), and
    * truncation to 300 shortens the BASE, never the suffix (the
    * reference truncates the suffix away on 300-char duplicates).
    */
  def dedup(names: Seq[String]): Seq[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    val counts = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      var c = counts.getOrElse(n, 0)
      var candidate = if (c > 0) withSuffix(n, c) else n.take(MaxNameLen)
      while (used.contains(candidate)) {
        c += 1
        candidate = withSuffix(n, c)
      }
      counts(n) = c + 1
      used += candidate
      candidate
    }
  }

  private def withSuffix(base: String, c: Int): String = {
    val suffix = s"_$c"
    base.take(MaxNameLen - suffix.length) + suffix
  }

  /** sanitize + dedup, the order clean_dataframe applies (etl.py:656–669). */
  def sanitizeAll(raw: Seq[String]): Seq[String] = dedup(raw.map(sanitize))
}
