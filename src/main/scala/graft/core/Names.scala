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
    * (starting at _1), re-truncated to 300.
    */
  def dedup(names: Seq[String]): Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val c = counts.getOrElse(n, 0)
      counts(n) = c + 1
      (if (c > 0) s"${n}_$c" else n).take(MaxNameLen)
    }
  }

  /** sanitize + dedup, the order clean_dataframe applies (etl.py:656–669). */
  def sanitizeAll(raw: Seq[String]): Seq[String] = dedup(raw.map(sanitize))
}
