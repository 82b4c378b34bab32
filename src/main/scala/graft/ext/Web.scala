package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL handling for web-crawl curation: every large-scale text pipeline
  * groups, filters, and rate-limits by registered domain (RefinedWeb's
  * URL dedup + per-domain caps; CCNet's domain stats). Narrow per-row
  * expressions throughout — parse, normalize, group-key extraction —
  * so domain aggregation is the only shuffle.
  */
object Web {

  /** Hostname of an absolute http(s) URL (lowercased, port stripped). */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^https?://([^/:?#]+)", 1))

  /** URL path (empty string when absent). */
  def path(url: Column): Column =
    regexp_extract(url, "^https?://[^/?#]+(/[^?#]*)", 1)

  /** Query string without the '?' (empty when absent). */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Registered domain approximated as the last two host labels
    * (example.org from www.a.example.org). A production pipeline
    * substitutes the Mozilla public-suffix list here (co.uk etc.) —
    * that lookup is a broadcast map probe, same narrow shape.
    */
  def registeredDomain(hostC: Column): Column =
    regexp_extract(hostC, "([^.]+\\.[^.]+)$", 1)

  /** Canonical URL for dedup keys: scheme+host lowercased, default
    * ports dropped, trailing slash trimmed, query/fragment removed —
    * the RefinedWeb URL-dedup normalization.
    */
  def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^(https?)://", 1))
    val h = host(url)
    val p = regexp_replace(path(url), "/+$", "")
    concat(scheme, lit("://"), h, p)
  }

  /** Attach url_host, url_domain, url_path, url_query, url_norm. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_host", host(u))
      .withColumn("url_domain", registeredDomain(host(u)))
      .withColumn("url_path", path(u))
      .withColumn("url_query", query(u))
      .withColumn("url_norm", normalize(u))
  }
}
