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

  /** Domain-level quality rollup — the FineWeb stage that drops WHOLE
    * registered domains whose per-document quality rate is poor
    * (Penedo et al. 2024 filter at URL/domain granularity before
    * per-doc passes: a domain where most pages fail is spam/SEO mass
    * and its passing pages are suspect too — public literature).
    * Input rows carry a URL and a boolean per-doc quality verdict;
    * output is one row per registered domain: doc count, passing
    * count, the pass fraction, and `blocked` (pass_frac < minPassFrac
    * — strict, so a domain AT the threshold survives).
    *
    * Determinism: counts are exact integers; pass_frac is ONE double
    * division of exact integers (identical in any engine); the block
    * verdict compares that double to the caller's threshold.
    *
    * Scale shape (100 TB): one map-side-combinable aggregation keyed
    * by registered domain (O(domains) output ≪ corpus). To FILTER the
    * corpus, join docs against the blocked slice — O(blocked domains)
    * rows, a broadcast in any real crawl.
    */
  def domainQuality(docs: DataFrame, urlCol: String, passCol: String,
      minPassFrac: Double): DataFrame = {
    require(minPassFrac >= 0.0 && minPassFrac <= 1.0,
      "minPassFrac must be in [0, 1]")
    withUrlParts(docs, urlCol)
      .groupBy(col("url_domain"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col(passCol), 1L).otherwise(0L)).cast("bigint")
          .as("n_pass"))
      .withColumn("pass_frac",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
      .withColumn("blocked", col("pass_frac") < minPassFrac)
  }
}
