package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WebSpec extends SparkSuite {

  import spark.implicits._

  test("url parts and normalization") {
    val rows = Seq(
      "https://WWW.News.Example.org/a/b/?q=1#frag",
      "http://example.org",
      "https://a.co/path",
      "not a url"
    ).toDF("url")
    val out = Web.withUrlParts(rows, "url").collect()
    val byUrl = out.map(r => r.getString(0) -> r).toMap

    val n1 = byUrl("https://WWW.News.Example.org/a/b/?q=1#frag")
    assert(n1.getAs[String]("url_host") == "www.news.example.org")
    assert(n1.getAs[String]("url_domain") == "example.org")
    assert(n1.getAs[String]("url_path") == "/a/b/")
    assert(n1.getAs[String]("url_query") == "q=1")
    assert(n1.getAs[String]("url_norm") == "https://www.news.example.org/a/b")

    val n2 = byUrl("http://example.org")
    assert(n2.getAs[String]("url_host") == "example.org")
    assert(n2.getAs[String]("url_path") == "")
    assert(n2.getAs[String]("url_norm") == "http://example.org")

    val bad = byUrl("not a url")
    assert(bad.getAs[String]("url_host") == "")
    assert(bad.getAs[String]("url_domain") == "")
  }

  test("www and bare hosts fold into one registered domain") {
    val rows = Seq("https://www.x-site.com/1", "https://x-site.com/2").toDF("url")
    val doms = Web.withUrlParts(rows, "url")
      .select("url_domain").distinct().collect().map(_.getString(0)).toSeq
    assert(doms == Seq("x-site.com"))
  }

  test("domainQuality rolls up pass fractions and blocks below threshold") {
    val rows = Seq(
      ("https://www.good.com/1", true), ("https://good.com/2", true),
      ("https://good.com/3", false),   // 2/3 pass → kept
      ("https://spam.org/a", false), ("https://spam.org/b", true),
      ("https://spam.org/c", false), ("https://spam.org/d", false),
      ("https://edge.net/x", true), ("https://edge.net/y", false)
    ).toDF("url", "ok")
    val out = Web.domainQuality(rows, "url", "ok", minPassFrac = 0.5)
      .orderBy("url_domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("edge.net", 2L, 1L, 0.5, false), // AT the threshold survives
      ("good.com", 3L, 2L, 2.0 / 3.0, false),
      ("spam.org", 4L, 1L, 0.25, true)))
  }
}
