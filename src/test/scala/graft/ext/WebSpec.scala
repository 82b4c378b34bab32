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
}
