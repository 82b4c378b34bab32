package graft.schema

import graft.SparkSuite
import graft.schema.Infer.Field
import java.nio.file.Files

/** Strategy cascade + LLM-response validation (etl.py:934–1009, 786–829). */
class ResolverSpec extends SparkSuite {
  import spark.implicits._

  test("LLM validation: unknown columns skipped, bad types -> STRING") {
    val got = Resolver.validateLlmSchema(
      Seq("a" -> "INTEGER", "ghost" -> "FLOAT", "b" -> "WIBBLE", "c" -> "timestamp"),
      Set("a", "b", "c"))
    assert(got.contains(Seq(
      Field("a", "INTEGER"), Field("b", "STRING"), Field("c", "TIMESTAMP"))))
  }

  test("LLM validation: nothing valid -> None (cascade continues)") {
    assert(Resolver.validateLlmSchema(Seq("x" -> "INTEGER"), Set("a")).isEmpty)
  }

  test("existing_or_pandas prefers the sink schema when present") {
    val dir = Files.createTempDirectory("resolver")
    val sink = dir.resolve("t").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(sink)
    val df = Seq(("9", "7")).toDF("k", "v") // v would infer INTEGER
    val schema = Resolver.determine(df, Seq("k", "v"), sink, "existing_or_pandas")
    assert(schema.map(f => f.name -> f.bqType) == Seq("k" -> "INTEGER", "v" -> "STRING"))
  }

  test("cascade falls to heuristic when sink missing and llm absent") {
    val df = Seq(("1", "a")).toDF("k", "v")
    val schema = Resolver.determine(df, Seq("k", "v"), "/nonexistent/sink",
      "existing_or_gemini_or_pandas")
    assert(schema.map(_.name) == Seq("k", "v"))
    assert(schema.head.bqType == "INTEGER")
  }

  test("zero common columns is fatal") {
    val df = Seq(("1", "a")).toDF("k", "v")
    val llm: Resolver.LlmFetch = _ => Some(Seq("k" -> "INTEGER"))
    intercept[IllegalStateException] {
      Resolver.determine(df, Seq("other"), "/nonexistent", "gemini", Some(llm))
    }
  }

  // ---- end-to-end cascade with a canned raw-text transport ----------
  // (etl.py:777–848 branch by branch: the transport returns what a real
  // HTTP client would — raw response text — and the cascade parses,
  // validates, and falls through exactly like the reference.)

  private def raw(s: String): Resolver.LlmFetch = Resolver.llmFromRaw(_ => Some(s))
  private val kvDf = spark.createDataFrame(
    java.util.List.of[org.apache.spark.sql.Row](
      org.apache.spark.sql.Row("1", "a")),
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))

  test("cascade: valid raw JSON is parsed and used") {
    val llm = raw("""[{"name":"k","type":"INTEGER"},{"name":"v","type":"STRING"}]""")
    val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(got == Seq(Field("k", "INTEGER"), Field("v", "STRING")))
  }

  test("cascade: markdown-fenced JSON is cleaned and used (etl.py:782)") {
    val llm = raw("```json\n[{\"name\":\"k\",\"type\":\"DATE\"}]\n```")
    val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(got == Seq(Field("k", "DATE")))
  }

  test("cascade: invalid type degrades that column to STRING (etl.py:820)") {
    val llm = raw("""[{"name":"k","type":"WIBBLE"},{"name":"v","type":"BOOL"}]""")
    val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(got == Seq(Field("k", "STRING"), Field("v", "BOOL")))
  }

  test("cascade: unknown column skipped; all-unknown falls to heuristic (etl.py:813,831)") {
    val partial = raw("""[{"name":"ghost","type":"FLOAT"},{"name":"k","type":"INTEGER"}]""")
    val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(partial))
    assert(got == Seq(Field("k", "INTEGER")), "hallucinated column must be dropped")
    val allGhost = raw("""[{"name":"ghost","type":"FLOAT"}]""")
    val fell = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(allGhost))
    assert(fell.map(_.name) == Seq("k", "v"), "cascade must fall through to pandas")
    assert(fell.head.bqType == "INTEGER") // heuristic, not LLM
  }

  test("cascade: garbage / non-list / malformed item all fall to heuristic (etl.py:786,790,806)") {
    for (bad <- Seq(
        "the schema is probably integers",        // not JSON
        """{"name":"k","type":"INTEGER"}""",      // JSON but not a list
        "[]",                                      // empty list
        """[{"name":"k"}]""",                      // item missing 'type' → whole response rejected
        """[{"name":"k","type":"INTEGER"}, 42]""" // non-object item → whole response rejected
        )) {
      val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(raw(bad)))
      assert(got.map(_.name) == Seq("k", "v"), s"input <$bad> must cascade to pandas")
      assert(got.head.bqType == "INTEGER", s"input <$bad> must use the heuristic result")
    }
  }

  test("cascade: transport failure (None, e.g. timeout) falls to heuristic (etl.py:838)") {
    val llm = Resolver.llmFromRaw(_ => None)
    val got = Resolver.determine(kvDf, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(got.map(_.name) == Seq("k", "v"))
  }

  test("llm provider result is used when valid") {
    val df = Seq(("1", "a")).toDF("k", "v")
    val llm: Resolver.LlmFetch = _ => Some(Seq("k" -> "STRING", "v" -> "STRING"))
    val schema = Resolver.determine(df, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(schema == Seq(Field("k", "STRING"), Field("v", "STRING")))
  }
}
