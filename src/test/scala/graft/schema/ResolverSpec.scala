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

  test("llm provider result is used when valid") {
    val df = Seq(("1", "a")).toDF("k", "v")
    val llm: Resolver.LlmFetch = _ => Some(Seq("k" -> "STRING", "v" -> "STRING"))
    val schema = Resolver.determine(df, Seq("k", "v"), "/nonexistent", "gemini_or_pandas", Some(llm))
    assert(schema == Seq(Field("k", "STRING"), Field("v", "STRING")))
  }
}
