package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.Infer.Field
import scala.util.Try

/** Schema strategy cascade (determine_schema, etl.py:934–1009).
  *
  * Strategy string grammar, kept verbatim: `existing_or_<inference>`
  * tries the sink's current schema first (etl.py:941–948); the inference
  * part may contain "gemini" (LLM provider) and/or "pandas" (heuristic),
  * tried in that order (etl.py:954–969). Default strategy in this
  * environment is "existing_or_pandas" — the LLM provider is a stub
  * whose VALIDATION logic is real (etl.py:786–829) but whose transport
  * is disabled (zero egress), matching reference behavior when the
  * Gemini call fails: cascade to the heuristic.
  */
object Resolver {

  val SchemaTypeWhitelist: Set[String] = Set( // etl.py:793–797
    "STRING", "BYTES", "INTEGER", "INT64", "FLOAT", "FLOAT64", "NUMERIC",
    "BIGNUMERIC", "BOOLEAN", "BOOL", "TIMESTAMP", "DATE", "TIME",
    "DATETIME", "GEOGRAPHY", "JSON", "INTERVAL")

  /** LLM-response validation (etl.py:806–829): entries must be objects
    * with name+type; names not present in the frame are skipped; types
    * outside the whitelist degrade to STRING. Returns None when nothing
    * valid remains — the cascade then falls through to the heuristic.
    */
  def validateLlmSchema(parsed: Seq[(String, String)], frameCols: Set[String]): Option[Seq[Field]] = {
    val valid = parsed.flatMap { case (name, tpe) =>
      if (!frameCols.contains(name)) None // etl.py:813–816
      else if (!SchemaTypeWhitelist.contains(tpe.toUpperCase)) Some(Field(name, "STRING")) // etl.py:820–822
      else Some(Field(name, tpe.toUpperCase))
    }
    if (valid.isEmpty) None else Some(valid)
  }

  /** Optional LLM transport; None in this environment (no network). */
  type LlmFetch = DataFrame => Option[Seq[(String, String)]]

  /** Raw-text transport (what a real HTTP client returns); adapt with
    * [[llmFromRaw]]. Lets the full cascade be exercised end-to-end with
    * canned responses even though the sandbox has zero egress.
    */
  type LlmTransport = DataFrame => Option[String]

  /** LLM response-text parsing (etl.py:777–816): parse as JSON; on
    * failure strip a ```json ... ``` markdown fence and retry; the
    * result must be a non-empty list of objects each carrying non-empty
    * string `name`/`type`. A malformed ITEM rejects the whole response
    * (etl.py:805–816 raises), unlike an unknown column name, which
    * merely skips that item later in [[validateLlmSchema]].
    */
  def parseLlmResponse(raw: String): Option[Seq[(String, String)]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def tryParse(s: String): Option[JValue] = Try(JsonMethods.parse(s)).toOption
    val fence = "(?is)```json\\s*([\\s\\S]*?)\\s*```".r
    val parsed = tryParse(raw).orElse {
      val cleaned = fence
        .replaceAllIn(raw, m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
        .trim
      tryParse(cleaned)
    }
    parsed.flatMap {
      case JArray(items) if items.nonEmpty =>
        val pairs: Seq[Option[(String, String)]] = items.map {
          case JObject(fields) =>
            val m = fields.toMap
            (m.get("name"), m.get("type")) match {
              case (Some(JString(n)), Some(JString(t))) if n.nonEmpty && t.nonEmpty =>
                Some(n -> t)
              case _ => None
            }
          case _ => None
        }
        if (pairs.contains(None)) None else Some(pairs.flatten)
      case _ => None // not a list, or empty list (etl.py:790–793)
    }
  }

  /** Wire a raw-text transport into the cascade's [[LlmFetch]] slot. */
  def llmFromRaw(transport: LlmTransport): LlmFetch =
    df => transport(df).flatMap(parseLlmResponse)

  /** Existing-schema lookup: read the sink's parquet schema if the
    * target already exists (get_existing_schema, etl.py:927–931).
    */
  def existingSchema(spark: SparkSession, sinkPath: String): Option[Seq[Field]] =
    Try(spark.read.parquet(sinkPath).schema).toOption
      .map(_.fields.toSeq.map(f => Field(f.name, Infer.fromSparkType(f.dataType))))

  /** The full cascade. Throws on zero common columns (etl.py:989). */
  def determine(
      df: DataFrame,
      dataCols: Seq[String],
      sinkPath: String,
      strategy: String = "existing_or_pandas",
      llm: Option[LlmFetch] = None): Seq[Field] = {
    val spark = df.sparkSession
    var schema: Option[Seq[Field]] = None

    if (strategy.startsWith("existing_or_"))
      schema = existingSchema(spark, sinkPath)

    val inference = strategy.stripPrefix("existing_or_")
    if (schema.isEmpty && inference.contains("gemini"))
      schema = llm.flatMap(f => f(df)).flatMap(validateLlmSchema(_, dataCols.toSet))
    if (schema.isEmpty && inference.contains("pandas"))
      schema = Some(Infer.inferSchema(df, dataCols))

    val result = schema.getOrElse(
      throw new IllegalStateException(s"Schema determination failed for $sinkPath"))

    // cross-check (etl.py:977–994): zero common columns is fatal
    val common = result.map(_.name).toSet.intersect(dataCols.toSet)
    if (common.isEmpty)
      throw new IllegalStateException(s"Fatal schema mismatch for $sinkPath: no common columns")
    result
  }
}
