package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-based boilerplate removal — the CCNet / RefinedWeb
  * line-dedup step generalized to token segments (navigation chrome,
  * cookie banners, license headers: content repeated across many
  * documents of the SAME source carries no training signal and skews
  * n-gram statistics).
  *
  * Distinct from [[Dedup.chunkDedup]] on purpose: chunk dedup keeps the
  * corpus-wide FIRST occurrence of a segment (exact-substring dedup);
  * boilerplate removal drops EVERY occurrence of a segment whose
  * within-source document frequency reaches `minDocs` — the first
  * occurrence of a cookie banner is just as worthless as the millionth.
  *
  * Scale shape (100 TB):
  *  - document-frequency is a two-phase exact count-distinct keyed on
  *    (source, segment): Spark plans it as dedup-then-count, both
  *    stages map-side combinable, so a banner repeated across millions
  *    of documents collapses per map task before either exchange;
  *  - the boilerplate set (segments passing `minDocs`) is a small
  *    fraction of distinct segments; flagging is an equi-join on
  *    (source, segment) — AQE broadcasts it when it fits;
  *  - at 100 TB the join/group key would be the segment's 64-bit
  *    fingerprint instead of its text (the [[Text.contamination]]
  *    `hashedGrams` move); kept as text here so the oracle adjudicates
  *    the exact semantics;
  *  - re-assembly is the same per-doc bounded-state groupBy as
  *    [[Dedup.chunkDedup]].
  */
object Boiler {

  /** Remove within-source boilerplate segments. Per document: segment
    * counts, boilerplate fraction, and the text re-assembled (in
    * order) from its non-boilerplate segments.
    *
    * @param segTokens segment width in whitespace tokens (CCNet uses
    *                  physical lines; token windows are the
    *                  line-structure-free equivalent)
    * @param minDocs   a segment seen in >= minDocs distinct documents
    *                  of one source is boilerplate there
    */
  def removeBoilerplate(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, segTokens: Int, minDocs: Int): DataFrame = {
    require(segTokens > 0 && minDocs >= 2, "need segTokens > 0, minDocs >= 2")
    val toks = split(col(textCol), " ")
    // inline chunking (Text.chunk shape) keeping the source column so
    // no re-join on doc_id is needed — one narrow explode
    val seg = docs
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"), toks.as("toks"))
      .select(col("doc_id"), col("source"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(segTokens))).as(Seq("seg_idx", "start")),
        col("toks"))
      .select(col("doc_id"), col("source"), col("seg_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(segTokens)))
          .as("seg_text"))

    val boiler = seg.groupBy(col("source"), col("seg_text"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("source"), col("seg_text"), lit(true).as("is_boiler"))

    seg.join(boiler, Seq("source", "seg_text"), "left")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_segments"),
        sum(when(col("is_boiler"), 1).otherwise(0)).cast("bigint").as("n_boiler"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(!col("is_boiler"), struct(col("seg_idx"), col("seg_text"))))),
          x => x.getField("seg_text"))).as("clean_text"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_segments").cast("double"))
  }
}
