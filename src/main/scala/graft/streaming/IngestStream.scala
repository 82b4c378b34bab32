package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.pipeline.Ingest

/** Streaming work-item ingest — the reference's Pub/Sub control plane
  * (etl.py:1365–1411) re-expressed as a Structured Streaming file
  * source + foreachBatch (SURVEY.md §2.9).
  *
  * Mapping of delivery semantics:
  *  - ack/nack + redelivery → checkpointed offsets + batch replay;
  *  - nack on malformed / missing-field messages (etl.py:1390–1393) →
  *    dead-letter directory (a poison message must not loop forever);
  *  - deliberate ack of FileNotFound (etl.py:1346–1348) → skip+log;
  *  - the reference's at-least-once + WRITE_APPEND duplicates on EVERY
  *    redelivery (a real reference bug, SURVEY.md §2.9): here a
  *    per-(batch, object) marker under `_ingest_log` makes batch REPLAY
  *    skip already-ingested objects, so duplicates are only possible if
  *    a crash lands between one object's sink write and its marker —
  *    a narrow window instead of the reference's every-redelivery bug.
  *    (Full exactly-once for multi-table appends needs an atomic
  *    staging swap per object; documented trade-off.)
  */
object IngestStream {

  val workItemSchema: StructType = StructType(Seq(
    StructField("object_name", StringType),
    StructField("target_dataset_id", StringType)))

  /** Start the inbox listener. JSON-lines files appear in `inboxDir`;
    * each row is one work item. Runs until `awaitTermination` (or one
    * drain with Trigger.AvailableNow when `drainOnce`).
    */
  def start(
      spark: SparkSession,
      inboxDir: String,
      objectsDir: String,
      datasetRoot: String,
      deadLetterDir: String,
      checkpointDir: String,
      drainOnce: Boolean = false): StreamingQuery = {
    // columnNameOfCorruptRecord keeps malformed JSON lines as rows so
    // they can be dead-lettered instead of silently dropped
    val raw = spark.readStream
      .schema(workItemSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(inboxDir)

    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, objectsDir, datasetRoot, deadLetterDir, batchId)
      }
    (if (drainOnce) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One micro-batch: validate, dead-letter the invalid, ingest the
    * rest. Work items are control-plane-sized (one row per FILE), so a
    * driver-side iteration over the batch is O(files), not O(data) —
    * the data-plane work happens inside processObject's Spark jobs.
    */
  def processBatch(batch: DataFrame, objectsDir: String, datasetRoot: String,
      deadLetterDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val items = batch.collect()
    val dead = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    def jstr(s: Option[String]): String =
      s.map(v => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").getOrElse("null")

    items.foreach { row =>
      val corrupt = Option(row.getAs[String]("_corrupt"))
      val obj = Option(row.getAs[String]("object_name"))
      val ds = Option(row.getAs[String]("target_dataset_id"))
      (corrupt, obj, ds) match {
        case (Some(bad), _, _) => dead += bad -> "malformed json"
        case (_, None, _) | (_, _, None) =>
          dead += s"""{"object_name": ${jstr(obj)}, "target_dataset_id": ${jstr(ds)}}""" -> "missing field"
        case (_, Some(o), Some(d)) =>
          // replay-idempotence marker: a crashed batch re-runs from the
          // checkpoint; objects that already completed must not append
          // their rows a second time
          val marker = java.nio.file.Paths.get(datasetRoot, "_ingest_log",
            s"batch_${batchId}_${java.lang.Integer.toHexString(s"$o->$d".hashCode)}")
          if (!java.nio.file.Files.exists(marker)) {
            try {
              Ingest.processObject(spark, s"$objectsDir/$o", s"$datasetRoot/$d", d)
              java.nio.file.Files.createDirectories(marker.getParent)
              java.nio.file.Files.writeString(marker, s"$o -> $d")
            } catch {
              case _: java.io.FileNotFoundException => () // deliberate ack (etl.py:1346)
              case _: java.nio.file.NoSuchFileException => () // xlsx path throws this flavor
              case e: org.apache.spark.sql.AnalysisException if e.getMessage.contains("PATH_NOT_FOUND") => ()
              case e: Exception => dead += s"$o -> $d" -> e.getMessage
            }
          }
      }
    }

    if (dead.nonEmpty) {
      import spark.implicits._
      dead.toSeq.toDF("item", "reason")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").json(deadLetterDir)
    }
  }
}
