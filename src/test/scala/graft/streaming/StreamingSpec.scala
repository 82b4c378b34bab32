package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** SURVEY.md §2.9: streaming == batch for the shared window transform;
  * inbox ingest with dead-lettering (FIXTURES.md B8).
  */
class StreamingSpec extends SparkSuite {

  private def eventsDf = {
    // rebuild a micros-ts copy of events (source table is ns-typed
    // parquet, which the streaming parquet source can't read either)
    graft.queries.H.t(spark, "/root/testdata/sf0.001", "events")
  }

  test("streaming tumbling windows equal the batch result") {
    val dir = Files.createTempDirectory("evstream")
    val src = dir.resolve("src").toString
    eventsDf.write.parquet(src)

    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    val agg = EventStream.tumblingCountsStream(stream, "1 hour", "10 minutes")

    val q = agg.writeStream
      .format("memory").queryName("tumbling_test")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM tumbling_test")
    val batch = EventStream.tumblingCounts(eventsDf, "1 hour")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session windows equal the batch sessions") {
    // event-time session_window under a watermark: merged sessions in
    // the stream must equal the one-shot batch sessionization — the
    // stateful-merge semantics (sessions GROW as events arrive and
    // only emit once the watermark passes their gap) are exactly what
    // AvailableNow + complete-mode flushes deterministically
    val dir = Files.createTempDirectory("sessstream")
    val src = dir.resolve("src").toString
    eventsDf.write.parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    val agg = EventStream.sessionCounts(
      stream.withWatermark("ts", "10 minutes"), "5 minutes")
    val q = agg.writeStream
      .format("memory").queryName("session_test")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM session_test")
    val batch = EventStream.sessionCounts(eventsDf, "5 minutes")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed sessions must equal the batch sessionization")
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    val dir = Files.createTempDirectory("state")
    val src = dir.resolve("src").toString
    // two batches: split events by parity of event_id into two files
    val ev = eventsDf
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$src/b0")
    ev.filter(col("event_id") % 2 === 1).write.parquet(s"$src/b1")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val q = EventStream.userRunningStats(stream.toDF())
      .writeStream.format("memory").queryName("user_state_test")
      .outputMode("update")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // last update per user must equal the batch-computed totals
    val got = spark.sql(
      """SELECT user_id, max_by(n, n) AS n, max_by(total_value, n) AS total
        |FROM user_state_test GROUP BY user_id""".stripMargin)
    val expected = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total"))
    assert(got.count() == expected.count())
    val mism = got.as("g").join(expected.as("e"), "user_id")
      .filter(col("g.n") =!= col("e.n") || col("g.total") =!= col("e.total"))
    assert(mism.isEmpty, s"state totals mismatch: ${mism.head(3).mkString}")
  }

  test("streaming near-dup dedup: micro-batches against accumulated state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("neardupstream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    val state = dir.resolve("state").toString
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"

    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .parquet(src.toString)
      val q = DedupStream.nearDupDedupStream(stream, "text", "doc_id",
        state, out, ckpt)
      q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
    }

    // micro-batch 1: one in-batch near-dup pair + one unique
    Seq(1L -> base, 2L -> base.replace(" mu", " nu"), 3L -> other)
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val after1 = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(1L, 3L), s"batch 1 survivors wrong: $after1")

    // micro-batch 2 (new files, SAME checkpoint → next batch id):
    // a near-dup of batch 1's survivor + something fresh
    Seq(10L -> base.replace("alpha ", "alpha2 "),
        11L -> "red orange yellow green blue indigo violet black white gray")
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val after2 = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1L, 3L, 11L), s"batch 2 survivors wrong: $after2")
  }

  test("streaming paragraph dedup: per-batch damage reports against state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("paradedupstream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    val state = dir.resolve("state").toString
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val pA = "alpha beta gamma delta epsilon zeta"
    val pB = "one two three four five six"
    val pC = "red orange yellow green blue indigo"
    val pD = "cat dog bird fish horse sheep"
    // j(pAnear, pA) = 0.6 < 0.8 — must SURVIVE the cross-batch check
    val pAnear = "alpha beta gamma delta epsilon eta"

    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .parquet(src.toString)
      val q = DedupStream.paragraphDedupStream(stream, "text", "doc_id",
        state, out, ckpt, paraTokens = 6, minTokens = 3, threshold = 0.8)
      val finished = q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
      assert(finished, "paragraph dedup stream still running after 120s")
    }

    // batch 1: doc 1 all-new; doc 2's first paragraph duplicates doc
    // 1's SECOND (earlier pid) in-batch
    Seq(1L -> s"$pA $pB", 2L -> s"$pB $pC")
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val b0 = spark.read.parquet(s"$out/batch=0")
      .select("doc_id", "n_paragraphs", "n_removed", "deduped_text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(b0(1L) === ((2L, 0L, s"$pA $pB")))
    assert(b0(2L) === ((2L, 1L, pC)))

    // batch 2: doc 3 loses pA to STATE (doc 1's survivor); doc 4 loses
    // pD in-batch to doc 3 but keeps its short exempt tail; doc 5's
    // near-miss (j = 0.6) survives while its pC copy falls to doc 2's
    // surviving paragraph in state
    Seq(3L -> s"$pA $pD", 4L -> s"$pD tail", 5L -> s"$pAnear $pC")
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val b1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "n_paragraphs", "n_removed", "deduped_text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(b1(3L) === ((2L, 1L, pD)))
    assert(b1(4L) === ((2L, 1L, "tail")))
    assert(b1(5L) === ((2L, 1L, pAnear)))
  }

  test("streaming paragraph dedup: near-dup of a REMOVED historical " +
      "paragraph survives (state holds survivor signatures only)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("paradedupremoved")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    val state = dir.resolve("state").toString
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    // 6-token paragraphs, 4 shingles each at k=3; threshold 0.5 so a
    // one-token edit (j = 3/5 = 0.6) near-dups while a two-token edit
    // (j = 2/6 = 1/3) does not
    val pX = "alpha beta gamma delta epsilon zeta"   // batch-1 survivor
    val pXn = "alpha beta gamma delta epsilon eta"   // removed by pX (0.6)
    val pYn = "omega beta gamma delta epsilon eta"   // 0.6 vs pXn, 1/3 vs pX

    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .parquet(src.toString)
      val q = DedupStream.paragraphDedupStream(stream, "text", "doc_id",
        state, out, ckpt, paraTokens = 6, minTokens = 3, threshold = 0.5)
      val finished = q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
      assert(finished, "paragraph dedup stream still running after 120s")
    }

    // batch 1: pXn falls to pX (j = 0.6 >= 0.5); state keeps pX only
    Seq(1L -> pX, 2L -> pXn)
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val b0 = spark.read.parquet(s"$out/batch=0")
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b0 === Map(1L -> 0L, 2L -> 1L), s"batch 1 wrong: $b0")

    // batch 2: pYn near-dups ONLY the REMOVED pXn — the batch face
    // (all history pairwise) would remove it; the incremental
    // convention (survivor signatures only) must KEEP it. This pins
    // the documented divergence in paragraphDedupIncremental's
    // scaladoc against silent refactors in either direction.
    Seq(3L -> pYn)
      .toDF("doc_id", "text").write.mode("append").parquet(src.toString)
    run()
    val b1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "n_removed", "deduped_text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(b1 === Map(3L -> ((0L, pYn))),
      s"dup-of-removed-historical paragraph must survive: $b1")
  }

  test("streaming embedding near-dup dedup: micro-batches against LSH state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("embdedupstream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    val state = dir.resolve("state").toString
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    def v(xs: Float*): Seq[Float] = xs

    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
        .parquet(src.toString)
      val q = DedupStream.embeddingDedupStream(stream, "vec_id", "embedding",
        state, out, ckpt)
      q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
    }

    // micro-batch 1: a near-dup pair + an orthogonal unique
    Seq(1L -> v(1f, 0.01f, 0f, 0f), 2L -> v(0.99f, 0.05f, 0.01f, 0f),
        3L -> v(0f, 1f, 0f, 0f))
      .toDF("vec_id", "embedding").write.mode("append").parquet(src.toString)
    run()
    val after1 = spark.read.parquet(out).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(1L, 3L), s"batch 1 survivors wrong: $after1")

    // micro-batch 2: near-dup of a state survivor + something fresh
    Seq(10L -> v(0.98f, 0.02f, 0.05f, 0f), 11L -> v(0f, 0f, 1f, 0f))
      .toDF("vec_id", "embedding").write.mode("append").parquet(src.toString)
    run()
    val after2 = spark.read.parquet(out).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1L, 3L, 11L), s"batch 2 survivors wrong: $after2")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = Files.createTempDirectory("dedupstream")
    val src = dir.resolve("src").toString
    val ev = eventsDf.limit(2000)
    // duplicate every event once (same event_id, same ts)
    ev.union(ev).write.parquet(src)

    val stream = spark.readStream.schema(ev.schema).parquet(src)
    val q = EventStream.dedupStream(stream.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT event_id FROM dedup_test")
    assert(got.count() == got.distinct().count(), "duplicates survived")
    assert(got.distinct().count() == ev.select("event_id").distinct().count())
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = Files.createTempDirectory("ssjoin")
    val ev = eventsDf.limit(5000).cache()
    val views = ev.filter(col("event_type") === "view")
    val acts = ev.filter(col("event_type") === "purchase")
    val vSrc = dir.resolve("v").toString; views.write.parquet(vSrc)
    val aSrc = dir.resolve("a").toString; acts.write.parquet(aSrc)

    val vStream = spark.readStream.schema(views.schema).parquet(vSrc)
    val aStream = spark.readStream.schema(acts.schema).parquet(aSrc)
    val q = EventStream.clickThroughJoin(vStream.toDF(), aStream.toDF(),
        "2 hours", "30 minutes")
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM ssjoin_test")
    val batch = EventStream.clickThroughJoin(views, acts, "2 hours", "30 minutes")
    assert(batch.count() > 0, "interval join matched nothing — test is vacuous")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    ev.unpersist()
  }

  test("stream-static broadcast enrichment equals the batch join, stream side unshuffled") {
    val dir = Files.createTempDirectory("enrich")
    val src = dir.resolve("src").toString
    eventsDf.write.parquet(src)
    // static dim: a per-user segment lookup
    val dim = eventsDf.select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(5))))

    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    val enriched = EventStream.enrichWithDim(stream, dim, Seq("user_id"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))

    val q = enriched.writeStream
      .format("memory").queryName("enrich_test")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM enrich_test")
    val batch = EventStream.enrichWithDim(eventsDf, dim, Seq("user_id"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // no match unenriched: every event has a user → no null segments
    assert(streamed.filter(col("segment").isNull).isEmpty)
    // the enrichment itself must be a broadcast join (batch plan proxy:
    // identical logical shape) — stream side never exchanges for it
    val p = EventStream.enrichWithDim(eventsDf, dim, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"enrichment not broadcast:\n$p")
  }

  test("inbox drain: valid items ingested, invalid dead-lettered") {
    val dir = Files.createTempDirectory("inbox")
    val inbox = dir.resolve("inbox"); Files.createDirectories(inbox)
    val objects = dir.resolve("objects"); Files.createDirectories(objects)
    val datasets = dir.resolve("datasets").toString
    val dead = dir.resolve("dead").toString

    Files.writeString(objects.resolve("sales.csv"),
      "id,amount\n1,10\n2,20\n3,30\n")
    Files.writeString(inbox.resolve("batch1.json"),
      """{"object_name": "sales.csv", "target_dataset_id": "ds1"}
        |{"object_name": "missing.csv", "target_dataset_id": "ds1"}
        |{"object_name": "sales.csv"}
        |this is not json
        |""".stripMargin)

    val q = IngestStream.start(spark, inbox.toString, objects.toString,
      datasets, dead, dir.resolve("ckpt").toString, drainOnce = true)
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$datasets/ds1/sales")
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("id", "amount"))

    val dl = spark.read.json(dead)
    assert(dl.count() == 2) // missing-field + malformed; FileNotFound acked
    val reasons = dl.select("reason").collect().map(_.getString(0)).toSet
    assert(reasons == Set("malformed json", "missing field"))
  }

  test("batch replay is idempotent: re-running a batch does not double rows") {
    val dir = Files.createTempDirectory("replay")
    val objects = dir.resolve("objects"); Files.createDirectories(objects)
    val datasets = dir.resolve("datasets").toString
    val dead = dir.resolve("dead").toString
    Files.writeString(objects.resolve("r.csv"), "k,v\n1,a\n2,b\n3,c\n")

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("object_name", StringType), StructField("target_dataset_id", StringType),
      StructField("_corrupt", StringType)))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("r.csv", "ds1", null)), 1), schema)

    IngestStream.processBatch(batch, objects.toString, datasets, dead, batchId = 7L)
    assert(spark.read.parquet(s"$datasets/ds1/r").count() == 3)
    // same batchId replays after a simulated crash-before-checkpoint:
    // the marker must prevent a second append
    IngestStream.processBatch(batch, objects.toString, datasets, dead, batchId = 7L)
    assert(spark.read.parquet(s"$datasets/ds1/r").count() == 3, "replay doubled rows")
    // a NEW batch delivering the same item is a genuine redelivery -> appends
    IngestStream.processBatch(batch, objects.toString, datasets, dead, batchId = 8L)
    assert(spark.read.parquet(s"$datasets/ds1/r").count() == 6)
  }

  test("dedupStream on a batch frame degrades to plain dropDuplicates") {
    val ev = eventsDf.limit(100)
    val out = EventStream.dedupStream(ev.union(ev), Seq("event_id"), "1 hour")
    assert(out.count() == ev.select("event_id").distinct().count())
  }

  test("checkpoint prevents reprocessing on restart") {
    val dir = Files.createTempDirectory("inbox2")
    val inbox = dir.resolve("inbox"); Files.createDirectories(inbox)
    val objects = dir.resolve("objects"); Files.createDirectories(objects)
    val datasets = dir.resolve("datasets").toString
    val dead = dir.resolve("dead").toString
    val ckpt = dir.resolve("ckpt").toString

    Files.writeString(objects.resolve("t.csv"), "k,v\n1,a\n2,b\n3,c\n")
    Files.writeString(inbox.resolve("b1.json"),
      """{"object_name": "t.csv", "target_dataset_id": "ds1"}""" + "\n")

    val q1 = IngestStream.start(spark, inbox.toString, objects.toString,
      datasets, dead, ckpt, drainOnce = true)
    q1.awaitTermination(120000)
    assert(spark.read.parquet(s"$datasets/ds1/t").count() == 3)

    // restart with same checkpoint: the processed file must NOT re-run
    // (WRITE_APPEND would double the rows if it did)
    val q2 = IngestStream.start(spark, inbox.toString, objects.toString,
      datasets, dead, ckpt, drainOnce = true)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$datasets/ds1/t").count() == 3)
  }

  test("streaming curation: the stateless filter chain matches batch exactly") {
    // redact + lang-ID + quality + mixture selection are all narrow
    // per-row expressions, so the SAME function curates a stream with
    // zero state - the shape a continuous-ingestion corpus filter runs
    import org.apache.spark.sql.DataFrame
    import graft.ext.{Sampling, Text}
    val dir = Files.createTempDirectory("curstream")
    val src = dir.resolve("src").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)

    def curate(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        Text.redactPii(col("text")).as("clean_text"),
        Text.langId(col("text")).as("lang"),
        Text.wordCount(col("text")).as("n_words"),
        Text.fingerprint(col("text")).as("fp"))
      .filter(col("n_words") >= 20 &&
        Sampling.mixtureKeep(col("fp"), col("lang"), Map("en" -> 500)))

    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = curate(stream).writeStream
      .format("memory").queryName("curate_stream")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM curate_stream")
    val batch = curate(docs)
    assert(streamed.count() > 0, "curation stream produced nothing")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("incremental anomaly flags converge to the one-shot batch result") {
    import graft.streaming.AnomalyStream
    import graft.ext.Stats
    val ev = eventsDf
    val state = Files.createTempDirectory("anomstate")
      .resolve("state").toString
    // split the feed on an arbitrary mid-stream timestamp: batch 2 also
    // ADDS events to days batch 1 already counted (the merge is an add,
    // not an overwrite — the case a naive state union would get wrong)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.6) p")
      .collect()(0).getDouble(0).toLong
    val b1 = ev.filter(unix_micros(col("ts")) <= cut)
    val b2 = ev.filter(unix_micros(col("ts")) > cut)
    assert(b1.count() > 0 && b2.count() > 0)
    AnomalyStream.applyBatch(b1, state, "event_type", "ts")
    val streamed = AnomalyStream.applyBatch(b2, state, "event_type", "ts")
    val oneShot = Stats.rollingAnomalies(ev, col("event_type"), col("ts"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "two-batch incremental flags must equal the one-shot batch flags")
  }

  test("incremental CUSUM converges to the one-shot batch result") {
    import graft.streaming.CusumStream
    import graft.ext.TimeSeries
    val ev = eventsDf
    val state = Files.createTempDirectory("cusumstate")
      .resolve("state").toString
    // same split contract as the anomaly stream: batch 2 ADDS value
    // mass to days batch 1 already aggregated
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5) p")
      .collect()(0).getDouble(0).toLong
    val b1 = ev.filter(unix_micros(col("ts")) <= cut)
    val b2 = ev.filter(unix_micros(col("ts")) > cut)
    assert(b1.count() > 0 && b2.count() > 0)
    val (k, h) = (BigDecimal("10.00"), BigDecimal("50.00"))
    CusumStream.applyBatch(b1, state, "event_type", "ts", "value", k, h)
    val streamed = CusumStream.applyBatch(b2, state, "event_type", "ts",
      "value", k, h)
    val oneShot = TimeSeries.cusum(ev, col("event_type"), col("ts"),
      col("value"), k, h)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "two-batch incremental CUSUM must equal the one-shot batch scores")
  }

  test("streaming proximity pairs: any batch split covers each pair once") {
    import graft.streaming.GeoStream
    import graft.ext.Geo
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0L until 150L).map(i =>
      (i, 40000000L + rnd.nextInt(200001).toLong,
        -74000000L + rnd.nextInt(200001).toLong))
    val all = rows.toDF("id", "lat_micro", "lon_micro")
    val r = 20000L
    val full = Geo.radiusPairs(all, r)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    val state = Files.createTempDirectory("geostate")
      .resolve("state").toString
    val batches = Seq(
      rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1),
      rows.filter(_._1 % 3 == 2))
    val reported = batches.flatMap { b =>
      GeoStream.applyBatch(b.toDF("id", "lat_micro", "lon_micro"),
          state, r)
        .select("id_a", "id_b").as[(Long, Long)].collect()
    }
    val canon = reported.map(p =>
      (math.min(p._1, p._2), math.max(p._1, p._2)))
    assert(canon.length === canon.toSet.size, "a pair reported twice")
    assert(canon.toSet === full,
      "three-batch streamed pairs must equal the one-shot pair set")
  }

  test("geo state migrates between ts-less and ts-bearing schemas") {
    import graft.streaming.{GeoStream, StateDir}
    import spark.implicits._
    val state = Files.createTempDirectory("geomig")
      .resolve("state").toString
    // batch 1: pre-aging schema (no ts) seeds the state
    GeoStream.applyBatch(
      Seq((1L, 40000000L, -74000000L)).toDF("id", "lat_micro", "lon_micro"),
      state, 10000L)
    // batch 2: aging enabled against the ts-less prior — before the
    // migration this threw AnalysisException on select("ts"); now the
    // prior rows get a null ts (aged as current) and survive
    val alerts = GeoStream.applyBatch(
      Seq((2L, 40001000L, -74000000L, 100L))
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(50L))
    assert(alerts.select("id_a", "id_b").as[(Long, Long)].collect()
      .toSet === Set((2L, 1L)), "migrated history must still pair")
    val st2 = StateDir.readPrior(spark, state).get
    assert(st2.columns.contains("ts"))
    assert(st2.count() === 2L, "null-ts migrated row must survive aging")
    // migrated rows got ts MATERIALIZED to the anchor (100), not left
    // null — a null ts would re-anchor to the advancing max forever.
    // (Asserted HERE: st2's lazy plan reads files the next batch's
    // state swap deletes.)
    assert(st2.filter(col("ts") === 100L).count() === 2L,
      "aging must materialize the null-ts anchor")
    // batch 3: a ts-LESS batch against ts-bearing state must not strip
    // ts from the persisted state (that would disable aging forever)
    GeoStream.applyBatch(
      Seq((3L, 40500000L, -74000000L)).toDF("id", "lat_micro", "lon_micro"),
      state, 10000L)
    val st3 = StateDir.readPrior(spark, state).get
    assert(st3.columns.contains("ts"),
      "ts column must survive a ts-less batch")
    assert(st3.count() === 3L)
    // one horizon later the migrated history actually EXPIRES: ts=200
    // batch with horizon 50 drops the ts=100 rows and the batch-3 row
    // (null ts, re-anchored to 200) survives
    GeoStream.applyBatch(
      Seq((4L, 41000000L, -74000000L, 200L))
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(50L))
    val st4 = StateDir.readPrior(spark, state).get
    assert(st4.select("id").as[Long].collect().toSet === Set(3L, 4L),
      "migrated rows must expire one horizon after their anchor")
  }

  test("geo redelivered ts-less batch collapses with its anchored copy") {
    import graft.streaming.{GeoStream, StateDir}
    import spark.implicits._
    val state = Files.createTempDirectory("georedeliver")
      .resolve("state").toString
    // batch 1 (ts-bearing) seeds state and enables aging
    GeoStream.applyBatch(
      Seq((1L, 40000000L, -74000000L, 100L))
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(1000L))
    // batch 2: a null-ts row (ts column present, value null — the
    // migrated/ts-less shape) — it anchors to the observed max
    val b2 = Seq((2L, 40001000L, -74000000L, Option.empty[Long]))
      .toDF("id", "lat_micro", "lon_micro", "ts")
    GeoStream.applyBatch(b2, state, 10000L, ageHorizon = Some(1000L))
    assert(StateDir.readPrior(spark, state).get.count() === 2L)
    // batch 2 REDELIVERED (at-least-once): the redelivered row enters
    // the merge with NULL ts — only after the anchor materializes is
    // it row-identical to its state copy (whose ts was anchored to the
    // max on first delivery), so the post-aging dedup must collapse
    // them. Before the fix this left TWO state rows for id 2 (each
    // pairing and alerting separately against future batches).
    GeoStream.applyBatch(b2, state, 10000L, ageHorizon = Some(1000L))
    val st = StateDir.readPrior(spark, state).get
    val rows = st.select("id").as[Long].collect().toSeq
    assert(rows.sorted === Seq(1L, 2L),
      s"redelivered ts-less row must not duplicate state: $rows")
    // a NEWER event advances max ts, then batch 2 is redelivered AGAIN:
    // the stale null-ts copy would now anchor to the NEW max (500), so
    // no row-level dedup could ever collapse it with the original
    // anchor (100) — only the null-ts-with-ts-bearing-twin anti-join
    // keeps state at one row per point here
    GeoStream.applyBatch(
      Seq((3L, 40500000L, -74000000L, 500L))
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(1000L))
    GeoStream.applyBatch(b2, state, 10000L, ageHorizon = Some(1000L))
    val st2 = StateDir.readPrior(spark, state).get
    val byId = st2.select("id", "ts").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byId.keySet === Set(1L, 2L, 3L) &&
      byId.forall(_._2.size == 1),
      s"late redelivery must not duplicate or re-anchor state: $byId")
    assert(byId(2L) === Seq(100L),
      s"id 2 must keep its ORIGINAL anchor, got ${byId(2L)}")
    // expiring-twin edge: a ts-less RE-SIGHTING whose only ts-bearing
    // copy expires in this very batch must keep the point alive
    // (anchored to the new max) — an anti-join against the raw twin
    // set would vanish the point in the same batch it was observed
    GeoStream.applyBatch(
      Seq((2L, 40001000L, -74000000L, Option.empty[Long]),
          (9L, 44000000L, -74000000L, Option(2000L)))
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(1000L))
    val st3 = StateDir.readPrior(spark, state).get
    val after = st3.select("id", "ts").as[(Long, Long)].collect().toMap
    assert(after.contains(2L),
      s"re-sighted point must survive its twin's expiry: $after")
    assert(after(2L) === 2000L,
      s"surviving re-sighting must anchor to the new max: $after")
  }

  test("geo aging with no observed event time keeps the migrated state") {
    import graft.streaming.{GeoStream, StateDir}
    import spark.implicits._
    val state = Files.createTempDirectory("geoempty")
      .resolve("state").toString
    // ts-less history, then aging enabled by an EMPTY ts-bearing batch
    // (the common first micro-batch after a restart): max(ts) is NULL,
    // and an unguarded age filter would silently wipe every migrated
    // row
    GeoStream.applyBatch(
      Seq((1L, 40000000L, -74000000L), (2L, 40500000L, -74000000L))
        .toDF("id", "lat_micro", "lon_micro"),
      state, 10000L)
    GeoStream.applyBatch(
      Seq.empty[(Long, Long, Long, Long)]
        .toDF("id", "lat_micro", "lon_micro", "ts"),
      state, 10000L, ageHorizon = Some(50L))
    assert(StateDir.readPrior(spark, state).get.count() === 2L,
      "no observed event time means nothing can be declared stale")
  }

  test("incremental shard deal composes across batches and stays balanced") {
    import graft.streaming.{ShardStream, StateDir}
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0L until 400L).map(i => (i, 1L + rnd.nextInt(200)))
    val state = Files.createTempDirectory("shardstate")
      .resolve("state").toString
    val placed = (0 until 4).flatMap { b =>
      ShardStream.applyBatch(
        rows.filter(_._1 % 4 == b).toDF("doc_id", "toks"),
        state, col("doc_id"), col("toks"), nShards = 5, batchId = b)
        .select("id", "toks", "shard").as[(Long, Long, Long)].collect()
    }
    // every doc placed exactly once, nothing moved
    assert(placed.map(_._1).sorted === rows.map(_._1).toArray)
    // state totals equal the placements' totals (composition)
    val st = StateDir.readGenBefore(spark, state, 4L).get
      .select("shard", "n_docs", "token_sum")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byShard = placed.groupBy(_._3).view
      .mapValues(ps => (ps.size.toLong, ps.map(_._2).sum)).toMap
    for ((sh, n, ts) <- st)
      assert(byShard(sh) === ((n, ts)), s"shard $sh totals drifted")
    // balance: each batch deals within one doc of B/n per shard and
    // sends the biggest docs to the emptiest shards — after four
    // comparable batches the gap stays within ~2 max docs
    val sums = st.map(_._3)
    assert(sums.max - sums.min <= 400L,
      s"shard token gap too wide: ${sums.toSeq}")
    // determinism: replaying the same batches into a fresh state
    // yields identical placements
    val state2 = Files.createTempDirectory("shardstate2")
      .resolve("state").toString
    val placed2 = (0 until 4).flatMap { b =>
      ShardStream.applyBatch(
        rows.filter(_._1 % 4 == b).toDF("doc_id", "toks"),
        state2, col("doc_id"), col("toks"), nShards = 5, batchId = b)
        .select("id", "toks", "shard").as[(Long, Long, Long)].collect()
    }
    assert(placed.toSet === placed2.toSet)
    // a wrong shard count against existing state fails loudly
    val e = intercept[IllegalArgumentException] {
      ShardStream.applyBatch(Seq((999L, 5L)).toDF("doc_id", "toks"),
        state, col("doc_id"), col("toks"), nShards = 3, batchId = 4L)
    }
    assert(e.getMessage.contains("shards"))
  }

  test("incremental packing continues BFD from open bins across batches") {
    import graft.streaming.{PackStream, StateDir}
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val S = 100L
    val rows = (0L until 240L).map(i =>
      (s"g${i % 2}", i, 1L + rnd.nextInt(150))) // ~1/3 oversize
    val state = Files.createTempDirectory("packstate")
      .resolve("state").toString
    val placed = (0 until 3).flatMap { b =>
      PackStream.applyBatch(
        rows.filter(_._2 % 3 == b).toDF("g", "doc_id", "toks"),
        state, col("g"), col("doc_id"), col("toks"), seqLen = S,
        batchId = b)
        .select("group", "doc_id", "toks", "bin", "n_bins")
        .as[(String, Long, Long, Long, Long)].collect()
    }
    // every doc placed exactly once
    assert(placed.map(_._2).sorted === rows.map(_._2).sorted.toArray)
    // capacity respected ACROSS batches (a full bin reopening, or an
    // open bin over-filled, would break this cumulative check)
    val binLoad = placed.filter(_._5 == 1L)
      .groupBy(p => (p._1, p._4)).view.mapValues(_.map(_._3).sum)
    assert(binLoad.values.forall(_ <= S),
      s"overfull bins: ${binLoad.filter(_._2 > S)}")
    // dedicated oversize ids never collide with small bins or each other
    val spans = placed.map(p => (p._1, p._4, p._4 + p._5)).sortBy(x => (x._1, x._2))
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sliding(2).foreach {
        case Seq(a, b) =>
          // disjoint, or the SAME shared small bin (identical span)
          assert(a._3 <= b._2 || (a._2 == b._2 && a._3 == b._3),
            s"bin span overlap: $a vs $b")
        case _ =>
      }
    }
    // state holds only OPEN bins (+1 counter row per group) — full
    // bins leave immediately, so state is bounded by open capacity
    val st = StateDir.readGenBefore(spark, state, 3L).get
      .select("g", "bin", "remaining", "kind")
      .as[(String, Long, Long, String)].collect()
    assert(st.filter(_._4 == "open").forall(_._3 > 0L))
    assert(st.count(_._4 == "ctr") === 2)
    val openBins = st.filter(_._4 == "open").map(r => (r._1, r._2)).toSet
    // an open bin's recorded remaining must equal S − its placed load
    for ((g, bin) <- openBins) {
      val rec = st.find(r => r._1 == g && r._2 == bin).get._3
      assert(rec === S - binLoad.getOrElse((g, bin), 0L),
        s"state remaining drifted for ($g, $bin)")
    }
    // deterministic replay into a fresh state
    val state2 = Files.createTempDirectory("packstate2")
      .resolve("state").toString
    val placed2 = (0 until 3).flatMap { b =>
      PackStream.applyBatch(
        rows.filter(_._2 % 3 == b).toDF("g", "doc_id", "toks"),
        state2, col("g"), col("doc_id"), col("toks"), seqLen = S,
        batchId = b)
        .select("group", "doc_id", "toks", "bin", "n_bins")
        .as[(String, Long, Long, Long, Long)].collect()
    }
    assert(placed.toSet === placed2.toSet)
  }

  test("crash-replayed micro-batches are idempotent for the capacity folds") {
    import graft.streaming.{PackStream, ShardStream, StateDir}
    import spark.implicits._
    // the shard/pack folds are neither idempotent nor commutative, so
    // replay safety comes from GENERATION-addressed state: a replayed
    // batch re-reads the untouched pre-batch generation and recomputes
    // the identical result — the foreachBatch redelivery window
    // (crash between state write and checkpoint commit)
    val sState = Files.createTempDirectory("shardreplay")
      .resolve("state").toString
    def shardBatch(b: Int) = ShardStream.applyBatch(
      (0L until 50L).filter(_ % 2 == b % 2).map(i => (i, 10L + i))
        .toDF("doc_id", "toks"),
      sState, col("doc_id"), col("toks"), nShards = 3, batchId = b)
      .select("id", "shard").as[(Long, Long)].collect().toSet
    val s0 = shardBatch(0)
    val s1 = shardBatch(1)
    val s1replay = shardBatch(1) // redelivery of batch 1
    assert(s1replay === s1, "replayed deal must be identical")
    val totals = StateDir.readGenBefore(spark, sState, 2L).get
      .select("token_sum").as[Long].collect().sum
    assert(totals === (0L until 50L).map(10L + _).sum,
      "replay must not double-count token mass")

    val pState = Files.createTempDirectory("packreplay")
      .resolve("state").toString
    def packBatch(b: Int) = PackStream.applyBatch(
      (0L until 30L).filter(_ % 2 == b % 2).map(i => ("g", i, 3L + i % 7))
        .toDF("g", "doc_id", "toks"),
      pState, col("g"), col("doc_id"), col("toks"), seqLen = 20L,
      batchId = b)
      .select("doc_id", "bin").as[(Long, Long)].collect().toSet
    val p0 = packBatch(0)
    val p1 = packBatch(1)
    assert(packBatch(1) === p1, "replayed packing must be identical")
    val load = (p0 ++ p1).toSeq
      .map(_._2).groupBy(identity).view.mapValues(_.size)
    val open = StateDir.readGenBefore(spark, pState, 2L).get
      .filter(col("kind") === "open")
      .select("bin", "remaining").as[(Long, Long)].collect().toMap
    assert(open.values.forall(r => r > 0 && r < 20L),
      s"replay corrupted open-bin capacities: $open; loads $load")
  }

  test("incremental packing: a NULL group folds state consistently") {
    import graft.streaming.{PackStream, StateDir}
    import spark.implicits._
    val S = 10L
    val state = Files.createTempDirectory("packnull")
      .resolve("state").toString
    // two batches into the null group: batch 2 must REFILL batch 1's
    // open bin — a plain (non-null-safe) state-fold join would leave
    // two inconsistent rows for bin 0 and over-fill it
    def b(bid: Long, rows: Seq[(Option[String], Long, Long)]) =
      PackStream.applyBatch(rows.toDF("g", "doc_id", "toks"),
        state, col("g"), col("doc_id"), col("toks"), seqLen = S,
        batchId = bid)
        .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val p1 = b(0L, Seq((None, 1L, 6L)))
    val p2 = b(1L, Seq((None, 2L, 4L), (None, 3L, 3L)))
    assert(p1(1L) === 0L)
    assert(p2(2L) === 0L, "the 4-token doc must refill bin 0 (rem 4)")
    assert(p2(3L) === 1L, "the 3-token doc no longer fits bin 0")
    val st = StateDir.readGenBefore(spark, state, 2L).get
      .filter(col("kind") === "open")
      .select("bin", "remaining").as[(Long, Long)].collect().toMap
    assert(st === Map(1L -> 7L), s"open-bin state drifted: $st")
  }

  test("proximity alert stream: readStream micro-batches, aged state, idempotent output") {
    import graft.streaming.{GeoStream, StateDir}
    import spark.implicits._
    val dir = Files.createTempDirectory("geostream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    val (state, out, ckpt) = (dir.resolve("state").toString,
      dir.resolve("out").toString, dir.resolve("ckpt").toString)
    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lat_micro",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lon_micro",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.LongType))))
        .parquet(src.toString)
      val q = GeoStream.proximityStream(stream, state, out, ckpt,
        radiusMicro = 10000L, ageHorizon = Some(100L))
      q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
    }
    // batch 1: two nearby points at ts 0 → one batch-internal alert
    Seq((1L, 40500000L, -73500000L, 0L), (2L, 40500100L, -73500000L, 0L))
      .toDF("id", "lat_micro", "lon_micro", "ts")
      .write.mode("append").parquet(src.toString)
    run()
    val a1 = spark.read.parquet(out).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(a1 === Set((1L, 2L)), s"batch-1 alerts: $a1")
    // batch 2 at ts 150: within radius of batch 1's points — but those
    // are now beyond the horizon (aged out after batch 2's merge they
    // are dropped; they were still state DURING batch 2's pairing, so
    // alerts against them fire this one last time)
    Seq((10L, 40500050L, -73500000L, 150L))
      .toDF("id", "lat_micro", "lon_micro", "ts")
      .write.mode("append").parquet(src.toString)
    run()
    // batch 3 at ts 300: same spot — batch-1 points are gone from
    // state, only id 10 remains to alert against
    Seq((20L, 40500060L, -73500000L, 300L))
      .toDF("id", "lat_micro", "lon_micro", "ts")
      .write.mode("append").parquet(src.toString)
    run()
    val all = spark.read.parquet(out).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(all.contains((20L, 10L)) && !all.contains((20L, 1L)) &&
      !all.contains((20L, 2L)),
      s"batch-3 must alert only against in-horizon history: $all")
    val stateIds = StateDir.readPrior(spark, state).get
      .select("id").as[Long].collect().toSet
    assert(stateIds === Set(20L), s"state must be horizon-bounded: $stateIds")
  }

  test("geo state ages out beyond the alert horizon; retained history still pairs") {
    import graft.streaming.{GeoStream, StateDir}
    import spark.implicits._
    val state = Files.createTempDirectory("geoage")
      .resolve("state").toString
    val horizon = 100L
    // batch epochs 0 / 150 / 300: with horizon 100, batch-1 points are
    // aged out of state before batch 3 arrives, batch-2 points are not
    def b(ids: Seq[Long], ts: Long) = ids.map(i =>
        (i, 40500000L + i * 3, -73500000L, ts))
      .toDF("id", "lat_micro", "lon_micro", "ts")
    GeoStream.applyBatch(b(Seq(1L, 2L), 0L), state, 10000L, Some(horizon))
    GeoStream.applyBatch(b(Seq(100L, 101L), 150L), state, 10000L,
      Some(horizon))
    // after batch 2 the merged max ts is 150 — batch-1 points (ts 0)
    // are beyond the horizon and must be gone from state
    val ids2 = StateDir.readPrior(spark, state).get
      .select("id").as[Long].collect().toSet
    assert(ids2 === Set(100L, 101L),
      s"batch-1 points must be aged out, state has $ids2")
    // batch 3 sits within radius of EVERYTHING — it must alert against
    // the retained batch-2 points only
    val pairs3 = GeoStream.applyBatch(b(Seq(200L), 300L), state, 10000L,
        Some(horizon))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs3 === Set((200L, 100L), (200L, 101L)),
      s"alerts must cover retained history only, got $pairs3")
    val ids3 = StateDir.readPrior(spark, state).get
      .select("id").as[Long].collect().toSet
    assert(ids3 === Set(200L), s"state must keep only in-horizon points: $ids3")
  }

  test("anomaly day-state compacts to the horizon and matches the windowed one-shot") {
    import graft.streaming.{AnomalyStream, StateDir}
    import graft.ext.Stats
    val ev = eventsDf
    val state = Files.createTempDirectory("anomage")
      .resolve("state").toString
    val h = 45
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5) p")
      .collect()(0).getDouble(0).toLong
    val b1 = ev.filter(unix_micros(col("ts")) <= cut)
    val b2 = ev.filter(unix_micros(col("ts")) > cut)
    AnomalyStream.applyBatch(b1, state, "event_type", "ts",
      horizonDays = Some(h))
    val streamed = AnomalyStream.applyBatch(b2, state, "event_type", "ts",
      horizonDays = Some(h))
    // state is bounded by the horizon
    val days = StateDir.readPrior(spark, state).get
      .select("day").distinct().count()
    assert(days <= h, s"state holds $days days > horizon $h")
    // the detector over retained days == the one-shot over the same
    // trailing window of the raw feed (all state derives from daily
    // counts, so equality is exact on every retained day)
    val maxDay = ev.agg(max(date_format(col("ts"), "yyyy-MM-dd")))
      .collect()(0).getString(0)
    val windowed = ev.filter(
      datediff(lit(maxDay), to_date(date_format(col("ts"), "yyyy-MM-dd")))
        < h)
    val oneShot = Stats.rollingAnomalies(windowed, col("event_type"),
      col("ts"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "compacted incremental flags must equal the windowed one-shot")
  }

  test("CUSUM day-state compacts to the horizon and matches the windowed one-shot") {
    import graft.streaming.{CusumStream, StateDir}
    import graft.ext.TimeSeries
    val ev = eventsDf
    val state = Files.createTempDirectory("cusumage")
      .resolve("state").toString
    val h = 45
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5) p")
      .collect()(0).getDouble(0).toLong
    val b1 = ev.filter(unix_micros(col("ts")) <= cut)
    val b2 = ev.filter(unix_micros(col("ts")) > cut)
    val (k, thr) = (BigDecimal("10.00"), BigDecimal("50.00"))
    CusumStream.applyBatch(b1, state, "event_type", "ts", "value", k, thr,
      horizonDays = Some(h))
    val streamed = CusumStream.applyBatch(b2, state, "event_type", "ts",
      "value", k, thr, horizonDays = Some(h))
    val days = StateDir.readPrior(spark, state).get
      .select("day").distinct().count()
    assert(days <= h, s"state holds $days days > horizon $h")
    val maxDay = ev.agg(max(date_format(col("ts"), "yyyy-MM-dd")))
      .collect()(0).getString(0)
    val windowed = ev.filter(
      datediff(lit(maxDay), to_date(date_format(col("ts"), "yyyy-MM-dd")))
        < h)
    val oneShot = TimeSeries.cusum(windowed, col("event_type"), col("ts"),
      col("value"), k, thr)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "compacted incremental CUSUM must equal the windowed one-shot")
  }
}
