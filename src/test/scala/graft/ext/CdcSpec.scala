package graft.ext

import graft.SparkSuite

class CdcSpec extends SparkSuite {

  import spark.implicits._

  test("latest version wins regardless of arrival order; deletes drop rows") {
    val feed = Seq(
      // pk 1: insert then update — update wins
      (1L, 2L, "update", Some("v2")),
      (1L, 1L, "insert", Some("v1")),
      // pk 2: full lifecycle ending in delete — absent from state
      (2L, 3L, "delete", None),
      (2L, 1L, "insert", Some("x")),
      (2L, 2L, "update", Some("y")),
      // pk 3: delete then REINSERT at a higher version — present again
      (3L, 2L, "delete", None),
      (3L, 3L, "insert", Some("back")),
      (3L, 1L, "insert", Some("orig"))
    ).toDF("pk", "version", "op", "payload")
    val out = Cdc.materialize(feed.repartition(7), "pk", "version", "op")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == ((2L, "update", "v2")))
    assert(out(3L) == ((3L, "insert", "back")))
  }

  test("incremental batches converge to the one-shot materialization; replay idempotent") {
    import graft.streaming.CdcStream
    val state = java.nio.file.Files.createTempDirectory("cdc")
      .resolve("state").toString
    val b1 = Seq(
      (1L, 1L, "insert", Some("a1")),
      (2L, 2L, "update", Some("b2")),   // update arrives BEFORE its insert
      (3L, 1L, "insert", Some("c1"))
    ).toDF("pk", "version", "op", "payload")
    val b2 = Seq(
      (2L, 1L, "insert", Some("b1")),   // late low version — must lose
      (3L, 2L, "delete", None),         // delete row 3
      (4L, 5L, "delete", None),         // tombstone before any insert
      (4L, 1L, "insert", Some("d1"))    // late insert under tombstone — must lose
    ).toDF("pk", "version", "op", "payload")

    CdcStream.applyBatch(b1, state, "pk", "version", "op")
    val vis = CdcStream.applyBatch(b2, state, "pk", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(vis == Map(1L -> "a1", 2L -> "b2"))

    // one-shot over the full feed agrees
    val oneShot = Cdc.materialize(b1.unionByName(b2), "pk", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(oneShot == vis)

    // crash-replay of batch 2: identical state, nothing resurrects
    val replay = CdcStream.applyBatch(b2, state, "pk", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(replay == vis)
  }

  test("tombstone compaction bounds state under churn without changing convergence") {
    import graft.streaming.CdcStream
    import org.apache.spark.sql.functions.col
    val horizon = Some(20L)
    def feedBatch(lo: Long, hi: Long) = {
      // churn workload: even versions insert pk = v/2; odd versions
      // delete it again unless pk % 4 == 0 (those update and stay
      // live) — live rows stay small while deletes pile up
      val rows = (lo until hi).map { v =>
        val pk = v / 2
        if (v % 2 == 0) (pk, v, "insert", Some(s"p$v"))
        else if (pk % 4 == 0) (pk, v, "update", Some(s"u$v"))
        else (pk, v, "delete", None)
      }
      rows.toDF("pk", "version", "op", "payload")
    }
    val stateC = java.nio.file.Files.createTempDirectory("cdcc")
      .resolve("state").toString
    val stateU = java.nio.file.Files.createTempDirectory("cdcu")
      .resolve("state").toString
    val batches = Seq(feedBatch(0, 50), feedBatch(50, 100), feedBatch(100, 150))
    var visC: Map[Long, String] = Map.empty
    var visU: Map[Long, String] = Map.empty
    for (b <- batches) {
      visC = CdcStream.applyBatch(b, stateC, "pk", "version", "op", horizon)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      visU = CdcStream.applyBatch(b, stateU, "pk", "version", "op")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    }
    // visible state identical with and without compaction, and equal to
    // the one-shot materialization of the full changelog
    assert(visC == visU)
    val oneShot = Cdc.materialize(batches.reduce(_ unionByName _),
        "pk", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(visC == oneShot)
    // state-size bound: uncompacted keeps all 56 tombstones, compacted
    // keeps only the 8 within the 20-version horizon of max version 149
    val tombC = spark.read.parquet(stateC)
      .filter(col("op") === "delete").count()
    val tombU = spark.read.parquet(stateU)
      .filter(col("op") === "delete").count()
    assert(tombU == 56, s"uncompacted tombstones: $tombU")
    assert(tombC == 8, s"compacted tombstones: $tombC")
    // late event BEHIND the horizon for a compacted-away tombstone pk:
    // with the retention contract honored this cannot happen; the bound
    // we assert is that events WITHIN the horizon still adjudicate
    val late = Seq((70L, 140L, "insert", Some("late-low")))
      .toDF("pk", "version", "op", "payload")
    val afterLate = CdcStream
      .applyBatch(late, stateC, "pk", "version", "op", horizon)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // pk 70's tombstone is version 141 (within horizon) — still wins
    assert(!afterLate.contains(70L))
  }

  test("state write survives a simulated mid-swap crash (backup restore)") {
    import graft.streaming.{CdcStream, StateDir}
    val base = java.nio.file.Files.createTempDirectory("cdccrash")
    val state = base.resolve("state").toString
    val b1 = Seq((1L, 1L, "insert", Some("a1")),
      (2L, 2L, "delete", None)).toDF("pk", "version", "op", "payload")
    CdcStream.applyBatch(b1, state, "pk", "version", "op")
    // simulate a crash after the live dir was moved aside but before
    // the new state was swapped in: live missing, __old present
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(state),
      new org.apache.hadoop.fs.Path(state + "__old")))
    // next read restores the backup; the interrupted batch replays
    val prior = StateDir.readPrior(spark, state)
    assert(prior.isDefined)
    val vis = CdcStream.applyBatch(b1, state, "pk", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(vis == Map(1L -> "a1"))
  }

  test("corrupted state directory fails loudly instead of resetting state") {
    import graft.streaming.CdcStream
    val state = java.nio.file.Files.createTempDirectory("cdcbad")
      .resolve("state")
    // a state dir that EXISTS but holds garbage must propagate the read
    // error — treating it as empty prior state would resurrect deletes
    java.nio.file.Files.createDirectories(state)
    java.nio.file.Files.write(state.resolve("part-00000.parquet"),
      "not a parquet file".getBytes)
    val batch = Seq((1L, 1L, "insert", Some("a1")))
      .toDF("pk", "version", "op", "payload")
    intercept[Exception] {
      CdcStream.applyBatch(batch, state.toString, "pk", "version", "op")
        .collect()
    }
  }
}
