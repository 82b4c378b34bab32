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
