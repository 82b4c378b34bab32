package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Boiler, Dedup, Graph}

/** Dev scaling harness (SURVEY.md §6): replicate the sf0.1 documents
  * corpus k× with offset ids (every doc gains k−1 EXACT clones — the
  * worst case for dedup hot keys) and measure the operators whose
  * skew/lineage behavior is argued in the scale notes:
  * chunkDedup (hot segment keys), removeBoilerplate (per-source hot
  * segments), and fixed-point pageRank over synthetic graphs of
  * growing node count (per-round lineage cuts). Not part of the driver
  * contract.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // diagnostic knob: SPARK_GRAFT_NO_BROADCAST=1 forces every join to
    // sort-merge (both the static and the AQE-runtime broadcast
    // thresholds) — isolates "runaway broadcast build" from genuine
    // shuffle volume when a section OOMs
    val noBcast = sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold",
        if (noBcast) "-1" else "10485760")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        if (noBcast) "-1" else "10485760")
      // AQE re-renders the EXPLAIN string on every plan update; a
      // deep chain whose cached stages nest (each InMemoryRelation
      // prints its full cached tree, multiplying) OOM'd the master
      // section in explainString — cap the string, not the plan
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.conf.Configuration", org.apache.logging.log4j.Level.OFF)

    // optional section filter: SPARK_GRAFT_SCALE_SECTIONS=span,linkage
    // runs only the named blocks (dev iteration; default all)
    val sections = sys.env.get("SPARK_GRAFT_SCALE_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
    def sec(name: String): Boolean = sections.forall(_.contains(name))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.catalog.clearCache()
    }

    // THE shared full-result probe (r19, after two in-round r18 probe
    // bugs): one aggregate that hashes EVERY output column of every
    // row — sum(xxhash64(struct(cols*))) — plus a count. A bare
    // count() (or a single-column sum) lets Catalyst ELIMINATE
    // unreferenced left-join-to-aggregate chains and unique-key joins
    // (measured: a 1.75 s fake vs the real 19.6 s on the full
    // sidecar), so every section routes through this instead of
    // hand-rolling its own probe aggregate. Returns the row count;
    // the hash column exists purely to force full evaluation.
    def probeDf(df: DataFrame): DataFrame =
      df.agg(
        coalesce(sum(xxhash64(struct(df.columns.map(col): _*))), lit(0L))
          .cast("bigint").as("s"),
        count(lit(1)).cast("bigint").as("n"))
    def probeAll(df: DataFrame): Long = probeDf(df).head().getLong(1)

    // shuffle-write accounting for the span-dedup key-representation
    // comparison: a listener sums bytesWritten per completed stage.
    // Listener delivery is async — the short drain sleep is fine for a
    // dev harness (stages complete well before the job-end returns).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            shuffleBytes.addAndGet(
              te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def timeShuffle(label: String)(f: => Long): Unit = {
      Thread.sleep(500); shuffleBytes.set(0)
      val t0 = System.nanoTime(); val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[scale] $label: $secs%.2f s ($rows rows, " +
        f"${shuffleBytes.get / 1048576.0}%.1f MiB shuffled)")
      spark.catalog.clearCache()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source")).cache()
    val nDocs = docs.count()

    /** k exact clones per doc, ids offset so they stay distinct;
      * repartitioned so the clone explosion is spread across cores, not
      * nested inside one input split.
      */
    def cloned(k: Int): DataFrame = docs
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("doc_id") * 1000 + col("rep")).as("doc_id"),
        col("text"), col("source"))
      .repartition(cpus.toInt)

    if (sec("docs")) for (k <- Seq(10, 40, 100)) {
      val n = nDocs * k
      time(s"chunkDedup ${n} docs (x$k clones)") {
        Dedup.chunkDedup(cloned(k), "text", "doc_id", 20).count()
      }
      time(s"removeBoilerplate ${n} docs (x$k clones)") {
        Boiler.removeBoilerplate(cloned(k), "text", "doc_id", "source",
          20, 2).count()
      }
    }

    // pageRank over synthetic deterministic graphs: 10 out-edges per
    // node, weights 1..3, node count grows 10x across rows
    if (sec("pagerank")) for (n <- Seq(50000L, 200000L, 500000L)) {
      val edges = spark.range(n).select(col("id").as("src"))
        .crossJoin(spark.range(10).select(col("id").as("j")))
        .select(col("src"),
          pmod(col("src") * 7 + col("j") * 1231, lit(n)).as("dst"),
          (col("j") % 3 + 1).cast("double").as("w"))
        .filter(col("src") =!= col("dst"))
      time(s"pageRank ${n} nodes / ${n * 10} edges (10 iters)") {
        Graph.pageRank(edges, "src", "dst", "w").count()
      }
    }

    // triangle counting over the SYMMETRIZED versions of the same
    // graphs: oriented out-degree stays ~10, so wedge fan-out per node
    // is constant while node count grows 10x
    if (sec("triangles")) for (n <- Seq(50000L, 200000L, 500000L)) {
      val fwd = spark.range(n).select(col("id").as("src"))
        .crossJoin(spark.range(10).select(col("id").as("j")))
        .select(col("src"),
          pmod(col("src") * 7 + col("j") * 1231, lit(n)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      time(s"triangleCount ${n} nodes / ~${n * 20} directed edges") {
        Graph.triangleCount(sym, "src", "dst").collect()(0).getLong(2)
      }
    }

    // perceptual-hash near-dup pairs: real PNG encode+decode per image;
    // mod = n/5 keeps duplicate-bucket size constant (~5), so the
    // OUTPUT stays linear while the image count grows 10x (quadratic
    // output under fixed mod is semantic, not an operator defect)
    if (sec("phash")) for (n <- Seq(5000L, 20000L, 50000L)) {
      val ids = spark.range(n).select(col("id").as("doc_id"))
        .repartition(cpus.toInt)
      time(s"phashPairs ${n} real PNGs (bucket ~5)") {
        graft.ext.Multimodal.phashPairs(
          graft.ext.Multimodal.withDHash(
            graft.ext.Multimodal.withSyntheticPngKeyed(
              ids, "doc_id", (n / 5).toInt), "id"), 3).count()
      }
    }

    // basket rules on replicated lineitem (offset orderkeys): basket
    // size constant, transaction count grows -> pair volume linear
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).cache()
    li.count()
    if (sec("basket")) for (k <- Seq(1, 4, 10)) {
      val rep = li
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("l_orderkey") * 16 + col("rep")).as("txn"),
          col("l_partkey").as("item"))
        .repartition(cpus.toInt)
      time(s"basket rules x$k lineitem (${k * 600}k rows)") {
        graft.ext.Basket.associationRules(rep, col("txn"), col("item"),
          minSupport = 2L).count()
      }
    }

    // record linkage (round 7): the operator's failure mode is blocked-
    // join skew — pairs per block are quadratic in block size. Two
    // regimes: (a) replication SALTS the block key (blocks grow with
    // data, block size constant) -> runtime should scale ~linearly;
    // (b) replication keeps the SAME 125 (nation, segment) blocks (hot
    // blocks) -> pair count grows k², and runtime must track the OUTPUT
    // (pairs scored), not degrade worse than it
    graft.plans.GraftExtensions.ensure(spark) // jaro_winkler
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment")).cache()
    val nCust = cust.count()
    val linkRules = Seq(
      ext.Linkage.FieldRule("name", org.apache.spark.sql.functions
        .call_function("jaro_winkler", col("a.c_name"), col("b.c_name"))
        >= 0.92, 0.95, 0.01),
      ext.Linkage.FieldRule("bal_close",
        abs(col("a.c_acctbal") - col("b.c_acctbal")) <= 10.0, 0.90, 0.02))
    def custRep(k: Int, salt: Boolean): DataFrame = cust
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("c_custkey") * 64 + col("rep")).as("c_custkey"),
        col("c_name"),
        (if (salt) col("c_nationkey") + col("rep") * 100
         else col("c_nationkey")).as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .repartition(cpus.toInt)
    if (sec("linkage")) for (k <- Seq(4, 16, 40)) {
      time(s"linkage x$k salted blocks (${nCust * k} recs, size-constant)") {
        ext.Linkage.scorePairs(custRep(k, salt = true), "c_custkey",
          Seq("c_nationkey", "c_mktsegment"), linkRules, 8.0, 0.0).count()
      }
    }
    if (sec("linkage")) for (k <- Seq(2, 4)) {
      time(s"linkage x$k HOT blocks (${nCust * k} recs, pairs ~k^2)") {
        ext.Linkage.scorePairs(custRep(k, salt = false), "c_custkey",
          Seq("c_nationkey", "c_mktsegment"), linkRules, 8.0, 0.0).count()
      }
    }

    // ROC-AUC / Kaplan-Meier (round 7): both reduce events to one row
    // per distinct score/duration FIRST (map-side combinable), then
    // window over that bounded set — replication multiplies the scan
    // but not the window, so runtime should grow sublinearly in k
    val ev = graft.queries.H.t(spark, sfDir, "events")
      .select(col("value"), col("event_type")).cache()
    ev.count()
    if (sec("stats")) for (k <- Seq(10, 40, 100)) {
      val rep = ev.crossJoin(spark.range(k).select(col("id").as("rep")))
        .repartition(cpus.toInt)
      time(s"rocAuc x$k events") {
        ext.Stats.rocAuc(rep, col("value"),
          col("event_type") === "purchase").count()
      }
      time(s"kaplanMeier x$k events") {
        ext.Stats.kaplanMeier(rep,
          col("value").cast("long") % 30, col("event_type") === "error")
          .count()
      }
    }

    // spanDedup (round 7): window-index amplification is the risk —
    // len−span+1 rows per doc, every one an exact clone's hot key under
    // k× replication. The first-occurrence min-agg must map-side
    // combine those 100×-hot window keys just like chunkDedup's
    // segments; removal-position explosion tracks output damage (every
    // clone fully excised), so runtime should track corpus size, not
    // candidate pairs.
    // both key representations at each k: the fingerprint variant's
    // claim is the same wall-clock shape with the corpus-wide
    // first-occurrence shuffle shrunk from window TEXT to 8-byte keys.
    // NOT .count(): a bare count lets Catalyst eliminate the final
    // unique-key left join AND prune the re-assembly aggregate — the
    // r07 span row measured that pruned plan, not the operator.
    // probeAll forces every column of every row.
    if (sec("span")) for (k <- Seq(10, 40, 100)) {
      val n = nDocs * k
      timeShuffle(s"spanDedup TEXT keys ${n} docs (x$k clones)") {
        probeAll(Dedup.spanDedup(cloned(k), "text", "doc_id", 10))
      }
      timeShuffle(s"spanDedup FP keys ${n} docs (x$k clones)") {
        probeAll(Dedup.spanDedupHashed(cloned(k), "text", "doc_id", 10))
      }
    }

    // embedding LSH dedup (round 8): replicated vectors are EXACT
    // clones (cosine 1.0) of their originals — every clone group lands
    // in identical band buckets, the hot-bucket worst case for banding.
    // Verified-pair output grows ~k² per original near-dup group
    // (semantic damage), so runtime must track the OUTPUT pair count,
    // not degrade worse than it; the Hamming prefilter rejects nothing
    // inside clone groups (distance 0) and everything still verifies.
    val embSc = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val nEmb = embSc.count()
    if (sec("lsh")) for (k <- Seq(2, 4, 8)) {
      val rep = embSc
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("vec_id") * 64 + col("rep")).as("vec_id"),
          col("embedding"))
        .repartition(cpus.toInt)
      timeShuffle(s"cosineLshPairs x$k vectors (${nEmb * k} vecs, pairs ~k^2)") {
        graft.ext.Similarity.cosineLshPairs(rep, "vec_id", "embedding",
          threshold = 0.45).count()
      }
      timeShuffle(s"lshIncremental split x$k (${nEmb * k} vecs)") {
        graft.ext.Similarity.cosineLshAgainstHistory(
          rep.filter(col("vec_id") % 2 === 1),
          rep.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", threshold = 0.45).count()
      }
    }

    // grid-bucketed radius join: point count grows 10x with the radius
    // shrunk ~1/sqrt(n) so expected NEIGHBORS PER POINT stay constant —
    // the production sizing rule (radius-sized cells => candidate
    // volume tracks the OUTPUT, not n^2). The hot row parks 1% of the
    // points on ONE coordinate: a k^2 pair blowup inside a single cell
    // that runtime must absorb as output rows, not as a stuck task.
    if (sec("geo")) {
      for ((n, r) <- Seq((100000L, 4000L), (400000L, 2000L),
          (1000000L, 1200L))) {
        val pts = graft.ext.Geo.syntheticPoints(
          spark.range(n).select(col("id").as("c_custkey")), "c_custkey")
          .repartition(cpus.toInt)
        timeShuffle(s"geo radiusPairs $n pts r=$r") {
          graft.ext.Geo.radiusPairs(pts, r).count()
        }
      }
      val n = 100000L
      val base = graft.ext.Geo.syntheticPoints(
        spark.range(n).select(col("id").as("c_custkey")), "c_custkey")
      val hot = base.select(col("id"),
        when(col("id") % 100 === 0, lit(40500000L))
          .otherwise(col("lat_micro")).as("lat_micro"),
        when(col("id") % 100 === 0, lit(-73500000L))
          .otherwise(col("lon_micro")).as("lon_micro"))
        .repartition(cpus.toInt)
      timeShuffle(s"geo radiusPairs $n pts, 1% in ONE hot cell") {
        graft.ext.Geo.radiusPairs(hot, 4000L).count()
      }
    }

    // geodesic polar cap (round 11): three regimes of the cap-band
    // design. (1) mid-latitude corpus — the polar leg's collar filter
    // must make it FREE (no polar points, no candidates); (2) a corpus
    // straddling the 66° band limit — trans-band + polar pairs must
    // stay output-bound; (3) near-pole all-longitude rings — the
    // deliberately-coarse one-lon-cell cap makes candidates QUADRATIC
    // in each ring's own population (the documented trade: cap data is
    // sparse in practice, and the ring is tiny in ground area), so the
    // measurement pins the constant rather than pretending it away.
    if (sec("geopolar")) {
      def pts(n: Long): DataFrame = graft.ext.Geo.syntheticPoints(
        spark.range(n).select(col("id").as("c_custkey")), "c_custkey")
      for (n <- Seq(400000L, 1000000L)) {
        val p = pts(n).repartition(cpus.toInt)
        timeShuffle(s"geoPolar mid-lat $n pts r=100m (cap EMPTY)") {
          graft.ext.Geo.radiusPairsGeodesic(p, 100.0).count()
        }
      }
      for (n <- Seq(100000L, 400000L)) {
        val p = pts(n).select(col("id"),
          (col("lat_micro") + lit(25500000L)).as("lat_micro"),
          col("lon_micro")).repartition(cpus.toInt)
        timeShuffle(s"geoPolar band-straddling $n pts r=200m (~half polar)") {
          graft.ext.Geo.radiusPairsGeodesic(p, 200.0).count()
        }
        // the sizing-rule counterpart: the SAME dense 65.5–66.5° corpus
        // with the band declared at 70° — nothing lands in the cap, the
        // cos-sized lon cells (≈1.17× wider than a 66° band's) carry
        // everything, and the ring-quadratic cost disappears. This pair
        // of rows IS the documented knob: dense high-lat data belongs
        // INSIDE the declared band; the cap holds sparse residue.
        timeShuffle(s"geoPolar band-straddling $n pts r=200m (band at 70)") {
          graft.ext.Geo.radiusPairsGeodesic(p, 200.0,
            maxAbsLatMicro = 70000000L).count()
        }
      }
      for (n <- Seq(20000L, 50000L)) {
        // lat ∈ [89.9°, 90°], lon spread over the full circle: every
        // meridian converges, so far-lon pairs are real and the ring
        // cell must span all longitudes
        val p = pts(n).select(col("id"),
          (lit(89900000L) + (col("lat_micro") - lit(40000000L)) / lit(10))
            .cast("long").as("lat_micro"),
          ((col("lon_micro") + lit(74000000L)) * lit(360) - lit(180000000L))
            .cast("long").as("lon_micro")).repartition(cpus.toInt)
        timeShuffle(s"geoPolar near-pole $n pts r=50m (ring-quadratic)") {
          graft.ext.Geo.radiusPairsGeodesic(p, 50.0).count()
        }
      }
    }

    // time-series detectors over synthetic (group × day) panels: group
    // count grows 10x at fixed series length — per-group windows and
    // the O(days²) trend pair-join must scale linearly in GROUPS. The
    // deterministic value mixes a trend + weekly wave so nothing
    // degenerates.
    if (sec("ts")) for (g <- Seq(1000L, 10000L, 100000L)) {
      val days = 365
      val panel = spark.range(g).select(col("id").as("grp"))
        .crossJoin(spark.range(days).select(col("id").as("d")))
        .select(concat(lit("g"), col("grp")).as("g"),
          expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, cast(d as int))").as("ts"),
          ((col("grp") * 7 + col("d") * 13) % 1000 + col("d") % 7 * 50)
            .cast("double").as("v"))
        .repartition(cpus.toInt)
      timeShuffle(s"ts cusum $g groups x $days days") {
        graft.ext.TimeSeries.cusum(panel, col("g"), col("ts"), col("v"),
          BigDecimal("50.00"), BigDecimal("200.00")).count()
      }
      // the trend pair fan-out is g·days²/2 rows through the slope-rank
      // sort — a genuinely pair-bound stage. Capacity measured on this
      // box (48 g heap, local[32]): 66M pairs (1k×365) in ~14 s;
      // 200M (3k×365, below) stays group-linear; 664M (10k×365) OOMs
      // the single-JVM sort — an executors-scale workload. Since r09
      // the OPERATOR sizes partitions ∝ pairs itself (≈3M rows/task,
      // trendTest.maxPairsPerTask) — these rows exercise exactly that
      // self-sizing, no conf juggling here anymore.
      if (g == 1000L) {
        val g3 = 3000L
        val panel3 = spark.range(g3).select(col("id").as("grp"))
          .crossJoin(spark.range(days).select(col("id").as("d")))
          .select(concat(lit("g"), col("grp")).as("g"),
            expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, cast(d as int))").as("ts"),
            ((col("grp") * 7 + col("d") * 13) % 1000 + col("d") % 7 * 50)
              .cast("double").as("v"))
          .repartition(cpus.toInt)
        for ((gg, p) <- Seq((g, panel), (g3, panel3))) {
          timeShuffle(s"ts trendTest $gg groups x $days days " +
            s"(${gg * days * (days - 1) / 2} pairs, operator-sized tasks)") {
            graft.ext.TimeSeries.trendTest(p, col("g"), col("ts"),
              col("v")).count()
          }
        }
      }
    }

    // margin mining (round 9): exact-clone replication is again the
    // hot-bucket worst case — every clone of a B-side vector lands in
    // the same IVF bucket and ties for the same mutual-best slots.
    // The IVF face's candidate volume must track probed buckets
    // (~nprobe/nlist of B per anchor), not |A|x|B|.
    if (sec("margin")) for (k <- Seq(2, 4, 8)) {
      val rep = embSc
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("vec_id") * 64 + col("rep")).as("vec_id"),
          col("embedding"))
        .repartition(cpus.toInt)
      timeShuffle(s"marginPairsIvf x$k (${nEmb * k} vecs)") {
        graft.ext.Similarity.marginPairsIvf(
          rep.filter(col("vec_id") % 2 === 0),
          rep.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, threshold = 1.0).count()
      }
    }

    // int8 embedding-dedup state (round 9): the SAME batch folded into
    // a float32 state vs an int8-quantized state (scale 127 — the
    // normalized-embedding regime). The claim is the ~4× state-size
    // cut with identical survivor decisions; runtimes should match
    // (dequantization is one narrow map on the history leg).
    if (sec("int8state")) {
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists) 0L
        else d.listFiles.filter(_.isFile).map(_.length).sum
      }
      val rep = embSc
        .crossJoin(spark.range(4).select(col("id").as("rep")))
        .select((col("vec_id") * 64 + col("rep")).as("vec_id"),
          col("embedding"))
        .repartition(cpus.toInt)
      val tmp = java.nio.file.Files.createTempDirectory("int8state")
      val (fState, qState) =
        (tmp.resolve("f").toString, tmp.resolve("q").toString)
      var (fSurv, qSurv) = (0L, 0L)
      timeShuffle(s"lshIncremental float32 state (${nEmb * 4} vecs)") {
        fSurv = graft.ext.Similarity.cosineLshIncremental(rep, "vec_id",
          "embedding", fState, threshold = 0.45).count(); fSurv
      }
      timeShuffle(s"lshIncremental int8 state (${nEmb * 4} vecs)") {
        qSurv = graft.ext.Similarity.cosineLshIncremental(rep, "vec_id",
          "embedding", qState, threshold = 0.45,
          int8Scale = Some(127.0)).count(); qSurv
      }
      println(f"[scale] int8 state: ${dirBytes(fState) / 1048576.0}%.1f MiB " +
        f"float vs ${dirBytes(qState) / 1048576.0}%.1f MiB int8 " +
        f"(survivors $fSurv vs $qSurv)")
    }

    // selection operators (round 10): clone replication again — the
    // r09 scale-note claims under measurement: dsirSelect's two bucket
    // models aggregate into a key space of `buckets` (256, broadcast-
    // sized) so wall time must track the NARROW gram explode (linear
    // in corpus), never the model size; shardAssign is one range-
    // partitioned global rank (the exchange IS the cost — everything
    // after is O(nShards)); langSegments is a narrow per-doc block
    // explode + per-doc windows; packBestFit (r10) sorts within each
    // source shard — shuffle is one partition-by-group exchange.
    if (sec("select")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      timeShuffle(s"dsirSelect x$k (${nDocs * k} docs)") {
        graft.ext.Sampling.dsirSelect(rep, "text", "doc_id",
          col("source").isin("src0", "src1"), k = 50,
          buckets = 256).count()
      }
      timeShuffle(s"shardAssign x$k (${nDocs * k} docs)") {
        graft.ext.Sampling.shardAssign(rep, col("doc_id"),
          size(split(col("text"), " ")).cast("long"), nShards = 64)
          .count()
      }
      timeShuffle(s"langSegments x$k (${nDocs * k} docs)") {
        graft.ext.Text.langSegments(rep, "text", "doc_id",
          window = 20).count()
      }
      timeShuffle(s"packBestFit x$k (${nDocs * k} docs)") {
        graft.ext.Sampling.packBestFit(rep, col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long"), seqLen = 2048)
          .count()
      }
    }

    // paragraph dedup (round 12): clone replication is the WORST case —
    // every paragraph gains k−1 exact twins, so the band join's bucket
    // keys go maximally hot and the removal set is ~the whole corpus
    // minus one copy per paragraph. The shape claim under test: band
    // equi-join candidates stay output-bound (duplicate GROUPS grow as
    // k·groups, candidate pairs per bucket as k², but k² pairs of
    // k-sized clone groups is exactly the true-pair volume — no
    // wasted candidates), and the damage report aggregates partially.
    // NOT .count(): the damage left-join is row-preserving (removed is
    // pid-distinct), so Catalyst ELIMINATES the whole LSH subtree from
    // a bare count — sum(n_removed) forces the real computation and its
    // value doubles as a correctness invariant (every clone's
    // paragraphs minus the one surviving copy per group)
    if (sec("paradedup")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      timeShuffle(s"paragraphDedup x$k (${nDocs * k} docs)") {
        probeAll(graft.ext.Dedup.paragraphDedup(rep, "text", "doc_id"))
      }
    }

    // master-recipe capstone (round 15): the FULL x_pipeline_master
    // chain — the SAME shared builder the registered query runs
    // (ExtK.masterStages) — per-stage wall-clock + shuffle volume at
    // clone replication. Clone replication exercises the ladder's
    // self-protection: paragraph dedup (stage 6) excises every clone's
    // paragraphs corpus-wide (earlier-occurrence-wins), so clones reach
    // stage 7 as EMPTY texts and the whole-doc pass sees ~the original
    // corpus — the quadratic-output worst case for whole-doc dedup is
    // structurally absorbed by the stage before it. Stages 0–6 carry
    // the ×k volume and must scale like their standalone sections
    // (rank, span, paradedup). lapShuffle ≠ timeShuffle: stage caches
    // must SURVIVE until the chain ends, so the cache clear happens
    // once per k. Stage 7 is additionally measured on BOTH faces over
    // the same paragraph-deduped input: exact AllPairs (inside the
    // chain) vs the minhashLshPairs production face (after it).
    def lapShuffle(label: String)(f: => Long): Unit = {
      Thread.sleep(500); shuffleBytes.set(0)
      val t0 = System.nanoTime(); val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[scale] $label: $secs%.2f s ($rows rows, " +
        f"${shuffleBytes.get / 1048576.0}%.1f MiB shuffled)")
    }
    // optional k filter for the master section (dev iteration — one
    // replication factor per invocation fits a bounded runner window):
    // SPARK_GRAFT_SCALE_MASTER_KS=100 or 10,40
    val masterKs = sys.env.get("SPARK_GRAFT_SCALE_MASTER_KS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10, 40, 100))
    if (sec("master")) for (k <- masterKs) {
      // clone only the CORPUS slice (doc_id >= 20); the eval set keeps
      // its original ids. The earlier doc_id*1000+rep remap over ALL
      // docs left only doc 0's first 20 clones under masterStages'
      // eval threshold and leaked the other eval docs' clones into the
      // training corpus, so the benched decontaminate stage ran
      // against a 20-identical-doc eval set instead of the one-shot
      // shape. Corpus ids *1000 start at 20000, safely above 20.
      val baseK = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"), col("lang"))
      val allK = baseK.filter(col("doc_id") < 20)
        .unionByName(baseK.filter(col("doc_id") >= 20)
          .crossJoin(spark.range(k).select(col("id").as("rep")))
          .select((col("doc_id") * 1000 + col("rep")).as("doc_id"),
            col("text"), col("source"), col("lang")))
        .repartition(cpus.toInt).cache()
      allK.count()
      // the eager paragraph excision runs BETWEEN pins (during stage
      // construction), so each lap also reports the build gap since
      // the previous pin ended — that gap IS the paragraph cost on
      // the paragraph_dedup row
      var lastPinEnd = System.nanoTime()
      // suffixSpan8 = true mirrors the registered flagship since the
      // r18 default flip (stage 8 = the exact-first suffix excision)
      val (stages, bins) = graft.queries.ExtK.masterStages(allK,
        lshWholeDoc = false,
        (name, df) => {
          val gap = (System.nanoTime() - lastPinEnd) / 1e9
          var c: DataFrame = null
          lapShuffle(s"master x$k $name" +
              (if (gap > 1) f" (+$gap%.1f s build)" else "")) {
            c = df.cache(); c.count()
          }
          lastPinEnd = System.nanoTime()
          c
        },
        suffixSpan8 = true)
      lapShuffle(s"master x$k pack") { bins.collect()(0).getLong(0) }
      // stage-7 face comparison on the SAME representative set the
      // chain dedups (exact-first collapse — identical-text clones
      // are one rep each, so both faces see distinct content only)
      val reps = graft.queries.ExtK
        .wholeDocReps(stages.find(_.name == "paragraph_dedup").get.df)
        .cache()
      val nReps = reps.count()
      lapShuffle(s"master x$k wholedoc exact pairs ($nReps reps)") {
        Dedup.ngramJaccardPairs(reps, "text", "doc_id", 3, 0.5).count()
      }
      lapShuffle(s"master x$k wholedoc LSH pairs ($nReps reps)") {
        Dedup.minhashLshPairs(reps, "text", "doc_id", 3, 0.5).count()
      }
      // stage-7 key-representation comparison (r16): the digest-keyed
      // collapse + member re-join vs the raw-text-keyed shape it
      // replaced (the r15 verdict's one `weak` — both exchanges used
      // to carry the document BODY as the shuffle key)
      val t6k = stages.find(_.name == "paragraph_dedup").get.df
      lapShuffle(s"master x$k stage7 collapse+members DIGEST keys") {
        val r = Dedup.wholeDocReps(t6k, "text", "doc_id")
        t6k.select(col("doc_id"),
            sha2(col("text").cast("binary"), 256).as("text_digest"))
          .join(r.select(col("text_digest"), col("doc_id").as("rep_id")),
            "text_digest")
          .filter(col("doc_id") =!= col("rep_id")).count()
      }
      lapShuffle(s"master x$k stage7 collapse+members RAW-TEXT keys") {
        val r = t6k.groupBy(col("text")).agg(min(col("doc_id")).as("rep_id"))
        t6k.select(col("doc_id"), col("text")).join(r, "text")
          .filter(col("doc_id") =!= col("rep_id")).count()
      }
      spark.catalog.clearCache()
    }

    // digest- vs raw-text-keyed collapse on LONG documents (r16): the
    // master-chain probe above runs AFTER paragraph dedup has already
    // collapsed clone mass to short residuals, so both key shapes look
    // cheap there — this section measures the same collapse + member
    // re-join on the RAW cloned corpus (full-length texts), which is
    // what stage 7 would see WITHOUT the ladder's protection and what
    // any library caller of nearDupDropExactFirst sees on arbitrary
    // input. The raw face ships the document BODY as both exchanges'
    // key; the digest face ships 64 hex chars + ids on the member side.
    if (sec("digestkeys")) for (k <- Seq(10, 100)) {
      val rep = cloned(k).select(col("doc_id"), col("text"))
        .repartition(cpus.toInt).cache()
      val n = rep.count()
      lapShuffle(s"digestkeys x$k DIGEST collapse+members ($n docs)") {
        val r = Dedup.wholeDocReps(rep, "text", "doc_id")
        rep.select(col("doc_id"),
            sha2(col("text").cast("binary"), 256).as("text_digest"))
          .join(r.select(col("text_digest"), col("doc_id").as("rep_id")),
            "text_digest")
          .filter(col("doc_id") =!= col("rep_id")).count()
      }
      lapShuffle(s"digestkeys x$k RAW-TEXT collapse+members ($n docs)") {
        val r = rep.groupBy(col("text")).agg(min(col("doc_id")).as("rep_id"))
        rep.select(col("doc_id"), col("text")).join(r, "text")
          .filter(col("doc_id") =!= col("rep_id")).count()
      }
      spark.catalog.clearCache()
    }

    // perplexity/rank path (round 12): perplexityBuckets rides
    // globalRowNumber — a RANGE-partitioned total order (sample →
    // range exchange → per-partition row_number + offset), never a
    // single-partition Window. The rank exchange is the one data-sized
    // move in the operator; this measures it (plus the bigram-LM
    // aggregations underneath, which scale with the same corpus) at
    // clone replication with shuffle accounting.
    if (sec("rank")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      timeShuffle(s"perplexityBuckets x$k (${nDocs * k} docs)") {
        graft.ext.Text.perplexityBuckets(rep, "text", "doc_id",
          nBuckets = 3).count()
      }
      timeShuffle(s"globalRowNumber x$k (${nDocs * k} docs, rank only)") {
        graft.ext.Rank.globalRowNumber(
          rep.select(col("doc_id"), size(split(col("text"), " ")).as("nw")),
          Seq(col("nw").desc, col("doc_id").asc)).count()
      }
    }

    // suffix-array prefix doubling (round 16): log₂(32) = 5 rounds of
    // narrow 8-byte-key join + (rank, partner) window over the token
    // table. Clone replication multiplies every duplicate group's
    // size k× — the hot-group worst case for the window MIN — while
    // the distinct-window count stays fixed; this measures whether the
    // rank ladder's cost stays linear in positions (it should: both
    // exchanges are keyed moves of 2-long rows, no driver state).
    if (sec("suffix")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      timeShuffle(s"suffixDupProfile x$k (${nDocs * k} docs, maxLen 32)") {
        graft.ext.Suffix.dupProfile(rep, "text", "doc_id", maxLen = 32)
          .count()
      }
    }
    // the excision ACTION under clones: every clone makes each original
    // 32-window a duplicate, so the marked set approaches ALL positions
    // — the offsets-explode worst case (O(dup positions × 32)); the
    // measure is whether the explode+anti-join stays linear in k.
    // probeAll (not count()): the output is a left join against a
    // by-doc_id aggregate, so a bare count() lets Catalyst ELIMINATE
    // the join (at-most-one row per key) and the excision never runs.
    if (sec("excise")) for (k <- Seq(10, 40)) {
      val rep = cloned(k)
      timeShuffle(s"suffixExcise x$k (${nDocs * k} docs, spanLen 32)") {
        probeAll(
          graft.ext.Suffix.exciseDupSpans(rep, "text", "doc_id", spanLen = 32))
      }
    }

    // cross-corpus contamination depth (round 17): the eval slice is
    // FIXED (the rep-0 copies of base ids < 2000) while the corpus
    // side clones k× — pair volume is contamination-bound (colliding
    // windows grow linearly with the clone count), so cost must scale
    // ~linearly in k, never corpus × corpus
    if (sec("contamdepth")) for (k <- Seq(10, 40)) {
      val rep = cloned(k)
      timeShuffle(s"contaminationSpanDepth x$k (${nDocs * k} docs)") {
        graft.ext.Suffix.contaminationSpanDepth(rep, "text", "doc_id",
          evalPred = pmod(col("doc_id"), lit(1000)) === 0 &&
            col("doc_id") < 2000000L,
          baseLen = 4, maxExt = 160).count()
      }
    }

    // stage-8 face comparison (round 17): the master's corpus-wide
    // span excision at span 10 — fingerprint-keyed sliding windows
    // (one window row per position, 8-byte keys, collision-admitting)
    // vs the exact suffix ladder (log₂10 → 3 doubling rounds + one
    // overlap combine, 16-byte rank keys, collision-free). Same
    // semantics (x_pipeline_master_suffix adjudicates byte parity);
    // this measures what exactness costs at clone replication.
    // r18 adds the ×100 decision row (the stage-8 default flip gate):
    // hashed vs exact-first only at ×100 — the raw ladder is the
    // oracle anchor, not a production candidate, and its clone
    // degradation is already measured (47 s / 1872 MiB at ×40)
    if (sec("suffixstage")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      timeShuffle(s"stage8 spanDedupHashed x$k (${nDocs * k} docs, span 10)") {
        probeAll(Dedup.spanDedupHashed(rep, "text", "doc_id", span = 10))
      }
      if (k <= 40)
        timeShuffle(s"stage8 suffixExcise x$k (${nDocs * k} docs, span 10)") {
          probeAll(
            graft.ext.Suffix.exciseDupSpans(rep, "text", "doc_id", spanLen = 10))
        }
      // the cure (r17): exact-first collapse + closed-form member
      // reconstruction — the ladder runs on distinct content only, so
      // cost must be content-bound (flat in k) while staying
      // byte-equal to the raw face (x_dedup_suffix_excise_first)
      timeShuffle(s"stage8 suffixExcise EXACT-FIRST x$k (${nDocs * k} docs)") {
        probeAll(graft.ext.Suffix.exciseDupSpansExactFirst(
          rep, "text", "doc_id", spanLen = 10))
      }
    }
    // the exact-first INCREMENTAL face (r18) under the same clone
    // regime: three id-ordered batches of the ×k corpus through real
    // accumulated state, vs the fingerprint incremental face — state
    // rows must stay DISTINCT-CONTENT-bound and per-batch wall-clock
    // flat in k for the collapse to hold streaming-side too
    if (sec("spanincr")) for (k <- Seq(10, 40)) {
      val rep = cloned(k).localCheckpoint(true)
      for ((face, tag) <- Seq("exact-first" -> "ef", "fingerprint" -> "fp")) {
        val state = java.nio.file.Files
          .createTempDirectory(s"scale_spanincr_$tag").toString + "/span"
        for (b <- 0 until 3) {
          val batch = rep.filter(pmod(col("doc_id"), lit(3)) === b)
          timeShuffle(s"spanIncr $face x$k batch $b") {
            probeAll(
              if (tag == "ef")
                Dedup.spanDedupIncrementalExactFirst(batch, "text",
                  "doc_id", 10, state, batchTag = Some(b.toLong))
              else Dedup.spanDedupIncremental(batch, "text", "doc_id",
                10, state, batchTag = Some(b.toLong), hashedState = true))
          }
        }
        println(s"[scale] spanIncr $face x$k state rows: " +
          spark.read.parquet(state).count())
      }
    }

    // continuous-curation master under clone bursts (round 17): drive
    // the ×k corpus through CurateStream.applyBatch as three
    // micro-batches, recording per-batch wall-clock and the size of
    // every accumulated state — the "state never grows with the
    // stream" claim made measurable: paragraph/whole-doc/span
    // signature states are DISTINCT-CONTENT-bound (clones collapse —
    // collapseExact in the paragraph face, signature identity in the
    // others), so state growth across batches must track new content,
    // not arrival volume, and batch wall-clock must stay flat.
    // r18: the section runs BOTH span-state faces — the fingerprint
    // default and the exact-first incremental (exactSpanState) — so
    // the streaming master's end-to-end cost under the exact face is
    // measured, not inferred from the standalone spanincr wave
    if (sec("curatestream")) for (k <- Seq(10, 40);
        exact <- Seq(false, true)) {
      val face = if (exact) "EXACT-FIRST" else "fingerprint"
      val model = docs
      val (cutLp, cutId) = graft.streaming.FunnelStream
        .fluencyCutoff(model, "text", "doc_id")
      val evalDocs = model.filter(col("doc_id") < 20)
      val statePath = java.nio.file.Files
        .createTempDirectory("scale_curatestream").toString + "/state"
      def stateRows(p: String): Long =
        try spark.read.parquet(p).count()
        catch { case _: Exception => 0L }
      for (b <- 0 until 3) {
        val batch = cloned(k)
          .filter(pmod(col("doc_id"), lit(3)) === b)
          .select(col("doc_id"), col("text"),
            col("text").as("tinj"))
        timeShuffle(s"curatestream $face x$k batch $b (~${nDocs * k / 3} docs)") {
          val (packed, report) = graft.streaming.CurateStream.applyBatch(
            batch, statePath, b.toLong, model, cutLp, cutId, evalDocs,
            "text", "tinj", "doc_id", exactSpanState = Some(exact))
          report.head()
          packed.count()
        }
        println(f"[scale] curatestream $face x$k batch $b state rows: " +
          f"para=${stateRows(s"$statePath/para")} " +
          f"whole=${stateRows(s"$statePath/whole")} " +
          f"span=${stateRows(s"$statePath/span")} " +
          f"bins=${stateRows(s"$statePath/bins/g$b")} " +
          f"shards=${stateRows(s"$statePath/shards/g$b")}")
      }
      spark.catalog.clearCache()
    }

    // exact longest-duplicate (round 16): the pair set is quadratic
    // in duplicate MULTIPLICITY, so clones are its worst case — and
    // the exact-first collapse (wholeDocReps) is the documented cure:
    // identical docs collapse to one representative before the
    // ladder, making multiplicities content-bound again
    if (sec("maxlen")) {
      val k = 10
      val rep = cloned(k)
      timeShuffle(s"maxDupSpan RAW x$k (${nDocs * k} docs)") {
        graft.ext.Suffix.maxDupSpan(rep, "text", "doc_id",
          baseLen = 32, maxExt = 160).count()
      }
      timeShuffle(s"maxDupSpan EXACT-FIRST x$k (reps of ${nDocs * k} docs)") {
        val reps = Dedup.wholeDocReps(rep, "text", "doc_id")
        graft.ext.Suffix.maxDupSpan(reps, "text", "doc_id",
          baseLen = 32, maxExt = 160).count()
      }
    }

    // gradient-descent logistic regression (round 16): 30 full-batch
    // iterations, each two map-side-combinable passes over the PINNED
    // integer feature table; the model is O(dims) and the driver holds
    // only the (dims+1)-vector, so cost must be iters × linear-in-
    // corpus with flat driver memory.
    if (sec("logreg")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      val labeled = rep.join(
        graft.ext.Text.gopherRules(rep, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      timeShuffle(s"logRegFilter x$k (${nDocs * k} docs, 30 iters)") {
        graft.ext.Model.logRegFilter(labeled, "text", "doc_id", "label",
          dims = 64, iters = 30, step = "0.000200").count()
      }
    }

    // full quality sidecar (round 18): the registered v3 ⋈ v2 assembly
    // timed at the bench SF, with its corpus-SCAN count COUNTED from
    // the executed plan (FileSourceScan leaves over documents.parquet,
    // recursing through AQE stages, cached relations, and subqueries)
    // — the "how many passes does the whole sidecar cost" claim
    // measured, not asserted. The probe sums a real payload column
    // (the count-join-elimination rule).
    if (sec("signalsfull")) {
      def countDocScans(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths
                .exists(_.toString.contains("documents")) => 1
          case _ => 0
        }
        val kids: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            Seq(i.relation.cachedPlan)
          case other => other.children
        }
        self + kids.map(countDocScans).sum +
          p.subqueries.map(countDocScans).sum
      }
      // the probe hashes EVERY output column into the aggregate —
      // summing one column would let Catalyst ELIMINATE the unused
      // left-join-to-aggregate signal chains (measured: 1.75 s with
      // the LM/GD/ladder chains pruned vs the real full-sidecar cost)
      // — and the ASSEMBLY runs inside the timed block too: the GD
      // training loop executes its iterations at construction time
      var probe: DataFrame = null
      timeShuffle(s"signalsFull v3 JOIN v2 ($sfDir)") {
        probe = probeDf(
          graft.queries.ExtP.xQualitySignalsFull.run(spark, sfDir))
        probe.head().getLong(1) // the real per-doc row count
      }
      println(s"[scale] signalsFull corpus scans in executed plan: " +
        s"${countDocScans(probe.queryExecution.executedPlan)}")
    }

    // epoch layout (round 19): the composed permutation + manifest +
    // PHYSICAL write over BFD-packed sequences of the ×k cloned corpus
    // (the registered x_pack_epoch_* construction at scale). Sequence
    // count grows ~linearly in k (clones pack into their own bins), so
    // both rows must scale ~linearly. Row 1 = epochOrderWithTotal +
    // epochShards (the one range exchange + two O(P)/O(groups)
    // numbering jobs + the manifest aggregate); row 2 = the physical
    // partitionBy(consumer) write from the PINNED order — isolating
    // the write proves the no-new-exchange claim (consumer is monotone
    // in epoch_pos, so the already-range-partitioned order streams
    // into at most 2 directories per task; shuffle MiB on this row
    // must be ~0).
    if (sec("epoch")) for (k <- Seq(10, 40, 100)) {
      val rep = cloned(k)
      // the SHARED packed-seq construction (Sampling.packedBinStats)
      // — the same code path the registered x_pack_epoch_* queries
      // run, so these rows measure exactly that construction at scale
      val seqs = graft.ext.Sampling.packedBinStats(rep, col("source"),
          col("doc_id"), size(split(col("text"), " ")).cast("long"),
          seqLen = 64L)
        .localCheckpoint(true) // pin: measure the epoch machinery, not the packer
      var ordered: DataFrame = null
      var n = 0L
      timeShuffle(s"epoch order+shards x$k (packed seqs of ${nDocs * k} docs)") {
        val (o, total) = graft.ext.Layout.epochOrderWithTotal(seqs,
          "grp", "bin", seed = 42L)
        // pin the order so the write row below isolates write cost;
        // localCheckpoint preserves the range partitioning the
        // no-shuffle write claim rides on
        ordered = o.localCheckpoint(true)
        n = total
        probeAll(graft.ext.Layout.epochShards(ordered, n, nConsumers = 8))
      }
      val out = java.nio.file.Files.createTempDirectory("scale_epoch")
        .toString + "/layout"
      timeShuffle(s"epoch physical write x$k ($n seqs, 8 consumers)") {
        graft.ext.Layout.writeEpochLayout(ordered, n, nConsumers = 8, out)
        n
      }
      // row 3 (r19): the integrity instruments over the pinned order —
      // the shuffle-quality audit (successor/predecessor equi-joins +
      // the prefix-sum segments) and the per-consumer block digests
      // (closed-form projection + one partial aggregate); both must
      // stay sequence-linear like row 1
      timeShuffle(s"epoch audit+digests x$k ($n seqs)") {
        probeAll(graft.ext.Layout.epochOrderAudit(ordered, n)) +
          probeAll(graft.ext.Layout.epochBlockDigests(ordered, n,
            nConsumers = 8, blockLen = 1024L))
      }
    }

    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
