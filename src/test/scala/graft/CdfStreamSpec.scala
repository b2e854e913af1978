package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.WarehouseFs
import graft.streaming.CdfSource

/** The change-feed streaming source: every committed version's row
  * deltas arrive as micro-batches, stamped with the version that
  * produced them, across heterogeneous DML verbs. */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_cdf_")}/t"

  private def collectSink(name: String) =
    spark.table(name).select("id", "user", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("stream delivers per-version deltas for deletes, upserts, and merges") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(100).select(col("id"), concat(lit("u"), col("id")).as("user")),
      t, keepVersions = 10, bloomIndexCols = Seq("id"))

    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t).option("keyCols", "id")
      .option("startingVersion", 2L.toString)
      .load()
      .writeStream.format("memory").queryName("cdf_sink").start()
    try {
      q.processAllAvailable()
      assert(collectSink("cdf_sink").isEmpty, "no version 2 yet → no batches")

      WarehouseFs.deleteWhere(spark, t, "id", Seq(7L), keepVersions = 10)
      q.processAllAvailable()
      assert(collectSink("cdf_sink") === Set((7L, "u7", "delete", 2L)))

      // two more versions before the next poll → one batch, both steps,
      // each stamped with ITS producing version
      WarehouseFs.upsertRows(Seq((3L, "u3_v3"), (200L, "u200")).toDF("id", "user"),
        t, "id", keepVersions = 10)
      WarehouseFs.mergeInto(Seq((5L, "u5_v4")).toDF("id", "user"), t, "id",
        whenMatchedUpdate = Map("user" -> col("src_user")), keepVersions = 10)
      q.processAllAvailable()
      assert(collectSink("cdf_sink") === Set(
        (7L, "u7", "delete", 2L),
        (3L, "u3", "update_preimage", 3L), (3L, "u3_v3", "update_postimage", 3L),
        (200L, "u200", "insert", 3L),
        (5L, "u5", "update_preimage", 4L), (5L, "u5_v4", "update_postimage", 4L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_sink")
    }
  }

  test("startingVersion = the earliest version delivers an initial snapshot, then increments") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "user"), t,
      keepVersions = 10, bloomIndexCols = Seq("id"))
    // v1 has no v0 to diff against — the first batch must be the v1
    // snapshot as inserts, not a failure on the nonexistent step 0→1
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t).option("keyCols", "id")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("memory").queryName("cdf_snap_sink").start()
    try {
      q.processAllAvailable()
      assert(collectSink("cdf_snap_sink") === Set(
        (1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
      // and the stream continues incrementally from the snapshot
      WarehouseFs.deleteWhere(spark, t, "id", Seq(2L), keepVersions = 10)
      q.processAllAvailable()
      assert(collectSink("cdf_snap_sink") === Set(
        (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
        (2L, "b", "delete", 2L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_snap_sink")
    }
  }

  test("startingVersion below the earliest retained version fails fast at creation") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t,
      keepVersions = 2, bloomIndexCols = Seq("id"))
    WarehouseFs.deleteWhere(spark, t, "id", Seq(1L), keepVersions = 2)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(2L), keepVersions = 2)
    // keepVersions = 2 → v1's history is GC'd
    assert(WarehouseFs.listVersions(spark, t).min > 1L)
    val e = intercept[IllegalArgumentException] {
      new CdfSource(spark.sqlContext, t, Seq("id"), Some(1L), None)
    }
    assert(e.getMessage.contains("predates the earliest retained"))
    intercept[IllegalArgumentException] {
      new CdfSource(spark.sqlContext, t, Seq("id"), Some(0L), None)
    }
  }

  test("the starting floor persists in the checkpoint: restarts keep the original identity") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t, keepVersions = 10)
    val meta = java.nio.file.Files.createTempDirectory("graft_cdf_meta_").toString
    // first start pins floor = startingVersion − 1
    val s1 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(5L), Some(meta))
    // a "restart" with DIFFERENT options must resume from the committed
    // floor, not re-derive one (checkpoint identity wins)
    val s2 = new CdfSource(spark.sqlContext, t, Seq("id"), None, Some(meta))
    val s3 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(9L), Some(meta))
    // all three agree: no offset below v5 is ever re-reported, none skipped
    for (s <- Seq(s1, s2, s3))
      assert(s.getOffset.isEmpty, "current v1 is below the pinned floor 4 → no data")
    // without a metadata path the default floor derives from the table
    val fresh = new CdfSource(spark.sqlContext, t, Seq("id"), None, None)
    assert(fresh.getOffset.isEmpty, "floor = current version → nothing new")
  }

  test("restart never re-validates retention: a GC'd startingVersion is fine once consumed") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t,
      keepVersions = 2, bloomIndexCols = Seq("id"))
    val meta = java.nio.file.Files.createTempDirectory("graft_cdf_meta_").toString
    // first start: startingVersion=1 is the earliest retained → valid,
    // floor 0 + snapshot kind commit into the checkpoint
    new CdfSource(spark.sqlContext, t, Seq("id"), Some(1L), Some(meta))
    // the table advances past retention: v1 is GC'd
    WarehouseFs.deleteWhere(spark, t, "id", Seq(1L), keepVersions = 2)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(2L), keepVersions = 2)
    assert(WarehouseFs.listVersions(spark, t).min > 1L)
    // a RESTART with the same options must not fail at creation — the
    // checkpointed floor is the stream's identity; only a FRESH start
    // validates the option against current retention
    val restarted =
      new CdfSource(spark.sqlContext, t, Seq("id"), Some(1L), Some(meta))
    assert(restarted.getOffset.isDefined)
    intercept[IllegalArgumentException] { // fresh start still fails fast
      new CdfSource(spark.sqlContext, t, Seq("id"), Some(1L), None)
    }
  }

  test("replaying a DELTA floor step after GC fails loudly — never a silent snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val t = tmpTable()
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t,
      keepVersions = 2, bloomIndexCols = Seq("id"))
    WarehouseFs.deleteWhere(spark, t, "id", Seq(1L), keepVersions = 2) // v2
    val meta = java.nio.file.Files.createTempDirectory("graft_cdf_meta_").toString
    // fresh start at v2 (retained, diffable against v1): kind = delta,
    // committed into the checkpoint at construction; the floor step is
    // resolvable as a genuine diff right now
    val s1 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(2L), Some(meta))
    s1.getBatch(None, LongOffset(2L)) // resolves: v1→v2 delta exists
    // retention rolls past the floor step's history
    WarehouseFs.deleteWhere(spark, t, "id", Seq(2L), keepVersions = 2) // v3
    WarehouseFs.deleteWhere(spark, t, "id", Seq(3L), keepVersions = 2) // v4
    // a restarted source replaying the first batch must FAIL — the
    // original batch was a 1-row delta; substituting the full v2
    // snapshot would duplicate inserts for a consumer that saw the delta
    val s2 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(2L), Some(meta))
    val e = intercept[IllegalStateException] {
      s2.getBatch(None, LongOffset(2L))
    }
    assert(e.getMessage.contains("no longer retained"))
  }

  test("writeStream.format(graft): micro-batches land as CoW upserts") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t,
      keepVersions = 10, bloomIndexCols = Seq("id"))
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("table", t).option("keyCol", "id")
      .option("keepVersions", "10")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sink_ckpt_").toString)
      .outputMode("update").start()
    try {
      in.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      assert(WarehouseFs.readTable(spark, t).get.orderBy("id")
        .as[(Long, String)].collect().toSeq ===
        Seq((1L, "a"), (2L, "b2"), (3L, "c")))
      in.addData((1L, "a2"))
      q.processAllAvailable()
      assert(WarehouseFs.readTable(spark, t).get.orderBy("id")
        .as[(Long, String)].collect().toSeq ===
        Seq((1L, "a2"), (2L, "b2"), (3L, "c")))
      // each batch was its own CoW version on the chain
      assert(WarehouseFs.listVersions(spark, t).size === 3)
    } finally q.stop()
  }

  test("a feed stream drives a replica via foreachBatch: end-state parity") {
    val src = tmpTable(); val dst = tmpTable()
    val seed = spark.range(50).select(col("id"), (col("id") % 5).as("grp"))
    WarehouseFs.publishVersioned(seed, src, keepVersions = 10, bloomIndexCols = Seq("id"))
    WarehouseFs.publishVersioned(seed, dst, keepVersions = 10, bloomIndexCols = Seq("id"))

    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", src).option("keyCols", "id")
      .option("startingVersion", 2L.toString)
      .load()
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // versions may coalesce into one micro-batch; apply in order
        val versions = batch.select("_commit_version").distinct()
          .as[Long].collect().sorted
        versions.foreach { v =>
          WarehouseFs.applyChangeFeed(spark,
            batch.filter(col("_commit_version") === v).drop("_commit_version"),
            dst, "id", keepVersions = 10)
        }
      }.start()
    try {
      WarehouseFs.deleteWhere(spark, src, "id", Seq(1L, 2L), keepVersions = 10)
      WarehouseFs.upsertRows(Seq((60L, 0L), (3L, 99L)).toDF("id", "grp"),
        src, "id", keepVersions = 10)
      q.processAllAvailable()
      val s = WarehouseFs.readTable(spark, src).get.collect().map(_.toSeq).toSet
      val d = WarehouseFs.readTable(spark, dst).get.collect().map(_.toSeq).toSet
      assert(d === s)
      assert(d.size === 49) // 50 − 2 deletes + 1 insert
    } finally q.stop()
  }

  test("readStream.table streams a catalog table's change feed; keyCols from table properties") {
    val t = s"cdf_tbl_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$t (id BIGINT, user STRING) " +
      "TBLPROPERTIES('keyCols'='id', 'keepVersions'='10', " +
      "'bloomIndexCols'='id')")
    spark.sql(s"INSERT INTO graft.$t VALUES (1, 'a'), (2, 'b')") // v2
    val q = spark.readStream.table(s"graft.$t")
      .writeStream.format("memory").queryName("cdf_tbl_sink").start()
    try {
      q.processAllAvailable()
      assert(collectSink("cdf_tbl_sink").isEmpty,
        "versions committed before stream start are not replayed by default")
      spark.sql(s"UPDATE graft.$t SET user = 'a2' WHERE id = 1") // v3
      spark.sql(s"DELETE FROM graft.$t WHERE id = 2")            // v4
      q.processAllAvailable()
      assert(collectSink("cdf_tbl_sink") === Set(
        (1L, "a", "update_preimage", 3L), (1L, "a2", "update_postimage", 3L),
        (2L, "b", "delete", 4L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_tbl_sink")
    }
    // startingVersion option: the earliest retained version arrives as a
    // full snapshot, then the stream increments — same v1 semantics
    val q2 = spark.readStream.option("startingVersion", "2")
      .table(s"graft.$t")
      .writeStream.format("memory").queryName("cdf_tbl_snap").start()
    try {
      q2.processAllAvailable()
      val got = collectSink("cdf_tbl_snap")
      assert(got.exists(_._4 == 2L) && got.forall(_._4 >= 2L),
        s"a retained startingVersion must replay from its commit: $got")
    } finally {
      q2.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_tbl_snap")
    }
    // a table with NO keyCols property refuses with guidance
    val t2 = s"cdf_tbl2_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$t2 (id BIGINT, v STRING)")
    val e = intercept[Exception] {
      spark.readStream.table(s"graft.$t2")
        .writeStream.format("memory").queryName("nope").start()
    }
    assert(e.getMessage.contains("keyCols"), s"got: ${e.getMessage}")
  }

  test("maxVersionsPerTrigger drains a lagging stream in bounded batches, content-identical") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((0L, "seed")).toDF("id", "user"), t,
      keepVersions = 30, bloomIndexCols = Seq("id"))            // v1
    (1 to 20).foreach { i =>                                    // v2..v21
      WarehouseFs.upsertRows(Seq((i.toLong, s"u$i")).toDF("id", "user"),
        t, "id", keepVersions = 30)
    }
    // unbounded reference content: every step's delta from the floor
    var batches = 0
    def drain(max: Option[String]): Set[(Long, String, String, Long)] = {
      batches = 0
      sinkRows.synchronized(sinkRows.clear())
      val reader = spark.readStream
        .format("graft.streaming.CdfSourceProvider")
        .option("table", t).option("keyCols", "id")
        .option("startingVersion", "2")
      val q = max.fold(reader)(m => reader.option("maxVersionsPerTrigger", m))
        .load()
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            if (!b.isEmpty) batches += 1
            b.select("id", "user", "_change_type", "_commit_version")
              .collect().foreach(r => sinkRows.synchronized {
                sinkRows += ((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))) })
        }.start()
      try { q.processAllAvailable() } finally q.stop()
      sinkRows.synchronized(sinkRows.toSet)
    }
    val unbounded = drain(None)
    assert(batches === 1, "no cap → the 20-version lag arrives as one batch")
    val bounded = drain(Some("5"))
    assert(batches === 4, "20 pending versions at 5/trigger → exactly 4 batches")
    assert(bounded === unbounded, "rate limiting must not change content")
    assert(bounded.map(_._4) === (2L to 21L).toSet)
  }

  test("rate-limited catch-up resumes correctly across a mid-drain restart") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val t = tmpTable()
    WarehouseFs.publishVersioned(Seq((0L, "seed")).toDF("id", "user"), t,
      keepVersions = 30, bloomIndexCols = Seq("id"))            // v1
    (1 to 12).foreach { i =>                                    // v2..v13
      WarehouseFs.upsertRows(Seq((i.toLong, s"u$i")).toDF("id", "user"),
        t, "id", keepVersions = 30)
    }
    val meta = java.nio.file.Files.createTempDirectory("graft_cdf_meta_").toString
    val s1 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(2L),
      Some(meta), Some(5L))
    val o1 = s1.getOffset.get.asInstanceOf[LongOffset].offset
    assert(o1 === 6L, "floor 1 + 5 per trigger")
    // (content parity across the drain is asserted end-to-end in the
    // foreachBatch test above; here the OFFSET mechanics are the point)
    assert(s1.getBatch(None, LongOffset(o1)).isStreaming)
    val o2 = s1.getOffset.get.asInstanceOf[LongOffset].offset
    assert(o2 === 11L)
    s1.getBatch(Some(LongOffset(o1)), LongOffset(o2))
    // "crash" after the engine committed through o2; a restarted source
    // first replays the recovered range (the v1 restart contract), and
    // the NEXT offset continues from there — never re-capped from the
    // floor, never skipping
    val s2 = new CdfSource(spark.sqlContext, t, Seq("id"), Some(2L),
      Some(meta), Some(5L))
    s2.getBatch(Some(LongOffset(o1)), LongOffset(o2)) // engine replay/init
    val o3 = s2.getOffset.get.asInstanceOf[LongOffset].offset
    assert(o3 === 13L, "cap from the replayed offset 11, bounded by head 13")
    assert(s2.getBatch(Some(LongOffset(o2)), LongOffset(o3)).isStreaming)
    assert(s2.getOffset.isEmpty, "drained")
  }

  private val sinkRows =
    scala.collection.mutable.Set.empty[(Long, String, String, Long)]

  test("the stream classifies deletion-vector commits exactly like rewrites") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(10).select(col("id"), concat(lit("u"), col("id")).as("user")),
      t, keepVersions = 10, bloomIndexCols = Seq("id"))
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t).option("keyCols", "id")
      .option("startingVersion", "2")
      .load()
      .writeStream.format("memory").queryName("cdf_dv_sink").start()
    try {
      // a merge-on-read delete commits a sidecar, zero data files — the
      // feed diff classifies from the mask delta, so the stream sees the
      // same delete rows a CoW rewrite would have produced
      WarehouseFs.deleteWhereVectors(spark, t, "id", Seq(5L), keepVersions = 10)
      q.processAllAvailable()
      assert(collectSink("cdf_dv_sink") === Set((5L, "u5", "delete", 2L)))
      // and a MoR update streams the pre/post pair
      WarehouseFs.updateMatchingVectors(spark, t, col("id") === 3L,
        Map("user" -> lit("x3")), keepVersions = 10,
        pruning = (Map("id" -> Seq(3L)), Map.empty))
      q.processAllAvailable()
      assert(collectSink("cdf_dv_sink") === Set(
        (5L, "u5", "delete", 2L),
        (3L, "u3", "update_preimage", 3L), (3L, "x3", "update_postimage", 3L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_dv_sink")
    }
  }

  test("startingTimestamp resolves the earliest commit at or after the instant") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((1L, "a")).toDF("id", "user"), t,
      keepVersions = 10, bloomIndexCols = Seq("id"))          // v1
    Thread.sleep(20)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(20)
    WarehouseFs.upsertRows(Seq((2L, "b")).toDF("id", "user"), t, "id",
      keepVersions = 10)                                      // v2
    // betweenMs sits between the v1 and v2 commits → start at v2: its
    // OWN delta replays (v1→v2), not a v1 snapshot
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t).option("keyCols", "id")
      .option("startingTimestamp", betweenMs.toString)
      .load()
      .writeStream.format("memory").queryName("cdf_ts_sink").start()
    try {
      q.processAllAvailable()
      assert(collectSink("cdf_ts_sink") === Set((2L, "b", "insert", 2L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_ts_sink")
    }
    // the refusals surface when the source is created at stream start
    // (async) — drive each query to its failure and check the message
    def startFails(extra: (String, String)*): String = {
      val reader = extra.foldLeft(spark.readStream
          .format("graft.streaming.CdfSourceProvider")
          .option("table", t).option("keyCols", "id")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load().writeStream.format("memory")
        .queryName(s"cdf_ts_bad_${java.util.UUID.randomUUID().toString.take(6)}")
        .start()
      try intercept[Exception] { q.processAllAvailable() }.getMessage
      finally q.stop()
    }
    // past the latest retained commit → loud refusal, not an empty stream
    assert(startFails("startingTimestamp" ->
      (System.currentTimeMillis() + 3600L * 1000).toString)
      .contains("at or after"))
    // both starting options together refuse
    assert(startFails("startingVersion" -> "1",
      "startingTimestamp" -> betweenMs.toString)
      .contains("mutually exclusive"))
  }

  test("the stream stamps _commit_timestamp ≡ the manifest commit instants (batch-TVF parity)") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(20).select(col("id"), concat(lit("u"), col("id")).as("user")),
      t, keepVersions = 10, bloomIndexCols = Seq("id"))
    WarehouseFs.deleteWhere(spark, t, "id", Seq(3L), keepVersions = 10)  // v2
    WarehouseFs.upsertRows(Seq((5L, "x5")).toDF("id", "user"), t, "id",
      keepVersions = 10)                                                 // v3
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t).option("keyCols", "id")
      .option("startingVersion", "2")
      .load()
      .writeStream.format("memory").queryName("cdf_ts_sink").start()
    try {
      q.processAllAvailable()
      val stamped = spark.table("cdf_ts_sink")
        .select("_commit_version", "_commit_timestamp").distinct()
        .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      // one instant per version, equal to DESCRIBE HISTORY's
      val hist = WarehouseFs.describeHistory(spark, t)
        .map(h => h._1 -> h._2.getTime).toMap
      assert(stamped.keySet === Set(2L, 3L))
      stamped.foreach { case (v, ts) => assert(ts === hist(v),
        s"version $v: stream stamp $ts must equal the manifest instant ${hist(v)}") }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cdf_ts_sink")
    }
  }

  test("writeStream.format(graft) with dmlMode=mor: micro-batches mask + " +
      "append O(batch) files; end state = the CoW sink's; the fold retires masks") {
    def fixture(): String = {
      val t = tmpTable()
      WarehouseFs.publishVersioned(
        spark.range(8000)
          .select(col("id"), concat(lit("u"), col("id")).as("v"))
          .repartitionByRange(8, col("id")),
        t, keepVersions = 12, bloomIndexCols = Seq("id"))
      t
    }
    val tMor = fixture(); val tCow = fixture()
    def run(t: String, mor: Boolean): Unit = {
      val in = MemoryStream[(Long, String)](spark)
      val w0 = in.toDF().toDF("id", "v")
        .writeStream.format("graft")
        .option("table", t).option("keyCol", "id")
        .option("keepVersions", "12")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_mor_ckpt_").toString)
      val q = (if (mor) w0.option("dmlMode", "mor") else w0)
        .outputMode("update").start()
      try {
        // scattered keys: each batch touches SEVERAL of the 8 range files
        in.addData((100L, "x100"), (2100L, "x2100"), (7100L, "x7100"))
        q.processAllAvailable()
        in.addData((200L, "y200"), (4200L, "y4200"), (9001L, "new"))
        q.processAllAvailable()
        in.addData((300L, "z300"))
        q.processAllAvailable()
      } finally q.stop()
    }
    run(tMor, mor = true); run(tCow, mor = false)
    // each MoR micro-batch commit wrote only the BATCH's images — its
    // own version dir holds at most 2 data files even though the keys
    // scatter across many of the 8 files (the CoW twin rewrites them)
    val attemptDirs = new java.io.File(tMor).listFiles()
      .filter(d => d.getName.matches("v\\d{8}-[0-9a-f]+"))
    assert(attemptDirs.length === 3, s"3 micro-batch commits expected, " +
      s"got ${attemptDirs.map(_.getName).mkString(", ")}")
    attemptDirs.foreach { d =>
      val n = java.nio.file.Files.walk(d.toPath).iterator()
      var cnt = 0
      while (n.hasNext) { if (n.next().toString.endsWith(".parquet")) cnt += 1 }
      assert(cnt <= 2,
        s"MoR micro-batch must append O(batch) files, ${d.getName} has $cnt")
    }
    assert(WarehouseFs.hasDeletionVectors(spark, tMor),
      "matched keys mask through deletion vectors")
    // value parity with the CoW sink
    def state(t: String) = WarehouseFs.readTable(spark, t).get
      .as[(Long, String)].collect().toSet
    assert(state(tMor) === state(tCow))
    assert(state(tMor).size === 8001)
    // the fold retires the masks; values unchanged
    graft.operators.ScaleJoins.compactParquet(spark, tMor, keepVersions = 12)
    assert(!WarehouseFs.hasDeletionVectors(spark, tMor))
    assert(state(tMor) === state(tCow))
  }

  test("MoR sink on a day-partitioned table: micro-batches keep the " +
      "key=value layout, O(batch) files per trigger; partitionBy must " +
      "agree with the committed layout") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), (col("id") % 4).cast("int").as("day"),
          concat(lit("u"), col("id")).as("v"))
        .repartitionByRange(8, col("id")),
      t, partitionBy = Seq("day"), keepVersions = 12,
      bloomIndexCols = Seq("id"))
    // a stream-side partitionBy disagreeing with the layout refuses loudly
    val bad = intercept[IllegalArgumentException] {
      MemoryStream[(Long, Int, String)](spark).toDF()
        .toDF("id", "day", "v").writeStream.format("graft")
        .option("table", t).option("keyCol", "id")
        .option("dmlMode", "mor").partitionBy("v")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_pmor_bad_").toString)
        .outputMode("update").start()
    }
    assert(bad.getMessage.contains("committed layout"))
    val in = MemoryStream[(Long, Int, String)](spark)
    val q = in.toDF().toDF("id", "day", "v")
      .writeStream.format("graft")
      .option("table", t).option("keyCol", "id")
      .option("keepVersions", "12").option("dmlMode", "mor")
      .partitionBy("day") // agreeing declaration is accepted
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_pmor_ckpt_").toString)
      .outputMode("update").start()
    try {
      // keys scattered across files AND days — 2101 also MOVES partition
      // (its stored day is 1; the upsert's image carries day=3)
      in.addData((100L, 0, "x100"), (2101L, 3, "x2101"), (7102L, 2, "x7102"))
      q.processAllAvailable()
      in.addData((200L, 0, "y200"), (9001L, 1, "new"))
      q.processAllAvailable()
    } finally q.stop()
    val attemptDirs = new java.io.File(t).listFiles()
      .filter(d => d.getName.matches("v\\d{8}-[0-9a-f]+"))
    assert(attemptDirs.length === 2, "2 micro-batch commits expected")
    attemptDirs.foreach { d =>
      val files = java.nio.file.Files.walk(d.toPath).iterator()
      var perDay = Map.empty[String, Int]
      while (files.hasNext) {
        val p = files.next().toString
        if (p.endsWith(".parquet")) {
          val day = p.split('/').find(_.startsWith("day=")).getOrElse("flat")
          perDay = perDay.updated(day, perDay.getOrElse(day, 0) + 1)
        }
      }
      assert(!perDay.contains("flat"),
        s"${d.getName}: batch images must land under the day= layout, got $perDay")
      assert(perDay.values.sum <= 3 && perDay.values.forall(_ == 1),
        s"${d.getName}: O(batch) files — one per touched day — got $perDay")
    }
    assert(WarehouseFs.hasDeletionVectors(spark, t),
      "matched keys mask through deletion vectors")
    val got = WarehouseFs.readTable(spark, t).get
      .filter(col("id").isin(100L, 2101L, 7102L, 200L, 9001L, 101L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(100L -> "x100", 2101L -> "x2101", 7102L -> "x7102",
      200L -> "y200", 9001L -> "new", 101L -> "u101"))
    assert(WarehouseFs.readTable(spark, t).get.count() === 8001)
    // the partition-moving upsert: day is part of the VALUE, so a key
    // whose day changed lands in its new dir (free under the layout) —
    // exactly one live image, in the NEW partition
    val moved = WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 2101L).select("day").as[Int].collect().toSeq
    assert(moved === Seq(3),
      s"2101 must surface once, in its new partition, got $moved")
  }

  test("exactly-once sink commits: a batch replayed after a crash between " +
      "the manifest commit and the checkpoint commit is SKIPPED — one image " +
      "file, one history commit, zero mask growth (CoW and MoR)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    def run(mor: Boolean): Unit = {
      val t = tmpTable()
      WarehouseFs.publishVersioned(
        spark.range(8000)
          .select(col("id"), concat(lit("u"), col("id")).as("v"))
          .repartitionByRange(8, col("id")),
        t, keepVersions = 12, bloomIndexCols = Seq("id"))
      val base = java.nio.file.Files.createTempDirectory("graft_eo_").toString
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      def addFile(rows: (Long, String)*): Unit =
        rows.toSeq.toDF("id", "v").coalesce(1)
          .write.mode("append").parquet(input)
      def drain(reset: Boolean = false): Unit = {
        val w1 = spark.readStream.schema(schema).parquet(input)
          .writeStream.format("graft")
          .option("table", t).option("keyCol", "id")
          .option("keepVersions", "12")
          .option("checkpointLocation", ckpt)
        val w0 = if (reset) w1.option("txnReset", "true") else w1
        val q = (if (mor) w0.option("dmlMode", "mor") else w0)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // batch 0 lands (scattered keys: several of the 8 files match)
      addFile(100L -> "x100", 2100L -> "x2100", 9001L -> "new")
      drain()
      val vAfterBatch0 = WarehouseFs.currentVersion(spark, t).get._1
      assert(vAfterBatch0 === 2L)
      val masksAfterBatch0 = WarehouseFs.deletionVectorRows(spark, t)
      def attemptDirs() = new java.io.File(t).listFiles()
        .filter(d => d.getName.matches("v\\d{8}-[0-9a-f]+")).length
      val dirsAfterBatch0 = attemptDirs()
      // crash simulation: the manifest committed but the checkpoint
      // commit marker did not — the exact at-least-once window
      val last = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(f => !f.getName.startsWith(".")).maxBy(_.getName.toInt)
      java.nio.file.Files.delete(last.toPath)
      val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
      if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
      // restart replays batch 0. A BARE batch-0 restart against a
      // stamped table refuses (it is indistinguishable from a
      // recreated checkpoint, whose first batches would silently drop
      // as replays) — the caller affirms the genuine first-batch
      // replay with txnReset, and the stamp then swallows it whole
      val eBare = intercept[Exception] { drain() }
      assert(Option(eBare.getMessage).exists(_.contains("txnReset")) ||
          Option(eBare.getCause).exists(c =>
            Option(c.getMessage).exists(_.contains("txnReset"))),
        s"mor=$mor: bare batch-0 restart must refuse with guidance, got: $eBare")
      assert(WarehouseFs.currentVersion(spark, t).get._1 === vAfterBatch0,
        s"mor=$mor: the refused restart must not commit")
      drain(reset = true)
      assert(WarehouseFs.currentVersion(spark, t).get._1 === vAfterBatch0,
        s"mor=$mor: the replayed batch must not commit a second version")
      assert(attemptDirs() === dirsAfterBatch0,
        s"mor=$mor: the replay must not append a duplicate image file")
      assert(WarehouseFs.deletionVectorRows(spark, t) === masksAfterBatch0,
        s"mor=$mor: the replay must not grow the mask")
      // the gate never over-skips: a genuinely NEW batch still lands
      addFile(200L -> "y200")
      drain()
      assert(WarehouseFs.currentVersion(spark, t).get._1 === vAfterBatch0 + 1,
        s"mor=$mor: batch 1 must commit normally after the replay")
      // the idempotent-writer stamp is DESCRIBE HISTORY provenance:
      // which stream landed the commit, and which micro-batch
      assert(WarehouseFs.describeHistory(spark, t).last._8 === s"$ckpt#1",
        s"mor=$mor: history must carry the txn stamp")
      val got = WarehouseFs.readTable(spark, t).get
        .filter(col("id").isin(100L, 2100L, 9001L, 200L, 101L))
        .as[(Long, String)].collect().toMap
      assert(got === Map(100L -> "x100", 2100L -> "x2100", 9001L -> "new",
        200L -> "y200", 101L -> "u101"), s"mor=$mor: value parity")
    }
    run(mor = false); run(mor = true)
  }

  test("a checkpoint RECREATED at the same location refuses loudly " +
      "instead of dropping the reborn stream's first batches as replays; " +
      "a fresh txnAppId lands them as a new writer") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(100).select(col("id"), concat(lit("u"), col("id")).as("v")),
      t, keepVersions = 12, bloomIndexCols = Seq("id"))
    val base = java.nio.file.Files.createTempDirectory("graft_ckre_").toString
    val input = s"$base/in"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def addFile(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(input)
    def drain(appId: Option[String] = None): Unit = {
      val w0 = spark.readStream.schema(schema).parquet(input)
        .writeStream.format("graft")
        .option("table", t).option("keyCol", "id")
        .option("keepVersions", "12")
        .option("checkpointLocation", ckpt)
      val q = appId.fold(w0)(a => w0.option("txnAppId", a))
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // the original stream lands batches 0 and 1
    addFile(1L -> "x1"); drain()
    addFile(2L -> "x2"); drain()
    val vStamped = WarehouseFs.currentVersion(spark, t).get._1
    assert(vStamped === 3L)
    // operator deletes the checkpoint — batch numbering restarts at 0
    // while the table's floor for this writer identity is 1
    def rmRf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmRf(c.toString))
      f.delete(); ()
    }
    rmRf(ckpt)
    addFile(1003L -> "REBORN")
    val e = intercept[Exception] { drain() }
    val msgs = Seq(Option(e.getMessage), Option(e.getCause).flatMap(c =>
      Option(c.getMessage))).flatten.mkString(" | ")
    assert(msgs.contains("txnAppId") && msgs.contains("batchId 0"),
      s"recreated checkpoint must refuse with both escape hatches, got: $msgs")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === vStamped,
      "the refused stream must not commit")
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 1003L).count() === 0)
    // the reborn stream declares itself a NEW writer — its batches land
    drain(appId = Some("reborn-writer"))
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 1003L).select("v").as[String].head() === "REBORN")
    assert(WarehouseFs.describeHistory(spark, t).last._8
      .startsWith("reborn-writer#"),
      "the new identity's stamp must ride the commit")
  }

  test("KEYLESS stream: a row-tracked table streams _row_id deltas — " +
      "deletes, update pairs under one identity; untracked keyless " +
      "streams refuse with the enabling step") {
    val t = tmpTable()
    graft.sources.GraftCatalog.writeProps(spark, t,
      Map("rowTracking" -> "true"))
    WarehouseFs.publishVersioned(
      spark.range(100).select(col("id"), concat(lit("u"), col("id")).as("user")),
      t, keepVersions = 10, bloomIndexCols = Seq("id"))
    val ids = WarehouseFs.readWithRowId(spark, t).get
      .select("_row_id", "id").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("table", t) // NO keyCols: the _row_id feed
      .option("startingVersion", "2")
      .load()
      .writeStream.format("memory").queryName("rid_cdf_sink").start()
    try {
      WarehouseFs.deleteWhere(spark, t, "id", Seq(7L), keepVersions = 10)
      WarehouseFs.updateWhere(spark, t, "id", Seq(3L),
        Map("user" -> lit("patched")), keepVersions = 10)
      q.processAllAvailable()
      val got = spark.table("rid_cdf_sink")
        .select("_row_id", "id", "user", "_change_type", "_commit_version")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSet
      assert(got === Set(
        (ids(7L), 7L, "u7", "delete", 2L),
        (ids(3L), 3L, "u3", "update_preimage", 3L),
        (ids(3L), 3L, "patched", "update_postimage", 3L)),
        s"got: $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS rid_cdf_sink")
    }
    // an UNTRACKED keyless stream refuses at creation, naming the step
    val t2 = tmpTable()
    WarehouseFs.publishVersioned(spark.range(5).toDF("id"), t2,
      keepVersions = 4)
    val e = intercept[IllegalArgumentException] {
      new CdfSource(spark.sqlContext, t2, Nil, None, None)
    }
    assert(e.getMessage.contains("rowTracking"), e.getMessage)
  }

  test("KEYLESS sink: micro-batches append onto a row-tracked table " +
      "with fresh stable ids, exactly-once under the txn stamp") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val t = tmpTable()
    graft.sources.GraftCatalog.writeProps(spark, t,
      Map("rowTracking" -> "true"))
    WarehouseFs.publishVersioned(
      spark.range(10).select(col("id"), lit("seed").as("v")),
      t, keepVersions = 12)
    val base = java.nio.file.Files.createTempDirectory("graft_ridsink_").toString
    val input = s"$base/in"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def addFile(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(input)
    def drain(reset: Boolean = false): Unit = {
      val w0 = spark.readStream.schema(schema).parquet(input)
        .writeStream.format("graft")
        .option("table", t) // NO keyCol: append-only
        .option("keepVersions", "12")
        .option("checkpointLocation", ckpt)
      val q = (if (reset) w0.option("txnReset", "true") else w0)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    addFile(100L -> "a", 101L -> "b")
    drain()
    val v2 = WarehouseFs.currentVersion(spark, t).get._1
    assert(v2 === 2L)
    val withIds = WarehouseFs.readWithRowId(spark, t).get
      .select("_row_id").as[Long].collect()
    assert(withIds.length === 12 && withIds.distinct.length === 12,
      "appended rows must land with fresh unique ids")
    // duplicate rows are FINE in an append-only keyless table — that is
    // the point: two identical rows are two identities
    addFile(100L -> "a")
    drain()
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 100L).count() === 2)
    // crash between manifest and checkpoint commit: the replay skips
    val last = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(f => !f.getName.startsWith(".")).maxBy(_.getName.toInt)
    java.nio.file.Files.delete(last.toPath)
    val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
    val vBefore = WarehouseFs.currentVersion(spark, t).get._1
    drain() // batch 1 replay — not batch 0, so no refusal needed
    assert(WarehouseFs.currentVersion(spark, t).get._1 === vBefore,
      "the replayed append must not land twice")
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 100L).count() === 2,
      "no duplicate appends from the replay")
    // an untracked keyless target refuses at sink creation
    val t2 = tmpTable()
    WarehouseFs.publishVersioned(spark.range(5)
      .select(col("id"), lit("x").as("v")), t2, keepVersions = 4)
    val e = intercept[Exception] {
      val q = spark.readStream.schema(schema).parquet(input)
        .writeStream.format("graft").option("table", t2)
        .option("checkpointLocation", s"$base/ckpt2")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val msg = Seq(Option(e.getMessage), Option(e.getCause).flatMap(c =>
      Option(c.getMessage))).flatten.mkString(" | ")
    assert(msg.contains("rowTracking"), msg)
  }

  test("commitTimestamp=false restores the pre-stamp feed schema — the " +
      "opt-out for streams restarted from legacy checkpoints") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "user"), t,
      keepVersions = 10, bloomIndexCols = Seq("id"))
    val stream = spark.readStream.format("graft-cdf")
      .option("table", t).option("keyCols", "id")
      .option("startingVersion", "1")
      .option("commitTimestamp", "false").load()
    assert(!stream.schema.fieldNames.contains("_commit_timestamp"),
      "the opt-out must restore the two-column feed tail")
    assert(stream.schema.fieldNames.takeRight(2).toSeq ===
      Seq("_change_type", "_commit_version"))
    val q = stream.writeStream.format("memory")
      .queryName("cdf_nots_sink").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdf_nots_sink")
      assert(!got.columns.contains("_commit_timestamp"))
      assert(got.select("id").as[Long].collect().toSet === Set(1L, 2L))
    } finally q.stop()
  }
}
