package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming surface driven synchronously: MemoryStream → memory sink via
  * processAllAvailable(). Each query's batch twin is oracle-checked in
  * QueriesEvents; here we check the streaming semantics themselves
  * (watermark windows, sessionization, dedup, stateful SCD2).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def runToMemory(df: DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def completeToMemory(df: DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("tumbling windows aggregate by 10-minute buckets") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:05:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 00:11:00"), 1, "click", 4.0))
    completeToMemory(EventStreams.tumblingCounts(in.toDF()), "tumble")
    val rows = spark.table("tumble").orderBy("win_start").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(2L, 1L))
    assert(rows.head.getAs[Double]("sum_value") === 3.0)
  }

  test("stream-static broadcast enrichment keeps unmatched events (left join)") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:02:00"), 3, "view", 2.0)) // no dim row
    runToMemory(EventStreams.enrichStream(in.toDF(), dim, "user_id"), "enrich")
    val rows = spark.table("enrich").orderBy("event_id").collect()
    assert(rows.map(_.getAs[String]("tier")).toSeq === Seq("gold", null))
    assert(rows.length === 2) // the unmatched event is not dropped
  }

  test("session window closes after a 30-minute gap") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 7, "a", 1.0), // same session
      Ev(3, ts("2024-01-01 01:00:00"), 7, "a", 1.0)) // new session
    completeToMemory(EventStreams.sessionAgg(in.toDF()), "sess")
    val rows = spark.table("sess").orderBy("sess_start").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L))
  }

  test("dropDuplicatesWithinWatermark suppresses re-delivered event ids") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(10, ts("2024-01-01 00:00:00"), 1, "a", 1.0),
      Ev(10, ts("2024-01-01 00:00:05"), 1, "a", 1.0), // dup id
      Ev(11, ts("2024-01-01 00:01:00"), 1, "a", 1.0))
    runToMemory(EventStreams.dedupWithinWatermark(in.toDF()), "dedup")
    assert(spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
      === Array(10L, 11L))
  }

  test("stream-stream interval join pairs events within the hour only") {
    val clicks = MemoryStream[Ev](spark)
    val buys = MemoryStream[Ev](spark)
    clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0))
    buys.addData(
      Ev(2, ts("2024-01-01 10:30:00"), 1, "buy", 0),  // within the hour → match
      Ev(3, ts("2024-01-01 12:00:00"), 1, "buy", 0),  // too late → no match
      Ev(4, ts("2024-01-01 10:20:00"), 2, "buy", 0))  // other user → no match
    runToMemory(EventStreams.intervalJoinWithinHour(clicks.toDF(), buys.toDF()),
      "ssjoin")
    val rows = spark.table("ssjoin").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Timestamp]("r_ts") === ts("2024-01-01 10:30:00"))
  }

  test("left-outer interval join emits unmatched rows once the watermark passes") {
    val clicks = MemoryStream[Ev](spark)
    val buys = MemoryStream[Ev](spark)
    val q = EventStreams.intervalJoinLeftOuter(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ssleft")
      .outputMode("append").start()
    clicks.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0),  // will match
      Ev(2, ts("2024-01-01 10:05:00"), 2, "click", 0))  // never matches
    buys.addData(Ev(3, ts("2024-01-01 10:30:00"), 1, "buy", 0))
    q.processAllAvailable()
    // push both watermarks far past user 2's one-hour join window
    clicks.addData(Ev(8, ts("2024-01-02 00:00:00"), 9, "click", 0))
    buys.addData(Ev(9, ts("2024-01-02 00:00:00"), 9, "buy", 0))
    q.processAllAvailable()
    clicks.addData(Ev(10, ts("2024-01-02 06:00:00"), 9, "click", 0))
    buys.addData(Ev(11, ts("2024-01-02 06:00:00"), 9, "buy", 0))
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("ssleft").collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(byUser(1L).head.getAs[Timestamp]("r_ts") === ts("2024-01-01 10:30:00"))
    // the unmatched click surfaced with null right columns
    assert(byUser(2L).head.getAs[Timestamp]("r_ts") === null)
    assert(byUser(2L).head.getAs[String]("r_type") === null)
  }

  test("stateful SCD2 tracking closes versions on attribute change") {
    implicit val s = spark
    val in = MemoryStream[EventStreams.KeyedAttr](spark)
    in.addData(
      EventStreams.KeyedAttr("T1", ts("2021-03-01 00:00:00"), "city A"),
      EventStreams.KeyedAttr("T1", ts("2021-03-02 00:00:00"), "city A"), // no change
      EventStreams.KeyedAttr("T1", ts("2021-03-03 00:00:00"), "city B")) // change
    runToMemory(EventStreams.scd2Track(in.toDS()).toDF(), "scd2track")
    val closed = spark.table("scd2track").collect()
    assert(closed.length === 1) // exactly the closed "city A" version
    val v = closed.head
    assert(v.getAs[String]("attr") === "city A")
    assert(v.getAs[Timestamp]("effective_from") === ts("2021-03-01 00:00:00"))
    assert(v.getAs[Timestamp]("effective_to") === ts("2021-03-02 23:59:59"))
  }

  test("foreachBatch upsert sink maintains SCD1 state across triggers") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val state = s"$base/kv"
    val in = MemoryStream[(String, String)](spark)
    def drain(): Unit = {
      // the checkpoint carries offsets across triggers — without it a new
      // query replays the whole MemoryStream into one batch
      val q = EventStreams.upsertSink(in.toDF().toDF("k", "v"), state, "k", Seq("v"))
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    in.addData(("K1", "a"), ("K2", "b"))
    drain()
    in.addData(("K1", "a2"), ("K3", "c")) // K1 overwritten, K3 new
    drain()
    val got = spark.read.parquet(state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("K1" -> "a2", "K2" -> "b", "K3" -> "c"))
  }

  test("CoW upsert sink: micro-batches land at file granularity, state follows across triggers") {
    import graft.sources.WarehouseFs
    val base = java.nio.file.Files.createTempDirectory("graft_upcow_").toString
    val table = s"$base/kv"
    // bootstrap: a bloom-indexed versioned table spread over several files
    WarehouseFs.publishVersioned(
      spark.range(1000).selectExpr("concat('K', id) AS k", "'init' AS v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k")),
      table, keepVersions = 3, bloomIndexCols = Seq("k"))
    val in = MemoryStream[(String, String)](spark)
    def drain(): Unit = {
      val q = EventStreams.upsertSinkCoW(in.toDF().toDF("k", "v"), table, "k")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    in.addData(("K1", "a"), ("KNEW", "n"))
    drain()
    val batch1Dir = WarehouseFs.currentVersion(spark, table).get._2.split('/').last
    in.addData(("K1", "a2")) // overwrite across triggers
    drain()
    val got = WarehouseFs.readTable(spark, table).get
    assert(got.count() === 1001)
    val kv = got.filter(org.apache.spark.sql.functions.col("k")
        .isin("K1", "K2", "KNEW")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv === Map("K1" -> "a2", "K2" -> "init", "KNEW" -> "n"))
    // file granularity: each batch's version dir holds rewritten files
    // only, far fewer than the bootstrap's four
    val v2files = WarehouseFs.listNames(spark, s"$table/$batch1Dir")
      .count(_.endsWith(".parquet"))
    assert(v2files >= 1 && v2files <= 2,
      s"a 2-key batch must rewrite at most its matched files, got $v2files")
  }

  test("CoW upsert sink with txnAppId: a batch replayed after a crash " +
      "between the manifest commit and the checkpoint commit SKIPS — " +
      "the foreachBatch twin of the graft sink's exactly-once gate") {
    import graft.sources.WarehouseFs
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_upcow_eo_").toString
    val table = s"$base/kv"; val input = s"$base/in"; val ckpt = s"$base/ckpt"
    WarehouseFs.publishVersioned(
      spark.range(1000).selectExpr("concat('K', id) AS k", "'init' AS v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k")),
      table, keepVersions = 8, bloomIndexCols = Seq("k"))
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    def addFile(rows: (String, String)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(input)
    def drain(): Unit = {
      // a file source (not MemoryStream, which drops committed batches)
      // so the crash-simulated batch is genuinely re-deliverable
      val q = EventStreams.upsertSinkCoW(
          spark.readStream.schema(schema).parquet(input), table, "k",
          keepVersions = 8, txnAppId = Some(ckpt))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    addFile("K1" -> "a", "KNEW" -> "n")
    drain()
    val v1 = WarehouseFs.currentVersion(spark, table).get._1
    def attemptDirs() = new java.io.File(table).listFiles()
      .count(d => d.getName.matches("v\\d{8}-[0-9a-f]+"))
    val dirs1 = attemptDirs()
    // crash simulation: manifest committed, checkpoint commit marker lost
    val last = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(f => !f.getName.startsWith(".")).maxBy(_.getName.toInt)
    java.nio.file.Files.delete(last.toPath)
    val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
    drain() // replays batch 0 — the txn floor must swallow it whole
    assert(WarehouseFs.currentVersion(spark, table).get._1 === v1,
      "the replayed batch must not commit a second version")
    assert(attemptDirs() === dirs1,
      "the replay must not write a duplicate image dir")
    assert(WarehouseFs.describeHistory(spark, table).last._8 === s"$ckpt#0",
      "the landed batch's txn stamp is the history provenance")
    // the gate never over-skips: a genuinely new batch still lands
    addFile("K1" -> "a2")
    drain()
    assert(WarehouseFs.currentVersion(spark, table).get._1 === v1 + 1)
    val got = WarehouseFs.readTable(spark, table).get
      .filter(org.apache.spark.sql.functions.col("k").isin("K1", "KNEW"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("K1" -> "a2", "KNEW" -> "n"))
    assert(WarehouseFs.readTable(spark, table).get.count() === 1001)
  }

  test("streaming near-dup suppression collapses sketch-identical documents") {
    val in = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    in.addData(
      (ts("2024-01-01 00:00:00"), 1L, "The quick brown fox jumps over the lazy dog"),
      // case/whitespace variant: same normalized token stream → same sketch
      (ts("2024-01-01 00:01:00"), 2L, "the QUICK brown   fox jumps over the LAZY dog"),
      (ts("2024-01-01 00:02:00"), 3L, "a completely different document about spark joins"))
    runToMemory(EventStreams.nearDupSuppress(
      in.toDF().toDF("ts", "doc_id", "text")), "neardup")
    val survivors = spark.table("neardup").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(survivors.length === 2)
    assert(survivors.contains(3L))
  }

  test("stateful aggregation runs on the RocksDB state store (off-heap state path)") {
    // the default HDFS-backed store keeps state on the executor heap; at
    // 100 TB-scale key cardinality the production config is RocksDB
    // (off-heap, spillable, incremental checkpoints). Same query, same
    // results — the provider is a config, not a code change.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      in.addData(
        Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:05:00"), 1, "click", 2.0),
        Ev(3, ts("2024-01-01 00:11:00"), 1, "click", 4.0))
      completeToMemory(EventStreams.tumblingCounts(in.toDF()), "tumble_rocks")
      val rows = spark.table("tumble_rocks").orderBy("win_start").collect()
      assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(2L, 1L))
      assert(rows.head.getAs[Double]("sum_value") === 3.0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpoint recovery: a replayed batch converges to the clean-run state") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_recover_").toString
    val input = s"$base/in"
    val state = s"$base/kv"
    val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    def addFile(rows: (String, String)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val q = EventStreams.upsertSink(
          EventStreams.fileStream(spark, schema, input), state, "k", Seq("v"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    addFile("K1" -> "a", "K2" -> "b")
    drain()
    // crash simulation: batch 0's state is fully written but the commit
    // marker is not — the exact window between the foreachBatch upsert and
    // the checkpoint commit. On restart Spark must replay batch 0.
    val last = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(f => !f.getName.startsWith(".")).maxBy(_.getName.toInt)
    java.nio.file.Files.delete(last.toPath)
    // also the local-FS checksum sibling, else the replayed commit's
    // rewrite trips over the orphaned crc
    val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)

    addFile("K1" -> "a2", "K3" -> "c")
    drain() // replays batch 0 over already-applied state, then the new file

    val got = spark.read.parquet(state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // identical to a clean never-crashed run: scd1Apply is a fixpoint for
    // an already-applied snapshot, so the replay is absorbed
    assert(got === Map("K1" -> "a2", "K2" -> "b", "K3" -> "c"))
  }

  test("file stream with AvailableNow drains the events table incrementally") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val counts = EventStreams.fileStream(spark, schema, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("filestream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val total = spark.table("filestream").agg(sum("n")).head().getLong(0)
    assert(total === 1000)
  }
}
