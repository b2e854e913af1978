package graft

import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("quality gate keeps a sane fraction and only high-score docs") {
    val kept = TextPipeline.qualityFilter(docs)
    assert(kept.count() > 0 && kept.count() < docs.count())
    assert(kept.filter(col("quality_score") < 2).count() === 0)
  }

  test("canonical dedup keeps exactly one doc per near-dup cluster") {
    val deduped = TextPipeline.dedupCanonical(docs)
    val pairs = graft.operators.DedupOps
      .minhashNearDups(docs, "doc_id", "text", 0.5).select("a_id", "b_id")
    val nonCanonical = graft.operators.DedupClusters
      .clusterLabels(docs, "doc_id", pairs)
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(deduped.count() === docs.count() - nonCanonical)
    // survivors must contain no near-dup pair entirely inside them
    val survivors = deduped.select("doc_id").as[Long].collect().toSet
    val intact = pairs.collect()
      .count(r => survivors(r.getLong(0)) && survivors(r.getLong(1)))
    assert(intact === 0)
  }

  test("keepBest curation ships each cluster's top-scoring doc") {
    val gated = TextPipeline.qualityFilter(docs)
    val best = TextPipeline.dedupCanonical(gated, keepBest = true)
    val minId = TextPipeline.dedupCanonical(gated)
    // same clusters either way → same number of survivors
    assert(best.count() === minId.count())
    // every keepBest survivor scores >= every doc in its cluster
    val pairs = graft.operators.DedupOps
      .minhashNearDups(gated, "doc_id", "text", 0.5).select("a_id", "b_id")
    val labels = graft.operators.DedupClusters.clusterLabels(gated, "doc_id", pairs)
    val byCluster = gated.join(labels, "doc_id")
      .select("cluster_id", "doc_id", "quality_score").collect()
      .groupBy(_.getLong(0))
    val bestIds = best.select("doc_id").as[Long].collect().toSet
    byCluster.values.foreach { rows =>
      val maxScore = rows.map(_.getInt(2)).max
      val winner = rows.filter(r => bestIds(r.getLong(1)))
      assert(winner.length === 1)
      assert(winner.head.getInt(2) === maxScore)
    }
  }

  test("curate output carries a split and is deterministic") {
    val a = TextPipeline.curate(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextPipeline.curate(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("incremental curation over three nightly batches equals the batch pipeline") {
    val docs = Tables.documents(spark, sf0001)
    // each night persists the state (sigs + pre-banded + labels) and the
    // next night reads it back — the actual production loop, so schema
    // drift or a state table that only works in-memory fails here
    val root = java.nio.file.Files.createTempDirectory("graft_curation_state").toString
    var st = TextPipeline.emptyState(spark)
    (0 to 2).foreach { i =>
      st = TextPipeline.curateIncrement(
        st, docs.filter(pmod(col("doc_id"), lit(3)) === i))
      TextPipeline.saveState(st, s"$root/night$i")
      st = TextPipeline.loadState(spark, s"$root/night$i")
    }
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val inc = keep(TextPipeline.curatedFromState(st, docs))
    val full = keep(TextPipeline.curate(docs))
    assert(inc === full)
    assert(inc.nonEmpty)
    // the best-representative policy folds identically
    val incBest = keep(TextPipeline.curatedFromState(st, docs, keepBest = true))
    val fullBest = keep(TextPipeline.curate(docs, keepBest = true))
    assert(incBest === fullBest)
  }

  test("semantic stage composes into curate; 3-batch fold with state round-trip matches") {
    // fixture: doc 1 LEXdup doc 2 (one token changed), doc 2 SEMdup
    // doc 3 (near-identical embeddings, disjoint vocabulary) — the
    // chain only a SINGLE clustering over the union edge set collapses
    // to one representative; sequential lexical-then-semantic stages
    // would ship two. Docs 4-7 are singletons on orthogonal axes;
    // doc 8 fails the quality gate.
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    def qtext(tag: String) = s"the start ${words(tag)} the end"
    val baseA = qtext("alpha")
    def axis(i: Int, eps: Float = 0f) =
      Array.tabulate(8)(j => (if (j == i) 1f else 0f) + (if (j == 7) eps else 0f))
    val rows = Seq(
      (1L, baseA, axis(0)),
      (2L, baseA.replace("alpha7 ", "alpha7x "), axis(1)),
      (3L, qtext("gamma"), axis(1, eps = 1e-3f)),
      (4L, qtext("delta"), axis(2)),
      (5L, qtext("epsil"), axis(3)),
      (6L, qtext("zeta"), axis(4)),
      (7L, qtext("eta"), axis(5)),
      (8L, "too short", axis(6)))
    val all = rows.toDF("doc_id", "text", "embedding").cache()
    // the quantizer is trained ONCE and the same stage drives the batch
    // pipeline and every fold — the persisted-index contract
    val model = graft.operators.AnnOps.ivfTrain(
      all.select(col("doc_id").as("vec_id"), col("embedding")), nCells = 2)
    val stage = TextPipeline.SemanticStage.ivf(model, threshold = 0.9)
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = keep(TextPipeline.curate(all, semantic = Some(stage)))
    // chain {1,2,3} collapses to min-id 1; singletons 4-7 survive; 8 gated
    assert(full.keySet === Set(1L, 4L, 5L, 6L, 7L))
    // without the semantic stage doc 3 (lexically unique) would survive
    val lexOnly = keep(TextPipeline.curate(all))
    assert(lexOnly.keySet === Set(1L, 3L, 4L, 5L, 6L, 7L))
    // three nightly folds, persisting state (incl. the cell-partitioned
    // vec store) each night and reading it back
    val root = java.nio.file.Files.createTempDirectory("graft_sem_state").toString
    var st = TextPipeline.emptyState(spark)
    (0 to 2).foreach { i =>
      st = TextPipeline.curateIncrement(
        st, all.filter(pmod(col("doc_id"), lit(3)) === i), semantic = Some(stage))
      TextPipeline.saveState(st, s"$root/night$i")
      st = TextPipeline.loadState(spark, s"$root/night$i")
    }
    assert(keep(TextPipeline.curatedFromState(st, all)) === full)
    // the best-representative policy folds identically too
    assert(keep(TextPipeline.curatedFromState(st, all, keepBest = true)) ===
      keep(TextPipeline.curate(all, keepBest = true, semantic = Some(stage))))
  }

  test("subBits skew defense: deterministic sub-split keeps batch/incremental parity") {
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    def qtext(tag: String) = s"the start ${words(tag)} the end"
    def axis(i: Int, eps: Float = 0f) =
      Array.tabulate(8)(j => (if (j == i) 1f else 0f) + (if (j == 7) eps else 0f))
    val rows = Seq(
      (1L, qtext("alpha"), axis(0)),
      (2L, qtext("beta"), axis(0)),            // semdup of 1
      (3L, qtext("gamma"), axis(1, eps = 1e-3f)),
      (4L, qtext("delta"), axis(1)),           // semdup of 3
      (5L, qtext("epsil"), axis(2)),
      (6L, qtext("zeta"), axis(3)),
      (7L, qtext("eta"), axis(4)))
    val all = rows.toDF("doc_id", "text", "embedding").cache()
    val model = graft.operators.AnnOps.ivfTrain(
      all.select(col("doc_id").as("vec_id"), col("embedding")), nCells = 2)
    // the sub-split is a pure per-vector function, so the batch pipeline
    // and the nightly fold agree on the SAME (possibly reduced) edge set
    val stage = TextPipeline.SemanticStage.ivf(model, threshold = 0.9, subBits = 2)
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = keep(TextPipeline.curate(all, semantic = Some(stage)))
    assert(full.nonEmpty)
    val root = java.nio.file.Files.createTempDirectory("graft_subbits_state").toString
    var st = TextPipeline.emptyState(spark)
    (0 to 2).foreach { i =>
      st = TextPipeline.curateIncrement(
        st, all.filter(pmod(col("doc_id"), lit(3)) === i), semantic = Some(stage))
      TextPipeline.saveState(st, s"$root/night$i")
      st = TextPipeline.loadState(spark, s"$root/night$i")
    }
    assert(keep(TextPipeline.curatedFromState(st, all)) === full)
    // the capped edge set is a subset of the uncapped one (sub-bucketing
    // only ever drops pairs, never invents them); exact dups survive it
    val assigned = graft.operators.AnnOps.ivfAssign(
      all.select(col("doc_id").as("vec_id"), col("embedding")), model)
    def pairSet(p: org.apache.spark.sql.DataFrame) =
      p.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairSet(graft.operators.AnnOps.semanticDupPairs(assigned, 0.9, subBits = 2))
    val uncapped = pairSet(graft.operators.AnnOps.semanticDupPairs(assigned, 0.9))
    assert(capped.subsetOf(uncapped))
    assert(capped.contains((1L, 2L)), "identical vectors must co-bucket at any bit width")
  }

  test("semantic fold survives a first batch with zero embeddings (empty vecs store round-trip)") {
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    def qtext(tag: String) = s"the start ${words(tag)} the end"
    def axis(i: Int) = Array.tabulate(8)(j => if (j == i) 1f else 0f)
    val rows = Seq(
      (1L, qtext("alpha"), None),
      (2L, qtext("beta"), None),
      (3L, qtext("gamma"), Some(axis(1))),
      (4L, qtext("delta"), Some(axis(1))),     // semdup of 3
      (5L, qtext("epsil"), Some(axis(2))))
    val all = rows.toDF("doc_id", "text", "embedding").cache()
    val model = graft.operators.AnnOps.ivfTrain(
      all.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding")), nCells = 2)
    val stage = TextPipeline.SemanticStage.ivf(model, threshold = 0.9)
    val root = java.nio.file.Files.createTempDirectory("graft_emptyvecs").toString
    // night 0: only null-embedding docs → the vecs store has ZERO rows; a
    // dynamically-partitioned empty write emits no part files, so the
    // reload must come from the explicit schema, not inference
    var st = TextPipeline.curateIncrement(TextPipeline.emptyState(spark),
      all.filter(col("doc_id") <= 2), semantic = Some(stage))
    TextPipeline.saveState(st, s"$root/night0")
    st = TextPipeline.loadState(spark, s"$root/night0")
    st = TextPipeline.curateIncrement(st,
      all.filter(col("doc_id") > 2), semantic = Some(stage))
    TextPipeline.saveState(st, s"$root/night1")
    st = TextPipeline.loadState(spark, s"$root/night1")
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val inc = keep(TextPipeline.curatedFromState(st, all))
    assert(inc === keep(TextPipeline.curate(all, semantic = Some(stage))))
    assert(inc.nonEmpty)
  }

  test("saveState rejects a non-integral vecs cell column loudly") {
    val badVecs = Seq((1L, Array(1f, 0f), "catA"), (2L, Array(0f, 1f), "catB"))
      .toDF("vec_id", "embedding", "cell")
    val st = TextPipeline.emptyState(spark).copy(vecs = Some(badVecs))
    val root = java.nio.file.Files.createTempDirectory("graft_badcell").toString
    val e = intercept[IllegalArgumentException] {
      TextPipeline.saveState(st, s"$root/night0")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("foreachBatch nightly curation: stream fold + checkpoint restart equals the batch pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf0001)
    val parts = (0 to 2).map(i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .select("doc_id", "text").as[(Long, String)].collect().toSeq)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_curation").toString
    val stateRoot = s"$root/state"
    val in = MemoryStream[(Long, String)](spark)
    def start() = TextPipeline
      .curateIncrementStream(in.toDF().toDF("doc_id", "text"), stateRoot)
      .option("checkpointLocation", s"$root/ckpt").start()
    // nights 1 and 2 under one query…
    val q1 = start()
    in.addData(parts(0)); q1.processAllAvailable()
    in.addData(parts(1)); q1.processAllAvailable()
    q1.stop()
    // …then a restart from the checkpoint picks up night 3 — the fold
    // must resume from persisted state, not from scratch
    val q2 = start()
    in.addData(parts(2)); q2.processAllAvailable()
    q2.stop()
    val st = TextPipeline.loadLatestState(spark, stateRoot).get
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamed = keep(TextPipeline.curatedFromState(st, docs))
    val full = keep(TextPipeline.curate(docs))
    assert(streamed === full)
    assert(streamed.nonEmpty)
    // superseded label markers are GC'd: only N-1 and N survive…
    val dirs = graft.sources.WarehouseFs.listNames(spark, stateRoot)
      .filter(_.startsWith("batch="))
    assert(dirs.length <= 2, dirs.toString)
    // …while every batch's delta persists (the append-only store): the
    // nightly write cost is O(batch) + the narrow labels, never the
    // O(corpus) signature store
    val deltas = graft.sources.WarehouseFs.listNames(spark, stateRoot)
      .filter(_.startsWith("delta="))
    assert(deltas.length === 3, deltas.toString)
  }

  test("curation stream replay: a re-delivered batch whose marker already " +
      "committed SKIPS the whole recompute — zero duplicate state bytes, " +
      "and the fold continues exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sf0001)
    val parts = (0 to 1).map(i =>
      docs.filter(pmod(col("doc_id"), lit(2)) === i).select("doc_id", "text"))
    val root = java.nio.file.Files.createTempDirectory("graft_cur_eo_").toString
    val stateRoot = s"$root/state"; val input = s"$root/in"
    val ckpt = s"$root/ckpt"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def addPart(i: Int): Unit =
      parts(i).coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val q = TextPipeline.curateIncrementStream(
          spark.readStream.schema(schema).parquet(input), stateRoot)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    addPart(0); drain()
    // snapshot the whole persisted state: names AND mtimes — a replay
    // that recomputes-but-overwrites would keep names while touching
    // mtimes; the marker gate must touch NOTHING
    def snapshot(): Map[String, Long] = {
      val out = scala.collection.mutable.Map.empty[String, Long]
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(stateRoot))
        .iterator()
      while (it.hasNext) {
        val p = it.next()
        out(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }
    val before = snapshot()
    assert(before.keys.exists(_.contains("batch=0")))
    // crash simulation: fold 0 committed its marker, the checkpoint
    // commit did not land
    val last = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(f => !f.getName.startsWith(".")).maxBy(_.getName.toInt)
    java.nio.file.Files.delete(last.toPath)
    val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
    drain() // re-delivers batch 0 — the marker gate must skip it whole
    assert(snapshot() === before,
      "the replayed fold must write NOTHING — same files, same mtimes")
    // the gate never over-skips: night 2 folds normally on top
    addPart(1); drain()
    val st = TextPipeline.loadLatestState(spark, stateRoot).get
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(TextPipeline.curatedFromState(st, docs)) ===
      keep(TextPipeline.curate(docs)),
      "fold-through-replay must equal the batch pipeline exactly")
    assert(graft.sources.WarehouseFs.listNames(spark, stateRoot)
      .count(_.startsWith("delta=")) === 2, "one delta per real fold")
  }

  test("delta-layout state: 3 folds write O(batch) deltas; parity holds; uncommitted delta invisible") {
    val docs = Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_delta_state").toString
    var st = TextPipeline.emptyState(spark)
    (0 to 2).foreach { i =>
      st = TextPipeline.curateIncrement(
        st, docs.filter(pmod(col("doc_id"), lit(3)) === i))
      TextPipeline.saveStateDelta(st, root, i.toLong)
      st = TextPipeline.loadLatestState(spark, root).get
    }
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(TextPipeline.curatedFromState(st, docs)) ===
      keep(TextPipeline.curate(docs)))
    // crash simulation: a delta landed but its marker never committed —
    // readers must resolve the previous fold, ignoring the orphan delta
    val stBefore = TextPipeline.loadLatestState(spark, root).get
    val sigsBefore = stBefore.sigs.count()
    val orphan = TextPipeline.curateIncrement(stBefore,
      docs.limit(0)) // an empty batch still writes a (zero-row) delta
    val d = orphan.delta.get
    d.sigs.write.parquet(s"$root/delta=9/sigs")
    d.bands.write.parquet(s"$root/delta=9/bands")
    val reread = TextPipeline.loadLatestState(spark, root).get
    assert(reread.sigs.count() === sigsBefore) // delta=9 not referenced by any marker
    // re-delivery then overwrites the orphan and commits — fold resumes
    val redelivered = TextPipeline.curateIncrement(reread, docs.limit(0))
    TextPipeline.saveStateDelta(redelivered, root, 9L)
    assert(TextPipeline.loadLatestState(spark, root).get.sigs.count() === sigsBefore)
  }

  test("delta save refuses a legacy full-state root; asFullDelta migrates it losslessly") {
    val docs = Tables.documents(spark, sf0001)
    val legacyRoot = java.nio.file.Files.createTempDirectory("graft_legacy_root").toString
    val st1 = TextPipeline.curateIncrement(TextPipeline.emptyState(spark),
      docs.filter(pmod(col("doc_id"), lit(3)) === 0))
    TextPipeline.saveState(st1, s"$legacyRoot/batch=0") // pre-delta layout
    // folding ON with the delta layout under the same root would union
    // empty-prefix deltas and GC the only full store copy — must refuse
    val next = TextPipeline.curateIncrement(
      TextPipeline.loadLatestState(spark, legacyRoot).get,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1))
    val e = intercept[IllegalArgumentException] {
      TextPipeline.saveStateDelta(next, legacyRoot, 1L)
    }
    assert(e.getMessage.contains("LEGACY"), e.getMessage)
    // migration: legacy state re-persists as delta 0 under a FRESH root,
    // and the fold continues there with full parity
    val freshRoot = java.nio.file.Files.createTempDirectory("graft_migrated_root").toString
    TextPipeline.saveStateDelta(
      TextPipeline.loadLatestState(spark, legacyRoot).get.asFullDelta, freshRoot, 0L)
    var st = TextPipeline.loadLatestState(spark, freshRoot).get
    (1 to 2).foreach { i =>
      st = TextPipeline.curateIncrement(st, docs.filter(pmod(col("doc_id"), lit(3)) === i))
      TextPipeline.saveStateDelta(st, freshRoot, i.toLong)
      st = TextPipeline.loadLatestState(spark, freshRoot).get
    }
    def keep(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(TextPipeline.curatedFromState(st, docs)) ===
      keep(TextPipeline.curate(docs)))
  }

  test("streaming curation end-to-end: quality gate + online near-dup + split (RocksDB, AvailableNow)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    def ts(s: String) = Timestamp.valueOf(s)
    val goodText = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet field while the morning light settles " +
      "softly on the hills").trim
    val otherText = ("the measured throughput of the cluster improves when " +
      "the shuffle stays small and the partitions remain balanced across " +
      "all the executors during the run").trim
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, Long, String)](spark)
      in.addData(
        (ts("2024-01-01 00:00:00"), 1L, goodText),
        (ts("2024-01-01 00:00:10"), 2L, goodText),   // near-identical → suppressed
        (ts("2024-01-01 00:01:00"), 3L, "too short to pass"), // quality-gated out
        (ts("2024-01-01 00:02:00"), 4L, otherText))
      val stream = TextPipeline.curateStream(
        in.toDF().toDF("ts", "doc_id", "text"))
      val q = stream.writeStream.format("memory").queryName("curated_stream")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table("curated_stream")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // doc 2 (same sketch as 1) and doc 3 (fails the gate) are gone
      assert(out.keySet === Set(1L, 4L), out.toString)
      // split labels equal the BATCH pipeline's for the same keys — the
      // md5-bucket split is a pure function of doc_id, stream or batch
      val batchSplit = graft.operators.Sampling.trainValTestSplit(
        Seq(1L, 4L).toDF("doc_id"), "doc_id")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      assert(out === batchSplit)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming decontamination gate drops benchmark-contaminated docs online") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    def ts(s: String) = Timestamp.valueOf(s)
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"))
      .toDF("doc_id", "text")
    val bloom = TextPipeline.evalShingleBloom(evalDocs, numBits = 1 << 14)
    // both pass the quality gate; only one embeds an eval 8-gram
    val contaminated = "the data pipeline speaks alpha beta gamma delta " +
      "epsilon zeta eta theta while the remaining tokens keep the sentence " +
      "long enough for the quality gate to pass"
    val clean = "the measured throughput of the cluster improves when the " +
      "shuffle stays small and the partitions remain balanced across all " +
      "the executors during the run"
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    in.addData(
      (ts("2024-01-01 00:00:00"), 1L, contaminated),
      (ts("2024-01-01 00:01:00"), 2L, clean))
    val q = TextPipeline.curateStream(in.toDF().toDF("ts", "doc_id", "text"),
        evalBloom = Some(bloom))
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("decon_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(2L), s"contaminated doc must be gated out, got $out")
    // and without the bloom both flow through (the gate, not the quality
    // filter, is what dropped doc 1)
    val in2 = MemoryStream[(Timestamp, Long, String)](spark)
    in2.addData(
      (ts("2024-01-01 00:00:00"), 1L, contaminated),
      (ts("2024-01-01 00:01:00"), 2L, clean))
    val q2 = TextPipeline.curateStream(in2.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("decon_stream_off")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val out2 = spark.table("decon_stream_off").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out2 === Set(1L, 2L), out2.toString)
  }
}
