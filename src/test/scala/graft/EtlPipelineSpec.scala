package graft

import org.apache.spark.sql.functions._

/** End-to-end replay of the reference's 3 shipped days through the full
  * pipeline (feeds → SCD2/SCD1/fact → fraud mart), with re-run idempotence.
  */
class EtlPipelineSpec extends SparkSpec {
  private val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString

  private lazy val firstRun: Unit =
    EtlPipeline.run(spark, refDir, wh, None)

  /** Served-table read across publish modes (atomic is the default, so
    * commit-set resolution leads; the fact stays a plain path). */
  private def served(whDir: String, name: String) =
    EtlPipeline.readServed(spark, whDir, name).get

  test("golden counts after 3 days: 155 hist rows, 47116 tx, 24 blacklist") {
    firstRun
    assert(served(wh, "dwh_dim_terminals_hist").count() === 155)
    assert(spark.read.parquet(s"$wh/dwh_fact_transactions").count() === 47116)
    assert(served(wh, "dwh_fact_pssprt_blcklst").count() === 24)
    assert(served(wh, "rep_fraud").count() > 0)
  }

  test("transactions fact is partitioned by day (partition pruning)") {
    firstRun
    val days = new java.io.File(s"$wh/dwh_fact_transactions").list()
      .filter(_.startsWith("day=")).sorted
    assert(days.toSeq === Seq("day=2021-03-01", "day=2021-03-02", "day=2021-03-03"))
  }

  test("re-running the whole pipeline is a no-op (idempotent loads)") {
    firstRun
    val histBefore = served(wh, "dwh_dim_terminals_hist").collect().toSet
    EtlPipeline.run(spark, refDir, wh, None)
    assert(spark.read.parquet(s"$wh/dwh_fact_transactions").count() === 47116)
    assert(served(wh, "dwh_dim_terminals_hist").collect().toSet === histBefore)
  }

  test("file-name day extraction matches the reference's DDMMYYYY scheme") {
    assert(EtlPipeline.dayOf("transactions_01032021.txt") === "2021-03-01")
    assert(EtlPipeline.dayOf("terminals_31122021.xlsx") === "2021-12-31")
  }

  test("factSlice prunes the fact scan to the day window (PartitionFilters)") {
    firstRun
    import org.apache.spark.sql.execution.FileSourceScanExec
    val factDir = s"$wh/dwh_fact_transactions"
    val slice = EtlPipeline.factSlice(spark, factDir,
      java.sql.Date.valueOf("2021-03-02"), java.sql.Date.valueOf("2021-03-03"))
    slice.collect() // populate this plan's own scan metrics
    val scan = slice.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    def parquetFilesUnder(p: java.io.File): Int =
      Option(p.listFiles()).toSeq.flatten.map {
        case d if d.isDirectory => parquetFilesUnder(d)
        case f if f.getName.endsWith(".parquet") => 1
        case _ => 0
      }.sum
    val total = parquetFilesUnder(new java.io.File(factDir))
    val read = scan.metrics("numFiles").value
    assert(read < total, s"scan read $read of $total files — no pruning")
    assert(slice.select("day").distinct().count() === 2)
  }

  /** Stage a feed dir holding exactly `files` (reference file names). */
  private def stageFeeds(dir: String, files: Seq[String]): String = {
    val fd = new java.io.File(dir); fd.mkdirs()
    for (n <- files)
      java.nio.file.Files.copy(new java.io.File(refDir, n).toPath, fd.toPath.resolve(n))
    dir
  }
  private def asOf(i: Int) = java.sql.Timestamp.valueOf(s"2021-03-0$i 23:59:00")
  private def exportBank(whFull: String, bank: String): Unit = {
    val (cl, ac, cd) = EtlPipeline.demoBankTables(spark, whFull)
    cl.write.parquet(s"$bank/clients.parquet")
    ac.write.parquet(s"$bank/accounts.parquet")
    cd.write.parquet(s"$bank/cards.parquet")
  }
  private def assertMartParity(whInc: String, whFull: String): Unit = {
    val full = served(whFull, "rep_fraud").drop("report_dt")
    val inc = served(whInc, "rep_fraud").drop("report_dt")
    assert(inc.count() === full.count())
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
  }
  private def txFile(d: Int) = f"transactions_0${d}032021.txt"
  private def termFile(d: Int) = f"terminals_0${d}032021.xlsx"
  private def blFile(d: Int) = f"passport_blacklist_0${d}032021.xlsx"

  test("three incremental nightly runs equal one full rebuild (mart parity)") {
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val whFull = s"$tmp/wh_full"; val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    for (i <- 1 to 3)
      stageFeeds(s"$tmp/feeds_$i", Seq(txFile(i), termFile(i), blFile(i)))
    // full rebuild: all three days in one run; its demo bank fixture
    // (deterministic over the complete fact) is exported so the
    // incremental warehouse sees the IDENTICAL dimension rows
    EtlPipeline.run(spark, refDir, whFull, None, Some(asOf(3)))
    exportBank(whFull, bank)
    // one nightly run per feed day
    for (i <- 1 to 3)
      EtlPipeline.run(spark, s"$tmp/feeds_$i", whInc, Some(bank), Some(asOf(i)))
    assertMartParity(whInc, whFull)
  }

  test("backfilling a day after its successor equals the full rebuild (crossing pairs recovered)") {
    // day 1's transactions arrive LAST (a late batch): day 2's original run
    // could not pair day1→day2 midnight-crossing city hops (the reference
    // data has 4 such pairs; day2→day3 has none), so the backfill run must
    // re-derive day 2 (right-edge extension) and anti-join the mart so
    // only the recovered pairs are appended
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_ooo_").toString
    val whFull = s"$tmp/wh_full"; val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    // dims (terminals/passport) arrive on days 2 and 3 in BOTH warehouses —
    // only the transactions feed is late, so dim state matches exactly
    val fullFeeds = stageFeeds(s"$tmp/feeds_full",
      Seq(termFile(2), termFile(3), blFile(2), blFile(3), txFile(1), txFile(2), txFile(3)))
    EtlPipeline.run(spark, fullFeeds, whFull, None, Some(asOf(3)))
    exportBank(whFull, bank)
    stageFeeds(s"$tmp/feeds_2", Seq(termFile(2), blFile(2), txFile(2)))
    stageFeeds(s"$tmp/feeds_3", Seq(termFile(3), blFile(3), txFile(3)))
    stageFeeds(s"$tmp/feeds_1late", Seq(txFile(1)))
    EtlPipeline.run(spark, s"$tmp/feeds_2", whInc, Some(bank), Some(asOf(2)))
    EtlPipeline.run(spark, s"$tmp/feeds_3", whInc, Some(bank), Some(asOf(3)))
    val day2Before = served(whInc, "rep_fraud")
      .filter(to_date(col("event_dt")) === lit(java.sql.Date.valueOf("2021-03-02"))).count()
    EtlPipeline.run(spark, s"$tmp/feeds_1late", whInc, Some(bank), Some(asOf(4)))
    val day2After = served(whInc, "rep_fraud")
      .filter(to_date(col("event_dt")) === lit(java.sql.Date.valueOf("2021-03-02"))).count()
    // the extension actually recovered crossing pairs (the data has them)
    assert(day2After > day2Before, s"no day-2 events recovered ($day2Before)")
    assertMartParity(whInc, whFull)
  }

  test("loading day1+day3 with day2 already present equals the full rebuild (no dup events)") {
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_gap_").toString
    val whFull = s"$tmp/wh_full"; val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    val fullFeeds = stageFeeds(s"$tmp/feeds_full",
      Seq(termFile(2), blFile(2), txFile(1), txFile(2), txFile(3)))
    EtlPipeline.run(spark, fullFeeds, whFull, None, Some(asOf(3)))
    exportBank(whFull, bank)
    stageFeeds(s"$tmp/feeds_2", Seq(termFile(2), blFile(2), txFile(2)))
    stageFeeds(s"$tmp/feeds_13", Seq(txFile(1), txFile(3)))
    EtlPipeline.run(spark, s"$tmp/feeds_2", whInc, Some(bank), Some(asOf(2)))
    // one run loading two non-contiguous days around the existing one:
    // two windows; day2 must not be re-reported (anti-join), day1→day2
    // crossings must be recovered via the first window's extension
    EtlPipeline.run(spark, s"$tmp/feeds_13", whInc, Some(bank), Some(asOf(3)))
    assertMartParity(whInc, whFull)
  }

  test("a second run under the same report_dt keeps the first run's mart rows") {
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_same_").toString
    val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    EtlPipeline.run(spark, refDir, s"$tmp/wh_seed", None, Some(asOf(3)))
    exportBank(s"$tmp/wh_seed", bank)
    stageFeeds(s"$tmp/feeds_1", Seq(termFile(1), blFile(1), txFile(1)))
    stageFeeds(s"$tmp/feeds_2", Seq(txFile(2)))
    // both batches land on the same calendar day → same report_dt partition
    EtlPipeline.run(spark, s"$tmp/feeds_1", whInc, Some(bank), Some(asOf(2)))
    val afterFirst = served(whInc, "rep_fraud").collect().toSet
    assert(afterFirst.nonEmpty)
    EtlPipeline.run(spark, s"$tmp/feeds_2", whInc, Some(bank),
      Some(java.sql.Timestamp.valueOf("2021-03-02 23:59:30")))
    val afterSecond = served(whInc, "rep_fraud").collect().toSet
    assert(afterFirst.subsetOf(afterSecond),
      s"${afterFirst.size - (afterFirst & afterSecond).size} rows lost by dynamic overwrite")
    assert(afterSecond.size > afterFirst.size) // day 2 events arrived
  }

  test("z-ordered fact day: terminal-scoped query skips most row groups") {
    firstRun
    import org.apache.spark.sql.execution.FileSourceScanExec
    val factPath = s"$wh/dwh_fact_transactions"
    // recluster one day into 8 files so the pruner has row groups to skip
    // (the nightly path sizes by bytes — tiny test data would give 1 file)
    EtlPipeline.zOrderFactDays(spark, factPath, Seq("2021-03-01"), filesPerDay = Some(16))
    val day = java.sql.Date.valueOf("2021-03-01")
    val fact = spark.read.parquet(factPath)
    val dayRows = fact.filter(col("day") === lit(day)).count()
    // deterministic terminal choice: an arbitrary head() picks whatever
    // partition answers first, and terminals whose z-range straddles more
    // row-group boundaries materialize more — the suite-order-dependent
    // flake r6 hit (57% materialized in-suite, <50% isolated)
    val term = fact.filter(col("day") === lit(day)).select("terminal")
      .orderBy("terminal").head().getString(0)
    val q = fact.filter(col("day") === lit(day) && col("terminal") === lit(term))
    val hits = q.count()
    assert(hits > 0)
    q.collect()
    val scan = q.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metrics("numFiles").value === 16, "partition pruning to the one day")
    // pushed terminal filter skips row groups whose min/max exclude it:
    // the scan materializes only surviving groups, a fraction of the day
    val materialized = scan.metrics("numOutputRows").value
    assert(materialized < dayRows / 2,
      s"row-group pruning materialized $materialized of $dayRows day rows")
  }

  test("manifest-publish mode: full pipeline runs on the pointer-file layout") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_mf_").toString
    spark.conf.set("spark.graft.etl.manifestPublish", "true")
    try {
      EtlPipeline.run(spark, refDir, wh, None, Some(asOf(3)))
      // SCD tables live under versioned dirs with a pointer, not a flat dir
      import graft.sources.WarehouseFs
      assert(WarehouseFs.currentVersion(spark, s"$wh/dwh_dim_terminals_hist").isDefined)
      assert(WarehouseFs.readTable(spark, s"$wh/dwh_dim_terminals_hist").get.count() === 155)
      assert(WarehouseFs.readTable(spark, s"$wh/dwh_fact_pssprt_blcklst").get.count() === 24)
      assert(spark.read.parquet(s"$wh/rep_fraud").count() > 0)
      // idempotent re-run, same as the rename-swap layout
      EtlPipeline.run(spark, refDir, wh, None, Some(asOf(3)))
      assert(WarehouseFs.readTable(spark, s"$wh/dwh_dim_terminals_hist").get.count() === 155)
    } finally spark.conf.unset("spark.graft.etl.manifestPublish")
  }

  test("atomic-commit mode: served tables flip in ONE commit; mid-publish state invisible; carry-forward by reference") {
    firstRun // non-atomic baseline mart in `wh` for content parity
    import graft.sources.WarehouseFs
    val tmp = java.nio.file.Files.createTempDirectory("graft_wh_ac_").toString
    val whA = s"$tmp/wh"
    spark.conf.set("spark.graft.etl.atomicCommit", "true")
    try {
      EtlPipeline.run(spark, refDir, whA, None, Some(asOf(3)))
      val (c1, t1) = WarehouseFs.currentCommit(spark, whA).get
      assert(t1.keySet === Set("dwh_dim_terminals_hist", "dwh_fact_pssprt_blcklst", "rep_fraud"))
      assert(WarehouseFs.readCommitted(spark, whA, "dwh_dim_terminals_hist").get.count() === 155)
      assert(WarehouseFs.readCommitted(spark, whA, "dwh_fact_pssprt_blcklst").get.count() === 24)
      // mart content parity with the per-table-publish pipeline
      val aMart = WarehouseFs.readCommitted(spark, whA, "rep_fraud").get.drop("report_dt")
      val bMart = served(wh, "rep_fraud").drop("report_dt")
      assert(aMart.exceptAll(bMart).count() === 0)
      assert(bMart.exceptAll(aMart).count() === 0)
      // the run's private staging area is gone after the commit
      assert(!WarehouseFs.hasData(spark, s"$whA/_work"))

      // simulated crash MID-publish: a phase-1 data dir exists but no
      // commit file references it — a reader still resolves EVERY table
      // through commit c1; the half-published state is invisible (this is
      // the "mart(vN) ⋈ blacklist(vN−1)" anomaly the commit set prevents:
      // tables can only flip when the single commit file lands)
      val orphan = new java.io.File(s"$whA/dwh_fact_pssprt_blcklst/c99999998")
      orphan.mkdirs()
      java.nio.file.Files.write(orphan.toPath.resolve("part-orphan.parquet"),
        Array[Byte](1, 2, 3))
      assert(WarehouseFs.currentCommit(spark, whA).get === ((c1, t1)))

      // idempotent re-run: only the blacklist re-applies → commit c1+1;
      // the untouched mart and terminal history carry forward BY
      // REFERENCE — same data dir name, zero data I/O
      EtlPipeline.run(spark, refDir, whA, None, Some(asOf(3)))
      val (c2, t2) = WarehouseFs.currentCommit(spark, whA).get
      assert(c2 === c1 + 1)
      assert(t2("rep_fraud") === t1("rep_fraud"))
      assert(t2("dwh_dim_terminals_hist") === t1("dwh_dim_terminals_hist"))
      assert(WarehouseFs.readCommitted(spark, whA, "dwh_fact_pssprt_blcklst").get.count() === 24)
      assert(WarehouseFs.readCommitted(spark, whA, "rep_fraud").get.count() > 0)
      // a reader pinned to c1 still sees the mutually consistent OLD set
      assert(WarehouseFs.commitVersion(spark, whA, c1).get._2 === t1)
      // the orphan from the simulated crash was garbage-collected
      assert(!orphan.exists())
      // committed statistics ride with the commit set: changed tables get
      // fresh stats, carried tables resolve the stats of the data dir
      // their commit line re-references
      val blStats = WarehouseFs.readCommittedStats(spark, whA, "dwh_fact_pssprt_blcklst").get
      assert(blStats.rowCount === 24)
      assert(blStats.column("passport_num").get.nNonNull === 24)
      val martStats = WarehouseFs.readCommittedStats(spark, whA, "rep_fraud").get
      assert(martStats.rowCount ===
        WarehouseFs.readCommitted(spark, whA, "rep_fraud").get.count())
      // SQL over the served warehouse: one attach = one commit snapshot,
      // every view consistent, committed stats hinting broadcasts
      val (attachedCommit, views) = GraftSession.attachWarehouse(spark, whA).get
      assert(attachedCommit === c2)
      assert(views.toSet === t2.keySet)
      val joined = spark.sql(
        """SELECT count(*) AS n FROM rep_fraud r
           JOIN dwh_fact_pssprt_blcklst b ON r.passport = b.passport_num""")
      joined.collect()
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // the investigation access path: a bloom-indexed point lookup on
      // the served mart returns exactly the passport's fraud events
      val somePassport = WarehouseFs.readCommitted(spark, whA, "rep_fraud").get
        .select("passport").head().getString(0)
      val lookedUp = WarehouseFs.readCommittedBloomPruned(
        spark, whA, "rep_fraud", "passport", Seq(somePassport)).get
      assert(lookedUp.count() ===
        WarehouseFs.readCommitted(spark, whA, "rep_fraud").get
          .filter(col("passport") === somePassport).count())
      assert(lookedUp.columns.contains("report_dt"),
        "partition column must survive the indexed read")
    } finally spark.conf.unset("spark.graft.etl.atomicCommit")
  }

  test("versioned commit sets: a small blacklist day feeds file-granular; unchanged tables re-pin") {
    import graft.sources.WarehouseFs
    val tmp = java.nio.file.Files.createTempDirectory("graft_wh_vcs_").toString
    val whV = s"$tmp/wh"
    stageFeeds(s"$tmp/feeds_12", Seq(termFile(1), termFile(2),
      blFile(1), blFile(2), txFile(1), txFile(2)))
    stageFeeds(s"$tmp/feeds_3", Seq(blFile(3))) // a blacklist-only nightly
    EtlPipeline.run(spark, s"$tmp/feeds_12", whV, None, Some(asOf(2)))
    val (c1, t1) = WarehouseFs.currentCommit(spark, whV).get
    assert(t1.values.forall(_.contains("/@")),
      s"served tables must commit as version pins, got $t1")
    val blBefore = WarehouseFs
      .readCommitted(spark, whV, "dwh_fact_pssprt_blcklst").get.count()

    EtlPipeline.run(spark, s"$tmp/feeds_3", whV, None, Some(asOf(3)))
    val (c2, t2) = WarehouseFs.currentCommit(spark, whV).get
    assert(c2 === c1 + 1)
    // untouched members re-pin their version — ZERO data I/O, total
    // cross-commit file sharing by entry equality
    assert(t2("dwh_dim_terminals_hist") === t1("dwh_dim_terminals_hist"))
    assert(t2("rep_fraud") === t1("rep_fraud"))
    val blAfter = WarehouseFs
      .readCommitted(spark, whV, "dwh_fact_pssprt_blcklst").get.count()
    assert(blAfter > blBefore, "day 3 must add blacklist entries")

    // the commit feed of the changed member is FILE-GRANULAR: the two
    // pinned manifests share every untouched file, so the diff scans
    // only the rewritten file + its replacement — never the table
    val feed = WarehouseFs.changeFeedCommitted(spark, whV,
      "dwh_fact_pssprt_blcklst", Seq("passport_num"), c1, c2).get
    val feedRows = feed.collect()
    assert(feedRows.length === (blAfter - blBefore),
      "a cumulative-feed day must surface as exactly its added entries")
    assert(feedRows.forall(_.getAs[String]("_change_type") == "insert"))
    assert(feed.inputFiles.length <= 2,
      s"the feed must scan only non-shared files, read: ${feed.inputFiles.toSeq}")
    // the changed member itself shares its untouched files across commits
    val blPath = s"$whV/dwh_fact_pssprt_blcklst"
    def pinOf(entry: String) = entry.substring(entry.lastIndexOf("/@") + 2).toLong
    val fFrom = WarehouseFs.readTableVersion(spark, blPath,
      pinOf(t1("dwh_fact_pssprt_blcklst"))).get.inputFiles.toSet
    val fTo = WarehouseFs.readTableVersion(spark, blPath,
      pinOf(t2("dwh_fact_pssprt_blcklst"))).get.inputFiles.toSet
    assert((fFrom -- fTo).size <= 1,
      s"at most one file of the prior blacklist version may rewrite: ${fFrom -- fTo}")

    // an idempotent re-run seals a carry-forward commit: every pin equal
    EtlPipeline.run(spark, s"$tmp/feeds_3", whV, None, Some(asOf(3)))
    val (c3, t3) = WarehouseFs.currentCommit(spark, whV).get
    assert(c3 === c2 + 1 && t3 === t2,
      "a no-change run must re-pin every member version unchanged")

    // maintenance cadence: the blacklist's CoW chain spans 2 dirs after
    // its day-3 sync; with a 1-dir budget the next run folds it back to
    // one clean dir version and pins the compacted state — same rows
    assert(WarehouseFs.versionSpanDirs(spark, blPath) === Some(2))
    val rowsBefore = WarehouseFs.readTable(spark, blPath).get
      .collect().map(_.toSeq).toSet
    withConf("spark.graft.etl.compactSpanDirs" -> "1") {
      EtlPipeline.run(spark, s"$tmp/feeds_3", whV, None, Some(asOf(3)))
    }
    assert(WarehouseFs.versionSpanDirs(spark, blPath) === Some(1),
      "past-budget chains must fold before the seal")
    assert(WarehouseFs.readTable(spark, blPath).get
      .collect().map(_.toSeq).toSet === rowsBefore)
    val (_, t4) = WarehouseFs.currentCommit(spark, whV).get
    assert(pinOf(t4("dwh_fact_pssprt_blcklst")) >
      pinOf(t3("dwh_fact_pssprt_blcklst")),
      "the commit must pin the compacted version")

    // mask-budget trigger: a merge-on-read delete masks rows while the
    // dir span stays AT the budget (a high-frequency MoR workload can
    // mask thousands of rows in tiny deltas without ever tripping the
    // span rule) — `compactMaskedRows` folds it clean at the next run
    val keyC = WarehouseFs.readTable(spark, blPath).get.columns.head
    val vKey = WarehouseFs.readTable(spark, blPath).get
      .select(keyC).head().get(0)
    WarehouseFs.deleteMatchingVectors(spark, blPath,
      org.apache.spark.sql.functions.col(keyC) === vKey, keepVersions = 4)
    assert(WarehouseFs.hasDeletionVectors(spark, blPath))
    withConf("spark.graft.etl.compactMaskedRows" -> "0",
      "spark.graft.etl.compactSpanDirs" -> "64") {
      EtlPipeline.run(spark, s"$tmp/feeds_3", whV, None, Some(asOf(3)))
    }
    assert(!WarehouseFs.hasDeletionVectors(spark, blPath),
      "the mask-row budget must trip the fold even inside the span budget")
    // content: the run's sync re-reconciles to the day-3 feed (the
    // source of truth re-inserts the out-of-band-deleted row), and the
    // fold preserves exactly that state
    assert(WarehouseFs.readTable(spark, blPath).get
      .collect().map(_.toSeq).toSet === rowsBefore)
  }

  test("a legacy plain-dir warehouse upgrades in place on its first default (atomic) run") {
    import graft.sources.WarehouseFs
    val tmp = java.nio.file.Files.createTempDirectory("graft_wh_legacy_").toString
    val whL = s"$tmp/wh"
    // day 1 lands under the LEGACY per-table layout (explicit opt-out)
    spark.conf.set("spark.graft.etl.atomicCommit", "false")
    try {
      EtlPipeline.run(spark, refDir, whL, None, Some(asOf(1)))
    } finally spark.conf.unset("spark.graft.etl.atomicCommit")
    assert(WarehouseFs.currentCommit(spark, whL).isEmpty, "legacy: no commit set")
    val legacyHist = spark.read.parquet(s"$whL/dwh_dim_terminals_hist")
      .collect().toSet
    // day 2 runs with the DEFAULT — the migration read path picks the
    // plain dirs up and the run's single commit lifts them into the set
    EtlPipeline.run(spark, refDir, whL, None, Some(asOf(2)))
    val (_, tables) = WarehouseFs.currentCommit(spark, whL).get
    assert(tables.keySet === Set(
      "dwh_dim_terminals_hist", "dwh_fact_pssprt_blcklst", "rep_fraud"))
    // the upgraded history CONTAINS day 1's legacy rows (SCD2 carried them)
    val upgraded = WarehouseFs.readCommitted(spark, whL, "dwh_dim_terminals_hist")
      .get.collect().toSet
    assert(legacyHist.subsetOf(upgraded),
      s"${legacyHist.size - (legacyHist & upgraded).size} legacy rows lost in upgrade")
    // and a third run keeps working on the commit chain, idempotently
    EtlPipeline.run(spark, refDir, whL, None, Some(asOf(2)))
    assert(WarehouseFs.readCommitted(spark, whL, "dwh_fact_pssprt_blcklst")
      .get.count() > 0)
  }

  test("a retroactive blacklist entry re-derives only the affected days (parity with rebuild)") {
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_retro_").toString
    val whFull = s"$tmp/wh_full"; val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    val fullFeeds = stageFeeds(s"$tmp/feeds_full",
      Seq(termFile(1), termFile(2), termFile(3), blFile(1), blFile(3),
          txFile(1), txFile(2), txFile(3)))
    EtlPipeline.run(spark, fullFeeds, whFull, None, Some(asOf(3)))
    exportBank(whFull, bank)
    // all three transaction days with only day 1's blacklist…
    stageFeeds(s"$tmp/feeds_main", Seq(termFile(1), termFile(2), termFile(3),
      blFile(1), txFile(1), txFile(2), txFile(3)))
    EtlPipeline.run(spark, s"$tmp/feeds_main", whInc, Some(bank), Some(asOf(3)))
    val before = served(whInc, "rep_fraud").count()
    // …then day 3's cumulative blacklist arrives with NO new transactions:
    // its entries with entry_dt on days 2-3 are retroactive
    stageFeeds(s"$tmp/feeds_bl3", Seq(blFile(3)))
    EtlPipeline.run(spark, s"$tmp/feeds_bl3", whInc, Some(bank), Some(asOf(4)))
    val after = served(whInc, "rep_fraud").count()
    assert(after > before, "retroactive entries produced no new rule-1 events")
    assertMartParity(whInc, whFull)
  }
}
