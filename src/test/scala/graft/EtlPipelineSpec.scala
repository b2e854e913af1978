package graft

import org.apache.spark.sql.functions._

/** End-to-end replay of the reference's 3 shipped days through the full
  * pipeline (feeds → SCD2/SCD1/fact → fraud mart), with re-run idempotence.
  */
class EtlPipelineSpec extends SparkSpec {
  private val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString

  private lazy val firstRun: Unit =
    EtlPipeline.run(spark, refDir, wh, None)

  test("golden counts after 3 days: 155 hist rows, 47116 tx, 24 blacklist") {
    firstRun
    assert(spark.read.parquet(s"$wh/dwh_dim_terminals_hist").count() === 155)
    assert(spark.read.parquet(s"$wh/dwh_fact_transactions").count() === 47116)
    assert(spark.read.parquet(s"$wh/dwh_fact_pssprt_blcklst").count() === 24)
    assert(spark.read.parquet(s"$wh/rep_fraud").count() > 0)
  }

  test("transactions fact is partitioned by day (partition pruning)") {
    firstRun
    val days = new java.io.File(s"$wh/dwh_fact_transactions").list()
      .filter(_.startsWith("day=")).sorted
    assert(days.toSeq === Seq("day=2021-03-01", "day=2021-03-02", "day=2021-03-03"))
  }

  test("re-running the whole pipeline is a no-op (idempotent loads)") {
    firstRun
    val histBefore = spark.read.parquet(s"$wh/dwh_dim_terminals_hist").collect().toSet
    EtlPipeline.run(spark, refDir, wh, None)
    assert(spark.read.parquet(s"$wh/dwh_fact_transactions").count() === 47116)
    assert(spark.read.parquet(s"$wh/dwh_dim_terminals_hist").collect().toSet === histBefore)
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

  test("three incremental nightly runs equal one full rebuild (mart parity)") {
    firstRun
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val whFull = s"$tmp/wh_full"; val whInc = s"$tmp/wh_inc"; val bank = s"$tmp/bank"
    val days = Seq("01032021", "02032021", "03032021")
    for ((d, i) <- days.zipWithIndex) {
      val fd = new java.io.File(s"$tmp/feeds_${i + 1}"); fd.mkdirs()
      for (f <- new java.io.File(refDir).listFiles() if f.getName.contains(d))
        java.nio.file.Files.copy(f.toPath, fd.toPath.resolve(f.getName))
    }
    def asOf(i: Int) = java.sql.Timestamp.valueOf(s"2021-03-0$i 23:59:00")
    // full rebuild: all three days in one run; its demo bank fixture
    // (deterministic over the complete fact) is exported so the
    // incremental warehouse sees the IDENTICAL dimension rows
    EtlPipeline.run(spark, refDir, whFull, None, Some(asOf(3)))
    val (cl, ac, cd) = EtlPipeline.demoBankTables(spark, whFull)
    cl.write.parquet(s"$bank/clients.parquet")
    ac.write.parquet(s"$bank/accounts.parquet")
    cd.write.parquet(s"$bank/cards.parquet")
    // one nightly run per feed day
    for (i <- 1 to 3)
      EtlPipeline.run(spark, s"$tmp/feeds_$i", whInc, Some(bank), Some(asOf(i)))
    val full = spark.read.parquet(s"$whFull/rep_fraud").drop("report_dt")
    val inc = spark.read.parquet(s"$whInc/rep_fraud").drop("report_dt")
    assert(inc.count() === full.count())
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
  }
}
