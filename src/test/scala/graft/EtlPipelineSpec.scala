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
}
