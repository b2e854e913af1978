package graft

import org.apache.spark.sql.functions._
import graft.sources.WarehouseFs

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
}
