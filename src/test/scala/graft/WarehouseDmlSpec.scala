package graft

import org.apache.spark.sql.functions._
import graft.sources.WarehouseFs

/** Copy-on-write row-level DML over file-list manifests: deletes and
  * upserts rewrite ONLY the files that might contain the touched keys,
  * carry every other file by reference, keep the bloom index maintained
  * at O(rewritten), survive GC across chains, and feed the ordinary
  * reader / time-travel / change-feed / compaction surfaces unchanged.
  */
class WarehouseDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_dml_")}/t"

  /** Range-clustered 8-file fixture with a bloom index on id. */
  private def publishFixture(t: String, keepVersions: Int = 2): Unit =
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), concat(lit("u"), col("id")).as("user"),
          (col("id") % 7).as("grp"))
        .repartitionByRange(8, col("id")),
      t, keepVersions = keepVersions, bloomIndexCols = Seq("id", "user"))

  private def dirFileCount(t: String, dirName: String): Int =
    WarehouseFs.listNames(spark, s"$t/$dirName").count(_.endsWith(".parquet"))

  /** Data-dir name of the CURRENT version (CoW dirs are attempt-unique). */
  private def currentDir(t: String): String =
    WarehouseFs.currentVersion(spark, t).get._2.split('/').last

  test("deleteWhere rewrites only matching files; content, time travel, and feed stay exact") {
    val t = tmpTable()
    publishFixture(t, keepVersions = 5)
    val before = WarehouseFs.readTable(spark, t).get
      .select("id").as[Long].collect().toSet

    WarehouseFs.deleteWhere(spark, t, "id", Seq(1234L, 1250L), keepVersions = 5)

    // content parity
    val after = WarehouseFs.readTable(spark, t).get
      .select("id").as[Long].collect().toSet
    assert(after === before -- Set(1234L, 1250L))
    // both keys share one range file → exactly one file rewritten
    assert(dirFileCount(t, currentDir(t)) === 1,
      "only the bloom-matched file may be rewritten")
    // carried files still live in v1's dir, referenced not copied
    assert(dirFileCount(t, "v00000001") === 8)
    // time travel to the pre-delete version still resolves fully
    assert(WarehouseFs.readTableVersion(spark, t, 1).get.count() === 8000)
    // the change feed across the DML version is exactly the two deletes
    val feed = WarehouseFs.changeFeed(spark, t, Seq("id"), 1, 2).get
    assert(feed.select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1234L, "delete"), (1250L, "delete")))
  }

  test("bloom index is maintained through DML at O(rewritten)") {
    val t = tmpTable()
    publishFixture(t, keepVersions = 5)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(42L), keepVersions = 5)
    // surviving key: pruned read parity, still a strict file subset
    val cand = WarehouseFs.bloomCandidateFiles(spark, t, "id", Seq(7000L)).get
    assert(cand.nonEmpty && cand.size < 8)
    assert(WarehouseFs.readBloomPruned(spark, t, "id", Seq(7000L)).get
      .select("user").as[String].collect() === Array("u7000"))
    // the deleted key's file was re-indexed from surviving rows only —
    // the pruned read finds nothing
    assert(WarehouseFs.readBloomPruned(spark, t, "id", Seq(42L)).get.count() === 0)
    // string column index carried/rebuilt too
    assert(WarehouseFs.readBloomPruned(spark, t, "user", Seq("u6999")).get
      .select("id").as[Long].collect() === Array(6999L))
  }

  test("upsertRows updates matched keys in place; pure inserts touch zero existing files") {
    val t = tmpTable()
    publishFixture(t, keepVersions = 5)
    // update one existing row + insert one brand-new key
    WarehouseFs.upsertRows(
      Seq((10L, "u10_fixed", 99L), (90000L, "u90000", 99L))
        .toDF("id", "user", "grp"),
      t, "id", keepVersions = 5)
    val got = WarehouseFs.readTable(spark, t).get
    assert(got.count() === 8001)
    assert(got.filter(col("id") === 10L).select("user").as[String].collect() ===
      Array("u10_fixed"))
    assert(got.filter(col("id") === 90000L).count() === 1)

    // a pure insert whose key no file can contain rewrites nothing: the
    // new version dir holds ONLY the inserted rows' file
    WarehouseFs.upsertRows(Seq((91000L, "u91000", 99L)).toDF("id", "user", "grp"),
      t, "id", keepVersions = 5)
    assert(dirFileCount(t, currentDir(t)) === 1)
    assert(WarehouseFs.readTable(spark, t).get.count() === 8002)
    // ordinary reads keep working across the whole chain
    assert(WarehouseFs.readBloomPruned(spark, t, "id", Seq(91000L)).get.count() === 1)
  }

  test("GC keeps carried ancestor dirs alive until unreferenced; compaction folds the chain") {
    val t = tmpTable()
    publishFixture(t, keepVersions = 2)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(5L), keepVersions = 2)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(6L), keepVersions = 2)
    // manifest 1 expired (keep 2 of 3) — but v1's DIR must survive: the
    // retained file-list manifests still reference its carried files
    assert(WarehouseFs.listVersions(spark, t) === Seq(2L, 3L))
    assert(WarehouseFs.listNames(spark, t).contains("v00000001"))
    assert(WarehouseFs.readTable(spark, t).get.count() === 7998)
    assert(WarehouseFs.readTableVersion(spark, t, 2).get.count() === 7999)

    // compaction reads the resolved chain and publishes a clean dir
    // version; after one more publish the ancestor dirs fall out of
    // reference and GC finally reclaims them
    graft.operators.ScaleJoins.compactParquet(spark, t)
    assert(WarehouseFs.readTable(spark, t).get.count() === 7998)
    WarehouseFs.publishVersioned(WarehouseFs.readTable(spark, t).get, t,
      keepVersions = 1)
    val dirs = WarehouseFs.listNames(spark, t).filter(_.startsWith("v0"))
    assert(!dirs.contains("v00000001"), s"unreferenced ancestor must GC: $dirs")
    assert(WarehouseFs.readTable(spark, t).get.count() === 7998)
  }

  test("updateWhere sets expressions on matched rows only, file-granular") {
    val t = tmpTable()
    publishFixture(t, keepVersions = 5)
    WarehouseFs.updateWhere(spark, t, "id", Seq(100L, 101L),
      Map("user" -> concat(col("user"), lit("_redacted")),
          "grp" -> lit(-1L)), keepVersions = 5)
    val got = WarehouseFs.readTable(spark, t).get
    assert(got.count() === 8000)
    assert(got.filter(col("id").isin(100L, 101L))
      .select("user", "grp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("u100_redacted", -1L), ("u101_redacted", -1L)))
    // neighbors in the same rewritten file are untouched
    assert(got.filter(col("id") === 102L).select("user").as[String].collect() ===
      Array("u102"))
    // both keys share one range file → one file rewritten
    assert(dirFileCount(t, currentDir(t)) === 1)
    // unknown SET column fails loudly
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.updateWhere(spark, t, "id", Seq(1L), Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown SET columns"))
  }

  test("zone maps: range reads open only overlapping files, survive DML, GC with their version") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), concat(lit("u"), col("id")).as("user"))
        .repartitionByRange(8, col("id")),
      t, keepVersions = 5, bloomIndexCols = Seq("id"), zoneMapCols = Seq("id"))
    // range-clustered: a narrow range hits ~1 of 8 files
    val cand = WarehouseFs.zoneCandidateFiles(spark, t, "id", 2000L, 2100L).get
    assert(cand.nonEmpty && cand.size <= 2, s"zones must prune: $cand")
    val got = WarehouseFs.readRangePruned(spark, t, "id", 2000L, 2100L).get
    assert(got.count() === 101)
    assert(got.agg(min("id"), max("id")).head().toSeq === Seq(2000L, 2100L))
    // out-of-domain range: zero candidates, empty result, schema intact
    assert(WarehouseFs.zoneCandidateFiles(spark, t, "id", -50L, -1L).get.isEmpty)
    assert(WarehouseFs.readRangePruned(spark, t, "id", -50L, -1L).get.count() === 0)
    // unzoned column degrades to a full-read filter
    assert(WarehouseFs.readRangePruned(spark, t, "user", "u10", "u10").get.count() === 1)

    // DML maintains the zone map at O(rewritten): carried rows + new-dir rows
    WarehouseFs.deleteWhere(spark, t, "id", Seq(2050L), keepVersions = 5)
    val got2 = WarehouseFs.readRangePruned(spark, t, "id", 2000L, 2100L).get
    assert(got2.count() === 100)
    val cand2 = WarehouseFs.zoneCandidateFiles(spark, t, "id", 7000L, 7010L).get
    assert(cand2.nonEmpty && cand2.size <= 2, s"carried zones must keep pruning: $cand2")

    // GC drops the expired version's zone map with its manifest
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t, keepVersions = 1,
      zoneMapCols = Seq("id"))
    assert(WarehouseFs.listNames(spark, s"$t/_zones") === Seq("v00000003"))
  }

  test("zone maps over a Z-ordered layout prune range predicates on BOTH dimensions") {
    val t = tmpTable()
    val df = spark.range(20000)
      .select(col("id"), ((col("id") * 7919L) % 20000L).as("b"))
    WarehouseFs.publishVersioned(
      graft.operators.ScaleJoins.zOrderClusterN(df, Seq(col("id"), col("b")), 16),
      t, keepVersions = 2, zoneMapCols = Seq("id", "b"))
    // a narrow range on EITHER column keeps a strict subset of the 16 files
    val candA = WarehouseFs.zoneCandidateFiles(spark, t, "id", 100L, 400L).get
    val candB = WarehouseFs.zoneCandidateFiles(spark, t, "b", 100L, 400L).get
    assert(candA.size < 16 && candB.size < 16,
      s"z-order + zones must prune both dims: id=${candA.size}, b=${candB.size}")
    assert(WarehouseFs.readRangePruned(spark, t, "id", 100L, 400L).get.count() === 301)
    assert(WarehouseFs.readRangePruned(spark, t, "b", 100L, 400L).get.count() ===
      df.filter(col("b").between(100L, 400L)).count())
  }

  test("DML refuses partitioned layouts and missing tables loudly") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "day"),
      t, partitionBy = Seq("day"))
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.deleteWhere(spark, t, "id", Seq(1L))
    }
    assert(e.getMessage.contains("unpartitioned"))
    intercept[IllegalArgumentException] {
      WarehouseFs.deleteWhere(spark, s"$t-nope", "id", Seq(1L))
    }
  }

  test("committed statistics refresh through DML when the prior version carried them") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(spark.range(100).toDF("id"), t,
      keepVersions = 5, collectStats = true, bloomIndexCols = Seq("id"))
    assert(WarehouseFs.readStats(spark, t).get.rowCount === 100)
    WarehouseFs.deleteWhere(spark, t, "id", Seq(5L), keepVersions = 5)
    // the hinted-read surface must not silently degrade after a delete
    assert(WarehouseFs.readStats(spark, t).get.rowCount === 99)
    // a table published WITHOUT stats stays stats-free through DML
    val t2 = tmpTable()
    WarehouseFs.publishVersioned(spark.range(10).toDF("id"), t2,
      keepVersions = 5, bloomIndexCols = Seq("id"))
    WarehouseFs.deleteWhere(spark, t2, "id", Seq(1L), keepVersions = 5)
    assert(WarehouseFs.readStats(spark, t2).isEmpty)
  }

  test("upsertRows refuses schema drift instead of silently dropping columns") {
    val t = tmpTable()
    WarehouseFs.publishVersioned(
      Seq((1L, "a")).toDF("id", "v"), t, bloomIndexCols = Seq("id"))
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.upsertRows(Seq((1L, "b", 9)).toDF("id", "v", "extra"), t, "id")
    }
    assert(e.getMessage.contains("must equal"))
  }
}
