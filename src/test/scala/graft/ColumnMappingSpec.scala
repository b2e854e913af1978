package graft

import org.apache.spark.sql.functions._
import graft.sources.WarehouseFs

/** RENAME / DROP COLUMN without rewriting a byte: the declared-schema
  * sidecar becomes a logical→physical column mapping (physical spelling
  * fixed at creation, like Delta's name-mode mapping). Old files keep
  * serving, DML keys on the new name, the change feed spans the rename,
  * and DROP hides bytes files still store. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_map_")}/t"

  private def publishFixture(t: String): Unit =
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), concat(lit("u"), col("id")).as("user"),
          (col("id") % 7).as("grp"))
        .repartitionByRange(8, col("id")),
      t, keepVersions = 8, bloomIndexCols = Seq("id", "user"),
      zoneMapCols = Seq("id"))

  test("RENAME COLUMN: zero data I/O, old+new files serve, DML keys on " +
      "the new name, feed spans the rename") {
    val t = tmpTable(); publishFixture(t)
    val v1 = WarehouseFs.currentVersion(spark, t).get._1
    WarehouseFs.alterRenameColumn(spark, t, "user", "username")
    // metadata-only: no new version, no new data dir
    assert(WarehouseFs.currentVersion(spark, t).get._1 === v1)
    val df = WarehouseFs.readTable(spark, t).get
    assert(df.columns.toSeq === Seq("id", "username", "grp"))
    assert(df.filter(col("id") === 42L).select("username").as[String]
      .head() === "u42")
    // new rows arrive under the LOGICAL schema; the file stores the
    // physical spelling, invisible to readers
    WarehouseFs.appendRows(
      Seq((9001L, "new9001", 0L)).toDF("id", "username", "grp"),
      t, keepVersions = 8)
    val df2 = WarehouseFs.readTable(spark, t).get
    assert(df2.count() === 8001)
    assert(df2.filter(col("id") === 9001L).select("username").as[String]
      .head() === "new9001")
    // DML keyed on the RENAMED column: the bloom index (built as 'user')
    // still prunes through the mapping
    val before = WarehouseFs.currentVersion(spark, t).get._1
    WarehouseFs.deleteWhere(spark, t, "username", Seq("u100"), keepVersions = 8)
    assert(WarehouseFs.currentVersion(spark, t).get._1 === before + 1)
    val df3 = WarehouseFs.readTable(spark, t).get
    assert(df3.count() === 8000)
    assert(df3.filter(col("username") === "u100").count() === 0)
    // change feed ACROSS the rename (v1 predates it) keys on the new name
    val feed = WarehouseFs.changeFeed(spark, t, Seq("id"),
      v1, WarehouseFs.currentVersion(spark, t).get._1).get
    assert(feed.columns.contains("username"))
    val deleted = feed.filter(col("_change_type") === "delete")
      .select("username").as[String].collect().toSet
    assert(deleted === Set("u100"))
    // time travel: pre-rename versions read under the CURRENT declaration
    assert(WarehouseFs.readTableVersion(spark, t, v1).get
      .columns.toSeq === Seq("id", "username", "grp"))
  }

  test("DSv2 scan under a mapping: logical output, filters prune through " +
      "physical indexes, stats/aggregates stay honest") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.alterRenameColumn(spark, t, "id", "ident")
    val ds = spark.read.format("graft").option("table", t).load()
    assert(ds.columns.toSeq === Seq("ident", "user", "grp"))
    // values + filters on the logical name
    assert(ds.filter(col("ident") === 42L).select("user").as[String]
      .head() === "u42")
    assert(ds.count() === 8000)
    // pushed point filter still FILE-prunes via the physical bloom/zone
    // index (8 range files; one holds ident=42)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val q = ds.filter(col("ident") === 42L)
    val scan = q.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.length < 8,
      "bloom/zone pruning must survive the rename (probe translates)")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(42L))
    // columnar path intact
    assert(scan.supportsColumnar ||
      q.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("DROP COLUMN hides bytes without touching files; re-ADD of the " +
      "dropped spelling refuses (no resurrection)") {
    val t = tmpTable(); publishFixture(t)
    val v = WarehouseFs.currentVersion(spark, t)
    WarehouseFs.alterDropColumn(spark, t, "grp")
    assert(WarehouseFs.currentVersion(spark, t) === v, "metadata-only")
    val df = WarehouseFs.readTable(spark, t).get
    assert(df.columns.toSeq === Seq("id", "user"))
    // the bytes are still in the files — prove via a raw read
    val rawDir = v.get._2
    assert(spark.read.parquet(rawDir).columns.contains("grp"),
      "DROP must not rewrite files")
    // re-ADDing the dropped spelling would resurrect old bytes: refuse
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.alterAddColumns(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("grp",
            org.apache.spark.sql.types.LongType))))
    }
    assert(e.getMessage.contains("grp"))
    // a DIFFERENT added column null-fills as usual
    WarehouseFs.alterAddColumns(spark, t,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType))))
    val df2 = WarehouseFs.readTable(spark, t).get
    assert(df2.columns.toSeq === Seq("id", "user", "tag"))
    assert(df2.select("tag").filter(col("tag").isNotNull).count() === 0)
    // DML on the narrowed table still works
    WarehouseFs.deleteWhere(spark, t, "id", Seq(7L), keepVersions = 8)
    assert(WarehouseFs.readTable(spark, t).get.count() === 7999)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN through the catalog; " +
      "SHOW CREATE TABLE shows the new name; SQL DML keys on it") {
    val n = s"map_sql_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE graft.$n (id BIGINT, user STRING, grp BIGINT) " +
      "TBLPROPERTIES('bloomIndexCols'='id', 'keepVersions'='8')")
    spark.sql(s"INSERT INTO graft.$n " +
      "SELECT id, concat('u', id), id % 7 FROM range(2000)")
    spark.sql(s"ALTER TABLE graft.$n RENAME COLUMN user TO username")
    assert(spark.table(s"graft.$n").columns.toSeq ===
      Seq("id", "username", "grp"))
    val show = spark.sql(s"SHOW CREATE TABLE graft.$n")
      .head().getString(0)
    assert(show.contains("username") && !show.contains("'user'"),
      s"SHOW CREATE TABLE must surface the new name:\n$show")
    assert(spark.sql(
      s"SELECT username FROM graft.$n WHERE id = 42").head()
      .getString(0) === "u42")
    // SQL DML keyed on the renamed column
    spark.sql(s"DELETE FROM graft.$n WHERE username = 'u100'")
    assert(spark.table(s"graft.$n").count() === 1999)
    spark.sql(s"UPDATE graft.$n SET username = 'X' WHERE id = 7")
    assert(spark.sql(s"SELECT username FROM graft.$n WHERE id = 7")
      .head().getString(0) === "X")
    // DROP COLUMN hides it from SELECT *
    spark.sql(s"ALTER TABLE graft.$n DROP COLUMN grp")
    assert(spark.table(s"graft.$n").columns.toSeq === Seq("id", "username"))
    assert(spark.table(s"graft.$n").count() === 1999)
    // INSERT under the narrowed, renamed schema
    spark.sql(s"INSERT INTO graft.$n VALUES (90001, 'fresh')")
    assert(spark.sql(
      s"SELECT username FROM graft.$n WHERE id = 90001").head()
      .getString(0) === "fresh")
    spark.sql(s"DROP TABLE graft.$n")
  }

  test("a full publish retires the mapping: files re-materialize under " +
      "logical spellings, sidecars dissolve") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.alterRenameColumn(spark, t, "user", "username")
    WarehouseFs.alterDropColumn(spark, t, "grp")
    val resolved = WarehouseFs.readTable(spark, t).get
    WarehouseFs.publishVersioned(resolved, t, keepVersions = 8,
      expectedVersion = WarehouseFs.currentVersion(spark, t).map(_._1))
    assert(WarehouseFs.columnMapping(spark, t).isEmpty,
      "the mapping dissolves once files store the logical spellings")
    val df = WarehouseFs.readTable(spark, t).get
    assert(df.columns.toSeq === Seq("id", "username"))
    assert(df.count() === 8000)
    // the once-dropped spelling is free again after the rewrite
    WarehouseFs.alterAddColumns(spark, t,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.LongType))))
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("grp").isNotNull).count() === 0,
      "re-added post-rewrite column must NOT resurrect old bytes")
  }

  test("rename collisions refuse: existing logical names and pinned " +
      "physical spellings are taken") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.alterRenameColumn(spark, t, "user", "username")
    intercept[IllegalArgumentException] {
      WarehouseFs.alterRenameColumn(spark, t, "grp", "username")
    }
    intercept[IllegalArgumentException] {
      // 'user' is still the pinned physical spelling of username
      WarehouseFs.alterRenameColumn(spark, t, "grp", "user")
    }
    intercept[IllegalArgumentException] {
      WarehouseFs.alterRenameColumn(spark, t, "nope", "x")
    }
    // and ADD of a pinned physical spelling refuses too
    intercept[IllegalArgumentException] {
      WarehouseFs.alterAddColumns(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user",
            org.apache.spark.sql.types.StringType))))
    }
  }

  test("concurrent schema DDL serializes through the epoch CAS: the " +
      "loser refuses loudly, the winner's change survives whole, the " +
      "refused DDL re-runs cleanly") {
    val t = tmpTable(); publishFixture(t)
    // the competitor's ALTER lands INSIDE the loser's derive→commit window
    WarehouseFs.ddlTestHook = Some(() =>
      WarehouseFs.alterRenameColumn(spark, t, "grp", "grp2"))
    val e = intercept[IllegalArgumentException] {
      try WarehouseFs.alterRenameColumn(spark, t, "user", "username")
      finally WarehouseFs.ddlTestHook = None
    }
    assert(e.getMessage.contains("concurrent DDL"),
      s"expected the epoch-CAS refusal, got: ${e.getMessage}")
    // the winner's change is intact; the loser applied NOTHING — the
    // exact lost-update the plain sidecar rewrite allowed
    assert(WarehouseFs.readTable(spark, t).get.columns.toSeq ===
      Seq("id", "user", "grp2"))
    WarehouseFs.alterRenameColumn(spark, t, "user", "username")
    assert(WarehouseFs.readTable(spark, t).get.columns.toSeq ===
      Seq("id", "username", "grp2"))
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("id") === 42L).select("username").as[String]
      .head() === "u42")
  }

  test("a DROP's tombstone and narrowed declaration are ONE epoch " +
      "entry — no crash window can separate them; legacy sidecars " +
      "migrate into the first epoch commit") {
    val t = tmpTable(); publishFixture(t)
    // stage a LEGACY pre-epoch table: schema.json + dropped, hand-written
    val meta = java.nio.file.Paths.get(s"$t/_meta")
    java.nio.file.Files.createDirectories(meta)
    val legacyDecl = org.apache.spark.sql.types.StructType(
      WarehouseFs.readTable(spark, t).get.schema.fields)
    java.nio.file.Files.write(meta.resolve("schema.json"),
      legacyDecl.json.getBytes("UTF-8"))
    java.nio.file.Files.write(meta.resolve("dropped"),
      "ghostcol".getBytes("UTF-8"))
    // the first new DDL migrates: one atomic entry with declaration AND
    // tombstones; legacy files delete
    WarehouseFs.alterDropColumn(spark, t, "grp")
    val dir = new java.io.File(s"$t/_meta/schema")
    val entries = dir.listFiles().map(_.getName).filter(_.matches("\\d{8}")).sorted
    assert(entries.toSeq === Seq("00000001"), s"got ${entries.toSeq}")
    val body = new String(java.nio.file.Files.readAllBytes(
      dir.toPath.resolve("00000001")), "UTF-8")
    val lines = body.linesIterator.toSeq
    assert(lines.count(_.startsWith("dropped:")) === 2 &&
      lines.contains("dropped:grp") && lines.contains("dropped:ghostcol"),
      s"tombstones must ride the same entry, got:\n$body")
    assert(lines.exists(_.contains("\"fields\"")),
      "the narrowed declaration must ride the same entry")
    assert(!java.nio.file.Files.exists(meta.resolve("schema.json")) &&
      !java.nio.file.Files.exists(meta.resolve("dropped")),
      "legacy sidecars are superseded and deleted")
    // semantics hold end-to-end: grp is hidden, ghostcol/grp blocked
    assert(WarehouseFs.readTable(spark, t).get.columns.toSeq ===
      Seq("id", "user"))
    intercept[IllegalArgumentException] {
      WarehouseFs.alterAddColumns(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ghostcol",
            org.apache.spark.sql.types.StringType))))
    }
  }

  test("a stale mapping left by a crashed retirement window resolves " +
      "harmlessly: logical fallback (API) + stale-entry pruning (DSv2)") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.alterRenameColumn(spark, t, "user", "username") // epoch 1
    val cur = WarehouseFs.currentVersion(spark, t).map(_._1)
    WarehouseFs.publishVersioned(WarehouseFs.readTable(spark, t).get, t,
      keepVersions = 8, expectedVersion = cur) // retires via epoch 2
    assert(WarehouseFs.columnMapping(spark, t).isEmpty)
    // simulate the crash BETWEEN the retiring manifest commit and the
    // retiring EPOCH commit: drop the retire entry — the stale mapping
    // (epoch 1) reappears over logical files
    val retireEntry = java.nio.file.Paths.get(s"$t/_meta/schema/00000002")
    assert(java.nio.file.Files.exists(retireEntry),
      "the retirement must have committed epoch 2")
    java.nio.file.Files.delete(retireEntry)
    assert(WarehouseFs.columnMapping(spark, t).nonEmpty, "window staged")
    val df = WarehouseFs.readTable(spark, t).get
    assert(df.columns.toSeq === Seq("id", "username", "grp"))
    assert(df.filter(col("username").isNull).count() === 0,
      "the logical-spelling fallback must resolve retired columns")
    assert(df.filter(col("id") === 42L).select("username").as[String]
      .head() === "u42")
    val ds = spark.read.format("graft").option("table", t).load()
    assert(ds.filter(col("username").isNull).count() === 0,
      "the DSv2 scan must prune the stale mapping entry")
    assert(ds.filter(col("username") === "u42").count() === 1)
    ()
  }

  test("NESTED-field DDL: ADD / widen / DROP a struct leaf through the " +
      "epoch — files keep their bytes, reads rebuild field-wise, old " +
      "and new eras serve together, resurrection refuses") {
    import org.apache.spark.sql.types._
    val t = tmpTable()
    // the multimodal `meta` shape: a struct column beside scalars
    WarehouseFs.publishVersioned(
      spark.range(2000).select(col("id"),
        struct((col("id") % 100).cast("int").as("width"),
          (col("id") % 50).cast("int").as("height"),
          concat(lit("l"), col("id") % 3).as("lang")).as("meta"))
        .repartitionByRange(4, col("id")),
      t, keepVersions = 8, bloomIndexCols = Seq("id"))
    // nested ADD: old rows read the new leaf as NULL
    WarehouseFs.alterAddColumns(spark, t,
      StructType(Seq(StructField("meta.score", DoubleType))))
    val df1 = WarehouseFs.readTable(spark, t).get
    assert(df1.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("width", "height", "lang", "score"))
    assert(df1.filter(col("meta.score").isNotNull).count() === 0)
    // a new row carries the evolved struct; both eras serve together
    WarehouseFs.appendRows(
      spark.range(9000, 9001).select(col("id"),
        struct(lit(7).as("width"), lit(8).as("height"),
          lit("lx").as("lang"), lit(0.9).as("score")).as("meta")),
      t, keepVersions = 8)
    val mixed = WarehouseFs.readTable(spark, t).get
    assert(mixed.count() === 2001)
    assert(mixed.filter(col("meta.score").isNotNull).count() === 1)
    assert(mixed.filter(col("id") === 9000L).select("meta.score")
      .as[Double].head() === 0.9)
    // nested WIDEN: int leaf under a long declaration, both eras exact
    WarehouseFs.alterWidenColumn(spark, t, "meta.width", LongType)
    val w = WarehouseFs.readTable(spark, t).get
    assert(w.schema("meta").dataType.asInstanceOf[StructType]
      .apply("width").dataType === LongType)
    assert(w.filter(col("meta.width") === 42L).count() === 20,
      "old int leaf bytes must serve under the widened declaration")
    // narrowing a leaf refuses
    intercept[IllegalArgumentException] {
      WarehouseFs.alterWidenColumn(spark, t, "meta.height", ByteType) }
    // nested DROP hides bytes the files still store
    WarehouseFs.alterDropColumn(spark, t, "meta.lang")
    val d = WarehouseFs.readTable(spark, t).get
    assert(d.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("width", "height", "score"))
    // …and the raw bytes are untouched (the epoch is metadata-only)
    val rawDirs = new java.io.File(t).listFiles()
      .filter(f => f.getName.startsWith("v") && f.isDirectory)
    val raw = spark.read.parquet(rawDirs.map(_.toString): _*)
    assert(raw.select("meta.lang").limit(1).count() === 1,
      "files must still store the dropped leaf's bytes")
    // resurrection refuses; a DIFFERENT leaf adds fine and null-fills
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.alterAddColumns(spark, t,
        StructType(Seq(StructField("meta.lang", StringType)))) }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    WarehouseFs.alterAddColumns(spark, t,
      StructType(Seq(StructField("meta.lang2", StringType))))
    assert(WarehouseFs.readTable(spark, t).get
      .filter(col("meta.lang2").isNotNull).count() === 0)
    // DSv2 parity over the whole evolution
    val ds = spark.read.format("graft").option("table", t).load()
    assert(ds.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("width", "height", "score", "lang2"))
    assert(ds.filter(col("meta.width") === 42L).count() === 20)
    assert(ds.filter(col("id") === 9000L).select("meta.score")
      .as[Double].head() === 0.9)
    // MoR: a masked file reconciles identically to clean ones (id 42's
    // width IS 42 — masking it must drop exactly one width-42 row)
    WarehouseFs.deleteWhereVectors(spark, t, "id", Seq(42L), keepVersions = 8)
    val m = WarehouseFs.readTable(spark, t).get
    assert(m.count() === 2000)
    assert(m.filter(col("id") === 42L).count() === 0)
    assert(m.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("width", "height", "score", "lang2"))
    assert(m.filter(col("meta.width") === 42L).count() === 19,
      "the masked read must rebuild structs exactly like the clean one")
  }

  test("NESTED-field DDL through SQL: ADD COLUMNS (meta.x), ALTER " +
      "COLUMN meta.w TYPE BIGINT, DROP COLUMN meta.y; leaf RENAME " +
      "still refuses") {
    import org.apache.spark.sql.types._
    val n = s"nested_sql_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE graft.$n (id BIGINT, " +
      "meta STRUCT<w: INT, h: INT>) TBLPROPERTIES('keepVersions'='6')")
    spark.sql(s"INSERT INTO graft.$n VALUES (1, named_struct('w', 10, 'h', 20))")
    spark.sql(s"ALTER TABLE graft.$n ADD COLUMNS (meta.x STRING)")
    spark.sql(s"ALTER TABLE graft.$n ALTER COLUMN meta.w TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.$n DROP COLUMN meta.h")
    val got = spark.table(s"graft.$n")
    assert(got.schema("meta").dataType.asInstanceOf[StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("w", LongType), ("x", StringType)))
    assert(got.select("meta.w").as[Long].head() === 10L)
    // the evolved schema writes through SQL too
    spark.sql(s"INSERT INTO graft.$n VALUES " +
      "(2, named_struct('w', CAST(99 AS BIGINT), 'x', 'hello'))")
    assert(spark.sql(s"SELECT meta.x FROM graft.$n WHERE id = 2")
      .head().getString(0) === "hello")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$n RENAME COLUMN meta.w TO wide") }
    assert(e.getMessage.contains("nested"), e.getMessage)
    spark.sql(s"DROP TABLE graft.$n")
  }
}
