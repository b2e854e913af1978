package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse filesystem operations through the Hadoop `FileSystem` API.
  *
  * The reference engine manages its warehouse with local-disk calls
  * (main.py:544-572 — glob, os.rename into Archive/). At 100 TB the
  * warehouse lives on HDFS/S3/GCS, where `java.io.File` paths simply do
  * not exist; every state probe, feed listing and snapshot swap must go
  * through `org.apache.hadoop.fs.FileSystem`, which resolves the scheme
  * per-path (file://, hdfs://, s3a://) from the Spark session's Hadoop
  * configuration. On a local run these helpers degrade to the local
  * filesystem — same behavior, portable API.
  *
  * The other half is the snapshot-rewrite discipline: `SaveMode.Overwrite`
  * onto a live table is delete-then-write, so a concurrent reader can see
  * a half-written table for the whole duration of the job. [[publish]]
  * replaces that window with two metadata-only renames: write the full new
  * state to `<table>.tmp` (the job streams old files → new files, no
  * checkpoint materialization), then `rename(table, table.old)` +
  * `rename(table.tmp, table)`. A reader now sees the complete old table,
  * or the complete new table, or (for the microseconds between the two
  * renames) a fail-fast missing path — never partial data. If the write
  * fails, the live table is untouched.
  */
object WarehouseFs {

  /** Resolve the `FileSystem` owning `path` from the session's Hadoop conf
    * (scheme-aware: file://, hdfs://, s3a://…). */
  def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Child entry names of `dir` (not recursive), sorted; empty if absent.
    * One `listStatus` RPC — no scan, no collect. */
  def listNames(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq.sorted
  }

  /** Does `dir` exist and contain at least one data entry (ignoring
    * `_SUCCESS`-style markers and hidden files)? The "has this table been
    * loaded yet" probe — pure namenode metadata, no file reads. */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = fsFor(spark, dir)
    fs.exists(p) && fs.getFileStatus(p).isDirectory &&
      fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
  }

  /** Total bytes of `.parquet` files under `dir` (recursive). Drives
    * compaction sizing; uses the FileSystem's remote iterator so object
    * stores page the listing instead of materializing it. */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) return 0L
    var total = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) total += st.getLen
    }
    total
  }

  /** Delete `path` recursively if present. */
  def deleteIfExists(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Atomically publish `df` as the new content of `target` (parquet).
    *
    * Steps: (1) write the complete new state to `<target>.tmp` — the only
    * long-running phase, and the live table is untouched throughout (a
    * failure here leaves the old table fully readable); (2) rename the old
    * table aside; (3) rename tmp into place; (4) drop the old copy.
    * Renames are metadata-only on HDFS (and directory moves locally), so
    * the non-readable window is two namenode operations, not a job
    * duration. Leftover `.tmp`/`.old` from a previous crash are cleared
    * first, making the publish idempotent under retry.
    *
    * Because the new state is written to a sibling path, `df` may read
    * from `target` itself (the SCD snapshot-rewrite pattern): the job
    * streams old files to new files with no `localCheckpoint`
    * materialization of the intermediate table.
    */
  def publish(df: DataFrame, target: String,
              partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val (fs, tgt) = fsFor(spark, target)
    val tmp = new Path(target + ".tmp")
    val old = new Path(target + ".old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    if (fs.exists(tgt))
      require(fs.rename(tgt, old), s"publish: rename $tgt -> $old failed")
    require(fs.rename(tmp, tgt), s"publish: rename $tmp -> $tgt failed")
    if (fs.exists(old)) fs.delete(old, true)
    ()
  }
}
