package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md / FIXTURES.md §B).
  *
  * All ten driver tables are plain parquet files; reading them through one
  * helper keeps the scan declarative so Catalyst pushes projections and
  * filters into the parquet reader (verified via `.explain`: `PushedFilters`
  * and a pruned `ReadSchema`). At 100 TB these would be partitioned
  * directories; `spark.read.parquet(dir)` is unchanged, and every query in
  * [[Queries]] is written so day/key filters sit directly on source columns
  * and remain prunable.
  */
object Tables {
  // Catalog-style METADATA memoization (guide §6: repeated listings are
  // driver-side overhead — table formats cache file/schema metadata).
  // `spark.read.parquet` re-lists the path and re-reads the parquet footer
  // for schema inference on EVERY call; the bench/verify harnesses invoke
  // each of the 162 queries repeatedly, so the same immutable testdata
  // file was being re-inspected thousands of times per run. The memoized
  // DataFrame pins the resolved relation (file listing + schema); every
  // query still plans and EXECUTES from the parquet bytes — no results or
  // intermediates are cached. Keyed weakly on the session so stopped test
  // sessions drop their entries, and per-path so multi-SF runs coexist.
  private val metaCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]

  private def cacheFor(spark: SparkSession) = metaCache.synchronized {
    var m = metaCache.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
      metaCache.put(spark, m)
    }
    m
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cacheFor(spark).getOrElseUpdate(s"$sfDir/$name.parquet",
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalizes to a BIGINT of epoch-NANOSECONDS at the source —
    * the representation every downstream query derives windows/sessions
    * from with exact integer arithmetic, and the one the DuckDB oracle
    * (which reads the same file as TIMESTAMP and converts with
    * epoch_us/epoch_ns) agrees with deterministically.
    *
    * Generator vintages differ: TIMESTAMP(NANOS) parquet arrives as ns
    * longs via spark.sql.legacy.parquet.nanosAsLong; TIMESTAMP(MICROS)
    * arrives as TimestampNTZ and is converted here (the session is pinned
    * UTC, so the NTZ→LTZ cast under unix_micros is value-preserving).
    * Scale note: `ts` becomes a derived column, so a raw min/max filter
    * on it no longer reaches the parquet scan — day-granularity pruning
    * belongs on a partition column at 100 TB anyway (EtlPipeline's mart
    * layout), and every query here filters on derived day/window keys.
    */
  def events(s: SparkSession, d: String): DataFrame =
    cacheFor(s).getOrElseUpdate(s"$d/events.parquet#ns", {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$d/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw
        case _ => raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts AS timestamp)) * 1000"))
      }
    })
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
