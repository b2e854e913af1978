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
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as a long of epoch-nanoseconds instead
    * (spark.sql.legacy.parquet.nanosAsLong). This is also the deterministic
    * choice for the DuckDB oracle: DuckDB keeps ns precision (epoch_ns),
    * while converting to Spark's µs TimestampType would truncate.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
