package graft

import org.apache.spark.sql.functions._

/** Long-lived partitioned tables accumulate schema drift (a feed adds a
  * column mid-history). The scalable posture: additive evolution via
  * parquet mergeSchema — old partitions read the new column as NULL, no
  * rewrite of history.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions day partitions with an added column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/day=2021-03-01")
    Seq((3L, "c", 9.5)).toDF("id", "v", "score")
      .write.parquet(s"$dir/day=2021-03-02")

    val merged = spark.read.option("mergeSchema", true)
      .option("basePath", dir).parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("day", "id", "score", "v"))
    assert(merged.count() === 3)
    // old partitions surface the new column as NULL
    assert(merged.filter(col("day") === "2021-03-01" && col("score").isNull).count() === 2)
    assert(merged.filter(col("score").isNotNull).count() === 1)
    // partition pruning still works on the evolved table
    val p = merged.filter(col("day") === "2021-03-02").queryExecution
      .executedPlan.toString
    assert(!p.contains("day=2021-03-01"), p)
  }
}
