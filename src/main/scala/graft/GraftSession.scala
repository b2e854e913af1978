package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: registers the testdata tables as temp views and the
  * engine's custom functions (cosine_f32 / dot_f32 / l2norm_f32), so the
  * whole operator surface is reachable from `spark.sql(...)` — the
  * reference's users write SQL (shipped to Oracle); here the same SQL runs
  * on Catalyst with the engine's extensions in scope.
  */
object GraftSession {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Idempotent per-session setup. */
  def attach(spark: SparkSession, sfDir: String): SparkSession = {
    TableNames.foreach {
      case "events" => // ns timestamps need the nanosAsLong conf (Tables.events)
        Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t =>
        Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    org.apache.spark.sql.graft.TextHashExpressions.register(spark)
    org.apache.spark.sql.graft.AggExpressions.register(spark)
    org.apache.spark.sql.graft.ZOrderExpressions.register(spark)
    org.apache.spark.sql.graft.SketchExpressions.register(spark)
    org.apache.spark.sql.graft.BloomExpressions.register(spark)
    org.apache.spark.sql.graft.TopKSketch.register(spark)
    spark
  }
}
