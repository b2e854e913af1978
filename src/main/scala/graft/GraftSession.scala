package graft

import org.apache.spark.sql.SparkSession
import graft.sources.WarehouseFs

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

  // attach() is called at the top of every SQL-entry query, and each call
  // was re-running `spark.read.parquet` (path listing + footer schema
  // inference) for all ten tables plus ten view registrations — pure
  // metadata overhead repeated per query invocation (guide §6: cache
  // file-source metadata). The work is idempotent for a given (session,
  // sfDir), so memoize it; a different sfDir on the same session (the
  // bench's warmup pass runs sf0.001 before the timed sf0.1 pass)
  // re-attaches. Weak keys: stopped test sessions drop out.
  private val attachedDir = new java.util.WeakHashMap[SparkSession, String]

  /** Idempotent per-session setup. */
  def attach(spark: SparkSession, sfDir: String): SparkSession = {
    attachedDir.synchronized {
      if (attachedDir.get(spark) == sfDir) return spark
    }
    // cost-based optimization ON: committed graft statistics (row
    // counts, NDV, null counts, equi-height histograms) reach Catalyst
    // through the DSv2 scan, and the CBO is what CONSUMES them —
    // FilterEstimation selectivity and stats-driven join reorder.
    // Stat-less temp views are unaffected: reorder requires a row count
    // on every join item and falls back to the left-deep syntactic
    // order otherwise, which is exactly the pre-CBO behavior.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
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
    attachedDir.synchronized { attachedDir.put(spark, sfDir) }
    spark
  }

  /** Register every table of a commit-set warehouse as a temp view — SQL
    * over the SERVED warehouse (the reference's users query exactly this
    * surface). The commit is resolved ONCE and every view reads that
    * commit's data dir: a publish landing mid-attach cannot produce the
    * mart(vN) ⋈ blacklist(vN−1) mixture (resolving per-table would).
    * Tables whose committed row count is at most `broadcastMaxRows` get
    * a broadcast hint — join planning from committed statistics, not
    * file-size guesses. Returns the (commit, view names) attached; None
    * when the warehouse has no commit yet. */
  def attachWarehouse(spark: SparkSession, warehouse: String,
                      broadcastMaxRows: Long = 4000000L): Option[(Long, Seq[String])] =
    WarehouseFs.currentCommit(spark, warehouse).map { case (commit, tables) =>
      val names = tables.toSeq.sortBy(_._1).map { case (t, dataPath) =>
        // dir-style entries read directly; version-pin entries resolve
        // through the member chain's manifest (file-list aware)
        val df = WarehouseFs.readCommitEntry(spark, dataPath).getOrElse(
          throw new IllegalStateException(
            s"attachWarehouse: $t resolves to an expired member version " +
              s"($dataPath) — raise the member table's keepVersions"))
        // stats resolve from the dataPath already in hand — the commit
        // file was read ONCE above, never once-per-table
        val hinted = WarehouseFs.statsForDataPath(spark, warehouse, t, dataPath) match {
          case Some(st) if st.rowCount <= broadcastMaxRows =>
            org.apache.spark.sql.functions.broadcast(df)
          case _ => df
        }
        hinted.createOrReplaceTempView(t)
        t
      }
      (commit, names)
    }
}
