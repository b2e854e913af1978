package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a cumulative aggregate table — the scalable
  * form of the reference's nightly full-mart rebuild (main.py:574-576
  * recomputes over the whole fact each run). At 100 TB rescanning history
  * every night is the dominant cost; the right shape is: aggregate ONLY
  * the new increment (one partial agg over one day's partition), then
  * merge partials into the running state (one agg over |keys| rows + the
  * day's groups). History is never re-read.
  *
  * Works for DECOMPOSABLE aggregates — those with an associative merge:
  * sum/count merge by sum, min/max by min/max. Non-decomposable metrics
  * ride on decomposable carriers: avg = merged sum ÷ merged count
  * ([[withDerivedAvg]]); distinct counts need a sketch carrier (see
  * `agg_elementwise_min`'s MinHash union for the same idea on signatures).
  *
  * Replay safety: merging the same increment twice DOUBLE-COUNTS sums —
  * unlike SCD1 this is not a fixpoint. Callers get idempotence the same
  * way the transactions fact does (EtlPipeline): gate each increment on
  * its day partition not yet being present in the state's ledger column,
  * or publish state keyed by (day watermark) via WarehouseFs.publish.
  */
object IncrementalAgg {

  /** Supported merge functions per aggregate column: the per-increment
    * partial and the state↔state merge for each. */
  private val partialFns: Map[String, Column => Column] = Map(
    "sum" -> (c => sum(c)), "count" -> (c => count(c)),
    "min" -> (c => min(c)), "max" -> (c => max(c)))
  private val mergeFns: Map[String, Column => Column] = Map(
    "sum" -> (c => sum(c)), "count" -> (c => sum(c)), // counts merge by summing
    "min" -> (c => min(c)), "max" -> (c => max(c)))

  private def outName(c: String, fn: String) = s"${fn}_$c"

  /** Partial-aggregate one increment: groupBy keys, one agg per
    * (column, fn) pair. `aggs` is (inputColumn, fn) with fn ∈
    * sum|count|min|max. */
  def partial(increment: DataFrame, keys: Seq[String],
              aggs: Seq[(String, String)]): DataFrame = {
    val cols = aggs.map { case (c, fn) =>
      partialFns(fn)(col(c)).as(outName(c, fn)) }
    increment.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Merge an increment's partials into the cumulative state. Both sides
    * carry the [[partial]] schema; the result does too, so merging is
    * closed under composition (fold any number of increments). */
  def merge(state: Option[DataFrame], increment: DataFrame, keys: Seq[String],
            aggs: Seq[(String, String)]): DataFrame = {
    val inc = partial(increment, keys, aggs)
    state match {
      case None => inc
      case Some(s) =>
        val cols = aggs.map { case (c, fn) =>
          val n = outName(c, fn)
          mergeFns(fn)(col(n)).as(n)
        }
        s.unionByName(inc).groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
    }
  }

  /** Derive an average column from merged sum/count carriers (both must be
    * in `aggs`). */
  def withDerivedAvg(state: DataFrame, c: String, as: String): DataFrame =
    state.withColumn(as, col(outName(c, "sum")) / col(outName(c, "count")))

  // --- retraction-based maintenance under a CDC change feed --------------
  //
  // [[merge]] handles APPEND-ONLY increments. When the source is a
  // versioned table whose rows also update and disappear, the right
  // increment is [[graft.sources.WarehouseFs.changeFeed]]'s row-level
  // delta — and sum/count carriers can consume it with RETRACTIONS:
  // insert/update_postimage rows add, delete/update_preimage rows
  // subtract (the classic incremental view-maintenance sign trick; the
  // pre/post pair is exactly why the feed ships both images). The state
  // carries a signed row count per group, so a group whose rows all
  // vanish drops out of the state — fold ≡ full recompute, spec-proven
  // through actual published versions. min/max do NOT retract (the new
  // extremum after deleting the current one needs history) and are
  // rejected loudly; maintain them by full recompute or a heap/sketch.

  private val RetractAdd = Seq("insert", "update_postimage")
  private val RetractSub = Seq("delete", "update_preimage")

  /** Signed partial over one change-feed batch: the retractable-state
    * schema (keys, sum_/count_ carriers, `n_rows`). Feed rows must carry
    * `_change_type`; `aggs` fns are restricted to sum|count. */
  def partialChanges(feed: DataFrame, keys: Seq[String],
                     aggs: Seq[(String, String)]): DataFrame = {
    val bad = aggs.collect { case (c, fn) if !Set("sum", "count")(fn) => s"$fn($c)" }
    require(bad.isEmpty,
      s"partialChanges: ${bad.mkString(", ")} cannot retract — only sum/count " +
        "carriers maintain under deletes/updates")
    val sign = when(col("_change_type").isin(RetractAdd: _*), lit(1L))
      .when(col("_change_type").isin(RetractSub: _*), lit(-1L))
    // sum carriers are ZERO-valued, never null, when no non-null inputs
    // remain: "all contributions retracted" and "contributions cancel to
    // 0" are indistinguishable to a signed sum, so the state defines
    // sum_c ≡ 0 over an empty input set (use the count carrier to tell
    // "no values" apart from "values summing to 0") — the property spec
    // pins fold ≡ bootstrap under exactly this normalization
    val cols = aggs.map {
      case (c, "sum") =>
        coalesce(sum(col(c) * col("__sign")), lit(0)).as(outName(c, "sum"))
      case (c, _) =>
        sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L)))
          .as(outName(c, "count"))
    } :+ sum(col("__sign")).as("n_rows")
    feed.withColumn("__sign", sign)
      .filter(col("__sign").isNotNull) // tolerate foreign change types
      .groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Fold one change-feed batch into the retractable state; groups whose
    * signed row count reaches zero leave the state, so the fold over any
    * feed sequence equals [[bootstrapRetractable]] of the final version.
    * One |keys|-row merge agg per fold — never a history re-scan. */
  def mergeChanges(state: Option[DataFrame], feed: DataFrame, keys: Seq[String],
                   aggs: Seq[(String, String)]): DataFrame = {
    val inc = partialChanges(feed, keys, aggs)
    val merged = state match {
      case None => inc
      case Some(s) =>
        val cols = aggs.map { case (c, fn) =>
          val n = outName(c, fn)
          sum(col(n)).as(n)
        } :+ sum(col("n_rows")).as("n_rows")
        s.unionByName(inc).groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
    }
    merged.filter(col("n_rows") > 0)
  }

  /** Retractable state straight from a full table snapshot — the
    * bootstrap before the first change-feed fold (equivalently: fold a
    * feed where every row is an insert). */
  def bootstrapRetractable(snapshot: DataFrame, keys: Seq[String],
                           aggs: Seq[(String, String)]): DataFrame =
    mergeChanges(None, snapshot.withColumn("_change_type", lit("insert")),
      keys, aggs)

  // --- distinct counts (non-decomposable) ride on HLL sketch carriers ----

  /** Partial for incremental DISTINCT counting: a DataSketches HLL sketch
    * per group (`hll_sketch_agg`, a few KB regardless of cardinality).
    * Sketches union with SET semantics (`hll_union_agg`): re-merging the
    * same increment is a no-op — so unlike sum/count carriers, replays
    * are absorbed (spec-proven). The union may reorganize the sketch's
    * internal representation, so a folded estimate can differ from a
    * one-pass estimate by a hair — both stay within the sketch's
    * published error of the exact count. */
  def distinctPartial(increment: DataFrame, keys: Seq[String],
                      c: String): DataFrame =
    increment.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(c)).as(s"hll_$c"))

  /** Merge distinct-sketch states (both carrying [[distinctPartial]]'s
    * schema). */
  def distinctMerge(state: Option[DataFrame], increment: DataFrame,
                    keys: Seq[String], c: String): DataFrame = {
    val inc = distinctPartial(increment, keys, c)
    state match {
      case None => inc
      case Some(s) => s.unionByName(inc).groupBy(keys.map(col): _*)
        .agg(hll_union_agg(col(s"hll_$c")).as(s"hll_$c"))
    }
  }

  /** Read the estimate off a sketch state. */
  def withDistinctEstimate(state: DataFrame, c: String, as: String): DataFrame =
    state.withColumn(as, hll_sketch_estimate(col(s"hll_$c")))
}
