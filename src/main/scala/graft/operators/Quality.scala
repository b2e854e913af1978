package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks and profiling — the validation pass a pipeline
  * runs before publishing a table.
  *
  * Scale shape: [[profile]] computes every column's metrics in ONE
  * aggregation over ONE scan (multiple exact count-distincts plan through
  * Catalyst's Expand — row multiplication ×columns, still a single pass;
  * swap in approx_count_distinct for very wide tables). [[checkUnique]] is
  * one keyed aggregation; [[orphans]] is one anti join. Nothing collects
  * to the driver.
  */
object Quality {

  /** Per-column profile: non-null count, distinct count, min/max
    * (stringified so heterogeneous column types share one schema).
    * Output: (col_name, n_nonnull, n_distinct, min_str, max_str).
    *
    * `exact = true` uses `countDistinct`, which Catalyst plans through an
    * Expand — one extra row per distinct-agg per input row. Fine for a
    * handful of columns; on a wide table at 100 TB that ×N row
    * multiplication dominates the scan, so `exact = false` swaps in
    * `approx_count_distinct` (HyperLogLog++, ~2% relative error, fixed
    * 2^`rsd` sketch per column): no Expand, still one pass, constant
    * memory per column regardless of cardinality.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame =
    profileImpl(df, cols, exact, withCount = false)

  /** [[profile]] plus the exact table row count from the SAME single
    * scan, emitted as a leading `col_name = "*"` row (n_nonnull = row
    * count, the other fields null). This is the persistable statistics
    * form manifest commits attach to a published table
    * ([[graft.sources.WarehouseFs.publishVersioned]]): one scan buys the
    * row count AND every column's NDV/min/max. */
  def profileWithCount(df: DataFrame, cols: Seq[String],
                       exact: Boolean = true): DataFrame =
    profileImpl(df, cols, exact, withCount = true)

  /** Equi-height histograms for the NUMERIC, DATE, and TIMESTAMP
    * columns of `cols` — the ANALYZE-grade selectivity input min/max
    * alone cannot give on skewed data. Two aggregation passes over one
    * scan each (the standard ANALYZE shape): approx percentiles fix
    * the `bins` boundaries, then per-bin approx NDVs land in ONE wide
    * conditional aggregation (bins × columns HLL sketches — bounded
    * memory, no Expand). Returns col → bins as (lo, hi, ndv); all-null
    * and other-typed columns are absent. Bin bounds live in each
    * type's CBO double domain — numerics as themselves, dates as DAYS
    * since epoch (`unix_date`), timestamps as MICROSECONDS since epoch
    * (`unix_micros`): exactly the values Catalyst's FilterEstimation
    * compares literals in, so a skewed `report_dt`/`trans_date` filter
    * estimates bins-accurate instead of uniform. The scale conversion
    * happens ONCE here; everything downstream is already double. */
  def equiHeightHistograms(df: DataFrame, cols: Seq[String], bins: Int)
      : Map[String, Seq[(Double, Double, Long)]] = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    require(bins >= 2 && bins <= 1000, s"histogram bins out of range: $bins")
    def numSql(c: String): Option[String] = df.schema(c).dataType match {
      case _: NumericType => Some(s"cast(`$c` AS double)")
      case DateType => Some(s"cast(unix_date(`$c`) AS double)")
      case TimestampType => Some(s"cast(unix_micros(`$c`) AS double)")
      case _ => None
    }
    val numeric = cols.flatMap(c => numSql(c).map(c -> _))
    if (numeric.isEmpty) return Map.empty
    val pcts = (0 to bins).map(i => i.toDouble / bins)
    val pctAggs = numeric.map { case (c, v) =>
      expr(s"approx_percentile($v, " +
        s"array(${pcts.mkString(",")}), 10000)").as(s"${c}__p")
    }
    val prow = df.agg(pctAggs.head, pctAggs.tail: _*).head()
    val boundaries: Seq[(String, String, Seq[Double])] = numeric.flatMap {
      case (c, vSql) =>
        val i = prow.fieldIndex(s"${c}__p")
        if (prow.isNullAt(i)) None // all-null column
        else Some((c, vSql, prow.getSeq[Double](i)))
    }
    if (boundaries.isEmpty) return Map.empty
    val ndvAggs = boundaries.flatMap { case (c, vSql, bs) =>
      val v = expr(vSql)
      (0 until bins).map { i =>
        // Spark's bin convention: (lo, hi] with the first bin closed
        val inBin =
          if (i == 0) v >= bs(0) && v <= bs(1)
          else v > bs(i) && v <= bs(i + 1)
        approx_count_distinct(when(inBin, v)).as(s"${c}__b$i")
      }
    }
    val nrow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
    boundaries.map { case (c, _, bs) =>
      c -> (0 until bins).map(i =>
        (bs(i), bs(i + 1), nrow.getLong(nrow.fieldIndex(s"${c}__b$i"))))
    }.toMap
  }

  private def profileImpl(df: DataFrame, cols: Seq[String], exact: Boolean,
                          withCount: Boolean): DataFrame = {
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"${c}__n"),
          nd.as(s"${c}__nd"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
    } ++ (if (withCount) Seq(count(lit(1)).as("__rows")) else Nil)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val countRow =
      if (!withCount) Nil
      else Seq(struct(lit("*").as("col_name"),
                      col("__rows").as("n_nonnull"),
                      lit(null).cast("long").as("n_distinct"),
                      lit(null).cast("string").as("min_str"),
                      lit(null).cast("string").as("max_str")))
    val entries = countRow ++ cols.map { c =>
      struct(lit(c).as("col_name"),
             col(s"${c}__n").as("n_nonnull"),
             col(s"${c}__nd").as("n_distinct"),
             col(s"${c}__min").as("min_str"),
             col(s"${c}__max").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select("p.col_name", "p.n_nonnull", "p.n_distinct", "p.min_str", "p.max_str")
  }

  /** Declarative expectations (dbt-test style): each rule is a boolean
    * Column that every row must satisfy; the result is ONE row of
    * violation counts, all rules evaluated in a single scan + single
    * aggregate (no per-rule passes — at 100 TB the table is read once
    * regardless of how many rules are attached). A rule referencing
    * another table (referential integrity) belongs in [[orphans]], which
    * is join-shaped by nature.
    */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map { case (name, rule) =>
      count_if(!coalesce(rule, lit(false))).as(s"viol_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Key combinations that violate uniqueness, with their multiplicity.
    * Empty result = the key is unique. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  def checkUnique(df: DataFrame, keyCols: Seq[String]): Boolean =
    duplicateKeys(df, keyCols).isEmpty

  /** Child rows whose foreign key has no parent (referential-integrity
    * violations) — one anti join, shuffled on the key. */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
               Seq(childKey), "left_anti")

  /** Tukey-fence outlier screen: per group, count rows outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] with percentile_disc quartiles — the
    * numeric-column anomaly pass of a publish gate. percentile_disc
    * returns ACTUAL data values (engine-portable, unlike interpolating
    * percentile_cont on arbitrary doubles), so the fences are exact
    * doubles both engines derive identically.
    *
    * Scale: one group-keyed quartile aggregation (exact percentile sorts
    * per group — at 100 TB swap in approx_percentile for sketch
    * boundaries, same shape), the tiny fence table broadcasts back, and
    * the screen itself is a map-only count. The fact table is scanned
    * twice but never shuffled on the second pass.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val fences = df.groupBy(groupCol)
      .agg(expr(s"percentile_disc(0.25) WITHIN GROUP (ORDER BY $valueCol)").as("q1"),
           expr(s"percentile_disc(0.75) WITHIN GROUP (ORDER BY $valueCol)").as("q3"))
      .select(col(groupCol), col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    df.join(broadcast(fences), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
           count_if(col(valueCol) < col("lo") || col(valueCol) > col("hi"))
             .as("n_outliers"),
           first(col("lo")).as("fence_lo"),
           first(col("hi")).as("fence_hi"))
  }

  /** Cross-load drift gate: compare today's per-column profile against
    * the previous load's and flag columns whose volume or cardinality
    * moved more than `tolPct` percent — the "schema is fine but the DATA
    * changed shape" failure (a feed silently dropping a segment, an
    * upstream join going one-to-many) that row-count checks miss.
    *
    * The inputs are [[profile]] outputs (one bounded row per column), so
    * the comparison is a join of two column-sized tables — no data scan
    * beyond the profiles themselves. The percentage test is the exact
    * integer cross-product `|cur−prev|·100 > prev·tolPct` — no float
    * division. Columns missing from either side surface as drifted
    * (`n_nonnull` null on one side), never silently dropped.
    */
  def driftCheck(current: DataFrame, previous: DataFrame,
                 tolPct: Long = 20L): DataFrame = {
    require(tolPct >= 0)
    def side(df: DataFrame, p: String) = df.select(
      col("col_name"),
      col("n_nonnull").as(s"${p}_nonnull"),
      col("n_distinct").as(s"${p}_distinct"))
    def moved(cur: org.apache.spark.sql.Column, prev: org.apache.spark.sql.Column) =
      cur.isNull || prev.isNull ||
        abs(cur - prev) * lit(100L) > prev * lit(tolPct)
    side(current, "cur").join(side(previous, "prev"), Seq("col_name"), "full_outer")
      .select(col("col_name"),
        col("cur_nonnull"), col("prev_nonnull"),
        col("cur_distinct"), col("prev_distinct"),
        moved(col("cur_nonnull"), col("prev_nonnull")).as("volume_drift"),
        moved(col("cur_distinct"), col("prev_distinct")).as("cardinality_drift"))
      .withColumn("drifted", col("volume_drift") || col("cardinality_drift"))
  }
}
