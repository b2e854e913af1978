package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table — the batch expression of
  * the streaming surface (SURVEY.md §2.8); the true Structured Streaming
  * versions (watermark + window + session_window + stateful dedup) live in
  * [[graft.streaming.EventStreams]] and are spec-tested, while these batch
  * twins are oracle-checked against DuckDB.
  *
  * Event time: events.ts is parquet TIMESTAMP(NANOS). Spark reads it as an
  * epoch-nano long ([[Tables.events]]); DuckDB truncates to µs at scan. All
  * arithmetic here is therefore done on `ts DIV 1000` (epoch-µs) ↔ DuckDB
  * `epoch_us(ts)` — identical integers on both engines, no float and no
  * precision skew.
  */
object QueriesEvents {
  import Tables._

  private val TenMinUs = 600L * 1000000L
  private val SessionGapUs = 1800L * 1000000L // 30 min

  private def tsUs = expr("ts DIV 1000")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 10-minute window aggregation: one shuffle on (bucket, type).
    // Streaming twin: groupBy(window($"ts", "10 minutes"), $"event_type").
    "evt_window_tumbling" -> ((s, d) =>
      events(s, d)
        .withColumn("ts_us", tsUs)
        .groupBy((col("ts_us") - (col("ts_us") % TenMinUs)).as("win_start_us"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))),

    // Batch sessionization: 30-min-gap sessions per user via lag + running
    // sum — the scalable rewrite of an interval self-join (one shuffle on
    // user_id, linear per-partition work). Streaming twin: session_window.
    "evt_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
        .withColumn("is_start",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > SessionGapUs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
             countDistinct(col("event_type")).as("n_types"))
    }),

    // Funnel analysis: per user, did the first 'view' convert to a
    // 'purchase' within one hour? Two keyed aggregations + one equi join —
    // no interval self-join, no state explosion at 100 TB.
    "evt_funnel" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), tsUs.as("us"), col("event_type"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("first_view_us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"))
      val conv = v.join(p, Seq("user_id"))
        .filter(col("p_us") > col("first_view_us"))
        .groupBy("user_id").agg(min("p_us").as("first_purchase_us"))
      v.join(conv, Seq("user_id"), "left")
        .select(col("user_id"), col("first_view_us"),
          when(col("first_purchase_us").isNotNull &&
               col("first_purchase_us") - col("first_view_us") <= 3600L * 1000000L, 1)
            .otherwise(0).cast(IntegerType).as("converted_1h"))
    }),

    // Event-time dedup idiom: latest event per (user, type) — the batch
    // twin of dropDuplicatesWithinWatermark.
    "evt_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts_us")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "evt_window_tumbling" ->
      """SELECT epoch_us(ts) - (epoch_us(ts) % 600000000) AS win_start_us,
          event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""",

    "evt_sessionize" ->
      """WITH marked AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS is_start
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        sessions AS (
          SELECT user_id, event_type, tus,
            CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM marked)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MAX(tus) - MIN(tus) AS duration_us,
          COUNT(DISTINCT event_type) AS n_types
        FROM sessions GROUP BY 1, 2""",

    "evt_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        v AS (SELECT user_id, MIN(us) AS first_view_us FROM e
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT v.user_id, MIN(p.us) AS first_purchase_us
              FROM v JOIN e p ON p.user_id = v.user_id
               AND p.event_type = 'purchase' AND p.us > v.first_view_us
              GROUP BY 1)
        SELECT v.user_id, v.first_view_us,
          CAST(CASE WHEN c.first_purchase_us IS NOT NULL
                     AND c.first_purchase_us - v.first_view_us <= 3600000000
                    THEN 1 ELSE 0 END AS INT) AS converted_1h
        FROM v LEFT JOIN c ON v.user_id = c.user_id""",

    "evt_latest_per_key" ->
      """SELECT user_id, event_type, event_id, ts_us FROM (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
            ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1"""
  )
}
