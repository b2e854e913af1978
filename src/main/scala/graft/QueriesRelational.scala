package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator surface (SURVEY.md §2.1–2.7) expressed over the
  * driver testdata, one named query per operator family, each with a
  * DuckDB-equivalent oracle in [[QueriesRelational.oracleSql]].
  *
  * Determinism contract with the oracle: any aggregate over doubles is
  * computed through an exact `DecimalType` cast and only converted back to
  * double at the end — double summation is order-dependent and Spark's
  * partial aggregation order differs from DuckDB's, while decimal sums are
  * exact in both engines and the final decimal→double conversion is
  * correctly rounded and deterministic. Raw timestamps never appear in
  * outputs (events.ts is ns in parquet; Spark truncates to µs, DuckDB keeps
  * ns) — dates or integers only.
  *
  * Scale notes are inline per query: every join declares which side is
  * broadcastable, every window partitions on a bounded key, and all filters
  * sit directly on source columns so they push into the parquet scan.
  */
object QueriesRelational {
  import Tables._

  /** Exact decimal view of a 2-decimal monetary/quantity double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-insensitive sum of a 2-decimal double column, returned as double. */
  private def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  private val SUMD = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A: aggregations (SURVEY §2.4 + declared breadth) ----------------

    // A1-style full-table agg; map-side partial agg then 1 shuffle on the
    // (tiny-cardinality) group key — optimal at any scale.
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sumd(col("l_quantity")).as("sum_qty"))),

    // TPC-H Q1 shape: filter pushed to scan, 4-group agg.
    "agg_pricing_summary" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    "agg_having" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
        .filter(col("n") > 50)),

    "agg_minmax" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          min(col("o_totalprice")).as("min_price"), // min/max of doubles: order-free
          max(col("o_totalprice")).as("max_price"),
          count(lit(1)).as("n"))),

    "agg_count_distinct" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))),

    "agg_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))),

    "agg_cube" -> ((s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))),

    // GROUP BY with no aggregates — the reference's dedup idiom (main.py:472).
    "agg_dedup_groupby" -> ((s, d) =>
      orders(s, d).groupBy("o_custkey", "o_orderstatus").agg(Map.empty[String, String])),

    // SELECT DISTINCT (main.py:458, 499).
    "agg_distinct" -> ((s, d) =>
      customer(s, d).select("c_mktsegment").distinct()),

    // ---- J: joins (SURVEY §2.3) ------------------------------------------

    // J7 analogue: 5-way star join. region+nation are tiny at any SF →
    // explicit broadcast; customer⋈orders⋈lineitem shuffle on their keys
    // (AQE picks broadcast for customer at small SF automatically).
    "join_5way_revenue" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount"))))
               .cast(DoubleType).as("revenue"),
             count(lit(1)).as("n_lines"))),

    "join_left_count" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))),

    // J6/P6: IN-subquery ≡ left_semi (Catalyst RewritePredicateSubquery).
    "join_semi" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // J1/J2/J4/P5: NULL-probe anti-join ≡ left_anti.
    "join_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // Market-basket pair mining: brand pairs co-purchased in the same
    // order, kept above a support threshold — the association-rules
    // co-occurrence primitive. The self-join runs on the DEDUPED
    // (order, brand) table keyed by order (pair fan-out bounded by order
    // width², never lineitem²). At 100 TB the support filter is what
    // keeps the output bounded; the shuffle key is the order id
    // throughout. (r16 note: a collect_set + HOF pair-explosion rewrite
    // was measured 1.8× SLOWER — collect_set is an ObjectHashAggregate
    // that falls back to sort-based aggregation past 128 in-memory groups
    // per partition, so the order-keyed set build pays a corpus sort the
    // codegen'd join form never does. Kept as-is.)
    // r16 (guide §2.4): the explicit repartition(okey) is the ONE
    // exchange the whole query needs — it satisfies the distinct's
    // (okey, brand) clustering AND both self-join sides' okey
    // distribution, so the plan-audited before-shape (the distinct
    // subtree computed twice: two lineitem scans, two distinct
    // aggregations, two join-side exchanges — aliasing defeated reuse)
    // collapses to one scan + one ReusedExchange.
    "join_basket_pairs" -> ((s, d) => {
      val ob = lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand"))
        .repartition(col("okey"))
        .distinct()
      val a = ob.select(col("okey"), col("p_brand").as("brand_a"))
      val b = ob.select(col("okey"), col("p_brand").as("brand_b"))
      a.join(b, Seq("okey"))
        .filter(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 330)
    }),

    // J3/J5: equi key + non-equi residual (hash join + filter, NOT BNL).
    "join_theta_residual" -> ((s, d) =>
      supplier(s, d)
        .join(customer(s, d),
              col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_pairs"))),

    // J8: OR-of-conditions join — the naive form is a nested-loop join; the
    // scale-safe rewrite is UNION of (equi hash join) and (filter×filter)
    // deduped on the output key pair. Semantics proven equal to the oracle's
    // direct OR join.
    "join_or_union" -> ((s, d) => {
      val o = orders(s, d)
      val c = customer(s, d)
      val equi = o.join(c, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey")
      val theta = o.filter(col("o_totalprice") < 1000)
        .crossJoin(c.filter(col("c_acctbal") < 0))
        .select("o_orderkey", "c_custkey")
      equi.union(theta).distinct()
    }),

    // J9: interval self-join — equi on the partition key (user_id) with a
    // ±1h residual, so it hash-partitions by user instead of exploding.
    // Event time is compared in µs (ts DIV 1000 ↔ DuckDB epoch_us): DuckDB
    // truncates parquet ns timestamps to µs at scan, so µs is the exact
    // cross-engine arithmetic domain.
    "join_interval_self" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      def side(p: String) = events(s, d).select(
        col("user_id"), col("event_id").as(s"${p}_id"),
        expr("ts DIV 1000").as(s"${p}_us"), col("event_type").as(s"${p}_type"))
      side("a").join(side("b"), Seq("user_id"))
        .filter(col("a_id") < col("b_id") &&
                col("a_type") =!= col("b_type") &&
                col("b_us").between(col("a_us") - hourUs, col("a_us") + hourUs))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    "join_broadcast_dim" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sumd(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))),

    // Skew-salted equi-join surfaced through the oracle gate: the fact
    // spreads each key over `salt` deterministic sub-keys and the dim
    // replicates salt× (ScaleJoins.saltedJoin), so one hot key occupies
    // `salt` reducers instead of one — the manual fix when AQE's
    // skew-split can't help (pre-shuffle-agg skew, non-sort-merge plans).
    // Result is EXACTLY the plain join, which is what the oracle runs.
    "join_salted_skew" -> ((s, d) =>
      graft.operators.ScaleJoins.saltedJoin(
        orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_name")),
        "o_custkey", salt = 8)),

    // ---- W: window functions (SURVEY §2.5 + declared breadth) ------------

    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // Same answer as win_topk_per_group but through the custom heap-based
    // physical operator (plans/TopKPerGroup.scala): one shuffle, NO sort —
    // O(n log k) instead of WindowExec's per-partition O(n log n). The
    // unique o_orderkey order column makes the top-3 set tie-free, so the
    // heap result is deterministic and the row_number oracle agrees.
    "win_topk_heap" -> ((s, d) =>
      org.apache.spark.sql.graft.TopKPerGroupOp.topKPerGroup(
          orders(s, d), Seq("o_custkey"), "o_orderkey", 3)
        .select("o_custkey", "o_orderkey")),

    "win_lead_lag" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderkey"),
                lag("o_totalprice", 1).over(w).as("prev_price"),
                lead("o_totalprice", 1).over(w).as("next_price"))
    }),

    // W2 analogue (dense_rank, main.py:506).
    "win_dense_rank" -> ((s, d) => {
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
      supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"),
                dense_rank().over(w).cast(LongType).as("drank"))
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
                sum(dec(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
    }),

    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
        .rangeBetween(-5, 0)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
                count(lit(1)).over(w).as("n_in_range"))
    }),

    // ---- S: sort / limit / set ops (SURVEY §2.6) -------------------------

    // Deterministic top-k: total order via unique tiebreaker. TakeOrdered
    // physical op — no full sort at scale.
    "sort_topk" -> ((s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    "set_union_all" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nk"))
        .unionByName(supplier(s, d).select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))),

    "set_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))),

    "set_except" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nk"))
        .except(supplier(s, d).select(col("s_nationkey").as("nk")))),

    // ---- F: scalar functions (SURVEY §2.7) -------------------------------

    // F1/F2 (concat_ws FIO, trim) + string breadth.
    "fn_strings" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        concat_ws(" ", col("c_name"), col("c_mktsegment")).as("fio"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 5).as("prefix5"),
        length(col("c_name")).cast(LongType).as("name_len"),
        trim(col("c_mktsegment")).as("seg_trim"))),

    // F3–F8: date/timestamp functions + interval arithmetic.
    "fn_dates" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        col("o_orderdate").cast(DateType).as("order_date"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).cast(DateType).as("next_day"))),

    "fn_case_when" -> ((s, d) =>
      orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))),

    "fn_math" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        // scale 4 = exact product of two scale-2 decimals; no rounding step
        // (decimal downscale rounding modes differ between engines).
        (dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(DecimalType(22, 4)).cast(DoubleType).as("disc_amt"),
        abs(col("l_quantity") - 25).as("dev_qty"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        (col("l_orderkey") % 7).as("mod7"))),

    "fn_like_regexp" -> ((s, d) =>
      part(s, d)
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
                regexp_extract(col("p_type"), "^[a-z]+", 0).as("type_head"),
                col("p_brand"))),

    // JSON props (events.props = {"k": int}) — from_json at scale is
    // codegen'd; oracle uses DuckDB's JSON extension.
    "fn_json" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))),

    // P4/P7/P8 filter shapes: BETWEEN + IS NOT NULL + date comparison.
    "filt_between" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity").between(10, 20) && col("l_returnflag").isNotNull &&
                col("l_shipdate") > lit("2000-06-01").cast(TimestampType))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n")))
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"SELECT l_returnflag, ${SUMD.format("l_quantity")} AS sum_qty FROM lineitem GROUP BY 1",

    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${SUMD.format("l_quantity")} AS sum_qty,
          ${SUMD.format("l_extendedprice")} AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY 1, 2""",

    "agg_having" ->
      s"""SELECT l_suppkey, COUNT(*) AS n, ${SUMD.format("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY 1 HAVING COUNT(*) > 50""",

    "agg_minmax" ->
      """SELECT o_orderstatus, MIN(o_totalprice) AS min_price,
        MAX(o_totalprice) AS max_price, COUNT(*) AS n
        FROM orders GROUP BY 1""",

    "agg_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY 1""",

    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${SUMD.format("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "agg_dedup_groupby" ->
      "SELECT o_custkey, o_orderstatus FROM orders GROUP BY 1, 2",

    "agg_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer",

    "join_5way_revenue" ->
      """SELECT r_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1""",

    "join_left_count" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY 1""",

    "join_basket_pairs" ->
      """WITH ob AS (
          SELECT DISTINCT l.l_orderkey AS okey, p.p_brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.p_brand < b.p_brand
        GROUP BY 1, 2 HAVING COUNT(*) >= 330""",

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "join_theta_residual" ->
      """SELECT s_nationkey, COUNT(*) AS n_pairs
        FROM supplier JOIN customer
          ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        GROUP BY 1""",

    "join_or_union" ->
      """SELECT DISTINCT o_orderkey, c_custkey
        FROM orders JOIN customer
          ON (o_custkey = c_custkey) OR (o_totalprice < 1000 AND c_acctbal < 0)""",

    "join_interval_self" ->
      """SELECT a.user_id, COUNT(*) AS n_pairs
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND a.event_type <> b.event_type
         AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000
                                AND epoch_us(a.ts) + 3600000000
        GROUP BY 1""",

    "join_broadcast_dim" ->
      s"""SELECT p_brand, ${SUMD.format("l_extendedprice")} AS sum_price, COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1""",

    "join_salted_skew" ->
      """SELECT o.o_custkey, o.o_orderkey, c.c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",

    "win_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t WHERE rn <= 3""",

    "win_topk_heap" ->
      """SELECT o_custkey, o_orderkey FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) t WHERE rn <= 3""",

    "win_lead_lag" ->
      """SELECT o_orderkey,
          LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
          LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        FROM orders""",

    "win_dense_rank" ->
      """SELECT s_suppkey, s_nationkey,
          DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drank
        FROM supplier""",

    "win_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem""",

    "win_range_frame" ->
      """SELECT l_orderkey, l_linenumber,
          COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                         RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_in_range
        FROM lineitem""",

    "sort_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "set_union_all" ->
      """SELECT nk, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nk FROM customer
          UNION ALL SELECT s_nationkey AS nk FROM supplier) t
        GROUP BY 1""",

    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        INTERSECT SELECT s_nationkey AS nk FROM supplier""",

    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        EXCEPT SELECT s_nationkey AS nk FROM supplier""",

    "fn_strings" ->
      """SELECT c_custkey,
          concat_ws(' ', c_name, c_mktsegment) AS fio,
          upper(c_name) AS uname,
          substring(c_name, 1, 5) AS prefix5,
          length(c_name) AS name_len,
          trim(c_mktsegment) AS seg_trim
        FROM customer""",

    "fn_dates" ->
      """SELECT o_orderkey,
          CAST(year(o_orderdate) AS INT) AS yr,
          CAST(month(o_orderdate) AS INT) AS mo,
          CAST(day(o_orderdate) AS INT) AS dom,
          CAST(o_orderdate AS DATE) AS order_date,
          CAST(o_orderdate + INTERVAL 1 DAY AS DATE) AS next_day
        FROM orders""",

    "fn_case_when" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                     WHEN o_totalprice < 300000 THEN 'mid'
                     ELSE 'high' END AS bucket,
          COUNT(*) AS n
        FROM orders GROUP BY 1""",

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
          CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(22,4)) AS DOUBLE) AS disc_amt,
          abs(l_quantity - 25) AS dev_qty,
          CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
          CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
          l_orderkey % 7 AS mod7
        FROM lineitem""",

    "fn_like_regexp" ->
      """SELECT p_partkey,
          regexp_extract(p_type, '^[a-z]+') AS type_head,
          p_brand
        FROM part WHERE p_name LIKE '%a%'""",

    "fn_json" ->
      """SELECT event_type,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          COUNT(*) AS n
        FROM events GROUP BY 1""",

    "filt_between" ->
      """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IS NOT NULL
          AND l_shipdate > TIMESTAMP '2000-06-01 00:00:00'
        GROUP BY 1"""
  )
}
