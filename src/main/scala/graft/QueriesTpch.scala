package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic decision-support query shapes (TPC-H Q4/Q14/Q15/Q18/Q22
  * adapted to the columns this testdata carries) — the load-bearing SQL
  * patterns a reference user writes daily: correlated EXISTS against the
  * fact, conditional-aggregate ratios, view + scalar-max selection,
  * HAVING-filtered semi join back to the dims, and scalar-subquery +
  * anti-join cohort selection.
  *
  * Scale notes per query inline; all money arithmetic goes through
  * DECIMAL(18,2) sums (exact, order-independent) cast to double only at
  * the end — the cross-engine determinism rule the whole oracle gate
  * relies on.
  */
object QueriesTpch {
  import Tables._

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)
  private def revenue: Column = dec(col("l_extendedprice")) *
    (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q4 shape: orders (by priority) with at least one line shipped >60
    // days after the order date. The correlated EXISTS becomes a LEFT SEMI
    // join on the order key with the date residual — one shuffle on the
    // join key, no subquery re-execution per row.
    "sql_order_priority_late" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))),

    // Q14 shape: promo revenue share in one year. Single-pass conditional
    // aggregate — the CASE moves inside the sum, so there is exactly one
    // scan and one 1-row result; the ratio divides two exact decimal sums
    // after the double cast (deterministic at any partitioning).
    "sql_promo_revenue_ratio" -> ((s, d) => {
      val li = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
      li.agg(
          sum(when(col("p_type") === "PROMO", revenue)).cast(DoubleType).as("promo_revenue"),
          sum(revenue).cast(DoubleType).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (col("promo_revenue") / col("total_revenue") * 100.0).as("promo_pct"))
    }),

    // Q15 shape: the quarter's top supplier(s) by revenue. The revenue
    // "view" is one keyed aggregation; the scalar max comes back as a
    // broadcast 1-row cross join (no global window, no driver round-trip),
    // so selection stays fully distributed however many suppliers exist.
    "sql_top_supplier" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .groupBy("l_suppkey")
        .agg(sum(revenue).cast(DoubleType).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q18 shape: large-volume orders. HAVING on the fact aggregation
    // first (cuts 15k orders to dozens BEFORE touching dims), then joins
    // back; top-100 runs as TakeOrdered, not a full sort.
    "sql_top_customers_by_qty" -> ((s, d) => {
      val big = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q22 shape: rich-but-dormant customers — above the positive-balance
    // average, no order since 2000. Scalar subquery broadcasts as one row;
    // the NOT EXISTS is an anti join against the pre-filtered (small)
    // recent-orders side; balances aggregate through exact decimals.
    "sql_dormant_rich_customers" -> ((s, d) => {
      val c = customer(s, d)
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
                .select(col("o_custkey").as("c_custkey")),
              Seq("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
             sumd(col("c_acctbal")).as("total_bal"))
    }))

  val oracleSql: Map[String, String] = Map(

    "sql_order_priority_late" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1""",

    "sql_promo_revenue_ratio" ->
      """WITH r AS (
          SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS promo_revenue,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01')
        SELECT promo_revenue, total_revenue,
               promo_revenue / total_revenue * 100.0 AS promo_pct
        FROM r""",

    "sql_top_supplier" ->
      """WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",

    "sql_top_customers_by_qty" ->
      """WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300)
        SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""",

    "sql_dormant_rich_customers" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1""")
}
