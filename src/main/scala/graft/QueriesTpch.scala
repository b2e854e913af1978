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
    // r16 (guide §2.3 "aggregate before you shuffle"): "∃ line with
    // shipdate > T" ⟺ "max(shipdate) > T", so the fact side pre-aggregates
    // to one (orderkey, max_shipdate) row per order BEFORE the exchange —
    // map-side combine shrinks the shuffled fact rows ~4× here (and by the
    // per-order line count at 100 TB), and the semi join becomes a plain
    // inner join against a unique-keyed side (same multiset: orders is
    // unique on o_orderkey; max() ignoring NULLs matches EXISTS over a
    // NULL-valued residual). Oracle-verified.
    "sql_order_priority_late" -> ((s, d) => {
      val mx = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
      orders(s, d)
        .join(mx, col("o_orderkey") === col("l_orderkey"))
        .filter(col("max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))
    }),

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

    // Q7 shape: bilateral shipping volume between two nations, by year.
    // The two ~25-row nation dims broadcast; filtering them BEFORE the
    // join means only lines touching the two nations survive the fact
    // joins. Both fact joins shuffle on the same l_orderkey/o_orderkey
    // key family; the group-by is on tiny post-filter output.
    "sql_nation_volume" -> ((s, d) => {
      val sn = nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2"))
      val cn = nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin("NATION_1", "NATION_2"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenue).cast(DoubleType).as("volume"))
    }),

    // Q8 shape: market share of one supplier nation inside one customer
    // region, by order year. The share is a conditional sum over the same
    // rows as the total — one aggregation, no second scan; region/nation
    // dims broadcast into the fact pipeline.
    "sql_market_share" -> ((s, d) => {
      val asiaNations = nation(s, d)
        .join(region(s, d).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val sn = nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                        col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
              col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", revenue)
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType).as("nation_revenue"),
          sum(revenue).cast(DoubleType).as("total_revenue"))
        .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
          (col("nation_revenue") / col("total_revenue")).as("mkt_share"))
    }),

    // Q10 shape: customers who returned the most revenue in one quarter.
    // The returnflag + date filters cut the fact before any join; top-20
    // runs as TakeOrdered with a unique c_custkey tiebreak (deterministic
    // without a global sort).
    "sql_returned_top_customers" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                        col("o_orderdate") < lit("1996-04-01").cast(TimestampType)),
              col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(sum(revenue).cast(DoubleType).as("returned_revenue"))
        .orderBy(col("returned_revenue").desc, col("c_custkey"))
        .limit(20)),

    // Q17 shape: revenue that would disappear if sub-20%-of-average
    // quantity orders for one brand stopped. The per-part average is a
    // keyed aggregation joined back on p_partkey — NOT a correlated
    // subquery per row; the brand filter shrinks both sides first. The
    // threshold divides an exact decimal sum by an exact count in double
    // (deterministic under any partitioning).
    "sql_small_qty_parts" -> ((s, d) => {
      val brandLines = lineitem(s, d)
        .join(part(s, d).filter(col("p_brand") === "Brand#1"),
              col("l_partkey") === col("p_partkey"))
      val avgQty = brandLines.groupBy(col("p_partkey").as("aq_partkey"))
        .agg((sum(dec(col("l_quantity"))).cast(DoubleType) /
              count(lit(1))).as("avg_qty"))
      brandLines
        .join(avgQty, col("l_partkey") === col("aq_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg((sum(dec(col("l_extendedprice"))).cast(DoubleType) / 7.0)
          .as("avg_yearly"))
    }),

    // Q19 shape: disjunctive brand/size/quantity predicate — one
    // equi-join on l_partkey with the OR residual evaluated post-join.
    // Catalyst extracts the common p_size >= 1 / l_quantity >= 1 bounds
    // as pushable conjuncts; the single equi-join means one shuffle
    // regardless of how many disjuncts the pricing rule carries.
    "sql_disjunctive_part_revenue" -> ((s, d) =>
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
           col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
           col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) &&
           col("l_quantity").between(20, 30))))
        .agg(sum(revenue).cast(DoubleType).as("revenue"))),

    // Q21 shape (adapted to this schema's columns: "late" = shipped more
    // than 60 days after the order date): suppliers from one nation who
    // were the ONLY late supplier on a finished multi-supplier order.
    // Both the "some other supplier exists" (semi) and "no other supplier
    // was late" (anti) conditions are equi-joins on l_orderkey with a
    // suppkey-inequality residual — the whole query re-uses one hash
    // partitioning on the order key; nothing is correlated per-row.
    // r16 (guide §2.4): the semi ("some other supplier exists") and anti
    // ("no other supplier was late") conditions are per-ORDER facts —
    // distinct-supplier counts — so they compute as two order-keyed
    // aggregates over ONE repartition(l_orderkey) that every consumer
    // shares (the fact scan runs once, reused thrice). The old shape
    // scanned lineitem twice and paid two sort-merge joins with their own
    // exchanges. Row-multiset equivalence: a late row has another supplier
    // on its order iff the order's distinct-supplier count ≥ 2, and no
    // other LATE supplier iff the order's distinct-late-supplier count
    // = 1 — exactly the old semi/anti predicates, row for row.
    "sql_waiting_suppliers" -> ((s, d) => {
      val fOrders = orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lines = lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
      val late = lines.join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val stats = lines.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      val lateStats = late.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_late"))
      val l1 = late.join(stats, "l_orderkey").join(lateStats, "l_orderkey")
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      l1.join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_1")),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
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

    "sql_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3""",

    "sql_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1""",

    "sql_returned_top_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS returned_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3
        ORDER BY returned_revenue DESC, c_custkey
        LIMIT 20""",

    "sql_small_qty_parts" ->
      """WITH brand_lines AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#1'),
        aq AS (
          SELECT l_partkey AS aq_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
          FROM brand_lines GROUP BY 1)
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM brand_lines JOIN aq ON l_partkey = aq_partkey
        WHERE l_quantity < avg_qty * 0.2""",

    "sql_disjunctive_part_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 30)""",

    "sql_waiting_suppliers" ->
      """WITH late AS (
          SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20""",

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
