package graft

import graft.operators.ScaleJoins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ZOrderExpressions

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a bit-by-bit reference implementation") {
    def reference(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >>> i) & 1L) << (2 * i)
        z |= ((b >>> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderExpressions.interleave(a, b) === reference(a, b), s"($a, $b)")
    }
    // locality sanity: nearby points share high bits
    assert(ZOrderExpressions.interleave(0, 0) === 0L)
    assert(ZOrderExpressions.interleave(1, 0) === 1L)
    assert(ZOrderExpressions.interleave(0, 1) === 2L)
    assert(ZOrderExpressions.interleave(1, 1) === 3L)
  }

  test("z_order2 codegen agrees with interpreted eval, and registers in SQL") {
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 4294967296L).as("a"),
      (col("id") * 40503L % 4294967296L).as("b"))
    val viaCol = df.select(ZOrderExpressions.z_order2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(ZOrderExpressions.z_order2(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0))
      assert(viaCol.toSeq === interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    GraftSession.attach(spark, sf0001)
    val viaSql = spark.sql(
      "SELECT z_order2(o_orderkey, o_custkey) FROM orders LIMIT 5").collect()
    assert(viaSql.length === 5)
  }

  test("interleaveN at k=2 is bit-for-bit interleave; bit ownership holds at k=3..8") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderExpressions.interleaveN(Array(a, b)) ===
        ZOrderExpressions.interleave(a, b))
    }
    for (k <- 3 to 8) {
      val bits = 64 / k
      // dimension d = 1 (all others 0) sets exactly bits {d, d+k, d+2k, …}
      for (d <- 0 until k) {
        val vals = Array.fill(k)(0L); vals(d) = (1L << bits) - 1
        val expect = (0 until bits).map(b => 1L << (b * k + d)).sum
        assert(ZOrderExpressions.interleaveN(vals) === expect, s"k=$k d=$d")
      }
    }
  }

  test("z_ordern codegen agrees with interpreted eval and registers in SQL") {
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 65536L).as("a"),
      (col("id") * 40503L % 65536L).as("b"),
      (col("id") * 69069L % 65536L).as("c"),
      (col("id") % 65536L).as("d"))
    def z(dfx: org.apache.spark.sql.DataFrame) = dfx.select(
      ZOrderExpressions.z_ordern(col("a"), col("b"), col("c"), col("d")).as("z"))
      .collect().map(_.getLong(0))
    val gen = z(df)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(z(df).toSeq === gen.toSeq)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    GraftSession.attach(spark, sf0001)
    assert(spark.sql(
      "SELECT z_ordern(o_orderkey, o_custkey, CAST(o_totalprice AS LONG)) FROM orders LIMIT 5")
      .collect().length === 5)
  }

  test("3-D z-ordered layout bounds per-file ranges in ALL THREE dimensions") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    val base = java.nio.file.Files.createTempDirectory("graft_zn_").toString
    ScaleJoins.zOrderClusterN(li,
        Seq(col("l_partkey"), col("l_suppkey"), col("l_extendedprice")), 16)
      .write.mode("overwrite").parquet(s"$base/z3")
    val t = spark.read.parquet(s"$base/z3")
    assert(t.count() === li.count())
    val g = t.agg(
      (max("l_partkey") - min("l_partkey")).cast("double"),
      (max("l_suppkey") - min("l_suppkey")).cast("double"),
      (max("l_extendedprice") - min("l_extendedprice")).cast("double")).head()
    val per = t.withColumn("f", input_file_name()).groupBy("f")
      .agg(((max("l_partkey") - min("l_partkey")) / g.getDouble(0)).as("a"),
           ((max("l_suppkey") - min("l_suppkey")) / g.getDouble(1)).as("b"),
           ((max("l_extendedprice") - min("l_extendedprice")) / g.getDouble(2)).as("c"))
      .agg(avg("a"), avg("b"), avg("c")).head()
    for (i <- 0 until 3)
      assert(per.getDouble(i) < 0.7,
        s"3-D z-order must bound dim $i, got ${per.getDouble(i)}")
  }

  test("z-ordered layout bounds per-file ranges in BOTH dimensions") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_orderkey", "o_custkey", "o_totalprice")

    def spreads(path: String): (Double, Double) = {
      val t = spark.read.parquet(path)
      val global = t.agg(
        (max("o_custkey") - min("o_custkey")).cast("double"),
        (max("o_totalprice") - min("o_totalprice")).cast("double")).head()
      val perFile = t.withColumn("f", input_file_name())
        .groupBy("f")
        .agg(((max("o_custkey") - min("o_custkey")) / global.getDouble(0)).as("ca"),
             ((max("o_totalprice") - min("o_totalprice")) / global.getDouble(1)).as("cb"))
        .agg(avg("ca"), avg("cb")).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    // baseline: sorted by custkey only — perfect on custkey, useless on price
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$base/bycust")
    // z-ordered on (custkey, totalprice)
    ScaleJoins.writeZOrdered(orders, s"$base/zorder", "o_custkey", "o_totalprice", 16)

    val (cA, cB) = spreads(s"$base/bycust")
    val (zA, zB) = spreads(s"$base/zorder")
    assert(cA < 0.15, s"single-sort custkey spread $cA")
    assert(cB > 0.8, s"single-sort leaves price unclustered, got $cB")
    assert(zA < 0.5, s"zorder custkey spread $zA")
    assert(zB < 0.5, s"zorder price spread $zB")
  }
}
