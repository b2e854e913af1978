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
