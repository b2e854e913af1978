package graft

/** Every declared query must run on sf0.001 (the driver's smoke SF) and
  * declare oracle SQL or be a documented rows-only sketch query. */
class QueriesSmokeSpec extends SparkSpec {

  private val rowsOnlyOk = Set.empty[String] // every query is oracle-checked since r2

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyOk
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("approx_percentile (the 100 TB production variant) tracks exact percentile") {
    // agg_percentiles uses exact percentile for oracle parity; production at
    // scale swaps in the t-digest sketch. l_quantity is integral 1..50, so
    // with accuracy 10000 the sketch must land within 1.0 of exact.
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("exact"),
           expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0, r.toString)
    }
  }
}
