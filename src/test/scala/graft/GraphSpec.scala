package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank ([[graft.operators.Graph.pageRankInt]]):
  * exact agreement with an independently computed reference (constants
  * below were derived outside Spark), teleport-floor behavior for nodes
  * with no inbound edges, and partitioning-independence — the property
  * that justifies gating it against a serial DuckDB oracle.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("ranks match the independently computed fixed-point reference") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 396670470599L, "b" -> 388913058797L,
      "c" -> 214416470594L))
    // total mass stays near scale (integer floor loss only)
    assert(got.values.sum <= 1000000000000L)
    assert(got.values.sum > 990000000000L)
  }

  test("a node with no inbound edges settles at the teleport floor") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 75000000000L, "b" -> 138750000000L))
  }

  test("ranks are identical under forced repartitioning") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val base = Graph.pageRankInt(edges, iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shuffled = Graph.pageRankInt(edges.repartition(7, col("dst")), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base === shuffled)
  }
}
