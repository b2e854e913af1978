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

  test("dangling mass redistributes: a->b two-node chain conserves mass") {
    // b is a SINK (no outbound): its mass redistributes uniformly each
    // sweep instead of vanishing. Constants recomputed outside Spark with
    // the same integer recurrence incl. share = D DIV n.
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 350905863355L, "b" -> 649094136638L))
    assert(got.values.sum > 999999999900L && got.values.sum <= 1000000000000L)
  }

  test("sink node in a 3-node graph: pinned fixed point, mass conserved") {
    // c receives from a but has no outbound edges — the classic sink
    // shape. Expected values from the independent integer reference.
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 393411206530L, "b" -> 303294396729L,
      "c" -> 303294396729L))
    assert(got.values.sum > 999999999900L && got.values.sum <= 1000000000000L)
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

  test("pageRankIntBounded is bit-identical to pageRankInt on every pinned shape") {
    // the single-expression bounded-domain form must replicate the
    // distributed integer recurrence exactly — including dangling-mass
    // redistribution and the teleport floor
    val shapes = Seq(
      Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L), ("b", "a", 1L)),
      Seq(("a", "b", 1L)), // sink node b
      Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L)), // sink c
      Seq(("x", "x", 5L), ("x", "y", 3L), ("z", "y", 7L))) // self-loop + multi-in
    shapes.foreach { es =>
      val edges = es.toDF("src", "dst", "w")
      val want = Graph.pageRankInt(edges).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = Graph.pageRankIntBounded(edges).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"bounded form diverged on $es")
    }
    // iters/damping parameters thread through identically
    val edges = shapes.head.toDF("src", "dst", "w")
    val want = Graph.pageRankInt(edges, iters = 3, dampNum = 60).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Graph.pageRankIntBounded(edges, iters = 3, dampNum = 60).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("pageRankIntBounded on an empty edge table returns empty") {
    val edges = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRankIntBounded(edges).collect().isEmpty)
  }
}
