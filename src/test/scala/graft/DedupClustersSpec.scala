package graft

import graft.operators.DedupClusters
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint components label by their minima") {
    val l = labels(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(l === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 64-node path collapses to one component (log-round convergence)") {
    // the adversarial case for naive label propagation: diameter 63
    val edges = (0L until 63L).map(i => (i, i + 1))
    val l = labels(edges)
    assert(l.size === 64)
    assert(l.values.toSet === Set(0L))
  }

  test("duplicate / reversed / self edges are harmless") {
    val l = labels(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L)))
    assert(l === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches driver-side union-find across many random graphs") {
    // light property sweep: several seeds, smaller graphs than the fixed
    // case below, so structural variety (forests, cycles, stars) is hit
    for (seed <- Seq(1, 7, 13, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      assert(labels(edges) === want, s"seed=$seed")
    }
  }

  test("incremental label update equals re-clustering from scratch") {
    for (seed <- Seq(3, 21, 77)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val all = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (oldE, newE) = all.splitAt(all.size / 2)
      val docs = (0L until n).toDF("doc_id")
      def toMapL(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oldLabels = DedupClusters.clusterLabels(docs, "doc_id", oldE.toDF("src", "dst"))
      val updated = toMapL(DedupClusters.updateClusterLabels(
        docs, "doc_id", oldLabels, newE.toDF("src", "dst")))
      val full = toMapL(DedupClusters.clusterLabels(docs, "doc_id", all.toDF("src", "dst")))
      assert(updated === full, s"seed=$seed")
    }
  }

  test("keepBestPerCluster keeps the highest score, tie-break smallest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("doc_id", "cluster_id")
    val scored = Seq((1L, 1), (2L, 5), (3L, 5), (10L, 2), (11L, 2), (20L, 0))
      .toDF("doc_id", "score")
    val kept = DedupClusters.keepBestPerCluster(scored, "doc_id", labels, "score")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 10L, 20L))
  }

  test("keepBestPerCluster orders string ids correctly (no id negation)") {
    // "b10" < "b9" lexicographically — a negate-the-id tie-break would
    // either fail to resolve or silently pick by numeric luck; the
    // min_by(-score, id) form must keep the lexicographically smallest
    val labels = Seq(("b9", "b10"), ("b10", "b10"), ("c1", "c1"))
      .toDF("doc_id", "cluster_id")
    val scored = Seq(("b9", 5), ("b10", 5), ("c1", 1)).toDF("doc_id", "score")
    val kept = DedupClusters.keepBestPerCluster(scored, "doc_id", labels, "score")
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("b10", "c1"))
  }

  test("matches driver-side union-find on a pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference: plain union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // min member of the component = repeatedly-compressed root
        var r = find(id.toInt); r.toLong
      }).toMap
    assert(labels(edges) === want)
  }

  test("inline and star-loop CC arms agree on random graphs and strings") {
    // the size-adaptive dispatch must be invisible: force the loop arm by
    // zeroing the inline limit, compare against the (default) inline arm
    def withLimit[A](v: String)(f: => A): A = {
      spark.conf.set(DedupClusters.InlineEdgeLimitConf, v)
      try f finally spark.conf.unset(DedupClusters.InlineEdgeLimitConf)
    }
    for (seed <- Seq(5, 17, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("src", "dst")
      val inline = DedupClusters.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = withLimit("0")(DedupClusters.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(inline === loop, s"seed=$seed")
    }
    // string ids: component label is the lexicographic minimum on both arms
    val sEdges = Seq(("b9", "b10"), ("b10", "zz"), ("q", "p")).toDF("src", "dst")
    val sInline = DedupClusters.connectedComponents(sEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val sLoop = withLimit("0")(DedupClusters.connectedComponents(sEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap)
    assert(sInline === sLoop)
    assert(sInline === Map("b9" -> "b10", "b10" -> "b10", "zz" -> "b10",
      "q" -> "p", "p" -> "p"))
  }

  test("clusterLabels keeps singletons labeled by themselves") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((2L, 4L)).toDF("a_id", "b_id")
    val l = DedupClusters.clusterLabels(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
  }
}
