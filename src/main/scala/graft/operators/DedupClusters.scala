package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns pairwise
  * near-duplicate hits (MinHash/SimHash output) into dedup CLUSTERS, so a
  * training-data pipeline can keep one canonical document per cluster
  * instead of dropping both ends of every pair.
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14). Each round
  * is two hash-partitioned aggregations + a join — no driver-side graph
  * state, no per-node adjacency arrays (the min-label is computed with a
  * plain `min` aggregate and joined back, so a celebrity node with 10⁸
  * neighbors never materializes a list). Converges in O(log n) rounds even
  * on path graphs, where naive label propagation needs O(n).
  *
  * At 100 TB: every step shuffles `(src, dst)` longs only; rounds
  * `localCheckpoint` to keep the plan flat (same discipline as
  * [[Scd.scd2Apply]] chaining).
  */
object DedupClusters {

  private def sym(e: DataFrame): DataFrame =
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))

  // Both star steps fold the paper's "∪ {v}" self-edge into the aggregate
  // (least(min(Γ(v)), v)) and, where a self row would survive the step's
  // own filter, emit its contribution straight off the aggregated
  // relation — the explicit self-edge relation (a second symmetrize + a
  // node-distinct SHUFFLE, twice per round) buys nothing the aggregate
  // doesn't already know. At sf0.1 the iteration's cost is per-round
  // fixed overhead, so two fewer shuffles per round is a direct win; at
  // 100 TB it removes a full O(V) exchange per star step.

  /** Large-star: every node links its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself). Self rows never pass `dst > src`,
    * so only the min needs the self member. */
  private def largeStar(e: DataFrame): DataFrame = {
    val s = sym(e)
    val mins = s.groupBy("src").agg(min("dst").as("m0"))
      .select(col("src"), least(col("m0"), col("src")).as("m"))
    s.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: orient edges toward the larger endpoint; every node links
    * its smaller neighbors (and itself) to the neighborhood minimum.
    * Oriented edges have dst < src strictly (no self loops enter a round),
    * so min(dst) already undercuts src, and the self row's emission
    * (src → m) is exactly one row per aggregated group — `mins` itself.
    * Nodes appearing only as a dst (component roots) contributed only a
    * filtered-out (v → v) in the explicit-self formulation, so dropping
    * their self rows changes nothing. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e
      .select(greatest(col("src"), col("dst")).as("src"),
              least(col("src"), col("dst")).as("dst"))
    val mins = oriented.groupBy("src").agg(min("dst").as("m"))
    oriented.join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Edge-count ceiling for the single-task inline CC arm (r16, guide
    * §1.2/§8: the distributed star loop pays several shuffle rounds of
    * fixed overhead however small the pair list is — and near-dup pair
    * lists are tiny relative to the corpus). Below the limit the WHOLE
    * edge set is one collect_list row (~16 B/edge ⇒ ≤ ~16 MiB in one
    * task at the default) and components come from one exact union-find
    * expression call; above it the O(log n)-round star loop runs
    * unchanged. The dispatch count is the same bounded metadata the loop
    * already computed for its convergence check. Override with
    * `spark.graft.cc.inlineEdgeLimit` (0 disables the inline arm). */
  val InlineEdgeLimitConf = "spark.graft.cc.inlineEdgeLimit"
  val InlineEdgeLimitDefault = 1L << 20

  /** Component label (= minimum member id) for every node that appears in
    * `edges`. Input columns: (src, dst) — any numeric/orderable id type;
    * output: (id, component).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var e = edges.select(col(edges.columns(0)).as("src"),
                         col(edges.columns(1)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val inlineLimit = e.sparkSession.conf
      .getOption(InlineEdgeLimitConf).map(_.toLong)
      .getOrElse(InlineEdgeLimitDefault)
    if (e.count() <= inlineLimit) {
      import org.apache.spark.sql.graft.GraphExpressions.cc_inline
      return e
        .agg(collect_list(struct(col("src"), col("dst"))).as("es"))
        .select(explode(cc_inline(col("es"))).as("x"))
        .select(col("x.id").as("id"), col("x.component").as("component"))
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // star graphs are fixpoints of both steps → stable edge set = done.
      // Both sets are distinct, so equal counts + one-sided inclusion ⇒
      // equality (count first: it's a cheap short-circuit on the common
      // not-yet-converged rounds).
      converged = next.count() == e.count() && next.exceptAll(e).isEmpty
      e = next
      i += 1
    }
    // final edge set is a union of stars: child → root; roots label themselves
    val members = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst")).distinct()
      .select(col("dst").as("id"), col("dst").as("component"))
    members.union(roots).distinct()
  }

  /** Cluster labels for a document near-dup pair list: every document in
    * `docs` gets a cluster_id (= min doc id of its near-dup component;
    * singletons label themselves). */
  def clusterLabels(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("cluster_id"))
  }

  /** Fold a NEW batch of near-dup pairs into existing cluster labels
    * without re-clustering the corpus — the label side of nightly
    * incremental dedup (pairs from [[DedupOps.incrementalNearDups]]).
    *
    * The old state enters as its star edges (id → cluster_id), so the
    * iteration's input is O(corpus) already-contracted 2-hop stars plus
    * O(batch) new pairs: components the new pairs don't touch are
    * fixpoints of both star steps and converge immediately; only bridged
    * components do real work. Labels stay = min member id (each old
    * cluster_id IS its component's minimum and participates as a node),
    * so `updateClusterLabels(docs, id, clusterLabels(docs, id, old), new)`
    * ≡ `clusterLabels(docs, id, old ∪ new)` — proven in
    * DedupClustersSpec against re-clustering from scratch.
    */
  def updateClusterLabels(docs: DataFrame, idCol: String,
                          oldLabels: DataFrame, newPairs: DataFrame): DataFrame = {
    val stars = oldLabels
      .select(col(idCol).as("src"), col("cluster_id").as("dst"))
      .filter(col("src") =!= col("dst"))
    val np = newPairs.select(col(newPairs.columns(0)).as("src"),
                             col(newPairs.columns(1)).as("dst"))
    clusterLabels(docs, idCol, stars.union(np))
  }

  /** The rows of `scored` that survive dedup when each cluster keeps its
    * HIGHEST-`scoreCol` member (ties → smallest id) — what curation
    * actually wants: the best representative, not the smallest id. One
    * `max_by` aggregation on cluster_id (map-side combinable: the shuffle
    * carries one candidate per cluster per partition) + a semi-join back;
    * no window, no per-cluster sort. */
  def keepBestPerCluster(scored: DataFrame, idCol: String, labels: DataFrame,
                         scoreCol: String): DataFrame = {
    // min_by over (-score, id): highest score wins, ties to the SMALLEST
    // id. Only the (numeric) score is negated — the id rides unmodified,
    // so string/UUID ids order correctly too (max_by over (score, -id)
    // would silently mis-pick on non-numeric ids).
    val winners = scored.join(labels, Seq(idCol))
      .groupBy("cluster_id")
      .agg(expr(s"min_by($idCol, struct(-$scoreCol, $idCol))").as(idCol))
      .select(idCol)
    scored.join(winners, Seq(idCol), "left_semi")
  }
}
