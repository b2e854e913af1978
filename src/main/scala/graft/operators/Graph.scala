package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components
  * ([[DedupClusters]] owns those): weighted PageRank in integer
  * fixed-point arithmetic.
  *
  * Why fixed-point: float PageRank sums contributions in partition order,
  * so two runs (or two engines) disagree in the last ulps and no exact
  * oracle can gate it. Here every rank is a Long in units of
  * `1/scale`-ths: per-edge contribution `(r(src) · w) DIV wout(src)` and
  * the damping fold are pure integer ops — order-independent,
  * engine-exact, reproducible at any parallelism. DuckDB replays the same
  * iteration as a recursive CTE and matches bit-for-bit.
  *
  * Scale shape: each iteration is one join of the edge table against the
  * ≤|V|-row rank table (broadcastable when V is small — Catalyst/AQE
  * picks that up from size estimates) plus one dst-keyed aggregation with
  * map-side combine; `localCheckpoint` keeps the plan flat across
  * iterations (same discipline as [[DedupClusters]]). Driver-side data is
  * bounded metadata only: the node count. The per-sweep dangling mass
  * stays LAZY — a single-row aggregate cross-joined (broadcast-scalar
  * pattern, as in `sub_scalar_avg`) into the same sweep's rank plan, so
  * each sweep is exactly ONE job (the eager `localCheckpoint`), never a
  * separate driver-synced action.
  * Overflow bound: callers must keep
  * `scale · max(w) < 2^63` — at the default 1e12 scale that allows
  * per-edge weights up to ~9.2e6; renormalize heavier edge tables first.
  */
object Graph {

  /** Weighted PageRank over `edges(src, dst, w)` in fixed-point integer
    * arithmetic. Returns (node, r) where r ≈ rank · scale; ranks of a
    * damping-factor-d walk with `iters` synchronous sweeps. Nodes with no
    * inbound edges settle at the teleport floor `(scale·(1−d)) DIV N`.
    * DANGLING nodes (no outbound edges) follow the standard correction:
    * their mass is redistributed uniformly over all nodes each sweep
    * (`share = D DIV N` added to every node's contribution before
    * damping), so total mass is conserved up to integer floor loss
    * instead of contracting — GraphSpec pins a sink-node graph to the
    * independently computed fixed point and asserts conservation. The
    * dangling node SET is static — derived once up front and carried as a
    * boolean flag on the node/rank table — so the per-sweep mass is a
    * join-free conditional aggregate folded lazily into the sweep's plan.
    */
  def pageRankInt(edges: DataFrame, iters: Int = 10,
                  scale: Long = 1000000000000L,
                  dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    val bare = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    // the static dangling SET rides as a boolean ON the node table (one
    // up-front left join), so the per-sweep mass needs no join at all —
    // just a conditional aggregate over the rank table it already carries
    val nodes = bare
      .join(edges.select(col("src").as("node")).distinct()
          .withColumn("__out", lit(true)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__out"), lit(false)).as("__out"))
      .localCheckpoint()
    val n = nodes.count() // bounded metadata, not data: |V| rows
    require(n > 0, "pageRankInt: empty edge table")
    val outW = edges.groupBy("src").agg(sum("w").as("wout"))
    val e = edges.join(outW, "src").localCheckpoint()
    val teleport = (scale * (dampDen - dampNum) / dampDen) / n
    var rank = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      // dangling share this sweep: a 1-row conditional aggregate over the
      // ≤|V|-row checkpointed rank table (its __out flag marks the static
      // dangling set), kept LAZY and cross-joined into the rank update
      // (broadcast-scalar pattern) — no join, no separate action; it
      // evaluates inside the same job as the checkpoint below
      val shareDf = rank
        .agg(expr(s"coalesce(sum(CASE WHEN NOT __out THEN r END), 0L) DIV $n")
          .as("__share"))
      val contrib = e.join(rank, e("src") === rank("node"))
        .select(col("dst").as("node"), expr("(r * w) DIV wout").as("t"))
        .groupBy("node").agg(sum("t").as("c"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(shareDf))
        .select(col("node"), col("__out"),
          (expr(s"($dampNum * (coalesce(c, 0L) + __share)) DIV $dampDen") + lit(teleport))
            .as("r"))
        .localCheckpoint()
    }
    rank.select("node", "r")
  }

  /** [[pageRankInt]] for BOUNDED vertex domains (event types, status
    * codes, categories — dozens of distinct values at any corpus size):
    * the corpus-sized edge rollup stays distributed, but the sweeps run
    * inside ONE expression call over the collect_list'd ≤|T|² aggregated
    * edge table ([[org.apache.spark.sql.graft.GraphExpressions]]),
    * replacing `iters` join+aggregate jobs (plus their checkpoints and
    * per-sweep scheduling) with a single-task loop — guide §8's "decide
    * with small rows" applied to the iteration itself. Bit-identical to
    * [[pageRankInt]] (GraphSpec asserts equality); empty edge tables
    * return empty instead of throwing.
    */
  def pageRankIntBounded(edges: DataFrame, iters: Int = 10,
                         scale: Long = 1000000000000L,
                         dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    import org.apache.spark.sql.graft.GraphExpressions.pagerank_sweeps
    edges
      .agg(collect_list(struct(col("src"), col("dst"), col("w"))).as("es"))
      .select(explode(pagerank_sweeps(col("es"), iters, scale, dampNum, dampDen)).as("x"))
      .select(col("x.node").as("node"), col("x.r").as("r"))
  }
}
