package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the extracted web graph — the quality
  * signal a web corpus derives from its own structure (a host linked
  * by many well-linked hosts is worth more crawl/keep budget than a
  * link farm; Common Crawl publishes exactly this ranking as its
  * host-level graph).
  *
  * Input edges come from the [[Urls]] layer: extract hrefs
  * ([[Urls.extractHrefs]]), normalize, reduce to hosts or registrable
  * domains, distinct — node cardinality is then HOSTS (millions), not
  * pages (trillions), which is what makes whole-graph iteration
  * tractable at 100 TB.
  */
object Graph {

  /** PageRank by power iteration (Page et al. 1999, the damped form):
    * runs EXACTLY `iterations` rounds of
    * `pr'(v) = (1-d)/N + d·(Σ_{u→v} pr(u)/outdeg(u) + dangling/N)`
    * over the DISTINCT edge set and returns `(id, pr)` per node.
    * Dangling mass (nodes with no outlinks) is redistributed uniformly
    * each round — Σpr stays 1 and ranks match the textbook definition,
    * not the mass-leaking shortcut. A fixed iteration count (not a
    * convergence tolerance) keeps the result a pure function of the
    * input — replayable by an unrolled oracle and stable across
    * partitionings; callers wanting a tolerance loop on the returned
    * frame's delta themselves.
    *
    * Scale shape: edges and out-degrees materialize ONCE
    * (`localCheckpoint`) and every round is two hash joins on the edge
    * key + one aggregation keyed by target — the same bounded-key
    * shuffle per round as the components loop. The node count and the
    * per-round dangling mass ride as broadcast one-row frames (no
    * driver collect, no re-count per round); superseded rank
    * checkpoints are released as soon as the next round materializes,
    * so the plan AND the storage footprint stay constant in the
    * iteration count. Self-loops are legal and contribute to their own
    * node like any edge.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations ($iterations) must be >= 0")
    require(damping > 0.0 && damping < 1.0,
      s"damping ($damping) must be in (0, 1)")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("s"), col(dstCol).as("t"))
      .distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("s"))
      .agg(count(lit(1)).cast("double").as("__od"))
      .localCheckpoint()
    val nodes = e.select(col("s").as("id"))
      .union(e.select(col("t").as("id"))).distinct()
      .localCheckpoint()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    // __n rides as a column so no round re-joins the scalar
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), (lit(1.0) / col("__n")).as("pr"), col("__n"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(deg, "s")
        .join(pr.select(col("id").as("s"), col("pr").as("__ps")), "s")
        .groupBy(col("t").as("id"))
        .agg(sum(col("__ps") / col("__od")).as("__in"))
      val danglingMass = pr
        .join(deg.select(col("s").as("id"), col("__od")), Seq("id"), "left")
        .filter(col("__od").isNull)
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dm"))
      val next = pr
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("id"),
          ((lit(1.0) - damping) / col("__n") +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) +
              col("__dm") / col("__n"))).as("pr"),
          col("__n"))
        .localCheckpoint()
      val stale = pr
      pr = next
      Knn.releaseCheckpoint(stale)
      i += 1
    }
    pr.select(col("id"), col("pr"))
  }
}
