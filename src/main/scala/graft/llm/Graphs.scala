package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * (the Hash-to-Min shape — Rastogi et al., "Finding Connected
  * Components in Map-Reduce in Logarithmic Rounds", 2013): every vertex
  * repeatedly adopts the minimum label in its neighborhood until a
  * fixed point. Each round is one shuffle join + one aggregate over the
  * edge list — O(|E|) per round, converging in rounds ≤ the largest
  * component diameter (near-dup components are shallow: exact-dup
  * groups are stars, verified-pair clusters have small diameter).
  *
  * Same algorithm as [[NearDupOps.dupClusters]]'s inline loop; factored
  * here for operators whose edges are not MinHash pairs (e.g. the
  * embedding-space dup graph of [[VectorOps.semanticDedup]]).
  */
object Graphs {

  /** @param pairs undirected edges as (src, dst) — one row per edge,
    *              any orientation; symmetrized internally.
    * @return (id, component) for every vertex that appears in an edge;
    *         component = min vertex id reachable. Isolated vertices
    *         (absent from `pairs`) are absent — callers left-join and
    *         coalesce to the vertex's own id. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    val p = pairs.toDF("src", "dst")
    // Materialize the edge list once: every propagation round joins
    // against it, and without the cut each round would re-run the
    // whole upstream pipeline that produced the pairs.
    val edges = graft.Materialize.stable(
      p.union(p.select(col("dst"), col("src"))).toDF("src", "dst"))
    var labels = graft.Materialize.stable(
      edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val next = graft.Materialize.stable(labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("next_label")))
      changed = next.filter(col("next_label") < col("label")).count()
      labels = next.select(col("id"), col("next_label").as("label"))
      rounds += 1
    }
    // Converging silently wrong is worse than failing: a component with
    // diameter > maxRounds would split into several "components" with
    // several survivors each.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: no convergence in $maxRounds rounds")
    labels.select(col("id"), col("label").as("component"))
  }
}
