package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive-
  * closure layer of near-duplicate clustering: LSH emits PAIRS, but the
  * keep/drop decision needs CLUSTERS (doc A ~ B, B ~ C ⇒ {A,B,C} keeps
  * exactly one representative).
  *
  * Pure-DataFrame label propagation (no GraphX, no RDDs): every vertex
  * starts labeled with its own id; each round joins labels across edges
  * and takes the per-vertex minimum of (own, all neighbors); fixpoint
  * when no label changes. Rounds ≤ graph diameter; near-dup graphs are
  * clusters of small diameter, so 3-5 rounds in practice.
  *
  * Scale notes: each round is one broadcast-free shuffle keyed by vertex
  * id (evenly distributed), `localCheckpoint` breaks the lineage so the
  * plan does not grow with rounds, and convergence is detected with the
  * same aggregate that computes the round (no extra pass over the
  * edges). The min-label fixpoint is the standard large-graph CC
  * formulation (cf. the small-star/large-star family); plain label
  * propagation keeps every round a single self-join, which at 100 TB is
  * the cheaper constant factor while diameters stay small.
  */
object ConnectedComponents {

  /** @param edges two long columns (src, dst), undirected pairs.
    * @return (id, component) — component = min vertex id reachable. */
  def run(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e = edges.toDF("src", "dst")
    // Both directions once, so each round is a single join.
    val undirected = e.union(e.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().localCheckpoint()
    var labels = undirected.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // Convergence detection is folded into the round's own aggregate:
      // self rows carry the previous label in `old` (null on neighbor
      // rows, so max() recovers it), and the changed-row check is a
      // short-circuiting scan of the just-checkpointed partitions — no
      // second join+count job per round.
      val viaNeighbors = undirected
        .join(labels, undirected("dst") === labels("id"))
        .select(col("src").as("id"), col("component").as("cand"),
          lit(null).cast("long").as("old"))
      val self = labels.select(col("id"), col("component").as("cand"),
        col("component").as("old"))
      val next = self.union(viaNeighbors)
        .groupBy("id").agg(min("cand").as("component"), max("old").as("old"))
        .localCheckpoint()
      converged = next.filter(col("component") =!= col("old")).isEmpty
      labels = next.select("id", "component")
      round += 1
    }
    if (!converged) {
      // A non-converged result has silently wrong components (long
      // chains exceed the round budget) — surface it loudly.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connected components did NOT converge within $maxRounds rounds; " +
          "labels may span partially-merged components")
    }
    labels
  }

  /** Near-dup keep set: given similarity pairs (d1, d2), returns the
    * docs to DROP — everything except the minimum id per component. */
  def dropSet(pairs: DataFrame): DataFrame =
    run(pairs).filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
}
