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
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
    // Both directions once, so each round is a single join.
    val undirected = e.union(e.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().localCheckpoint()
    var labels = undirected.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val viaNeighbors = undirected
        .join(labels, undirected("dst") === labels("id"))
        .select(col("src").as("id"), col("component"))
      val next = labels.select("id", "component").union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("component", "old"),
          "id")
        .filter(col("component") =!= col("old")).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    labels
  }

  /** Near-dup keep set: given similarity pairs (d1, d2), returns the
    * docs to DROP — everything except the minimum id per component. */
  def dropSet(pairs: DataFrame): DataFrame =
    run(pairs).filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
}
