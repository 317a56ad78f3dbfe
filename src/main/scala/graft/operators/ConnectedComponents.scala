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
  * edges). Plain label propagation keeps every round a single self-join
  * — the cheaper constant factor while diameters stay small (near-dup
  * graphs: 3-5 rounds) — but needs O(diameter) rounds, so a pathological
  * chain can exhaust any fixed budget. When that happens [[run]] now
  * ESCALATES to [[runStar]], the alternating small-star/large-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) whose round count is O(log² n) in the worst case —
  * so the operator is correct on every graph shape, while the common
  * case still pays only the cheap per-round constant.
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
      // Long chains exceed the round budget — a partially-converged
      // result would be silently wrong, so escalate to the
      // O(log²n)-round star algorithm instead of warning and hoping.
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"label propagation did not converge within $maxRounds rounds; " +
          "escalating to small-star/large-star")
      return runStar(edges)
    }
    labels
  }

  /** Alternating small-star/large-star connected components (Kiveris et
    * al., SoCC'14) — the adversarial-diameter path: converges in
    * O(log² n) rounds on ANY graph shape, where label propagation needs
    * O(diameter). Each half-round is one grouped aggregate + one join
    * keyed by vertex id; edges only ever point toward smaller ids, so
    * the edge set shrinks toward the final star forest.
    *
    * large-star: every node u connects its LARGER neighbors to
    * m = min(N(u) ∪ {u}). small-star: with edges directed large→small,
    * every node connects its smaller neighbors (and itself) to the
    * minimum. The fixpoint is a star forest centered at component
    * minima. Convergence is detected by an order-insensitive edge-set
    * fingerprint (count + bit_xor of xxhash64(u,v)) and then CONFIRMED with
    * an exact two-sided anti-join — the fingerprint only decides when to
    * pay for the exact check, so a hash collision cannot yield a wrong
    * result, only a wasted round. */
  def runStar(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    import org.apache.spark.sql.Row
    val input = edges.toDF("u", "v")
    val vertices = input.select(explode(array(col("u"), col("v"))).as("id"))
      .distinct().localCheckpoint()
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val d = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = d.groupBy("u").agg(min("v").as("mn"))
      d.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is canonical (u > v): neighbors-below plus self to the min.
      val m = e.groupBy("u").agg(min("v").as("mn"))
      e.join(m, "u")
        .select(col("v").as("u"), col("mn").as("v"))
        .union(m.select(col("u"), col("mn").as("v")))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    }
    def fingerprint(e: DataFrame): (Long, Long) =
      e.agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .collect()(0) match { case Row(c: Long, s: Long) => (c, s) }
    var cur = canon(input).localCheckpoint()
    var fp = fingerprint(cur)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = smallStar(canon(largeStar(cur))).localCheckpoint()
      val nfp = fingerprint(next)
      if (nfp == fp) {
        // Exact confirmation — two-sided anti-join, paid only at the
        // (probable) fixpoint, never per round.
        converged = next.exceptAll(cur).isEmpty && cur.exceptAll(next).isEmpty
      }
      fp = nfp
      cur = next
      round += 1
    }
    require(converged,
      s"small/large-star did not converge within $maxRounds rounds")
    // Star forest: (child u, center v). Centers and isolated vertices
    // label themselves.
    vertices.join(cur, vertices("id") === cur("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("component"))
  }

  /** Near-dup keep set: given similarity pairs (d1, d2), returns the
    * docs to DROP — everything except the minimum id per component. */
  def dropSet(pairs: DataFrame): DataFrame =
    run(pairs).filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
}
