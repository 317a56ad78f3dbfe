package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.queries.DedupQueries

/** Connected-components correctness: known graphs + the real near-dup
  * pair graph from MinHash-LSH on the documents table. */
class ConnectedComponentsSpec extends SparkTestBase {

  import spark.implicits._

  test("chain, triangle, and crossing edges collapse to min-id components") {
    // 1-2-3-4 chain; 10-11-12 triangle; 20-21 pair; bridge 4-10 merges
    // the chain and the triangle into one component rooted at 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (4L, 10L)).toDF("src", "dst")
    val cc = ConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L).forall(cc(_) == 1L), cc)
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("component count matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong)).filter(e => e._1 != e._2)
    // Driver-side union-find as the oracle.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val oracle = vertices.map(v => v -> find(v)).toMap
    val cc = ConnectedComponents.run(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Same partition into components (roots may differ only if min-id
    // differs — but both use min-id, so exact equality holds).
    assert(cc == oracle,
      s"diff: ${cc.toSet.diff(oracle.toSet).take(5)}")
  }

  test("small/large-star matches label propagation on random graphs") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong,
      rnd.nextInt(80).toLong)).filter(e => e._1 != e._2).toDF("src", "dst")
    val lp = ConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = ConnectedComponents.runStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == lp, star.toSet.diff(lp.toSet).take(5))
  }

  test("pathological chain: star converges in O(log n) rounds; run escalates") {
    // A 600-vertex path has diameter 599 — label propagation's default
    // 20-round budget cannot converge; the escalation path must hand the
    // SAME answer back via small/large-star (which needs only ~log²n
    // rounds, so the tight maxRounds below proves the round complexity).
    val chain = (0L until 599L).map(i => (i, i + 1)).toDF("src", "dst")
    val star = ConnectedComponents.runStar(chain, maxRounds = 15).collect()
    assert(star.length == 600)
    assert(star.forall(_.getLong(1) == 0L))
    val escalated = ConnectedComponents.run(chain).collect()
    assert(escalated.length == 600)
    assert(escalated.forall(_.getLong(1) == 0L))
  }

  test("near-dup clusters from LSH pairs keep one representative each") {
    val pairs = DedupQueries.qDedupMinhashLsh(spark, sf)
      .select("d1", "d2")
    if (pairs.isEmpty) cancel("no near-dup pairs at this scale")
    val drop = ConnectedComponents.dropSet(pairs).collect()
      .map(_.getLong(0)).toSet
    val all = pairs.select(explode(array(col("d1"), col("d2"))))
      .distinct().collect().map(_.getLong(0)).toSet
    // Every cluster keeps ≥1 doc: the kept set is non-empty and every
    // dropped doc has a pair-path partner that survives or is dropped
    // into the same component (checked via component roots).
    assert(drop.subsetOf(all))
    assert((all -- drop).nonEmpty)
    // Roots (kept docs) are never in the drop set.
    val comps = ConnectedComponents.run(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    comps.foreach { case (_, root) => assert(!drop.contains(root)) }
  }
}
