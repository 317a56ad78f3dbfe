package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB path.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) already handles sort-merge-join skew at runtime; these
  * cover the two shapes AQE does not:
  *
  *  - [[Skew.saltedJoin]] — a shuffle join where ONE key holds so many
  *    rows that even a split partition overwhelms a task: the big side is
  *    salted into `salt` sub-keys with a deterministic per-row spread,
  *    and the small side is replicated `salt`× so every (key, salt)
  *    bucket finds its match. Result is row-identical to the unsalted
  *    join.
  *  - [[Skew.saltedAggregate]] — two-phase aggregation for
  *    high-cardinality-value/low-cardinality-key aggregates where the
  *    map-side partial aggregation cannot shrink the hot key (e.g.
  *    `collect_list`, exact `count(distinct)` re-expressed as two
  *    groupBys). Phase 1 aggregates (key, salt); phase 2 merges the
  *    `salt` partials per key. For algebraic aggregates (sum/count/min/
  *    max/avg) Spark's own partial aggregation already does this —
  *    prefer plain `groupBy` there.
  */
object Skew {

  /** Deterministic row spread in [0, salt): seeded `rand` is stable for
    * a given partitioning, and independence from the join key is what
    * breaks the hot key apart. */
  private def spread(salt: Int): Column =
    (rand(42) * salt).cast("int")

  /** Inner equi-join `big ⋈ small` on `key`, with the hot keys of `big`
    * spread over `salt` sub-partitions. `small` is replicated `salt`×
    * via a literal-range explode (no extra shuffle of `big` beyond the
    * join's own). Use when one key's row count ≫ a task's capacity and
    * the small side is too big to broadcast outright.
    *
    * The join strategy is PINNED to shuffle-hash: Catalyst's size
    * estimate for the replicated side does not model the explode's
    * `salt`× multiplication, so on a column-pruned scan the planner
    * can statically decide the post-explode relation fits a broadcast
    * and then materialize `salt`× that at runtime — measured at the
    * 300× probe as a 9.7 GiB broadcast attempt dying on Spark's 8 GiB
    * hard cap. (Broadcast is never the right static plan here anyway:
    * a broadcastable `small` means the plain broadcast join is already
    * skew-immune and salting is pure overhead.) AQE may still convert
    * to broadcast at runtime from the TRUE materialized exchange size,
    * which is exactly the safe version of that decision. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt", spread(salt))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    // Hint (= hash build side) on the REPLICATED SMALL side only
    // (round-6 ADVICE): a (key, __salt) build cell then holds one
    // key's small-side rows — bounded by the operator's own premise —
    // while the hot big side stays the probe, whose oversized
    // partitions AQE's skew-join (spark.sql.adaptive.skewJoin.enabled,
    // default on; covers shuffled-hash joins since Spark 3.2) splits
    // at runtime. Hinting both sides let the planner build on the big
    // side, trading the avoided broadcast cliff for a per-task
    // build-side OOM that sort-merge would have spilled through.
    bigS.join(smallS.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase grouped aggregation: phase 1 on (keys…, salt) with
    * `partial`, phase 2 on keys with `merge` over the phase-1 column.
    * The caller supplies both halves of the decomposition, e.g.
    * partial = `struct(count, sum)`, merge = sums over the partials.
    *
    * When to use WHICH shape:
    *  - algebraic aggregates (sum/count/min/max/avg): plain `groupBy` —
    *    Spark's map-side partial aggregation already shrinks hot keys;
    *  - exact distinct per key: two hash aggregates
    *    (`groupBy(key, value)` then `groupBy(key).count()`) — the first
    *    shuffle keys on the COMPOSITE so the hot key spreads over the
    *    value hash, and no per-key set is ever one row;
    *  - holistic aggregates whose partials stay bounded (a capped
    *    `collect_set`, a sketch merge, a top-k heap): THIS operator.
    *    Do NOT use it with an unbounded set/list merge — phase 2 would
    *    materialize the full per-key collection on one task, the exact
    *    single-row cliff salting is meant to avoid. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      partial: Column, partialName: String, merge: Column,
      mergeName: String, salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn("__salt", spread(salt))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.as(partialName))
      .groupBy(keys.map(col): _*)
      .agg(merge.as(mergeName))
  }
}
