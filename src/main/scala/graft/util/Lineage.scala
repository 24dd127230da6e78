package graft.util

import org.apache.spark.sql.DataFrame

/** Logical-plan lineage truncation for ITERATIVE DataFrame algorithms
  * (connected components, BPE merge learning, k-means chains): a loop
  * that builds round r's frame on top of round r-1's grows the Catalyst
  * plan every round, and analysis/cache-lookup cost over the carried
  * tree compounds — `Dataset.persist` alone does NOT cut the logical
  * plan, it only short-circuits execution. Measured in the BPE learner:
  * per-round wall time doubled every round past ~14 and OOM'd an 8 GB
  * driver at round 19, with the DATA (a ~10k-word vocabulary) unchanged
  * throughout.
  *
  * [[cut]] re-roots the frame as a LogicalRDD over the persisted
  * row RDD: execution stays incremental (reads the cache), the plan
  * stays O(1) deep, and the returned release hook unpersists the RDD
  * (row-level recompute after release walks the RDD lineage chain —
  * linear, RDD-side — so released results remain usable, just slower).
  */
object Lineage {
  private val CacheLvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Returns the lineage-cut frame and its release hook (argument =
    * blocking). Callers iterate: cut round r, release round r-1 once
    * r is materialized. */
  def cut(df: DataFrame): (DataFrame, Boolean => Unit) = {
    val rdd = df.rdd
    rdd.persist(CacheLvl)
    val c = df.sparkSession.createDataFrame(rdd, df.schema)
    (c, blocking => { rdd.unpersist(blocking); () })
  }

  /** HARD lineage sever via eager `localCheckpoint`: materializes `df`
    * and re-roots it over the checkpointed internal-row RDD, dropping
    * BOTH the Catalyst plan AND the RDD recompute chain. Use where a
    * small-but-expensively-derived frame (a fingerprint trunk, an
    * evidence edge set) feeds MANY downstream stages: after [[cut]] the
    * persisted RDD still carries its full upstream closure chain, so
    * every downstream task binary serializes/deserializes the whole
    * expression tree — measured on mm_dup_union as ~30 GB of
    * ObjectInputStream/TreeNode allocation for one gate, the G1
    * humongous/expansion churn no JVM flag the repo does not own can be
    * trusted to absorb. After sever the task binary carries only a
    * checkpoint block reference.
    *
    * Tradeoffs vs [[cut]]: the frame is computed once eagerly (no lazy
    * composition), and RELEASE IS DESTRUCTIVE — a locally-checkpointed
    * RDD has no lineage to recompute from, so the returned frame must
    * not be used after its release hook runs (release after the final
    * materialization; [[graft.util.IntermediateCaches.releaseAll]]'s
    * between-queries contract already guarantees this). On a real
    * cluster localCheckpoint data is lost with an executor — for
    * multi-hour 100 TB jobs prefer reliable `checkpoint` to durable
    * storage; locally (and for dimension-sized trunks recomputable by
    * re-running the query) the non-replicated block is the right cost. */
  def sever(df: DataFrame): (DataFrame, Boolean => Unit) = {
    val cp = df.localCheckpoint(true)
    val rdd = cp.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
    (cp, blocking => { rdd.foreach(_.unpersist(blocking)); () })
  }

  /** [[sever]] registered with [[IntermediateCaches]] — the one-liner
    * for operator-internal trunks whose lifetime ends with the query. */
  def severTracked(df: DataFrame): DataFrame = {
    val (cp, release) = sever(df)
    IntermediateCaches.trackRelease(release)
    cp
  }
}
