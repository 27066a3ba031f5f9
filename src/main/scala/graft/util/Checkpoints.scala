package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage control for round-based iterative loops (connected
  * components, greedy k-center, MMR): caching shortcuts execution but
  * NOT the logical plan, which otherwise nests one level per round and
  * blows up driver planning time (exponentially for self-referencing
  * plans, linearly for greedy accumulators) long before executors see
  * any data. Each round therefore truncates lineage with an eager
  * `localCheckpoint`, and the superseded round's blocks are freed the
  * moment the successor is materialized — pinned state stays O(1)
  * frames per loop, not O(rounds) for the life of the session. */
object Checkpoints {

  /** The checkpoint RDD backing an already-localCheckpoint-ed frame
    * (the handle needed to unpersist it once superseded). */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Eagerly checkpoint `df`, then free `prev`'s backing blocks (safe
    * ordering: the new checkpoint is materialized before the old one
    * is dropped). Returns the truncated frame plus its pinned RDD to
    * thread into the next round. */
  def roll(df: DataFrame, prev: Option[RDD[_]]): (DataFrame, Option[RDD[_]]) = {
    val cp = df.localCheckpoint(true)
    val pinned = checkpointRdd(cp)
    prev.foreach(_.unpersist(blocking = false))
    (cp, pinned)
  }

  /** Post-materialization cleanup for a query whose RESULT plan still
    * references pinned checkpoints (e44's final label pin, the Lloyd
    * loop's assignment pin inside IntKMeans.fit): those blocks cannot
    * be unpersisted inside the query — the returned frame is lazy,
    * localCheckpoint data has no lineage to recompute from, and an
    * early unpersist would make the consumer's eventual action read
    * freed blocks. The contract is therefore: materialize the result
    * FIRST, then call this. Verify and Bench both do (their per-query
    * sweep is exactly this call); an embedding application running
    * many queries in one session should do the same between queries,
    * or the final pins of each iterative query accumulate for the
    * session's lifetime. */
  def sweep(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
