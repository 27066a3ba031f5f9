package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IntervalOps

/** Dedup clustering: connected components over a near-duplicate pair
  * graph, so a chain a~b~c collapses to ONE cluster even when a and c
  * are not directly similar (the transitive closure t14's greedy
  * drop-the-later-doc rule approximates). Iterative min-label
  * propagation — the standard Pregel-style loop (each node takes the
  * min label among itself and its neighbors until fixpoint), which
  * converges in O(component diameter) rounds; near-dup components are
  * shallow in practice. Each round is one join + one aggregate, all
  * hash-partitioned on the node id; the only driver-side work is the
  * convergence count per round, as in any iterative MLlib algorithm.
  */
object Dedup {

  /** @param pairs undirected edges (leftCol, rightCol)
    * @return (doc_id, cluster) for every node that appears in an edge;
    *   cluster = min doc_id of the component (deterministic). */
  def connectedComponents(pairs: DataFrame, leftCol: String = "d1",
                          rightCol: String = "d2",
                          maxIters: Int = 50): DataFrame = {
    // edges are cached pre-partitioned on the join key `b`: every
    // round joins labels (re-shuffled anyway — they change) against
    // the SAME static edge table, so hash-partitioning it once lets
    // Catalyst reuse the cached partitioning and drop the edges-side
    // exchange from every round's plan
    val edges = pairs.select(col(leftCol).as("a"), col(rightCol).as("b"))
      .union(pairs.select(col(rightCol).as("a"), col(leftCol).as("b")))
      .distinct().repartition(col("b")).cache()
    // each round MUST truncate lineage (eager localCheckpoint): the
    // round-N plan otherwise nests the round-N-1 plan — caching
    // shortcuts execution but not the logical plan, which grows
    // exponentially and OOMs the planner after ~20 rounds.
    // labels start at round 1's output — min(self, neighbors) straight
    // off the symmetrized edges (every node appears as `a`) — which
    // saves one full join+aggregate+count round vs identity labels
    var labels = edges.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("lab"))
      .select(col("a").as("doc_id"), col("lab")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("lab").as("nlab")), "b")
        .groupBy(col("a")).agg(min(col("nlab")).as("minNbr"))
      // the did-it-shrink flag rides the checkpointed frame, so the
      // convergence count is a scan of the materialized partitions —
      // not (as in earlier rounds) an extra shuffle join of next
      // against the previous labels every iteration
      val next = labels
        .join(nbrMin.select(col("a").as("doc_id"), col("minNbr")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lab"), coalesce(col("minNbr"), col("lab"))).as("lab"),
          coalesce(col("minNbr") < col("lab"), lit(false)).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      labels = next.select("doc_id", "lab")
      iter += 1
    }
    edges.unpersist()
    require(changed == 0, s"label propagation did not converge in $maxIters rounds")
    labels.select(col("doc_id"), col("lab").as("cluster"))
  }

  /** Exact duplicated-SPAN detection — the substring-level dedup of
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2022), re-expressed relationally: every k-token
    * window whose rolling-hash id occurs more than once in the corpus
    * (cross-doc or within-doc) marks the span [pos, pos+k) as
    * duplicated; per doc the overlapping spans merge into islands via
    * the interval algebra ([[IntervalOps.coalesce]] — text dedup and
    * video-interval coalescing are the same operator), and subtracting
    * island length from the token count is the kept text.
    *
    * Returns (doc_id, dup_toks, n_islands) for docs with >= 1
    * duplicated span. Scale shape: shingling is map-side (native
    * array expression, no token-table window); the duplicate-id set
    * is one hash aggregation on a bounded-width long key; the join
    * back is sid-hash-partitioned, and the duplicated subset — tiny
    * relative to the corpus — is all that reaches the coalesce
    * window. A df-cap on pathological hot n-grams (boilerplate) is
    * unnecessary here because count>1 spans are *meant* to include
    * them; the group-by bounds the blowup at one row per occurrence,
    * never occurrence-squared. */
  /** The coalesced duplicated-span islands themselves:
    * (doc_id, s, e) in token positions, per doc, disjoint. */
  def dupSpanIslands(docs: DataFrame, k: Int): DataFrame = {
    val grams = TextOps.positionedShingles(docs, k)
      .select(col("doc_id"), col("s"),
        TextOps.fingerprint(col("sh")).as("sid"))
    val dup = grams.groupBy(col("sid"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).select("sid")
    val spans = grams.join(dup, "sid")
      .select(col("doc_id").as("k"), col("s").cast("long").as("s"),
        (col("s") + k).cast("long").as("e"))
    IntervalOps.coalesce(spans)
      .select(col("k").as("doc_id"), col("s"), col("e"))
  }

  def dupSpanStats(docs: DataFrame, k: Int): DataFrame =
    dupSpanIslands(docs, k)
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s")).as("dup_toks"),
        count(lit(1)).as("n_islands"))

  /** The production output of span dedup: every token covered by a
    * duplicated island is dropped and the survivors re-join in
    * position order. Docs reduced to nothing disappear (no empty-text
    * rows). The anti join is equi on doc_id with the range predicate
    * on top — per-doc island counts are small, so the extra predicate
    * is cheap inside the per-key group. */
  def removeDupSpans(docs: DataFrame, k: Int): DataFrame = {
    val isl = dupSpanIslands(docs, k)
      .select(col("doc_id").as("__d"), col("s").as("__s"), col("e").as("__e"))
    TextOps.tokens(docs)
      .join(isl, col("doc_id") === col("__d") &&
        col("pos") >= col("__s") && col("pos") < col("__e"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("text_kept"))
  }
}
