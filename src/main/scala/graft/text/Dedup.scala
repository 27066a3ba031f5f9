package graft.text

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import graft.operators.IntervalOps

/** Dedup clustering: connected components over a near-duplicate pair
  * graph, so a chain a~b~c collapses to ONE cluster even when a and c
  * are not directly similar (the transitive closure t14's greedy
  * drop-the-later-doc rule approximates). Min-label propagation with
  * POINTER DOUBLING: each round every node takes the min label among
  * itself and its neighbors (one hop), then chases its own label's
  * label (lab := lab(lab)), so the distance a label travels roughly
  * doubles per round — O(log diameter) rounds instead of O(diameter)
  * (the shortcutting move of classic PRAM CC / large-star–small-star;
  * a 64-node chain converges in 5 rounds, spec-checked, vs 63 for
  * plain propagation). Each round is two joins + one aggregate, all
  * hash-partitioned on the node id; the only driver-side work is the
  * convergence count per round, as in any iterative MLlib algorithm.
  */
object Dedup {

  /** @param pairs undirected edges (leftCol, rightCol)
    * @return (doc_id, cluster) for every node that appears in an edge;
    *   cluster = min doc_id of the component (deterministic). */
  def connectedComponents(pairs: DataFrame, leftCol: String = "d1",
                          rightCol: String = "d2",
                          maxIters: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, leftCol, rightCol, maxIters)._1

  /** The block-manager RDD pinned by an eager `localCheckpoint`: the
    * checkpointed frame's analyzed plan is a single [[LogicalRDD]] leaf
    * wrapping the materialized RDD. Holding this handle lets the CC
    * loop free each superseded round deterministically —
    * `spark.catalog.clearCache()` only drops catalog-cached relations,
    * never checkpoint blocks, so without explicit unpersist every
    * round of every CC call stays pinned for the life of the session
    * (the round-6 gate measured t15 at 16.5 s in-run vs 3.3 s
    * standalone from exactly this accumulation). */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** [[connectedComponents]] plus the number of label-propagation
    * rounds executed — the doubling's O(log diameter) bound is a spec
    * contract (DedupSpec: a 64-node chain converges in <= 8 rounds,
    * not 63), so the round count is observable.
    *
    * Session-lifetime invariant: at most ONE superseded frame is ever
    * pinned alongside the live one mid-round, and on return only the
    * final round's labels remain (the returned frame is backed by that
    * checkpoint, so it cannot be freed here — a harness that runs many
    * queries sweeps `sc.getPersistentRDDs` between them). */
  def connectedComponentsWithRounds(pairs: DataFrame, leftCol: String = "d1",
                          rightCol: String = "d2",
                          maxIters: Int = 50): (DataFrame, Int) = {
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
    // handles to the checkpoint(s) backing the live `labels`; each
    // superseded round is unpersisted the moment its successor is
    // materialized, so pinned state stays O(1) frames per CC call
    // instead of O(rounds) for the life of the session
    var pinned: Seq[RDD[_]] = checkpointRdd(labels).toSeq
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("lab").as("nlab")), "b")
        .groupBy(col("a")).agg(min(col("nlab")).as("minNbr"))
      // materialize the expensive subtree (edges ⨝ labels + aggregate
      // + left join) exactly ONCE per round: both the pointer chase and
      // the round's output derive from this checkpointed frame. Before
      // round 7 the chase self-joined an UNmaterialized `stepped`, so
      // Catalyst executed that whole subtree twice per round —
      // doubling round cost and eating the pointer-doubling win. The
      // checkpoint is LAZY: the convergence count right below is the
      // job that materializes (and thereby persists) it.
      val stepped = labels
        .join(nbrMin.select(col("a").as("doc_id"), col("minNbr")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lab"), coalesce(col("minNbr"), col("lab"))).as("lab"),
          (coalesce(col("minNbr"), col("lab")) < col("lab")).as("chg"))
        .localCheckpoint(false)
      // convergence rides the ONE-HOP step, not the chase: if
      // min(self, neighbors) changes no label, then across every edge
      // (u,v) lab(u) <= lab(v) and lab(v) <= lab(u) — labels are
      // constant per component, i.e. the global fixpoint. So a
      // no-change round exits after this single job and never pays its
      // pointer chase (the chase is an accelerator, it cannot create
      // changes a later step wouldn't make).
      changed = stepped.filter(col("chg")).count()
      iter += 1
      val steppedRdd = checkpointRdd(stepped).toSeq
      if (changed == 0) {
        steppedRdd.foreach(_.unpersist(false))
      } else {
        // pointer doubling: lab := lab(lab). Every label value IS a
        // node id of the symmetrized edge set (labels only ever take
        // node ids as values), so the chase is a self-join of the
        // stepped labels on lab = doc_id; lab(lab) <= lab by
        // monotonicity, and the hop distance a label has traveled
        // doubles each round.
        val ptr = stepped.select(col("doc_id").as("lab"), col("lab").as("lab2"))
        val next = stepped
          .join(ptr, Seq("lab"), "left")
          .select(col("doc_id"),
            least(col("lab"), coalesce(col("lab2"), col("lab"))).as("lab"))
          .localCheckpoint(true)
        // next is materialized and lineage-free: the previous labels
        // and this round's stepped are both superseded — free them
        (pinned ++ steppedRdd).foreach(_.unpersist(false))
        pinned = checkpointRdd(next).toSeq
        labels = next
      }
    }
    edges.unpersist()
    require(changed == 0, s"label propagation did not converge in $maxIters rounds")
    (labels.select(col("doc_id"), col("lab").as("cluster")), iter)
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
    * rows).
    *
    * Scale shape (the round-6 rewrite): text stays COLUMNAR. The
    * coalesced islands — few rows per doc, tiny relative to the corpus
    * — aggregate into one array per doc and equi-join onto `docs` by
    * doc_id; each surviving row then rebuilds itself with a per-row
    * higher-order filter over its own `split(text)` array (token kept
    * iff no island covers its index). Nothing per-token ever crosses an
    * exchange and no aggregation buffer holds document text: per-group
    * state in the islands aggregate is O(islands-per-doc), and the only
    * corpus-sized shuffle is the doc_id join of (doc, islands-array).
    * The previous plan (explode every corpus token, anti-range-join,
    * collect_list + array_sort the survivors back into documents) moved
    * one struct per token through a shuffle and rebuilt documents inside
    * unbounded aggregation buffers — 33.5 s at sf0.1 vs ~1 s for this
    * form, and a memory hazard on long documents. */
  def removeDupSpans(docs: DataFrame, k: Int): DataFrame = {
    val isl = dupSpanIslands(docs, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("__isl"))
    val toks = split(col("text"), " ")
    docs.join(isl, Seq("doc_id"), "left")
      .withColumn("__kept",
        when(col("__isl").isNull, toks)
          .otherwise(filter(toks, (_, i) =>
            !exists(col("__isl"), sp =>
              i.cast("long") >= sp.getField("s") &&
                i.cast("long") < sp.getField("e")))))
      .filter(size(col("__kept")) > 0)
      .select(col("doc_id"),
        size(col("__kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("__kept")).as("text_kept"))
  }

  /** Per-node triangle participation counts over an id-ordered edge
    * list (`left < right` on every row, as the near-dup pair
    * generators emit): the ordered-edge pattern (ab ⋈ bc ⋈ ac) finds
    * each triangle a<b<c exactly once, then the three roles explode
    * and roll up. The density signal that separates clique-ish
    * template-spam clusters from chains of drifting revisions. Scale:
    * both joins key on shared endpoints of the edge list — degree (and
    * so join fan-out) is bounded by the candidate generator's df-cap,
    * and the corpus is never touched. */
  def trianglesPerNode(pairs: DataFrame, leftCol: String = "d1",
                       rightCol: String = "d2"): DataFrame = {
    val e = pairs.select(col(leftCol), col(rightCol))
    val ab = e.select(col(leftCol).as("a"), col(rightCol).as("b"))
    val bc = e.select(col(leftCol).as("b"), col(rightCol).as("c"))
    val ac = e.select(col(leftCol).as("a"), col(rightCol).as("c"))
    ab.join(bc, "b").join(ac, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }
}
