package graft

import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame

/** The greedy unrolled loops (k-center farthest-first, MMR rerank)
  * must truncate lineage per pick: without the per-round eager
  * localCheckpoint their pick-N plan nests the pick-N-1 plan, so
  * driver planning time grows with every pick and a k in the hundreds
  * stalls the planner before any executor runs. These tests pin the
  * O(1)-plan-depth-per-pick invariant at k=50 and re-check the greedy
  * trace is unchanged by the checkpointing. */
class GreedyLoopSpec extends SparkSpec {
  import spark.implicits._

  private def planNodes(df: DataFrame): Int =
    df.queryExecution.logical.collect { case n => n }.size

  // 120 deterministic vectors, dim 8 — big enough that 50 distinct
  // k-center/MMR picks exist, small enough to run in seconds
  private lazy val corpus = {
    val rows = (0L until 120L).map { i =>
      val e = Array.tabulate(8)(j =>
        (math.sin((i * 31 + j * 7).toDouble) * 100).toFloat)
      (i, e, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("kcenterPicks at k=50: plan depth is O(1), picks stay distinct") {
    val out = Similarity.kcenterPicks(corpus, 50)
    // the returned frame is a projection over the last round's
    // checkpoint — a handful of nodes, NOT one subtree per pick
    assert(planNodes(out) < 20,
      s"plan has ${planNodes(out)} nodes — lineage is accumulating per pick")
    val picks = out.select("vec_id", "pick", "d2")
      .as[(Long, Int, Long)].collect().toList.sortBy(_._2)
    assert(picks.size === 50)
    assert(picks.map(_._1).distinct.size === 50)
    // coverage radii are non-increasing (the Gonzalez invariant)
    val radii = picks.tail.map(_._3)
    assert(radii === radii.sorted.reverse)
  }

  test("kcenterPicks trace matches the unchunked greedy on a known fixture") {
    // the SimilaritySpec fixture contract: seed 0, anti-parallel vec 3
    // is the true farthest second pick
    val m = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 1),
      (2L, Array(0f, 1f, 0f, 0f), 1),
      (3L, Array(-1f, 0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val picks = Similarity.kcenterPicks(m, 3).orderBy("pick")
      .select("vec_id").as[Long].collect().toList
    assert(picks.head === 0L && picks(1) === 3L && picks.size === 3)
  }

  test("mmrRerank at k=50: plan depth is O(1), slate is a 50-permutation") {
    val q = corpus.filter($"vec_id" < 2)
    val out = Similarity.mmrRerank(corpus, q, poolK = 60, k = 50)
    assert(planNodes(out) < 20,
      s"plan has ${planNodes(out)} nodes — lineage is accumulating per pick")
    val slate = out.select("q_id", "vec_id", "pick")
      .as[(Long, Long, Int)].collect().toList
    assert(slate.size === 100) // 2 queries x 50 picks
    slate.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.size === 50)
      assert(rows.map(_._3).sorted === (1 to 50).toList)
    }
  }
}
