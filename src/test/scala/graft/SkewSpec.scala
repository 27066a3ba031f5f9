package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}

/** Skew/adversarial-input properties for the near-dup candidate
  * generators and CC clustering. The df-cap and the pointer doubling
  * are load-bearing at 100 TB — a boilerplate shingle shared by f docs
  * otherwise emits f^2 candidate pairs, and a deep dup-chain otherwise
  * costs diameter rounds — but the oracle fixtures are well-behaved,
  * so the pathological shapes get pinned here. (Cases are
  * deterministic constructions, not scalacheck: the scalatest bridge
  * isn't in the offline cache — see IntervalOpsSpec.)
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** n docs sharing a 12-token boilerplate prefix (every one of its 10
    * interior 3-shingles has df = n) plus a unique 2-token tail (2
    * boundary shingles with df = 1 per doc). */
  private def boilerplateCorpus(n: Int): DataFrame = {
    val boiler = (1 to 12).map(i => s"w$i").mkString(" ")
    (0 until n).map(i => (i.toLong, s"$boiler u${i}a u${i}b"))
      .toDF("doc_id", "text")
  }

  test("df-cap bounds jaccardPairs on a boilerplate-dominated corpus") {
    for (n <- Seq(30, 60)) {
      val docs = boilerplateCorpus(n)
      // capped: every shared shingle has df = n > cap and leaves the
      // inverted index; the df=1 tail shingles pair nothing — zero
      // candidates ever reach the join
      val capped = TextOps.jaccardPairs(docs, k = 3, dfCap = 10, tauJacc = 0.5)
      assert(capped.count() === 0L,
        s"n=$n: df-cap failed to drop the hot shingles")
      // uncapped: boilerplate dominates every doc (inter=10 of 12
      // shingles, jacc = 10/14 ≈ 0.71) so ALL C(n,2) pairs emit — the
      // f^2 blowup the cap exists to prevent
      val uncapped = TextOps.jaccardPairs(docs, k = 3, dfCap = n + 1, tauJacc = 0.5)
      assert(uncapped.count() === n.toLong * (n - 1) / 2,
        s"n=$n: expected the full quadratic pair set without the cap")
    }
  }

  test("minhash banding over df-capped ids stays bounded on boilerplate") {
    val n = 40
    val docs = boilerplateCorpus(n)
    val ids = TextOps.shingleIds(docs, 3)
    val hot = ids.groupBy(col("sid")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 10).select("sid")
    def bandCandidates(src: DataFrame): Long = {
      val bands = TextOps.lshBands(TextOps.minhash(src, 8), 2)
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct().count()
    }
    // capped ids: only the unique tail shingles feed the signatures,
    // so no two docs collide in any band
    assert(bandCandidates(ids.join(hot, Seq("sid"), "left_anti")) === 0L,
      "df-capped minhash banding still emitted candidates")
    // uncapped: the shared shingles dominate most per-hash minima, so
    // the hot-key blowup shows up as a near-quadratic candidate set
    assert(bandCandidates(ids) >= n.toLong * (n - 1) / 4,
      "expected the boilerplate to dominate band signatures without the cap")
  }

  test("CC converges in O(log n) rounds on chains and O(1) on skew-hub stars") {
    for (n <- Seq(33, 128)) {
      // worst diameter per edge count: a single path
      val chain = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("d1", "d2")
      val (lab, rounds) = Dedup.connectedComponentsWithRounds(chain)
      assert(lab.agg(countDistinct(col("cluster"))).as[Long].head() === 1L)
      val bound = (math.ceil(math.log(n.toDouble) / math.log(2.0)) + 2).toInt
      assert(rounds <= bound, s"chain n=$n took $rounds rounds (bound $bound)")
      // the shape a skewed pair generator emits: one hub paired with
      // everything (diameter 2) — must converge in O(1) rounds, not
      // O(n) hub-relabel waves
      val star = (1 until n).map(i => (0L, i.toLong)).toDF("d1", "d2")
      val (slab, srounds) = Dedup.connectedComponentsWithRounds(star)
      assert(slab.agg(countDistinct(col("cluster"))).as[Long].head() === 1L)
      assert(srounds <= 3, s"star n=$n took $srounds rounds")
    }
  }
}
