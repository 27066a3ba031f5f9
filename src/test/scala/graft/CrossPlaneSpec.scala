package graft

import graft.index.{CrossPlane, Manifest}
import graft.similarity.IntKMeans
import graft.text.PhraseSearch
import org.apache.spark.sql.functions._

/** The cross-plane maintenance driver: one takedown call must land on
  * BOTH retrieval planes (the reference's Video-FK cascade), a failure
  * on the second plane must compensate the first (saga — both planes
  * end unchanged), and the consistency audit must catch a takedown
  * that reached only one plane. */
class CrossPlaneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown cat"),
    (3L, "a slow green turtle"),
    (4L, "quick brown quick brown"),
    (5L, "the fox and the dog")
  ).toDF("doc_id", "text")

  private lazy val toks = docs.select(col("doc_id"),
    posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))

  // embeddings share the documents' id space (the multimodal contract
  // one takedown list relies on), plus an embedding-only id 6
  private lazy val embs = (1L to 6L).map { id =>
    (id, Array.tabulate(8)(d => ((id * 7 + d * 13) % 7 - 3).toFloat * 10), 0)
  }.toDF("vec_id", "embedding", "label")

  private def freshPair(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("xplane_").toString
    val (ph, iv) = (s"$base/phrase", s"$base/ivf")
    PhraseSearch.writeIndex(toks, ph, nBuckets = 8)
    IntKMeans.writeIndex(embs, iv, nlist = 2)
    (ph, iv)
  }

  test("takedown hides the ids on BOTH planes and the audit is clean") {
    val (ph, iv) = freshPair()
    // ids 2 and 6: 2 exists on both planes, 6 only as an embedding —
    // one purge list serves both regardless of which plane holds what
    val ev = CrossPlane.takedown(spark, ph, iv, Seq(2L, 6L).toDF("id"))
    assert(ev.phraseSeqAfter === PhraseSearch.currentSeq(spark, ph))
    assert(ev.ivfSeqAfter === IntKMeans.currentSeq(spark, iv))
    val phDocs = PhraseSearch.servedSearch(spark, ph, "quick OR the OR turtle")
      .as[Long].collect().toSet
    assert(!phDocs.contains(2L), "taken-down doc still served on the phrase plane")
    val ivIds = IntKMeans.servedTopK(spark, iv,
        embs.filter($"vec_id" === 1), k = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(!ivIds.contains(2L) && !ivIds.contains(6L),
      "taken-down vectors still served on the IVF plane")
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty,
      "a takedown applied to both planes must audit clean")
  }

  test("asymmetric reclaim does not false-positive the audit (ADVICE r15 #2)") {
    val (ph, iv) = freshPair()
    CrossPlane.takedown(spark, ph, iv, Seq(2L).toDF("id"))
    // one plane reclaims (its tombstone leaves the pending set), the
    // other still pends the same takedown — the r15 pending-set diff
    // reported id 2 as ivf_only here even though both planes applied
    PhraseSearch.compactIndex(spark, ph)
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty,
      "applied-on-both takedown reported as divergence after one-plane reclaim")
    // and the reverse asymmetry
    IntKMeans.compactIndex(spark, iv)
    val (ph2, iv2) = freshPair()
    CrossPlane.takedown(spark, ph2, iv2, Seq(2L).toDF("id"))
    IntKMeans.compactIndex(spark, iv2)
    assert(CrossPlane.pendingMismatch(spark, ph2, iv2).isEmpty)
    // a still-served divergence is REAL and still reported: take down
    // id 4 on the phrase plane only — the IVF plane serves it
    PhraseSearch.deleteFromIndex(Seq(4L).toDF("doc_id"), ph2)
    assert(CrossPlane.pendingMismatch(spark, ph2, iv2)
      .as[(Long, String)].collect().toSet === Set((4L, "phrase_only")))
  }

  test("the audit catches a takedown that reached only one plane") {
    val (ph, iv) = freshPair()
    PhraseSearch.deleteFromIndex(Seq(3L).toDF("doc_id"), ph)
    val got = CrossPlane.pendingMismatch(spark, ph, iv)
      .as[(Long, String)].collect().toSet
    assert(got === Set((3L, "phrase_only")), s"audit missed the divergence: $got")
    // applying the same id to the other plane converges the audit
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), iv)
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty)
  }

  test("reencode cascades one re-crawl batch to both planes; saga on failure") {
    val (ph, iv) = freshPair()
    // doc 2 re-enters with new text AND a re-encoded (negated) vector
    val newToks = Seq((2L, 0, "sleepy"), (2L, 1, "cat")).toDF("doc_id", "pos", "tok")
    val newVecs = embs.filter($"vec_id" === 2L)
      .withColumn("embedding", transform($"embedding", x => -x))
      .select(col("vec_id"), col("embedding"))
    CrossPlane.reencode(spark, ph, iv, newToks, newVecs)
    assert(PhraseSearch.servedSearch(spark, ph, "sleepy")
      .as[Long].collect().toSet === Set(2L), "re-crawled text not served")
    assert(!PhraseSearch.servedSearch(spark, ph, "quick")
      .as[Long].collect().toSet.contains(2L), "stale text still served")
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty,
      "a re-encode applied to both planes must audit clean")
    // saga: the next batch fails on the IVF side — phrase rolls back
    val phSeq = PhraseSearch.currentSeq(spark, ph)
    intercept[IllegalStateException] {
      Manifest.withLease(spark, iv) {
        CrossPlane.reencode(spark, ph, iv,
          Seq((3L, 0, "rewritten")).toDF("doc_id", "pos", "tok"),
          embs.filter($"vec_id" === 3L).select("vec_id", "embedding"))
      }
    }
    Manifest.breakLease(spark, iv)
    assert(PhraseSearch.currentSeq(spark, ph) === phSeq,
      "phrase counter moved despite the compensation")
    assert(PhraseSearch.servedSearch(spark, ph, "rewritten")
      .as[Long].collect().isEmpty, "compensated upsert still visible")
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty)
  }

  test("saga: a failure on the IVF plane rolls the phrase plane back (both unchanged)") {
    val (ph, iv) = freshPair()
    val phSeq = PhraseSearch.currentSeq(spark, ph)
    val ivSeq = IntKMeans.currentSeq(spark, iv)
    val phServe = PhraseSearch.servedSearch(spark, ph, "quick")
      .as[Long].collect().toSet
    // a crashed writer holds the IVF lease: the second leg must fail
    val e = intercept[IllegalStateException] {
      Manifest.withLease(spark, iv) {
        CrossPlane.takedown(spark, ph, iv, Seq(2L).toDF("id"))
      }
    }
    assert(e.getMessage.contains("rolled back"), s"wrong failure: ${e.getMessage}")
    // both planes are byte-unchanged: counters, serves, pending sets
    assert(PhraseSearch.currentSeq(spark, ph) === phSeq,
      "phrase counter moved despite the compensation")
    assert(IntKMeans.currentSeq(spark, iv) === ivSeq)
    assert(PhraseSearch.servedSearch(spark, ph, "quick")
      .as[Long].collect().toSet === phServe)
    assert(PhraseSearch.pendingDeletes(spark, ph).isEmpty,
      "the compensated tombstone must be physically gone")
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty)
    // recovery: break the dead writer's lease, re-run, both land
    Manifest.breakLease(spark, iv)
    CrossPlane.takedown(spark, ph, iv, Seq(2L).toDF("id"))
    assert(!PhraseSearch.servedSearch(spark, ph, "quick")
      .as[Long].collect().toSet.contains(2L))
    assert(CrossPlane.pendingMismatch(spark, ph, iv).isEmpty)
  }
}
