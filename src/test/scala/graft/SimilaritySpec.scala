package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.multimodal.Multimodal

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // planted geometry: 0/1 nearly parallel, 2 orthogonal, 3 anti-parallel
  private val vecs = Seq(
    (0L, Array(1f, 0.05f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 1),
    (3L, Array(-1f, 0f, 0f, 0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosineTopK ranks the parallel vector first") {
    val top = Similarity.cosineTopK(vecs, vecs.filter($"vec_id" === 0), 3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.head === 1L)   // most similar
    assert(top.last === 3L)   // anti-parallel last
  }

  test("nearDupPairs finds the planted near-duplicate") {
    val h = vecs.select($"vec_id".as("hid"), $"embedding".as("h_emb"))
    val pairs = Similarity.nearDupPairs(vecs, h, 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => (a, b) == (0L, 3L) })
  }

  test("nearDupPairsMulti (OR-construction) finds the planted near-duplicate") {
    val h = vecs.select($"vec_id".as("hid"), $"embedding".as("h_emb"))
    val pairs = Similarity.nearDupPairsMulti(vecs, h, 2, 2, 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => (a, b) == (0L, 3L) })
    // bucket ids must stay within each table's bit width
    val buckets = Similarity.lshBucketsMulti(vecs, h, 2, 2)
      .select("bucket").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 4))
  }

  test("int8TopK and ivfInt8TopK find a planted duplicate first") {
    // vec 10 duplicates vec 0: identical quantization -> identical cell
    // in every plane and the maximal integer dot, so both the flat and
    // the IVF path must rank it 1 deterministically
    val corpus = vecs.union(Seq((10L, Array(1f, 0.05f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label"))
    val q = corpus.filter($"vec_id" === 10L)
    val flat = Similarity.int8TopK(corpus, q, 1)
      .select("vec_id").as[Long].head()
    assert(flat === 0L)
    val ivf = Similarity.ivfInt8TopK(corpus, q, nPlanes = 2, k = 1)
      .select("vec_id").as[Long].head()
    assert(ivf === 0L)
    // PQ: the duplicate encodes to the identical code word per
    // subspace, so its ADC distance is the query's own self-distance
    // (the minimum) and it must rank 1
    val pq = Similarity.pqTopK(corpus, q, m = 2, subDim = 2, codes = 4, k = 1)
      .select("vec_id").as[Long].head()
    assert(pq === 0L)
  }

  test("centroidAssign is perfect on separated clusters") {
    val sep = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.1f, 0.9f), 1)
    ).toDF("vec_id", "embedding", "label")
    val res = Similarity.centroidAssign(sep)
      .select("label", "n", "n_correct").as[(Int, Long, Long)].collect()
    res.foreach { case (_, n, ok) => assert(n === ok) }
  }

  test("multimodal decode stub: schema, checksum and feature width") {
    val media = Multimodal.asMedia(
      Seq((7L, "hello world")).toDF("id", "text"), "id", "text", "text")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.media_id === 7L && f.n_bytes === 11 && f.feature.length === 8)
    val expect = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    assert(f.checksum === expect)
  }
}
