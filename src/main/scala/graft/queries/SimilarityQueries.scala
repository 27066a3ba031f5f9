package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.similarity.Similarity
import Q._

/** Similarity-search coverage over `embeddings` (J15 + the ANN addenda
  * in SURVEY §7.5). No DuckDB oracle — float reductions are not
  * bit-portable across engines — so these get the driver's rows-only
  * check; outputs are still run-to-run deterministic (sorted folds,
  * explicit tie-breaks). */
object SimilarityQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(tune(s), d)

  val queries: Map[String, QFn] = Map(
    // J15/V1: exact brute-force cosine top-10 for 5 query vectors
    "v01_cosine_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.cosineTopK(e, e.filter(col("vec_id") < 5), 10)
        .orderBy("q_id", "rank")
    }),

    // V2: random-hyperplane LSH bucket histogram (the ANN scale path's
    // partitioning key; hyperplanes = first 8 corpus vectors)
    "v02_lsh_buckets" -> ((s, d) => {
      val e = emb(s, d)
      val h = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("hid"), col("embedding").as("h_emb"))
      Similarity.lshBuckets(e, h)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // V3: embedding-cosine near-dup pairs via bucketed self-join
    "v03_near_dup_cosine" -> ((s, d) => {
      val e = emb(s, d)
      val h = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("hid"), col("embedding").as("h_emb"))
      Similarity.nearDupPairs(e, h, 0.4).orderBy("d1", "d2")
    }),

    // V4: centroid classification quality per label (kmeans-assign /
    // knn-classify analogue, face_embeddings.py:98-131)
    "v04_centroid_assign" -> ((s, d) =>
      Similarity.centroidAssign(emb(s, d)).orderBy("label"))
  )

  /** Float pipelines: rows-only checks (see scaladoc). */
  val oracle: Map[String, String] = Map.empty
}
