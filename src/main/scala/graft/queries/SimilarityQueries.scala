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

    // V2: multi-table LSH bucket-population stats (8 tables x 12 bits =
    // 4096 buckets/table, hyperplanes = first 96 corpus vectors): per
    // table, how many buckets are occupied and how full the fullest
    // gets — the direct scale check that the self-join key keeps
    // candidates sub-quadratic. (Parameters picked by simulated recall
    // on this corpus: 8x12 recovers the planted moderate-cosine pairs
    // with ~0.3% of all pairs as candidates; wider 16-bit tables are
    // the knob for true near-dup thresholds >= 0.9.)
    "v02_lsh_buckets" -> ((s, d) => {
      val e = emb(s, d)
      val h = e.filter(col("vec_id") < 96)
        .select(col("vec_id").as("hid"), col("embedding").as("h_emb"))
      Similarity.lshBucketsMulti(e, h, 8, 12)
        .groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("n"))
        .groupBy(col("tbl"))
        .agg(sum(col("n")).as("n_vecs"), count(lit(1)).as("n_buckets"),
          max(col("n")).as("max_bucket"))
        .orderBy("tbl")
    }),

    // V3: embedding-cosine near-dup pairs, candidates = same bucket in
    // any of the 8 OR-construction tables, then exact cosine at 0.4
    "v03_near_dup_cosine" -> ((s, d) => {
      val e = emb(s, d)
      val h = e.filter(col("vec_id") < 96)
        .select(col("vec_id").as("hid"), col("embedding").as("h_emb"))
      Similarity.nearDupPairsMulti(e, h, 8, 12, 0.4).orderBy("d1", "d2")
    }),

    // V4: centroid classification quality per label (kmeans-assign /
    // knn-classify analogue, face_embeddings.py:98-131)
    "v04_centroid_assign" -> ((s, d) =>
      Similarity.centroidAssign(emb(s, d)).orderBy("label")),

    // V5: logreg_predict surface (face_embeddings.py:123-126,
    // spark_identity.py identity propagation): fit on the labeled
    // corpus, score every vector with the winning class + probability
    "v05_logreg_score" -> ((s, d) => {
      val e = emb(s, d)
      graft.similarity.MlSimilarity.logregScoreAll(e, e).orderBy("vec_id")
    }),

    // V7: IVF approximate top-k — KMeans coarse quantizer, probe the 4
    // nearest of 16 cells per query, exact-cosine rank inside them
    "v07_ivf_topk" -> ((s, d) => {
      val e = emb(s, d)
      graft.similarity.MlSimilarity
        .ivfTopK(e, e.filter(col("vec_id") < 5), k = 10, nlist = 16, nprobe = 4)
        .orderBy("q_id", "rank")
    }),

    // V8: int8 scalar-quantized ANN top-k — the bandwidth/memory scale
    // path for a 100 TB embedding store. Quantized dot products are
    // exact integers, so (unlike the float v-queries) this one IS
    // DuckDB-oracle-checked: ranking by (qdot desc, vec_id) is
    // cross-engine deterministic.
    "v08_int8_ann" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.int8TopK(e, e.filter(col("vec_id") < 5), 10)
        .orderBy("q_id", "rank")
    }),

    // V9: deterministic IVF — quantized-hyperplane cells (4 planes ->
    // 16 cells), Hamming<=1 probe set, exact-integer int8 ranking.
    // The oracle-checkable counterpart of the KMeans IVF in v07.
    "v09_ivf_int8" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.ivfInt8TopK(e, e.filter(col("vec_id") < 5), nPlanes = 4, k = 10)
        .orderBy("q_id", "rank")
    }),

    // V10: SemDeDup — semantic dedup clusters over the embedding
    // corpus: int8-quantized within-cell cosine pairs at tau = 2/5
    // (the corpus's planted similar pairs sit at quantized cos
    // ~0.40-0.47; real near-dup corpora would run 0.9+ — the
    // threshold is a ratio parameter, the plan is identical), then
    // connected components; keep = the retained representative.
    // Integer scoring end to end, so unlike v03 this dedup path is
    // DuckDB-oracle-exact including the transitive clustering.
    "v10_semdedup" -> ((s, d) =>
      Similarity.semDedupClusters(emb(s, d), nPlanes = 4, tauNum = 2, tauDen = 5)
        .orderBy("vec_id")),

    // V6: knn_predict surface (face_embeddings.py:128-131): every 5th
    // vector is "labeled"; the rest are scored by the mean label of
    // their 5 nearest labeled neighbors under cosine
    "v06_knn_predict" -> ((s, d) => {
      val e = emb(s, d)
      val train = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      val rest = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      Similarity.knnPredict(rest, train, 5)
        .withColumn("score", round(col("score"), 6))
        .orderBy("vec_id")
    })
  )

  /** Float pipelines are rows-only (see scaladoc) — except v08, whose
    * quantized-integer scores are exact in both engines. The SQL
    * mirrors the Spark ops in order: cast to double, * 127.0, / maxabs,
    * round (ties away from zero in both engines), integer dot. */
  val oracle: Map[String, String] = Map(
    "v08_int8_ann" ->
      """WITH m AS (
        |  SELECT max(abs(CAST(x AS DOUBLE))) AS ma
        |  FROM (SELECT unnest(embedding) AS x FROM embeddings) u0),
        |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        |      WHERE vec_id < 5),
        |z AS (SELECT q.q_id, c.vec_id, unnest(list_zip(q.qe, c.embedding)) AS p
        |      FROM q JOIN embeddings c ON c.vec_id <> q.q_id),
        |d AS (SELECT q_id, vec_id,
        |        CAST(sum(
        |          CAST(round(CAST(p[1] AS DOUBLE) * 127.0 / (SELECT ma FROM m)) AS BIGINT)
        |          * CAST(round(CAST(p[2] AS DOUBLE) * 127.0 / (SELECT ma FROM m)) AS BIGINT)
        |        ) AS BIGINT) AS qdot
        |      FROM z GROUP BY 1, 2),
        |r AS (SELECT q_id, vec_id, qdot,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY qdot DESC, vec_id) AS INT) AS rank
        |      FROM d)
        |SELECT q_id, vec_id, rank, qdot FROM r WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    "v09_ivf_int8" ->
      """WITH m AS (
        |  SELECT max(abs(CAST(x AS DOUBLE))) AS ma
        |  FROM (SELECT unnest(embedding) AS x FROM embeddings) u0),
        |qv AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m.ma) AS BIGINT)) AS q
        |       FROM embeddings, m),
        |planes AS (SELECT vec_id AS pid, q AS ph FROM qv WHERE vec_id < 4),
        |cd AS (SELECT v.vec_id, p.pid, unnest(list_zip(v.q, p.ph)) AS z
        |       FROM qv v CROSS JOIN planes p),
        |cdot AS (SELECT vec_id, pid, CAST(sum(z[1] * z[2]) AS BIGINT) AS d
        |         FROM cd GROUP BY 1, 2),
        |cells AS (SELECT vec_id,
        |            CAST(sum(CASE WHEN d > 0
        |              THEN (CAST(1 AS BIGINT) << CAST(pid AS INT)) ELSE 0 END) AS BIGINT) AS cell
        |          FROM cdot GROUP BY 1),
        |probes AS (SELECT q_id, unnest([qcell, xor(qcell, CAST(1 AS BIGINT)),
        |             xor(qcell, CAST(2 AS BIGINT)), xor(qcell, CAST(4 AS BIGINT)),
        |             xor(qcell, CAST(8 AS BIGINT))]) AS pcell
        |           FROM (SELECT vec_id AS q_id, cell AS qcell FROM cells
        |                 WHERE vec_id < 5) qq),
        |cand AS (SELECT p.q_id, c.vec_id FROM probes p
        |         JOIN cells c ON c.cell = p.pcell AND c.vec_id <> p.q_id),
        |zz AS (SELECT cd2.q_id, cd2.vec_id, unnest(list_zip(a.q, b.q)) AS z
        |       FROM cand cd2 JOIN qv a ON a.vec_id = cd2.q_id
        |       JOIN qv b ON b.vec_id = cd2.vec_id),
        |d AS (SELECT q_id, vec_id, CAST(sum(z[1] * z[2]) AS BIGINT) AS qdot
        |      FROM zz GROUP BY 1, 2),
        |r AS (SELECT q_id, vec_id, qdot,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY qdot DESC, vec_id) AS INT) AS rank
        |      FROM d)
        |SELECT q_id, vec_id, rank, qdot FROM r WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors semDedupPairs/semDedupClusters op-for-op: v09's
    // quantize+cells prefix, integer threshold qdot^2*5^2 >= 2^2*n1*n2
    // (tau = 2/5), then the t15-style recursive transitive closure.
    "v10_semdedup" ->
      """WITH RECURSIVE m AS (
        |  SELECT max(abs(CAST(x AS DOUBLE))) AS ma
        |  FROM (SELECT unnest(embedding) AS x FROM embeddings) u0),
        |qv AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m.ma) AS BIGINT)) AS q
        |       FROM embeddings, m),
        |planes AS (SELECT vec_id AS pid, q AS ph FROM qv WHERE vec_id < 4),
        |cd AS (SELECT v.vec_id, p.pid, unnest(list_zip(v.q, p.ph)) AS z
        |       FROM qv v CROSS JOIN planes p),
        |cdot AS (SELECT vec_id, pid, CAST(sum(z[1] * z[2]) AS BIGINT) AS d
        |         FROM cd GROUP BY 1, 2),
        |cells AS (SELECT vec_id,
        |            CAST(sum(CASE WHEN d > 0
        |              THEN (CAST(1 AS BIGINT) << CAST(pid AS INT)) ELSE 0 END) AS BIGINT) AS cell
        |          FROM cdot GROUP BY 1),
        |nsq AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2
        |        FROM (SELECT vec_id, unnest(q) AS x FROM qv) u GROUP BY 1),
        |pz AS (SELECT a.vec_id AS d1, b.vec_id AS d2, unnest(list_zip(qa.q, qb.q)) AS z
        |       FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |       JOIN qv qa ON qa.vec_id = a.vec_id
        |       JOIN qv qb ON qb.vec_id = b.vec_id),
        |pd AS (SELECT d1, d2, CAST(sum(z[1] * z[2]) AS BIGINT) AS qdot
        |       FROM pz GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2 FROM pd
        |          JOIN nsq x ON x.vec_id = pd.d1
        |          JOIN nsq y ON y.vec_id = pd.d2
        |          WHERE qdot > 0 AND qdot * qdot * 25 >= 4 * x.n2 * y.n2),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |nodes AS (SELECT DISTINCT a AS vec_id FROM edges)
        |SELECT n.vec_id,
        |  CAST(least(n.vec_id, min(r.b)) AS BIGINT) AS cluster,
        |  (n.vec_id = least(n.vec_id, min(r.b))) AS keep
        |FROM nodes n JOIN reach r ON r.a = n.vec_id
        |GROUP BY n.vec_id ORDER BY n.vec_id""".stripMargin
  )
}
