package graft.similarity

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** MLlib-backed similarity operators — the library path the reference
  * delegated to its Rust rs-embed store (app/esper/face_embeddings.py:
  * 74-131 knn/kmeans): approxSimilarityJoin for pairwise KNN at scale
  * and KMeans clustering. Complements the hand-rolled LSH in
  * [[Similarity]] (which is oracle-friendly); these are the
  * battle-tested variants for the 100 TB path. */
object MlSimilarity {

  private def withVec(emb: DataFrame): DataFrame =
    emb.withColumn("features", array_to_vector(col("embedding")))

  /** Approximate similarity join: pairs within `maxL2` L2 distance
    * (on normalized vectors, d^2 = 2 - 2cos). */
  def approxPairs(emb: DataFrame, maxL2: Double, seed: Long = 42L): DataFrame = {
    val v = withVec(emb).cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(3).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(v)
    model.approxSimilarityJoin(v, v, maxL2, "dist")
      .select(col("datasetA.vec_id").as("d1"), col("datasetB.vec_id").as("d2"),
        round(col("dist"), 6).as("dist6"))
      .filter(col("d1") < col("d2"))
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale
    * path alongside LSH (SURVEY §7.5 "IVF or LSH-bucketed variant"):
    * a KMeans coarse quantizer splits the corpus into `nlist` cells;
    * each query ranks only the vectors in its `nprobe` nearest cells
    * by exact cosine. Candidate work per query is ~nprobe/nlist of the
    * corpus; cells are the equi-join key, queries/centers broadcast,
    * the corpus scan stays distributed. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nlist: Int,
              nprobe: Int, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = withVec(emb).cache()
    // a coarse quantizer does not need a converged clustering — cap the
    // iteration count: every Lloyd step is a full job, and job-count is
    // what a busy cluster scheduler amplifies
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cell").fit(v)
    val assigned = km.transform(v)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val centers = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "c_emb")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("q_cos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centers))
      .withColumn("q_cos", Fns.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", Fns.cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(rankW)).filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"),
        round(col("cos"), 6).as("cos6"))
  }

  /** KMeans clustering of the embedding space; returns (vec_id, label,
    * cluster) assignments. */
  def kmeansAssign(emb: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val v = withVec(emb)
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(v)
    model.transform(v).select("vec_id", "label", "cluster")
  }

  /** logreg_predict analogue (face_embeddings.py:123-126,
    * spark_identity.py:30-49 identity propagation): fit on the labeled
    * set, then score EVERY corpus vector — (vec_id, pred, score) where
    * score is the predicted class's probability. The scoring pass is a
    * broadcast of the model coefficients over a distributed corpus
    * scan, so it runs at full-corpus scale. */
  def logregScoreAll(train: DataFrame, corpus: DataFrame,
                     maxIter: Int = 8): DataFrame = {
    // identity propagation needs a ranking score, not a fully-converged
    // decision boundary: 8 LBFGS steps at tol 1e-4 agree with a 15-step
    // fit on >= 98% of argmaxes (the rest are boundary vectors that
    // keep flipping through 12+ iterations — MlSimilaritySpec pins the
    // agreement floor and run-to-run determinism) while nearly halving
    // the per-iteration treeAggregate job count — the fit is
    // scheduler-bound, not data-bound, so job count is the cost
    val model = new LogisticRegression().setMaxIter(maxIter).setTol(1e-4)
      .setFeaturesCol("features").setLabelCol("label")
      .setPredictionCol("pred").setProbabilityCol("prob").fit(withVec(train))
    model.transform(withVec(corpus))
      .select(col("vec_id"), col("pred").cast("int").as("pred"),
        round(array_max(vector_to_array(col("prob"))), 6).as("score"))
  }

  /** Identity classifier: multinomial logistic regression on the
    * labeled embeddings (face_embeddings.py:98-131 logreg), returning
    * (vec_id, label, pred) for held-out scoring. */
  def logregClassify(train: DataFrame, test: DataFrame,
                     maxIter: Int = 50): DataFrame = {
    val model = new LogisticRegression().setMaxIter(maxIter)
      .setFeaturesCol("features").setLabelCol("label")
      .setPredictionCol("pred").fit(withVec(train))
    model.transform(withVec(test))
      .select(col("vec_id"), col("label"), col("pred").cast("int").as("pred"))
  }
}
