package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A14: bootstrap statistics, distributed (reference:
  * app/esper/validation.py:67-81 resamples k-of-N on the driver 10k
  * times). The Spark-native form is the Poisson bootstrap: each
  * (row, trial) draws a Poisson(1) replication weight from a seeded
  * hash, so every trial is a with-replacement resample computed in one
  * pass with no driver-side loop and no collect. */
object Bootstrap {

  /** Poisson(1) inverse-CDF from a uniform draw, truncated at 5
    * (P(k>5) ~ 6e-4 — negligible for interval estimates). */
  private def poissonWeight(u: org.apache.spark.sql.Column) =
    when(u < 0.36788, 0).when(u < 0.73576, 1).when(u < 0.91970, 2)
      .when(u < 0.98101, 3).when(u < 0.99634, 4).otherwise(5)

  /** Bootstrap distribution of the mean of `valueCol`:
    * returns (est_mean = mean of trial means, est_std = std across
    * trials, n_trials). `idCol` must identify rows (drives the
    * deterministic per-(row, trial) draw). */
  def bootstrapMean(df: DataFrame, idCol: String, valueCol: String,
                    trials: Int = 200, seed: Long = 42L): DataFrame = {
    val u = (pmod(xxhash64(col(idCol), col("trial"), lit(seed)), lit(1000000L))
      .cast("double") / 1000000.0)
    df.select(col(idCol), col(valueCol))
      .withColumn("trial", explode(sequence(lit(1), lit(trials))))
      .withColumn("w", poissonWeight(u))
      .groupBy(col("trial"))
      .agg((sum(col("w") * col(valueCol)) / sum(col("w"))).as("trial_mean"))
      .agg(avg(col("trial_mean")).as("est_mean"),
        stddev_samp(col("trial_mean")).as("est_std"),
        count(lit(1)).as("n_trials"))
  }
}
