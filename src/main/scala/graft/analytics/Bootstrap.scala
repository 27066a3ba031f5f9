package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A14: bootstrap statistics, distributed (reference:
  * app/esper/validation.py:67-81 resamples k-of-N on the driver 10k
  * times). The Spark-native form is the Poisson bootstrap: each
  * (row, trial) draws a Poisson(1) replication weight from a seeded
  * hash, so every trial is a with-replacement resample computed in one
  * pass with no driver-side loop and no collect.
  *
  * Cross-engine determinism (round 5, was rows-only before): the
  * uniform draw is a quadratic hash mod 1e9+7 over (id, trial, seed) —
  * pure +*% arithmetic with every product < 2^63, so it computes
  * bit-identically in any engine (xxhash64, used before, exists only
  * in Spark). Trial means are exact scaled integers (value-cents *
  * 1e4 = value * 1e6, integer-divided by the weight sum), and the
  * final mean/std mirror a fixed double expression tree, so the whole
  * statistic is DuckDB-oracle-checkable.
  */
object Bootstrap {

  private val P = 1000000007L

  /** Poisson(1) inverse-CDF from an integer draw u in [0, 1e6),
    * truncated at 5 (P(k>5) ~ 6e-4 — negligible for interval
    * estimates). Thresholds are floor(1e6 * CDF). */
  private def poissonWeight(u: org.apache.spark.sql.Column) =
    when(u < 367880L, 0L).when(u < 735760L, 1L).when(u < 919700L, 2L)
      .when(u < 981010L, 3L).when(u < 996340L, 4L).otherwise(5L)

  /** Bootstrap distribution of the mean of `valueCol` (a 2-decimal
    * numeric; values are scaled to cents internally): returns
    * (est_mean = mean of trial means, est_std = std across trials,
    * n_trials). `idCol` must identify rows (drives the deterministic
    * per-(row, trial) draw). A trial whose weights all draw 0 would
    * divide by zero, but P = e^-N is zero for any real N.
    *
    * PRECONDITION: |id| < 2^63 / 1000003 ≈ 9.2e12 for every id. The
    * draw multiplies id by 1000003 BEFORE the mod, and the two engines
    * disagree on overflow (Spark's non-ANSI long wraps silently,
    * DuckDB raises) — so a violation would break the cross-engine
    * contract without a clear Spark-side failure. Enforced below with
    * a cheap per-row guard that fails loudly in BOTH engines. */
  def bootstrapMean(df: DataFrame, idCol: String, valueCol: String,
                    trials: Int = 200, seed: Long = 42L): DataFrame = {
    // Driver-side bounds so the per-row guard below is airtight: the
    // full draw argument is id*1000003 + trial*7919 + seed, so the id
    // threshold must leave headroom for the worst-case trial and seed
    // terms (at the old bare 2^63/1000003 cutoff, trials > ~212 or a
    // large seed could still wrap for ids just under the line).
    require(trials >= 1 && trials <= 100000,
      s"bootstrapMean: trials=$trials out of range")
    require(seed > Long.MinValue / 2 && seed < Long.MaxValue / 2,
      s"bootstrapMean: seed=$seed out of range")
    val headroom = trials.toLong * 7919L + math.abs(seed)
    val maxId = (Long.MaxValue / 2 - headroom) / 1000003L
    // two-sided comparison, NOT abs(): in non-ANSI Spark
    // abs(Long.MinValue) wraps negative and would slip past the guard
    // into exactly the silent overflow it exists to prevent.
    val guardedId = when(col(idCol) > lit(-maxId) && col(idCol) < lit(maxId),
      col(idCol)).otherwise(raise_error(lit(
      s"bootstrapMean: |$idCol| must be < ~2^62/1000003 (the draw would overflow)")))
    val p1 = pmod(guardedId * 1000003L + col("trial") * 7919L + lit(seed), lit(P))
    val u = pmod(p1 * p1 + p1, lit(P)) % 1000000L
    val nD = lit(trials.toDouble)
    df.select(col(idCol), round(col(valueCol) * 100).cast("long").as("__vc"))
      .withColumn("trial", explode(sequence(lit(1), lit(trials))))
      .withColumn("w", poissonWeight(u))
      .groupBy(col("trial"))
      // m = trial mean in value*1e6 units, exact integer
      .agg(expr("(sum(w * __vc) * 10000) div sum(w)").as("m"))
      .agg(
        (sum(col("m")).cast("double") / nD / 1000000.0).as("est_mean"),
        (sqrt((sum(col("m") * col("m")).cast("double") -
          sum(col("m")).cast("double") * sum(col("m")).cast("double") / nD)
          / lit((trials - 1).toDouble)) / 1000000.0).as("est_std"),
        count(lit(1)).as("n_trials"))
  }
}
