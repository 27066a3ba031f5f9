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

  /** Bootstrap distribution of the mean of `valueCol` (a 2-decimal
    * numeric; values are scaled to cents internally): returns
    * (est_mean = mean of trial means, est_std = std across trials,
    * n_trials). `idCol` must identify rows (drives the deterministic
    * per-(row, trial) draw). A trial whose weights all draw 0 would
    * divide by zero, but P = e^-N is zero for any real N.
    *
    * PRECONDITION: |id| < ~2^62 / 1000003 minus trial/seed headroom.
    * The draw multiplies id by 1000003 BEFORE the mod, and the two
    * engines disagree on overflow (Spark's non-ANSI long wraps
    * silently, DuckDB raises) — so a violation would break the
    * cross-engine contract without a clear Spark-side failure. The
    * aggregate's update enforces the two-sided bound per row (NOT via
    * abs(): in non-ANSI Spark abs(Long.MinValue) wraps negative) and
    * throws, loud in both engines. */
  def bootstrapMean(df: DataFrame, idCol: String, valueCol: String,
                    trials: Int = 200, seed: Long = 42L): DataFrame = {
    // driver-side bounds keep the per-row guard's headroom math valid:
    // the full draw argument is id*1000003 + trial*7919 + seed
    require(trials >= 1 && trials <= 100000,
      s"bootstrapMean: trials=$trials out of range")
    require(seed > Long.MinValue / 2 && seed < Long.MaxValue / 2,
      s"bootstrapMean: seed=$seed out of range")
    // mirror of BootstrapTrialsAgg's plan-time headroom guard: a seed
    // inside the range above can still leave maxId <= 0, which would
    // reject every id with a message blaming the id (ADVICE r8)
    require((Long.MaxValue / 2 - (trials.toLong * 7919L + math.abs(seed))) / 1000003L > 0,
      s"bootstrapMean: |seed|=$seed leaves no id headroom; use a smaller |seed|")
    val nD = lit(trials.toDouble)
    // The trial fold is ONE typed aggregate (plans.BootstrapTrialsAgg):
    // every row plays its `trials` seeded draws in a JIT'd long loop
    // and the relation collapses into per-trial (sum w, sum w*vc)
    // vectors — the same order-free integer sums the explode-by-trial
    // plan produced by shuffling rows x trials records into a hash
    // aggregate (a14: 4.2 s exploded vs ~1 s folded at sf0.1; the
    // DuckDB oracle still replays the exploded form and hashes equal).
    // The id-range guard lives inside the aggregate's update (throws,
    // loud in both engines — DuckDB raises on the overflow itself).
    // NOTE (r21): a repartition of the narrow (id, cents) rows before
    // the fold was tried — it cut a14 1.37 -> 0.75 s locally because a
    // single-file scan yields 1-3 splits and the 200-draw-per-row
    // partial fold serialized onto them. REVERTED: PlanAuditSpec pins
    // the fold map-side (no shuffle beneath the partial), and it is
    // right — at production scale the scan is well-split, so the added
    // exchange is a full corpus-narrow shuffle bought for nothing. The
    // local gap is a split-count artifact of the one-file testdata,
    // not a plan defect.
    df.select(col(idCol).as("__id"),
        round(col(valueCol) * 100).cast("long").as("__vc"))
      .agg(graft.plans.BootstrapTrialsAgg
        .bootstrapTrials(col("__id"), col("__vc"), trials, seed).as("tw"))
      // m = trial mean in value*1e6 units, exact integer
      .select(posexplode(zip_with(col("tw.wvs"), col("tw.ws"),
        (a, b) => call_function("div", a * 10000L, b))).as(Seq("__t", "m")))
      .agg(
        (sum(col("m")).cast("double") / nD / 1000000.0).as("est_mean"),
        (sqrt((sum(col("m") * col("m")).cast("double") -
          sum(col("m")).cast("double") * sum(col("m")).cast("double") / nD)
          / lit((trials - 1).toDouble)) / 1000000.0).as("est_std"),
        count(lit(1)).as("n_trials"))
  }
}
