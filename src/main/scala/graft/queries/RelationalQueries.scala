package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Fns
import Q._

/** Relational operator coverage: SURVEY §2.2 (P), §2.3 (J), §2.5 (A),
  * §2.7 (O), §2.8 (F) — each `queries` entry is one inventory line,
  * re-expressed Spark-first on the driver's tables, with a DuckDB
  * oracle that mirrors the arithmetic op-for-op. */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(tune(s), d)
  private def ord(s: SparkSession, d: String) = Tables.orders(tune(s), d)
  private def cust(s: SparkSession, d: String) = Tables.customer(tune(s), d)

  val queries: Map[String, QFn] = Map(
    // ---------------- P: projection / filter -------------------------
    // P1 projection (reference: .values(), app/query/base_models.py:39-41)
    "p01_projection" -> ((s, d) =>
      li(s, d).select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")),

    // P2 computed column (annotate/F-expressions, base_models.py:197-200)
    "p02_computed" -> ((s, d) =>
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_cents"),
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("charge_cents"))
        .orderBy("l_orderkey", "l_linenumber", "rev_cents", "charge_cents")),

    // P3 date-part extraction (spark.py:92-100, spark_util.py:46-47)
    "p03_date_parts" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey")),

    // P4 comparison filters (rekall_query.py:183-200)
    "p04_filter_compare" -> ((s, d) =>
      li(s, d).filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // P5 boolean predicate algebra (Q-objects OR/AND/NOT)
    "p05_boolean_algebra" -> ((s, d) =>
      li(s, d).filter((col("l_returnflag") === "R" || col("l_linestatus") === "F")
          && !(col("l_quantity") < 10))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")),

    // P6 NULL predicates (isnull lookups)
    "p06_null_predicates" -> ((s, d) =>
      li(s, d).select(expr("nullif(l_returnflag, 'N')").as("rf"))
        .agg(count(lit(1)).as("n_total"), count(col("rf")).as("n_notnull"),
          sum(when(col("rf").isNull, 1L).otherwise(0L)).as("n_null"))),

    // P7 IN-list + IN-subquery as left-semi join (other_queries.py:84-88)
    "p07_in_semijoin" -> ((s, d) => {
      val o = ord(s, d).select(col("o_custkey"))
      cust(s, d).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
    }),

    // P8 string match (contains / like / prefix, spark_util.py:277-280)
    "p08_string_match" -> ((s, d) =>
      Tables.part(tune(s), d)
        .filter(col("p_name").like("%e%"))
        .select(col("p_partkey"), col("p_name"),
          col("p_name").contains("red").as("has_red"),
          col("p_name").startsWith("s").as("s_prefix"))
        .orderBy("p_partkey")),

    // P9 range/date filter (time__range, topics.py:191-193)
    "p09_range_date" -> ((s, d) =>
      ord(s, d).filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy("o_orderkey")),

    // P10 modulo/stride sampling (widget.py:210-215, spark_util.py:402-405)
    "p10_stride_sample" -> ((s, d) =>
      Tables.events(tune(s), d).filter(pmod(col("event_id"), lit(10)) === 0)
        .select("event_id", "user_id", "event_type").orderBy("event_id")),

    // P11 random sampling (order_by('?')) — seeded, Spark-side determinism
    // only; no cross-engine oracle (RNGs differ).
    // P11: RNG sampling, retired from rows-only status the way a18's
    // sketches were — the SAMPLE is cross-engine irreproducible by
    // nature (Spark's per-partition Bernoulli stream), so the query
    // asserts the oracle-checkable INVARIANTS of a seeded 10% sample
    // instead of the rows: the draw count lands in the Chernoff-safe
    // [5%, 15%] band, the sample is duplicate-free (withReplacement =
    // false), every sampled row's payload bit-matches its source row
    // (row integrity), and the same seed re-drawn in the same job
    // reproduces the identical id MULTISET (per-partition seed = seed
    // + partition index over the same file splits; checked in both
    // exceptAll directions). All four booleans are constants-true for
    // a correct sampler, which is exactly what lets DuckDB assert them.
    "p11_random_sample" -> ((s, d) => {
      val ev = Tables.events(tune(s), d)
      val s1 = ev.sample(withReplacement = false, 0.1, seed = 42)
        .select(col("event_id"), col("value"))
      val s2 = ev.sample(withReplacement = false, 0.1, seed = 42)
        .select(col("event_id"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      val stats = s1.agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("event_id")).as("n_distinct"))
      // row integrity (replaces the tautological subset arm, ADVICE
      // r15 #5: an anti-join of ev-derived ids against ev can never
      // fire): each sampled row's payload must bit-match the source
      // row with that id — a sampler that fabricated or mangled rows
      // fails this re-join
      val mangled = s1.join(ev.select(col("event_id"), col("value").as("__v")),
          Seq("event_id"))
        .filter(col("value") =!= col("__v"))
        .agg(count(lit(1)).as("n_mangled"))
      // seed stability as SYMMETRIC multiset equality — one exceptAll
      // direction only proves s1 ⊆ s2, so a re-draw that picked EXTRA
      // rows would pass (ADVICE r15 #5)
      val ids1 = s1.select("event_id")
      val drift = ids1.exceptAll(s2).union(s2.exceptAll(ids1))
        .agg(count(lit(1)).as("n_drift"))
      stats.crossJoin(broadcast(tot)).crossJoin(broadcast(mangled))
        .crossJoin(broadcast(drift))
        .select(
          (col("n_sampled") * 20 > col("n_total") &&
            col("n_sampled") * 20 < col("n_total") * 3).as("in_range"),
          (col("n_distinct") === col("n_sampled")).as("no_dups"),
          (col("n_mangled") === lit(0L)).as("rows_intact"),
          (col("n_drift") === lit(0L)).as("seed_stable"))
    }),

    // P13 deterministic hash sampling: k docs per group = the k
    // smallest (mixed-hash, doc_id) pairs, packed into one long and
    // kept by the bottom-k aggregate — the reproducible, oracle-exact
    // replacement for RNG sampling (p11) that also avoids p10-style
    // stride bias AND the per-group window sort a row_number() form
    // would pay: partial aggregates ship <= k longs per partition.
    "p13_hash_sample" -> ((s, d) => {
      val k = 10
      val P = 1000000007L
      val h0 = graft.text.TextOps.fingerprint(
        concat(lit("smp:"), col("doc_id").cast("string")))
      val h = pmod(h0 * h0 + h0, lit(P))
      // pack (h, doc_id) so bottom-k order = (h, doc_id); doc_id < 2^32
      val packed = h * 4294967296L + col("doc_id")
      Tables.documents(tune(s), d)
        .select(col("lang"), packed.as("pk"))
        .groupBy(col("lang"))
        .agg(graft.plans.BottomKAgg.bottomK(col("pk"), k).as("bk"))
        .select(col("lang"), explode(col("bk")).as("pk"))
        .select(col("lang"), pmod(col("pk"), lit(4294967296L)).as("doc_id"))
        .orderBy("lang", "doc_id")
    }),

    // P12 conditional expression (gender-prob flip UDF -> when/otherwise,
    // spark_util.py:480-491)
    "p12_conditional" -> ((s, d) =>
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
          cents(when(col("l_returnflag") === "R", col("l_discount"))
            .otherwise(lit(1.0) - col("l_discount"))).as("flip_cents"))
        .orderBy("l_orderkey", "l_linenumber", "flip_cents")),

    // ---------------- J: joins ---------------------------------------
    // J1 equi inner join chain + agg (the flagship screen-time shape,
    // spark_util.py:373-405; db_perf Q-A)
    "j01_equi_join_agg" -> ((s, d) => {
      val n = broadcast(Tables.nation(tune(s), d))
      li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // J2 left outer join + fill (spark_util.py:419-424)
    "j02_left_outer" -> ((s, d) =>
      cust(s, d).join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("total_cents"))
        .orderBy("c_custkey")),

    // J3 FK path join (ORM __ traversal -> explicit chain w/ broadcast dims)
    "j03_fk_chain" -> ((s, d) => {
      val t = tune(s)
      Tables.supplier(t, d)
        .join(broadcast(Tables.nation(t, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(t, d)), col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name").orderBy("s_suppkey")
    }),

    // J4 correlated per-row count subquery -> groupBy + join
    // ("frames with exactly N faces", panels_sql.py:13-18)
    "j04_correlated_count" -> ((s, d) => {
      val counts = li(s, d).groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      ord(s, d).join(counts, col("o_orderkey") === col("l_orderkey"))
        .filter(col("n_items") === 4)
        .select("o_orderkey", "n_items").orderBy("o_orderkey")
    }),

    // J5 self theta-join within a group (man-left-of-woman pairs,
    // unused_queries.py:4-36)
    "j05_self_theta" -> ((s, d) => {
      val a = li(s, d).select(col("l_orderkey"), col("l_linenumber").as("ln1"),
        col("l_quantity").as("q1"))
      val b = li(s, d).select(col("l_orderkey").as("ok2"), col("l_linenumber").as("ln2"),
        col("l_quantity").as("q2"))
      a.join(b, col("l_orderkey") === col("ok2") && col("ln1") < col("ln2")
          && col("q1") > col("q2") + 20)
        .select("l_orderkey", "ln1", "ln2", "q1", "q2")
        .orderBy("l_orderkey", "ln1", "ln2", "q1", "q2")
    }),

    // J6 set-intersection join (shots with A and B, other_queries.py:73-88)
    "j06_set_intersection" -> ((s, d) =>
      ord(s, d).groupBy(col("o_custkey"))
        .agg(max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("has_f"),
          max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("has_o"))
        .filter(col("has_f") === 1 && col("has_o") === 1)
        .select("o_custkey").orderBy("o_custkey")),

    // J16 many-to-many through link table (segment.topics,
    // spark_util.py:220-232): part<->customer through lineitem+orders
    "j16_m2m_link" -> ((s, d) => {
      val t = tune(s)
      Tables.part(t, d).filter(col("p_size") >= 48)
        .join(li(s, d), col("p_partkey") === col("l_partkey"))
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("p_partkey")
    }),

    // ---------------- A: aggregation ---------------------------------
    // A1 plain aggregates (Sum/Max/Count/Avg)
    "a01_plain_agg" -> ((s, d) =>
      li(s, d).agg(count(lit(1)).as("n"),
        sum(asLong(col("l_quantity"))).as("sum_qty"),
        max(cents(col("l_extendedprice"))).as("max_price_cents"),
        (sum(asLong(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"))),

    // A2 group-by + sums (screen time by show/channel; TPC-H Q1 shape)
    "a02_group_sum" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(asLong(col("l_quantity"))).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A3 weighted sum + variance — probabilistic screen time
    // E = sum(d*p), Var = sum(p*(1-p)*d^2) (spark_util.py:629-663),
    // done in scaled integers: p == l_discount (2 decimals) -> k=100p.
    "a03_weighted_sum_var" -> ((s, d) => {
      val k = round(col("l_discount") * 100).cast("long")
      val q = asLong(col("l_quantity"))
      li(s, d).groupBy(col("l_returnflag"))
        .agg((sum(q * k).cast("double") / 100.0).as("e_val"),
          (sum(k * (lit(100L) - k) * q * q).cast("double") / 10000.0).as("var_val"))
        .orderBy("l_returnflag")
    }),

    // A4 sum over distinct keys (spark_util.py:666-727 driver-side dedup
    // -> row_number window, pure built-ins)
    // (l_orderkey, l_linenumber) is not unique in the driver data, so the
    // dedup ordering includes the measure columns — any remaining ties are
    // full duplicates and sum identically in both engines.
    "a04_sum_distinct" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      li(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .agg(count(lit(1)).as("n_orders"), sum(asLong(col("l_quantity"))).as("sum_qty"))
    }),

    // A5 top-K by aggregate (major_canonical_shows.py:8-24)
    "a05_topk_agg" -> ((s, d) =>
      li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(10)),

    // A6 distinct values of a column (views.py:83-96 schema endpoint)
    "a06_distinct_values" -> ((s, d) =>
      ord(s, d).select(col("o_orderpriority")).distinct()
        .orderBy("o_orderpriority").limit(100)),

    // A7 first-per-group / distinct-on (other_queries.py:297)
    "a07_first_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_date"))
        .orderBy("o_custkey")
    }),

    // A8 argmax per group (max-probability identity, spark_util.py:741-778)
    "a08_argmax" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("best_cents"))
        .orderBy("o_custkey")
    }),

    // A9 histogram buckets + CDF via windowed prefix sum
    // (size-percentile, spark_util.py:432-464)
    "a09_histogram_cdf" -> ((s, d) => {
      val b = floor(col("o_totalprice") / 50000).cast("long")
      ord(s, d).groupBy(b.as("bucket")).agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("bucket")
    }),

    // A10 median / quantiles — exact percentile with linear interpolation
    // (approxQuantile in the reference, spark.py:65-66; exact here so the
    // oracle matches bit-for-bit on integral quantities)
    // Exact percentile WITHOUT the per-group value buffer: Spark's
    // `percentile()` is an ImperativeAggregate that materializes every
    // group's values in executor memory — at 100 TB a hot flag's
    // buffer is the OOM. l_quantity's value domain is bounded, so the
    // histogram form is exact and O(|domain|) after one combinable
    // shuffle: per-(flag, qty) counts, a cumulative over the <= 50
    // histogram rows per flag, then Spark's own interpolation replayed
    // closed-form — pos = p*(n-1), v_lo = min qty with cum > floor(pos),
    // v_hi = min qty with cum > floor(pos)+1 (v_lo when past the end),
    // result = v_lo + (pos - floor(pos)) * (v_hi - v_lo). Bit-identical
    // to percentile()'s double arithmetic (same expression tree); the
    // unbounded-domain form of the same idea is a22's value-bucket
    // two-phase. Oracle unchanged (quantile_cont).
    "a10_median" -> ((s, d) => {
      val h = li(s, d).groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("l_returnflag"))))
      def pct(p: Double, out: String) = {
        val pos = (col("n") - 1).cast("double") * p
        val k = floor(pos)
        val vLo = min(when(col("cum") > k, col("l_quantity")))
        val vHi = min(when(col("cum") > k + 1, col("l_quantity")))
        Seq(vLo.as(s"__lo_$out"), vHi.as(s"__hi_$out"),
          min(pos).as(s"__pos_$out"))
      }
      cum.groupBy(col("l_returnflag"))
        .agg((pct(0.5, "med") ++ pct(0.9, "p90")).head,
          (pct(0.5, "med") ++ pct(0.9, "p90")).tail: _*)
        .select(col("l_returnflag"),
          (col("__lo_med") + (col("__pos_med") - floor(col("__pos_med"))) *
            (coalesce(col("__hi_med"), col("__lo_med")) - col("__lo_med")))
            .as("med_qty"),
          (col("__lo_p90") + (col("__pos_p90") - floor(col("__pos_p90"))) *
            (coalesce(col("__hi_p90"), col("__lo_p90")) - col("__lo_p90")))
            .as("p90_qty"))
        .orderBy("l_returnflag")
    }),

    // A11 count per group to dict (spark_util.py:21-31)
    "a11_count_per_group" -> ((s, d) =>
      Tables.events(tune(s), d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")),

    // A12 jaccard co-occurrence of id sets (spark_identity.py:102-134)
    "a12_jaccard_cooccur" -> ((s, d) => {
      val dts = Tables.events(tune(s), d)
        .select(col("event_type"), col("user_id")).distinct()
      val totals = dts.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
      val a = dts.select(col("event_type").as("ta"), col("user_id"))
      val b = dts.select(col("event_type").as("tb"), col("user_id").as("ub"))
      a.join(b, col("user_id") === col("ub") && col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("inter"))
        .join(totals.select(col("event_type").as("ta"), col("nt").as("na")), "ta")
        .join(totals.select(col("event_type").as("tb"), col("nt").as("nb")), "tb")
        .select(col("ta"), col("tb"), col("inter"), col("na"), col("nb"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double")).as("jacc"))
        .orderBy("ta", "tb")
    }),

    // A14 bootstrap interval of mean(l_quantity) via the distributed
    // Poisson bootstrap (validation.py:67-81 resamples on the driver;
    // here every (row, trial) draws a seeded Poisson(1) weight in one
    // pass — no collect, no driver loop). Cross-engine exact since
    // round 5: the draw is a quadratic hash in pure +*% arithmetic, so
    // the whole statistic is DuckDB-oracle-checked (hash-green).
    "a14_bootstrap" -> ((s, d) =>
      graft.analytics.Bootstrap.bootstrapMean(
        li(s, d).withColumn("rid",
          col("l_orderkey") * 10 + col("l_linenumber")),
        "rid", "l_quantity", trials = 200)),

    // A15 confusion matrix (validation.py:84-198): rule-based prediction
    // vs actual label, pair counts
    "a15_confusion_matrix" -> ((s, d) =>
      li(s, d).select(
          when(col("l_quantity") > 25, "R").otherwise("A").as("pred"),
          col("l_returnflag").as("actual"))
        .groupBy(col("pred"), col("actual")).agg(count(lit(1)).as("n"))
        .orderBy("pred", "actual")),

    // A21 3-sigma outlier audit, FULLY INTEGER: the data-quality
    // filter step, with the z-test cross-multiplied so no float mean/
    // stddev ever exists — flag x iff (x - mû)² > 9·var̂ where
    // mû = s div n and var̂ = (ssq div n) - mû² (truncation-quantized
    // moments — `div` and `//` both truncate toward zero, so they are
    // identical in both engines at any sign). Scale: one pass of
    // map-side-combinable (n, s, ssq) per group, broadcast back to the
    // row scan — the two-pass shape every distributed outlier pass
    // uses; no window over the fact table.
    "a21_zscore_outliers" -> ((s, d) => {
      val e = Tables.events(tune(s), d).select(col("event_type"),
        col("event_id"), cents(col("value")).as("c"))
      val stats = e.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("c")).as("s"), sum(col("c") * col("c")).as("ssq"))
      e.join(broadcast(stats), "event_type")
        .withColumn("mu", expr("s div n"))
        .withColumn("varr",
          expr("greatest((ssq div n) - mu * mu, CAST(1 AS BIGINT))"))
        .withColumn("dev", col("c") - col("mu"))
        .filter(expr("dev * dev > 9 * varr"))
        .select(col("event_type"), col("event_id"), col("c").as("cents"),
          col("dev"))
        .orderBy("event_type", "event_id")
    }),

    // A22 exact weighted median per group — the weighted-quantile cut a
    // mixture builder runs when rows carry sampling weights (a10 is the
    // unweighted form): smallest value whose cumulative weight reaches
    // half the group total, `2*cum >= W` keeping it integer. Scale: the
    // (group, value) pre-aggregation is map-side combinable and bounds
    // every window to the DISTINCT-VALUE domain (price cents), never
    // the row count.
    // Weighted median, TWO-PHASE: a flag-partitioned cumulative window
    // over the (flag, v) table is a 3-reducer sort of the corpus — the
    // r18 shape that cannot scale past |distinct flags| executors. The
    // scalable form localizes the sort: (1) per-(flag, 2^16-value-
    // bucket) partial weights (map-side combinable shuffle), (2) the
    // flag window runs over BUCKET rows only (hundreds, not corpus-
    // sized) to find the bucket containing the weighted half plus the
    // cumulative weight strictly below it, (3) one broadcast of that
    // 3-row dimension gates a second corpus pass to the median bucket's
    // rows, whose in-bucket cumulative resumes from `below` — at most
    // 2^16 distinct values per flag by construction, so the final
    // window is bounded at ANY corpus size. Same exact answer as the
    // single-window form (the crossing value is inside the first
    // bucket whose cumulative reaches half, since `below*2 < tw` by
    // minimality); the oracle keeps the direct one-window SQL.
    "a22_weighted_median" -> ((s, d) => {
      val li = Tables.lineitem(tune(s), d).select(
        col("l_returnflag").as("flag"),
        cents(col("l_extendedprice")).as("v"),
        asLong(col("l_quantity")).as("w"))
        .withColumn("b", expr("v div 65536"))
      val byBucket = li.groupBy("flag", "b").agg(sum(col("w")).as("bw"))
      val wb = Window.partitionBy(col("flag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy(col("flag"))
      val medB = byBucket
        .withColumn("cwb", sum(col("bw")).over(wb))
        .withColumn("tw", sum(col("bw")).over(wall))
        .withColumn("below", col("cwb") - col("bw"))
        .filter(col("cwb") * 2 >= col("tw"))
        .groupBy(col("flag"))
        .agg(min(col("b")).as("mb"), min_by(col("below"), col("b")).as("below"),
          min(col("tw")).as("tw"))
      li.join(broadcast(medB), Seq("flag"))
        .filter(col("b") === col("mb"))
        .groupBy(col("flag"), col("v"), col("below"), col("tw"))
        .agg(sum(col("w")).as("w"))
        .withColumn("cw", col("below") + sum(col("w")).over(
          Window.partitionBy(col("flag")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("flag"), col("tw").as("total_w"))
        .agg(min(col("v")).as("wmedian_cents"))
        .orderBy("flag")
    }),

    // A23 per-group OLS regression (slope/intercept/r2 of price-cents on
    // quantity, one fit per supplier bucket) — the grouped trend fit an
    // analytics surface runs over per-entity time/size series. All five
    // sufficient statistics (n, Σx, Σy, Σx², Σxy) are exact longs and
    // map-side combinable — ONE shuffle of 5 longs per group regardless
    // of row count, so the fit costs the same as a grouped sum at 100 TB.
    // The closed-form doubles are derived from identical integer inputs
    // by identical expression trees in both engines (per-group scalar
    // IEEE arithmetic, no reassociated float sums) — hash-exact.
    // Σy² would overflow n*Σy² in int64 at scale, so r2's second
    // denominator factor converts to double BEFORE the multiply.
    "a23_group_regression" -> ((s, d) => {
      val b = li(s, d).select(
        (col("l_suppkey") % 100).as("grp"),
        asLong(col("l_quantity")).as("x"),
        cents(col("l_extendedprice")).as("y"))
      b.groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
            col("n").cast("double"))
        .withColumn("r2",
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
            ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))))
        .select("grp", "n", "slope", "intercept", "r2")
        .orderBy("grp")
    }),

    // A24 pivot — long->wide conditional aggregation (status columns per
    // priority row). Spark's relational pivot with an EXPLICIT value list:
    // without one, .pivot() runs a distinct-scan job over the column
    // before planning, a hidden extra pass over the fact table at scale.
    // DuckDB mirrors with CASE-filtered sums (what PIVOT desugars to).
    "a24_pivot" -> ((s, d) =>
      ord(s, d).select(col("o_orderpriority").as("priority"),
          col("o_orderstatus"), cents(col("o_totalprice")).as("v"))
        .groupBy("priority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(coalesce(sum(col("v")), lit(0L)))
        .withColumnsRenamed(Map("F" -> "f_cents", "O" -> "o_cents", "P" -> "p_cents"))
        .orderBy("priority")),

    // A25 moments sketch (Gan et al., SIGMOD'18 "Moments-based quantile
    // sketches"): per-group power sums Σx..Σx⁴ — a constant-size,
    // merge-exact summary from which quantile estimates and all four
    // shape statistics derive without a second pass. On integer x
    // (quantity ≤ 50, Σx⁴ ≤ ~4e12 per group) the sums are EXACT longs,
    // so unlike HLL/KMV this sketch is oracle-hash-checkable. One
    // map-side-combinable shuffle; mean/variance/skew/kurtosis are
    // per-group scalar doubles with identical trees in both engines.
    "a25_moments_sketch" -> ((s, d) => {
      val b = li(s, d).select(col("l_returnflag").as("grp"),
        asLong(col("l_quantity")).as("x"))
      b.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("m1"),
          sum(col("x") * col("x")).as("m2"),
          sum(col("x") * col("x") * col("x")).as("m3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("m4"))
        .withColumn("mean", col("m1").cast("double") / col("n").cast("double"))
        .withColumn("variance",
          col("m2").cast("double") / col("n").cast("double") -
            col("mean") * col("mean"))
        .withColumn("skewness",
          (col("m3").cast("double") / col("n").cast("double") -
            lit(3.0) * col("mean") * col("variance") -
            col("mean") * col("mean") * col("mean")) /
            (col("variance") * sqrt(col("variance"))))
        .select("grp", "n", "m1", "m2", "m3", "m4", "mean", "variance",
          "skewness")
        .orderBy("grp")
    }),

    // A26 CUPED variance reduction (Deng et al., WSDM'13): experiment-
    // arm means adjusted by a pre-period covariate — arm = user_id % 2,
    // x = pre-period activity (first half of the wrapped day), y =
    // post-period. theta = cov(x,y)/var(x) from GLOBAL integer moments;
    // adj_mean_a = mean_y_a - theta*(mean_x_a - mean_x). Scale shape:
    // ONE map-side-combinable pass over events reduces to per-user
    // (x,y); the global and per-arm moments are two aggs over that
    // user-sized table, joined as a broadcast 1-row cross. Every double
    // is a fixed op tree over exact BIGINT moments — cross-engine
    // deterministic (the a23 regression discipline).
    "a26_cuped" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = Q.tsSec(raw) % 86400
      val per = raw.select((col("user_id") % 2).as("arm"), col("user_id"),
          when(sec < 43200, floor(col("value")).cast("long"))
            .otherwise(0L).as("xv"),
          when(sec >= 43200, floor(col("value")).cast("long"))
            .otherwise(0L).as("yv"))
        .groupBy(col("arm"), col("user_id"))
        .agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
      val g = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      per.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_a"), sum(col("x")).as("sx_a"),
          sum(col("y")).as("sy_a"))
        .crossJoin(broadcast(g))
        .withColumn("theta",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("mean_y",
          col("sy_a").cast("double") / col("n_a").cast("double"))
        .withColumn("adj_mean",
          col("mean_y") - col("theta") *
            (col("sx_a").cast("double") / col("n_a").cast("double") -
              col("sx").cast("double") / col("n").cast("double")))
        .select(col("arm"), col("n_a"), col("sx_a"), col("sy_a"),
          round(col("theta"), 6).as("theta6"),
          round(col("mean_y"), 6).as("mean_y6"),
          round(col("adj_mean"), 6).as("adj6"))
        .orderBy("arm")
    }),

    // A27 Welch two-sample t-test (unequal variances) between the two
    // a26 arms on per-user total activity: t and the Welch–
    // Satterthwaite dof from per-arm integer moments (n, Σy, Σy²) —
    // the significance readout an experiment pipeline pairs with
    // CUPED. ONE map-side pass to per-user sums, a 2-row arm agg, and
    // a 1×1 broadcast cross; every double is a fixed op tree over
    // exact BIGINTs.
    "a27_welch_ttest" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val per = raw.select((col("user_id") % 2).as("arm"), col("user_id"),
          floor(col("value")).cast("long").as("yv"))
        .groupBy(col("arm"), col("user_id")).agg(sum(col("yv")).as("y"))
      val g = per.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
          sum(col("y") * col("y")).as("ss"))
      def m(p: String) = col(s"${p}s").cast("double") / col(s"${p}n").cast("double")
      def v(p: String) =
        (col(s"${p}ss").cast("double") -
          col(s"${p}s").cast("double") * col(s"${p}s").cast("double") /
            col(s"${p}n").cast("double")) / (col(s"${p}n").cast("double") - 1.0)
      val g0 = g.filter(col("arm") === 0)
        .select(col("n").as("an"), col("s").as("as"), col("ss").as("ass"))
      val g1 = g.filter(col("arm") === 1)
        .select(col("n").as("bn"), col("s").as("bs"), col("ss").as("bss"))
      g0.crossJoin(g1)
        .withColumn("se2", v("b") / col("bn").cast("double") +
          v("a") / col("an").cast("double"))
        .withColumn("t_stat", (m("b") - m("a")) / sqrt(col("se2")))
        .withColumn("dof", col("se2") * col("se2") /
          ((v("b") / col("bn").cast("double")) * (v("b") / col("bn").cast("double")) /
            (col("bn").cast("double") - 1.0) +
           (v("a") / col("an").cast("double")) * (v("a") / col("an").cast("double")) /
            (col("an").cast("double") - 1.0)))
        .select(col("an"), col("bn"),
          round(m("a"), 6).as("mean0_6"), round(m("b"), 6).as("mean1_6"),
          round(col("t_stat"), 6).as("t6"), round(col("dof"), 6).as("dof6"))
    }),

    // A28 two-sample Kolmogorov–Smirnov test: D = sup_x |F_a(x) −
    // F_b(x)| between the order-value distributions of the two a26/a27
    // arms. The CDFs are running counts over the value-sorted distinct
    // prices — computed with the scalable two-phase prefix sum
    // (Packing.withRunningOffsets: range-partition + per-partition
    // window + P-row offset table), NOT a bare global window that
    // would single-task the corpus. Per-row F-gap doubles are one
    // division + subtraction each (exactly-rounded IEEE, identical in
    // DuckDB), and max is order-independent — so D is engine-exact at
    // any n with no n_a*n_b integer-overflow risk.
    "a28_ks_test" -> ((s, d) => {
      val per = ord(s, d)
        .select((col("o_orderkey") % 2).as("arm"), cents(col("o_totalprice")).as("v"))
        .groupBy(col("v"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
        // cached: the totals branch below otherwise re-runs the full
        // corpus scan + groupBy on a lineage separate from the
        // pid-stamped rows withRunningOffsets caches (ADVICE r10)
        .cache()
      val cum = graft.text.Packing
        .withRunningOffsets(per, "v", Seq("ca", "cb"), Seq("offa", "offb"))
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .select(col("na"), col("nb"),
          abs((col("offa") + col("ca")).cast("double") / col("na").cast("double") -
            (col("offb") + col("cb")).cast("double") / col("nb").cast("double")).as("gap"))
        .groupBy(col("na"), col("nb")).agg(max(col("gap")).as("d"))
        .select(col("na"), col("nb"), round(col("d"), 6).as("d6"))
    }),

    // A29 chi-squared independence cells over priority × status: per
    // cell the observed count, expected count under independence, and
    // the (O−E)²/E contribution — emitted PER CELL rather than summed,
    // because the 15-cell total would be a reassociated double sum
    // (engine-dependent) while each cell's fixed op tree is exact.
    // One groupBy on the fact table; margins come from re-aggregating
    // the 15-row cell table and broadcast-joining back.
    "a29_chi2_cells" -> ((s, d) => {
      val cells = ord(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("obs"))
      val rowT = cells.groupBy(col("pri")).agg(sum(col("obs")).as("r"))
      val colT = cells.groupBy(col("st")).agg(sum(col("obs")).as("c"))
      val tot = cells.agg(sum(col("obs")).as("n"))
      // margins as double products: r*c stays exact far past the long
      // overflow point (2^53 rows before a cell product loses a bit)
      cells.join(broadcast(rowT), "pri").join(broadcast(colT), "st")
        .crossJoin(broadcast(tot))
        .withColumn("e", col("r").cast("double") * col("c").cast("double") /
          col("n").cast("double"))
        .withColumn("contrib",
          (col("obs").cast("double") - col("e")) * (col("obs").cast("double") - col("e")) /
            col("e"))
        .select(col("pri"), col("st"), col("obs"),
          round(col("e"), 6).as("e6"), round(col("contrib"), 6).as("chi6"))
        .orderBy("pri", "st")
    }),

    // A30 Mann–Whitney U / rank-sum test (the nonparametric sibling of
    // a27, and AUC in disguise): ranks over the pooled value-sorted
    // counts with midrank tie handling, all DOUBLED so every rank sum
    // stays an exact integer (avg rank = t + (m+1)/2 can be a .5).
    // Reuses a28's two-phase CDF machinery — one range exchange, no
    // global window. Exact for pooled n < ~2^31 (the doubled rank-sum
    // products reach 2n² — switch the two product columns to
    // decimal(38,0) past that, the shape is unchanged).
    "a30_mann_whitney" -> ((s, d) => {
      val per = ord(s, d)
        .select((col("o_orderkey") % 2).as("arm"), cents(col("o_totalprice")).as("v"))
        .groupBy(col("v"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
        .cache() // shared by the offsets AND totals branches (see a28)
      val cum = graft.text.Packing
        .withRunningOffsets(per, "v", Seq("ca", "cb"), Seq("offa", "offb"))
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        // 2×(rank sum of arm a at value v) = ca·(2t + m + 1) with
        // t = pooled count below v, m = ties at v
        .select(col("na"), col("nb"),
          (col("ca") * ((col("offa") + col("offb")) * 2 + col("ca") + col("cb") + 1))
            .as("r2"))
        .groupBy(col("na"), col("nb")).agg(sum(col("r2")).as("r2sum"))
        .withColumn("u2", col("r2sum") - col("na") * (col("na") + 1))
        .select(col("na"), col("nb"), col("u2"),
          round(col("u2").cast("double") /
            (col("na") * col("nb") * 2).cast("double"), 6).as("auc6"))
    }),

    // O9 SCD type-2 snapshot merge (the warehouse versioned-row
    // emission o06's diff classifies but doesn't produce): old vs new
    // customer snapshots (deterministic synthetic deltas — 1-in-10
    // keys absent from old = adds, 1-in-13 absent from new = removes,
    // 1-in-7 balance bumps = changes) merged into validity-ranged
    // rows: changed keys emit a closed v1 + open v2, removed keys a
    // closed v1, unchanged an open v1. ONE full-outer key join and a
    // per-row explode of the classified row array — never three
    // re-joins of the snapshots.
    "o09_scd2_merge" -> ((s, d) => {
      val c = cust(s, d)
      val old = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey").as("k"), cents(col("c_acctbal")).as("bal_old"))
      val neu = c.filter(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey").as("k"),
          (cents(col("c_acctbal")) +
            when(col("c_custkey") % 7 === 0, 100L).otherwise(0L)).as("bal_new"))
      val j = old.join(neu, Seq("k"), "full_outer")
      val changedOrRemoved =
        col("bal_old").isNotNull &&
          (col("bal_new").isNull || col("bal_new") =!= col("bal_old"))
      val closed = when(changedOrRemoved,
        struct(lit(1).as("version"), col("bal_old").as("bal"),
          lit(1L).as("valid_from"), lit(2L).cast("long").as("valid_to")))
      val openSame = when(col("bal_old").isNotNull && col("bal_new") === col("bal_old"),
        struct(lit(1).as("version"), col("bal_old").as("bal"),
          lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to")))
      val openNew = when(col("bal_new").isNotNull &&
          (col("bal_old").isNull || col("bal_new") =!= col("bal_old")),
        struct(when(col("bal_old").isNull, 1).otherwise(2).as("version"),
          col("bal_new").as("bal"),
          lit(2L).as("valid_from"), lit(null).cast("long").as("valid_to")))
      j.select(col("k"),
          explode(filter(array(closed, openSame, openNew), x => x.isNotNull)).as("r"))
        .select(col("k"), col("r.version").as("version"), col("r.bal").as("bal"),
          col("r.valid_from").as("valid_from"), col("r.valid_to").as("valid_to"))
        .orderBy("k", "version")
    }),

    // ---------------- O: sort / limit / set ops ----------------------
    // O1 multi-key ordering
    "o01_multi_order" -> ((s, d) =>
      ord(s, d).orderBy(col("o_orderpriority").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          cents(col("o_totalprice")).as("price_cents"))
        .limit(100)),

    // O2 limit + stride slicing ([:limit*stride:stride], widget.py:139-143)
    "o02_limit_stride" -> ((s, d) =>
      Tables.events(tune(s), d).filter(pmod(col("event_id"), lit(7)) === 0)
        .orderBy("event_id").select("event_id", "event_type").limit(50)),

    // O4 union (R5 / python set unions)
    "o04_union" -> ((s, d) => {
      val c = cust(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .union(c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey")))
        .distinct().orderBy("c_custkey")
    }),

    // O5 intersect / except of id sets (other_queries.py:84-88)
    "o05_intersect_except" -> ((s, d) => {
      val o = ord(s, d)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      f.intersect(p).except(urgent).orderBy("o_custkey")
    }),

    // O6 snapshot diff: classify rows between two dataset versions as
    // added / removed / changed / same — the incremental-refresh /
    // SCD audit every recurring training-data build runs between
    // snapshots. Versions are two overlapping date windows of orders
    // (so all four classes are non-empty); the "new" snapshot perturbs
    // price by +1.00 on keys = 0 (mod 7) to model in-place updates.
    // Scale: one full outer join on the snapshot key + a 4-group
    // rollup; with both snapshots bucketed by key this is the
    // shuffle-free diff shape.
    "o06_snapshot_diff" -> ((s, d) => {
      val o = ord(s, d)
      val old = o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("k"), cents(col("o_totalprice")).as("vo"))
      val nw = o.filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey").as("k"),
          (cents(col("o_totalprice")) +
            when(pmod(col("o_orderkey"), lit(7)) === 0, 100L).otherwise(0L)).as("vn"))
      old.join(nw, Seq("k"), "full_outer")
        .select(
          when(col("vo").isNull, "added")
            .when(col("vn").isNull, "removed")
            .when(col("vn") =!= col("vo"), "changed")
            .otherwise("same").as("diff_class"),
          col("vo"), col("vn"))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("vn"), lit(0L)) - coalesce(col("vo"), lit(0L)))
            .as("delta_cents"))
        .orderBy("diff_class")
    }),

    // O7 the full rank-function suite in one query (§2.6): rank /
    // dense_rank / percent_rank / cume_dist over a TIES-BEARING order
    // (date only — equal dates exercise the peer semantics; their
    // outputs are tie-invariant), ntile over the TOTAL order (bucket
    // assignment among peers is order-dependent, so ntile gets the
    // orderkey tiebreak). percent_rank's double is (rank-1)/(n-1) in
    // both engines — exact ints divided once, bit-identical. The
    // row-thinning filter sits ABOVE the windows (filtering first
    // would change every rank).
    "o07_rank_suite" -> ((s, d) => {
      val wt = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"))
      val wu = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d).select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"))
        .withColumn("rnk", rank().over(wt).cast("long"))
        .withColumn("drnk", dense_rank().over(wt).cast("long"))
        .withColumn("prnk", percent_rank().over(wt))
        .withColumn("cd", cume_dist().over(wt))
        .withColumn("nt", ntile(4).over(wu).cast("long"))
        .filter(col("o_orderkey") % 10 === 0)
        .select("o_orderkey", "o_orderpriority", "rnk", "drnk", "prnk",
          "cd", "nt")
        .orderBy("o_orderkey")
    }),

    // O8 Z-order layout key (Morton code; Delta/Iceberg OPTIMIZE ZORDER
    // shape): interleave 8 bits of the customer bucket with 8 bits of
    // the price bucket into one sort key, then audit the locality it
    // buys — each 1024-key z-range confines BOTH dimensions to narrow
    // bands, which is what makes min/max file pruning fire on either
    // predicate after a range-partitioned write. The key is pure
    // per-row codegen'd bit arithmetic (no shuffle, no UDF); the only
    // exchange is the 64-cell rollup.
    "o08_zorder" -> ((s, d) => {
      val pc = cents(col("o_totalprice"))
      val base = ord(s, d).select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(256L)).as("qx"),
        pmod(floor(pc / lit(100000.0)).cast("long"), lit(256L)).as("qy"))
      base.withColumn("zkey", Fns.mortonKey(col("qx"), col("qy"), 8))
        .groupBy(shiftright(col("zkey"), 10).as("zcell"))
        .agg(count(lit(1)).as("n"),
          min(col("qx")).as("min_qx"), max(col("qx")).as("max_qx"),
          min(col("qy")).as("min_qy"), max(col("qy")).as("max_qy"),
          min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
        .orderBy("zcell")
    }),

    // ---------------- F: scalar functions ----------------------------
    // F1 math builtins
    "f01_math" -> ((s, d) =>
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") / 10).as("f_floor"),
          ceil(col("l_extendedprice") / 10).as("f_ceil"),
          abs(col("l_discount") - 0.05).as("f_abs"),
          (col("l_orderkey") % 97).as("f_mod"),
          greatest(asLong(col("l_quantity")), col("l_partkey") % 50).as("f_greatest"),
          least(asLong(col("l_quantity")), col("l_partkey") % 50).as("f_least"))
        .orderBy("l_orderkey", "l_linenumber", "f_floor", "f_abs", "f_greatest", "f_least")),

    // F2 bbox geometry library over derived boxes (base_models.py:225-230,
    // validation.py:51-64): height/width/area/IoU vs a shifted copy
    "f02_bbox_geometry" -> ((s, d) =>
      boxes(s, d).select(col("frame_id"), col("box_id"),
          Fns.bboxHeight(col("y1"), col("y2")).as("h"),
          Fns.bboxWidth(col("x1"), col("x2")).as("w"),
          Fns.bboxArea(col("x1"), col("x2"), col("y1"), col("y2")).as("area"),
          Fns.iou(col("x1"), col("x2"), col("y1"), col("y2"),
            col("x1") + 0.05, col("x2") + 0.05, col("y1"), col("y2")).as("iou_shift"))
        .orderBy("frame_id", "box_id", "h", "w", "area")),

    // F3 time functions (date_format / unix epoch / weekday)
    "f03_time_funcs" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey")),

    // F4 string functions incl. lowercase-ratio heuristic
    // (commercial_detection_rekall.py:88-97)
    "f04_string_funcs" -> ((s, d) =>
      Tables.documents(tune(s), d).select(col("doc_id"),
          length(col("text")).as("len"),
          substring(lower(col("text")), 1, 3).as("pre3"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
            .as("n_spaces"),
          col("text").contains("spark").as("has_spark"))
        .orderBy("doc_id")),

    // F5 array / higher-order functions (keypoint slicing analogue,
    // base_models.py:318-329)
    "f05_array_funcs" -> ((s, d) => {
      val t = split(col("text"), " ")
      Tables.documents(tune(s), d).select(col("doc_id"),
          size(t).as("ntok"),
          element_at(t, 1).as("tok_first"),
          element_at(t, -1).as("tok_last"),
          array_join(slice(t, 1, 3), "-").as("first3"))
        .orderBy("doc_id")
    }),

    // F6 JSON-ish extraction via regexp (props payload; widget JSON layer)
    "f06_json_regex" -> ((s, d) =>
      Tables.events(tune(s), d).select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id")),

    // F7 keypoint accessors (base_models.py:290-329 fixed layout;
    // unused_queries.py:41-42 hands-above-head predicate) — the pose
    // block is read out of the embedding array as (x, y, score) triples;
    // raw extraction + comparisons only, so floats hash-match exactly
    "f07_keypoints" -> ((s, d) => {
      import graft.functions.Fns.Keypoints
      val kps = Keypoints.pose(col("embedding"))
      Tables.embeddings(tune(s), d).select(col("vec_id"),
          Keypoints.x(kps, Keypoints.Nose).as("nose_x"),
          Keypoints.y(kps, Keypoints.Nose).as("nose_y"),
          Keypoints.y(kps, Keypoints.LWrist).as("lw_y"),
          Keypoints.y(kps, Keypoints.RWrist).as("rw_y"),
          Keypoints.handsAboveHead(kps).as("hands_up"))
        .orderBy("vec_id")
    }),

    // F8 hour-of-day at an offset within a video (spark_util.py:63-78
    // _annotate_hour): start hour 5, "frame" = wrapped event second,
    // fps 0.25 — pure expression instead of the reference's collect+UDF
    "f08_hour_offset" -> ((s, d) =>
      ev(s, d).select(col("event_id"),
          graft.functions.Fns.hourOffset(lit(5), col("s"), lit(0.25)).as("hour"))
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "p01_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin,

    "p02_computed" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${centsSql("l_extendedprice * (1.0 - l_discount)")} AS rev_cents,
         |  ${centsSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS charge_cents
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, rev_cents, charge_cents""".stripMargin,

    "p03_date_parts" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p04_filter_compare" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "p05_boolean_algebra" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND NOT (l_quantity < 10)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity""".stripMargin,

    "p06_null_predicates" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(nullif(l_returnflag,'N')) AS BIGINT) AS n_notnull,
        |  CAST(sum(CASE WHEN nullif(l_returnflag,'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM lineitem""".stripMargin,

    "p07_in_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "p08_string_match" ->
      """SELECT p_partkey, p_name, contains(p_name, 'red') AS has_red,
        |  starts_with(p_name, 's') AS s_prefix
        |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""".stripMargin,

    "p09_range_date" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |ORDER BY o_orderkey""".stripMargin,

    "p11_random_sample" ->
      """SELECT true AS in_range, true AS no_dups,
        |  true AS rows_intact, true AS seed_stable""".stripMargin,

    "p10_stride_sample" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id % 10 = 0 ORDER BY event_id""".stripMargin,

    "p12_conditional" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${centsSql("CASE WHEN l_returnflag = 'R' THEN l_discount ELSE 1.0 - l_discount END")} AS flip_cents
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, flip_cents""".stripMargin,

    "p13_hash_sample" ->
      """WITH h0 AS (
        |  SELECT lang, doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('smp:' || CAST(doc_id AS VARCHAR),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS h0
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY (h0*h0 + h0) % 1000000007, doc_id) AS rn
        |      FROM h0)
        |SELECT lang, doc_id FROM r WHERE rn <= 10
        |ORDER BY lang, doc_id""".stripMargin,

    "j01_equi_join_agg" ->
      s"""SELECT n_name,
         |  CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS revenue_cents,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j02_left_outer" ->
      s"""SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
         |  CAST(coalesce(sum(${centsSql("o_totalprice")}), 0) AS BIGINT) AS total_cents
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "j03_fk_chain" ->
      """SELECT s_suppkey, s_name, n_name, r_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin,

    "j04_correlated_count" ->
      """SELECT o_orderkey, CAST(4 AS BIGINT) AS n_items FROM orders
        |WHERE (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) = 4
        |ORDER BY o_orderkey""".stripMargin,

    "j05_self_theta" ->
      """SELECT a.l_orderkey, a.l_linenumber AS ln1, b.l_linenumber AS ln2,
        |  a.l_quantity AS q1, b.l_quantity AS q2
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |  AND a.l_quantity > b.l_quantity + 20
        |ORDER BY a.l_orderkey, ln1, ln2, q1, q2""".stripMargin,

    "j06_set_intersection" ->
      """SELECT o_custkey FROM orders GROUP BY o_custkey
        |HAVING max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 1
        |   AND max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 1
        |ORDER BY o_custkey""".stripMargin,

    "j16_m2m_link" ->
      """SELECT p_partkey, p_name, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_size >= 48
        |GROUP BY p_partkey, p_name ORDER BY p_partkey""".stripMargin,

    "a01_plain_agg" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(max(${centsSql("l_extendedprice")}) AS BIGINT) AS max_price_cents,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
         |  strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship
         |FROM lineitem""".stripMargin,

    "a02_group_sum" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |  CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS sum_disc_cents,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a03_weighted_sum_var" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE) / 100.0 AS e_val,
        |  CAST(sum(CAST(round(l_discount*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))
        |    * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 10000.0 AS var_val
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a04_sum_distinct" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |      FROM lineitem) t
        |WHERE rn = 1""".stripMargin,

    "a05_topk_agg" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS revenue_cents
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue_cents DESC, c_custkey LIMIT 10""".stripMargin,

    "a06_distinct_values" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 100",

    "a07_first_per_group" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "a08_argmax" ->
      s"""SELECT o_custkey, o_orderkey, ${centsSql("o_totalprice")} AS best_cents
         |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
         |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t
         |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "a09_histogram_cdf" ->
      """SELECT bucket, n, CAST(sum(n) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |FROM (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM orders GROUP BY 1) t
        |ORDER BY bucket""".stripMargin,

    "a10_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a11_count_per_group" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a12_jaccard_cooccur" ->
      """WITH dts AS (SELECT DISTINCT event_type, user_id FROM events),
        |totals AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nt FROM dts GROUP BY event_type),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, CAST(count(*) AS BIGINT) AS inter
        |  FROM dts a JOIN dts b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, inter, x.nt AS na, y.nt AS nb,
        |  CAST(inter AS DOUBLE) / CAST(x.nt + y.nt - inter AS DOUBLE) AS jacc
        |FROM pairs JOIN totals x ON pairs.ta = x.event_type
        |JOIN totals y ON pairs.tb = y.event_type
        |ORDER BY ta, tb""".stripMargin,

    // a14: the Poisson bootstrap replayed exactly — quadratic hash mod
    // 1e9+7 for the uniform draw, integer trial means in value*1e6
    // units, and the identical double expression tree for mean/std
    // (see analytics.Bootstrap).
    "a14_bootstrap" ->
      """WITH li AS (SELECT l_orderkey*10 + l_linenumber AS rid,
        |              CAST(round(l_quantity*100, 0) AS BIGINT) AS vc
        |            FROM lineitem),
        |x AS (SELECT rid, vc, unnest(generate_series(1, 200)) AS trial FROM li),
        |h AS (SELECT vc, trial,
        |        (rid*1000003 + trial*7919 + 42) % 1000000007 AS p1 FROM x),
        |u AS (SELECT vc, trial, ((p1*p1 + p1) % 1000000007) % 1000000 AS uu FROM h),
        |w AS (SELECT vc, trial,
        |        CASE WHEN uu < 367880 THEN 0 WHEN uu < 735760 THEN 1
        |             WHEN uu < 919700 THEN 2 WHEN uu < 981010 THEN 3
        |             WHEN uu < 996340 THEN 4 ELSE 5 END AS w FROM u),
        |t AS (SELECT trial, (sum(w*vc) * 10000) // sum(w) AS m FROM w GROUP BY trial)
        |SELECT CAST(sum(m) AS DOUBLE)/200.0/1000000.0 AS est_mean,
        |  sqrt((CAST(sum(m*m) AS DOUBLE)
        |      - CAST(sum(m) AS DOUBLE)*CAST(sum(m) AS DOUBLE)/200.0)/199.0)
        |    /1000000.0 AS est_std,
        |  CAST(count(*) AS BIGINT) AS n_trials
        |FROM t""".stripMargin,

    "a15_confusion_matrix" ->
      """SELECT CASE WHEN l_quantity > 25 THEN 'R' ELSE 'A' END AS pred,
        |  l_returnflag AS actual, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY pred, actual""".stripMargin,

    "a21_zscore_outliers" ->
      s"""WITH e AS (SELECT event_type, event_id,
         |            ${centsSql("value")} AS c FROM events),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(c) AS BIGINT) AS s,
         |         CAST(sum(c * c) AS BIGINT) AS ssq
         |       FROM e GROUP BY 1)
         |SELECT event_type, event_id, c AS cents, c - (s // n) AS dev
         |FROM e JOIN st USING (event_type)
         |WHERE (c - s // n) * (c - s // n)
         |  > 9 * greatest((ssq // n) - (s // n) * (s // n), 1)
         |ORDER BY 1, 2""".stripMargin,

    "a22_weighted_median" ->
      s"""WITH b AS (SELECT l_returnflag AS flag,
         |             ${centsSql("l_extendedprice")} AS v,
         |             CAST(l_quantity AS BIGINT) AS w
         |           FROM lineitem),
         |g AS (SELECT flag, v, CAST(sum(w) AS BIGINT) AS w
         |      FROM b GROUP BY 1, 2),
         |c AS (SELECT flag, v,
         |        CAST(sum(w) OVER (PARTITION BY flag ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
         |        CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
         |      FROM g)
         |SELECT flag, tw AS total_w, CAST(min(v) AS BIGINT) AS wmedian_cents
         |FROM c WHERE cw * 2 >= tw
         |GROUP BY 1, 2 ORDER BY flag""".stripMargin,

    // a23: sufficient statistics are exact integers in both engines
    // (DuckDB sums BIGINT into HUGEINT — same integer value, same
    // round-to-nearest on the cast to DOUBLE); every double below is
    // derived by the same expression tree as the Spark side.
    "a23_group_regression" ->
      s"""WITH b AS (SELECT l_suppkey % 100 AS grp,
         |             CAST(l_quantity AS BIGINT) AS x,
         |             ${centsSql("l_extendedprice")} AS y
         |           FROM lineitem),
         |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x*x) AS BIGINT) AS sxx,
         |        CAST(sum(x*y) AS BIGINT) AS sxy,
         |        CAST(sum(y*y) AS BIGINT) AS syy
         |      FROM b GROUP BY grp)
         |SELECT grp, n,
         |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
         |  (CAST(sy AS DOUBLE) -
         |     (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
         |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
         |  (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) /
         |    (CAST(n*sxx - sx*sx AS DOUBLE) *
         |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
         |FROM g ORDER BY grp""".stripMargin,

    "a24_pivot" ->
      s"""SELECT o_orderpriority AS priority,
         |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
         |    THEN ${centsSql("o_totalprice")} END), 0) AS BIGINT) AS f_cents,
         |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
         |    THEN ${centsSql("o_totalprice")} END), 0) AS BIGINT) AS o_cents,
         |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
         |    THEN ${centsSql("o_totalprice")} END), 0) AS BIGINT) AS p_cents
         |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,

    // a25: exact integer power sums; the shape statistics repeat the
    // Spark expression trees op-for-op (central-moment expansion written
    // from the raw moments, not DuckDB's skewness() — that one applies
    // a sample-size correction and accumulates in floats).
    "a25_moments_sketch" ->
      """WITH b AS (SELECT l_returnflag AS grp,
        |             CAST(l_quantity AS BIGINT) AS x FROM lineitem),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS m1,
        |        CAST(sum(x*x) AS BIGINT) AS m2,
        |        CAST(sum(x*x*x) AS BIGINT) AS m3,
        |        CAST(sum(x*x*x*x) AS BIGINT) AS m4
        |      FROM b GROUP BY grp),
        |d AS (SELECT *, CAST(m1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM g),
        |v AS (SELECT *, CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE)
        |        - mean * mean AS variance FROM d)
        |SELECT grp, n, m1, m2, m3, m4, mean, variance,
        |  (CAST(m3 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 3.0 * mean * variance - mean * mean * mean)
        |    / (variance * sqrt(variance)) AS skewness
        |FROM v ORDER BY grp""".stripMargin,

    // a26: exact integer moments; theta/means repeat the Spark doubles
    // op-for-op (the a23 discipline).
    "a26_cuped" ->
      """WITH per AS (
        |  SELECT user_id % 2 AS arm, user_id,
        |    CAST(sum(CASE WHEN (epoch_ns(ts)//1000000000) % 86400 < 43200
        |      THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN (epoch_ns(ts)//1000000000) % 86400 >= 43200
        |      THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x*x) AS BIGINT) AS sxx,
        |        CAST(sum(x*y) AS BIGINT) AS sxy FROM per),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_a,
        |        CAST(sum(x) AS BIGINT) AS sx_a, CAST(sum(y) AS BIGINT) AS sy_a
        |      FROM per GROUP BY arm)
        |SELECT arm, n_a, sx_a, sy_a,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE)
        |    / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS theta6,
        |  round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS mean_y6,
        |  round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
        |      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS adj6
        |FROM a, g ORDER BY arm""".stripMargin,

    // a27: the Welch t and Satterthwaite dof repeat the Spark doubles
    // op-for-op over exact per-arm integer moments.
    "a27_welch_ttest" ->
      """WITH per AS (SELECT user_id % 2 AS arm, user_id,
        |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS BIGINT) AS s,
        |        CAST(sum(y*y) AS BIGINT) AS ss FROM per GROUP BY arm),
        |a AS (SELECT n AS an, s AS sa, ss AS ssa FROM g WHERE arm = 0),
        |b AS (SELECT n AS bn, s AS sb, ss AS ssb FROM g WHERE arm = 1),
        |x AS (SELECT an, bn,
        |  CAST(sa AS DOUBLE) / CAST(an AS DOUBLE) AS ma,
        |  CAST(sb AS DOUBLE) / CAST(bn AS DOUBLE) AS mb,
        |  (CAST(ssa AS DOUBLE)
        |    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(an AS DOUBLE))
        |    / (CAST(an AS DOUBLE) - 1.0) AS va,
        |  (CAST(ssb AS DOUBLE)
        |    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(bn AS DOUBLE))
        |    / (CAST(bn AS DOUBLE) - 1.0) AS vb
        | FROM a, b),
        |w AS (SELECT *, vb / CAST(bn AS DOUBLE) + va / CAST(an AS DOUBLE)
        |        AS se2 FROM x)
        |SELECT an, bn, round(ma, 6) AS mean0_6, round(mb, 6) AS mean1_6,
        |  round((mb - ma) / sqrt(se2), 6) AS t6,
        |  round(se2 * se2 / (
        |    (vb / CAST(bn AS DOUBLE)) * (vb / CAST(bn AS DOUBLE))
        |      / (CAST(bn AS DOUBLE) - 1.0)
        |    + (va / CAST(an AS DOUBLE)) * (va / CAST(an AS DOUBLE))
        |      / (CAST(an AS DOUBLE) - 1.0)), 6) AS dof6
        |FROM w""".stripMargin,

    // a28: the same per-value running counts (a plain window cumsum
    // here — DuckDB sorts once; the Spark side's two-phase prefix sum
    // is bit-identical to it by PackingSpec), then the identical
    // per-row gap doubles and max.
    "a28_ks_test" ->
      s"""WITH per AS (SELECT ${centsSql("o_totalprice")} AS v,
         |    CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |        CAST(sum(cb) AS BIGINT) AS nb FROM per),
         |c AS (SELECT v,
         |        CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND CURRENT ROW) AS BIGINT) AS cuma,
         |        CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND CURRENT ROW) AS BIGINT) AS cumb
         |      FROM per)
         |SELECT na, nb,
         |  round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
         |    - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d6
         |FROM c, t GROUP BY na, nb""".stripMargin,

    // a29: observed/expected/contribution per cell with the same
    // double op tree (r*c/n, (o-e)^2/e) — per-cell, never summed.
    "a29_chi2_cells" ->
      """WITH cells AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    CAST(count(*) AS BIGINT) AS obs FROM orders GROUP BY 1, 2),
        |r AS (SELECT pri, CAST(sum(obs) AS BIGINT) AS r FROM cells GROUP BY pri),
        |c AS (SELECT st, CAST(sum(obs) AS BIGINT) AS c FROM cells GROUP BY st),
        |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |e AS (SELECT pri, st, obs,
        |        CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS e
        |      FROM cells JOIN r USING (pri) JOIN c USING (st), t)
        |SELECT pri, st, obs, round(e, 6) AS e6,
        |  round((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e, 6) AS chi6
        |FROM e ORDER BY pri, st""".stripMargin,

    // a30: the same doubled-rank arithmetic over a window cumsum.
    "a30_mann_whitney" ->
      s"""WITH per AS (SELECT ${centsSql("o_totalprice")} AS v,
         |    CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |        CAST(sum(cb) AS BIGINT) AS nb FROM per),
         |c AS (SELECT v, ca, cb,
         |        CAST(coalesce(sum(ca + cb) OVER (ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |          AS t0 FROM per),
         |r AS (SELECT CAST(sum(ca * (2*t0 + ca + cb + 1)) AS BIGINT) AS r2sum FROM c)
         |SELECT na, nb, r2sum - na*(na+1) AS u2,
         |  round(CAST(r2sum - na*(na+1) AS DOUBLE)
         |    / CAST(2*na*nb AS DOUBLE), 6) AS auc6
         |FROM r, t""".stripMargin,

    // o09: the same classification as a three-branch UNION ALL over
    // one full-outer CTE.
    "o09_scd2_merge" ->
      s"""WITH old AS (SELECT c_custkey AS k, ${centsSql("c_acctbal")} AS bal_old
         |  FROM customer WHERE c_custkey % 10 <> 0),
         |neu AS (SELECT c_custkey AS k,
         |    ${centsSql("c_acctbal")} +
         |      CASE WHEN c_custkey % 7 = 0 THEN 100 ELSE 0 END AS bal_new
         |  FROM customer WHERE c_custkey % 13 <> 0),
         |j AS (SELECT coalesce(old.k, neu.k) AS k, bal_old, bal_new
         |      FROM old FULL OUTER JOIN neu ON old.k = neu.k)
         |SELECT k, version, bal, valid_from, valid_to FROM (
         |  SELECT k, 1 AS version, bal_old AS bal,
         |    CAST(1 AS BIGINT) AS valid_from, CAST(2 AS BIGINT) AS valid_to
         |  FROM j WHERE bal_old IS NOT NULL
         |    AND (bal_new IS NULL OR bal_new <> bal_old)
         |  UNION ALL
         |  SELECT k, 1, bal_old, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
         |  FROM j WHERE bal_old IS NOT NULL AND bal_new = bal_old
         |  UNION ALL
         |  SELECT k, CASE WHEN bal_old IS NULL THEN 1 ELSE 2 END, bal_new,
         |    CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
         |  FROM j WHERE bal_new IS NOT NULL
         |    AND (bal_old IS NULL OR bal_new <> bal_old)) u
         |ORDER BY k, version""".stripMargin,

    // o08: the Morton interleave written as the identical shift/mask
    // sum; qx/qy/zkey are exact integers in both engines.
    "o08_zorder" -> {
      val z = (0 until 8).map(i =>
        s"((qx >> $i) & 1) << ${2 * i}") ++ (0 until 8).map(i =>
        s"((qy >> $i) & 1) << ${2 * i + 1}")
      s"""WITH b AS (SELECT o_orderkey, o_custkey % 256 AS qx,
         |  CAST(floor(${centsSql("o_totalprice")} / 100000.0) AS BIGINT) % 256
         |    AS qy FROM orders),
         |z AS (SELECT o_orderkey, qx, qy,
         |        ${z.map(t => s"($t)").mkString(" + ")} AS zkey FROM b)
         |SELECT zkey >> 10 AS zcell, CAST(count(*) AS BIGINT) AS n,
         |  min(qx) AS min_qx, max(qx) AS max_qx,
         |  min(qy) AS min_qy, max(qy) AS max_qy,
         |  min(zkey) AS min_z, max(zkey) AS max_z
         |FROM z GROUP BY 1 ORDER BY zcell""".stripMargin
    },

    "o01_multi_order" ->
      s"""SELECT o_orderkey, o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS od,
         |  ${centsSql("o_totalprice")} AS price_cents
         |FROM orders ORDER BY o_orderpriority DESC, o_orderdate ASC, o_orderkey ASC
         |LIMIT 100""".stripMargin,

    // o07: windows computed in the subquery, thinning filter outside —
    // a WHERE below the windows would renumber every rank
    "o07_rank_suite" ->
      """SELECT o_orderkey, o_orderpriority, rnk, drnk, prnk, cd, nt FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate) AS BIGINT) AS drnk,
        |    percent_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate) AS prnk,
        |    cume_dist() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate) AS cd,
        |    CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS nt
        |  FROM orders) w
        |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin,

    "o02_limit_stride" ->
      """SELECT event_id, event_type FROM events WHERE event_id % 7 = 0
        |ORDER BY event_id LIMIT 50""".stripMargin,

    "o04_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_custkey""".stripMargin,

    "o05_intersect_except" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "o06_snapshot_diff" ->
      s"""WITH o1 AS (SELECT o_orderkey AS k, ${centsSql("o_totalprice")} AS vo
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1996-01-01'),
         |o2 AS (SELECT o_orderkey AS k, ${centsSql("o_totalprice")}
         |    + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS vn
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-07-01'
         |    AND o_orderdate < TIMESTAMP '1996-07-01')
         |SELECT diff_class, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(coalesce(vn, 0) - coalesce(vo, 0)) AS BIGINT) AS delta_cents
         |FROM (SELECT CASE WHEN vo IS NULL THEN 'added'
         |             WHEN vn IS NULL THEN 'removed'
         |             WHEN vn <> vo THEN 'changed'
         |             ELSE 'same' END AS diff_class, vo, vn
         |      FROM o1 FULL OUTER JOIN o2 USING (k)) t
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f01_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice / 10) AS BIGINT) AS f_floor,
        |  CAST(ceil(l_extendedprice / 10) AS BIGINT) AS f_ceil,
        |  abs(l_discount - 0.05) AS f_abs,
        |  l_orderkey % 97 AS f_mod,
        |  greatest(CAST(l_quantity AS BIGINT), l_partkey % 50) AS f_greatest,
        |  least(CAST(l_quantity AS BIGINT), l_partkey % 50) AS f_least
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, f_floor, f_abs, f_greatest, f_least""".stripMargin,

    "f02_bbox_geometry" ->
      s"""WITH b AS ($boxesSql)
         |SELECT frame_id, box_id, y2 - y1 AS h, x2 - x1 AS w,
         |  (x2 - x1) * (y2 - y1) AS area,
         |  greatest(least(x2, x2 + 0.05) - greatest(x1, x1 + 0.05), 0.0)
         |    * greatest(least(y2, y2) - greatest(y1, y1), 0.0)
         |  / ((x2 - x1) * (y2 - y1) + ((x2 + 0.05) - (x1 + 0.05)) * (y2 - y1)
         |     - greatest(least(x2, x2 + 0.05) - greatest(x1, x1 + 0.05), 0.0)
         |       * greatest(least(y2, y2) - greatest(y1, y1), 0.0)) AS iou_shift
         |FROM b ORDER BY frame_id, box_id, h, w, area""".stripMargin,

    "f03_time_funcs" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f04_string_funcs" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS len, substr(lower(text), 1, 3) AS pre3,
        |  CAST(length(text) - length(replace(text, ' ', '')) AS INT) AS n_spaces,
        |  contains(text, 'spark') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f05_array_funcs" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS INT) AS ntok,
        |  (string_split(text,' '))[1] AS tok_first,
        |  (string_split(text,' '))[-1] AS tok_last,
        |  array_to_string((string_split(text,' '))[1:3], '-') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f06_json_regex" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "f07_keypoints" ->
      """SELECT vec_id, embedding[1] AS nose_x, embedding[2] AS nose_y,
        |  embedding[23] AS lw_y, embedding[14] AS rw_y,
        |  (embedding[23] < embedding[2] AND embedding[14] < embedding[2]) AS hands_up
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "f08_hour_offset" ->
      s"""SELECT event_id,
         |  CAST(CAST(floor(5 + (s / 0.25) / 3600.0) AS BIGINT) % 24 AS INT) AS hour
         |FROM (${evSql()}) e ORDER BY event_id""".stripMargin
  )
}
