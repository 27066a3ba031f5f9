package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols
import Q._

/** Extensions beyond the reference's own surface: the native codegen'd
  * overlap_seconds expression in the oracle-checked path, the banded
  * (working-window) interval join, and cube/rollup grouping (SURVEY
  * §2.5 GAP line — free in Spark, now exercised). */
object ExtraQueries {

  private val C = Cols("user_id", "s", "e")

  val queries: Map[String, QFn] = Map(
    // X1: J9 recomputed through the native Catalyst expression
    // (graft.plans.OverlapSeconds, registered by Q.tune) — proves the
    // custom-codegen path bit-matches the oracle
    "x01_native_overlap" -> ((s, d) => {
      val a = evTyped(s, d, "click").select("user_id", "event_id", "s", "e")
      val b = evTyped(s, d, "purchase").select(col("user_id").as("u2"),
        col("s").as("bs"), col("e").as("be"))
      a.join(b, col("user_id") === col("u2") &&
          col("bs") < col("e") && col("be") > col("s"), "left")
        .groupBy(col("user_id"), col("event_id"))
        .agg(coalesce(sum(expr("overlap_seconds(s, e, bs, be)")), lit(0L))
          .as("overlap_sec"))
        .orderBy("user_id", "event_id")
    }),

    // X2: banded overlap join (working_window) — must equal r07
    "x02_banded_overlaps" -> ((s, d) => {
      val clicks = evTyped(s, d, "click").select("user_id", "s", "e")
      val views = evTyped(s, d, "view").select("user_id", "s", "e")
      IntervalOps.bandedOverlaps(clicks, views, w = 256, C)
        .orderBy("user_id", "s", "e")
    }),

    // X3: R1 through the custom physical operator (CoalesceIntervalsExec:
    // one exchange + sort + single-pass sweep instead of two windows) —
    // same oracle as r01, so the custom SparkPlan is correctness-gated
    "x03_native_coalesce" -> ((s, d) => {
      val clicks = evTyped(s, d, "click").select("user_id", "s", "e")
      graft.plans.CoalescePlan.coalesceNative(clicks, "user_id", "s", "e")
        .orderBy("user_id", "s", "e")
    }),

    // X5: the plain overlaps call, auto-banded by the Catalyst rule
    // (graft.plans.AutoBandOverlapJoin): the conf flips on the rewrite
    // and the oracle is the same SQL as r07/x02 — proving the optimizer
    // rule preserves the overlap-join semantics bit-for-bit
    "x05_auto_banded" -> ((s, d) => {
      val clicks = evTyped(s, d, "click").select("user_id", "s", "e")
      val views = evTyped(s, d, "view").select("user_id", "s", "e")
      s.conf.set("spark.graft.autoband.width", "256")
      IntervalOps.overlaps(clicks, views, C)
        .orderBy("user_id", "s", "e")
    }),

    // X4: spatiotemporal Interval3D overlap join (captions.py:121-140 /
    // rekall Interval3D): events get deterministic bboxes; pairs must
    // overlap in time AND space, output clipped on all three dims
    "x04_overlaps_3d" -> ((s, d) => {
      def with3d(typ: String) = evTyped(s, d, typ).select(
        col("user_id"), col("s"), col("e"),
        ((col("event_id") % 50).cast("double") / 100.0).as("x1"),
        ((col("event_id") % 50).cast("double") / 100.0 + 0.3).as("x2"),
        ((col("event_id") % 30).cast("double") / 100.0).as("y1"),
        ((col("event_id") % 30).cast("double") / 100.0 + 0.4).as("y2"))
      IntervalOps.overlaps3D(with3d("click"), with3d("view"), C)
        .orderBy("user_id", "s", "e", "x1", "y1")
    }),

    // X6: as-of join — every click attributed to the user's most recent
    // purchase at or before it (point-in-time lookup). The operator is
    // the merge form (union + one key-partitioned window; no per-key
    // quadratic candidate set); DuckDB's native ASOF LEFT JOIN is the
    // oracle. Purchases are deduped to one per (user, second) first —
    // "latest of several at the same instant" is not well-defined.
    "x06_asof_join" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val e = raw.select(col("event_id"),
        col("user_id"), col("event_type"),
        tsSec(raw).as("t"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "t")
      val pw = Window.partitionBy(col("user_id"), col("t"))
        .orderBy(col("p_event_id").desc)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id").as("p_event_id"),
          cents(col("value")).as("p_cents"))
        .withColumn("rn", row_number().over(pw)).filter(col("rn") === 1)
        .drop("rn")
      graft.operators.AsofJoin
        .asofJoin(clicks, purchases, "user_id", "t", Seq("p_event_id", "p_cents"))
        .orderBy("event_id")
    }),

    // A18: sketch aggregates — the 100 TB substitute for exact
    // distinct-count (a10/a04 shuffle every distinct value; HLL merges
    // fixed-size registers) and exact percentile (a10 sorts the group;
    // QuantileSummaries merges bounded summaries). The raw estimates
    // are register-dependent and so cross-engine unverifiable; what IS
    // verifiable is each sketch's PUBLISHED ERROR BOUND, so the query
    // emits bound-check booleans next to the exact anchors: hll_ok
    // (|HLL − exact distinct| ≤ 3·rsd·exact, rsd = 0.05), p50_ok /
    // p95_ok (the estimate's rank interval intersects q·n ± (n/1000
    // + 1), the accuracy-1000 GK guarantee). The oracle computes the
    // same exact anchors and asserts the bounds hold — a sketch
    // drifting out of its guarantee breaks the hash match. (The r11
    // rows-only form is thereby retired; AnalyticsSpec still bounds
    // the raw estimates.)
    "a18_sketches" -> ((s, d) => {
      val li = Tables.lineitem(tune(s), d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
      // THREE separate passes over lineitem, deliberately — each
      // aggregate subtree executes exactly once in the plan, and both
      // "fewer passes" rewrites measure SLOWER at sf0.1:
      // (a) merging approx_percentile (a TypedImperativeAggregate)
      //     into the distinct agg plans the percentile buffer through
      //     the distinct rewrite's 4-level ObjectHashAggregate
      //     cascade — 14 s vs 1.2+1.3 s split (and cache/
      //     localCheckpoint of the combined form pins the slow plan);
      // (b) merging the rank sums into the distinct agg (sharing the
      //     sk scan via the broadcast pct join) makes the distinct
      //     expand carry the join output through the cascade —
      //     measured 2.2 s vs 1.3 s for this split (r14).
      // The 2-column parquet scans are the cheap part; no future
      // "dedup the scans" cleanup may re-merge these aggregates.
      val pct = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_quantity, array(0.5, 0.95), 1000)").as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("p50"), col("qs").getItem(1).as("p95"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.05).as("hll"),
          countDistinct(col("l_orderkey")).as("nd"),
          count(lit(1)).as("n"))
      // exact rank interval of each estimate within its group:
      // [count(< est) + 1, count(<= est)] must intersect q·n ± tol
      val ranks = li
        .join(broadcast(pct), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("l_quantity") <= col("p50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("l_quantity") < col("p50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("l_quantity") <= col("p95"), 1L).otherwise(0L)).as("le95"),
          sum(when(col("l_quantity") < col("p95"), 1L).otherwise(0L)).as("lt95"))
      val nD = col("n").cast("double")
      val tol = nD / 1000.0 + 1.0
      def rankOk(q: Double, le: String, lt: String) =
        (col(le).cast("double") >= lit(q) * nD - tol) &&
          (col(lt).cast("double") <= lit(q) * nD + tol)
      sk.join(ranks, "l_returnflag")
        .select(col("l_returnflag"), col("n"), col("nd"),
          (abs(col("hll") - col("nd")).cast("double") <=
            lit(0.15) * col("nd").cast("double")).as("hll_ok"),
          rankOk(0.50, "le50", "lt50").as("p50_ok"),
          rankOk(0.95, "le95", "lt95").as("p95_ok"))
        .orderBy("l_returnflag")
    }),

    // A16: cube over (returnflag, linestatus) — subtotals + grand total
    "a16_cube" -> ((s, d) =>
      Tables.lineitem(tune(s), d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // A19: GROUPING SETS — the general form cube/rollup specialize
    // (Spark 4's Dataset.groupingSets API; completes the §2.5 GAP line)
    "a19_grouping_sets" -> ((s, d) =>
      Tables.lineitem(tune(s), d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // A17: rollup over (priority, status)
    "a17_rollup" -> ((s, d) =>
      Tables.orders(tune(s), d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))),

    // A20: KMV (k-minimum-values) distinct-count sketch — the
    // engine-independent counterpart of a18's HLL. Rolling-hash each
    // order key into [0, 1e9+7); the custom bottom-k aggregate
    // (plans.BottomKAgg, a TypedImperativeAggregate whose partial
    // buffers cap at k=64 longs) keeps the k smallest DISTINCT hashes
    // per group; estimate = (k-1)*P/h_k, or the exact size when the
    // group has fewer than k. Unlike HLL registers the sketch is just
    // sorted hashes, so DuckDB replays it and the estimate is
    // value-exact across engines.
    "a20_kmv_sketch" -> ((s, d) => {
      val k = 64
      // quadratic mixing on top of the rolling hash: polynomial hashes
      // of short sequential strings are affine in the digits and
      // under-fill the low range, which skews the k-th-minimum 3-4x
      // (measured); squaring mod P scatters them (the a14/t20 lesson)
      val h0 = graft.text.TextOps.fingerprint(
        concat(lit("kmv:"), col("l_orderkey").cast("string")))
      val h = pmod(h0 * h0 + h0, lit(1000000007L))
      Tables.lineitem(tune(s), d)
        .select(col("l_returnflag"), h.as("h"))
        .groupBy(col("l_returnflag"))
        .agg(graft.plans.BottomKAgg.bottomK(col("h"), k).as("bk"))
        .select(col("l_returnflag"),
          when(size(col("bk")) < k, size(col("bk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * 1000000007.0 /
              element_at(col("bk"), k).cast("double")).as("est_distinct"),
          size(col("bk")).cast("long").as("k_used"))
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    // a18: the exact anchors (n, distinct) are computed exactly; the
    // three booleans assert the sketches' published error bounds —
    // TRUE is the contract, and a sketch outside its guarantee breaks
    // the hash match on the Spark side.
    "a18_sketches" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd,
        |  true AS hll_ok, true AS p50_ok, true AS p95_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "x01_native_overlap" ->
      s"""SELECT a.user_id, a.event_id,
         |  CAST(coalesce(sum(CASE WHEN b.s IS NOT NULL
         |    THEN greatest(0, least(a.e, b.e) - greatest(a.s, b.s)) END), 0) AS BIGINT) AS overlap_sec
         |FROM (${evSql("click")}) a LEFT JOIN (${evSql("purchase")}) b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s
         |GROUP BY a.user_id, a.event_id ORDER BY 1, 2""".stripMargin,

    "x02_banded_overlaps" ->
      s"""SELECT a.user_id, greatest(a.s, b.s) AS s, least(a.e, b.e) AS e
         |FROM (${evSql("click")}) a JOIN (${evSql("view")}) b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s
         |ORDER BY 1, 2, 3""".stripMargin,

    "x03_native_coalesce" ->
      s"""${coalesceSql(evSql("click"))}
         |ORDER BY user_id, s, e""".stripMargin,

    "x05_auto_banded" ->
      s"""SELECT a.user_id, greatest(a.s, b.s) AS s, least(a.e, b.e) AS e
         |FROM (${evSql("click")}) a JOIN (${evSql("view")}) b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s
         |ORDER BY 1, 2, 3""".stripMargin,

    "x04_overlaps_3d" ->
      s"""WITH a AS (SELECT user_id, s, e,
         |    (event_id % 50)/100.0 AS x1, (event_id % 50)/100.0 + 0.3 AS x2,
         |    (event_id % 30)/100.0 AS y1, (event_id % 30)/100.0 + 0.4 AS y2
         |  FROM (${evSql("click")}) ea),
         |b AS (SELECT user_id, s, e,
         |    (event_id % 50)/100.0 AS x1, (event_id % 50)/100.0 + 0.3 AS x2,
         |    (event_id % 30)/100.0 AS y1, (event_id % 30)/100.0 + 0.4 AS y2
         |  FROM (${evSql("view")}) eb)
         |SELECT a.user_id, greatest(a.s, b.s) AS s, least(a.e, b.e) AS e,
         |  greatest(a.x1, b.x1) AS x1, least(a.x2, b.x2) AS x2,
         |  greatest(a.y1, b.y1) AS y1, least(a.y2, b.y2) AS y2
         |FROM a JOIN b ON b.user_id = a.user_id
         |  AND b.s < a.e AND b.e > a.s
         |  AND b.x1 < a.x2 AND b.x2 > a.x1
         |  AND b.y1 < a.y2 AND b.y2 > a.y1
         |ORDER BY 1, 2, 3, 4, 6""".stripMargin,

    "x06_asof_join" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
         |    epoch_ns(ts)//1000000000 AS t, value FROM events),
         |clicks AS (SELECT event_id, user_id, t FROM e
         |           WHERE event_type = 'click'),
         |purchases AS (
         |  SELECT user_id, t, p_event_id, p_cents FROM (
         |    SELECT user_id, t, event_id AS p_event_id,
         |      ${centsSql("value")} AS p_cents,
         |      row_number() OVER (PARTITION BY user_id, t
         |                         ORDER BY event_id DESC) AS rn
         |    FROM e WHERE event_type = 'purchase') p0
         |  WHERE rn = 1)
         |SELECT c.event_id, c.user_id, c.t, p.p_event_id, p.p_cents
         |FROM clicks c ASOF LEFT JOIN purchases p
         |  ON c.user_id = p.user_id AND c.t >= p.t
         |ORDER BY c.event_id""".stripMargin,

    "a19_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "a17_rollup" ->
      s"""SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "a16_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "a20_kmv_sketch" ->
      """WITH h0 AS (
        |  SELECT l_returnflag,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('kmv:' || CAST(l_orderkey AS VARCHAR),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS h0
        |  FROM lineitem),
        |h AS (SELECT DISTINCT l_returnflag, (h0*h0 + h0) % 1000000007 AS h FROM h0),
        |r AS (SELECT l_returnflag, h,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |      FROM h),
        |k AS (SELECT l_returnflag, max(h) AS hk, CAST(count(*) AS BIGINT) AS k_used
        |      FROM r WHERE rn <= 64 GROUP BY 1)
        |SELECT l_returnflag,
        |  CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
        |       ELSE 63.0 * 1000000007.0 / CAST(hk AS DOUBLE) END AS est_distinct,
        |  k_used
        |FROM k ORDER BY l_returnflag""".stripMargin
  )
}
