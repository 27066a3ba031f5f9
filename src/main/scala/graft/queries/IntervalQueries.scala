package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.IntervalOps
import graft.sources.Tables
import graft.operators.IntervalOps.{Allen, Cols}
import Q._

/** Interval-algebra coverage: SURVEY §2.4 (R — the Rekall surface) and
  * the interval joins §2.3 J7-J9, exercised on intervals derived from
  * the `events` table (user_id plays the reference's video_id role).
  * Every op here is the Spark-native form used by IntervalOps: island
  * windows, range joins on the key, explode(sequence) — no driver-side
  * per-video loops (reference: app/esper/rekall_query.py et al.). */
object IntervalQueries {

  private val C = Cols("user_id", "s", "e")
  private def clicks(s: org.apache.spark.sql.SparkSession, d: String) =
    evTyped(s, d, "click").select("user_id", "event_id", "s", "e")
  private def views(s: org.apache.spark.sql.SparkSession, d: String) =
    evTyped(s, d, "view").select("user_id", "event_id", "s", "e")
  private def purchases(s: org.apache.spark.sql.SparkSession, d: String) =
    evTyped(s, d, "purchase").select("user_id", "event_id", "s", "e")

  // bare (user_id, s, e) for set-level ops
  private def bare(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "s", "e")

  val queries: Map[String, QFn] = Map(
    // R1 coalesce (rekall_query.py:217 etc.)
    "r01_coalesce" -> ((s, d) =>
      IntervalOps.coalesce(bare(clicks(s, d)), C).orderBy("user_id", "s", "e")),

    // R2 dilate ±d with clamp (rekall_query.py:238)
    "r02_dilate" -> ((s, d) =>
      IntervalOps.dilate(clicks(s, d), 30, C, clampAtZero = true)
        .select("user_id", "event_id", "s", "e")
        .orderBy("user_id", "event_id")),

    // R3 filter_length (interview.py:101-103)
    "r03_filter_length" -> ((s, d) =>
      IntervalOps.filterLength(clicks(s, d), 30, 120, C)
        .select("user_id", "event_id", "s", "e")
        .orderBy("user_id", "event_id")),

    // R5 set_union then coalesce (commercial_detection_rekall.py:223)
    "r05_union_coalesce" -> ((s, d) =>
      IntervalOps.coalesce(
        IntervalOps.union(bare(clicks(s, d)), bare(views(s, d))), C)
        .orderBy("user_id", "s", "e")),

    // R6 minus — time-span subtraction (commercial_detection_rekall.py:191-205)
    "r06_minus" -> ((s, d) =>
      IntervalOps.minus(bare(views(s, d)), bare(purchases(s, d)), C)
        .orderBy("user_id", "s", "e")),

    // R7 overlaps with clip (rekall_query.py:323)
    "r07_overlaps" -> ((s, d) =>
      IntervalOps.overlaps(bare(clicks(s, d)), bare(views(s, d)), C)
        .orderBy("user_id", "s", "e")),

    // R8 merge(pred) span-union pairs, then coalesce
    // (interview_with_person_x.py:53-57: click before purchase <= 120 s)
    "r08_merge_spans" -> ((s, d) =>
      IntervalOps.coalesce(
        IntervalOps.mergeSpans(bare(clicks(s, d)), bare(purchases(s, d)),
          Allen.before(120), C), C)
        .orderBy("user_id", "s", "e")),

    // R10 filter_against semi-join with working window
    // (rekall_query.py:133-136: clicks with a purchase within ±60 s)
    "r10_filter_against" -> ((s, d) =>
      IntervalOps.filterAgainst(clicks(s, d), bare(purchases(s, d)),
        Allen.orPred(Allen.before(60), Allen.after(60), Allen.overlapsPred _), C)
        .select("user_id", "event_id", "s", "e")
        .orderBy("user_id", "event_id")),

    // R12 time-unit rescale (frame<->second, rekall_query.py:84-101):
    // seconds -> whole minutes (floor start, ceil end)
    "r12_rescale" -> ((s, d) =>
      clicks(s, d).select(col("user_id"), col("event_id"),
          expr("s div 60").as("s_min"),
          expr("(e + 59) div 60").as("e_min"))
        .orderBy("user_id", "event_id")),

    // R13 split into <= 30 s chunks (rekall_query.py:111-127)
    "r13_split" -> ((s, d) =>
      IntervalOps.split(bare(purchases(s, d)), 30, C)
        .orderBy("user_id", "s", "e")),

    // R14 Allen predicate classification over pairs
    "r14_allen_pairs" -> ((s, d) => {
      val a = clicks(s, d).select(col("user_id"), col("event_id").as("aid"),
        col("s"), col("e"))
      val b = purchases(s, d).select(col("user_id").as("u2"),
        col("event_id").as("bid"), col("s").as("__bs"), col("e").as("__be"))
      a.join(b, col("user_id") === col("u2"))
        .withColumn("rel",
          when(Allen.overlapsPred(C), "overlaps")
            .when(Allen.before(60)(C), "before")
            .when(Allen.after(60)(C), "after"))
        .filter(col("rel").isNotNull)
        .select("user_id", "aid", "bid", "rel")
        .orderBy("user_id", "aid", "bid")
    }),

    // R15 scene_graph spatial pattern (panels_rekall.py:41-57): ordered
    // triples of same-frame boxes, left-to-right, same row (|dy|<=0.10),
    // height >= 0.15 — the "panel of 3" query on derived boxes.
    "r15_scene_graph" -> ((s, d) => {
      val bx = boxes(s, d)
      def side(i: Int) = bx.select(col("frame_id").as(s"f$i"),
        col("box_id").as(s"b$i"), col("x1").as(s"x1_$i"), col("x2").as(s"x2_$i"),
        col("y1").as(s"y1_$i"), col("y2").as(s"y2_$i"))
      side(1).join(side(2), col("f1") === col("f2"))
        .join(side(3), col("f1") === col("f3"))
        .filter(col("x2_1") <= col("x1_2") && col("x2_2") <= col("x1_3") &&
          abs(col("y1_1") - col("y1_2")) <= 0.10 &&
          abs(col("y1_2") - col("y1_3")) <= 0.10 &&
          col("y2_1") - col("y1_1") >= 0.15 &&
          col("y2_2") - col("y1_2") >= 0.15 &&
          col("y2_3") - col("y1_3") >= 0.15)
        .select(col("f1").as("frame_id"), col("b1"), col("b2"), col("b3"))
        .orderBy("frame_id", "b1", "b2", "b3")
    }),

    // R16 payload parse/merge (rekall_query.py:293-300 in_array parser,
    // payload_plus concat): coalesce clicks while collecting the merged
    // member event ids per island (string-joined so the oracle can
    // compare across engines)
    "r16_coalesce_payload" -> ((s, d) =>
      IntervalOps.coalesce(clicks(s, d), C,
          payloadAggs = Seq(
            // sort numerically BEFORE casting to string (lexicographic
            // order would diverge from the oracle's ORDER BY event_id)
            array_join(transform(array_sort(collect_list(col("event_id"))),
              x => x.cast("string")), ",").as("members"),
            count(lit(1)).as("n_members")))
        .orderBy("user_id", "s", "e")),

    // R17 remove_isolated_interval macro (rekall_query.py:130-140):
    // keep views >= 60 s, plus shorter ones within 30 s of another view
    "r17_remove_isolated" -> ((s, d) =>
      IntervalOps.removeIsolated(bare(views(s, d)), 60, 30, C)
        .orderBy("user_id", "s", "e")),

    // R18 dilate-coalesce-undilate smoothing (rekall_query.py:232-239)
    "r18_smooth" -> ((s, d) =>
      IntervalOps.smooth(bare(clicks(s, d)), 15, C)
        .orderBy("user_id", "s", "e")),

    // J7 interval containment join (spark.py:122-158): clicks inside
    // smoothed view segments
    "j07_containment" -> ((s, d) => {
      val segs = IntervalOps.coalesce(
        bare(IntervalOps.dilate(views(s, d), 60, C, clampAtZero = true)), C)
      IntervalOps.containedIn(clicks(s, d), segs, C)
        .select(col("user_id"), col("event_id"), col("s"), col("e"),
          col("__bs").as("seg_s"), col("__be").as("seg_e"))
        .orderBy("user_id", "event_id", "seg_s")
    }),

    // J8 overlap join + clip + first-match (spark_util.py:247-269)
    "j08_overlap_clip_first" -> ((s, d) => {
      val a = clicks(s, d)
      val b = purchases(s, d).select(col("user_id").as("u2"),
        col("s").as("__bs"), col("e").as("__be"))
      val joined = a.join(b, col("user_id") === col("u2") &&
        col("__bs") < col("e") && col("__be") > col("s"))
      val w = Window.partitionBy(col("event_id")).orderBy(col("__bs"), col("__be"))
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"),
          greatest(col("s"), col("__bs")).as("clip_s"),
          least(col("e"), col("__be")).as("clip_e"))
        .orderBy("user_id", "event_id")
    }),

    // J9 overlap-seconds annotation (spark_util.py:594-622): per click,
    // total seconds overlapped by purchase intervals
    "j09_overlap_seconds" -> ((s, d) => {
      val a = clicks(s, d)
      val b = purchases(s, d).select(col("user_id").as("u2"),
        col("s").as("__bs"), col("e").as("__be"))
      a.join(b, col("user_id") === col("u2") &&
          col("__bs") < col("e") && col("__be") > col("s"), "left")
        .groupBy(col("user_id"), col("event_id"))
        // guard on match: least/greatest SKIP nulls in SQL semantics, so
        // without the when() an unmatched left row would contribute the
        // full a-interval length instead of 0 (bug surfaced by the
        // null-propagating native overlap_seconds expression, x01)
        .agg(coalesce(sum(when(col("__bs").isNotNull,
          least(col("e"), col("__be")) - greatest(col("s"), col("__bs")))),
          lit(0L)).as("overlap_sec"))
        .orderBy("user_id", "event_id")
    }),

    // A13 interval-overlap totals with set semantics (topics.py:75-146):
    // per user, |coalesced(clicks) ∩ coalesced(views)| in seconds
    "a13_overlap_totals" -> ((s, d) => {
      val ca = IntervalOps.coalesce(bare(clicks(s, d)), C)
      val cb = IntervalOps.coalesce(bare(views(s, d)), C)
      IntervalOps.overlaps(ca, cb, C)
        .groupBy(col("user_id"))
        .agg(sum(col("e") - col("s")).as("overlap_sec"))
        .orderBy("user_id")
    }),

    // R11 bounded fold (commercial_detection_rekall.py:168-187): merge
    // overlapping clicks but cap the merged span at 60 s (tight enough
    // that the cap actually splits islands r01 would merge — at 300 the
    // fixture never hits it and the oracle can't tell cap from no-cap).
    // Inherently sequential per key -> typed flatMapGroups; the oracle
    // replays the same fold as a recursive CTE.
    "r11_bounded_coalesce" -> ((s, d) =>
      IntervalOps.boundedCoalesce(bare(clicks(s, d)), 60, C)
        .orderBy("user_id", "s", "e")),

    // ST1 sessionization — the reference's coalesce sweep as session
    // windows (SURVEY §2.9; streaming variant in StreamingSpec)
    "st01_sessionize" -> ((s, d) => {
      val pts = ev(s, d).select(col("user_id"), col("s"), (col("s") + 1).as("e"))
      IntervalOps.coalesce(pts, C, gap = 1800)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("e") - col("s")).as("total_span_sec"),
          max(col("e") - col("s")).as("max_span_sec"))
        .orderBy("user_id")
    }),

    // ST2 tumbling event-time window aggregation (hour buckets)
    "st02_window_agg" -> ((s, d) =>
      ev(s, d).groupBy(expr("s div 3600").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour_bucket", "event_type")),

    // ST3 keyed dedup keep-first (ScannerJob ledger semantics,
    // scannerutil.py:136-146): one event per (user, type, 10-min slot)
    "st03_dedup_first" -> ((s, d) => {
      val slotted = ev(s, d).withColumn("slot", expr("s div 600"))
      val w = Window.partitionBy(col("user_id"), col("event_type"), col("slot"))
        .orderBy(col("s"), col("event_id"))
      slotted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_type", "slot", "event_id")
        .orderBy("user_id", "event_type", "slot")
    }),

    // ST4 ordered funnel (signup -> click -> purchase): each stage is
    // the earliest qualifying event at-or-after the previous stage's —
    // the product-analytics sequence match. Scale: per-user min
    // aggregations chained by user-key equi-joins; every stage's state
    // is one row per surviving user, and each join reuses the same
    // user_id hash partitioning — no corpus-sized intermediate ever
    // leaves stage one.
    "st04_funnel" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val e = raw.select(col("user_id"),
        col("event_type"), tsSec(raw).as("t"))
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("t")).as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("t") >= col("t1"))
        .groupBy("user_id").agg(min(col("t")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("t") >= col("t2"))
        .groupBy("user_id").agg(min(col("t")).as("t3"))
      s1.select(lit(1L).as("stage"))
        .union(s2.select(lit(2L).as("stage")))
        .union(s3.select(lit(3L).as("stage")))
        .groupBy("stage").agg(count(lit(1)).as("users"))
        .orderBy("stage")
    }),

    // ST5 weekly cohort retention: cohort = signup week, activity =
    // distinct (user, click-week) pairs, matrix = users active at each
    // week offset from their cohort. The (user, week) distinct runs
    // BEFORE the cohort join — at 100 TB that dedup collapses the event
    // log to at most |users| x |weeks| rows, and the join + rollup run
    // on the collapsed table.
    "st05_cohort_retention" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val e = raw.select(col("user_id"),
        col("event_type"), floor(tsSec(raw) / 604800).cast("long").as("w"))
      val coh = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("w")).as("cohort_week"))
      e.filter(col("event_type") === "click")
        .select("user_id", "w").distinct()
        .join(coh, "user_id")
        .filter(col("w") >= col("cohort_week"))
        .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ST6 event-transition matrix (the Markov/path-analysis staple):
    // per-user time-ordered lead pairs (event_id tiebreak keeps the
    // order deterministic under equal timestamps), rolled up to
    // (from, to) counts. Scale: ONE shuffle — the per-user sort window
    // — then a map-side-combinable 25-key rollup.
    "st06_transitions" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val e = raw.select(col("user_id"),
        col("event_type"), tsSec(raw).as("t"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      e.withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // ST7 peak concurrency ("max simultaneous open intervals per
    // type" — peak concurrent viewers): the classic +1/-1 sweep. The
    // running sum is the SCALABLE two-phase prefix sum (t12's packing
    // machinery) over ONE composite key ordering (type, t,
    // end-before-start, event_id): per-type resets are unnecessary
    // because each type's deltas cancel to zero, so the global cumsum
    // IS the per-type sweep — no single-task corpus window anywhere.
    // Ends sort before starts at equal t (intervals are half-open
    // [s, e)). Key bounds: t < 2^18 (day-wrapped seconds + value),
    // event_id < 2^24 at driver SFs, type rank < 2^6.
    "st07_peak_concurrency" -> ((s, d) =>
      graft.operators.IntervalOps.peakConcurrency(ev(s, d),
          graft.operators.IntervalOps.Cols("event_type", "s", "e"),
          idCol = "event_id")
        .orderBy("event_type")),

    // ST8 hopping (sliding) event-time windows via Spark's NATIVE
    // window() — width 600 s, slide 300 s, so every event lands in
    // exactly two windows. This is the Structured-Streaming-compatible
    // shape (the same groupBy(window(...)) runs unchanged on a stream
    // with a watermark); st02's tumbling buckets are the special case
    // width == slide. Scale: window assignment is per-row expression
    // work (no explode of the corpus against a window table), then one
    // map-side-combinable count — a single shuffle of (window, type)
    // partials regardless of event volume.
    "st08_sliding_windows" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      raw.select(col("event_type"), Q.tsSec(raw).cast("timestamp").as("t"))
        .groupBy(window(col("t"), "600 seconds", "300 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),

    // ST9 recency-decayed engagement score: per user, fold events in
    // (t, event_id) order with score' = score/2 + value — the
    // per-event half-life weighting a ranking/abuse pipeline keeps per
    // entity (the batch twin of a mapGroupsWithState accumulator; each
    // new event halves all history). ONE shuffle (groupBy user); the
    // fold is an ordered left fold over a per-user list, so the
    // doubles are cross-engine exact (the v01 discipline), with
    // event_id breaking timestamp ties.
    "st09_decay_score" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      raw.select(col("user_id"), Q.tsSec(raw).as("t"),
          col("event_id"), col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          aggregate(
            transform(array_sort(collect_list(
              struct(col("t"), col("event_id"), col("value")))),
              x => x.getField("value")),
            lit(0.0d), (acc, v) => acc * 0.5 + v).as("score"))
        .select(col("user_id"), col("n_events"),
          round(col("score"), 6).as("score6"))
        .orderBy("user_id")
    }),

    // ST10 retention survival curve (Kaplan-Meier shape, no censoring:
    // the window is closed): per user lifespan = floor((last-first)/
    // day), then S(w) = fraction of users alive >= w days. Scale:
    // per-user min/max is one map-side-combinable pass; the curve is a
    // lifespan-histogram suffix sum over a handful of week buckets —
    // never a window over users.
    "st10_survival_curve" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      val t = Q.tsSec(raw)
      val life = raw.select(col("user_id"), t.as("t"))
        .groupBy("user_id")
        .agg(floor((max(col("t")) - min(col("t"))) / 86400L).cast("long").as("w"))
      val hist = life.groupBy("w").agg(count(lit(1)).as("n_w"))
      val win = org.apache.spark.sql.expressions.Window
        .orderBy(col("w").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      hist
        .withColumn("n_alive", sum(col("n_w")).over(win))
        .crossJoin(broadcast(life.agg(count(lit(1)).as("n_users"))))
        .select(col("w"), col("n_w"), col("n_alive"),
          round(col("n_alive").cast("double") /
            col("n_users").cast("double"), 6).as("survival6"))
        .orderBy("w")
    }),

    // ST11 event-rate spike detection (the streaming-monitor shape:
    // per-entity rate vs its own trailing baseline): per user-day
    // activity counts, trailing baseline = the user's previous 3
    // ACTIVE days (ROWS, not RANGE — gaps don't dilute the
    // baseline), spike when count > 2× the trailing mean with a full
    // baseline and count >= 5. All-integer predicate (3·cnt > 2·sum)
    // — no float mean, nothing to drift cross-engine. Scale: one
    // groupBy to user-day grain, then a window PARTITIONED BY user —
    // both shuffle on user_id and AQE-coalesce; no global window.
    "st11_rate_spikes" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      val b = raw.select(col("user_id"), Q.tsSec(raw).as("t"))
        .select(col("user_id"), expr("t div 86400").as("hb"))
        .groupBy("user_id", "hb").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("hb")).rowsBetween(-3, -1)
      b.withColumn("base_n", count(col("cnt")).over(w))
        .withColumn("base_sum", sum(col("cnt")).over(w))
        .filter(col("base_n") === 3 && col("cnt") * 3 > col("base_sum") * 2 &&
          col("cnt") >= 5)
        .select(col("user_id"), col("hb"), col("cnt"), col("base_sum"))
        .orderBy("user_id", "hb")
    }),

    // ST12 last-touch attribution (the conversion-credit shape st04's
    // funnel doesn't produce): each purchase credits the user's most
    // recent click within 600 s. "Most recent prior click" is
    // max(click-time) over the preceding-rows window — times are
    // increasing within the frame, so max IS the latest, and unlike
    // last_value(IGNORE NULLS) it mirrors identically in every
    // engine. One user-partitioned window, then a per-user rollup.
    "st12_attribution" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      val ev = raw.select(col("user_id"), col("event_id"),
        col("event_type"), Q.tsSec(raw).as("t"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_click_t",
          max(when(col("event_type") === "click", col("t"))).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("attributed",
          col("last_click_t").isNotNull && col("t") - col("last_click_t") <= 600)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"))
        .orderBy("user_id")
    }),

    // J17 nearest-event temporal join: each purchase pairs with the
    // user's nearest click within ±600 s by |Δt| (tie → smaller click
    // id) — the temporal nearest-neighbor alignment shape (sensor
    // fusion, caption↔frame alignment) that x06's backward as-of
    // can't express. Width-600 time bands with the click side posting
    // ±1 buckets make every within-window pair collide on exactly one
    // (user, bucket) equi key — the ph05 move on the time axis; a
    // plain |Δt| theta join would shuffle per-user cross products.
    "j17_nearest_event" -> ((s, d) => {
      val raw = graft.sources.Tables.events(tune(s), d)
      val ev0 = raw.select(col("user_id"), col("event_id"),
        col("event_type"), Q.tsSec(raw).as("t"))
      val pur = ev0.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("t").as("tp"),
          expr("t div 600").as("bk"))
      val clk = ev0.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("cid"), col("t").as("tc"),
          explode(array(expr("t div 600 - 1"), expr("t div 600"),
            expr("t div 600 + 1"))).as("bk"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(abs(col("tp") - col("tc")), col("cid"))
      pur.join(clk, Seq("user_id", "bk"))
        .filter(abs(col("tp") - col("tc")) <= 600)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("pid"), col("cid"),
          (col("tp") - col("tc")).as("dt"))
        .orderBy("user_id", "pid")
    }),

    // ST13 exact session-length quantiles over the WHOLE corpus —
    // global p50/p90/p99 with no sort-collect and no approx sketch:
    // session lengths pre-aggregate to (len, cnt) — the distinct-
    // length domain, not the session count — then ONE two-phase
    // prefix sum orders the CDF and each quantile is the smallest
    // length whose cumulative count crosses the integer threshold
    // (cum·100 >= n·q — no float percent anywhere). The exact-global-
    // quantile move a22 makes per group, made corpus-wide scalably.
    "st13_session_quantiles" -> ((s, d) => {
      val pts = ev(s, d).select(col("user_id"), col("s"), (col("s") + 1).as("e"))
      val lens = IntervalOps.coalesce(pts, C, gap = 1800)
        .select((col("e") - col("s")).as("len"))
        .groupBy("len").agg(count(lit(1)).as("cnt"))
        // cached: the totals branch otherwise re-runs the whole
        // coalesce + groupBy for a 1-row sum (ADVICE r10)
        .cache()
      val cum = graft.text.Packing.withRunningOffset(lens, "len", "cnt", "off")
        .withColumn("cum", col("off") + col("cnt"))
      val tot = lens.agg(sum(col("cnt")).as("n"))
      cum.crossJoin(broadcast(tot))
        .agg(max(col("n")).as("n_sessions"),
          min(when(col("cum") * 100 >= col("n") * 50, col("len"))).as("p50"),
          min(when(col("cum") * 100 >= col("n") * 90, col("len"))).as("p90"),
          min(when(col("cum") * 100 >= col("n") * 99, col("len"))).as("p99"))
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles. Interval CTEs mirror Q.evSql / Q.coalesceSql.
  // ------------------------------------------------------------------
  private def iv(typ: String) = s"(${evSql(typ)})"

  val oracle: Map[String, String] = Map(
    "r01_coalesce" ->
      s"""${coalesceSql(evSql("click"))}
         |ORDER BY user_id, s, e""".stripMargin,

    "r02_dilate" ->
      s"""SELECT user_id, event_id, greatest(s - 30, 0) AS s, e + 30 AS e
         |FROM ${iv("click")} a ORDER BY user_id, event_id""".stripMargin,

    "r03_filter_length" ->
      s"""SELECT user_id, event_id, s, e FROM ${iv("click")} a
         |WHERE e - s BETWEEN 30 AND 120 ORDER BY user_id, event_id""".stripMargin,

    "r05_union_coalesce" ->
      s"""${coalesceSql(s"${evSql("click")} UNION ALL ${evSql("view")}")}
         |ORDER BY user_id, s, e""".stripMargin,

    "r06_minus" ->
      s"""WITH a AS (SELECT *, event_id AS aid FROM ${iv("view")} x),
         |bc AS (${coalesceSql(evSql("purchase"))}),
         |j AS (SELECT a.user_id, a.aid, a.s, a.e, bc.s AS bs, bc.e AS be
         |      FROM a LEFT JOIN bc ON bc.user_id = a.user_id
         |        AND bc.s < a.e AND bc.e > a.s),
         |x AS (SELECT *,
         |        greatest(s, coalesce(lag(be) OVER (PARTITION BY aid ORDER BY bs), s)) AS segs,
         |        max(be) OVER (PARTITION BY aid) AS maxbe,
         |        row_number() OVER (PARTITION BY aid ORDER BY bs DESC NULLS LAST) AS rn_last
         |      FROM j)
         |SELECT user_id, s, e FROM (
         |  SELECT user_id, segs AS s, bs AS e FROM x
         |  WHERE bs IS NOT NULL AND segs < bs
         |  UNION ALL
         |  SELECT user_id,
         |    CASE WHEN maxbe IS NULL THEN s ELSE greatest(s, maxbe) END AS s, e
         |  FROM x WHERE rn_last = 1
         |    AND (CASE WHEN maxbe IS NULL THEN s ELSE greatest(s, maxbe) END) < e) t
         |ORDER BY user_id, s, e""".stripMargin,

    "r07_overlaps" ->
      s"""SELECT a.user_id, greatest(a.s, b.s) AS s, least(a.e, b.e) AS e
         |FROM ${iv("click")} a JOIN ${iv("view")} b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s
         |ORDER BY 1, 2, 3""".stripMargin,

    "r08_merge_spans" ->
      s"""${coalesceSql(
        s"""SELECT a.user_id, a.user_id AS uid2, least(a.s, b.s) AS s, greatest(a.e, b.e) AS e
           |FROM ${iv("click")} a JOIN ${iv("purchase")} b
           |  ON b.user_id = a.user_id AND b.s - a.e BETWEEN 0 AND 120""".stripMargin)}
         |ORDER BY user_id, s, e""".stripMargin,

    "r10_filter_against" ->
      s"""SELECT a.user_id, a.event_id, a.s, a.e FROM ${iv("click")} a
         |WHERE EXISTS (SELECT 1 FROM ${iv("purchase")} b
         |  WHERE b.user_id = a.user_id AND (
         |    (b.s - a.e BETWEEN 0 AND 60) OR (a.s - b.e BETWEEN 0 AND 60)
         |    OR (b.s < a.e AND b.e > a.s)))
         |ORDER BY user_id, event_id""".stripMargin,

    // R11: the sequential fold as a recursive CTE — state (cs, ce)
    // advances one interval per iteration per key; `m` records whether
    // row rn merged into the running island, so island-final rows are
    // those whose successor did NOT merge. Iteration count = max
    // intervals per key (small), not corpus size.
    "r11_bounded_coalesce" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT user_id, s, e,
         |    row_number() OVER (PARTITION BY user_id ORDER BY s, e) AS rn
         |  FROM (${evSql("click")}) src),
         |r AS (
         |  SELECT user_id, rn, s AS cs, e AS ce, TRUE AS m FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.user_id, t.rn,
         |    CASE WHEN t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 60
         |      THEN r.cs ELSE t.s END,
         |    CASE WHEN t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 60
         |      THEN greatest(t.e, r.ce) ELSE t.e END,
         |    (t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 60)
         |  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1)
         |SELECT user_id, cs AS s, ce AS e FROM (
         |  SELECT user_id, cs, ce,
         |    lead(m) OVER (PARTITION BY user_id ORDER BY rn) AS nm
         |  FROM r) z
         |WHERE nm IS NULL OR NOT nm
         |ORDER BY user_id, s, e""".stripMargin,

    "r12_rescale" ->
      s"""SELECT user_id, event_id, s // 60 AS s_min, (e + 59) // 60 AS e_min
         |FROM ${iv("click")} a ORDER BY user_id, event_id""".stripMargin,

    "r13_split" ->
      s"""SELECT user_id, gs AS s, least(gs + 30, e) AS e
         |FROM (SELECT user_id, e, unnest(generate_series(s, e - 1, 30)) AS gs
         |      FROM ${iv("purchase")} a) t
         |ORDER BY user_id, s, e""".stripMargin,

    "r14_allen_pairs" ->
      s"""SELECT a.user_id, a.event_id AS aid, b.event_id AS bid,
         |  CASE WHEN b.s < a.e AND b.e > a.s THEN 'overlaps'
         |       WHEN b.s - a.e BETWEEN 0 AND 60 THEN 'before'
         |       WHEN a.s - b.e BETWEEN 0 AND 60 THEN 'after' END AS rel
         |FROM ${iv("click")} a JOIN ${iv("purchase")} b ON b.user_id = a.user_id
         |WHERE (b.s < a.e AND b.e > a.s) OR (b.s - a.e BETWEEN 0 AND 60)
         |   OR (a.s - b.e BETWEEN 0 AND 60)
         |ORDER BY 1, 2, 3""".stripMargin,

    "r15_scene_graph" ->
      s"""WITH bx AS ($boxesSql)
         |SELECT a.frame_id, a.box_id AS b1, b.box_id AS b2, c.box_id AS b3
         |FROM bx a JOIN bx b ON a.frame_id = b.frame_id
         |JOIN bx c ON a.frame_id = c.frame_id
         |WHERE a.x2 <= b.x1 AND b.x2 <= c.x1
         |  AND abs(a.y1 - b.y1) <= 0.10 AND abs(b.y1 - c.y1) <= 0.10
         |  AND a.y2 - a.y1 >= 0.15 AND b.y2 - b.y1 >= 0.15 AND c.y2 - c.y1 >= 0.15
         |ORDER BY 1, 2, 3, 4""".stripMargin,

    "r16_coalesce_payload" ->
      s"""SELECT user_id, min(s) AS s, max(e) AS e,
         |  string_agg(event_id, ',' ORDER BY event_id) AS members,
         |  CAST(count(*) AS BIGINT) AS n_members
         |FROM (
         |  SELECT user_id, event_id, s, e, CAST(sum(isnew) OVER (PARTITION BY user_id ORDER BY s, e
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp FROM (
         |    SELECT user_id, event_id, s, e,
         |      CASE WHEN runmax IS NULL OR s > runmax THEN 1 ELSE 0 END AS isnew FROM (
         |      SELECT user_id, event_id, s, e, max(e) OVER (PARTITION BY user_id ORDER BY s, e
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
         |      FROM (${evSql("click")}) iv) m) g) gg
         |GROUP BY user_id, grp ORDER BY user_id, s, e""".stripMargin,

    "r17_remove_isolated" ->
      s"""WITH v AS (SELECT user_id, s, e FROM ${iv("view")} x)
         |SELECT user_id, s, e FROM (
         |  SELECT user_id, s, e FROM v WHERE e - s >= 60
         |  UNION ALL
         |  SELECT a.user_id, a.s, a.e FROM v a WHERE a.e - a.s < 60 AND EXISTS (
         |    SELECT 1 FROM v b WHERE b.user_id = a.user_id
         |      AND ((b.s - a.e BETWEEN 0 AND 30) OR (a.s - b.e BETWEEN 0 AND 30)
         |           OR (b.s < a.e AND b.e > a.s))
         |      AND NOT (b.s = a.s AND b.e = a.e))) t
         |ORDER BY user_id, s, e""".stripMargin,

    "r18_smooth" ->
      s"""SELECT user_id, s + 15 AS s, e - 15 AS e FROM (
         |${coalesceSql(s"SELECT user_id, s - 15 AS s, e + 15 AS e FROM (${evSql("click")}) q")}
         |) c ORDER BY user_id, s, e""".stripMargin,

    "j07_containment" ->
      s"""WITH segs AS (${coalesceSql(
        s"SELECT user_id, greatest(s - 60, 0) AS s, e + 60 AS e FROM (${evSql("view")}) q")})
         |SELECT a.user_id, a.event_id, a.s, a.e, b.s AS seg_s, b.e AS seg_e
         |FROM ${iv("click")} a JOIN segs b
         |  ON b.user_id = a.user_id AND b.s <= a.s AND a.e <= b.e
         |ORDER BY 1, 2, 5""".stripMargin,

    "j08_overlap_clip_first" ->
      s"""SELECT user_id, event_id, greatest(s, bs) AS clip_s, least(e, be) AS clip_e
         |FROM (SELECT a.user_id, a.event_id, a.s, a.e, b.s AS bs, b.e AS be,
         |        row_number() OVER (PARTITION BY a.event_id ORDER BY b.s, b.e) AS rn
         |      FROM ${iv("click")} a JOIN ${iv("purchase")} b
         |        ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s) t
         |WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,

    "j09_overlap_seconds" ->
      s"""SELECT a.user_id, a.event_id,
         |  CAST(coalesce(sum(CASE WHEN b.s IS NOT NULL
         |    THEN least(a.e, b.e) - greatest(a.s, b.s) END), 0) AS BIGINT) AS overlap_sec
         |FROM ${iv("click")} a LEFT JOIN ${iv("purchase")} b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s
         |GROUP BY a.user_id, a.event_id ORDER BY 1, 2""".stripMargin,

    "a13_overlap_totals" ->
      s"""WITH ca AS (${coalesceSql(evSql("click"))}),
         |cb AS (${coalesceSql(evSql("view"))})
         |SELECT ca.user_id, CAST(sum(least(ca.e, cb.e) - greatest(ca.s, cb.s)) AS BIGINT) AS overlap_sec
         |FROM ca JOIN cb ON cb.user_id = ca.user_id AND cb.s < ca.e AND cb.e > ca.s
         |GROUP BY ca.user_id ORDER BY 1""".stripMargin,

    "st01_sessionize" ->
      s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(e - s) AS BIGINT) AS total_span_sec,
         |  CAST(max(e - s) AS BIGINT) AS max_span_sec
         |FROM (${coalesceSql(
        s"SELECT user_id, s, s + 1 AS e FROM (${evSql()}) q", gap = 1800)}) t
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "st02_window_agg" ->
      s"""SELECT s // 3600 AS hour_bucket, event_type, CAST(count(*) AS BIGINT) AS n
         |FROM (${evSql()}) t GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin,

    "st03_dedup_first" ->
      s"""SELECT user_id, event_type, slot, event_id FROM (
         |  SELECT user_id, event_type, s // 600 AS slot, event_id,
         |    row_number() OVER (PARTITION BY user_id, event_type, s // 600
         |      ORDER BY s, event_id) AS rn
         |  FROM (${evSql()}) t) x
         |WHERE rn = 1 ORDER BY user_id, event_type, slot""".stripMargin,

    // st04/st05 use raw epoch seconds (no %86400 wrap): funnel order
    // and cohort weeks need the real timeline, not the folded day.
    "st04_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |            epoch_ns(ts) // 1000000000 AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t >= t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t >= t2 GROUP BY 1)
        |SELECT stage, CAST(count(*) AS BIGINT) AS users FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage FROM s1
        |  UNION ALL SELECT 2 FROM s2
        |  UNION ALL SELECT 3 FROM s3) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "st05_cohort_retention" ->
      """WITH e AS (SELECT user_id, event_type,
        |            (epoch_ns(ts) // 1000000000) // 604800 AS w FROM events),
        |coh AS (SELECT user_id, min(w) AS cohort_week FROM e
        |        WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, w FROM e WHERE event_type = 'click')
        |SELECT cohort_week, w - cohort_week AS week_offset,
        |  CAST(count(*) AS BIGINT) AS users
        |FROM act JOIN coh USING (user_id)
        |WHERE w >= cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "st06_transitions" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |            epoch_ns(ts) // 1000000000 AS t FROM events),
        |p AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY t, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // st07: per-type +1/-1 sweep as a plain partitioned window (the
    // Spark side's global two-phase cumsum equals this because each
    // type's deltas sum to zero); ends before starts at equal t
    "st07_peak_concurrency" ->
      s"""WITH iv AS (${evSql()}),
         |del AS (SELECT event_type, s AS t, CAST(1 AS BIGINT) AS delta,
         |          1 AS flag, event_id FROM iv
         |        UNION ALL
         |        SELECT event_type, e, CAST(-1 AS BIGINT), 0, event_id FROM iv),
         |rs AS (SELECT event_type, t,
         |         CAST(sum(delta) OVER (PARTITION BY event_type
         |           ORDER BY t, flag, event_id) AS BIGINT) AS c
         |       FROM del),
         |p AS (SELECT event_type, CAST(max(c) AS BIGINT) AS peak
         |      FROM rs GROUP BY 1)
         |SELECT rs.event_type, p.peak, CAST(min(rs.t) AS BIGINT) AS peak_t
         |FROM rs JOIN p ON p.event_type = rs.event_type AND rs.c = p.peak
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // st08: Spark's hopping windows align to epoch 0, so with width
    // 600 / slide 300 an event at second t belongs to the two windows
    // starting at floor(t/300)*300 and that minus 300 — generated here
    // by an i in {0,1} unnest, no window table.
    "st08_sliding_windows" ->
      """WITH e AS (SELECT event_type,
        |             epoch_ns(ts) // 1000000000 AS t FROM events),
        |w AS (SELECT event_type, t - (t % 300) - 300 * i AS w_start
        |      FROM (SELECT event_type, t,
        |              unnest(generate_series(0, 1)) AS i FROM e) x)
        |SELECT CAST(w_start AS BIGINT) AS w_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    // st09: the same (t, event_id)-ordered left fold — event_id is
    // unique, so the list order (and hence every IEEE double) matches
    // Spark's struct-sorted fold exactly.
    "st09_decay_score" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(value ORDER BY epoch_ns(ts) // 1000000000, event_id)),
        |    (a, x) -> a * 0.5 + x), 6) AS score6
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // st10: lifespan histogram + suffix sum; all integers except the
    // final ratio.
    "st10_survival_curve" ->
      """WITH life AS (SELECT user_id,
        |    CAST(floor((max(epoch_ns(ts) // 1000000000)
        |      - min(epoch_ns(ts) // 1000000000)) / 86400.0) AS BIGINT) AS w
        |  FROM events GROUP BY user_id),
        |h AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM life GROUP BY w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM life)
        |SELECT w, n_w,
        |  CAST(sum(n_w) OVER (ORDER BY w DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_alive,
        |  round(CAST(sum(n_w) OVER (ORDER BY w DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(n_users AS DOUBLE), 6) AS survival6
        |FROM h, n ORDER BY w""".stripMargin,

    // st11: identical user-day grain, ROWS-framed trailing window,
    // and all-integer spike predicate.
    "st11_rate_spikes" ->
      """WITH b AS (SELECT user_id,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS hb,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT user_id, hb, cnt,
        |        count(cnt) OVER (PARTITION BY user_id ORDER BY hb
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS base_n,
        |        CAST(sum(cnt) OVER (PARTITION BY user_id ORDER BY hb
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS base_sum
        |      FROM b)
        |SELECT user_id, CAST(hb AS BIGINT) AS hb, cnt, base_sum
        |FROM w WHERE base_n = 3 AND cnt * 3 > base_sum * 2 AND cnt >= 5
        |ORDER BY user_id, hb""".stripMargin,

    // st12: the same preceding-rows click-time max and 600 s credit
    // window.
    "st12_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS t FROM events),
        |w AS (SELECT user_id, event_id, event_type, t,
        |        max(CASE WHEN event_type = 'click' THEN t END)
        |          OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS last_click_t
        |      FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN last_click_t IS NOT NULL
        |    AND t - last_click_t <= 600 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_attributed
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // j17: plain theta join + qualify (the oracle needn't band — the
    // pair set and rank-1 picks are identical).
    "j17_nearest_event" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS t FROM events),
        |p AS (SELECT user_id, event_id AS pid, t AS tp FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS cid, t AS tc FROM ev
        |      WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, pid, cid, tp - tc AS dt,
        |        row_number() OVER (PARTITION BY pid
        |          ORDER BY abs(tp - tc), cid) AS rn
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND abs(tp - tc) <= 600)
        |SELECT user_id, pid, cid, CAST(dt AS BIGINT) AS dt
        |FROM j WHERE rn = 1 ORDER BY user_id, pid""".stripMargin,

    // st13: the same session islands, (len, cnt) CDF, and integer
    // threshold crossings (window cumsum here; two-phase on Spark).
    "st13_session_quantiles" ->
      s"""WITH sess AS (${coalesceSql(
        s"SELECT user_id, s, s + 1 AS e FROM (${evSql()}) q", gap = 1800)}),
         |lens AS (SELECT e - s AS len, CAST(count(*) AS BIGINT) AS cnt
         |         FROM sess GROUP BY 1),
         |c AS (SELECT len, cnt,
         |        CAST(sum(cnt) OVER (ORDER BY len
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          AS cum FROM lens),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM lens)
         |SELECT max(n) AS n_sessions,
         |  CAST(min(CASE WHEN cum*100 >= n*50 THEN len END) AS BIGINT) AS p50,
         |  CAST(min(CASE WHEN cum*100 >= n*90 THEN len END) AS BIGINT) AS p90,
         |  CAST(min(CASE WHEN cum*100 >= n*99 THEN len END) AS BIGINT) AS p99
         |FROM c, t""".stripMargin
  )
}
