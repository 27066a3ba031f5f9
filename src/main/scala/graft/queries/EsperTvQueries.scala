package graft.queries

import org.apache.spark.sql.functions._
import graft.espertv.EsperQueries
import Q._

/** The reference's flagship domain pipelines run against the driver
  * tables (clicks play the guest track, views the host track,
  * user_id the video): the full interview-detection chain — coalesce,
  * adjacency merge, overlap, union, smooth, length filter — is
  * DuckDB-oracle-checked end-to-end, and interval screen time uses the
  * integer-exact E/Var form. Commercial detection includes the
  * sequential bounded fold, so it stays rows-only. */
object EsperTvQueries {

  val queries: Map[String, QFn] = Map(
    // E1: "interview with person X" (§3.2) — the whole pipeline
    "e01_interviews" -> ((s, d) => {
      val guest = evTyped(s, d, "click")
        .select(col("user_id").as("video_id"), col("s"), col("e"))
      val host = evTyped(s, d, "view")
        .select(col("user_id").as("video_id"), col("s"), col("e"))
      EsperQueries.interviews(guest, host, maxGap = 20, minTotal = 45)
    }),

    // E2: commercial-detection composition (bounded fold inside ->
    // rows-only); black frames := purchases, captions := props payloads
    "e02_commercials" -> ((s, d) => {
      val black = evTyped(s, d, "purchase")
        .select(col("user_id").as("video_id"), col("s"), (col("s") + 2).as("e"))
      // carry props straight off the scan instead of re-joining events
      // to recover the column Q.ev drops (round-1 verdict cleanup)
      val raw = graft.sources.Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      val caps = raw
        .filter(col("event_type") === "error")
        .select(col("user_id").as("video_id"), sec.as("s"),
          (sec + floor(col("value")).cast("long") + 1).as("e"),
          col("props").as("text"))
      EsperQueries.commercials(black, caps, minLen = 5, maxCommercial = 600)
        .orderBy("video_id", "s", "e")
    }),

    // E4: timeline-plot data layer (plot_timeline.py:20-76 VideoRow /
    // VideoSegment): per-video segment rows ready for the renderer —
    // shot intervals (coalesced caption events), position normalized
    // by video length (max event end per video), display_value =
    // min(1, len/1000) (the reference's default shot_value_fn,
    // :47-48), display_label = commercial/non-commercial by overlap
    // against the black-frame islands (:49-50 shot_label_fn). The
    // label is an exists-overlap per video key (equi-key first, so
    // the non-equi residual never goes cross-video); the plotting
    // itself is out of engine scope — this IS its input frame.
    "e04_timeline_rows" -> ((s, d) => {
      import graft.operators.IntervalOps
      val C = IntervalOps.Cols("video_id", "s", "e")
      val shots = IntervalOps.coalesce(evTyped(s, d, "error")
        .select(col("user_id").as("video_id"), col("s"), col("e")), C)
      val black = IntervalOps.coalesce(evTyped(s, d, "purchase")
        .select(col("user_id").as("video_id"), col("s"),
          (col("s") + 2).as("e")), C)
        .select(col("video_id").as("bv"), col("s").as("bs"), col("e").as("be"))
      val len = Q.ev(s, d).groupBy(col("user_id").as("video_id"))
        .agg(max(col("e")).as("len"))
      // exists-overlap as ONE pass: left join (a shot meets at most a
      // few islands; the fan-out is bounded by the coalesce) then a
      // group-flag — a semi+anti union would compute the shots and
      // black coalesces twice each, two corpus scans at 100 TB
      val overlap = shots("video_id") === black("bv") &&
        col("bs") < shots("e") && col("be") > shots("s")
      shots.join(black, overlap, "left")
        .groupBy(shots("video_id"), col("s"), col("e"))
        .agg(max(when(col("bv").isNotNull, 1).otherwise(0)).as("__c"))
        .withColumn("display_label",
          when(col("__c") === 1, "commercial").otherwise("non-commercial"))
        .drop("__c")
        .join(len, "video_id")
        .select(col("video_id"), col("s"), col("e"),
          (col("s").cast("double") / col("len").cast("double")).as("s_frac"),
          (col("e").cast("double") / col("len").cast("double")).as("e_frac"),
          least(lit(1.0), (col("e") - col("s")).cast("double") / 1000.0)
            .as("display_value"),
          col("display_label"))
        .orderBy("video_id", "s", "e")
    }),

    // E5: report data layer (report.py:25-76 screen_speak_scatter —
    // its input frames are per-show M%/F% screen-time share tables,
    // sorted by M%): expected screen seconds by identity per show,
    // as shares of the show's two-identity total. Identities map to
    // the click/view tracks (as in e01), show to a user bucket, and
    // the probabilistic weighting is e03's integer cents form — sums
    // stay exact integers and only the final shares divide, so the
    // whole report frame is oracle-exact. The plot itself is out of
    // engine scope; this IS the frame it renders.
    "e05_screen_share" -> ((s, d) => {
      // plain % (sign of the dividend), matching DuckDB's % exactly
      // for ALL inputs — pmod would diverge from the oracle on
      // negative values (e03's pmod precedent is safe only because
      // the corpus values are non-negative)
      val k = round(col("value") * 100).cast("long") % 100L
      val w = Q.ev(s, d)
        .join(graft.sources.Tables.events(tune(s), d)
          .select("event_id", "value"), "event_id")
        .filter(col("event_type").isin("click", "view"))
        .select((col("user_id") % 20).as("show_key"), col("event_type"),
          ((col("e") - col("s")) * k).as("wdur"))
      w.groupBy(col("show_key"))
        .agg(
          sum(when(col("event_type") === "click", col("wdur"))
            .otherwise(0L)).as("m_raw"),
          sum(when(col("event_type") === "view", col("wdur"))
            .otherwise(0L)).as("f_raw"))
        .filter(col("m_raw") + col("f_raw") > 0)
        .select(col("show_key"),
          (col("m_raw").cast("double") * 100.0 /
            (col("m_raw") + col("f_raw")).cast("double")).as("m_pct"),
          (col("f_raw").cast("double") * 100.0 /
            (col("m_raw") + col("f_raw")).cast("double")).as("f_pct"),
          ((col("m_raw") + col("f_raw")).cast("double") / 100.0)
            .as("total_expected_sec"))
        .orderBy("m_pct", "show_key")
    }),

    // E3: probabilistic screen time over interval spans, integer-exact
    // (identity := event_type, p := fractional cents of value)
    "e03_screen_time" -> ((s, d) => {
      val k = pmod(round(col("value") * 100).cast("long"), lit(100L))
      val dur = (col("e") - col("s"))
      Q.ev(s, d)
        .join(graft.sources.Tables.events(tune(s), d).select("event_id", "value"),
          "event_id")
        .groupBy(col("event_type").as("identity"))
        .agg((sum(dur * k).cast("double") / 100.0).as("expected_sec"),
          (sum(k * (lit(100L) - k) * dur * dur).cast("double") / 10000.0)
            .as("variance_sec2"),
          count(lit(1)).as("n_spans"))
        .orderBy("identity")
    })
  )

  // ------------------------------------------------------------------
  // e01 oracle: the interview chain in SQL, mirroring each IntervalOps
  // stage (coalesce islands, merge spans, overlap clip, union-coalesce,
  // dilate/coalesce/undilate smooth, length filter).
  // ------------------------------------------------------------------
  private val e01Sql: String = {
    val g = coalesceSql(evSql("click"))
    val h = coalesceSql(evSql("view"))
    val paired =
      s"""SELECT a.user_id, least(a.s, b.s) AS s, greatest(a.e, b.e) AS e
         |FROM ($g) a JOIN ($h) b ON b.user_id = a.user_id AND (
         |  (b.s - a.e BETWEEN 0 AND 20) OR (a.s - b.e BETWEEN 0 AND 20)
         |  OR (b.s < a.e AND b.e > a.s))""".stripMargin
    val overlapped =
      s"""SELECT a.user_id, greatest(a.s, b.s) AS s, least(a.e, b.e) AS e
         |FROM ($g) a JOIN ($h) b
         |  ON b.user_id = a.user_id AND b.s < a.e AND b.e > a.s""".stripMargin
    val cand = coalesceSql(s"$paired UNION ALL $overlapped")
    val dilated = s"SELECT user_id, s - 10 AS s, e + 10 AS e FROM ($cand) c0"
    val smoothed =
      s"SELECT user_id, s + 10 AS s, e - 10 AS e FROM (${coalesceSql(dilated)}) c1"
    s"""SELECT user_id AS video_id, s, e FROM ($smoothed) f
       |WHERE e - s >= 45 ORDER BY 1, 2, 3""".stripMargin
  }

  // ------------------------------------------------------------------
  // e02 oracle: the commercial-detection chain in SQL — black-frame
  // islands, lowercase-caption runs (ratio > 0.5 as the exact integer
  // cross-multiply 2*lower > letters), smooth, the stack-fold bounded
  // coalesce replayed as a recursive CTE (one interval per iteration
  // per key, as in r11's oracle), live-marker subtraction (r06's
  // gap-emission form), length filter.
  // ------------------------------------------------------------------
  private val e02Sql: String = {
    val black0 = s"SELECT user_id, s, s + 2 AS e FROM (${evSql("purchase")}) b0"
    val blackC = coalesceSql(
      s"SELECT user_id, greatest(s - 2, 0) AS s, e + 2 AS e FROM ($black0) b1")
    val caps =
      """SELECT user_id, (epoch_ns(ts)//1000000000) % 86400 AS s,
        |  (epoch_ns(ts)//1000000000) % 86400 + CAST(floor(value) AS BIGINT) + 1 AS e,
        |  props AS text
        |FROM events WHERE event_type = 'error'""".stripMargin
    val lc =
      s"""SELECT user_id, s, e FROM ($caps) c
         |WHERE 2 * len(regexp_replace(text, '[^a-z]', '', 'g'))
         |    > len(regexp_replace(text, '[^A-Za-z]', '', 'g'))""".stripMargin
    val lcC = coalesceSql(lc, gap = 5)
    val lcRuns =
      s"SELECT user_id, s + 2 AS s, e - 2 AS e FROM (${coalesceSql(
        s"SELECT user_id, s - 2 AS s, e + 2 AS e FROM ($lcC) l0")}) l1"
    val liveRuns = coalesceSql(
      s"SELECT user_id, s, e FROM ($caps) c WHERE text LIKE '%>>%'", gap = 5)
    s"""WITH RECURSIVE t AS (
       |  SELECT user_id, s, e,
       |    row_number() OVER (PARTITION BY user_id ORDER BY s, e) AS rn
       |  FROM (($blackC) UNION ALL ($lcRuns)) u),
       |r AS (
       |  SELECT user_id, rn, s AS cs, e AS ce, TRUE AS m FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.user_id, t.rn,
       |    CASE WHEN t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 600
       |      THEN r.cs ELSE t.s END,
       |    CASE WHEN t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 600
       |      THEN greatest(t.e, r.ce) ELSE t.e END,
       |    (t.s <= r.ce AND greatest(t.e, r.ce) - r.cs <= 600)
       |  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1),
       |cand AS (
       |  SELECT user_id, cs AS s, ce AS e FROM (
       |    SELECT user_id, cs, ce,
       |      lead(m) OVER (PARTITION BY user_id ORDER BY rn) AS nm
       |    FROM r) z WHERE nm IS NULL OR NOT nm),
       |a AS (SELECT user_id, s, e,
       |        row_number() OVER (ORDER BY user_id, s, e) AS aid FROM cand),
       |lv AS ($liveRuns),
       |j AS (SELECT a.user_id, a.aid, a.s, a.e, lv.s AS bs, lv.e AS be
       |      FROM a LEFT JOIN lv ON lv.user_id = a.user_id
       |        AND lv.s < a.e AND lv.e > a.s),
       |x AS (SELECT *,
       |        greatest(s, coalesce(lag(be) OVER (PARTITION BY aid ORDER BY bs), s)) AS segs,
       |        max(be) OVER (PARTITION BY aid) AS maxbe,
       |        row_number() OVER (PARTITION BY aid ORDER BY bs DESC NULLS LAST) AS rn_last
       |      FROM j),
       |mres AS (
       |  SELECT user_id, segs AS s, bs AS e FROM x WHERE bs IS NOT NULL AND segs < bs
       |  UNION ALL
       |  SELECT user_id,
       |    CASE WHEN maxbe IS NULL THEN s ELSE greatest(s, maxbe) END AS s, e
       |  FROM x WHERE rn_last = 1
       |    AND (CASE WHEN maxbe IS NULL THEN s ELSE greatest(s, maxbe) END) < e)
       |SELECT user_id AS video_id, s, e FROM mres
       |WHERE e - s BETWEEN 5 AND 600
       |ORDER BY 1, 2, 3""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "e01_interviews" -> e01Sql,
    "e02_commercials" -> e02Sql,

    // e04: shots/black replay the island coalesce; the label is a
    // correlated EXISTS; the three doubles mirror Spark's expression
    // trees op-for-op (per-row IEEE division is cross-engine exact)
    "e04_timeline_rows" -> {
      val shots = coalesceSql(evSql("error"))
      val black = coalesceSql(
        s"SELECT user_id, s, s + 2 AS e FROM (${evSql("purchase")}) b0")
      s"""WITH sh AS ($shots), bl AS ($black),
         |ln AS (SELECT user_id, max(e) AS len FROM (${evSql()}) v GROUP BY 1)
         |SELECT sh.user_id AS video_id, sh.s, sh.e,
         |  CAST(sh.s AS DOUBLE) / CAST(ln.len AS DOUBLE) AS s_frac,
         |  CAST(sh.e AS DOUBLE) / CAST(ln.len AS DOUBLE) AS e_frac,
         |  least(1.0, CAST(sh.e - sh.s AS DOUBLE) / 1000.0) AS display_value,
         |  CASE WHEN EXISTS (SELECT 1 FROM bl WHERE bl.user_id = sh.user_id
         |                    AND bl.s < sh.e AND bl.e > sh.s)
         |    THEN 'commercial' ELSE 'non-commercial' END AS display_label
         |FROM sh JOIN ln ON ln.user_id = sh.user_id
         |ORDER BY 1, 2, 3""".stripMargin
    },

    "e05_screen_share" ->
      s"""WITH w AS (
         |  SELECT ev.user_id % 20 AS show_key, ev.event_type,
         |    (ev.e - ev.s) * (CAST(round(x.value*100,0) AS BIGINT) % 100) AS wdur
         |  FROM (${evSql()}) ev JOIN events x ON x.event_id = ev.event_id
         |  WHERE ev.event_type IN ('click', 'view')),
         |g AS (SELECT show_key,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN wdur ELSE 0 END) AS BIGINT) AS m_raw,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN wdur ELSE 0 END) AS BIGINT) AS f_raw
         |  FROM w GROUP BY 1)
         |SELECT show_key,
         |  CAST(m_raw AS DOUBLE) * 100.0 / CAST(m_raw + f_raw AS DOUBLE) AS m_pct,
         |  CAST(f_raw AS DOUBLE) * 100.0 / CAST(m_raw + f_raw AS DOUBLE) AS f_pct,
         |  CAST(m_raw + f_raw AS DOUBLE) / 100.0 AS total_expected_sec
         |FROM g WHERE m_raw + f_raw > 0
         |ORDER BY m_pct, show_key""".stripMargin,

    "e03_screen_time" ->
      s"""SELECT event_type AS identity,
         |  CAST(sum((e - s) * (CAST(round(value*100,0) AS BIGINT) % 100)) AS DOUBLE) / 100.0 AS expected_sec,
         |  CAST(sum((CAST(round(value*100,0) AS BIGINT) % 100)
         |    * (100 - (CAST(round(value*100,0) AS BIGINT) % 100))
         |    * (e - s) * (e - s)) AS DOUBLE) / 10000.0 AS variance_sec2,
         |  CAST(count(*) AS BIGINT) AS n_spans
         |FROM (SELECT ev.*, x.value FROM (${evSql()}) ev
         |      JOIN events x ON x.event_id = ev.event_id) t
         |GROUP BY event_type ORDER BY identity""".stripMargin
  )
}
