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
      val sec = expr("(ts div 1000000000) % 86400")
      val caps = graft.sources.Tables.events(tune(s), d)
        .filter(col("event_type") === "error")
        .select(col("user_id").as("video_id"), sec.as("s"),
          (sec + floor(col("value")).cast("long") + 1).as("e"),
          col("props").as("text"))
      EsperQueries.commercials(black, caps, minLen = 5, maxCommercial = 600)
        .orderBy("video_id", "s", "e")
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
