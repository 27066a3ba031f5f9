package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Shared helpers for the query corpus.
  *
  * Every oracle-checked query must be *integer-exact* across engines:
  * the driver hash-compares our parquet against DuckDB's result, and
  * cross-engine floating-point summation order differs. So money-ish
  * doubles (2-decimal) are scaled to cents as longs BEFORE aggregation,
  * and any double in an output is produced by an expression tree written
  * op-for-op identically in the Spark code and the oracle SQL (per-row
  * IEEE arithmetic is deterministic; only reassociated sums are not).
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  /** Spark sessions the driver hands us may lack configs we rely on;
    * apply them idempotently at query entry. */
  def tune(s: SparkSession): SparkSession = {
    // events.ts dtype has drifted across testdata generations (int64
    // TIMESTAMP(NANOS) vs timestamp[us]); this conf only affects the
    // NANOS generation (read as long instead of rejecting the file),
    // and Fns.tsSec then branches on whichever dtype actually arrived.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.GraftFunctions.register(s)
    graft.plans.AutoBand.install(s)
    // auto-banding is per-query opt-in: every query passes through tune
    // at build time, so a width set by one query (x05) never leaks into
    // the next query's execution
    s.conf.set("spark.graft.autoband.width", "0")
    s
  }

  /** 2-decimal double -> exact cents as long. Positive values round
    * identically under Spark HALF_UP and DuckDB half-away-from-zero. */
  def cents(c: Column): Column = round(c * 100).cast("long")
  /** SQL mirror of [[cents]]. */
  def centsSql(x: String): String = s"CAST(round(($x)*100,0) AS BIGINT)"

  /** Exact integer-valued double -> long (l_quantity is integral). */
  def asLong(c: Column): Column = c.cast("long")

  /** Epoch seconds from events.ts, dtype-adaptive (see Fns.tsSec — the
    * driver has shipped this column as both int64 nanos and
    * timestamp[us]; assuming either crashes the other generation). */
  def tsSec(df: DataFrame): Column = graft.functions.Fns.tsSec(df)

  /** Global 1-based ordinal over a UNIQUE `ordCol` without a
    * single-partition sort: Packing's two-phase running offset
    * (range-partition, per-partition cumsum, P-row offset table) with
    * weight 1. For the reference's UNCAPPED `[::k]` strides — a bare
    * `row_number() over (order by ..)` window puts the whole corpus
    * in one task; this is bit-identical (PackingSpec pins the
    * machinery) and every partition sorts only its own range. Capped
    * strides (`[:K:k]`) don't need it: `orderBy(ord).limit(K)` is a
    * distributed top-K and the follow-up window is K-bounded. */
  def globalRn(df: DataFrame, ordCol: String, outCol: String): DataFrame = {
    require(!df.columns.contains("__one"),
      "globalRn: input already has a column named '__one'")
    graft.text.Packing.withRunningOffset(
        df.withColumn("__one", lit(1L)), ordCol, "__one", outCol)
      .withColumn(outCol, col(outCol) + lit(1L))
      .drop("__one")
  }

  /** [[globalRn]] under a composite total order (e14's `cos DESC,
    * vec_id` knn rank). */
  def globalRn(df: DataFrame, ordCols: Seq[Column], outCol: String): DataFrame = {
    require(!df.columns.contains("__one"),
      "globalRn: input already has a column named '__one'")
    graft.text.Packing.withRunningOffsetOrdered(
        df.withColumn("__one", lit(1L)), ordCols, "__one", outCol)
      .withColumn(outCol, col(outCol) + lit(1L))
      .drop("__one")
  }

  /** The ph rows that run IN-PROCESS over the documents/token tables —
    * the only ph rows a table-layout change can affect, so the only
    * ones the layout sweep and audit run (r21, VERDICT r20 nit #1:
    * the whole family was previously excluded without an audit).
    * Every other ph row serves from the persisted index (including
    * ph28/ph35, whose side table reads ride behind an index serve that
    * would trigger a rebuild keyed on the `catalog:` dir string). */
  val layoutInProcessPh: Set[String] = Set(
    "ph01_phrase_hits", "ph02_boolean_search", "ph03_phrase_segments",
    "ph04_bm25_topk", "ph05_near_search", "ph12_hybrid_fusion")

  /** Queries whose SERVE path reads a persisted index layout, not the
    * catalog tables — running them against a `catalog:` dir would
    * measure a pointless index rebuild keyed on the dir string, so the
    * layout sweep (Bench) and the layout audit (LayoutAudit) skip
    * them. One list, two consumers. (The ph family is handled by
    * [[layoutInProcessPh]] — a whitelist is tighter than enumerating
    * its 42 served rows here.) */
  val layoutIdxBacked: Set[String] = Set(
    "e13_caption_search", "e22_served_stories", "e38_entity_mentions",
    "x07_cross_plane_takedown", "x08_cross_plane_reencode",
    "x09_served_hybrid",
    "v29_ivf_served", "v30_ivf_appended", "v31_ivf_compacted",
    "v32_ivf_deleted", "v33_ivf_reclaimed", "v34_ivf_upserted",
    "v35_ivf_merged", "v36_ivf_asof", "v37_ivf_asof_stale",
    "v38_ivf_audit", "v39_ivf_rollback", "v40_ivf_refreshed",
    "v41_ivf_filtered", "v42_radius_search", "v43_ivf_vacuumed",
    "v44_ivf_snapshot_diff", "v45_ivf_two_stage", "v46_two_stage_recall",
    "v47_ivf_manifest", "v48_ivf_pq_served")

  // -------------------------------------------------------------------
  // Derived interval collection from `events`: one interval per event,
  // [epoch_sec(ts), epoch_sec(ts) + floor(value) + 1), keyed by user.
  // -------------------------------------------------------------------
  // Starts are wrapped into one day (% 86400) so per-user intervals
  // actually overlap at test scale — the raw timestamps span a year and
  // would make every interval op trivially empty.
  def ev(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(tune(s), dir)
    val sec = tsSec(raw) % 86400
    raw.select(
      col("event_id"), col("user_id"), col("event_type"),
      sec.as("s"),
      (sec + floor(col("value")).cast("long") + 1).as("e"))
  }

  /** DuckDB mirror of [[ev]], optionally filtered by event type. */
  def evSql(typ: String = null): String = {
    val w = if (typ == null) "" else s" WHERE event_type = '$typ'"
    "SELECT event_id, user_id, event_type, " +
      "(epoch_ns(ts)//1000000000) % 86400 AS s, " +
      "(epoch_ns(ts)//1000000000) % 86400 + CAST(floor(value) AS BIGINT) + 1 AS e " +
      s"FROM events$w"
  }

  def evTyped(s: SparkSession, dir: String, typ: String): DataFrame =
    ev(s, dir).filter(col("event_type") === typ)

  /** DuckDB island-pattern coalesce of [[evSql]] intervals (mirror of
    * IntervalOps.coalesce): merge overlapping-or-touching, close gaps
    * <= gap. Emits a CTE body selecting (key, s, e[, extraAggs]) —
    * `extraAggs` mirrors coalesce's payloadAggs (e.g.
    * ", count(*) AS n_hits"). */
  def coalesceSql(src: String, gap: Long = 0, key: String = "user_id",
                  extraAggs: String = ""): String =
    s"""SELECT $key, min(s) AS s, max(e) AS e$extraAggs FROM (
       |  SELECT $key, s, e, CAST(sum(isnew) OVER (PARTITION BY $key ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp FROM (
       |    SELECT $key, s, e, CASE WHEN runmax IS NULL OR s > runmax + $gap THEN 1 ELSE 0 END AS isnew FROM (
       |      SELECT $key, s, e, max(e) OVER (PARTITION BY $key ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
       |      FROM ($src) iv) m) g) gg
       |GROUP BY $key, grp""".stripMargin

  // -------------------------------------------------------------------
  // Derived bounding boxes from lineitem (deterministic, both engines):
  // frame = l_orderkey, box id = l_linenumber. Exercises the reference's
  // face/bbox spatial surface on the driver's tables.
  // -------------------------------------------------------------------
  def boxes(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(tune(s), dir).select(
      col("l_orderkey").as("frame_id"), col("l_linenumber").as("box_id"),
      ((col("l_partkey") % 60).cast("double") / 100.0).as("x1"),
      ((col("l_partkey") % 60).cast("double") / 100.0 +
        (lit(10) + col("l_suppkey") % 20).cast("double") / 100.0).as("x2"),
      ((col("l_partkey") % 37).cast("double") / 100.0).as("y1"),
      ((col("l_partkey") % 37).cast("double") / 100.0 +
        (lit(10) + col("l_quantity").cast("long") % 25).cast("double") / 100.0).as("y2"))

  val boxesSql: String =
    """SELECT l_orderkey AS frame_id, l_linenumber AS box_id,
      |  (l_partkey % 60) / 100.0 AS x1,
      |  (l_partkey % 60) / 100.0 + (10 + l_suppkey % 20) / 100.0 AS x2,
      |  (l_partkey % 37) / 100.0 AS y1,
      |  (l_partkey % 37) / 100.0 + (10 + CAST(l_quantity AS BIGINT) % 25) / 100.0 AS y2
      |FROM lineitem""".stripMargin

  // -------------------------------------------------------------------
  // Token table over `documents` (caption/token surface). Token and
  // shingle ids in the dedup queries come from the cross-engine rolling
  // hash (TextOps.fingerprint) — no dictionary build; the dense-id
  // dictionary path lives in TextOps.dict for callers that need it.
  // -------------------------------------------------------------------
  def toks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(tune(s), dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))

  val toksSql: String =
    """SELECT doc_id, u.z[2] AS pos, u.z[1] AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t,
      |  unnest(list_zip(t.l, generate_series(0, len(t.l)-1))) AS u(z)""".stripMargin

  // -------------------------------------------------------------------
  // Scratch dirs for queries that exercise a build/serve or sink path
  // (streaming parity, served indexes). One retained dir per tag per
  // JVM: the PREVIOUS execution's tree is deleted when the same tag
  // runs again — harness samples run sequentially, so the prior
  // sample's lazy action has completed by then, and /tmp usage stays
  // bounded at one artifact per query instead of growing per sample.
  // -------------------------------------------------------------------
  private val priorBase =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** Delete a directory tree (no-op if absent). */
  def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      val all =
        try { import scala.jdk.CollectionConverters._; walk.iterator().asScala.toSeq }
        finally walk.close()
      all.reverse.foreach(java.nio.file.Files.delete)
    }

  /** [[rmTree]] that never propagates: a straggler file handle on the
    * PREVIOUS sample's tree must not fail the UNRELATED current query
    * it happens to be cleaned up inside. The leftover dir is retried
    * by the JVM-exit sweep below. */
  private def rmTreeQuiet(p: java.nio.file.Path): Unit =
    try rmTree(p)
    catch { case e: java.io.IOException =>
      System.err.println(s"[graft] deferred cleanup of $p: ${e.getMessage}")
    }

  // last-retained dirs (one per freshBase tag + every memoized index)
  // are swept at JVM exit so a bench/verify run leaves /tmp clean
  private val exitSweep =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    exitSweep.asScala.foreach(rmTreeQuiet)
  }))

  /** CONTRACT: per-tag samples run strictly sequentially (the harness
    * and Bench both do) — the previous tree is deleted only when the
    * SAME tag runs again, by which point its lazy action has finished.
    * Concurrent runs of one tag would need per-run dirs instead. */
  def freshBase(tag: String): java.nio.file.Path = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_${tag}_")
    exitSweep.add(base)
    Option(priorBase.put(tag, base)).foreach { old =>
      exitSweep.remove(old); rmTreeQuiet(old)
    }
    base
  }

  // -------------------------------------------------------------------
  // Memoized index builds (build/serve split): a served-index query
  // measures SERVE latency — the property the persisted layout exists
  // to provide — so the (expensive, run-once-per-corpus) build must
  // not re-run inside every timed sample. One build per (tag, input
  // dir) per JVM; the build's own wall time is recorded so Bench can
  // report it as a separate field instead of folding it into the
  // serve numbers. Keyed by input dir so sf0.001 smoke / sf0.01
  // verify / sf0.1 bench runs never share an index.
  // -------------------------------------------------------------------
  private val builtIdx =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Double]()

  /** First call per (tag, input) creates a temp dir and runs `build`
    * into it (timed); later calls return the same dir untouched. */
  def memoIndex(tag: String, input: String)(build: String => Unit): String =
    builtIdx.computeIfAbsent((tag, input), { _ =>
      val base = java.nio.file.Files.createTempDirectory(s"graft_idx_${tag}_")
      exitSweep.add(base)
      val dir = base.resolve("idx").toString
      val t0 = System.nanoTime()
      build(dir)
      buildSecs.merge((tag, input), (System.nanoTime() - t0) / 1e9,
        (a, b) => math.min(a, b))
      dir
    })

  /** tag -> seconds of the one-time index build this JVM ran for
    * `input`. Keyed by (tag, input) like the memo itself, filtered to
    * the caller's corpus: if the same JVM also built a tag for a
    * different SF dir (smoke at sf0.001 before a bench at sf0.1),
    * that other corpus's build time must not be reported here. */
  def indexBuildSecs(input: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.collect { case ((t, i), s) if i == input => (t, s) }.toMap
  }
}
