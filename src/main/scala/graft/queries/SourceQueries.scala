package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Source/sink operator coverage (SURVEY §2.1): CSV round-trip with
  * schema inference, inline-row construction, regexp catalog ingest and
  * tokenizing ingest. Parquet scan (S2) backs every other query; the
  * streaming source family (S11) lives in graft.streaming + its spec. */
object SourceQueries {

  val queries: Map[String, QFn] = Map(
    // S3: pg COPY->CSV->Spark analogue (spark.py:34-40): write region to
    // CSV, read back with header + inferSchema
    "s03_csv_roundtrip" -> ((s, d) => {
      val t = tune(s)
      val tmp = s"/tmp/graft_csv_${d.replaceAll("[^0-9a-zA-Z]", "_")}"
      Tables.region(t, d).coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(tmp)
      t.read.option("header", "true").option("inferSchema", "true").csv(tmp)
        .select(col("r_regionkey").cast("int"), col("r_name"))
        .orderBy("r_regionkey")
    }),

    // S5: rows from in-memory values (createDataFrame, spark.py:42-48)
    "s05_inline_rows" -> ((s, d) => {
      val t = tune(s)
      import t.implicits._
      Seq((1L, "M", "male"), (2L, "F", "female"), (3L, "U", "unknown"))
        .toDF("id", "code", "name").orderBy("id")
    }),

    // S17: ORC round-trip — the columnar sibling of s03's CSV path
    // (same write->read->project shape, different on-disk format).
    // ORC carries the schema, so no inference step: the read-back
    // frame must be column- and type-identical to the parquet source.
    "s17_orc_roundtrip" -> ((s, d) => {
      val t = tune(s)
      val tmp = s"/tmp/graft_orc_${d.replaceAll("[^0-9a-zA-Z]", "_")}"
      Tables.nation(t, d).coalesce(1).write.mode("overwrite").orc(tmp)
      t.read.orc(tmp)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),

    // S18: JSON-lines round-trip (the reference ingests json metadata,
    // ingest.py:45-69): write a projection as JSONL, read back with
    // schema inference (keys come back alphabetical — the select
    // restores order), integer-cents aggregate on the round-tripped
    // doubles. Spark writes doubles shortest-round-trip, so the cents
    // scaling is bit-identical to reading the parquet directly — the
    // oracle aggregates the original table.
    "s18_jsonl_roundtrip" -> ((s, d) => {
      val t = tune(s)
      val tmp = s"/tmp/graft_jsonl_${d.replaceAll("[^0-9a-zA-Z]", "_")}"
      Tables.orders(t, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .coalesce(1).write.mode("overwrite").json(tmp)
      t.read.json(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_orderstatus")
    }),

    // S10: catalog ingest via path/name parsing (regexp_extract ->
    // dims, ingest.py:71-109): parse source label into numeric id
    "s10_catalog_parse" -> ((s, d) =>
      Tables.documents(tune(s), d)
        .select(col("doc_id"),
          regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num"))
        .groupBy(col("src_num")).agg(count(lit(1)).as("n_docs"))
        .orderBy("src_num")),

    // S13: caption/token ingest (srt -> rows; spacy_tokenize.py):
    // token stream with positions for a slice of the corpus
    "s13_tokenize_ingest" -> ((s, d) =>
      toks(s, d).filter(col("doc_id") < 20)
        .select("doc_id", "pos", "tok").orderBy("doc_id", "pos")),

    // S14b: VTT caption export (captions.py:106-119 get_vtt) — cue
    // formatting as a pure per-row expression; error-type events play
    // the caption track with props as text
    "s14_vtt_export" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      raw.filter(col("event_type") === "error")
        .select(col("user_id").as("video_id"), sec.as("s"),
          graft.result.CaptionExport.cue(sec,
            sec + floor(col("value")).cast("long") + 1,
            col("props")).as("cue"))
        .orderBy("video_id", "s", "cue")
    }),

    // S16: supercut clip assembly (supercut.py): phrase-hit intervals
    // padded by 2 s and merged per video
    "s16_supercut" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      val hits = raw
        .filter(col("event_type") === "error" && col("props").contains("7"))
        .select(col("user_id").as("video_id"), sec.as("s"),
          (sec + floor(col("value")).cast("long") + 1).as("e"))
      graft.result.CaptionExport.supercutClips(hits, 2)
        .orderBy("video_id", "s", "e")
    }),

    // S19: speaker-diarization segment parse (diarization.ipynb
    // `parse_segmentation`: skip ';;' comment lines, read
    // [start, end, gender] = line.split(' ')[2:5], centisecond
    // units) — the LIUM-style .seg line format built in-query from
    // event parameters (the m06 fixture-inverse pattern) and parsed
    // back with the REAL line discipline: comment filter, split,
    // 0-indexed positional fields 2/3/4 (element_at is 1-based, so
    // 3/4/5). The field the notebook names `end` is a DURATION —
    // `save_segmentation` computes max_frame=(start+end)*fps — so the
    // parse emits end_cs = start_cs + dur_cs, the same semantics in
    // centisecond integers (no float /100 * fps round-trip to drift
    // cross-engine). A field-offset, duration-vs-absolute or
    // comment-handling bug breaks the hash. Narrow per-row string
    // ops, shuffle-free to the sort.
    "s19_diarization_parse" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      val lines = raw.select(
        when(col("event_id") % 10 === 0,
          concat(lit(";; cluster spk"), (col("event_id") % 5).cast("string")))
          .otherwise(format_string("v%d 1 %d %d %s U spk%d",
            col("user_id"), sec * 100,
            (floor(col("value")).cast("long") + 1) * 100,
            when(col("event_id") % 2 === 0, "M").otherwise("F"),
            col("event_id") % 5))
          .as("line"))
      val f = split(col("line"), " ")
      lines.filter(!col("line").startsWith(";;"))
        .select(element_at(f, 1).as("video"),
          element_at(f, 3).cast("long").as("start_cs"),
          element_at(f, 4).cast("long").as("dur_cs"),
          element_at(f, 5).as("gender"),
          element_at(f, 7).as("speaker"))
        .select(col("video"), col("start_cs"),
          (col("start_cs") + col("dur_cs")).as("end_cs"),
          col("gender"), col("speaker"))
        .orderBy("video", "start_cs", "end_cs", "speaker", "gender")
    }),

    // S20: duplicate-video marking pass (duplicate_videos.ipynb cell
    // 4) — the maintenance job that populates the Video.duplicate
    // column SURVEY §1.1 carries: per channel, videos sharing the
    // same air time keep the FIRST and mark the rest duplicate=True
    // (the notebook's `vs[1:]` after order_by('time'); within a tied
    // (channel, time) group Python list order is DB order, so lowest
    // video_id is the deterministic stand-in). Video plane := orders
    // (video_id = o_orderkey, channel = custkey residue, time =
    // o_orderdate — dates repeat heavily, so tied groups are real).
    // ONE window over the (channel, time) partition — a single
    // shuffle on the dedup key; at 100 TB this is the st03/a07
    // first-per-group shape, no driver loop over channels (the
    // notebook iterates channels in Python; the partition key IS the
    // channel loop).
    "s20_duplicate_videos" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(tune(s), d)
        .select(col("o_orderkey").as("video_id"),
          concat(lit("ch"), (col("o_custkey") % 5).cast("string"))
            .as("channel"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("vtime"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("channel"), col("vtime"))
            .orderBy(col("video_id"))))
        .select(col("video_id"), col("channel"), col("vtime"),
          (col("rn") > 1).cast("int").as("duplicate"))
        .orderBy("channel", "vtime", "video_id")
    }),

    // S21: labeled-annotation TSV ingest
    // (ingest_interview_annotations.py:1-260) — the named-interviews
    // table's full line discipline, s19's sibling: TAB-separated rows
    // `video_id \t name \t default_names \t interview_string...`,
    // parsed with the REAL rules: the nested "interviewer, guest"
    // default split (', '); the optional "clips of " /
    // "(originally from a different show) " prefixes (scattered_clips
    // / original flags); the `interviewer1[, interviewer2] *
    // guest1[, guest2]` name clause split on '*' then ',' with
    // per-name strip (and the reference's bare-'interviewer'
    // discard); name overrides applied over row defaults exactly as
    // parse_named_interview_row does; and the variable-width
    // `[[hh:]m]m:ss-[[hh:]m]m:ss` time range (3-unit vs 2-unit colon
    // split). The fixture builds every variant from event parameters
    // (the m06/s19 fixture-inverse pattern) and the oracle computes
    // the expected LabeledInterview rows closed-form — the parse must
    // exactly invert the generation or the hash breaks. Narrow
    // per-row string expressions, shuffle-free to the sort.
    "s21_interview_tsv_parse" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      val stS = sec % 7200
      val enS = stS + floor(col("value")).cast("long") + 1
      def fmtT(t: org.apache.spark.sql.Column) =
        when(t >= 3600, format_string("%d:%02d:%02d",
            floor(t / 3600).cast("long"),
            floor((t % 3600) / 60).cast("long"), (t % 60).cast("long")))
          .otherwise(format_string("%d:%02d",
            floor(t / 60).cast("long"), (t % 60).cast("long")))
      val k = (col("user_id") % 7).cast("string")
      val namepart = when(col("event_id") % 4 === 0, lit(""))
        .when(col("event_id") % 4 === 1, concat(lit("guest"), k, lit(" ")))
        .when(col("event_id") % 4 === 2,
          concat(lit("host"), k, lit(" * guest"), k, lit(" ")))
        .otherwise(concat(lit("host"), k, lit(", cohost"), k,
          lit(" * guest"), k, lit(", friend"), k, lit(" ")))
      val prefix = when(col("event_id") % 5 === 0, lit("clips of "))
        .when(col("event_id") % 5 === 1,
          lit("(originally from a different show) "))
        .otherwise(lit(""))
      val defaults = when(col("user_id") % 3 === 0, lit("none"))
        .otherwise(concat(lit("anchor"), k, lit(", visitor"), k))
      val lines = raw
        .select(format_string("%d\tshow_%d\t%s\t%s",
        col("user_id"), col("user_id"), defaults,
        concat(prefix, namepart, lit("int "), fmtT(stS), lit("-"), fmtT(enS)))
        .as("line"))
      // ---- the parse (reference rules, expression-for-expression) —
      val f = split(col("line"), "\t")
      val defs = element_at(f, 3)
      val defInt = when(defs === "none", lit(null).cast("string"))
        .otherwise(trim(element_at(split(defs, ", "), 1)))
      val defGuest = when(defs === "none", lit(null).cast("string"))
        .otherwise(trim(element_at(split(defs, ", "), 2)))
      val istr0 = element_at(f, 4)
      val CLIPS = "clips of"
      val UNORIG = "(originally from a different show) "
      val scat = istr0.startsWith(CLIPS)
      val s1 = when(scat, trim(substring(istr0, CLIPS.length + 1, 1 << 20)))
        .otherwise(istr0)
      val unorig = s1.startsWith(UNORIG)
      val s2 = when(unorig, substring(s1, UNORIG.length + 1, 1 << 20))
        .otherwise(s1)
      val isPlain = s2.startsWith("int ")
      val nameStr = element_at(split(s2, " int "), 1)
      val timeRange = when(isPlain, substring(s2, 5, 1 << 20))
        .otherwise(element_at(split(s2, " int "), 2))
      val hasStar = nameStr.contains("*")
      val ivrs = split(element_at(split(nameStr, "\\*"), 1), ",")
      val i1one = trim(element_at(ivrs, 1))
      val iv1 = when(!hasStar, lit(null).cast("string"))
        .when(size(ivrs) === 2, trim(element_at(ivrs, 1)))
        .otherwise(when(i1one === "interviewer", lit(null).cast("string"))
          .otherwise(i1one))
      val iv2 = when(hasStar && size(ivrs) === 2 && iv1.isNotNull,
        trim(element_at(ivrs, 2)))
      val gs = split(element_at(split(nameStr, "\\*"), 2), ",")
      val g1 = when(isPlain, lit(null).cast("string"))
        .when(hasStar, trim(element_at(gs, 1)))
        .otherwise(trim(nameStr))
      val g2 = when(hasStar && size(gs) === 2, trim(element_at(gs, 2)))
      def toSec(x: org.apache.spark.sql.Column) = {
        val u = split(x, ":")
        when(size(u) === 3,
          element_at(u, 1).cast("long") * 3600 +
            element_at(u, 2).cast("long") * 60 +
            element_at(u, 3).cast("long"))
          .otherwise(element_at(u, 1).cast("long") * 60 +
            element_at(u, 2).cast("long"))
      }
      val tr = split(timeRange, "-")
      lines.select(element_at(f, 1).cast("long").as("video_id"),
          coalesce(iv1, defInt).as("interviewer1"),
          iv2.as("interviewer2"),
          coalesce(g1, defGuest).as("guest1"),
          g2.as("guest2"),
          toSec(element_at(tr, 1)).as("start_s"),
          toSec(element_at(tr, 2)).as("end_s"),
          (!(scat || unorig)).cast("int").as("original"),
          scat.cast("int").as("scattered"))
        // r21: materialize the parse ONCE directly below the final
        // range sort. The sort keys are PARSED columns (unlike s22's
        // input-column key), so the parse cannot move above the sort;
        // without this shuffle stage the range partitioner's sampling
        // pass re-executes the entire build+parse subtree a second
        // time (guide §1.4/§7.2: the sampling job runs the exchange's
        // child in full). One extra hash exchange of the parsed rows
        // (~60 B/row) buys back a whole corpus-sized expression pass —
        // the right trade at any scale where the parse dominates the
        // row width, which a format/regexp/split tree always does.
        .repartition(col("video_id"))
        .orderBy("video_id", "start_s", "end_s", "guest1", "interviewer1",
          "original", "scattered")
    }),

    // S22: video-path show/channel re-parse (update_show.py:4-12) —
    // the catalog maintenance pass that re-derives channel, air time
    // and show name from the video FILENAME with the reference's
    // literal path rules: basename split on '_'; parts[:3] =
    // [channel, yyyyMMdd, HHmmss] parsed as a datetime; a trailing
    // 'W' stripped from the channel (the west-coast feed suffix:
    // CNNW -> CNN); show = parts[3:-1] joined with spaces when the
    // LAST part is the literal 'segment', else parts[3:] — including
    // the degenerate '<channel>_<date>_<time>_segment' path whose
    // show name is the EMPTY string (parts[3:-1] = []). Paths are
    // built fixture-inverse from order parameters (the s19/s21
    // pattern) and the oracle computes the expected rows closed-form,
    // so a W-strip, '_segment', field-offset or datetime-format bug
    // breaks the hash. Narrow per-row string ops, shuffle-free to
    // the sort.
    "s22_show_path_parse" -> ((s, d) => {
      val chan = element_at(
        array(lit("CNN"), lit("CNNW"), lit("FOXNEWSW"), lit("MSNBC"),
          lit("KNTVW")),
        (col("o_custkey") % 5 + 1).cast("int"))
      val hh = format_string("%02d", col("o_orderkey") % 24)
      val mm = format_string("%02d", col("o_orderkey") % 60)
      val ss = format_string("%02d", (col("o_orderkey") * 7) % 60)
      val showPart = when(col("o_orderkey") % 4 === 0, lit("situation_room"))
        .when(col("o_orderkey") % 4 === 1, lit("hardball"))
        .when(col("o_orderkey") % 4 === 2, lit("news_hour_segment"))
        .otherwise(lit("segment"))
      // NOTE (r21): an `orderBy` BEFORE the heavy projections was
      // tried (the sort key is the input column o_orderkey) and
      // Catalyst's EliminateSorts erased it — the lower sort is
      // provably redundant under the final one, so that rewrite
      // cannot stick; an input repartition was also tried and dropped
      // (the parallelism gain is a local single-file-split artifact,
      // the same verdict PlanAuditSpec enforces on a14's fold).
      val paths = Tables.orders(tune(s), d)
        .select(col("o_orderkey").as("video_id"),
          format_string("/tvnews/videos/%s_%s_%s%s%s_%s.mp4",
            chan, date_format(col("o_orderdate"), "yyyyMMdd"),
            hh, mm, ss, showPart).as("path"))
      // ---- the parse (update_show.py rules, op-for-op) ----
      val base = regexp_extract(col("path"), "([^/]+)\\.[^.]*$", 1)
      val parts = split(base, "_")
      val ch0 = element_at(parts, 1)
      val ch = when(ch0.endsWith("W"),
        ch0.substr(lit(1), length(ch0) - 1)).otherwise(ch0)
      val dt = to_timestamp(
        concat(element_at(parts, 2), lit(" "), element_at(parts, 3)),
        "yyyyMMdd HHmmss")
      val isSeg = element_at(parts, -1) === "segment"
      val showName = when(isSeg,
          array_join(slice(parts, lit(4), size(parts) - 4), " "))
        .otherwise(array_join(slice(parts, lit(4), size(parts) - 3), " "))
      paths.select(col("video_id"), ch.as("channel"),
          date_format(dt, "yyyy-MM-dd HH:mm:ss").as("air_ts"),
          showName.as("show_name"))
        // r21: materialize the parse ONCE below the final range sort —
        // without this stage the range partitioner's sampling pass
        // re-executes the whole build+parse subtree (see s21; same
        // narrow-rows-for-wide-recompute trade)
        .repartition(col("video_id"))
        .orderBy("video_id")
    }),

    // S23: per-track frame-range refresh (update_tracks.py:3-11) —
    // the maintenance pass that recomputes PersonTrack.min_frame /
    // max_frame as min/max over the track's member faces' frame
    // numbers, restricted to tagged videos
    // (filter(video__videotag__tag__name='pose-test')), SKIPPING
    // tracks with no faces (the loop's `continue` == inner join).
    // Track := order (tag filter = e29's custkey residue), member
    // faces := its lineitems, frame number := l_partkey. Scale: the
    // min/max aggregate runs map-side-partial on the fact plane
    // BEFORE the join, and the join ships only the P-row aggregate —
    // the reference loops tracks in Python with one query per track;
    // here the groupBy key IS that loop.
    "s23_track_minmax_refresh" -> ((s, d) => {
      val t = tune(s)
      val tracks = Tables.orders(t, d)
        .filter(col("o_custkey") % 100 === 17)
        .select(col("o_orderkey").as("track_id"),
          col("o_custkey").as("video_id"))
      val frames = Tables.lineitem(t, d)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_partkey")).as("min_frame"),
          max(col("l_partkey")).as("max_frame"))
      tracks.join(frames, col("track_id") === col("l_orderkey"))
        .select("track_id", "video_id", "min_frame", "max_frame")
        .orderBy("track_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "s03_csv_roundtrip" ->
      "SELECT CAST(r_regionkey AS INT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "s05_inline_rows" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'M', 'male'),
        |  (CAST(2 AS BIGINT), 'F', 'female'),
        |  (CAST(3 AS BIGINT), 'U', 'unknown')) t(id, code, name)
        |ORDER BY id""".stripMargin,

    "s17_orc_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "s18_jsonl_roundtrip" ->
      s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${Q.centsSql("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "s10_catalog_parse" ->
      """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY src_num""".stripMargin,

    "s13_tokenize_ingest" ->
      s"""SELECT doc_id, CAST(pos AS INT) AS pos, tok FROM (${Q.toksSql}) t
         |WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin,

    "s14_vtt_export" ->
      """SELECT user_id AS video_id, s,
        |  printf('%02d:%02d:%02d.000 --> %02d:%02d:%02d.000',
        |    s//3600, (s%3600)//60, s%60, e//3600, (e%3600)//60, e%60)
        |    || chr(10) || props AS cue
        |FROM (SELECT user_id, props, (epoch_ns(ts)//1000000000) % 86400 AS s,
        |        (epoch_ns(ts)//1000000000) % 86400 + CAST(floor(value) AS BIGINT) + 1 AS e
        |      FROM events WHERE event_type = 'error') c
        |ORDER BY 1, 2, 3""".stripMargin,

    "s16_supercut" -> {
      val hitsSql =
        """SELECT user_id, greatest(s - 2, 0) AS s, e + 2 AS e
          |FROM (SELECT user_id, (epoch_ns(ts)//1000000000) % 86400 AS s,
          |        (epoch_ns(ts)//1000000000) % 86400 + CAST(floor(value) AS BIGINT) + 1 AS e
          |      FROM events WHERE event_type = 'error' AND props LIKE '%7%') h""".stripMargin
      s"""SELECT user_id AS video_id, s, e FROM (${Q.coalesceSql(hitsSql)}) cc
         |ORDER BY 1, 2, 3""".stripMargin
    },

    // s19: the parse output closed-form from the same event
    // parameters, comment lines (event_id % 10 = 0) excluded
    "s19_diarization_parse" ->
      """SELECT 'v' || CAST(user_id AS VARCHAR) AS video,
        |  ((epoch_ns(ts)//1000000000) % 86400) * 100 AS start_cs,
        |  ((epoch_ns(ts)//1000000000) % 86400
        |    + CAST(floor(value) AS BIGINT) + 1) * 100 AS end_cs,
        |  CASE WHEN event_id % 2 = 0 THEN 'M' ELSE 'F' END AS gender,
        |  'spk' || CAST(event_id % 5 AS VARCHAR) AS speaker
        |FROM events WHERE event_id % 10 <> 0
        |ORDER BY video, start_cs, end_cs, speaker, gender""".stripMargin,

    // s20: first-per-(channel, time) keeps duplicate=0, later video
    // ids in the tied group get 1 — the notebook's vs[1:] marking
    "s20_duplicate_videos" ->
      """SELECT o_orderkey AS video_id,
        |  'ch' || CAST(o_custkey % 5 AS VARCHAR) AS channel,
        |  strftime(o_orderdate, '%Y-%m-%d') AS vtime,
        |  CAST(CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey % 5, o_orderdate
        |      ORDER BY o_orderkey) > 1 THEN 1 ELSE 0 END AS INT) AS duplicate
        |FROM orders
        |ORDER BY channel, vtime, video_id""".stripMargin,

    // s21: the expected LabeledInterview rows closed-form from the
    // same event parameters the fixture generator used — name
    // overrides over row defaults, prefix flags, and the start/dur
    // time range; the Spark side must invert its own generated lines
    // through the reference's parse rules to reproduce this
    "s21_interview_tsv_parse" ->
      """WITH p AS (SELECT user_id,
        |    event_id % 4 AS nm, event_id % 5 AS pf,
        |    CAST(user_id % 7 AS VARCHAR) AS k, user_id % 3 AS d3,
        |    (epoch_ns(ts)//1000000000) % 86400 % 7200 AS st,
        |    (epoch_ns(ts)//1000000000) % 86400 % 7200
        |      + CAST(floor(value) AS BIGINT) + 1 AS en
        |  FROM events)
        |SELECT user_id AS video_id,
        |  CASE WHEN nm IN (2, 3) THEN 'host' || k
        |       WHEN d3 <> 0 THEN 'anchor' || k END AS interviewer1,
        |  CASE WHEN nm = 3 THEN 'cohost' || k END AS interviewer2,
        |  CASE WHEN nm IN (1, 2, 3) THEN 'guest' || k
        |       WHEN d3 <> 0 THEN 'visitor' || k END AS guest1,
        |  CASE WHEN nm = 3 THEN 'friend' || k END AS guest2,
        |  st AS start_s, en AS end_s,
        |  CAST(CASE WHEN pf IN (0, 1) THEN 0 ELSE 1 END AS INT) AS original,
        |  CAST(CASE WHEN pf = 0 THEN 1 ELSE 0 END AS INT) AS scattered
        |FROM p
        |ORDER BY video_id, start_s, end_s, guest1, interviewer1,
        |  original, scattered""".stripMargin,

    // s22: expected (channel, air time, show) closed-form from the
    // same order parameters the path generator used — W-strip and
    // '_segment' rules applied by hand, including the empty show name
    "s22_show_path_parse" ->
      """SELECT o_orderkey AS video_id,
        |  CASE o_custkey % 5 WHEN 0 THEN 'CNN' WHEN 1 THEN 'CNN'
        |    WHEN 2 THEN 'FOXNEWS' WHEN 3 THEN 'MSNBC'
        |    ELSE 'KNTV' END AS channel,
        |  strftime(o_orderdate, '%Y-%m-%d') || ' ' ||
        |    printf('%02d:%02d:%02d', o_orderkey % 24, o_orderkey % 60,
        |      (o_orderkey * 7) % 60) AS air_ts,
        |  CASE o_orderkey % 4 WHEN 0 THEN 'situation room'
        |    WHEN 1 THEN 'hardball' WHEN 2 THEN 'news hour'
        |    ELSE '' END AS show_name
        |FROM orders
        |ORDER BY video_id""".stripMargin,

    // s23: the per-track min/max refresh as one aggregate+join — the
    // inner join IS the reference's zero-face `continue`
    "s23_track_minmax_refresh" ->
      """SELECT o_orderkey AS track_id, o_custkey AS video_id,
        |  min_frame, max_frame
        |FROM orders
        |JOIN (SELECT l_orderkey, min(l_partkey) AS min_frame,
        |        max(l_partkey) AS max_frame
        |      FROM lineitem GROUP BY 1) f ON o_orderkey = l_orderkey
        |WHERE o_custkey % 100 = 17
        |ORDER BY track_id""".stripMargin
  )
}
