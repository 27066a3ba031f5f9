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
    // start/end/gender from whitespace fields [2:5], centisecond
    // units) — the LIUM-style .seg line format built in-query from
    // event parameters (the m06 fixture-inverse pattern) and parsed
    // back with the REAL line discipline: comment filter, split,
    // positional fields. A field-offset or comment-handling bug
    // breaks the hash. Narrow per-row string ops, shuffle-free to
    // the sort.
    "s19_diarization_parse" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 86400
      val lines = raw.select(
        when(col("event_id") % 10 === 0,
          concat(lit(";; cluster spk"), (col("event_id") % 5).cast("string")))
          .otherwise(format_string("v%d 1 2 %d %d %s U U spk%d",
            col("user_id"), sec * 100,
            (sec + floor(col("value")).cast("long") + 1) * 100,
            when(col("event_id") % 2 === 0, "M").otherwise("F"),
            col("event_id") % 5))
          .as("line"))
      val f = split(col("line"), " ")
      lines.filter(!col("line").startsWith(";;"))
        .select(element_at(f, 1).as("video"),
          element_at(f, 4).cast("long").as("start_cs"),
          element_at(f, 5).cast("long").as("end_cs"),
          element_at(f, 6).as("gender"),
          element_at(f, 9).as("speaker"))
        .orderBy("video", "start_cs", "end_cs", "speaker", "gender")
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
        |ORDER BY video, start_cs, end_cs, speaker, gender""".stripMargin
  )
}
