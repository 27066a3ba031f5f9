package graft.result

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols

/** Caption export + supercut composition (SURVEY §3.3 presentation
  * tail; reference app/esper/captions.py:106-119 get_vtt/get_json and
  * app/esper/supercut.py clip assembly). Cue formatting is a pure
  * expression (per-row, codegen'd, oracle-checkable); only the final
  * document assembly collects a single string per call, like
  * WidgetJson. */
object CaptionExport {

  private val C = Cols("video_id", "s", "e")

  /** `hh:mm:ss.000` VTT timestamp from integer seconds (exact integer
    * div/mod — no float time arithmetic). */
  def vttTime(sec: Column): Column =
    format_string("%02d:%02d:%02d.000",
      call_function("div", sec, lit(3600L)),
      call_function("div", pmod(sec, lit(3600L)), lit(60L)),
      pmod(sec, lit(60L)))

  /** One WEBVTT cue: `start --> end\ntext`. */
  def cue(s: Column, e: Column, text: Column): Column =
    concat(vttTime(s), lit(" --> "), vttTime(e), lit("\n"), text)

  /** `hh:mm:ss.mmm` VTT timestamp from integer MILLISECONDS — the
    * resolution the per-word aligned-transcript export needs
    * (word-level SRT dumps of transcript_alignment.py carry sub-second
    * times; integer div/mod keeps it cross-engine exact). */
  def vttTimeMs(ms: Column): Column =
    format_string("%02d:%02d:%02d.%03d",
      call_function("div", ms, lit(3600000L)),
      call_function("div", pmod(ms, lit(3600000L)), lit(60000L)),
      call_function("div", pmod(ms, lit(60000L)), lit(1000L)),
      pmod(ms, lit(1000L)))

  /** One WEBVTT cue with millisecond-resolution endpoints. */
  def cueMs(s: Column, e: Column, text: Column): Column =
    concat(vttTimeMs(s), lit(" --> "), vttTimeMs(e), lit("\n"), text)

  /** Full WEBVTT document over caption rows (video_id, s, e, text):
    * cues sorted by (s, e), double-newline separated. */
  def toVtt(captions: DataFrame): String = {
    val body = captions
      .select(struct(col("s"), col("e"),
        cue(col("s"), col("e"), col("text")).as("c")).as("sc"))
      .agg(array_join(
        transform(sort_array(collect_list(col("sc"))), x => x.getField("c")),
        "\n\n").as("body"))
      .head().getAs[String]("body")
    "WEBVTT\n\n" + body
  }

  /** JSON caption track: sorted `[{s, e, text}, ...]`
    * (captions.py get_json). */
  def toJsonTrack(captions: DataFrame): String =
    captions
      .select(struct(col("s"), col("e"), col("text")).as("sc"))
      .agg(to_json(sort_array(collect_list(col("sc")))).as("j"))
      .head().getAs[String]("j")

  /** Supercut clip list (supercut.py): pad every phrase-hit interval by
    * `pad` seconds (floored at 0) and merge overlapping clips per
    * video. Input/output: (video_id, s, e). */
  def supercutClips(hits: DataFrame, pad: Long): DataFrame =
    IntervalOps.coalesce(
      IntervalOps.dilate(hits.select("video_id", "s", "e"), pad, C,
        clampAtZero = true), C)

  /** Per-video VTT documents as a DataFrame (video_id, vtt) — the
    * distributed form of [[toVtt]]: each video's cues sort inside that
    * video's collect_list (a per-group array, never a global collect),
    * so document assembly shards across executors. */
  def vttDocs(captions: DataFrame): DataFrame =
    captions
      .select(col("video_id"), struct(col("s"), col("e"),
        cue(col("s"), col("e"), col("text")).as("c")).as("sc"))
      .groupBy(col("video_id"))
      .agg(concat(lit("WEBVTT\n\n"), array_join(
        transform(sort_array(collect_list(col("sc"))), x => x.getField("c")),
        "\n\n")).as("vtt"))

  /** SHARDED corpus export — the 100 TB form of the caption/supercut
    * tail: [[vttDocs]] written as a (video_id, vtt) table across
    * however many files the data warrants. [[toVtt]]'s single string
    * and the parity queries' one-file-per-micro-batch sinks are
    * presentation/compare scaffolding (one widget document, a
    * deterministic file set for hashing); a real corpus-scale export
    * never funnels through one task. `shards <= 0` keeps the natural
    * partitioning (AQE coalesces small outputs); a positive value pins
    * the output file count (e.g. to match a downstream consumer's
    * reader parallelism). */
  def writeVttSharded(captions: DataFrame, outDir: String,
                      shards: Int = 0): Unit = {
    val docs = vttDocs(captions)
    val out = if (shards > 0) docs.repartition(shards) else docs
    out.write.mode("overwrite").parquet(outDir)
  }
}
