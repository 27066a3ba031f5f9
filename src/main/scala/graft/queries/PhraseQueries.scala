package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.PhraseSearch
import Q._

/** Caption phrase/boolean search coverage (SURVEY §3.3 / §2 group 4):
  * the reference's caption-index query language re-expressed as token
  * windows + semi/anti joins. */
object PhraseQueries {

  val queries: Map[String, QFn] = Map(
    // PH1: exact n-gram phrase occurrences with positions
    "ph01_phrase_hits" -> ((s, d) =>
      PhraseSearch.phraseHits(toks(s, d), Seq("the", "customer"))
        .orderBy("doc_id", "pos")),

    // PH2: boolean query language -> doc-id set
    "ph02_boolean_search" -> ((s, d) => {
      val t = toks(s, d)
      val universe = Tables.documents(tune(s), d).select("doc_id")
      PhraseSearch.search("""spark AND (window OR NOT batch)""", t, universe)
        .orderBy("doc_id")
    }),

    // PH3: the reference's end-to-end caption-search user journey
    // (captions.py:147-179 _get_lowercase_segments; same shape as the
    // topic-segment pipelines): a boolean query narrows the doc
    // universe, token hits become intervals on the token timeline,
    // dilate ±5 (clamped at 0), per-doc coalesce merges hit clusters
    // into segments carrying their hit count, and a min-length filter
    // drops isolated mentions. Every stage is the library operator its
    // standalone query already checks (ph02 search / ph01 hits /
    // r02 dilate / r01+r16 coalesce+payload / r03 filter_length),
    // composed end-to-end and still oracle-exact.
    "ph03_phrase_segments" -> ((s, d) => {
      import graft.operators.IntervalOps
      val t = toks(s, d)
      val universe = Tables.documents(tune(s), d).select("doc_id")
      val docSet =
        PhraseSearch.search("""customer AND NOT "slow scan"""", t, universe)
      val c = IntervalOps.Cols("doc_id")
      val hits = PhraseSearch.phraseHits(t, Seq("customer"))
        .join(docSet, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 1).cast("long").as("e"))
      val segs = IntervalOps.coalesce(
        IntervalOps.dilate(hits, 5, c, clampAtZero = true), c,
        payloadAggs = Seq(count(lit(1)).as("n_hits")))
      IntervalOps.filterLength(segs, 12, c = c)
        .orderBy("doc_id", "s")
    })
  )

  val oracle: Map[String, String] = Map(
    "ph01_phrase_hits" ->
      s"""SELECT a.doc_id, CAST(a.pos AS INT) AS pos
         |FROM (${Q.toksSql}) a JOIN (${Q.toksSql}) b
         |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |WHERE a.tok = 'the' AND b.tok = 'customer'
         |ORDER BY 1, 2""".stripMargin,

    "ph02_boolean_search" ->
      """SELECT doc_id FROM documents
        |WHERE list_contains(string_split(text,' '), 'spark')
        |  AND (list_contains(string_split(text,' '), 'window')
        |       OR NOT list_contains(string_split(text,' '), 'batch'))
        |ORDER BY doc_id""".stripMargin,

    "ph03_phrase_segments" -> {
      val ivSql =
        s"""SELECT h.doc_id, greatest(h.pos - 5, 0) AS s, h.pos + 6 AS e
           |FROM (SELECT doc_id, pos FROM (${Q.toksSql}) t0
           |      WHERE tok = 'customer') h
           |WHERE h.doc_id NOT IN (
           |  SELECT a.doc_id FROM (${Q.toksSql}) a JOIN (${Q.toksSql}) b
           |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           |  WHERE a.tok = 'slow' AND b.tok = 'scan')""".stripMargin
      s"""SELECT doc_id, s, e, n_hits
         |FROM (${Q.coalesceSql(ivSql, key = "doc_id",
                                extraAggs = ", CAST(count(*) AS BIGINT) AS n_hits")}) seg
         |WHERE e - s >= 12
         |ORDER BY doc_id, s""".stripMargin
    }
  )
}
