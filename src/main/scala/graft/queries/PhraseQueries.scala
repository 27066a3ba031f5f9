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
        |ORDER BY doc_id""".stripMargin
  )
}
