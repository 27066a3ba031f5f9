package graft

import org.apache.spark.sql.functions._
import graft.espertv.EsperQueries

/** Golden tests for the flagship Esper pipelines on constructed
  * fixtures with hand-computable answers (FIXTURES.md §A invariants):
  * interview detection, commercial detection with P/R vs hand labels,
  * probabilistic screen time (closed form), panels scene graph. */
class EsperTvSpec extends SparkSpec {
  import spark.implicits._

  test("interviews: alternating guest/host spans found; isolated guest ignored") {
    // video 1: guest 0-10, host 15-25, guest 30-40, host 45-55 (gaps 5s,
    // total span 55 >= 45) -> one interview covering ~[0, 55)
    // video 2: guest-only shots far apart -> none
    val guest = Seq((1L, 0L, 10L), (1L, 30L, 40L), (2L, 0L, 10L), (2L, 500L, 505L))
      .toDF("video_id", "s", "e")
    val host = Seq((1L, 15L, 25L), (1L, 45L, 55L)).toDF("video_id", "s", "e")
    val out = EsperQueries.interviews(guest, host, maxGap = 20, minTotal = 45)
      .as[(Long, Long, Long)].collect().toList
    assert(out.map(_._1) === List(1L))
    val (_, s, e) = out.head
    assert(s <= 0 && e >= 55 && e - s >= 45)
  }

  test("commercials: black+lowercase blocks detected, live '>>' region excluded; P/R = 1") {
    // video 1: commercial block A [100, 160): black frames at the edges,
    // lowercase captions inside. Block B [300, 340). Live news [200, 260)
    // with '>>' captions and uppercase-leading text.
    val black = Seq((1L, 98L, 101L), (1L, 158L, 161L), (1L, 298L, 301L), (1L, 338L, 341L))
      .toDF("video_id", "s", "e")
    val caps = Seq(
      (1L, 105L, 115L, "buy this amazing product now"),
      (1L, 120L, 140L, "limited time offer call today"),
      (1L, 145L, 155L, "satisfaction guaranteed"),
      (1L, 305L, 335L, "another great deal for you"),
      (1L, 200L, 230L, ">> Anchor: Breaking News Tonight"),
      (1L, 235L, 260L, ">> The Senate Voted Today")
    ).toDF("video_id", "s", "e", "text")
    val detected = EsperQueries.commercials(black, caps)
    val det = detected.as[(Long, Long, Long)].collect().toList
    // nothing detected inside the live region
    det.foreach { case (_, s, e) => assert(e <= 200 || s >= 260) }
    assert(det.exists { case (_, s, e) => s <= 105 && e >= 155 }) // block A
    assert(det.exists { case (_, s, e) => s <= 305 && e >= 335 }) // block B
    val labeled = Seq((1L, 98L, 161L), (1L, 298L, 341L)).toDF("video_id", "s", "e")
    val prf = EsperQueries.prf(detected, labeled, iouMin = 0.5).head()
    assert(prf.getAs[Double]("precision") === 1.0)
    assert(prf.getAs[Double]("recall") === 1.0)
  }

  test("screen time: closed-form expectation and variance") {
    // identity A: spans 10s@p=0.5 and 20s@p=1.0 -> E = 5 + 20 = 25,
    // Var = 0.25*100 + 0 = 25
    val spans = Seq(
      (1L, 0L, 10L, "A", 0.5), (1L, 20L, 40L, "A", 1.0),
      (1L, 50L, 60L, "B", 0.8)
    ).toDF("video_id", "s", "e", "identity", "probability")
    val st = EsperQueries.screenTime(spans).orderBy("identity")
      .as[(String, Double, Double, Long)].collect().toList
    val a = st.find(_._1 == "A").get
    assert(math.abs(a._2 - 25.0) < 1e-9)
    assert(math.abs(a._3 - 25.0) < 1e-9)
    val b = st.find(_._1 == "B").get
    assert(math.abs(b._2 - 8.0) < 1e-9)
    assert(math.abs(b._3 - 0.8 * 0.2 * 100) < 1e-9)
  }

  test("panels: exactly 3 aligned left-to-right faces qualify") {
    val faces = Seq(
      // frame 1: proper 3-panel
      (1L, 1L, 0.10, 0.25, 0.30, 0.70),
      (1L, 1L, 0.40, 0.55, 0.32, 0.72),
      (1L, 1L, 0.70, 0.85, 0.31, 0.71),
      // frame 2: only 2 tall faces
      (1L, 2L, 0.10, 0.25, 0.30, 0.70),
      (1L, 2L, 0.40, 0.55, 0.32, 0.72),
      // frame 3: 3 faces but one misaligned vertically
      (1L, 3L, 0.10, 0.25, 0.30, 0.70),
      (1L, 3L, 0.40, 0.55, 0.60, 0.95),
      (1L, 3L, 0.70, 0.85, 0.31, 0.71),
      // frame 4: 3 aligned but overlapping horizontally
      (1L, 4L, 0.10, 0.45, 0.30, 0.70),
      (1L, 4L, 0.40, 0.55, 0.32, 0.72),
      (1L, 4L, 0.70, 0.85, 0.31, 0.71)
    ).toDF("video_id", "frame_id", "bbox_x1", "bbox_x2", "bbox_y1", "bbox_y2")
    val out = EsperQueries.panels(faces, n = 3).select("frame_id")
      .as[Long].collect().toList
    assert(out === List(1L))
  }

  test("phrase search parser + eval") {
    import graft.text.PhraseSearch
    val docs = Seq((0L, "the big cat sat"), (1L, "the small cat ran"),
      (2L, "a big dog sat")).toDF("doc_id", "text")
    val toks = graft.text.TextOps.tokens(docs)
    val uni = docs.select("doc_id")
    def ids(q: String): List[Long] =
      PhraseSearch.search(q, toks, uni).as[Long].collect().toList.sorted
    assert(ids("\"big cat\"") === List(0L))
    assert(ids("cat AND sat") === List(0L))
    assert(ids("cat OR dog") === List(0L, 1L, 2L))
    assert(ids("NOT cat") === List(2L))
    assert(ids("sat AND (small OR NOT dog)") === List(0L))
    assert(ids("\"the big cat\" OR \"small cat\"") === List(0L, 1L))
  }
}
