package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols
import graft.result.WidgetJson

/** Native expression (eval + codegen + SQL registration), banded-join
  * equivalence, and the widget JSON presentation contract. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("overlap_seconds: Column API, SQL function, null propagation") {
    GraftFunctions.register(spark)
    val df = Seq(
      (0L, 10L, 5L, 20L),   // overlap 5
      (0L, 10L, 20L, 30L),  // disjoint -> 0
      (0L, 100L, 10L, 20L)  // contained -> 10
    ).toDF("as", "ae", "bs", "be")
    val viaCol = df.select(GraftFunctions.overlapSeconds(
      col("as"), col("ae"), col("bs"), col("be"))).as[Long].collect().toList
    assert(viaCol === List(5L, 0L, 10L))
    val viaSql = df.selectExpr("overlap_seconds(as, ae, bs, be)")
      .as[Long].collect().toList
    assert(viaSql === List(5L, 0L, 10L))
    val withNull = Seq((Some(0L), Some(10L), Option.empty[Long], Some(20L)))
      .toDF("as", "ae", "bs", "be")
      .selectExpr("overlap_seconds(as, ae, bs, be)")
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("bandedOverlaps equals overlaps on random data (several widths)") {
    val rnd = new scala.util.Random(13)
    val C = Cols("k", "s", "e")
    def gen() = List.fill(60) {
      val k = rnd.nextInt(3).toLong
      val s = rnd.nextInt(1000).toLong
      (k, s, s + 1 + rnd.nextInt(300))
    }.toDF("k", "s", "e")
    val a = gen(); val b = gen()
    val plain = IntervalOps.overlaps(a, b, C)
      .as[(Long, Long, Long)].collect().sorted.toList
    Seq(16L, 100L, 1024L).foreach { w =>
      val banded = IntervalOps.bandedOverlaps(a, b, w, C)
        .as[(Long, Long, Long)].collect().sorted.toList
      assert(banded === plain, s"width $w")
    }
  }

  test("widget JSON track result matches the reference contract shape") {
    val tracks = Seq(
      (1L, 0, 100, "guest"), (1L, 200, 300, "guest"), (2L, 10, 50, "host")
    ).toDF("video_id", "min_frame", "max_frame", "label")
    val json = WidgetJson.trackResult(tracks, "Track")
    assert(json.contains(""""count":3"""))
    assert(json.contains(""""type":"Track""""))
    assert(json.contains(""""result":["""))
    assert(json.contains(""""label":"guest""""))
    assert(json.contains(""""video":1"""))
    assert(json.contains(""""min_frame":200"""))
    // parseable envelope: balanced braces
    assert(json.count(_ == '{') === json.count(_ == '}'))
  }
}
