package graft

import org.apache.spark.sql.DataFrame
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols

/** Unit + property-style tests for the interval algebra — the reference
  * never unit-tested these in-repo (SURVEY §5); we close that gap with
  * the algebra laws: coalesce is idempotent and produces disjoint
  * covering intervals; minus output is disjoint from B and inside A;
  * split preserves coverage with bounded chunks; smoothing closes gaps
  * <= 2d and never loses coverage. Cases are seeded-random (plain
  * loops: the scalatest+scalacheck bridge isn't in the offline cache).
  */
class IntervalOpsSpec extends SparkSpec {
  import spark.implicits._
  private val C = Cols("k", "s", "e")

  private def df(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("k", "s", "e")

  private def rows(d: DataFrame): Set[(Long, Long, Long)] =
    d.select("k", "s", "e").as[(Long, Long, Long)].collect().toSet

  private def randomCases(seed: Int, n: Int): Seq[List[(Long, Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      List.fill(1 + rnd.nextInt(30)) {
        val k = rnd.nextInt(3).toLong
        val s = rnd.nextInt(100).toLong
        (k, s, s + 1 + rnd.nextInt(20))
      }
    }
  }

  private def cover(ivs: Seq[(Long, Long, Long)]): Map[Long, Set[Long]] =
    ivs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, s, e) => s until e }.toSet).toMap

  test("coalesce merges overlap and touch") {
    val out = rows(IntervalOps.coalesce(df(Seq((1, 0, 5), (1, 5, 8), (1, 10, 12),
      (1, 11, 20), (2, 0, 3))), C))
    assert(out === Set((1L, 0L, 8L), (1L, 10L, 20L), (2L, 0L, 3L)))
  }

  test("coalesce gap closes small gaps") {
    val out = rows(IntervalOps.coalesce(df(Seq((1, 0, 5), (1, 7, 9))), C, gap = 2))
    assert(out === Set((1L, 0L, 9L)))
  }

  test("coalesce is idempotent, disjoint and cover-preserving (property)") {
    randomCases(42, 8).foreach { ivs =>
      val c1 = IntervalOps.coalesce(df(ivs), C)
      val once = rows(c1)
      assert(rows(IntervalOps.coalesce(c1, C)) === once)
      assert(cover(once.toSeq) === cover(ivs))
      once.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.toList.sortBy(_._2)
        sorted.zip(sorted.drop(1)).foreach { case ((_, _, e1), (_, s2, _)) =>
          assert(e1 < s2)
        }
      }
    }
  }

  test("minus removes exactly the covered spans") {
    val a = df(Seq((1, 0, 10), (1, 20, 30), (2, 0, 5)))
    val b = df(Seq((1, 3, 6), (1, 8, 25), (3, 0, 100)))
    val out = rows(IntervalOps.minus(a, b, C))
    assert(out === Set((1L, 0L, 3L), (1L, 6L, 8L), (1L, 25L, 30L), (2L, 0L, 5L)))
  }

  test("minus output is inside A, disjoint from B, covers A\\B (property)") {
    val cases = randomCases(7, 8).zip(randomCases(8, 8))
    cases.foreach { case (as, bs) =>
      val out = rows(IntervalOps.minus(df(as), df(bs), C)).toList
      out.foreach { case (k, s, e) =>
        assert(s < e)
        assert(as.exists { case (k2, s2, e2) => k2 == k && s2 <= s && e <= e2 })
        bs.foreach { case (k2, s2, e2) =>
          if (k2 == k) assert(e <= s2 || s >= e2)
        }
      }
      val covB = cover(bs)
      val expect = cover(as).map { case (k, pts) =>
        k -> pts.diff(covB.getOrElse(k, Set.empty))
      }
      val got = cover(out)
      expect.foreach { case (k, pts) =>
        assert(got.getOrElse(k, Set.empty) === pts)
      }
    }
  }

  test("split bounds chunk length and preserves cover") {
    val out = rows(IntervalOps.split(df(Seq((1, 0, 70), (1, 100, 101))), 30, C))
    assert(out === Set((1L, 0L, 30L), (1L, 30L, 60L), (1L, 60L, 70L), (1L, 100L, 101L)))
  }

  test("smooth closes gaps <= 2d, keeps larger gaps, never loses cover (property)") {
    randomCases(99, 8).foreach { ivs =>
      val sm = rows(IntervalOps.smooth(df(ivs), 5, C))
      val covIn = cover(ivs)
      val covOut = cover(sm.toSeq)
      covIn.foreach { case (k, pts) =>
        assert(pts.subsetOf(covOut.getOrElse(k, Set.empty)))
      }
      sm.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.toList.sortBy(_._2)
        sorted.zip(sorted.drop(1)).foreach { case ((_, _, e1), (_, s2, _)) =>
          assert(s2 - e1 > 10)
        }
      }
    }
  }

  test("boundedCoalesce caps merged span") {
    val out = rows(IntervalOps.boundedCoalesce(
      df(Seq((1, 0, 10), (1, 5, 30), (1, 25, 60))), 40, C))
    assert(out === Set((1L, 0L, 30L), (1L, 25L, 60L)))
  }

  test("overlaps clips to intersections") {
    val out = rows(IntervalOps.overlaps(df(Seq((1, 0, 10))),
      df(Seq((1, 5, 20), (1, -5, 2))), C))
    assert(out === Set((1L, 5L, 10L), (1L, 0L, 2L)))
  }

  test("overlaps3D requires overlap on all three dims and clips (property)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(13)
    def gen() = Seq.fill(120) {
      val s = rnd.nextInt(50).toLong
      val x1 = rnd.nextInt(80) / 100.0
      val y1 = rnd.nextInt(80) / 100.0
      (1L + rnd.nextInt(3), s, s + 1 + rnd.nextInt(20),
        x1, x1 + 0.05 + rnd.nextInt(20) / 100.0,
        y1, y1 + 0.05 + rnd.nextInt(20) / 100.0)
    }.toDF("k", "s", "e", "x1", "x2", "y1", "y2")
    val a = gen().cache(); val b = gen().cache()
    val got = IntervalOps.overlaps3D(a, b, C)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    val av = a.as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    val bv = b.as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    // brute-force reference: clipped intersection of every 3-D-overlapping pair
    val expect = (for {
      (ak, as_, ae, ax1, ax2, ay1, ay2) <- av
      (bk, bs, be, bx1, bx2, by1, by2) <- bv
      if ak == bk && bs < ae && be > as_ &&
        bx1 < ax2 && bx2 > ax1 && by1 < ay2 && by2 > ay1
    } yield (ak, math.max(as_, bs), math.min(ae, be),
      math.max(ax1, bx1), math.min(ax2, bx2),
      math.max(ay1, by1), math.min(ay2, by2))).toList.sorted
    assert(got.toList.sorted === expect)
    // every emitted box is non-degenerate on all three dims
    assert(got.forall { case (_, s, e, x1, x2, y1, y2) =>
      s < e && x1 < x2 && y1 < y2 })
  }

  test("containedIn keeps only enclosed intervals") {
    val out = IntervalOps.containedIn(df(Seq((1, 2, 4), (1, 2, 40))),
      df(Seq((1, 0, 10))), C)
    assert(rows(out.select("k", "s", "e")) === Set((1L, 2L, 4L)))
  }

  test("filterAgainst keeps intervals with a qualifying neighbor") {
    import graft.operators.IntervalOps.Allen
    val a = df(Seq((1, 0, 10), (1, 50, 60)))
    val b = df(Seq((1, 12, 20)))
    val out = IntervalOps.filterAgainst(a, b, Allen.before(5), C)
    assert(rows(out) === Set((1L, 0L, 10L)))
  }

  test("peakConcurrency matches the brute-force sweep on random intervals") {
    // the two-phase global cumsum rests on "each key's deltas cancel to
    // zero, so no per-key reset is needed" — exactly the claim a seeded
    // random sweep can falsify
    randomCases(20260813, 12).foreach { ivs =>
      val withId = ivs.zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      val got = IntervalOps
        .peakConcurrency(withId.toDF("k", "s", "e", "id"), C, idCol = "id")
        .select("k", "peak", "peak_t").as[(Long, Long, Long)]
        .collect().toSet
      // brute force: per key, concurrency at each start instant
      // (half-open [s, e): peaks occur at starts)
      val expect = ivs.groupBy(_._1).map { case (k, ks) =>
        val conc = ks.map(_._2).distinct.map { t =>
          (t, ks.count { case (_, s, e) => s <= t && t < e }.toLong)
        }
        val peak = conc.map(_._2).max
        (k, peak, conc.filter(_._2 == peak).map(_._1).min)
      }.toSet
      assert(got === expect)
    }
  }
}
