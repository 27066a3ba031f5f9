package graft

import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols
import graft.plans.CoalescePlan

/** The custom physical coalesce operator must match the declarative
  * window implementation exactly, plan with a single exchange, and
  * survive empty/degenerate inputs. */
class CoalescePlanSpec extends SparkSpec {
  import spark.implicits._
  private val C = Cols("k", "s", "e")

  private def randomDf(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    List.fill(n) {
      val k = rnd.nextInt(5).toLong
      val s = rnd.nextInt(500).toLong
      (k, s, s + 1 + rnd.nextInt(60))
    }.toDF("k", "s", "e")
  }

  test("native coalesce equals window coalesce (random, several gaps)") {
    for (seed <- Seq(1, 2, 3); gap <- Seq(0L, 7L)) {
      val df = randomDf(seed, 200)
      val expect = IntervalOps.coalesce(df, C, gap)
        .as[(Long, Long, Long)].collect().sorted.toList
      val got = CoalescePlan.coalesceNative(df, "k", "s", "e", gap)
        .as[(Long, Long, Long)].collect().sorted.toList
      assert(got === expect, s"seed=$seed gap=$gap")
    }
  }

  test("null keys form their own group; null bounds are dropped") {
    val df = Seq(
      (Some(1L), Some(0L), Some(10L)),
      (Some(1L), Some(5L), Some(20L)),
      (None, Some(0L), Some(4L)),      // null-key island...
      (None, Some(3L), Some(8L)),      // ...merges with the row above
      (Some(2L), None, Some(9L)),      // null bound -> dropped
      (Some(2L), Some(1L), None)       // null bound -> dropped
    ).toDF("k", "s", "e")
    val got = CoalescePlan.coalesceNative(df, "k", "s", "e")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 20L), (-1L, 0L, 8L)))
  }

  test("plan contains the custom operator and only one exchange") {
    val df = randomDf(9, 50)
    val plan = CoalescePlan.coalesceNative(df, "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.contains("CoalesceIntervals"))
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges === 1, s"expected exactly one exchange:\n$plan")
  }

  test("degenerate inputs: empty, single row, all-same key") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "s", "e")
    assert(CoalescePlan.coalesceNative(empty, "k", "s", "e").count() === 0)
    val one = Seq((1L, 5L, 9L)).toDF("k", "s", "e")
    assert(CoalescePlan.coalesceNative(one, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toList === List((1L, 5L, 9L)))
    val same = Seq((1L, 0L, 10L), (1L, 2L, 4L), (1L, 9L, 30L)).toDF("k", "s", "e")
    assert(CoalescePlan.coalesceNative(same, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toList === List((1L, 0L, 30L)))
  }
}
