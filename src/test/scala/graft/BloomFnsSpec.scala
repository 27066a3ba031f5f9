package graft

import org.apache.spark.sql.functions._
import graft.plans.BloomFns

class BloomFnsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrune keeps every true match and prunes most non-matches") {
    val probe = (0L until 10000L).toDF("k")
    val build = (0L until 10000L by 100L).toDF("k") // 100 members
    val pruned = BloomFns.bloomPrune(probe, build, "k",
      expectedItems = 100L, numBits = 4096L)
    val kept = pruned.as[Long].collect().toSet
    // no false negatives: every build key survives
    (0L until 10000L by 100L).foreach(k => assert(kept(k), s"lost true key $k"))
    // prune is effective: false positives are a small fraction
    assert(kept.size < 600, s"bloom kept ${kept.size} of 10000 - too many fps")
    // and the exact confirm join recovers the precise semi-join
    val confirmed = pruned.join(build, "k").select("k").as[Long].collect().toSet
    assert(confirmed === (0L until 10000L by 100L).toSet)
  }

  test("bloomPrune with an empty build side keeps the semi-join exact (empty)") {
    val probe = (0L until 100L).toDF("k")
    val build = probe.filter(col("k") < 0) // empty
    val pruned = BloomFns.bloomPrune(probe, build, "k",
      expectedItems = 10L, numBits = 64L)
    // an empty filter may pass rows (implementation detail) but the
    // exact confirm join MUST still produce the empty semi-join
    assert(pruned.join(build, "k").count() === 0L)
  }
}
