package graft

import graft.text.Dedup

/** Min-label propagation connected components: chains collapse
  * transitively, separate components keep separate clusters. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse; disjoint components stay apart") {
    // component {1,2,3,4} via chain 1-2, 2-3, 3-4; component {10,11};
    // 4 and 1 are never directly linked
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("a long path converges (diameter > 1 round)") {
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("d1", "d2")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect()
    assert(out.length === n)
    assert(out.forall(_._2 === 1L))
  }
}
