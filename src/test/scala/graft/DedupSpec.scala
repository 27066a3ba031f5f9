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

  test("pointer doubling bounds rounds at O(log diameter) on a deep chain") {
    // a 64-node path is the worst case for plain min-label propagation
    // (63 rounds — one hop per round); with the lab := lab(lab) chase
    // the carried distance roughly doubles per round, so the fixpoint
    // (plus its one confirming no-change round) lands within 8 rounds
    val n = 64
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("d1", "d2")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val out = labels.as[(Long, Long)].collect()
    assert(out.length === n)
    assert(out.forall(_._2 === 1L))
    assert(rounds <= 8, s"expected O(log n) rounds, took $rounds")
  }

  test("CC equals brute-force union-find on seeded random graphs") {
    // exactness property across topologies the fixtures don't reach
    // (cycles, multi-bridge merges, self-loops, duplicate edges):
    // min-label + pointer doubling must produce exactly the
    // component-min labeling a sequential union-find computes
    val rnd = new scala.util.Random(421)
    for (_ <- 1 to 6) {
      val nNodes = 2 + rnd.nextInt(30)
      val edges = List.fill(1 + rnd.nextInt(40))(
        (1L + rnd.nextInt(nNodes), 1L + rnd.nextInt(nNodes)))
      // driver-side union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"edges=$edges")
    }
  }

  test("CC pins at most the final round's labels (checkpoint-leak guard)") {
    // Session-lifetime invariant (round-7 fix): every superseded
    // round's localCheckpoint is unpersisted inside the loop, the
    // edges cache is dropped on exit, and only the returned labels'
    // backing checkpoint may remain — a long-lived session running CC
    // repeatedly must not accumulate pinned blocks (the r6 gate run
    // leaked one checkpoint per round per call until iterative queries
    // ran 3-5x their standalone cost).
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val n = 64
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("d1", "d2")
    val (labels, _) = Dedup.connectedComponentsWithRounds(pairs)
    assert(labels.count() === n.toLong)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1,
      s"CC left ${leaked.size} persistent RDDs pinned (expected <= 1: " +
        "the final labels checkpoint only)")
  }

  test("span stats and span removal agree (t25/t29 consistency law)") {
    // the detection query (dupSpanStats) and the production removal
    // (removeDupSpans) must tell the same story: per doc,
    // n_kept == ntok - dup_toks, and a doc is absent from the removal
    // output exactly when duplicated islands consumed all its tokens
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ntok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val stats = Dedup.dupSpanStats(docs, 8)
      .select(col("doc_id"), col("dup_toks"))
    val expected = ntok.join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("ntok") - coalesce(col("dup_toks"), lit(0L))).as("want_kept"))
    val removed = Dedup.removeDupSpans(docs, 8)
      .select(col("doc_id"), col("n_kept"))
    val joined = expected.join(removed, Seq("doc_id"), "left")
    assert(joined.filter(col("want_kept") > 0 &&
      (col("n_kept").isNull || col("n_kept") =!= col("want_kept"))).count() === 0)
    assert(joined.filter(col("want_kept") === 0 && col("n_kept").isNotNull)
      .count() === 0)
  }

  test("cluster retention keeps exactly the longest member per cluster (t38 law)") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry
      .queries("t38_cluster_keep")(spark, "/root/testdata/sf0.001")
      .cache()
    val perCluster = out.groupBy(col("cluster")).agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      max(col("ntok")).as("max_ntok"),
      count(lit(1)).as("n"))
    // non-vacuous: sf0.001 has 28 near-dup edges (checked offline)
    assert(perCluster.count() > 0)
    assert(perCluster.filter(col("n") < 2).count() === 0,
      "CC emitted a singleton cluster")
    assert(perCluster.filter(col("n_keep") =!= 1L).count() === 0,
      "a cluster kept zero or multiple representatives")
    assert(out.filter(col("keep")).join(perCluster, "cluster")
      .filter(col("ntok") =!= col("max_ntok")).count() === 0,
      "a kept representative is not the longest member")
    out.unpersist()
  }

  test("doubling preserves exactness on a dense-plus-bridge graph") {
    // two cliques bridged by one edge: labels must flow across the
    // bridge both ways regardless of which side holds the global min
    val cliqueA = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val cliqueB = for (i <- 20L to 24L; j <- (i + 1) to 24L) yield (i, j)
    val pairs = (cliqueA ++ cliqueB ++ Seq((5L, 20L))).toDF("d1", "d2")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect()
    assert(out.length === 10)
    assert(out.forall(_._2 === 1L))
  }

  test("trianglesPerNode: 4-clique = 4 triangles, 3 per node; chains have none") {
    // K4 on 0..3 (6 ordered edges) plus a chain 10-11-12: C(4,3) = 4
    // triangles, each clique node in exactly 3; chain nodes in none
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val chain = Seq((10L, 11L), (11L, 12L))
    val got = Dedup.trianglesPerNode((k4 ++ chain).toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a bridge edge into the clique adds exactly the triangles its
    // endpoints close: 4-5 alone closes nothing
    val got2 = Dedup.trianglesPerNode((k4 ++ Seq((3L, 4L))).toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }
}
