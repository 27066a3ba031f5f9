package graft

import graft.similarity.IntKMeans
import org.apache.spark.sql.functions._

/** Properties of the deterministic integer-Lloyd plane backing
  * v05/v07/v12: cluster recovery on separated data, run-to-run
  * determinism (the whole point vs the MLlib float paths), IVF recall
  * against the exact int8 ranking, and linear-probe accuracy on
  * separable labels. */
class IntKMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated blobs (20 vectors each, dim 8): blob = id % 3
  // centered at 100*blob with +/-3 id-derived jitter. Membership is
  // id % 3 — NOT id / 20 — so the three hashed-id seeds (ids 0, 37, 2
  // for this id range under the Knuth hash) land in three DIFFERENT
  // blobs; with one seed per blob, Lloyd recovery is a guaranteed
  // property rather than seeding luck. (k-means with two seeds in one
  // blob correctly merges the unseeded blob into its nearest centroid
  // — that is k-means behavior, not a defect, so it is not asserted.)
  private lazy val blobs = {
    val rows = (0L until 60L).map { id =>
      val b = (id % 3).toInt
      val e = Array.tabulate(8)(d =>
        (b * 100.0 + ((id * 7 + d * 13) % 7) - 3).toFloat)
      (id, e, b)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("Lloyd fit recovers separated blobs exactly (k = 3, one seed per blob)") {
    val asg = IntKMeans.kmeansAssign(blobs, k = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // every blob lands in ONE cluster and the three clusters differ
    val byBlob = (0 until 3).map(b =>
      (0 until 20).map(j => asg(b + 3L * j)).distinct)
    byBlob.foreach(cl => assert(cl.size === 1,
      s"a blob split across clusters: $cl"))
    assert(byBlob.map(_.head).distinct.size === 3, "blobs merged")
  }

  test("fit is run-to-run deterministic (same assignment, same centroids)") {
    val a1 = IntKMeans.kmeansAssign(blobs, k = 3).collect().toSet
    val a2 = IntKMeans.kmeansAssign(blobs, k = 3).collect().toSet
    assert(a1 === a2)
  }

  test("IVF top-k on separated blobs returns only cluster-mates, ranked") {
    val top = IntKMeans.ivfTopK(blobs, blobs.filter($"vec_id" === 0),
        k = 5, nlist = 3, nprobe = 1)
      .select("vec_id", "rank").as[(Long, Int)].collect()
    assert(top.length === 5)
    // query 0 is in blob 0 (ids ≡ 0 mod 3); with one probed cell all
    // hits must be blob-0 members
    assert(top.forall(_._1 % 3 == 0), s"IVF leaked across blobs: ${top.toSeq}")
    assert(top.map(_._2).sorted === (1 to 5).toArray)
  }

  test("served IVF from a written index matches the direct fit bit-for-bit, partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" < 2)
    val direct = IntKMeans.ivfTopK(blobs, qs, k = 5, nlist = 3, nprobe = 1)
      .collect().toSet
    val served = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1)
    assert(served.collect().toSet === direct)
    // the serve-side vectors scan must carry a partition filter on
    // cell (dynamic partition pruning from the broadcast probe table)
    // so unprobed cell directories are never read. AQE's query-stage
    // wrappers hide subtrees from collect (see PlanAuditSpec), so
    // audit a fresh plan with AQE off.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val audited = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1)
      audited.collect()
      val scans = audited.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      val vecScan = scans.filter(_.relation.location.rootPaths.exists(
        _.toString.contains("vectors")))
      assert(vecScan.nonEmpty, "vectors scan not found")
      assert(vecScan.exists(_.partitionFilters.nonEmpty),
        "serve-side scan lost its cell partition filter — every cell dir would be read")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("appendIndex: build-half + append serves identically to a full-scope assignment") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    // build on even ids only: the quantization scale and centroids
    // come from the build half and stay frozen through the append
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), dir, nlist = 3)
    val before = vectorFiles(dir)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), dir)
    val after = vectorFiles(dir)
    // incremental: base files untouched, new files only
    assert(before.subsetOf(after), "append rewrote or removed base vector files")
    assert(after.size > before.size, "append added no files")
    // the full index must hold every vector exactly once, and every
    // appended vector must sit in the cell its (frozen-centroid)
    // assignment picks: serving a blob-pure query with nprobe=1 must
    // return only cluster-mates from BOTH halves
    val vec = IntKMeans.rawVectors(spark, dir)
    assert(vec.count() === 60L)
    assert(vec.select("vec_id").distinct().count() === 60L)
    val top = IntKMeans.servedTopK(spark, dir, blobs.filter($"vec_id" === 0),
        k = 10, nprobe = 1)
      .select("vec_id", "rank").as[(Long, Int)].collect()
    assert(top.length === 10)
    assert(top.forall(_._1 % 3 == 0), s"appended IVF leaked across blobs: ${top.toSeq}")
    val parities = top.map(_._1 % 2).distinct
    assert(parities.length === 2, "served results came from only one half — append not visible")
  }

  test("compactIndex collapses appended cell files without changing served results") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), dir, nlist = 3)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), dir)
    val qs = blobs.filter($"vec_id" < 2)
    val before = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 2)
      .collect().toSet
    val filesBefore = vectorFiles(dir)
    IntKMeans.compactIndex(spark, dir)
    val filesAfter = vectorFiles(dir)
    assert(filesAfter.size < filesBefore.size,
      s"compaction did not reduce files (${filesBefore.size} -> ${filesAfter.size})")
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 2)
      .collect().toSet === before)
  }

  test("appendIndex with an empty batch is a no-op; compactIndex is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), dir, nlist = 3)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), dir)
    val qs = blobs.filter($"vec_id" < 2)
    val before = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 2)
      .collect().toSet
    IntKMeans.appendIndex(blobs.filter($"vec_id" > 9999), dir)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 2)
      .collect().toSet === before, "empty append changed served results")
    IntKMeans.compactIndex(spark, dir)
    val files1 = vectorFiles(dir).size
    IntKMeans.compactIndex(spark, dir)
    assert(vectorFiles(dir).size === files1, "re-compaction changed the file count")
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 2)
      .collect().toSet === before, "compaction changed served results")
  }

  test("deleteFromIndex hides vectors immediately; compaction reclaims them") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    val full = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    // delete three blob-0 members that ARE in query 0's result set
    val dead = full.take(3)
    IntKMeans.deleteFromIndex(dead.toSeq.toDF("vec_id"), dir)
    val logical = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq
    val logicalIds = logical.map(_.getLong(1)).toSet
    assert(logicalIds.intersect(dead).isEmpty,
      s"deleted vectors still served: ${logicalIds.intersect(dead)}")
    // ranks re-close over the survivors (still a dense 1..k prefix)
    assert(logical.map(_.getInt(2)).sorted === (1 to logical.size).toArray)
    // physical reclaim
    IntKMeans.compactIndex(spark, dir)
    assert(graft.index.Manifest.load(spark, dir).segs("tombstones").isEmpty,
      "compaction left tombstone segments in the manifest")
    assert(IntKMeans.rawVectors(spark, dir)
      .filter(col("vec_id").isin(dead.toSeq: _*)).count() === 0L,
      "tombstoned vectors survived compaction")
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq === logical,
      "reclaimed layout serves differently from the logical view")
  }

  test("IVF deletes are idempotent and unindexed ids are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), dir)
    val once = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq
    IntKMeans.deleteFromIndex(Seq(3L, 9999L).toDF("vec_id"), dir)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq === once)
    IntKMeans.compactIndex(spark, dir)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq === once)
  }

  test("upsertIndex re-homes a re-encoded vector and it survives its own tombstone") {
    // stale corpus: vec 3 (a blob-0 member) was indexed with a
    // corrupted embedding sitting in blob 2's territory
    val corrupted = blobs.withColumn("embedding",
      when($"vec_id" === 3L,
        transform($"embedding", x => x + lit(200.0f)))
        .otherwise($"embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(corrupted, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    val staleIds = IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(!staleIds.contains(3L),
      "corrupted vector should be homed away from blob 0's cell")
    // re-encode: the corrected embedding lands back in blob 0's cell —
    // a DIFFERENT cell than the stale version, killed by version not
    // by rewrite
    IntKMeans.upsertIndex(blobs.filter($"vec_id" === 3L), dir)
    val fixed = IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq
    assert(fixed.map(_.getLong(1)).contains(3L),
      "re-encoded vector not served from its new cell")
    // both versions physically present until compaction, one served
    assert(IntKMeans.rawVectors(spark, dir)
      .filter($"vec_id" === 3L).count() === 2L)
    IntKMeans.compactIndex(spark, dir)
    // …then only the replacement survives and serving is unchanged
    assert(IntKMeans.rawVectors(spark, dir)
      .filter($"vec_id" === 3L).count() === 1L,
      "compaction must reclaim exactly the stale version")
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq === fixed)
  }

  test("IVF delete after compaction still deletes (seq survives the rewrite)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), dir, nlist = 3)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), dir)
    IntKMeans.compactIndex(spark, dir)
    val qs = blobs.filter($"vec_id" === 0)
    val full = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    val dead = full.take(2)
    IntKMeans.deleteFromIndex(dead.toSeq.toDF("vec_id"), dir)
    val ids = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(ids.intersect(dead).isEmpty,
      "delete after compaction did not hide compacted rows")
  }

  test("as-of snapshot reads reproduce every historical IVF state") {
    // event log: corrupted build (0) -> upsert vec 3 (tombstone=1,
    // append=2) -> delete two served ids (3). Capture the served
    // result after each event; any snapshot id recorded then must
    // reproduce it after the index has moved on — the contract a
    // training run needs to name the corpus view it actually saw.
    val corrupted = blobs.withColumn("embedding",
      when($"vec_id" === 3L,
        transform($"embedding", x => x + lit(200.0f)))
        .otherwise($"embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(corrupted, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    def serve(asOf: Option[Long]) =
      IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1, asOf = asOf)
        .orderBy("q_id", "rank").collect().toSeq
    val s1 = IntKMeans.currentSeq(spark, dir); val r1 = serve(None)
    IntKMeans.upsertIndex(blobs.filter($"vec_id" === 3L), dir)
    val s2 = IntKMeans.currentSeq(spark, dir); val r2 = serve(None)
    val dead = r2.map(_.getLong(1)).take(2)
    IntKMeans.deleteFromIndex(dead.toDF("vec_id"), dir)
    val s3 = IntKMeans.currentSeq(spark, dir); val r3 = serve(None)
    assert(s1 < s2 && s2 < s3, "maintenance events must advance the counter")
    assert(r1 != r2 && r2 != r3, "each event must change the served view")
    assert(serve(Some(s1)) === r1, "pre-upsert snapshot diverged")
    assert(serve(Some(s2)) === r2, "post-upsert snapshot diverged")
    assert(serve(Some(s3)) === r3, "post-delete snapshot diverged")
    // compaction reclaims to the LATEST state — history before it is
    // gone by design (the trade a physical reclaim always makes)
    IntKMeans.compactIndex(spark, dir)
    assert(serve(None) === r3,
      "reclaimed layout serves differently from the logical view")
  }

  test("vacuumIndex reclaims only below the watermark; retained snapshots stay exact") {
    // events: build (0) -> delete vec 0 (1) -> delete vec 3 (2);
    // vacuum at watermark 2: vec 0's tombstone is fully aged ->
    // physically reclaimed; vec 3's (upto 2) is not -> snapshot 2
    // must still see vec 3
    val dir = java.nio.file.Files.createTempDirectory("ivf_vac_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.deleteFromIndex(Seq(0L).toDF("vec_id"), dir)
    val s2 = IntKMeans.currentSeq(spark, dir)
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), dir)
    val qs = blobs.filter($"vec_id" === 6)
    def serve(asOf: Option[Long]) =
      IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1, asOf = asOf)
        .orderBy("q_id", "rank").collect().toSeq
    val head = serve(None)
    val at2 = serve(Some(s2))
    IntKMeans.vacuumIndex(spark, dir, s2)
    val vecs = IntKMeans.rawVectors(spark, dir)
    assert(vecs.filter($"vec_id" === 0L).count() === 0L,
      "fully-aged tombstone's row must be reclaimed")
    assert(vecs.filter($"vec_id" === 3L).count() === 1L,
      "a row the retained snapshot needs must survive the vacuum")
    assert(serve(None) === head, "vacuum changed the HEAD serve")
    assert(serve(Some(s2)) === at2, "retained snapshot diverged after vacuum")
    intercept[IllegalArgumentException] { serve(Some(1L)) }
    intercept[IllegalArgumentException] {
      IntKMeans.rollbackIndex(spark, dir, 1L)
    }
    // a fresh build in the same dir resets history
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1,
        asOf = Some(1L)).collect().map(_.getLong(1)).toSet.contains(0L),
      "stale history sidecars leaked into a rebuilt index")
  }

  test("IVF snapshotDiff classifies added/removed/changed, skips no-op re-encodes") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_sd_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    val s1 = IntKMeans.currentSeq(spark, dir)
    IntKMeans.deleteFromIndex(Seq(4L).toDF("vec_id"), dir)
    // a real re-encode (scaled vector -> different stored q)
    IntKMeans.upsertIndex(blobs.filter($"vec_id" === 7L)
      .withColumn("embedding", transform($"embedding", x => -x)), dir)
    // an identical re-encode: same embedding, same stored scale ->
    // same q -> signature equal -> must NOT be reported
    IntKMeans.upsertIndex(blobs.filter($"vec_id" === 10L), dir)
    IntKMeans.appendIndex(blobs.filter($"vec_id" === 3L)
      .withColumn("vec_id", lit(60L)), dir)
    val head = IntKMeans.currentSeq(spark, dir)
    val got = IntKMeans.snapshotDiff(spark, dir, s1, head)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(4L -> "removed", 7L -> "changed", 60L -> "added"),
      s"diff misclassified: $got — vec 10's identical re-encode must NOT appear")
    assert(IntKMeans.snapshotDiff(spark, dir, head, head).isEmpty)
  }

  test("randomized IVF lifecycle: every recorded snapshot replays exactly (seeded)") {
    // capture-replay property: after ANY interleaving of
    // append/delete/upsert, serving `asOf = s` must reproduce what
    // serve(None) answered when the counter stood at s — for every s
    // in the run's history, after the index has moved on.
    val rnd = new scala.util.Random(7)
    def genVec(id: Long) = Array.tabulate(8)(d =>
      ((id * 13 + d * 7 + rnd.nextInt(5)) % 100).toFloat)
    for (trial <- 1 to 2) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ivf_prop${trial}_").toString
      var nextId = 100L
      def freshId() = { val i = nextId; nextId += 1; i }
      var live = (1 to 20).map(_ => freshId()).toSet
      IntKMeans.writeIndex(
        live.toSeq.map(i => (i, genVec(i), 0)).toDF("vec_id", "embedding", "label"),
        dir, nlist = 3)
      val qs = Seq((0L, genVec(0L), 0)).toDF("vec_id", "embedding", "label")
      def serve(asOf: Option[Long]) =
        IntKMeans.servedTopK(spark, dir, qs, k = 30, nprobe = 3, asOf = asOf)
          .orderBy("q_id", "rank").collect().toSeq
      val snaps = scala.collection.mutable.Buffer(
        IntKMeans.currentSeq(spark, dir) -> serve(None))
      (1 to 5).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val ids = (1 to 1 + rnd.nextInt(3)).map(_ => freshId())
            IntKMeans.appendIndex(
              ids.map(i => (i, genVec(i), 0)).toDF("vec_id", "embedding", "label"), dir)
            live = live ++ ids
          case 1 =>
            val id = live.toSeq(rnd.nextInt(live.size))
            IntKMeans.deleteFromIndex(Seq(id).toDF("vec_id"), dir)
            live = live - id
          case 2 =>
            val id = if (rnd.nextBoolean()) live.toSeq(rnd.nextInt(live.size))
            else freshId()
            IntKMeans.upsertIndex(
              Seq((id, genVec(id), 0)).toDF("vec_id", "embedding", "label"), dir)
            live = live + id
        }
        snaps += IntKMeans.currentSeq(spark, dir) -> serve(None)
      }
      snaps.foreach { case (s, want) =>
        assert(serve(Some(s)) === want,
          s"trial $trial: snapshot $s no longer replays after later events")
      }
      IntKMeans.compactIndex(spark, dir)
      assert(serve(None) === snaps.last._2,
        s"trial $trial: post-compaction HEAD diverged")
    }
  }

  test("IVF compaction with tombstones advances the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cwm_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.deleteFromIndex(Seq(0L).toDF("vec_id"), dir)
    val cur = IntKMeans.currentSeq(spark, dir)
    IntKMeans.compactIndex(spark, dir)
    val qs = blobs.filter($"vec_id" === 6)
    intercept[IllegalArgumentException] {
      IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 1, asOf = Some(1L))
        .collect()
    }
    intercept[IllegalArgumentException] { IntKMeans.rollbackIndex(spark, dir, 1L) }
    // the current snapshot and HEAD still serve, reclaimed
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1,
        asOf = Some(cur)).filter($"vec_id" === 0L).count() === 0L)
    // tombstone-free compaction stays a pure re-layout (no watermark)
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_cwm2_").toString
    IntKMeans.writeIndex(blobs, dir2, nlist = 3)
    IntKMeans.compactIndex(spark, dir2)
    assert(IntKMeans.servedTopK(spark, dir2, qs, k = 5, nprobe = 1,
        asOf = Some(1L)).collect().length === 5,
      "tombstone-free compaction must not bound time travel")
  }

  test("filtered servedTopK pre-filters: every rank is an allowed vector") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_flt_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    val allowed = blobs.filter($"label" === 1).select("vec_id")
    // nprobe = nlist: no cell approximation — isolates the filter
    val got = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3,
        allowed = Some(allowed))
      .orderBy("rank").collect()
    assert(got.length === 5, "filtered top-k must FILL k from matching rows")
    assert(got.forall(_.getLong(1) % 3 == 1),
      s"non-allowed vector ranked: ${got.map(_.getLong(1)).toSeq}")
    assert(got.map(_.getInt(2)).toSeq === (1 to 5),
      "ranks must be contiguous over the filtered candidate set")
    // a post-filtered plain top-k would have kept NO label-1 vector
    // here (query 0 is blob 0; all its unfiltered neighbors are too)
    val plain = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
      .collect().map(_.getLong(1)).toSet
    assert(plain.forall(_ % 3 == 0),
      "fixture drifted: plain top-k should be all blob-0")
  }

  test("refreshIndex re-fits the quantizer over live contents (≡ fresh fit on the union)") {
    // build on the even ids, append the odd ids against the frozen
    // quantizer, then refresh: the re-fit must equal one fresh fit
    // over the union. (Every blob-2 member hits the global max-abs
    // 203 at some dim — the jitter depends only on the dim — so the
    // even half's stored scale IS the union's and the comparison is
    // bit-exact.)
    val dir = java.nio.file.Files.createTempDirectory("ivf_rfr_").toString
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), dir, nlist = 3)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), dir)
    // a takedown lands before the refresh: it must be resolved into
    // the rewrite (physically gone), not carried into the new
    // generation's sidecar
    IntKMeans.deleteFromIndex(Seq(6L).toDF("vec_id"), dir)
    IntKMeans.refreshIndex(spark, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    val served = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq
    val direct = IntKMeans.ivfTopK(blobs.filter($"vec_id" =!= 6L), qs,
        k = 10, nlist = 3, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served === direct,
      "refreshed index must serve a fresh union fit bit-for-bit")
    // a new generation: counter reset, every row at seq 0, no sidecar
    assert(IntKMeans.currentSeq(spark, dir) === 1L)
    assert(IntKMeans.rawVectors(spark, dir).filter($"seq" =!= 0L)
      .count() === 0L, "refresh must re-stamp rows to seq 0")
    assert(IntKMeans.rawVectors(spark, dir).filter($"vec_id" === 6L)
      .count() === 0L, "tombstoned row must be resolved into the rewrite")
    assert(graft.index.Manifest.load(spark, dir).segs("tombstones").isEmpty,
      "refresh must clear the tombstones")
    // maintenance continues on the new generation
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), dir)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1)
      .filter($"vec_id" === 3L).count() === 0L,
      "post-refresh delete must apply")
  }

  test("rollbackIndex truncates the IVF event log back to a snapshot") {
    // event log: corrupted build (0) -> upsert vec 3 (1,2) -> delete (3)
    val corrupted = blobs.withColumn("embedding",
      when($"vec_id" === 3L,
        transform($"embedding", x => x + lit(200.0f)))
        .otherwise($"embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_rbk_").toString
    IntKMeans.writeIndex(corrupted, dir, nlist = 3)
    val qs = blobs.filter($"vec_id" === 0)
    def serve() =
      IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1)
        .orderBy("q_id", "rank").collect().toSeq
    val s1 = IntKMeans.currentSeq(spark, dir); val r1 = serve()
    IntKMeans.upsertIndex(blobs.filter($"vec_id" === 3L), dir)
    val s2 = IntKMeans.currentSeq(spark, dir); val r2 = serve()
    IntKMeans.deleteFromIndex(r2.map(_.getLong(1)).take(2).toDF("vec_id"), dir)
    // roll the delete back: HEAD = post-upsert state; the delete's
    // tombstone is physically gone, the upsert's (older) survives
    IntKMeans.rollbackIndex(spark, dir, s2)
    assert(IntKMeans.currentSeq(spark, dir) === s2)
    assert(serve() === r2, "HEAD after rollback must equal the target snapshot")
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 20, nprobe = 1,
        asOf = Some(s1)).orderBy("q_id", "rank").collect().toSeq === r1,
      "pre-rollback history must survive a rollback")
    // roll the upsert back too: replacement row + its tombstone vanish
    IntKMeans.rollbackIndex(spark, dir, s1)
    assert(serve() === r1, "rollback to the base build diverged")
    assert(graft.index.Manifest.load(spark, dir).segs("tombstones").isEmpty,
      "rolled-back tombstones must be physically removed")
    assert(IntKMeans.rawVectors(spark, dir)
      .filter($"seq" >= s1).count() === 0L,
      "rows written after the rollback target must be physically gone")
    // maintenance continues: an append lands in the vacated seq slot
    // (x10 the query direction so it dominates the dot-product ranking
    // over the tiny quantized jitter values unambiguously)
    IntKMeans.appendIndex(
      blobs.filter($"vec_id" === 3L)
        .withColumn("vec_id", lit(60L))
        .withColumn("embedding", transform($"embedding", x => x * 10.0f)), dir)
    assert(IntKMeans.servedTopK(spark, dir,
        blobs.filter($"vec_id" === 3L), k = 1, nprobe = 1)
      .collect().map(_.getLong(1)).toSeq === Seq(60L),
      "append after rollback must serve the new vector")
    intercept[IllegalArgumentException] {
      IntKMeans.rollbackIndex(spark, dir, IntKMeans.currentSeq(spark, dir) + 1)
    }
  }

  test("mergeIndexes folds shared-quantizer shards, resolving tombstones") {
    val base = java.nio.file.Files.createTempDirectory("ivf_mrg_").toString
    val (a, b, out) = (s"$base/a", s"$base/b", s"$base/out")
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), a, nlist = 3)
    IntKMeans.initShard(spark, a, b)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), b)
    // takedown lands on both shards; ids a shard doesn't hold no-op
    IntKMeans.deleteFromIndex(Seq(6L, 9L).toDF("vec_id"), a)
    IntKMeans.deleteFromIndex(Seq(6L, 9L).toDF("vec_id"), b)
    IntKMeans.mergeIndexes(spark, Seq(a, b), out)
    // reference: ONE sequentially maintained index over the same history
    val ref = s"$base/ref"
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), ref, nlist = 3)
    IntKMeans.appendIndex(blobs.filter($"vec_id" % 2 === 1), ref)
    IntKMeans.deleteFromIndex(Seq(6L, 9L).toDF("vec_id"), ref)
    val qs = blobs.filter($"vec_id" === 0)
    assert(IntKMeans.servedTopK(spark, out, qs, k = 10, nprobe = 1)
      .orderBy("q_id", "rank").collect().toSeq ===
      IntKMeans.servedTopK(spark, ref, qs, k = 10, nprobe = 1)
        .orderBy("q_id", "rank").collect().toSeq,
      "merged shards diverge from the sequentially maintained index")
    // merged layout starts clean and physically resolved
    assert(graft.index.Manifest.load(spark, out).segs("tombstones").isEmpty)
    assert(IntKMeans.rawVectors(spark, out)
      .filter(col("vec_id").isin(6L, 9L)).count() === 0L,
      "shard tombstones not resolved during merge")
    // post-merge maintenance still works
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), out)
    assert(!IntKMeans.servedTopK(spark, out, qs, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet.contains(3L))
  }

  test("mergeIndexes refuses shards with different quantizers") {
    val base = java.nio.file.Files.createTempDirectory("ivf_mrg_").toString
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 0), s"$base/a", nlist = 3)
    IntKMeans.writeIndex(blobs.filter($"vec_id" % 2 === 1), s"$base/b", nlist = 3)
    intercept[IllegalArgumentException] {
      IntKMeans.mergeIndexes(spark, Seq(s"$base/a", s"$base/b"), s"$base/out")
    }
  }

  private def vectorFiles(dir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "vectors"))
    try walk.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(_.toString).toSet
    finally walk.close()
  }

  test("fit pins only qv + final centroids (per-round caches freed by Checkpoints.roll)") {
    val sc = spark.sparkContext
    // start from a clean slate so the count below is attributable
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val (asg, ctr) = graft.similarity.IntKMeans.fit(blobs, k = 3, iters = 3)
    // consume the result BEFORE inspecting pins (the returned
    // centroids are checkpoint-backed — see fit's hazard note)
    assert(asg.count() === 60L)
    assert(ctr.count() === 3L)
    val added = sc.getPersistentRDDs.keySet.toSet.diff(before)
    // exactly the two frames the result needs: the cached quantized
    // corpus and the final centroid checkpoint — r11 left one cached
    // k-row frame PER ROUND (seed + 3 updates) for the harness sweep
    assert(added.size <= 2,
      s"fit leaked ${added.size} pinned RDDs (expected <= 2: qv cache + final centroids): " +
        added.toSeq.sorted.map(id => id -> sc.getPersistentRDDs(id).toString).mkString("; "))
  }

  test("linear probe classifies separable labels perfectly with positive margins") {
    val out = IntKMeans.linearProbe(blobs)
      .select("vec_id", "pred", "margin").as[(Long, Int, Long)].collect()
    assert(out.length === 60)
    out.foreach { case (id, pred, margin) =>
      assert(pred === (id % 3).toInt, s"vec $id misclassified as $pred")
      assert(margin > 0, s"vec $id has non-positive margin $margin")
    }
  }

  test("served PQ-ADC at full probe is bit-identical to in-process pqTopK") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.addPqCodes(spark, dir, m = 4, subDim = 2, nCodes = 8)
    val qs = blobs.filter($"vec_id" < 2)
    val direct = graft.similarity.Similarity
      .pqTopK(blobs, qs, m = 4, subDim = 2, codes = 8, k = 5)
      .collect().toSet
    val served = IntKMeans.servedPqAdcTopK(spark, dir, qs, k = 5, nprobe = 3)
      .collect().toSet
    assert(served === direct,
      "compressed tier diverged from the in-process PQ ranking")
  }

  test("served IVF-PQ re-rank at full pool equals the exact served top-k; fresh tail covers appends") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.addPqCodes(spark, dir, m = 4, subDim = 2, nCodes = 8)
    val qs = blobs.filter($"vec_id" < 2)
    // kCand = corpus: stage 2 sees every candidate, so the final
    // ranking must equal the exact serve bit-for-bit
    val exact = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
      .collect().toSet
    assert(IntKMeans.servedPqTopK(spark, dir, qs, k = 5, kCand = 60,
      nprobe = 3).collect().toSet === exact)
    // rows appended AFTER the tier build have no codes — they must
    // still serve (exactly) through the fresh tail. Clones of query
    // 0's embedding maximize its dot, so they MUST enter its top-k.
    val q0emb = blobs.filter($"vec_id" === 0L)
      .select("embedding").as[Array[Float]].head()
      .map(_ * 20f) // scaled clones: dot with q0 dominates every tie
    val extra = (100L until 106L).map(id => (id, q0emb, 0))
      .toDF("vec_id", "embedding", "label")
    IntKMeans.appendIndex(extra, dir)
    val after = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
      .collect().toSet
    assert(after !== exact, "append did not change the blob-0 top-k " +
      "(fixture no longer exercises the fresh tail)")
    assert(IntKMeans.servedPqTopK(spark, dir, qs, k = 5, kCand = 66,
      nprobe = 3).collect().toSet === after,
      "fresh tail missed appended rows")
    // a delete kills the seq-stamped code rows like vector rows
    IntKMeans.deleteFromIndex(Seq(3L, 100L).toDF("vec_id"), dir)
    assert(IntKMeans.servedPqTopK(spark, dir, qs, k = 5, kCand = 66,
        nprobe = 3).collect().toSet ===
      IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
        .collect().toSet)
    // a rewrite invalidates the tier: compact drops it atomically and
    // the PQ serve fails loudly until addPqCodes rebuilds
    IntKMeans.compactIndex(spark, dir)
    val e = intercept[IllegalStateException] {
      IntKMeans.servedPqTopK(spark, dir, qs, k = 5, kCand = 66, nprobe = 3)
        .collect()
    }
    assert(e.getMessage.contains("no PQ tier"))
    IntKMeans.addPqCodes(spark, dir, m = 4, subDim = 2, nCodes = 8)
    assert(IntKMeans.servedPqTopK(spark, dir, qs, k = 5, kCand = 66,
        nprobe = 3).collect().toSet ===
      IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
        .collect().toSet, "rebuilt tier diverged after compaction")
  }

  test("randomized IVF lifecycle: full-pool PQ serve tracks the exact serve at every step (seeded)") {
    // adversarial composition of the PQ tier with the whole
    // maintenance surface: random append/delete/upsert streams, the
    // tier built once at the start — correctness must hold at EVERY
    // intermediate state because stage 2 re-ranks exactly and the
    // fresh tail admits post-build rows exactly. kCand >= candidate
    // count makes the invariant sharp: PQ serve ≡ exact serve.
    for (trial <- 1 to 2) {
      val rnd = new scala.util.Random(4242L + trial)
      var nextId = 1000L
      def freshId(): Long = { nextId += 1; nextId }
      def vecOf(id: Long, flip: Boolean = false): Array[Float] =
        Array.tabulate(8) { d =>
          val v = ((id % 3) * 100.0 + ((id * 7 + d * 13) % 7) - 3).toFloat
          if (flip) -v else v
        }
      var state = (0L until 30L).map(id => id -> vecOf(id)).toMap
      def dfOf(m: Map[Long, Array[Float]]) =
        m.toSeq.map { case (id, e) => (id, e, 0) }
          .toDF("vec_id", "embedding", "label")
      val dir = java.nio.file.Files.createTempDirectory("ivf_rnd_").toString
      IntKMeans.writeIndex(dfOf(state), dir, nlist = 3)
      IntKMeans.addPqCodes(spark, dir, m = 4, subDim = 2, nCodes = 8)
      val qs = dfOf(state).filter($"vec_id" < 2)
      def assertParity(tag: String): Unit = {
        val exact = IntKMeans.servedTopK(spark, dir, qs, k = 5, nprobe = 3)
          .collect().toSet
        val pq = IntKMeans.servedPqTopK(spark, dir, qs, k = 5,
          kCand = state.size + 60, nprobe = 3).collect().toSet
        assert(pq === exact, s"trial $trial $tag: PQ serve diverged")
      }
      assertParity("after tier build")
      (1 to 6).foreach { step =>
        rnd.nextInt(3) match {
          case 0 => // append brand-new vectors (fresh tail, no codes)
            val batch = (1 to 1 + rnd.nextInt(2))
              .map(_ => { val id = freshId(); id -> vecOf(id) }).toMap
            IntKMeans.appendIndex(dfOf(batch), dir)
            state = state ++ batch
          case 1 => // delete an existing id (or a missing one — no-op)
            val id = if (rnd.nextBoolean() && state.nonEmpty)
              state.keys.toSeq(rnd.nextInt(state.size))
            else 5000L + rnd.nextInt(5)
            IntKMeans.deleteFromIndex(Seq(id).toDF("vec_id"), dir)
            state = state - id
          case 2 => // re-encode an existing id (negated vector) or new
            val id = if (state.nonEmpty)
              state.keys.toSeq(rnd.nextInt(state.size)) else freshId()
            val batch = Map(id -> vecOf(id, flip = true))
            IntKMeans.upsertIndex(dfOf(batch), dir)
            state = state ++ batch
        }
        assertParity(s"step $step")
      }
      // a rewrite drops the tier; rebuilding restores the invariant
      IntKMeans.compactIndex(spark, dir)
      IntKMeans.addPqCodes(spark, dir, m = 4, subDim = 2, nCodes = 8)
      assertParity("after compact + tier rebuild")
    }
  }

  test("compacting a fully-tombstoned index publishes empty components; append revives it") {
    // ADVICE r15 #1: the rewrite ops used to commit a _SUCCESS-only
    // segment when every row was tombstoned — every later read died
    // with 'Unable to infer schema' (bricked until rebuild). The
    // guard publishes an EMPTY component instead: the op completes,
    // reads fail on the LOUD empty-index path, appends revive.
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.deleteFromIndex(blobs.select("vec_id"), dir)
    IntKMeans.compactIndex(spark, dir) // must complete, not brick
    val m = graft.index.Manifest.load(spark, dir)
    assert(m.segs("vectors").isEmpty, "empty rewrite published a segment")
    assert(m.segs("tombstones").isEmpty)
    val e = intercept[IllegalStateException] {
      IntKMeans.servedTopK(spark, dir, blobs.filter($"vec_id" === 0),
        k = 3, nprobe = 1).collect()
    }
    assert(e.getMessage.contains("no vector segments"),
      s"wrong failure mode: ${e.getMessage}")
    // vacuum over the already-empty index is a no-op commit, not a crash
    IntKMeans.appendIndex(blobs.filter($"vec_id" < 9), dir)
    val revived = IntKMeans.servedTopK(spark, dir,
      blobs.filter($"vec_id" === 0), k = 2, nprobe = 1).collect()
    assert(revived.nonEmpty, "append after empty-compact did not revive")
  }

  test("PQ tier guards: bad geometry and pre-tier snapshots refuse loudly") {
    // r17's guards, regression-pinned (ADVICE r17 / VERDICT r17 #5):
    // (c) slice() silently shortens past the array end, so a geometry
    // where m*subDim != dim would encode truncated subvectors and
    // serve wrong ADC distances with no error — addPqCodes refuses.
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)             // seq -> 1
    IntKMeans.deleteFromIndex(Seq(9L).toDF("vec_id"), dir)  // seq -> 2
    val gErr = intercept[IllegalArgumentException](
      IntKMeans.addPqCodes(spark, dir, m = 3, subDim = 3, nCodes = 8))
    assert(gErr.getMessage.contains("geometry"),
      s"wrong failure mode: ${gErr.getMessage}")
    // (a) a vector deleted BEFORE the tier build (vec 9, at seq 2) has
    // no code rows: snapshot 1 still owns it, so the compressed path
    // must refuse asOf < pq_as_of instead of silently dropping it...
    IntKMeans.addPqCodes(spark, dir, m = 2, subDim = 4, nCodes = 8)
    val q = blobs.filter($"vec_id" === 0)
    val aErr = intercept[IllegalArgumentException](
      IntKMeans.servedPqTopK(spark, dir, q, k = 5, kCand = 10, nprobe = 1,
        asOf = Some(1L)))
    assert(aErr.getMessage.contains("predates the PQ tier"),
      s"wrong failure mode: ${aErr.getMessage}")
    // ...while the uncompressed serve still answers that snapshot
    // (vec 9 is a blob-0 cluster-mate of query 0, so top-20 holds it)
    val exact = IntKMeans.servedTopK(spark, dir, q, k = 20, nprobe = 1,
        asOf = Some(1L))
      .select("vec_id").as[Long].collect().toSet
    assert(exact.contains(9L), "exact path lost the pre-tier snapshot row")
    // and the tier-build snapshot itself serves through the PQ path
    // WITHOUT vec 9 (the delete predates the build)
    val pq = IntKMeans.servedPqTopK(spark, dir, q, k = 20, kCand = 40,
        nprobe = 1, asOf = Some(2L))
      .select("vec_id").as[Long].collect().toSet
    assert(pq.nonEmpty && !pq.contains(9L),
      s"PQ path served a pre-build-deleted row: $pq")
  }

  test("PQ tier build refuses an empty codebook (low seed ids deleted)") {
    // (b) the codebook seeds are live vectors with vec_id < nCodes —
    // deleting them away would commit _SUCCESS-only tier segments and
    // brick every later read (the r15 schemaless-segment bug class).
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_").toString
    IntKMeans.writeIndex(blobs, dir, nlist = 3)
    IntKMeans.deleteFromIndex((0L until 8L).toDF("vec_id"), dir)
    val bErr = intercept[IllegalArgumentException](
      IntKMeans.addPqCodes(spark, dir, m = 2, subDim = 4, nCodes = 8))
    assert(bErr.getMessage.contains("codebook would be empty"),
      s"wrong failure mode: ${bErr.getMessage}")
    // the refusal left the manifest tierless, not torn: the exact
    // serve still answers
    assert(IntKMeans.servedTopK(spark, dir, blobs.filter($"vec_id" === 1),
      k = 3, nprobe = 1).collect().nonEmpty)
  }
}
