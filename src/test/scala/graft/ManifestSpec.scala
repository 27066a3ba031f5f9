package graft

import graft.index.Manifest
import graft.text.PhraseSearch
import org.apache.spark.sql.functions._

/** The transactional spine of both index planes: a maintenance op
  * stages however many segment directories it likes, but NOTHING is
  * live until the single manifest rename commits — so a crash at any
  * earlier point leaves the previous snapshot fully intact (data,
  * tombstones, counter, watermark), and a reader never sees a
  * half-swapped layout. Plus the writer lease that turns the
  * single-writer contract from a doc comment into a loud failure. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown cat"),
    (3L, "a slow green turtle"),
    (4L, "quick brown quick brown")
  ).toDF("doc_id", "text")

  private lazy val toks = docs.select(col("doc_id"),
    posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("serialize/deserialize round-trips every field") {
    val m = Manifest(version = 7L, nextSeq = 42L, retention = Some(5L),
      scalars = Map("n_buckets" -> "64", "ma" -> "203.0"),
      segments = Map(
        "postings" -> Vector("postings/seg-1", "postings/seg-3"),
        "doclen" -> Vector("doclen/seg-1"),
        "tombstones" -> Vector.empty))
    assert(Manifest.deserialize(Manifest.serialize(m)) === m)
    val noRet = m.copy(retention = None)
    assert(Manifest.deserialize(Manifest.serialize(noRet)) === noRet)
  }

  test("readers resolve the highest committed version; tmp files are invisible") {
    val dir = freshDir("mf_ver_")
    PhraseSearch.writeIndex(toks, dir, nBuckets = 8)
    val v1 = Manifest.load(spark, dir)
    PhraseSearch.appendIndex(
      Seq((9L, 0, "zebra")).toDF("doc_id", "pos", "tok"), dir)
    val v2 = Manifest.load(spark, dir)
    assert(v2.version === v1.version + 1 && v2.nextSeq === v1.nextSeq + 1)
    // a half-written manifest (writer died mid-serialize) never resolves
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest/v999.manifest.tmp"),
      "version=999\n".getBytes)
    assert(Manifest.load(spark, dir) === v2)
  }

  test("commit refuses a version that already exists (optimistic check)") {
    val dir = freshDir("mf_dup_")
    PhraseSearch.writeIndex(toks, dir, nBuckets = 8)
    val m = Manifest.load(spark, dir)
    intercept[IllegalArgumentException] {
      Manifest.commit(spark, dir, m) // same version again
    }
    assert(Manifest.load(spark, dir) === m, "failed commit must change nothing")
  }

  test("crash injection: a compaction killed before its commit changes nothing observable") {
    val dir = freshDir("mf_crash_")
    PhraseSearch.writeIndex(toks.filter(col("doc_id") % 2 === 0), dir, 8)
    PhraseSearch.appendIndex(toks.filter(col("doc_id") % 2 === 1), dir)
    PhraseSearch.deleteFromIndex(Seq(4L).toDF("doc_id"), dir)
    val m = Manifest.load(spark, dir)
    val headBefore = PhraseSearch
      .servedPhraseHits(spark, dir, Seq("quick", "brown")).collect().toSet
    val asOf1 = PhraseSearch.servedPhraseHits(spark, dir, Seq("quick"),
      asOf = Some(1L)).collect().toSet
    // replay compactIndex's segment writes EXACTLY, then "crash" —
    // no manifest commit. The staged consolidated segment sits on
    // disk next to the live ones.
    PhraseSearch.rawPostings(spark, dir)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/${m.nextSeg("postings")}")
    PhraseSearch.rawDoclen(spark, dir)
      .write.mode("overwrite").parquet(s"$dir/${m.nextSeg("doclen")}")
    // every read — HEAD, history, counter, pending deletes — still
    // serves the OLD snapshot
    assert(Manifest.load(spark, dir) === m)
    assert(PhraseSearch.servedPhraseHits(spark, dir, Seq("quick", "brown"))
      .collect().toSet === headBefore)
    assert(PhraseSearch.servedPhraseHits(spark, dir, Seq("quick"),
      asOf = Some(1L)).collect().toSet === asOf1)
    assert(!PhraseSearch.pendingDeletes(spark, dir).isEmpty,
      "the crashed compaction must not have cleared the tombstones")
    // recovery is just running the op again: its gc sweeps the
    // orphaned staged segments, and the commit lands atomically
    PhraseSearch.compactIndex(spark, dir)
    assert(PhraseSearch.servedPhraseHits(spark, dir, Seq("quick", "brown"))
      .collect().toSet === headBefore)
    assert(PhraseSearch.pendingDeletes(spark, dir).isEmpty)
    val live = Manifest.load(spark, dir).segs("postings").toSet
    val fs = new org.apache.hadoop.fs.Path(s"$dir/postings")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/postings"))
      .map(st => s"postings/${st.getPath.getName}").toSet
    assert(onDisk === live,
      s"gc left orphaned segments: ${onDisk.diff(live)}")
  }

  test("crash injection (IVF plane): a refresh killed before its commit changes nothing") {
    import graft.similarity.IntKMeans
    val embs = (1L to 20L).map { id =>
      (id, Array.tabulate(8)(d => ((id * 7 + d * 13) % 7 - 3).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val dir = freshDir("mf_ivfcrash_")
    IntKMeans.writeIndex(embs, dir, nlist = 2)
    IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), dir)
    val m = Manifest.load(spark, dir)
    val qs = embs.filter(col("vec_id") === 1)
    val before = IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 2)
      .orderBy("q_id", "rank").collect().toSeq
    // a refresh stages new vectors + new centroids, then dies before
    // its commit: the r14 layout had a real crash window here (old
    // tombstones applying to new seq-0 rows); under the manifest the
    // staged generation is simply invisible
    IntKMeans.rawVectors(spark, dir).limit(1)
      .write.mode("overwrite").parquet(s"$dir/${m.nextSeg("vectors")}")
    spark.range(1).select(lit(0L).as("cell"), lit(Array(0.0d)).as("c"))
      .write.mode("overwrite").parquet(s"$dir/${m.nextSeg("centroids")}")
    assert(Manifest.load(spark, dir) === m)
    assert(IntKMeans.servedTopK(spark, dir, qs, k = 10, nprobe = 2)
      .orderBy("q_id", "rank").collect().toSeq === before,
      "uncommitted staged generation must be invisible to serves")
    assert(!IntKMeans.pendingDeletes(spark, dir).isEmpty,
      "the crashed refresh must not have cleared the tombstones")
    // the re-run commits atomically; its gc sweeps the orphans
    IntKMeans.refreshIndex(spark, dir, nlist = 2)
    assert(IntKMeans.currentSeq(spark, dir) === 1L)
    assert(IntKMeans.rawVectors(spark, dir)
      .filter(col("vec_id") === 3L).count() === 0L,
      "refresh must resolve the tombstone into the rewrite")
  }

  test("writer lease: a second concurrent writer fails loudly; breakLease recovers") {
    val dir = freshDir("mf_lease_")
    PhraseSearch.writeIndex(toks, dir, nBuckets = 8)
    val before = Manifest.load(spark, dir)
    // a writer crashed holding the lease: maintenance must refuse
    // instead of silently interleaving with the (presumed-alive) op
    Manifest.withLease(spark, dir) {
      val e = intercept[IllegalStateException] {
        PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
      }
      assert(e.getMessage.contains("lease"), s"wrong failure: ${e.getMessage}")
    }
    // withLease released it on exit — maintenance proceeds
    PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
    assert(Manifest.load(spark, dir).version === before.version + 1)
    // a crashed writer's stale lease is broken explicitly, never raced
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest/LEASE"), Array.empty[Byte])
    intercept[IllegalStateException] {
      PhraseSearch.deleteFromIndex(Seq(2L).toDF("doc_id"), dir)
    }
    Manifest.breakLease(spark, dir)
    PhraseSearch.deleteFromIndex(Seq(2L).toDF("doc_id"), dir)
    assert(PhraseSearch.pendingDeletes(spark, dir).count() === 2L)
  }

  test("the lease is released when the op body throws") {
    val dir = freshDir("mf_lease2_")
    PhraseSearch.writeIndex(toks, dir, nBuckets = 8)
    intercept[IllegalArgumentException] {
      PhraseSearch.vacuumIndex(spark, dir, 99L) // outside [1, cur]
    }
    // the failed op must not leave the index locked
    PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
    assert(PhraseSearch.pendingDeletes(spark, dir).count() === 1L)
  }

  test("gcRetainVersions keeps a reader-grace window of prior snapshots") {
    val dir = freshDir("mf_grace_")
    spark.conf.set("spark.graft.index.gcRetainVersions", "1")
    try {
      PhraseSearch.writeIndex(toks.filter(col("doc_id") % 2 === 0), dir, 8)
      PhraseSearch.appendIndex(toks.filter(col("doc_id") % 2 === 1), dir)
      val pinned = Manifest.load(spark, dir) // a reader starts here (v2)
      PhraseSearch.compactIndex(spark, dir)  // commits v3, drops v2's segs
      // within the grace window: the pinned snapshot's manifest AND
      // every segment it references are still on disk
      assert(Manifest.loadVersion(spark, dir, pinned.version) === pinned)
      pinned.segments.values.flatten.foreach { seg =>
        assert(spark.read.parquet(s"$dir/$seg").count() > 0L,
          s"grace window violated: $seg reclaimed under a live reader")
      }
      // new readers resolve the compacted head as usual
      assert(Manifest.load(spark, dir).segs("postings").size === 1)
      // the NEXT commit expires the pinned version (one-version grace)
      PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
      intercept[IllegalArgumentException] {
        Manifest.loadVersion(spark, dir, pinned.version)
      }
    } finally spark.conf.unset("spark.graft.index.gcRetainVersions")
  }

  test("autoCompact triggers on segment count, on both planes") {
    val dir = freshDir("mf_auto_")
    PhraseSearch.writeIndex(toks.filter(col("doc_id") === 1L), dir, 8)
    (2L to 4L).foreach(i =>
      PhraseSearch.appendIndex(toks.filter(col("doc_id") === i), dir))
    // 4 segments, threshold 4: below/at threshold is a no-op
    assert(!PhraseSearch.autoCompact(spark, dir, maxSegments = 4))
    assert(Manifest.load(spark, dir).segs("postings").size === 4)
    // one more append crosses it
    val extra = toks.filter(col("doc_id") === 1L).withColumn("doc_id", lit(9L))
    PhraseSearch.appendIndex(extra, dir)
    assert(PhraseSearch.autoCompact(spark, dir, maxSegments = 4))
    assert(Manifest.load(spark, dir).segs("postings").size === 1)
    assert(PhraseSearch.servedPhraseHits(spark, dir, Seq("quick", "brown"))
      .collect().toSet ===
      PhraseSearch.phraseHits(toks.unionByName(extra), Seq("quick", "brown"))
        .collect().toSet)
    // IVF mirror
    import graft.similarity.IntKMeans
    val embs = (1L to 20L).map { id =>
      (id, Array.tabulate(8)(d => ((id * 7 + d * 13) % 7 - 3).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val vd = freshDir("mf_auto_v_")
    IntKMeans.writeIndex(embs.filter($"vec_id" <= 10), vd, nlist = 2)
    IntKMeans.appendIndex(embs.filter($"vec_id" > 10), vd)
    assert(!IntKMeans.autoCompact(spark, vd, maxSegments = 2))
    IntKMeans.appendIndex(
      embs.filter($"vec_id" === 1L).withColumn("vec_id", lit(21L)), vd)
    assert(IntKMeans.autoCompact(spark, vd, maxSegments = 2))
    assert(Manifest.load(spark, vd).segs("vectors").size === 1)
  }

  test("gc keeps only the latest manifest and its referenced segments") {
    val dir = freshDir("mf_gc_")
    PhraseSearch.writeIndex(toks.filter(col("doc_id") % 2 === 0), dir, 8)
    PhraseSearch.appendIndex(toks.filter(col("doc_id") % 2 === 1), dir)
    PhraseSearch.compactIndex(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/manifest"))
      .map(_.getPath.getName).filter(_.endsWith(".manifest"))
    assert(manifests.length === 1,
      s"old manifest versions not gc'd: ${manifests.toSeq}")
    val m = Manifest.load(spark, dir)
    Seq("postings", "doclen").foreach { comp =>
      val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$comp"))
        .map(st => s"$comp/${st.getPath.getName}").toSet
      assert(segs === m.segs(comp).toSet,
        s"$comp holds segments the manifest does not reference: $segs")
    }
  }
}
