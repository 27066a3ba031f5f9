package graft

import graft.index.Manifest
import graft.similarity.IntKMeans
import graft.text.PhraseSearch
import org.apache.spark.sql.functions._

/** Concurrent reader/writer behavior of the manifest protocol (r15
  * VERDICT ask #3): the lease and the gcRetainVersions reader grace
  * exist — this spec proves them UNDER INTERLEAVING on both planes.
  *
  * - A reader loop (resolve manifest → scan → collect) racing a
  *   writer thread that commits a stream of mixed maintenance ops
  *   must see, at every read, EXACTLY the result of some committed
  *   snapshot — never a torn mix of two. The op stream is
  *   deterministic, so every snapshot's answer is enumerable up
  *   front; any other observed value is a torn read.
  * - A crashed writer (lease file left behind, no process to release
  *   it) blocks maintenance loudly until breakLease; the takeover
  *   then proceeds on the intact previous snapshot and its gc sweeps
  *   the dead writer's staged orphans.
  *
  * gcRetainVersions is set high enough that no snapshot a reader may
  * have resolved is reclaimed mid-scan — the documented grace
  * contract (a serving deployment sizes the window to its longest
  * query; ManifestSpec covers retain-0 immediate reclaim). */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def docBatch(ids: Seq[Long]) = ids.map { i =>
    (i, s"quick brown doc$i " + (if (i % 2 == 0) "spark fast" else "slow scan"))
  }.toDF("doc_id", "text")

  private def toksOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), posexplode(split(col("text"), " "))
      .as(Seq("pos", "tok")))

  test("phrase reads under a concurrent maintenance stream always equal a committed snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("conc_ph_").toString
    spark.conf.set("spark.graft.index.gcRetainVersions", "50")
    try {
      PhraseSearch.writeIndex(toksOf(docBatch(1L to 4L)), dir, nBuckets = 8)
      // `quick AND spark` matches the even doc ids; the committed
      // snapshots of the writer's op stream answer exactly one of:
      val expected: Set[Set[Long]] = Set(
        Set(2L, 4L),                 // base build (docs 1-4)
        Set(2L, 4L, 6L, 8L),         // append 5-8
        Set(4L, 6L, 8L),             // delete doc 2
        // compact commits the same answer as the delete snapshot
        Set(4L, 6L, 8L, 10L, 12L))   // append 9-12
      @volatile var writerErr: Option[Throwable] = None
      val writer = new Thread(() => {
        try {
          PhraseSearch.appendIndex(toksOf(docBatch(5L to 8L)), dir)
          PhraseSearch.deleteFromIndex(Seq(2L).toDF("doc_id"), dir)
          PhraseSearch.compactIndex(spark, dir)
          PhraseSearch.appendIndex(toksOf(docBatch(9L to 12L)), dir)
        } catch { case t: Throwable => writerErr = Some(t) }
      })
      writer.start()
      var reads = 0
      while (writer.isAlive || reads < 5) {
        val got = PhraseSearch.servedSearch(spark, dir, "quick AND spark")
          .as[Long].collect().toSet
        assert(expected.contains(got),
          s"read #$reads saw a state that is no committed snapshot: $got")
        reads += 1
      }
      writer.join()
      writerErr.foreach(throw _)
      assert(PhraseSearch.servedSearch(spark, dir, "quick AND spark")
        .as[Long].collect().toSet === Set(4L, 6L, 8L, 10L, 12L),
        "final state is not the last committed snapshot")
      assert(reads >= 5)
    } finally spark.conf.set("spark.graft.index.gcRetainVersions", "0")
  }

  test("IVF visibility under a concurrent maintenance stream is snapshot-exact") {
    val dir = java.nio.file.Files.createTempDirectory("conc_iv_").toString
    spark.conf.set("spark.graft.index.gcRetainVersions", "50")
    try {
      def vecs(ids: Seq[Long]) = ids.map { id =>
        (id, Array.tabulate(8)(d => ((id % 3) * 30 + d - 4).toFloat), 0)
      }.toDF("vec_id", "embedding", "label")
      IntKMeans.writeIndex(vecs(0L until 30L), dir, nlist = 3)
      // the serving-visible id set (manifest resolve + multi-segment
      // scan + tombstone anti-join) after each commit:
      val expected: Set[Set[Long]] = Set(
        (0L until 30L).toSet,                       // base
        (0L until 36L).toSet,                       // append 30-35
        (0L until 36L).toSet - 3L)                  // delete 3; compact ≡
      @volatile var writerErr: Option[Throwable] = None
      val writer = new Thread(() => {
        try {
          IntKMeans.appendIndex(vecs(30L until 36L), dir)
          IntKMeans.deleteFromIndex(Seq(3L).toDF("vec_id"), dir)
          IntKMeans.compactIndex(spark, dir)
        } catch { case t: Throwable => writerErr = Some(t) }
      })
      writer.start()
      var reads = 0
      while (writer.isAlive || reads < 5) {
        val got = IntKMeans.liveIds(spark, dir).as[Long].collect().toSet
        assert(expected.contains(got),
          s"read #$reads saw a state that is no committed snapshot " +
            s"(${got.size} ids)")
        reads += 1
      }
      writer.join()
      writerErr.foreach(throw _)
      assert(IntKMeans.liveIds(spark, dir).as[Long].collect().toSet ===
        (0L until 36L).toSet - 3L)
      assert(reads >= 5)
    } finally spark.conf.set("spark.graft.index.gcRetainVersions", "0")
  }

  test("a crashed writer's lease blocks maintenance until breakLease; takeover proceeds") {
    val dir = java.nio.file.Files.createTempDirectory("conc_lease_").toString
    PhraseSearch.writeIndex(toksOf(docBatch(1L to 4L)), dir, nBuckets = 8)
    // simulate a writer that died mid-op: lease file present, staged
    // segment dir present, NO manifest commit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/manifest/LEASE"), false)
      .close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/postings/seg-99"))
    val before = PhraseSearch.servedSearch(spark, dir, "quick")
      .as[Long].collect().toSet
    val e = intercept[IllegalStateException] {
      PhraseSearch.appendIndex(toksOf(docBatch(5L to 6L)), dir)
    }
    assert(e.getMessage.contains("another writer holds the lease"))
    // reads never needed the lease, and the blocked append changed nothing
    assert(PhraseSearch.servedSearch(spark, dir, "quick")
      .as[Long].collect().toSet === before)
    Manifest.breakLease(spark, dir)
    PhraseSearch.appendIndex(toksOf(docBatch(5L to 6L)), dir)
    assert(PhraseSearch.servedSearch(spark, dir, "quick")
      .as[Long].collect().toSet === before ++ Set(5L, 6L))
    // the dead writer's staged orphan was swept by the takeover's gc
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/postings/seg-99")),
      "takeover gc left the crashed writer's staged segment behind")
  }
}
