package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Ingest

/** Top-level so Spark's encoder can instantiate it on executors. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)
case class Cap(video_id: Long, s: Long, e: Long, text: String)
case class Trk(video_id: Long, min_frame: Long, max_frame: Long, label: String)
case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
case class Bx(video_id: Long, frame_number: Long, obj_id: Long,
              bbox_x1: Double, bbox_x2: Double, bbox_y1: Double, bbox_y2: Double)

/** Structured Streaming ingest: ledger dedup, session windows, tumbling
  * windows, and the file-source -> parquet job (SURVEY §2.9). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset well past epoch 0 — timestamps at the initial watermark
  // boundary get dropped as late rows
  private def ts(s: Long) = new java.sql.Timestamp((1700000000L + s) * 1000L)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
  }

  test("dedupStream drops duplicate event ids") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(1, ts(5), 1, "click", 1.0, "{}"),
      Ev(2, ts(10), 1, "view", 2.0, "{}"))
    runToMemory(Ingest.dedupStream(in.toDF()), "dedup_out", "append")
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted
    assert(ids === Array(1L, 2L))
  }

  test("sessionize groups by inactivity gap") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    // two bursts for user 1 separated by > 30 min, one event for user 2
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(2, ts(60), 1, "click", 1.0, "{}"),
      Ev(3, ts(60 * 60 * 3), 1, "click", 1.0, "{}"),
      Ev(4, ts(30), 2, "view", 5.0, "{}"))
    // advance watermark far enough to close all sessions
    in.addData(Ev(99, ts(60 * 60 * 10), 9, "click", 0.0, "{}"))
    runToMemory(Ingest.sessionize(in.toDF(), "30 minutes"), "sess_out", "append")
    val sessions = spark.table("sess_out")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSet
    assert(sessions.contains((1L, 2L))) // first burst: 2 events
    assert(sessions.contains((1L, 1L))) // second burst
    assert(sessions.contains((2L, 1L)))
  }

  test("stream-stream interval join matches the batch join and bounds matches to the window") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    // user 1: impression at t=0 -> clicks at t=60 (in window) and
    // t=700 (outside 10 min); user 2: click with no impression
    imps.addData(
      Ev(10, ts(0), 1, "imp", 0, "{}"),
      Ev(11, ts(300), 1, "imp", 0, "{}"))
    clicks.addData(
      Ev(20, ts(60), 1, "click", 0, "{}"),
      Ev(21, ts(700), 1, "click", 0, "{}"),
      Ev(22, ts(50), 2, "click", 0, "{}"))
    // advance both watermarks past every match horizon
    imps.addData(Ev(99, ts(60 * 60 * 5), 9, "imp", 0, "{}"))
    clicks.addData(Ev(98, ts(60 * 60 * 5), 8, "click", 0, "{}"))
    runToMemory(
      Ingest.streamStreamJoin(imps.toDF(), clicks.toDF(), "10 minutes"),
      "ssj_out", "append")
    val got = spark.table("ssj_out")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    // imp 10 matches click 20 (60s later) and 21 (700s > 600s: no);
    // imp 11 (t=300) matches 21 (t=700, 400s later: yes)
    assert(got === Set((10L, 20L), (11L, 21L)))
  }

  test("streamingCoalesce merges islands across micro-batches with custom state") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Ingest.{ClosedIv, KeyedIv}
    val in = MemoryStream[KeyedIv]
    val q = Ingest.streamingCoalesce(in.toDS(), gap = 0)
      .toDF().writeStream.format("memory")
      .queryName("scoal_out").outputMode("append").start()
    // batch 1: user 1 opens an island [0, 10)
    in.addData(KeyedIv(1L, 0L, 10L, ts(0)))
    q.processAllAvailable()
    // batch 2: [5, 20) extends it across the batch boundary; the far
    // interval [100, 110) closes [0, 20) and opens a new island
    in.addData(KeyedIv(1L, 5L, 20L, ts(5)), KeyedIv(1L, 100L, 110L, ts(100)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("scoal_out")
      .as[ClosedIv].collect().toSet
    assert(got === Set(ClosedIv(1L, 0L, 20L)))   // [100,110) is still open
  }

  test("streamingAsof emits each left with its latest right once the watermark passes") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Ingest.{AsofEvent, AsofOut}
    val in = MemoryStream[AsofEvent]
    val q = Ingest.streamingAsof(in.toDS(), watermark = "10 seconds")
      .toDF().writeStream.format("memory")
      .queryName("sasof_out").outputMode("append").start()
    // rights at t=5 (id 50) and t=15 (id 51); lefts at t=10, t=20, and
    // an unmatched key
    in.addData(
      AsofEvent(1L, ts(5), is_left = false, 50L, 500L),
      AsofEvent(1L, ts(10), is_left = true, 100L, 0L),
      AsofEvent(1L, ts(15), is_left = false, 51L, 510L),
      AsofEvent(1L, ts(20), is_left = true, 101L, 0L),
      AsofEvent(2L, ts(8), is_left = true, 200L, 0L))
    q.processAllAvailable()
    // push the watermark far past every held left
    in.addData(AsofEvent(9L, ts(10000), is_left = false, 999L, 0L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sasof_out").as[AsofOut].collect()
      .map(o => o.id -> (o.r_id, o.r_rv)).toMap
    assert(got(100L) === (Some(50L), Some(500L)))  // latest right <= 10 is t=5
    assert(got(101L) === (Some(51L), Some(510L)))  // latest right <= 20 is t=15
    assert(got(200L) === (None, None))             // key 2 has no rights
    assert(got.size === 3)
  }

  test("streamingAsof expires a quiet key's retained right after the TTL") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Ingest.{AsofEvent, AsofOut}
    val in = MemoryStream[AsofEvent]
    // TTL 60s: the right at t=5 must be gone once the watermark is far
    // past t=5+60s, so the late left at t=20 finds nothing
    val q = Ingest.streamingAsof(in.toDS(), watermark = "10 seconds",
        rightTtlMs = 60 * 1000L)
      .toDF().writeStream.format("memory")
      .queryName("sasof_ttl").outputMode("append").start()
    in.addData(AsofEvent(1L, ts(5), is_left = false, 50L, 500L))
    q.processAllAvailable()
    // advance the watermark hours past the TTL (and let the timeout fire)
    in.addData(AsofEvent(9L, ts(40000), is_left = false, 999L, 0L))
    q.processAllAvailable()
    in.addData(AsofEvent(9L, ts(50000), is_left = false, 998L, 0L))
    q.processAllAvailable()
    // on-time left on key 1, far after the right's TTL: the as-of right
    // t=5 existed but has been evicted, so the match must be empty
    in.addData(AsofEvent(1L, ts(50050), is_left = true, 100L, 0L))
    q.processAllAvailable()
    in.addData(AsofEvent(9L, ts(90000), is_left = false, 997L, 0L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sasof_ttl").as[AsofOut].collect()
      .map(o => o.id -> (o.r_id, o.r_rv)).toMap
    assert(got(100L) === (None, None))
  }

  test("tumbling window counts per hour and type") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(10), 1, "click", 1.0, "{}"),
      Ev(2, ts(20), 2, "click", 2.0, "{}"),
      Ev(3, ts(3700), 1, "view", 3.0, "{}"),
      Ev(9, ts(60 * 60 * 10), 9, "x", 0.0, "{}"))
    runToMemory(Ingest.tumblingCounts(in.toDF(), "1 hour"), "win_out", "append")
    val rows = spark.table("win_out")
      .select($"event_type", $"n").as[(String, Long)].collect().toSet
    assert(rows.contains(("click", 2L)))
    assert(rows.contains(("view", 1L)))
  }

  test("streaming near-dup dedup keeps first doc per band signature") {
    implicit val sql = spark.sqlContext
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta", // exact dup
      "one two three four five six seven eight nine",
      "alpha beta gamma delta epsilon zeta eta theta extra tail here",
      "completely different words in this document right here",
      "xy") // too short to shingle -> full-text hash fallback
    val docsB = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, ts(i * 10), t) }
      .toDF("doc_id", "ts", "text")
    // ground truth from the SAME expression in batch: signature groups
    // (whether the near-dup at index 3 collides with index 0 is a
    // property of the band family, not of the streaming plumbing under
    // test); which MEMBER of a group survives inside one micro-batch
    // is not contractual, so assert exactly-one-per-group.
    val sig = coalesce(graft.text.TextOps.minhashBandSig($"text"), xxhash64($"text"))
    val groups = docsB.withColumn("sig", sig)
      .select($"sig", $"doc_id").as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    assert(groups.exists(g => g.contains(0L) && g.contains(1L))) // exact dups collide
    assert(groups.exists(g => g === Set(5L))) // short doc has its own group

    val in = MemoryStream[Doc]
    in.addData(texts.zipWithIndex.map { case (t, i) => Doc(i.toLong, ts(i * 10), t) }: _*)
    runToMemory(graft.streaming.Ingest.nearDedupStream(
      in.toDF().select($"doc_id", $"ts", $"text")), "neardedup_out", "append")
    val kept = spark.table("neardedup_out").select("doc_id").as[Long].collect().toSet
    assert(kept.size === groups.size)
    groups.foreach(g => assert(g.count(kept) === 1))
  }

  test("OR-construction streaming near-dedup matches the sequential cascade simulation") {
    implicit val sql = spark.sqlContext
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta", // exact dup: all bands collide
      "one two three four five six seven eight nine",
      "alpha beta gamma delta epsilon zeta eta theta extra tail",
      "one two three four five six seven eight nine ten eleven",
      "unrelated fresh content with none of the other words")
    // ground truth: simulate the 2-stage cascade with batch-computed
    // band signatures (stage 1 only sees stage 0's survivors)
    val sigs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select($"doc_id",
        coalesce(graft.text.TextOps.minhashBandSig($"text", 3, 0), xxhash64($"text")).as("s0"),
        coalesce(graft.text.TextOps.minhashBandSig($"text", 3, 1), xxhash64($"text")).as("s1"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val seen0 = scala.collection.mutable.Set.empty[Long]
    val seen1 = scala.collection.mutable.Set.empty[Long]
    val expected = sigs.collect {
      case (id, s0, s1) if seen0.add(s0) && seen1.add(s1) => id
    }.toSet
    assert(!expected.contains(1L)) // exact dup dropped
    assert(expected.contains(2L) && expected.contains(5L))

    val in = MemoryStream[Doc]
    val q = graft.streaming.Ingest.nearDedupStreamOr(
        in.toDF().select($"doc_id", $"ts", $"text"), bands = 2)
      .writeStream.format("memory").queryName("neardedup_or")
      .outputMode("append").start()
    // one doc per micro-batch: deterministic arrival order for the
    // cascade's state
    texts.zipWithIndex.foreach { case (t, i) =>
      in.addData(Doc(i.toLong, ts(i * 10), t)); q.processAllAvailable()
    }
    q.stop()
    val kept = spark.table("neardedup_or").select("doc_id").as[Long].collect().toSet
    assert(kept === expected)
  }

  test("stream probe against a static index drops docs colliding on any band") {
    implicit val sql = spark.sqlContext
    val index = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine")
      .zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text")
    val streamTexts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta", // exact dup of idx 100
      "one two three four five six seven eight nine ten", // near-dup of 101
      "completely fresh words that match nothing at all",
      "xy") // too short to shingle: full-text hash fallback, fresh
    // ground truth from the SAME per-band signatures computed in batch
    // (whether the near-dup collides is a band-family property, not
    // streaming plumbing under test)
    def bandSig(b: Int) = coalesce(
      graft.text.TextOps.minhashBandSig($"text", 3, b), xxhash64($"text"))
    val idxSigs = (0 until 2).map(b =>
      index.select(bandSig(b).as("s")).as[Long].collect().toSet)
    val expected = streamTexts.zipWithIndex.collect { case (t, i)
      if {
        val sigs = Seq(t).toDF("text")
          .select(bandSig(0).as("s0"), bandSig(1).as("s1"))
          .as[(Long, Long)].head()
        !idxSigs(0).contains(sigs._1) && !idxSigs(1).contains(sigs._2)
      } => i.toLong
    }.toSet
    assert(!expected.contains(0L)) // the exact dup must collide
    assert(expected.contains(2L) && expected.contains(3L))

    val in = MemoryStream[Doc]
    in.addData(streamTexts.zipWithIndex.map { case (t, i) =>
      Doc(i.toLong, ts(i * 10), t) }: _*)
    runToMemory(graft.streaming.Ingest.dedupAgainstIndex(
      in.toDF().select($"doc_id", $"ts", $"text"), index), "idxdedup_out",
      "append")
    val kept = spark.table("idxdedup_out").select("doc_id").as[Long].collect().toSet
    assert(kept === expected)
  }

  test("streaming VTT export writes cue files") {
    implicit val sql = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_vtt").toString
    val in = MemoryStream[Cap]
    in.addData(Cap(1, 1, 5, "hello there"), Cap(1, 65, 70, "second cue"))
    val q = graft.streaming.ExportSink.startVttSink(
      in.toDF(), s"$tmp/out", s"$tmp/ck")
    q.processAllAvailable(); q.stop()
    val body = spark.read.textFile(s"$tmp/out").collect().mkString("\n")
    assert(body.contains("00:00:01.000 --> 00:00:05.000"))
    assert(body.contains("00:01:05.000 --> 00:01:10.000"))
    assert(body.contains("hello there") && body.contains("second cue"))
  }

  test("streaming widget-JSON sink writes one document per batch") {
    implicit val sql = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_widget").toString
    val in = MemoryStream[Trk]
    val q = graft.streaming.ExportSink.startWidgetSink(
      in.toDF(), s"$tmp/out", s"$tmp/ck", "tracks")
    in.addData(Trk(1, 0, 100, "personA"), Trk(1, 200, 300, "personA"))
    q.processAllAvailable()
    in.addData(Trk(2, 10, 20, "personB"))
    q.processAllAvailable(); q.stop()
    val docs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
      .map(f => Files.readString(f.toPath))
    assert(docs.length === 2)
    assert(docs(0).contains("\"count\":2") && docs(0).contains("personA"))
    assert(docs(1).contains("\"count\":1") && docs(1).contains("personB"))
  }

  test("streaming widget sink handles the bbox kind via the formatter hook") {
    implicit val sql = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_widget_bbox").toString
    val in = MemoryStream[Bx]
    val q = graft.streaming.ExportSink.startWidgetSinkAs(
      in.toDF(), s"$tmp/out", s"$tmp/ck", "bboxes",
      graft.result.WidgetJson.bboxResult)
    in.addData(Bx(7, 3, 1, 0.1, 0.4, 0.2, 0.6), Bx(7, 3, 2, 0.5, 0.9, 0.1, 0.3))
    q.processAllAvailable(); q.stop()
    val doc = Files.readString(new java.io.File(s"$tmp/out")
      .listFiles().filter(_.getName.endsWith(".json")).head.toPath)
    assert(doc.contains("\"count\":2")) // count = number of boxes
    assert(doc.contains("\"bbox_x1\":0.1") && doc.contains("\"bbox_x1\":0.5"))
    assert(doc.contains("\"type\":\"bboxes\""))
  }

  test("streaming widget sink handles the frame and video kinds") {
    implicit val sql = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_widget_fv").toString
    // frame kind: (video_id, frame_number) rows
    val fin = MemoryStream[(Long, Long)]
    val fq = graft.streaming.ExportSink.startWidgetSinkAs(
      fin.toDF().toDF("video_id", "frame_number"),
      s"$tmp/fout", s"$tmp/fck", "frames",
      graft.result.WidgetJson.frameResult)
    fin.addData((4L, 120L), (4L, 240L))
    fq.processAllAvailable(); fq.stop()
    val fdoc = Files.readString(new java.io.File(s"$tmp/fout")
      .listFiles().filter(_.getName.endsWith(".json")).head.toPath)
    assert(fdoc.contains("\"count\":2") && fdoc.contains("\"min_frame\":120"))
    assert(fdoc.contains("\"type\":\"frames\""))
    // video kind: duplicate video ids collapse to one element
    val vin = MemoryStream[Long]
    val vq = graft.streaming.ExportSink.startWidgetSinkAs(
      vin.toDF().toDF("video_id"),
      s"$tmp/vout", s"$tmp/vck", "videos",
      graft.result.WidgetJson.videoResult)
    vin.addData(9L, 9L, 11L)
    vq.processAllAvailable(); vq.stop()
    val vdoc = Files.readString(new java.io.File(s"$tmp/vout")
      .listFiles().filter(_.getName.endsWith(".json")).head.toPath)
    assert(vdoc.contains("\"count\":2")) // 9 deduped, 11
    assert(vdoc.contains("\"video\":9") && vdoc.contains("\"video\":11"))
  }

  test("bottom_k aggregates across micro-batches (state-store path)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("v")
      .agg(graft.plans.BottomKAgg.bottomK(col("v"), 3).as("bk"))
      .writeStream.format("memory").queryName("bk_stream")
      .outputMode("complete").start()
    in.addData(50L, 10L, 50L)
    q.processAllAvailable()
    in.addData(5L, 40L, 10L)
    q.processAllAvailable()
    val got = spark.table("bk_stream").select("bk").as[Seq[Long]].head()
    q.stop()
    // k smallest DISTINCT across both batches: buffer serialized into
    // the state store between triggers, dedup preserved
    assert(got === Seq(5L, 10L, 40L))
  }

  test("session_window merges exactly-TOUCHING intervals (st21 boundary pin)") {
    // st21's parity with the batch island coalesce depends on Spark's
    // session merge unifying next.start == current.end (the <= merge
    // rule). The generated fixture may or may not contain a touching
    // pair at a given scale factor, so this spec pins the boundary
    // with injected rows: user 1's [0,10)+[10,15) MUST coalesce into
    // one session; user 2's [0,10)+[11,20) (1 s gap) must NOT. A
    // strict-overlap implementation would pass st21 on gap-free data
    // and silently diverge later — this test makes that a failure.
    implicit val sql = spark.sqlContext
    import graft.streaming.Ingest.KeyedIv
    def kiv(u: Long, s: Long, e: Long) = KeyedIv(u, s, e, ts(s))
    val in = MemoryStream[KeyedIv]
    val sess = in.toDS().toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"),
        concat((col("e") - col("s")).cast("string"), lit(" seconds"))))
      .agg(min(col("s")).as("min_s"), max(col("e")).as("max_e"))
      .select(col("user_id"), col("min_s"), col("max_e"))
    val q = sess.writeStream.format("memory").queryName("sess_touch")
      .outputMode("append").start()
    in.addData(kiv(1, 0, 10), kiv(1, 10, 15), kiv(2, 0, 10), kiv(2, 11, 20))
    q.processAllAvailable()
    // far-future sentinels advance the watermark past every session end
    in.addData(kiv(1, 100000, 100001), kiv(2, 100000, 100001))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_touch").as[(Long, Long, Long)].collect()
      .filter(_._2 < 100000).toSet
    assert(got === Set((1L, 0L, 15L), (2L, 0L, 10L), (2L, 11L, 20L)))
  }

  test("st22's watermark staging is pinned to the Spark 4.x late-filter") {
    // st22's oracle bakes Spark >= 3.4's two-phase watermark
    // (watermarkForLateEvents lags one batch behind
    // watermarkForEviction, verified empirically on 4.1); its morning
    // slice is staged with a >= 2-batch margin so only a wholesale
    // semantics change — not a one-batch boundary shift — can flip
    // the result. A Spark major upgrade could legitimately change the
    // boundary with no repo bug: if this fires, re-derive st22's
    // staging against the new filter before trusting a red hash.
    // pinned to the MINOR version: the one-batch late-filter lag is an
    // implementation detail verified empirically on 4.1, not a
    // documented contract — a 4.2 bump must fail here by name, not as
    // a mystery st22 hash break (r19 verdict nit #1)
    assert(spark.version.startsWith("4.1"),
      s"st22's late-drop staging was verified empirically on Spark 4.1; " +
        s"running on ${spark.version} — re-verify the " +
        "watermarkForLateEvents/watermarkForEviction lag before trusting " +
        "st22's oracle")
  }

  test("staging tolerates an all-empty micro-batch slice (ADVICE r19)") {
    // st16 slices documents by doc_id % 3 into three staged frames; a
    // corpus with NO doc ≡ 2 (mod 3) makes frame 2 empty, and a
    // partitioned write emits no dir for it — the fallback must stage
    // a 0-row file so micro-batch numbering stays dense instead of
    // sys.error-ing. Run the REAL query end-to-end on such a corpus.
    val tiny = Files.createTempDirectory("graft_tinysf")
    try {
      Seq((0L, "the customer waited"), (1L, "the customer paid"),
          (3L, "a slow scan"), (4L, "the merge window"))
        .toDF("doc_id", "text")
        .write.parquet(s"$tiny/documents.parquet")
      val out = SparkEntry.queries("st16_stream_index_parity")(
        spark, tiny.toString).collect()
      // "the customer" appears in docs 0 and 1
      assert(out.map(_.getLong(0)).toSet === Set(0L, 1L))
    } finally graft.queries.Q.rmTree(tiny)
  }

  test("ingestJob end-to-end: files -> dedup -> parquet") {
    val tmp = Files.createTempDirectory("graft_ingest").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ck = s"$tmp/ck"
    val batch = Seq(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(2, ts(5), 2, "view", 2.0, "{}")).toDF()
    batch.write.parquet(inDir)
    val q = Ingest.ingestJob(spark, inDir, outDir, ck)
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.select("event_id").distinct().count() === 2)
  }
}
