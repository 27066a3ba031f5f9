package graft.queries

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.Ingest
import Q._

/** Oracle-checked batch-equivalence for the streaming plane (S7/S8/S11
  * + the stream forms of R1 coalesce and the as-of join): each query
  * stages the events fixture as ORDERED files, runs the REAL
  * Structured Streaming pipeline over them — file source
  * (maxFilesPerTrigger=1, so state genuinely carries across
  * micro-batches), `flatMapGroupsWithState`, `foreachBatch` parquet
  * sink with checkpointing — and returns the streamed result, which
  * the DuckDB oracle then checks against the BATCH semantics
  * (r01's island SQL / x06's ASOF JOIN). A drift between the custom
  * state logic and the batch operators breaks the hash match.
  *
  * Determinism contract: all real rows ride the first file so no row
  * is ever behind the watermark on arrival; file order is pinned by
  * explicit modification times (the file source processes oldest
  * first); per-key SENTINEL rows in the last file close every real
  * island / flush every held left, so the streamed output is the
  * complete batch answer, not a watermark-dependent prefix. */
object StreamParityQueries {

  /** Sentinel epoch-second far beyond any wrapped fixture time. */
  private val SENT = 10000000L

  /** Delete a directory tree (no-op if absent). */
  private def rmTree(p: Path): Unit = Q.rmTree(p)

  /** Write each frame as ONE parquet file into a shared stream-input
    * dir, with strictly increasing modification times so the file
    * source replays them as ordered micro-batches. Each staging
    * scratch dir is removed as soon as its part file has been moved. */
  private def stage(base: Path, dfs: Seq[DataFrame]): String = {
    val inDir = base.resolve("in")
    Files.createDirectories(inDir)
    // ONE job stages every frame: tag each with its batch ordinal,
    // repartition BY the tag (each ordinal lands in exactly one task)
    // and partitionBy it — each __b=i dir then holds exactly one part
    // file, which becomes ordered micro-batch i. The per-frame
    // repartition(1) writes this replaces cost one full job round-trip
    // per frame (3-frame fixtures paid ~3x the scheduling + scan).
    val tmp = base.resolve("stage")
    dfs.zipWithIndex
      .map { case (df, i) => df.withColumn("__b", lit(i)) }
      .reduce(_.unionByName(_))
      .repartition(col("__b"))
      .write.partitionBy("__b").mode("overwrite").parquet(tmp.toString)
    dfs.indices.foreach { i =>
      val bDir = tmp.resolve(s"__b=$i")
      // an all-empty frame produces NO __b=i dir (a partitioned write
      // only creates directories for values that exist — unlike the
      // old repartition(1) write, whose single eager writer always
      // emitted a part file). Residue-class slices can be empty at
      // tiny scale factors; the stream contract needs a file per
      // ordinal so batch numbering stays dense — write a 0-row
      // parquet file with the frame's schema instead of failing.
      if (!Files.exists(bDir)) {
        dfs(i).limit(0).coalesce(1)
          .write.mode("overwrite").parquet(bDir.toString)
      }
      val listing = Files.list(bDir)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(sys.error(s"no part file under $bDir"))
        finally listing.close()
      val dst = inDir.resolve(f"b$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    rmTree(tmp)
    inDir.toString
  }

  /** [[stage]] for a MULTI-SOURCE query: every side's frames ride ONE
    * staging job (union under a shared schema, tagged by side and
    * ordinal, partitioned write on both tags), then each (side,
    * ordinal) part file is moved into that side's own input dir. A
    * stream-stream join previously paid one staging job per leg; this
    * is the same single-job treatment stage() gave the per-frame
    * writes. All sides' frames must share one schema — rename to a
    * generic shape before staging and back after readStream. */
  private def stageSides(base: Path,
      sides: Seq[(String, Seq[DataFrame])]): Map[String, String] = {
    val inRoot = base.resolve("in")
    val tmp = base.resolve("stage")
    sides.flatMap { case (side, dfs) =>
      dfs.zipWithIndex.map { case (df, i) =>
        df.withColumn("__side", lit(side)).withColumn("__b", lit(i)) }
    }.reduce(_.unionByName(_))
      .repartition(col("__side"), col("__b"))
      .write.partitionBy("__side", "__b").mode("overwrite").parquet(tmp.toString)
    val dirs = sides.map { case (side, dfs) =>
      val inDir = inRoot.resolve(side)
      Files.createDirectories(inDir)
      dfs.indices.foreach { i =>
        val bDir = tmp.resolve(s"__side=$side").resolve(s"__b=$i")
        if (!Files.exists(bDir)) { // empty slice: see stage()
          dfs(i).limit(0).coalesce(1)
            .write.mode("overwrite").parquet(bDir.toString)
        }
        val listing = Files.list(bDir)
        val part =
          try listing.iterator().asScala
            .find(_.getFileName.toString.startsWith("part-"))
            .getOrElse(sys.error(s"no part file under $bDir"))
          finally listing.close()
        val dst = inDir.resolve(f"b$i%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst,
          FileTime.fromMillis(1700000000000L + i * 60000L))
      }
      side -> inDir.toString
    }.toMap
    rmTree(tmp)
    dirs
  }

  // one completed sink dir per query is retained for the caller's lazy
  // read; the previous execution's tree is reclaimed on re-run —
  // see Q.freshBase (shared with the served-index queries)
  private def freshBase(tag: String): Path = Q.freshBase(tag)

  /** Staged input memoized per (query, corpus): the ordered-file
    * fixture is a pure function of the testdata, so repeated samples
    * of one parity query must not re-pay its staging job — the same
    * build/serve split the served-index queries get from Q.memoIndex
    * (staging wall time lands in Bench's index_build_sec under
    * `<tag>in`, timed samples measure the STREAMING run alone). The
    * checkpoint and sink stay per-run under freshBase — only the
    * read-only input is shared. */
  private def stagedInput(tag: String, d: String)
                         (dfs: => Seq[DataFrame]): String = {
    val dir = Q.memoIndex(tag + "in", d) { dd =>
      stage(java.nio.file.Paths.get(dd), dfs); ()
    }
    java.nio.file.Paths.get(dir, "in").toString
  }

  /** [[stagedInput]] for the multi-source form (st23's two legs).
    * `sideNames` is eager so a memo HIT never constructs the frames —
    * and a miss builds them exactly once (ADVICE r20: the by-name
    * `sides` was evaluated twice on a miss and once on every hit,
    * rebuilding both DataFrame legs just to read the side names). */
  private def stagedSides(tag: String, d: String, sideNames: Seq[String])
      (sides: => Seq[(String, Seq[DataFrame])]): Map[String, String] = {
    val dir = Q.memoIndex(tag + "in", d) { dd =>
      stageSides(java.nio.file.Paths.get(dd), sides); ()
    }
    sideNames.map { side =>
      side -> java.nio.file.Paths.get(dir, "in", side).toString }.toMap
  }

  /** The shared st14/st21/st24 fixture: the r01 click intervals split
    * at mid-day (islands genuinely continue across the micro-batch
    * boundary) plus the per-user island-closing sentinel in the last
    * frame. ONE builder under the shared 'st14in' memo tag — the three
    * queries previously carried verbatim copies, and whichever ran
    * first in the JVM won (ADVICE r20: a drifted copy would silently
    * stream a different fixture than its code states). */
  private def st14Frames(s: SparkSession, d: String): Seq[DataFrame] = {
    val iv = evTyped(s, d, "click")
      .select(col("user_id"), col("s"), col("e"),
        timestamp_seconds(col("s")).as("ts"))
    val sent = iv.select(col("user_id")).distinct()
      .select(col("user_id"), lit(SENT).as("s"), lit(SENT + 1).as("e"),
        timestamp_seconds(lit(SENT)).as("ts"))
    Seq(iv.filter(col("s") < 43200),
      iv.filter(col("s") >= 43200).unionByName(sent))
  }

  /** Conf-isolated session for the STREAMING leg of a parity query.
    * Stateful micro-batches pay a fixed per-batch cost PER SHUFFLE
    * PARTITION (one state store instance each: load + commit + delta
    * file per batch), and the fixture planes here hold a few thousand
    * keys in a handful of micro-batches — at the session default of 32
    * partitions ~94% of that state machinery runs empty (measured at
    * sf0.1: the st20-st24 family total 18.3 s with 32-partition
    * state, 11.6 s with 4, 10.8 s with 2). A `newSession()` clone
    * shares the SparkContext but gets its own SQLConf, so pinning the
    * streaming leg to 2 partitions never leaks into the batch corpus
    * the bench interleaves with (the conf is also baked into each
    * query's fresh checkpoint, so there is no cross-run drift). On a
    * real cluster this is the same knob sized up — state partitions
    * should track key volume, not the batch default. */
  private def streamSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss
  }

  /** Run a streaming Dataset to completion through a foreachBatch
    * parquet sink; returns the sink dir read back with `schema`. */
  private def runToParquet[T](s: SparkSession, base: Path,
      out: Dataset[T], schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val outDir = base.resolve("out")
    Files.createDirectories(outDir)
    val q = out.toDF().writeStream.outputMode("append")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        // write the batch AS PARTITIONED — the sink dir is read back
        // wholesale, so file count is irrelevant, and the former
        // `repartition(1)` (one cosmetic file per micro-batch) paid a
        // full extra exchange+stage in EVERY batch of every parity
        // query (r21; StFloor measured the per-batch machinery at
        // ~0.27 s — the sink job is a large slice of it). The earlier
        // coalesce(1) experiment stands: never narrow the upstream
        // stateful stage either.
        b.write.mode("append").parquet(outDir.toString)
      }
      .start()
    q.processAllAvailable(); q.stop()
    // only out/ is read after this point — drop the staged input and
    // checkpoint now (staging scratch was removed inside stage());
    // out/ itself is reclaimed by freshBase() on the next execution
    Seq("in", "ckpt").foreach(n => rmTree(base.resolve(n)))
    s.read.schema(schema).parquet(outDir.toString)
  }

  val queries: Map[String, QFn] = Map(
    // ST14: streaming R1 — file source -> flatMapGroupsWithState
    // island state -> parquet sink, over the SAME click intervals r01
    // coalesces in batch. Split at mid-day so islands genuinely
    // continue across the micro-batch boundary; the per-user sentinel
    // in the last batch closes each final island (and is filtered from
    // the result), so streamed output == batch coalesce exactly and
    // the r01 island SQL is the oracle.
    "st14_stream_coalesce_parity" -> ((s, d) => {
      import s.implicits._
      val base = freshBase("st14")
      val inDir = stagedInput("st14", d)(st14Frames(s, d))
      val schema = org.apache.spark.sql.Encoders.product[Ingest.KeyedIv].schema
      val src = streamSession(s).readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      // the huge watermark delay keeps every fixture row on-time under
      // any file race; island closure comes from the sentinel, not
      // from timeout flushes, so the output set is exact
      val streamed = Ingest.streamingCoalesce(
        src.as[Ingest.KeyedIv], gap = 0, watermark = "400 days")
      runToParquet(s, base, streamed,
          org.apache.spark.sql.Encoders.product[Ingest.ClosedIv].schema)
        .filter(col("s") < SENT)
        .orderBy("user_id", "s", "e")
    }),

    // ST15: streaming as-of — the stream-stream form of x06: clicks
    // (lefts) matched to the latest purchase at or before them. All
    // real rows in batch 1 (held in state: the watermark starts at 0),
    // a far-future sentinel right in batch 2 advances the watermark so
    // every held left flushes via event-time timeout. rightTtl (2^45
    // ms ≈ 1100 years) exceeds the fixture-to-sentinel jump (~977
    // years to the year-3000 sentinel), so no retained right can
    // expire before a pending left flushes under ANY flush ordering —
    // parity must not hinge on streamingAsof matching ready lefts
    // before its TTL prune within one invocation. Tie-breaking
    // (latest t, then max id) mirrors x06's max-event_id dedup +
    // ASOF JOIN.
    "st15_stream_asof_parity" -> ((s, d) => {
      import s.implicits._
      val base = freshBase("st15")
      val inDir = stagedInput("st15", d) {
        val raw = Tables.events(tune(s), d)
        val e = raw.select(col("event_id"), col("user_id"), col("event_type"),
          tsSec(raw).as("t"), col("value"))
        val lefts = e.filter(col("event_type") === "click")
          .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
            lit(true).as("is_left"), col("event_id").as("id"), lit(0L).as("rv"))
        val rights = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
            lit(false).as("is_left"), col("event_id").as("id"),
            cents(col("value")).as("rv"))
        val sent = s.range(1).select(lit(9999999999L).as("user_id"),
          timestamp_seconds(lit(32503680000L)).as("ts"),
          lit(false).as("is_left"), lit(0L).as("id"), lit(0L).as("rv"))
        Seq(lefts.unionByName(rights), sent)
      }
      val schema = org.apache.spark.sql.Encoders.product[Ingest.AsofEvent].schema
      val src = streamSession(s).readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val streamed = Ingest.streamingAsof(
        src.as[Ingest.AsofEvent], watermark = "2 hours", rightTtlMs = 1L << 45)
      runToParquet(s, base, streamed,
          org.apache.spark.sql.Encoders.product[Ingest.AsofOut].schema)
        .select(col("id").as("event_id"), col("user_id"),
          expr("t_ms div 1000").as("t"),
          col("r_id").as("p_event_id"), col("r_rv").as("p_cents"))
        .orderBy("event_id")
    }),

    // ST16: STREAMING incremental index maintenance — the daily-crawl
    // shape run as an actual stream: documents arrive as ordered
    // micro-batches (file source, maxFilesPerTrigger=1), each batch is
    // tokenized and appended to the persisted caption index via
    // PhraseSearch.appendIndex inside foreachBatch, guarded by a
    // batchId ledger marker (foreachBatch is at-least-once; the
    // marker is the S12 job-ledger skip-processed pattern applied to
    // index maintenance — a replayed batch must not double its
    // postings). The index starts EMPTY (initIndex persists only the
    // modulus) so the whole layout is stream-built. Serving ph01's
    // phrase from it must match the batch answer exactly — ph01's
    // oracle is the gate.
    "st16_stream_index_parity" -> ((s, d) => {
      val dir = Q.memoIndex("st16idx", d) { dir =>
        graft.text.PhraseSearch.initIndex(s, dir, nBuckets = 64)
        val base = freshBase("st16")
        val docs = Tables.documents(tune(s), d).select(col("doc_id"), col("text"))
        val inDir = stage(base,
          (0 until 3).map(i => docs.filter(pmod(col("doc_id"), lit(3)) === i)))
        val src = streamSession(s).readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val applied = base.resolve("applied")
        Files.createDirectories(applied)
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], batchId: Long) =>
            val marker = applied.resolve(s"batch-$batchId")
            if (!Files.exists(marker)) {
              graft.text.PhraseSearch.appendIndex(
                b.select(col("doc_id"),
                  posexplode(split(col("text"), " ")).as(Seq("pos", "tok"))),
                dir)
              // the LSM trigger a long-running ingest needs: amortized
              // one rewrite per maxSegments appends, invisible to
              // serves (ph01's oracle stays the gate) — threshold 2
              // so three micro-batches actually exercise it
              graft.text.PhraseSearch.autoCompact(s, dir, maxSegments = 2)
              Files.createFile(marker)
              ()
            }
          }
          .start()
        q.processAllAvailable(); q.stop()
        Seq("in", "ckpt", "applied").foreach(n => rmTree(base.resolve(n)))
      }
      graft.text.PhraseSearch.servedPhraseHits(s, dir, Seq("the", "customer"))
        .orderBy("doc_id", "pos")
    }),

    // ST17: CDC index maintenance from a change stream — the
    // streaming form of ph19's diff-driven sync. The index is built
    // in batch on yesterday's snapshot (t63's derivation), then a
    // stream of change records (op ∈ delete/upsert, doc_id, text) —
    // the t63 diff split into 3 ordered micro-batches — is applied in
    // foreachBatch: each batch tombstones its deletes and upserts its
    // changed/added docs, and a batchId ledger makes the apply
    // idempotent under micro-batch retries (exactly-once maintenance,
    // S12's ledger pattern on the write side). The final index must
    // serve exactly what an index built on TODAY's corpus serves —
    // ph01's oracle verbatim. This is the production tail of the
    // lifecycle: a crawler emits CDC, the index absorbs it in
    // batch-sized sidecar writes, the serving layout never rebuilds.
    "st17_stream_cdc_parity" -> ((s, d) => {
      val dir = Q.memoIndex("st17idx", d) { dir =>
        val docs = Tables.documents(tune(s), d).select(col("doc_id"), col("text"))
        val old = docs.filter(col("doc_id") % 10 =!= 2)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 1, substring(col("text"), 1, 40))
              .otherwise(col("text")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        def tok(df: DataFrame) =
          df.select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        graft.text.PhraseSearch.writeIndex(tok(old), dir, nBuckets = 64)
        val diff = docs.join(
          old.select(col("doc_id"), col("text").as("old_text")),
          Seq("doc_id"), "full_outer")
        val cdc = diff.filter(col("text").isNull)
          .select(lit("delete").as("op"), col("doc_id"),
            lit(null).cast("string").as("text"))
          .unionByName(diff.filter(col("text").isNotNull &&
              (col("old_text").isNull || col("text") =!= col("old_text")))
            .select(lit("upsert").as("op"), col("doc_id"), col("text")))
        val base = freshBase("st17")
        val inDir = stage(base,
          (0 until 3).map(i => cdc.filter(pmod(col("doc_id"), lit(3)) === i)))
        val src = streamSession(s).readStream.schema(cdc.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val applied = base.resolve("applied")
        Files.createDirectories(applied)
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], batchId: Long) =>
            val marker = applied.resolve(s"batch-$batchId")
            if (!Files.exists(marker)) {
              graft.text.PhraseSearch.deleteFromIndex(
                b.filter(col("op") === "delete").select("doc_id"), dir)
              graft.text.PhraseSearch.upsertIndex(
                tok(b.filter(col("op") === "upsert")
                  .select("doc_id", "text")), dir)
              Files.createFile(marker)
              ()
            }
          }
          .start()
        q.processAllAvailable(); q.stop()
        Seq("in", "ckpt", "applied").foreach(n => rmTree(base.resolve(n)))
      }
      graft.text.PhraseSearch.servedPhraseHits(s, dir, Seq("the", "customer"))
        .orderBy("doc_id", "pos")
    }),

    // ST18: STREAMING IVF index maintenance — st16's shape on the
    // vector plane. The coarse quantizer is fitted ONCE in batch on a
    // bootstrap slice (vec_id ≡ 0 mod 7 — production fits the
    // quantizer offline on a sample, then freezes it), and the other
    // six slices arrive as ordered micro-batches, each appended via
    // IntKMeans.appendIndex inside foreachBatch behind the batchId
    // ledger (a replayed batch must not double its cell rows).
    // Frozen-centroid assignment makes append order irrelevant to the
    // final contents, so the stream-built index must serve exactly
    // the bootstrap-fit + frozen-assignment answer — v30's oracle
    // re-split on the bootstrap predicate.
    "st18_stream_ivf_parity" -> ((s, d) => {
      val e = Tables.embeddings(tune(s), d)
      val dir = Q.memoIndex("st18idx", d) { dir =>
        graft.similarity.IntKMeans.writeIndex(
          e.filter(col("vec_id") % 7 === 0), dir, nlist = 16)
        val base = freshBase("st18")
        val inDir = stage(base,
          (1 until 7).map(i => e.filter(pmod(col("vec_id"), lit(7)) === i)))
        val src = streamSession(s).readStream.schema(e.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val applied = base.resolve("applied")
        Files.createDirectories(applied)
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], batchId: Long) =>
            val marker = applied.resolve(s"batch-$batchId")
            if (!Files.exists(marker)) {
              graft.similarity.IntKMeans.appendIndex(b, dir)
              // the IVF mirror of st16's LSM trigger: six appended
              // batches, so a threshold of 3 compacts mid-stream and
              // the parity oracle proves it invisible
              graft.similarity.IntKMeans.autoCompact(s, dir, maxSegments = 3)
              Files.createFile(marker)
              ()
            }
          }
          .start()
        q.processAllAvailable(); q.stop()
        Seq("in", "ckpt", "applied").foreach(n => rmTree(base.resolve(n)))
      }
      graft.similarity.IntKMeans
        .servedTopK(s, dir, e.filter(col("vec_id") < 5), k = 10, nprobe = 4)
        .orderBy("q_id", "rank")
    }),

    // ST19: STREAMING RE-ENCODE — st17's CDC shape on the vector
    // plane. The index starts STALE (v34's corrupted corpus: vectors
    // ≡ 2 mod 5 mis-encoded, ≡ 0 mod 11 never encoded) and the
    // corrected embeddings arrive as micro-batches of upserts — the
    // embedding-model-refresh feed — each applied via
    // IntKMeans.upsertIndex behind the batchId ledger. Upserted ids
    // are disjoint across batches, so seq-versioned tombstones make
    // the final visibility independent of batch order/count: the
    // stream-converged index must serve exactly v34's single-batch
    // upsert answer (the stale fit's frozen quantizer, corrected rows
    // on the stored scale).
    "st19_stream_reencode_parity" -> ((s, d) => {
      val e = Tables.embeddings(tune(s), d)
      val dir = Q.memoIndex("st19idx", d) { dir =>
        val stale = e.filter(col("vec_id") % 11 =!= 0)
          .withColumn("embedding",
            when(col("vec_id") % 5 === 2,
              transform(col("embedding"), x => -x))
              .otherwise(col("embedding")))
        graft.similarity.IntKMeans.writeIndex(stale, dir, nlist = 16)
        val fixes = e.filter(col("vec_id") % 5 === 2 || col("vec_id") % 11 === 0)
        val base = freshBase("st19")
        val inDir = stage(base,
          (0 until 3).map(i => fixes.filter(pmod(col("vec_id"), lit(3)) === i)))
        val src = streamSession(s).readStream.schema(e.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val applied = base.resolve("applied")
        Files.createDirectories(applied)
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], batchId: Long) =>
            val marker = applied.resolve(s"batch-$batchId")
            if (!Files.exists(marker)) {
              graft.similarity.IntKMeans.upsertIndex(b, dir)
              Files.createFile(marker)
              ()
            }
          }
          .start()
        q.processAllAvailable(); q.stop()
        Seq("in", "ckpt", "applied").foreach(n => rmTree(base.resolve(n)))
      }
      graft.similarity.IntKMeans
        .servedTopK(s, dir, e.filter(col("vec_id") < 5), k = 10, nprobe = 4)
        .orderBy("q_id", "rank")
    }),

    // ST20: the strided lexicon window-density macro (e37) computed
    // INCREMENTALLY over a document stream — documents arrive as 3
    // ordered micro-batches; each batch tokenizes its docs, filters
    // through the broadcast lexicon, explodes hits to their covering
    // windows and appends its scored segments. The (doc, window)
    // aggregation key never crosses documents, so per-batch
    // aggregation composes to the batch answer with NO cross-batch
    // state — the stateless tail of §2.9 (contrast st14, whose island
    // state genuinely carries). Oracle = e37's SQL verbatim: arrival
    // batching must be invisible in the result.
    "st20_stream_density_parity" -> ((s, d) => {
      import s.implicits._
      val base = freshBase("st20")
      val docsDf = Tables.documents(tune(s), d)
        .select(col("doc_id"), col("text"))
      val inDir = stagedInput("st20", d) {
        (0 until 3).map(i => docsDf.filter(pmod(col("doc_id"), lit(3)) === i))
      }
      val src = streamSession(s).readStream.schema(docsDf.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val lexDf = broadcast(Seq(("customer", 2L), ("slow", 1L),
        ("scan", 1L), ("merge", 1L), ("window", 1L)).toDF("tok", "wgt"))
      val scored = src
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .join(lexDf, "tok")
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("wgt"))
        .withColumn("w", explode(expr(
          "sequence(((greatest(p - 49, 0) + 9) div 10) * 10, (p div 10) * 10, 10)")))
      val outDir = base.resolve("out")
      Files.createDirectories(outDir)
      val q = scored.writeStream.outputMode("append")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.groupBy(col("doc_id"), col("w"))
            .agg(sum(col("wgt")).as("score"))
            .filter(col("score") >= 3)
            .select(col("doc_id"), col("w").as("seg_start"),
              (col("w") + 50).as("seg_end"), col("score"))
            // as-partitioned write — see runToParquet (r21)
            .write.mode("append").parquet(outDir.toString)
        }
        .start()
      q.processAllAvailable(); q.stop()
      Seq("in", "ckpt").foreach(n => rmTree(base.resolve(n)))
      s.read.parquet(outDir.toString).orderBy("doc_id", "seg_start")
    }),

    // ST21: streaming coalesce via the BUILT-IN session_window — the
    // declarative twin of st14's flatMapGroupsWithState. A DYNAMIC
    // per-event gap of (e - s) seconds makes each interval the session
    // span [s, e), and Spark's session merge (next.start <= current
    // .end unifies, so touching intervals merge like the batch island
    // SQL) IS interval coalesce; min(s)/max(e) are aggregated as
    // integer seconds so the emitted rows are exact. Same staging and
    // sentinel protocol as st14: the 0-second watermark trails each
    // batch's max event time, the mid-day split keeps batch-2 rows
    // on time, and the far-future sentinel closes every real session
    // (its own session filtered out). The builder contract prefers
    // built-in operators over custom state — this row pins the
    // built-in to both the custom op (st14) and the batch oracle.
    "st21_stream_session_parity" -> ((s, d) => {
      val base = freshBase("st21")
      // same fixture as st14 — share its memoized staging
      val inDir = stagedInput("st14", d)(st14Frames(s, d))
      val schema = org.apache.spark.sql.Encoders.product[Ingest.KeyedIv].schema
      val src = streamSession(s).readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val sess = src
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"),
          concat((col("e") - col("s")).cast("string"), lit(" seconds"))))
        .agg(min(col("s")).as("min_s"), max(col("e")).as("max_e"))
        .select(col("user_id"), col("min_s").as("s"), col("max_e").as("e"))
      runToParquet(s, base, sess,
          org.apache.spark.sql.Encoders.product[Ingest.ClosedIv].schema)
        .filter(col("s") < SENT)
        .orderBy("user_id", "s", "e")
    }),

    // ST22: watermark LATE-DATA semantics as an oracle-checked
    // contract, over the family's first TUMBLING-window aggregate —
    // the §2.9 behavior the parity rows hold at zero (their staging
    // keeps every row on time). Spark ≥3.4 filters late inputs
    // against the PREVIOUS batch's watermark while evicting against
    // the current one (watermarkForLateEvents vs watermarkForEviction
    // — verified empirically on 4.1: a late row one batch behind the
    // advance still lands; two batches behind is dropped). So the
    // morning slice (< 20000) is staged TWO batches after the mid-day
    // slice that advances the watermark: b0 = [20000, 43200), b1 =
    // evening (>= 43200), b2 = morning + sentinel — by b2 the
    // late-events watermark is b1's (~86399), >66000 s above every
    // morning row; nothing rides the boundary. Streamed result must
    // equal the batch tumbling aggregate of exactly the on-time rows;
    // the oracle bakes the same arrival split, so a drop-boundary
    // drift (or a watermark that silently stopped filtering) breaks
    // the hash.
    "st22_stream_late_drop" -> ((s, d) => {
      val base = freshBase("st22")
      val inDir = stagedInput("st22", d) {
        val iv = evTyped(s, d, "click")
          .select(col("user_id"), col("s"), col("e"),
            timestamp_seconds(col("s")).as("ts"))
        val sent = iv.select(col("user_id")).distinct()
          .select(col("user_id"), lit(SENT).as("s"), lit(SENT + 1).as("e"),
            timestamp_seconds(lit(SENT)).as("ts"))
        Seq(iv.filter(col("s") >= 20000 && col("s") < 43200),
          iv.filter(col("s") >= 43200),
          iv.filter(col("s") < 20000).unionByName(sent))
      }
      val schema = org.apache.spark.sql.Encoders.product[Ingest.KeyedIv].schema
      val src = streamSession(s).readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val agg = src
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), window(col("ts"), "600 seconds"))
        .agg(count(lit(1)).as("n"),
          min(col("s")).as("min_s"), max(col("e")).as("max_e"))
        .select(col("user_id"),
          col("window.start").cast("long").as("win_s"),
          col("window.end").cast("long").as("win_e"),
          col("n"), col("min_s"), col("max_e"))
      val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, win_s BIGINT, win_e BIGINT, " +
          "n BIGINT, min_s BIGINT, max_e BIGINT")
      runToParquet(s, base, agg.toDF(), outSchema)
        .filter(col("min_s") < SENT)
        .orderBy("user_id", "win_s")
    }),

    // ST23: BUILT-IN stream-stream inner join — clicks x purchases on
    // the user key with a watermarked event-time range (purchase
    // within the 600 s before the click), both sides genuinely
    // streamed as ordered micro-batches. Inner-join emission needs no
    // closure signal (matches emit as both sides arrive; watermarks
    // only bound state), so a 2-day delay keeps every fixture row's
    // state live and the streamed output IS the complete batch join —
    // the oracle is the plain batch range join. The declarative
    // sibling of st15's custom as-of state (which needed
    // flatMapGroupsWithState because 'latest at-or-before' is an
    // argmax, not a range predicate).
    "st23_stream_stream_join" -> ((s, d) => {
      // both source legs share ONE conf clone so the join's state
      // partitioning is consistent across sides — and ONE staging job
      // (stageSides): the two-legs-two-jobs residue the r19 verdict
      // named is gone
      val ss = streamSession(s)
      def plane(typ: String) = evTyped(s, d, typ)
        .select(col("event_id").as("id"), col("user_id").as("uid"),
          col("s"), timestamp_seconds(col("s")).as("ts"))
      val generic = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, uid BIGINT, s BIGINT, ts TIMESTAMP")
      val base = freshBase("st23")
      val inDirs = stagedSides("st23", d, Seq("l", "r"))(Seq("l", "r").map { p =>
        val df = plane(if (p == "l") "click" else "purchase")
        p -> Seq(df.filter(col("s") < 43200), df.filter(col("s") >= 43200))
      })
      def src(p: String) =
        ss.readStream.schema(generic)
          .option("maxFilesPerTrigger", 1).parquet(inDirs(p))
          .select(col("id").as(s"${p}_id"), col("uid").as(s"${p}_uid"),
            col("s").as(s"${p}_s"), col("ts").as(s"${p}_ts"))
          .withWatermark(s"${p}_ts", "2 days")
      val joined = src("l")
        .join(src("r"),
          col("l_uid") === col("r_uid") &&
            col("r_ts") >= col("l_ts") - expr("INTERVAL 600 SECONDS") &&
            col("r_ts") <= col("l_ts"))
        .select(col("l_uid").as("user_id"), col("l_id"), col("r_id"),
          col("l_s"), col("r_s"))
      val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, l_id BIGINT, r_id BIGINT, l_s BIGINT, r_s BIGINT")
      runToParquet(s, base, joined, outSchema)
        .orderBy("user_id", "l_s", "r_s", "l_id", "r_id")
    }),

    // ST24: SLIDING-window aggregate (size 600 s, slide 300 s) —
    // completes the tumbling (st22) / session (st21) / sliding
    // trio of §2.9's built-in window forms. Every event lands in
    // exactly 2 windows (Spark emits size/slide assignments,
    // including the negative-start window for s < 300 — the oracle
    // generates the same two starts per row). Same sentinel protocol;
    // sentinel-only windows are filtered by their min_s.
    "st24_stream_sliding" -> ((s, d) => {
      val base = freshBase("st24")
      // same fixture as st14 — share its memoized staging
      val inDir = stagedInput("st14", d)(st14Frames(s, d))
      val schema = org.apache.spark.sql.Encoders.product[Ingest.KeyedIv].schema
      val src = streamSession(s).readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val agg = src
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), window(col("ts"), "600 seconds", "300 seconds"))
        .agg(count(lit(1)).as("n"),
          min(col("s")).as("min_s"), max(col("e")).as("max_e"))
        .select(col("user_id"),
          col("window.start").cast("long").as("win_s"),
          col("window.end").cast("long").as("win_e"),
          col("n"), col("min_s"), col("max_e"))
      val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, win_s BIGINT, win_e BIGINT, " +
          "n BIGINT, min_s BIGINT, max_e BIGINT")
      runToParquet(s, base, agg.toDF(), outSchema)
        .filter(col("min_s") < SENT)
        .orderBy("user_id", "win_s")
    }))

  val oracle: Map[String, String] = Map(
    // the streamed islands must equal the BATCH island coalesce —
    // r01's oracle verbatim
    "st14_stream_coalesce_parity" ->
      s"""${coalesceSql(evSql("click"))}
         |ORDER BY user_id, s, e""".stripMargin,

    // the streamed as-of must equal the BATCH as-of — x06's oracle
    // (dedup to the max event_id per (user, second), then ASOF LEFT)
    "st15_stream_asof_parity" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
         |    epoch_ns(ts)//1000000000 AS t, value FROM events),
         |clicks AS (SELECT event_id, user_id, t FROM e
         |           WHERE event_type = 'click'),
         |purchases AS (
         |  SELECT user_id, t, p_event_id, p_cents FROM (
         |    SELECT user_id, t, event_id AS p_event_id,
         |      ${centsSql("value")} AS p_cents,
         |      row_number() OVER (PARTITION BY user_id, t
         |                         ORDER BY event_id DESC) AS rn
         |    FROM e WHERE event_type = 'purchase') p0
         |  WHERE rn = 1)
         |SELECT c.event_id, c.user_id, c.t, p.p_event_id, p.p_cents
         |FROM clicks c ASOF LEFT JOIN purchases p
         |  ON c.user_id = p.user_id AND c.t >= p.t
         |ORDER BY c.event_id""".stripMargin,

    // the stream-built index must serve EXACTLY what the in-process
    // phrase search computes — ph01's oracle verbatim
    "st16_stream_index_parity" -> PhraseQueries.oracle("ph01_phrase_hits"),

    // the CDC-synced index must serve exactly what an index built on
    // today's corpus serves — ph01's oracle verbatim
    "st17_stream_cdc_parity" -> PhraseQueries.oracle("ph01_phrase_hits"),

    // the stream-built IVF must serve the bootstrap-fit +
    // frozen-assignment answer — v30's oracle on the mod-7 split
    "st18_stream_ivf_parity" ->
      SimilarityQueries.ivfAppendedSqlWith("TRUE", "vec_id % 7 = 0"),

    // the stream-converged re-encode must serve v34's single-batch
    // upsert answer exactly — batch order/count must not matter
    "st19_stream_reencode_parity" -> SimilarityQueries.ivfUpsertedSql,

    // streamed density must equal the batch macro — e37's oracle
    // verbatim (arrival batching is invisible)
    "st20_stream_density_parity" ->
      EsperCatalogQueries.oracle("e37_window_density"),

    // the built-in session_window must equal the batch island
    // coalesce — r01's oracle verbatim (and therefore st14's)
    "st21_stream_session_parity" ->
      s"""${coalesceSql(evSql("click"))}
         |ORDER BY user_id, s, e""".stripMargin,

    // streamed = batch tumbling aggregate of exactly the ON-TIME rows
    // (the morning slice arrives two batches behind the watermark
    // advance and is dropped)
    "st22_stream_late_drop" ->
      s"""SELECT user_id, (s // 600) * 600 AS win_s,
         |  (s // 600) * 600 + 600 AS win_e,
         |  count(*) AS n, min(s) AS min_s, max(e) AS max_e
         |FROM (${evSql("click")}) ev WHERE s >= 20000
         |GROUP BY 1, 2, 3
         |ORDER BY user_id, win_s""".stripMargin,

    // streamed inner join = the batch range join, arrival batching
    // invisible
    "st23_stream_stream_join" ->
      s"""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
         |  l.s AS l_s, r.s AS r_s
         |FROM (${evSql("click")}) l
         |JOIN (${evSql("purchase")}) r
         |  ON r.user_id = l.user_id
         |  AND r.s >= l.s - 600 AND r.s <= l.s
         |ORDER BY l.user_id, l_s, r_s, l_id, r_id""".stripMargin,

    // each row contributes to exactly its two sliding windows
    "st24_stream_sliding" ->
      s"""SELECT user_id, w AS win_s, w + 600 AS win_e, count(*) AS n,
         |  min(s) AS min_s, max(e) AS max_e
         |FROM (SELECT user_id, s, e, unnest(generate_series(
         |        (s // 300) * 300 - 300, (s // 300) * 300, 300)) AS w
         |      FROM (${evSql("click")}) ev) t
         |GROUP BY 1, 2, 3
         |ORDER BY user_id, win_s""".stripMargin)
}
