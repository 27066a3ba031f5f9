package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic integer-exact k-means / IVF / linear-probe plane —
  * the oracle-checkable counterpart of the MLlib paths in
  * [[MlSimilarity]] (reference surface: face_embeddings.py:98-131
  * kmeans/logreg_predict; identity_clusters.py:1-40 cluster browser).
  *
  * Everything here runs on the shared int8 quantization grid
  * ([[Similarity.quantizeInt8]]): seeds come from a Knuth-multiplier
  * id hash, Lloyd assignment uses integer squared-L2 with (dist,
  * cell)-lexicographic tie-breaks, and centroid updates are
  * truncated-integer means (`sum div n` — Spark `div` and DuckDB `//`
  * both truncate toward zero). Every value is an INTEGER — carried as
  * integer-valued doubles inside the native kernels (exact below
  * 2^53) and as BIGINT through the mean/ranking arithmetic — so
  * DuckDB replays the whole fit bit-exactly and the derived queries
  * (v05/v07/v12) carry full rows+schema+hash oracle rows, unlike the
  * float LBFGS/KMeans pipelines they replace in the query corpus.
  *
  * Scale shape: the quantized corpus is scanned once per Lloyd step
  * (centroids ride along as a broadcast k-row frame), assignment is a
  * map-side-combinable `min(struct(dist, cell))` agg — no window over
  * the corpus — and the per-(cell,pos) centroid sums are partial-agg
  * friendly. Iteration count is a fixed small constant (coarse
  * quantizers don't need convergence), so plan depth is bounded. */
object IntKMeans {

  /** Corpus on the int8 grid: (vec_id, label, q) with q an
    * INTEGER-VALUED array<double> (the quantizeInt8 convention —
    * |q_i| <= 127, so every product/sum below stays exact in a double
    * far past any realistic dim). Doubles, not longs, so the hot
    * kernels run through the codegen'd native vector expressions
    * (zip_with/aggregate HOFs are CodegenFallback — the r11 long-array
    * form paid interpreted per-element lambdas on every Lloyd pass). */
  def quantized(corpus: DataFrame): DataFrame =
    Similarity.quantizeInt8(corpus)
      .select(col("vec_id"), col("label"), col("__q").as("q"))

  /** Exact integer squared L2 (native single-pass kernel). */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.Fns.l2sq(a, b).cast("long")

  /** Exact integer dot product (native single-pass kernel). */
  private def ldot(a: Column, b: Column): Column =
    graft.functions.Fns.dot(a, b).cast("long")

  /** Exact integer squared norm. */
  private def sqNorm(a: Column): Column =
    graft.functions.Fns.dot(a, a).cast("long")

  /** Deterministic seed centroids: the k corpus vectors with the
    * smallest Knuth-style id hash (h = (id*1103515245 + 12345) mod
    * 2^31), cell ids 0..k-1 in (h, vec_id) rank order. The pick is a
    * TakeOrderedAndProject (per-partition top-k, no global sort); the
    * unpartitioned rank window only ever sees the k selected rows. */
  private def seedCentroids(qv: DataFrame, k: Int): DataFrame = {
    val top = qv
      .withColumn("h",
        pmod(col("vec_id") * lit(1103515245L) + lit(12345L), lit(2147483648L)))
      .select(col("h"), col("vec_id"), col("q"))
      .orderBy(col("h"), col("vec_id")).limit(k)
    top.withColumn("cell",
        row_number().over(Window.orderBy(col("h"), col("vec_id")))
          .cast("long") - 1)
      .select(col("cell"), col("q").as("c"))
  }

  /** One Lloyd assignment: nearest centroid by integer squared L2,
    * ties to the lower cell id — expressed as a map-side-combinable
    * lexicographic struct-min, not a corpus-wide window. */
  private def assign(qv: DataFrame, centroids: DataFrame): DataFrame =
    qv.crossJoin(broadcast(centroids))
      .withColumn("dist", sqDist(col("q"), col("c")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"),
        first(col("label")).as("label"), first(col("q")).as("q"))
      .select(col("vec_id"), col("label"), col("q"), col("m.cell").as("cell"))

  /** One Lloyd update: per-cell truncated-integer mean centroid
    * (c_pos = sum div n; truncation toward zero in both engines).
    * Cells that lose all members simply drop out — deterministic, and
    * mirrored by the oracle's GROUP BY. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("q")).as(Seq("pos", "v")))
      // q values are integer-valued doubles; the truncated mean is
      // computed in BIGINT (sum is exact: the cast loses nothing) and
      // re-emitted as integer-valued doubles for the native kernels
      .groupBy(col("cell"), col("pos"))
      .agg(expr("sum(CAST(v AS BIGINT)) div count(1)").as("cv"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv").cast("double")).as("c"))

  /** Fixed-iteration integer Lloyd fit; returns (final assignment
    * (vec_id, label, q, cell), final centroids (cell, c)).
    *
    * Every round's k-row centroid frame is materialized: each
    * reference to a lazy `ctr` would otherwise re-execute the whole
    * preceding assign/update chain (ivfTopK reads the final centroids
    * twice — once for the assignment, once for the probes — which
    * doubled the corpus passes; r11 measured v07 at 3.2 s vs 1.9 s
    * cached). Rounds go through [[graft.util.Checkpoints.roll]] — the
    * engine's loop-hygiene pattern: each round's frame is eagerly
    * checkpointed and its PREDECESSOR's blocks freed the moment the
    * successor exists, so a caller running fit() in a loop pins O(1)
    * centroid frames, not one per round per call (r11 left every
    * round's cache for the harness sweep to find). After fit() the
    * only net-new pinned state is the two frames the result needs:
    * `qv` and the final centroids (asserted by IntKMeansSpec).
    *
    * HAZARD (same contract as Dedup.connectedComponents): the returned
    * centroids are backed by a lineage-truncated localCheckpoint —
    * consume the result before any getPersistentRDDs sweep. */
  def fit(corpus: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val (qraw, ma) = Similarity.quantizeInt8WithScale(corpus)
    val qv = qraw.select(col("vec_id"), col("label"), col("__q").as("q")).cache()
    // the seed roll is eager and scans all of qv, materializing its
    // cache — after that the 1-row scale cache is superseded (an
    // eviction-recompute of qv re-derives it from lineage)
    var (ctr, pin) = graft.util.Checkpoints.roll(seedCentroids(qv, k), None)
    ma.unpersist(blocking = false)
    (1 to iters).foreach { _ =>
      val (c2, p2) = graft.util.Checkpoints.roll(update(assign(qv, ctr)), pin)
      ctr = c2; pin = p2
    }
    (assign(qv, ctr), ctr)
  }

  /** Per-query probe set: the `nprobe` nearest centroids by integer
    * squared L2 (ties to the lower cell) — shared by the in-process
    * IVF and the serve-from-index path. `qq` carries (q_id, qq). */
  private def probeCells(qq: DataFrame, centroids: DataFrame,
                         nprobe: Int): DataFrame = {
    val pw = Window.partitionBy(col("q_id")).orderBy(col("pdist"), col("cell"))
    qq.crossJoin(broadcast(centroids))
      .withColumn("pdist", sqDist(col("qq"), col("c")))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") <= nprobe)
      .select(col("q_id"), col("qq"), col("cell"))
  }

  /** Rank the probed cells' members per query by exact-integer
    * quantized dot (desc, vec_id), keep the top k. */
  private def rankProbed(vectors: DataFrame, probes: DataFrame,
                         k: Int): DataFrame = {
    val rw = Window.partitionBy(col("q_id")).orderBy(col("qdot").desc, col("vec_id"))
    vectors.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("qdot", ldot(col("q"), col("qq")))
      .withColumn("rank", row_number().over(rw)).filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("qdot"))
  }

  /** v12 surface: per-vector cluster assignment (vec_id, label,
    * cluster) from a k-cluster integer Lloyd fit. */
  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame =
    fit(corpus, k, iters)._1
      .select(col("vec_id"), col("label"), col("cell").as("cluster"))

  /** v07 surface: IVF approximate top-k — integer-k-means coarse
    * quantizer (`nlist` cells), each query probes its `nprobe`
    * nearest cells by integer squared L2 and ranks ONLY their members
    * by exact-integer quantized dot (desc, vec_id). Candidate work
    * per query is ~nprobe/nlist of the corpus; cells are the
    * broadcast equi-join key, the corpus scan stays distributed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int,
              nprobe: Int, iters: Int = 2): DataFrame = {
    val (asg, ctr) = fit(corpus, nlist, iters)
    val qq = asg.join(
        broadcast(queries.select(col("vec_id").as("q_id"))),
        col("vec_id") === col("q_id"))
      .select(col("q_id"), col("q").as("qq"))
    rankProbed(asg, probeCells(qq, ctr, nprobe), k)
  }

  /** Build-side of the IVF serve split: persist the fitted index —
    * quantized vectors PARTITIONED BY CELL, the centroid table, and
    * the quantization scale — so serving never refits and a query
    * touches only its probed cells' files. At 100 TB this is the
    * production layout: the index is built once by a batch job and
    * the per-cell parquet directories are the unit of serve-side I/O. */
  /** Remove history sidecars (tombstones, retention watermark) — every
    * op that starts a NEW index generation must call this, or sidecars
    * from a previous build in the same dir would poison the fresh
    * layout. */
  private def clearHistorySidecars(spark: org.apache.spark.sql.SparkSession,
                                   dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("tombstones", "retention").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n")
      p.getFileSystem(conf).delete(p, true)
    }
  }

  def writeIndex(corpus: DataFrame, dir: String, nlist: Int,
                 iters: Int = 2): Unit = {
    clearHistorySidecars(corpus.sparkSession, dir)
    val (asg, ctr) = fit(corpus, nlist, iters)
    asg.select(col("vec_id"), col("q"), col("cell"))
      .withColumn("seq", lit(0L))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
    ctr.write.mode("overwrite").parquet(s"$dir/centroids")
    // the corpus max-abs that defined the int8 grid (mirror of
    // Similarity.quantizeInt8's scale): queries must be quantized on
    // the SAME scale at serve time or dot products are meaningless
    corpus.agg(max(array_max(transform(col("embedding"),
        x => abs(x.cast("double"))))).as("ma"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    writeSeqNo(corpus.sparkSession, dir, 1L)
  }

  // ---- batch sequence numbers: the same versioning the phrase index
  // carries (PhraseSearch's seqno sidecar) — every batch of vector
  // rows is stamped with the seq it was written under (base build =
  // 0, each append = the then-current counter) and a tombstone is
  // (vec_id, upto): it kills only rows with seq < upto, so an
  // upsert's re-encoded replacement row (written AT upto) survives
  // its own id's tombstone. CONTRACT: appends/deletes/upserts on one
  // index run sequentially (appendIndex's existing contract).

  private def writeSeqNo(spark: org.apache.spark.sql.SparkSession,
                         dir: String, next: Long): Unit =
    spark.range(1).select(lit(next).as("next_seq"))
      .write.mode("overwrite").parquet(s"$dir/seqno")

  private def readSeqNo(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Long =
    spark.read.parquet(s"$dir/seqno").head().getAs[Long]("next_seq")

  /** Incremental maintenance (daily-crawl shape): append a NEW batch
    * of vectors to an existing [[writeIndex]] layout WITHOUT refitting
    * — the Spark-native analogue of the reference's job-ledger
    * skip-processed ingest (scannerutil.py:136-146). The batch is
    * quantized on the STORED corpus scale (serve-time dot products
    * must live on one grid) and assigned to the nearest STORED
    * centroid with fit's exact assignment rule (integer squared L2,
    * ties to the lower cell — the same map-side-combinable
    * struct-min), then appended as new files inside the same per-cell
    * directories, so serve-side partition pruning is unchanged.
    * Centroids deliberately do NOT move: a serving IVF keeps its
    * coarse quantizer frozen between rebuilds (moving cells would
    * silently re-home existing vectors' files). v30's oracle proves
    * the append bit-equal to the same assignment done at build time.
    *
    * CONTRACT: batch vec_ids must be disjoint from indexed ones. */
  def appendIndex(newCorpus: DataFrame, dir: String): Unit = {
    val spark = newCorpus.sparkSession
    val ma = broadcast(spark.read.parquet(s"$dir/meta"))
    val ctr = broadcast(spark.read.parquet(s"$dir/centroids"))
    val seq = readSeqNo(spark, dir)
    val qv = newCorpus.select(col("vec_id"), col("embedding"))
      .crossJoin(ma)
      .withColumn("q", transform(col("embedding"),
        x => round(x.cast("double") * 127.0d / col("ma"))))
      .select(col("vec_id"), col("q"))
    qv.crossJoin(ctr)
      .withColumn("dist", sqDist(col("q"), col("c")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"),
        first(col("q")).as("q"))
      .select(col("vec_id"), col("q"), lit(seq).as("seq"),
        col("m.cell").as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")
    writeSeqNo(spark, dir, seq + 1)
  }

  /** UPSERT (the re-encode shape: an embedding-model refresh changed
    * some already-indexed vectors, plus possibly brand-new ids):
    * tombstone the batch's vec_ids at the current sequence number,
    * then append the re-encoded vectors under the next one — the
    * tombstone (vec_id, upto = S) kills every older version (seq < S)
    * while the replacement rows (seq = S+1) survive it, so the swap is
    * atomic at read time and no cell file is rewritten. The new
    * embedding is quantized on the STORED scale and assigned to the
    * frozen coarse quantizer (appendIndex's rule) — it may land in a
    * DIFFERENT cell than the stale version, which is exactly why the
    * stale row must die by version, not by rewrite. Upserting an id
    * the index never held degenerates to a plain append. v34's oracle
    * proves a stale-then-upserted index indistinguishable from the
    * frozen-quantizer assignment of the corrected corpus; IntKMeans-
    * Spec covers the round-trip and upsert-then-compact. */
  def upsertIndex(newCorpus: DataFrame, dir: String): Unit = {
    deleteFromIndex(newCorpus.select(col("vec_id")).distinct(), dir)
    appendIndex(newCorpus, dir)
  }

  /** Logical deletion (the fourth maintenance op): record vec ids in
    * a tombstone sidecar (`dir/tombstones`) — the per-cell vector
    * files are untouched, so a delete batch costs one tiny write no
    * matter the index size (the Lucene/log-structured delete model; a
    * purge list in a 100 TB embedding store must not rewrite cells).
    * [[servedTopK]] anti-joins the broadcast tombstone set, so
    * deleted vectors stop appearing in results immediately; the
    * frozen coarse quantizer (centroids) deliberately does NOT refit
    * — exactly as [[appendIndex]] never moves it — so deletion is a
    * candidate-set change, not a re-clustering ([[compactIndex]]
    * physically reclaims the rows and clears the sidecar). Deleting
    * an id twice, or an id not in the index, is a no-op.
    *
    * Each tombstone is (vec_id, upto = the current sequence number):
    * it kills only rows written BEFORE it, which is what lets
    * [[upsertIndex]] tombstone and re-add a vector in one step, and
    * means a delete never affects appends that come after it. */
  def deleteFromIndex(vecIds: DataFrame, dir: String): Unit = {
    val upto = readSeqNo(vecIds.sparkSession, dir)
    vecIds.select(col("vec_id")).distinct()
      .withColumn("upto", lit(upto))
      // dimension-sized purge list: one file per delete batch
      .coalesce(1)
      .write.mode("append").parquet(s"$dir/tombstones")
    // a delete is a versioned event like an append: advancing the
    // counter gives every maintenance batch a distinct sequence slot,
    // which is what makes the as-of snapshot reads well-defined
    // (snapshot S excludes tombstones with upto >= S — they had not
    // happened yet at S)
    writeSeqNo(vecIds.sparkSession, dir, upto + 1)
  }

  /** The index's current sequence number — the snapshot id
    * [[servedTopK]]'s `asOf` parameter accepts. Snapshot S is the
    * index state after events 0..S−1 (the base build is event 0;
    * every append/delete/upsert batch advances the counter), so
    * `currentSeq` names the LATEST state and any value recorded
    * earlier names the exact historical state the index had then —
    * the same reproducibility contract as the phrase plane's
    * [[graft.text.PhraseSearch.currentSeq]]. */
  def currentSeq(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    readSeqNo(spark, dir)

  /** The tombstone set, if any deletes have been recorded (driver-side
    * existence probe — index metadata, like the scale read). */
  private def tombstones(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(s"$dir/tombstones")) else None
  }

  /** The retention watermark, if [[vacuumIndex]] has ever bounded
    * this index's history (1-row sidecar, driver-side metadata). */
  private def retention(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/retention")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$dir/retention")
        .head().getAs[Long]("min_snapshot"))
    else None
  }

  /** Drop tombstoned vectors from an indexed frame carrying
    * (vec_id, seq) — a broadcast anti-join (the purge list is
    * dimension-sized); a row dies iff SOME tombstone for its id
    * postdates it (seq < upto). With `asOf = Some(S)` the frame is
    * first cut to rows written before snapshot S (seq < S) and only
    * tombstones that existed at S (upto < S) apply — time travel is
    * two extra pushed-down predicates, no second layout. Snapshots
    * older than the retention watermark are REFUSED, not silently
    * mis-served: [[vacuumIndex]] reclaimed rows they need. */
  private def liveOnly(df: DataFrame, spark: org.apache.spark.sql.SparkSession,
                       dir: String, asOf: Option[Long] = None): DataFrame = {
    asOf.foreach { s =>
      retention(spark, dir).foreach(r => require(s >= r,
        s"snapshot $s predates the retention watermark $r (vacuumed away)"))
    }
    val cut = asOf.map(s => df.filter(col("seq") < s)).getOrElse(df)
    tombstones(spark, dir) match {
      case Some(t) =>
        val vis = asOf.map(s => t.filter(col("upto") < s)).getOrElse(t)
        val ts = broadcast(vis.select(col("vec_id").as("__t_vec"),
          col("upto").as("__t_upto")))
        cut.join(ts, cut("vec_id") === col("__t_vec") &&
          cut("seq") < col("__t_upto"), "left_anti")
      case None => cut
    }
  }

  /** Compaction (the third maintenance op after build/append): each
    * [[appendIndex]] batch adds one file set per cell directory, so a
    * daily-append index accumulates small files. Rewrite the vectors
    * back to one sorted (by vec_id) file set per cell — a pure
    * shuffle-by-cell over the index itself (centroids/meta are tiny
    * and untouched), swapped in via a backup rename (live -> .old,
    * compact -> live, drop .old — the live data is never deleted
    * before its replacement is in place). Tombstoned vectors are
    * physically dropped during the rewrite and the tombstone sidecar
    * cleared (crash-safe in any order: stale tombstones over absent
    * rows are a serve-side no-op). Serve results are unchanged (v31's
    * oracle row + IntKMeansSpec assert parity and the file-count
    * drop). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val ts = tombstones(spark, dir)
    // `seq` survives the rewrite: liveOnly resolves it here, and
    // post-compaction deletes/upserts (`seq < upto`) still need every
    // row versioned (the exact bug the phrase plane's ph16 caught)
    val vec = liveOnly(
      spark.read.parquet(s"$dir/vectors")
        .select(col("vec_id"), col("q"), col("seq"), col("cell")),
      spark, dir)
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
    swapRewrite(spark, s"$dir/vectors", vec.write.partitionBy("cell"))
    if (ts.isDefined) {
      // tombstones were applied at HEAD: advance the retention
      // watermark so snapshots that lost rows are refused loudly
      // (compact ≡ [[vacuumIndex]] at the current seq)
      spark.range(1).select(lit(readSeqNo(spark, dir)).as("min_snapshot"))
        .write.mode("overwrite").parquet(s"$dir/retention")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tombstones"), true)
    }
  }

  /** Write `w` to `<path>.compact`, then swap it into `path` via a
    * backup rename (live -> .old, compact -> live, drop .old) — the
    * live data is never deleted before its replacement lands, so a
    * failure at any step leaves either the old or the new layout
    * intact (PhraseSearch.swapRewrite's protocol). */
  private def swapRewrite(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
    val tmp = path + ".compact"
    w.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"swap: cannot stash $path")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), p),
      s"swap failed for $path — previous layout at $bak")
    fs.delete(bak, true)
  }

  /** ROLLBACK: restore the index HEAD to snapshot `toSeq` — the undo
    * for a bad maintenance batch (a mis-encoded model refresh
    * upserted, a purge list that was too broad). Every batch is a
    * seq-stamped event ([[currentSeq]]), so rollback is a TRUNCATION
    * of the event log: physically drop vector rows written at events
    * >= toSeq and tombstones recorded at events >= toSeq, then reset
    * the counter. After it, serving HEAD equals what
    * `asOf = Some(toSeq)` served before, older snapshots are
    * untouched, and maintenance continues from toSeq — the next
    * append reuses the vacated seq slot, which is why the dead rows
    * must go physically, not logically. Centroids/meta are untouched
    * (the coarse quantizer is frozen across ALL maintenance, so it
    * was identical at every snapshot). A filter-rewrite over the
    * index itself — never refits, never re-quantizes. Crash order:
    * tombstones first (a crash after that serves MORE rows — the
    * direction rollback is headed), vectors via backup-rename swap,
    * counter last. v39's oracle proves HEAD-after-rollback ≡ the
    * stale snapshot; IntKMeansSpec covers append-after-rollback. */
  def rollbackIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    toSeq: Long): Unit = {
    val cur = readSeqNo(spark, dir)
    require(toSeq >= 1 && toSeq <= cur,
      s"rollback target $toSeq outside [1, $cur]")
    retention(spark, dir).foreach(r => require(toSeq >= r,
      s"rollback target $toSeq predates the retention watermark $r"))
    if (toSeq == cur) return
    tombstones(spark, dir).foreach { t =>
      val keep = t.filter(col("upto") < toSeq)
      if (keep.isEmpty) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      } else swapRewrite(spark, s"$dir/tombstones", keep.coalesce(1).write)
    }
    val vec = spark.read.parquet(s"$dir/vectors")
      .filter(col("seq") < toSeq)
      .select(col("vec_id"), col("q"), col("seq"), col("cell"))
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
    swapRewrite(spark, s"$dir/vectors", vec.write.partitionBy("cell"))
    writeSeqNo(spark, dir, toSeq)
  }

  /** VACUUM: bound time travel at `retainAsOf` and physically reclaim
    * everything no retained snapshot can see — the retention policy
    * between [[deleteFromIndex]] (logical, keeps all history) and
    * [[compactIndex]] (reclaims to HEAD, keeps none). A row written
    * at seq s and killed by a tombstone at upto u is visible exactly
    * in snapshots (s, u]; once u < retainAsOf no retained snapshot
    * can see it, so the rewrite drops rows killed by FULLY-AGED
    * tombstones (upto < retainAsOf) and those tombstones, recording
    * the watermark in a 1-row `dir/retention` sidecar — written
    * FIRST, so a crash mid-reclaim refuses the affected snapshots
    * instead of silently mis-serving them (re-run to finish). HEAD
    * and every as-of >= retainAsOf serve byte-identically (v43's
    * oracle); older as-of reads and rollbacks are refused loudly.
    * Younger tombstones stay — retained snapshots still see their
    * rows. */
  def vacuumIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                  retainAsOf: Long): Unit = {
    val cur = readSeqNo(spark, dir)
    require(retainAsOf >= 1 && retainAsOf <= cur,
      s"retention watermark $retainAsOf outside [1, $cur]")
    spark.range(1).select(lit(retainAsOf).as("min_snapshot"))
      .write.mode("overwrite").parquet(s"$dir/retention")
    tombstones(spark, dir).foreach { t =>
      val aged = t.filter(col("upto") < retainAsOf)
      if (!aged.isEmpty) {
        val ts = broadcast(aged.select(col("vec_id").as("__t_vec"),
          col("upto").as("__t_upto")))
        val vec = spark.read.parquet(s"$dir/vectors")
        val kept = vec.join(ts, vec("vec_id") === col("__t_vec") &&
            vec("seq") < col("__t_upto"), "left_anti")
          .select(col("vec_id"), col("q"), col("seq"), col("cell"))
          .repartition(col("cell"))
          .sortWithinPartitions("vec_id")
        swapRewrite(spark, s"$dir/vectors", kept.write.partitionBy("cell"))
        val young = t.filter(col("upto") >= retainAsOf)
        if (young.isEmpty) {
          val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
        } else swapRewrite(spark, s"$dir/tombstones", young.coalesce(1).write)
      }
    }
  }

  /** REFRESH the coarse quantizer: re-fit Lloyd over the LIVE stored
    * vectors and rewrite the index under the new cell geometry — the
    * re-cluster a long-maintained IVF eventually needs. Appends/
    * upserts assign against FROZEN centroids (correct for serving,
    * but the cell occupancy skews as the corpus drifts from the
    * bootstrap distribution: hot cells grow unbounded — v38's audit
    * is the observability for exactly that), and refresh is the
    * rebalance: the same deterministic integer-Lloyd chain as
    * [[fit]] (hashed-id seeds, truncated-integer means, ties to the
    * lower cell), but fed from the index's own stored `q` vectors —
    * never re-reads the corpus, never re-quantizes (the stored int8
    * grid IS the data; meta/scale are untouched, so in-flight query
    * quantization is unaffected). Tombstones are resolved on the way
    * in, and the output is a NEW index generation: seq 0, fresh
    * counter, no sidecar — the same contract as [[mergeIndexes]]
    * (history before a physical rewrite is gone by design). Swapped
    * in via backup rename; `nlist` may differ from the original
    * (re-tuning cell count IS a refresh use case). v40's oracle
    * proves refresh-after-append ≡ one fresh fit over the union on
    * the ORIGINAL stored scale. */
  def refreshIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                   nlist: Int, iters: Int = 2): Unit = {
    val live = liveOnly(spark.read.parquet(s"$dir/vectors"), spark, dir)
      .select(col("vec_id"), lit(null).cast("string").as("label"), col("q"))
      .cache()
    var (ctr, pin) = graft.util.Checkpoints.roll(seedCentroids(live, nlist), None)
    (1 to iters).foreach { _ =>
      val (c2, p2) = graft.util.Checkpoints.roll(update(assign(live, ctr)), pin)
      ctr = c2; pin = p2
    }
    val asg = assign(live, ctr)
      .select(col("vec_id"), col("q"), lit(0L).as("seq"), col("cell"))
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
    swapRewrite(spark, s"$dir/vectors", asg.write.partitionBy("cell"))
    swapRewrite(spark, s"$dir/centroids", ctr.write)
    live.unpersist(blocking = false)
    pin.foreach(_.unpersist(blocking = false))
    // a refresh starts a NEW generation (seq 0, counter 1): the old
    // generation's tombstones are resolved into the rewrite and its
    // retention watermark is meaningless against the reset counter
    clearHistorySidecars(spark, dir)
    writeSeqNo(spark, dir, 1L)
  }

  /** SNAPSHOT DIFF: which vectors changed between two index
    * snapshots, classified added/removed/changed — the vector-plane
    * mirror of [[graft.text.PhraseSearch.snapshotDiff]] (the
    * reproducibility audit between two training runs' index views,
    * computed from the index alone). Each snapshot's per-vector
    * signature is a position-weighted integer aggregate over the
    * stored int8 components (sum of q_i × (i+1) — sign flips and
    * reorderings change it; |sig| < 127·d² stays trivially exact in
    * the double-backed integer arithmetic). Two as-of scans of the
    * cell files, one full-outer join on vec_id. v44's oracle replays
    * both snapshots' quantized vectors from the corpus. */
  def snapshotDiff(spark: org.apache.spark.sql.SparkSession, dir: String,
                   fromSeq: Long, toSeq: Long): DataFrame = {
    def sig(asOf: Long) =
      liveOnly(spark.read.parquet(s"$dir/vectors"), spark, dir, Some(asOf))
        .select(col("vec_id"),
          aggregate(zip_with(col("q"),
              sequence(lit(1), size(col("q"))).cast("array<double>"),
              (x, i) => x * i),
            lit(0.0d), (a, x) => a + x).cast("long").as("sig"))
    sig(fromSeq).select(col("vec_id"), col("sig").as("__from"))
      .join(sig(toSeq).select(col("vec_id"), col("sig").as("__to")),
        Seq("vec_id"), "full_outer")
      .withColumn("change",
        when(col("__from").isNull, "added")
          .when(col("__to").isNull, "removed")
          .when(col("__from") =!= col("__to"), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(col("vec_id"), col("change"))
  }

  /** Start an EMPTY shard that SHARES `fromDir`'s coarse quantizer
    * and int8 scale: the distributed IVF build fits the quantizer
    * ONCE (a [[writeIndex]] on one partition or a sample), then every
    * builder [[initShard]]s against it and [[appendIndex]]es its own
    * corpus partition — frozen-centroid assignment keeps all shards
    * on one geometry, which is what makes [[mergeIndexes]] a pure
    * layout fold. Copies centroids + meta (tiny frames), no vectors,
    * seqno 0. */
  def initShard(spark: org.apache.spark.sql.SparkSession,
                fromDir: String, dir: String): Unit = {
    clearHistorySidecars(spark, dir)
    spark.read.parquet(s"$fromDir/centroids")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    spark.read.parquet(s"$fromDir/meta")
      .write.mode("overwrite").parquet(s"$dir/meta")
    writeSeqNo(spark, dir, 0L)
  }

  /** MERGE shard indexes that share one coarse quantizer into a
    * single serving layout — the IVF counterpart of the phrase
    * plane's shard merge (PhraseSearch.mergeIndexes): N builders each
    * assign a corpus partition against the same frozen centroids
    * ([[initShard]] + [[appendIndex]]), then one merge job unions the
    * cell contents, resolving each shard's tombstones during the
    * rewrite. Never re-fits, never re-quantizes: a union +
    * shuffle-by-cell over the shards' vectors. The output starts
    * clean (seq 0, fresh seqno, no sidecar) and serves exactly like a
    * single index whose batches were appended sequentially (v35's
    * oracle).
    *
    * CONTRACT: live vec_id sets are disjoint; the shared quantizer is
    * REQUIRED here — shards with different centroids or scales are a
    * geometry mismatch, not a mergeable layout. */
  def mergeIndexes(spark: org.apache.spark.sql.SparkSession,
                   shards: Seq[String], out: String): Unit = {
    require(shards.nonEmpty)
    val ctrs = shards.map(d => spark.read.parquet(s"$d/centroids"))
    ctrs.tail.foreach { c =>
      require(c.exceptAll(ctrs.head).isEmpty && ctrs.head.exceptAll(c).isEmpty,
        "shards disagree on the coarse quantizer (centroids differ)")
    }
    val scales = shards.map(d => spark.read.parquet(s"$d/meta")
      .head().getAs[Double]("ma"))
    require(scales.distinct.size == 1,
      s"shards disagree on the int8 scale: $scales")
    clearHistorySidecars(spark, out)
    shards.map(d => liveOnly(spark.read.parquet(s"$d/vectors"), spark, d)
        .select(col("vec_id"), col("q"), col("cell")))
      .reduce(_.unionByName(_))
      .withColumn("seq", lit(0L))
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$out/vectors")
    ctrs.head.write.mode("overwrite").parquet(s"$out/centroids")
    spark.read.parquet(s"${shards.head}/meta")
      .write.mode("overwrite").parquet(s"$out/meta")
    writeSeqNo(spark, out, 1L)
  }

  /** Serve-side IVF top-k from a [[writeIndex]] layout: quantize the
    * query vectors on the stored scale, rank the stored centroids
    * (broadcast, k rows), and scan ONLY the probed cells — the
    * cell equi-join against the broadcast probe table lets dynamic
    * partition pruning drop every unprobed cell directory from the
    * vectors scan (asserted by IntKMeansSpec). Output matches
    * [[ivfTopK]] bit-for-bit because the stored fit is the same
    * deterministic fit. `asOf = Some(S)` answers from snapshot S
    * instead of the latest state (see [[currentSeq]]); the coarse
    * quantizer is frozen across maintenance, so the probe set needs
    * no versioning — only the candidate rows do. */
  /** `allowed` (optional) = FILTERED search: an allow-list dimension
    * of vec_ids (the result of a metadata predicate — tenant, license,
    * language, date range) semi-joined into the candidate scan BEFORE
    * ranking, so top-k fills with k MATCHING vectors instead of
    * post-filtering a top-k that may keep none of them (the classic
    * filtered-ANN failure). The list is broadcast — dimension-sized,
    * like the tombstone set; the probed-cell pruning is unchanged.
    * v41's oracle proves the pre-filter exact against the replayed
    * fit restricted to the predicate. */
  def servedTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
                 queries: DataFrame, k: Int, nprobe: Int,
                 asOf: Option[Long] = None,
                 allowed: Option[DataFrame] = None): DataFrame = {
    val ma = broadcast(spark.read.parquet(s"$dir/meta"))
    val ctr = broadcast(spark.read.parquet(s"$dir/centroids"))
    // query quantization spelled out verbatim in quantizeInt8's op
    // order, on the STORED corpus scale
    val qq = queries
      .select(col("vec_id").as("q_id"), col("embedding"))
      .crossJoin(ma)
      .withColumn("qq", transform(col("embedding"),
        x => round(x.cast("double") * 127.0d / col("ma"))))
      .select(col("q_id"), col("qq"))
    // tombstone anti-join sits on top of the pruned cell scan:
    // deleted vectors vanish from results without touching the files
    val live = liveOnly(spark.read.parquet(s"$dir/vectors"), spark, dir, asOf)
    val vec = allowed.fold(live)(a =>
      live.join(broadcast(a.select(col("vec_id"))), Seq("vec_id"), "left_semi"))
    rankProbed(vec, probeCells(qq, ctr, nprobe), k)
  }

  /** SERVED TWO-STAGE (Matryoshka-shaped) top-k from a [[writeIndex]]
    * layout: stage 1 ranks the probed cells' candidates by the
    * TRUNCATED integer dot (first `prefixDim` components — the
    * nested-prefix property Matryoshka embeddings train for) down to
    * `kCand`; stage 2 re-ranks only those by the FULL dot. The
    * candidate rows are already in hand from the cell scan, so stage
    * 2 is a window over |queries|·kCand rows with zero extra I/O —
    * the win is arithmetic (d/prefixDim fewer multiplies per scanned
    * candidate; a prefix-sliced column layout would turn it into an
    * I/O win too). All-integer scoring keeps both stages
    * deterministic: v45's oracle replays the exact pipeline. */
  def servedTwoStageTopK(spark: org.apache.spark.sql.SparkSession,
                         dir: String, queries: DataFrame, k: Int,
                         kCand: Int, prefixDim: Int, nprobe: Int,
                         asOf: Option[Long] = None): DataFrame = {
    require(kCand >= k, s"re-rank pool $kCand smaller than k=$k")
    val ma = broadcast(spark.read.parquet(s"$dir/meta"))
    val ctr = broadcast(spark.read.parquet(s"$dir/centroids"))
    val qq = queries
      .select(col("vec_id").as("q_id"), col("embedding"))
      .crossJoin(ma)
      .withColumn("qq", transform(col("embedding"),
        x => round(x.cast("double") * 127.0d / col("ma"))))
      .select(col("q_id"), col("qq"))
    val vec = liveOnly(spark.read.parquet(s"$dir/vectors"), spark, dir, asOf)
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("pdot").desc, col("vec_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qdot").desc, col("vec_id"))
    vec.join(broadcast(probeCells(qq, ctr, nprobe)), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("pdot",
        ldot(slice(col("q"), 1, prefixDim), slice(col("qq"), 1, prefixDim)))
      .withColumn("crank", row_number().over(wc)).filter(col("crank") <= kCand)
      .withColumn("qdot", ldot(col("q"), col("qq")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("qdot"))
  }

  /** v05 surface: closed-form linear probe — identity-covariance LDA
    * on the int8 grid. Per-label integer prototypes p_c (truncated
    * mean, the Lloyd update grouped by label), discriminant
    * s_c(v) = 2·(q_v·p_c) − ‖p_c‖² (= ‖q_v‖² − ‖q_v−p_c‖², kept
    * doubled so it stays integral), pred = argmax with label-asc
    * tie-break, margin = winner − runner-up (the integer confidence
    * surrogate for the logreg probability). Serves the reference's
    * logreg_predict scoring surface (face_embeddings.py:123-126)
    * deterministically; the MLlib LBFGS fit stays available as
    * [[MlSimilarity.logregScoreAll]] (spec-pinned). Prototypes are a
    * broadcast |labels|-row frame over one distributed corpus scan. */
  def linearProbe(corpus: DataFrame): DataFrame = {
    val qv = quantized(corpus).cache()
    val proto = qv.select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("sum(CAST(v AS BIGINT)) div count(1)").as("cv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv").cast("double")).as("p"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("s").desc, col("c_label"))
    qv.crossJoin(broadcast(
        proto.select(col("label").as("c_label"), col("p"))))
      .withColumn("s", lit(2L) * ldot(col("q"), col("p")) - sqNorm(col("p")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy(col("vec_id"))
      .agg(max(when(col("rn") === 1, col("c_label"))).as("pred"),
        (max(when(col("rn") === 1, col("s"))) -
          max(when(col("rn") === 2, col("s")))).as("margin"))
      .select(col("vec_id"), col("pred"), col("margin"))
  }
}
