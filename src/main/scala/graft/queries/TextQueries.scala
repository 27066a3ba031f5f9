package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.text.TextOps
import Q._

/** Training-data text pipeline coverage (SURVEY §7.5): exact dedup,
  * shingle-Jaccard near-dup, MinHash+LSH, SimHash, token analytics,
  * quality scoring, langid heuristic, document fingerprinting, and
  * binary-column metadata — all on the `documents` table, with DuckDB
  * oracles mirroring the same deterministic integer arithmetic. */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(tune(s), d)

  /** Per-doc 64-bit SimHash as four 16-bit limbs (doc_id, b0..b3) —
    * one map-side codegen'd pass (r21; see TextOps.simhashLimbs).
    * Shared by t05 (the signature surface) and t06 (the pair join). */
  private def simhashSig(s: org.apache.spark.sql.SparkSession, d: String,
                         sortFirst: Boolean = false) = {
    val limbs = TextOps.simhashLimbs(col("text"), 64, 16)
    // sortFirst (t05): run the presentation sort on the RAW (doc_id,
    // text) rows and compute the limbs above it — doc_id is an input
    // column, so the order is identical, and the range partitioner's
    // sampling pass (which re-executes the exchange's child) re-runs
    // only the scan, not the signature pass (the s22 move)
    val base0 = docs(s, d).select(col("doc_id"), col("text"))
    val base = if (sortFirst) base0.orderBy("doc_id") else base0
    base.select(col("doc_id"), limbs.as("l"))
      .select(col("doc_id"),
        element_at(col("l"), 1).as("b0"), element_at(col("l"), 2).as("b1"),
        element_at(col("l"), 3).as("b2"), element_at(col("l"), 4).as("b3"))
  }

  private val P = 1000003L

  val queries: Map[String, QFn] = Map(
    // T1 exact dedup stats (hash-groupBy dedup, one row)
    "t01_exact_dedup" -> ((s, d) =>
      docs(s, d).agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))),

    // T2 blocked dedup groups by 2-token prefix key
    "t02_prefix_groups" -> ((s, d) =>
      docs(s, d)
        .withColumn("pkey", concat_ws(" ", slice(split(col("text"), " "), 1, 2)))
        .groupBy(col("pkey"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_doc"))
        .filter(col("cnt") > 1)
        .orderBy("pkey")),

    // T3 exact n-gram (3-shingle) Jaccard near-dup pairs via
    // inverted-index join — finds the planted near-duplicates.
    // Scale guards (VERDICT round 1): the join key is a hashed long
    // shingle id (bounded width, no string shuffle), and shingles with
    // document frequency > tau are dropped before the self-join — a
    // boilerplate shingle shared by f docs would otherwise emit f^2
    // candidate pairs (quadratic hot-key blowup at corpus scale).
    "t03_shingle_jaccard" -> ((s, d) =>
      TextOps.jaccardPairs(docs(s, d), k = 3, dfCap = 50, tauJacc = 0.5)
        .select("d1", "d2", "inter", "n1", "n2", "jacc")
        .orderBy("d1", "d2")),

    // T4 MinHash + LSH near-dup: shingle dict -> 8 minhashes -> 4 bands
    // of 2 -> band-collision candidates + estimated jaccard
    "t04_minhash_lsh" -> ((s, d) => {
      // shingle id = cross-engine rolling hash of the shingle text: no
      // dictionary build at all (fully distributed; collisions are just
      // part of the hash family). r21: every minhash is a per-doc min,
      // so the whole 16-hash signature is ONE map-side codegen'd pass
      // (MinHashSigs — bit-equal to the explode+groupBy form by
      // TextOpsSpec) and the est_jacc stage compares the two 16-slot
      // ARRAYS per candidate pair instead of re-joining 16 rows per
      // doc and re-aggregating. 16 hashes / 8 bands of 2 (round-1
      // verdict called 8/4 toy-sized; collision threshold ~ 0.35).
      // mh feeds banding AND the est_jacc double-join — cache it.
      val mh = docs(s, d).select(col("doc_id"),
        TextOps.minhashSigs(col("text"), 3, 16, P).as("mh")).cache()
      val bands = mh.select(col("doc_id"),
        posexplode(array((0 until 8).map { b =>
          element_at(col("mh"), 2 * b + 1) * P +
            element_at(col("mh"), 2 * b + 2)
        }: _*)).as(Seq("band", "sig")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
      cand
        .join(mh.select(col("doc_id").as("d1"), col("mh").as("m1")), Seq("d1"))
        .join(mh.select(col("doc_id").as("d2"), col("mh").as("m2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          (aggregate(zip_with(col("m1"), col("m2"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).cast("double") / 16.0)
            .as("est_jacc"))
        .orderBy("d1", "d2")
    }),

    // T5 64-bit SimHash signatures over weighted token ids, emitted as
    // four 16-bit limbs b0..b3 (sign-bit-safe in any engine). Token ids
    // are the cross-engine rolling hash of the token text — no
    // dictionary build (the dense-id dictionary needs a global sort +
    // zipWithIndex; hashing is embarrassingly parallel, same move t04
    // made for shingles)
    "t05_simhash" -> ((s, d) => {
      // r21: ONE map-side pass — the signature is a per-doc quantity,
      // so the former explode×64 + three-exchange aggregate pipeline
      // (token counts, per-bit accumulate, band fold) collapses into
      // the codegen'd SimHashLimbs expression (bit-equal by TextOpsSpec;
      // measured 1.23 s -> see OPTIMIZATION_r21.md). Zero exchanges
      // before the presentation sort at ANY scale.
      // r22 (ADVICE r21): no outer orderBy — simhashSig's internal
      // sort IS the declared doc_id order (projection preserves it),
      // and with no redundant outer sort EliminateSorts keeps it BELOW
      // the limbs projection, so the range partitioner's sampling pass
      // re-runs only the scan, not the signature pass. The r21 form
      // (inner + outer sort) had the outer one erase the inner and the
      // limbs Project ended up under the range exchange after all.
      simhashSig(s, d, sortFirst = true)
    }),

    // T6 SimHash near-dup pairs at Hamming distance <= 3 via 4x16-bit
    // band tables: candidates collide on one equal band (complete by
    // pigeonhole for dist <= 3), then the exact Hamming distance is
    // verified with xor+popcount over the limbs. Replaces round 1's
    // equal-16-bit-signature pairing, whose 65,536 buckets go
    // birthday-quadratic at corpus scale.
    "t06_simhash_pairs" -> ((s, d) => {
      // wide signatures: the 4 limbs ride along through the band join,
      // so the exact Hamming verify is a projection on the join output —
      // no re-join of the candidate pairs against the band table.
      // r21: signatures come from the map-side SimHashLimbs pass (see
      // t05) — the three signature-build exchanges are gone
      val sig = simhashSig(s, d)
        .cache() // both self-join sides re-derive from sig; one row/doc
      // ONE self-join on the exploded (band-index, band-value) postings
      // replaces four per-band joins + union: the equi key is
      // (bi, bv), so "equal in ANY band" is the same candidate set, in
      // a single exchange instead of four join stages
      val posting = sig.select(col("doc_id"), col("b0"), col("b1"),
        col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("bi", "bv")))
      // band-bucket population cap (the t03 df-cap move, applied to
      // simhash bands): a band value shared by f docs emits f^2/2
      // candidate pairs, so one degenerate bucket goes quadratic at
      // corpus scale. Buckets over the cap are dropped on BOTH engines
      // (oracle mirrors the prune); bounded recall loss only for pairs
      // whose every equal band is degenerate. tau is far above this
      // corpus's max bucket (395 at sf0.1), so today's result set is
      // exactly the uncapped one.
      val bandCap = 1000
      // r21: broadcast hot-list anti-join (t03's df-cap form), not a
      // window count. The window needed a full (bi, bv) exchange+sort
      // of the posting table and — because `pruned` feeds BOTH self-
      // join sides and one side is broadcast — Catalyst executed that
      // exchange+sort TWICE (no reuse across a broadcast boundary;
      // the r20 plan shows both Window subtrees). The hot list is one
      // map-side-partial aggregate off the cached sig, bounded by
      // |corpus|/cap entries (the same boilerplate-bucket bound as
      // t03's dfCap broadcast), and the anti-join keeps both pruned
      // sides fully map-side. Result set identical: bn <= cap ≡
      // NOT IN {buckets with bn > cap}.
      val hotBands = broadcast(posting.groupBy(col("bi"), col("bv"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") > bandCap)
        .select("bi", "bv"))
      val pruned = posting.join(hotBands, Seq("bi", "bv"), "left_anti")
      val cand = pruned.as("x")
        .join(pruned.as("y"),
          col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("d2"),
          col("x.b0"), col("x.b1"), col("x.b2"), col("x.b3"),
          col("y.b0").as("c0"), col("y.b1").as("c1"),
          col("y.b2").as("c2"), col("y.b3").as("c3"))
        .dropDuplicates("doc_id", "d2")
      cand.select(col("doc_id").as("d1"), col("d2"),
          (bit_count(col("b0").bitwiseXOR(col("c0"))) +
            bit_count(col("b1").bitwiseXOR(col("c1"))) +
            bit_count(col("b2").bitwiseXOR(col("c2"))) +
            bit_count(col("b3").bitwiseXOR(col("c3")))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("d1", "d2")
    }),

    // T12 token packing (concat-and-chunk): global running token
    // offset per doc + the context-window chunks it lands in. The
    // offset uses the scalable two-phase prefix sum (text.Packing) —
    // NOT a global single-partition window — and still hash-matches
    // the oracle's plain SQL cumsum.
    "t12_token_pack" -> ((s, d) =>
      graft.text.Packing.packChunks(docs(s, d), 256)
        .select("doc_id", "ntok", "off", "chunk_first", "chunk_last")
        .orderBy("doc_id")),

    // T13 feature hashing (the hashing trick): tokens land in a fixed
    // D=128-dim space via the rolling hash, with a +/-1 sign from the
    // next hash bit so collisions cancel in expectation — the
    // vocabulary-free featurizer for corpus-scale models (no
    // dictionary build, embarrassingly parallel, integer-exact).
    "t13_feature_hash" -> ((s, d) =>
      toks(s, d)
        .withColumn("tid", TextOps.fingerprint(col("tok")))
        .withColumn("dim", expr("tid % 128"))
        .withColumn("sgn", expr("((tid div 128) % 2) * 2 - 1"))
        .groupBy(col("doc_id"), col("dim"))
        .agg(sum(col("sgn")).as("fval"))
        .filter(col("fval") =!= 0)
        .orderBy("doc_id", "dim")),

    // T14 the full training-data preprocessing pipeline as ONE query:
    // quality filter -> exact dedup (first doc per text) -> greedy
    // shingle-Jaccard near-dup removal (drop the later doc of each
    // >= 0.5 pair; transitive clustering would need iteration) ->
    // concat-and-chunk packing of the survivors. Every stage is the
    // library operator the standalone queries check (t07/t01/t03/t12),
    // composed end-to-end and still DuckDB-exact.
    "t14_corpus_pipeline" -> ((s, d) => {
      val arr = split(col("text"), " ")
      val qual = docs(s, d)
        .withColumn("ntok", size(arr).cast("long"))
        .withColumn("uniq_ratio",
          size(array_distinct(arr)).cast("double") / size(arr).cast("double"))
        .filter(col("ntok") >= 5 && col("uniq_ratio") >= 0.3)
        .select("doc_id", "text", "ntok")
      // cached: the survivors frame feeds BOTH the pair generator and
      // the anti-join below — uncached, the quality filter + full-text
      // dedup (a corpus scan + a shuffle of the text column) ran twice
      // per execution (r11 profile: ~1.3 s/pass at sf0.1).
      // r21: keep-first is a groupBy(text).min(doc_id), not a window —
      // row_number needed the full text exchange PLUS a sort, while
      // the aggregate partial-combines duplicate texts map-side before
      // the exchange (guide §2.3 "aggregate before you shuffle").
      // min(ntok) is exact: ntok is a function of the grouping key.
      val uniqDocs = qual.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("ntok")).as("ntok"))
        .select("doc_id", "text", "ntok").cache()
      // the SAME pair generator t03/t15/t31/t33 use — map-side distinct
      // shingle ids, broadcast df-cap, inverted-index self-join (the r7
      // inline copy of this block paid a redundant corpus-wide
      // .distinct() the map-side rewrite had eliminated everywhere else)
      val dropd = TextOps.jaccardPairs(uniqDocs, k = 3, dfCap = 50, tauJacc = 0.5)
        .select(col("d2").as("doc_id")).distinct()
      val kept = uniqDocs.join(dropd, Seq("doc_id"), "left_anti")
        .select("doc_id", "ntok")
      graft.text.Packing.withRunningOffset(kept, "doc_id", "ntok", "off")
        .withColumn("chunk_first", expr("off div 256"))
        .select("doc_id", "ntok", "off", "chunk_first")
        .orderBy("doc_id")
    }),

    // T15 dedup clustering: connected components over the >= 0.5
    // shingle-Jaccard pair graph (min-label propagation; cluster = min
    // doc_id of the component). The transitive closure the greedy t14
    // rule approximates; the oracle computes the same closure with a
    // recursive CTE.
    // HAZARD: the returned frame is backed by a lineage-truncated
    // localCheckpoint. Consume it (one action) BEFORE any
    // sc.getPersistentRDDs sweep — sweeping first frees blocks the
    // frame cannot recompute, and the next action throws. The harness
    // mains are safe (they sweep only after the query's write).
    "t15_dedup_components" -> ((s, d) =>
      graft.text.Dedup.connectedComponents(
          TextOps.jaccardPairs(docs(s, d), k = 3, dfCap = 50, tauJacc = 0.5))
        .orderBy("doc_id")),

    // T16 source-mix sampling: per-language acceptance quotas applied
    // via the deterministic rolling hash of the doc id — the data-mixing
    // step of a training corpus (upweight en to 80%, others to 25%),
    // reproducible across engines and runs unlike RNG sampling, and
    // embarrassingly parallel (pure per-row predicate, no shuffle
    // before the audit aggregation).
    "t16_source_mix" -> ((s, d) => {
      val h = TextOps.fingerprint(col("doc_id").cast("string")) % 100
      docs(s, d)
        .withColumn("hb", h)
        // the same disjunction the oracle SQL uses, so a NULL lang is
        // excluded on BOTH engines (when/otherwise would route NULLs
        // into the 25% branch and silently diverge)
        .filter((col("lang") === "en" && col("hb") < 80) ||
          (col("lang") =!= "en" && col("hb") < 25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("chars_sampled"))
        .orderBy("lang")
    }),

    // T17 adaptive quality cutoff: keep docs inside the [p10, p90]
    // token-length band — quantile-based filtering (the perplexity-
    // band move) where the threshold comes from the corpus itself.
    // The two cutoffs are a broadcast 1-row aggregate over the same
    // scan, not driver-side constants. Computed a10's histogram way —
    // `percentile()` would buffer every doc's ntok in ONE aggregate
    // buffer at 100 TB; the (ntok, count) histogram is length-domain-
    // sized and the interpolation is percentile()'s own closed form
    // (pos = p*(n-1); v_lo/v_hi = min ntok with cum past floor(pos) /
    // floor(pos)+1), bit-identical doubles.
    "t17_quality_band" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      val h = q.groupBy(col("ntok")).agg(count(lit(1)).as("c"))
      val cum = h.crossJoin(broadcast(h.agg(sum(col("c")).as("n"))))
        .withColumn("cum", sum(col("c")).over(Window.orderBy(col("ntok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      def pct(p: Double, out: String) = {
        val pos = (col("n") - 1).cast("double") * p
        val k = floor(pos)
        val vLo = min(when(col("cum") > k, col("ntok"))).cast("double")
        val vHi = coalesce(min(when(col("cum") > k + 1, col("ntok")))
          .cast("double"), min(when(col("cum") > k, col("ntok"))).cast("double"))
        (vLo + (min(pos) - floor(min(pos))) * (vHi - vLo)).as(out)
      }
      val cuts = cum.agg(pct(0.10, "p10"), pct(0.90, "p90"))
      q.crossJoin(broadcast(cuts))
        .filter(col("ntok") >= col("p10") && col("ntok") <= col("p90"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("ntok")).as("toks_kept"))
        .orderBy("lang")
    }),

    // T18 intra-document repetition filter: repetition ratio = 1 -
    // distinct 3-grams / total 3-grams; docs above the threshold are
    // dropped (the within-doc repetition quality rule — templated or
    // looping text repeats its own n-grams). Per-row shingle totals
    // are pure arithmetic; only the distinct count aggregates.
    "t18_repetition_filter" -> ((s, d) => {
      // distinct-3-gram count is a PER-ROW quantity: computed inside
      // the row's own shingle array (zero shuffles before the final
      // lang rollup — the explode+groupBy form paid a corpus-sized
      // exchange for it; ADVICE r7)
      docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .withColumn("total_sh", greatest(col("ntok") - 2, lit(0L)))
        .withColumn("distinct_sh", TextOps.distinctShingleCount(col("text"), 3))
        .withColumn("rep_ratio",
          when(col("total_sh") > 0,
            lit(1.0d) - col("distinct_sh").cast("double") /
              col("total_sh").cast("double")).otherwise(lit(0.0d)))
        .filter(col("rep_ratio") <= 0.2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("toks_kept"))
        .orderBy("lang")
    }),

    // T19 PII scrubbing: redact emails/phones/IPs and audit what was
    // removed per language. The synthetic corpus has no digits at all,
    // so PII-shaped tokens are first INJECTED deterministically (hash-
    // bucketed on doc_id, mirrored in the oracle) — the regex scrub,
    // match counting, and char-delta audit run for real on both
    // engines; on a real corpus the injection stage simply disappears.
    "t19_pii_scrub" -> ((s, d) => {
      val hb = TextOps.fingerprint(col("doc_id").cast("string")) % 100
      val injected = docs(s, d).withColumn("hb", hb)
        .withColumn("ptext",
          when(col("hb") < 20, concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com")))
          .when(col("hb") < 35, concat(col("text"), lit(" call 555-123-4567 ext "),
            col("doc_id").cast("string")))
          .when(col("hb") < 45, concat(col("text"), lit(" from host 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".17")))
          .otherwise(col("text")))
        .withColumn("stext", TextOps.scrubPii(col("ptext")))
      injected.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("stext") =!= col("ptext"), 1L).otherwise(0L)).as("n_pii_docs"),
          sum(regexp_count(col("ptext"), lit(TextOps.piiPatterns.head._2)))
            .cast("long").as("n_emails"),
          sum((length(col("ptext")) - length(col("stext"))).cast("long"))
            .as("chars_delta"))
        .orderBy("lang")
    }),

    // T20 deterministic train/val/test split: assignment is a pure
    // function of the doc id's rolling hash (98/1/1), so the split is
    // reproducible across engines, runs, and cluster sizes, and a doc
    // can never migrate between splits when the corpus grows — the
    // leakage-safety property RNG splits don't have. Shuffle-free
    // until the audit aggregation.
    "t20_split_assign" -> ((s, d) => {
      // salted key: the rolling hash of a bare 1-3 digit id only
      // reaches ~56k distinct values and misses whole residue ranges
      // mod 1000 (measured: no doc hit bucket >= 980 on the small SFs);
      // the salt makes the string long enough to mix through the
      // modulus on every SF
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      docs(s, d).withColumn("hb", hb)
        .withColumn("part",
          when(col("hb") < 980, "train").when(col("hb") < 990, "val")
            .otherwise("test"))
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("part"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_toks"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("part")
    }),

    // T21 decontamination: flag test-split documents sharing any
    // 5-gram with the train split — the benchmark-contamination check
    // every training corpus needs (the n-gram-overlap rule of
    // GPT-3/Pile-style decontamination). Train shingles are distinct
    // hashed ids, so the overlap join is an equi-join on a bounded
    // integer key — never a cross product — and at 100 TB it
    // hash-partitions on sid like any fact-fact join. On this corpus
    // it catches exactly the planted near-duplicate that straddles
    // the split.
    "t21_decontaminate" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val test = base.filter(col("hb") >= 980)
      val testSh = TextOps.shingles(test, 5)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      // the marking direction's bloom move (same plan shape as t26's
      // removal direction): the TRAIN side is the ~1000x one at 100 TB,
      // so its shingle table is pruned map-side — before its first
      // exchange — against a broadcast Bloom filter of the (small) test
      // sid set; the exact join after the distinct removes the filter's
      // false positives, so n_hits is unchanged (PlanAuditSpec pins the
      // Filter-below-Exchange shape).
      val testSids = testSh.select("sid").distinct()
      val trainSh = graft.plans.BloomFns.bloomPrune(
          TextOps.shingles(base.filter(col("hb") < 980), 5)
            .select(TextOps.fingerprint(col("sh")).as("sid")),
          testSids, "sid", expectedItems = 200000L, numBits = 1600000L)
        .distinct()
      val hits = testSh.join(trainSh, "sid")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      test.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    }),

    // T22 temperature-based mixture sampling (the UniMax /
    // alpha-sampling data-mixing move): per-language acceptance rate
    // (n_min/n_l)^0.5, so the largest languages are downsampled toward
    // a flatter mixture while the smallest keeps everything — the rate
    // comes from the corpus's own counts (a broadcast 5-row aggregate),
    // not driver-side constants, and acceptance is the deterministic
    // doc-id hash, reproducible across engines and runs.
    "t22_temperature_mix" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":mix"))) % 10000
      val base = docs(s, d).withColumn("hb", hb)
      val stats = base.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val nmin = stats.agg(min(col("n_l")).as("n_min"))
      base.join(broadcast(stats), "lang").crossJoin(broadcast(nmin))
        .filter(col("hb").cast("double") <
          sqrt(col("n_min").cast("double") / col("n_l").cast("double")) * 10000d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
        .orderBy("lang")
    }),

    // T23 contamination REMOVAL (the production direction of t21):
    // drop from the TRAIN split every doc sharing a 5-gram with the
    // held-out split, then audit what survives per language — eval
    // overlap is scrubbed from training data, not the other way
    // around. The guilty-doc set is a distinct semi-join on hashed
    // shingle ids (bounded key; anti-join back on doc_id).
    "t23_decontam_removal" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val train = base.filter(col("hb") < 980)
      val heldSh = TextOps.shingles(base.filter(col("hb") >= 980), 5)
        .select(TextOps.fingerprint(col("sh")).as("sid")).distinct()
      val trainSh = TextOps.shingles(train, 5)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      val guilty = trainSh.join(heldSh, "sid").select("doc_id").distinct()
      train.join(guilty, Seq("doc_id"), "left_anti")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("toks_kept"))
        .orderBy("lang")
    }),

    // T26 bloom-pruned decontamination — SAME semantics (and oracle)
    // as t23, different plan: the held-out shingle-id set becomes a
    // broadcast Bloom filter (Spark's own runtime-filter machinery,
    // BloomFilterAggregate + might_contain) that prunes the train
    // shingle table map-side BEFORE the shuffle join; the exact join
    // then removes the filter's false positives. At 100 TB the train
    // side is ~1000x the held-out side — this turns its all-to-all
    // shuffle into a shuffle of only might-match rows. Answers are
    // bit-identical to t23 by construction.
    "t26_bloom_decontam" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val train = base.filter(col("hb") < 980)
      val heldSh = TextOps.shingles(base.filter(col("hb") >= 980), 5)
        .select(TextOps.fingerprint(col("sh")).as("sid")).distinct()
      val trainSh = TextOps.shingles(train, 5)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      val candidates = graft.plans.BloomFns.bloomPrune(
        trainSh, heldSh, "sid", expectedItems = 200000L, numBits = 1600000L)
      val guilty = candidates.join(heldSh, "sid").select("doc_id").distinct()
      train.join(guilty, Seq("doc_id"), "left_anti")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("toks_kept"))
        .orderBy("lang")
    }),

    // T24 the GOVERNED corpus pipeline as one query: split assignment
    // -> quality filter -> exact dedup -> decontamination against the
    // held-out split -> concat-and-chunk packing. The governance tail
    // (t20/t23) composed with the preprocessing stages the standalone
    // queries check (t07/t01/t12), end to end and still DuckDB-exact.
    // (t14 is the near-dup variant of this composition; this one
    // exercises split+decontamination instead.)
    "t24_governed_pipeline" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val arr = split(col("text"), " ")
      val qual = base.filter(col("hb") < 980)
        .withColumn("ntok", size(arr).cast("long"))
        .withColumn("uniq_ratio",
          size(array_distinct(arr)).cast("double") / size(arr).cast("double"))
        .filter(col("ntok") >= 5 && col("uniq_ratio") >= 0.3)
        .select("doc_id", "text", "ntok")
      val dw = Window.partitionBy(col("text")).orderBy(col("doc_id"))
      val uniqDocs = qual.withColumn("rn", row_number().over(dw))
        .filter(col("rn") === 1).drop("rn")
      val heldSh = TextOps.shingles(base.filter(col("hb") >= 980), 5)
        .select(TextOps.fingerprint(col("sh")).as("sid")).distinct()
      val trainSh = TextOps.shingles(uniqDocs, 5)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      val guilty = trainSh.join(heldSh, "sid").select("doc_id").distinct()
      val kept = uniqDocs.join(guilty, Seq("doc_id"), "left_anti")
        .select("doc_id", "ntok")
      graft.text.Packing.withRunningOffset(kept, "doc_id", "ntok", "off")
        .withColumn("chunk_first", expr("off div 256"))
        .select("doc_id", "ntok", "off", "chunk_first")
        .orderBy("doc_id")
    }),

    // T25 exact duplicated-SPAN removal (Lee et al. 2022 substring
    // dedup): 8-token windows whose rolling-hash id repeats anywhere
    // in the corpus are duplicated spans; per doc they coalesce into
    // islands (the interval algebra doing text dedup) and island
    // length subtracted from ntok is the kept text. Doc-level dedup
    // (t01/t14) misses a copied paragraph inside an otherwise-unique
    // doc; this is the operator that catches it.
    "t25_span_dedup" -> ((s, d) => {
      val base = docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      base.join(graft.text.Dedup.dupSpanStats(base, 8), Seq("doc_id"), "left")
        .select(col("doc_id"), col("ntok"),
          coalesce(col("dup_toks"), lit(0L)).as("dup_toks"),
          coalesce(col("n_islands"), lit(0L)).as("n_islands"),
          (col("ntok") - coalesce(col("dup_toks"), lit(0L))).as("toks_kept"))
        .orderBy("doc_id")
    }),

    // T29 the production output of t25: duplicated spans REMOVED —
    // the coalesced dup islands aggregate to one small array per doc,
    // join back by doc_id, and each row drops its covered tokens with
    // a per-row HOF over split(text) (text never explodes, nothing
    // per-token shuffles). Docs fully consumed by duplicated text
    // disappear.
    "t29_span_removal" -> ((s, d) =>
      graft.text.Dedup.removeDupSpans(docs(s, d), 8)
        .orderBy("doc_id")),

    // T30 the CLEAN pipeline capstone (round-5 roadmap): split
    // assignment -> substring-level dedup on the train split (t29's
    // span removal - the strongest dedup in the suite) -> 5-gram
    // decontamination of the CLEANED text against the held-out split
    // -> concat-and-chunk packing. Every stage is an already-proven
    // oracle-green operator; this composes them end to end.
    "t30_clean_pipeline" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val train = base.filter(col("hb") < 980).select("doc_id", "text")
      val cleaned = graft.text.Dedup.removeDupSpans(train, 8)
        .select(col("doc_id"), col("n_kept").as("ntok"),
          col("text_kept").as("text"))
      val heldSh = TextOps.shingles(base.filter(col("hb") >= 980), 5)
        .select(TextOps.fingerprint(col("sh")).as("sid")).distinct()
      val cleanSh = TextOps.shingles(cleaned, 5)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      val guilty = cleanSh.join(heldSh, "sid").select("doc_id").distinct()
      val kept = cleaned.join(guilty, Seq("doc_id"), "left_anti")
        .select("doc_id", "ntok")
      graft.text.Packing.withRunningOffset(kept, "doc_id", "ntok", "off")
        .withColumn("chunk_first", expr("off div 256"))
        .select("doc_id", "ntok", "off", "chunk_first")
        .orderBy("doc_id")
    }),

    // T31 caption–transcript word alignment (the reference's
    // transcript_alignment.py -> scannertools TranscriptAligner, which
    // aligns caption words against ASR words per 60 s segment):
    // word-level Levenshtein between each near-dup pair's token
    // sequences via the native TokenEditDistance expression (a two-row
    // DP in one codegen'd loop — the HOF form would be O(n^2 m)
    // interpreted), plus char-level levenshtein and the normalized
    // word-error ratio. The near-dup pair graph (t03's generator)
    // bounds the candidates, so the per-pair O(n*m) DP never goes
    // corpus-quadratic — the same cost bound the reference gets from
    // per-segment alignment. chr_dist is cross-engine because the
    // corpus is ASCII (Spark's levenshtein counts codepoints, DuckDB's
    // counts bytes; they agree on ASCII).
    "t31_align_pairs" -> ((s, d) => {
      val base = docs(s, d)
      TextOps.alignPairs(
        TextOps.jaccardPairs(base, k = 3, dfCap = 50, tauJacc = 0.5), base)
        .orderBy("d1", "d2")
    }),

    // T33 per-word transcript re-timing (the aligner's second output:
    // load_aligned_transcript.py dump_aligned_transcript_byword writes
    // a word-level SRT with interpolated per-word times). For every
    // aligned pair, d1's words are linearly interpolated across d1's
    // 60 s segment (SEG_LENGTH) in integer milliseconds — the R12
    // rescale from token-index space onto the timeline — and each word
    // becomes a VTT cue through the s14 export path. Alignment is a
    // SECOND stage over the shared candidate generator: a pipeline
    // computes jaccardPairs once and feeds t31's distances and t33's
    // re-timing from the same pair scan.
    "t33_word_retime" -> ((s, d) => {
      val base = docs(s, d)
      TextOps.retimeWords(
        TextOps.jaccardPairs(base, k = 3, dfCap = 50, tauJacc = 0.5), base)
        .orderBy("d1", "d2", "w")
    }),

    // T34 unicode NFC gate — the canonical-composition pass a corpus
    // runs before any hashing/dedup (decomposed "e + COMBINING ACUTE"
    // vs composed "é" must fingerprint identically or near-dup joins
    // silently miss; native codegen'd NfcNormalize, ASCII fast path).
    // Per lang: docs, docs changed by NFC, and the rolling-hash
    // checksum of the NORMALIZED text — the checksum proves the
    // normalize ran through the hash identically in both engines
    // (DuckDB nfc_normalize implements the same UAX #15 form; the
    // non-ASCII behavior itself is pinned in HashExprSpec fixtures).
    "t34_nfc_gate" -> ((s, d) => {
      val nfc = graft.plans.GraftFunctions.nfcNormalize(col("text"))
      docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(nfc === col("text"), 0L).otherwise(1L)).as("n_changed"),
          sum(TextOps.fingerprint(nfc)).as("nfc_checksum"))
        .orderBy("lang")
    }),

    // T35 content-defined chunking dedup (the LBFS/FastCDC storage-
    // style dedup plane, completing the dedup family: exact t01, span
    // t25, shingle-Jaccard t03, MinHash t04, SimHash t05, semantic
    // v10): cut where the rolling hash of the trailing 8 chars ≡ 0
    // mod 64 (expected ~64-char chunks). Boundaries depend only on
    // LOCAL content, so identical runs shared across docs chunk
    // identically at ANY offset — chunk-hash groupBy finds cross-doc
    // duplicated content with no alignment step (what fixed-size
    // chunking can't do; CdcSpec pins the shift-resistance law).
    // Per-lang chunk-dedup audit; one O(len) codegen'd loop per row,
    // zero shuffles before the rollup.
    // T36 Gopher-style top-n-gram repetition filter (Rae et al. 2021
    // Table A1 — the rule family t18's distinct-ratio signal doesn't
    // cover: a doc can have high distinct 3-grams overall while ONE
    // n-gram still dominates). The most-repeated 2-gram / 3-gram
    // occurrence counts are PER-ROW quantities over the raw shingle
    // window arrays (native max_multiplicity — one O(n) hash loop,
    // duplicates included, no explode, zero shuffles before the lang
    // rollup), and the drop rules compare in exact integer arithmetic
    // (tc*100 > thr*n) so both engines agree on every boundary doc.
    "t36_topgram_filter" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.Bridge
      def wins(k: Int) = Bridge.column(
        graft.plans.Shingles(Bridge.expression(col("text")), k))
      docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .withColumn("n2", greatest(col("ntok") - 1, lit(0L)))
        .withColumn("n3", greatest(col("ntok") - 2, lit(0L)))
        .withColumn("tc2", graft.plans.GraftFunctions.maxMultiplicity(wins(2)))
        .withColumn("tc3", graft.plans.GraftFunctions.maxMultiplicity(wins(3)))
        .withColumn("viol2", col("tc2") * 100 > col("n2") * 5)
        .withColumn("viol3", col("tc3") * 100 > col("n3") * 4)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("viol2"), 1L).otherwise(0L)).as("n_viol_top2"),
          sum(when(col("viol3"), 1L).otherwise(0L)).as("n_viol_top3"),
          sum(when(!col("viol2") && !col("viol3"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // T37 containment near-dup pairs: the ASYMMETRIC inclusion metric
    // over the same df-capped inverted-index candidates as t03 —
    // max(inter/n1, inter/n2) >= 0.8 catches a short doc embedded in a
    // long one (containment ≈ 1, Jaccard only ≈ n_short/n_long), the
    // quote/boilerplate-embedding duplication the symmetric t03 filter
    // misses. Same pigeonhole df-cap bound: candidate count is
    // metric-independent, so the 100 TB shape is identical to t03.
    "t37_containment_pairs" -> ((s, d) =>
      TextOps.containmentPairs(docs(s, d), k = 3, dfCap = 50, tauC = 0.8)
        .select("d1", "d2", "inter", "n1", "n2", "jacc", "cmax")
        .orderBy("d1", "d2")),

    // T38 near-dup cluster retention: the keep-one-per-cluster policy
    // (SlimPajama/RefinedWeb dedup step) — CC cluster ids over t15's
    // edge set; the retained representative is the LONGEST member
    // (ties: smallest doc_id) via a per-cluster window argmax. The
    // audit emits every clustered doc with its keep verdict, so the
    // retention decision itself — not just the clustering — is
    // oracle-exact. Scale: window partitions are near-dup clusters
    // (bounded by the df-cap candidate generator), never the corpus.
    "t38_cluster_keep" -> ((s, d) => {
      val comps = graft.text.Dedup.connectedComponents(
        TextOps.jaccardPairs(docs(s, d), k = 3, dfCap = 50, tauJacc = 0.5))
      val ntok = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("ntok").desc, col("doc_id"))
      comps.join(ntok, "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster", "ntok", "keep")
        .orderBy("doc_id")
    }),

    // T39 winnowing candidate pairs: the MOSS/plagiarism-detector
    // pipeline — per-doc winnowed fingerprints (k=3 grams, w=4
    // windows; see TextOps.winnow) explode into a ~2/(w+1)-density
    // inverted index, df-capped like t03, and docs sharing >= 2
    // selected fingerprints become candidates. Positional selection
    // means candidates are guaranteed for any shared run >= 6 tokens —
    // a different (substring-run) guarantee than t03's set-Jaccard.
    // Routed through TextOps.winnowPairs (eager checkpoint + cache
    // release): the r9 verdict caught the inline version pinning its
    // two corpus-sized caches for the rest of a full-corpus run.
    "t39_winnow_pairs" -> ((s, d) =>
      TextOps.winnowPairs(docs(s, d), k = 3, w = 4, dfCap = 50, minShared = 2)
        .orderBy("d1", "d2")),

    // T40 TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    // power iteration over the token co-occurrence graph — the classic
    // unsupervised keyword/summary scorer a corpus pipeline runs after
    // cleaning. Fully integer (scores scaled 1e6, damping 0.85 as the
    // rational 17/20, per-edge floor division), so three unrolled
    // iterations are cross-engine exact — no float PageRank ever is.
    // Scale: see TextOps.textRank — one corpus pass builds the
    // vocabulary-bounded edge table (map-side native Shingles), then
    // each iteration is a single vocabulary-sized join+agg over
    // checkpointed leaves with superseded rounds freed eagerly.
    "t40_textrank" -> ((s, d) =>
      TextOps.textRank(docs(s, d), iters = 3)
        .orderBy(col("pr").desc, col("tok")).limit(10)),

    // T42 per-doc triangle participation in the near-dup graph — the
    // cluster-density signal (a clique-ish cluster is template spam; a
    // chain is drift) layered on t15's edge set. Ordered-edge triangle
    // join: edges already satisfy d1 < d2, so each triangle a<b<c is
    // found exactly once by the (ab ⋈ bc ⋈ ac) pattern. Scale: both
    // joins key on shared endpoints of the df-cap-bounded edge list —
    // never the corpus; degree is bounded by the candidate generator.
    "t42_triangles" -> ((s, d) =>
      graft.text.Dedup.trianglesPerNode(
        TextOps.jaccardPairs(docs(s, d), k = 3, dfCap = 50, tauJacc = 0.5))
        .orderBy("doc_id")),

    // T43 stratified quota sampling: a FIXED quota of 20 docs per
    // language, chosen by deterministic hash order (the t20 salted
    // rolling hash, doc_id tiebreak) — the per-language subsampling
    // move a mixture build runs when a stratum must be capped
    // regardless of corpus size (contrast t16/t22, which sample
    // proportionally). One window per stratum; the quota makes the
    // output size |langs| * 20 independent of SF.
    "t43_stratified_sample" -> ((s, d) => {
      val h = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":strat")))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      docs(s, d).withColumn("h", h)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
        .select(col("lang"), col("rn"), col("doc_id"), col("h"))
        .orderBy("lang", "rn")
    }),

    // T44 INCREMENTAL near-dup: probe a new batch against the indexed
    // corpus — the production daily-crawl shape (the index persists;
    // only the delta is signed and probed), vs t04's all-pairs batch
    // job. Batch split by deterministic hash (~20% "new"); both sides
    // get t04's 16-hash/8-band minhash signatures; candidates are
    // new-band x old-band collisions; survivors verify by EXACT shingle
    // Jaccard >= 0.5 (LSH recalls, the exact check decides — the
    // two-stage discipline of v15 applied to text). Emits one audit row
    // per new doc. Scale: the banded index is the persistent table
    // (bucketed by (band, sig) at 100 TB); the new batch's bands are
    // delta-sized and broadcastable; candidate verification joins only
    // the candidates' shingle sets, never old x old.
    "t44_incremental_dedup" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":batch"))) % 10
      val base = docs(s, d).withColumn("hb", hb)
      val newD = base.filter(col("hb") >= 8).select("doc_id", "text")
      val oldD = base.filter(col("hb") < 8).select("doc_id", "text")
      val idsN = TextOps.shingleIds(newD, 3)
      val idsO = TextOps.shingleIds(oldD, 3)
      // r21: map-side banded signatures (see t04 / TextOps.minhashBands)
      val bandsN = TextOps.minhashBands(newD, 3, 16, P)
      val bandsO = TextOps.minhashBands(oldD, 3, 16, P)
      val cand = bandsN.select(col("doc_id").as("dn"), col("band"), col("sig"))
        .join(bandsO.select(col("doc_id").as("dold"), col("band"), col("sig")),
          Seq("band", "sig"))
        .select("dn", "dold").distinct()
      val szN = idsN.groupBy("doc_id").agg(count(lit(1)).as("nn"))
      val szO = idsO.groupBy("doc_id").agg(count(lit(1)).as("nold"))
      val inter = cand
        .join(idsN.select(col("doc_id").as("dn"), col("sid")), Seq("dn"))
        .join(idsO.select(col("doc_id").as("dold"), col("sid")), Seq("dold", "sid"))
        .groupBy("dn", "dold").agg(count(lit(1)).as("inter"))
      val dups = inter
        .join(szN.withColumnRenamed("doc_id", "dn"), "dn")
        .join(szO.withColumnRenamed("doc_id", "dold"), "dold")
        .filter(col("inter").cast("double") /
          (col("nn") + col("nold") - col("inter")).cast("double") >= 0.5)
        .groupBy("dn").agg(count(lit(1)).as("n_dup"))
      val nc = cand.groupBy("dn").agg(count(lit(1)).as("n_cand"))
      newD.select(col("doc_id"))
        .join(nc.withColumnRenamed("dn", "doc_id"), Seq("doc_id"), "left")
        .join(dups.withColumnRenamed("dn", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          (coalesce(col("n_dup"), lit(0L)) > 0).as("is_dup"))
        .orderBy("doc_id")
    }),

    // T45 DSIR-style hashed importance scores (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling",
    // integerized): features are bigram occurrences hashed into 512
    // buckets; the target distribution is the English subcorpus, the
    // raw distribution the whole corpus; each bucket carries the
    // add-one-smoothed scaled frequency ratio ((t_b+1)*1e6 div
    // (r_b+1)), and a doc scores the SUM of its occurrences' bucket
    // ratios — the higher, the more target-like. (DSIR sums log
    // ratios; the monotone integer ratio-sum keeps the ranking
    // cross-engine exact where float logs never are.) Scale: the
    // 512-row bucket table is a broadcast; scoring is one map-side
    // hash + a per-doc sum — the corpus is read once.
    "t45_dsir_scores" -> ((s, d) => {
      val base = docs(s, d)
      val feats = TextOps.positionedShingles(base, 2)
        .select(col("doc_id"), (TextOps.fingerprint(col("sh")) % 512).as("fb"))
      val raw = feats.groupBy("fb").agg(count(lit(1)).as("rb"))
      val tgt = feats.join(base.filter(col("lang") === "en").select("doc_id"), "doc_id")
        .groupBy("fb").agg(count(lit(1)).as("tb"))
      val wgt = broadcast(raw.join(tgt, Seq("fb"), "left")
        .select(col("fb"),
          expr("((coalesce(tb, 0) + 1) * 1000000) div (rb + 1)").as("wgt")))
      val scored = feats.join(wgt, "fb")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feat"), sum(col("wgt")).as("dsir_score"))
      base.select("doc_id", "lang").join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_feat"), lit(0L)).as("n_feat"),
          coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
        .orderBy("doc_id")
    }),

    // T46 mixture budget planner: given a total token target and fixed
    // per-language mixture weights (en 50%, every other stratum an
    // equal split of the rest), report per stratum what a sampler must
    // do — the DOWN-sample rate when supply exceeds the target, or the
    // repeat factor (epochs, in centi-units) when the target exceeds
    // supply. The planning arithmetic that drives t16/t22/t43's
    // samplers, emitted as an auditable table; pure integer (ppm /
    // centi-epochs), so cross-engine exact. Scale: one aggregation to
    // lang level, then constant-size arithmetic.
    "t46_budget_plan" -> ((s, d) => {
      val target = 100000L
      val langs = docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("toks_avail"))
      val nOther = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      langs
        .withColumn("n_strata", count(lit(1)).over(nOther))
        .withColumn("share_ppm",
          when(col("lang") === "en", lit(500000L))
            .otherwise(expr("500000 div (n_strata - 1)")))
        .withColumn("target_toks", expr(s"($target * share_ppm) div 1000000"))
        .withColumn("rate_ppm",
          least(lit(1000000L), expr("(target_toks * 1000000) div toks_avail")))
        .withColumn("epochs_centi",
          greatest(lit(100L),
            expr("(target_toks * 100 + toks_avail - 1) div toks_avail")))
        .select("lang", "n_docs", "toks_avail", "share_ppm",
          "target_toks", "rate_ppm", "epochs_centi")
        .orderBy("lang")
    }),

    // T47 tokenizer merge-table coverage audit: fix the "tokenizer" to
    // the corpus's top-400 bigram merges (count desc, bigram asc — the
    // deterministic stand-in for a shipped BPE merge table; unigrams
    // are useless here, the synthetic corpus has only 31 of them) and
    // report per language the rate of bigram occurrences OUTSIDE the
    // table (ppm) plus how many docs exceed 50% uncovered — the "will
    // this tokenizer shred the corpus into singles" fertility check
    // run before committing a token budget. Scale: the merge table is
    // an aggregate top-k (broadcast); scoring is one map-side
    // anti-join per occurrence — the corpus is read once; only
    // lang-level totals shuffle.
    "t47_oov_audit" -> ((s, d) => {
      val bg = TextOps.positionedShingles(docs(s, d), 2)
        .select(col("doc_id"), col("sh"))
      // top-400 vocab via distributed TakeOrdered — a bare rank window
      // here would sort the whole bigram vocabulary in one task
      val vocab = broadcast(bg.groupBy("sh").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("sh")).limit(400)
        .select("sh"))
      val perDoc = bg.join(vocab.withColumn("__v", lit(1)), Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nbg"),
          sum(when(col("__v").isNull, 1L).otherwise(0L)).as("noov"))
      docs(s, d).select("doc_id", "lang")
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("nbg"), lit(0L))).as("bg_total"),
          sum(coalesce(col("noov"), lit(0L))).as("oov_total"),
          sum(when(coalesce(col("noov"), lit(0L)) * 2 >
            coalesce(col("nbg"), lit(0L)), 1L).otherwise(0L)).as("n_docs_high"))
        .withColumn("oov_ppm", expr("(oov_total * 1000000) div bg_total"))
        .select("lang", "n_docs", "bg_total", "oov_total", "oov_ppm",
          "n_docs_high")
        .orderBy("lang")
    }),

    // T48 length-striped shard packing: rank docs by (ntok desc,
    // doc_id) and stripe round-robin into 8 shards — the balanced-
    // batch layout an SFT/packing job wants (longest docs spread
    // evenly, no shard stuck with all the long tails). The global rank
    // is the SCALABLE two-phase prefix count (t12's machinery with
    // valCol = 1 over a composite order key) — a bare row_number()
    // window with no partition would sort the corpus in one task. The
    // audit emits per-shard doc/token totals and fill ppm vs the
    // fullest shard.
    "t48_striped_packing" -> ((s, d) => {
      val nbins = 8
      val base = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      // unique ascending key == (ntok desc, doc_id asc): ntok < 2^20,
      // doc_id < 2^40, so the composite stays inside a long
      val keyed = base
        .withColumn("__key",
          expr("(1048576 - ntok) * 1099511627776 + doc_id"))
        .withColumn("__one", lit(1L))
      val ranked = graft.text.Packing
        .withRunningOffset(keyed, "__key", "__one", "rk0")
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      ranked.withColumn("bin", col("rk0") % nbins)
        .groupBy("bin").agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("sum_toks"), max(col("ntok")).as("max_toks"))
        .withColumn("__max_sum", max(col("sum_toks")).over(wAll))
        .withColumn("fill_ppm", expr("(sum_toks * 1000000) div __max_sum"))
        .select("bin", "n_docs", "sum_toks", "max_toks", "fill_ppm")
        .orderBy("bin")
    }),

    // T50 learned language classifier (Naive-Bayes-flavored,
    // integerized): per-language feature weights TRAINED from the
    // corpus — hashed token-bigram occurrences (512 buckets), weight =
    // add-one-smoothed scaled frequency ((c_lf+1)*1e6 div (c_l+512))
    // — then every doc classified by argmax of its occurrences' weight
    // sum (the t45 ratio-sum proxy for the log-prob sum: monotone and
    // cross-engine exact where float logs are not; weights exist for
    // OBSERVED (lang, feature) pairs only — an unseen pair scores 0,
    // a harsher-than-Laplace penalty, mirrored identically in the
    // oracle). Output is the
    // confusion matrix against the labeled lang — the classifier-
    // quality audit t11's stopword heuristic cannot produce. Scale:
    // the 5x512 weight table broadcasts; scoring is one map-side hash
    // join + a (doc, lang) sum; only the 25-cell rollup shuffles.
    "t50_nb_langid" -> ((s, d) => {
      val base = docs(s, d)
      val feats = TextOps.positionedShingles(base, 2)
        .select(col("doc_id"), (TextOps.fingerprint(col("sh")) % 512).as("fb"))
      val labeled = feats.join(base.select("doc_id", "lang"), "doc_id")
      val cl = labeled.groupBy("lang").agg(count(lit(1)).as("c_l"))
      val wgt = broadcast(labeled.groupBy("lang", "fb")
        .agg(count(lit(1)).as("c_lf"))
        .join(cl, "lang")
        .select(col("fb"), col("lang").as("cand"),
          expr("((c_lf + 1) * 1000000) div (c_l + 512)").as("w")))
      val scores = feats.join(wgt, "fb")
        .groupBy("doc_id", "cand").agg(sum(col("w")).as("score"))
      val aw = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand"))
      val pred = scores.withColumn("rn", row_number().over(aw))
        .filter(col("rn") === 1).select(col("doc_id"), col("cand").as("pred"))
      base.select("doc_id", "lang").join(pred, Seq("doc_id"), "left")
        .groupBy(col("lang"), coalesce(col("pred"), lit("none")).as("pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred")
    }),

    // T61 classifier calibration audit (reliability diagram): t50's
    // NB language classifier re-scored with its CONFIDENCE — the
    // integer score margin between the top two candidates, normalized
    // per bigram — bucketed into 10 bands with per-band accuracy. The
    // model-governance readout that decides whether a quality/langid
    // classifier's confidence can gate data (a well-calibrated model
    // shows accuracy rising monotonically with the band). All-integer
    // margins; the only doubles are the final per-band ratios.
    "t61_calibration" -> ((s, d) => {
      val base = docs(s, d)
      val feats = TextOps.positionedShingles(base, 2)
        .select(col("doc_id"), (TextOps.fingerprint(col("sh")) % 512).as("fb"))
      val labeled = feats.join(base.select("doc_id", "lang"), "doc_id")
      val cl = labeled.groupBy("lang").agg(count(lit(1)).as("c_l"))
      val wgt = broadcast(labeled.groupBy("lang", "fb")
        .agg(count(lit(1)).as("c_lf"))
        .join(cl, "lang")
        .select(col("fb"), col("lang").as("cand"),
          expr("((c_lf + 1) * 1000000) div (c_l + 512)").as("w")))
      val scores = feats.join(wgt, "fb")
        .groupBy("doc_id", "cand").agg(sum(col("w")).as("score"))
      val aw = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand"))
      val ranked = scores.withColumn("rn", row_number().over(aw))
        .filter(col("rn") <= 2)
      val top = ranked.filter(col("rn") === 1)
        .select(col("doc_id"), col("cand").as("pred"), col("score").as("s1"))
      val second = ranked.filter(col("rn") === 2)
        .select(col("doc_id").as("d2"), col("score").as("s2"))
      val nbg = feats.groupBy("doc_id").agg(count(lit(1)).as("n_bg"))
      base.select("doc_id", "lang")
        .join(top, "doc_id")
        .join(second, col("doc_id") === col("d2"), "left")
        .join(nbg, "doc_id")
        .withColumn("mpb", expr("(s1 - coalesce(s2, 0L)) div n_bg"))
        .withColumn("bucket", least(expr("mpb div 64"), lit(9L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
        .withColumn("acc6",
          round(col("n_correct").cast("double") / col("n").cast("double"), 6))
        .orderBy("bucket")
    }),

    // T62 corpus length-concentration (Gini): how unequal the
    // per-document length distribution is — the skew early-warning a
    // mixture/packing plan reads next to t56's card (G→0 uniform,
    // G→1 a few giant docs hold the corpus). Exact midrank form over
    // the (len, cnt) distinct-value domain: 2·Σ rank·x per tie block
    // is x·c·(2t+c+1) — all integer (exact to ~2^53-scale corpora;
    // switch the two product columns to decimal(38,0) past that),
    // cumulated by the same two-phase prefix sum as a28/a30/st13.
    // T63: corpus snapshot diff — the change-detection step a daily
    // crawl runs before incremental work: its added/changed partitions
    // are exactly the batches ph10's appendIndex and t44's incremental
    // probe ingest (reference analogue: the ScannerJob ledger comparing
    // processed vs present videos, scannerutil.py:136-146). Same
    // full-outer classify SHAPE as o06's relational SCD audit, but on
    // the text plane: membership + content equality over documents —
    // the corpus-side input stage of the index-maintenance lifecycle,
    // where o06 audits value deltas on a fact table. A deterministic
    // "yesterday" snapshot is derived from today's corpus (docs ending
    // in 2 didn't exist yet = added; a retired id block = removed;
    // docs ending in 1 carried a shorter draft = changed), then one
    // full-outer join on doc_id classifies every document. Scale: one
    // equi-join + a 4-group aggregate — no content hashing needed
    // until texts collide on id, and the text equality check is
    // per-row.
    "t63_corpus_diff" -> ((s, d) => {
      val now = docs(s, d).select(col("doc_id"), col("text"))
      val old = now.filter(col("doc_id") % 10 =!= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1, substring(col("text"), 1, 40))
            .otherwise(col("text")).as("old_text"))
        .unionByName(now.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            col("text").as("old_text")))
      now.join(old, Seq("doc_id"), "full_outer")
        .select(
          when(col("old_text").isNull, "added")
            .when(col("text").isNull, "removed")
            .when(col("text") === col("old_text"), "unchanged")
            .otherwise("changed").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    "t62_length_gini" -> ((s, d) => {
      val lens = docs(s, d)
        .select(length(col("text")).cast("long").as("x"))
        .groupBy("x").agg(count(lit(1)).as("c"))
        .cache() // shared by the offsets AND totals branches (ADVICE r10)
      val cum = graft.text.Packing.withRunningOffset(lens, "x", "c", "t")
      val tot = lens.agg(sum(col("c")).as("n"))
      cum.crossJoin(broadcast(tot))
        .select(col("n"),
          (col("x") * col("c")).as("sx"),
          (col("x") * col("c") * (col("t") * 2 + col("c") + 1)).as("r2x"))
        .groupBy(col("n"))
        .agg(sum(col("sx")).as("sumx"), sum(col("r2x")).as("rank2x"))
        .select(col("n").as("n_docs"), col("sumx").as("total_chars"),
          round(col("rank2x").cast("double") /
            (col("n").cast("double") * col("sumx").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double"), 6).as("gini6"))
    }),

    // T49 BPE merge training, two steps unrolled: each iteration picks
    // the corpus's most frequent adjacent token pair (count desc, pair
    // asc — the deterministic BPE selection rule) and applies the merge
    // corpus-wide (\b-anchored regexp, LTR non-overlapping in both
    // engines) before the next count. This is the TRAINING side of the
    // t47 coverage audit's merge table — tokenizer construction as a
    // corpus query. Scale: each iteration is one map-side pair count +
    // a 1-row broadcast into a per-row regexp — the corpus is read
    // once per iteration, nothing corpus-sized shuffles.
    "t49_bpe_merges" -> ((s, d) => {
      def topPair(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        TextOps.positionedShingles(df, 2)
          .groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("sh")).limit(1)
          .select(col("sh").as("pair"), col("cnt"))
      def applyMerge(df: org.apache.spark.sql.DataFrame,
                     pair: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.crossJoin(broadcast(pair.select(col("pair").as("__mp"))))
          .withColumn("text", regexp_replace(col("text"),
            concat(lit("\\b"), col("__mp"), lit("\\b")),
            translate(col("__mp"), " ", "_")))
          .select("doc_id", "text")
      val d0 = docs(s, d).select(col("doc_id"), col("text"))
      val p1 = topPair(d0)
      val d1 = applyMerge(d0, p1)
      val p2 = topPair(d1)
      p1.withColumn("it", lit(1L)).union(p2.withColumn("it", lit(2L)))
        .select("it", "pair", "cnt").orderBy("it")
    }),

    // T41 TF-IDF top-terms per document — keyword tagging, the per-doc
    // counterpart of ph04's corpus-level BM25 ranking. The idf is the
    // same log-free rational Robertson form, but here QUANTIZED BY
    // INTEGER DIVISION before the tf product, so the whole score is
    // BIGINT arithmetic with no mirrored doubles at all. Scale: ONE
    // corpus pass — tf is a map-side-combinable hash aggregation on
    // (doc, tok), and df rides a count window over the tf table keyed
    // by tok (a separate df aggregate would either re-scan the corpus
    // or broadcast a raw-token vocabulary, which at web scale does not
    // fit); only the 1-row corpus total broadcasts.
    "t41_tfidf_terms" -> ((s, d) => {
      val tf = toks(s, d).groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val tot = docs(s, d).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        .crossJoin(broadcast(tot))
        .withColumn("score",
          expr("tf * (((2 * (n - df) + 1) * 1000000) div (2 * df + 1))"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "score")
        .orderBy("doc_id", "rnk")
    }),

    "t35_cdc_dedup" -> ((s, d) =>
      docs(s, d).select(col("lang"),
          explode(TextOps.cdcChunks(col("text"), 8, 64L)).as("chunk"))
        .select(col("lang"), TextOps.fingerprint(col("chunk")).as("fp"),
          length(col("chunk")).cast("long").as("clen"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("fp")).as("n_distinct"),
          sum(col("clen")).as("total_chars"),
          (lit(1.0d) - countDistinct(col("fp")).cast("double") /
            count(lit(1)).cast("double")).as("dup_ratio"))
        .orderBy("lang")),

    // T32 n-gram LM quality scoring — the CCNet/Gopher perplexity-
    // filtering move, integerized: the reference model is the train
    // split's bigram table thresholded at count >= 2 (singletons are
    // noise, the cutoff plays the role of LM smoothing), and each doc
    // scores as its out-of-model bigram-occurrence rate — a
    // deterministic perplexity proxy with no float log-probs, so the
    // whole signal is cross-engine exact where real KenLM scores
    // could never be. Per-lang rollup keeps the output compact. Scale:
    // bigram occurrences are map-side (native Shingles array); the
    // model is one hash aggregation on a bounded integer key; the
    // scoring join is sid-equi — the decontam shape, bloom-prunable
    // the same way t21/t26 are.
    "t32_lm_quality" -> ((s, d) => {
      val hb = TextOps.fingerprint(
        concat(lit("graft:"), col("doc_id").cast("string"), lit(":split"))) % 1000
      val base = docs(s, d).withColumn("hb", hb)
      val bg = TextOps.positionedShingles(base, 2)
        .select(col("doc_id"), TextOps.fingerprint(col("sh")).as("sid"))
      val model = bg.join(base.filter(col("hb") < 980).select("doc_id"), "doc_id")
        .groupBy(col("sid")).agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
        .select("sid").withColumn("__in", lit(1))
      val scored = bg.join(model, Seq("sid"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bg"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      base.join(scored, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_bg"), lit(0L))).as("bg_total"),
          sum(coalesce(col("n_oov"), lit(0L))).as("oov_total"))
        .withColumn("oov_rate",
          col("oov_total").cast("double") / col("bg_total").cast("double"))
        .orderBy("lang")
    }),

    // T7 quality scoring (length/uniqueness/token stats)
    "t07_quality" -> ((s, d) => {
      val cols = TextOps.qualityColumns(col("text"))
      docs(s, d).select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // T8 token counting: global top-20 tokens
    "t08_token_topk" -> ((s, d) =>
      toks(s, d).groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(20)),

    // T28 BPE-ish regex pre-tokenization (the GPT-2 pre-tokenizer
    // shape: contraction suffixes, letter runs, digit runs, punct
    // runs, each with an optional leading space) vs whitespace
    // tokens — the token-count operator an LLM data pipeline budgets
    // with. Pattern sticks to the regex subset Java and RE2 share
    // (no lookaround), so both engines count identically.
    "t28_regex_tokens" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          size(TextOps.bpeTokens(col("text"))).cast("long").as("n_bpe"))
        .orderBy("doc_id")),

    // T27 bigram collocation mining: lift = N * c_xy / (c_x * c_y)
    // (monotone in PMI, no transcendental log — one mirrored double
    // division keeps the ranking value-exact across engines). Bigrams
    // come map-side from the positioned-shingle array (k=2, never
    // crossing doc boundaries); integer counts throughout. At 100 TB
    // the unigram side is df-capped vocabulary — bounded join keys.
    "t27_bigram_lift" -> ((s, d) => {
      val docsDf = docs(s, d)
      val bi = TextOps.positionedShingles(docsDf, 2)
        .select(split(col("sh"), " ").getItem(0).as("w1"),
          split(col("sh"), " ").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      val uni = TextOps.tokens(docsDf)
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val n = TextOps.tokens(docsDf).agg(count(lit(1)).as("n_tok"))
      bi.join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("c_xy"), col("c1"), col("c2"),
          (col("c_xy").cast("double") * col("n_tok").cast("double") /
            (col("c1") * col("c2")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // T9 rolling-hash document fingerprint
    "t09_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp")).orderBy("doc_id")),

    // T10 per-language corpus stats
    "t10_lang_stats" -> ((s, d) =>
      docs(s, d)
        .withColumn("ntok", size(split(col("text"), " ")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_chars"),
          sum(col("ntok").cast("long")).as("total_toks"))
        .orderBy("lang")),

    // T11 stopword-profile langid heuristic
    "t11_langid_stopwords" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"),
          TextOps.stopwordRatio(col("text"), Seq("the", "a")).as("en_ratio"))
        .withColumn("pred", when(col("en_ratio") > 0.08, "en").otherwise("other"))
        .orderBy("doc_id")),

    // M2 multimodal decode plumbing: text -> binary payload ->
    // mapPartitions feature stub (graft.multimodal); the byte checksum
    // equals the rolling hash so it IS oracle-checkable even though the
    // decode runs in typed partition code
    "m02_media_decode" -> ((s, d) =>
      graft.multimodal.Multimodal.decodeFeatures(
          graft.multimodal.Multimodal.asMedia(docs(s, d), "doc_id", "text", "text"))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("checksum"))
        .orderBy("media_id")),

    // M3 multimodal frame sampling: one row per stride-sampled frame
    // offset with a stubbed per-frame probe (spark_util.py:402-405
    // 1-frame-per-3s sampling; decode is honestly stubbed, the
    // explode/partitioning plumbing is real)
    "m03_frame_sample" -> ((s, d) =>
      graft.multimodal.Multimodal.sampleFrames(
          graft.multimodal.Multimodal.asMedia(docs(s, d), "doc_id", "text", "text"), 64)
        .select(col("media_id"), col("frame_off"), col("probe"))
        .orderBy("media_id", "frame_off")),

    // M4 overlapping-window sampling (audio-chunking plumbing): 64-byte
    // windows advanced by a 48-byte hop, clipped at the payload end,
    // with the stubbed per-window probe
    "m04_audio_windows" -> ((s, d) =>
      graft.multimodal.Multimodal.sampleWindows(
          graft.multimodal.Multimodal.asMedia(docs(s, d), "doc_id", "text", "audio"),
          win = 64, hop = 48)
        .select(col("media_id"), col("w_start"), col("w_end"), col("probe"))
        .orderBy("media_id", "w_start")),

    // M1 multimodal/binary column metadata: byte length + positional
    // checksum of the opaque payload (decode itself is stubbed — see
    // graft.multimodal)
    "m01_binary_meta" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
          octet_length(col("text")).as("nbytes"),
          (ascii(substring(col("text"), 1, 1)) +
            ascii(substring(col("text"), 17, 1)) * 31 +
            ascii(substring(col("text"), 33, 1)) * 961).as("checksum"))
        .orderBy("doc_id")),

    // M5 scene-cut segmentation (shot detection — the video plane's
    // canonical first derivative): adjacent sampled frames whose probe
    // feature jumps >= 30 mark a cut; scenes are the runs between
    // cuts, aggregated to (start, end, n_frames) intervals. The frame
    // features are the honest decode stub (same as m02/m03); the
    // pipeline shape — per-media ordered window, lag, running cut
    // count, scene rollup — is exactly what a real decoder feeds.
    // Scale: every window partitions by media_id; no global ordering
    // anywhere.
    "m05_scene_cuts" -> ((s, d) => {
      val frames = graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.asMedia(docs(s, d), "doc_id", "text", "video"), 64)
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_off"))
      frames
        .withColumn("prev", lag(col("probe"), 1).over(w))
        .withColumn("cut",
          when(col("prev").isNotNull && abs(col("probe") - col("prev")) >= 30, 1L)
            .otherwise(0L))
        .withColumn("scene",
          sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("media_id"), col("scene"))
        .agg(min(col("frame_off")).as("s_off"), max(col("frame_off")).as("e_off"),
          count(lit(1)).as("n_frames"))
        .orderBy("media_id", "scene")
    }),

    // M6 REAL container metadata probe (the ffprobe surface of the
    // reference ingest, ingest.py:21-43 width/height/fps/duration): a
    // genuine ISO-BMFF box walk + RIFF chunk walk over binary
    // payloads, not a byte stub. The fixture payloads are built
    // in-query from doc_id-derived parameters (Mp4Fixture/AviFixture
    // — the inverse a real pipeline reads from disk), so the oracle
    // checks the parser end to end: any wrong offset/endianness/box
    // path breaks the hash match. One narrow shuffle-free map per
    // side; scale = embarrassingly parallel header reads.
    "m06_container_probe" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        val payload =
          if (id % 2 == 0)
            graft.multimodal.Mp4Fixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              timescale = 25200L, durTicks = (id % 10 + 1) * 25200L,
              sampleDelta = 25200L / (24 + (id % 4) * 6))
          else {
            val fps = if (id % 4 == 1) 25L else 50L
            graft.multimodal.AviFixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              usPerFrame = 1000000L / fps, totalFrames = (id % 100 + 1) * 5L)
          }
        (id, payload)
      }.toDF("media_id", "payload")
      graft.multimodal.MediaProbe.probe(media).toDF().orderBy("media_id")
    }),

    // M7 catalog-vs-container runtime audit (corrupted_videos.ipynb:
    // the reference cross-checks each video's archive-metadata
    // `runtime` against the ingested container duration and lists the
    // ones that disagree — its corrupt-ingest detector). The catalog
    // runtime is a closed-form column (the metadata JSON of the
    // synthetic mapping) with an injected corruption class; the
    // container side is the m06 REAL header parse over the fixture
    // payloads, so a probe regression (wrong box path, wrong
    // timescale math) surfaces here as phantom mismatches. Narrow
    // map + filter, no shuffle until the output sort.
    "m07_runtime_mismatch" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        val payload =
          if (id % 2 == 0)
            graft.multimodal.Mp4Fixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              timescale = 25200L, durTicks = (id % 10 + 1) * 25200L,
              sampleDelta = 25200L / (24 + (id % 4) * 6))
          else {
            val fps = if (id % 4 == 1) 25L else 50L
            graft.multimodal.AviFixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              usPerFrame = 1000000L / fps, totalFrames = (id % 100 + 1) * 5L)
          }
        (id, payload)
      }.toDF("media_id", "payload")
      graft.multimodal.MediaProbe.probe(media).toDF()
        .withColumn("claimed_ms", expr(
          """CASE WHEN media_id % 2 = 0 THEN (media_id % 10 + 1) * 1000
            |  ELSE ((media_id % 100 + 1) * 5) *
            |    (1000000 div (CASE WHEN media_id % 4 = 1
            |       THEN 25 ELSE 50 END)) div 1000 END
            |+ CASE WHEN media_id % 7 = 0 THEN 120000 ELSE 0 END"""
            .stripMargin))
        .withColumn("drift_ms", abs(col("duration_ms") - col("claimed_ms")))
        .filter(col("drift_ms") > 60000)
        .select("media_id", "container", "duration_ms", "claimed_ms",
          "drift_ms")
        .orderBy("media_id")
    }),

    // M8 probe tolerance under corrupt payloads — the never-throw
    // ingest contract (MediaProbe's scaladoc; a 100 TB ingest queue
    // must not die on one bad file) as an ORACLE ROW: class 0 =
    // header too short for any sniff -> 'unknown' sentinels; class 1
    // = valid container magic but the metadata boxes truncated
    // mid-walk -> container identified, -1 fields (findBox/findList
    // bound every read); class 2 = garbage bytes -> 'unknown';
    // classes 3-4 = intact (the m06 fields). The oracle bakes the
    // same class arithmetic, so a parser that starts throwing OR
    // misclassifying degradation breaks the hash.
    "m08_probe_tolerance" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        val full =
          if (id % 2 == 0)
            graft.multimodal.Mp4Fixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              timescale = 25200L, durTicks = (id % 10 + 1) * 25200L,
              sampleDelta = 25200L / (24 + (id % 4) * 6))
          else {
            val fps = if (id % 4 == 1) 25L else 50L
            graft.multimodal.AviFixture.build(
              (320 + (id % 8) * 16).toInt, (240 + (id % 6) * 16).toInt,
              usPerFrame = 1000000L / fps, totalFrames = (id % 100 + 1) * 5L)
          }
        val payload = (id % 5) match {
          case 0 => full.take(8)
          case 1 => full.take(if (id % 2 == 0) 60 else 40)
          case 2 => Array.fill(16)(0xAB.toByte)
          case _ => full
        }
        (id, payload)
      }.toDF("media_id", "payload")
      graft.multimodal.MediaProbe.probe(media).toDF().orderBy("media_id")
    }),

    // M9 blurriness audit (blurriness.py: per-frame sharpness metric
    // -> flag blurry videos; the real pipeline's variance-of-Laplacian
    // becomes, on the honest byte-probe stand-in, the variance of
    // adjacent sampled-probe differences). Integer-exact: probes are
    // byte ints, so n*sum(d^2) - sum(d)^2 is an exact BIGINT variance
    // numerator and the blur flag is an integer comparison against
    // the threshold-scaled denominator — no cross-engine float
    // division anywhere. Same per-media lag window as m05 (bounded
    // partitions), one aggregate.
    "m09_blurriness" -> ((s, d) => {
      val frames = graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.asMedia(docs(s, d), "doc_id", "text",
          "video"), 64)
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_off"))
      frames
        .withColumn("prev", lag(col("probe"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("dd", (col("probe") - col("prev")).cast("long"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dd")).as("sum_d"),
          sum(col("dd") * col("dd")).as("sum_d2"))
        .withColumn("var_num",
          col("n_pairs") * col("sum_d2") - col("sum_d") * col("sum_d"))
        // blurry iff variance < 900: n*sum_d2 - sum_d^2 < 900 * n^2
        .withColumn("blurry",
          (col("var_num") < lit(900L) * col("n_pairs") * col("n_pairs"))
            .cast("int"))
        .select("media_id", "n_pairs", "sum_d", "sum_d2", "var_num", "blurry")
        .orderBy("media_id")
    }),

    // T59 per-source frequency cap (the RefinedWeb/CCNet host-level
    // cap: no single source may dominate the mix): keep at most 100
    // docs per source, chosen by a deterministic hash priority (so
    // the cap is a uniform subsample, not a doc_id-ordered prefix).
    // The rank<=k filter over a partitioned window is the shape
    // Spark's WindowGroupLimit rewrites into per-partition partial
    // top-k BEFORE the shuffle — a hot mega-source never materializes
    // its full row list on one task.
    "t59_source_cap" -> ((s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
      docs(s, d)
        .withColumn("pri", TextOps.fingerprint(
          concat(lit("graft:"), col("doc_id").cast("string"), lit(":cap"))))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 100)
        .select("doc_id", "source", "rn")
        .orderBy("source", "rn")
    }),

    // T60 dedup-recall evaluation: precision/recall of the t04
    // MinHash-LSH candidate set against the exact t03 Jaccard truth —
    // the governance number that justifies replacing exact pairwise
    // dedup with the banded approximation at scale (v18 is the same
    // audit for ANN retrieval). Full-outer join of the two pair sets,
    // integer tp/fp/fn counts, two divisions at the end.
    "t60_lsh_recall" -> ((s, d) => {
      val dd = docs(s, d)
      val truth = TextOps.jaccardPairs(dd, k = 3, dfCap = 50, tauJacc = 0.5)
        .select(col("d1"), col("d2")).withColumn("t", lit(1L))
      // r21: map-side banded signatures (see t04 / TextOps.minhashBands)
      val bands = TextOps.minhashBands(dd, 3, 16, P)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
        .withColumn("c", lit(1L))
      truth.join(cand, Seq("d1", "d2"), "full_outer")
        .agg(sum(coalesce(col("t"), lit(0L))).as("n_truth"),
          sum(coalesce(col("c"), lit(0L))).as("n_cand"),
          sum(when(col("t").isNotNull && col("c").isNotNull, 1L).otherwise(0L))
            .as("tp"))
        .withColumn("precision6",
          round(col("tp").cast("double") / col("n_cand").cast("double"), 6))
        .withColumn("recall6",
          round(col("tp").cast("double") / col("n_truth").cast("double"), 6))
    }),

    // T51 RAG chunking: split every document into OVERLAPPING token
    // windows (W=32, stride 24 — 8-token overlap so retrieval never
    // loses a boundary-straddling answer span) and fingerprint each
    // chunk for downstream embedding/dedup. Distinct from t12's packing
    // (which CONCATENATES docs into training sequences): chunking is
    // the retrieval-corpus shape. Scale: pure per-row explode — no
    // shuffle at all before the output sort; chunk count per doc is
    // computed with integer arithmetic (no float ceil divergence), and
    // the chunk fingerprint is the codegen'd rolling hash, so a 100 TB
    // corpus chunks map-side in one pass.
    "t51_chunk_windows" -> ((s, d) => {
      val (w, st) = (32, 24)
      docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .withColumn("ntok", size(col("l")).cast("long"))
        .withColumn("nch",
          expr(s"1L + (greatest(ntok - $w, 0L) + ${st - 1}) div $st"))
        .select(col("doc_id"), col("l"), col("ntok"),
          explode(sequence(lit(0L), col("nch") - 1)).as("chunk_idx"))
        .withColumn("start", col("chunk_idx") * st)
        .withColumn("len", least(lit(w.toLong), col("ntok") - col("start")))
        .withColumn("chunk_fp", TextOps.fingerprint(
          concat_ws(" ",
            slice(col("l"), (col("start") + 1).cast("int"), col("len").cast("int")))))
        .select("doc_id", "chunk_idx", "start", "len", "chunk_fp")
        .orderBy("doc_id", "chunk_idx")
    }),

    // T52 per-source boilerplate n-grams (the CCNet/web-pipeline
    // pre-clean: navigation chrome, cookie banners, footers repeat
    // across most pages of ONE site but not across the corpus): a
    // bigram is boilerplate within a source when it appears in >= 5
    // docs AND >= 20% of that source's docs. Scale: the source column
    // rides the shingle explode map-side (shingleIdsWith — no
    // corpus-sized re-join), the (source, sid) count is one
    // map-side-combinable agg, and the per-source doc totals are a
    // source-dimension broadcast.
    "t52_boilerplate_ngrams" -> ((s, d) => {
      val base = docs(s, d)
      val perSrc = broadcast(
        base.groupBy("source").agg(count(lit(1)).as("n_docs")))
      TextOps.shingleIdsWith(base, 2, "source")
        .groupBy("source", "sid").agg(count(lit(1)).as("df"))
        .join(perSrc, "source")
        .filter(col("df") >= 5 && col("df") * 5 >= col("n_docs"))
        .select("source", "sid", "df", "n_docs")
        .orderBy("source", "sid")
    }),

    // T53 source-level vocabulary similarity — the corpus-composition
    // diagnostic a mixture builder runs before setting source weights
    // (two near-identical crawls should not both get full quota):
    // Jaccard of each source PAIR's bigram-vocabulary sets. Scale: the
    // per-source profile is dimension-sized (sources × vocab, NOT
    // corpus-sized), so the sid-keyed self-join and the size lookups
    // are joins between broadcastable profile tables; the corpus is
    // touched exactly once, map-side, to build the profiles.
    "t53_source_similarity" -> ((s, d) => {
      // vocab size rides every profile row via a profile-sized window,
      // so the whole query is the self-join's two corpus passes — no
      // third/fourth pass to look the sizes back up
      val prof = TextOps.shingleIdsWith(docs(s, d), 2, "source")
        .select("source", "sid").distinct()
        .withColumn("nv",
          count(lit(1)).over(Window.partitionBy(col("source"))))
      prof.as("a")
        .join(prof.as("b"),
          col("a.sid") === col("b.sid") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"),
          max(col("a.nv")).as("n1"), max(col("b.nv")).as("n2"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
        .select("s1", "s2", "n1", "n2", "inter", "jaccard")
        .orderBy("s1", "s2")
    }),

    // T54 cross-modal near-dup confirmation — the production dedup
    // gate that neither modality gives alone: text MinHash-LSH banding
    // proposes candidate pairs cheaply (t04's machinery), then each
    // pair's document embeddings (doc_id == vec_id here) either
    // confirm (cosine) or refute. Scale: the candidate set is
    // LSH-bounded (never all-pairs), and the embedding lookup is two
    // equi-joins of a SMALL pair table against the vector corpus —
    // exactly the probe pattern a 100 TB pipeline runs, where loading
    // vectors for every pair beats shipping vectors to every band.
    "t54_crossmodal_dedup" -> ((s, d) => {
      // r21: map-side banded signatures (see t04 / TextOps.minhashBands)
      val bands = TextOps.minhashBands(docs(s, d), 3, 16, P)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
      val e = Tables.embeddings(tune(s), d).select(col("vec_id"),
        col("embedding"), graft.functions.Fns.l2norm(col("embedding")).as("nrm"))
      cand
        .join(e.select(col("vec_id").as("d1"), col("embedding").as("e1"),
          col("nrm").as("nrm1")), "d1")
        .join(e.select(col("vec_id").as("d2"), col("embedding").as("e2"),
          col("nrm").as("nrm2")), "d2")
        .withColumn("cos", graft.functions.Fns.dot(col("e1"), col("e2")) /
          (col("nrm1") * col("nrm2")))
        .select(col("d1"), col("d2"), round(col("cos"), 6).as("cos"),
          (col("cos") > 0.5).as("confirmed"))
        .orderBy("d1", "d2")
    }),

    // T55 BPE ENCODE — the other half of t49 (which only trains the
    // merge table): apply the two trained merges to every document and
    // report the shrinking token counts. The merge step is the native
    // merge_pair expression over token ARRAYS (plans.MergePair), not
    // t49's regexp_replace demo: a column-valued regex pattern
    // recompiles PER ROW and rescans the whole string per merge — at
    // corpus scale the array sweep is the only viable encode path (and
    // it cannot be broken by pair text that happens to contain regex
    // metacharacters). Merges stay data: each trained pair is a 1-row
    // broadcast crossJoin, never a driver collect.
    "t55_bpe_encode" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.Bridge
      def mergeCol(toks: org.apache.spark.sql.Column,
                   pair: org.apache.spark.sql.Column) =
        Bridge.column(graft.plans.MergePair(Bridge.expression(toks),
          Bridge.expression(split(pair, " ").getItem(0)),
          Bridge.expression(split(pair, " ").getItem(1))))
      def topPair(df: org.apache.spark.sql.DataFrame, tcol: String) =
        df.select(explode(expr(
            s"if(size($tcol) < 2, array(), " +
              s"transform(sequence(1, size($tcol)-1), " +
              s"i -> concat(element_at($tcol, i), ' ', element_at($tcol, i+1))))"))
            .as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(1)
      val d0 = docs(s, d).select(col("doc_id"), split(col("text"), " ").as("t0"))
      val d1 = d0
        .crossJoin(broadcast(topPair(d0, "t0").select(col("pair").as("p1"))))
        .withColumn("t1", mergeCol(col("t0"), col("p1")))
      val d2 = d1
        .crossJoin(broadcast(topPair(d1, "t1").select(col("pair").as("p2"))))
        .withColumn("t2", mergeCol(col("t1"), col("p2")))
      d2.select(col("doc_id"),
          size(col("t0")).cast("long").as("ntok0"),
          size(col("t1")).cast("long").as("ntok1"),
          size(col("t2")).cast("long").as("ntok2"),
          col("p1"), col("p2"))
        .orderBy("doc_id")
    }),

    // T56 dataset card: the per-language corpus summary a training-mix
    // decision reads first — doc/source counts, char and token volume,
    // exact-dup ratio — plus the ALL rollup row (what a Hugging-Face
    // dataset card tabulates; Gebru et al. 2018 "Datasheets for
    // Datasets"). ONE pass: the per-row char/token counts are plain
    // expressions, the rollup is map-side-combinable, and the two
    // countDistincts expand per grouping set without rescanning the
    // corpus.
    "t56_corpus_card" -> ((s, d) =>
      docs(s, d).select(col("lang"), col("source"), col("text"),
          length(col("text")).cast("long").as("nc"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .rollup(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("nc")).as("total_chars"),
          sum(col("nt")).as("total_toks"),
          countDistinct(col("text")).as("n_distinct"))
        .withColumn("lang", coalesce(col("lang"), lit("ALL")))
        .withColumn("dup_ratio",
          round((col("n_docs") - col("n_distinct")).cast("double") /
            col("n_docs").cast("double"), 6))
        .orderBy("lang")),

    // T57 count-min-sketch heavy hitters (Cormode & Muthukrishnan
    // 2005): the fixed-memory token-frequency sketch a streaming
    // ingest keeps when the exact vocabulary doesn't fit — 4 hash
    // rows × 512 buckets (the whole sketch is 2048 longs at ANY
    // corpus size), estimate = min over rows, always >= the true
    // count. Emitted next to the exact top-30 so the overestimate is
    // visible. Scale: building the sketch is ONE aggregation on a
    // bounded (j, bucket) key space — no vocabulary-sized state; the
    // estimation join broadcasts the 2048-row sketch. Hash family =
    // the minhash multipliers over the cross-engine rolling-hash
    // token id, all exact integer arithmetic.
    "t57_cms_heavy" -> ((s, d) => {
      val tk = toks(s, d).select(col("tok"))
        .withColumn("sid", TextOps.fingerprint(col("tok")))
      val rows = tk.select(col("sid"), explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("bucket",
          expr(s"((sid * (((j*2+3)*524287) % $P) + (j*5+7)*8191) % $P) % 512"))
      val sketch = rows.groupBy(col("j"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val exact = tk.groupBy(col("tok"), col("sid"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(30)
      exact.select(col("tok"), col("sid"), col("exact_cnt"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("bucket",
          expr(s"((sid * (((j*2+3)*524287) % $P) + (j*5+7)*8191) % $P) % 512"))
        .join(broadcast(sketch), Seq("j", "bucket"))
        .groupBy(col("tok"), col("exact_cnt"))
        .agg(min(col("c")).as("est_cnt"))
        .select("tok", "exact_cnt", "est_cnt")
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // T58 weighted systematic sample, probability proportional to size
    // (PPS — the survey-sampling form of "sample docs by length"):
    // docs laid end-to-end by cumulative weight, one deterministic
    // probe every total/64 units; a doc is drawn n_hits times = the
    // number of probes its weight interval covers (long docs can be
    // drawn more than once — that IS pps-with-replacement's shape).
    // No ln()/pow() in sight: the Efraimidis-Spirakis exponential-key
    // trick needs transcendental functions whose last-ulp rounding is
    // engine-specific, while this is all integer floor-division —
    // cross-engine exact by construction. Scale: the cumulative
    // offsets reuse the two-phase prefix sum (range exchange +
    // P-row offset table), everything else is per-row arithmetic.
    "t58_pps_sample" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("w"))
        .cache() // shared by the offsets AND totals branches (ADVICE r10)
      val cum = graft.text.Packing.withRunningOffset(base, "doc_id", "w", "off")
      val tot = base.agg(sum(col("w")).as("tw"))
      cum.crossJoin(broadcast(tot))
        .withColumn("step", expr("greatest(tw div 64, 1L)"))
        // probes sit at r + k*step with r = step/2; count of probes in
        // [off, off+w). Both Spark `div` and DuckDB `//` truncate
        // toward zero (verified: -7 // 2 = -3 in DuckDB), so the
        // engines agree at any sign; the +2*step shift keeping the
        // div arguments non-negative is retained as belt-and-braces
        .withColumn("n_hits",
          expr("((off + w - 1 - step div 2 + 2*step) div step) - " +
            "((off - 1 - step div 2 + 2*step) div step)"))
        .filter(col("n_hits") >= 1)
        .select("doc_id", "w", "off", "n_hits")
        .orderBy("doc_id")
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles
  // ------------------------------------------------------------------
  /** Distinct 3-shingles per doc (mirror of TextOps.shingles). */
  private val shinglesSql =
    """SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
      |FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-2)) AS i
      |      FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1""".stripMargin

  /** Shingle id via the same rolling hash both engines compute — no
    * dictionary build (mirrors the Spark side's fingerprint(sh)). */
  private val shingleIdsSql =
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(sh,''), c -> CAST(ascii(c) AS BIGINT))),
       |    (a, x) -> (a * 31 + x) % 1000000007) AS sid
       |FROM ($shinglesSql) s""".stripMargin

  private val minhashSql =
    s"""SELECT doc_id, i, min((sid*((i*2+3)*524287 % $P) + (i*5+7)*8191) % $P) AS mh
       |FROM (SELECT doc_id, sid, unnest(generate_series(0, 15)) AS i
       |      FROM ($shingleIdsSql) ids) x
       |GROUP BY doc_id, i""".stripMargin

  /** 64-bit SimHash as 4x16-bit band limbs (doc_id, band, val) —
    * mirrors TextOps.simhashBands with rolling-hash token ids. */
  private val decontamRemovalSql =
    """WITH h AS (
      |  SELECT doc_id, lang, text,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
      |  FROM documents),
      |g5 AS (SELECT DISTINCT doc_id, hb,
      |         l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS sh
      |       FROM (SELECT doc_id, hb, l, unnest(generate_series(1, len(l)-4)) AS i
      |             FROM (SELECT doc_id, hb, string_split(text,' ') AS l FROM h) t0) t1),
      |ids AS (SELECT doc_id, hb,
      |          list_reduce(list_prepend(CAST(0 AS BIGINT),
      |            list_transform(string_split(sh,''), c -> CAST(ascii(c) AS BIGINT))),
      |            (a, x) -> (a * 31 + x) % 1000000007) AS sid
      |        FROM g5),
      |held AS (SELECT DISTINCT sid FROM ids WHERE hb >= 980),
      |guilty AS (SELECT DISTINCT i.doc_id FROM ids i JOIN held USING (sid)
      |           WHERE i.hb < 980)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks_kept
      |FROM h
      |WHERE hb < 980 AND doc_id NOT IN (SELECT doc_id FROM guilty)
      |GROUP BY lang ORDER BY lang""".stripMargin

  private val simhashBandsSql =
    """SELECT doc_id, j // 16 AS band,
      |  CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << (j % 16)) ELSE 0 END) AS BIGINT) AS val
      |FROM (
      |  SELECT doc_id, j, sum(cnt * (((tid*(j*2+3) + j) % 97 % 2) * 2 - 1)) AS acc
      |  FROM (SELECT doc_id, tid, cnt, unnest(generate_series(0, 63)) AS j
      |        FROM (SELECT doc_id,
      |                list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                  list_transform(string_split(tok,''), ch -> CAST(ascii(ch) AS BIGINT))),
      |                  (a, x) -> (a * 31 + x) % 1000000007) AS tid,
      |                cnt
      |              FROM (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
      |                    FROM (%TOKS%) tk GROUP BY doc_id, tok) c) w) x
      |  GROUP BY doc_id, j) y
      |GROUP BY doc_id, band""".stripMargin

  private def simhashBandsFull = simhashBandsSql
    .replace("%TOKS%", Q.toksSql)

  val oracle: Map[String, String] = Map(
    "t01_exact_dedup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
        |  CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
        |FROM documents""".stripMargin,

    "t02_prefix_groups" ->
      """SELECT array_to_string((string_split(text,' '))[1:2], ' ') AS pkey,
        |  CAST(count(*) AS BIGINT) AS cnt, CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY pkey""".stripMargin,

    "t03_shingle_jaccard" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |          FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, inter, x.nsh AS n1, y.nsh AS n2,
         |  CAST(inter AS DOUBLE) / CAST(x.nsh + y.nsh - inter AS DOUBLE) AS jacc
         |FROM pairs JOIN sizes x ON pairs.d1 = x.doc_id
         |JOIN sizes y ON pairs.d2 = y.doc_id
         |WHERE CAST(inter AS DOUBLE) / CAST(x.nsh + y.nsh - inter AS DOUBLE) >= 0.5
         |ORDER BY 1, 2""".stripMargin,

    // t31: the word-level DP replayed in SQL — the outer list_reduce
    // walks b's per-token cost vectors (precomputed so accumulator and
    // element are both BIGINT[], which DuckDB's list_reduce requires),
    // the inner one builds each DP row left-to-right over
    // single-element index lists; [n+1] is the classic bottom-right
    // cell. chr_dist: DuckDB levenshtein is byte-level, Spark's is
    // codepoint-level — equal on this ASCII corpus.
    "t31_align_pairs" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |prs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |        FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         |pp AS (SELECT d1, d2 FROM prs JOIN sizes x ON prs.d1 = x.doc_id
         |       JOIN sizes y ON prs.d2 = y.doc_id
         |       WHERE CAST(inter AS DOUBLE) / CAST(x.nsh + y.nsh - inter AS DOUBLE) >= 0.5),
         |tk AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         |al AS (SELECT pp.d1, pp.d2, a.text AS x1, b.text AS x2,
         |         a.l AS l1, b.l AS l2, len(a.l) AS n
         |       FROM pp JOIN tk a ON a.doc_id = pp.d1 JOIN tk b ON b.doc_id = pp.d2),
         |dp AS (SELECT d1, d2, x1, x2, n, len(l2) AS m,
         |  list_reduce(
         |    list_prepend(list_transform(generate_series(0, n), i -> CAST(i AS BIGINT)),
         |      list_transform(l2, tb -> list_transform(l1,
         |        ta -> CAST(CASE WHEN ta = tb THEN 0 ELSE 1 END AS BIGINT)))),
         |    (row, c) -> list_reduce(
         |      list_prepend([row[1] + 1],
         |        list_transform(generate_series(1, n), i -> [CAST(i AS BIGINT)])),
         |      (acc, x) -> list_append(acc,
         |        least(row[x[1] + 1] + 1, acc[len(acc)] + 1, row[x[1]] + c[x[1]]))))[n + 1]
         |    AS tok_dist
         |  FROM al)
         |SELECT d1, d2, CAST(n AS BIGINT) AS n1, CAST(m AS BIGINT) AS n2,
         |  CAST(tok_dist AS BIGINT) AS tok_dist,
         |  CAST(levenshtein(x1, x2) AS BIGINT) AS chr_dist,
         |  CAST(tok_dist AS DOUBLE) / CAST(greatest(n, m) AS DOUBLE) AS wer
         |FROM dp ORDER BY d1, d2""".stripMargin,

    // t33: same pair CTEs as t31; per-word re-timing is pure integer
    // arithmetic (w*60000//n) so the interpolated millisecond endpoints
    // hash identically across engines; the cue replays Spark's
    // format_string as printf (both %02d/%03d on BIGINT).
    "t33_word_retime" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |prs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |        FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         |pp AS (SELECT d1, d2 FROM prs JOIN sizes x ON prs.d1 = x.doc_id
         |       JOIN sizes y ON prs.d2 = y.doc_id
         |       WHERE CAST(inter AS DOUBLE) / CAST(x.nsh + y.nsh - inter AS DOUBLE) >= 0.5),
         |wd AS (SELECT doc_id, u.z[1] AS word, CAST(u.z[2] AS BIGINT) AS w,
         |         CAST(len(t.l) AS BIGINT) AS n
         |       FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t,
         |         unnest(list_zip(t.l, generate_series(0, len(t.l)-1))) AS u(z)),
         |rt AS (SELECT pp.d1, pp.d2, wd.w, wd.word,
         |         pp.d1 * 60000 + (wd.w * 60000) // wd.n AS ws_ms,
         |         pp.d1 * 60000 + ((wd.w + 1) * 60000) // wd.n AS we_ms
         |       FROM pp JOIN wd ON wd.doc_id = pp.d1)
         |SELECT d1, d2, w, word, ws_ms, we_ms,
         |  printf('%02d:%02d:%02d.%03d --> %02d:%02d:%02d.%03d',
         |    ws_ms // 3600000, (ws_ms % 3600000) // 60000,
         |    (ws_ms % 60000) // 1000, ws_ms % 1000,
         |    we_ms // 3600000, (we_ms % 3600000) // 60000,
         |    (we_ms % 60000) // 1000, we_ms % 1000)
         |  || chr(10) || word AS cue
         |FROM rt ORDER BY d1, d2, w""".stripMargin,

    "t34_nfc_gate" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN nfc_normalize(text) = text THEN 0 ELSE 1 END) AS BIGINT) AS n_changed,
        |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(nfc_normalize(text), ''),
        |      c -> CAST(ascii(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007)) AS BIGINT) AS nfc_checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the per-row top-n-gram counts replay as list histograms; the
    // drop rules are the same exact integer comparisons
    "t36_topgram_filter" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS l FROM documents),
        |s AS (SELECT doc_id, lang, len(l) AS ntok,
        |  list_transform(generate_series(1, greatest(len(l)-1,0)), i -> l[i]||' '||l[i+1]) AS s2,
        |  list_transform(generate_series(1, greatest(len(l)-2,0)), i -> l[i]||' '||l[i+1]||' '||l[i+2]) AS s3
        |  FROM t),
        |f AS (SELECT lang,
        |  CAST(greatest(ntok-1,0) AS BIGINT) AS n2,
        |  CAST(greatest(ntok-2,0) AS BIGINT) AS n3,
        |  CAST(CASE WHEN len(s2)>0 THEN list_max(map_values(list_aggregate(s2,'histogram'))) ELSE 0 END AS BIGINT) AS tc2,
        |  CAST(CASE WHEN len(s3)>0 THEN list_max(map_values(list_aggregate(s3,'histogram'))) ELSE 0 END AS BIGINT) AS tc3
        |  FROM s)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN tc2*100 > 5*n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_top2,
        |  CAST(sum(CASE WHEN tc3*100 > 4*n3 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_top3,
        |  CAST(sum(CASE WHEN tc2*100 <= 5*n2 AND tc3*100 <= 4*n3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // replays the chunker: per cut position p (codepoints consumed,
    // p in [w, n)), the window hash is the fold over chars [p-w, p) —
    // 1-based slice [p-7, p] for w=8 — and a cut fires on ≡ 0 mod 64;
    // chunks are the substrings between consecutive boundaries
    "t35_cdc_dedup" ->
      """WITH chars AS (
        |  SELECT doc_id, lang, text, string_split(text,'') AS c,
        |    len(string_split(text,'')) AS n
        |  FROM documents),
        |cuts AS (
        |  SELECT doc_id, lang, text, n,
        |    list_filter(generate_series(8, n-1), p ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(c[p-7:p], ch -> CAST(ascii(ch) AS BIGINT))),
        |        (a,x) -> (a*31+x) % 1000000007) % 64 = 0) AS bs
        |  FROM chars),
        |bounds AS (
        |  SELECT doc_id, lang, text,
        |    list_prepend(CAST(0 AS BIGINT), list_append(bs, CAST(n AS BIGINT))) AS b
        |  FROM cuts),
        |chunks AS (
        |  SELECT lang, unnest(list_transform(generate_series(1, len(b)-1),
        |    i -> substring(text, CAST(b[i]+1 AS INT), CAST(b[i+1]-b[i] AS INT)))) AS chunk
        |  FROM bounds),
        |fc AS (
        |  SELECT lang, chunk, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(chunk,''), ch -> CAST(ascii(ch) AS BIGINT))),
        |      (a,x) -> (a*31+x) % 1000000007) AS fp
        |  FROM chunks)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
        |  CAST(sum(len(chunk)) AS BIGINT) AS total_chars,
        |  1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_ratio
        |FROM fc GROUP BY lang ORDER BY lang""".stripMargin,

    // t39: the winnowing selection replayed in SQL — ordered k-gram
    // hash sequence per doc, per-window list_min over 4-wide slices
    // (h[j:j+3] is inclusive), distinct selections, then the same
    // df-cap + self-join as the other candidate generators.
    "t39_winnow_pairs" ->
      """WITH tkl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(generate_series(1, greatest(len(l) - 2, 0)),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
        |      FROM tkl),
        |hs AS (SELECT doc_id,
        |         list_transform(grams, t ->
        |           list_reduce(list_prepend(CAST(0 AS BIGINT),
        |             list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
        |             (a, x) -> (a * 31 + x) % 1000000007)) AS h
        |       FROM g),
        |sel AS (SELECT doc_id,
        |          CASE WHEN len(h) > 0 THEN
        |            list_distinct(list_transform(
        |              generate_series(1, greatest(len(h) - 3, 1)),
        |              j -> list_min(h[j:j+3])))
        |          ELSE CAST([] AS BIGINT[]) END AS fps
        |        FROM hs),
        |ids AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
        |pruned AS (SELECT doc_id, fp
        |           FROM (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
        |                 FROM ids) z
        |           WHERE df <= 50),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |            CAST(count(*) AS BIGINT) AS n_shared
        |          FROM pruned a JOIN pruned b
        |            ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, n_shared FROM pairs WHERE n_shared >= 2
        |ORDER BY 1, 2""".stripMargin,

    // t37: t03's candidate CTEs re-filtered by the asymmetric inclusion
    // metric — same expression tree (one div per side + greatest) as
    // the Spark plan, so the doubles are bit-identical.
    "t37_containment_pairs" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |          FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, inter, n1, n2, jacc, cmax FROM (
         |  SELECT d1, d2, inter, x.nsh AS n1, y.nsh AS n2,
         |    CAST(inter AS DOUBLE) / CAST(x.nsh + y.nsh - inter AS DOUBLE) AS jacc,
         |    greatest(CAST(inter AS DOUBLE) / CAST(x.nsh AS DOUBLE),
         |             CAST(inter AS DOUBLE) / CAST(y.nsh AS DOUBLE)) AS cmax
         |  FROM pairs JOIN sizes x ON pairs.d1 = x.doc_id
         |  JOIN sizes y ON pairs.d2 = y.doc_id) q
         |WHERE cmax >= 0.8
         |ORDER BY 1, 2""".stripMargin,

    // t38: t15's recursive-CTE components + the window argmax retention
    // verdict (longest member kept, doc_id tiebreak).
    "t38_cluster_keep" ->
      s"""WITH RECURSIVE ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
         |          FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT d1, d2 FROM inter
         |          JOIN sizes x ON inter.d1 = x.doc_id
         |          JOIN sizes y ON inter.d2 = y.doc_id
         |          WHERE CAST(i AS DOUBLE) / CAST(x.nsh + y.nsh - i AS DOUBLE) >= 0.5),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
         |comp AS (SELECT n.doc_id,
         |    CAST(least(n.doc_id, min(r.b)) AS BIGINT) AS cluster
         |  FROM nodes n JOIN reach r ON r.a = n.doc_id GROUP BY n.doc_id),
         |nt AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
         |  FROM documents)
         |SELECT c.doc_id, c.cluster, nt.ntok,
         |  row_number() OVER (PARTITION BY c.cluster
         |    ORDER BY nt.ntok DESC, c.doc_id) = 1 AS keep
         |FROM comp c JOIN nt ON nt.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    // t42: the t15/t38 candidate-pair CTEs (jacc >= 0.5) feeding the
    // ordered-edge triangle join; per-doc participation via a UNION ALL
    // of the three roles.
    "t42_triangles" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
         |          FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT d1, d2 FROM inter
         |          JOIN sizes x ON inter.d1 = x.doc_id
         |          JOIN sizes y ON inter.d2 = y.doc_id
         |          WHERE CAST(i AS DOUBLE) / CAST(x.nsh + y.nsh - i AS DOUBLE) >= 0.5),
         |tri AS (SELECT ab.a, ab.b, bc.c
         |        FROM (SELECT d1 AS a, d2 AS b FROM pairs) ab
         |        JOIN (SELECT d1 AS b, d2 AS c FROM pairs) bc USING (b)
         |        JOIN (SELECT d1 AS a, d2 AS c FROM pairs) ac USING (a, c)),
         |roles AS (SELECT a AS doc_id FROM tri
         |          UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         |FROM roles GROUP BY 1 ORDER BY 1""".stripMargin,

    // t43: the t32/t20 rolling-hash idiom ordered per stratum; rnk
    // cast to INT to match Spark's row_number.
    "t43_stratified_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':strat',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS h
        |  FROM documents)
        |SELECT lang, CAST(rn AS INT) AS rn, doc_id, h FROM (
        |  SELECT lang, doc_id, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM h) x
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    // t44: the t04 minhash/band chain split old/new by the batch hash;
    // exact-Jaccard verification mirrors t03's pair stats restricted to
    // the new x old candidate set
    "t44_incremental_dedup" ->
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':batch',''),
         |        c -> CAST(ascii(c) AS BIGINT))),
         |      (a, x) -> (a * 31 + x) % 1000000007) % 10 AS hb
         |  FROM documents),
         |g3 AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
         |       FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-2)) AS i
         |             FROM (SELECT doc_id, string_split(text,' ') AS l FROM h) t0) t1),
         |ids AS (SELECT DISTINCT doc_id,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(string_split(sh,''), c -> CAST(ascii(c) AS BIGINT))),
         |            (a, x) -> (a * 31 + x) % 1000000007) AS sid
         |        FROM g3),
         |mh AS (SELECT doc_id, i,
         |         min((sid*((i*2+3)*524287 % $P) + (i*5+7)*8191) % $P) AS mh
         |       FROM (SELECT doc_id, sid, unnest(generate_series(0, 15)) AS i
         |             FROM ids) x
         |       GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |            CAST(sum(CASE WHEN i % 2 = 0 THEN mh * $P ELSE mh END) AS BIGINT) AS sig
         |          FROM mh GROUP BY 1, 2),
         |bn AS (SELECT b.doc_id, b.band, b.sig FROM bands b
         |       JOIN h USING (doc_id) WHERE h.hb >= 8),
         |bo AS (SELECT b.doc_id, b.band, b.sig FROM bands b
         |       JOIN h USING (doc_id) WHERE h.hb < 8),
         |cand AS (SELECT DISTINCT n.doc_id AS dn, o.doc_id AS dold
         |         FROM bn n JOIN bo o ON n.band = o.band AND n.sig = o.sig),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh
         |       FROM ids GROUP BY 1),
         |ninter AS (SELECT c.dn, c.dold, CAST(count(*) AS BIGINT) AS ni
         |           FROM cand c JOIN ids a ON a.doc_id = c.dn
         |           JOIN ids b ON b.doc_id = c.dold AND b.sid = a.sid
         |           GROUP BY 1, 2),
         |dups AS (SELECT dn, CAST(count(*) AS BIGINT) AS n_dup
         |         FROM ninter JOIN sz x ON x.doc_id = ninter.dn
         |         JOIN sz y ON y.doc_id = ninter.dold
         |         WHERE CAST(ni AS DOUBLE) /
         |           CAST(x.nsh + y.nsh - ni AS DOUBLE) >= 0.5
         |         GROUP BY 1),
         |nc AS (SELECT dn, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY 1)
         |SELECT h.doc_id,
         |  coalesce(nc.n_cand, CAST(0 AS BIGINT)) AS n_cand,
         |  coalesce(dups.n_dup, CAST(0 AS BIGINT)) AS n_dup,
         |  coalesce(dups.n_dup, CAST(0 AS BIGINT)) > 0 AS is_dup
         |FROM h LEFT JOIN nc ON nc.dn = h.doc_id
         |LEFT JOIN dups ON dups.dn = h.doc_id
         |WHERE h.hb >= 8 ORDER BY h.doc_id""".stripMargin,

    // t50: same bigram/fingerprint CTEs; weights are observed
    // (lang, fb) pairs only (unseen pairs score 0), mirrored exactly
    "t50_nb_langid" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(l[i] || ' ' || l[i+1],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 512 AS fb
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1),
        |lab AS (SELECT f.doc_id, f.fb, d.lang
        |        FROM f JOIN documents d USING (doc_id)),
        |cl AS (SELECT lang, CAST(count(*) AS BIGINT) AS c_l
        |       FROM lab GROUP BY 1),
        |clf AS (SELECT lang, fb, CAST(count(*) AS BIGINT) AS c_lf
        |        FROM lab GROUP BY 1, 2),
        |wgt AS (SELECT fb, clf.lang AS cand,
        |          ((c_lf + 1) * 1000000) // (c_l + 512) AS w
        |        FROM clf JOIN cl USING (lang)),
        |sc AS (SELECT f.doc_id, w.cand, CAST(sum(w.w) AS BIGINT) AS score
        |       FROM f JOIN wgt w USING (fb) GROUP BY 1, 2),
        |pred AS (SELECT doc_id, cand AS pred FROM (
        |    SELECT doc_id, cand, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, cand) AS rn FROM sc) p
        |  WHERE rn = 1)
        |SELECT d.lang, coalesce(pred.pred, 'none') AS pred,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents d LEFT JOIN pred USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // t61: t50's scoring CTEs + the same integer margin/band
    // arithmetic.
    "t61_calibration" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(l[i] || ' ' || l[i+1],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 512 AS fb
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1),
        |lab AS (SELECT f.doc_id, f.fb, d.lang
        |        FROM f JOIN documents d USING (doc_id)),
        |cl AS (SELECT lang, CAST(count(*) AS BIGINT) AS c_l
        |       FROM lab GROUP BY 1),
        |clf AS (SELECT lang, fb, CAST(count(*) AS BIGINT) AS c_lf
        |        FROM lab GROUP BY 1, 2),
        |wgt AS (SELECT fb, clf.lang AS cand,
        |          ((c_lf + 1) * 1000000) // (c_l + 512) AS w
        |        FROM clf JOIN cl USING (lang)),
        |sc AS (SELECT f.doc_id, w.cand, CAST(sum(w.w) AS BIGINT) AS score
        |       FROM f JOIN wgt w USING (fb) GROUP BY 1, 2),
        |rk AS (SELECT doc_id, cand, score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, cand) AS rn FROM sc),
        |top AS (SELECT doc_id, cand AS pred, score AS s1 FROM rk WHERE rn = 1),
        |sec AS (SELECT doc_id, score AS s2 FROM rk WHERE rn = 2),
        |nbg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg
        |        FROM f GROUP BY 1),
        |mg AS (SELECT d.doc_id, d.lang, t.pred,
        |         least(((s1 - coalesce(s2, 0)) // n_bg) // 64, 9) AS bucket
        |       FROM documents d
        |       JOIN top t USING (doc_id)
        |       LEFT JOIN sec USING (doc_id)
        |       JOIN nbg USING (doc_id))
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  round(CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS acc6
        |FROM mg GROUP BY bucket ORDER BY bucket""".stripMargin,

    // t62: window cumsum + the identical midrank products and final
    // double division chain.
    "t63_corpus_diff" ->
      """WITH now_s AS (SELECT doc_id, text FROM documents),
        |old_s AS (
        |  SELECT doc_id, CASE WHEN doc_id % 10 = 1 THEN substr(text, 1, 40)
        |                      ELSE text END AS old_text
        |  FROM documents WHERE doc_id % 10 <> 2
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 3),
        |j AS (SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
        |        WHEN n.doc_id IS NULL THEN 'removed'
        |        WHEN n.text = o.old_text THEN 'unchanged'
        |        ELSE 'changed' END AS status
        |      FROM now_s n FULL OUTER JOIN old_s o ON o.doc_id = n.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n FROM j
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "t62_length_gini" ->
      """WITH lens AS (SELECT CAST(length(text) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT x, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS t FROM lens),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lens),
        |g AS (SELECT n, CAST(sum(x * c) AS BIGINT) AS sumx,
        |        CAST(sum(x * c * (t * 2 + c + 1)) AS BIGINT) AS rank2x
        |      FROM cum, tt GROUP BY n)
        |SELECT n AS n_docs, sumx AS total_chars,
        |  round(CAST(rank2x AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(sumx AS DOUBLE))
        |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini6
        |FROM g""".stripMargin,

    // t45: same bigram-occurrence CTE as t32; bucket ratios are pure
    // BIGINT floor divisions, so doc scores match bit for bit
    "t45_dsir_scores" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(l[i] || ' ' || l[i+1],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 512 AS fb
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1),
        |raw AS (SELECT fb, CAST(count(*) AS BIGINT) AS rb FROM f GROUP BY 1),
        |tgt AS (SELECT fb, CAST(count(*) AS BIGINT) AS tb
        |        FROM f JOIN documents dd USING (doc_id)
        |        WHERE dd.lang = 'en' GROUP BY 1),
        |wgt AS (SELECT raw.fb,
        |          ((coalesce(tgt.tb, 0) + 1) * 1000000) // (raw.rb + 1) AS wgt
        |        FROM raw LEFT JOIN tgt ON tgt.fb = raw.fb),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
        |         CAST(sum(wgt) AS BIGINT) AS dsir_score
        |       FROM f JOIN wgt USING (fb) GROUP BY 1)
        |SELECT d.doc_id, d.lang,
        |  coalesce(sc.n_feat, CAST(0 AS BIGINT)) AS n_feat,
        |  coalesce(sc.dsir_score, CAST(0 AS BIGINT)) AS dsir_score
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "t46_budget_plan" ->
      """WITH langs AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS toks_avail
        |  FROM documents GROUP BY 1),
        |shares AS (
        |  SELECT lang, n_docs, toks_avail,
        |    CASE WHEN lang = 'en' THEN CAST(500000 AS BIGINT)
        |      ELSE 500000 // ((SELECT count(*) FROM langs) - 1) END AS share_ppm
        |  FROM langs),
        |t AS (SELECT lang, n_docs, toks_avail, share_ppm,
        |        (100000 * share_ppm) // 1000000 AS target_toks
        |      FROM shares)
        |SELECT lang, n_docs, toks_avail, share_ppm, target_toks,
        |  least(CAST(1000000 AS BIGINT),
        |    (target_toks * 1000000) // toks_avail) AS rate_ppm,
        |  greatest(CAST(100 AS BIGINT),
        |    (target_toks * 100 + toks_avail - 1) // toks_avail) AS epochs_centi
        |FROM t ORDER BY lang""".stripMargin,

    // t49: DuckDB regexp_replace with 'g' is the same LTR
    // non-overlapping scan as Java replaceAll; \b is shared RE2/Java
    "t49_bpe_merges" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |pc1 AS (SELECT l[i] || ' ' || l[i+1] AS pair, CAST(count(*) AS BIGINT) AS cnt
        |        FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS i
        |              FROM (SELECT string_split(text,' ') AS l FROM d0) t0) t1
        |        GROUP BY 1),
        |p1 AS (SELECT pair, cnt FROM pc1 ORDER BY cnt DESC, pair LIMIT 1),
        |d1 AS (SELECT doc_id,
        |         regexp_replace(text,
        |           '\b' || (SELECT pair FROM p1) || '\b',
        |           replace((SELECT pair FROM p1), ' ', '_'), 'g') AS text
        |       FROM d0),
        |pc2 AS (SELECT l[i] || ' ' || l[i+1] AS pair, CAST(count(*) AS BIGINT) AS cnt
        |        FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS i
        |              FROM (SELECT string_split(text,' ') AS l FROM d1) t0) t1
        |        GROUP BY 1),
        |p2 AS (SELECT pair, cnt FROM pc2 ORDER BY cnt DESC, pair LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS it, pair, cnt FROM p1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS it, pair, cnt FROM p2
        |ORDER BY it""".stripMargin,

    "t48_striped_packing" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |rk AS (SELECT doc_id, ntok,
        |         row_number() OVER (ORDER BY ntok DESC, doc_id) - 1 AS rk0
        |       FROM base),
        |b AS (SELECT rk0 % 8 AS bin, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(ntok) AS BIGINT) AS sum_toks,
        |        CAST(max(ntok) AS BIGINT) AS max_toks
        |      FROM rk GROUP BY 1)
        |SELECT bin, n_docs, sum_toks, max_toks,
        |  (sum_toks * 1000000) //
        |    (SELECT CAST(max(sum_toks) AS BIGINT) FROM b) AS fill_ppm
        |FROM b ORDER BY bin""".stripMargin,

    "t47_oov_audit" ->
      """WITH bg AS (
        |  SELECT doc_id, l[i] || ' ' || l[i+1] AS sh
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1),
        |vocab AS (SELECT sh FROM (
        |    SELECT sh, count(*) AS cnt,
        |      row_number() OVER (ORDER BY count(*) DESC, sh) AS vr
        |    FROM bg GROUP BY sh) v
        |  WHERE vr <= 400),
        |pd AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS nbg,
        |         CAST(sum(CASE WHEN v.sh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS noov
        |       FROM bg LEFT JOIN vocab v ON v.sh = bg.sh
        |       GROUP BY 1)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(pd.nbg, 0)) AS BIGINT) AS bg_total,
        |  CAST(sum(coalesce(pd.noov, 0)) AS BIGINT) AS oov_total,
        |  (CAST(sum(coalesce(pd.noov, 0)) AS BIGINT) * 1000000) //
        |    CAST(sum(coalesce(pd.nbg, 0)) AS BIGINT) AS oov_ppm,
        |  CAST(sum(CASE WHEN coalesce(pd.noov, 0) * 2 > coalesce(pd.nbg, 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_high
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // t40: three power-iteration steps unrolled as chained CTEs. Every
    // arithmetic step is BIGINT with the same floor divisions as the
    // Spark plan (per-edge (pr*w)//wd, then 150000 + 17*sum//20), so
    // the ranking is exact — the HUGEINT sum is cast back before use.
    "t40_textrank" -> {
      def it(prev: String): String =
        s"""SELECT n.tok,
           |    CAST(150000 + (17 * CAST(coalesce(sum((p.pr * e.w) // e.wd), 0) AS BIGINT)) // 20 AS BIGINT) AS pr
           |  FROM n0 n LEFT JOIN ew e ON e.v = n.tok LEFT JOIN $prev p ON p.tok = e.u
           |  GROUP BY n.tok""".stripMargin
      s"""WITH tk AS (${Q.toksSql}),
         |bg AS (SELECT a.tok AS u, b.tok AS v FROM tk a JOIN tk b
         |       ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |       WHERE a.tok <> b.tok),
         |ed AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w
         |       FROM (SELECT u, v FROM bg UNION ALL SELECT v AS u, u AS v FROM bg) e2
         |       GROUP BY 1, 2),
         |wd AS (SELECT u, CAST(sum(w) AS BIGINT) AS wd FROM ed GROUP BY 1),
         |ew AS (SELECT ed.u, ed.v, ed.w, wd.wd FROM ed JOIN wd USING (u)),
         |n0 AS (SELECT DISTINCT tok, CAST(1000000 AS BIGINT) AS pr FROM tk),
         |i1 AS (${it("n0")}),
         |i2 AS (${it("i1")}),
         |i3 AS (${it("i2")})
         |SELECT tok, pr FROM i3 ORDER BY pr DESC, tok LIMIT 10""".stripMargin
    },

    // t41: identical integer score (idf quantized by // before the tf
    // product); rnk cast to INT to match Spark's row_number type.
    "t41_tfidf_terms" ->
      s"""WITH tk AS (${Q.toksSql}),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2),
         |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |sc AS (SELECT tf.doc_id, tf.tok,
         |    tf.tf * (((2 * (n - df) + 1) * 1000000) // (2 * df + 1)) AS score
         |  FROM tf JOIN dft ON dft.tok = tf.tok CROSS JOIN tot)
         |SELECT doc_id, CAST(rnk AS INT) AS rnk, tok, score FROM (
         |  SELECT doc_id, tok, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk
         |  FROM sc) x
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "t32_lm_quality" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
        |  FROM documents),
        |bgr AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(l[i] || ' ' || l[i+1],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents) t0) t1),
        |model AS (SELECT sid FROM bgr JOIN h USING (doc_id)
        |          WHERE h.hb < 980 GROUP BY sid HAVING count(*) >= 2),
        |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
        |         CAST(sum(CASE WHEN m.sid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |       FROM bgr b LEFT JOIN model m ON m.sid = b.sid GROUP BY 1)
        |SELECT h.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(sc.n_bg, 0)) AS BIGINT) AS bg_total,
        |  CAST(sum(coalesce(sc.n_oov, 0)) AS BIGINT) AS oov_total,
        |  CAST(sum(coalesce(sc.n_oov, 0)) AS DOUBLE) /
        |    CAST(sum(coalesce(sc.n_bg, 0)) AS DOUBLE) AS oov_rate
        |FROM h LEFT JOIN sc ON sc.doc_id = h.doc_id
        |GROUP BY h.lang ORDER BY h.lang""".stripMargin,

    "t04_minhash_lsh" ->
      s"""WITH mh AS ($minhashSql),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |            CAST(sum(CASE WHEN i % 2 = 0 THEN mh * $P ELSE mh END) AS BIGINT) AS sig
         |          FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)
         |SELECT d1, d2,
         |  CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16.0 AS est_jacc
         |FROM cand JOIN mh a ON a.doc_id = d1 JOIN mh b ON b.doc_id = d2 AND b.i = a.i
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t05_simhash" ->
      s"""WITH bands AS ($simhashBandsFull)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN band = 0 THEN val ELSE 0 END) AS BIGINT) AS b0,
         |  CAST(sum(CASE WHEN band = 1 THEN val ELSE 0 END) AS BIGINT) AS b1,
         |  CAST(sum(CASE WHEN band = 2 THEN val ELSE 0 END) AS BIGINT) AS b2,
         |  CAST(sum(CASE WHEN band = 3 THEN val ELSE 0 END) AS BIGINT) AS b3
         |FROM bands GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t06_simhash_pairs" ->
      s"""WITH bands AS ($simhashBandsFull),
         |sig AS (SELECT doc_id,
         |    CAST(sum(CASE WHEN band = 0 THEN val ELSE 0 END) AS BIGINT) AS b0,
         |    CAST(sum(CASE WHEN band = 1 THEN val ELSE 0 END) AS BIGINT) AS b1,
         |    CAST(sum(CASE WHEN band = 2 THEN val ELSE 0 END) AS BIGINT) AS b2,
         |    CAST(sum(CASE WHEN band = 3 THEN val ELSE 0 END) AS BIGINT) AS b3
         |  FROM bands GROUP BY doc_id),
         |posting AS (
         |  SELECT doc_id, 0 AS bi, b0 AS bv FROM sig
         |  UNION ALL SELECT doc_id, 1, b1 FROM sig
         |  UNION ALL SELECT doc_id, 2, b2 FROM sig
         |  UNION ALL SELECT doc_id, 3, b3 FROM sig),
         |pruned AS (
         |  SELECT doc_id, bi, bv FROM (
         |    SELECT doc_id, bi, bv, count(*) OVER (PARTITION BY bi, bv) AS bn
         |    FROM posting) p
         |  WHERE bn <= 1000),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM pruned x JOIN pruned y
         |    ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT d1, d2,
         |  CAST(bit_count(xor(sx.b0, sy.b0)) + bit_count(xor(sx.b1, sy.b1))
         |    + bit_count(xor(sx.b2, sy.b2)) + bit_count(xor(sx.b3, sy.b3)) AS BIGINT) AS hamming
         |FROM cand JOIN sig sx ON sx.doc_id = d1 JOIN sig sy ON sy.doc_id = d2
         |WHERE bit_count(xor(sx.b0, sy.b0)) + bit_count(xor(sx.b1, sy.b1))
         |    + bit_count(xor(sx.b2, sy.b2)) + bit_count(xor(sx.b3, sy.b3)) <= 3
         |ORDER BY 1, 2""".stripMargin,

    "t18_repetition_filter" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS ntok,
         |    greatest(CAST(len(string_split(text,' ')) AS BIGINT) - 2, 0) AS total_sh
         |  FROM documents),
         |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS distinct_sh
         |       FROM ($shinglesSql) s GROUP BY doc_id)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(ntok) AS BIGINT) AS toks_kept
         |FROM (
         |  SELECT b.lang, b.ntok,
         |    CASE WHEN b.total_sh > 0
         |      THEN 1.0 - CAST(coalesce(ds.distinct_sh, 0) AS DOUBLE)
         |             / CAST(b.total_sh AS DOUBLE)
         |      ELSE 0.0 END AS rep_ratio
         |  FROM base b LEFT JOIN ds ON ds.doc_id = b.doc_id) t
         |WHERE rep_ratio <= 0.2
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "t17_quality_band" ->
      """WITH q AS (SELECT lang, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |           FROM documents),
        |cuts AS (SELECT quantile_cont(ntok, 0.10) AS p10,
        |                quantile_cont(ntok, 0.90) AS p90 FROM q)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(ntok) AS BIGINT) AS toks_kept
        |FROM q, cuts WHERE ntok >= p10 AND ntok <= p90
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "t16_source_mix" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled
        |FROM (SELECT lang, n_chars,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(CAST(doc_id AS VARCHAR),''),
        |            c -> CAST(ascii(c) AS BIGINT))),
        |          (a, x) -> (a * 31 + x) % 1000000007) % 100 AS hb
        |      FROM documents) t
        |WHERE (lang = 'en' AND hb < 80) OR (lang <> 'en' AND hb < 25)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // same injection CASE, scrub chain, and count patterns as the
    // Spark side, op for op ('g' = replace all, Spark's default)
    "t19_pii_scrub" ->
      """WITH base AS (
        |  SELECT lang, doc_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(CAST(doc_id AS VARCHAR),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 100 AS hb
        |  FROM documents),
        |inj AS (SELECT lang,
        |    CASE WHEN hb < 20 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         WHEN hb < 35 THEN text || ' call 555-123-4567 ext ' || CAST(doc_id AS VARCHAR)
        |         WHEN hb < 45 THEN text || ' from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
        |         ELSE text END AS ptext
        |  FROM base),
        |scr AS (SELECT lang, ptext,
        |    regexp_replace(regexp_replace(regexp_replace(ptext,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS stext
        |  FROM inj)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN stext <> ptext THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
        |  CAST(sum(len(regexp_extract_all(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(sum(len(ptext) - len(stext)) AS BIGINT) AS chars_delta
        |FROM scr GROUP BY lang ORDER BY lang""".stripMargin,

    "t20_split_assign" ->
      """SELECT part, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT text, n_chars,
        |        CASE WHEN hb < 980 THEN 'train'
        |             WHEN hb < 990 THEN 'val' ELSE 'test' END AS part
        |      FROM (SELECT text, n_chars,
        |              list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
        |                  c -> CAST(ascii(c) AS BIGINT))),
        |                (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
        |            FROM documents) h) t
        |GROUP BY part ORDER BY part""".stripMargin,

    "t21_decontaminate" ->
      """WITH h AS (
        |  SELECT doc_id, lang, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
        |  FROM documents),
        |g5 AS (SELECT DISTINCT doc_id, hb,
        |         l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS sh
        |       FROM (SELECT doc_id, hb, l, unnest(generate_series(1, len(l)-4)) AS i
        |             FROM (SELECT doc_id, hb, string_split(text,' ') AS l FROM h) t0) t1),
        |ids AS (SELECT doc_id, hb,
        |          list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            list_transform(string_split(sh,''), c -> CAST(ascii(c) AS BIGINT))),
        |            (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |        FROM g5),
        |tr AS (SELECT DISTINCT sid FROM ids WHERE hb < 980),
        |te AS (SELECT doc_id, sid FROM ids WHERE hb >= 980),
        |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |         FROM te JOIN tr USING (sid) GROUP BY doc_id)
        |SELECT t.doc_id, t.lang,
        |  COALESCE(hits.n_hits, CAST(0 AS BIGINT)) AS n_hits,
        |  COALESCE(hits.n_hits, CAST(0 AS BIGINT)) > 0 AS contaminated
        |FROM (SELECT doc_id, lang FROM h WHERE hb >= 980) t
        |LEFT JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin,

    "t24_governed_pipeline" ->
      """WITH h AS (
        |  SELECT doc_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
        |  FROM documents),
        |qual AS (
        |  SELECT doc_id, text, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM h
        |  WHERE hb < 980 AND len(string_split(text,' ')) >= 5
        |    AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |      / CAST(len(string_split(text,' ')) AS DOUBLE) >= 0.3),
        |uniqd AS (
        |  SELECT doc_id, text, ntok FROM (
        |    SELECT doc_id, text, ntok,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM qual) q WHERE rn = 1),
        |heldg AS (
        |  SELECT DISTINCT
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT l, unnest(generate_series(1, len(l)-4)) AS i
        |        FROM (SELECT string_split(text,' ') AS l FROM h WHERE hb >= 980) t0) t1),
        |traing AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-4)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM uniqd) t0) t1),
        |guilty AS (SELECT DISTINCT t.doc_id FROM traing t JOIN heldg USING (sid)),
        |kept AS (SELECT u.doc_id, u.ntok FROM uniqd u
        |         WHERE NOT EXISTS (SELECT 1 FROM guilty g WHERE g.doc_id = u.doc_id)),
        |packed AS (SELECT doc_id, ntok,
        |             CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |           FROM kept)
        |SELECT doc_id, ntok, off, off // 256 AS chunk_first
        |FROM packed ORDER BY doc_id""".stripMargin,

    "t30_clean_pipeline" ->
      """WITH h AS (
        |  SELECT doc_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':split',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 1000 AS hb
        |  FROM documents),
        |tr AS (SELECT doc_id, text FROM h WHERE hb < 980),
        |b AS (SELECT doc_id, string_split(text,' ') AS l,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS ntok FROM tr),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(array_to_string(l[i:i+7], ' '),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-7)) AS i
        |        FROM b WHERE ntok >= 8) t0),
        |dup AS (SELECT sid FROM g GROUP BY sid HAVING count(*) > 1),
        |sp AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN dup USING (sid)),
        |mrk AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM sp),
        |grp AS (
        |  SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM mrk),
        |isl AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
        |tok AS (SELECT t.doc_id, u.z[2] AS pos, u.z[1] AS tok
        |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM tr) t,
        |          unnest(list_zip(t.l, generate_series(0, len(t.l)-1))) AS u(z)),
        |keptt AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
        |          WHERE NOT EXISTS (SELECT 1 FROM isl i
        |            WHERE i.doc_id = t.doc_id AND t.pos >= i.s AND t.pos < i.e)),
        |cleaned AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok,
        |              string_agg(tok, ' ' ORDER BY pos) AS ctext
        |            FROM keptt GROUP BY doc_id),
        |heldg AS (
        |  SELECT DISTINCT
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT l, unnest(generate_series(1, len(l)-4)) AS i
        |        FROM (SELECT string_split(text,' ') AS l FROM h WHERE hb >= 980) t0) t1),
        |cleang AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4],''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-4)) AS i
        |        FROM (SELECT doc_id, string_split(ctext,' ') AS l FROM cleaned) t0) t1),
        |guilty AS (SELECT DISTINCT c.doc_id FROM cleang c JOIN heldg USING (sid)),
        |kept AS (SELECT cl.doc_id, cl.ntok FROM cleaned cl
        |         WHERE NOT EXISTS (SELECT 1 FROM guilty gy WHERE gy.doc_id = cl.doc_id)),
        |packed AS (SELECT doc_id, ntok,
        |             CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |           FROM kept)
        |SELECT doc_id, ntok, off, off // 256 AS chunk_first
        |FROM packed ORDER BY doc_id""".stripMargin,

    "t29_span_removal" ->
      s"""WITH b AS (
        |  SELECT doc_id, string_split(text,' ') AS l,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(array_to_string(l[i:i+7], ' '),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-7)) AS i
        |        FROM b WHERE ntok >= 8) t0),
        |dup AS (SELECT sid FROM g GROUP BY sid HAVING count(*) > 1),
        |sp AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN dup USING (sid)),
        |mrk AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM sp),
        |grp AS (
        |  SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM mrk),
        |isl AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
        |tok AS (${Q.toksSql}),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
        |         WHERE NOT EXISTS (SELECT 1 FROM isl i
        |           WHERE i.doc_id = t.doc_id AND t.pos >= i.s AND t.pos < i.e))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(tok, ' ' ORDER BY pos) AS text_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t25_span_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, string_split(text,' ') AS l,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(array_to_string(l[i:i+7], ' '),''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-7)) AS i
        |        FROM b WHERE ntok >= 8) t0),
        |dup AS (SELECT sid FROM g GROUP BY sid HAVING count(*) > 1),
        |sp AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN dup USING (sid)),
        |mrk AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM sp),
        |grp AS (
        |  SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM mrk),
        |isl AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
        |per AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_toks,
        |          CAST(count(*) AS BIGINT) AS n_islands
        |        FROM isl GROUP BY doc_id)
        |SELECT b.doc_id, b.ntok,
        |  coalesce(p.dup_toks, 0) AS dup_toks,
        |  coalesce(p.n_islands, 0) AS n_islands,
        |  b.ntok - coalesce(p.dup_toks, 0) AS toks_kept
        |FROM b LEFT JOIN per p USING (doc_id) ORDER BY doc_id""".stripMargin,

    // t26 is plan-level only (bloom pre-filter + exact confirm join) —
    // the answer is defined to be t23's, so they share one oracle.
    "t23_decontam_removal" -> decontamRemovalSql,
    "t26_bloom_decontam" -> decontamRemovalSql,

    "t22_temperature_mix" ->
      """WITH h AS (
        |  SELECT lang, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('graft:' || CAST(doc_id AS VARCHAR) || ':mix',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 10000 AS hb
        |  FROM documents),
        |st AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM h GROUP BY lang),
        |mn AS (SELECT min(n_l) AS n_min FROM st)
        |SELECT h.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM h JOIN st ON h.lang = st.lang CROSS JOIN mn
        |WHERE CAST(hb AS DOUBLE) < sqrt(CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE)) * 10000
        |GROUP BY h.lang ORDER BY h.lang""".stripMargin,

    "t15_dedup_components" ->
      s"""WITH RECURSIVE ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
         |          FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT d1, d2 FROM inter
         |          JOIN sizes x ON inter.d1 = x.doc_id
         |          JOIN sizes y ON inter.d2 = y.doc_id
         |          WHERE CAST(i AS DOUBLE) / CAST(x.nsh + y.nsh - i AS DOUBLE) >= 0.5),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |nodes AS (SELECT DISTINCT a AS doc_id FROM edges)
         |SELECT n.doc_id,
         |  CAST(least(n.doc_id, min(r.b)) AS BIGINT) AS cluster
         |FROM nodes n JOIN reach r ON r.a = n.doc_id
         |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,

    "t14_corpus_pipeline" ->
      """WITH qual AS (
        |  SELECT doc_id, text, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM documents
        |  WHERE len(string_split(text,' ')) >= 5
        |    AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |      / CAST(len(string_split(text,' ')) AS DOUBLE) >= 0.3),
        |uniqd AS (
        |  SELECT doc_id, text, ntok FROM (
        |    SELECT doc_id, text, ntok,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM qual) q WHERE rn = 1),
        |shing AS (
        |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-2)) AS i
        |        FROM (SELECT doc_id, string_split(text,' ') AS l FROM uniqd) t0) t1),
        |ids0 AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(sh,''), c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |  FROM shing),
        |sh2 AS (SELECT doc_id, sid
        |        FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df
        |              FROM ids0) z
        |        WHERE df <= 50),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh2 GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
        |          FROM sh2 a JOIN sh2 b ON a.sid = b.sid AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |dropd AS (SELECT DISTINCT d2 AS doc_id
        |          FROM pairs p JOIN sizes x ON p.d1 = x.doc_id
        |          JOIN sizes y ON p.d2 = y.doc_id
        |          WHERE CAST(inter AS DOUBLE)
        |            / CAST(x.nsh + y.nsh - inter AS DOUBLE) >= 0.5),
        |kept AS (SELECT u.doc_id, u.ntok FROM uniqd u
        |         WHERE NOT EXISTS (SELECT 1 FROM dropd dd WHERE dd.doc_id = u.doc_id)),
        |packed AS (SELECT doc_id, ntok,
        |             CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |           FROM kept)
        |SELECT doc_id, ntok, off, off // 256 AS chunk_first
        |FROM packed ORDER BY doc_id""".stripMargin,

    "t13_feature_hash" ->
      s"""SELECT doc_id, tid % 128 AS dim,
         |  CAST(sum(((tid // 128) % 2) * 2 - 1) AS BIGINT) AS fval
         |FROM (SELECT doc_id,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(string_split(tok,''), c -> CAST(ascii(c) AS BIGINT))),
         |          (a, x) -> (a * 31 + x) % 1000000007) AS tid
         |      FROM (${Q.toksSql}) tk) t
         |GROUP BY doc_id, tid % 128
         |HAVING CAST(sum(((tid // 128) % 2) * 2 - 1) AS BIGINT) <> 0
         |ORDER BY doc_id, dim""".stripMargin,

    "t12_token_pack" ->
      """SELECT doc_id, ntok, off,
        |  off // 256 AS chunk_first, (off + ntok - 1) // 256 AS chunk_last
        |FROM (
        |  SELECT doc_id, ntok,
        |    CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |        FROM documents) t) z
        |ORDER BY doc_id""".stripMargin,

    "t07_quality" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS INT) AS n_tok,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_tok_len,
        |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS uniq_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t08_token_topk" ->
      s"""SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (${Q.toksSql}) t
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,

    "t27_bigram_lift" ->
      s"""WITH tk AS (${Q.toksSql}),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM tk),
         |bi AS (SELECT l[i] AS w1, l[i+1] AS w2, CAST(count(*) AS BIGINT) AS c_xy
         |       FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS i
         |             FROM (SELECT string_split(text,' ') AS l FROM documents) t0) t1
         |       GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT w1, w2, c_xy, u1.c AS c1, u2.c AS c2,
         |  CAST(c_xy AS DOUBLE) * CAST(n_tok AS DOUBLE)
         |    / CAST(u1.c * u2.c AS DOUBLE) AS lift
         |FROM bi JOIN uni u1 ON u1.tok = w1 JOIN uni u2 ON u2.tok = w2, n
         |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,

    "t28_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text,
        |    '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f'']+')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t09_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t10_lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_toks
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "t11_langid_stopwords" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS en_ratio,
        |  CASE WHEN CAST(len(list_filter(string_split(text,' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) > 0.08 THEN 'en' ELSE 'other' END AS pred
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m02_media_decode" ->
      """SELECT doc_id AS media_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,

    "m03_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(off AS INT) AS frame_off,
        |  ascii(substr(text, CAST(off AS INT) + 1, 1)) AS probe
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, octet_length(CAST(text AS BLOB)) - 1, 64)) AS off
        |      FROM documents) t
        |ORDER BY 1, 2""".stripMargin,

    "m04_audio_windows" ->
      """SELECT doc_id AS media_id, CAST(off AS INT) AS w_start,
        |  CAST(least(off + 64, octet_length(CAST(text AS BLOB))) AS BIGINT) AS w_end,
        |  ascii(substr(text, CAST(off AS INT) + 1, 1)) AS probe
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, octet_length(CAST(text AS BLOB)) - 1, 48)) AS off
        |      FROM documents) t
        |ORDER BY 1, 2""".stripMargin,

    // m06: the oracle recomputes every probed field from the SAME
    // doc_id-derived construction parameters the query built the
    // payload bytes from — equality proves the box/chunk walk inverted
    // the build exactly (fixture sizes 316/88 bytes are the fixed box
    // tree layouts, also asserted by MediaProbeSpec).
    "m06_container_probe" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |  CAST(320 + (doc_id % 8) * 16 AS INT) AS width,
        |  CAST(240 + (doc_id % 6) * 16 AS INT) AS height,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN (24 + (doc_id % 4) * 6) * 1000000
        |    ELSE (CASE WHEN doc_id % 4 = 1 THEN 25 ELSE 50 END) * 1000000
        |  END AS fps_ppm,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN (doc_id % 10 + 1) * 1000
        |    ELSE ((doc_id % 100 + 1) * 5) *
        |      (1000000 // (CASE WHEN doc_id % 4 = 1 THEN 25 ELSE 50 END)) // 1000
        |  END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 316 ELSE 88 END AS INT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // m07: both sides closed-form (the catalog column and the fixture
    // parameters), the Spark side's duration through the real parse
    "m07_runtime_mismatch" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN (doc_id % 10 + 1) * 1000
        |      ELSE ((doc_id % 100 + 1) * 5) *
        |        (1000000 // (CASE WHEN doc_id % 4 = 1 THEN 25 ELSE 50 END))
        |        // 1000
        |    END AS duration_ms
        |  FROM documents),
        |c AS (SELECT *, duration_ms
        |    + CASE WHEN media_id % 7 = 0 THEN 120000 ELSE 0 END AS claimed_ms
        |  FROM p)
        |SELECT media_id, container, duration_ms, claimed_ms,
        |  abs(duration_ms - claimed_ms) AS drift_ms
        |FROM c WHERE abs(duration_ms - claimed_ms) > 60000
        |ORDER BY media_id""".stripMargin,

    // m08: the same corruption-class arithmetic closed-form; intact
    // rows replay m06's field formulas
    "m08_probe_tolerance" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 5 IN (0, 2) THEN 'unknown'
        |    WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |  CAST(CASE WHEN doc_id % 5 IN (0, 1, 2) THEN -1
        |    ELSE 320 + (doc_id % 8) * 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 5 IN (0, 1, 2) THEN -1
        |    ELSE 240 + (doc_id % 6) * 16 END AS INT) AS height,
        |  CASE WHEN doc_id % 5 IN (0, 1, 2) THEN -1
        |    WHEN doc_id % 2 = 0 THEN (24 + (doc_id % 4) * 6) * 1000000
        |    ELSE (CASE WHEN doc_id % 4 = 1 THEN 25 ELSE 50 END) * 1000000
        |  END AS fps_ppm,
        |  CASE WHEN doc_id % 5 IN (0, 1, 2) THEN -1
        |    WHEN doc_id % 2 = 0 THEN (doc_id % 10 + 1) * 1000
        |    ELSE ((doc_id % 100 + 1) * 5) *
        |      (1000000 // (CASE WHEN doc_id % 4 = 1 THEN 25 ELSE 50 END)) // 1000
        |  END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 8
        |    WHEN doc_id % 5 = 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 60 ELSE 40 END)
        |    WHEN doc_id % 5 = 2 THEN 16
        |    WHEN doc_id % 2 = 0 THEN 316 ELSE 88 END AS INT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // m09: same probe/lag/variance-numerator arithmetic over m05's
    // sampled-byte CTE
    "m09_blurriness" ->
      """WITH f AS (SELECT doc_id AS media_id, CAST(off AS INT) AS frame_off,
        |    ascii(substr(text, CAST(off AS INT) + 1, 1)) AS probe
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(0, octet_length(CAST(text AS BLOB)) - 1, 64))
        |            AS off
        |        FROM documents) t),
        |c AS (SELECT media_id, probe,
        |        lag(probe, 1) OVER (PARTITION BY media_id ORDER BY frame_off)
        |          AS prev FROM f),
        |g AS (SELECT media_id, count(*) AS n_pairs,
        |        CAST(sum(probe - prev) AS BIGINT) AS sum_d,
        |        CAST(sum((probe - prev) * (probe - prev)) AS BIGINT) AS sum_d2
        |      FROM c WHERE prev IS NOT NULL GROUP BY 1)
        |SELECT media_id, n_pairs, sum_d, sum_d2,
        |  n_pairs * sum_d2 - sum_d * sum_d AS var_num,
        |  CAST(CASE WHEN n_pairs * sum_d2 - sum_d * sum_d
        |    < 900 * n_pairs * n_pairs THEN 1 ELSE 0 END AS INT) AS blurry
        |FROM g ORDER BY media_id""".stripMargin,

    "m01_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS nbytes,
        |  ascii(substr(text, 1, 1)) + ascii(substr(text, 17, 1)) * 31
        |    + ascii(substr(text, 33, 1)) * 961 AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    // m05: identical lag/cut/running-count windows over the same
    // sampled probes.
    "m05_scene_cuts" ->
      """WITH f AS (SELECT doc_id AS media_id, CAST(off AS INT) AS frame_off,
        |    ascii(substr(text, CAST(off AS INT) + 1, 1)) AS probe
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(0, octet_length(CAST(text AS BLOB)) - 1, 64))
        |            AS off
        |        FROM documents) t),
        |c AS (SELECT media_id, frame_off, probe,
        |        lag(probe, 1) OVER (PARTITION BY media_id ORDER BY frame_off)
        |          AS prev FROM f),
        |k AS (SELECT media_id, frame_off,
        |        CASE WHEN prev IS NOT NULL AND abs(probe - prev) >= 30
        |          THEN 1 ELSE 0 END AS cut FROM c),
        |sc AS (SELECT media_id, frame_off,
        |         CAST(sum(cut) OVER (PARTITION BY media_id ORDER BY frame_off
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS scene FROM k)
        |SELECT media_id, scene, min(frame_off) AS s_off, max(frame_off) AS e_off,
        |  CAST(count(*) AS BIGINT) AS n_frames
        |FROM sc GROUP BY media_id, scene ORDER BY media_id, scene""".stripMargin,

    // t59: same hash priority, same partitioned rank.
    "t59_source_cap" ->
      """WITH p AS (SELECT doc_id, source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split('graft:' || CAST(doc_id AS VARCHAR) || ':cap',''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS pri
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY pri, doc_id) AS BIGINT) AS rn FROM p)
        |SELECT doc_id, source, rn FROM r WHERE rn <= 100
        |ORDER BY source, rn""".stripMargin,

    // t60: t03's truth CTEs + t04's candidate CTEs, full-outer joined.
    "t60_lsh_recall" ->
      s"""WITH ids AS (SELECT DISTINCT doc_id, sid FROM ($shingleIdsSql) i0),
         |sh AS (SELECT doc_id, sid
         |       FROM (SELECT doc_id, sid, count(*) OVER (PARTITION BY sid) AS df
         |             FROM ids) z
         |       WHERE df <= 50),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
         |prs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |        FROM sh a JOIN sh b ON a.sid = b.sid AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         |truth AS (SELECT d1, d2 FROM prs JOIN sizes x ON prs.d1 = x.doc_id
         |          JOIN sizes y ON prs.d2 = y.doc_id
         |          WHERE CAST(inter AS DOUBLE)
         |            / CAST(x.nsh + y.nsh - inter AS DOUBLE) >= 0.5),
         |mh AS ($minhashSql),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |            CAST(sum(CASE WHEN i % 2 = 0 THEN mh * $P ELSE mh END) AS BIGINT)
         |              AS sig
         |          FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |fo AS (SELECT t.d1 AS td1, c.d1 AS cd1
         |       FROM truth t FULL OUTER JOIN cand c
         |         ON t.d1 = c.d1 AND t.d2 = c.d2),
         |g AS (SELECT
         |        CAST(sum(CASE WHEN td1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_truth,
         |        CAST(sum(CASE WHEN cd1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_cand,
         |        CAST(sum(CASE WHEN td1 IS NOT NULL AND cd1 IS NOT NULL
         |          THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |      FROM fo)
         |SELECT n_truth, n_cand, tp,
         |  round(CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE), 6) AS precision6,
         |  round(CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) AS recall6
         |FROM g""".stripMargin,

    // t51: integer chunk-count arithmetic and the same rolling hash over
    // the space-joined chunk tokens — byte-identical fingerprints.
    "t51_chunk_windows" ->
      """WITH b AS (SELECT doc_id, string_split(text,' ') AS l,
        |             CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |           FROM documents),
        |n AS (SELECT doc_id, l, ntok,
        |        1 + (greatest(ntok - 32, 0) + 23) // 24 AS nch FROM b),
        |c AS (SELECT doc_id, l, ntok,
        |        unnest(generate_series(0, nch - 1)) AS chunk_idx FROM n),
        |s AS (SELECT doc_id, chunk_idx, chunk_idx * 24 AS start,
        |        least(32, ntok - chunk_idx * 24) AS len, l FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start, CAST(len AS BIGINT) AS len,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(
        |      array_to_string(l[CAST(start+1 AS INT):CAST(start+len AS INT)], ' '),''),
        |      ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // t52: distinct per-doc bigram ids by the same rolling hash, then
    // per-source document frequency against the source's doc count.
    "t52_boilerplate_ngrams" ->
      """WITH b AS (SELECT doc_id, source, string_split(text,' ') AS l
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id, source, l[i] || ' ' || l[i+1] AS sh
        |      FROM (SELECT doc_id, source, l,
        |              unnest(generate_series(1, len(l)-1)) AS i FROM b) t),
        |ids AS (SELECT DISTINCT doc_id, source,
        |          list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            list_transform(string_split(sh,''),
        |              c -> CAST(ascii(c) AS BIGINT))),
        |            (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |        FROM g),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM documents GROUP BY 1),
        |df AS (SELECT source, sid, CAST(count(*) AS BIGINT) AS df
        |       FROM ids GROUP BY 1, 2)
        |SELECT df.source, df.sid, df.df, ns.n_docs
        |FROM df JOIN ns USING (source)
        |WHERE df.df >= 5 AND df.df * 5 >= ns.n_docs
        |ORDER BY df.source, df.sid""".stripMargin,

    // t53: distinct (source, bigram-id) profiles, sid-keyed pair
    // intersection, Jaccard as one double division — integers
    // everywhere else.
    "t53_source_similarity" ->
      """WITH b AS (SELECT doc_id, source, string_split(text,' ') AS l
        |           FROM documents),
        |g AS (SELECT DISTINCT source, l[i] || ' ' || l[i+1] AS sh
        |      FROM (SELECT source, l,
        |              unnest(generate_series(1, len(l)-1)) AS i FROM b) t),
        |ids AS (SELECT DISTINCT source,
        |          list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            list_transform(string_split(sh,''),
        |              c -> CAST(ascii(c) AS BIGINT))),
        |            (a, x) -> (a * 31 + x) % 1000000007) AS sid
        |        FROM g),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
        |       FROM ids GROUP BY 1),
        |it AS (SELECT a.source AS s1, b.source AS s2,
        |         CAST(count(*) AS BIGINT) AS inter
        |       FROM ids a JOIN ids b
        |         ON a.sid = b.sid AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT it.s1, it.s2, x.nv AS n1, y.nv AS n2, it.inter,
        |  CAST(it.inter AS DOUBLE)
        |    / CAST(x.nv + y.nv - it.inter AS DOUBLE) AS jaccard
        |FROM it JOIN sz x ON x.source = it.s1
        |  JOIN sz y ON y.source = it.s2
        |ORDER BY s1, s2""".stripMargin,

    // t54: t04's candidate CTE verbatim, then the v-series cosine left
    // folds on the candidates' embeddings — same doubles both engines.
    "t54_crossmodal_dedup" ->
      s"""WITH mh AS ($minhashSql),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |            CAST(sum(CASE WHEN i % 2 = 0 THEN mh * $P ELSE mh END) AS BIGINT) AS sig
         |          FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |e AS (SELECT vec_id, embedding,
         |        sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |          list_transform(embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |          (a, x) -> a + x)) AS nrm
         |      FROM embeddings),
         |sc AS (SELECT d1, d2,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(list_zip(a.embedding, b.embedding),
         |             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
         |           (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
         |       FROM cand JOIN e a ON a.vec_id = d1
         |         JOIN e b ON b.vec_id = d2)
         |SELECT d1, d2, round(cos, 6) AS cos, cos > 0.5 AS confirmed
         |FROM sc ORDER BY d1, d2""".stripMargin,

    // t55: t49's two trained merges (same CTEs), applied to every doc;
    // RE2's global \b-bounded replace is the same left-to-right
    // non-overlapping sweep as the native merge_pair array scan.
    "t55_bpe_encode" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |pc1 AS (SELECT l[i] || ' ' || l[i+1] AS pair, CAST(count(*) AS BIGINT) AS cnt
        |        FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS i
        |              FROM (SELECT string_split(text,' ') AS l FROM d0) t0) t1
        |        GROUP BY 1),
        |p1 AS (SELECT pair FROM pc1 ORDER BY cnt DESC, pair LIMIT 1),
        |d1 AS (SELECT doc_id,
        |         regexp_replace(text,
        |           '\b' || (SELECT pair FROM p1) || '\b',
        |           replace((SELECT pair FROM p1), ' ', '_'), 'g') AS text
        |       FROM d0),
        |pc2 AS (SELECT l[i] || ' ' || l[i+1] AS pair, CAST(count(*) AS BIGINT) AS cnt
        |        FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS i
        |              FROM (SELECT string_split(text,' ') AS l FROM d1) t0) t1
        |        GROUP BY 1),
        |p2 AS (SELECT pair FROM pc2 ORDER BY cnt DESC, pair LIMIT 1),
        |d2 AS (SELECT doc_id,
        |         regexp_replace(text,
        |           '\b' || (SELECT pair FROM p2) || '\b',
        |           replace((SELECT pair FROM p2), ' ', '_'), 'g') AS text
        |       FROM d1)
        |SELECT d0.doc_id,
        |  CAST(len(string_split(d0.text,' ')) AS BIGINT) AS ntok0,
        |  CAST(len(string_split(d1.text,' ')) AS BIGINT) AS ntok1,
        |  CAST(len(string_split(d2.text,' ')) AS BIGINT) AS ntok2,
        |  (SELECT pair FROM p1) AS p1, (SELECT pair FROM p2) AS p2
        |FROM d0 JOIN d1 USING (doc_id) JOIN d2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // t56: GROUP BY ROLLUP mirrors Spark's rollup grouping sets; all
    // counts exact BIGINTs, the one double is the dup ratio.
    "t56_corpus_card" ->
      """WITH b AS (SELECT lang, source, text,
        |             CAST(length(text) AS BIGINT) AS nc,
        |             CAST(len(string_split(text,' ')) AS BIGINT) AS nt
        |           FROM documents),
        |g AS (SELECT coalesce(lang, 'ALL') AS lang,
        |        CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |        CAST(sum(nc) AS BIGINT) AS total_chars,
        |        CAST(sum(nt) AS BIGINT) AS total_toks,
        |        CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
        |      FROM b GROUP BY ROLLUP(lang))
        |SELECT lang, n_docs, n_sources, total_chars, total_toks, n_distinct,
        |  round(CAST(n_docs - n_distinct AS DOUBLE)
        |    / CAST(n_docs AS DOUBLE), 6) AS dup_ratio
        |FROM g ORDER BY lang""".stripMargin,

    // t57: identical sketch family (rolling-hash sid, minhash
    // multipliers, 4x512), identical min-over-rows estimate.
    "t57_cms_heavy" ->
      s"""WITH tk AS (SELECT tok,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(tok,''), c -> CAST(ascii(c) AS BIGINT))),
         |      (a, x) -> (a * 31 + x) % 1000000007) AS sid
         |  FROM ($toksSql) t0),
         |r AS (SELECT sid, unnest(generate_series(0, 3)) AS j FROM tk),
         |sk AS (SELECT j,
         |         ((sid * (((j*2+3)*524287) % $P) + (j*5+7)*8191) % $P) % 512
         |           AS bucket,
         |         CAST(count(*) AS BIGINT) AS c
         |       FROM r GROUP BY 1, 2),
         |ex AS (SELECT tok, sid, CAST(count(*) AS BIGINT) AS exact_cnt
         |       FROM tk GROUP BY 1, 2
         |       ORDER BY exact_cnt DESC, tok LIMIT 30),
         |q AS (SELECT tok, exact_cnt, sid, unnest(generate_series(0, 3)) AS j
         |      FROM ex),
         |qb AS (SELECT tok, exact_cnt, j,
         |         ((sid * (((j*2+3)*524287) % $P) + (j*5+7)*8191) % $P) % 512
         |           AS bucket
         |       FROM q)
         |SELECT tok, exact_cnt, CAST(min(c) AS BIGINT) AS est_cnt
         |FROM qb JOIN sk USING (j, bucket)
         |GROUP BY tok, exact_cnt ORDER BY exact_cnt DESC, tok""".stripMargin,

    // t58: window cumsum (bit-identical to the two-phase prefix sum by
    // PackingSpec) + the same shifted floor-division probe count.
    "t58_pps_sample" ->
      """WITH base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS w
        |  FROM documents),
        |cum AS (SELECT doc_id, w,
        |    CAST(coalesce(sum(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS off FROM base),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM base),
        |p AS (SELECT doc_id, w, off, greatest(tw // 64, 1) AS step
        |      FROM cum, t)
        |SELECT doc_id, w, off,
        |  CAST(((off + w - 1 - step//2 + 2*step) // step)
        |    - ((off - 1 - step//2 + 2*step) // step) AS BIGINT) AS n_hits
        |FROM p
        |WHERE ((off + w - 1 - step//2 + 2*step) // step)
        |    - ((off - 1 - step//2 + 2*step) // step) >= 1
        |ORDER BY doc_id""".stripMargin
  )
}
