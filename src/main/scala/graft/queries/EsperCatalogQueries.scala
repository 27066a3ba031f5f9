package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.IntervalOps
import graft.sources.Tables
import Q._

/** The reference UI's named-query catalog, re-expressed as end-to-end
  * compositions over the driver tables (round-16 VERDICT ask #1):
  * every building block here — coalesce, overlap joins, correlated
  * counts, set difference, strides, boolean caption search, exact
  * cosine KNN — is individually green elsewhere in the corpus; these
  * rows prove they compose the way the reference's UI queries compose
  * them (app/esper/queries/other_queries.py:4-554, all_faces.py,
  * panels_sql.py).
  *
  * Entity mapping (consistent with e01-e05): video := events.user_id,
  * identity tracks := click/view event types with probability :=
  * fractional cents of `value` (e03's integer-exact convention),
  * shots := coalesced 'error' intervals, faces/bboxes := Q.boxes
  * (lineitem-derived), face embeddings := the embeddings table.
  * e06/e10 wrap starts into ONE HOUR (% 3600) instead of Q.ev's day:
  * shot-vs-track overlap density at day wrap is ~0 at test scale and
  * the reference's shot/identity overlaps are dense by construction.
  *
  * Scale notes are per query; the common shape — coalesce (one
  * window per key), overlap semi-joins (equi on the video key first,
  * band residual second), broadcast dimension joins, TakeOrdered
  * limits — is the §2 operators' already-audited 100 TB form.
  */
object EsperCatalogQueries {

  /** Hour-wrapped interval track with the e03 probability cents:
    * (user_id, event_type, s, e, k). */
  private def evHour(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.events(tune(s), d)
    val sec = tsSec(raw) % 3600
    raw.select(col("user_id"), col("event_type"),
      sec.as("s"), (sec + floor(col("value")).cast("long") + 1).as("e"),
      (round(col("value") * 100).cast("long") % 100).as("k"))
  }

  /** SQL mirror of [[evHour]]. */
  private def evHourSql(typ: String = null): String = {
    val w = if (typ == null) "" else s" WHERE event_type = '$typ'"
    """SELECT user_id, event_type,
      |  (epoch_ns(ts)//1000000000) % 3600 AS s,
      |  (epoch_ns(ts)//1000000000) % 3600 + CAST(floor(value) AS BIGINT) + 1 AS e,
      |  CAST(round(value*100,0) AS BIGINT) % 100 AS k
      |FROM events""".stripMargin + w
  }

  private val C = IntervalOps.Cols("user_id", "s", "e")

  /** Derived face-attribute star (the Face/HairColor/HairLength/
    * FaceIdentity/FaceGender tables of the reference schema), all
    * deterministic functions of lineitem so both engines agree:
    * face_id = frame*10+box (l_linenumber <= 7, so the composite is
    * collision-free), gender = box parity, hair color/length =
    * part/supplier key residues, identity = the part's brand with
    * probability = supplier-key cents. */
  private def faces(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(tune(s), d).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("face_id"),
      col("l_orderkey").as("frame_id"), col("l_linenumber").as("box_id"),
      col("l_partkey"), col("l_suppkey"))

  private val facesSql =
    """SELECT l_orderkey*10 + l_linenumber AS face_id,
      |  l_orderkey AS frame_id, l_linenumber AS box_id,
      |  l_partkey, l_suppkey
      |FROM lineitem""".stripMargin

  val queries: Map[String, QFn] = Map(

    // E6: "Two identities" (other_queries.py:73-88) — shots where BOTH
    // identities appear above the probability threshold (set
    // intersection through shots), returning every identity sighting
    // inside the qualifying shots. Composition: coalesce -> two
    // overlap LEFT-SEMI joins (the EXISTS arms; equi on video first,
    // so the band residual never crosses videos) -> overlap join back
    // to the track rows. At scale each semi-join is one shuffle on
    // the video key; the candidate shot set only shrinks.
    "e06_two_identities" -> ((s, d) => {
      val ev = evHour(s, d)
      val shots = IntervalOps.coalesce(
        ev.filter(col("event_type") === "error").select("user_id", "s", "e"), C)
      // the identity track is re-keyed (id_uid) because shots and idt
      // share the one events scan — explicit-condition self-joins on
      // the same attribute would be ambiguous
      val idt = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("id_uid"), col("event_type").as("identity"),
          col("s").as("id_s"), col("e").as("id_e"), col("k"))
      def withId(sh: DataFrame, name: String): DataFrame =
        sh.join(idt.filter(col("identity") === name && col("k") > 70),
          sh("user_id") === col("id_uid") &&
            col("id_s") < sh("e") && col("id_e") > sh("s"), "left_semi")
      val both = withId(withId(shots, "click"), "view")
      both.join(idt,
          both("user_id") === col("id_uid") &&
            col("id_s") < both("e") && col("id_e") > both("s"))
        .select(both("user_id").as("video_id"),
          both("s").as("shot_s"), both("e").as("shot_e"),
          col("identity"), col("id_s"), col("id_e"), col("k").as("prob_c"))
        .orderBy("video_id", "shot_s", "shot_e", "identity", "id_s", "id_e",
          "prob_c")
    }),

    // E7: "Frames with two women" (other_queries.py:162-171) — the
    // correlated-count composition: faces filtered by gender and the
    // commercial flag, frames having EXACTLY 2 of them, then the
    // reference's [:1000:10] stride over the qualifying frames, then
    // back to the face rows. The stride takes the 1000 smallest frame
    // ids with a distributed top-K (orderBy+limit — every partition
    // contributes its own top-1000; no corpus-sized single-partition
    // window), so the ordinal window after it is 1000-row-bounded at
    // ANY corpus size.
    "e07_two_women_frames" -> ((s, d) => {
      val f = boxes(s, d)
        .withColumn("gender",
          when(col("box_id") % 2 === 0, "F").otherwise("M"))
        .withColumn("in_commercial", col("frame_id") % 7 === 0)
      val fq = f.filter(col("gender") === "F" && !col("in_commercial"))
      val frames = fq.groupBy("frame_id").agg(count(lit(1)).as("c"))
        .filter(col("c") === 2)
        .orderBy("frame_id").limit(1000)
        .withColumn("rn", row_number().over(Window.orderBy("frame_id")))
        .filter(col("rn") % 10 === 1)
        .select("frame_id")
      fq.join(frames, Seq("frame_id"), "left_semi")
        .select("frame_id", "box_id", "x1", "x2", "y1", "y2")
        .orderBy("frame_id", "box_id")
    }),

    // E8: "White hair, not bald" (all_faces.py:36-45) — strided sample
    // of one attribute table, set-DIFFERENCE against another, join
    // back to faces. The reference strides the white-hair ids
    // ([0:1000000:1000]) BEFORE subtracting the bald set; the
    // difference is an anti-join (broadcast at dimension size).
    "e08_white_hair_not_bald" -> ((s, d) => {
      val fc = faces(s, d)
      // UNCAPPED [::100] stride over every white-hair face: the global
      // ordinal comes from the two-phase running offset (Q.globalRn) —
      // a bare row_number window here would sort the whole face plane
      // in one task at 100 TB
      val whiteStrided = Q.globalRn(
          fc.filter(col("l_partkey") % 5 === 0).select("face_id"),
          "face_id", "rn")
        .filter(col("rn") % 100 === 1)
        .select("face_id")
      val bald = fc.filter(col("l_suppkey") % 11 === 0).select("face_id")
      val keep = whiteStrided.join(bald, Seq("face_id"), "left_anti")
      val b = boxes(s, d)
      b.join(keep, (b("frame_id") * 10 + b("box_id")) === keep("face_id"),
          "left_semi")
        .orderBy("frame_id", "box_id")
    }),

    // E9: "Sunday morning news shows" + "Fox News videos"
    // (other_queries.py:146-159) — date-part + channel filters rolled
    // up per video. Day-of-week/hour come from INTEGER epoch math
    // ((days+4)%7: epoch day 0 was a Thursday, index 4 in a
    // Sunday=0 week) rather than engine date functions, so the row is
    // immune to the engines' differing dow conventions (f03 pins
    // those) AND to the events.ts dtype drift Q.tsSec absorbs.
    "e09_sunday_morning_shows" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw)
      raw.select(col("user_id"), sec.as("sec"))
        .filter((expr("sec div 86400") + 4) % 7 === 0 &&
          expr("(sec % 86400) div 3600").between(6, 11) &&
          col("user_id") % 5 === 3)
        .groupBy(col("user_id").as("video_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("sec")).as("first_s"), max(col("sec")).as("last_s"))
        .orderBy("video_id")
    }),

    // E10: "Segments about <topic>" + polarity ordering
    // (other_queries.py:100-144) — coalesced view-track segments
    // carrying an integer polarity payload (sum of value-cents over
    // member events, averaged as milli via integer div — exact in
    // both engines), kept iff they overlap a click event whose props
    // thing_key lands in the topic bucket (the M2M things filter),
    // ordered most-positive-first like "Positive segments".
    "e10_topic_segments" -> ((s, d) => {
      val ev = evHour(s, d)
      val segs = IntervalOps.coalesce(
        ev.filter(col("event_type") === "view")
          .select("user_id", "s", "e", "k"),
        C, payloadAggs = Seq(sum(col("k")).as("pol_c"),
          count(lit(1)).as("n")))
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 3600
      val things = raw.filter(col("event_type") === "click")
        .select(col("user_id").as("th_uid"), sec.as("th_s"),
          (sec + floor(col("value")).cast("long") + 1).as("th_e"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")
            .as("thing_key"))
        .filter(col("thing_key") % 10 === 7)
      segs.join(things,
          segs("user_id") === col("th_uid") &&
            col("th_s") < segs("e") && col("th_e") > segs("s"), "left_semi")
        .select(col("user_id").as("video_id"), col("s"), col("e"), col("n"),
          expr("pol_c * 1000 div n").as("polarity_milli"))
        .orderBy(col("polarity_milli").desc, col("video_id"), col("s"))
    }),

    // E11: "Panels (SQL)" (panels_sql.py:13-41) — faces tall enough
    // (bbox height >= 0.25) outside commercials, frames with EXACTLY
    // 3 of them whose tops align within 0.05 (the reference loops
    // faces per frame checking |y1_i - y1_0| <= 0.05; max-min <= 0.05
    // is the same predicate computed as ONE aggregate instead of a
    // driver loop). Returns the qualifying faces.
    "e11_panels" -> ((s, d) => {
      val f = boxes(s, d)
        .filter(col("y2") - col("y1") >= 0.25 && col("frame_id") % 7 =!= 0)
      val fr = f.groupBy("frame_id")
        .agg(count(lit(1)).as("c"), (max(col("y1")) - min(col("y1"))).as("sp"))
        .filter(col("c") === 3 && col("sp") <= 0.05)
        .select("frame_id")
      f.join(fr, Seq("frame_id"), "left_semi")
        .select("frame_id", "box_id", "x1", "x2", "y1", "y2")
        .orderBy("frame_id", "box_id")
    }),

    // E12: "Identity and gender" (other_queries.py:4-12) — the
    // identity table filtered by name + probability, joined to the
    // gender table, grouped. identity := the face's part brand,
    // probability := supplier-key cents (>= 0.90).
    "e12_identity_gender" -> ((s, d) => {
      val fc = faces(s, d)
      val ident = fc.join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1" && col("l_suppkey") % 100 >= 90)
        .select("face_id")
      fc.select(col("face_id"),
          when(col("box_id") % 2 === 0, "F").otherwise("M").as("gender"))
        .join(ident, Seq("face_id"), "left_semi")
        .groupBy("gender").agg(count(lit(1)).as("n_faces"))
        .orderBy("gender")
    }),

    // E16: "Identity and clothing" (other_queries.py:15-34) — the
    // group_results shape: one identity's high-probability faces
    // grouped by clothing attribute, each group with its population
    // and a small face sample (the reference random-samples per
    // group; the 3 lowest face ids are the deterministic stand-in).
    // clothing := the part type's first word.
    "e16_identity_clothing" -> ((s, d) => {
      val fc = faces(s, d)
      val sel = fc.join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"),
              split(col("p_type"), " ").getItem(0).as("clothing"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1" && col("l_suppkey") % 100 >= 90)
        .select("face_id", "clothing")
      val w = Window.partitionBy(col("clothing"))
      sel.withColumn("rnk", row_number().over(w.orderBy(col("face_id"))))
        .withColumn("n_faces", count(lit(1)).over(w))
        .filter(col("rnk") <= 3)
        .select(col("clothing"), col("n_faces"), col("face_id"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("clothing", "rnk")
    }),

    // E17: "Random videos w/o topic labels" (other_queries.py:183-204)
    // — videos with NO topic tag (anti-join on the tag relation), the
    // reference's [:1000:10] stride (every 3rd here), each emitted as
    // the full-video frame range {min_frame: 0, max_frame:
    // num_frames-1}. topic tag := any event whose props thing-key is
    // exactly 37; num_frames := the video's event count.
    "e17_untagged_videos" -> ((s, d) => {
      val raw = Tables.events(tune(s), d)
      val tagged = raw.filter(
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int") === 37)
        .select(col("user_id")).distinct()
      raw.groupBy(col("user_id").as("video_id"))
        .agg(count(lit(1)).as("n_frames"))
        .join(tagged, col("video_id") === tagged("user_id"), "left_anti")
        // [:1000:3] stride: distributed top-K first, K-bounded window
        .orderBy("video_id").limit(1000)
        .withColumn("rn", row_number().over(Window.orderBy("video_id")))
        .filter(col("rn") % 3 === 1)
        .select(col("video_id"), lit(0L).as("min_frame"),
          (col("n_frames") - 1).as("max_frame"))
        .orderBy("video_id")
    }),

    // E13: "Caption search" (other_queries.py:246-266) — the LITERAL
    // reference query shape `SEAN SPICER & [RESIGN]`
    // (other_queries.py:251): an unquoted multi-word phrase
    // (juxtaposition) conjoined with a `[word]` inflection group,
    // SERVED from the persisted caption index (the reference's own
    // serve path: query_search hits the prebuilt Rust caption index,
    // app/esper/captions.py:13-30 — it never re-tokenizes the corpus
    // per query); then each family posting in a matching doc converted
    // to a frame range with the per-video fps dimension (convert_time:
    // (t-7)*fps .. (t+1)*fps), first 100 in deterministic posting
    // order (the reference shuffles; a hash-compared row needs an
    // order). The whole composition reads ≤ |vocab| of 64 postings
    // bucket dirs — the evaluator's docs, the family occurrence rows,
    // and the fps dim (a doc_id-derived column) all come off the same
    // pruned read; nothing is corpus-linear. The in-process evaluator
    // form of the same query stays pinned to this served plan by
    // PhraseIndexSpec's randomized serve-parity property. Oracle
    // unchanged: the index is a layout, not a semantics change.
    "e13_caption_search" -> ((s, d) => {
      import graft.text.PhraseSearch
      val dir = Q.memoIndex("phidx", d)(dir =>
        PhraseSearch.writeIndex(toks(s, d), dir, nBuckets = 64))
      val matched = PhraseSearch.servedSearch(s, dir, "slow scan & [merging]")
      val fam = graft.text.Inflect.expand("merging")
      val hits = PhraseSearch.servedPostings(s, dir, fam)
        .select("doc_id", "pos")
        .join(matched, Seq("doc_id"), "left_semi")
      hits
        .withColumn("fps", lit(24) + col("doc_id") % 6)
        .select(col("doc_id"), col("pos"),
          ((col("pos") - 7) * col("fps")).as("min_frame"),
          ((col("pos") + 1) * col("fps")).as("max_frame"))
        .orderBy("doc_id", "pos")
        .limit(100)
        .select("doc_id", "min_frame", "max_frame")
    }),

    // E14: "Face search" (other_queries.py:269-276) — KNN to a target
    // embedding under a distance ceiling (1 - cos <= 0.8), strided
    // ([::3]; the reference uses [::10] on a larger corpus), output
    // kept in similarity order (custom_order_by_id). Exact cosine on
    // the v01 plane: defined-order fold expressions, bit-identical in
    // DuckDB's list_reduce.
    "e14_face_search" -> ((s, d) => {
      import graft.functions.Fns
      val e = Tables.embeddings(tune(s), d)
      val q = broadcast(e.filter(col("vec_id") === 7)
        .select(col("embedding").as("q_emb"),
          Fns.l2norm(col("embedding")).as("q_norm")))
      e.filter(col("vec_id") =!= 7)
        .withColumn("__norm", Fns.l2norm(col("embedding")))
        .crossJoin(q)
        .withColumn("cos", Fns.dot(col("embedding"), col("q_emb")) /
          (col("__norm") * col("q_norm")))
        .filter(lit(1.0) - col("cos") <= 0.8)
        // the [::3] stride is UNCAPPED, so the knn rank comes from the
        // two-phase running offset under the composite (cos DESC,
        // vec_id) order — a bare rank window would sort the whole
        // distance ball in one task at corpus scale
        .transform(df => Q.globalRn(df,
          Seq(col("cos").desc, col("vec_id")), "rank"))
        .withColumn("rank", col("rank").cast("int"))
        .filter((col("rank") - 1) % 3 === 0)
        .select(col("vec_id"), col("rank"), round(col("cos"), 6).as("cos6"))
        .orderBy("rank")
    }),

    // E15: "Groups of faces by distance threshold"
    // (other_queries.py:279-316) — the similarity histogram: every
    // corpus face bucketed by cosine DISTANCE to the target in 0.05
    // increments, per-bucket population plus the top-5 most-similar
    // members as the displayed sample (the reference random-samples
    // per bucket; rank-by-similarity is the deterministic stand-in).
    // The sample uses TopK.perGroup — a bare per-bucket window would
    // sort the corpus on ~40 reducers; the population count is its
    // own combinable rollup, broadcast back onto the 5-row samples.
    "e15_face_distance_groups" -> ((s, d) => {
      import graft.functions.Fns
      val e = Tables.embeddings(tune(s), d)
      val q = broadcast(e.filter(col("vec_id") === 7)
        .select(col("embedding").as("q_emb"),
          Fns.l2norm(col("embedding")).as("q_norm")))
      val scored = e.filter(col("vec_id") =!= 7)
        .withColumn("__norm", Fns.l2norm(col("embedding")))
        .crossJoin(q)
        .withColumn("cos", Fns.dot(col("embedding"), col("q_emb")) /
          (col("__norm") * col("q_norm")))
        .withColumn("bucket",
          floor((lit(1.0) - col("cos")) / 0.05).cast("int"))
        .select("bucket", "vec_id", "cos")
      // r22: population rides the TopK windows (perGroupWithCount) —
      // the former groupBy + broadcast-join form evaluated the scored
      // corpus subtree (crossJoin + cosine) TWICE, once per branch
      graft.operators.TopK.perGroupWithCount(scored, 5, Seq("bucket"),
          Seq(col("cos").desc, col("vec_id")), col("vec_id"), "rnk",
          "n_in_bucket")
        .select((col("bucket") * 5).as("dist_lo_centi"), col("n_in_bucket"),
          col("vec_id"), col("rnk"), round(col("cos"), 6).as("cos6"))
        .orderBy("dist_lo_centi", "rnk")
    }),

    // E18: the stories notebook's topic-segment proposal macro
    // (stories.ipynb `_find_segments` -> `extend_postings_with_context`):
    // key-phrase hits dilated ±5 (clamped at 0) and deoverlapped, then
    // each key span extended through every chain of context hits with
    // start-to-end gaps <= 8 in BOTH directions (the notebook's
    // two-pass merge; for point contexts the reachable set is exactly
    // the gap-8 island of keys ∪ contexts, so ONE gap-coalesce
    // computes it — islands without a key are dropped, matching the
    // notebook never emitting context-only segments), then a
    // min-length filter. n_key_spans carries how many deoverlapped
    // key spans the story segment absorbed. Scale shape: every stage
    // is the per-doc island window + pushed-down token filters —
    // nothing corpus-global EXCEPT the tokenize itself: this row is
    // the corpus's ONE deliberate in-process semantics reference
    // (REFERENCE-ONLY for the serve-latency story — e22 is the served
    // twin off the persisted index, same oracle SQL; 100x stress:
    // e18 5.6x vs e22 1.7x, STRESS10X.md).
    "e18_story_segments" -> ((s, d) => {
      import graft.text.PhraseSearch
      val tk = toks(s, d)
      val c = IntervalOps.Cols("doc_id")
      val k1 = PhraseSearch.phraseHits(tk, Seq("customer"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 1).cast("long").as("e"))
      val k2 = PhraseSearch.phraseHits(tk, Seq("slow", "scan"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 2).cast("long").as("e"))
      val keys = IntervalOps.coalesce(
          IntervalOps.dilate(k1.unionByName(k2), 5, c, clampAtZero = true), c)
        .withColumn("is_key", lit(1L))
      val ctx = tk.filter(col("tok").isin("merge", "window"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 1).cast("long").as("e"))
        .withColumn("is_key", lit(0L))
      IntervalOps.coalesce(keys.unionByName(ctx), c, gap = 8,
          payloadAggs = Seq(max(col("is_key")).as("has_key"),
            sum(col("is_key")).as("n_key_spans")))
        .filter(col("has_key") === 1 && col("e") - col("s") >= 12)
        .select(col("doc_id"), col("s"), col("e"), col("n_key_spans"))
        .orderBy("doc_id", "s")
    }),

    // E19: "Other people who are on screen with X"
    // (other_queries.py:423-460) — seed identity's high-probability
    // faces -> their shots (frames) -> co-occurring OTHER faces above
    // the blurriness floor (anti-join excludes the seed's own faces)
    // -> browse them by k-means cluster, largest clusters first, 10
    // exemplar faces each (the reference random-samples; lowest ids
    // are the deterministic stand-in). The cluster assignment is
    // v12's integer-Lloyd chain over the embedding plane (face ->
    // vector via face_id mod corpus size). Scale shape: identity and
    // part joins broadcast; the shot semi-join and seed anti-join are
    // equi-shuffles; the cluster browse windows over cluster-sized
    // partitions.
    "e19_other_people" -> ((s, d) => {
      val fc = faces(s, d)
      val sel = fc.join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1" && col("l_suppkey") % 100 >= 95)
        .select("face_id", "frame_id")
      val shotIds = sel.select("frame_id").distinct()
      val others = fc.filter(col("l_partkey") % 100 > 10)
        .join(shotIds, Seq("frame_id"), "left_semi")
        .join(sel.select("face_id"), Seq("face_id"), "left_anti")
        .select("face_id")
      val e = Tables.embeddings(tune(s), d)
      val n = broadcast(e.agg(count(lit(1)).as("n_emb")))
      val asg = graft.similarity.IntKMeans.kmeansAssign(e, k = 10)
        .select(col("vec_id"), col("cluster"))
      // exemplar browse via TopK.perGroupWithCount (10 clusters over a
      // corpus-sized face frame would otherwise sort on 10 reducers).
      // r22: cluster populations ride the TopK windows — the former
      // groupBy + broadcast-join form evaluated the whole `clustered`
      // subtree (semi/anti joins + crossJoin + the kmeans-assignment
      // join) TWICE, once per branch; the r21 plan dump shows both
      // copies node for node
      val clustered = others.crossJoin(n)
        .withColumn("vec_id", col("face_id") % col("n_emb"))
        .join(asg, "vec_id")
      graft.operators.TopK.perGroupWithCount(clustered, 10, Seq("cluster"),
          Seq(col("face_id")), col("face_id"), "rnk", "n_faces")
        .select(col("cluster"), col("n_faces"), col("face_id"),
          col("rnk").cast("int").as("rnk"))
        .orderBy(col("n_faces").desc, col("cluster"), col("rnk"))
    }),

    // E20: "Face search by id" with positive AND negative seed sets
    // (other_queries.py:312-378's multi-id knn + its 0.05-increment
    // distance bucketing; the Bernie Sanders pos/neg id lists) —
    // every non-seed vector scored by its NEAREST positive seed
    // (cosine distance), kept iff inside the 0.8 ceiling AND closer
    // to the positives than to any negative seed (the pos/neg gate),
    // bucketed by 0.05, each bucket with its population and top-5
    // nearest members. Seeds are a broadcast dimension; the corpus is
    // scanned once; per-bucket windows run over bucket-sized frames.
    "e20_multi_seed_knn" -> ((s, d) => {
      import graft.functions.Fns
      val e = Tables.embeddings(tune(s), d)
      val posIds = Seq(3L, 11L, 19L)
      val negIds = Seq(5L, 13L)
      val all = posIds ++ negIds
      val seeds = broadcast(e.filter(col("vec_id").isin(all: _*))
        .select(col("embedding").as("s_emb"),
          Fns.l2norm(col("embedding")).as("s_norm"),
          col("vec_id").isin(posIds: _*).as("is_pos")))
      val gated = e.filter(!col("vec_id").isin(all: _*))
        .withColumn("__norm", Fns.l2norm(col("embedding")))
        .crossJoin(seeds)
        .withColumn("dist", lit(1.0) -
          Fns.dot(col("embedding"), col("s_emb")) /
            (col("__norm") * col("s_norm")))
        .groupBy(col("vec_id"))
        .agg(min(when(col("is_pos"), col("dist"))).as("d_pos"),
          min(when(!col("is_pos"), col("dist"))).as("d_neg"))
        .filter(col("d_pos") <= 0.8 && col("d_pos") < col("d_neg"))
        .withColumn("bucket", floor(col("d_pos") / 0.05).cast("int"))
      // r22: population rides the TopK windows (perGroupWithCount) —
      // the former groupBy + broadcast-join form evaluated the gated
      // subtree (corpus crossJoin over the seed set + min-agg) TWICE
      graft.operators.TopK.perGroupWithCount(gated, 5, Seq("bucket"),
          Seq(col("d_pos"), col("vec_id")), col("vec_id"), "rnk",
          "n_in_bucket")
        .select((col("bucket") * 5).as("dist_lo_centi"), col("n_in_bucket"),
          col("vec_id"), col("rnk").cast("int").as("rnk"),
          round(col("d_pos"), 6).as("dist6"))
        .orderBy("dist_lo_centi", "rnk")
    }),

    // E21: "Frames with two poses with two hands above head"
    // (unused_queries.py:39-60) — the f07 keypoint plane composed:
    // poses (one per vector, 4 per frame) pass the hands-above-head
    // predicate (both wrists' y above the nose's — image y grows
    // downward), frames keep >= 2 qualifying poses, the reference's
    // [:100000:10] stride samples the qualifying frames, and the
    // qualifying poses join back. Raw float reads + comparisons only,
    // so the floats hash-match exactly (f07's contract).
    "e21_pose_pair" -> ((s, d) => {
      import graft.functions.Fns.Keypoints
      val kps = Keypoints.pose(col("embedding"))
      val p = Tables.embeddings(tune(s), d).select(col("vec_id"),
        expr("vec_id div 4").as("frame_id"),
        Keypoints.y(kps, Keypoints.Nose).as("nose_y"),
        Keypoints.y(kps, Keypoints.LWrist).as("lw_y"),
        Keypoints.y(kps, Keypoints.RWrist).as("rw_y"),
        Keypoints.handsAboveHead(kps).as("up"))
      val f = p.filter(col("up"))
      val frames = f.groupBy("frame_id").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .orderBy("frame_id").limit(100000)
        .withColumn("rn", row_number().over(Window.orderBy("frame_id")))
        .filter(col("rn") % 10 === 1)
        .select("frame_id")
      f.join(frames, Seq("frame_id"), "left_semi")
        .select("frame_id", "vec_id", "nose_y", "lw_y", "rw_y")
        .orderBy("frame_id", "vec_id")
    }),

    // E22: e18's stories macro SERVED from the persisted caption
    // index — the 100 TB shape: the whole composition (key hits,
    // context hits, dilate, island coalesce) runs off ONE pruned
    // postings read covering the union vocabulary (5 words -> ≤ 5 of
    // 64 bucket dirs, tok residuals row-group-pruned inside them)
    // instead of a corpus tokenize. The reference's stories pipeline
    // does exactly this: query_search hits its prebuilt caption
    // index, never the raw captions (stories.ipynb `_find_segments`).
    // Oracle = e18's SQL verbatim: the index is a layout, not a
    // semantics change.
    "e22_served_stories" -> ((s, d) => {
      import graft.text.PhraseSearch
      val dir = Q.memoIndex("phidx", d)(dir =>
        PhraseSearch.writeIndex(toks(s, d), dir, nBuckets = 64))
      val posts = PhraseSearch.servedPostings(s, dir,
        Seq("customer", "slow", "scan", "merge", "window"))
      val c = IntervalOps.Cols("doc_id")
      val k1 = PhraseSearch.phraseHits(posts, Seq("customer"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 1).cast("long").as("e"))
      val k2 = PhraseSearch.phraseHits(posts, Seq("slow", "scan"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 2).cast("long").as("e"))
      val keys = IntervalOps.coalesce(
          IntervalOps.dilate(k1.unionByName(k2), 5, c, clampAtZero = true), c)
        .withColumn("is_key", lit(1L))
      val ctx = posts.filter(col("tok").isin("merge", "window"))
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + 1).cast("long").as("e"))
        .withColumn("is_key", lit(0L))
      IntervalOps.coalesce(keys.unionByName(ctx), c, gap = 8,
          payloadAggs = Seq(max(col("is_key")).as("has_key"),
            sum(col("is_key")).as("n_key_spans")))
        .filter(col("has_key") === 1 && col("e") - col("s") >= 12)
        .select(col("doc_id"), col("s"), col("e"), col("n_key_spans"))
        .orderBy("doc_id", "s")
    }),

    // E23: "Frames with a man left of a woman"
    // (unused_queries.py:4-34) — the spatial-relation pair: a male box
    // STRICTLY left of a female box (m.x2 < f.x1), both taller than
    // 0.3, first qualifying pair per frame (the reference breaks on
    // the first hit; lowest (m_box, f_box) is the deterministic
    // stand-in), then the [:100000:10] frame stride. The pair join is
    // per-frame (<= 7x7), never cross-frame.
    "e23_man_left_of_woman" -> ((s, d) => {
      val b = boxes(s, d)
        .filter(col("y2") - col("y1") > 0.3)
        .withColumn("gender",
          when(col("box_id") % 2 === 0, "F").otherwise("M"))
      val m = b.filter(col("gender") === "M")
        .select(col("frame_id"), col("box_id").as("m_box"),
          col("x2").as("m_x2"))
      val f = b.filter(col("gender") === "F")
        .select(col("frame_id").as("f_fid"), col("box_id").as("f_box"),
          col("x1").as("f_x1"))
      val first = m.join(f,
          col("frame_id") === col("f_fid") && col("m_x2") < col("f_x1"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("frame_id"))
            .orderBy(col("m_box"), col("f_box"))))
        .filter(col("rn") === 1)
      first.orderBy("frame_id").limit(100000)
        .withColumn("fr", row_number().over(Window.orderBy(col("frame_id"))))
        .filter(col("fr") % 10 === 1)
        .select("frame_id", "m_box", "f_box")
        .orderBy("frame_id")
    }),

    // E24: "People sitting" (unused_queries.py:266-304) — the
    // knee-above/behind-hip angle predicate over the f07 keypoint
    // plane, TRIG-FREE: is_angled(v) tests atan2(-dy, dx) in degrees
    // > 0 or < -140, which is exactly (vy > 0) OR (third-quadrant
    // vector within 40° of the -x axis: dx < 0 ∧ vy < 0 ∧
    // |vy| < |dx|·tan 40°) — one double multiply + compares, mirrored
    // op-for-op in the oracle, no engine atan2/π involved. Frames are
    // gated by the channel residue (CNN := frame_id ≡ 0 mod 3; the
    // pose-count gate is structural — 4 poses/frame) and strided /10
    // BEFORE the pose check, like the reference's frames_qs.
    "e24_people_sitting" -> ((s, d) => {
      import graft.functions.Fns.Keypoints
      val T = 0.8390996311772799 // tan(40°): the -140° ray's |slope|
      val kps = Keypoints.pose(col("embedding"))
      def xD(i: Int) = Keypoints.x(kps, i).cast("double")
      def yD(i: Int) = Keypoints.y(kps, i).cast("double")
      def angled(hip: Int, knee: Int): Column = {
        val dx = xD(knee) - xD(hip)
        val vy = -(yD(knee) - yD(hip)) // image y grows downward
        (vy > 0) || (dx < 0 && vy < 0 && -vy < -dx * T)
      }
      val p = Tables.embeddings(tune(s), d).select(col("vec_id"),
        expr("vec_id div 4").as("frame_id"),
        (angled(Keypoints.LHip, Keypoints.LKnee) ||
          angled(Keypoints.RHip, Keypoints.RKnee)).as("sitting"))
      val frames = p.select("frame_id").distinct()
        .filter(col("frame_id") % 3 === 0)
        .orderBy("frame_id").limit(100000)
        .withColumn("fr", row_number().over(Window.orderBy("frame_id")))
        .filter(col("fr") % 10 === 1)
        .select("frame_id")
      p.filter(col("sitting")).join(frames, Seq("frame_id"), "left_semi")
        .select("frame_id", "vec_id")
        .orderBy("frame_id", "vec_id")
    }),

    // E25: "MTCNN missed face bboxes vs. handlabeled"
    // (unused_queries.py:148-203 + model_cross_validation.ipynb's
    // bbox_dist = midpoint L2) — the labeler-disagreement audit: on
    // frames holding BOTH labelers, a handlabeled box of area >= 0.02
    // is a MISTAKE iff no mtcnn box on the frame has midpoint
    // distance < 0.1 (squared form — no sqrt), reported for the first
    // 100 qualifying frames (the reference's [:100] video slice).
    // The anti-join is per-frame (<= 7x7 pairs), never cross-frame.
    "e25_labeler_disagreement" -> ((s, d) => {
      val b = boxes(s, d)
        .withColumn("labeler",
          when(col("box_id") % 3 === 0, "handlabeled").otherwise("mtcnn"))
        .withColumn("mx", (col("x1") + col("x2")) / 2)
        .withColumn("my", (col("y1") + col("y2")) / 2)
      val both = b.groupBy("frame_id")
        .agg(max(when(col("labeler") === "handlabeled", 1).otherwise(0)).as("h"),
          max(when(col("labeler") === "mtcnn", 1).otherwise(0)).as("m"))
        .filter(col("h") === 1 && col("m") === 1)
        .select("frame_id")
      val hl = b.filter(col("labeler") === "handlabeled" &&
          (col("x2") - col("x1")) * (col("y2") - col("y1")) >= 0.02)
        .join(both, Seq("frame_id"), "left_semi")
      val mt = b.filter(col("labeler") === "mtcnn")
        .select(col("frame_id").as("o_fid"), col("mx").as("o_mx"),
          col("my").as("o_my"))
      val mistakes = hl.join(mt,
        col("frame_id") === col("o_fid") &&
          (col("mx") - col("o_mx")) * (col("mx") - col("o_mx")) +
            (col("my") - col("o_my")) * (col("my") - col("o_my")) < 0.01,
        "left_anti")
      val top = mistakes.select("frame_id").distinct()
        .orderBy("frame_id").limit(100)
        .select("frame_id")
      mistakes.join(top, Seq("frame_id"), "left_semi")
        .select("frame_id", "box_id", "x1", "x2", "y1", "y2")
        .orderBy("frame_id", "box_id")
    }),

    // E26: "Host with other still face" (other_queries.py:196-245) —
    // the correlated-host composition: the host identity's
    // high-probability face per shot (lowest box id per frame is the
    // deterministic stand-in for the reference's last-wins dict),
    // kept iff entirely on one side of frame and tall enough; the
    // shot qualifies iff its OTHER faces (all host faces excluded)
    // number <= 2, are ALL on the opposite side, ALL smaller than the
    // host by the 1.2 ratio, and at least one is >= 0.1 tall. Every
    // per-other-face predicate becomes a row flag and the shot gate
    // one per-frame flag aggregate — no driver loop. Output: all
    // faces of qualifying shots.
    "e26_host_still_face" -> ((s, d) => {
      val fc = faces(s, d)
      // r22 (VERDICT ask #1, exchange consolidation): ONE frame_id
      // repartition of the box table serves its three consumers (the
      // host-box semi join, the others anti join, the final gate semi
      // join) and ONE h_fid repartition of hostIds serves both its
      // join sides. The (frame_id, box_id) joins accept the frame_id-
      // only clustering (both sides hash the SAME key position, the
      // SPARK-35703 subset rule), the frame window / frame aggregate /
      // final semi join then reuse that partitioning, and ReuseExchange
      // dedupes the identical repartition subtrees — the r21 plan paid
      // five separate corpus exchanges (two of them re-evaluating the
      // faces ⋈ part build) plus the gate aggregate's.
      val b = boxes(s, d).repartition(col("frame_id"))
      val hostIds = fc.join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1" && col("l_suppkey") % 100 > 80)
        .select(col("frame_id").as("h_fid"), col("box_id").as("h_box"))
        .repartition(col("h_fid"))
      val hostBox = b.join(hostIds,
          b("frame_id") === col("h_fid") && b("box_id") === col("h_box"),
          "left_semi")
        // r21 determinism fix: (frame_id, box_id) is NOT unique
        // (lineitem carries duplicate (l_orderkey, l_linenumber) rows
        // with different coordinate payloads), so ordering by box_id
        // alone left rn = 1 tie-ambiguous — the sf0.1 oracle sweep
        // caught DuckDB flipping between runs (241/230/247 rows)
        // while sf0.01 happened to have no host-row ties. The window
        // order is now total over the full coordinate tuple,
        // identically in the oracle SQL.
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("frame_id")).orderBy(col("box_id"),
            col("x1"), col("x2"), col("y1"), col("y2"))))
        .filter(col("rn") === 1)
        .filter((col("x1") > 0.5 || col("x2") < 0.5) &&
          col("y2") - col("y1") > 0.2)
        .select(col("frame_id").as("hb_fid"), col("x1").as("hx1"),
          col("x2").as("hx2"), col("y1").as("hy1"), col("y2").as("hy2"))
      val others = b
        .join(hostIds, b("frame_id") === col("h_fid") &&
          b("box_id") === col("h_box"), "left_anti")
        .join(hostBox, b("frame_id") === col("hb_fid"))
      val gate = others
        .withColumn("same_side",
          when((col("hx2") < 0.5 && col("x2") < 0.5) ||
            (col("hx1") > 0.5 && col("x1") > 0.5), 1).otherwise(0))
        .withColumn("too_big",
          when((col("hy2") - col("hy1")) / (col("y2") - col("y1")) < 1.2, 1)
            .otherwise(0))
        .withColumn("tall",
          when(col("y2") - col("y1") >= 0.1, 1).otherwise(0))
        .groupBy(col("frame_id"))
        .agg(count(lit(1)).as("n"), max(col("same_side")).as("ss"),
          max(col("too_big")).as("tb"), max(col("tall")).as("tl"))
        .filter(col("n") <= 2 && col("ss") === 0 && col("tb") === 0 &&
          col("tl") === 1)
        .select("frame_id")
      b.join(gate, Seq("frame_id"), "left_semi")
        .select("frame_id", "box_id", "x1", "x2", "y1", "y2")
        .orderBy("frame_id", "box_id")
    }),

    // E27: "Identity across major shows" (other_queries.py:467-487) —
    // one identity's high-probability sightings grouped per canonical
    // show, shows sorted, up to 10 sightings each. Show := the frame's
    // order's customer's nation name (the video->show dimension chain).
    // Scale: the identity+probability filter runs behind a broadcast
    // part join and leaves a person-sized face set, so AQE broadcasts
    // it into the orders equi-join; customer is joined on the already
    // tiny set; nation is an explicit broadcast; the per-show window
    // runs over that filtered set (reference limit semantics), never
    // the face corpus.
    "e27_identity_across_shows" -> ((s, d) => {
      val fc = faces(s, d)
      val idf = fc.join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#13" && col("l_suppkey") % 100 > 90)
        .select("face_id", "frame_id")
      val ord = Tables.orders(tune(s), d)
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(tune(s), d)
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = broadcast(Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_name")))
      val w = Window.partitionBy(col("show_name"))
      idf.join(ord, idf("frame_id") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("face_id"), col("n_name").as("show_name"))
        .withColumn("rnk", row_number().over(w.orderBy(col("face_id"))))
        .withColumn("n_faces", count(lit(1)).over(w))
        .filter(col("rnk") <= 10)
        .select(col("show_name"), col("n_faces"), col("face_id"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("show_name", "rnk")
    }),

    // E28: "Face search with exclusions" (other_queries.py:382-420) —
    // KNN from one positive seed (ceiling 0.6) MINUS the union of the
    // exclusion seeds' neighborhoods (ceiling 0.4), non-commercial
    // faces only, kept faces in the original knn (distance) order.
    // Scale = e20's: seeds are a 3-row broadcast, the corpus is
    // scanned once, and the ordered output rank is the two-phase
    // composite ordinal (Q.globalRn — range-partitioned, no
    // single-task sort even when the ball is corpus-sized; the same
    // e14 treatment, closing the round-19 builder-known row).
    "e28_face_search_exclusions" -> ((s, d) => {
      import graft.functions.Fns
      val e = Tables.embeddings(tune(s), d)
      val all = Seq(7L, 2L, 23L)
      val seeds = broadcast(e.filter(col("vec_id").isin(all: _*))
        .select(col("embedding").as("s_emb"),
          Fns.l2norm(col("embedding")).as("s_norm"),
          (col("vec_id") === 7L).as("is_pos")))
      e.filter(!col("vec_id").isin(all: _*) && col("vec_id") % 10 =!= 0)
        .withColumn("__norm", Fns.l2norm(col("embedding")))
        .crossJoin(seeds)
        .withColumn("dist", lit(1.0) -
          Fns.dot(col("embedding"), col("s_emb")) /
            (col("__norm") * col("s_norm")))
        .groupBy(col("vec_id"))
        .agg(min(when(col("is_pos"), col("dist"))).as("d_pos"),
          min(when(!col("is_pos"), col("dist"))).as("d_excl"))
        .filter(col("d_pos") <= 0.6 && col("d_excl") > 0.4)
        .transform(df => Q.globalRn(df, Seq(col("d_pos"), col("vec_id")), "rnk"))
        .withColumn("rnk", col("rnk").cast("int"))
        .select(col("vec_id"), col("rnk"), round(col("d_pos"), 6).as("dist6"))
        .orderBy("rnk")
    }),

    // E29: "Talking heads face tracks" (unused_queries.py:63-79) —
    // person tracks restricted to ONE video whose members have at
    // least one mtcnn face taller than 0.3 (the correlated-count
    // EXISTS chain). Track := order, member frames := its lineitems,
    // video := o_custkey residue class, labeler := e25's box_id
    // parity convention. Scale: the face predicate filters BEFORE the
    // per-track partial aggregation (map-side combine), and the
    // agg/join shuffle is co-keyed on the orderkey.
    "e29_talking_head_tracks" -> ((s, d) => {
      val tracks = Tables.orders(tune(s), d)
        .filter(col("o_custkey") % 100 === 17)
        .select(col("o_orderkey").as("track_id"),
          col("o_custkey").as("video_id"))
      val q = boxes(s, d)
        .filter(col("box_id") % 3 =!= 0 && col("y2") - col("y1") >= 0.3)
        .groupBy(col("frame_id"))
        .agg(count(lit(1)).as("n_heads"),
          min(col("box_id")).as("first_box"), max(col("box_id")).as("last_box"))
      tracks.join(q, col("track_id") === col("frame_id"))
        .select("track_id", "video_id", "n_heads", "first_box", "last_box")
        .orderBy("track_id")
    }),

    // E30: "Obama pictures" (unused_queries.py:307-350) — still-face
    // tracks: every CONSECUTIVE pair of member boxes within the
    // closeness threshold on all four coordinates (the reference's
    // per-coordinate `close` loop as a lag window + min-flag
    // aggregate), gated on the track containing >= 1 face whose
    // vector sits inside the seed's distto<=1.0 ball (the
    // FaceFeatures.compute_distances count gate), reporting the
    // track's first box. Track := frame_id (boxes sequenced by
    // box_id, <= 7 rows per window partition). Threshold 0.3 keeps
    // the predicate non-vacuous on the synthetic bbox distribution
    // (the reference's 0.02 is tuned to real detections); the
    // composition — lag conjunction, EXISTS-through-modulo-vector
    // link, arg-min payload — is the reference's, op-for-op.
    "e30_still_face_tracks" -> ((s, d) => {
      import graft.functions.Fns
      val b = boxes(s, d)
        .withColumn("face_id", col("frame_id") * 10 + col("box_id"))
      val e = Tables.embeddings(tune(s), d)
      val n = broadcast(e.agg(count(lit(1)).as("n_emb")))
      val seed = broadcast(e.filter(col("vec_id") === 7L)
        .select(col("embedding").as("s_emb"),
          Fns.l2norm(col("embedding")).as("s_norm")))
      val near = e.crossJoin(seed)
        .filter(lit(1.0) - Fns.dot(col("embedding"), col("s_emb")) /
          (Fns.l2norm(col("embedding")) * col("s_norm")) <= 1.0)
        .select(col("vec_id").as("near_vid"))
      // box_id (l_linenumber) is NOT unique per track in the driver's
      // dirty-row generation — order by the full tuple so the lag
      // sequence is deterministic across engines (full duplicates may
      // still tie, but identical rows yield identical lag streams)
      val w = Window.partitionBy(col("frame_id")).orderBy(
        col("box_id"), col("x1"), col("y1"), col("x2"), col("y2"))
      def closeTo(c: String) = abs(col(c) - lag(col(c), 1).over(w)) < 0.3
      // r22 (VERDICT ask #1): the near join runs BELOW the frame
      // window — the r21 order (window by frame_id, then join by
      // vec_id, then aggregate by frame_id again) paid the frame_id
      // exchange twice because the vec_id join destroyed the window's
      // partitioning. Joining first (near_vid is unique — vec_id is
      // the embeddings PK — so the left join preserves the row set,
      // and the window sees identical rows either way) lets ONE
      // frame_id exchange serve both the window and the gate
      // aggregate: 4 corpus exchanges -> 3.
      val still = b.crossJoin(n)
        .withColumn("vec_id", col("face_id") % col("n_emb"))
        .join(near.withColumn("is_near", lit(1)),
          col("vec_id") === col("near_vid"), "left")
        .withColumn("rn", row_number().over(w))
        .withColumn("ok",
          when(lag(col("x1"), 1).over(w).isNull, 1)
            .when(closeTo("x1") && closeTo("y1") &&
              closeTo("x2") && closeTo("y2"), 1).otherwise(0))
      def firstBox(c: String) = max(when(col("rn") === 1, col(c))).as(c)
      still.groupBy(col("frame_id"))
        .agg(count(lit(1)).as("n_faces"), min(col("ok")).as("all_still"),
          max(coalesce(col("is_near"), lit(0))).as("has_near"),
          firstBox("x1"), firstBox("y1"), firstBox("x2"), firstBox("y2"))
        .filter(col("all_still") === 1 && col("has_near") === 1 &&
          col("n_faces") >= 2)
        .select(col("frame_id").as("track_id"), col("n_faces"),
          col("x1"), col("y1"), col("x2"), col("y2"))
        .orderBy("track_id")
    }),

    // E31: "Animated Rachel Maddow" (unused_queries.py:352-400) — the
    // animatedness score: mean weighted pose distance between
    // CONSECUTIVE poses of a track (wrists 0.4, nose 0.1, elbows
    // 0.05; keypoints with a zero confidence on either side excluded;
    // the norm-of-weighted-per-keypoint-norms shape, op-for-op),
    // tracks gated on containing a face inside the seed's distto<=1.0
    // ball, most animated first. Track := vec_id div 4 (e21/e24's
    // pose plane). Per-pair distances are rounded to integer micros
    // BEFORE the per-track mean so the cross-engine sum is exact (the
    // corpus cents convention); the pair arithmetic itself is one
    // fixed-order IEEE tree mirrored in the oracle. Scale: one
    // embeddings scan, 4-row window partitions, broadcast seed.
    "e31_animatedness" -> ((s, d) => {
      import graft.functions.Fns
      import graft.functions.Fns.Keypoints
      val e = Tables.embeddings(tune(s), d)
      val seed = broadcast(e.filter(col("vec_id") === 7L)
        .select(col("embedding").as("s_emb"),
          Fns.l2norm(col("embedding")).as("s_norm")))
      val kps = Keypoints.pose(col("embedding"))
      def xd(i: Int) = Keypoints.x(kps, i).cast("double")
      def yd(i: Int) = Keypoints.y(kps, i).cast("double")
      def sc(i: Int) = Keypoints.score(kps, i).cast("double")
      val kp = Seq(
        ("nose", Keypoints.Nose, 0.1), ("rw", Keypoints.RWrist, 0.4),
        ("lw", Keypoints.LWrist, 0.4), ("re", Keypoints.RElbow, 0.05),
        ("le", Keypoints.LElbow, 0.05))
      val p = e.crossJoin(seed).select(Seq(col("vec_id"),
        expr("vec_id div 4").as("track_id"),
        (lit(1.0) - Fns.dot(col("embedding"), col("s_emb")) /
          (Fns.l2norm(col("embedding")) * col("s_norm")) <= 1.0)
          .as("is_near")) ++
        kp.flatMap { case (nm, i, _) => Seq(xd(i).as(s"${nm}_x"),
          yd(i).as(s"${nm}_y"), sc(i).as(s"${nm}_s")) }: _*)
      val w = Window.partitionBy(col("track_id")).orderBy(col("vec_id"))
      def term(nm: String, wgt: Double): Column = {
        val dx = col(s"${nm}_x") - lag(col(s"${nm}_x"), 1).over(w)
        val dy = col(s"${nm}_y") - lag(col(s"${nm}_y"), 1).over(w)
        val d  = sqrt(dx * dx + dy * dy)
        when(lag(col(s"${nm}_s"), 1).over(w) > 0.0 && col(s"${nm}_s") > 0.0,
          (lit(wgt) * d) * (lit(wgt) * d)).otherwise(lit(0.0))
      }
      val wd = sqrt(term("nose", 0.1) + term("rw", 0.4) + term("lw", 0.4) +
        term("re", 0.05) + term("le", 0.05))
      p.withColumn("prev", lag(col("vec_id"), 1).over(w))
        .withColumn("micro", round(wd * 1e6).cast("long"))
        .groupBy(col("track_id"))
        .agg(sum(when(col("prev").isNotNull, col("micro"))).as("sum_micro"),
          count(when(col("prev").isNotNull, lit(1))).as("n_pairs"),
          max(when(col("is_near"), 1).otherwise(0)).as("has_near"))
        .filter(col("has_near") === 1 && col("n_pairs") > 0)
        .select(col("track_id"), col("n_pairs"),
          expr("sum_micro div n_pairs").as("score_micro"))
        .orderBy(col("score_micro").desc, col("track_id"))
    }),

    // E32: the sandbox hand-label timelines (sandbox_labels.py:4-64)
    // — three labeled interval planes (interviews / panels /
    // commercials), each fps-scaled from seconds to frame numbers
    // (the reference's F('fps') * F('start') annotation; fps := a
    // per-video residue), merged into one multi-plane timeline with
    // the widget's color tags. Pure narrow ops: three filters of one
    // events scan, a union, no shuffle until the output sort.
    "e32_sandbox_timelines" -> ((s, d) => {
      val base = ev(s, d)
      val fps = lit(24) + col("user_id") % 2 * 6
      def plane(typ: String, name: String, color: String) =
        base.filter(col("event_type") === typ)
          .select(col("user_id").as("video_id"), lit(name).as("plane"),
            lit(color).as("color"),
            (col("s") * fps).as("min_frame"), (col("e") * fps).as("max_frame"))
      plane("click", "interview", "default")
        .unionByName(plane("view", "panel", "blue"))
        .unionByName(plane("error", "commercial", "purple"))
        .orderBy("video_id", "plane", "min_frame", "max_frame")
    }),

    // E33: the introduction-detector notebook's evaluation macro
    // (introduction_detector.ipynb `compute_statistics`): temporal
    // precision/recall of a PROPOSED segment plane against the
    // hand-labeled ground truth — overlap seconds / proposal seconds
    // and / truth seconds, per video. Both planes coalesced first so
    // the pairwise clipped overlaps sum exactly to the intersection
    // measure; ratios emitted as integer ppm (the corpus exactness
    // convention). Distinct from a15's bbox-IoU detection P/R — this
    // is the notebook's interval-time statistic. Scale: two
    // single-exchange coalesces, one equi+band overlap join, three
    // co-keyed per-video aggregates.
    "e33_interval_pr" -> ((s, d) => {
      val base = ev(s, d)
      def plane(typ: String) = IntervalOps.coalesce(
        base.filter(col("event_type") === typ).select("user_id", "s", "e"), C)
      val prop = plane("error")
      val truth = plane("click")
      val p = prop.groupBy("user_id")
        .agg(sum(col("e") - col("s")).as("prop_sec"))
      val t = truth.groupBy("user_id")
        .agg(sum(col("e") - col("s")).as("truth_sec"))
      val tr = truth.select(col("user_id").as("t_uid"),
        col("s").as("ts"), col("e").as("te"))
      val inter = prop.join(tr, prop("user_id") === col("t_uid") &&
          col("ts") < prop("e") && col("te") > prop("s"))
        .select(prop("user_id"),
          (least(prop("e"), col("te")) - greatest(prop("s"), col("ts")))
            .as("ov"))
        .groupBy("user_id").agg(sum(col("ov")).as("inter_sec"))
      p.join(t, "user_id").join(inter, Seq("user_id"), "left")
        .withColumn("inter_sec", coalesce(col("inter_sec"), lit(0L)))
        .select(col("user_id").as("video_id"), col("prop_sec"),
          col("truth_sec"), col("inter_sec"),
          expr("inter_sec * 1000000 div prop_sec").as("precision_ppm"),
          expr("inter_sec * 1000000 div truth_sec").as("recall_ppm"))
        .orderBy("video_id")
    }),

    // E34: "get canonical shows" (get_canonical_shows.ipynb) — the
    // show x channel video-count + total-hours rollup that decides
    // which shows are canonical (enough volume to analyze). Video :=
    // order with a closed-form duration; show/channel := the
    // customer's nation/region names. Hours emitted as integer milli
    // (total_sec * 1000 div 3600). Scale: fact aggregates AFTER the
    // broadcast dimension joins, one shuffle on the (show, channel)
    // rollup key; the >= 10 canonicality floor prunes the output, not
    // the scan.
    "e34_canonical_shows" -> ((s, d) => {
      val ord = Tables.orders(tune(s), d).select(col("o_custkey"),
        (cents(col("o_totalprice")) % 86400).as("dur_sec"))
      val cust = Tables.customer(tune(s), d)
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = broadcast(Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_regionkey"),
          col("n_name").as("show_name")))
      val reg = broadcast(Tables.region(tune(s), d)
        .select(col("r_regionkey"), col("r_name").as("channel")))
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("show_name"), col("channel"))
        .agg(count(lit(1)).as("n_videos"), sum(col("dur_sec")).as("total_sec"))
        .filter(col("n_videos") >= 10)
        .select(col("show_name"), col("channel"), col("n_videos"),
          expr("total_sec * 1000 div 3600").as("hours_milli"))
        .orderBy(col("n_videos").desc, col("show_name"), col("channel"))
    }),

    // E35: topic-lexicon induction (the `mutual_info(topic)` step of
    // topic_analysis_workflow.ipynb / notebooks/topics/*; the
    // reference computes it inside its prebuilt Rust caption-index
    // utilities, so only the semantics are public): for a seed word,
    // score every candidate token by how much likelier it is inside
    // seed-bearing documents than in the corpus — the PMI ratio
    // P(t|seed docs)/P(t) emitted as integer ppm (a monotone
    // transform of log-PMI, so the ranking is the reference's without
    // cross-engine transcendentals). df floor 5, top 50. Scale: one
    // token-scan aggregate for corpus counts, one semi-join-restricted
    // aggregate for seed counts, 1-row broadcast totals; candidate
    // frame is vocabulary-sized before the TakeOrdered. The long
    // arithmetic holds to ~9e12 corpus tokens (cs<=1e6 per word x
    // 1e6 ppm); beyond that the ratio should move to cents-scaled
    // 128-bit or decimal.
    "e35_topic_lexicon" -> ((s, d) => {
      val tk = toks(s, d)
      val seedDocs = tk.filter(col("tok") === "customer")
        .select("doc_id").distinct()
      val seedToks = tk.join(seedDocs, Seq("doc_id"), "left_semi")
      val cc = tk.groupBy("tok").agg(count(lit(1)).as("cc"))
      val cs = seedToks.groupBy("tok").agg(count(lit(1)).as("cs"))
      val totals = broadcast(tk.agg(count(lit(1)).as("corpus_total"))
        .crossJoin(seedToks.agg(count(lit(1)).as("seed_total"))))
      cs.join(cc, "tok").crossJoin(totals)
        .filter(col("cc") >= 5 && col("tok") =!= "customer")
        .select(col("tok"),
          col("cs"), col("cc"),
          expr("cs * corpus_total * 1000000 div (cc * seed_total)")
            .as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("tok"))
        .limit(50)
    }),

    // E36: "caption mentions by show" (topics.py:149-177
    // get_caption_mentions_by_show, both modes in one row): a phrase's
    // occurrence count per document, rolled up to the video's
    // canonical show — n_mentions (location count) and n_videos (the
    // show_count mode's distinct-video count). Phrase hits are the
    // filter-first adjacency join (never a token self-join of the
    // full corpus); show := nation of the video key; the rollup runs
    // on the hit set, dimension joins broadcast.
    "e36_mentions_by_show" -> ((s, d) => {
      val tk = toks(s, d)
      val a = tk.filter(col("tok") === "slow")
        .select(col("doc_id"), col("pos"))
      val b = tk.filter(col("tok") === "scan")
        .select(col("doc_id").as("b_did"), col("pos").as("b_pos"))
      val hits = a.join(b, col("doc_id") === col("b_did") &&
          col("b_pos") === col("pos") + 1)
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      val nat = broadcast(Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_name").as("show_name")))
      hits.join(nat, col("doc_id") % 25 === col("n_nationkey"))
        .groupBy("show_name")
        .agg(sum(col("n_hits")).as("n_mentions"),
          count(lit(1)).as("n_videos"))
        .orderBy(col("n_mentions").desc, col("show_name"))
    }),

    // E37: the caption-index service's `find_segments` (problang/
    // transcript_utils.py:33-42, topic_analysis_workflow.ipynb: score
    // stride-aligned token windows by summed lexicon weights, keep
    // windows above threshold, merge_overlaps=False): window_size 50,
    // stride 10, threshold 3, a 5-word weighted lexicon. Spark-first
    // shape: lexicon hits are FILTERED FIRST (broadcast lexicon
    // join), then each hit explodes to the <= window/stride = 5
    // stride-aligned windows covering it, and one (doc, window)
    // aggregate scores everything — O(hits x 5) rows, never a
    // per-position sliding scan of the corpus.
    "e37_window_density" -> ((s, d) => {
      import s.implicits._
      val lexDf = broadcast(Seq(("customer", 2L), ("slow", 1L),
        ("scan", 1L), ("merge", 1L), ("window", 1L)).toDF("tok", "wgt"))
      val hits = toks(s, d).join(lexDf, "tok")
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("wgt"))
      hits
        .withColumn("w", explode(expr(
          "sequence(((greatest(p - 49, 0) + 9) div 10) * 10, (p div 10) * 10, 10)")))
        .groupBy(col("doc_id"), col("w"))
        .agg(sum(col("wgt")).as("score"))
        .filter(col("score") >= 3)
        .select(col("doc_id"), col("w").as("seg_start"),
          (col("w") + 50).as("seg_end"), col("score"))
        .orderBy("doc_id", "seg_start")
    }),

    // E38: the senator-search sweep (senator_search.ipynb: per-name
    // caption_search -> video-id sets -> per-show counts), SERVED: one
    // pruned postings read covers the whole entity list's vocabulary
    // (N names -> <= N of 64 bucket dirs), distinct docs per entity,
    // show rollup through the broadcast dimension. The reference
    // loops caption_search per senator; here the whole list is one
    // scan — the batch-entity shape a 100-name sweep needs at 100 TB.
    "e38_entity_mentions" -> ((s, d) => {
      import graft.text.PhraseSearch
      val dir = Q.memoIndex("phidx", d)(dir =>
        PhraseSearch.writeIndex(toks(s, d), dir, nBuckets = 64))
      val ents = Seq("customer", "slow", "merge")
      val hits = PhraseSearch.servedPostings(s, dir, ents)
        .filter(col("tok").isin(ents: _*))
        .select(col("tok").as("entity"), col("doc_id")).distinct()
      val nat = broadcast(Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_name").as("show_name")))
      hits.join(nat, col("doc_id") % 25 === col("n_nationkey"))
        .groupBy("entity", "show_name")
        .agg(count(lit(1)).as("n_videos"))
        .orderBy(col("entity"), col("n_videos").desc, col("show_name"))
    }),

    // E39: "topic time by show" (topics.py:187-208
    // get_topic_time_by_show) — total seconds of topic segments per
    // canonical show, with the reference's ZERO-FILL over the major
    // show list (it emits every MAJOR_CANONICAL_SHOWS key, 0 when the
    // topic never airs there). Segments are e10's: coalesced view
    // tracks overlapping a topic-bucket click. The zero-fill is a
    // LEFT join FROM the broadcast show dimension — the
    // dimension-complete rollup shape.
    "e39_topic_time_by_show" -> ((s, d) => {
      val ev = evHour(s, d)
      val segs = IntervalOps.coalesce(
        ev.filter(col("event_type") === "view").select("user_id", "s", "e"), C)
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 3600
      val things = raw.filter(col("event_type") === "click")
        .select(col("user_id").as("th_uid"), sec.as("th_s"),
          (sec + floor(col("value")).cast("long") + 1).as("th_e"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")
            .as("thing_key"))
        .filter(col("thing_key") % 10 === 7)
      val topicSec = segs.join(things,
          segs("user_id") === col("th_uid") &&
            col("th_s") < segs("e") && col("th_e") > segs("s"), "left_semi")
        .withColumn("show_key", col("user_id") % 25)
        .groupBy("show_key")
        .agg(sum(col("e") - col("s")).as("sec"))
      // the aggregated topic side is show-keyed (dimension-sized), so
      // IT is the broadcast side of the zero-fill left join (the
      // preserved dimension can't broadcast)
      Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_name").as("show_name"))
        .join(broadcast(topicSec), col("n_nationkey") === col("show_key"),
          "left")
        .select(col("show_name"),
          coalesce(col("sec"), lit(0L)).as("topic_sec"))
        .orderBy("show_name")
    }),

    // E40: "overlap between topics" (topics.py:75-147
    // get_overlap_between_topics) — two topics' coalesced segment
    // planes intersected per video, rolled up to the corpus-level
    // overlap fractions the reference reports (overlap / topic-A
    // time, / topic-B time, as integer ppm). Completes topics.py:
    // :75-147 here, :149-177 e36, :187-208 e39. Same 100 TB shape as
    // e33: two single-exchange coalesces, one equi+band overlap join,
    // map-side partial sums into a 1-row result.
    "e40_topic_overlap" -> ((s, d) => {
      val ev = evHour(s, d)
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 3600
      val things = raw.filter(col("event_type") === "click")
        .select(col("user_id").as("th_uid"), sec.as("th_s"),
          (sec + floor(col("value")).cast("long") + 1).as("th_e"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")
            .as("thing_key"))
      def topicSegs(bucket: Int) = IntervalOps.coalesce(
        ev.filter(col("event_type") === "view").select("user_id", "s", "e")
          .join(things.filter(col("thing_key") % 10 === bucket),
            col("user_id") === col("th_uid") &&
              col("th_s") < col("e") && col("th_e") > col("s"), "left_semi"),
        C)
      val a = topicSegs(7)
      val b = topicSegs(3)
        .select(col("user_id").as("b_uid"), col("s").as("bs"),
          col("e").as("be"))
      val ov = a.join(b, a("user_id") === col("b_uid") &&
          col("bs") < a("e") && col("be") > a("s"))
        .select((least(a("e"), col("be")) - greatest(a("s"), col("bs")))
          .as("sec"))
        .agg(coalesce(sum(col("sec")), lit(0L)).as("overlap_sec"))
      val ta = a.agg(sum(col("e") - col("s")).as("a_sec"))
      val tb = b.agg(sum(col("be") - col("bs")).as("b_sec"))
      ov.crossJoin(ta).crossJoin(tb)
        .select(col("overlap_sec"), col("a_sec"), col("b_sec"),
          expr("overlap_sec * 1000000 div a_sec").as("frac_a_ppm"),
          expr("overlap_sec * 1000000 div b_sec").as("frac_b_ppm"))
    }),

    // E41: host-probability annotation (spark_util.py:275-345
    // get_host_probs) — identity sightings above the labeler
    // threshold annotated is_host by membership in the CHANNEL's
    // host set (the reference's 'looser definition' fallback: a
    // channel's hosts = the union of its shows' annotated hosts),
    // rolled up per show. The reference collects the host sets to
    // driver dicts and wraps them in a UDF; Spark-first this is a
    // derived bridge dimension (show -> channel -> host pairs,
    // distinct) LEFT-joined broadcast — no UDF, no driver loop, and
    // the host set can be millions of rows before it stops
    // broadcasting. Show/channel := the customer nation/region chain.
    "e41_host_annotation" -> ((s, d) => {
      val nat = Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val showHosts = nat.select(col("n_regionkey").as("ch_key"),
        concat(lit("Brand#"), ((col("n_nationkey") % 5) + 1).cast("string"),
          ((col("n_nationkey") % 3) + 1).cast("string")).as("host_identity"))
      val chanHosts = broadcast(showHosts.distinct())
      val idf = faces(s, d).join(
          broadcast(Tables.part(tune(s), d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_suppkey") % 100 > 25)
        .select(col("face_id"), col("frame_id"), col("p_brand").as("identity"))
      val ord = Tables.orders(tune(s), d)
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(tune(s), d)
        .select(col("c_custkey"), col("c_nationkey"))
      idf.join(ord, col("frame_id") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(chanHosts, col("n_regionkey") === col("ch_key") &&
          col("identity") === col("host_identity"), "left")
        .withColumn("is_host",
          when(col("host_identity").isNotNull, 1L).otherwise(0L))
        .withColumn("show_name", col("n_name"))
        .groupBy("show_name")
        .agg(count(lit(1)).as("n_faces"), sum(col("is_host")).as("n_host_faces"))
        .select(col("show_name"), col("n_faces"), col("n_host_faces"),
          expr("n_host_faces * 1000000 div n_faces").as("host_ppm"))
        .orderBy("show_name")
    }),

    // E42: "person X says phrase Y on camera" (rekall_query.py:320-345
    // get_person_phrase_intervals — the supercuts.ipynb headline
    // macro): person-presence intervals ∩ phrase-caption intervals
    // clipped to the intersection, kept only where the clip overlaps
    // a shot with EXACTLY one face (the num_face=1 solo-shot gate).
    // Three planes: person := coalesced high-probability identity
    // track, phrase := props-matched caption instants, shots :=
    // coalesced shot islands with a correlated face count. Scale:
    // two single-exchange coalesces, every join equi-on-video first
    // with band residuals, the face count a co-keyed left-join
    // aggregate — no plane ever crosses videos.
    "e42_person_phrase" -> ((s, d) => {
      val ev = evHour(s, d)
      val raw = Tables.events(tune(s), d)
      val sec = tsSec(raw) % 3600
      val person = IntervalOps.coalesce(
        ev.filter(col("event_type") === "click" && col("k") > 70)
          .select("user_id", "s", "e"), C)
      val phrase = raw
        .filter(col("event_type") === "view" && col("props").contains("3"))
        .select(col("user_id").as("p_uid"), sec.as("ps"),
          (sec + floor(col("value")).cast("long") + 1).as("pe"))
      val said = person.join(phrase,
          person("user_id") === col("p_uid") &&
            col("ps") < person("e") && col("pe") > person("s"))
        .select(person("user_id"),
          greatest(person("s"), col("ps")).as("cs"),
          least(person("e"), col("pe")).as("ce"))
      val shots = IntervalOps.coalesce(
        ev.filter(col("event_type") === "error").select("user_id", "s", "e"), C)
      val faceInstants = raw.filter(col("event_type") === "signup")
        .select(col("user_id").as("f_uid"), sec.as("fs"))
      val soloShots = shots.join(faceInstants,
          shots("user_id") === col("f_uid") &&
            col("fs") >= shots("s") && col("fs") < shots("e"), "left")
        .groupBy(shots("user_id"), shots("s"), shots("e"))
        .agg(count(col("f_uid")).as("n_face"))
        .filter(col("n_face") === 1)
        .select(col("user_id").as("sh_uid"),
          col("s").as("shs"), col("e").as("she"))
      said.join(soloShots, col("user_id") === col("sh_uid") &&
          col("cs") < col("she") && col("ce") > col("shs"), "left_semi")
        .select(col("user_id"), col("cs"), col("ce"))
        .orderBy("user_id", "cs", "ce")
    }),

    // E43: the FaceIdentityModel calibration ledger (identity.py:
    // 55-121 — exp_positives_by_bucket / get_face_ids_above_threshold,
    // the reference's weak-supervision identity-labeling workflow):
    // faces bucketed by 0.05 cosine distance to the seed, per-bucket
    // PRECISION estimated from the hand-labeled subsample (vec_id%7
    // residue; positive iff inside the 0.45 ball — the synthetic
    // ground truth both engines recompute), expected positives =
    // bucket size x precision, and the model's accept flag on
    // buckets clearing the 0.5 precision floor. Distinct from t61
    // (classifier-confidence calibration): this is the
    // distance-bucket x sampled-precision ledger that decides which
    // faces commit to the identity table. One corpus scan; every
    // aggregate is bucket-keyed.
    "e43_identity_model" -> ((s, d) => {
      import graft.functions.Fns
      val e = Tables.embeddings(tune(s), d)
      val seed = broadcast(e.filter(col("vec_id") === 7L)
        .select(col("embedding").as("s_emb"),
          Fns.l2norm(col("embedding")).as("s_norm")))
      e.filter(col("vec_id") =!= 7L).crossJoin(seed)
        .withColumn("dist", lit(1.0) -
          Fns.dot(col("embedding"), col("s_emb")) /
            (Fns.l2norm(col("embedding")) * col("s_norm")))
        .withColumn("bucket", floor(col("dist") / 0.05).cast("int"))
        .withColumn("is_labeled", col("vec_id") % 7 === 0)
        .withColumn("is_pos", col("dist") <= 0.45)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_faces"),
          sum(when(col("is_labeled"), 1L).otherwise(0L)).as("n_labeled"),
          sum(when(col("is_labeled") && col("is_pos"), 1L).otherwise(0L))
            .as("n_pos"))
        .withColumn("precision_ppm",
          when(col("n_labeled") === 0, 0L)
            .otherwise(expr("n_pos * 1000000 div n_labeled")))
        .withColumn("exp_pos_micro", col("n_faces") * col("precision_ppm"))
        .withColumn("accepted", (col("precision_ppm") >= 500000L).cast("int"))
        .orderBy("bucket")
    }),

    // E44: agglomerative meta-clustering (identity_clusters.py:51-91
    // _recluster_clusters: merge clusters whose centroids sit within
    // the threshold, transitively) — integer-Lloyd centroids (exact
    // cross-engine), centroid pairs under the integer squared-L2
    // threshold form the merge graph, and the meta-cluster is the
    // connected component's min cell (9 min-label propagation rounds
    // cover any component diameter over k=10 nodes; both engines
    // unroll the same rounds, and both reach the true closure).
    // Scale: the pair join and the propagation are k^2 = dimension-
    // sized; the corpus appears only in the final per-meta member
    // count, one co-keyed aggregate.
    "e44_meta_clusters" -> ((s, d) => {
      val e = Tables.embeddings(tune(s), d)
      val (asg, ctr) = graft.similarity.IntKMeans.fit(e, 10, 2)
      // r21: every frame in the merge-graph loop is k-sized (k = 10
      // cells) but sits behind a localCheckpoint leaf whose stats are
      // unknown, so the planner defaulted to shuffle joins — each of
      // the 9 rounds paid several exchange stages for 10-row tables.
      // Explicit broadcast() on the k-sized sides is the deliberate
      // strategy (guide §3.1) and is scale-correct by construction:
      // these tables are dimension-sized (k, k^2), never corpus-sized.
      val a = ctr.select(col("cell").as("ca"), col("c").as("va"))
      val b = ctr.select(col("cell").as("cb"), col("c").as("vb"))
      val edges = a.join(broadcast(b), col("ca") < col("cb"))
        // centroid arrays carry integer VALUES (truncated means) in a
        // double container — the fold is exact far below 2^53, and
        // the BIGINT cast lands on the same integer as the oracle's
        // all-BIGINT fold
        .withColumn("d2", expr(
          "CAST(aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), " +
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS BIGINT)"))
        .filter(col("d2") < 8000L)
        .select(col("ca"), col("cb"))
      // each round references the previous label table TWICE (its own
      // row + the neighbor min), so un-truncated lineage doubles per
      // round — the rolled local checkpoint keeps the iterated plan
      // linear, exactly as the Lloyd loop itself does
      val (und0, undPin) = graft.util.Checkpoints.roll(
        edges.unionByName(
          edges.select(col("cb").as("ca"), col("ca").as("cb"))), None)
      val und = und0
      var (lbl, pin) = graft.util.Checkpoints.roll(
        ctr.select(col("cell"), col("cell").as("meta")), None)
      (1 to 9).foreach { _ =>
        val nbr = und.join(broadcast(lbl.select(col("cell").as("cb"),
            col("meta").as("nm"))), "cb")
          .groupBy(col("ca").as("cell")).agg(min(col("nm")).as("nbr_min"))
        val next = lbl.join(broadcast(nbr), Seq("cell"), "left")
          .select(col("cell"),
            least(col("meta"), coalesce(col("nbr_min"), col("meta")))
              .as("meta"))
        val (l2, p2) = graft.util.Checkpoints.roll(next, pin)
        lbl = l2; pin = p2
      }
      undPin.foreach(_.unpersist(blocking = false))
      // the FINAL label pin (and fit's assignment pin behind `asg`)
      // deliberately stay persisted here: the returned frame is lazy
      // and localCheckpoint blocks have no lineage to recompute from,
      // so an in-query unpersist would free data the consumer's
      // action still needs. Cleanup is the consumer's
      // post-materialization Checkpoints.sweep (Verify and Bench both
      // run it per query).
      asg.select(col("cell")).join(broadcast(lbl), "cell")
        .groupBy(col("meta"))
        .agg(countDistinct(col("cell")).as("n_cells"),
          count(lit(1)).as("n_vectors"))
        .orderBy("meta")
    }),

    // E45: the headline screen-time gender-share analysis (the
    // gender.ipynb / report.py figure the reference system was built
    // to produce): per show, male/female face-time seconds, the
    // female share, and a 95% Wilson interval treating seconds as
    // trials. Totals are integer-exact; the share and interval bounds
    // are ONE fixed float expression tree per show row, mirrored
    // op-for-op in the oracle and rounded to 1e-6 (the corpus
    // per-row-IEEE convention — no cross-engine sums of floats).
    // Scale: one events scan, per-(show, gender) map-side partial
    // sums, a 25-row result.
    "e45_gender_screen_share" -> ((s, d) => {
      val ev = evHour(s, d)
      val byShow = ev.filter(col("event_type").isin("click", "view"))
        .withColumn("show_key", col("user_id") % 25)
        .groupBy(col("show_key"))
        .agg(sum(when(col("event_type") === "click", col("e") - col("s"))
            .otherwise(0L)).as("m_sec"),
          sum(when(col("event_type") === "view", col("e") - col("s"))
            .otherwise(0L)).as("f_sec"))
      val nat = broadcast(Tables.nation(tune(s), d)
        .select(col("n_nationkey"), col("n_name").as("show_name")))
      val z = 1.959963984540054
      val n = (col("m_sec") + col("f_sec")).cast("double")
      val p = col("f_sec").cast("double") / n
      val denom = lit(1.0) + lit(z * z) / n
      val center = p + lit(z * z) / (lit(2.0) * n)
      val rad = lit(z) * sqrt(p * (lit(1.0) - p) / n +
        lit(z * z) / (lit(4.0) * n * n))
      byShow.join(nat, col("show_key") === col("n_nationkey"))
        .filter(col("m_sec") + col("f_sec") > 0)
        .select(col("show_name"), col("m_sec"), col("f_sec"),
          round(p, 6).as("f_share6"),
          round((center - rad) / denom, 6).as("wilson_lo6"),
          round((center + rad) / denom, 6).as("wilson_hi6"))
        .orderBy("show_name")
    })
  )

  // ------------------------------------------------------------------
  // Oracles
  // ------------------------------------------------------------------

  private def idtSql =
    s"""SELECT user_id, event_type AS identity, s AS id_s, e AS id_e, k
       |FROM (${evHourSql()}) h WHERE event_type IN ('click','view')""".stripMargin

  /** coalesceSql over the hour-wrapped track (same island pattern as
    * Q.coalesceSql, which is keyed to evSql's column names). */
  private def coalesceHourSql(src: String, extraAggs: String = ""): String =
    s"""SELECT user_id, min(s) AS s, max(e) AS e$extraAggs FROM (
       |  SELECT *, CAST(sum(isnew) OVER (PARTITION BY user_id ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp FROM (
       |    SELECT *, CASE WHEN runmax IS NULL OR s > runmax THEN 1 ELSE 0 END AS isnew FROM (
       |      SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
       |      FROM ($src) iv) m) g) gg
       |GROUP BY user_id, grp""".stripMargin

  private val vecSumsq =
    """list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |  list_transform(EMB, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |  (a, x) -> a + x)""".stripMargin
  private def sumsq(e: String) = vecSumsq.replace("EMB", e)
  private def dotOf(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (a, x) -> a + x)""".stripMargin

  /** e13's `[merging]` family as a SQL IN-list literal (the words are
    * plain lowercase tokens — no quoting hazards). */
  private val mergingFam =
    graft.text.Inflect.expand("merging").map(w => s"'$w'").mkString(", ")

  /** e18/e22's oracle body: the stories macro replayed step-for-step
    * (keys, dilate, key deoverlap, gap-8 island over keys ∪ contexts
    * with is_key carried, key-bearing islands only, min length). */
  private val storySegmentsSql =
    s"""WITH tk AS ($toksSql),
       |k1 AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM tk
       |       WHERE tok = 'customer'),
       |k2 AS (SELECT a.doc_id, a.pos AS s, a.pos + 2 AS e FROM tk a
       |       JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |       WHERE a.tok = 'slow' AND b.tok = 'scan'),
       |kd AS (SELECT doc_id, greatest(s - 5, 0) AS s, e + 5 AS e
       |       FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2) ku),
       |keys AS (${Q.coalesceSql("SELECT * FROM kd", key = "doc_id")}),
       |u AS (SELECT doc_id, s, e, 1 AS is_key FROM keys
       |      UNION ALL
       |      SELECT doc_id, pos AS s, pos + 1 AS e, 0 AS is_key FROM tk
       |      WHERE tok IN ('merge', 'window')),
       |g AS (SELECT doc_id, s, e, is_key,
       |    CAST(sum(isnew) OVER (PARTITION BY doc_id ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS grp
       |  FROM (SELECT *, CASE WHEN runmax IS NULL OR s > runmax + 8
       |          THEN 1 ELSE 0 END AS isnew
       |        FROM (SELECT *, max(e) OVER (PARTITION BY doc_id
       |                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
       |                AND 1 PRECEDING) AS runmax
       |              FROM u) m) gg),
       |seg AS (SELECT doc_id, min(s) AS s, max(e) AS e,
       |          max(is_key) AS has_key,
       |          CAST(sum(is_key) AS BIGINT) AS n_key_spans
       |        FROM g GROUP BY doc_id, grp)
       |SELECT doc_id, s, e, n_key_spans FROM seg
       |WHERE has_key = 1 AND e - s >= 12
       |ORDER BY doc_id, s""".stripMargin

  /** Shared e14/e15 scoring CTE: exact cosine of every non-target
    * vector to vec 7 (v01's arithmetic verbatim). */
  private val simSql =
    s"""t AS (SELECT embedding AS q_emb, sqrt(${sumsq("embedding")}) AS qn
       |      FROM embeddings WHERE vec_id = 7),
       |c AS (SELECT vec_id, embedding, sqrt(${sumsq("embedding")}) AS nrm
       |      FROM embeddings),
       |sim AS (SELECT c.vec_id,
       |          ${dotOf("c.embedding", "t.q_emb")} / (c.nrm * t.qn) AS cos
       |        FROM c, t WHERE c.vec_id <> 7)""".stripMargin

  val oracle: Map[String, String] = Map(

    "e06_two_identities" ->
      s"""WITH sh AS (${coalesceHourSql(
           s"SELECT user_id, s, e FROM (${evHourSql("error")}) er")}),
         |idt AS ($idtSql),
         |b2 AS (
         |  SELECT sh.user_id, sh.s, sh.e FROM sh
         |  WHERE EXISTS (SELECT 1 FROM idt WHERE idt.user_id = sh.user_id
         |    AND idt.identity = 'click' AND idt.k > 70
         |    AND idt.id_s < sh.e AND idt.id_e > sh.s)
         |  AND EXISTS (SELECT 1 FROM idt WHERE idt.user_id = sh.user_id
         |    AND idt.identity = 'view' AND idt.k > 70
         |    AND idt.id_s < sh.e AND idt.id_e > sh.s))
         |SELECT b.user_id AS video_id, b.s AS shot_s, b.e AS shot_e,
         |  i.identity, i.id_s, i.id_e, i.k AS prob_c
         |FROM b2 b JOIN idt i ON i.user_id = b.user_id
         |  AND i.id_s < b.e AND i.id_e > b.s
         |ORDER BY 1, 2, 3, 4, 5, 6, 7""".stripMargin,

    "e07_two_women_frames" ->
      s"""WITH f AS (SELECT *,
         |    CASE WHEN box_id % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
         |    frame_id % 7 = 0 AS in_commercial FROM ($boxesSql) b),
         |fq AS (SELECT * FROM f WHERE gender = 'F' AND NOT in_commercial),
         |fr AS (SELECT frame_id FROM fq GROUP BY 1 HAVING count(*) = 2),
         |st AS (SELECT frame_id, row_number() OVER (ORDER BY frame_id) AS rn
         |       FROM fr)
         |SELECT fq.frame_id, fq.box_id, fq.x1, fq.x2, fq.y1, fq.y2
         |FROM fq JOIN st ON st.frame_id = fq.frame_id
         |WHERE st.rn % 10 = 1 AND st.rn <= 1000
         |ORDER BY 1, 2""".stripMargin,

    "e08_white_hair_not_bald" ->
      s"""WITH face AS ($facesSql),
         |white AS (SELECT face_id,
         |    row_number() OVER (ORDER BY face_id) AS rn
         |  FROM face WHERE l_partkey % 5 = 0),
         |ws AS (SELECT face_id FROM white WHERE rn % 100 = 1),
         |bald AS (SELECT face_id FROM face WHERE l_suppkey % 11 = 0),
         |keep AS (SELECT ws.face_id FROM ws
         |  WHERE NOT EXISTS (SELECT 1 FROM bald WHERE bald.face_id = ws.face_id))
         |SELECT b.frame_id, b.box_id, b.x1, b.x2, b.y1, b.y2
         |FROM ($boxesSql) b
         |JOIN keep k ON k.face_id = b.frame_id*10 + b.box_id
         |ORDER BY 1, 2""".stripMargin,

    "e09_sunday_morning_shows" ->
      """SELECT user_id AS video_id, count(*) AS n_events,
        |  min(sec) AS first_s, max(sec) AS last_s
        |FROM (SELECT user_id, epoch_ns(ts)//1000000000 AS sec FROM events) t
        |WHERE (sec // 86400 + 4) % 7 = 0
        |  AND (sec % 86400) // 3600 BETWEEN 6 AND 11
        |  AND user_id % 5 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e10_topic_segments" ->
      s"""WITH sg AS (${coalesceHourSql(
           s"SELECT user_id, s, e, k FROM (${evHourSql("view")}) vw",
           ", CAST(sum(k) AS BIGINT) AS pol_c, count(*) AS n")}),
         |th AS (SELECT user_id,
         |    (epoch_ns(ts)//1000000000) % 3600 AS th_s,
         |    (epoch_ns(ts)//1000000000) % 3600
         |      + CAST(floor(value) AS BIGINT) + 1 AS th_e,
         |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS thing_key
         |  FROM events WHERE event_type = 'click')
         |SELECT sg.user_id AS video_id, sg.s, sg.e, sg.n,
         |  (sg.pol_c * 1000) // sg.n AS polarity_milli
         |FROM sg WHERE EXISTS (SELECT 1 FROM th WHERE th.user_id = sg.user_id
         |  AND th.thing_key % 10 = 7 AND th.th_s < sg.e AND th.th_e > sg.s)
         |ORDER BY polarity_milli DESC, video_id, s""".stripMargin,

    "e11_panels" ->
      s"""WITH f AS (SELECT * FROM ($boxesSql) b
         |  WHERE y2 - y1 >= 0.25 AND frame_id % 7 != 0),
         |fr AS (SELECT frame_id FROM f GROUP BY 1
         |       HAVING count(*) = 3 AND max(y1) - min(y1) <= 0.05)
         |SELECT f.frame_id, f.box_id, f.x1, f.x2, f.y1, f.y2
         |FROM f JOIN fr ON fr.frame_id = f.frame_id
         |ORDER BY 1, 2""".stripMargin,

    "e12_identity_gender" ->
      s"""WITH face AS ($facesSql),
         |sel AS (SELECT face.face_id FROM face
         |  JOIN part p ON p.p_partkey = face.l_partkey
         |  WHERE p.p_brand = 'Brand#1' AND face.l_suppkey % 100 >= 90)
         |SELECT CASE WHEN box_id % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
         |  count(*) AS n_faces
         |FROM face WHERE face_id IN (SELECT face_id FROM sel)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e16_identity_clothing" ->
      s"""WITH face AS ($facesSql),
         |sel AS (SELECT face.face_id, string_split(p.p_type, ' ')[1] AS clothing
         |        FROM face JOIN part p ON p.p_partkey = face.l_partkey
         |        WHERE p.p_brand = 'Brand#1' AND face.l_suppkey % 100 >= 90),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY clothing
         |          ORDER BY face_id) AS rnk,
         |        count(*) OVER (PARTITION BY clothing) AS n_faces FROM sel)
         |SELECT clothing, CAST(n_faces AS BIGINT) AS n_faces, face_id,
         |  CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY clothing, rnk""".stripMargin,

    "e17_untagged_videos" ->
      """WITH tagged AS (SELECT DISTINCT user_id FROM events
        |  WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) = 37),
        |vids AS (SELECT user_id AS video_id, count(*) AS n_frames
        |         FROM events GROUP BY 1),
        |un AS (SELECT * FROM vids
        |       WHERE video_id NOT IN (SELECT user_id FROM tagged)),
        |st AS (SELECT *, row_number() OVER (ORDER BY video_id) AS rn FROM un)
        |SELECT video_id, CAST(0 AS BIGINT) AS min_frame,
        |  n_frames - 1 AS max_frame
        |FROM st WHERE rn % 3 = 1 AND rn <= 1000
        |ORDER BY video_id""".stripMargin,

    // e13: the unquoted phrase is a position-adjacency join; the
    // [merging] family is the SAME literal word list Inflect.expand
    // bakes (deterministic/sorted), so both engines match
    // byte-identical vocabularies
    "e13_caption_search" ->
      s"""WITH tk AS ($toksSql),
         |d1 AS (SELECT DISTINCT a.doc_id FROM tk a JOIN tk b
         |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |  WHERE a.tok = 'slow' AND b.tok = 'scan'),
         |d2 AS (SELECT DISTINCT doc_id FROM tk WHERE tok IN ($mergingFam)),
         |hits AS (SELECT tk.doc_id, tk.pos FROM tk
         |  WHERE tok IN ($mergingFam)
         |    AND doc_id IN (SELECT doc_id FROM d1)
         |    AND doc_id IN (SELECT doc_id FROM d2)),
         |fps AS (SELECT doc_id, 24 + doc_id % 6 AS fps FROM documents)
         |SELECT h.doc_id, (h.pos - 7) * f.fps AS min_frame,
         |  (h.pos + 1) * f.fps AS max_frame
         |FROM hits h JOIN fps f ON f.doc_id = h.doc_id
         |ORDER BY h.doc_id, h.pos LIMIT 100""".stripMargin,

    // e18/e22: the gap-8 island over keys ∪ contexts replayed with
    // the is_key flag carried through the island window (the
    // coalesceSql pattern widened by one column); the served e22 must
    // be indistinguishable from the in-process e18 — same SQL (the
    // index is a layout, not a semantics change)
    "e18_story_segments" -> storySegmentsSql,
    "e22_served_stories" -> storySegmentsSql,

    // e19: identity/shot/other-face relational steps are plain SQL;
    // the cluster assignment replays v12's integer-Lloyd chain
    // (SimilarityQueries.lloydCtes — hashed-id seeds, truncated
    // integer means, ties to the lower cell)
    "e19_other_people" ->
      s"""WITH face AS ($facesSql),
         |sel AS (SELECT face.face_id, face.frame_id FROM face
         |        JOIN part p ON p.p_partkey = face.l_partkey
         |        WHERE p.p_brand = 'Brand#1' AND face.l_suppkey % 100 >= 95),
         |others AS (SELECT f.face_id FROM face f
         |           WHERE f.l_partkey % 100 > 10
         |             AND f.frame_id IN (SELECT frame_id FROM sel)
         |             AND f.face_id NOT IN (SELECT face_id FROM sel)),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_emb FROM embeddings),
         |${SimilarityQueries.qvCte},
         |${SimilarityQueries.lloydCtes(10)},
         |sc AS (SELECT o.face_id, a.cell AS cluster
         |       FROM others o CROSS JOIN nv
         |       JOIN af a ON a.vec_id = o.face_id % nv.n_emb),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY cluster
         |          ORDER BY face_id) AS rnk,
         |        count(*) OVER (PARTITION BY cluster) AS n_faces FROM sc)
         |SELECT cluster, CAST(n_faces AS BIGINT) AS n_faces, face_id,
         |  CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 10
         |ORDER BY n_faces DESC, cluster, rnk""".stripMargin,

    // e20: per-seed cosine distances (the v01 fold arithmetic,
    // mirrored op-for-op), group-min per candidate, pos/neg gate,
    // 0.05 buckets
    "e20_multi_seed_knn" ->
      s"""WITH sd AS (SELECT embedding AS s_emb,
         |              sqrt(${sumsq("embedding")}) AS s_norm,
         |              vec_id IN (3, 11, 19) AS is_pos
         |            FROM embeddings WHERE vec_id IN (3, 11, 19, 5, 13)),
         |c AS (SELECT vec_id, embedding,
         |        sqrt(${sumsq("embedding")}) AS nrm FROM embeddings
         |      WHERE vec_id NOT IN (3, 11, 19, 5, 13)),
         |ds AS (SELECT c.vec_id,
         |    min(CASE WHEN is_pos THEN
         |      1.0 - ${dotOf("c.embedding", "sd.s_emb")} / (c.nrm * sd.s_norm)
         |      END) AS d_pos,
         |    min(CASE WHEN NOT is_pos THEN
         |      1.0 - ${dotOf("c.embedding", "sd.s_emb")} / (c.nrm * sd.s_norm)
         |      END) AS d_neg
         |  FROM c, sd GROUP BY 1),
         |b AS (SELECT vec_id, d_pos,
         |        CAST(floor(d_pos / 0.05) AS INT) AS bucket
         |      FROM ds WHERE d_pos <= 0.8 AND d_pos < d_neg),
         |r AS (SELECT *,
         |        CAST(row_number() OVER (PARTITION BY bucket
         |          ORDER BY d_pos, vec_id) AS INT) AS rnk,
         |        count(*) OVER (PARTITION BY bucket) AS n_in_bucket FROM b)
         |SELECT bucket * 5 AS dist_lo_centi,
         |  CAST(n_in_bucket AS BIGINT) AS n_in_bucket, vec_id, rnk,
         |  round(d_pos, 6) AS dist6
         |FROM r WHERE rnk <= 5 ORDER BY 1, 4""".stripMargin,

    // e23: per-frame gendered pair with the strict-left predicate;
    // lowest (m_box, f_box) per frame, then the frame stride
    "e23_man_left_of_woman" ->
      s"""WITH b AS (SELECT *,
         |    CASE WHEN box_id % 2 = 0 THEN 'F' ELSE 'M' END AS gender
         |  FROM ($boxesSql) bb WHERE y2 - y1 > 0.3),
         |p AS (SELECT m.frame_id, m.box_id AS m_box, f.box_id AS f_box
         |      FROM b m JOIN b f ON f.frame_id = m.frame_id
         |      WHERE m.gender = 'M' AND f.gender = 'F' AND m.x2 < f.x1),
         |fst AS (SELECT *, row_number() OVER (PARTITION BY frame_id
         |          ORDER BY m_box, f_box) AS rn FROM p),
         |q AS (SELECT frame_id, m_box, f_box FROM fst WHERE rn = 1),
         |st AS (SELECT *, row_number() OVER (ORDER BY frame_id) AS fr FROM q)
         |SELECT frame_id, m_box, f_box FROM st
         |WHERE fr % 10 = 1 AND fr <= 100000
         |ORDER BY frame_id""".stripMargin,

    // e24: the trig-free sitting predicate replayed on raw keypoint
    // reads (LHip=11 -> x[34]/y[35], LKnee=12 -> x[37]/y[38],
    // RHip=8 -> x[25]/y[26], RKnee=9 -> x[28]/y[29]; 1-based)
    "e24_people_sitting" ->
      """WITH p AS (SELECT vec_id, vec_id // 4 AS frame_id,
        |    CAST(embedding[37] AS DOUBLE) - CAST(embedding[34] AS DOUBLE) AS ldx,
        |    -(CAST(embedding[38] AS DOUBLE) - CAST(embedding[35] AS DOUBLE)) AS lvy,
        |    CAST(embedding[28] AS DOUBLE) - CAST(embedding[25] AS DOUBLE) AS rdx,
        |    -(CAST(embedding[29] AS DOUBLE) - CAST(embedding[26] AS DOUBLE)) AS rvy
        |  FROM embeddings),
        |s AS (SELECT vec_id, frame_id,
        |    ((lvy > 0) OR (ldx < 0 AND lvy < 0
        |       AND -lvy < -ldx * 0.8390996311772799))
        |    OR ((rvy > 0) OR (rdx < 0 AND rvy < 0
        |       AND -rvy < -rdx * 0.8390996311772799)) AS sitting
        |  FROM p),
        |fr AS (SELECT DISTINCT frame_id FROM s WHERE frame_id % 3 = 0),
        |st AS (SELECT frame_id, row_number() OVER (ORDER BY frame_id) AS fr
        |       FROM fr)
        |SELECT s.frame_id, s.vec_id FROM s
        |JOIN st ON st.frame_id = s.frame_id
        |WHERE s.sitting AND st.fr % 10 = 1 AND st.fr <= 100000
        |ORDER BY 1, 2""".stripMargin,

    // e25: midpoint-distance NOT EXISTS on both-labeler frames, first
    // 100 qualifying frames
    "e25_labeler_disagreement" ->
      s"""WITH b AS (SELECT *,
         |    CASE WHEN box_id % 3 = 0 THEN 'handlabeled' ELSE 'mtcnn' END
         |      AS labeler,
         |    (x1 + x2) / 2 AS mx, (y1 + y2) / 2 AS my
         |  FROM ($boxesSql) bb),
         |b2 AS (SELECT frame_id FROM b GROUP BY 1
         |  HAVING max(CASE WHEN labeler = 'handlabeled' THEN 1 ELSE 0 END) = 1
         |     AND max(CASE WHEN labeler = 'mtcnn' THEN 1 ELSE 0 END) = 1),
         |hl AS (SELECT * FROM b WHERE labeler = 'handlabeled'
         |       AND (x2 - x1) * (y2 - y1) >= 0.02
         |       AND frame_id IN (SELECT frame_id FROM b2)),
         |mis AS (SELECT hl.* FROM hl
         |  WHERE NOT EXISTS (SELECT 1 FROM b o
         |    WHERE o.labeler = 'mtcnn' AND o.frame_id = hl.frame_id
         |      AND (hl.mx - o.mx) * (hl.mx - o.mx)
         |        + (hl.my - o.my) * (hl.my - o.my) < 0.01)),
         |top AS (SELECT frame_id,
         |          row_number() OVER (ORDER BY frame_id) AS fr
         |        FROM (SELECT DISTINCT frame_id FROM mis) dm)
         |SELECT m.frame_id, m.box_id, m.x1, m.x2, m.y1, m.y2
         |FROM mis m JOIN top t ON t.frame_id = m.frame_id
         |WHERE t.fr <= 100
         |ORDER BY 1, 2""".stripMargin,

    // e26: the host pick, its side/height gate, the all-others flag
    // aggregate — every float predicate mirrored op-for-op (the ratio
    // division kept as a division, not a multiply)
    "e26_host_still_face" ->
      s"""WITH face AS ($facesSql),
         |b AS ($boxesSql),
         |hostids AS (SELECT face.frame_id AS h_fid, face.box_id AS h_box
         |  FROM face JOIN part p ON p.p_partkey = face.l_partkey
         |  WHERE p.p_brand = 'Brand#1' AND face.l_suppkey % 100 > 80),
         |hb0 AS (SELECT b.*, row_number() OVER (PARTITION BY b.frame_id
         |          ORDER BY b.box_id, b.x1, b.x2, b.y1, b.y2) AS rn
         |        FROM b WHERE EXISTS (SELECT 1 FROM hostids h
         |          WHERE h.h_fid = b.frame_id AND h.h_box = b.box_id)),
         |hostbox AS (SELECT frame_id AS hb_fid, x1 AS hx1, x2 AS hx2,
         |              y1 AS hy1, y2 AS hy2
         |            FROM hb0 WHERE rn = 1
         |              AND (x1 > 0.5 OR x2 < 0.5) AND y2 - y1 > 0.2),
         |others AS (SELECT b.*, hb.hx1, hb.hx2, hb.hy1, hb.hy2
         |  FROM b JOIN hostbox hb ON hb.hb_fid = b.frame_id
         |  WHERE NOT EXISTS (SELECT 1 FROM hostids h
         |    WHERE h.h_fid = b.frame_id AND h.h_box = b.box_id)),
         |gate AS (SELECT frame_id FROM (
         |    SELECT frame_id, count(*) AS n,
         |      max(CASE WHEN (hx2 < 0.5 AND x2 < 0.5)
         |            OR (hx1 > 0.5 AND x1 > 0.5) THEN 1 ELSE 0 END) AS ss,
         |      max(CASE WHEN (hy2 - hy1) / (y2 - y1) < 1.2
         |            THEN 1 ELSE 0 END) AS tb,
         |      max(CASE WHEN y2 - y1 >= 0.1 THEN 1 ELSE 0 END) AS tl
         |    FROM others GROUP BY 1) g
         |  WHERE n <= 2 AND ss = 0 AND tb = 0 AND tl = 1)
         |SELECT b.frame_id, b.box_id, b.x1, b.x2, b.y1, b.y2
         |FROM b WHERE b.frame_id IN (SELECT frame_id FROM gate)
         |ORDER BY 1, 2""".stripMargin,

    // e21: the f07 fixed keypoint layout read raw (pose block leads
    // the array; y of keypoint i = element 3i+2, 1-based)
    "e21_pose_pair" ->
      """WITH p AS (SELECT vec_id, vec_id // 4 AS frame_id,
        |    embedding[2] AS nose_y, embedding[23] AS lw_y,
        |    embedding[14] AS rw_y
        |  FROM embeddings),
        |f AS (SELECT * FROM p WHERE lw_y < nose_y AND rw_y < nose_y),
        |fr AS (SELECT frame_id FROM f GROUP BY 1 HAVING count(*) >= 2),
        |st AS (SELECT frame_id, row_number() OVER (ORDER BY frame_id) AS rn
        |       FROM fr)
        |SELECT f.frame_id, f.vec_id, f.nose_y, f.lw_y, f.rw_y
        |FROM f JOIN st ON st.frame_id = f.frame_id
        |WHERE st.rn % 10 = 1 AND st.rn <= 100000
        |ORDER BY 1, 2""".stripMargin,

    "e14_face_search" ->
      s"""WITH $simSql,
         |r AS (SELECT vec_id, cos,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
         |  FROM sim WHERE 1.0 - cos <= 0.8)
         |SELECT vec_id, rank, round(cos, 6) AS cos6
         |FROM r WHERE (rank - 1) % 3 = 0 ORDER BY rank""".stripMargin,

    "e15_face_distance_groups" ->
      s"""WITH $simSql,
         |b AS (SELECT vec_id, cos,
         |    CAST(floor((1.0 - cos) / 0.05) AS INT) AS bucket FROM sim),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY bucket
         |      ORDER BY cos DESC, vec_id) AS INT) AS rnk,
         |    count(*) OVER (PARTITION BY bucket) AS n_in_bucket FROM b)
         |SELECT bucket * 5 AS dist_lo_centi,
         |  CAST(n_in_bucket AS BIGINT) AS n_in_bucket, vec_id, rnk,
         |  round(cos, 6) AS cos6
         |FROM r WHERE rnk <= 5 ORDER BY 1, 4""".stripMargin,

    // e27: identity filter -> show dimension chain -> per-show window
    "e27_identity_across_shows" ->
      s"""WITH face AS ($facesSql),
         |idf AS (SELECT face.face_id, face.frame_id FROM face
         |        JOIN part p ON p.p_partkey = face.l_partkey
         |        WHERE p.p_brand = 'Brand#13' AND face.l_suppkey % 100 > 90),
         |sh AS (SELECT i.face_id, n.n_name AS show_name FROM idf i
         |       JOIN orders o ON o.o_orderkey = i.frame_id
         |       JOIN customer c ON c.c_custkey = o.o_custkey
         |       JOIN nation n ON n.n_nationkey = c.c_nationkey),
         |r AS (SELECT *, row_number() OVER (PARTITION BY show_name
         |          ORDER BY face_id) AS rnk,
         |        count(*) OVER (PARTITION BY show_name) AS n_faces FROM sh)
         |SELECT show_name, CAST(n_faces AS BIGINT) AS n_faces, face_id,
         |  CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 10
         |ORDER BY show_name, rnk""".stripMargin,

    // e28: e20's per-seed distance fold with the exclusion gate —
    // inside the positive ceiling AND outside every exclusion ball
    "e28_face_search_exclusions" ->
      s"""WITH sd AS (SELECT embedding AS s_emb,
         |              sqrt(${sumsq("embedding")}) AS s_norm,
         |              vec_id = 7 AS is_pos
         |            FROM embeddings WHERE vec_id IN (7, 2, 23)),
         |c AS (SELECT vec_id, embedding,
         |        sqrt(${sumsq("embedding")}) AS nrm FROM embeddings
         |      WHERE vec_id NOT IN (7, 2, 23) AND vec_id % 10 <> 0),
         |ds AS (SELECT c.vec_id,
         |    min(CASE WHEN is_pos THEN
         |      1.0 - ${dotOf("c.embedding", "sd.s_emb")} / (c.nrm * sd.s_norm)
         |      END) AS d_pos,
         |    min(CASE WHEN NOT is_pos THEN
         |      1.0 - ${dotOf("c.embedding", "sd.s_emb")} / (c.nrm * sd.s_norm)
         |      END) AS d_excl
         |  FROM c, sd GROUP BY 1)
         |SELECT vec_id,
         |  CAST(row_number() OVER (ORDER BY d_pos, vec_id) AS INT) AS rnk,
         |  round(d_pos, 6) AS dist6
         |FROM ds WHERE d_pos <= 0.6 AND d_excl > 0.4
         |ORDER BY rnk""".stripMargin,

    // e29: the qualifying-face aggregate joined to the one video's
    // tracks (the correlated-count EXISTS chain, relationally)
    "e29_talking_head_tracks" ->
      s"""WITH b AS ($boxesSql),
         |q AS (SELECT frame_id, count(*) AS n_heads,
         |        min(box_id) AS first_box, max(box_id) AS last_box
         |      FROM b WHERE box_id % 3 <> 0 AND y2 - y1 >= 0.3
         |      GROUP BY 1)
         |SELECT o.o_orderkey AS track_id, o.o_custkey AS video_id,
         |  q.n_heads, q.first_box, q.last_box
         |FROM orders o JOIN q ON q.frame_id = o.o_orderkey
         |WHERE o.o_custkey % 100 = 17
         |ORDER BY track_id""".stripMargin,

    // e30: lag-window closeness conjunction, the modulo vector link's
    // EXISTS gate, arg_min first-box payload
    "e30_still_face_tracks" ->
      s"""WITH b AS (SELECT bb.*, frame_id * 10 + box_id AS face_id
         |           FROM ($boxesSql) bb),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_emb FROM embeddings),
         |sd AS (SELECT embedding AS s_emb,
         |         sqrt(${sumsq("embedding")}) AS s_norm
         |       FROM embeddings WHERE vec_id = 7),
         |nr AS (SELECT e.vec_id FROM embeddings e, sd
         |       WHERE 1.0 - ${dotOf("e.embedding", "sd.s_emb")}
         |         / (sqrt(${sumsq("e.embedding")}) * sd.s_norm) <= 1.0),
         |lg AS (SELECT b.*, row_number() OVER w AS rn,
         |        lag(x1) OVER w AS p_x1, lag(y1) OVER w AS p_y1,
         |        lag(x2) OVER w AS p_x2, lag(y2) OVER w AS p_y2
         |       FROM b WINDOW w AS (PARTITION BY frame_id
         |         ORDER BY box_id, x1, y1, x2, y2)),
         |ok AS (SELECT *, CASE WHEN p_x1 IS NULL THEN 1
         |         WHEN abs(x1 - p_x1) < 0.3 AND abs(y1 - p_y1) < 0.3
         |           AND abs(x2 - p_x2) < 0.3 AND abs(y2 - p_y2) < 0.3 THEN 1
         |         ELSE 0 END AS still FROM lg),
         |g AS (SELECT frame_id AS track_id, count(*) AS n_faces,
         |        min(still) AS all_still,
         |        max(CASE WHEN face_id % (SELECT n_emb FROM nv)
         |              IN (SELECT vec_id FROM nr) THEN 1 ELSE 0 END)
         |          AS has_near,
         |        max(CASE WHEN rn = 1 THEN x1 END) AS x1,
         |        max(CASE WHEN rn = 1 THEN y1 END) AS y1,
         |        max(CASE WHEN rn = 1 THEN x2 END) AS x2,
         |        max(CASE WHEN rn = 1 THEN y2 END) AS y2
         |      FROM ok GROUP BY 1)
         |SELECT track_id, n_faces, x1, y1, x2, y2 FROM g
         |WHERE all_still = 1 AND has_near = 1 AND n_faces >= 2
         |ORDER BY track_id""".stripMargin,

    // e31: the weighted pose-distance tree replayed on raw keypoint
    // reads (x/y/score of kp i at elements 3i+1/3i+2/3i+3, 1-based;
    // nose=0, r-elbow=3, r-wrist=4, l-elbow=6, l-wrist=7), rounded to
    // micros per pair before the integer-exact per-track mean
    "e31_animatedness" -> {
      val kpIdx = Seq(("nose", 0), ("rw", 4), ("lw", 7), ("re", 3), ("le", 6))
      val cols = kpIdx.map { case (nm, i) =>
        s"""CAST(embedding[${3 * i + 1}] AS DOUBLE) AS ${nm}_x,
           |    CAST(embedding[${3 * i + 2}] AS DOUBLE) AS ${nm}_y,
           |    CAST(embedding[${3 * i + 3}] AS DOUBLE) AS ${nm}_s""".stripMargin
      }.mkString(",\n    ")
      val lags = kpIdx.map { case (nm, _) =>
        s"""lag(${nm}_x) OVER w AS p_${nm}_x,
           |    lag(${nm}_y) OVER w AS p_${nm}_y,
           |    lag(${nm}_s) OVER w AS p_${nm}_s""".stripMargin
      }.mkString(",\n    ")
      def term(nm: String, wgt: String) =
        s"""CASE WHEN p_${nm}_s > 0.0 AND ${nm}_s > 0.0 THEN
           |      ($wgt * sqrt((${nm}_x - p_${nm}_x) * (${nm}_x - p_${nm}_x)
           |        + (${nm}_y - p_${nm}_y) * (${nm}_y - p_${nm}_y)))
           |      * ($wgt * sqrt((${nm}_x - p_${nm}_x) * (${nm}_x - p_${nm}_x)
           |        + (${nm}_y - p_${nm}_y) * (${nm}_y - p_${nm}_y)))
           |      ELSE 0.0 END""".stripMargin
      s"""WITH sd AS (SELECT embedding AS s_emb,
         |         sqrt(${sumsq("embedding")}) AS s_norm
         |       FROM embeddings WHERE vec_id = 7),
         |p AS (SELECT vec_id, vec_id // 4 AS track_id,
         |    1.0 - ${dotOf("e.embedding", "sd.s_emb")}
         |      / (sqrt(${sumsq("e.embedding")}) * sd.s_norm) <= 1.0 AS is_near,
         |    $cols
         |  FROM embeddings e, sd),
         |lg AS (SELECT *, lag(vec_id) OVER w AS prev,
         |    $lags
         |  FROM p WINDOW w AS (PARTITION BY track_id ORDER BY vec_id)),
         |m AS (SELECT *, CAST(round(sqrt(
         |    ${term("nose", "0.1")}
         |    + ${term("rw", "0.4")}
         |    + ${term("lw", "0.4")}
         |    + ${term("re", "0.05")}
         |    + ${term("le", "0.05")}) * 1000000.0, 0) AS BIGINT) AS micro
         |  FROM lg),
         |g AS (SELECT track_id,
         |        CAST(sum(CASE WHEN prev IS NOT NULL THEN micro END)
         |          AS BIGINT) AS sum_micro,
         |        count(CASE WHEN prev IS NOT NULL THEN 1 END) AS n_pairs,
         |        max(CASE WHEN is_near THEN 1 ELSE 0 END) AS has_near
         |      FROM m GROUP BY 1)
         |SELECT track_id, n_pairs, sum_micro // n_pairs AS score_micro
         |FROM g WHERE has_near = 1 AND n_pairs > 0
         |ORDER BY score_micro DESC, track_id""".stripMargin
    },

    // e33: both planes island-coalesced, pairwise clipped overlap
    // summed per video, integer-ppm ratios
    "e33_interval_pr" ->
      s"""WITH pr AS (${Q.coalesceSql(Q.evSql("error"))}),
         |tr AS (${Q.coalesceSql(Q.evSql("click"))}),
         |p AS (SELECT user_id, CAST(sum(e - s) AS BIGINT) AS prop_sec
         |      FROM pr GROUP BY 1),
         |t AS (SELECT user_id, CAST(sum(e - s) AS BIGINT) AS truth_sec
         |      FROM tr GROUP BY 1),
         |iv AS (SELECT pr.user_id,
         |    CAST(sum(least(pr.e, tr.e) - greatest(pr.s, tr.s)) AS BIGINT)
         |      AS inter_sec
         |  FROM pr JOIN tr ON tr.user_id = pr.user_id
         |    AND tr.s < pr.e AND tr.e > pr.s
         |  GROUP BY 1)
         |SELECT p.user_id AS video_id, p.prop_sec, t.truth_sec,
         |  CAST(coalesce(iv.inter_sec, 0) AS BIGINT) AS inter_sec,
         |  coalesce(iv.inter_sec, 0) * 1000000 // p.prop_sec AS precision_ppm,
         |  coalesce(iv.inter_sec, 0) * 1000000 // t.truth_sec AS recall_ppm
         |FROM p JOIN t ON t.user_id = p.user_id
         |LEFT JOIN iv ON iv.user_id = p.user_id
         |ORDER BY video_id""".stripMargin,

    // e34: the same rollup through the dimension chain; hours as
    // integer milli
    "e34_canonical_shows" ->
      """WITH v AS (SELECT o_custkey,
        |    CAST(round(o_totalprice*100,0) AS BIGINT) % 86400 AS dur_sec
        |  FROM orders),
        |g AS (SELECT n.n_name AS show_name, r.r_name AS channel,
        |    count(*) AS n_videos, CAST(sum(v.dur_sec) AS BIGINT) AS total_sec
        |  FROM v JOIN customer c ON c.c_custkey = v.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  GROUP BY 1, 2)
        |SELECT show_name, channel, n_videos,
        |  total_sec * 1000 // 3600 AS hours_milli
        |FROM g WHERE n_videos >= 10
        |ORDER BY n_videos DESC, show_name, channel""".stripMargin,

    // e35: corpus/seed token counts, the ppm PMI ratio in the same
    // integer-div order
    "e35_topic_lexicon" ->
      s"""WITH tk AS ($toksSql),
         |sd AS (SELECT DISTINCT doc_id FROM tk WHERE tok = 'customer'),
         |st AS (SELECT tk.* FROM tk WHERE tk.doc_id IN (SELECT doc_id FROM sd)),
         |cc AS (SELECT tok, count(*) AS cc FROM tk GROUP BY 1),
         |cs AS (SELECT tok, count(*) AS cs FROM st GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tk)
         |            AS corpus_total,
         |          (SELECT CAST(count(*) AS BIGINT) FROM st) AS seed_total)
         |SELECT cs.tok, CAST(cs.cs AS BIGINT) AS cs, CAST(cc.cc AS BIGINT) AS cc,
         |  cs.cs * tot.corpus_total * 1000000 // (cc.cc * tot.seed_total)
         |    AS score_ppm
         |FROM cs JOIN cc ON cc.tok = cs.tok CROSS JOIN tot
         |WHERE cc.cc >= 5 AND cs.tok <> 'customer'
         |ORDER BY score_ppm DESC, cs.tok LIMIT 50""".stripMargin,

    // e36: filter-first adjacency hits, per-doc counts, show rollup
    "e36_mentions_by_show" ->
      s"""WITH tk AS ($toksSql),
         |h AS (SELECT a.doc_id, count(*) AS n_hits
         |      FROM (SELECT doc_id, pos FROM tk WHERE tok = 'slow') a
         |      JOIN (SELECT doc_id, pos FROM tk WHERE tok = 'scan') b
         |        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |      GROUP BY 1)
         |SELECT n.n_name AS show_name,
         |  CAST(sum(h.n_hits) AS BIGINT) AS n_mentions,
         |  count(*) AS n_videos
         |FROM h JOIN nation n ON n.n_nationkey = h.doc_id % 25
         |GROUP BY 1 ORDER BY n_mentions DESC, show_name""".stripMargin,

    // e37: same hit-to-covering-windows expansion, same integer
    // stride arithmetic
    "e37_window_density" ->
      s"""WITH tk AS ($toksSql),
         |lex AS (SELECT * FROM (VALUES ('customer', 2), ('slow', 1),
         |          ('scan', 1), ('merge', 1), ('window', 1)) l(tok, wgt)),
         |h AS (SELECT tk.doc_id, CAST(tk.pos AS BIGINT) AS p,
         |        CAST(l.wgt AS BIGINT) AS wgt
         |      FROM tk JOIN lex l ON l.tok = tk.tok),
         |wins AS (SELECT doc_id, wgt, unnest(generate_series(
         |    ((greatest(p - 49, 0) + 9) // 10) * 10,
         |    (p // 10) * 10, 10)) AS w FROM h)
         |SELECT doc_id, w AS seg_start, w + 50 AS seg_end,
         |  CAST(sum(wgt) AS BIGINT) AS score
         |FROM wins GROUP BY 1, 2 HAVING sum(wgt) >= 3
         |ORDER BY doc_id, seg_start""".stripMargin,

    // e38: distinct docs per entity, show rollup (the index is a
    // layout — plain token semantics in the oracle)
    "e38_entity_mentions" ->
      s"""WITH tk AS ($toksSql),
         |h AS (SELECT DISTINCT tok AS entity, doc_id FROM tk
         |      WHERE tok IN ('customer', 'slow', 'merge'))
         |SELECT h.entity, n.n_name AS show_name, count(*) AS n_videos
         |FROM h JOIN nation n ON n.n_nationkey = h.doc_id % 25
         |GROUP BY 1, 2
         |ORDER BY entity, n_videos DESC, show_name""".stripMargin,

    // e39: e10's segment gate, per-show totals, LEFT-join zero fill
    // from the show dimension
    "e39_topic_time_by_show" ->
      s"""WITH sg AS (${coalesceHourSql(
           s"SELECT user_id, s, e FROM (${evHourSql("view")}) vw")}),
         |th AS (SELECT user_id,
         |    (epoch_ns(ts)//1000000000) % 3600 AS th_s,
         |    (epoch_ns(ts)//1000000000) % 3600
         |      + CAST(floor(value) AS BIGINT) + 1 AS th_e,
         |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS thing_key
         |  FROM events WHERE event_type = 'click'),
         |ts AS (SELECT sg.user_id % 25 AS show_key,
         |    CAST(sum(sg.e - sg.s) AS BIGINT) AS sec
         |  FROM sg WHERE EXISTS (SELECT 1 FROM th
         |    WHERE th.user_id = sg.user_id AND th.thing_key % 10 = 7
         |      AND th.th_s < sg.e AND th.th_e > sg.s)
         |  GROUP BY 1)
         |SELECT n.n_name AS show_name,
         |  CAST(coalesce(ts.sec, 0) AS BIGINT) AS topic_sec
         |FROM nation n LEFT JOIN ts ON ts.show_key = n.n_nationkey
         |ORDER BY show_name""".stripMargin,

    // e40: two topic planes, clipped intersection sum, corpus-level
    // ppm fractions
    "e40_topic_overlap" -> {
      def segs(bucket: Int, nm: String) = coalesceHourSql(
        s"""SELECT vw.user_id, vw.s, vw.e
           |FROM (SELECT user_id, s, e FROM (${evHourSql("view")}) v0) vw
           |WHERE EXISTS (SELECT 1 FROM th
           |  WHERE th.user_id = vw.user_id AND th.thing_key % 10 = $bucket
           |    AND th.th_s < vw.e AND th.th_e > vw.s)""".stripMargin)
      s"""WITH th AS (SELECT user_id,
         |    (epoch_ns(ts)//1000000000) % 3600 AS th_s,
         |    (epoch_ns(ts)//1000000000) % 3600
         |      + CAST(floor(value) AS BIGINT) + 1 AS th_e,
         |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS thing_key
         |  FROM events WHERE event_type = 'click'),
         |a AS (${segs(7, "a")}),
         |b AS (${segs(3, "b")}),
         |ov AS (SELECT CAST(coalesce(sum(
         |    least(a.e, b.e) - greatest(a.s, b.s)), 0) AS BIGINT)
         |      AS overlap_sec
         |  FROM a JOIN b ON b.user_id = a.user_id
         |    AND b.s < a.e AND b.e > a.s),
         |ta AS (SELECT CAST(sum(e - s) AS BIGINT) AS a_sec FROM a),
         |tb AS (SELECT CAST(sum(e - s) AS BIGINT) AS b_sec FROM b)
         |SELECT ov.overlap_sec, ta.a_sec, tb.b_sec,
         |  ov.overlap_sec * 1000000 // ta.a_sec AS frac_a_ppm,
         |  ov.overlap_sec * 1000000 // tb.b_sec AS frac_b_ppm
         |FROM ov, ta, tb""".stripMargin
    },

    // e41: the derived show->channel->host bridge, the left-join
    // membership flag, the per-show rollup
    "e41_host_annotation" ->
      s"""WITH face AS ($facesSql),
         |sh AS (SELECT n_regionkey AS ch_key,
         |         'Brand#' || CAST((n_nationkey % 5) + 1 AS VARCHAR)
         |           || CAST((n_nationkey % 3) + 1 AS VARCHAR)
         |           AS host_identity
         |       FROM nation),
         |ch AS (SELECT DISTINCT ch_key, host_identity FROM sh),
         |idf AS (SELECT face.face_id, face.frame_id,
         |          p.p_brand AS identity
         |        FROM face JOIN part p ON p.p_partkey = face.l_partkey
         |        WHERE face.l_suppkey % 100 > 25),
         |w AS (SELECT i.identity, n.n_name AS show_name, n.n_regionkey
         |      FROM idf i
         |      JOIN orders o ON o.o_orderkey = i.frame_id
         |      JOIN customer c ON c.c_custkey = o.o_custkey
         |      JOIN nation n ON n.n_nationkey = c.c_nationkey),
         |g AS (SELECT w.show_name, count(*) AS n_faces,
         |        CAST(sum(CASE WHEN ch.host_identity IS NOT NULL
         |          THEN 1 ELSE 0 END) AS BIGINT) AS n_host_faces
         |      FROM w LEFT JOIN ch ON ch.ch_key = w.n_regionkey
         |        AND ch.host_identity = w.identity
         |      GROUP BY 1)
         |SELECT show_name, n_faces, n_host_faces,
         |  n_host_faces * 1000000 // n_faces AS host_ppm
         |FROM g ORDER BY show_name""".stripMargin,

    // e42: person ∩ phrase clipped, solo-shot EXISTS gate
    "e42_person_phrase" ->
      s"""WITH per AS (${coalesceHourSql(
           s"SELECT user_id, s, e FROM (${evHourSql("click")}) c WHERE k > 70")}),
         |ph AS (SELECT user_id AS p_uid,
         |    (epoch_ns(ts)//1000000000) % 3600 AS ps,
         |    (epoch_ns(ts)//1000000000) % 3600
         |      + CAST(floor(value) AS BIGINT) + 1 AS pe
         |  FROM events WHERE event_type = 'view' AND props LIKE '%3%'),
         |said AS (SELECT per.user_id, greatest(per.s, ph.ps) AS cs,
         |    least(per.e, ph.pe) AS ce
         |  FROM per JOIN ph ON ph.p_uid = per.user_id
         |    AND ph.ps < per.e AND ph.pe > per.s),
         |sh AS (${coalesceHourSql(
           s"SELECT user_id, s, e FROM (${evHourSql("error")}) er")}),
         |fi AS (SELECT user_id AS f_uid,
         |    (epoch_ns(ts)//1000000000) % 3600 AS fs
         |  FROM events WHERE event_type = 'signup'),
         |solo AS (SELECT sh.user_id, sh.s, sh.e FROM sh
         |  LEFT JOIN fi ON fi.f_uid = sh.user_id
         |    AND fi.fs >= sh.s AND fi.fs < sh.e
         |  GROUP BY 1, 2, 3 HAVING count(fi.f_uid) = 1)
         |SELECT sd.user_id, sd.cs, sd.ce FROM said sd
         |WHERE EXISTS (SELECT 1 FROM solo o
         |  WHERE o.user_id = sd.user_id AND sd.cs < o.e AND sd.ce > o.s)
         |ORDER BY 1, 2, 3""".stripMargin,

    // e43: the same distance-bucket x sampled-precision ledger; the
    // v01 cosine fold mirrored op-for-op
    "e43_identity_model" ->
      s"""WITH sd AS (SELECT embedding AS s_emb,
         |         sqrt(${sumsq("embedding")}) AS s_norm
         |       FROM embeddings WHERE vec_id = 7),
         |c AS (SELECT e.vec_id,
         |    1.0 - ${dotOf("e.embedding", "sd.s_emb")}
         |      / (sqrt(${sumsq("e.embedding")}) * sd.s_norm) AS dist
         |  FROM embeddings e, sd WHERE e.vec_id <> 7),
         |b AS (SELECT CAST(floor(dist / 0.05) AS INT) AS bucket,
         |        vec_id % 7 = 0 AS is_labeled, dist <= 0.45 AS is_pos
         |      FROM c),
         |g AS (SELECT bucket, count(*) AS n_faces,
         |        CAST(sum(CASE WHEN is_labeled THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_labeled,
         |        CAST(sum(CASE WHEN is_labeled AND is_pos THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_pos
         |      FROM b GROUP BY 1)
         |SELECT bucket, n_faces, n_labeled, n_pos,
         |  CASE WHEN n_labeled = 0 THEN 0
         |    ELSE n_pos * 1000000 // n_labeled END AS precision_ppm,
         |  n_faces * (CASE WHEN n_labeled = 0 THEN 0
         |    ELSE n_pos * 1000000 // n_labeled END) AS exp_pos_micro,
         |  CAST(CASE WHEN (CASE WHEN n_labeled = 0 THEN 0
         |    ELSE n_pos * 1000000 // n_labeled END) >= 500000
         |    THEN 1 ELSE 0 END AS INT) AS accepted
         |FROM g ORDER BY bucket""".stripMargin,

    // e44: the same centroid merge graph + 9 unrolled min-label
    // rounds over the v12 integer-Lloyd chain
    "e44_meta_clusters" -> {
      def l2iSql(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  list_transform(list_zip($a, $b),
           |    p -> (p[1] - p[2]) * (p[1] - p[2]))),
           |  (a, x) -> a + x)""".stripMargin
      // MATERIALIZED: each round references the previous one twice —
      // an inlining planner would otherwise expand 2^9 copies of the
      // Lloyd chain (the SQL twin of the Spark side's rolled
      // checkpoints)
      val rounds = (1 to 9).map { k =>
        s"""l$k AS MATERIALIZED (SELECT l.cell,
           |  CASE WHEN m.nbr IS NULL OR l.meta <= m.nbr THEN l.meta
           |    ELSE m.nbr END AS meta
           |  FROM l${k - 1} l LEFT JOIN (
           |    SELECT u.ca AS cell, min(p.meta) AS nbr
           |    FROM und u JOIN l${k - 1} p ON p.cell = u.cb GROUP BY 1) m
           |  ON m.cell = l.cell)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${SimilarityQueries.qvCte},
         |${SimilarityQueries.lloydCtes(10)},
         |ed AS MATERIALIZED (SELECT x.cell AS ca, y.cell AS cb
         |       FROM c2 x JOIN c2 y ON x.cell < y.cell
         |       WHERE ${l2iSql("x.c", "y.c")} < 8000),
         |und AS MATERIALIZED (
         |  SELECT ca, cb FROM ed UNION ALL SELECT cb, ca FROM ed),
         |l0 AS MATERIALIZED (SELECT cell, cell AS meta FROM c2),
         |$rounds
         |SELECT l9.meta, count(DISTINCT a.cell) AS n_cells,
         |  count(*) AS n_vectors
         |FROM af a JOIN l9 ON l9.cell = a.cell
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // e45: identical Wilson tree — every float op in the same order,
    // rounded to 1e-6
    "e45_gender_screen_share" -> {
      val z = "1.959963984540054"
      val n = "CAST(m_sec + f_sec AS DOUBLE)"
      val p = s"CAST(f_sec AS DOUBLE) / $n"
      val denom = s"1.0 + ($z * $z) / $n"
      val center = s"$p + ($z * $z) / (2.0 * $n)"
      val rad = s"$z * sqrt($p * (1.0 - $p) / $n " +
        s"+ ($z * $z) / (4.0 * $n * $n))"
      s"""WITH g AS (SELECT user_id % 25 AS show_key,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN e - s
         |      ELSE 0 END) AS BIGINT) AS m_sec,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN e - s
         |      ELSE 0 END) AS BIGINT) AS f_sec
         |  FROM (${evHourSql()}) ev
         |  WHERE event_type IN ('click', 'view')
         |  GROUP BY 1)
         |SELECT n.n_name AS show_name, g.m_sec, g.f_sec,
         |  round($p, 6) AS f_share6,
         |  round(($center - $rad) / ($denom), 6) AS wilson_lo6,
         |  round(($center + $rad) / ($denom), 6) AS wilson_hi6
         |FROM g JOIN nation n ON n.n_nationkey = g.show_key
         |WHERE g.m_sec + g.f_sec > 0
         |ORDER BY show_name""".stripMargin
    },

    // e32: three fps-scaled label planes unioned with the widget tags
    "e32_sandbox_timelines" ->
      s"""WITH ev AS (${Q.evSql()})
         |SELECT user_id AS video_id,
         |  CASE event_type WHEN 'click' THEN 'interview'
         |    WHEN 'view' THEN 'panel' ELSE 'commercial' END AS plane,
         |  CASE event_type WHEN 'click' THEN 'default'
         |    WHEN 'view' THEN 'blue' ELSE 'purple' END AS color,
         |  s * (24 + user_id % 2 * 6) AS min_frame,
         |  e * (24 + user_id % 2 * 6) AS max_frame
         |FROM ev WHERE event_type IN ('click', 'view', 'error')
         |ORDER BY video_id, plane, min_frame, max_frame""".stripMargin
  )
}
