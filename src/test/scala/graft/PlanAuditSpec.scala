package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Plan-shape regression guards: the properties that matter at 1000
  * executors are visible in the physical plan at any SF, so assert
  * them on sf0.001. A change that silently turns a broadcast join
  * into a sort-merge join, or moves the bloom prune above the
  * shuffle, fails here rather than in a 100 TB bill. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final physical plan with AQE off, so every operator is a plain
    * node (query-stage wrappers hide subtrees from collect). AQE must
    * be disabled AFTER the query builder runs — Q.tune re-enables it —
    * and planning is lazy, so the toggle still lands before collect. */
  private def executed(mk: => DataFrame): SparkPlan = {
    val df = mk
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("j01 keeps its three broadcast dimension joins (no sort-merge)") {
    val plan = executed(SparkEntry.queries("j01_equi_join_agg")(spark, sf))
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(bhj.size === 3, s"expected 3 broadcast joins, got ${bhj.size}")
    assert(smj.isEmpty, "dimension join degraded to sort-merge")
  }

  test("j01 scan is pruned to the columns the query touches") {
    val plan = executed(SparkEntry.queries("j01_equi_join_agg")(spark, sf))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // lineitem is 16 columns wide; the query needs a handful
    val widest = scans.map(_.schema.size).max
    assert(widest <= 6, s"scan reads $widest columns - pruning regressed")
  }

  test("t26 bloom prune filters the probe side BELOW the first exchange") {
    val plan = executed(SparkEntry.queries("t26_bloom_decontam")(spark, sf))
    val bloomFilters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "might_contain filter missing from plan")
    // at least one bloom filter sits directly over the scan with no
    // shuffle beneath it: the prune is map-side
    val mapSide = bloomFilters.exists { f =>
      f.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(mapSide, "bloom prune runs after a shuffle - the point was map-side")
  }

  test("t21 bloom prune (marking direction) is map-side too") {
    val plan = executed(SparkEntry.queries("t21_decontaminate")(spark, sf))
    val bloomFilters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "might_contain filter missing from plan")
    val mapSide = bloomFilters.exists { f =>
      f.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(mapSide, "bloom prune runs after a shuffle - the point was map-side")
  }

  test("t29 span removal stays columnar (no per-token explode)") {
    // the round-6 rewrite: the only Generates in the plan are the
    // shingle posexplodes inside island detection (output s/sh; the
    // un-cached dup-sid self-join evaluates it on both sides). A
    // Generate emitting `tok` means someone re-introduced the
    // full-corpus token explode whose collect_list rebuild was 33.5 s
    // and O(doc length) per aggregation buffer (COVERAGE.md round 6).
    val plan = executed(SparkEntry.queries("t29_span_removal")(spark, sf))
    val generates = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.nonEmpty, "shingle explode missing - plan changed shape")
    val tokenExplodes = generates.filter(
      _.generatorOutput.exists(_.name == "tok"))
    assert(tokenExplodes.isEmpty,
      "a per-token explode is back in the span-removal plan")
  }

  test("t33 explodes words only above the pair join") {
    // retimeWords joins the (tiny) candidate pair set onto docs FIRST
    // and explodes after: the Generate emitting `word` must have the
    // join beneath it. A Generate with no join below means the corpus
    // words explode before pairing — shuffling every token of every
    // document to retime a handful of pairs.
    val plan = executed(SparkEntry.queries("t33_word_retime")(spark, sf))
    val wordGens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
        if g.generatorOutput.exists(_.name == "word") => g
    }
    assert(wordGens.nonEmpty, "word explode missing - plan changed shape")
    val joinBelow = wordGens.forall { g =>
      g.collect {
        case j: BroadcastHashJoinExec => j
        case j: SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty
    }
    assert(joinBelow,
      "word explode runs below the pair join - full-corpus token explode is back")
  }

  test("a14 folds trials inside the aggregate, not via explode") {
    // BootstrapTrialsAgg: the partial ObjectHashAggregate must sit on
    // the raw rows (no Generate beneath it) — a Generate below the
    // fold means the rows x trials explode returned, and the partial
    // must run map-side (no shuffle beneath), so the exchange ships
    // one trial vector per partition instead of 120M records.
    val plan = executed(SparkEntry.queries("a14_bootstrap")(spark, sf))
    val partials = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partials.nonEmpty, "partial bootstrap_trials aggregate missing")
    partials.foreach { a =>
      assert(a.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, "an explode crept below the bootstrap fold")
      assert(a.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "partial bootstrap fold runs after a shuffle - should be map-side")
    }
  }

  // the r7/r8 pair-generator defect signature: a corpus-wide distinct
  // of the (doc_id, shingle) set — grouping on {doc_id, sid} or
  // {doc_id, sh} — re-paying an exchange the map-side array_distinct
  // construction already made redundant (TextOps.shingleIds). Guarded
  // on BOTH the library query (t03) and the composed pipeline (t14):
  // round 8's fix removed exactly such a distinct from an inline copy
  // in t14.
  private def assertMapSidePairGen(plan: SparkPlan): Unit = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    def names(a: HashAggregateExec): Set[String] =
      a.groupingExpressions.flatMap(_.collect {
        case r: AttributeReference => r.name
      }).toSet
    // r22: the df-cap hot-set aggregate moved into a scalar subquery
    // (the sorted-array hot set ArrayLongsNotInSorted probes per row),
    // so the audit walks subquery plans too
    val aggs = plan.collectWithSubqueries { case a: HashAggregateExec => a }
    val distincts = aggs.filter { a =>
      val n = names(a)
      n == Set("doc_id", "sid") || n == Set("doc_id", "sh")
    }
    assert(distincts.isEmpty,
      "a corpus-wide (doc_id, shingle) distinct is back in the pair pipeline")
    // and the FIRST sid aggregation (the df-cap hot-set count) is fed
    // directly by the map-side explode: partial agg on {sid} with no
    // exchange beneath it
    val sidPartials = aggs.filter { a =>
      names(a) == Set("sid") && a.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial)
    }
    assert(sidPartials.nonEmpty, "df-cap partial aggregate on sid missing")
    sidPartials.foreach { a =>
      assert(a.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "an exchange crept below the first sid aggregation")
    }
    // r22 (VERDICT r21 ask #4): the per-doc surviving-set size is
    // per-row (size of the pruned sid array) — a WindowExec here means
    // the full-posting doc_id shuffle+sort is back in the generator
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "a window crept back into the pair generator (nsh must be per-row)")
  }

  test("jaccardPairs (the t03/t14/t15/t31/t33 pair stage) is map-side to the first sid agg") {
    // the public jaccardPairs materializes eagerly (localCheckpoint →
    // opaque LogicalRDD leaf), so audit the internal lazy plan the
    // checkpoint job executes
    val (mk, _) = graft.text.TextOps.jaccardPairsImpl(
      graft.sources.Tables.documents(spark, sf), 3, 50, 0.5, persist = false)
    assertMapSidePairGen(executed(mk))
  }

  test("pairStats (t03/t37/t38 candidate generator) is map-side to the first sid agg") {
    val (mk, _) = graft.text.TextOps.pairStatsImpl(
      graft.sources.Tables.documents(spark, sf), 3, 50, persist = false)
    assertMapSidePairGen(executed(mk))
  }

  test("ph04 BM25 is map-side: one scalar-agg shuffle, TakeOrdered, no explode") {
    val plan = executed(SparkEntry.queries("ph04_bm25_topk")(spark, sf))
    // tf/dl are per-row array ops — a Generate here means the
    // token-table explode (a corpus-wide shuffle feeder) is back
    assert(plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, "a token explode is back in ph04 - tf/dl must stay per-row")
    val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size <= 1,
      s"ph04 has ${exchanges.size} shuffles, expected only the (N,L,df) scalar agg")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "final top-k degraded from TakeOrdered to a global sort")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "the broadcast scalar join degraded to sort-merge")
  }

  test("t41 derives df from the tf table: two scans, no vocab-sized join") {
    val plan = executed(SparkEntry.queries("t41_tfidf_terms")(spark, sf))
    // df must ride a window over tf — a third scan means the corpus is
    // re-read (or tf re-aggregated) just to count document frequencies
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size <= 2, s"t41 reads the corpus ${scans.size}x, expected 2 " +
      "(token scan + 1-row total)")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "the 1-row total join degraded to sort-merge")
    // tf agg + tok window + doc window + final sort + the 1-row
    // total's single-partition agg
    val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size <= 5, s"t41 has ${exchanges.size} exchanges, expected <= 5")
  }

  test("t44/t45/t47 stay equi-joined; tiny weight/vocab tables broadcast") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    // t44's band probe and exact-verify are equi-joins on (band,sig) /
    // (doc,sid); a cartesian here means the candidate bound is gone
    Seq("t44_incremental_dedup", "t45_dsir_scores", "t47_oov_audit")
      .foreach { q =>
        val plan = executed(SparkEntry.queries(q)(spark, sf))
        assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
          s"$q has a cartesian product")
        if (q != "t44_incremental_dedup") {
          // the 512-bucket DSIR weight table / 400-merge vocab must
          // broadcast — a shuffle join here ships the corpus instead
          assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
            s"$q lost its broadcast scoring join")
        }
      }
  }

  test("t18 computes repetition per-row: zero exchanges before the lang rollup") {
    val plan = executed(SparkEntry.queries("t18_repetition_filter")(spark, sf))
    // the pre-r8 form exploded shingles corpus-wide to count per-doc
    // distincts; the per-row native expression has no Generate at all
    assert(plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, "a shingle explode is back in t18 - distinct count must stay per-row")
    // one hash exchange for the lang rollup + one range exchange for
    // the final orderBy; anything more is a pre-rollup shuffle
    val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size <= 2, s"t18 has ${exchanges.size} exchanges, expected <= 2")
    val partials = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partials.nonEmpty, "partial lang-rollup aggregate missing")
    partials.foreach { a =>
      assert(a.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "the lang rollup's partial aggregate runs after a shuffle")
    }
  }

  test("t35/t36 per-row text signals shuffle only at the lang rollup") {
    // CDC chunking explodes per-row chunk arrays and the top-n-gram
    // counts are scalar — in both plans every Generate/projection must
    // sit directly on the scan, with exactly the rollup exchange (+
    // the final sort's range exchange) above
    for (q <- Seq("t35_cdc_dedup", "t36_topgram_filter")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      // t35's countDistinct adds one more agg exchange (lang, fp)
      assert(exchanges.size <= 3, s"$q has ${exchanges.size} exchanges")
      plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.foreach { g =>
        assert(g.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"$q explodes after a shuffle - the per-row stage must be map-side")
      }
    }
  }

  test("ph03 keeps the posting joins broadcast at dimension scale") {
    // the phrase pipeline's semi/anti joins (boolean doc set, hit
    // filter) must execute as broadcast joins on this corpus — a
    // sort-merge posting join means the doc-set side stopped being
    // treated as a dimension
    val plan = executed(SparkEntry.queries("ph03_phrase_segments")(spark, sf))
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"ph03 degraded ${smj.size} posting joins to sort-merge")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "ph03 lost its broadcast posting joins")
  }

  test("p13 bottom-k aggregates partially before the exchange") {
    val plan = executed(SparkEntry.queries("p13_hash_sample")(spark, sf))
    val objAggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    // partial + final pair for the TypedImperativeAggregate
    assert(objAggs.size >= 2, s"expected partial+final bottom_k, got ${objAggs.size}")
    val partialBelowShuffle = objAggs.exists { a =>
      a.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial) &&
        a.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(partialBelowShuffle, "no map-side partial bottom_k before the shuffle")
  }

  test("a23 regression fits from ONE shuffle of sufficient statistics") {
    // the whole fit must reduce to the grouped sums: a partial
    // (map-side) HashAggregate below a single exchange, then scalar
    // arithmetic — any second pre-sort exchange means the closed form
    // stopped being computed from the 6 combinable longs
    val plan = executed(SparkEntry.queries("a23_group_regression")(spark, sf))
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    val partialBelowShuffle = aggs.exists { a =>
      a.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial) &&
        a.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(partialBelowShuffle, "no map-side partial sums before the shuffle")
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, // group-by + final orderBy range exchange
      s"a23 shuffled ${shuffles.size} times - the fit must cost one agg")
  }

  test("v19 broadcasts the centroids and never degrades to sort-merge") {
    val plan = executed(SparkEntry.queries("v19_prototype_prune")(spark, sf))
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, "centroid join degraded to sort-merge")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "v19 lost its broadcast centroid join")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "v19 planned a cartesian product")
  }

  test("st08 hopping windows aggregate partially before the shuffle") {
    // window assignment is Expand + per-row expression work; the count
    // must combine map-side so the exchange carries (window,type)
    // partials, never raw events
    val plan = executed(SparkEntry.queries("st08_sliding_windows")(spark, sf))
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    val partialBelowShuffle = aggs.exists { a =>
      a.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial) &&
        a.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(partialBelowShuffle, "no map-side partial count below the shuffle")
  }

  test("t52/t53 source profiles join without cartesians; t52 broadcasts the dim") {
    val p52 = executed(SparkEntry.queries("t52_boilerplate_ngrams")(spark, sf))
    assert(p52.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "t52 lost the broadcast of the per-source doc counts")
    Seq("t52_boilerplate_ngrams", "t53_source_similarity").foreach { q =>
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty, s"$q planned a cartesian product")
    }
  }

  test("t51 chunking explodes map-side: no shuffle below the Generate") {
    val plan = executed(SparkEntry.queries("t51_chunk_windows")(spark, sf))
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty, "chunk explode missing from plan")
    gens.foreach { g =>
      assert(g.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "t51 shuffled before the chunk explode - chunking must be one map pass")
    }
  }

  test("v24 JL projection computes with zero shuffle exchanges") {
    // the nested-HOF projection is one map pass over the corpus; its
    // only exchange is the broadcast of the 1-row max-abs scale (plus
    // the final sort's range exchange from the query's orderBy)
    val plan = executed(SparkEntry.queries("v24_jl_project")(spark, sf))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    // orderBy adds one range exchange; nothing else may shuffle
    assert(shuffles.size <= 1,
      s"v24 has ${shuffles.size} shuffles - the projection must stay map-side")
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.groupingExpressions.nonEmpty => a
    }.isEmpty, "v24 grew a grouped aggregation - the per-row fold regressed")
  }

  test("a28/a30 run no full-input global window (two-phase prefix sum)") {
    // exactly one partition-less window is allowed: the P-row offset
    // cumsum, whose child must be the __pid partial-sum aggregate —
    // a partition-less window over the raw value table would
    // single-task the corpus
    for (q <- Seq("a28_ks_test", "a30_mann_whitney")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      val globalWins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(globalWins.size === 1,
        s"$q has ${globalWins.size} global windows, expected exactly the P-row one")
      val overPidAgg = globalWins.head.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
      }
      assert(overPidAgg.nonEmpty,
        s"$q's global window does not sit on the __pid partial-sum table")
    }
  }

  test("e28's ordered ball output is the two-phase ordinal, not a global rank window") {
    // the round-19 builder-known row: e28 used to rank its
    // double-thresholded ball through row_number() OVER (ORDER BY ..)
    // — a single-partition sort whose input is corpus-sized whenever
    // the thresholds stop being selective. The rewrite routes it
    // through Q.globalRn (range partition + per-partition cumsum +
    // P-row offset table): the only partition-less window allowed is
    // the P-row offset cumsum sitting on the __pid partial-sum
    // aggregate.
    val plan = executed(
      SparkEntry.queries("e28_face_search_exclusions")(spark, sf))
    val globalWins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWins.size === 1,
      s"e28 has ${globalWins.size} global windows, expected exactly the P-row one")
    assert(globalWins.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
    }.nonEmpty, "e28's global window does not sit on the __pid partial-sum table")
  }

  test("t57 sketch estimation joins broadcast; no sort-merge anywhere") {
    val plan = executed(SparkEntry.queries("t57_cms_heavy")(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "t57's 2048-row sketch join degraded to sort-merge")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "t57 lost its broadcast sketch join")
  }

  test("v26 k-center never materializes a pairwise matrix") {
    // every round is corpus x (<=k broadcast picks): allowed joins are
    // broadcast nested-loop / hash; a sort-merge or cartesian means
    // the selected set stopped being a dimension
    val plan = executed(SparkEntry.queries("v26_kcenter_coreset")(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "v26 degraded a pick join to sort-merge")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "v26 planned a cartesian product")
  }

  test("v07 integer-Lloyd assignment is a struct-min agg, not a corpus window") {
    // each Lloyd step must be map-side combinable: centroids broadcast
    // into the corpus scan, nearest-cell picked by min(struct(dist,
    // cell)) with partial aggregation — a WindowExec over corpus-sized
    // input or a sort-merge join means the fit stopped scaling
    val plan = executed(SparkEntry.queries("v07_ivf_topk")(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "v07 degraded a centroid/probe join to sort-merge")
    // the ONLY windows allowed are the tiny ones: the k-row seed rank,
    // the |queries|x|cells| probe rank and the per-query result rank —
    // all bounded by k/nlist/queries, never by the corpus. Corpus-side
    // nearest-cell assignment must NOT appear as a window.
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size <= 3,
      s"v07 grew ${windows.size} windows — assignment leaked into a window")
    // struct-min is not hash-aggregable, so it plans as SortAggregate —
    // match any BaseAggregateExec with a PARTIAL min (map-side combine
    // is the property, the exec flavor is incidental)
    val partials = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.aggregateExpressions.exists(e =>
          e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial &&
            e.aggregateFunction.prettyName.contains("min")) => a
    }
    assert(partials.nonEmpty, "v07 lost the partial struct-min assignment")
  }

  test("ph12 hybrid fusion ranks only post-limit frames (TakeOrdered arms, no corpus window)") {
    val plan = executed(SparkEntry.queries("ph12_hybrid_fusion")(spark, sf))
    // each arm ends in a per-partition top-k, never a global sort of
    // all scored rows
    val topk = plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }
    assert(topk.size >= 2,
      s"expected both arms + the fused top-10 as TakeOrdered, got ${topk.size}")
    // every rank window must sit ABOVE a limit — i.e. its subtree
    // contains the arm's top-k — so no window ever sees corpus-sized
    // input (the failure mode would be rank-then-filter over all docs)
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    windows.foreach { w =>
      val limited = w.child.collectFirst {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      }
      assert(limited.nonEmpty,
        "a rank window runs below any limit — it would sort the corpus at scale")
    }
  }

  test("m06 container probe runs shuffle-free up to the final sort") {
    // the probe is one narrow map over the payload column; the only
    // exchange allowed in the whole query is the presentation orderBy
    val plan = executed(SparkEntry.queries("m06_container_probe")(spark, sf))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 1,
      s"m06 has ${shuffles.size} exchanges — the header parse stopped being map-only")
  }

  test("m07 runtime audit is shuffle-free up to the final sort") {
    // catalog column + header parse + filter are all narrow; only the
    // presentation orderBy may exchange
    val plan = executed(SparkEntry.queries("m07_runtime_mismatch")(spark, sf))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 1,
      s"m07 has ${shuffles.size} exchanges — the runtime audit stopped being map-only")
  }

  test("e33 temporal P/R overlap join is keyed, never a cartesian") {
    // the proposal-vs-truth overlap join must plan as an equi join on
    // the video key with the band residual as a post-condition; a
    // cartesian/BNLJ here is corpus x corpus at 100 TB
    val plan = executed(SparkEntry.queries("e33_interval_pr")(spark, sf))
    val cart = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cart.isEmpty,
      s"e33 planned ${cart.size} unkeyed joins — the overlap join lost its equi key")
  }

  test("e31 pose-motion window and per-track aggregate share one hash exchange") {
    // Window partitionBy(track_id) and the groupBy(track_id) that
    // follows must reuse one partitioning: 1 hash exchange + 1 range
    // exchange (presentation sort). A second hash exchange means the
    // aggregate stopped seeing the window's output partitioning, and
    // the corpus shuffles twice at scale. The seed join is a 1-row
    // broadcast and must not shuffle at all.
    val plan = executed(SparkEntry.queries("e31_animatedness")(spark, sf))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2,
      s"e31 has ${shuffles.size} exchanges — expected window+agg to share one")
  }

  test("ph14 tombstone filtering is a broadcast anti-join (never sort-merge)") {
    // a takedown list is dimension-sized; if the serve-side liveOnly
    // anti-join ever degrades to sort-merge, every query pays an
    // index-sized shuffle at 100 TB for a kilobyte purge list
    val plan = executed(SparkEntry.queries("ph14_deleted_phrase")(spark, sf))
    val anti = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType.toString.contains("LeftAnti") => j
    }
    assert(anti.nonEmpty, "tombstone anti-join missing or not broadcast")
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"ph14 has ${smj.size} sort-merge joins")
  }

  test("ph21 merged index still prunes the postings scan to vocab buckets") {
    // shard merge must hand back a layout with the same static
    // bucket-elimination property as a fresh build
    val plan = executed(SparkEntry.queries("ph21_merged_phrase")(spark, sf))
    val posting = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(posting.nonEmpty, "postings scan not found in ph21's plan")
    posting.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "merged-index postings scan lost its bucket partition filter")
      assert(sc.selectedPartitions.partitionCount <= 2,
        s"merged-index scan read ${sc.selectedPartitions.partitionCount} bucket dirs for a 2-word phrase")
    }
  }

  test("v41 filtered ANN: allow-list semi-join broadcasts, DPP cell pruning survives") {
    // the metadata allow-list is dimension-sized; a sort-merge there
    // would shuffle the index per filtered query, and the pre-filter
    // must not cost the probed-cell pruning
    val plan = executed(SparkEntry.queries("v41_ivf_filtered")(spark, sf))
    val semi = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType.toString.contains("LeftSemi") => j
    }
    assert(semi.nonEmpty, "allow-list semi-join missing or not broadcast")
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"v41 has ${smj.size} sort-merge joins")
    val vectors = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("vectors")) => s
    }
    assert(vectors.exists(_.partitionFilters.nonEmpty),
      "filtered-IVF vectors scan lost its cell partition filter — DPP regressed")
  }

  test("ph31 batch phrase: one pruned postings scan feeds every phrase") {
    // the whole point of the batch matcher: N phrases = ONE index
    // pass (union of vocab buckets), broadcast terms dim, one
    // count-equals-length aggregate — not a scan per phrase
    val plan = executed(SparkEntry.queries("ph31_batch_phrase")(spark, sf))
    val posting = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(posting.size === 1,
      s"batch phrase read the postings ${posting.size} times — must be once")
    posting.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "batch postings scan lost its bucket partition filter")
    }
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"ph31 has ${smj.size} sort-merge joins")
  }

  test("ph32 prefix search: lexicon range scan + DPP bucket pruning + pushed StartsWith") {
    // no STATIC bucket routing is possible for a prefix; viability
    // rests on three layers — the tok-sorted lexicon resolves the
    // matched vocabulary as a range scan, its broadcast semi-join
    // DPP-prunes the postings to the matched tokens' buckets, and the
    // pushed range reaches the tok-sorted files' row-group stats
    val plan = executed(SparkEntry.queries("ph32_prefix_search")(spark, sf))
    val posting = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(posting.nonEmpty, "postings scan not found in ph32's plan")
    assert(posting.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("StringStartsWith"))),
      "StartsWith no longer pushes down to the parquet scan")
    assert(posting.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))),
      "postings scan lost its DPP bucket filter — every bucket dir would be read")
    // the lexicon scan lives inside the DPP subquery / reused
    // broadcast, which plain collect does not traverse
    val lexicon = plan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lexicon")) => s
    }
    assert(lexicon.nonEmpty, "lexicon scan not found in ph32's plan")
    assert(lexicon.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("StringStartsWith"))),
      "the lexicon's prefix range is not pushed to its sorted files")
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"ph32 has ${smj.size} sort-merge joins")
  }

  test("v48 IVF-PQ serve: codes scan is DPP cell-pruned, no sort-merge joins") {
    // the compressed tier's whole point is reading probed cells' code
    // rows instead of full vectors — if the pqcodes scan loses its
    // dynamic cell filter, stage 1 reads every cell dir of the tier
    val plan = executed(SparkEntry.queries("v48_ivf_pq_served")(spark, sf))
    val codes = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("pqcodes")) => s
    }
    assert(codes.nonEmpty, "pqcodes scan not found in v48's plan")
    assert(codes.exists(_.partitionFilters.nonEmpty),
      "IVF-PQ codes scan lost its cell partition filter — DPP regressed")
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"v48 has ${smj.size} sort-merge joins")
  }

  test("v32 deleted-IVF serve keeps DPP cell pruning AND broadcast tombstones") {
    val plan = executed(SparkEntry.queries("v32_ivf_deleted")(spark, sf))
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"v32 has ${smj.size} sort-merge joins")
    val vectors = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("vectors")) => s
    }
    assert(vectors.nonEmpty, "vectors scan not found in v32's plan")
    // DPP from the broadcast probe table: the scan carries a dynamic
    // cell partition filter, so unprobed cell dirs are never read
    assert(vectors.exists(_.partitionFilters.nonEmpty),
      "deleted-IVF vectors scan lost its cell partition filter — DPP regressed")
  }

  test("e13 served caption search is INDEX-ONLY: pruned postings " +
    "buckets, zero corpus scans") {
    // the r18 verdict's done-criterion for the e13 conversion: a plan
    // audit showing the whole query answers from the persisted index
    // — every file scan sits under the phidx layout with a static
    // bucket partition filter, and NOTHING reads the documents table
    // (the fps dim is doc_id-derived, so even the dimension join the
    // in-process form needed is gone)
    val plan = executed(SparkEntry.queries("e13_caption_search")(spark, sf))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scans found in e13's plan")
    val paths = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(!paths.exists(_.contains("documents.parquet")),
      s"e13 still scans the documents table: $paths")
    assert(paths.forall(_.contains("phidx")),
      s"e13 scanned outside the caption index: $paths")
    val postings = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("postings")))
    assert(postings.nonEmpty, "postings scan missing from e13's plan")
    postings.foreach(s => assert(s.partitionFilters.nonEmpty,
      "postings scan lost its static bucket partition filter"))
  }

  test("a10/t17 plans carry no Percentile buffering aggregate") {
    // the histogram rewrite's guard: Spark's percentile() buffers
    // every group value in executor memory — if either query slides
    // back to it, this fails before a 100 TB OOM does
    Seq("a10_median", "t17_quality_band").foreach { q =>
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      val percentiles = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }.flatMap(_.aggregateExpressions).map(_.aggregateFunction)
        .filter(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.Percentile])
      assert(percentiles.isEmpty,
        s"$q regressed to the value-buffering percentile() aggregate")
    }
  }

  test("corpus queries off the bucketed catalog lose their hash exchanges") {
    // the Bench `layout` section's claim as a pinned plan property:
    // the SAME query functions (Tables.load's `catalog:` scheme — a
    // deployment choice, not a query rewrite) run with ZERO
    // hash-partitioned exchanges when the tables are bucketed by the
    // dominant access key. The final orderBy's range exchange is
    // presentation, not data motion the layout can remove, so only
    // HashPartitioning exchanges are counted.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import graft.sources.Tables
    def pq(n: String) = spark.read.parquet(s"$sf/$n.parquet")
    // a test JVM that died between saveAsTable and the finally DROP
    // leaves managed-table dirs the fresh in-memory catalog never knew
    // about — saveAsTable then fails on "location already exists" in
    // every later run. Mirror Bench: clear both the catalog entry and
    // the surviving warehouse dir BEFORE writing, not only in finally.
    val warehouse = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("lineitem", "orders", "events", "customer", "documents",
      "embeddings").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_pa_$t")
      graft.queries.Q.rmTree(warehouse.resolve(s"graft_pa_$t"))
    }
    Tables.writeBucketed(pq("lineitem"), "graft_pa_lineitem", "l_orderkey",
      4, Seq("l_orderkey", "l_linenumber"))
    Tables.writeBucketed(pq("orders"), "graft_pa_orders", "o_orderkey",
      4, Seq("o_orderkey"))
    Tables.writeBucketed(pq("events"), "graft_pa_events", "user_id",
      4, Seq("user_id"))
    Tables.writeBucketed(pq("customer"), "graft_pa_customer", "c_custkey",
      4, Seq("c_custkey"))
    Tables.writeBucketed(pq("documents"), "graft_pa_documents", "doc_id",
      4, Seq("doc_id"))
    Tables.writeBucketed(pq("embeddings"), "graft_pa_embeddings", "vec_id",
      4, Seq("vec_id"))
    try {
      def hashEx(q: String): Int =
        executed(SparkEntry.queries(q)(spark, "catalog:graft_pa_")).collect {
          case e: ShuffleExchangeLike
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }.size
      // one representative per zero-exchange family (the corpus-wide
      // sweep in Bench's layout section found 60 of 139; these pin the
      // plan property per family so a regression names itself):
      //   j04 lineitem agg on its bucket key + join to co-bucketed
      //       orders; j05 self-join on the bucket key; j07 interval
      //       containment co-keyed on the orderkey
      //   r01/r08 island windows over the events bucket key
      //   st03 first-per-user dedup window; st01 sessionize
      //   a13 overlap totals (events windows + agg on user_id)
      //   e04 timeline rows (the widget data layer's frame joins)
      //   o09 SCD2 merge (orders keyed on o_orderkey)
      //   x01 the native overlap-seconds expression's banded join
      //   t05 per-doc simhash fold + pair join legs on doc_id; t13
      //       per-doc feature hash; v06/v23 doc/vec-keyed joins — the
      //       r20 LayoutAudit finding that overturned the "derived
      //       keys only" t/v exclusion
      Seq("j04_correlated_count", "r01_coalesce", "j05_self_theta",
        "j07_containment", "r08_merge_spans", "st03_dedup_first",
        "st01_sessionize", "a13_overlap_totals", "e04_timeline_rows",
        "o09_scd2_merge", "x01_native_overlap",
        "t05_simhash", "t13_feature_hash", "v06_knn_predict",
        "v23_semantic_decontam")
        .foreach { q =>
          assert(hashEx(q) === 0,
            s"$q should be exchange-free on the bucketed layout")
        }
      // j02's orders side joins on o_custkey — NOT its bucket key —
      // so exactly the customer side's co-location survives; the plan
      // may shuffle orders but must not shuffle customer. Pin the
      // weaker, honest property: strictly fewer hash exchanges than
      // the parquet layout plus the agg reuse (<= 1).
      assert(hashEx("j02_left_outer") <= 1,
        "j02 should keep the customer side co-located")
    } finally
      Seq("lineitem", "orders", "events", "customer", "documents",
        "embeddings").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_pa_$t"))
  }
}
