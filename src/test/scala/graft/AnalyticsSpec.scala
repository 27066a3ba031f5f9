package graft

import org.apache.spark.sql.functions._
import graft.analytics.Bootstrap
import graft.similarity.MlSimilarity
import graft.text.TextOps

/** Bootstrap statistics, MLlib similarity variants, and the
  * scale-path dictionary (zipWithIndex == dense_rank ids). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("poisson bootstrap recovers the mean with plausible spread") {
    val n = 2000
    val df = (1 to n).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val res = Bootstrap.bootstrapMean(df, "id", "v", trials = 100).head()
    val est = res.getAs[Double]("est_mean")
    val std = res.getAs[Double]("est_std")
    assert(math.abs(est - 49.5) < 1.0)   // true mean 49.5
    assert(std > 0.1 && std < 3.0)       // ~ sigma/sqrt(n) scale
    assert(res.getAs[Long]("n_trials") === 100L)
    // deterministic: same seed -> same estimate
    val res2 = Bootstrap.bootstrapMean(df, "id", "v", trials = 100).head()
    assert(res2.getAs[Double]("est_mean") === est)
  }

  test("bootstrap_trials agg equals the explode-by-trial formulation") {
    // The r7 folded aggregate must reproduce the exploded plan's
    // integer sums exactly (order-free addition) — replay the explode
    // form inline and compare per-trial (sum w, sum w*vc) vectors.
    import graft.plans.BootstrapTrialsAgg
    val trials = 37
    val seed = 42L
    // include NULL ids and NULL values: a NULL id must fall through the
    // CASE WHEN to w = 5 (NULL conditions are false), a NULL value must
    // contribute w to sum(w) while its product drops out of sum(w*vc) —
    // rows are never skipped wholesale (r7 review finding, fixed)
    val df = ((1 to 500).map(i => (Option(i.toLong), Option((i % 83).toLong)))
      ++ Seq((None, Option(7L)), (Option(901L), None), (None, None)))
      .toDF("id", "vc").repartition(7)
    val folded = df
      .agg(BootstrapTrialsAgg.bootstrapTrials(col("id"), col("vc"),
        trials, seed).as("tw"))
      .selectExpr("tw.ws AS ws", "tw.wvs AS wvs")
      .as[(Seq[Long], Seq[Long])].head()
    val p = 1000000007L
    val exploded = df
      .withColumn("trial", explode(sequence(lit(1), lit(trials))))
      .withColumn("p1", pmod(col("id") * 1000003L + col("trial") * 7919L
        + lit(seed), lit(p)))
      .withColumn("u", pmod(col("p1") * col("p1") + col("p1"), lit(p)) % 1000000L)
      .withColumn("w", when(col("u") < 367880L, 0L).when(col("u") < 735760L, 1L)
        .when(col("u") < 919700L, 2L).when(col("u") < 981010L, 3L)
        .when(col("u") < 996340L, 4L).otherwise(5L))
      .groupBy("trial")
      .agg(sum(col("w")).as("ws"), sum(col("w") * col("vc")).as("wvs"))
      .orderBy("trial").as[(Int, Long, Long)].collect()
    assert(folded._1 === exploded.map(_._2).toSeq)
    assert(folded._2 === exploded.map(_._3).toSeq)
    // empty relation -> NULL (mirrors zero groups in the exploded form)
    val empty = df.filter(col("id") < 0)
      .agg(BootstrapTrialsAgg.bootstrapTrials(col("id"), col("vc"),
        trials, seed).as("tw"))
    assert(empty.filter(col("tw").isNull).count() === 1)
    // out-of-range id fails loudly instead of wrapping silently
    val bad = Seq((Long.MinValue, 1L)).toDF("id", "vc")
    val ex = intercept[Exception] {
      bad.agg(BootstrapTrialsAgg.bootstrapTrials(col("id"), col("vc"),
        trials, seed)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("bottom_k keeps the k smallest distinct values through merges") {
    import graft.plans.BottomKAgg
    // values with duplicates, spread over partitions so partial
    // buffers must merge; expect the 5 smallest distinct
    val df = spark.range(0, 1000).toDF("i").repartition(7)
      .selectExpr("CAST(i % 100 AS BIGINT) AS v") // each value 10x
    val got = df.agg(BottomKAgg.bottomK(col("v"), 5).as("bk"))
      .selectExpr("bk").as[Seq[Long]].head()
    assert(got === Seq(0L, 1L, 2L, 3L, 4L))
    // grouped: per parity, 5 smallest distinct of that parity
    val g = df.groupBy(expr("v % 2").as("p"))
      .agg(BottomKAgg.bottomK(col("v"), 5).as("bk"))
      .orderBy("p").as[(Long, Seq[Long])].collect().toList
    assert(g === List((0L, Seq(0L, 2L, 4L, 6L, 8L)),
      (1L, Seq(1L, 3L, 5L, 7L, 9L))))
    // fewer than k distinct -> the whole sorted set
    val small = Seq(9L, 9L, 3L).toDF("v")
      .agg(BottomKAgg.bottomK(col("v"), 5)).as[Seq[Long]].head()
    assert(small === Seq(3L, 9L))
    // nulls are skipped, not treated as zero
    val withNulls = Seq(Some(7L), None, Some(2L), None)
      .toDF("v").agg(BottomKAgg.bottomK(col("v"), 5)).as[Seq[Long]].head()
    assert(withNulls === Seq(2L, 7L))
  }

  test("dict ids equal dense_rank over sorted distinct values") {
    val vals = Seq("pear", "apple", "apple", "fig", "banana").toDF("w")
    val got = TextOps.dict(vals, "w", "wid").as[(String, Long)].collect().toMap
    assert(got === Map("apple" -> 1L, "banana" -> 2L, "fig" -> 3L, "pear" -> 4L))
  }

  test("MLlib approx similarity join finds planted close pair") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0.98f, 0.02f, 0f), 0),   // very close to 0
      (2L, Array(0f, 1f, 0f), 1),
      (3L, Array(0f, 0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val pairs = MlSimilarity.approxPairs(emb, maxL2 = 0.2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => (a, b) == (0L, 2L) })
  }

  test("MLlib logistic regression classifies separated clusters") {
    val emb = (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0.01f * i)
      base(c) = 5f
      (i.toLong, base, c)
    }.toDF("vec_id", "embedding", "label")
    val train = emb.filter($"vec_id" % 2 === 0)
    val test_ = emb.filter($"vec_id" % 2 === 1)
    val out = MlSimilarity.logregClassify(train, test_)
      .as[(Long, Int, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, l, p) => l == p })
  }

  test("logregScoreAll scores every corpus vector with winning class + prob") {
    val emb = (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0.01f * i)
      base(c) = 5f
      (i.toLong, base, c)
    }.toDF("vec_id", "embedding", "label")
    val scored = MlSimilarity.logregScoreAll(emb, emb)
      .as[(Long, Int, Double)].collect()
    assert(scored.length === 60)                 // every vector scored
    assert(scored.forall { case (id, p, _) => p == (id % 3) })
    assert(scored.forall { case (_, _, s) => s > 1.0 / 3 && s <= 1.0 })
  }

  test("knnPredict scores by mean neighbor label under cosine") {
    val train = Seq(
      (10L, Array(1f, 0f, 0f, 0f), 1), (11L, Array(0.9f, 0.1f, 0f, 0f), 1),
      (12L, Array(0f, 1f, 0f, 0f), 0), (13L, Array(0.1f, 0.9f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val corpus = Seq(
      (0L, Array(0.95f, 0.05f, 0f, 0f), -1),
      (1L, Array(0.05f, 0.95f, 0f, 0f), -1)
    ).toDF("vec_id", "embedding", "label")
    val res = graft.similarity.Similarity.knnPredict(corpus, train, 2)
      .as[(Long, Double)].collect().toMap
    assert(res(0L) === 1.0)   // both nearest neighbors carry label 1
    assert(res(1L) === 0.0)
  }

  test("ivfTopK ranks cluster-mates first on separated clusters") {
    val emb = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0f)
      base(c) = 10f + (i / 3).toFloat * 0.01f
      (i.toLong, base, c)
    }.toDF("vec_id", "embedding", "label")
    val top = MlSimilarity.ivfTopK(emb, emb.filter($"vec_id" === 0),
        k = 5, nlist = 3, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(top.length === 5)
    assert(top.forall(_ % 3 === 0))   // all from vector 0's cluster
  }

  test("MLlib kmeans separates well-separated clusters") {
    val emb = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0f)
      base(c) = 10f + (i / 3).toFloat * 0.01f
      (i.toLong, base, c)
    }.toDF("vec_id", "embedding", "label")
    val out = MlSimilarity.kmeansAssign(emb, k = 3)
      .as[(Long, Int, Int)].collect()
    // purity: every true label maps to exactly one cluster
    val byLabel = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    byLabel.foreach { case (_, cs) => assert(cs.size === 1) }
    assert(byLabel.values.flatten.toSet.size === 3)
  }

  test("sketch aggregates stay within tolerance of the exact answers") {
    import org.apache.spark.sql.functions._
    val df = (1 to 20000)
      .map(i => (i.toLong % 3000, (i % 100).toDouble, if (i % 2 == 0) "A" else "B"))
      .toDF("k", "v", "g")
    val sk = df.groupBy($"g")
      .agg(approx_count_distinct($"k", rsd = 0.02).as("ad"),
        expr("approx_percentile(v, 0.5, 1000)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = df.groupBy($"g")
      .agg(countDistinct($"k").as("d"),
        expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (g, (d, p)) =>
      val (ad, ap) = sk(g)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$g hll off: $ad vs $d")
      assert(math.abs(ap - p) <= 2.0, s"$g p50 off: $ap vs $p")
    }
  }

  test("a23's sufficient-statistic fit equals the direct least-squares solution") {
    // property: for y = 3x + 7 + structured residuals, the closed form
    // from (n, Σx, Σy, Σx², Σxy) must match the normal-equation solve
    // computed directly in Scala on the same points
    val pts = (1 to 200).map { i =>
      val x = (i % 17).toLong + 1
      val y = 3 * x + 7 + (i % 5) - 2 // residuals sum to ~0 per x
      (x, y)
    }
    val df = pts.toDF("x", "y")
    val r = df.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .withColumn("slope", ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
        ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
      .withColumn("intercept",
        ($"sy".cast("double") - $"slope" * $"sx".cast("double")) / $"n".cast("double"))
      .head()
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - icept) < 1e-12)
    // sanity: the generated data really is ~ y = 3x + 7
    assert(math.abs(slope - 3.0) < 0.1 && math.abs(icept - 7.0) < 1.0)
  }

  test("t51 chunk windows cover every token; adjacent full chunks overlap by 8") {
    val sf = "/root/testdata/sf0.001"
    val chunks = SparkEntry.queries("t51_chunk_windows")(spark, sf)
      .select($"doc_id", $"start", $"len").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    val ntok = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // full coverage: first starts at 0, last ends at ntok, no gaps
      assert(sorted.head._2 === 0L)
      assert(sorted.last._2 + sorted.last._3 === ntok(doc),
        s"doc $doc: last chunk ends before the document does")
      sorted.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) =>
          assert(s2 < s1 + l1, s"doc $doc: gap between chunks at $s2")
          if (l1 == 32L) assert(s1 + l1 - s2 === 8L,
            s"doc $doc: full-chunk overlap is not the 8-token stride remainder")
        case _ => ()
      }
    }
  }

  test("v19 drops exactly the floor(n/5) most-prototypical vectors per cluster") {
    val sf = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("v19_prototype_prune")(spark, sf)
      .groupBy($"label").agg(count(lit(1)).as("k"), min($"proto_rank").as("minr"))
      .as[(Int, Long, Long)].collect()
      .map { case (l, k, m) => l -> (k, m) }.toMap
    val total = graft.sources.Tables.embeddings(spark, sf)
      .groupBy($"label").count().as[(Int, Long)].collect().toMap
    total.foreach { case (l, n) =>
      val (k, minr) = kept(l)
      assert(k === n - n / 5, s"label $l: kept $k of $n")
      assert(minr === n / 5 + 1, s"label $l: the cut rank is wrong")
    }
  }

  test("mortonKey equals a bit-interleave reference on the full 8-bit grid") {
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val grid = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 13L)
      yield (x, y)
    val got = grid.toDF("qx", "qy")
      .select($"qx", $"qy", graft.functions.Fns.mortonKey($"qx", $"qy", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ref(x, y), s"($x,$y)") }
    // locality: a 1024-key z-range confines both dims to 32-wide bands
    val cells = got.groupBy { case (_, _, z) => z >> 10 }
    cells.values.foreach { g =>
      assert(g.map(_._1).max - g.map(_._1).min < 32)
      assert(g.map(_._2).max - g.map(_._2).min < 32)
    }
  }

  test("CUPED adjustment matches the direct theta computation and cuts variance") {
    // planted balanced design (each (x, arm) combo equally often, as
    // randomization guarantees in expectation): y = 2x + arm_effect.
    // Pooled theta is then exactly 2, the adjusted delta is the pure
    // arm effect 5, and the adjusted metric has ZERO within-arm
    // variance (y - theta*x is constant per arm) — the CUPED claim.
    val users = (0L until 196L).map { u =>
      val arm = u % 2
      val x = u % 7
      val y = 2 * x + (if (arm == 1) 5 else 0)
      (arm, u, x, y)
    }
    val per = users.toDF("arm", "user_id", "x", "y")
    val n = users.size.toLong
    val sx = users.map(_._3).sum; val sy = users.map(_._4).sum
    val sxx = users.map(t => t._3 * t._3).sum
    val sxy = users.map(t => t._3 * t._4).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(theta === 2.0)
    val adj = users.groupBy(_._1).map { case (arm, g) =>
      val na = g.size; val sxa = g.map(_._3).sum; val sya = g.map(_._4).sum
      arm -> (sya.toDouble / na - theta *
        (sxa.toDouble / na - sx.toDouble / n))
    }
    // the adjusted delta is the pure arm effect
    assert(math.abs(adj(1L) - adj(0L) - 5.0) < 1e-9)
    // variance reduction: the adjusted per-user metric y - theta*x is
    // constant within each arm, while raw y varies with x
    users.groupBy(_._1).foreach { case (_, g) =>
      val r = g.map(t => t._4 - theta * t._3)
      assert(r.max - r.min < 1e-9)
      assert(g.map(_._4).max - g.map(_._4).min > 1)
    }
    // the query's Spark aggregation tree recovers the same numbers
    val g = per.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
      sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
      sum($"x" * $"y").as("sxy"))
    val got = per.groupBy($"arm")
      .agg(count(lit(1)).as("n_a"), sum($"x").as("sx_a"), sum($"y").as("sy_a"))
      .crossJoin(g)
      .withColumn("theta",
        ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
      .withColumn("adj", $"sy_a".cast("double") / $"n_a".cast("double") -
        $"theta" * ($"sx_a".cast("double") / $"n_a".cast("double") -
          $"sx".cast("double") / $"n".cast("double")))
      .select($"arm", $"theta", $"adj").as[(Long, Double, Double)]
      .collect().map { case (a, t, v) => a -> (t, v) }.toMap
    got.values.foreach { case (t, _) => assert(t === theta) }
    assert(math.abs(got(1L)._2 - adj(1L)) < 1e-12)
    assert(math.abs(got(0L)._2 - adj(0L)) < 1e-12)
  }

  test("Welch t-test moments recover the textbook t and dof") {
    // planted arms: a = {10,12,14}, b = {20,26,32}
    val a = Seq(10.0, 12.0, 14.0); val b = Seq(20.0, 26.0, 32.0)
    def mv(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = mv(a); val (nb, mb, vb) = mv(b)
    val se2 = vb / nb + va / na
    val tRef = (mb - ma) / math.sqrt(se2)
    val dofRef = se2 * se2 /
      ((vb / nb) * (vb / nb) / (nb - 1) + (va / na) * (va / na) / (na - 1))
    // the query's integer-moment formulation on a toy frame
    val per = (a.map((0L, _)) ++ b.map((1L, _)))
      .map { case (arm, y) => (arm, y.toLong) }.toDF("arm", "y")
    val g = per.groupBy($"arm").agg(count(lit(1)).as("n"),
      sum($"y").as("s"), sum($"y" * $"y").as("ss"))
    val r = g.filter($"arm" === 0)
      .select($"n".as("an"), $"s".as("sa"), $"ss".as("ssa"))
      .crossJoin(g.filter($"arm" === 1)
        .select($"n".as("bn"), $"s".as("sb"), $"ss".as("ssb")))
      .withColumn("va", ($"ssa".cast("double") -
        $"sa".cast("double") * $"sa".cast("double") / $"an".cast("double")) /
        ($"an".cast("double") - 1.0))
      .withColumn("vb", ($"ssb".cast("double") -
        $"sb".cast("double") * $"sb".cast("double") / $"bn".cast("double")) /
        ($"bn".cast("double") - 1.0))
      .withColumn("se2", $"vb" / $"bn".cast("double") + $"va" / $"an".cast("double"))
      .withColumn("t", ($"sb".cast("double") / $"bn".cast("double") -
        $"sa".cast("double") / $"an".cast("double")) / sqrt($"se2"))
      .withColumn("dof", $"se2" * $"se2" /
        (($"vb" / $"bn".cast("double")) * ($"vb" / $"bn".cast("double")) /
          ($"bn".cast("double") - 1.0) +
         ($"va" / $"an".cast("double")) * ($"va" / $"an".cast("double")) /
          ($"an".cast("double") - 1.0)))
      .select($"t", $"dof").as[(Double, Double)].head()
    assert(math.abs(r._1 - tRef) < 1e-12, s"t ${r._1} vs $tRef")
    assert(math.abs(r._2 - dofRef) < 1e-12, s"dof ${r._2} vs $dofRef")
    // sanity: variance-corrected dof sits strictly between min(n)-1 and na+nb-2
    assert(r._2 > 2.0 - 1e-9 && r._2 < 4.0 + 1e-9)
  }

  test("histogram percentile (a10/t17's form) equals percentile() exactly") {
    // the corpus computes exact percentiles from (value, count)
    // histograms + percentile()'s own closed-form interpolation so no
    // aggregate buffers a group's raw values; this pins the two forms
    // to each other bit-for-bit, including ties, interpolated
    // positions and the past-the-end upper neighbor
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val df = (1 to 3001).map(i =>
      (s"g${i % 3}", rnd.nextInt(37).toDouble)).toDF("g", "v")
    val direct = df.groupBy($"g")
      .agg(expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val h = df.groupBy($"g", $"v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum($"c").over(w))
      .withColumn("n", sum($"c").over(Window.partitionBy($"g")))
    def pct(p: Double, out: String) = {
      val pos = ($"n" - 1).cast("double") * p
      val k = floor(pos)
      val vLo = min(when($"cum" > k, $"v"))
      val vHi = coalesce(min(when($"cum" > k + 1, $"v")), min(when($"cum" > k, $"v")))
      (vLo + (min(pos) - floor(min(pos))) * (vHi - vLo)).as(out)
    }
    val hist = cum.groupBy($"g").agg(pct(0.5, "p50"), pct(0.9, "p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(hist === direct) // exact double equality, not a tolerance
  }

  test("o09 SCD2 merge: open rows reconstruct the new snapshot exactly") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("o09_scd2_merge")(spark, sf).cache()
    // at most one open row per key, and versions are {1} or {1,2}
    val perKey = out.groupBy("k").agg(
      sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"),
      count(lit(1)).as("n_rows"), max(col("version")).as("maxv"))
    assert(perKey.filter(col("n_open") > 1).count() === 0)
    assert(perKey.filter(col("n_rows") > 2).count() === 0)
    // the open rows ARE the new snapshot (keys and balances)
    val c = graft.sources.Tables.customer(graft.queries.Q.tune(spark), sf)
    val neu = c.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey").as("k"),
        (graft.queries.Q.cents(col("c_acctbal")) +
          when(col("c_custkey") % 7 === 0, 100L).otherwise(0L)).as("bal"))
    val open = out.filter(col("valid_to").isNull).select("k", "bal")
    assert(open.exceptAll(neu).count() === 0)
    assert(neu.exceptAll(open).count() === 0)
    // removed keys (in old, not new) end fully closed
    val removed = c.filter(col("c_custkey") % 10 =!= 0 && col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("k"))
    val openKeys = open.select("k")
    assert(removed.join(openKeys, Seq("k"), "left_semi").count() === 0)
    out.unpersist()
  }
}
