package graft

/** Driver-contract smoke: entry() answers on sf0.001 and every declared
  * query runs there without throwing (the t1 gate, BASELINE.md). */
class SmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle or is deliberately rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep the rows-only list explicit so additions are conscious
    // choices. Only the genuinely engine-specific pipelines remain:
    // Spark's RNG (p11), HLL/quantile sketch internals (a18), MLlib
    // LBFGS (v05) and KMeans (v07, and v12's cluster browser on top
    // of it). Every float-cosine query mirrors the native double
    // folds bit-exactly and is oracle-checked.
    assert(noOracle === Set("p11_random_sample", "a18_sketches",
      "v05_logreg_score", "v07_ivf_topk", "v12_kmeans_clusters"))
  }

  test("all queries execute at sf0.001") {
    val failures =
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
      }
      // x05 turns auto-banding on for its own execution; don't leak it
      // into later suites sharing the JVM-wide session
      finally spark.conf.set("spark.graft.autoband.width", "0")
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
