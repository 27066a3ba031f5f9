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
    // choices (r11/e02/a14 graduated to oracle-exact in round 5)
    assert(noOracle === Set("p11_random_sample",
      "v01_cosine_topk", "v02_lsh_buckets", "v03_near_dup_cosine",
      "v04_centroid_assign", "v05_logreg_score", "v06_knn_predict",
      "v07_ivf_topk", "a18_sketches"))
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
