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
    // keep the rows-only list explicit so additions AND removals are
    // conscious choices. EMPTY since r15: p11 graduated the way a18
    // did in r12 — the RNG draw itself is engine-internal, so the
    // query emits the sampler's oracle-checkable invariants (Chernoff
    // count band, duplicate-freedom, domain subset, seed stability)
    // as booleans DuckDB asserts exactly. Every float-cosine query
    // mirrors the native double folds bit-exactly, and the fitted
    // pipelines (v05 probe, v07 IVF, v12 clusters) run on the integer
    // Lloyd plane (IntKMeans), oracle-checked.
    assert(noOracle === Set.empty[String])
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
