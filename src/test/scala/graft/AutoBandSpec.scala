package graft

import org.apache.spark.sql.catalyst.plans.logical.Generate
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols

/** The auto-banding optimizer rule: a plain interval overlap join is
  * rewritten to the banded (working-window) form when
  * spark.graft.autoband.width is set, with identical results on a
  * skewed-key fixture. */
class AutoBandSpec extends SparkSpec {
  import spark.implicits._
  private val C = Cols("k", "s", "e")

  test("plain overlap join is auto-banded with identical results") {
    graft.plans.AutoBand.install(spark)
    val rnd = new scala.util.Random(7)
    def gen() = Seq.fill(400) {
      // skew: key 1 holds ~40% of all intervals
      val k = if (rnd.nextInt(5) < 2) 1L else 2L + rnd.nextInt(3)
      val s = rnd.nextInt(2000).toLong
      (k, s, s + 1 + rnd.nextInt(200))
    }.toDF("k", "s", "e")
    val a = gen().cache(); val b = gen().cache()

    spark.conf.set("spark.graft.autoband.width", "0")
    val plain = IntervalOps.overlaps(a, b, C)
      .as[(Long, Long, Long)].collect().sorted.toList

    spark.conf.set("spark.graft.autoband.width", "128")
    try {
      val df = IntervalOps.overlaps(a, b, C)
      val banded = df.as[(Long, Long, Long)].collect().sorted.toList
      // the rewrite actually fired: both sides got band-exploded
      assert(df.queryExecution.optimizedPlan
        .collect { case g: Generate => g }.size === 2)
      assert(banded === plain)
    } finally spark.conf.set("spark.graft.autoband.width", "0")
  }

  test("width=auto derives the band width from ANALYZE'd column stats") {
    graft.plans.AutoBand.install(spark)
    val rnd = new scala.util.Random(11)
    def gen() = Seq.fill(300) {
      val k = if (rnd.nextInt(5) < 2) 1L else 2L + rnd.nextInt(3)
      val s = rnd.nextInt(4000).toLong
      (k, s, s + 1 + rnd.nextInt(150))
    }.toDF("k", "s", "e")
    gen().write.mode("overwrite").saveAsTable("autoband_a")
    gen().write.mode("overwrite").saveAsTable("autoband_b")
    spark.sql("ANALYZE TABLE autoband_a COMPUTE STATISTICS FOR COLUMNS k, s, e")
    spark.sql("ANALYZE TABLE autoband_b COMPUTE STATISTICS FOR COLUMNS k, s, e")
    val a = spark.table("autoband_a"); val b = spark.table("autoband_b")

    spark.conf.set("spark.graft.autoband.width", "0")
    val plain = IntervalOps.overlaps(a, b, C)
      .as[(Long, Long, Long)].collect().sorted.toList
    try {
      // attributeStats only propagate under CBO
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.autoband.width", "auto")
      val df = IntervalOps.overlaps(a, b, C)
      val banded = df.as[(Long, Long, Long)].collect().sorted.toList
      assert(df.queryExecution.optimizedPlan
        .collect { case g: Generate => g }.size === 2)
      assert(banded === plain)

      // without stats the rule must leave the join alone, not band blind
      val aRaw = gen().cache(); val bRaw = gen().cache()
      val rawDf = IntervalOps.overlaps(aRaw, bRaw, C)
      rawDf.write.format("noop").mode("overwrite").save()
      assert(rawDf.queryExecution.optimizedPlan
        .collect { case g: Generate => g }.isEmpty)
    } finally {
      spark.conf.set("spark.graft.autoband.width", "0")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS autoband_a")
      spark.sql("DROP TABLE IF EXISTS autoband_b")
    }
  }
}
