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
}
