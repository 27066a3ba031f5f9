package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** 100 TB storage-layout proofs (SURVEY §7.4): bucketing removes the
  * join shuffle; hive partitioning prunes the scan. These are plan
  * assertions, not just result checks — the properties that matter at
  * 1000 executors are visible in the physical plan at any scale. */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  /** Run `body` with AQE off so exchanges appear as plain
    * ShuffleExchangeExec nodes instead of query-stage wrappers. */
  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bucketed interval tables join and aggregate with zero shuffles") {
    val rnd = new scala.util.Random(5)
    def gen() = Seq.fill(500) {
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(20).toLong, s, s + 1 + rnd.nextInt(60))
    }.toDF("k", "s", "e")
    Tables.writeBucketed(gen(), "graft_bucket_a", "k", 4, Seq("k", "s"))
    Tables.writeBucketed(gen(), "graft_bucket_b", "k", 4, Seq("k", "s"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withoutAqe {
      val a = spark.table("graft_bucket_a")
      val b = spark.table("graft_bucket_b")
        .select($"k".as("k2"), $"s".as("bs"), $"e".as("be"))
      val joined = a.join(b, $"k" === $"k2" && $"bs" < $"e" && $"be" > $"s")
        .groupBy($"k").agg(count(lit(1)).as("n"))
      assert(shuffles(joined) === 0, "bucketed join+agg must reuse the disk layout")
      // same pipeline over unbucketed data shuffles (the assertion bites)
      val pa = gen(); val pb = gen()
        .select($"k".as("k2"), $"s".as("bs"), $"e".as("be"))
      val plain = pa.join(pb, $"k" === $"k2" && $"bs" < $"e" && $"be" > $"s")
        .groupBy($"k").agg(count(lit(1)).as("n"))
      assert(shuffles(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("salted two-phase aggregation equals direct aggregation on a hot key") {
    // the classic skew mitigation: pre-aggregate on (key, salt) so the
    // hot key's rows spread over N reducers, then combine the partials
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(4000) {
      val k = if (rnd.nextInt(10) < 8) 1L else 2L + rnd.nextInt(5) // 80% on key 1
      (k, rnd.nextInt(100).toLong)
    }.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = df
      .withColumn("salt", pmod(xxhash64($"v", monotonically_increasing_id()), lit(16)))
      .groupBy($"k", $"salt")
      .agg(sum($"v").as("pt"), count(lit(1)).as("pn"))
      .groupBy($"k")
      .agg(sum($"pt").as("total"), sum($"pn").as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted === direct)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val prev = Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // the downstream groupBy re-shuffles anyway; without force, AQE
    // vetoes the split because it would add an exchange
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rnd = new scala.util.Random(23)
      // one pathological key holding ~95% of the left side; the random
      // payload keeps the shuffle blocks from compressing away
      val left = Seq.fill(30000) {
        val k = if (rnd.nextInt(20) < 19) 1L else 2L + rnd.nextInt(8)
        (k, rnd.nextInt(100000).toLong,
          Seq.fill(8)(rnd.nextLong().toHexString).mkString("-"))
      }.toDF("k", "v", "payload")
      val right = (1L to 10L).map(k => (k, s"dim_$k")).toDF("k2", "name")
      // the payload aggregate keeps the wide column alive through the
      // join shuffle (column pruning would otherwise strip the left
      // side to an 8-byte key that compresses below the skew threshold)
      val joined = left.join(right, $"k" === $"k2")
        .groupBy($"name")
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join marker in plan:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("hive partitioning prunes the scan to the filtered partitions") {
    val tmp = "/tmp/graft_part_events"
    val df = (0 until 1000).map { i =>
      (i.toLong, Seq("click", "view", "purchase")(i % 3), i % 12)
    }.toDF("id", "event_type", "month")
    Tables.writePartitioned(df, tmp, Seq("event_type", "month"))
    val read = spark.read.parquet(tmp)
      .filter($"event_type" === "click" && $"month" === 3)
    assert(read.count() === (0 until 1000)
      .count(i => i % 3 === 0 && i % 12 === 3))
    // both equality predicates became partition filters (pruned before
    // any file is read) and the scan reads only the one surviving
    // column. Assert on the scan NODE, not the plan string: the
    // rendered metadata truncates at spark.sql.maxMetadataStringLength
    // (100 chars), and in a long-lived suite JVM six-digit expression
    // ids push the second filter past the cutoff — a string match
    // here fails only in full runs, after enough queries have minted
    // enough attribute ids (exactly how it bit in r14).
    val scans = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1)
    val pf = scans.head.partitionFilters.map(_.sql).mkString(" AND ")
    assert(pf.contains("event_type = 'click'") || pf.contains("event_type = click"),
      s"event_type equality not a partition filter: $pf")
    assert(pf.contains("month = 3"), s"month equality not a partition filter: $pf")
    assert(scans.head.dataFilters.isEmpty,
      "partition predicates leaked into data filters")
    assert(scans.head.requiredSchema.fieldNames.toSeq === Seq("id"),
      s"scan reads more than the surviving column: ${scans.head.requiredSchema}")
  }
}
