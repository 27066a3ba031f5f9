package graft

/** Testdata schema-drift gate.
  *
  * The driver CAN regenerate /root/testdata between rounds — round 9's
  * regen flipped `events.ts` from int64 nanoseconds to parquet
  * timestamp[us] and crashed 39 queries, and the break surfaced only as
  * scattered downstream AnalysisExceptions. This suite pins the
  * Spark-visible dtype of every column of all 10 tables at sf0.001, so
  * the next drift fails ONE assertion that names the drifted column.
  *
  * `events.ts` itself is dtype-adaptive in the engine (Fns.tsSec handles
  * both LONG nanos and TIMESTAMP/_NTZ) — a red row here for ts means
  * "check Fns.tsSec covers the new type", not necessarily "broken".
  */
class SchemaGateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val expected: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("testdata dtypes match the generation this engine was verified against") {
    val drifts = expected.flatMap { case (t, cols) =>
      val actual = spark.read.parquet(s"$sf/$t.parquet").schema
        .map(f => f.name -> f.dataType.simpleString)
      val a = actual.toMap
      val e = cols.toMap
      val order =
        if (actual.map(_._1) == cols.map(_._1)) Nil
        else Seq(s"$t: column order/set drifted — expected " +
          s"${cols.map(_._1).mkString(",")} got ${actual.map(_._1).mkString(",")}")
      order ++ (cols.map(_._1) ++ actual.map(_._1)).distinct.flatMap {
        case c if !a.contains(c) => Some(s"$t.$c: MISSING (expected ${e(c)})")
        case c if !e.contains(c) => Some(s"$t.$c: NEW column (${a(c)})")
        case c if a(c) != e(c) =>
          Some(s"$t.$c: dtype drifted ${e(c)} -> ${a(c)}")
        case _ => None
      }
    }
    assert(drifts.isEmpty,
      "TESTDATA SCHEMA DRIFT (driver regenerated parquet?):\n" +
        drifts.mkString("\n"))
  }

  test("Fns.tsSec yields the same epoch second for all three ts dtypes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sec = 1700000123L
    val asNanos = Seq((1L, sec * 1000000000L + 456789012L)).toDF("id", "ts")
    val asLtz = Seq((1L, new java.sql.Timestamp(sec * 1000L + 456L)))
      .toDF("id", "ts")
    val asNtz = Seq((1L,
      java.time.LocalDateTime.ofEpochSecond(sec, 456789012,
        java.time.ZoneOffset.UTC))).toDF("id", "ts")
    val prev = spark.conf.getOption("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try Seq(asNanos, asLtz, asNtz).foreach { df =>
      val got = df.select(graft.functions.Fns.tsSec(df).as("s"))
        .as[Long].head()
      assert(got === sec,
        s"tsSec(${df.schema("ts").dataType.simpleString}) = $got, want $sec")
    } finally prev.foreach(spark.conf.set("spark.sql.session.timeZone", _))
  }

  test("Fns.tsSec fails loudly on an unsupported ts dtype") {
    import spark.implicits._
    val df = Seq((1L, "not-a-time")).toDF("id", "ts")
    val e = intercept[IllegalArgumentException](graft.functions.Fns.tsSec(df))
    assert(e.getMessage.contains("unsupported dtype"))
  }
}
