package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions
import graft.text.TextOps

/** Native rolling-hash expression: bit-equality with the HOF fold it
  * replaced, SQL registration, null handling. */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "",
    "a",
    "hello world",
    "the quick brown fox jumps over the lazy dog 42 !?",
    "tabs\tand\nnewlines",
    "café résumé",        // latin-1 supplement
    "こんにちは",    // BMP multibyte
    "x" * 5000)

  test("rolling_hash equals the aggregate/transform/split HOF fold") {
    val df = samples.toDF("text")
    val rows = df.select(
        TextOps.fingerprint($"text").as("native"),
        TextOps.fingerprintHof($"text").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("rolling_hash SQL function and null propagation") {
    GraftFunctions.register(spark)
    val viaSql = Seq("hello world").toDF("t")
      .selectExpr("rolling_hash(t)").as[Long].head()
    val expected = Seq("hello world").toDF("t")
      .select(TextOps.fingerprintHof($"t")).as[Long].head()
    assert(viaSql === expected)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .selectExpr("rolling_hash(t)").collect().head
    assert(nullRow.isNullAt(0))
  }

  test("shingles equals the window-function form (incl. edge cases)") {
    import org.apache.spark.sql.expressions.Window
    val docs = (Seq(
      (1L, "a b c d e"),
      (2L, "a b"),            // shorter than k -> no shingles
      (3L, ""),               // empty text
      (4L, "x  y z w"),       // doubled space -> empty token kept
      (5L, "a b c a b c a b c")) ++ // repeats collapse via distinct
      (6L to 40L).map(i => (i, s"tok$i " * (i % 7).toInt + "tail end cap")))
      .toDF("doc_id", "text")
    val native = TextOps.shingles(docs, 3)
      .as[(Long, String)].collect().sorted.toList
    // reference: posexplode + lead window (the round-2 implementation)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val windowed = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .withColumn("sh", concat_ws(" ",
        (0 until 3).map(i => lead($"tok", i).over(w)): _*))
      .filter(size(split($"sh", " ")) === 3)
      .select($"doc_id", $"sh").distinct()
      .as[(Long, String)].collect().sorted.toList
    assert(native === windowed)
  }

  test("rolling_hash matches under codegen over a real column scan") {
    // wide enough that whole-stage codegen (not interpreted fallback)
    // is exercised; compare the two forms over distinct shingle-ish rows
    val df = (0 until 2000)
      .map(i => s"token$i next$i last$i").toDF("sh")
    val mismatches = df.select(
        TextOps.fingerprint($"sh").as("a"), TextOps.fingerprintHof($"sh").as("b"))
      .filter($"a" =!= $"b").count()
    assert(mismatches === 0L)
  }
}
