package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** TokenEditDistance: the word-level alignment kernel behind t31
  * (reference transcript_alignment.py / TranscriptAligner). Checked
  * against hand-computed distances, an independent property (for
  * single-char tokens, word-level distance equals Spark's built-in
  * char-level levenshtein), and the metric axioms. */
class AlignSpec extends SparkSpec {
  import spark.implicits._

  private def d(a: Seq[String], b: Seq[String]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.tokenEditDistance(col("a"), col("b")).as("d"))
      .head().getLong(0)

  test("known distances") {
    assert(d(Seq("a", "b", "c"), Seq("a", "x", "c", "d")) === 2)
    assert(d(Seq("k"), Seq("k")) === 0)
    assert(d(Seq("x", "y"), Seq("y", "x")) === 2) // no transposition op
    assert(d(Seq.empty, Seq("k", "l")) === 2)
    assert(d(Seq("k", "l"), Seq.empty) === 2)
    assert(d(Seq.empty, Seq.empty) === 0)
    assert(d(Seq("the", "cat", "sat"), Seq("the", "dog", "sat")) === 1)
    // whole-token substitution costs 1 regardless of token length
    assert(d(Seq("internationalization"), Seq("i18n")) === 1)
  }

  test("single-char tokens reduce to char-level levenshtein") {
    val cases = Seq(("kitten", "sitting"), ("flaw", "lawn"),
      ("abcdefg", "bcdefgh"), ("aaaa", "abab"), ("", "abc"))
    val df = cases.toDF("s1", "s2")
      .select(
        GraftFunctions.tokenEditDistance(
          split(col("s1"), ""), split(col("s2"), "")).as("tok"),
        levenshtein(col("s1"), col("s2")).cast("long").as("chr"))
    assert(df.filter(col("tok") =!= col("chr")).count() === 0)
  }

  test("metric axioms on fixture texts") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(8).select(split(col("text"), " ").as("t"))
      .collect().map(_.getSeq[String](0))
    for (a <- docs; b <- docs) {
      val ab = d(a, b)
      assert(ab === d(b, a)) // symmetry
      assert((ab == 0) === (a == b)) // identity
      assert(ab <= math.max(a.length, b.length)) // upper bound
      assert(ab >= math.abs(a.length - b.length)) // length lower bound
    }
  }

  test("matches a brute-force recursive reference on random sequences") {
    // independent implementation: plain memoized recursion over the
    // textbook recurrence — if both agree across random inputs, a DP
    // indexing bug (the classic off-by-one in the row swap) can't hide
    def ref(a: Seq[String], b: Seq[String]): Int = {
      val memo = collection.mutable.Map.empty[(Int, Int), Int]
      def go(i: Int, j: Int): Int = memo.getOrElseUpdate((i, j),
        if (i == 0) j else if (j == 0) i
        else math.min(math.min(go(i - 1, j) + 1, go(i, j - 1) + 1),
          go(i - 1, j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)))
      go(a.length, b.length)
    }
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "d", "ee")
    val cases = Seq.fill(60) {
      val n = rnd.nextInt(9); val m = rnd.nextInt(9)
      (Seq.fill(n)(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(m)(vocab(rnd.nextInt(vocab.size))))
    }
    val got = cases.toDF("a", "b")
      .select(GraftFunctions.tokenEditDistance(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => ref(a, b).toLong }
    assert(got.toSeq === want)
  }

  test("retimeWords partitions each segment exactly (t33 law)") {
    // For every (pair, doc): word cues are contiguous (ws of word j+1
    // equals we of word j), the first starts at the segment start, the
    // last ends at the segment end — integer interpolation drops no
    // millisecond and double-books none.
    val docs = Seq(
      (3L, "the quick brown fox jumps"),
      (7L, "one two three"),
      (9L, "solo")).toDF("doc_id", "text")
    val pairs = Seq((3L, 7L), (7L, 9L), (9L, 3L)).toDF("d1", "d2")
    val rt = graft.text.TextOps.retimeWords(pairs, docs, segMs = 60000L)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("d1", "d2").orderBy("w")
    val gaps = rt.withColumn("nxt", lead(col("ws_ms"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("we_ms"))
    assert(gaps.count() === 0)
    val bounds = rt.groupBy("d1", "d2")
      .agg(min(col("ws_ms")).as("lo"), max(col("we_ms")).as("hi"))
      .filter(col("lo") =!= col("d1") * 60000L ||
        col("hi") =!= (col("d1") + 1) * 60000L)
    assert(bounds.count() === 0)
  }

  test("registered as SQL function token_edit_distance") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT token_edit_distance(array('a','b'), array('a','c')) AS d")
      .head().getLong(0)
    assert(r === 1)
  }
}
