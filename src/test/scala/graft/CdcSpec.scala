package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Content-defined chunking laws ([[graft.plans.CdcChunks]]):
  * reconstruction (concatenating the chunks yields the input),
  * equality with a naive per-position fresh-fold reference (pins the
  * sliding-window hash identity the DuckDB oracle relies on), codepoint
  * correctness on multi-byte text, and the property the operator
  * exists for — shift resistance: an insertion at the head reshapes
  * only O(1) chunks, every later boundary lands on the same content. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L

  /** Naive reference: fresh O(w) fold per cut position. */
  private def refChunks(t: String, w: Int, d: Long): Seq[String] = {
    val cps = t.codePoints.toArray
    val n = cps.length
    if (n <= w) return Seq(t)
    def win(p: Int): Long = {
      var h = 0L
      var j = p - w
      while (j < p) { h = (h * 31 + cps(j)) % M; j += 1 }
      h
    }
    val cuts = (w until n).filter(p => win(p) % d == 0)
    val bounds = 0 +: cuts :+ n
    bounds.sliding(2).map { case Seq(a, b) => new String(cps, a, b - a) }.toSeq
  }

  private def sparkChunks(texts: Seq[String], w: Int, d: Long): Seq[Seq[String]] =
    texts.toDF("text")
      .select(TextOps.cdcChunks(col("text"), w, d).as("ch"))
      .as[Seq[String]].collect().toSeq

  test("chunks reconstruct the input and match the fresh-fold reference") {
    val rnd = new scala.util.Random(991)
    val alpha = "abcdefgh ijkl"
    val texts = Seq("", "x", "short") ++ Seq.fill(40) {
      val len = rnd.nextInt(400)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val got = sparkChunks(texts, 8, 64L)
    texts.zip(got).foreach { case (t, ch) =>
      assert(ch.mkString === t, s"chunks do not reconstruct: '$t'")
      assert(ch === refChunks(t, 8, 64L), s"reference mismatch on '$t'")
    }
  }

  test("chunk boundaries are codepoint-correct on multi-byte text") {
    val rnd = new scala.util.Random(313)
    val alpha = "aé€𝄞 z" // 1-, 2-, 3-, 4-byte codepoints
    val cps = alpha.codePoints.toArray
    val texts = Seq.fill(20) {
      val len = rnd.nextInt(200)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    val got = sparkChunks(texts, 4, 16L)
    texts.zip(got).foreach { case (t, ch) =>
      assert(ch.mkString === t)
      assert(ch === refChunks(t, 4, 16L))
    }
  }

  test("adversarial constant-content input stays O(len) and reconstructs") {
    // a run of one repeated char makes every window hash identical, so
    // the chunker either cuts at EVERY position (1-char chunks) or
    // never — both extremes must stay linear in the input and
    // reconstruct. 'a'*n window hash is content-dependent; try several
    // chars so both branches execute.
    val texts = Seq("a", "b", "c", "d", "e", " ").map(_ * 500)
    val got = sparkChunks(texts, 8, 4L)
    texts.zip(got).foreach { case (t, ch) =>
      assert(ch.mkString === t)
      assert(ch === refChunks(t, 8, 4L))
      assert(ch.size <= t.length, "more chunks than characters")
    }
    // at least one char class should hit the cut-everywhere branch at
    // divisor 4 (probability a given hash misses 0 mod 4 six times in
    // a row is tiny); if none did, the fixture stopped exercising it
    assert(got.exists(_.size > 400) || got.forall(_.size == 1),
      "constant-content fixture exercised neither extreme")
  }

  test("an insertion at the head reshapes only O(1) chunks (shift resistance)") {
    val rnd = new scala.util.Random(577)
    val alpha = "abcdefgh ijkl"
    val t = (0 until 3000).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val Seq(a, b) = sparkChunks(Seq(t, "INSERTED " + t), 8, 64L)
    assert(a.size >= 20, s"fixture produced only ${a.size} chunks - widen it")
    // every boundary past the first post-insertion window position is
    // content-identical: the chunk LISTS share all but a bounded head
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(common >= a.size - 3,
      s"only $common of ${a.size} trailing chunks survive a 9-char head insertion")
    // a fixed-width 64-char splitter would share ZERO chunks here (every
    // boundary shifts by 9); content-defined cutting shares almost all
  }
}
