package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.text.PhraseSearch
import graft.text.PhraseSearch._

/** Property tests for the boolean query parser (SURVEY §3.3's
  * mini-language): any AST rendered with full parentheses must parse
  * back to itself, operators are case-insensitive, and precedence
  * (NOT > AND > OR, left-associative) matches the grammar the
  * evaluator assumes. A parser drift would silently re-shape every
  * boolean caption query, so the round-trip is the load-bearing
  * property. */
class PhraseParserSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** Deterministic sampling (no scalatest-scalacheck bridge in the
    * offline cache): draw `n` values from `g` across fixed seeds. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(42L + i)))

  // words must avoid reserved operators and structural characters
  private val word: Gen[String] =
    Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "x1", "y2")

  private val phrase: Gen[Q] = for {
    n  <- Gen.choose(1, 3)
    ws <- Gen.listOfN(n, word)
  } yield Phrase(ws)

  private val near: Gen[Q] = for {
    Phrase(a) <- phrase; Phrase(b) <- phrase; k <- Gen.choose(1, 20)
  } yield Near(a, b, k)

  private val minCount: Gen[Q] = for {
    Phrase(ws) <- phrase; n <- Gen.choose(1, 5)
  } yield MinCount(ws, n)

  private def tree(depth: Int): Gen[Q] =
    if (depth <= 0) phrase
    else Gen.frequency(
      3 -> phrase,
      1 -> near,
      1 -> minCount,
      2 -> (for { l <- tree(depth - 1); r <- tree(depth - 1) } yield And(l, r)),
      2 -> (for { l <- tree(depth - 1); r <- tree(depth - 1) } yield Or(l, r)),
      1 -> tree(depth - 1).map(Not(_)))

  private def renderLeaf(ws: Seq[String]): String =
    if (ws.size == 1) ws.head else "\"" + ws.mkString(" ") + "\""

  /** Fully parenthesized rendering — structure-preserving by
    * construction, so parse(render(q)) must equal q exactly. */
  private def render(q: Q): String = q match {
    case Phrase(ws)       => renderLeaf(ws)
    case Near(a, b, k)    => s"(${renderLeaf(a)} NEAR/$k ${renderLeaf(b)})"
    case MinCount(ws, n)  => s"${renderLeaf(ws)}{$n}"
    case And(l, r)        => s"(${render(l)} AND ${render(r)})"
    case Or(l, r)         => s"(${render(l)} OR ${render(r)})"
    case Not(x)           => s"(NOT ${render(x)})"
  }

  test("parse is a left inverse of fully-parenthesized rendering (500 random ASTs)") {
    val qs = samples(tree(4), 500)
    assert(qs.size === 500)
    qs.foreach { q =>
      assert(PhraseSearch.parse(render(q)) === q, s"round-trip failed for: ${render(q)}")
    }
  }

  test("operators are case-insensitive") {
    assert(parse("a and b") === And(Phrase(Seq("a")), Phrase(Seq("b"))))
    assert(parse("a Or not b") ===
      Or(Phrase(Seq("a")), Not(Phrase(Seq("b")))))
  }

  test("precedence: NOT > AND > OR; AND/OR left-associative") {
    assert(parse("a OR b AND c") ===
      Or(Phrase(Seq("a")), And(Phrase(Seq("b")), Phrase(Seq("c")))))
    assert(parse("NOT a AND b") ===
      And(Not(Phrase(Seq("a"))), Phrase(Seq("b"))))
    assert(parse("a AND b AND c") ===
      And(And(Phrase(Seq("a")), Phrase(Seq("b"))), Phrase(Seq("c"))))
    assert(parse("a OR b OR c") ===
      Or(Or(Phrase(Seq("a")), Phrase(Seq("b"))), Phrase(Seq("c"))))
  }

  test("bare words do not swallow parens; quoted phrases keep spaces") {
    assert(parse("(dog)") === Phrase(Seq("dog")))
    assert(parse("""("slow scan" OR cat)""") ===
      Or(Phrase(Seq("slow", "scan")), Phrase(Seq("cat"))))
  }

  test("NEAR/k is a proximity construct between leaves, tighter than AND") {
    assert(parse("(a NEAR/5 b) AND NOT c") ===
      And(Near(Seq("a"), Seq("b"), 5), Not(Phrase(Seq("c")))))
    // no parens needed: NEAR binds tighter than AND
    assert(parse("a NEAR/5 b AND c") ===
      And(Near(Seq("a"), Seq("b"), 5), Phrase(Seq("c"))))
    // phrase + wildcard operands; case-insensitive keyword
    assert(parse("\"slow scan\" near/3 merg*") ===
      Near(Seq("slow", "scan"), Seq("merg*"), 3))
    // boolean operands have no positions to be near — rejected
    intercept[IllegalArgumentException](parse("(a AND b) NEAR/5 c"))
    intercept[IllegalArgumentException](parse("a NEAR/5 (b OR c)"))
  }

  test("count threshold {n} wraps a leaf; dangling/invalid forms rejected") {
    assert(parse("spark{3}") === MinCount(Seq("spark"), 3))
    assert(parse("\"slow scan\"{2} OR x") ===
      Or(MinCount(Seq("slow", "scan"), 2), Phrase(Seq("x"))))
    intercept[IllegalArgumentException](parse("{3}"))
    intercept[IllegalArgumentException](parse("a AND {3}"))
  }

  test("& and | are the reference spellings of AND and OR") {
    assert(parse("a & b | c") ===
      Or(And(Phrase(Seq("a")), Phrase(Seq("b"))), Phrase(Seq("c"))))
    assert(parse("spark{3} & (merg* | \"slow scan\")") ===
      And(MinCount(Seq("spark"), 3),
        Or(Phrase(Seq("merg*")), Phrase(Seq("slow", "scan")))))
  }

  test(":: k wraps the top-level conjunction (the reference notebooks' spelling)") {
    // 'MOSUL & (BATTLE | SIEGE) :: 60' — stories.ipynb's key-phrase form
    assert(parse("mosul & (battle | siege) :: 60") ===
      Within(Seq(Phrase(Seq("mosul")),
        Or(Phrase(Seq("battle")), Phrase(Seq("siege")))), 60))
    assert(parse("hurricane & irma ::30") ===
      Within(Seq(Phrase(Seq("hurricane")), Phrase(Seq("irma"))), 30))
    // a single conjunct has nothing to be near — the window is vacuous
    assert(parse("hurricane :: 30") === Phrase(Seq("hurricane")))
    // count-thresholded leaves are position-bearing conjuncts
    assert(parse("spark{2} & merge :: 9") ===
      Within(Seq(MinCount(Seq("spark"), 2), Phrase(Seq("merge"))), 9))
    // NOT has no positions; the window must end the query
    intercept[IllegalArgumentException](parse("a & NOT b :: 5"))
    intercept[IllegalArgumentException](parse("a :: 5 OR b"))
  }

  test("trailing \\* escapes the wildcard star (exact literal-star token)") {
    assert(PhraseSearch.slotPrefix("merg*") === Some("merg"))
    assert(PhraseSearch.slotPrefix("merg\\*") === None)
    assert(PhraseSearch.slotExact("merg\\*") === "merg*")
    assert(PhraseSearch.slotPrefix("*") === None) // bare star: not a prefix
    assert(PhraseSearch.slotExact("plain") === "plain")
  }
}
