package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.text.PhraseSearch
import graft.text.PhraseSearch._

/** Property tests for the boolean query parser (SURVEY §3.3's
  * mini-language): any AST rendered with full parentheses must parse
  * back to itself, operators are case-insensitive, and precedence
  * (NOT > NEAR > AND > OR, left-associative) matches the grammar the
  * evaluator assumes. A parser drift would silently re-shape every
  * boolean caption query, so the round-trip is the load-bearing
  * property. Covers the r17 grammar: `[word]` inflection groups,
  * bare-word juxtaposition phrases, position-bearing-subtree NEAR
  * operands (chaining left), and `{n}` thresholds on any leaf. */
class PhraseParserSpec extends org.scalatest.funsuite.AnyFunSuite {

  // generators + renderer shared with PhraseIndexSpec's randomized
  // serve-parity audit (PhraseGen); words here must avoid reserved
  // operators and structural characters
  private val pool = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "fox", "golf", "hotel", "x1", "y2")

  private def samples[T](g: Gen[T], n: Int): Seq[T] = PhraseGen.samples(g, n)
  private val word: Gen[String] = PhraseGen.word(pool)
  private val phrase: Gen[Q] = PhraseGen.phrase(pool)
  private val infl: Gen[Q] = PhraseGen.infl(pool)
  private val minCount: Gen[Q] = PhraseGen.minCount(pool)
  private val near: Gen[Q] = PhraseGen.near(pool)
  private def tree(depth: Int): Gen[Q] = PhraseGen.tree(pool, depth)
  private def render(q: Q): String = PhraseGen.render(q)

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

  test("adjacent bare words are one phrase (the reference's inline spelling)") {
    // 'SEAN SPICER & [RESIGN]' (other_queries.py:251), 'STONEMAN
    // DOUGLAS' (stories.ipynb) — multi-word phrases need no quotes
    assert(parse("stoneman douglas") === Phrase(Seq("stoneman", "douglas")))
    assert(parse("sean spicer & [resign]") ===
      And(Phrase(Seq("sean", "spicer")), Infl("resign")))
    assert(parse("(parkland | stoneman douglas | florida) & shooting") ===
      And(Or(Or(Phrase(Seq("parkland")),
        Phrase(Seq("stoneman", "douglas"))), Phrase(Seq("florida"))),
        Phrase(Seq("shooting"))))
    // folding stops at operators, parens, brackets, quotes and counts
    assert(parse("a b AND c d") ===
      And(Phrase(Seq("a", "b")), Phrase(Seq("c", "d"))))
    assert(parse("a b{2}") === MinCount(Phrase(Seq("a", "b")), 2))
    // the unquoted and quoted spellings are the same AST
    assert(parse("slow scan") === parse("\"slow scan\""))
  }

  test("[word] is the inflection-group leaf") {
    assert(parse("[resign]") === Infl("resign"))
    assert(parse("[merging]{3}") === MinCount(Infl("merging"), 3))
    assert(parse("a & [scan] | b") ===
      Or(And(Phrase(Seq("a")), Infl("scan")), Phrase(Seq("b"))))
    assert(parse("NOT [scan]") === Not(Infl("scan")))
  }

  test("NEAR/k operands are position-bearing subtrees, tighter than AND") {
    assert(parse("(a NEAR/5 b) AND NOT c") ===
      And(Near(Phrase(Seq("a")), Phrase(Seq("b")), 5),
        Not(Phrase(Seq("c")))))
    // no parens needed: NEAR binds tighter than AND
    assert(parse("a NEAR/5 b AND c") ===
      And(Near(Phrase(Seq("a")), Phrase(Seq("b")), 5), Phrase(Seq("c"))))
    // phrase + wildcard operands; case-insensitive keyword
    assert(parse("\"slow scan\" near/3 merg*") ===
      Near(Phrase(Seq("slow", "scan")), Phrase(Seq("merg*")), 3))
    // OR-alternatives, [groups] and counts are position-bearing
    assert(parse("a NEAR/5 (b OR c)") ===
      Near(Phrase(Seq("a")),
        Or(Phrase(Seq("b")), Phrase(Seq("c"))), 5))
    assert(parse("[resign] NEAR/4 spicer{2}") ===
      Near(Infl("resign"), MinCount(Phrase(Seq("spicer")), 2), 4))
    // chains left: the surviving a-anchors are then checked against c
    assert(parse("a NEAR/5 b NEAR/3 c") ===
      Near(Near(Phrase(Seq("a")), Phrase(Seq("b")), 5),
        Phrase(Seq("c")), 3))
    // boolean operands have no positions to be near — rejected
    intercept[IllegalArgumentException](parse("(a AND b) NEAR/5 c"))
    intercept[IllegalArgumentException](parse("a NEAR/5 NOT b"))
    intercept[IllegalArgumentException](parse("a NEAR/5 (NOT b)"))
  }

  test("count threshold {n} wraps a leaf; dangling/invalid forms rejected") {
    assert(parse("spark{3}") === MinCount(Phrase(Seq("spark")), 3))
    assert(parse("\"slow scan\"{2} OR x") ===
      Or(MinCount(Phrase(Seq("slow", "scan")), 2), Phrase(Seq("x"))))
    intercept[IllegalArgumentException](parse("{3}"))
    intercept[IllegalArgumentException](parse("a AND {3}"))
  }

  test("& and | are the reference spellings of AND and OR") {
    assert(parse("a & b | c") ===
      Or(And(Phrase(Seq("a")), Phrase(Seq("b"))), Phrase(Seq("c"))))
    assert(parse("spark{3} & (merg* | \"slow scan\")") ===
      And(MinCount(Phrase(Seq("spark")), 3),
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
    // count-thresholded leaves and [groups] are position-bearing
    assert(parse("spark{2} & merge :: 9") ===
      Within(Seq(MinCount(Phrase(Seq("spark")), 2),
        Phrase(Seq("merge"))), 9))
    assert(parse("[resign] & sean spicer :: 20") ===
      Within(Seq(Infl("resign"), Phrase(Seq("sean", "spicer"))), 20))
    // the stories notebook's literal query string, verbatim
    assert(parse(
      "(PARKLAND | STONEMAN DOUGLAS | FLORIDA) & SHOOTING :: 60".toLowerCase) ===
      Within(Seq(
        Or(Or(Phrase(Seq("parkland")), Phrase(Seq("stoneman", "douglas"))),
          Phrase(Seq("florida"))),
        Phrase(Seq("shooting"))), 60))
    // NOT has no positions; the window must end the query
    intercept[IllegalArgumentException](parse("a & NOT b :: 5"))
    intercept[IllegalArgumentException](parse("a :: 5 OR b"))
  }

  test("trailing garbage is rejected, not silently dropped") {
    intercept[IllegalArgumentException](parse("a ) b"))
    intercept[IllegalArgumentException](parse("(a OR b) c)"))
  }

  test("trailing \\* escapes the wildcard star (exact literal-star token)") {
    assert(PhraseSearch.slotPrefix("merg*") === Some("merg"))
    assert(PhraseSearch.slotPrefix("merg\\*") === None)
    assert(PhraseSearch.slotExact("merg\\*") === "merg*")
    assert(PhraseSearch.slotPrefix("*") === None) // bare star: not a prefix
    assert(PhraseSearch.slotExact("plain") === "plain")
  }
}
