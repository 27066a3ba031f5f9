package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.text.PhraseSearch._

/** Shared random caption-query AST generator + structure-preserving
  * renderer, parameterized by word pool so the grammar round-trip
  * (PhraseParserSpec, operator-safe fantasy words) and the randomized
  * serve-parity audit (PhraseIndexSpec, corpus vocabulary + an absent
  * word) draw from the same construct distribution. Deterministic
  * seeded sampling — no scalatest-scalacheck bridge in the offline
  * cache. */
object PhraseGen {

  /** Draw `n` values from `g` across fixed seeds. */
  def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(42L + i)))

  def word(pool: Seq[String]): Gen[String] = Gen.oneOf(pool)

  def phrase(pool: Seq[String]): Gen[Q] = for {
    n  <- Gen.choose(1, 3)
    ws <- Gen.listOfN(n, word(pool))
  } yield Phrase(ws)

  def infl(pool: Seq[String]): Gen[Q] = word(pool).map(Infl(_))

  /** A leaf a `{n}` threshold can bind to (counts wrap leaves). */
  def countable(pool: Seq[String]): Gen[Q] =
    Gen.frequency(3 -> phrase(pool), 1 -> infl(pool))

  def minCount(pool: Seq[String]): Gen[Q] = for {
    q <- countable(pool); n <- Gen.choose(1, 5)
  } yield MinCount(q, n)

  /** Position-bearing operand trees for NEAR (words, [groups], counts,
    * OR-alternatives, nested NEAR — never NOT/AND). */
  def posTree(pool: Seq[String], depth: Int): Gen[Q] =
    if (depth <= 0)
      Gen.frequency(4 -> phrase(pool), 1 -> infl(pool), 1 -> minCount(pool))
    else Gen.frequency(
      3 -> phrase(pool),
      1 -> infl(pool),
      1 -> minCount(pool),
      1 -> (for { l <- posTree(pool, depth - 1); r <- posTree(pool, depth - 1) }
        yield Or(l, r)),
      1 -> (for { l <- posTree(pool, depth - 1); r <- posTree(pool, depth - 1);
                  k <- Gen.choose(1, 20) } yield Near(l, r, k)))

  def near(pool: Seq[String]): Gen[Q] = for {
    l <- posTree(pool, 1); r <- posTree(pool, 1); k <- Gen.choose(1, 20)
  } yield Near(l, r, k)

  def tree(pool: Seq[String], depth: Int): Gen[Q] =
    if (depth <= 0) Gen.frequency(4 -> phrase(pool), 1 -> infl(pool))
    else Gen.frequency(
      3 -> phrase(pool),
      1 -> infl(pool),
      1 -> near(pool),
      1 -> minCount(pool),
      2 -> (for { l <- tree(pool, depth - 1); r <- tree(pool, depth - 1) }
        yield And(l, r)),
      2 -> (for { l <- tree(pool, depth - 1); r <- tree(pool, depth - 1) }
        yield Or(l, r)),
      1 -> tree(pool, depth - 1).map(Not(_)))

  def renderWords(ws: Seq[String]): String =
    if (ws.size == 1) ws.head else "\"" + ws.mkString(" ") + "\""

  /** Fully parenthesized rendering — structure-preserving by
    * construction, so parse(render(q)) must equal q exactly. Count
    * thresholds only wrap leaves, matching the grammar. */
  def render(q: Q): String = q match {
    case Phrase(ws)      => renderWords(ws)
    case Infl(w)         => s"[$w]"
    case MinCount(x, n)  => s"${render(x)}{$n}"
    case Near(a, b, k)   => s"(${render(a)} NEAR/$k ${render(b)})"
    case And(l, r)       => s"(${render(l)} AND ${render(r)})"
    case Or(l, r)        => s"(${render(l)} OR ${render(r)})"
    case Not(x)          => s"(NOT ${render(x)})"
  }
}
