package graft

import graft.text.Inflect

/** The rule-generated inflection families behind the caption
  * language's `[WORD]` construct. Contract (Inflect's scaladoc):
  * over-generation is harmless (candidates absent from the corpus
  * match nothing), under-generation silently drops hits — so the
  * tests assert the family CONTAINS the real English forms and never
  * assert it contains nothing else. */
class InflectSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def fam(w: String): Set[String] = Inflect.expand(w).toSet

  test("a family always contains the query word itself") {
    for (w <- Seq("scan", "scanning", "merge", "dies", "tied", "x"))
      assert(fam(w).contains(w), s"[$w] lost the literal word")
  }

  test("regular verb families recover all four forms from any form") {
    val forms = Set("scan", "scans", "scanned", "scanning")
    for (w <- forms)
      assert(forms.subsetOf(fam(w)), s"[$w] missed ${forms -- fam(w)}")
  }

  test("e-drop lemmas round-trip (merge <-> merging/merged)") {
    val forms = Set("merge", "merges", "merged", "merging")
    for (w <- forms)
      assert(forms.subsetOf(fam(w)), s"[$w] missed ${forms -- fam(w)}")
  }

  test("short ies/ied words recover the e-lemma family (ADVICE r17 #4)") {
    // [dies]/[ties]/[tied] used to under-generate: the ies/ied rules
    // required length > 4, so the y-lemma guess never fired and the
    // e-lemma (die/tie) came only from the weaker es path
    assert(Set("die", "dies", "died", "dying").subsetOf(fam("dies")),
      s"[dies] -> ${fam("dies")}")
    assert(Set("tie", "ties", "tied", "tying").subsetOf(fam("ties")),
      s"[ties] -> ${fam("ties")}")
    assert(Set("tie", "ties", "tied", "tying").subsetOf(fam("tied")),
      s"[tied] -> ${fam("tied")}")
  }

  test("ie -> y gerunds generate from the lemma (die -> dying)") {
    assert(fam("die").contains("dying"))
    assert(fam("tie").contains("tying"))
  }

  test("y -> ies/ied families (carry/carries/carried/carrying)") {
    val forms = Set("carry", "carries", "carried", "carrying")
    for (w <- forms)
      assert(forms.subsetOf(fam(w)), s"[$w] missed ${forms -- fam(w)}")
  }

  test("consonant doubling recovers the short lemma (scanned -> scan)") {
    assert(fam("scanned").contains("scan"))
    assert(fam("scanning").contains("scan"))
    assert(fam("scan").contains("scanned") && fam("scan").contains("scanning"))
  }

  test("expansion is deterministic and sorted (oracle-SQL literal lists)") {
    for (w <- Seq("scanning", "merge", "dies")) {
      val a = Inflect.expand(w)
      assert(a === Inflect.expand(w))
      assert(a === a.sorted)
      assert(a.distinct === a)
    }
  }
}
