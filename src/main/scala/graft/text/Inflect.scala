package graft.text

/** Rule-generated English inflection families for the caption query
  * language's `[WORD]` construct (the reference expands a bracketed
  * lemma to its inflection set through its caption index's lexicon —
  * `query_search('SEAN SPICER & [RESIGN]')`,
  * app/esper/queries/other_queries.py:251; the index language's
  * inflection-group token). The reference backs the expansion with a
  * morphology dictionary inside the prebuilt index; this is the
  * public, dependency-free stand-in: a deterministic suffix rule set
  * generates the CANDIDATE family (lemmatize the query word, then
  * conjugate every candidate lemma), and matching against the corpus
  * vocabulary discards the over-generated members — over-generation
  * is harmless (a candidate absent from the corpus matches nothing)
  * while under-generation would silently drop hits, so the rules err
  * wide.
  *
  * The family is closed and deterministic (pure string rules, sorted
  * output), which is what lets a query's oracle SQL bake the SAME
  * literal word list: both engines then match byte-identical
  * vocabularies. Serving is the exact-word path: every candidate is a
  * plain token, so the served index prunes to the candidates' hash
  * buckets STATICALLY (plan-time partition elimination — stronger
  * than the wildcard path's runtime DPP, which exists because a
  * prefix's vocabulary is unknown until the lexicon scan).
  */
object Inflect {

  /** Candidate lemmas of a query word: the word itself plus
    * suffix-strip guesses (ing/ed/ies/es/s with e-restoration and
    * consonant un-doubling). `scanning` -> {scanning, scann, scanne,
    * scan}; `merging` -> {merging, merg, merge}. */
  private[text] def lemmas(w: String): Seq[String] = {
    def undouble(b: String): Seq[String] =
      if (b.length > 2 && b.last == b(b.length - 2)) Seq(b.dropRight(1))
      else Seq.empty
    val guesses =
      if (w.endsWith("ing") && w.length > 4) {
        val b = w.dropRight(3); Seq(b, b + "e") ++ undouble(b)
      } else if (w.endsWith("ied") && w.length > 3)
        // additive with the ed-style guesses: short words like `tied`
        // need the e-lemma (`tie`), not just the y-lemma (`ty`) —
        // over-generation is discarded by corpus-vocabulary matching
        Seq(w.dropRight(3) + "y", w.dropRight(2), w.dropRight(2) + "e")
      else if (w.endsWith("ed") && w.length > 3) {
        val b = w.dropRight(2); Seq(b, b + "e") ++ undouble(b)
      } else if (w.endsWith("ies") && w.length > 3)
        Seq(w.dropRight(3) + "y", w.dropRight(2), w.dropRight(1))
      else if (w.endsWith("es") && w.length > 3)
        Seq(w.dropRight(2), w.dropRight(1))
      else if (w.endsWith("s") && !w.endsWith("ss") && w.length > 2)
        Seq(w.dropRight(1))
      else Seq.empty
    (w +: guesses).distinct
  }

  /** Conjugations of one lemma: plural/3rd-person, past, gerund —
    * with final-e drop, y->ies/ied, and final-consonant doubling. */
  private[text] def conjugate(l: String): Seq[String] = {
    val eDrop =
      if (l.endsWith("e") && l.length > 2)
        Seq(l.dropRight(1) + "ing", l.dropRight(1) + "ed")
      else Seq.empty
    val yForms =
      if (l.endsWith("y") && l.length > 2)
        Seq(l.dropRight(1) + "ies", l.dropRight(1) + "ied")
      else Seq.empty
    // ie -> y gerund (`die` -> `dying`, `tie` -> `tying`)
    val ieForms =
      if (l.endsWith("ie") && l.length > 2)
        Seq(l.dropRight(2) + "ying")
      else Seq.empty
    val doubled =
      if (l.length > 2 && !"aeiouy".contains(l.last) &&
          "aeiou".contains(l(l.length - 2)) && !"aeiou".contains(l(l.length - 3)))
        Seq(l + l.last + "ed", l + l.last + "ing")
      else Seq.empty
    (Seq(l, l + "s", l + "es", l + "ed", l + "d", l + "ing") ++
      eDrop ++ yForms ++ ieForms ++ doubled).distinct
  }

  /** The full inflection family of a query word — every conjugation
    * of every candidate lemma, sorted (deterministic for oracle-SQL
    * literal lists). Always contains the word itself. */
  def expand(word: String): Seq[String] =
    lemmas(word).flatMap(conjugate).distinct.sorted
}
