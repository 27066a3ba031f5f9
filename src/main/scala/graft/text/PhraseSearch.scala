package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Caption/phrase search surface (SURVEY §3.3): n-gram phrase matching
  * over the token table and a boolean query mini-language
  * (`"a b" AND (c OR NOT d)`) compiled to a DataFrame plan — the
  * Spark-native replacement for the reference's Rust caption index +
  * query parser (app/esper/captions.py:99-140).
  *
  * Phrase matching pre-filters the token table to the query vocabulary
  * (a per-token equality predicate that pushes down to the scan) and
  * position-joins the filtered sets on (doc_id, pos+i) — each join side
  * holds only one term's postings, never the full corpus. Round 1
  * windowed the whole token table per term (a full partitionBy(doc_id)
  * sort of every token for a single-word query); this is the posting-
  * list form the reference's Rust caption index uses. Boolean operators
  * become semi/anti joins on doc ids, which Catalyst executes as
  * broadcast hash joins at dimension scale.
  */
object PhraseSearch {

  /** Occurrences of an n-token phrase: (doc_id, pos) for each start.
    * Single-word phrases reduce to a pushed-down filter; n-grams
    * left-semi-join the i-th term's postings shifted by i. */
  def phraseHits(toks: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val first = toks.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      val nxt = toks.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
      acc.join(nxt, Seq("doc_id", "pos"), "left_semi")
    }
  }

  /** Docs containing the phrase at least once. */
  def docsWithPhrase(toks: DataFrame, phrase: Seq[String]): DataFrame =
    phraseHits(toks, phrase).select("doc_id").distinct()

  /** Query-language slot semantics: a trailing UNESCAPED `*` (on a
    * 2+ char word) makes the slot a PREFIX pattern; anything else
    * matches exactly. The star is query syntax, not corpus syntax —
    * and since a corpus token may itself END in a literal star, the
    * language provides an escape (ADVICE r15 #4): `foo\*` is an EXACT
    * match for the corpus token `foo*`. Only the trailing star is
    * wildcard syntax, so only the trailing star needs the escape
    * (mid-word stars are already literal). */
  private[graft] def slotPrefix(w: String): Option[String] =
    if (!w.endsWith("\\*") && w.endsWith("*") && w.length > 1)
      Some(w.dropRight(1))
    else None

  /** The literal token an exact slot matches (`\*` unescaped). */
  private[graft] def slotExact(w: String): String =
    if (w.endsWith("\\*")) w.dropRight(2) + "*" else w

  private def slotFilter(w: String): Column = slotPrefix(w) match {
    case Some(p) => col("tok").startsWith(p)
    case None    => col("tok") === slotExact(w)
  }

  /** [[phraseHits]] generalized to wildcard slots (`Seq("the",
    * "cust*")`): same left-semi position fold, each slot filtered by
    * [[slotFilter]]. A doc position holds exactly one token, so each
    * slot contributes at most one row per start even when a prefix
    * matches many vocabulary words — no de-dup needed. Exact-only
    * patterns take the equality path and behave as [[phraseHits]]. */
  def patternHits(toks: DataFrame, pattern: Seq[String]): DataFrame = {
    require(pattern.nonEmpty)
    pattern.foreach(w => require(w != "*",
      "a bare * slot would match every token"))
    val first = toks.filter(slotFilter(pattern.head))
      .select(col("doc_id"), col("pos"))
    pattern.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      val nxt = toks.filter(slotFilter(w))
        .select(col("doc_id"), (col("pos") - i).as("pos"))
      acc.join(nxt, Seq("doc_id", "pos"), "left_semi")
    }
  }

  /** NEAR operator: (doc_id, p_a, p_b) occurrence pairs of `a` and
    * `b` within `k` token positions — the proximity query a caption /
    * document search layer adds on top of exact phrases. The position
    * space is banded into width-k buckets and the a-side posts to its
    * own ± 1 buckets, so every within-k pair collides on EXACTLY one
    * (doc, bucket) equi key (b's bucket is unique and only one of a's
    * three matches it) — a plain positions theta-join would shuffle
    * per-doc cross products instead. */
  def proximityHits(toks: DataFrame, a: String, b: String, k: Int): DataFrame =
    proximityPatternHits(toks, Seq(a), Seq(b), k)

  /** [[proximityHits]] generalized to PATTERN operands (each side a
    * word, wildcard, or multi-token phrase — positions are phrase
    * STARTS): the banding is unchanged, only the per-side occurrence
    * sets come from [[patternHits]] instead of a single-token filter.
    * This is the evaluator behind the query language's NEAR/k
    * construct ([[Near]]). */
  def proximityPatternHits(toks: DataFrame, pa: Seq[String],
                           pb: Seq[String], k: Int): DataFrame = {
    require(k >= 1)
    val ha = patternHits(toks, pa)
      .select(col("doc_id"), col("pos").as("p_a"),
        explode(array(expr(s"pos div $k - 1"), expr(s"pos div $k"),
          expr(s"pos div $k + 1"))).as("bk"))
    val hb = patternHits(toks, pb)
      .select(col("doc_id"), col("pos").as("p_b"), expr(s"pos div $k").as("bk"))
    ha.join(hb, Seq("doc_id", "bk"))
      .filter(abs(col("p_a") - col("p_b")) <= k)
      .select("doc_id", "p_a", "p_b")
  }

  /** BM25 ranked retrieval over the token table (Robertson k1=1.2,
    * b=0.75), the relevance-ranked counterpart of the boolean search —
    * the reference ranks caption hits by raw count
    * (app/esper/captions.py:126-140); this is the standard IR upgrade.
    *
    * Cross-engine exactness: idf uses the Robertson (N-df+0.5)/(df+0.5)
    * ratio WITHOUT the ln (the t32 integerization move — ln is the one
    * non-correctly-rounded op that differs between engines; the
    * rational form is a monotone function of it so rankings by a single
    * term agree, and the variant is documented in the score name). The
    * per-(doc,term) score is one deterministic IEEE expression tree,
    * micro-scaled to a BIGINT BEFORE the per-doc sum, so cross-engine
    * float summation order cannot reassociate anything. With k1=6/5,
    * b=3/4 and avgdl=L/N the tf part is exactly
    * 88·tf·L / (40·tf·L + 12·L + 36·dl·N).
    *
    * Scale: tf and dl are PER-ROW quantities over `text` (array
    * filter/size — no token-table explode, no shuffle); df per term
    * and the (N, L) totals are ONE scalar aggregate broadcast back, so
    * the whole score is map-side and the ordered LIMIT is a
    * TakeOrdered, never a global sort. The per-doc total adds the
    * per-term micro-integers in fixed term order — integer addition,
    * nothing to reassociate. Input: docs (doc_id, text). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty)
    def tfCol(t: String): Column =
      size(filter(split(col("text"), " "), x => x === t)).cast("long")
    val base = docs.select(col("doc_id") +:
      size(split(col("text"), " ")).cast("long").as("dl") +:
      terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf$i") }: _*)
    val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("l") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val tot = broadcast(base.agg(aggs.head, aggs.tail: _*))
    val scored = base.crossJoin(tot)
    def scCol(i: Int): Column = {
      val idf = (lit(2) * (col("n") - col(s"df$i")) + lit(1)).cast("double") /
        (lit(2) * col(s"df$i") + lit(1)).cast("double")
      val tfc = (lit(88.0) * col(s"tf$i") * col("l")) /
        (lit(40.0) * col(s"tf$i") * col("l") + lit(12.0) * col("l") +
          lit(36.0) * col("dl") * col("n"))
      when(col(s"tf$i") > 0,
        round(idf * tfc * lit(1000000)).cast("long")).otherwise(0L)
    }
    scored
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"),
        terms.indices.map(scCol).reduce(_ + _).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }

  // ---------------- boolean query language --------------------------
  sealed trait Q
  final case class Phrase(words: Seq[String]) extends Q
  final case class And(l: Q, r: Q) extends Q
  final case class Or(l: Q, r: Q) extends Q
  final case class Not(q: Q) extends Q
  /** INFLECTION GROUP `[WORD]` — the reference caption language's
    * bracketed-lemma construct (`'SEAN SPICER & [RESIGN]'`,
    * app/esper/queries/other_queries.py:251): matches any inflection
    * of the word's lemma family ([[Inflect.expand]] — `[scanning]`
    * matches `scan`, `scans`, `scanned`...). The family is a closed
    * exact-word set, so serving prunes to its hash buckets
    * statically, like any other exact vocabulary. */
  final case class Infl(word: String) extends Q
  /** PROXIMITY as a language construct (r15 VERDICT miss #1): anchor
    * occurrences of `l` that have SOME occurrence of `r` within `k`
    * token positions — the reference caption language's NEAR surface
    * (app/esper/captions.py:99-103). Operands are POSITION-BEARING
    * subtrees (r16 ADVICE #4 / VERDICT ask #8): words, wildcards,
    * quoted phrases, [groups], count leaves, OR-alternatives — and
    * NEAR itself, so `a NEAR/5 b NEAR/3 c` chains left like
    * [[Within]]'s fold (the surviving a-anchors are then checked
    * against c). A NOT has no positions to be near — parse error. */
  final case class Near(l: Q, r: Q, k: Int) extends Q
  /** COUNT-THRESHOLD factor: docs where the leaf occurs at least
    * `n` times (`merge{3}`, `[merging]{3}`) — the "mentioned
    * repeatedly, not in passing" relevance gate a caption search
    * offers. The occurrence set is the leaf's, restricted to
    * qualifying docs. */
  final case class MinCount(q: Q, n: Int) extends Q
  /** PROXIMITY WINDOW over a conjunction — the reference's literal
    * `:: k` spelling (`MOSUL & (BATTLE | SIEGE) :: 60`,
    * app/notebooks/stories.ipynb; `A & B :: k` generalizes NEAR/k to
    * n conjuncts with OR-alternatives): docs holding an occurrence of
    * the FIRST conjunct with an occurrence of EVERY other conjunct
    * within k positions of it (the anchor-window semantics — the
    * first conjunct is the story's key term, the rest its context).
    * Each part must be position-bearing: a word/phrase/wildcard, an
    * OR tree of those (positions = the union), or a count-thresholded
    * leaf (positions of the pattern in qualifying docs). */
  final case class Within(parts: Seq[Q], k: Int) extends Q

  /** Tiny recursive-descent parser:
    * expr := term ((OR | '|') term)* ;
    * term := prox ((AND | '&') prox)* ;
    * prox := factor (NEAR/k factor)* ;
    * factor := NOT factor | '(' expr ')' | leaf ;
    * leaf := ('"..."' | '[word]' | word+) ('{' n '}')?
    * `&`/`|` are the reference language's operator spellings; AND/OR/
    * NOT the long forms. ADJACENT BARE WORDS ARE ONE PHRASE (r16
    * VERDICT miss #1): the reference's own query strings spell
    * multi-word phrases inline with no quotes — `SEAN SPICER &
    * [RESIGN]` (other_queries.py:251), `(PARKLAND | STONEMAN DOUGLAS
    * | FLORIDA) & SHOOTING :: 60` (app/notebooks/stories.ipynb) — so
    * juxtaposition folds into a [[Phrase]] exactly like the quoted
    * form (quotes remain available, e.g. to phrase words that would
    * otherwise read as operators). `[word]` is the inflection group
    * ([[Infl]]). A trailing `{n}` on a leaf is the count threshold.
    * NEAR/k operands may be any position-bearing subtree and chain
    * left. A trailing `:: k` on the WHOLE query (the reference
    * notebooks' usage shape) turns its top-level conjunction into a
    * [[Within]] proximity window — every conjunct must be
    * position-bearing. */
  def parse(s: String): Q = {
    val p = new Parser(tokenize(s))
    val q = p.parseExpr()
    val out = p.parseWindowSuffix(q)
    require(p.ts.isEmpty,
      s"unparsed trailing tokens: ${p.ts.mkString(" ")}")
    out
  }

  /** Top-level AND chain, left to right. */
  private def conjunctsOf(q: Q): Seq[Q] = q match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case x         => Seq(x)
  }

  /** Position-bearing = an occurrence set is well-defined. */
  private def positionBearing(q: Q): Boolean = q match {
    case Phrase(_)      => true
    case Infl(_)        => true
    case MinCount(x, _) => positionBearing(x)
    case Near(l, r, _)  => positionBearing(l) && positionBearing(r)
    case Or(l, r)       => positionBearing(l) && positionBearing(r)
    case _              => false
  }

  private def tokenize(s: String): List[String] = {
    // bare words must not swallow parens or count-braces (`dog)` and
    // `dog{3}` are two tokens each)
    val re = """"[^"]*"|\(|\)|\{\d+\}|[^\s(){}"]+""".r
    re.findAllIn(s).toList
  }

  private val NearTok = """(?i)NEAR/(\d+)""".r
  private val CountTok = """\{(\d+)\}""".r
  private val InflTok = """\[([^\[\]\s(){}"]+)\]""".r

  /** Token classes the bare-word juxtaposition fold must stop at —
    * everything with operator or structural meaning. A user phrasing
    * one of these AS a word quotes it (`"and"`). */
  private def isOperatorTok(t: String): Boolean =
    t.equalsIgnoreCase("AND") || t.equalsIgnoreCase("OR") ||
      t.equalsIgnoreCase("NOT") || t == "&" || t == "|" ||
      NearTok.pattern.matcher(t).matches() ||
      t == "::" || t.matches("::\\d+")

  private def isBareWord(t: String): Boolean =
    !isOperatorTok(t) && t != "(" && t != ")" &&
      !t.startsWith("\"") &&
      !CountTok.pattern.matcher(t).matches() &&
      !InflTok.pattern.matcher(t).matches()

  private class Parser(var ts: List[String]) {
    private def peek: Option[String] = ts.headOption
    private def next(): String = { val h = ts.head; ts = ts.tail; h }
    /** Consume a trailing `:: k` (two tokens — `::` then the number,
      * or one `::k` token) and wrap the top-level conjunction. */
    def parseWindowSuffix(q: Q): Q = peek match {
      case Some(t) if t == "::" || t.matches("::\\d+") =>
        val k =
          if (t == "::") { next(); next().toInt }
          else next().stripPrefix("::").toInt
        require(k >= 1, ":: 0 is not a proximity window")
        require(ts.isEmpty, ":: k must end the query")
        val parts = conjunctsOf(q)
        parts.foreach(p => require(positionBearing(p),
          ":: k conjuncts must be words, phrases, OR-alternatives or " +
            s"count thresholds — got $p"))
        if (parts.size == 1) q else Within(parts, k)
      case _ => q
    }
    def parseExpr(): Q = {
      var l = parseTerm()
      while (peek.exists(t => t.equalsIgnoreCase("OR") || t == "|")) {
        next(); l = Or(l, parseTerm())
      }
      l
    }
    private def parseTerm(): Q = {
      var l = parseProx()
      while (peek.exists(t => t.equalsIgnoreCase("AND") || t == "&")) {
        next(); l = And(l, parseProx())
      }
      l
    }
    private def parseProx(): Q = {
      var l = parseFactor()
      while (peek.exists(t => NearTok.pattern.matcher(t).matches())) {
        val k = NearTok.findFirstMatchIn(next()).get.group(1).toInt
        require(k >= 1, "NEAR/0 is not a proximity")
        val r = parseFactor()
        Seq(l, r).foreach(o => require(positionBearing(o),
          "NEAR/k operands must be position-bearing (words, phrases, " +
            s"[groups], OR-alternatives, counts, NEAR chains) — got $o"))
        l = Near(l, r, k)
      }
      l
    }
    private def parseFactor(): Q = peek match {
      case Some(t) if t.equalsIgnoreCase("NOT") => next(); Not(parseFactor())
      case Some("(") =>
        next(); val e = parseExpr()
        require(next() == ")", "expected )"); e
      case Some(t) if t.startsWith("\"") =>
        next()
        withCount(Phrase(
          t.stripPrefix("\"").stripSuffix("\"").split("\\s+").toSeq))
      case Some(t) if InflTok.pattern.matcher(t).matches() =>
        next()
        withCount(Infl(InflTok.findFirstMatchIn(t).get.group(1)))
      case Some(t) if CountTok.pattern.matcher(t).matches() =>
        throw new IllegalArgumentException(s"dangling count threshold $t")
      case Some(t) if isBareWord(t) =>
        // juxtaposition: adjacent bare words are ONE phrase, exactly
        // like the quoted form — `STONEMAN DOUGLAS` = `"STONEMAN
        // DOUGLAS"` (the reference queries' inline-phrase spelling)
        next()
        val ws = scala.collection.mutable.ListBuffer(t)
        while (peek.exists(isBareWord)) ws += next()
        withCount(Phrase(ws.toList))
      case Some(t) =>
        throw new IllegalArgumentException(s"unexpected token $t")
      case None => throw new IllegalArgumentException("empty query")
    }
    /** A `{n}` count threshold binds to the leaf just parsed. */
    private def withCount(leaf: Q): Q = peek match {
      case Some(t) if CountTok.pattern.matcher(t).matches() =>
        val n = CountTok.findFirstMatchIn(next()).get.group(1).toInt
        require(n >= 1, "count threshold must be >= 1")
        MinCount(leaf, n)
      case _ => leaf
    }
  }

  /** Occurrence set (doc_id, pos) of a position-bearing subquery.
    * [[Infl]]'s positions are any family member's (the family is a
    * closed exact-word set, one pushed-down IN filter); [[Near]]'s are
    * its ANCHOR (left) positions that survive the window check, which
    * is what makes NEAR chain left and nest inside [[Within]]. */
  private def posHits(q: Q, toks: DataFrame): DataFrame = q match {
    case Phrase(ws) => patternHits(toks, ws)
    case Infl(w) =>
      toks.filter(col("tok").isin(Inflect.expand(w): _*))
        .select(col("doc_id"), col("pos"))
    case Near(l, r, k) =>
      withinK(posHits(l, toks), posHits(r, toks), k)
    case Or(l, r) =>
      posHits(l, toks).unionByName(posHits(r, toks)).distinct()
    case MinCount(x, n) =>
      val hits = posHits(x, toks)
      val qualifying = hits.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__c")).filter(col("__c") >= n)
        .select("doc_id")
      hits.join(qualifying, Seq("doc_id"), "left_semi")
    case other => throw new IllegalArgumentException(
      s"no occurrence set for $other")
  }

  /** Anchor positions of `a` that have SOME occurrence of `b` within
    * k — the same ±1 width-k bucket banding as [[proximityHits]]
    * (one equi key per within-k pair), deduped back to anchor rows. */
  private def withinK(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val aa = a.select(col("doc_id"), col("pos"),
      explode(array(expr(s"pos div $k - 1"), expr(s"pos div $k"),
        expr(s"pos div $k + 1"))).as("bk"))
    val bb = b.select(col("doc_id"), col("pos").as("p_b"),
      expr(s"pos div $k").as("bk"))
    aa.join(bb, Seq("doc_id", "bk"))
      .filter(abs(col("pos") - col("p_b")) <= k)
      .select("doc_id", "pos").distinct()
  }

  /** Compile a boolean query to the matching doc-id set.
    * `universe` = all doc ids (needed for NOT). */
  def eval(q: Q, toks: DataFrame, universe: DataFrame): DataFrame = q match {
    case Phrase(ws) => patternHits(toks, ws).select("doc_id").distinct()
    case i @ Infl(_) => posHits(i, toks).select("doc_id").distinct()
    case nr @ Near(_, _, _) => posHits(nr, toks).select("doc_id").distinct()
    case Within(parts, k) =>
      // anchor-window: keep first-conjunct occurrences that have every
      // other conjunct within k, then project to docs
      parts.tail.foldLeft(posHits(parts.head, toks)) { (acc, p) =>
        withinK(acc, posHits(p, toks), k)
      }.select("doc_id").distinct()
    case MinCount(x, n) =>
      posHits(x, toks).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__c")).filter(col("__c") >= n)
        .select("doc_id")
    case And(l, r) =>
      eval(l, toks, universe).join(eval(r, toks, universe), Seq("doc_id"), "left_semi")
    case Or(l, r) =>
      eval(l, toks, universe).union(eval(r, toks, universe)).distinct()
    case Not(x) =>
      universe.join(eval(x, toks, universe), Seq("doc_id"), "left_anti")
  }

  def search(query: String, toks: DataFrame, universe: DataFrame): DataFrame =
    eval(parse(query), toks, universe)

  // ---------------- persistent inverted index (build/serve) ---------

  /** Build-side of the caption-index split: persist the token postings
    * PARTITIONED BY token-hash bucket so a served query reads only its
    * vocabulary's buckets — the Spark-native form of the reference's
    * persisted Rust caption index (app/esper/captions.py:13-30, which
    * loads a prebuilt on-disk index and never re-tokenizes the
    * corpus). The in-process ph01-ph05 path derives postings from the
    * documents table per query; correct, but at 100 TB that is a
    * corpus-wide tokenize per query. This is the production layout:
    * tokenize ONCE in a batch build, serve from pruned bucket dirs.
    *
    * Layout: segment dirs `dir/postings/seg-V/bucket=B/...` (bucket =
    * RollingHash(tok) mod nBuckets — the driver can recompute it for
    * any query word, so pruning is STATIC partition elimination, no
    * runtime subquery), `dir/doclen/seg-V` (doc_id, dl — the
    * doc-level metadata BM25 needs and the universe NOT needs, so the
    * whole §3.3 boolean/ranked surface serves without touching
    * `documents`), and `dir/manifest/v*.manifest` naming the live
    * segments, the batch-sequence counter, the retention watermark
    * and the bucket modulus (see [[graft.index.Manifest]] — every
    * maintenance op stages new segments and publishes them in ONE
    * atomic manifest commit). Rows within each postings file are
    * sorted by (tok, doc_id, pos): parquet row-group min/max stats on
    * `tok` skip non-matching row groups inside a bucket, the second
    * pruning level. */
  private val POSTINGS = "postings"
  private val DOCLEN = "doclen"
  private val TOMBSTONES = "tombstones"
  private val LEXICON = "lexicon"
  private type SparkSession = org.apache.spark.sql.SparkSession
  private val Manifest = graft.index.Manifest

  private def postingsSegDf(toks: DataFrame, seq: Long,
                            nBuckets: Int): DataFrame = {
    val bucket = pmod(graft.text.TextOps.fingerprint(col("tok")),
      lit(nBuckets.toLong))
    toks.select(col("doc_id"), col("pos"), col("tok"))
      .withColumn("seq", lit(seq))
      .withColumn("bucket", bucket)
      .repartition(col("bucket"))
      .sortWithinPartitions("tok", "doc_id", "pos")
  }

  private def doclenSegDf(toks: DataFrame, seq: Long): DataFrame =
    toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .withColumn("seq", lit(seq))

  /** LEXICON segment: the distinct vocabulary with each token's bucket,
    * RANGE-partitioned and sorted by `tok` — so a prefix query's
    * vocabulary expansion is a contiguous range scan over a
    * vocab-sized sidecar (parquet min/max file + row-group stats on
    * `tok` prune it), the sorted-lexicon idea behind the reference's
    * caption index (app/esper/captions.py:13-30). INVARIANT: the live
    * lexicon is a SUPERSET of the live postings' vocabulary (appends
    * add their batch's tokens; rewrites rebuild it from the rows they
    * keep; stale upsert vocabulary may linger until a rewrite) — a
    * superset is harmless because the prefix serve semi-joins it into
    * the postings, where dead tokens match nothing. `bucket` is
    * stored as INT to match the partition-column type the postings
    * scan infers, so the serve-side (bucket, tok) join needs no cast
    * between the DPP key and the partition column. */
  private def lexiconSegDf(vocabSrc: DataFrame, nBuckets: Int): DataFrame =
    vocabSrc.select(col("tok")).distinct()
      .withColumn("bucket",
        pmod(graft.text.TextOps.fingerprint(col("tok")),
          lit(nBuckets.toLong)).cast("int"))
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok")

  /** True iff the just-written segment dir holds any data (an empty
    * micro-batch writes only a _SUCCESS marker — such a segment must
    * not enter the manifest, or later multi-segment reads would see a
    * schemaless root). */
  private def segHasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n != "_SUCCESS" && !n.startsWith(".") && !n.startsWith("_")
    }
  }

  def writeIndex(toks: DataFrame, dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1)
    val spark = toks.sparkSession
    Manifest.withLease(spark, dir) {
      // a fresh build over a previously-used dir starts a NEW
      // generation: the new manifest references only the new
      // segments, so stale tombstones/retention from the old one are
      // dead on commit (and their files gc'd below)
      val ver = Manifest.latest(spark, dir).map(_.version).getOrElse(0L) + 1
      val m = graft.index.Manifest(
        version = ver, nextSeq = 1L, retention = None,
        scalars = Map("n_buckets" -> nBuckets.toString),
        segments = Map(
          POSTINGS -> Vector(s"$POSTINGS/seg-$ver"),
          DOCLEN -> Vector(s"$DOCLEN/seg-$ver"),
          LEXICON -> Vector(s"$LEXICON/seg-$ver"),
          TOMBSTONES -> Vector.empty))
      postingsSegDf(toks, 0L, nBuckets)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/$POSTINGS/seg-$ver")
      doclenSegDf(toks, 0L)
        .write.mode("overwrite").parquet(s"$dir/$DOCLEN/seg-$ver")
      lexiconSegDf(toks, nBuckets)
        .write.mode("overwrite").parquet(s"$dir/$LEXICON/seg-$ver")
      Manifest.commit(spark, dir, m)
      Manifest.gc(spark, dir, m)
    }
  }

  /** Create an EMPTY index: commit a manifest carrying the bucket
    * modulus and no segments, so a purely incremental ingest (st16:
    * Structured Streaming micro-batches, each calling
    * [[appendIndex]]) can build the whole index without a batch
    * bootstrap. Postings/doclen segments appear with the first
    * append. */
  def initIndex(spark: SparkSession, dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1)
    Manifest.withLease(spark, dir) {
      val ver = Manifest.latest(spark, dir).map(_.version).getOrElse(0L) + 1
      val m = graft.index.Manifest(
        version = ver, nextSeq = 0L, retention = None,
        scalars = Map("n_buckets" -> nBuckets.toString),
        segments = Map(POSTINGS -> Vector.empty, DOCLEN -> Vector.empty,
          LEXICON -> Vector.empty, TOMBSTONES -> Vector.empty))
      Manifest.commit(spark, dir, m)
      Manifest.gc(spark, dir, m)
    }
  }

  // ---- batch sequence numbers (the versioning that makes UPSERT
  // possible): every batch of rows carries the seq it was written
  // under (base build = 0, each append = the then-current counter),
  // and a tombstone is (doc_id, upto) — it kills only rows with
  // seq < upto, so an upsert's replacement rows (written AT upto)
  // survive their own doc's tombstone. This is the Lucene/LSM delete
  // model: nothing is rewritten, visibility is resolved at read time,
  // compaction makes it physical. The counter lives in the manifest
  // (one driver-side metadata read per op, committed atomically with
  // the segment list). The single-writer contract appendIndex always
  // documented is now ENFORCED by the manifest's writer lease.

  private def postingsOf(spark: SparkSession, dir: String,
                         m: graft.index.Manifest): DataFrame =
    Manifest.readComponent(spark, dir, m, POSTINGS)
      .getOrElse(throw new IllegalStateException(
        s"index at $dir has no postings segments (empty init, nothing appended)"))

  private def doclenOf(spark: SparkSession, dir: String,
                       m: graft.index.Manifest): DataFrame =
    Manifest.readComponent(spark, dir, m, DOCLEN)
      .getOrElse(throw new IllegalStateException(
        s"index at $dir has no doclen segments (empty init, nothing appended)"))

  private def tombstonesOf(spark: SparkSession, dir: String,
                           m: graft.index.Manifest): Option[DataFrame] =
    Manifest.readComponent(spark, dir, m, TOMBSTONES)

  /** Incremental maintenance (the daily-crawl shape): append a NEW
    * batch's postings/doc-lengths to an existing [[writeIndex]] layout
    * without rebuilding — the Spark-native analogue of the reference's
    * job-ledger skip-processed pattern (scannerutil.py:136-146, which
    * re-ingests only unprocessed videos). The batch is bucketed with
    * the STORED modulus, so serve-side pruning is unchanged; the new
    * segment is itself (tok, doc_id, pos)-sorted, so row-group stats
    * prune within it exactly as they do in the base build. The
    * segment becomes visible only at the manifest commit — a reader
    * concurrent with the append sees the old snapshot or the new one,
    * never a torn mix.
    *
    * CONTRACT: batch doc_ids must be disjoint from already-indexed
    * ones (append batches are new documents, not updates) — ph10's
    * oracle proves full-rebuild ≡ build-half + append-half under it. */
  def appendIndex(newToks: DataFrame, dir: String): Unit = {
    val spark = newToks.sparkSession
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val nBuckets = m.scalar("n_buckets").toInt
      val pSeg = m.nextSeg(POSTINGS)
      val dSeg = m.nextSeg(DOCLEN)
      val lSeg = m.nextSeg(LEXICON)
      postingsSegDf(newToks, m.nextSeq, nBuckets)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/$pSeg")
      doclenSegDf(newToks, m.nextSeq)
        .write.mode("overwrite").parquet(s"$dir/$dSeg")
      lexiconSegDf(newToks, nBuckets)
        .write.mode("overwrite").parquet(s"$dir/$lSeg")
      var m2 = m.copy(version = m.version + 1, nextSeq = m.nextSeq + 1)
      if (segHasData(spark, s"$dir/$pSeg")) m2 = m2.withSegAdded(POSTINGS, pSeg)
      if (segHasData(spark, s"$dir/$dSeg")) m2 = m2.withSegAdded(DOCLEN, dSeg)
      if (segHasData(spark, s"$dir/$lSeg")) m2 = m2.withSegAdded(LEXICON, lSeg)
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
    }
  }

  /** UPSERT (the re-crawl shape: a batch of documents whose content
    * CHANGED since they were indexed, plus possibly brand-new ones):
    * tombstone the batch's doc ids at the current sequence number S,
    * then add the new token rows at S+1 — the tombstone
    * (doc_id, upto = S) kills every older version (seq < S) while the
    * replacement rows (seq = S+1) survive it. Both the tombstone
    * segment and the replacement segments land in ONE manifest
    * commit, so the upsert is atomic even across its two logical
    * events — no reader can see the delete without the replacement.
    * Upserting a doc the index never held degenerates to a plain
    * append (the tombstone kills nothing). ph17/ph18's oracles prove
    * a stale-then-upserted index indistinguishable from one built on
    * the corrected corpus — positions, BM25 stats and all. */
  def upsertIndex(newToks: DataFrame, dir: String): Unit = {
    val spark = newToks.sparkSession
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val nBuckets = m.scalar("n_buckets").toInt
      val tSeg = m.nextSeg(TOMBSTONES)
      val pSeg = m.nextSeg(POSTINGS)
      val dSeg = m.nextSeg(DOCLEN)
      val lSeg = m.nextSeg(LEXICON)
      newToks.select(col("doc_id")).distinct()
        .withColumn("upto", lit(m.nextSeq))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$tSeg")
      postingsSegDf(newToks, m.nextSeq + 1, nBuckets)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/$pSeg")
      doclenSegDf(newToks, m.nextSeq + 1)
        .write.mode("overwrite").parquet(s"$dir/$dSeg")
      lexiconSegDf(newToks, nBuckets)
        .write.mode("overwrite").parquet(s"$dir/$lSeg")
      var m2 = m.copy(version = m.version + 1, nextSeq = m.nextSeq + 2)
      if (segHasData(spark, s"$dir/$tSeg")) m2 = m2.withSegAdded(TOMBSTONES, tSeg)
      if (segHasData(spark, s"$dir/$pSeg")) m2 = m2.withSegAdded(POSTINGS, pSeg)
      if (segHasData(spark, s"$dir/$dSeg")) m2 = m2.withSegAdded(DOCLEN, dSeg)
      if (segHasData(spark, s"$dir/$lSeg")) m2 = m2.withSegAdded(LEXICON, lSeg)
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
    }
  }

  /** Logical deletion (the fourth maintenance op after build/append/
    * compact): record the doc ids in a tombstone segment — the
    * postings/doclen files are untouched, so a delete batch costs one
    * tiny write no matter how large the index is (the Lucene/
    * log-structured delete model; the reference deletes videos by
    * row, cascading to their captions — models.py's Video FK graph —
    * and a takedown/purge in a 100 TB corpus must not rewrite the
    * corpus). Serve paths anti-join the broadcast tombstone set, so
    * deletes are visible immediately; [[compactIndex]] physically
    * reclaims them. Delete batches accumulate across calls;
    * re-deleting an id or deleting an unindexed id is a no-op at
    * serve time (anti-join semantics).
    *
    * Each tombstone is (doc_id, upto = the current sequence number):
    * it kills only rows written BEFORE it (seq < upto), which is what
    * lets [[upsertIndex]] tombstone and re-add a doc in one step, and
    * means a delete never affects appends that come after it. */
  def deleteFromIndex(docIds: DataFrame, dir: String): Unit = {
    val spark = docIds.sparkSession
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val tSeg = m.nextSeg(TOMBSTONES)
      docIds.select(col("doc_id")).distinct()
        .withColumn("upto", lit(m.nextSeq))
        // a delete batch is dimension-sized (takedowns, purge lists) —
        // one file per batch, not one per shuffle partition
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$tSeg")
      // a delete is a versioned event like an append: advancing the
      // counter gives every maintenance batch a distinct sequence
      // slot, which is what makes as-of snapshot reads well-defined
      // (snapshot S excludes tombstones with upto >= S — they had not
      // happened yet at S)
      var m2 = m.copy(version = m.version + 1, nextSeq = m.nextSeq + 1)
      if (segHasData(spark, s"$dir/$tSeg")) m2 = m2.withSegAdded(TOMBSTONES, tSeg)
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
    }
  }

  /** The index's current sequence number — the snapshot id the
    * `asOf` serve parameters accept. Snapshot S is the index state
    * after events 0..S−1 (the base build is event 0; every
    * append/delete/upsert batch advances the counter), so
    * `currentSeq` names the LATEST state and any value recorded
    * earlier names the exact historical state the index had then —
    * the reproducibility hook a training-data pipeline needs
    * ("rebuild the corpus view that produced run X"). */
  def currentSeq(spark: SparkSession, dir: String): Long =
    Manifest.load(spark, dir).nextSeq

  /** Raw postings across all live segments — the integrity-audit /
    * introspection read (ph13), NOT a serving path (no tombstone or
    * as-of resolution; use [[servedPostings]] for answers). */
  def rawPostings(spark: SparkSession, dir: String): DataFrame =
    postingsOf(spark, dir, Manifest.load(spark, dir))

  /** Raw doclen sidecar across all live segments (see [[rawPostings]]). */
  def rawDoclen(spark: SparkSession, dir: String): DataFrame =
    doclenOf(spark, dir, Manifest.load(spark, dir))

  /** Drop tombstoned rows from an indexed frame carrying (doc_id,
    * seq) — a broadcast anti-join (the delete set is dimension-
    * sized); a row dies iff SOME tombstone for its doc postdates it
    * (seq < upto). With `asOf = Some(S)` the frame is first cut to
    * rows written before snapshot S (seq < S) and only tombstones
    * that existed at S (upto < S) apply — the whole time-travel read
    * is two extra pushed-down predicates, no second layout. Snapshots
    * older than the retention watermark are REFUSED, not silently
    * mis-served: [[vacuumIndex]] reclaimed rows they need. */
  private def liveOnly(df: DataFrame, spark: SparkSession, dir: String,
                       m: graft.index.Manifest,
                       asOf: Option[Long] = None): DataFrame = {
    asOf.foreach { s =>
      m.retention.foreach(r => require(s >= r,
        s"snapshot $s predates the retention watermark $r (vacuumed away)"))
    }
    val cut = asOf.map(s => df.filter(col("seq") < s)).getOrElse(df)
    tombstonesOf(spark, dir, m) match {
      case Some(t) =>
        val vis = asOf.map(s => t.filter(col("upto") < s)).getOrElse(t)
        val ts = broadcast(vis.select(col("doc_id").as("__t_doc"),
          col("upto").as("__t_upto")))
        cut.join(ts, cut("doc_id") === col("__t_doc") &&
          cut("seq") < col("__t_upto"), "left_anti")
      case None => cut
    }
  }

  /** Driver-side mirror of the build's bucket assignment (same
    * RollingHash the [[writeIndex]] expression uses — HashExprSpec
    * pins the expression to this scalar kernel). */
  private def bucketOf(w: String, nBuckets: Int): Long =
    Math.floorMod(
      graft.plans.RollingHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)),
      nBuckets.toLong)

  /** Postings restricted to `vocab`, reading ONLY the vocabulary's
    * bucket directories: the bucket set is computed on the driver from
    * the stored modulus, so the `bucket IN (...)` predicate is a plan-
    * time partition filter (PartitionFilters in the scan — asserted by
    * PhraseIndexSpec) and the `tok IN (...)` residual pushes down to
    * parquet row-group stats. At 100 TB a 3-word phrase touches
    * ~3/nBuckets of the index, not the corpus. */
  def servedPostings(spark: SparkSession, dir: String, vocab: Seq[String],
                     asOf: Option[Long] = None): DataFrame = {
    require(vocab.nonEmpty)
    val m = Manifest.load(spark, dir)
    servedPostingsWith(spark, dir, m, vocab, asOf)
  }

  private def servedPostingsWith(spark: SparkSession, dir: String,
                                 m: graft.index.Manifest,
                                 vocab: Seq[String],
                                 asOf: Option[Long]): DataFrame = {
    val nBuckets = m.scalar("n_buckets").toInt
    val bks = vocab.map(bucketOf(_, nBuckets)).distinct
    liveOnly(
      postingsOf(spark, dir, m)
        .filter(col("bucket").isin(bks: _*) && col("tok").isin(vocab: _*)),
      spark, dir, m, asOf)
      .select("doc_id", "pos", "tok")
  }

  /** SNAPSHOT DIFF: which documents changed between two index
    * snapshots, classified added/removed/changed — the introspection
    * a reproducibility audit runs ("what differs between the corpus
    * views of run X and run Y") without storing either corpus. Each
    * snapshot's per-doc content signature is an order/partition-free
    * integer aggregate over its postings: sum over tokens of
    * (fingerprint(tok) × w(pos)) mod P, finally mod P again, with
    * P = 1e9+7 and w(pos) an LCG mix of the position in [1, 2^31].
    * Position-weighting makes reorderings change the signature; the
    * LCG mix (not the raw pos+1 weight) breaks STRUCTURED
    * cancellations — swapped tokens or sign-patterned edits whose
    * linear weights would cancel; the per-term mod keeps every term
    * below 2^30, so the int64 per-doc sum is exact to ~8×10^9 tokens
    * per doc (the r14 unreduced form wrapped at ~1.3×10^5) and the
    * final mod makes the signature well-defined at ANY length.
    * Residual accidental collisions are ~1/P per doc pair — fine for
    * an audit, noted here by design. Two as-of scans and one
    * full-outer join on a doc-level frame; ph33's oracle replays both
    * signatures from the corpus texts. */
  def snapshotDiff(spark: SparkSession, dir: String,
                   fromSeq: Long, toSeq: Long): DataFrame = {
    val m = Manifest.load(spark, dir)
    val P = 1000000007L
    val w = pmod((col("pos").cast("long") + lit(1L)) * lit(1103515245L) +
      lit(12345L), lit(2147483648L)) + lit(1L)
    def sig(asOf: Long) =
      liveOnly(postingsOf(spark, dir, m), spark, dir, m, Some(asOf))
        .groupBy(col("doc_id"))
        .agg(pmod(sum(pmod(
          graft.text.TextOps.fingerprint(col("tok")) * w, lit(P))), lit(P))
          .as("sig"))
    sig(fromSeq).select(col("doc_id"), col("sig").as("__from"))
      .join(sig(toSeq).select(col("doc_id"), col("sig").as("__to")),
        Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("__from").isNull, "added")
          .when(col("__to").isNull, "removed")
          .when(col("__from") =!= col("__to"), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(col("doc_id"), col("change"))
  }

  /** PREFIX (wildcard) search over a [[writeIndex]] layout: doc ids
    * holding any token that starts with `prefix`, plus the matched
    * vocabulary and its frequency — `cust*`-style expansion. A prefix
    * cannot route STATICALLY to one bucket (the bucket is a hash of
    * the FULL token), so the expansion goes through the LEXICON
    * sidecar: a range scan of the tok-sorted vocabulary table (file +
    * row-group min/max stats prune it to the prefix range) yields the
    * matched (bucket, tok) dimension, and a broadcast semi-join fans
    * it into the postings — dynamic partition pruning then drops
    * every bucket directory holding none of the matched tokens, the
    * same DPP shape the IVF plane's probed-cell scan uses. The pushed
    * StringStartsWith residual keeps the second, row-group-level
    * pruning inside the surviving buckets (the tok-sort invariant
    * every rewrite maintains). I/O therefore tracks the prefix
    * range's vocabulary + posting volume, not the index size — the
    * r14 layout read all 64 bucket dirs (4.0x at 100x corpus,
    * STRESS10X); this is the sorted-lexicon fix
    * (app/esper/captions.py:13-30). */
  def servedPrefixDocs(spark: SparkSession, dir: String, prefix: String,
                       asOf: Option[Long] = None): DataFrame = {
    require(prefix.nonEmpty, "empty prefix would scan the whole index")
    val m = Manifest.load(spark, dir)
    val posts = postingsOf(spark, dir, m).filter(col("tok").startsWith(prefix))
    val pruned = Manifest.readComponent(spark, dir, m, LEXICON) match {
      case Some(lex) =>
        val matched = lex.filter(col("tok").startsWith(prefix))
          .select(col("bucket"), col("tok")).distinct()
        posts.join(broadcast(matched), Seq("bucket", "tok"), "left_semi")
      case None => posts // pre-lexicon index (empty init): full fallback
    }
    liveOnly(pruned, spark, dir, m, asOf)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
  }

  /** [[phraseHits]] over a [[writeIndex]] layout: identical output
    * (same position-join plan), but the scan side is the pruned
    * postings instead of a full tokenize. `asOf = Some(S)` answers
    * from snapshot S instead of the latest state (see
    * [[currentSeq]]). */
  def servedPhraseHits(spark: SparkSession, dir: String, phrase: Seq[String],
                       asOf: Option[Long] = None): DataFrame =
    phraseHits(servedPostings(spark, dir, phrase.distinct, asOf), phrase)

  /** WILDCARD PHRASE over a [[writeIndex]] layout: phrase matching
    * where any slot may be a prefix pattern (`Seq("the", "cust*")`
    * matches "the customer", "the custom", ...) — the wildcard form
    * the reference's sorted caption lexicon exists to serve
    * (app/esper/captions.py:13-30). Exact slots read their statically
    * pruned vocabulary buckets ([[servedPostings]]'s path); starred
    * slots share ONE postings scan pruned the prefix way (lexicon
    * range scan → broadcast semi-join → DPP bucket pruning + pushed
    * StartsWith, [[servedPrefixDocs]]'s three layers). Slot i's hits
    * shift to (doc_id, pos − i) and the fold is the same left-semi
    * position-join as [[phraseHits]] — a doc position holds exactly
    * one token, so each slot contributes at most one row per start
    * and no de-dup is needed even when a slot's prefix matches many
    * vocabulary words. */
  def servedWildcardPhraseHits(spark: SparkSession, dir: String,
                               pattern: Seq[String],
                               asOf: Option[Long] = None): DataFrame = {
    val m = Manifest.load(spark, dir)
    patternHits(prunedPatternPostings(spark, dir, m, pattern, asOf), pattern)
  }

  /** One postings scan per vocabulary KIND for a wildcard-capable
    * word set: exact words read their statically pruned buckets,
    * prefixes share one lexicon-routed scan. Exact words a prefix
    * already covers are dropped from the exact scan so no physical
    * row enters the union twice. */
  private def prunedPatternPostings(spark: SparkSession, dir: String,
                                    m: graft.index.Manifest,
                                    words: Seq[String],
                                    asOf: Option[Long]): DataFrame = {
    require(words.nonEmpty)
    words.foreach(w => require(w != "*",
      "a bare * slot would scan the whole index"))
    // classification mirrors slotFilter: unescaped trailing star =
    // prefix; `\*` = exact match on the literal star-ended token
    val prefixes = words.flatMap(slotPrefix).distinct
    val exactVocab = words.filter(slotPrefix(_).isEmpty).map(slotExact)
      .distinct
      .filterNot(w => prefixes.exists(w.startsWith))
    val scans = Seq(
      if (exactVocab.nonEmpty)
        Some(servedPostingsWith(spark, dir, m, exactVocab, asOf))
      else None,
      if (prefixes.nonEmpty) {
        val pred = prefixes.map(p => col("tok").startsWith(p)).reduce(_ || _)
        val posts = postingsOf(spark, dir, m).filter(pred)
        val pruned = Manifest.readComponent(spark, dir, m, LEXICON) match {
          case Some(lex) =>
            val matched = lex.filter(pred)
              .select(col("bucket"), col("tok")).distinct()
            posts.join(broadcast(matched), Seq("bucket", "tok"), "left_semi")
          case None => posts
        }
        Some(liveOnly(pruned, spark, dir, m, asOf)
          .select("doc_id", "pos", "tok"))
      } else None).flatten
    scans.reduce(_.unionByName(_))
  }

  /** [[proximityHits]] over a [[writeIndex]] layout. */
  def servedProximityHits(spark: SparkSession, dir: String,
                          a: String, b: String, k: Int,
                          asOf: Option[Long] = None): DataFrame =
    proximityHits(servedPostings(spark, dir, Seq(a, b).distinct, asOf), a, b, k)

  /** Compaction (the third maintenance op after build/append): each
    * [[appendIndex]] batch adds one segment per op, so a long-running
    * daily-append index accumulates small files and loses the global
    * (tok, doc_id, pos) order within a bucket — row-group `tok` stats
    * still prune per file, but over ever more files. Compaction
    * rewrites the postings back to ONE sorted segment (and the doclen
    * sidecar to one), restoring build-fresh layout without
    * re-tokenizing anything: a pure shuffle-by-bucket + sort over the
    * index itself. Tombstoned docs are physically reclaimed during
    * the rewrite; because the reclaim destroys rows that historical
    * snapshots still need, the SAME manifest commit that swaps the
    * segments in also advances the retention watermark to the current
    * seq — atomic by construction, so no crash ordering can serve a
    * historical snapshot minus its reclaimed rows (the r14 ADVICE
    * gap: the old layout wrote the rewrite before the watermark).
    * Serve results are unchanged — ph11's oracle row and
    * PhraseIndexSpec assert exact parity and the file-count drop. */
  def compactIndex(spark: SparkSession, dir: String): Unit =
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val hadTombstones = m.segs(TOMBSTONES).nonEmpty
      // `seq` must survive the rewrite: liveOnly resolves it here, and
      // post-compaction deletes (`seq < upto`) and upserts still need
      // every row versioned.
      val pSeg = m.nextSeg(POSTINGS)
      val dSeg = m.nextSeg(DOCLEN)
      liveOnly(
        postingsOf(spark, dir, m)
          .select(col("doc_id"), col("pos"), col("tok"), col("seq"),
            col("bucket")),
        spark, dir, m)
        .repartition(col("bucket"))
        .sortWithinPartitions("tok", "doc_id", "pos")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/$pSeg")
      // range-partition + sort by doc_id (NOT coalesce(1) — doclen is
      // one row per document, corpus-sized at 100 TB): bounded file
      // count per compaction with doc_id min/max stats per file
      liveOnly(doclenOf(spark, dir, m), spark, dir, m)
        .repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dir/$dSeg")
      // the lexicon converges to the kept vocabulary (stale upsert
      // tokens and reclaimed docs' exclusive tokens drop out): ONE
      // distinct over the just-written consolidated segment. A
      // fully-tombstoned index rewrites to ZERO rows — then every
      // component publishes EMPTY (never a schemaless _SUCCESS-only
      // segment; ADVICE r15 #1): the op completes, reads fail with
      // readComponent's loud empty-index path, and an append revives
      // the index.
      val compacted = segHasData(spark, s"$dir/$pSeg")
      val lSeg = m.nextSeg(LEXICON)
      if (compacted)
        spark.read.parquet(s"$dir/$pSeg").select(col("tok"), col("bucket"))
          .distinct()
          .repartitionByRange(col("tok")).sortWithinPartitions("tok")
          .write.mode("overwrite").parquet(s"$dir/$lSeg")
      def seg(s: String): Vector[String] =
        if (compacted) Vector(s) else Vector.empty
      val m2 = m.copy(version = m.version + 1,
          // tombstones were applied at HEAD, so snapshots older than
          // the current seq lost rows: the watermark advances IN THE
          // SAME COMMIT and those as-of reads are refused loudly
          // (compact ≡ [[vacuumIndex]] at the current seq)
          retention = if (hadTombstones) Some(m.nextSeq) else m.retention)
        .withSegsReplaced(POSTINGS, seg(pSeg))
        .withSegsReplaced(DOCLEN, seg(dSeg))
        .withSegsReplaced(LEXICON, seg(lSeg))
        .withSegsReplaced(TOMBSTONES, Vector.empty)
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
    }

  /** Auto-compaction policy: compact iff the manifest lists more than
    * `maxSegments` postings segments — the scheduler knob that keeps
    * long-running append/upsert streams from accumulating unbounded
    * union branches and small files (each maintenance op adds one
    * segment; every serve unions the live ones, so segment count IS
    * the serve-side cost driver [[graft.index.Manifest.describe]]
    * exposes). Returns whether it compacted. A streaming ingest calls
    * it after each batch: amortized one rewrite per `maxSegments`
    * appends, the classic LSM trigger. */
  def autoCompact(spark: SparkSession, dir: String,
                  maxSegments: Int = 8): Boolean = {
    require(maxSegments >= 1)
    val n = Manifest.load(spark, dir).segs(POSTINGS).size
    if (n > maxSegments) { compactIndex(spark, dir); true } else false
  }

  /** ROLLBACK: restore the index HEAD to snapshot `toSeq` — the
    * undo for a bad maintenance batch (a corrupted re-crawl upserted,
    * a takedown list that was too broad). Because every batch is a
    * seq-stamped event (see [[currentSeq]]), rollback is a TRUNCATION
    * of the event log: physically drop rows written at events
    * >= toSeq and tombstones recorded at events >= toSeq, then reset
    * the counter to toSeq. After it, serving HEAD equals what
    * `asOf = Some(toSeq)` served before, every older snapshot is
    * untouched (their rows and tombstones all predate the cut), and
    * maintenance continues from toSeq — the next append writes at
    * the seq slot the rolled-back batch vacated, which is exactly why
    * the dead rows must be removed physically, not hidden. The
    * rewrite is a filter over the index itself (never re-tokenizes);
    * rollback to the current seq is a no-op. Truncated segments,
    * surviving tombstones and the reset counter land in ONE manifest
    * commit — no crash ordering to argue about. ph26's oracle proves
    * HEAD-after-rollback ≡ the stale corpus; PhraseIndexSpec covers
    * append-after-rollback reusing the freed seq slot. */
  def rollbackIndex(spark: SparkSession, dir: String, toSeq: Long): Unit =
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val cur = m.nextSeq
      require(toSeq >= 1 && toSeq <= cur,
        s"rollback target $toSeq outside [1, $cur]")
      m.retention.foreach(r => require(toSeq >= r,
        s"rollback target $toSeq predates the retention watermark $r"))
      if (toSeq == cur) ()
      else rollbackTo(spark, dir, m, toSeq)
    }

  private def rollbackTo(spark: SparkSession, dir: String,
                         m: graft.index.Manifest, toSeq: Long): Unit = {
      val pSeg = m.nextSeg(POSTINGS)
      val dSeg = m.nextSeg(DOCLEN)
      val tSeg = m.nextSeg(TOMBSTONES)
      postingsOf(spark, dir, m)
        .filter(col("seq") < toSeq)
        .select(col("doc_id"), col("pos"), col("tok"), col("seq"),
          col("bucket"))
        .repartition(col("bucket"))
        .sortWithinPartitions("tok", "doc_id", "pos")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/$pSeg")
      doclenOf(spark, dir, m)
        .filter(col("seq") < toSeq)
        .repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dir/$dSeg")
      // rollback to before the first surviving batch truncates to
      // zero rows — same empty-component guard as compactIndex
      val kept = segHasData(spark, s"$dir/$pSeg")
      val lSeg = m.nextSeg(LEXICON)
      if (kept)
        spark.read.parquet(s"$dir/$pSeg").select(col("tok"), col("bucket"))
          .distinct()
          .repartitionByRange(col("tok")).sortWithinPartitions("tok")
          .write.mode("overwrite").parquet(s"$dir/$lSeg")
      def seg(s: String): Vector[String] =
        if (kept) Vector(s) else Vector.empty
      var m2 = m.copy(version = m.version + 1, nextSeq = toSeq)
        .withSegsReplaced(POSTINGS, seg(pSeg))
        .withSegsReplaced(DOCLEN, seg(dSeg))
        .withSegsReplaced(LEXICON, seg(lSeg))
        .withSegsReplaced(TOMBSTONES, Vector.empty)
      tombstonesOf(spark, dir, m).foreach { t =>
        val keep = t.filter(col("upto") < toSeq)
        if (!keep.isEmpty) {
          keep.coalesce(1).write.mode("overwrite").parquet(s"$dir/$tSeg")
          m2 = m2.withSegsReplaced(TOMBSTONES, Vector(tSeg))
        }
      }
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
  }

  /** VACUUM: bound time travel at `retainAsOf` and physically reclaim
    * everything no retained snapshot can see — the retention policy
    * between [[deleteFromIndex]] (logical only, keeps all history)
    * and [[compactIndex]] (reclaims to HEAD, keeps none). A row
    * written at seq s and killed by a tombstone at upto u is visible
    * exactly in snapshots (s, u]; once u < retainAsOf no snapshot
    * this index still serves can see it, so the rewrite drops rows
    * killed by a FULLY-AGED tombstone (upto < retainAsOf), drops
    * those tombstones, and advances the watermark — all in ONE
    * manifest commit, so a crash can never leave reclaimed rows
    * behind a watermark that still admits their snapshots. HEAD and
    * every as-of >= retainAsOf serve byte-identically (ph29's
    * oracle); as-of reads and rollbacks below the watermark are
    * REFUSED loudly (liveOnly/rollbackIndex check it). The watermark
    * is MONOTONIC: a vacuum below the current watermark is refused —
    * rows behind it are already gone, so moving it backward would
    * re-admit as-of reads whose rows were reclaimed (the r14 ADVICE
    * gap). Younger tombstones stay — their rows are still visible to
    * retained snapshots. Vacuum at the current seq ≡ compact's
    * reclaim with history fully dropped. */
  def vacuumIndex(spark: SparkSession, dir: String, retainAsOf: Long): Unit =
    Manifest.withLease(spark, dir) {
      val m = Manifest.load(spark, dir)
      val cur = m.nextSeq
      require(retainAsOf >= 1 && retainAsOf <= cur,
        s"retention watermark $retainAsOf outside [1, $cur]")
      m.retention.foreach(r => require(retainAsOf >= r,
        s"retention watermark would move BACKWARD: $retainAsOf < current $r " +
          "(rows behind the current watermark are already reclaimed)"))
      var m2 = m.copy(version = m.version + 1, retention = Some(retainAsOf))
      tombstonesOf(spark, dir, m).foreach { t =>
        val aged = t.filter(col("upto") < retainAsOf)
        if (!aged.isEmpty) {
          val ts = broadcast(aged.select(col("doc_id").as("__t_doc"),
            col("upto").as("__t_upto")))
          def reclaim(df: DataFrame): DataFrame =
            df.join(ts, df("doc_id") === col("__t_doc") &&
              df("seq") < col("__t_upto"), "left_anti")
          val pSeg = m.nextSeg(POSTINGS)
          val dSeg = m.nextSeg(DOCLEN)
          val tSeg = m.nextSeg(TOMBSTONES)
          reclaim(postingsOf(spark, dir, m)
              .select(col("doc_id"), col("pos"), col("tok"), col("seq"),
                col("bucket")))
            .repartition(col("bucket"))
            .sortWithinPartitions("tok", "doc_id", "pos")
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$dir/$pSeg")
          reclaim(doclenOf(spark, dir, m))
            .repartitionByRange(col("doc_id"))
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite").parquet(s"$dir/$dSeg")
          // all rows aged out -> empty components (guard as compact)
          val kept = segHasData(spark, s"$dir/$pSeg")
          val lSeg = m.nextSeg(LEXICON)
          if (kept)
            spark.read.parquet(s"$dir/$pSeg").select(col("tok"), col("bucket"))
              .distinct()
              .repartitionByRange(col("tok")).sortWithinPartitions("tok")
              .write.mode("overwrite").parquet(s"$dir/$lSeg")
          def seg(s: String): Vector[String] =
            if (kept) Vector(s) else Vector.empty
          m2 = m2.withSegsReplaced(POSTINGS, seg(pSeg))
            .withSegsReplaced(DOCLEN, seg(dSeg))
            .withSegsReplaced(LEXICON, seg(lSeg))
            .withSegsReplaced(TOMBSTONES, Vector.empty)
          val young = t.filter(col("upto") >= retainAsOf)
          if (!young.isEmpty) {
            young.coalesce(1).write.mode("overwrite").parquet(s"$dir/$tSeg")
            m2 = m2.withSegsReplaced(TOMBSTONES, Vector(tSeg))
          }
        }
      }
      Manifest.commit(spark, dir, m2)
      Manifest.gc(spark, dir, m2)
    }

  /** MERGE independently built shard indexes into one serving layout —
    * the distributed 100 TB build shape: N builders each tokenize and
    * index a corpus partition in parallel (no coordination beyond a
    * shared bucket modulus), then one merge job folds the shards into
    * a single index, exactly Lucene's segment-merge step. The merge
    * never re-tokenizes: it is a union + shuffle-by-bucket + sort over
    * the shards' postings (and a range-partition over their doclens).
    * Each shard's tombstones are resolved DURING the merge (its
    * deleted rows simply don't survive into the output), so the
    * merged index starts clean: seq re-stamped to 0, counter 1, no
    * tombstones — indistinguishable from a fresh build on the union
    * of the shards' live corpora (ph21's oracle).
    *
    * CONTRACT: shards share the bucket modulus (required here) and
    * their live doc sets are disjoint (same rule as [[appendIndex]]). */
  def mergeIndexes(spark: SparkSession, shards: Seq[String],
                   out: String): Unit = {
    require(shards.nonEmpty)
    val sms = shards.map(d => (d, Manifest.load(spark, d)))
    val moduli = sms.map(_._2.scalar("n_buckets").toInt)
    require(moduli.distinct.size == 1,
      s"shards disagree on the bucket modulus: $moduli")
    Manifest.withLease(spark, out) {
      val ver = Manifest.latest(spark, out).map(_.version).getOrElse(0L) + 1
      val m = graft.index.Manifest(
        version = ver, nextSeq = 1L, retention = None,
        scalars = Map("n_buckets" -> moduli.head.toString),
        segments = Map(
          POSTINGS -> Vector(s"$POSTINGS/seg-$ver"),
          DOCLEN -> Vector(s"$DOCLEN/seg-$ver"),
          LEXICON -> Vector(s"$LEXICON/seg-$ver"),
          TOMBSTONES -> Vector.empty))
      sms.map { case (d, sm) =>
          liveOnly(postingsOf(spark, d, sm), spark, d, sm)
            .select(col("doc_id"), col("pos"), col("tok"), col("bucket")) }
        .reduce(_.unionByName(_))
        .withColumn("seq", lit(0L))
        .repartition(col("bucket"))
        .sortWithinPartitions("tok", "doc_id", "pos")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$out/$POSTINGS/seg-$ver")
      sms.map { case (d, sm) =>
          liveOnly(doclenOf(spark, d, sm), spark, d, sm)
            .select(col("doc_id"), col("dl")) }
        .reduce(_.unionByName(_))
        .withColumn("seq", lit(0L))
        .repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$out/$DOCLEN/seg-$ver")
      spark.read.parquet(s"$out/$POSTINGS/seg-$ver")
        .select(col("tok"), col("bucket")).distinct()
        .repartitionByRange(col("tok")).sortWithinPartitions("tok")
        .write.mode("overwrite").parquet(s"$out/$LEXICON/seg-$ver")
      Manifest.commit(spark, out, m)
      Manifest.gc(spark, out, m)
    }
  }

  /** All words a boolean query touches (its served vocabulary). An
    * [[Infl]] contributes its whole candidate family — every member is
    * an exact token, so the served path prunes to the family's hash
    * buckets statically (absent members match nothing). */
  private def vocabOf(q: Q): Seq[String] = q match {
    case Phrase(ws)       => ws
    case Infl(w)          => Inflect.expand(w)
    case Near(a, b, _)    => vocabOf(a) ++ vocabOf(b)
    case MinCount(x, _)   => vocabOf(x)
    case Within(parts, _) => parts.flatMap(vocabOf)
    case And(l, r)        => vocabOf(l) ++ vocabOf(r)
    case Or(l, r)         => vocabOf(l) ++ vocabOf(r)
    case Not(x)           => vocabOf(x)
  }

  /** [[search]] over a [[writeIndex]] layout: the boolean evaluator
    * runs unchanged, but its postings come from the pruned vocabulary
    * buckets and the NOT-universe from the doc-length sidecar — no
    * corpus tokenize, no `documents` scan. A query over V distinct
    * words reads ≤ V of nBuckets index partitions plus the doc-level
    * metadata table. One manifest resolve per query: both reads serve
    * the SAME snapshot even if maintenance commits mid-query. */
  def servedSearch(spark: SparkSession, dir: String, query: String,
                   asOf: Option[Long] = None): DataFrame = {
    val q = parse(query)
    val m = Manifest.load(spark, dir)
    // wildcard-capable vocabulary pruning: exact words keep their
    // static bucket filters, `cust*` terms route through the lexicon
    val posts = prunedPatternPostings(spark, dir, m, vocabOf(q).distinct, asOf)
    // the NOT-universe must shrink with deletes too, or NOT-only
    // queries would resurrect tombstoned docs
    val universe =
      liveOnly(doclenOf(spark, dir, m), spark, dir, m, asOf).select("doc_id")
    eval(q, posts, universe)
  }

  /** [[bm25TopK]] over a [[writeIndex]] layout, arithmetic-identical
    * (same per-(doc,term) integer micro-score — see bm25TopK's
    * cross-engine exactness note) but with every input served from
    * the index: tf = posting count per (doc, term) from the pruned
    * vocabulary buckets, dl from the doclen sidecar, df/N/L as one
    * broadcast scalar aggregate. The corpus-sized work is ONE scan of
    * the term postings (~|terms|/nBuckets of the index) plus a
    * doc_id equi-join against doclen; the ordered LIMIT stays a
    * TakeOrdered. Per-doc totals sum BIGINT micro-scores, so the
    * doc-grouped sum needs no term ordering. */
  /** `allowed` (optional) = FILTERED ranking: an allow-list dimension
    * of doc_ids (tenant / collection / license scoping) semi-joined
    * into the CANDIDATE rows before the top-k, so all k slots fill
    * with matching docs — while the corpus statistics (N, L, df)
    * deliberately stay GLOBAL, the way a search engine scopes results
    * without re-weighting terms per filter (a per-filter df would
    * re-rank identically-matching docs differently per tenant).
    * ph30's oracle pins both halves of that contract. */
  def servedBm25TopK(spark: SparkSession, dir: String, terms: Seq[String],
                     k: Int = 10, asOf: Option[Long] = None,
                     allowed: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty)
    val m = Manifest.load(spark, dir)
    val tfAll = servedPostingsWith(spark, dir, m, terms.distinct, asOf)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // df comes from the UNFILTERED candidates (global stats contract)
    val dfs = tfAll.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tf = allowed.fold(tfAll)(a =>
      tfAll.join(broadcast(a.select(col("doc_id"))), Seq("doc_id"), "left_semi"))
    // deletes shift the GLOBAL stats too: N/L/avgdl come from the
    // live doclen rows, df from the live tf rows — exactly what a
    // rebuild on the remaining corpus would compute (ph15's oracle);
    // an as-of read scores with the SNAPSHOT's stats (ph24's oracle)
    val dl = liveOnly(doclenOf(spark, dir, m), spark, dir, m, asOf)
    val tot = broadcast(dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("l")))
    val idf = (lit(2) * (col("n") - col("df")) + lit(1)).cast("double") /
      (lit(2) * col("df") + lit(1)).cast("double")
    val tfc = (lit(88.0) * col("tf") * col("l")) /
      (lit(40.0) * col("tf") * col("l") + lit(12.0) * col("l") +
        lit(36.0) * col("dl") * col("n"))
    tf.join(broadcast(dfs), "tok")
      .join(dl, "doc_id")
      .crossJoin(tot)
      .select(col("doc_id"),
        round(idf * tfc * lit(1000000)).cast("long").as("sc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** PENDING-RECLAIM backlog: tombstoned doc ids not yet physically
    * reclaimed, with the event (`upto`) each takedown landed at — the
    * observability behind a compaction/vacuum schedule (how much dead
    * weight serving anti-joins carry). One dimension-sized sidecar
    * read; empty frame if no deletes are outstanding. */
  def pendingDeletes(spark: SparkSession, dir: String): DataFrame =
    tombstonesOf(spark, dir, Manifest.load(spark, dir))
      .map(_.select(col("doc_id"), col("upto")).distinct())
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("doc_id", "upto")
      }

  /** Doc ids the index SERVES at HEAD (tombstones applied) — the
    * liveness probe behind the cross-plane audit (the IVF plane's
    * [[graft.similarity.IntKMeans.liveIds]] twin). One
    * dimension-sized doclen sidecar read; empty frame for an empty
    * index. */
  def liveDocIds(spark: SparkSession, dir: String): DataFrame = {
    val m = Manifest.load(spark, dir)
    Manifest.readComponent(spark, dir, m, DOCLEN) match {
      case Some(d) => liveOnly(d, spark, dir, m).select("doc_id").distinct()
      case None =>
        import spark.implicits._
        Seq.empty[Long].toDF("doc_id")
    }
  }

  /** BATCH BM25: a TABLE of term-set queries ranked in ONE pass over
    * the index — [[servedBm25TopK]]'s scoring arithmetic verbatim
    * (integer micro-scores, global N/L/df), but the union of all
    * queries' vocabularies is read once (one pruned postings scan)
    * and a broadcast (query_id, tok) dimension fans the tf rows out
    * to their queries. df stays a per-TOKEN property, so one df table
    * serves every query. The per-query top-k is a rank window over
    * the scored (query, doc) pairs — the one shape where a window
    * beats N TakeOrdereds, because the N=1 ordered-limit trick can't
    * share the scan. ph34's oracle replays every step. */
  def servedBatchBm25TopK(spark: SparkSession, dir: String,
                          termSets: Seq[(Long, Seq[String])], k: Int = 10,
                          asOf: Option[Long] = None): DataFrame = {
    require(termSets.nonEmpty && termSets.forall(_._2.nonEmpty))
    import spark.implicits._
    val m = Manifest.load(spark, dir)
    val terms = termSets
      .flatMap { case (q, ws) => ws.distinct.map(w => (q, w)) }
      .toDF("query_id", "tok")
    val vocab = termSets.flatMap(_._2).distinct
    val tf = servedPostingsWith(spark, dir, m, vocab, asOf)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dl = liveOnly(doclenOf(spark, dir, m), spark, dir, m, asOf)
    val tot = broadcast(dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("l")))
    val idf = (lit(2) * (col("n") - col("df")) + lit(1)).cast("double") /
      (lit(2) * col("df") + lit(1)).cast("double")
    val tfc = (lit(88.0) * col("tf") * col("l")) /
      (lit(40.0) * col("tf") * col("l") + lit(12.0) * col("l") +
        lit(36.0) * col("dl") * col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
    tf.join(broadcast(terms), "tok")
      .join(broadcast(dfs), "tok")
      .join(dl, "doc_id")
      .crossJoin(tot)
      .select(col("query_id"), col("doc_id"),
        round(idf * tfc * lit(1000000)).cast("long").as("sc"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("sc")).as("bm25_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("bm25_micro"))
  }
}
