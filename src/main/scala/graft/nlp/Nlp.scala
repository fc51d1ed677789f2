package graft.nlp

import graft.core.{Dep, Name, Sentence, Token}
import graft.sources.Gen

/** Deterministic, self-contained NLP for the fixture grammar
  * (SURVEY.md §7 module 2). Reimplements — from public behavior only —
  * the JET steps the reference pipeline needs: tokenizer, lexicon POS
  * tagger, gazetteer name tagger, deterministic dependency parser,
  * lemmatizer/stemmer, NP-term extraction
  * (cf. /root/reference/src/props/parseprops:25-31 pipeline order and
  * IcePreprocessor.java:163-221). The parity domain is the bundled-style
  * tiny corpora + the synthetic corpus, mirroring the reference's own
  * unit-test strategy (DepPathsTest.java supplies parses inline).
  *
  * Everything here is a pure function — safe to call from typed
  * map/flatMap on executors without shared state.
  */
object Nlp {

  // --- lexicons -----------------------------------------------------------

  /** verb surface → lemma (covers the generator grammar + the reference's
    * unit-test sentences: visited/lived/shot — DepPathsTest.java:55,88,119). */
  val verbLemma: Map[String, String] = Map(
    "lives" -> "live", "lived" -> "live", "live" -> "live",
    "visited" -> "visit", "visits" -> "visit", "visit" -> "visit",
    "works" -> "work", "worked" -> "work",
    "moved" -> "move", "moves" -> "move",
    "born" -> "born", "shot" -> "shot",
    "died" -> "die", "dies" -> "die",
    "is" -> "be", "was" -> "be", "were" -> "be", "are" -> "be",
    "has" -> "have", "have" -> "have", "had" -> "have",
    "mentioned" -> "mention", "praised" -> "praise",
    "reviewed" -> "review", "criticized" -> "criticize",
    "toured" -> "tour", "tours" -> "tour",
    "paid" -> "pay", "pays" -> "pay",
    "married" -> "marry", "marries" -> "marry")

  /** auxiliary verbs that start a verb chain (vch) when followed by a verb. */
  private val auxiliaries = Set("is", "was", "were", "are", "has", "have", "had")

  private val prepositions = Set("in", "to", "at", "of", "from", "with")
  private val determiners = Set("the", "a", "an")
  private val adverbs = Set("here", "yesterday", "today", "now")
  private val adjectives = Set("annual", "civic", "federal", "regional")
  /** Term stopwords, aligned with the reference's list
    * (TermCounter.java:36-45 — closed-class words only; it contains no
    * content nouns, so "news" in the bundled corpora IS a term). */
  val stopwords: Set[String] = determiners ++ prepositions ++
    Set("and", "or", "be", "been", "this", "that", "it")

  /** Gazetteer entries covering the reference's bundled tiny corpora
    * (src/test/resources/tinyCorpus2-4 — the validateCLI fixtures, read
    * directly by ReferenceCorpusSpec). These surfaces never occur in
    * the generated corpus, so every oracle gate is unaffected; they
    * exist so the reference's own test documents type correctly, the
    * way JET's onoma dictionary covers them. */
  private val extraFirstNames = Set("Francoise", "Karl")
  private val extraGpes =
    Set("Paris", "Berlin", "Illinois", "Washington", "France", "Germany")

  private val firstNames: Set[String] =
    Gen.persons.map(_.split(' ')(0)).toSet ++ extraFirstNames
  private val lastNames: Set[String] =
    Gen.persons.map(_.split(' ')(1)).toSet
  /** city surface → canonical city (aliases resolve to their base form). */
  val gpeCanonical: Map[String, String] =
    Gen.gpes.map(g => g -> g).toMap ++
      Gen.gpes.zip(Gen.gpeAliases).map { case (g, a) => a -> g }.toMap ++
      extraGpes.map(g => g -> g).toMap

  def lemma(w: String): String = verbLemma.getOrElse(w.toLowerCase, w.toLowerCase)

  /** Verb lemma with a rule-based inflection fallback for verbs outside
    * the lexicon (otherwise a non-fixture verb passes through
    * unlemmatized and splits its path counts across inflections).
    * Conservative stripping: -ies/-ied→y, -eed→ee, -es after
    * sibilants, -s, -ed/-ing with doubled-consonant collapse and
    * Porter-style e-restoration (Porter 1980 step 1b: +e after at/bl/iz
    * stems and after short CVC stems) — "agreed"→"agree",
    * "smiled"→"smile", "taking"→"take", while "visited"→"visit" and
    * "walking"→"walk" stay e-less. Lexicon verbs (the whole fixture
    * grammar) are unaffected. */
  def lemmaVerb(w: String): String = {
    val lw = w.toLowerCase
    verbLemma.getOrElse(lw, {
      def vowel(s: String, i: Int): Boolean =
        "aeiou".indexOf(s(i)) >= 0 ||
          (s(i) == 'y' && i > 0 && "aeiou".indexOf(s(i - 1)) < 0)
      def vowelGroups(s: String): Int = {
        var g = 0; var i = 0
        while (i < s.length) {
          if (vowel(s, i) && (i == 0 || !vowel(s, i - 1))) g += 1
          i += 1
        }
        g
      }
      // Porter 1b cleanup of a stripped -ed/-ing stem: collapse a
      // doubled final consonant, OR restore the elided base-form 'e'
      // (mutually exclusive branches, as in the reference algorithm).
      // The raw Porter AT→ATE post-rule is NOT transplanted verbatim:
      // Porter later strips that e again in step 5, but this function
      // must return the BASE FORM, and unconditional +e after "at"
      // splits -eat/-at verbs ("treated"→"treate" vs "treats"→"treat").
      // So "at" restores e only after a consonant or 'i' ("generat"→
      // generate, "associat"→associate) and never after another vowel
      // ("treat", "float", "heat" stay e-less; the known miss is the
      // small vowel+ate class: "creat"→create is not restored).
      def fixStem(s: String): String =
        if (s.length >= 3 && s.last == s(s.length - 2) &&
            !"aeiouz".contains(s.last) && s.last != 'l' && s.last != 's')
          s.dropRight(1)
        else if (s.length >= 3 && s.endsWith("at") &&
                 (!vowel(s, s.length - 3) || s(s.length - 3) == 'i'))
          s + "e"
        else if (s.endsWith("bl") || s.endsWith("iz"))
          s + "e"
        else if (s.length >= 3 && !vowel(s, s.length - 1) &&
                 "wxy".indexOf(s.last) < 0 && vowel(s, s.length - 2) &&
                 !vowel(s, s.length - 3) && vowelGroups(s) == 1)
          s + "e"
        else s
      if (lw.length > 4 && lw.endsWith("ies")) lw.dropRight(3) + "y"
      else if (lw.length > 4 && lw.endsWith("ied")) lw.dropRight(3) + "y"
      else if (lw.length > 4 && lw.endsWith("eed")) lw.dropRight(1)
      else if (lw.length > 4 && lw.endsWith("es") &&
               Seq("ses", "xes", "zes", "ches", "shes").exists(lw.endsWith))
        lw.dropRight(2)
      else if (lw.length > 3 && lw.endsWith("s") && !lw.endsWith("ss"))
        lw.dropRight(1)
      else if (lw.length > 4 && lw.endsWith("ed")) fixStem(lw.dropRight(2))
      else if (lw.length > 5 && lw.endsWith("ing")) fixStem(lw.dropRight(3))
      else lw
    })
  }

  // --- tokenizer ----------------------------------------------------------

  // token grammar: [A-Za-z][A-Za-z-]* | [0-9]+ | 's | [.,;:!?$]
  // (hand-rolled scanner — the regex findAllMatchIn version was the
  // single hottest slice of the extraction loop; semantics identical)
  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  def tokenize(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isLetter(c)) {
        val s = i
        i += 1
        while (i < n && { val d = text.charAt(i); isLetter(d) || d == '-' }) i += 1
        val w = text.substring(s, i)
        out += Token(w, s, i, posOf(w))
      } else if (c >= '0' && c <= '9') {
        val s = i
        i += 1
        while (i < n && { val d = text.charAt(i); d >= '0' && d <= '9' }) i += 1
        val w = text.substring(s, i)
        out += Token(w, s, i, posOf(w))
      } else if (c == '\'' && i + 1 < n && text.charAt(i + 1) == 's') {
        out += Token("'s", i, i + 2, "POS")
        i += 2
      } else if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' ||
                 c == '?') {
        out += Token(String.valueOf(c), i, i + 1, ".")
        i += 1
      } else if (c == '$') {
        out += Token("$", i, i + 1, "$")
        i += 1
      } else i += 1
    }
    out.result()
  }

  // --- POS (lexicon tagger, cf. "tagPOS" stage) ----------------------------

  /** Personal pronouns (PRP); the gendered subset drives coref
    * agreement (resolvePronouns). */
  private val pronounPos = Set("he", "she", "it", "they", "him", "her", "them")
  val pronounGender: Map[String, String] =
    Map("he" -> "M", "him" -> "M", "she" -> "F", "her" -> "F")

  /** POS of a word token (the tokenizer tags 's / punctuation / $
    * directly; digit runs dispatch on the first char). */
  private def posOf(w: String): String = {
    val c0 = w.charAt(0)
    if (c0 >= '0' && c0 <= '9') return "CD"
    val lw = w.toLowerCase
    if (pronounPos(lw)) "PRP"
    else if (verbLemma.contains(lw) && lw != "born" && lw != "shot") tagVerb(lw)
    else if (lw == "born" || lw == "shot") "VBN"
    else if (prepositions(lw)) "IN"
    else if (determiners(lw)) "DT"
    else if (adverbs(lw)) "RB"
    else if (adjectives(lw)) "JJ"
    else if (c0 >= 'A' && c0 <= 'Z') "NNP"
    else "NN"
  }

  private def tagVerb(lw: String): String =
    if (lw.endsWith("ed") || lw == "was" || lw == "were" || lw == "had") "VBD"
    else if (lw.endsWith("s")) "VBZ"
    else "VB"

  // --- gazetteer name tagger (broadcast-dict style, cf. onoma export
  //     JetEngineBuilder.java:140-156 consumed by tagNamesFromOnoma) ------

  def tagNames(tokens: Vector[Token]): Vector[Name] = {
    val out = Vector.newBuilder[Name]
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (t.pos == "NNP" && firstNames(t.word) && i + 1 < tokens.length &&
          tokens(i + 1).pos == "NNP" && lastNames(tokens(i + 1).word)) {
        val surf = t.word + " " + tokens(i + 1).word
        out += Name(i, i + 2, i + 1, "PERSON", surf, surf)
        i += 2
      } else if (t.pos == "NNP" && gpeCanonical.contains(t.word)) {
        out += Name(i, i + 1, i, "GPE", t.word, gpeCanonical(t.word))
        i += 1
      } else if (t.pos == "NNP" && lastNames(t.word)) {
        // partial (bare last-name) person mention; the document-level
        // entity merge (resolvePartialNames) rewrites it to the full
        // entity name when a preceding mention carries this last name
        out += Name(i, i + 1, i, "PERSON", t.word, t.word)
        i += 1
      } else i += 1
    }
    out.result()
  }

  // --- deterministic dependency parser ------------------------------------

  /** Pattern-grammar dependency parser for the fixture domain. Emits
    * reference-style arcs (nsubj, vch, prep, pobj, dobj, det, nn) with
    * the same shapes the reference's unit tests supply inline
    * (DepPathsTest.java:43-47,72-80). */
  def parse(tokens: Vector[Token]): Vector[Dep] = {
    val arcs = Vector.newBuilder[Dep]
    def mk(label: String, s: Int, t: Int): Dep =
      Dep(label, tokens(s).word, s, tokens(s).pos, tokens(t).word, t, tokens(t).pos)
    val verbIdx = tokens.indices.filter(i => tokens(i).pos.startsWith("VB"))
    if (verbIdx.isEmpty) return arcs.result()
    val v0 = verbIdx.head
    // verb chain: auxiliary followed (possibly over an adverb) by a verb
    val chained = verbIdx.find(j => j > v0 && j - v0 <= 2 &&
      auxiliaries(tokens(v0).word.toLowerCase))
    val main = chained.getOrElse(v0)
    chained.foreach(j => arcs += mk("vch", v0, j))
    // subject = last NN/NNP/PRP before the first verb (a pronoun subject
    // parses like a one-token nominal; coref resolution is a later,
    // document-level pass)
    val subj = (0 until v0).reverse
      .find(i => tokens(i).pos == "NNP" || tokens(i).pos == "NN" ||
        tokens(i).pos == "PRP")
    subj.foreach { s =>
      arcs += mk("nsubj", v0, s)
      // nn arc for a two-token name
      if (s > 0 && tokens(s - 1).pos == "NNP" && tokens(s).pos == "NNP")
        arcs += mk("nn", s, s - 1)
    }
    // complement: first IN or noun after the main verb (skipping adverbs)
    var j = main + 1
    while (j < tokens.length && tokens(j).pos == "RB") j += 1
    if (j < tokens.length) {
      // objects attach to the HEAD of an NNP run (the last token of a
      // multi-token name), with an nn arc to the modifier — matching the
      // head-offset convention of Name (reference head alignment,
      // aceJet/TypedRelationExtractorScorer.java:53-80)
      def headOfRun(o0: Int): Int = {
        var o = o0
        if (tokens(o).pos == "NNP")
          while (o + 1 < tokens.length && tokens(o + 1).pos == "NNP") o += 1
        o
      }
      if (tokens(j).pos == "IN") {
        arcs += mk("prep", main, j)
        val obj = (j + 1 until tokens.length)
          .find(k => tokens(k).pos == "NNP" || tokens(k).pos == "NN")
        obj.foreach { o0 =>
          val o = headOfRun(o0)
          arcs += mk("pobj", j, o)
          if (o0 > j + 1 && tokens(o0 - 1).pos == "DT") arcs += mk("det", o, o0 - 1)
          if (o > 0 && tokens(o - 1).pos == "NNP" && tokens(o).pos == "NNP")
            arcs += mk("nn", o, o - 1)
        }
      } else {
        val obj = (j until tokens.length)
          .find(k => tokens(k).pos == "NNP" || tokens(k).pos == "NN")
        obj.foreach { o0 =>
          val o = headOfRun(o0)
          arcs += mk("dobj", main, o)
          if (o0 > 0 && tokens(o0 - 1).pos == "DT") arcs += mk("det", o, o0 - 1)
          if (o > 0 && tokens(o - 1).pos == "NNP" && tokens(o).pos == "NNP")
            arcs += mk("nn", o, o - 1)
          // trailing PP after the object ("V NP in NP"): prep + pobj.
          // Attachment: an "of" PP is partitive and attaches to the
          // preceding object noun ("a group OF reports" — the Stanford
          // convention that puts quantifier hops ON the path, which is
          // what DepPathRegularizer collapses); other preps attach to
          // the verb (locative "met NP in NP").
          val prepIdx = (o + 1 until tokens.length).find(tokens(_).pos == "IN")
          prepIdx.foreach { pi =>
            val gov = if (tokens(pi).word.equalsIgnoreCase("of")) o else main
            arcs += mk("prep", gov, pi)
            (pi + 1 until tokens.length)
              .find(k => tokens(k).pos == "NNP" || tokens(k).pos == "NN")
              .foreach { p0 =>
                val po = headOfRun(p0)
                arcs += mk("pobj", pi, po)
                if (p0 > pi + 1 && tokens(p0 - 1).pos == "DT")
                  arcs += mk("det", po, p0 - 1)
                if (po > 0 && tokens(po - 1).pos == "NNP" &&
                    tokens(po).pos == "NNP")
                  arcs += mk("nn", po, po - 1)
              }
          }
        }
      }
    }
    // determiner of the subject
    subj.foreach { s =>
      if (s > 0 && tokens(s - 1).pos == "DT") arcs += mk("det", s, s - 1)
    }
    arcs.result()
  }

  /** Verb-chain transform (DepTransformer analog, DepPaths.java:245-251):
    * collapse vch(aux, main) by re-attaching the auxiliary's dependents
    * to the chain's main verb, dropping the vch arc. */
  def transform(arcs: Vector[Dep]): Vector[Dep] = {
    val chains = arcs.filter(_.dep == "vch")
    if (chains.isEmpty) return arcs
    val auxToMain = chains.map(a => a.srcPos -> a).toMap
    arcs.flatMap { a =>
      if (a.dep == "vch") None
      else auxToMain.get(a.srcPos) match {
        case Some(ch) =>
          Some(a.copy(srcWord = ch.tgtWord, srcPos = ch.tgtPos, srcTag = ch.tgtTag))
        case None => Some(a)
      }
    }
  }

  // --- NP term extraction (X8/F7, TermCounter.java:224-252) ---------------

  /** Candidate terms (X8/F7, TermCounter.java:224-252): for each
    * maximal JJ/NN run not overlapping a tagged name, emit every
    * noun/adjective SUFFIX ending at the group's NN head (so
    * "annual budget" yields both "budget" and "annual budget"), tokens
    * length > 1 and non-stopword; PLUS name terms `surface/nnp` under
    * the F8 filter (TermCounter.java:186-197 — terms and names are
    * counted combined). */
  def extractTerms(tokens: Vector[Token], names: Vector[Name]): Vector[String] = {
    val nt = tokens.length
    val nameToks = new Array[Boolean](nt)
    names.foreach(n => {
      var j = n.tokStart
      while (j < n.tokEnd && j < nt) { nameToks(j) = true; j += 1 }
    })
    val out = Vector.newBuilder[String]
    // lowercased words cached once (ok() and suffix building both need
    // them; the per-check toLowerCase was a hot allocation)
    val lw = new Array[String](nt)
    def lwOf(j: Int): String = {
      if (lw(j) == null) lw(j) = tokens(j).word.toLowerCase
      lw(j)
    }
    def ok(j: Int): Boolean =
      !nameToks(j) && (tokens(j).pos == "NN" || tokens(j).pos == "JJ") &&
        tokens(j).word.length > 1 && !stopwords(lwOf(j))
    var i = 0
    while (i < nt) {
      if (ok(i)) {
        var e = i
        while (e + 1 < nt && ok(e + 1)) e += 1
        // suffixes must end at (and include) the NN head — the LAST NN
        // of the run, not necessarily the run's last token: the
        // reference's noun group ends at its noun head
        // (TermCounter.java:215-252 walks backward from the group
        // head), so a trailing adjective after the head ("the budget,
        // annual ...") sits OUTSIDE the group and must not suppress the
        // head's suffixes. Build each suffix by prepending to the
        // previous (no slice/map per suffix).
        var h = e
        while (h >= i && tokens(h).pos != "NN") h -= 1
        if (h >= i) {
          var term = lwOf(h)
          out += term
          var s = h - 1
          while (s >= i) {
            term = lwOf(s) + " " + term
            out += term
            s -= 1
          }
        }
        i = e + 1
      } else i += 1
    }
    names.foreach { n =>
      if (n.etype == "PERSON" || n.etype == "GPE") {
        val t = n.surface.trim.replaceAll("\\s+", " ") + "/nnp"
        if (nameTermAllowed(t)) out += t
      }
    }
    out.result()
  }

  // --- term/seed filters (F8/F9) -------------------------------------------

  /** F8 (TermCounter.java:186-197): drop name terms that are too short
    * (≤ 5 chars including the `/nnp` suffix) or not letter-initial. */
  def nameTermAllowed(term: String): Boolean =
    term.length > 5 && term.headOption.exists(_.isLetter)

  /** F9 (EntitySetExpander.java:86-112): exclude seed candidates that
    * are derivational nouns (-tion, -ment), URLs/emails, capitalized, or
    * already in the set / previously suggested. */
  /** Scalar twin of `EntitySetStage.candidateAllowed` (the production
    * column predicate) plus the in-set exclusion the expander applies
    * separately; EntityFiltersSpec cross-pins the two encodings so they
    * cannot drift. The capitalization test is `c.toLower == c` — the
    * exact scalar meaning of the column's
    * `substring(t,1,1) === lower(substring(t,1,1))` (for a titlecase
    * letter `isUpper` is false but `toLower` still changes it, so
    * `!isUpper` would silently diverge from the column form). */
  def seedCandidateAllowed(term: String, inSet: Set[String],
                           suggested: Set[String]): Boolean =
    // the reference rejects the empty string explicitly
    // (EntitySetExpander.java:97) and the vacuous headOption.forall
    // would otherwise admit it — no current term source emits empty
    // terms, but the library surface must match
    term.nonEmpty &&
      !term.endsWith("tion") && !term.endsWith("ment") &&
      !term.startsWith("www.") && !term.contains("@") &&
      !term.startsWith("http") &&
      term.headOption.forall(c => c.toLower == c) &&
      !inSet(term) && !suggested(term)

  /** F5 (DepPaths.java:272-280): bucket Penn tags → {nnp, nn, vb, o}
    * for ngram-event rendering. */
  def normalizePos(pos: String): String =
    if (pos.startsWith("NNP")) "nnp"
    else if (pos.startsWith("NN")) "nn"
    else if (pos.startsWith("VB")) "vb"
    else "o"

  /** F6 (IcePreprocessor.java:819-837): normalize a (possibly
    * multi-word) term — whitespace → `_`, lowercase, lemmatize each
    * piece. */
  def normalizeWord(w: String): String =
    w.trim.split("\\s+").map(p => lemma(p)).mkString("_")

  // --- number / time / money tagging (F12, IcePreprocessor.java:572-658) --

  /** Multiplier word table. The reference maps million→10000 (sic — a
    * bug in IcePreprocessor.java:653-658 kept deliberately for parity,
    * SURVEY.md §7 risk 4). */
  val illions: Map[String, Long] =
    Map("thousand" -> 1000L, "million" -> 10000L, "billion" -> 100000L)

  private val weekdays = Set("monday", "tuesday", "wednesday", "thursday",
    "friday", "saturday", "sunday", "yesterday", "today", "tomorrow")

  /** Tag NUMBER / MONEY / TIME value mentions over a token sequence:
    * `$` + number (+ optional illion) → MONEY with merged span; number +
    * illion → NUMBER; weekday/deictic words → TIME. Returns Name rows
    * whose `canonical` carries the normalized numeric value. */
  def tagValues(tokens: Vector[Token]): Vector[Name] = {
    val out = Vector.newBuilder[Name]
    var i = 0
    def numAt(j: Int): Option[Long] =
      // toLongOption: the POS tagger marks ANY all-digit run CD, so a
      // 19+-digit token must be skipped, not throw on the executor
      if (j < tokens.length && tokens(j).pos == "CD") tokens(j).word.toLongOption
      else None
    // base * illion must not wrap: skip the mention (like the 19-digit
    // case) instead of emitting a negative canonical value
    def mulExact(a: Long, b: Long): Option[Long] =
      try Some(Math.multiplyExact(a, b)) catch { case _: ArithmeticException => None }
    def illionAt(j: Int): Option[Long] =
      if (j < tokens.length) illions.get(tokens(j).word.toLowerCase) else None
    while (i < tokens.length) {
      val w = tokens(i).word
      if (w == "$" && numAt(i + 1).isDefined) {
        val base = numAt(i + 1).get
        val (mult, end) = illionAt(i + 2) match {
          case Some(m) => (m, i + 3)
          case None => (1L, i + 2)
        }
        mulExact(base, mult) match {
          case Some(v) =>
            out += Name(i, end, end - 1, "MONEY",
              tokens.slice(i, end).map(_.word).mkString(" "), v.toString)
            i = end
          case None => i += 1
        }
      } else if (numAt(i).isDefined && illionAt(i + 1).isDefined &&
                 mulExact(numAt(i).get, illionAt(i + 1).get).isDefined) {
        val v = mulExact(numAt(i).get, illionAt(i + 1).get).get
        out += Name(i, i + 2, i + 1, "NUMBER",
          tokens(i).word + " " + tokens(i + 1).word, v.toString)
        i += 2
      } else if (weekdays(w.toLowerCase)) {
        out += Name(i, i + 1, i, "TIME", w, w.toLowerCase)
        i += 1
      } else i += 1
    }
    out.result()
  }

  /** Crossing-annotation guard (F11, IcePreprocessor.java:692-698):
    * reject candidate spans that cross (partially overlap) an existing
    * span; nesting and disjointness are allowed. */
  def crosses(aStart: Int, aEnd: Int, bStart: Int, bEnd: Int): Boolean =
    (aStart < bStart && aEnd > bStart && aEnd < bEnd) ||
      (bStart < aStart && bEnd > aStart && bEnd < aEnd)

  /** Full per-sentence analysis. Value mentions (F12) are merged into
    * the mention stream under the crossing guard (F11) — the reference's
    * addNumberAndTime fold (DepPaths.java:252-256), so MONEY/NUMBER/TIME
    * arguments reach path mining and event extraction. */
  def analyze(text: String, offset: Int): Sentence = {
    val toks = tokenize(text)
    val names = tagNames(toks)
    val values = tagValues(toks).filter(v =>
      names.forall(n => !crosses(v.tokStart, v.tokEnd, n.tokStart, n.tokEnd)))
    val mentions = (names ++ values).sortBy(_.tokStart)
    val deps = parse(toks)
    Sentence(text, offset, toks, mentions, deps, extractTerms(toks, mentions))
  }

  /** First-name → gender lexicon for coref agreement (gazetteer-style,
    * like the name dictionaries the reference's JET preprocessing
    * ships). */
  val firstNameGender: Map[String, String] = Gen.firstGenders

  private def mentionGender(m: Name): Option[String] =
    firstNameGender.get(m.surface.split(' ')(0))

  /** X2 coref: document-level pronoun resolution over the per-sentence
    * analyses. For each gendered personal pronoun token, the antecedent
    * is the most recent PERSON mention in a PRECEDING sentence whose
    * first-name gender agrees with the pronoun; the resolved mention
    * spans the pronoun token but carries the antecedent's entity-level
    * surface/canonical (ACE entity semantics: path and triple arguments
    * decode to the entity's name, the way the reference's
    * Ace.buildAceEntities mention→entity indirection feeds DepPaths —
    * DepPaths.java:252-256). Unresolvable pronouns stay unannotated, and
    * a resolved mention is dropped under the F11 crossing guard.
    * Pure function — safe inside mapPartitions. */
  def resolvePronouns(sentences: Vector[Sentence]): Vector[Sentence] = {
    if (!sentences.exists(_.tokens.exists(_.pos == "PRP"))) return sentences
    val out = Vector.newBuilder[Sentence]
    // PERSON mentions of preceding sentences, most recent first
    var seen: List[Name] = Nil
    for (s <- sentences) {
      val pron = s.tokens.iterator.zipWithIndex.flatMap { case (t, i) =>
        if (t.pos != "PRP") None
        else pronounGender.get(t.word.toLowerCase).flatMap { g =>
          seen.find(m => mentionGender(m).contains(g))
            .map(a => Name(i, i + 1, i, "PERSON", a.surface, a.canonical))
        }
      }.filter(p => s.names.forall(n =>
        !crosses(p.tokStart, p.tokEnd, n.tokStart, n.tokEnd) &&
          !(p.tokStart >= n.tokStart && p.tokEnd <= n.tokEnd))).toVector
      out += (if (pron.isEmpty) s
              else s.copy(names = (s.names ++ pron).sortBy(_.tokStart)))
      // document order within the sentence reversed → most recent first
      seen = s.names.filter(_.etype == "PERSON").reverse.toList ::: seen
    }
    out.result()
  }

  /** X2 ACE entity merge, partial-name flavor: a bare last-name PERSON
    * mention ("Smith") resolves to the most recent PERSON mention in a
    * PRECEDING sentence whose surface ends with that last name — the
    * reference's Ace.buildAceEntities name-coreference fold. The span
    * stays on the partial token; surface/canonical become the entity's
    * full name. Unresolvable partials keep their own surface (a fresh
    * single-mention entity, as ACE would mint). */
  def resolvePartialNames(sentences: Vector[Sentence]): Vector[Sentence] = {
    def isPartial(n: Name): Boolean =
      n.etype == "PERSON" && n.tokEnd - n.tokStart == 1 &&
        lastNames(n.surface)
    if (!sentences.exists(_.names.exists(isPartial))) return sentences
    val out = Vector.newBuilder[Sentence]
    var seen: List[Name] = Nil
    for (s <- sentences) {
      val resolved = s.names.map { n =>
        if (isPartial(n))
          seen.find(m => m.surface.endsWith(" " + n.surface))
            .map(a => n.copy(surface = a.surface, canonical = a.canonical))
            .getOrElse(n)
        else n
      }
      out += (if (resolved == s.names) s else s.copy(names = resolved))
      seen = s.names.filter(m => m.etype == "PERSON" && !isPartial(m))
        .reverse.toList ::: seen
    }
    out.result()
  }

  /** Sentence splitter: period boundary (texts in this domain are single
    * sentences per span, but handle multi-sentence spans too). The
    * returned offset is where the TRIMMED sentence starts in `text` —
    * a span with leading whitespace must not shift every character
    * offset of its first sentence. */
  def splitSentences(text: String): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    def emit(raw: String, rawStart: Int): Unit = {
      val t = raw.trim
      if (t.nonEmpty) out += ((t, rawStart + raw.indexOf(t.charAt(0))))
    }
    var start = 0
    var i = 0
    while (i < text.length) {
      // boundary: '.' followed by ANY whitespace (newline/tab-separated
      // sentences must split too, or the one-clause parser mis-analyzes
      // the merged clauses) or end of text
      if (text.charAt(i) == '.' &&
          (i + 1 >= text.length || Character.isWhitespace(text.charAt(i + 1)))) {
        emit(text.substring(start, i + 1), start)
        start = i + 1
        while (start < text.length && Character.isWhitespace(text.charAt(start)))
          start += 1
        i = start
      } else i += 1
    }
    if (start < text.length) emit(text.substring(start), start)
    out.result()
  }
}
