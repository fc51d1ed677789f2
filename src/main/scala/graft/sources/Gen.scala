package graft.sources

import graft.core.{IceDoc, SpanT}

/** Deterministic synthetic interleaved-document generator.
  *
  * The corpus is a pure function of `doc_id` (modular arithmetic over
  * fixed pools), mirroring how the reference's own unit tests supply
  * sentences + parses inline (DepPathsTest.java:43-47) and the
  * validateCLI tiny corpora. Because every sentence is arithmetic in
  * `doc_id`, an independent DuckDB SQL oracle can reconstruct the
  * expected pipeline outputs from the `documents` parquet table alone —
  * that is the end-to-end correctness gate.
  *
  * Grammar (the parity domain, per SURVEY.md §7 scope control):
  *   [filler?] ( PERSON <pred-phrase> GPE . ) x (1..3)  with media spans
  * interleaved. Predicate selection is Zipf-skewed (livesIn = 50% of
  * sentences) to exercise salted two-phase aggregation; person/city
  * pools are small enough to create hot entities.
  */
object Gen {
  val persons: IndexedSeq[String] = {
    val firsts = Vector("Fred", "Harriet", "Mary", "John", "Alice", "Robert",
      "Susan", "David", "Linda", "James", "Karen", "Peter", "Nancy", "Frank",
      "Carol", "Henry", "Diane", "Walter", "Janet", "Arthur")
    val lasts = Vector("Smith", "Jones", "Brown", "Taylor", "Miller", "Wilson",
      "Moore", "Clark", "Hall", "Young", "Allen", "King", "Wright", "Scott",
      "Green", "Baker", "Adams", "Nelson", "Hill", "Carter")
    (0 until 40).map(i => firsts(i % 20) + " " + lasts((i * 7 + 3) % 20))
  }

  /** First-name gender lexicon (the kind of name-gender dictionary the
    * reference's JET pipeline ships for coref agreement). Drives both
    * the generated pronoun surface and the resolver's compatibility
    * check — and the oracle's independent recomputation. */
  val firstGenders: Map[String, String] = Map(
    "Fred" -> "M", "Harriet" -> "F", "Mary" -> "F", "John" -> "M",
    "Alice" -> "F", "Robert" -> "M", "Susan" -> "F", "David" -> "M",
    "Linda" -> "F", "James" -> "M", "Karen" -> "F", "Peter" -> "M",
    "Nancy" -> "F", "Frank" -> "M", "Carol" -> "F", "Henry" -> "M",
    "Diane" -> "F", "Walter" -> "M", "Janet" -> "F", "Arthur" -> "M")

  /** Gender per person index (parallel to [[persons]]). */
  val personGenders: IndexedSeq[String] =
    persons.map(p => firstGenders(p.split(' ')(0)))

  val gpes: IndexedSeq[String] = Vector("Chicago", "Seattle", "Boston",
    "Denver", "Atlanta", "Houston", "Phoenix", "Dallas", "Portland", "Miami",
    "Detroit", "Memphis", "Baltimore", "Milwaukee", "Tucson", "Fresno",
    "Sacramento", "Omaha", "Raleigh", "Oakland", "Tampa", "Aurora",
    "Anaheim", "Riverside", "Lexington")

  /** Alias surface forms for cities; canonicalization must map an alias
    * back to its canonical city (connected-components stage). */
  val gpeAliases: IndexedSeq[String] = gpes.map(_ + "ville")

  val fillNouns: IndexedSeq[String] = Vector("budget", "report", "election",
    "merger", "lawsuit", "treaty", "drought", "festival", "protest",
    "verdict", "audit", "shortage")

  /** filler verbs (past tense) and their lemmas. */
  val fillVerbs: IndexedSeq[String] =
    Vector("mentioned", "praised", "reviewed", "criticized")
  val fillVerbLemmas: IndexedSeq[String] =
    Vector("mention", "praise", "review", "criticize")

  /** Predicate phrases between PERSON and GPE; selection thresholds over
    * r = (id*19 + s*5) % 20 give the Zipf skew. */
  val predPhrases: IndexedSeq[String] = Vector("lives in", "visited",
    "works in", "moved to", "was born in", "died in")
  val predNames: IndexedSeq[String] = Vector("livesIn", "visited", "worksIn",
    "movedTo", "bornIn", "diedIn")
  /** Lexicalized dependency path each predicate's sentences produce. */
  val predPaths: IndexedSeq[String] = Vector(
    "nsubj-1:live:prep:in:pobj",
    "nsubj-1:visit:dobj",
    "nsubj-1:work:prep:in:pobj",
    "nsubj-1:move:prep:to:pobj",
    "nsubj-1:born:prep:in:pobj",
    "nsubj-1:die:prep:in:pobj")

  def predIndex(r: Long): Int =
    if (r < 10) 0 else if (r < 15) 1 else if (r < 17) 2
    else if (r == 17) 3 else if (r == 18) 4 else 5

  def nSentences(id: Long): Int = (id % 3).toInt + 1
  def hasFiller(id: Long): Boolean = id % 2 == 0
  def fillerNoun1(id: Long): String = fillNouns(((id * 3) % 12).toInt)
  def fillerNoun2(id: Long): String = fillNouns(((id * 5 + 7) % 12).toInt)
  def fillerVerb(id: Long): String = fillVerbs(((id * 23) % 4).toInt)
  def personIdx(id: Long, s: Int): Int = ((id * 13 + s * 7) % 40).toInt
  def gpeIdx(id: Long, s: Int): Int = ((id * 17 + s * 11) % 25).toInt
  def rSel(id: Long, s: Int): Long = (id * 19 + s * 5) % 20
  def usesAlias(id: Long, s: Int): Boolean = (id + s) % 9 == 0
  def hasMedia(id: Long, s: Int): Boolean = (id + s) % 4 == 0

  /** Adjective pool for multi-word filler NPs ("The annual budget ..."),
    * exercising NP-suffix term enumeration. */
  val fillAdjs: IndexedSeq[String] =
    Vector("annual", "civic", "federal", "regional")
  def hasAdj(id: Long): Boolean = id % 6 == 0
  def fillerAdj(id: Long): String = fillAdjs((id / 6 % 4).toInt)

  def fillerSentence(id: Long): String = {
    val adj = if (hasAdj(id)) fillerAdj(id) + " " else ""
    s"The $adj${fillerNoun1(id)} ${fillerVerb(id)} the ${fillerNoun2(id)}."
  }

  // --- extra sentence slot (appended after all base spans) -----------------
  // id % 7 == 1: "P toured G."        — a second dobj predicate over the
  //   SAME (person, gpe) formulas as sentence s=0, so tour trees share
  //   argument pairs with visit trees (exercises the event bootstrap)
  // id % 7 == 2: "He/She toured G."   — a pronoun subject (X2 coref):
  //   the pronoun's gender is that of the s=0 person, and resolution
  //   must skip later opposite-gender persons to the most recent
  //   gender-compatible antecedent
  // id % 7 == 3: "P paid $K million." — value mentions (F12): the MONEY
  //   arg reaches path mining and the tagger
  // id % 7 == 4: "Smith toured G."    — a partial-name subject (X2 ACE
  //   entity merge): the bare last name resolves to the most recent
  //   preceding person with that last name (s=0 by construction, so
  //   resolution must skip later persons with OTHER last names)
  // id % 7 == 5: "P1 married P2."     — a symmetric PERSON-PERSON
  //   predicate (exercises (1)/(2) subscripts + swap12 seed resolution)
  // id % 7 == 6: "P visited a group of G." — a quantifier hop (F13):
  //   the mined path "nsubj-1:visit:dobj:group:prep:of:pobj" must
  //   regularize to the plain visit path (DepPathRegularizer.java:22-73),
  //   so these sentences decode through the visited rule end-to-end

  def extraKind(id: Long): Int = (id % 7) match {
    case 1 => 1; case 3 => 2; case 5 => 3; case 2 => 4; case 4 => 5
    case 6 => 6; case _ => 0
  }

  def tourSentence(id: Long): String = {
    val p = persons(personIdx(id, 0))
    val g = if (usesAlias(id, 0)) gpeAliases(gpeIdx(id, 0)) else gpes(gpeIdx(id, 0))
    s"$p toured $g."
  }

  def moneyPersonIdx(id: Long): Int = ((id * 29) % 40).toInt
  def moneyAmount(id: Long): Long = id % 9 + 1
  def moneySentence(id: Long): String =
    s"${persons(moneyPersonIdx(id))} paid $$${moneyAmount(id)} million."

  def marryIdx1(id: Long): Int = ((id * 31) % 40).toInt
  /** Second spouse index; bumped out of the first's mod-20 class because
    * persons(i) == persons(i+20) (the pool has 20 distinct names, each
    * at two indices — the hot-entity design). */
  def marryIdx2(id: Long): Int = {
    val w1 = marryIdx1(id)
    val raw = ((id * 37 + 11) % 40).toInt
    if (raw % 20 == w1 % 20) (raw + 1) % 40 else raw
  }
  def marrySentence(id: Long): String =
    s"${persons(marryIdx1(id))} married ${persons(marryIdx2(id))}."

  /** Pronoun surface for the coref sentence: the gender of the FIRST
    * (s=0) sentence's person — so when later sentences name
    * opposite-gender persons, the resolver must skip them. */
  def pronoun(id: Long): String =
    if (personGenders(personIdx(id, 0)) == "M") "He" else "She"

  /** The gender-compatible most recent antecedent the resolver must
    * find: the largest s ≤ (doc's last sentence) whose person matches
    * the pronoun's gender; s=0 always matches by construction. */
  def pronAntecedentIdx(id: Long): Int = {
    val g = personGenders(personIdx(id, 0))
    (nSentences(id) - 1 to 0 by -1)
      .map(s => personIdx(id, s))
      .find(pi => personGenders(pi) == g)
      .get
  }

  def pronSentence(id: Long): String = {
    val g = if (usesAlias(id, 0)) gpeAliases(gpeIdx(id, 0)) else gpes(gpeIdx(id, 0))
    s"${pronoun(id)} toured $g."
  }

  /** Last name per person index (parallel to [[persons]]). */
  val personLasts: IndexedSeq[String] = persons.map(_.split(' ')(1))

  /** The bare last name of the s=0 person — when later sentences name
    * persons with OTHER last names, the resolver must skip them. */
  def partialName(id: Long): String = personLasts(personIdx(id, 0))

  /** The entity-merge antecedent: the most recent sentence whose
    * person carries the partial's last name; s=0 always matches. */
  def nameAntecedentIdx(id: Long): Int = {
    val l = partialName(id)
    (nSentences(id) - 1 to 0 by -1)
      .map(s => personIdx(id, s))
      .find(pi => personLasts(pi) == l)
      .get
  }

  def nameSentence(id: Long): String = {
    val g = if (usesAlias(id, 0)) gpeAliases(gpeIdx(id, 0)) else gpes(gpeIdx(id, 0))
    s"${partialName(id)} toured $g."
  }

  /** Quantifier nouns for the F13 sentence — every member is in
    * `Paths.quantifiers`, so the quantifier hop always collapses. */
  val quantNouns: IndexedSeq[String] =
    Vector("group", "number", "dozen", "series")
  def quantPersonIdx(id: Long): Int = ((id * 41) % 40).toInt
  def quantGpeIdx(id: Long): Int = ((id * 43) % 25).toInt
  def quantNounIdx(id: Long): Int = ((id * 11) % 4).toInt
  def quantSentence(id: Long): String = {
    val g = if (usesAlias(id, 0)) gpeAliases(quantGpeIdx(id))
            else gpes(quantGpeIdx(id))
    s"${persons(quantPersonIdx(id))} visited a ${quantNouns(quantNounIdx(id))} of $g."
  }

  def extraSentence(id: Long): Option[String] = extraKind(id) match {
    case 1 => Some(tourSentence(id))
    case 2 => Some(moneySentence(id))
    case 3 => Some(marrySentence(id))
    case 4 => Some(pronSentence(id))
    case 5 => Some(nameSentence(id))
    case 6 => Some(quantSentence(id))
    case _ => None
  }

  def mainSentence(id: Long, s: Int): String = {
    val p = persons(personIdx(id, s))
    val g = if (usesAlias(id, s)) gpeAliases(gpeIdx(id, s)) else gpes(gpeIdx(id, s))
    s"$p ${predPhrases(predIndex(rSel(id, s)))} $g."
  }

  /** Build the interleaved document for a numeric id. Text offsets are
    * cumulative over text spans only; media spans sit between at the
    * current text offset. */
  def doc(id: Long): IceDoc = {
    val spans = Vector.newBuilder[SpanT]
    var off = 0
    def addText(t: String): Unit = { spans += SpanT("text", t, "", off); off += t.length }
    if (hasFiller(id)) addText(fillerSentence(id))
    var s = 0
    val n = nSentences(id)
    while (s < n) {
      addText(mainSentence(id, s))
      if (hasMedia(id, s)) spans += SpanT("media", "", s"m-$id-$s", off)
      s += 1
    }
    extraSentence(id).foreach(addText)
    IceDoc(id.toString, spans.result())
  }
}
