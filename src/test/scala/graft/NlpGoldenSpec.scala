package graft

import graft.functions.Paths
import graft.nlp.Nlp
import org.scalatest.funsuite.AnyFunSuite

/** Golden per-operator tests mirroring the reference's own unit suite
  * (DepPathsTest.java:24-151): exact expected path strings for the
  * fixture sentences. */
class NlpGoldenSpec extends AnyFunSuite {

  private def pathOf(sentText: String): Option[String] = {
    val s = Nlp.analyze(sentText, 0)
    assert(s.names.length >= 2, s"expected 2+ names in: $sentText -> ${s.names}")
    val m1 = s.names.head; val m2 = s.names.last
    val trans = Nlp.transform(s.deps.toVector)
    Paths.bfs(trans, m1.head, m2.head, Set.empty).map { case (n, l) =>
      Paths.regularize(Paths.pathString(s, n, l))
    }
  }

  test("splitSentences: newline/tab separators split like spaces") {
    val got = Nlp.splitSentences(
      "Fred Smith visited Boston.\nMary Jones visited Denver.\tA third one.")
    assert(got.map(_._1) === Vector("Fred Smith visited Boston.",
      "Mary Jones visited Denver.", "A third one."))
    // offsets point at each sentence's first character
    assert(got.map(_._2) === Vector(0, 27, 54))
  }

  test("splitSentences: leading whitespace does not shift the offset") {
    val got = Nlp.splitSentences("  Fred visited Boston.   Mary left.")
    assert(got.map(_._1) === Vector("Fred visited Boston.", "Mary left."))
    // the offset is where the TRIMMED sentence starts, so char offsets
    // (token spans, head ends) line up with the original span text
    assert(got.map(_._2) === Vector(2, 25))
  }

  test("X8 terms: suffixes anchor at the run's LAST NN head; trailing JJ " +
      "sits outside the group (TermCounter.java:215-252)") {
    import graft.core.Token
    def tok(w: String, pos: String) = Token(w, 0, 0, pos)
    // [annual(JJ), budget(NN)]: classic group — head + one suffix
    assert(Nlp.extractTerms(Vector(tok("annual", "JJ"), tok("budget", "NN")),
      Vector.empty) === Vector("budget", "annual budget"))
    // [budget(NN), annual(JJ)]: the trailing adjective is OUTSIDE the
    // noun group (the reference walks backward from the NOUN head), so
    // the head's terms must still be emitted, not suppressed
    assert(Nlp.extractTerms(Vector(tok("budget", "NN"), tok("annual", "JJ")),
      Vector.empty) === Vector("budget"))
    // [annual(JJ), budget(NN), green(JJ)]: suffixes end at the last NN
    assert(Nlp.extractTerms(
      Vector(tok("annual", "JJ"), tok("budget", "NN"), tok("green", "JJ")),
      Vector.empty) === Vector("budget", "annual budget"))
    // an all-JJ run has no noun head: nothing to emit
    assert(Nlp.extractTerms(Vector(tok("annual", "JJ"), tok("green", "JJ")),
      Vector.empty) === Vector.empty)
  }

  test("'Fred Smith visited Chicago.' -> nsubj-1:visit:dobj (DepPathsTest.java:55)") {
    assert(pathOf("Fred Smith visited Chicago.").contains("nsubj-1:visit:dobj"))
  }

  test("'Fred Smith has lived in Chicago.' -> nsubj-1:live:prep:in:pobj (DepPathsTest.java:88)") {
    assert(pathOf("Fred Smith has lived in Chicago.").contains("nsubj-1:live:prep:in:pobj"))
  }

  test("'Fred Smith lives in Chicago.' -> nsubj-1:live:prep:in:pobj") {
    assert(pathOf("Fred Smith lives in Chicago.").contains("nsubj-1:live:prep:in:pobj"))
  }

  test("passive 'Fred Smith was shot in Chicago.' yields a transformed path (DepPathsTest.java:100-129)") {
    val p = pathOf("Fred Smith was shot in Chicago.")
    assert(p.contains("nsubj-1:shot:prep:in:pobj"))
  }

  test("linearized repr of the lives path") {
    val s = Nlp.analyze("Fred Smith lives in Chicago.", 0)
    val m1 = s.names.head; val m2 = s.names.last
    val (n, l) = Paths.bfs(s.deps, m1.head, m2.head, Set.empty).get
    assert(Paths.linearize(s, n, l, "PERSON", "GPE") === "person lives in gpe")
  }

  test("no-name sentence produces no pairs ('Here is today's news.')") {
    val s = Nlp.analyze("Here is today's news.", 0)
    // F12 wired into analyze(): 'today' now surfaces as a TIME value
    // mention — still only one mention, so no pairs are mined
    assert(s.names.map(_.etype) === Vector("TIME"))
    assert(Paths.mentionPairs(s.names).isEmpty)
  }

  test("alias city resolves to canonical form in gazetteer") {
    val s = Nlp.analyze("Mary Jones lives in Chicagoville.", 0)
    val gpe = s.names.find(_.etype == "GPE").get
    assert(gpe.surface === "Chicagoville" && gpe.canonical === "Chicago")
  }

  test("filler sentence yields term candidates, not names") {
    val s = Nlp.analyze("The budget mentioned the report.", 0)
    assert(s.names.isEmpty)
    assert(s.terms === Vector("budget", "report"))
  }

  test("NP-suffix enumeration: adjective NPs yield every suffix ending at the head") {
    val s = Nlp.analyze("The annual budget mentioned the report.", 0)
    assert(s.terms === Vector("budget", "annual budget", "report"))
  }

  test("name terms carry /nnp and pass the F8 filter; value mentions are excluded") {
    val s = Nlp.analyze("Fred Smith paid $5 million.", 0)
    // PERSON surface becomes a name term; the MONEY mention does not
    // (F8 rejects non-letter-initial), and 'million' sits inside the
    // MONEY span so it is not a nominal term either
    assert(s.terms === Vector("Fred Smith/nnp"))
    assert(s.names.map(_.etype) === Vector("PERSON", "MONEY"))
    assert(s.names.last.canonical === "50000")
  }

  test("money path mines PERSON--pay--MONEY with the sic million=10000 parity") {
    val s = Nlp.analyze("Mary Jones paid $7 million.", 0)
    val m1 = s.names.head; val m2 = s.names.last
    val (n, l) = Paths.bfs(Nlp.transform(s.deps.toVector), m1.head, m2.head, Set.empty).get
    assert(Paths.pathString(s, n, l) === "nsubj-1:pay:dobj")
    assert(m2.canonical === "70000")
  }

  test("X5 STH placeholder: off-path verb object renders as 'sth' in the repr") {
    // the PERSON->GPE path goes through the prep, leaving the verb's
    // dobj (the MONEY amount) off-path -> linearize inserts STH at the
    // dependent's sentence position (DepPath.java:325-353)
    val s = Nlp.analyze("Fred Smith paid $5 million in Chicago.", 0)
    val p = s.names.find(_.etype == "PERSON").get
    val g = s.names.find(_.etype == "GPE").get
    val (n, l) = Paths.bfs(s.deps, p.head, g.head, Set.empty).get
    assert(Paths.linearize(s, n, l, "PERSON", "GPE")
      === "person paid sth in gpe")
    // trigram decomposition of the mined path (X4)
    val path = Paths.regularize(Paths.pathString(s, n, l))
    assert(path === "nsubj-1:pay:prep:in:pobj")
    assert(Paths.pathTrigrams(path)
      === Seq("nsubj-1:pay:prep", "prep:in:pobj"))
  }

  test("marriage sentence: symmetric pair, subscripted repr, swap12 roundtrip") {
    val s = Nlp.analyze("Mary Jones married Peter Hall.", 0)
    assert(s.names.map(_.etype) === Vector("PERSON", "PERSON"))
    val m1 = s.names.head; val m2 = s.names.last
    val (n, l) = Paths.bfs(s.deps, m1.head, m2.head, Set.empty).get
    assert(Paths.pathString(s, n, l) === "nsubj-1:marry:dobj")
    val repr = Paths.linearize(s, n, l, "PERSON(1)", "PERSON(2)")
    assert(repr === "person(1) married person(2)")
    assert(Paths.swap12(repr) === "person(2) married person(1)")
  }
}
