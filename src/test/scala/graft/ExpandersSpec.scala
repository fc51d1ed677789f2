package graft

import graft.functions.{Expanders, Paths}
import graft.functions.Expanders.ScoredTerm
import graft.nlp.Nlp
import org.scalatest.funsuite.AnyFunSuite

class ExpandersSpec extends AnyFunSuite {

  test("A13 seed recommendation clusters cohesive high-score terms") {
    // two tight clusters in feature space; cluster A has higher scores
    def t(name: String, score: Double, fs: (String, Double)*) =
      ScoredTerm(name, score, fs.toMap)
    val terms = Seq(
      t("drought", 5.0, "nsubj-1_hit" -> 2.0, "dobj-1_cause" -> 1.0),
      t("shortage", 4.5, "nsubj-1_hit" -> 1.8, "dobj-1_cause" -> 1.2),
      t("famine", 4.0, "nsubj-1_hit" -> 2.1, "dobj-1_cause" -> 0.9),
      t("verdict", 1.0, "nsubj-1_rule" -> 2.0),
      t("lawsuit", 0.9, "nsubj-1_rule" -> 1.9),
      t("appeal", 0.8, "nsubj-1_rule" -> 2.2))
    val rec = Expanders.recommendSeeds(terms)
    assert(rec.toSet === Set("drought", "shortage", "famine"))
    assert(rec.head === "drought") // score-desc deterministic order
  }

  test("A13 recommendation is deterministic and bounded by maxClusterSize") {
    val terms = (0 until 20).map(i =>
      ScoredTerm(s"t$i", 1.0 + i * 0.1, Map(s"f${i % 3}" -> 1.0)))
    val a = Expanders.recommendSeeds(terms)
    val b = Expanders.recommendSeeds(terms)
    assert(a === b)
    assert(a.nonEmpty && a.size <= 20)
  }

  test("A14 MIRA separates linearly separable labels; deterministic") {
    val pos = (0 until 5).map(i => (Map("good" -> 1.0, s"x$i" -> 0.1), true))
    val neg = (0 until 5).map(i => (Map("bad" -> 1.0, s"y$i" -> 0.1), false))
    val w = Expanders.miraTrain(pos ++ neg)
    assert(Expanders.miraScore(w, Map("good" -> 1.0)) > 0)
    assert(Expanders.miraScore(w, Map("bad" -> 1.0)) < 0)
    assert(w === Expanders.miraTrain(pos ++ neg))
  }

  test("O5 closest repr argmin with deterministic tie-break") {
    val reprs = Seq("person lives in gpe", "person works in gpe", "person visited gpe")
    assert(Expanders.closestRepr("person Lives in gpe", reprs)
      .contains("person lives in gpe"))
    assert(Expanders.closestRepr("person loves in gpe", reprs)
      .contains("person lives in gpe"))
  }

  test("grid-search cost tuning picks the F1-maximizing cell (train mode)") {
    // score prefers low replace + high delete, as in the reference's sweep
    val (best, s) = Expanders.tuneCosts(c => -math.abs(c.replace - 0.8) -
      math.abs(c.insert - 0.2) - math.abs(c.delete - 1.2))
    assert(best === Paths.MatchCosts(0.8, 0.2, 1.2))
    assert(s === 0.0)
  }

  test("F12 value tagging: money/number merge with the reference's illions quirk") {
    val toks = Nlp.tokenize("The deal cost $ 5 million on Monday and 3 billion more.")
    val vals = Nlp.tagValues(toks)
    val money = vals.find(_.etype == "MONEY").get
    // million -> 10000 (reference parity quirk, IcePreprocessor.java:653-658)
    assert(money.canonical === "50000")
    val num = vals.find(_.etype == "NUMBER").get
    assert(num.canonical === "300000")
    val time = vals.find(_.etype == "TIME").get
    assert(time.surface === "Monday")
    // overflow guards: a 19+-digit literal AND a base*illion product
    // that wraps Long are both skipped, never emitted as garbage
    val big = Nlp.tagValues(
      Nlp.tokenize("It cost $ 99999999999999999999 now and $ 999999999999999999 billion more and 999999999999999999 billion things."))
    assert(!big.exists(v => v.etype == "MONEY" || v.etype == "NUMBER"))
    assert(!big.exists(_.canonical.startsWith("-")))
  }

  test("F11 crossing-annotation guard: crossing rejected, nesting allowed") {
    assert(Nlp.crosses(0, 5, 3, 8))
    assert(Nlp.crosses(3, 8, 0, 5))
    assert(!Nlp.crosses(0, 10, 3, 8)) // nested
    assert(!Nlp.crosses(0, 3, 3, 8)) // adjacent
  }
}
