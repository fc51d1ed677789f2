package graft

import graft.functions.Paths
import org.scalatest.funsuite.AnyFunSuite

class PathsSpec extends AnyFunSuite {

  test("quantifier regularization drops 'Q of X' hops (DepPathRegularizer.java)") {
    assert(Paths.regularize("nsubj-1:buy:dobj:pound:prep:of:pobj")
      === "nsubj-1:buy:dobj")
    assert(Paths.regularize("nsubj-1:live:prep:in:pobj")
      === "nsubj-1:live:prep:in:pobj")
  }

  test("train-mode closed-form distances equal the weighted DP across the full cost grid") {
    // pins the kg_tuned_costs DuckDB oracle's closed forms: for every
    // 216-point grid triple, the min distance from each 3-node dev
    // candidate to the five 5-node rules is
    //   dv = min(r, d+i) + 2i + min(2.5, d+i)
    // (verb substitution-or-del/ins, two insertions, one end-label leg),
    // and the marriage candidate adds one more end-label leg
    val grid = Seq(0.2, 0.4, 0.6, 0.8, 1.0, 1.2)
    val rules5 = graft.sources.Gen.predPaths.zip(graft.sources.Gen.predNames)
      .filterNot(_._2 == "visited")
      .map { case (p, _) => s"PERSON--$p--GPE" }
    val threeNode = Seq(
      "PERSON--nsubj-1:visit:dobj--GPE",
      "PERSON--nsubj-1:tour:dobj--GPE",
      "PERSON--nsubj-1:pay:dobj--MONEY")
    val marry = "PERSON(1)--nsubj-1:marry:dobj--PERSON(2)"
    for (r <- grid; i <- grid; d <- grid) {
      val c = Paths.MatchCosts(r, i, d)
      val endLeg = math.min(2.5, d + i)
      val dv = math.min(r, d + i) + 2 * i + endLeg
      for (cand <- threeNode) {
        val best = rules5.map(p => Paths.pathEditDistance(cand, p, c)).min
        assert(math.abs(best - dv) < 1e-9,
          s"closed form $dv != DP $best for $cand at $c")
      }
      val bestM = rules5.map(p => Paths.pathEditDistance(marry, p, c)).min
      assert(math.abs(bestM - (dv + endLeg)) < 1e-9,
        s"closed form ${dv + endLeg} != DP $bestM for marry at $c")
      // lattice distances are multiples of 0.2: never within 0.1 of the
      // 2.5 match threshold, so the oracle's dv < 2.5 compare is
      // float-safe
      assert(math.abs(dv - 2.5) > 0.09 && math.abs(dv + endLeg - 2.5) > 0.09)
    }
  }

  test("arc count") {
    assert(Paths.arcCount("nsubj-1:live:prep:in:pobj") === 3)
    assert(Paths.arcCount("nsubj-1:visit:dobj") === 2)
  }

  test("swap12 exchanges subscripts (DepPathMap.java:115-120)") {
    assert(Paths.swap12("PERSON(1) -- p -- PERSON(2)") === "PERSON(2) -- p -- PERSON(1)")
  }

  test("character edit distance") {
    assert(Paths.editDistance("kitten", "sitting") === 3)
    assert(Paths.editDistance("", "abc") === 3)
    assert(Paths.editDistance("same", "same") === 0)
  }

  test("path edit distance: identical paths cost 0") {
    assert(Paths.pathEditDistance("nsubj-1:live:prep:in:pobj",
      "nsubj-1:live:prep:in:pobj") === 0.0)
  }

  test("soft match accepts a near variant and rejects a distant path") {
    val pos = Seq(("PERSON--nsubj-1:live:prep:in:pobj--GPE", "livesIn"))
    // same path -> distance 0 -> accept
    assert(Paths.softMatch("PERSON--nsubj-1:live:prep:in:pobj--GPE", pos, Nil)
      .contains("livesIn"))
    // wholly different path -> reject
    assert(Paths.softMatch("GPE--prep:under:pobj--WEAPON", pos, Nil).isEmpty)
  }

  test("soft match: negative rule of same type vetoes a weak positive hit") {
    val cand = "PERSON--nsubj-1:live:prep:in:pobj:x--GPE"
    val pos = Seq(("PERSON--nsubj-1:live:prep:in:pobj--GPE", "livesIn"))
    val neg = Seq((cand, "livesIn"))
    assert(Paths.softMatch(cand, pos, neg).isEmpty)
  }

  test("mention-pair window: <=3 intervening mentions") {
    import graft.core.Name
    val ms = (0 until 8).map(i => Name(i, i + 1, i, "PERSON", s"p$i", s"p$i"))
    val pairs = Paths.mentionPairs(ms)
    assert(pairs.forall { case (a, b) => b.tokStart - a.tokStart <= 4 })
    // 2-mention sentence emits exactly one pair (validateCLI golden semantics)
    assert(Paths.mentionPairs(ms.take(2)).length === 1)
  }

  test("sentence guards (F1)") {
    assert(Paths.sentenceAllowed("Fred Smith lives in Chicago."))
    assert(!Paths.sentenceAllowed("Bad (parenthetical) sentence."))
    assert(!Paths.sentenceAllowed("He said \"no\" loudly."))
    assert(!Paths.sentenceAllowed("x" * 601))
  }

  test("property: editDistance is a metric (symmetry + identity), 200 samples") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val g = Gen.alphaNumStr.map(_.take(30))
    (0 until 200).foreach { i =>
      val a = g.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val b = g.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000))
      assert(Paths.editDistance(a, b) === Paths.editDistance(b, a))
      assert(Paths.editDistance(a, a) === 0)
    }
  }
}
