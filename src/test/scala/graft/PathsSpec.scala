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
