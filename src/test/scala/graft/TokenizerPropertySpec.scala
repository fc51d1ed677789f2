package graft

import graft.nlp.Nlp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The hand-rolled scanner in Nlp.tokenize must match the original
  * regex token grammar `[A-Za-z][A-Za-z-]*|[0-9]+|'s|[.,;:!?$]`
  * (leftmost scan, non-matching chars skipped) on any input. */
class TokenizerPropertySpec extends AnyFunSuite {

  private val tokenRe = "[A-Za-z][A-Za-z-]*|[0-9]+|'s|[.,;:!?$]".r

  private def regexTokens(text: String): Vector[(String, Int, Int)] =
    tokenRe.findAllMatchIn(text).map(m => (m.matched, m.start, m.end)).toVector

  private val charGen = Gen.frequency(
    8 -> Gen.alphaChar,
    3 -> Gen.const(' '),
    2 -> Gen.numChar,
    1 -> Gen.oneOf('.', ',', ';', ':', '!', '?', '$', '\'', '-', '_', '@'),
    1 -> Gen.const('s'))
  private val textGen = Gen.listOf(charGen).map(_.mkString)

  test("scanner == regex on random grammar-alphabet strings") {
    (0 until 500).foreach { i =>
      val text = textGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = Nlp.tokenize(text).map(t => (t.word, t.start, t.end))
      assert(got == regexTokens(text), s"input: <$text>")
    }
  }

  test("scanner == regex on generator sentences") {
    (0L until 2000L).foreach { id =>
      graft.sources.Gen.doc(id).spans.filter(_.kind == "text").foreach { sp =>
        val got = Nlp.tokenize(sp.text).map(t => (t.word, t.start, t.end))
        assert(got == regexTokens(sp.text), s"doc $id: <${sp.text}>")
      }
    }
  }

  test("edge cases: hyphens, apostrophes, digit runs, unicode passthrough") {
    for (t <- Seq("", "  ", "a-b-c 'stuff' x's", "12$34", "'s's'x",
                  "Fred's $5 million-dollar décor", "--", "'", "s'")) {
      val got = Nlp.tokenize(t).map(x => (x.word, x.start, x.end))
      assert(got == regexTokens(t), s"input: <$t>")
    }
  }
}
