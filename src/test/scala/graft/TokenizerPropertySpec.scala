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

  test("surrogate pairs and astral-plane chars: offsets stay UTF-16 " +
      "exact (token.word always slices back out of the text)") {
    // astral chars occupy TWO UTF-16 units; a scanner that advanced by
    // code point (or mis-skipped a lone surrogate) would drift every
    // offset after the first emoji. Token equality with the regex
    // reference — whose m.start/m.end are UTF-16 indices — pins it,
    // and the substring assert restates the anchoring invariant the
    // offsets exist to provide.
    val frags = Vector("Fred", "Smith", "visited", "Chicago", ".", "$",
      "12", "'s", " ", "😀", "𝔘𝔫𝔦", "中文", "é", "\uD83D", "\uDE00",
      "👨‍👩‍👧", "x")
    (0 until 800).foreach { trial =>
      val r = new scala.util.Random(trial)
      val text = (0 until r.nextInt(14)).map(_ =>
        frags(r.nextInt(frags.length))).mkString
      val got = Nlp.tokenize(text).map(x => (x.word, x.start, x.end))
      assert(got == regexTokens(text), s"trial $trial input: <$text>")
      got.foreach { case (w, s, e) =>
        assert(text.substring(s, e) == w, s"anchor drift in <$text>")
      }
    }
  }

  test("splitSentences: every sentence anchors exactly at its offset, " +
      "trimmed, ordered, non-overlapping — on unicode/whitespace storms") {
    val frags = Vector("Fred visited Chicago", ".", ". ", ".\n", ".\t",
      "  ", "\n\n", "😀", "中文 here", "x.y", "...", ". . ", "é b",
      "\uD83D", "word")
    (0 until 800).foreach { trial =>
      val r = new scala.util.Random(1000000 + trial)
      val text = (0 until r.nextInt(12)).map(_ =>
        frags(r.nextInt(frags.length))).mkString
      val sents = Nlp.splitSentences(text)
      var prevEnd = 0
      sents.foreach { case (s, o) =>
        assert(s.nonEmpty && s == s.trim, s"untrimmed <$s> in <$text>")
        assert(o >= prevEnd, s"overlap at $o in <$text>")
        assert(o + s.length <= text.length &&
          text.substring(o, o + s.length) == s,
          s"offset drift: <$s>@$o in <$text>")
        prevEnd = o + s.length
      }
      // coverage: every non-whitespace char of the input lands in some
      // emitted sentence (the splitter may drop separators, never words)
      val covered = sents.flatMap { case (s, o) => o until (o + s.length) }.toSet
      text.indices.foreach { i =>
        if (!Character.isWhitespace(text.charAt(i)))
          assert(covered(i), s"dropped char ${text.charAt(i)}@$i in <$text>")
      }
    }
  }
}
