package graft

import graft.core.Name
import graft.nlp.Nlp
import graft.operators.{DepPathsStage, EventsStage, Preprocess}
import graft.sources.Gen
import org.scalatest.funsuite.AnyFunSuite

/** X2 coref: document-level pronoun resolution. The resolver picks the
  * most recent PERSON mention in a preceding sentence whose first-name
  * gender agrees with the pronoun (entity-level decode: the resolved
  * mention carries the antecedent's surface/canonical). */
class CorefSpec extends AnyFunSuite {

  private def analyzeDoc(sents: String*): Vector[graft.core.Sentence] =
    Nlp.resolvePronouns(sents.toVector.map(t => Nlp.analyze(t, 0)))

  test("pronoun resolves to the most recent gender-compatible person") {
    val doc = analyzeDoc(
      "Fred Smith visited Chicago.",   // M
      "Mary Jones visited Boston.",    // F
      "He toured Denver.")
    val pron = doc(2).names.find(_.tokStart == 0)
    assert(pron.contains(Name(0, 1, 0, "PERSON", "Fred Smith", "Fred Smith")),
      s"got ${doc(2).names}")
  }

  test("she resolves over an intervening male mention") {
    val doc = analyzeDoc(
      "Mary Jones visited Chicago.",
      "Fred Smith visited Boston.",
      "She toured Denver.")
    val pron = doc(2).names.find(_.tokStart == 0).get
    assert(pron.surface == "Mary Jones")
  }

  test("unresolvable pronoun stays unannotated") {
    val doc = analyzeDoc("The budget mentioned the report.", "He toured Denver.")
    assert(doc(1).names.count(_.etype == "PERSON") == 0)
    // the GPE is still tagged
    assert(doc(1).names.exists(_.etype == "GPE"))
  }

  test("resolution only looks at PRECEDING sentences") {
    val doc = analyzeDoc("He toured Denver.", "Fred Smith visited Chicago.")
    assert(doc(0).names.count(_.etype == "PERSON") == 0)
  }

  test("resolved pronoun mention mines the tour path with the entity surface") {
    val doc = Gen.doc(2) // id%7==2 -> pronoun sentence
    assert(doc.spans.last.text == Gen.pronSentence(2))
    val ann = Nlp.resolvePronouns(
      doc.spans.filter(_.kind == "text").toVector
        .flatMap(sp => Nlp.splitSentences(sp.text).map { case (t, o) =>
          Nlp.analyze(t, sp.offset + o)
        }))
    val last = ann.last
    val pron = last.names.find(_.tokStart == 0).get
    assert(pron.surface == Gen.persons(Gen.pronAntecedentIdx(2)))
  }

  test("generator/resolver agreement on the antecedent across many docs") {
    import SparkSpec.session
    import session.implicits._
    val ids = (0L until 700L).filter(_ % 7 == 2)
    val docs = session.createDataset(ids.map(Gen.doc))
    val ann = Preprocess.annotate(docs)
    val inst = DepPathsStage.instances(ann)
    val pronArgs = inst
      .filter(i => i.path == "nsubj-1:tour:dobj" && i.example.startsWith("He ")
        || i.path == "nsubj-1:tour:dobj" && i.example.startsWith("She "))
      .collect()
      .map(i => i.doc_id.toLong -> i.arg1).toMap
    assert(pronArgs.size == ids.size)
    ids.foreach { id =>
      assert(pronArgs(id) == Gen.persons(Gen.pronAntecedentIdx(id)),
        s"doc $id")
    }
    // and the gender skip is actually exercised somewhere in the range
    val skipped = ids.filter(id =>
      Gen.pronAntecedentIdx(id) != Gen.personIdx(id, (id % 3).toInt))
    assert(skipped.nonEmpty, "no doc exercised the gender-skip branch")
  }

  test("partial name resolves to the most recent person with that last name") {
    val doc = Nlp.resolvePartialNames(Vector(
      "Fred Smith visited Chicago.",
      "Mary Jones visited Boston.",
      "Smith toured Denver.").map(t => Nlp.analyze(t, 0)))
    val part = doc(2).names.find(_.tokStart == 0).get
    assert(part.surface == "Fred Smith" && part.etype == "PERSON")
  }

  test("unresolvable partial name keeps its own surface (fresh entity)") {
    val doc = Nlp.resolvePartialNames(Vector(
      "Mary Jones visited Boston.",
      "Smith toured Denver.").map(t => Nlp.analyze(t, 0)))
    val part = doc(1).names.find(_.tokStart == 0).get
    assert(part.surface == "Smith")
  }

  test("generator/resolver agreement on the partial-name antecedent") {
    import SparkSpec.session
    import session.implicits._
    val ids = (0L until 700L).filter(_ % 7 == 4)
    val docs = session.createDataset(ids.map(Gen.doc))
    val inst = DepPathsStage.instances(Preprocess.annotate(docs))
    val nameArgs = inst
      .filter(i => i.path == "nsubj-1:tour:dobj" &&
        !i.example.contains(" visited ") && !i.example.contains(" lives "))
      .collect()
      .filter(i => Gen.personLasts.contains(i.example.takeWhile(_ != ' ')))
      .map(i => i.doc_id.toLong -> i.arg1).toMap
    assert(nameArgs.size == ids.size)
    ids.foreach { id =>
      assert(nameArgs(id) == Gen.persons(Gen.nameAntecedentIdx(id)), s"doc $id")
    }
    // the skip branch (later sentence with a DIFFERENT last name) fires
    val skipped = ids.filter(id =>
      Gen.nameAntecedentIdx(id) != Gen.personIdx(id, (id % 3).toInt))
    assert(skipped.nonEmpty)
  }

  test("pronoun resolves through an already-resolved partial name") {
    // partial-name resolution runs first, so the pronoun's antecedent
    // pool sees the partial's ENTITY surface (with its gendered first
    // name), not the bare last name
    val doc = Nlp.resolvePronouns(Nlp.resolvePartialNames(Vector(
      "Fred Smith visited Chicago.",
      "Smith toured Denver.",
      "He visited Boston.").map(t => Nlp.analyze(t, 0))))
    assert(doc(1).names.find(_.tokStart == 0).get.surface == "Fred Smith")
    assert(doc(2).names.find(_.tokStart == 0)
      .exists(n => n.surface == "Fred Smith" && n.etype == "PERSON"))
  }

  test("pronoun sentences produce no event trees (reference pronoun-abort)") {
    import SparkSpec.session
    import session.implicits._
    val docs = session.createDataset(Seq(Gen.doc(2), Gen.doc(9), Gen.doc(16)))
    val ev = EventsStage.events(Preprocess.annotate(docs))
      .filter(e => e.example.startsWith("He ") || e.example.startsWith("She "))
    assert(ev.count() == 0)
  }
}
