package graft

import graft.core._
import graft.operators.{DepPathsStage, Preprocess, TaggerStage}
import graft.pipeline.KgPipeline

/** End-to-end golden-count test on the 4-doc interleaved tiny corpus
  * (FIXTURES.md §1, mirroring the reference's validateCLI golden:
  * "one 'lives' relation in each doc" → 4 instances). */
class TinyCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: String, spans: (String, String)*): IceDoc =
    IceDoc(id, spans.zipWithIndex.map {
      case (("text", t), i) => SpanT("text", t, "", i * 100)
      case (("media", r), i) => SpanT("media", "", r, i * 100)
      case ((k, _), _) => sys.error(s"bad kind $k")
    })

  private lazy val corpus = Seq(
    doc("d1", "text" -> "Here is today's news.", "media" -> "m-001",
      "text" -> "Fred Smith lives in Chicago."),
    doc("d2", "text" -> "Here is today's news.",
      "text" -> "Harriet Smith lives in Seattle.", "media" -> "m-002"),
    doc("d3", "media" -> "m-003", "text" -> "Here is today's news.",
      "text" -> "Mary Jones lives in Boston."),
    doc("d4", "text" -> "Here is today's news.",
      "text" -> "John Brown lives in Denver."))

  private lazy val annotated = Preprocess.annotate(spark.createDataset(corpus))
  private lazy val instances = DepPathsStage.instances(annotated).collect()

  test("4-doc corpus yields exactly 4 'lives' path instances (validateCLI golden)") {
    val lives = instances.filter(_.path == "nsubj-1:live:prep:in:pobj")
    assert(lives.length === 4)
    assert(lives.map(_.doc_id).toSet === Set("d1", "d2", "d3", "d4"))
  }

  test("typed path is PERSON -- nsubj-1:live:prep:in:pobj -- GPE, count 4") {
    val types = DepPathsStage.pathTypesTable(DepPathsStage.instances(annotated))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(types.toSet === Set(("PERSON", "nsubj-1:live:prep:in:pobj", "GPE", 4L)))
  }

  test("span-sequence invariant: (kind, text, media_ref, offset, order) preserved exactly") {
    val out = annotated.collect().map(d => d.doc_id -> d.spans).toMap
    corpus.foreach { d =>
      assert(out(d.doc_id) === d.spans, s"span sequence changed for ${d.doc_id}")
    }
  }

  test("seed-rule tagging emits the 4 golden triples") {
    val repr = DepPathsStage.pathReprTable(DepPathsStage.instances(annotated))
    val rules = TaggerStage.rulesFromSeeds(spark, repr, KgPipeline.seedPhrases)
    assert(rules.map(_.relName).toSet === Set("livesIn"))
    val triples = TaggerStage.triples(DepPathsStage.instances(annotated), rules)
      .collect().map(t => (t.doc_id, t.subj, t.pred, t.obj)).toSet
    assert(triples === Set(
      ("d1", "Fred Smith", "livesIn", "Chicago"),
      ("d2", "Harriet Smith", "livesIn", "Seattle"),
      ("d3", "Mary Jones", "livesIn", "Boston"),
      ("d4", "John Brown", "livesIn", "Denver")))
  }

  test("triple-level P/R vs golden is >= 0.95 (scorer harness, here exact)") {
    val repr = DepPathsStage.pathReprTable(DepPathsStage.instances(annotated))
    val rules = TaggerStage.rulesFromSeeds(spark, repr, KgPipeline.seedPhrases)
    val response = TaggerStage.triples(DepPathsStage.instances(annotated), rules)
      .collect().map(t => (t.doc_id, t.subj, t.pred, t.obj)).toSet
    val key = Set(
      ("d1", "Fred Smith", "livesIn", "Chicago"),
      ("d2", "Harriet Smith", "livesIn", "Seattle"),
      ("d3", "Mary Jones", "livesIn", "Boston"),
      ("d4", "John Brown", "livesIn", "Denver"))
    val correct = (response intersect key).size.toDouble
    val precision = correct / response.size
    val recall = correct / key.size
    assert(precision >= 0.95 && recall >= 0.95)
  }

  test("J4 fuzzy fallback: a misspelled seed resolves to the closest repr") {
    val repr = DepPathsStage.pathReprTable(DepPathsStage.instances(annotated))
    // exact resolution finds nothing for this phrase; the distributed
    // edit-distance argmin resolves it to 'person lives in gpe'
    val rules = TaggerStage.rulesFromSeedsFuzzy(spark, repr,
      Map("livesIn" -> "person livs in gpe"))
    assert(rules.map(r => (r.relName, r.path)) ===
      Seq(("livesIn", "nsubj-1:live:prep:in:pobj")))
    // exact matches are not duplicated by the fallback
    val mixed = TaggerStage.rulesFromSeedsFuzzy(spark, repr,
      Map("livesIn" -> "person lives in gpe"))
    assert(mixed.size === 1 && !mixed.head.invert)
  }
}
