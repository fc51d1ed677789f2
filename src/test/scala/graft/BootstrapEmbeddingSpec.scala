package graft

import graft.nlp.Nlp
import graft.operators.BootstrapStage

/** A11 embedding-centroid bootstrap scoring + the F5/F6/F8/F9 scalar
  * filters. */
class BootstrapEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  test("A11: candidates whose reprs share seed vocabulary score higher") {
    // toy deterministic embedding: one-hot-ish by word family
    val emb = Map(
      "person" -> Array(1.0, 0.0, 0.0), "gpe" -> Array(0.0, 1.0, 0.0),
      "lives" -> Array(0.0, 0.0, 1.0), "resides" -> Array(0.0, 0.1, 0.9),
      "acquired" -> Array(0.7, 0.7, 0.0))
    val repr = Seq(
      ("PERSON", "p1", "GPE", "person lives in gpe"),
      ("PERSON", "p2", "GPE", "person resides in gpe"),
      ("PERSON", "p3", "GPE", "person acquired gpe"))
      .toDF("type1", "path", "type2", "repr")
    val scores = BootstrapStage
      .embeddingScores(repr, Set("person lives in gpe"), emb)
      .select("path", "score").as[(String, Double)].collect().toMap
    assert(scores("p2") > scores("p3"))
    assert(scores("p2") > 0.9)
  }

  test("F8 name-term filter") {
    assert(!Nlp.nameTermAllowed("a/nnp")) // 5 chars incl suffix -> dropped
    assert(Nlp.nameTermAllowed("ab/nnp")) // 6 chars -> kept
    assert(Nlp.nameTermAllowed("chicago/nnp"))
    assert(!Nlp.nameTermAllowed("1chicago"))
  }

  test("F9 seed-candidate filter") {
    val in = Set("budget"); val sug = Set("report")
    assert(Nlp.seedCandidateAllowed("drought", in, sug))
    assert(!Nlp.seedCandidateAllowed("election", in, sug)) // -tion
    assert(!Nlp.seedCandidateAllowed("taxation", in, sug))
    assert(!Nlp.seedCandidateAllowed("payment", in, sug))
    assert(!Nlp.seedCandidateAllowed("www.x.com", in, sug))
    assert(!Nlp.seedCandidateAllowed("a@b.c", in, sug))
    assert(!Nlp.seedCandidateAllowed("Chicago", in, sug))
    assert(!Nlp.seedCandidateAllowed("budget", in, sug))
    assert(!Nlp.seedCandidateAllowed("report", in, sug))
  }

  test("F5 POS bucketing and F6 word normalization") {
    assert(Nlp.normalizePos("NNP") === "nnp")
    assert(Nlp.normalizePos("NNS") === "nn")
    assert(Nlp.normalizePos("VBD") === "vb")
    assert(Nlp.normalizePos("IN") === "o")
    assert(Nlp.normalizeWord("Lives  In") === "live_in")
  }
}
