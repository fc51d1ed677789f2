package graft

import graft.core.{IceDoc, SpanT}
import graft.operators._
import org.apache.spark.sql.functions._

/** Unit tests for the wider stage inventory: connected components,
  * events, PMI, bootstrap scoring, scorer. */
class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, cycle, singleton") {
    val edges = Seq(("b", "c"), ("a", "b"), ("d", "e"), ("e", "f"), ("f", "d"),
      ("z", "z")).toDF("src", "dst")
    val comps = Canonicalize.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(comps("a") === "a" && comps("b") === "a" && comps("c") === "a")
    assert(comps("d") === "d" && comps("e") === "d" && comps("f") === "d")
    assert(comps("z") === "z")
  }

  test("canonicalTriples picks the gazetteer canonical even when an alias sorts first") {
    import graft.core.Triple
    val tri = Seq(
      Triple("d1", "Ann Smith", "livesIn", "NYC"),
      Triple("d2", "Ann Smith", "livesIn", "New York City"),
      Triple("d3", "Bo Li", "livesIn", "Unknownton"))
      .toDS()
    val out = Canonicalize
      .canonicalTriples(tri, Map("NYC" -> "New York City"))
      .collect().map(t => t.obj -> t.canonical_obj).toMap
    // "NYC" < "New York City" lexicographically (uppercase Y < lowercase e),
    // so the component MIN is the alias — the canonical must win anyway
    assert(out("NYC") === "New York City")
    assert(out("New York City") === "New York City")
    // un-gazetted surfaces stay themselves
    assert(out("Unknownton") === "Unknownton")
  }

  test("event extraction: filler sentence yields verb-headed tree with nsubj+dobj") {
    val docs = spark.createDataset(Seq(
      IceDoc("e1", Seq(SpanT("text", "The budget mentioned the report.", "", 0)))))
    val ev = EventsStage.events(Preprocess.annotate(docs)).collect()
    assert(ev.length === 1)
    assert(ev.head.key === "mention nsubj:budget dobj:report")
  }

  test("event extraction: aux-chained transitive clause yields the main-verb event") {
    // raw parse: vch(has->visited), nsubj on the AUX, dobj on the main
    // verb — only the transformed parse unites the two roles
    val docs = spark.createDataset(Seq(
      IceDoc("ax1", Seq(SpanT("text", "Fred Smith has visited Chicago.", "", 0)))))
    val ev = EventsStage.events(Preprocess.annotate(docs)).collect()
    assert(ev.map(_.key).toSeq === Seq("visit nsubj:PERSON dobj:GPE"))
  }

  test("event extraction: typed args use entity types; prep-only verbs excluded") {
    val docs = spark.createDataset(Seq(
      IceDoc("e2", Seq(SpanT("text", "Fred Smith visited Chicago.", "", 0))),
      IceDoc("e3", Seq(SpanT("text", "Fred Smith lives in Chicago.", "", 0)))))
    val ev = EventsStage.events(Preprocess.annotate(docs)).collect()
    assert(ev.map(_.key).toSeq === Seq("visit nsubj:PERSON dobj:GPE"))
  }

  test("PMI index keeps only cells > 0.1") {
    val events = Seq(
      ("d1", "cat", "nsubj-1_chase"), ("d2", "cat", "nsubj-1_chase"),
      ("d3", "cat", "dobj-1_feed"), ("d4", "dog", "nsubj-1_chase"),
      ("d5", "dog", "dobj-1_feed"), ("d6", "dog", "dobj-1_feed"))
      .toDF("doc_id", "term", "context")
    val idx = EntitySetStage.entityIndex(events)
      .select("term", "context", "pmi")
      .as[(String, String, Double)].collect().toSet
    // cat: 2x chase (p=ln((2/3)/(3/6))=ln(4/3)), 1x feed (ln((1/3)/(3/6))=ln(2/3)<0 dropped)
    assert(idx.map(t => (t._1, t._2)) ===
      Set(("cat", "nsubj-1_chase"), ("dog", "dobj-1_feed")))
    idx.foreach(t => assert(math.abs(t._3 - math.log(4.0 / 3)) < 1e-6))
  }

  test("shared-arg bootstrap scoring") {
    import graft.core.PathInstance
    def pi(arg1: String, path: String, arg2: String) =
      PathInstance("d", 0, "PERSON", "GPE", arg1, arg2, arg1, arg2, path, "r", "e", 0, 0)
    val inst = spark.createDataset(Seq(
      pi("A", "seed:path", "X"), pi("B", "seed:path", "Y"),
      pi("A", "cand:one", "X"), // shares (A,X) with seed
      pi("C", "cand:one", "Z"), // new pair
      pi("C", "cand:two", "W")))
    val rows = BootstrapStage.sharedArgScores(inst, Set("seed:path"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows === Map(
      "cand:one" -> ((2L, 1L)), // 2 distinct pairs, 1 shared with seed
      "cand:two" -> ((1L, 0L))))
  }

  test("bootstrap iterate: rejected candidates are excluded (anti-join)") {
    import graft.core.PathInstance
    def pi(arg1: String, path: String, arg2: String) =
      PathInstance("d", 0, "PERSON", "GPE", arg1, arg2, arg1, arg2, path, path, "e", 0, 0)
    val inst = spark.createDataset(Seq(
      pi("A", "seed:path", "X"),
      pi("A", "cand:one", "X"), pi("A", "cand:two", "X")))
    val repr = Seq(("cand:one", "cand:one"), ("cand:two", "cand:two"))
      .toDF("path", "repr")
    val kept = BootstrapStage.iterate(inst, repr,
        Set("seed:path"), rejectPaths = Set("cand:two"))
      .select("path").as[String].collect().toSet
    assert(kept === Set("cand:one"))
  }

  test("A12 negative seeds depress expansion scores (gamma = 0.5)") {
    // index: term t+ shares contexts with posSeed, t- with negSeed
    val idx = Seq(
      ("posSeed", "c1", 1L, 2.0), ("negSeed", "c2", 1L, 2.0),
      ("tPlus", "c1", 1L, 2.0), ("tMinus", "c2", 1L, 2.0))
      .toDF("term", "context", "cnt", "pmi")
    val scores = EntitySetStage.expand(spark, idx,
        seeds = Set("posSeed"), negSeeds = Set("negSeed"))
      .as[(String, Double)].collect().toMap
    assert(scores("tPlus") > 0.9)
    assert(scores("tMinus") < 0.0) // pure negative-centroid cosine * -gamma
  }

  test("A12 distributed centroid matches the in-memory arithmetic exactly " +
      "(overlapping pos/neg contexts, multi-seed sum)") {
    // pos seeds s1+s2 overlap on c1 (centroid sums), neg seed shares c2
    // with the pos centroid (full-outer combine leg) and owns c3
    val idx = Seq(
      ("s1", "c1", 1L, 1.5), ("s1", "c2", 1L, 0.5),
      ("s2", "c1", 1L, 2.5),
      ("sn", "c2", 1L, 1.0), ("sn", "c3", 1L, 2.0),
      ("t", "c1", 1L, 1.0), ("t", "c2", 1L, 2.0), ("t", "c3", 1L, 1.0))
      .toDF("term", "context", "cnt", "pmi")
    val got = EntitySetStage.expand(spark, idx,
        seeds = Set("s1", "s2"), negSeeds = Set("sn"))
      .as[(String, Double)].collect().toMap
    // reference arithmetic, driver-side: posC = {c1: 4.0, c2: 0.5},
    // negC = {c2: 1.0, c3: 2.0}; t = {c1: 1, c2: 2, c3: 1}
    val posC = Map("c1" -> 4.0, "c2" -> 0.5)
    val negC = Map("c2" -> 1.0, "c3" -> 2.0)
    val t = Map("c1" -> 1.0, "c2" -> 2.0, "c3" -> 1.0)
    def dot(a: Map[String, Double], b: Map[String, Double]) =
      a.keysIterator.map(k => a(k) * b.getOrElse(k, 0.0)).sum
    def norm(a: Map[String, Double]) =
      math.sqrt(a.valuesIterator.map(v => v * v).sum)
    // quantize through the PRODUCTION quantizer (not BigDecimal HALF_UP,
    // which this pin replaced): the test must fail if expand() ever
    // reverts to decimal rounding, and must not fail spuriously when a
    // future fixture lands on a 5e-7 tie where the two schemes diverge
    val expected = graft.functions.Quantize.q6(
      dot(t, posC) / norm(t) / norm(posC) -
        0.5 * (dot(t, negC) / norm(t) / norm(negC)))
    assert(got("t") === expected)
    // sn is not a pos seed, so it stays in the ranking; its score is the
    // same formula (here strongly negative — it IS the negative centroid)
    assert(got.contains("sn") && got("sn") < 0)
  }

  test("P/R scorer (A15)") {
    val key = Seq(("d1", "a", "p", "b"), ("d2", "c", "p", "d"))
      .toDF("doc_id", "subj", "pred", "obj")
    val resp = Seq(("d1", "a", "p", "b"), ("d3", "x", "p", "y"))
      .toDF("doc_id", "subj", "pred", "obj")
    val s = Export.score(key, resp).first()
    assert(s.getLong(0) === 1L) // correct
    assert(s.getLong(1) === 1L) // spurious
    assert(s.getLong(2) === 1L) // missing
    assert(s.getDouble(3) === 0.5 && s.getDouble(4) === 0.5)
  }

  test("term ranking formula (A9)") {
    val fg = Seq(("budget", 4L, 6L)).toDF("term", "doc_freq", "total_freq")
    val bg = Seq(("budget", 1L, 1L)).toDF("term", "doc_freq", "total_freq")
    val r = TermsStage.rankTerms(fg, bg).first()
    assert(math.abs(r.getDouble(3) - 4 * math.log(4.0) / 2) < 1e-5)
  }
}
