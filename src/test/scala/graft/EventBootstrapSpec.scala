package graft

import graft.operators.{EventArg, EventBootstrapStage, EventRow, EventsStage}

/** Event (tree) bootstrap: shared-arg scoring, iterate folding, tree
  * similarity, repr table — behavior per events/EventBootstrap.java and
  * WordEmbedding.java:139-154. */
class EventBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def row(doc: String, trig: String, subj: (String, String),
                  obj: (String, String), text: String = ""): EventRow = {
    val args = Seq(EventArg("nsubj", subj._2, subj._1),
      EventArg("dobj", obj._2, obj._1))
    def r(g: EventArg, typed: Boolean) =
      s"${g.role}:${if (typed && g.etype != "OTHER") g.etype else g.value}"
    EventRow(doc, trig, args,
      trig + " " + args.map(r(_, typed = true)).mkString(" "),
      trig + " " + args.map(r(_, typed = false)).mkString(" "), text)
  }

  private lazy val ev = Seq(
    // seed instances: visit PERSON/GPE over pairs (a,x), (b,y)
    row("1", "visit", ("a", "PERSON"), ("x", "GPE")),
    row("2", "visit", ("b", "PERSON"), ("y", "GPE")),
    // candidate sharing one pair; one extra pair of its own
    row("3", "tour", ("a", "PERSON"), ("x", "GPE")),
    row("4", "tour", ("c", "PERSON"), ("z", "GPE")),
    // trigger sharing nothing
    row("5", "fly", ("d", "PERSON"), ("w", "GPE"))
  ).toDS()

  test("shared-arg scores: shared/total * shared/(shared+1), seeds excluded") {
    val scores = EventBootstrapStage
      .sharedArgScores(ev, Set("visit"), "PERSON", "GPE")
      .as[(String, String, Long, Long, Double)].collect()
    assert(scores.length === 1)
    val (key, trig, shared, total, score) = scores.head
    assert(key === "tour nsubj:PERSON dobj:GPE" && trig === "tour")
    assert(shared === 1 && total === 2)
    // 1/2 * 1/2 = 0.25
    assert(score === 0.25)
  }

  test("iterate: rejected keys are excluded; cap and floor applied") {
    val repr = Seq(("tour nsubj:PERSON dobj:GPE", "person tour gpe"))
      .toDF("key", "repr")
    val out = EventBootstrapStage.iterate(ev, repr, Set("visit"),
      "PERSON", "GPE", rejectKeys = Set("tour nsubj:PERSON dobj:GPE"))
    assert(out.count() === 0)
    val kept = EventBootstrapStage.iterate(ev, repr, Set("visit"),
      "PERSON", "GPE", rejectKeys = Set.empty)
    assert(kept.select("key").as[String].collect()
      === Array("tour nsubj:PERSON dobj:GPE"))
  }

  test("tree similarity: equally weighted trigger + role-matched arg types") {
    val a = Seq(EventArg("nsubj", "PERSON", "a"), EventArg("dobj", "GPE", "x"))
    val b = Seq(EventArg("nsubj", "PERSON", "b"), EventArg("dobj", "GPE", "y"))
    // same trigger, same types -> (1 + 2/2) / 2 = 1.0
    assert(EventBootstrapStage.treeSimilarity("visit", a, "visit", b) === 1.0)
    // different trigger, same types -> (0 + 1) / 2 = 0.5
    assert(EventBootstrapStage.treeSimilarity("visit", a, "tour", b) === 0.5)
    // same trigger, one type differs -> (1 + 0.5) / 2 = 0.75
    val c = Seq(EventArg("nsubj", "PERSON", "b"), EventArg("dobj", "MONEY", "y"))
    assert(EventBootstrapStage.treeSimilarity("visit", a, "visit", c) === 0.75)
  }

  test("embedding scores: cosine to seed centroid damped by count/(count+1)") {
    val embedding = Map(
      "visit" -> Array(1.0, 0.0), "tour" -> Array(1.0, 0.1),
      "fly" -> Array(0.0, 1.0),
      "a" -> Array(0.5, 0.5), "x" -> Array(0.5, -0.5))
    val types = Seq(("tour nsubj:a dobj:x", 3L), ("fly nsubj:a dobj:x", 1L))
      .toDF("key", "cnt")
    val scored = EventBootstrapStage
      .embeddingScores(types, Seq(("visit", Seq("a", "x"))), embedding)
      .select("key", "score").as[(String, Double)].collect().toMap
    // tour (near the visit centroid, count 3) must outrank fly (count 1)
    assert(scored("tour nsubj:a dobj:x") > scored("fly nsubj:a dobj:x"))
  }

  test("event repr table: linearization + min-example merge") {
    val rows = Seq(
      row("1", "mention", ("budget", "OTHER"), ("lawsuit", "OTHER"),
        "The budget mentioned the lawsuit."),
      row("2", "mention", ("budget", "OTHER"), ("lawsuit", "OTHER"),
        "A budget mentioned a lawsuit."),
      row("3", "visit", ("smith", "PERSON"), ("chicago", "GPE"),
        "Fred Smith visited Chicago.")
    ).toDS()
    val asMap = EventsStage.eventReprTable(rows)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(asMap("mention nsubj:budget dobj:lawsuit")
      === (("budget mention lawsuit", "A budget mentioned a lawsuit.")))
    assert(asMap("visit nsubj:PERSON dobj:GPE")
      === (("person visit gpe", "Fred Smith visited Chicago.")))
  }
}
