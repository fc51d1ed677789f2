package graft

import graft.nlp.Nlp
import graft.operators.EntitySetStage
import graft.sources.{IceStatus, StatusStore}

/** F9/F10 expansion filters, the typeless indexer, the status store,
  * and the verb-lemma fallback. */
class EntityFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("F10 cutoff drops low-count terms from the index; marginals recomputed") {
    val ev = Seq(
      ("1", "alpha", "c1"), ("2", "alpha", "c1"), ("3", "alpha", "c1"),
      ("1", "beta", "c2"), ("2", "beta", "c2"), ("3", "beta", "c2"),
      ("1", "rare", "c1")).toDF("doc_id", "term", "context")
    val idx = EntitySetStage.entityIndex(ev, minTermTotal = 2.0)
    // rare (total 1) is cut; alpha/beta survive with pmi ln(2) > 0.1
    // computed over the KEPT cells only
    assert(idx.select("term").distinct().as[String].collect().toSet
      === Set("alpha", "beta"))
  }

  test("F9 candidate filter drops -tion/-ment, URLs, capitalized, suggested") {
    val scored = Seq(("election", 0.9), ("merger", 0.8), ("Treaty", 0.7),
      ("payment", 0.6), ("www.x.com", 0.5), ("verdict", 0.4))
      .toDF("term", "score")
    val kept = scored.filter(EntitySetStage.candidateAllowed(Set("verdict")))
      .select("term").as[String].collect().toSet
    assert(kept === Set("merger"))
  }

  test("F9: the column predicate and the scalar twin cannot drift") {
    // the two F9 encodings (EntitySetStage.candidateAllowed — the
    // production column predicate — and Nlp.seedCandidateAllowed — the
    // scalar spec twin) live in different files; pin them equal over a
    // vocabulary that exercises every rule branch, including the
    // capitalization edge the scalar form could silently get wrong
    // (titlecase ǅ: isUpper is false but toLower still changes it)
    val suggested = Set("verdict", "quota")
    val vocab = Seq("election", "payment", "merger", "Treaty", "treaty",
      "www.x.com", "http://y", "a@b.c", "verdict", "quota", "budget",
      "ǅual", "épée", "Épée", "9ball", "-dash", "", "t")
    val colKept = vocab.toDF("term")
      .filter(EntitySetStage.candidateAllowed(suggested))
      .select("term").as[String].collect().toSet
    val scalarKept = vocab.filter(t =>
      Nlp.seedCandidateAllowed(t, Set.empty, suggested)).toSet
    assert(colKept === scalarKept)
    // the reference rejects the empty string explicitly
    // (EntitySetExpander.java:97); both encodings must too
    assert(!colKept(""))
  }

  test("typeless indexer: longest-first multi-word match, head contexts, _-normalized") {
    val docs = Seq(
      graft.sources.Gen.doc(0L), // "The annual budget ..." (id%24==0)
      graft.sources.Gen.doc(4L)  // plain "budget" filler (4%6 != 0)
    ).toDS()
    val ann = graft.operators.Preprocess.annotate(docs)
    val pairs = EntitySetStage.typelessEvents(ann,
        Set("budget", "annual budget"))
      .select("term", "context").as[(String, String)].collect().toSet
    assert(pairs.exists(_._1 == "annual_budget"))
    assert(pairs.exists(_._1 == "budget"))
    // doc 0's budget token was consumed by the multi-word match
    val doc0 = EntitySetStage.typelessEvents(ann.filter(_.doc_id == "0"),
        Set("budget", "annual budget"))
      .select("term").as[String].collect().toSet
    assert(doc0 === Set("annual_budget"))
  }

  test("status store round-trips corpora, entity sets and relations") {
    val st = IceStatus(
      corpora = Map("c1" -> Map("directory" -> "/data in: x", "filter" -> "sgm")),
      entitySets = Map("DRUG" -> Seq("aspirin", "ibu profen")),
      relations = Map("livesIn" -> Seq("nsubj-1:live:prep:in:pobj")))
    val path = java.nio.file.Files.createTempDirectory("graft-status")
      .resolve("ice.yml").toString
    StatusStore.save(path, st)
    assert(StatusStore.load(path) === st)
    // missing file -> empty status
    assert(StatusStore.load(path + ".nope") === IceStatus())
    // property KEYS carrying colons / quotes / backslashes must survive
    // a save/load cycle too (the key split scans past the closing
    // quote instead of cutting at the first ':')
    val tricky = IceStatus(corpora = Map(
      "c:2" -> Map("a:b" -> "v:w", "q\"uote" -> "x\\y", "" -> "")))
    val path2 = java.nio.file.Files.createTempDirectory("graft-status2")
      .resolve("ice.yml").toString
    StatusStore.save(path2, tricky)
    assert(StatusStore.load(path2) === tricky)
    // control chars in values escape and round-trip (a literal newline
    // in a quoted scalar would split the line-based parse)
    val ctrl = IceStatus(
      corpora = Map("c" -> Map("note" -> "line1\nline2\tend")),
      entitySets = Map("s" -> Seq("a\nb", "plain")))
    val path3 = java.nio.file.Files.createTempDirectory("graft-status3")
      .resolve("ice.yml").toString
    StatusStore.save(path3, ctrl)
    assert(StatusStore.load(path3) === ctrl)
    // a colon line in a non-corpora section parses without crashing
    val handEdited = "entitySets:\n  s:\n    x: y\n"
    val path4 = java.nio.file.Files.createTempDirectory("graft-status4")
      .resolve("ice.yml")
    java.nio.file.Files.writeString(path4, handEdited)
    assert(StatusStore.load(path4.toString).entitySets === Map("s" -> Vector()))
    // a list item before any name header in ITS section (the previous
    // section's name must not leak across the boundary) parses without
    // a NoSuchElementException crash
    val handEdited2 =
      "corpora:\n  main:\n    docCount: 5\nentitySets:\n    - budget\n"
    val path5 = java.nio.file.Files.createTempDirectory("graft-status5")
      .resolve("ice.yml")
    java.nio.file.Files.writeString(path5, handEdited2)
    val st5 = StatusStore.load(path5.toString)
    assert(st5.corpora === Map("main" -> Map("docCount" -> "5")))
    assert(st5.entitySets === Map.empty)
  }

  test("status store: fuzzed round-trip over quote/colon/escape-heavy strings") {
    // hand-rolled parser ⇒ fuzz it: random strings drawn from exactly
    // the alphabet the quoting logic special-cases (quotes, colons,
    // backslashes, dashes, '#', control chars, spaces)
    val rnd = new scala.util.Random(3)
    val alphabet = "ab:#-\"'\\\n\r\t xyZ09"
    def s(): String =
      (0 until rnd.nextInt(10)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    for (trial <- 1 to 300) {
      val st = IceStatus(
        corpora = Map(s() -> Map(s() -> s(), s() -> s())),
        entitySets = Map(s() -> Seq(s(), s())),
        relations = Map(s() -> Seq(s())))
      val rt = StatusStore.parse(StatusStore.render(st))
      assert(rt === st, s"trial $trial: ${StatusStore.render(st)}")
    }
  }

  test("verb-lemma fallback strips inflections without touching lexicon verbs") {
    assert(Nlp.lemmaVerb("visited") === "visit") // lexicon
    assert(Nlp.lemmaVerb("carries") === "carry")
    assert(Nlp.lemmaVerb("carried") === "carry")
    assert(Nlp.lemmaVerb("watches") === "watch")
    assert(Nlp.lemmaVerb("planned") === "plan")
    assert(Nlp.lemmaVerb("running") === "run")
    assert(Nlp.lemmaVerb("walks") === "walk")
    // Porter 1b e-restoration: base-form 'e' comes back after eed /
    // at-bl-iz / short-CVC stems, and ONLY there
    assert(Nlp.lemmaVerb("agreed") === "agree")
    assert(Nlp.lemmaVerb("smiled") === "smile")
    assert(Nlp.lemmaVerb("taking") === "take")
    assert(Nlp.lemmaVerb("hoping") === "hope")
    assert(Nlp.lemmaVerb("hopping") === "hop")
    assert(Nlp.lemmaVerb("generated") === "generate")
    assert(Nlp.lemmaVerb("troubled") === "trouble")
    assert(Nlp.lemmaVerb("walking") === "walk") // 'lk' coda: no e
    assert(Nlp.lemmaVerb("edited") === "edit") // two vowel groups: no e
    // Porter keeps -ll/-ss/-zz doubled, so base and inflection agree
    assert(Nlp.lemmaVerb("buzzed") === "buzz")
    assert(Nlp.lemmaVerb("buzz") === "buzz")
    // -at restoration only after consonant/'i': -eat/-at verbs keep
    // their e-less base so inflections merge with the -s strip
    assert(Nlp.lemmaVerb("treated") === "treat")
    assert(Nlp.lemmaVerb("treats") === "treat")
    assert(Nlp.lemmaVerb("heating") === "heat")
    assert(Nlp.lemmaVerb("floated") === "float")
    assert(Nlp.lemmaVerb("associated") === "associate")
  }
}
