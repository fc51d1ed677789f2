package graft

import graft.operators.{DepPathsStage, IncrementalPaths, Preprocess}
import graft.sources.Gen

/** Incremental recompute (DepPathsLog analog): the merge of cached
  * clean-doc instances with recomputed dirty-doc instances equals a
  * full recompute, and only dirty docs flow through mining. */
class IncrementalPathsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 200L).map(Gen.doc)
  private lazy val ann = Preprocess.annotate(spark.createDataset(docs))

  test("dirty selection: exactly the docs containing a changed token") {
    // 'Chicago' appears only in docs whose generated sentences mention it
    val dirty = IncrementalPaths.dirtyDocs(ann, Set("chicago"))
      .collect().map(_.doc_id).toSet
    // token-level: 'Chicagoville' (the alias surface) must NOT count
    val expected = docs.filter(_.spans.exists(sp =>
      "\\bchicago\\b".r.findFirstIn(sp.text.toLowerCase).isDefined))
      .map(_.doc_id).toSet
    assert(dirty === expected)
    assert(dirty.nonEmpty && dirty.size < docs.size)
  }

  test("merge of clean-cached + dirty-recomputed == full recompute") {
    val full = DepPathsStage.instances(ann)
    // prior committed table = the full mine (unchanged logic)
    val merged = IncrementalPaths.mergeInstances(full, ann, Set("chicago"))
    val a = full.toDF().collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = merged.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a === b)
  }

  test("clean docs are NOT re-mined: a poisoned prior row survives on a clean doc") {
    val full = DepPathsStage.instances(ann)
    val cleanId = docs.map(_.doc_id).find { id =>
      !docs.find(_.doc_id == id).get.spans.exists(
        _.text.toLowerCase.contains("chicago"))
    }.get
    // poison the prior row of a clean doc; merge must keep it verbatim
    // (proving that doc skipped recompute)
    val poisoned = full.map(pi =>
      if (pi.doc_id == cleanId) pi.copy(path = "POISON") else pi)
    val merged = IncrementalPaths.mergeInstances(poisoned, ann, Set("chicago"))
      .as[graft.core.PathInstance].collect()
    assert(merged.filter(_.doc_id == cleanId).forall(_.path == "POISON"))
  }

  test("grown and shrunk corpora still merge to a full recompute") {
    // prior was committed over the first 150 docs; the corpus then
    // gained 50 docs (new in ann, no cached rows) and lost 10 (in
    // prior, gone from ann) — merge must equal a fresh full mine of ann
    val annNow = Preprocess.annotate(
      spark.createDataset(docs.filterNot(d => d.doc_id.toLong < 10)))
    val prior = DepPathsStage.instances(Preprocess.annotate(
      spark.createDataset(docs.filter(_.doc_id.toLong < 150))))
    val merged = IncrementalPaths.mergeInstances(prior, annNow, Set("chicago"))
    val full = DepPathsStage.instances(annNow)
    val a = full.toDF().collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = merged.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a === b)
  }
}
