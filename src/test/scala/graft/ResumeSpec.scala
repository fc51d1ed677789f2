package graft

import graft.pipeline.KgPipeline
import graft.sources.TableIO
import java.nio.file.Files

/** Snapshot/manifest resumability (north rule): a rerun after a "kill"
  * skips committed stages and recomputes only what is missing; every
  * commit carries per-partition lineage rows + metrics. */
class ResumeSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-resume").toString

  test("runAll commits all stage snapshots with lineage") {
    val io = KgPipeline.runAll(spark, "/root/testdata/sf0.001", root)
    val stages = Seq("annotations", "path_instances", "paths", "path_types",
      "path_repr", "term_counts", "entity_index", "events", "rules",
      "triples", "canonical_triples")
    stages.foreach { s =>
      assert(io.isCommitted(s), s"stage $s not committed")
      val lineage = spark.read.parquet(s"$root/$s/_lineage")
      val rowsOut = lineage.agg(org.apache.spark.sql.functions.sum("rows_out"))
        .first().getLong(0)
      val manifestRows = "\"rows\":(\\d+)".r
        .findFirstMatchIn(io.manifest(s)).get.group(1).toLong
      assert(rowsOut === manifestRows, s"lineage rows mismatch for $s")
    }
    // north rule: stage metric accumulators captured in the manifests.
    // After the annotations commit, docs/sentences/mentions are in; the
    // triples commit sees the tagger's accumulator too.
    def metric(stage: String, key: String): Long =
      ("\"" + key + "\":(\\d+)").r.findFirstMatchIn(io.manifest(stage))
        .get.group(1).toLong
    assert(metric("annotations", "docs_in") === 500L)
    assert(metric("annotations", "sentences") > 500L)
    assert(metric("annotations", "mentions") > 1000L)
    assert(metric("triples", "path_instances") > 900L)
    assert(metric("triples", "triples") > 900L)
  }

  test("kill-and-resume: only the uncommitted stage recomputes") {
    val io = new TableIO(spark, root)
    KgPipeline.runAll(spark, "/root/testdata/sf0.001", root) // ensure all committed
    def snap(name: String): String =
      "\"snapshot\":\"([^\"]+)\"".r.findFirstMatchIn(io.manifest(name)).get.group(1)
    val annBefore = snap("annotations")
    val triBefore = snap("triples")
    io.uncommit("triples")
    io.uncommit("canonical_triples")
    KgPipeline.runAll(spark, "/root/testdata/sf0.001", root)
    assert(snap("annotations") === annBefore, "committed stage was recomputed")
    assert(snap("triples") !== triBefore, "uncommitted stage was not recomputed")
    // 999 base triples + 72 tour + 72 pronoun-coref + 71 partial-name
    // sentences, all soft-matched to `visited`
    assert(io.read("triples").count() === 1214L)
  }
}
