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
    // sentences (soft-matched to `visited`) + 71 quantifier sentences
    // (F13-regularized to the exact visit path)
    assert(io.read("triples").count() === 1285L)
  }

  test("hard kill (Runtime.halt mid-run) and resume: committed " +
      "snapshots survive, final tables match an uninterrupted run") {
    // uninterrupted baseline (no-op if the earlier tests already ran it)
    KgPipeline.runAll(spark, "/root/testdata/sf0.001", root)
    val crashRoot = Files.createTempDirectory("graft-crash").toString
    // child JVM = this test's classpath; same --add-opens set Spark 4
    // needs on JDK 17 (build.sbt), small un-pretouched heap for startup
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g",
      "-cp", System.getProperty("java.class.path"),
      "graft.CrashRunner", "/root/testdata/sf0.001", crashRoot, "rules")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(Files.createTempDirectory("graft-crash-cwd").toFile)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val drain = new Thread(() => {
      val in = proc.getInputStream
      val buf = new Array[Byte](8192)
      while (in.read(buf) >= 0) ()
    }, "crash-child-drain")
    drain.setDaemon(true)
    drain.start()
    assert(proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
      "crash child did not exit in time")
    assert(proc.exitValue() === 137,
      s"child exit ${proc.exitValue()}: halt did not land mid-run " +
        "(3 = pipeline finished first, other = startup failure)")
    val stages = Seq("annotations", "path_instances", "paths",
      "path_types", "path_repr", "term_counts", "entity_index", "events",
      "rules", "triples", "canonical_triples")
    val io = new TableIO(spark, crashRoot)
    assert(io.isCommitted("rules"), "watched stage must be committed")
    val committed = stages.filter(io.isCommitted)
    assert(committed.size < stages.size,
      "halt landed after the full pipeline committed — nothing was interrupted")
    def snap(name: String): String =
      "\"snapshot\":\"([^\"]+)\"".r.findFirstMatchIn(io.manifest(name))
        .get.group(1)
    val before = committed.map(s => s -> snap(s)).toMap
    // resume: only the missing suffix recomputes
    KgPipeline.runAll(spark, "/root/testdata/sf0.001", crashRoot)
    committed.foreach(s =>
      assert(snap(s) === before(s), s"committed stage $s was recomputed"))
    stages.foreach(s => assert(io.isCommitted(s), s"stage $s missing after resume"))
    // content equality (not just counts) with the uninterrupted run
    def rows(r: TableIO): Array[String] =
      r.read("canonical_triples").select("subj", "pred", "obj")
        .collect().map(_.toString).sorted
    assert(rows(io) === rows(new TableIO(spark, root)))
  }
}
