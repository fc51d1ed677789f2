package graft

import graft.core.IceDoc
import graft.pipeline.KgPipeline
import graft.sources.Gen
import graft.streaming.IncrementalIngest

/** Streaming corpus ingest: documents appended as files flow through the
  * identical narrow pipeline and land as triples exactly once; a second
  * AvailableNow run over the same checkpoint reprocesses nothing. */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed triples == batch triples; restart is exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val docsA = (0L until 40L).map(Gen.doc)
    val docsB = (40L until 60L).map(Gen.doc)
    spark.createDataset(docsA).write.parquet(in) // initial corpus
    val rules = KgPipeline.rules(spark, "/root/testdata/sf0.001")

    IncrementalIngest.run(spark, in, out, ckpt, rules).awaitTermination(120000)
    val afterA = spark.read.parquet(out).count()

    // append more docs, run again from the same checkpoint
    spark.createDataset(docsB).write.mode("append").parquet(in)
    IncrementalIngest.run(spark, in, out, ckpt, rules).awaitTermination(120000)
    // third run with nothing new must add nothing (exactly-once resume)
    IncrementalIngest.run(spark, in, out, ckpt, rules).awaitTermination(120000)

    val streamed = spark.read.parquet(out)
      .select("doc_id", "subj", "pred", "obj")
      .as[(String, String, String, String)].collect().sorted
    val batch = IncrementalIngest
      .tagBatch(spark.createDataset(docsA ++ docsB), rules)
      .select("doc_id", "subj", "pred", "obj")
      .as[(String, String, String, String)].collect().sorted

    assert(streamed.length > afterA)
    assert(streamed === batch)
  }

  test("annotateStream: streamed annotations == batch annotate; " +
      "restart over the same checkpoint appends nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-annstream")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val docs = (0L until 30L).map(Gen.doc)
    spark.createDataset(docs).write.parquet(in)
    IncrementalIngest.annotateStream(spark, in, out, ckpt)
      .awaitTermination(120000)
    val n1 = spark.read.parquet(out).count()
    // nothing new in the source: the checkpointed offsets make the
    // second AvailableNow drain a no-op, not a duplicate append
    IncrementalIngest.annotateStream(spark, in, out, ckpt)
      .awaitTermination(120000)
    val ann = spark.read
      .schema(org.apache.spark.sql.Encoders.product[graft.core.AnnotatedDoc].schema)
      .parquet(out).as[graft.core.AnnotatedDoc]
    assert(ann.count() === n1)
    val batch = graft.operators.Preprocess.annotate(spark.createDataset(docs))
    assert(ann.collect().sortBy(_.doc_id).toSeq
      === batch.collect().sortBy(_.doc_id).toSeq)
  }
}
