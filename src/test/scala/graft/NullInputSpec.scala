package graft

import org.apache.spark.sql.functions._

/** Null-input robustness: at 100 TB, nullable columns WILL carry nulls
  * (failed scrapes, partial ingests). A null text or embedding must
  * degrade per-row — null-propagate or drop — never NPE an executor
  * (UDFs receive the null; typed array loops dereference it). */
class NullInputSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-null").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "customer", "nation",
                  "part", "supplier", "region"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.unionByName(docs.limit(1)
        .withColumn("doc_id", lit(999999L).cast(docs.schema("doc_id").dataType))
        .withColumn("text", lit(null).cast("string")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.unionByName(emb.limit(1)
        .withColumn("vec_id", lit(999999L).cast(emb.schema("vec_id").dataType))
        .withColumn("embedding",
          lit(null).cast(emb.schema("embedding").dataType)))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("every gate query survives a null text / null embedding row") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val r =
          try { fn(spark, dir).count(); None }
          catch { case e: Exception => Some(s"$name: ${e.toString.take(300)}") }
        spark.catalog.clearCache()
        r
    }
    assert(failures.isEmpty,
      s"queries failing on null input:\n${failures.mkString("\n")}")
  }

  test("null text labels as 'unk', not the CASE catch-all") {
    import spark.implicits._
    val got = graft.datapipe.TextAnalysis
      .langId(spark.read.parquet(s"$dir/documents.parquet"))
      .filter(col("doc_id") === 999999L)
      .select("pred_lang").as[String].collect()
    assert(got.toSeq === Seq("unk"))
  }
}
