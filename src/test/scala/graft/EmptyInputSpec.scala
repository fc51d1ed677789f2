package graft

/** Empty-input robustness: at cluster scale, empty partitions and empty
  * tables are routine (a fresh corpus, a filter that matched nothing, a
  * resumed run over an already-drained source). Every driver query must
  * degrade to an empty result — never throw (first() on an empty frame,
  * head of an empty sample, a divide-by-zero marginal...). */
class EmptyInputSpec extends SparkSpec {

  /** All sf0.001 tables, schema preserved, zero rows. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("documents", "embeddings", "events", "lineitem", "orders",
                  "customer", "nation", "part", "supplier", "region"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    d
  }

  test("every gate query runs on an empty corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val r =
          try { fn(spark, dir).count(); None }
          catch { case e: Exception => Some(s"$name: ${e.toString.take(200)}") }
        spark.catalog.clearCache()
        r
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
