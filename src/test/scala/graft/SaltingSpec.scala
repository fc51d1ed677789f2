package graft

import graft.functions.Salting
import org.apache.spark.sql.functions._

/** Count-merge associativity = salting correctness: the salted two-phase
  * aggregate must equal the plain groupBy at ANY bucket count and ANY
  * input partitioning (the property the reference's manual split/merge
  * relies on, IceCLI.java:592-813). */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount == plain groupBy count for skewed data, several bucket counts") {
    // Zipf-ish skew: key k appears ~ N/k times
    val rows = (1 to 20).flatMap(k => (0 until 2000 / k).map(i => (s"key$k", i)))
    val df = rows.toDF("k", "v").repartition(7)
    val expected = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    for (buckets <- Seq(1, 2, 32, 101)) {
      val got = Salting.saltedCount(df, Seq("k"), buckets)
        .as[(String, Long)].collect().toMap
      assert(got === expected, s"buckets=$buckets")
    }
  }

  test("saltedSum == plain groupBy sum") {
    val df = (1 to 5000).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "v")
    val expected = df.groupBy($"k").agg(sum($"v").as("s"))
      .as[(String, Long)].collect().toMap
    val got = Salting.saltedSum(df, Seq("k"), "v", "s", 16)
      .as[(String, Long)].collect().toMap
    assert(got === expected)
  }

  test("pipeline output is identical at different parallelism (determinism for N vs 4N)") {
    import graft.pipeline.KgPipeline
    val a = KgPipeline.triples(spark, "/root/testdata/sf0.001")
      .collect().map(t => (t.doc_id, t.subj, t.pred, t.obj)).sorted
    val b = KgPipeline.triples(spark, "/root/testdata/sf0.001")
      .repartition(13).collect().map(t => (t.doc_id, t.subj, t.pred, t.obj)).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
