package graft

import graft.plans.Functions.cosineSim
import org.apache.spark.sql.functions._

/** The native cosine expression: value correctness (vs a plain-Scala
  * computation), codegen participation, null handling, and SQL-text
  * registration via SparkSessionExtensions. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def scalaCos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / na / nb
  }

  test("values match a reference computation; orthogonal/zero edge cases") {
    val rows = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)),
      (Seq(1.0, 2.0, 3.0), Seq(-3.0, 0.5, 2.0)))
    val got = rows.toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).as[Double].collect()
    rows.map { case (a, b) => scalaCos(a, b) }.zip(got).foreach {
      case (e, g) => assert(math.abs(e - g) < 1e-12)
    }
  }

  test("malformed pairs yield NULL: length mismatch and null elements") {
    // codegen path
    val mismatch = Seq((Seq(1.0, 0.0, 0.9), Seq(1.0))).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c"))
    assert(mismatch.collect().head.isNullAt(0))
    // null element (array<double> with containsNull)
    val nullElem = spark.range(1)
      .select(cosineSim(array(lit(1.0), lit(null).cast("double")),
        array(lit(1.0), lit(5.0))).as("c"))
    assert(nullElem.collect().head.isNullAt(0))
    // interpreted path (eval without codegen): force via expression eval
    val e = graft.plans.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == null)
  }

  test("stays inside whole-stage codegen (no serialization boundary)") {
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(cosineSim(col("a"), col("b")).as("c"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [cosine_sim"), p)
    df.collect() // executes the generated code path
    // and the doGenCode output is numerically identical to eval
    val vals = df.as[Double].collect()
    (0 until 8).foreach { i =>
      val e = scalaCos(Seq(i.toDouble, 1.0), Seq(2.0, i.toDouble))
      assert(math.abs(vals(i) - e) < 1e-12)
    }
  }

  test("null-safe: null array yields null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(cosineSim(col("a"), col("b")))
    assert(df.collect().head.isNullAt(0))
  }

  test("cosine_sim callable from SQL text once registered (extensions path)") {
    // same (identifier, info, builder) triple GraftExtensions injects at
    // session build; registered here directly because the shared test
    // session predates the extension
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.plans.CosineSim].getName, "cosine_sim"),
      graft.plans.GraftExtensions.cosineSimBuilder)
    val v = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].collect().head
    assert(math.abs(v - 1.0) < 1e-12)
    // wrong arity: a descriptive AnalysisException, not an
    // IndexOutOfBoundsException from the builder lambda
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0d))").collect()
    }
    assert(err.getMessage.contains("cosine_sim"))
  }
}
