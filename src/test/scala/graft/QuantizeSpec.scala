package graft

import graft.functions.Quantize
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Every cross-engine gate score rests on Quantize.q6, so its algebra
  * is pinned here: the Catalyst column form and the driver-side scalar
  * form compute the identical double (they must — driver-computed
  * scores like MIRA/tuned-costs are hash-compared against SQL-computed
  * oracles through the same quantizer), exact half-ties go UP (the
  * floor(x·1e6 + 0.5) definition, deterministic on both engines,
  * unlike engine round() whose tie direction differs between Spark and
  * DuckDB), and the function is idempotent on its own range. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def passes(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  // scores in practice are cosines / log-ratios / probabilities — keep
  // the generator in a realistic magnitude band (|x| ≤ 1e6), plus the
  // exact-tie and negative corners below
  private val scoreGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1.0, 1.0),
    Gen.chooseNum(-1e6, 1e6),
    Gen.chooseNum(-100.0, 100.0).map(x => Quantize.q6(x) + 5e-7))

  // the column/scalar parity contract additionally covers magnitudes a
  // score never reaches, crossing BOTH divergence thresholds of a naive
  // BIGINT floor: 2^53/1e6 (doubles lose fractional bits) and
  // Long.Max/1e6 (a BIGINT floor would saturate). Idempotence and the
  // grid-step bound are score-band properties and stay on scoreGen —
  // above 2^53 the ×1e6 round-trip is not exact for ANY floor.
  private val parityGen: Gen[Double] =
    Gen.oneOf(scoreGen, Gen.chooseNum(-1e19, 1e19))

  test("column form and scalar form agree bit-for-bit") {
    passes(Prop.forAll(Gen.listOfN(64, parityGen)) { xs =>
      val viaColumn = xs.toDF("x")
        .select(Quantize.q6(col("x")).as("q")).as[Double].collect()
      viaColumn.zip(xs.map(Quantize.q6)).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b)
      }
    })
  }

  test("parity holds at the BIGINT-floor divergence boundaries") {
    // 2^53/1e6, Long.Max/1e6 and beyond — a naive FLOOR(double) maps
    // 1e13 to Long.Max/1e6 ≈ 9.22e12 instead of 1e13
    val edges = Seq(9007199254740992.0 / 1e6, 9007199254740993.0 / 1e6,
      9.223372036854776e12, 1e13, -1e13, 1e18, Double.MaxValue,
      -Double.MaxValue)
    val viaColumn = edges.toDF("x")
      .select(Quantize.q6(col("x")).as("q")).as[Double].collect()
    viaColumn.zip(edges.map(Quantize.q6)).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ===
        java.lang.Double.doubleToRawLongBits(b), s"column $a vs scalar $b")
    }
    assert(Quantize.q6(1e13) === 1e13)
  }

  test("non-finite inputs propagate in BOTH forms (Spark FLOOR is " +
       "BIGINT-typed and would otherwise map NaN to 0)") {
    val specials = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity)
    val viaColumn = specials.toDF("x")
      .select(Quantize.q6(col("x")).as("q")).as[Double].collect()
    assert(viaColumn(0).isNaN && specials.map(Quantize.q6)(0).isNaN)
    assert(viaColumn(1) === Double.PositiveInfinity)
    assert(viaColumn(2) === Double.NegativeInfinity)
    assert(Quantize.q6(Double.PositiveInfinity) === Double.PositiveInfinity)
    assert(Quantize.q6(Double.NegativeInfinity) === Double.NegativeInfinity)
  }

  test("exact half-ties quantize up (toward +inf), both signs") {
    // 2.5e-6·1e6 = 2.5 exactly (binary-representable) → floor(3.0)
    assert(Quantize.q6(2.5e-6) === 3e-6)
    // -2.5 + 0.5 = -2.0 → -2e-6, i.e. UP toward +inf, not away from 0
    assert(Quantize.q6(-2.5e-6) === -2e-6)
    assert(Quantize.q6(0.0) === 0.0)
  }

  test("idempotent and within half a grid step of the input") {
    passes(Prop.forAll(scoreGen) { x =>
      val q = Quantize.q6(x)
      // half a 1e-6 grid step, plus the float slack of the ×1e6 trip
      Quantize.q6(q) == q &&
        math.abs(q - x) <= 5e-7 + math.ulp(x * 1e6) / 1e6 + math.ulp(1.0)
    })
  }

  test("order-preserving: quantized compare never inverts a raw compare") {
    passes(Prop.forAll(scoreGen, scoreGen) { (a, b) =>
      if (a <= b) Quantize.q6(a) <= Quantize.q6(b)
      else Quantize.q6(a) >= Quantize.q6(b)
    })
  }
}
