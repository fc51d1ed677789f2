package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, isnan, lit, when}

/** Engine-portable 6-dp score quantization.
  *
  * Every gate score is cross-checked value-for-value against a DuckDB
  * oracle. The raw doubles are bit-identical across IEEE engines when
  * the op order matches, but engine `round()` is NOT: Spark converts
  * the binary double to its exact decimal expansion and half-ups,
  * DuckDB multiplies by 1e6 first — so a score landing on a 5e-7
  * boundary flips between engines (measured: 5 of 50k quality scores
  * at the sf1.0 sweep). Where the quantized value feeds an ORDER
  * BY/LIMIT cut or an argmax (expansion ranking, seed-recommendation
  * merges, rank top-k), such a flip changes WHICH rows survive, not
  * just a last digit. `floor(x·1e6 + 0.5)/1e6` is the same float ops
  * on both engines — deterministic half-up (toward +∞ at exact ties),
  * identical by construction. Scalar twin for driver-side code below.
  */
object Quantize {
  /** Column form: floor(x·1e6 + 0.5)/1e6, with the floor emulated in
    * DOUBLE space. Spark's FLOOR(double) is BIGINT-typed (NaN → 0,
    * saturates at ±Long.Max) while the scalar twin and DuckDB floor a
    * double — without the guard a 0/0 score would dump 0.0 on the
    * Spark side vs NaN on the oracle side, and |x·1e6| beyond Long
    * range would saturate instead of passing through. Any double with
    * |v| ≥ 2^53 is already integral, so floor(v) = v there; that
    * branch also passes ±Inf through (NaN compares false everywhere,
    * so it is tested explicitly). Result: bit-identical to the scalar
    * twin for every input, finite or not. */
  def q6(c: Column): Column = {
    val v = c * lit(1000000.0) + lit(0.5)
    when(isnan(v) || abs(v) >= lit(9007199254740992.0), v)
      .otherwise(floor(v)) / lit(1000000.0)
  }

  /** Scalar twin — the identical IEEE ops for driver-computed scores
    * (MIRA, tuned costs, seed-recommendation gravitation). */
  def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
}
