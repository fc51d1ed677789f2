package graft

import graft.operators.EntitySetStage
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the distributed expansion scorer (A12 — centroid as a
  * groupBy + full-outer combine, norms as scalar aggregates, scoring
  * as an AQE join) matches a driver-side in-memory reference
  * implementation of the same arithmetic, for arbitrary small random
  * indexes and seed/negative-seed choices. Tolerance 1e-6 on the
  * rounded score: distributed summation order may differ from the
  * in-memory fold by strictly less than one rounding step. */
class ExpandPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(String, String, Double)],
                        seeds: Set[String], negSeeds: Set[String],
                        gamma: Double): Map[String, Double] = {
    def centroid(of: Set[String]): Map[String, Double] =
      rows.filter(r => of.contains(r._1))
        .groupMapReduce(_._2)(_._3)(_ + _)
    def norm(v: Map[String, Double]): Double =
      math.sqrt(v.valuesIterator.map(x => x * x).sum)
    val posC = centroid(seeds); val negC = centroid(negSeeds)
    val np = norm(posC); val nn = norm(negC)
    rows.groupBy(_._1).collect {
      case (term, trs) if !seeds.contains(term) =>
        val v = trs.groupMapReduce(_._2)(_._3)(_ + _)
        val tn = norm(v)
        def cos(c: Map[String, Double], cn: Double): Double =
          if (cn == 0) 0.0
          else v.iterator.map { case (k, x) => x * c.getOrElse(k, 0.0) }.sum /
            tn / cn
        term -> (cos(posC, np) - gamma * cos(negC, nn))
    }
  }

  test("distributed expand == in-memory reference on 20 random indexes") {
    val cell = Gen.zip(Gen.choose(0, 7), Gen.choose(0, 5),
      Gen.choose(1, 50).map(_ / 10.0))
    val g = Gen.listOfN(18, cell).map(_.map {
      case (t, c, p) => (s"t$t", s"c$c", p)
    }.distinctBy(r => (r._1, r._2)))
    (0 until 20).foreach { i =>
      val rows = g.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val terms = rows.map(_._1).distinct.sorted
      val seeds = terms.take(1 + i % 2).toSet
      val negSeeds = if (i % 3 == 0) Set.empty[String]
        else terms.takeRight(1).toSet -- seeds
      // the production index carries (term, context, cnt, pmi); cnt is
      // inert in the scorer
      val idx = rows.map { case (t, c, p) => (t, c, 1L, p) }
        .toDF("term", "context", "cnt", "pmi")
      val got = EntitySetStage.expand(spark, idx, seeds, negSeeds)
        .as[(String, Double)].collect().toMap
      val want = reference(rows, seeds, negSeeds, gamma = 0.5)
      assert(got.keySet === want.keySet, s"seed $i")
      got.foreach { case (t, s) =>
        assert(math.abs(s - want(t)) <= 1e-6,
          s"seed $i term $t: got $s want ${want(t)}")
      }
    }
  }
}
