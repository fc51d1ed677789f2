package graft

import graft.operators.Canonicalize
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the distributed CC loop labels every node with the minimum
  * id of its component, for arbitrary small random graphs — verified
  * against a driver-side union-find. */
class CcPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(Ordering[String].max(ra, rb)) =
        Ordering[String].min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).values
      .flatMap(members => members.map(_ -> members.min)).toMap
  }

  test("pointer doubling: a 20-node chain converges within 7 rounds") {
    // plain one-hop min-propagation would need ~19 rounds; the
    // comp-of-comp leg makes convergence logarithmic in the diameter
    val edges = (0 until 19).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val got = Canonicalize.connectedComponents(edges.toDF("src", "dst"),
        maxIter = 7)
      .as[(String, String)].collect().toMap
    assert(got.size == 20 && got.values.forall(_ == "n00"), got.toString)
  }

  test("round-6 loop internals: a 256-node chain converges within 10 rounds") {
    // pins the reworked iteration shape (lazy localCheckpoint
    // materialized by the same convergence-count action; single-scan
    // explode symmetrization) at a depth where pointer doubling is
    // genuinely load-bearing: one-hop propagation would need ~255
    // rounds, log2(diameter) needs ~8-9 — and each round's checkpoint
    // must truncate lineage or the later iterations' plans blow up.
    val edges = (0 until 255).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val got = Canonicalize.connectedComponents(edges.toDF("src", "dst"),
        maxIter = 10)
      .as[(String, String)].collect().toMap
    assert(got.size == 256 && got.values.forall(_ == "n000"),
      got.filter(_._2 != "n000").take(5).toString)
  }

  test("CC labels == union-find minima on 15 random graphs") {
    val g = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9))
        .map { case (a, b) => (s"n$a", s"n$b") })
    (0 until 15).foreach { i =>
      val edges = g.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = Canonicalize.connectedComponents(edges.toDF("src", "dst"))
        .as[(String, String)].collect().toMap
      assert(got === unionFind(edges), s"seed $i, edges $edges")
    }
  }
}
