package graft

import graft.operators.Export

/** A15 mention-level scorer: head-offset alignment, symmetric-swap
  * matching, type errors — TypedRelationExtractorScorer.java:45-160
  * semantics. */
class ScorerSpec extends SparkSpec {
  import spark.implicits._

  test("scorer: alignment, symmetric swap, type error, spurious, missing, dup head") {
    val keyEnts = Seq(("d1", 10), ("d1", 20), ("d1", 30), ("d2", 10),
      ("d2", 20)).toDF("doc_id", "head_end")
    // d1@40 is spurious; a second d1@10 row is a duplicate head
    val respEnts = Seq(("d1", 10), ("d1", 10), ("d1", 20), ("d1", 30),
      ("d1", 40), ("d2", 10), ("d2", 20)).toDF("doc_id", "head_end")
    val keyRels = Seq(
      ("d1", "livesIn", 10, 20),   // matched directly, correct type
      ("d1", "married", 20, 30),   // matched SWAPPED (symmetric), correct
      ("d2", "livesIn", 10, 20),   // matched directly but wrong type
      ("d2", "worksIn", 20, 10)    // never matched -> missing
    ).toDF("doc_id", "pred", "a1_end", "a2_end")
    val respRels = Seq(
      ("d1", "livesIn", 10, 20),
      ("d1", "married", 30, 20),   // swapped order, symmetric pred
      ("d2", "bornIn", 10, 20),    // type error
      ("d1", "livesIn", 10, 40)    // spurious (no key rel)
    ).toDF("doc_id", "pred", "a1_end", "a2_end")
    val row = Export.scoreMentions(keyEnts, respEnts, keyRels, respRels,
      symmetricPreds = Set("married")).collect().head
    assert(row.getAs[Long]("correct_ents") === 5)
    assert(row.getAs[Long]("spurious_ents") === 2) // @40 + dup head @10
    assert(row.getAs[Long]("missing_ents") === 0)
    assert(row.getAs[Long]("correct_rels") === 2)
    assert(row.getAs[Long]("type_errors") === 1)
    assert(row.getAs[Long]("spurious_rels") === 1)
    assert(row.getAs[Long]("missing_rels") === 1)
    // P = 2/4; R = 2/(2+1+1)
    assert(row.getAs[Double]("precision") === 0.5)
    assert(row.getAs[Double]("recall") === 0.5)
    assert(row.getAs[Double]("f1") === 0.5)
  }

  test("scorer consumption: a key is consumed once; extras are spurious, not type errors") {
    val ents = Seq(("d", 5), ("d", 9)).toDF("doc_id", "head_end")
    // one key relation, two responses on the same arg pair: the
    // same-pred response consumes the key (correct); the second finds
    // no unconsumed key -> SPURIOUS (reference remove-on-match, not a
    // type error), so recall is 1.0
    val keyRels = Seq(("d", "livesIn", 5, 9)).toDF("doc_id", "pred", "a1_end", "a2_end")
    val respRels = Seq(("d", "livesIn", 5, 9), ("d", "worksIn", 5, 9))
      .toDF("doc_id", "pred", "a1_end", "a2_end")
    val r1 = Export.scoreMentions(ents, ents, keyRels, respRels, Set.empty)
      .collect().head
    assert(r1.getAs[Long]("correct_rels") === 1)
    assert(r1.getAs[Long]("type_errors") === 0)
    assert(r1.getAs[Long]("spurious_rels") === 1)
    assert(r1.getAs[Long]("missing_rels") === 0)
    assert(r1.getAs[Double]("recall") === 1.0)
    // two key relations on the same pair, one response: the same-pred
    // key is consumed (correct); the other key stays MISSING, recall 0.5
    val keyRels2 = Seq(("d", "livesIn", 5, 9), ("d", "worksIn", 5, 9))
      .toDF("doc_id", "pred", "a1_end", "a2_end")
    val respRels2 = Seq(("d", "livesIn", 5, 9))
      .toDF("doc_id", "pred", "a1_end", "a2_end")
    val r2 = Export.scoreMentions(ents, ents, keyRels2, respRels2, Set.empty)
      .collect().head
    assert(r2.getAs[Long]("correct_rels") === 1)
    assert(r2.getAs[Long]("type_errors") === 0)
    assert(r2.getAs[Long]("missing_rels") === 1)
    assert(r2.getAs[Double]("recall") === 0.5)
  }

  test("property: distributed consumption equals the driver-side greedy on random instances") {
    // driver-side port of the same consumption loop (the reference's
    // remove-on-match with the deterministic same-pred preference) run
    // GLOBALLY — equality proves the per-(doc, unordered-pair) cogroup
    // decomposition loses no rows and groups the symmetric swaps right
    type R = (String, String, Int, Int)
    def global(keys0: Seq[R], resps: Seq[R],
               sym: Set[String]): (Long, Long, Long, Long) = {
      def gk(t: R) = (t._1, math.min(t._3, t._4), math.max(t._3, t._4))
      val keys = scala.collection.mutable.ArrayBuffer.from(
        keys0.sortBy(t => (gk(t), t._2, t._3, t._4)))
      var c = 0L; var te = 0L; var sp = 0L
      def am(r: R, k: R) = k._1 == r._1 &&
        ((k._3 == r._3 && k._4 == r._4) ||
          (sym(k._2) && k._3 == r._4 && k._4 == r._3))
      resps.sortBy(t => (gk(t), t._2, t._3, t._4)).foreach { r =>
        val same = keys.indexWhere(k => k._2 == r._2 && am(r, k))
        val idx = if (same >= 0) same else keys.indexWhere(k => am(r, k))
        if (idx >= 0) {
          if (keys(idx)._2 == r._2) c += 1 else te += 1
          keys.remove(idx)
        } else sp += 1
      }
      (c, te, sp, keys.length.toLong)
    }
    val rnd = new scala.util.Random(7)
    val preds = Seq("a", "b", "c")
    for (trial <- 1 to 25) {
      val sym: Set[String] = if (trial % 2 == 0) Set("b") else Set.empty
      def row(): (String, String, Int, Int) =
        (s"d${rnd.nextInt(2)}", preds(rnd.nextInt(3)),
          1 + rnd.nextInt(3), 1 + rnd.nextInt(3))
      val keys = Seq.fill(1 + rnd.nextInt(8))(row())
      val resps = Seq.fill(1 + rnd.nextInt(8))(row())
      val ents = (for (d <- 0 to 1; o <- 1 to 3) yield (s"d$d", o))
        .toDF("doc_id", "head_end")
      val got = Export.scoreMentions(ents, ents,
        keys.toDF("doc_id", "pred", "a1_end", "a2_end"),
        resps.toDF("doc_id", "pred", "a1_end", "a2_end"), sym)
        .collect().head
      val (c, te, sp, m) = global(keys, resps, sym)
      val label = s"trial $trial keys=$keys resps=$resps sym=$sym"
      assert(got.getAs[Long]("correct_rels") === c, label)
      assert(got.getAs[Long]("type_errors") === te, label)
      assert(got.getAs[Long]("spurious_rels") === sp, label)
      assert(got.getAs[Long]("missing_rels") === m, label)
      // conservation: every response and every key lands in one bucket
      assert(c + te + sp === resps.length.toLong, label)
      assert(c + te + m === keys.length.toLong, label)
    }
  }
}
