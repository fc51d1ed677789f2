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
}
