package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage: event (tree) bootstrap — the second bootstrap flavor
  * (events/EventBootstrap.java:44-484), mirroring the relation
  * bootstrap but over verb-headed trees:
  *
  *  - seed instances = trees with a seed trigger AND the seed's
  *    argument types (EventBootstrap.java:306-331)
  *  - candidates = trees sharing an (nsubj, dobj) value pair with a
  *    seed instance, keyed by their type signature
  *    (EventBootstrap.java:338-370 — argPair())
  *  - sharedCount = #distinct shared pairs; totalCount = #distinct
  *    pairs for the candidate's TRIGGER (EventBootstrap.java:377-390)
  *  - score = shared/total * shared/(shared+1)
  *    (EventBootstrap.java:391-394)
  *  - filter: drop seeds/rejects, score >= 0.05, dedupe by repr, cap
  *    100 (EventBootstrap.java:44-53,258-283)
  *
  * Join shape at scale: identical to the relation bootstrap — the seed
  * pair set is the small output of a trigger+type filter, broadcast
  * against the full event table on `arg_pair`; no self-join.
  */
object EventBootstrapStage {

  val MaxBootstrappedEvents = 100
  val MinBootstrapScore = 0.05

  /** Flat join view of the event table: one row per tree with its type
    * key, trigger, and (nsubj, dobj) value pair. */
  def eventPairs(ev: Dataset[EventRow]): DataFrame = {
    import ev.sparkSession.implicits._
    // tuple key, not a separator concat: argument values are arbitrary
    // text, so "a:::b" would collide distinct pairs whose surfaces
    // contain the separator (same reasoning as BootstrapStage's struct
    // key); only distinct COUNTS of the pairs cross to the oracle
    ev.flatMap { e =>
      for {
        s <- e.args.find(_.role == "nsubj")
        o <- e.args.find(_.role == "dobj")
      } yield (e.key, e.trigger, (s.value, o.value),
        s.etype, o.etype)
    }.toDF("key", "trigger", "arg_pair", "type1", "type2")
  }

  /** Candidate tree scores from shared argument pairs. Seeds are given
    * as (trigger, nsubj type, dobj type) — the resolved form of the
    * reference's seed trees after clearArgValues(). */
  def sharedArgScores(ev: Dataset[EventRow],
                      seedTriggers: Set[String],
                      seedType1: String, seedType2: String,
                      rejectKeys: Set[String] = Set.empty): DataFrame = {
    // persisted: the pair view feeds four consumers (seed pairs, seed
    // keys, per-trigger totals, the shared join) — without it the whole
    // NLP + tree-extraction chain upstream runs once per consumer.
    // Released by the caller's clearCache, like every per-query cache.
    val df = eventPairs(ev).persist()
    val seedInst = df.filter(col("trigger").isin(seedTriggers.toSeq: _*) &&
      col("type1") === seedType1 && col("type2") === seedType2)
    val seedPairs = seedInst.select(col("arg_pair")).distinct()
    val seedKeys = seedInst.select(col("key")).distinct()
    // totalCount: #distinct arg pairs per TRIGGER (EventBootstrap.java:384-389)
    val totals = df.groupBy(col("trigger"))
      .agg(countDistinct(col("arg_pair")).as("total_count"))
    val shared = df.join(broadcast(seedPairs), Seq("arg_pair"))
      .groupBy(col("key"), col("trigger"))
      .agg(countDistinct(col("arg_pair")).as("shared"))
    shared
      .join(seedKeys, Seq("key"), "left_anti")
      .filter(if (rejectKeys.isEmpty) lit(true)
              else !col("key").isin(rejectKeys.toSeq: _*))
      .join(broadcast(totals), Seq("trigger"))
      .withColumn("score", graft.functions.Quantize.q6(
        col("shared").cast("double") / col("total_count") *
          col("shared") / (col("shared") + lit(1))))
      .select(col("key"), col("trigger"), col("shared"),
        col("total_count"), col("score"))
  }

  /** Rank candidates: floor the score, dedupe by repr keeping the
    * best-scored key (the reference's existingReprs fold,
    * EventBootstrap.java:264-283), cap the list. */
  def candidates(scores: DataFrame, reprTable: DataFrame,
                 cap: Int = MaxBootstrappedEvents): DataFrame = {
    val w = Window.partitionBy(col("repr"))
      .orderBy(desc("score"), asc("key"))
    scores.join(reprTable.select(col("key"), col("repr")), Seq("key"))
      .filter(col("score") >= MinBootstrapScore)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(desc("score"), asc("key"))
      .limit(cap)
  }

  /** One bootstrap iteration (the GUI Iterate fold,
    * EventBootstrap.java:211-222): approved keys join the seed side as
    * extra triggers' instances are already covered by seed pairs;
    * rejected keys are excluded from the next candidate list. */
  def iterate(ev: Dataset[EventRow], reprTable: DataFrame,
              seedTriggers: Set[String], seedType1: String, seedType2: String,
              rejectKeys: Set[String],
              cap: Int = MaxBootstrappedEvents): DataFrame =
    candidates(
      sharedArgScores(ev, seedTriggers, seedType1, seedType2, rejectKeys),
      reprTable, cap)

  /** Tree similarity (WordEmbedding.java:139-154): equally weighted
    * trigger similarity and role-matched argument-type similarity,
    * normalized by the smaller argument count. `wordSim` defaults to
    * exact match (1.0 iff equalsIgnoreCase — WordEmbedding.java:107-111
    * behavior with no embeddings loaded).
    *
    * Reference-faithful quirk (kept deliberately, like the illions
    * parity note): the argument term sums over ALL role-matched cross
    * pairs but divides by min(|args1|,|args2|), so trees with a
    * duplicated role label can score above 1.0 — the reference's
    * treeSimilarity has exactly this property
    * (WordEmbedding.java:145-152). */
  def treeSimilarity(trig1: String, args1: Seq[EventArg],
                     trig2: String, args2: Seq[EventArg],
                     wordSim: (String, String) => Double =
                       (a, b) => if (a.equalsIgnoreCase(b)) 1.0 else 0.0): Double = {
    val minArgs = math.min(args1.size, args2.size)
    if (minArgs == 0) return wordSim(trig1, trig2) / 2
    var argSim = 0.0
    for (a <- args1; b <- args2 if a.role == b.role)
      argSim += wordSim(a.etype, b.etype)
    (wordSim(trig1, trig2) + argSim / minArgs) / 2
  }

  /** Embedding-flavored scoring (EventBootstrap.java:418-460): tree
    * embedding = sum of word vectors of trigger + arg values; score =
    * cosine(seed centroid, candidate) * count/(count+1). The embedding
    * map is broadcast; scoring is a narrow map over the type table. */
  def embeddingScores(eventTypes: DataFrame,
                      seeds: Seq[(String, Seq[String])],
                      embedding: Map[String, Array[Double]]): DataFrame = {
    val spark = eventTypes.sparkSession
    val dim = embedding.headOption.map(_._2.length).getOrElse(0)
    def vecOf(words: Seq[String]): Array[Double] = {
      val v = new Array[Double](dim)
      words.foreach { w =>
        embedding.get(w.toLowerCase).foreach { e =>
          var i = 0; while (i < dim) { v(i) += e(i); i += 1 }
        }
      }
      v
    }
    val centroid = {
      val c = new Array[Double](dim)
      seeds.foreach { case (trig, argWords) =>
        val v = vecOf(trig +: argWords)
        var i = 0; while (i < dim) { c(i) += v(i); i += 1 }
      }
      c
    }
    val bcE = spark.sparkContext.broadcast(embedding)
    val bcC = spark.sparkContext.broadcast(centroid)
    val score = udf { (key: String, cnt: Long) =>
      val e = bcE.value
      val c = bcC.value
      val v = new Array[Double](c.length)
      // key = "trigger role:val role:val ..." — embed trigger + values
      key.split("\\s+").foreach { part =>
        val w = part.substring(part.indexOf(':') + 1).toLowerCase
        e.get(w).foreach { x =>
          var i = 0; while (i < v.length) { v(i) += x(i); i += 1 }
        }
      }
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) { d += c(i) * v(i); na += c(i) * c(i); nb += v(i) * v(i); i += 1 }
      val cos = if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na) / math.sqrt(nb)
      graft.functions.Quantize.q6(cos * cnt.toDouble / (cnt + 1))
    }
    eventTypes.withColumn("score", score(col("key"), col("cnt")))
  }
}
