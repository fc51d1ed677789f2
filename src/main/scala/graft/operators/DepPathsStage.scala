package graft.operators

import graft.core._
import graft.functions.Paths
import graft.nlp.Nlp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage: dependency-path mining (the reference's core "query",
  * DepPaths.java:217-414 re-expressed as typed flatMap + hash aggs).
  *
  * Per sentence: guard filters (F1) → mention pairs (F2) → BFS shortest
  * path over transformed arcs (X3) → regularize (F13) + length cutoff
  * (F3) → record instance/typed strings (X4) + linearized repr over the
  * untransformed arcs (X5).
  *
  * Aggregations are plain `groupBy` hash aggs (automatic partial/final);
  * the Zipf-hot typed-path counts additionally go through the salted
  * two-phase helper (north rule).
  */
object DepPathsStage {

  /** Typed-path key rendering with `(1)/(2)` subscripts for same types
    * except OTHER (DepPaths.java:390-393). */
  def typedKey(type1: String, type2: String): (String, String) =
    if (type1 == type2 && type1 != "OTHER") (type1 + "(1)", type2 + "(2)")
    else (type1, type2)

  def instances(docs: Dataset[AnnotatedDoc],
                metrics: Option[graft.sources.StageMetrics] = None)
      : Dataset[PathInstance] = {
    import docs.sparkSession.implicits._
    docs.flatMap { doc =>
      doc.sentences.iterator.zipWithIndex
        .filter { case (s, _) => Paths.sentenceAllowed(s.text) }
        .flatMap { case (sent, si) =>
          val deps = sent.deps.toVector
          val transformed = Nlp.transform(deps)
          val n = sent.tokens.length
          // sentence graphs + blocked mask built once, shared by all
          // mention pairs (the BFS is the pipeline's hottest code)
          val gT = Paths.buildGraph(transformed, n)
          val gO = Paths.buildGraph(deps, n)
          val blocked = new Array[Boolean](n)
          sent.names.foreach(m => if (m.head < n) blocked(m.head) = true)
          val out = Vector.newBuilder[PathInstance]
          // same head < n guard as the mask init above: a mention with
          // an out-of-range head must be skipped, not crash the task
          Paths.mentionPairs(sent.names)
            .filter { case (m1, m2) => m1.head < n && m2.head < n }
            .foreach { case (m1, m2) =>
            blocked(m1.head) = false; blocked(m2.head) = false
            for {
              (tNodes, tLabels) <- Paths.bfsGraph(gT, m1.head, m2.head, blocked)
              (oNodes, oLabels) <- Paths.bfsGraph(gO, m1.head, m2.head, blocked)
              path = Paths.regularize(Paths.pathString(sent, tNodes, tLabels))
              if Paths.arcCount(path) <= Paths.MaxPathArcs
            } {
              val (t1, t2) = typedKey(m1.etype, m2.etype)
              // repr endpoints carry the (1)/(2) subscripts for same-type
              // pairs (DepPathMap reprs do too — that is what swap12
              // seed resolution keys on, DepPathMap.java:115-120)
              val repr = Paths.linearize(sent, oNodes, oLabels, t1, t2)
              out += PathInstance(doc.doc_id, si, t1, t2, m1.surface, m2.surface,
                m1.canonical, m2.canonical, path, repr, sent.text,
                sent.offset + sent.tokens(m1.head).end,
                sent.offset + sent.tokens(m2.head).end)
            }
            blocked(m1.head) = true; blocked(m2.head) = true
          }
          val res = out.result()
          metrics.foreach(_.pathInstances.add(res.length))
          res
        }
    }
  }

  /** `paths` table: instance counts + deterministic first example
    * (A1/A2; "first wins" replaced by min for order-independence at any
    * parallelism — SURVEY §7 risk 5). */
  def pathsTable(inst: Dataset[PathInstance]): DataFrame =
    inst.groupBy(col("arg1"), col("path"), col("arg2"))
      .agg(count(lit(1)).as("cnt"), min(col("example")).as("example"))

  /** `path_types` table via salted two-phase aggregation — predicate
    * frequencies are Zipf-skewed, so the single-key groupBy would put
    * half the rows in one reducer at scale. */
  def pathTypesTable(inst: Dataset[PathInstance]): DataFrame =
    // deterministic salt from the instance's row identity (doc, sentence,
    // args): retry-safe on a cluster, and a Zipf-hot path key still
    // spreads because its instances differ in (doc_id, sentIdx, args)
    graft.functions.Salting.saltedCount(
      inst.toDF(), Seq("type1", "path", "type2"), saltBuckets = 32,
      uniqueKeys = Seq("doc_id", "sentIdx", "arg1", "arg2"))

  /** `path_ngrams` table (X4 ngram-event emission): counts of the
    * overlapping label:word:label trigrams per path — training pairs
    * for path embeddings (DepPaths.java:399-409). */
  def pathNgramsTable(inst: Dataset[PathInstance]): DataFrame = {
    import inst.sparkSession.implicits._
    inst.flatMap(i => Paths.pathTrigrams(i.path).map(t => (i.path, t)))
      .toDF("path", "context")
      .groupBy(col("path"), col("context"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** `path_repr` table: one repr + example per typed path; merge prefers
    * the shorter repr (IceCLI.java:656-665) with a total tiebreak. */
  def pathReprTable(inst: Dataset[PathInstance]): DataFrame =
    inst.groupBy(col("type1"), col("path"), col("type2"))
      .agg(min(struct(length(col("repr")).as("l"), col("repr").as("r")))
             .getField("r").as("repr"),
           min(col("example")).as("example"))
}
