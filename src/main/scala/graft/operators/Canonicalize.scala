package graft.operators

import graft.core.{CanonTriple, Triple}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage: entity canonicalization via iterative connected components
  * over mention-alias edges (north rule; SURVEY.md §7 stage 9).
  *
  * The CC loop is the alternating large-star/small-star DataFrame
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SOCC'14): each iteration attaches every node to the minimum
  * id in its neighborhood; `localCheckpoint` every iteration truncates
  * lineage so the plan doesn't grow unboundedly. Converges in
  * O(log diameter) rounds — alias chains here are short, so 2-3 rounds.
  */
object Canonicalize {

  /** Connected components over an undirected edge list `(src, dst)`.
    * Returns `(id, component)` where component = min member id
    * (lexicographic for strings). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    // checkpointed once: the loop below re-reads the edge set every
    // iteration, and without truncation it would drag the (possibly
    // expensive) upstream plan along each time. ONE scan of the edge
    // plan (explode of the four directed/self variants), not a 4-way
    // union that re-executes the upstream edge pipeline once per leg.
    val sym = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")),
        struct(col("src"), col("src").as("dst")),
        struct(col("dst").as("src"), col("dst").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint()
    // labels: node -> current component candidate (min neighbor incl.
    // self). LAZY checkpoint: iteration 1 references labels three times
    // (both propagate legs + the merge) — the shared underlying RDD is
    // computed once inside that first job and the eager init job the
    // old shape paid is gone.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("comp"))
      .localCheckpoint(eager = false)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // propagate: node's new comp = min over (own comp, neighbors'
      // comps, comp's comp). The comp-of-comp leg is pointer doubling —
      // a chain of length d converges in O(log d) rounds instead of
      // O(d), which is what makes the O(log diameter) bound real (the
      // neighbor leg alone advances one hop per round). Every comp
      // value is itself a node id, so the self-join always resolves.
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("new_comp"))
      val viaComp = labels
        .join(labels.select(col("id").as("comp"), col("comp").as("cc")),
          Seq("comp"))
        .select(col("id"), col("cc"))
      // LAZY checkpoint + one aggregation action: the agg computes every
      // partition, which materializes the checkpoint as a side effect —
      // one job per iteration where the eager-checkpoint-then-count
      // shape paid two (the convergence flag rides in the same pass)
      val next = labels
        .join(viaNeighbors, Seq("id"), "left")
        .join(viaComp, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("new_comp"), col("comp")),
            coalesce(col("cc"), col("comp"))).as("new_c"),
          col("comp").as("old_c"))
        .select(col("id"), col("new_c").as("comp"),
          (col("new_c") < col("old_c")).cast("long").as("chg"))
        .localCheckpoint(eager = false)
      changed = next.agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0)
      labels = next.drop("chg")
      iter += 1
    }
    labels
  }

  /** Alias edges from triple argument surfaces: an edge between a
    * surface and its gazetteer-canonical form (J5 broadcast dictionary)
    * plus trivial self edges; extend here with fuzzier alias sources
    * (shared head, normalized surface) as they come online. */
  def aliasEdges(triples: Dataset[Triple],
                 gazetteer: Map[String, String]): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val gaz = broadcast(gazetteer.toSeq.toDF("surface", "canon"))
    val surfaces = triples.toDF()
      .select(explode(array(col("subj"), col("obj"))).as("surface"))
      .distinct()
    surfaces.join(gaz, Seq("surface"), "left")
      .select(col("surface").as("src"),
        coalesce(col("canon"), col("surface")).as("dst"))
  }

  /** Rewrite triples with canonical entity ids. The CC label (component
    * minimum) is only a stable component id, not a semantic choice: the
    * representative written into the triples is the component's
    * gazetteer-CANONICAL member when one exists (min of them if several
    * aliases chains merged), falling back to the component min for
    * components the gazetteer doesn't know. This keeps the output
    * correct for gazetteers where an alias sorts before its canonical
    * form ("NYC" < "New York City"). */
  /** @param materialized pass true when `triples` is already a committed
    *   table scan (cheap to re-read) — skips the localCheckpoint that is
    *   otherwise needed to avoid recomputing the whole extraction chain
    *   on both sides of the component join (and to avoid a Spark codegen
    *   fault when the same object-typed subplan appears twice in one
    *   physical plan). */
  def canonicalTriples(triples: Dataset[Triple],
                       gazetteer: Map[String, String],
                       materialized: Boolean = false): Dataset[CanonTriple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val tri = if (materialized) triples.toDF() else triples.toDF().localCheckpoint()
    val rawComps = connectedComponents(
      aliasEdges(tri.as[Triple], gazetteer))
    // remap each component id to its semantic representative
    val canonDf = broadcast(gazetteer.values.toSeq.distinct.toDF("id")
      .withColumn("is_canon", lit(true)))
    val reps = rawComps.join(canonDf, Seq("id"), "left")
      .groupBy(col("comp"))
      .agg(min(when(col("is_canon"), col("id"))).as("canon_rep"),
        min(col("id")).as("min_rep"))
      .select(col("comp"), coalesce(col("canon_rep"), col("min_rep")).as("rep"))
    val comps = rawComps.join(reps, Seq("comp"))
      .select(col("id"), col("rep").as("comp"))
    val bySubj = comps.select(col("id").as("subj"), col("comp").as("canonical_subj"))
    val byObj = comps.select(col("id").as("obj"), col("comp").as("canonical_obj"))
    // no broadcast hint: the surface dictionary is small here but can be
    // arbitrarily large at 100 TB — let AQE pick broadcast vs shuffle join
    tri
      .join(bySubj, Seq("subj"), "left")
      .join(byObj, Seq("obj"), "left")
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        coalesce(col("canonical_subj"), col("subj")).as("canonical_subj"),
        coalesce(col("canonical_obj"), col("obj")).as("canonical_obj"))
      .as[CanonTriple]
  }
}
