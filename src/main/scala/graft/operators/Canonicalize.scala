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
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .union(edges.select(col("src"), col("src").as("dst")))
      .union(edges.select(col("dst").as("src"), col("dst")))
      .distinct()
    // labels: node -> current component candidate (min neighbor incl. self)
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("comp"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // propagate: node's new comp = min over neighbors' comps and own
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("new_comp"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("new_comp"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("id"))
        .filter(col("comp") =!= col("old")).count()
      labels = next
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

  /** Rewrite triples with canonical entity ids (component minimum —
    * canonical forms sort before their aliases by construction). */
  def canonicalTriples(triples: Dataset[Triple],
                       gazetteer: Map[String, String]): Dataset[CanonTriple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    // Materialize the triple table once before reusing it on both sides
    // of the component join (in the full pipeline this is the committed
    // `triples` snapshot). Also works around a Spark codegen fault when
    // the same object-typed (Dataset-map) subplan appears twice in one
    // physical plan.
    val tri = triples.toDF().localCheckpoint()
    val comps = connectedComponents(
      aliasEdges(tri.as[Triple], gazetteer))
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
