package graft.functions

/** Driver-local entity-set expansion helpers (SURVEY.md §2.4 A13/A14).
  * Both operate on at most a few hundred collected rows (the reference
  * caps recommendation input at 20 terms and MIRA training at the
  * collected index), so they are deliberately NOT distributed — the
  * distributed part is producing their inputs (EntitySetStage).
  *
  * Behavior re-expressed from scratch from the reference, with
  * DOCUMENTED DEVIATIONS (deliberate simplifications, not oversights):
  *  - seed recommendation (entityset/EntitySetExpander.java:61-217,
  *    515-617): same shape (agglomerative clustering under a
  *    gravitation affinity, capped input, best-cluster output) but the
  *    distance here is r = 1 - cosine rather than the reference's
  *    (|a||b|)/(dot+eps), and the winning cluster is picked by max
  *    member score rather than sum-score ordering. Both choices keep
  *    the affinity scale-free and the output deterministic; on the
  *    fixture corpora they select the same clusters (ExpandersSpec).
  *  - MIRA expander (entityset/MIRAEntitySetExpander.java:23-144):
  *    margin-1 hinge update with aggressiveness cap `c` and final
  *    weights, vs the reference's misclassification-only update with
  *    tau in [0,1], L1-normalized features and epoch-averaged weights —
  *    i.e. this is the textbook PA-I/MIRA variant rather than the
  *    reference's bespoke one. Epoch count (50) and deterministic
  *    visit order match the reference.
  */
object Expanders {

  final case class ScoredTerm(term: String, score: Double,
                              features: Map[String, Double])

  private def centroid(ts: Seq[ScoredTerm]): Map[String, Double] = {
    val sum = ts.foldLeft(Map.empty[String, Double]) { (acc, t) =>
      t.features.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0.0) + v) }
    }
    sum.map { case (k, v) => k -> v / ts.size }
  }

  def cosine(a: Map[String, Double], b: Map[String, Double]): Double = {
    val dot = a.iterator.map { case (k, v) => v * b.getOrElse(k, 0.0) }.sum
    val na = math.sqrt(a.valuesIterator.map(v => v * v).sum)
    val nb = math.sqrt(b.valuesIterator.map(v => v * v).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  /** A13: recommend a seed set by agglomerative clustering of the top
    * terms (reference caps input at 20). Affinity between clusters is
    * gravitational — product of the clusters' max term scores over the
    * squared centroid distance — and merging stops when the best cluster
    * exceeds `maxClusterSize` members or fewer than `minClusters`
    * clusters remain. Returns the members of the highest-mass cluster,
    * deterministically ordered (score desc, term asc). */
  def recommendSeeds(terms: Seq[ScoredTerm], top: Int = 20,
                     maxClusterSize: Int = 4, minClusters: Int = 3): Seq[String] = {
    val pool = terms.sortBy(t => (-t.score, t.term)).take(top)
    if (pool.isEmpty) return Nil
    var clusters: Vector[Vector[ScoredTerm]] = pool.map(Vector(_)).toVector
    var done = false
    // stop when the best cluster would exceed maxClusterSize members or
    // fewer than minClusters clusters remain (merging continues at exactly
    // minClusters — the guard is "< minClusters", not "==")
    while (!done && clusters.length >= minClusters) {
      // gravitation g = maxScore(c1) * maxScore(c2) / r^2, r = 1 - cosine.
      // The cosine is quantized to 6 dp BEFORE entering r: centroid sums
      // run in engine-specific order, and the quantization absorbs the
      // ULP noise so an independent engine (the DuckDB gate oracle)
      // recomputing the same merges compares identical doubles. The
      // quantizer is the engine-portable floor(x·1e6 + 0.5)/1e6 (see
      // TextAnalysis.qualityCol), NOT round(): the argmax below cuts on
      // this value, and a round()-tie flip between engines would change
      // WHICH pair merges — cascading through every later merge step.
      var best = (-1, -1, -1.0)
      for (i <- clusters.indices; j <- (i + 1) until clusters.length) {
        val cos6 =
          Quantize.q6(cosine(centroid(clusters(i)), centroid(clusters(j))))
        val r = 1.0 - cos6 + 1e-9
        val g = clusters(i).map(_.score).max * clusters(j).map(_.score).max / (r * r)
        if (g > best._3) best = (i, j, g)
      }
      val (i, j, _) = best
      val merged = clusters(i) ++ clusters(j)
      if (merged.length > maxClusterSize) done = true
      else clusters = clusters.updated(i, merged).patch(j, Nil, 1)
    }
    val bestCluster = clusters.maxBy(c => (c.map(_.score).max, -c.head.term.length))
    bestCluster.sortBy(t => (-t.score, t.term)).map(_.term)
  }

  /** A14: binary MIRA (margin-infused relaxed algorithm) over sparse
    * feature vectors; 50 epochs as in the reference, aggressiveness
    * capped at `c`. Returns the learned weight vector; score a candidate
    * with `dot(w, features)`. Deterministic: examples are visited in the
    * given order every epoch (no shuffling RNG). */
  def miraTrain(examples: Seq[(Map[String, Double], Boolean)],
                epochs: Int = 50, c: Double = 0.5): Map[String, Double] = {
    var w = Map.empty[String, Double]
    def dot(x: Map[String, Double]): Double =
      x.iterator.map { case (k, v) => v * w.getOrElse(k, 0.0) }.sum
    var e = 0
    while (e < epochs) {
      examples.foreach { case (x, label) =>
        val y = if (label) 1.0 else -1.0
        val loss = math.max(0.0, 1.0 - y * dot(x))
        if (loss > 0) {
          val nrm2 = x.valuesIterator.map(v => v * v).sum
          if (nrm2 > 0) {
            val tau = math.min(c, loss / nrm2)
            w = x.foldLeft(w) { case (acc, (k, v)) =>
              acc.updated(k, acc.getOrElse(k, 0.0) + tau * y * v)
            }
          }
        }
      }
      e += 1
    }
    w
  }

  def miraScore(w: Map[String, Double], x: Map[String, Double]): Double =
    x.iterator.map { case (k, v) => v * w.getOrElse(k, 0.0) }.sum

  /** O5: argmin character-edit-distance repr lookup
    * (DepPathMap.java:241-302) — resolve a user phrase to the closest
    * known repr when no exact match exists; ties break lexicographically. */
  def closestRepr(query: String, reprs: Seq[String]): Option[String] = {
    val q = Paths.normalizeRepr(query)
    reprs.map(r => (Paths.editDistance(q, Paths.normalizeRepr(r)), r))
      .minByOption(t => (t._1, t._2)).map(_._2)
  }

  /** Grid-search tuning of the soft-matcher costs (the tagger's `train`
    * mode, RelaxedDepPathRelationTagger.java:203-241): sweep
    * replace/insert/delete over {0.2..1.2} against a scoring callback
    * (F1 on a dev set) and return the best cost triple; ties break on
    * the smaller tuple so results are order-independent. */
  def tuneCosts(score: Paths.MatchCosts => Double,
                grid: Seq[Double] = Seq(0.2, 0.4, 0.6, 0.8, 1.0, 1.2))
      : (Paths.MatchCosts, Double) = {
    val all = for (r <- grid; i <- grid; d <- grid)
      yield Paths.MatchCosts(r, i, d)
    all.map(cst => (cst, score(cst)))
      .maxBy { case (cst, s) => (s, -cst.replace, -cst.insert, -cst.delete) }
  }
}
