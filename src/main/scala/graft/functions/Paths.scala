package graft.functions

import graft.core.{Dep, Name, Sentence}
import graft.nlp.Nlp

import scala.collection.mutable

/** Lexicalized dependency-path machinery: BFS shortest path, quantifier
  * regularization, linearization, and the weighted path edit-distance
  * matcher. Pure functions — invoked from typed flatMap on executors.
  *
  * References (behavior only, re-expressed from scratch):
  *  - BFS + disallowed labels: DepPaths.java:112-123,429-474
  *  - path string form `label1:word1:...:labelk`: DepPath.java:156-185
  *  - quantifier regularization: DepPathRegularizer.java:22-73
  *  - linearization + transcriptions: DepPath.java:196-311
  *  - weighted edit distance: PathMatcher.java:16-110
  */
object Paths {

  /** Labels the BFS never traverses (F4, DepPaths.java:112-123). */
  private val disallowed: Set[String] = {
    val base = Set("advcl", "rcmod", "mod", "conj")
    base ++ base.map(_ + "-1")
  }

  /** Max arcs in a regularized path (F3, DepPaths.java:364-366). */
  val MaxPathArcs = 5
  /** Mention-pair window (DepPaths.java:80-82,103). */
  val MaxInterveningMentions = 3
  val MaxMentionsPerSentence = 50
  /** Sentence guards (F1, DepPaths.java:72,300-309). */
  val MaxSentenceChars = 600

  def sentenceAllowed(text: String): Boolean =
    text.length <= MaxSentenceChars &&
      !text.exists(c => "()[]{}\"".contains(c))

  /** Sentence-local dependency graph in flat int-indexed form: arcs +
    * inverses (`label-1`, DepPaths.java:250-251) grouped by source node.
    * Built ONCE per sentence and reused across all mention pairs — the
    * BFS below is the pipeline's hottest code (millions of calls per
    * partition), so it runs on primitive arrays with no per-call
    * allocation beyond the result. */
  final class SentGraph(val n: Int, deps: Seq[Dep]) {
    // CSR-style adjacency: offsets(v) .. offsets(v+1) index into to/label
    val (offsets, to, label) = {
      val cnt = new Array[Int](n + 1)
      deps.foreach { d =>
        if (d.srcPos < n && d.tgtPos < n) {
          if (!disallowed(d.dep)) cnt(d.srcPos) += 1
          if (!disallowed(d.dep + "-1")) cnt(d.tgtPos) += 1
        }
      }
      val off = new Array[Int](n + 1)
      var i = 0
      while (i < n) { off(i + 1) = off(i) + cnt(i); i += 1 }
      val pos = off.clone()
      val t = new Array[Int](off(n))
      val l = new Array[String](off(n))
      deps.foreach { d =>
        if (d.srcPos < n && d.tgtPos < n) {
          if (!disallowed(d.dep)) {
            t(pos(d.srcPos)) = d.tgtPos; l(pos(d.srcPos)) = d.dep
            pos(d.srcPos) += 1
          }
          if (!disallowed(d.dep + "-1")) {
            t(pos(d.tgtPos)) = d.srcPos; l(pos(d.tgtPos)) = d.dep + "-1"
            pos(d.tgtPos) += 1
          }
        }
      }
      (off, t, l)
    }
  }

  def buildGraph(deps: Seq[Dep], nTokens: Int): SentGraph =
    new SentGraph(nTokens, deps)

  /** Shortest dependency path from token `from` to token `to` over a
    * prebuilt sentence graph, avoiding the head tokens of other mentions
    * (`blocked`, indexed by token). Array-based BFS: queue, seen and
    * parent pointers are primitive arrays sized to the sentence. */
  def bfsGraph(g: SentGraph, from: Int, to: Int, blocked: Array[Boolean])
      : Option[(Vector[Int], Vector[String])] = {
    if (from == to || from >= g.n || to >= g.n) return None
    val prevNode = new Array[Int](g.n)
    val prevEdge = new Array[Int](g.n)
    val seen = new Array[Boolean](g.n)
    val queue = new Array[Int](g.n)
    var qh = 0; var qt = 0
    seen(from) = true
    queue(qt) = from; qt += 1
    var found = false
    while (qh < qt && !found) {
      val v = queue(qh); qh += 1
      var e = g.offsets(v)
      val end = g.offsets(v + 1)
      while (e < end && !found) {
        val w = g.to(e)
        if (!seen(w) && (w == to || !blocked(w))) {
          seen(w) = true
          prevNode(w) = v
          prevEdge(w) = e
          if (w == to) found = true
          else { queue(qt) = w; qt += 1 }
        }
        e += 1
      }
    }
    if (!found) None
    else {
      var nodes = List(to)
      var labels = List.empty[String]
      while (nodes.head != from) {
        val h = nodes.head
        labels = g.label(prevEdge(h)) :: labels
        nodes = prevNode(h) :: nodes
      }
      Some((nodes.toVector, labels.toVector))
    }
  }

  /** Convenience single-shot BFS (tests, non-hot callers): builds the
    * sentence graph and a blocked array, then delegates to [[bfsGraph]]. */
  def bfs(deps: Seq[Dep], from: Int, to: Int, blocked: Set[Int])
      : Option[(Vector[Int], Vector[String])] = {
    val n = (deps.iterator.flatMap(d => Iterator(d.srcPos, d.tgtPos)) ++
      Iterator(from, to)).max + 1
    val blockedArr = new Array[Boolean](n)
    blocked.foreach(b => if (b < n) blockedArr(b) = true)
    bfsGraph(buildGraph(deps, n), from, to, blockedArr)
  }

  /** Render the path string `label1:word1:label2:word2:...:labelk` with
    * intermediate node words lemmatized (DepPath.java:156-185 +
    * lemmatizePath). */
  def pathString(sentence: Sentence, nodes: Vector[Int],
                 labels: Vector[String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < labels.length) {
      if (i > 0) sb.append(':')
      sb.append(labels(i))
      if (i < labels.length - 1) {
        val tok = sentence.tokens(nodes(i + 1))
        // verbs get the rule-based inflection fallback so non-lexicon
        // verbs don't split path counts across surface forms
        sb.append(':').append(
          if (tok.pos.startsWith("VB")) Nlp.lemmaVerb(tok.word)
          else Nlp.lemma(tok.word))
      }
      i += 1
    }
    sb.toString
  }

  /** Quantifier regularization (F13, DepPathRegularizer.java:22-73):
    * collapse `X:prep:of:pobj`-style quantifier hops (`Q of Y` → `Y`). */
  private val quantifiers = Set("pound", "kilo", "ton", "amount", "number",
    "dozen", "hundred", "thousand", "million", "lot", "group", "series")

  def regularize(path: String): String = {
    // fast path: the quantifier pattern requires a ":prep:of:pobj" hop —
    // absent (the overwhelmingly common case) the path is unchanged, so
    // skip the split + rebuild entirely
    if (!path.contains(":prep:of:pobj")) return path
    val segs = path.split(':')
    // pattern ... q(prep)(of)(pobj) ... : drop "q:prep:of:pobj" -> direct hop
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < segs.length) {
      if (i + 4 < segs.length && quantifiers(segs(i + 1)) &&
          segs(i + 2) == "prep" && segs(i + 3) == "of" && segs(i + 4) == "pobj") {
        out += segs(i) // keep the incoming label, skip quantifier + of hop
        i += 5
      } else { out += segs(i); i += 1 }
    }
    out.mkString(":")
  }

  def arcCount(path: String): Int = {
    // segments = colons + 1 (a path never ends in ':'); avoid the split
    var colons = 0
    var i = 0
    while (i < path.length) { if (path.charAt(i) == ':') colons += 1; i += 1 }
    (colons + 2) / 2
  }

  /** Label transcriptions used during linearization
    * (DepPath.java:196-311). */
  private val transcriptions = Map("appos" -> ",", "poss" -> "'s",
    "conj" -> "and", "infmod" -> "to", "purpcl" -> "to")

  /** Linearize a path into an English-ish repr: path nodes in sentence
    * order, endpoints replaced by their entity types, transcribed labels
    * inserted, off-path verb arguments rendered as `STH` placeholders
    * (X5, DepPath.java:325-353 addVerbDependents — a verb on the path
    * whose dobj/nsubj/iobj dependent is NOT on the path contributes the
    * placeholder at that dependent's sentence position), adjacent
    * duplicates dropped; lowercased per DepPathMap.normalizeRepr
    * (DepPathMap.java:231-234). */
  def linearize(sentence: Sentence, nodes: Vector[Int],
                labels: Vector[String], type1: String, type2: String): String = {
    // allocation-light rewrite of: endpoints replace head/last node
    // words, off-path STH dependents of on-path verbs merge in sentence
    // order, transcribed labels append, adjacent duplicates drop,
    // normalize. Runs once per mined instance — identical output to the
    // original Map/Set/fold version (guarded by the repr oracles).
    val first = nodes.head
    val last = nodes.last
    // (position, word) pairs: path nodes + STH placeholders
    val pos = new scala.collection.mutable.ArrayBuffer[Int](nodes.length + 2)
    val word = new scala.collection.mutable.ArrayBuffer[String](nodes.length + 2)
    nodes.foreach { n =>
      pos += n
      word += (if (n == first) type1 else if (n == last) type2
               else sentence.tokens(n).word)
    }
    def onPath(p: Int): Boolean = nodes.contains(p)
    nodes.foreach { n =>
      if (sentence.tokens(n).pos.startsWith("VB")) {
        sentence.deps.foreach { d =>
          if (d.srcPos == n &&
              (d.dep == "dobj" || d.dep == "nsubj" || d.dep == "iobj") &&
              !onPath(d.tgtPos) && !pos.contains(d.tgtPos)) {
            pos += d.tgtPos
            word += "STH"
          }
        }
      }
    }
    // insertion sort by position (tiny arrays; stable — path nodes were
    // appended before STH entries, matching the original sortBy)
    var i = 1
    while (i < pos.length) {
      val p = pos(i); val w = word(i)
      var j = i - 1
      while (j >= 0 && pos(j) > p) {
        pos(j + 1) = pos(j); word(j + 1) = word(j); j -= 1
      }
      pos(j + 1) = p; word(j + 1) = w
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    var prev: String = null
    def add(w: String): Unit = {
      if (w != prev) {
        if (sb.length > 0) sb.append(' ')
        sb.append(w)
        prev = w
      }
    }
    i = 0
    while (i < word.length) { add(word(i)); i += 1 }
    labels.foreach { l =>
      val base = if (l.endsWith("-1")) l.substring(0, l.length - 2) else l
      transcriptions.get(base).foreach(add)
    }
    normalizeRepr(sb.toString)
  }

  /** X4 ngram events (DepPaths.java:399-409): overlapping
    * `label:word:label` trigrams of a regularized path — the contexts
    * used to train path embeddings. */
  def pathTrigrams(path: String): Seq[String] = {
    val segs = path.split(':')
    if (segs.length % 2 == 0) Nil
    else (0 until segs.length - 2 by 2)
      .map(i => s"${segs(i)}:${segs(i + 1)}:${segs(i + 2)}")
  }

  /** lowercase + collapse whitespace (F15, DepPathMap.java:231-234) —
    * but keep type placeholders distinguishable by uppercasing them at
    * lookup time instead; reprs compare case-insensitively. */
  def normalizeRepr(repr: String): String = {
    // single-pass lowercase + whitespace collapse + trim (this runs once
    // per mined instance — the regex replaceAll version was a measurable
    // slice of the extraction hot loop)
    val n = repr.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = repr.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  /** Swap `(1)`/`(2)` subscripts for symmetric-type paths (F16,
    * DepPathMap.java:115-120). */
  def swap12(s: String): String =
    s.replace("(1)", "()").replace("(2)", "(1)").replace("()", "(2)")

  /** Path simplification applied by the tagger before matching (F14,
    * RelaxedDepPathRelationTagger.java:85-91). Inert in this pipeline's
    * own flow — `Nlp.transform` already drops every vch arc before path
    * mining, so no mined candidate contains `:vch:` — but kept (like
    * the reference keeps it) as the safety net for externally-supplied
    * rule paths that still carry verb-chain hops. */
  def simplifyForTagging(path: String): String =
    path.replace("would:vch:", "").replace("be:vch:", "").replace("were:vch:", "")

  // --- weighted path edit distance (soft matcher, PathMatcher.java) -------

  final case class MatchCosts(replace: Double, insert: Double, delete: Double)
  /** Production decode costs (RelaxedDepPathRelationTagger.java:244). */
  val DefaultCosts: MatchCosts = MatchCosts(0.8, 0.3, 1.2)
  val MatchThreshold = 0.5
  val NegDiscount = 0.8

  // The preps_of/preps_with entries are reference-faithful dead weight:
  // they appear ONLY in PathMatcher's table (PathMatcher.java:32-33) —
  // no reference component ever emits a "preps_*" label, and this
  // pipeline's uncollapsed "prep:of:pobj" segments don't match them
  // either. Kept verbatim for parity with the cited table.
  private val labelWeights = Map("nsubj-1" -> 1.5, "dobj-1" -> 1.5,
    "nsubj" -> 1.0, "dobj" -> 0.5, "preps_of" -> 0.2, "preps_with" -> 0.2)
  private val LabelMismatchPenalty = 2.5

  private def nodeWeight(n: String): Double = labelWeights.getOrElse(n, 1.0)

  /** Label-node detection by CONTENT (PathMatcher.java:73-78 penalizes
    * substitutions involving dependency labels): known dep labels (with
    * or without `-1`) and the composite endpoint nodes (`TYPE--label`).
    * Index parity is NOT sufficient — a cross-parity alignment would
    * otherwise let a label substitute against a word at word cost. */
  private val depLabelSet = Set("nsubj", "dobj", "iobj", "pobj", "prep",
    "det", "nn", "vch", "appos", "poss", "conj", "infmod", "purpcl",
    "rcmod", "advcl", "mod", "amod")
  private def isLabelNode(n: String): Boolean =
    n.contains("--") || depLabelSet(n.stripSuffix("-1"))

  /** Generalized weighted edit distance over `:`-split path nodes
    * (PathMatcher.java:16-110). Word-similarity hook defaults to exact
    * match (sim = 1.0 iff equal). */
  def pathEditDistance(a: String, b: String, c: MatchCosts = DefaultCosts,
                       wordSim: (String, String) => Double =
                         (x, y) => if (x == y) 1.0 else 0.0): Double = {
    val xs = a.split(':')
    val ys = b.split(':')
    val n = xs.length; val m = ys.length
    val d = Array.ofDim[Double](n + 1, m + 1)
    var i = 1
    while (i <= n) { d(i)(0) = d(i - 1)(0) + c.delete * nodeWeight(xs(i - 1)); i += 1 }
    var j = 1
    while (j <= m) { d(0)(j) = d(0)(j - 1) + c.insert * nodeWeight(ys(j - 1)); j += 1 }
    i = 1
    while (i <= n) {
      j = 1
      while (j <= m) {
        val x = xs(i - 1); val y = ys(j - 1)
        val sub =
          if (x == y) 0.0
          else if (isLabelNode(x) || isLabelNode(y))
            LabelMismatchPenalty // any label involved (PathMatcher.java:73-78)
          else
            c.replace * (1.0 - wordSim(x, y)) *
              math.max(nodeWeight(x), nodeWeight(y))
        d(i)(j) = math.min(
          d(i - 1)(j - 1) + sub,
          math.min(d(i - 1)(j) + c.delete * nodeWeight(x),
                   d(i)(j - 1) + c.insert * nodeWeight(y)))
        j += 1
      }
      i += 1
    }
    d(n)(m)
  }

  /** Soft-match decision (PathRelationExtractor.java:82-145): best
    * positive rule under threshold·|rule|, not beaten by the best
    * same-type negative rule at `NegDiscount`. `wordSim` threads an
    * embedding-backed word similarity into the substitution cost. */
  def softMatch(candidate: String,
                positives: Seq[(String, String)], // (path, relName)
                negatives: Seq[(String, String)],
                wordSim: (String, String) => Double =
                  (x, y) => if (x == y) 1.0 else 0.0,
                costs: MatchCosts = DefaultCosts): Option[String] =
    softMatchWithKey(candidate, positives, negatives, wordSim, costs)
      .map(_._2)

  /** As [[softMatch]], but also returns the WINNING rule's path key —
    * callers that attach per-rule metadata (e.g. the swap12 `invert`
    * flag) need the matched rule's identity, not just its relation
    * name, because one relation can resolve through both the direct and
    * the swapped leg with different decode orientations. */
  def softMatchWithKey(candidate: String,
                       positives: Seq[(String, String)],
                       negatives: Seq[(String, String)],
                       wordSim: (String, String) => Double =
                         (x, y) => if (x == y) 1.0 else 0.0,
                       costs: MatchCosts = DefaultCosts)
      : Option[(String, String)] = {
    def best(rules: Seq[(String, String)]): Option[((String, String), Double)] =
      rules.iterator.map { case (p, r) =>
        ((p, r), pathEditDistance(candidate, p, costs, wordSim) /
          math.max(1, p.split(':').length))
      // deterministic tie-break: score, then rule name, then path
      }.minByOption(t => (t._2, t._1._2, t._1._1))
    best(positives) match {
      case Some(((p, rel), s)) if s < MatchThreshold =>
        best(negatives.filter(_._2 == rel)) match {
          case Some((_, ns)) if ns * NegDiscount < s => None
          case _ => Some((p, rel))
        }
      case _ => None
    }
  }

  /** Character edit distance (DepPathMap.java:266-302). */
  def editDistance(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Mention-pair enumeration (F2, DepPaths.java:312-341): sorted
    * mentions, pairs within the intervening-mention window, capped
    * sentence mention count.
    *
    * NOTE on the reference's literal `for (i=0; i<mis-2; i++)` bound
    * (DepPaths.java:326): applied literally it emits NO pair for a
    * 2-mention sentence, contradicting the reference's own validateCLI
    * golden ("one 'lives' relation in each doc" from 2-mention
    * sentences). We follow the golden — all pair starts — and document
    * the off-by-one here instead of reproducing it. */
  def mentionPairs(names: Seq[Name]): Seq[(Name, Name)] = {
    val ms = names.sortBy(_.tokStart).take(MaxMentionsPerSentence)
    for {
      i <- ms.indices
      j <- (i + 1) until math.min(ms.length, i + MaxInterveningMentions + 2)
    } yield (ms(i), ms(j))
  }
}
