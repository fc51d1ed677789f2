package graft

import graft.core._
import graft.functions.Paths
import graft.nlp.Nlp
import graft.sources.Gen

/** Throwaway profiling entry (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = 300000
    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val acc = f
        println(f"PROBE $label rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s acc=$acc")
      }
    }
    // full driver-side replica of the fused extraction per-doc loop
    def mineDoc(id: Long): Int = {
      val doc = Gen.doc(id)
      var cnt = 0
      doc.spans.foreach { sp =>
        if (sp.kind == "text") {
          Nlp.splitSentences(sp.text).foreach { case (t, o) =>
            val sent = Nlp.analyze(t, sp.offset + o)
            if (Paths.sentenceAllowed(sent.text)) {
              val deps = sent.deps.toVector
              val transformed = Nlp.transform(deps)
              val nt = sent.tokens.length
              val gT = Paths.buildGraph(transformed, nt)
              val gO = Paths.buildGraph(deps, nt)
              val blocked = new Array[Boolean](nt)
              sent.names.foreach(m => if (m.head < nt) blocked(m.head) = true)
              Paths.mentionPairs(sent.names).foreach { case (m1, m2) =>
                blocked(m1.head) = false; blocked(m2.head) = false
                for {
                  (tN, tL) <- Paths.bfsGraph(gT, m1.head, m2.head, blocked)
                  (oN, oL) <- Paths.bfsGraph(gO, m1.head, m2.head, blocked)
                  path = Paths.regularize(Paths.pathString(sent, tN, tL))
                  if Paths.arcCount(path) <= Paths.MaxPathArcs
                } {
                  val (t1, t2) = graft.operators.DepPathsStage.typedKey(m1.etype, m2.etype)
                  val repr = Paths.linearize(sent, oN, oL, t1, t2)
                  val pi = PathInstance(id.toString, 0, t1, t2, m1.surface,
                    m2.surface, m1.canonical, m2.canonical, path, repr, sent.text)
                  cnt += pi.path.length
                }
                blocked(m1.head) = true; blocked(m2.head) = true
              }
            }
          }
        }
      }
      cnt
    }
    (0L until 20000L).foreach(mineDoc) // warmup
    time("mine_full") {
      var acc = 0L
      (0L until n.toLong).foreach(acc += mineDoc(_))
      acc
    }
    // pieces: doc gen alone; coref pass alone
    time("gen_doc") {
      var acc = 0L
      (0L until n.toLong).foreach(id => acc += Gen.doc(id).spans.length)
      acc
    }
    val anns = (0L until 50000L).map { id =>
      Gen.doc(id).spans.filter(_.kind == "text").toVector
        .flatMap(sp => Nlp.splitSentences(sp.text).map { case (t, o) =>
          Nlp.analyze(t, sp.offset + o) })
    }
    time("coref_pass") {
      var acc = 0L
      anns.foreach(s => acc += Nlp.resolvePronouns(s).length)
      acc
    }
  
    val sents2: Array[(String, Int)] = (0L until n.toLong).flatMap(id =>
      Gen.doc(id).spans.filter(_.kind == "text").flatMap(sp =>
        Nlp.splitSentences(sp.text).map { case (t, o) => (t, sp.offset + o) }
      )).toArray
    time("analyze_only") {
      var acc = 0L
      sents2.foreach { s => acc += Nlp.analyze(s._1, s._2).tokens.length }
      acc
    }
  }
}
