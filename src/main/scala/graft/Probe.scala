package graft

import graft.nlp.Nlp
import graft.sources.Gen

/** Throwaway profiling entry (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = 300000
    val sents: Array[(String, Int)] = (0L until n.toLong).flatMap(id =>
      Gen.doc(id).spans.filter(_.kind == "text").flatMap(sp =>
        Nlp.splitSentences(sp.text).map { case (t, o) => (t, sp.offset + o) }
      )).toArray
    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val acc = f
        println(f"PROBE $label rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s acc=$acc")
      }
    }
    sents.take(50000).foreach(s => Nlp.analyze(s._1, s._2))
    time("analyze") {
      var acc = 0L
      sents.foreach { s => acc += Nlp.analyze(s._1, s._2).tokens.length }
      acc
    }
    time("tokenize") {
      var acc = 0L
      sents.foreach { s => acc += Nlp.tokenize(s._1).length }
      acc
    }
    val toks = sents.map(s => Nlp.tokenize(s._1))
    time("tagNames") {
      var acc = 0L
      toks.foreach { t => acc += Nlp.tagNames(t).length }
      acc
    }
    time("parse") {
      var acc = 0L
      toks.foreach { t => acc += Nlp.parse(t).length }
      acc
    }
    val named = toks.map(t => (t, Nlp.tagNames(t)))
    time("extractTerms") {
      var acc = 0L
      named.foreach { case (t, nm) => acc += Nlp.extractTerms(t, nm).length }
      acc
    }
  }
}
