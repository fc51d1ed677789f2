package graft.operators

import graft.core._
import graft.nlp.Nlp
import org.apache.spark.sql.Dataset

/** Stage 1: NLP preprocess (X1/X2). `Dataset[IceDoc]` →
  * `Dataset[AnnotatedDoc]` via mapPartitions — the reference's most
  * expensive stage (IcePreprocessor.java:163-221, "several hours" per
  * ICE_Design.md:16-22), which is why its output is the stage-1
  * checkpoint table.
  *
  * Media spans are never analyzed; the whole input span sequence is
  * carried through verbatim on every row (the span-sequence invariant).
  */
object Preprocess {

  def annotate(docs: Dataset[IceDoc],
               metrics: Option[graft.sources.StageMetrics] = None)
      : Dataset[AnnotatedDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.map { doc =>
        // null guards (RobustnessSpec-found): a nullable parquet spans
        // column or a null text inside a span must degrade to "no
        // sentences", not NPE the task — the roundtrip still carries
        // the spans column exactly as read (null stays null)
        val spans = if (doc.spans == null) Vector.empty[SpanT] else doc.spans
        val sentences = spans.iterator
          .filter(sp => sp.kind == "text" && sp.text != null)
          .flatMap { sp =>
            Nlp.splitSentences(sp.text).map { case (sent, local) =>
              Nlp.analyze(sent, sp.offset + local)
            }
          }
          .toVector
        // X2 coref / entity merge: document-level partial-name and
        // pronoun resolution over the sentence-local analyses (term
        // extraction stays surface-level — it ran per sentence before
        // this pass)
        val resolved =
          Nlp.resolvePronouns(Nlp.resolvePartialNames(sentences))
        metrics.foreach { m =>
          m.docsIn.add(1)
          m.sentences.add(resolved.length)
          resolved.foreach(s => m.mentions.add(s.names.length))
        }
        AnnotatedDoc(doc.doc_id, doc.spans, resolved)
      }
    }
  }
}
