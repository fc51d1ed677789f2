package graft.core

/** Core row types of the KG-construction pipeline.
  *
  * Input contract (BASELINE.json input_hint): an Iceberg-style table of
  * interleaved text + media documents,
  * `(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)`.
  * Media spans are carried through every stage untouched; the per-row
  * span-sequence `(kind, text, media_ref, order)` invariant is asserted
  * in the test suite (reference: span handling in
  * /root/reference/src/main/java/edu/nyu/jet/ice/models/IcePreprocessor.java:210-215).
  */
final case class SpanT(kind: String, text: String, media_ref: String, offset: Int)

final case class IceDoc(doc_id: String, spans: Seq[SpanT])

/** One token: surface, char start/end within the sentence, Penn-style tag. */
final case class Token(word: String, start: Int, end: Int, pos: String)

/** A named mention found by the gazetteer tagger.
  * `tokStart`/`tokEnd` are token indices [start, end); `head` is the
  * head-token index (last token of the name, mirroring ICE head-offset
  * alignment in aceJet/TypedRelationExtractorScorer.java:53-80). */
final case class Name(tokStart: Int, tokEnd: Int, head: Int, etype: String,
                      surface: String, canonical: String)

/** Dependency arc, mirroring the reference serialization
  * (IcePreprocessor.java:746-750): label + governor word/posn/tag +
  * dependent word/posn/tag. Positions are token indices here. */
final case class Dep(dep: String, srcWord: String, srcPos: Int, srcTag: String,
                     tgtWord: String, tgtPos: Int, tgtTag: String)

/** One analyzed sentence (all annotations are sentence-local). */
final case class Sentence(text: String, offset: Int,
                          tokens: Seq[Token], names: Seq[Name], deps: Seq[Dep],
                          terms: Seq[String])

/** Stage-1 checkpoint row: the analyzed document. `spans` is the input
  * span sequence carried through verbatim (the invariant). */
final case class AnnotatedDoc(doc_id: String, spans: Seq[SpanT],
                              sentences: Seq[Sentence])

/** One lexicalized-dependency-path instance
  * (cf. models/DepPath.java:20-61 and the `Relations` file format
  * DepPaths.java:543-562). */
/** `end1`/`end2` are the mentions' head-token END char offsets within
  * the document — the reference's mention-alignment key
  * (aceJet/TypedRelationExtractorScorer.java:53-80 aligns entity
  * mentions by head end offset). */
final case class PathInstance(doc_id: String, sentIdx: Int,
                              type1: String, type2: String,
                              arg1: String, arg2: String,
                              canon1: String, canon2: String,
                              path: String, repr: String, example: String,
                              end1: Int, end2: Int)

/** Emitted knowledge-graph triple (replaces the reference's APF output,
  * aceJet/RelaxedDepPathRelationTagger.java:227-259). */
final case class Triple(doc_id: String, subj: String, pred: String, obj: String)

final case class CanonTriple(doc_id: String, subj: String, pred: String,
                             obj: String, canonical_subj: String,
                             canonical_obj: String)

/** Per-partition lineage record written by every stage (north rule:
  * per-partition lineage + metrics to a checkpoint table). */
final case class LineageRow(stage: String, partitionId: Int, rowsIn: Long,
                            rowsOut: Long, wallMs: Long)
