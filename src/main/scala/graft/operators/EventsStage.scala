package graft.operators

import graft.core.AnnotatedDoc
import graft.nlp.Nlp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One verb-headed event subtree (IceTree, events/IceTree.java:18-70):
  * trigger lemma + role-typed arguments, plus the canonical string key
  * (IceTree.java:403-426). */
final case class EventRow(doc_id: String, trigger: String,
                          args: Seq[EventArg], key: String)
final case class EventArg(role: String, etype: String, value: String)

/** Stage: event (tree) extraction (X6/X7, IceTree.java:283-470).
  *
  * Verb-headed subtrees with both nsubj and dobj present; roles nsubj /
  * dobj / iobj / prep_X (prep+pobj collapsed); a pronoun argument aborts
  * the sentence's tree; named args are replaced by their entity type in
  * the key signature, untyped nominals keep their lemmatized value.
  */
object EventsStage {

  private val pronouns = Set("he", "she", "it", "they", "him", "her", "them",
    "we", "i", "you", "who")

  def events(docs: Dataset[AnnotatedDoc]): Dataset[EventRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      d.sentences.flatMap { s =>
        val typeOfTok: Map[Int, String] =
          s.names.flatMap(n => (n.tokStart until n.tokEnd).map(_ -> n.etype)).toMap
        // group arcs by governing verb token
        val byVerb = s.deps.filter(_.srcTag.startsWith("VB")).groupBy(_.srcPos)
        byVerb.toSeq.sortBy(_._1).flatMap { case (v, arcs) =>
          val roleArcs = arcs.flatMap { a =>
            a.dep match {
              case "nsubj" | "dobj" | "iobj" => Some((a.dep, a))
              case "prep" =>
                // collapse prep+pobj to prep_<p> (IceTree.java:355-371)
                s.deps.find(p => p.dep == "pobj" && p.srcPos == a.tgtPos)
                  .map(p => (s"prep_${a.tgtWord.toLowerCase}", p))
              case _ => None
            }
          }
          val roles = roleArcs.map(_._1)
          if (!roles.contains("nsubj") || !roles.contains("dobj")) None
          else if (roleArcs.exists(r => pronouns(r._2.tgtWord.toLowerCase))) None
          else {
            val args = roleArcs.map { case (role, a) =>
              val ety = typeOfTok.getOrElse(a.tgtPos, "OTHER")
              EventArg(role, ety, Nlp.lemma(a.tgtWord))
            }
            val trig = Nlp.lemma(s.tokens(v).word)
            val key = trig + " " + args.map { g =>
              val v2 = if (g.etype != "OTHER") g.etype else g.value
              s"${g.role}:$v2"
            }.mkString(" ")
            Some(EventRow(d.doc_id, trig, args, key))
          }
        }
      }
    }
  }

  /** `events` count table (A1-analog for trees, DepPaths.java:564-583),
    * via the salted two-phase helper (trigger keys are Zipf-hot too). */
  def eventCounts(ev: Dataset[EventRow]): DataFrame =
    graft.functions.Salting.saltedCount(
      ev.toDF().select(col("key")), Seq("key"))

  /** Event triples: (subject value, trigger lemma, object value) from
    * each verb-headed tree — the event-flavored counterpart of the
    * relation triple table. */
  def eventTriples(ev: Dataset[EventRow]): DataFrame = {
    import ev.sparkSession.implicits._
    ev.flatMap { e =>
      for {
        s <- e.args.find(_.role == "nsubj")
        o <- e.args.find(_.role == "dobj")
      } yield (e.doc_id, s.value, e.trigger, o.value)
    }.toDF("doc_id", "subj", "pred", "obj")
  }
}
