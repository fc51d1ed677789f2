package graft.operators

import graft.core.AnnotatedDoc
import graft.nlp.Nlp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One verb-headed event subtree (IceTree, events/IceTree.java:18-70):
  * trigger lemma + role-typed arguments, the canonical type-signature
  * key (IceTree.java:403-426), the instance key (arg values kept), and
  * the source sentence as the example. */
final case class EventRow(doc_id: String, trigger: String,
                          args: Seq[EventArg], key: String,
                          instance_key: String, example: String)
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
        // group arcs by governing verb token, over the TRANSFORMED
        // parse (vch chains collapsed onto the main verb, as in
        // DepPathsStage): on the raw parse an auxiliary-chained clause
        // splits nsubj (on the aux) from dobj (on the main verb) across
        // two groups and 'has visited'-style events are never emitted
        val deps = Nlp.transform(s.deps.toVector)
        val byVerb = deps.filter(_.srcTag.startsWith("VB")).groupBy(_.srcPos)
        byVerb.toSeq.sortBy(_._1).flatMap { case (v, arcs) =>
          val roleArcs = arcs.flatMap { a =>
            a.dep match {
              case "nsubj" | "dobj" | "iobj" => Some((a.dep, a))
              case "prep" =>
                // collapse prep+pobj to prep_<p> (IceTree.java:355-371)
                deps.find(p => p.dep == "pobj" && p.srcPos == a.tgtPos)
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
            def render(g: EventArg, typed: Boolean) =
              s"${g.role}:${if (typed && g.etype != "OTHER") g.etype else g.value}"
            val key = trig + " " + args.map(render(_, typed = true)).mkString(" ")
            val instKey = trig + " " + args.map(render(_, typed = false)).mkString(" ")
            Some(EventRow(d.doc_id, trig, args, key, instKey, s.text))
          }
        }
      }
    }
  }

  /** `events` count table — instance keys, arg values kept (the
    * reference's eventInstanceCounts leg, DepPaths.java:564-583) — via
    * the salted two-phase helper (trigger keys are Zipf-hot too). */
  def eventInstanceCounts(ev: Dataset[EventRow]): DataFrame =
    // salt from (doc_id, example): deterministic (retry-safe), and a
    // Zipf-hot event key spreads because its trees come from many docs
    graft.functions.Salting.saltedCount(
      ev.toDF().select(col("instance_key").as("key"), col("doc_id"),
        col("example")), Seq("key"),
      uniqueKeys = Seq("doc_id", "example"))

  /** `event_types` count table — type-signature keys (the reference's
    * eventTypeCounts leg). */
  def eventCounts(ev: Dataset[EventRow]): DataFrame =
    graft.functions.Salting.saltedCount(
      ev.toDF().select(col("key"), col("doc_id"), col("example")),
      Seq("key"), uniqueKeys = Seq("doc_id", "example"))

  /** Linearize an event tree into an English-ish repr
    * (events/DepTreeMap.java linearization contract): subject, trigger,
    * object, then any further roles in sentence order of the key —
    * typed args render as their entity type, untyped keep their value;
    * lowercased like path reprs (DepPathMap.java:231-234). */
  def eventRepr(trigger: String, args: Seq[EventArg]): String = {
    def valOf(role: String): Option[String] =
      args.find(_.role == role)
        .map(g => if (g.etype != "OTHER") g.etype else g.value)
    val rest = args.filterNot(g => g.role == "nsubj" || g.role == "dobj")
      .map { g =>
        val p = if (g.role.startsWith("prep_")) g.role.stripPrefix("prep_") + " "
                else ""
        p + (if (g.etype != "OTHER") g.etype else g.value)
      }
    val parts = valOf("nsubj").toSeq ++ Seq(trigger) ++ valOf("dobj").toSeq ++ rest
    graft.functions.Paths.normalizeRepr(parts.mkString(" "))
  }

  /** `event_repr` table: one repr + example per type key; merge prefers
    * the shorter repr with a total tiebreak (the same shorter-repr merge
    * as path reprs, events/DepTreeMap.java:118-129 + IceCLI.java:656-665). */
  def eventReprTable(ev: Dataset[EventRow]): DataFrame = {
    import ev.sparkSession.implicits._
    ev.map(e => (e.key, eventRepr(e.trigger, e.args), e.example))
      .toDF("key", "repr", "example")
      .groupBy(col("key"))
      .agg(min(struct(length(col("repr")).as("l"), col("repr").as("r")))
             .getField("r").as("repr"),
           min(col("example")).as("example"))
  }

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
