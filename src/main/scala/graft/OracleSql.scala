package graft

import graft.sources.Gen

/** DuckDB oracle SQL, generated from the same pools/arithmetic as the
  * Scala corpus generator (graft.sources.Gen). The driver runs these
  * against the sfDir parquet tables and hash-compares with the Spark
  * results — so each query here is an independent recomputation of what
  * the full pipeline should produce.
  */
object OracleSql {

  // SQL-escape ONE pool/fixture value. EVERY splice of a generator
  // string into oracle SQL must route through this (or sqlList): a
  // future pool entry with an apostrophe ("Coeur d'Alene") must not
  // break any generated oracle query — not just the list-indexed ones.
  private def sqlStr(x: String): String = s"'${x.replace("'", "''")}'"
  private def sqlList(xs: Seq[String]): String =
    xs.map(sqlStr).mkString("[", ",", "]")

  private val personsL = sqlList(Gen.persons)
  private val gpesL = sqlList(Gen.gpes)
  private val aliasesL = sqlList(Gen.gpeAliases)
  private val nounsL = sqlList(Gen.fillNouns)
  private val fverbsL = sqlList(Gen.fillVerbs)
  private val fvLemmasL = sqlList(Gen.fillVerbLemmas)
  private val adjsL = sqlList(Gen.fillAdjs)
  private val phrasesL = sqlList(Gen.predPhrases)
  private val predsL = sqlList(Gen.predNames)
  private val pathsL = sqlList(Gen.predPaths)

  // Filler-sentence word-index arithmetic (Gen.fillerNoun1/fillerNoun2/
  // fillerVerb/fillerAdj recomputed in SQL over the `d` documents
  // alias) — ONE definition each; previously this arithmetic was
  // re-typed inline in nine oracles, so a grammar change had to be
  // hand-synchronized across all copies.
  private val fn1Sql = s"($nounsL)[CAST((d.doc_id*3) % 12 AS INT)+1]"
  private val fn2Sql = s"($nounsL)[CAST((d.doc_id*5 + 7) % 12 AS INT)+1]"
  private val fvSurfSql = s"($fverbsL)[CAST((d.doc_id*23) % 4 AS INT)+1]"
  private val fvLemmaSql = s"($fvLemmasL)[CAST((d.doc_id*23) % 4 AS INT)+1]"
  private val fadjSql = s"($adjsL)[CAST((d.doc_id // 6) % 4 AS INT)+1]"
  /** Full surface text of a filler sentence (Gen.fillerSentence). */
  private val fillerTextSql =
    s"'The ' || CASE WHEN d.doc_id % 6 = 0 THEN $fadjSql || ' ' ELSE '' END" +
      s" || $fn1Sql || ' ' || $fvSurfSql || ' the ' || $fn2Sql || '.'"
  /** Full surface text of a main sentence (Gen.mainSentence), over the
    * bb columns (pi, ri, gi, al). */
  private val mainTextSql =
    s"($personsL)[pi+1] || ' ' || ($phrasesL)[ri] || ' ' || " +
      s"CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END || '.'"

  /** Per-(doc, sentence) expansion with all derived indices; the base
    * CTE every kg oracle builds on. */
  val baseCte: String =
    s"""WITH sidx(s) AS (SELECT 0 UNION ALL SELECT 1 UNION ALL SELECT 2),
       |b AS (
       |  SELECT d.doc_id AS id, sidx.s AS s,
       |         (d.doc_id*19 + sidx.s*5) % 20 AS r,
       |         CAST((d.doc_id*13 + sidx.s*7) % 40 AS INT) AS pi,
       |         CAST((d.doc_id*17 + sidx.s*11) % 25 AS INT) AS gi,
       |         ((d.doc_id + sidx.s) % 9 = 0) AS al
       |  FROM documents d CROSS JOIN sidx WHERE sidx.s <= d.doc_id % 3
       |),
       |bb AS (
       |  SELECT id, s, pi, gi, al,
       |         CASE WHEN r<10 THEN 1 WHEN r<15 THEN 2 WHEN r<17 THEN 3
       |              WHEN r=17 THEN 4 WHEN r=18 THEN 5 ELSE 6 END AS ri
       |  FROM b
       |)""".stripMargin

  private val gendersL = sqlList(Gen.personGenders)
  private val lastsL = sqlList(Gen.personLasts)

  /** Extra-sentence derivations (Gen.extraSentence): tour (k7=1),
    * pronoun-coref (k7=2), money (k7=3), partial-name (k7=4), marriage
    * (k7=5), quantifier (k7=6). Appended after [[baseCte]]. `api` is the pronoun-coref
    * antecedent person index — the most recent sentence whose person
    * matches the s=0 gender; `napi` the partial-name antecedent — the
    * most recent sentence whose person carries the s=0 last name
    * (Gen.pronAntecedentIdx / Gen.nameAntecedentIdx recomputed
    * independently). */
  val xtraCte: String =
    s""",
       |x AS (
       |  SELECT d.doc_id AS id, d.doc_id % 7 AS k7,
       |         CAST((d.doc_id*13) % 40 AS INT) AS tpi,
       |         CAST((d.doc_id*13 + 7) % 40 AS INT) AS s1pi,
       |         CAST((d.doc_id*13 + 14) % 40 AS INT) AS s2pi,
       |         d.doc_id % 3 AS lasts,
       |         CAST((d.doc_id*17) % 25 AS INT) AS tgi,
       |         (d.doc_id % 9 = 0) AS tal,
       |         CAST((d.doc_id*29) % 40 AS INT) AS mpi,
       |         d.doc_id % 9 + 1 AS amt,
       |         CAST((d.doc_id*31) % 40 AS INT) AS w1,
       |         CAST((d.doc_id*37 + 11) % 40 AS INT) AS w2r,
       |         CAST((d.doc_id*41) % 40 AS INT) AS qpi,
       |         CAST((d.doc_id*43) % 25 AS INT) AS qgi,
       |         CAST((d.doc_id*11) % 4 AS INT) AS qni
       |  FROM documents d WHERE d.doc_id % 7 IN (1, 2, 3, 4, 5, 6)
       |),
       |xx AS (SELECT *,
       |       CASE WHEN w2r % 20 = w1 % 20 THEN (w2r+1) % 40 ELSE w2r END AS w2,
       |       CASE WHEN lasts >= 2 AND ($gendersL)[s2pi+1] = ($gendersL)[tpi+1]
       |              THEN s2pi
       |            WHEN lasts >= 1 AND ($gendersL)[s1pi+1] = ($gendersL)[tpi+1]
       |              THEN s1pi
       |            ELSE tpi END AS api,
       |       CASE WHEN lasts >= 2 AND ($lastsL)[s2pi+1] = ($lastsL)[tpi+1]
       |              THEN s2pi
       |            WHEN lasts >= 1 AND ($lastsL)[s1pi+1] = ($lastsL)[tpi+1]
       |              THEN s1pi
       |            ELSE tpi END AS napi
       |       FROM x)""".stripMargin

  private val quantsL = sqlList(Gen.quantNouns)

  // surface-form snippets for the extra sentences
  private val tourPerson = s"($personsL)[tpi+1]"
  private val tourGpe =
    s"CASE WHEN tal THEN ($aliasesL)[tgi+1] ELSE ($gpesL)[tgi+1] END"
  private val tourGpeCanon = s"($gpesL)[tgi+1]"
  private val moneyPerson = s"($personsL)[mpi+1]"
  private val moneyObj = "'$ ' || amt || ' million'"
  private val moneyVal = "CAST(amt * 10000 AS VARCHAR)"
  private val sp1 = s"($personsL)[w1+1]"
  private val sp2 = s"($personsL)[w2+1]"
  private def lastOf(p: String) = s"lower(string_split($p, ' ')[2])"
  private val tourText = s"$tourPerson || ' toured ' || $tourGpe || '.'"
  private val moneyText =
    s"$moneyPerson || ' paid $$' || amt || ' million.'"
  private val marryText = s"$sp1 || ' married ' || $sp2 || '.'"
  // coref sentence (k7=2): pronoun surface from the s=0 gender; the
  // RESOLVED argument is the antecedent person (api); the gpe reuses the
  // s=0 (tgi, tal) formulas like the tour sentence
  private val pronPerson = s"($personsL)[api+1]"
  private val pronWord =
    s"CASE WHEN ($gendersL)[tpi+1] = 'M' THEN 'He' ELSE 'She' END"
  private val pronText = s"$pronWord || ' toured ' || $tourGpe || '.'"
  // partial-name sentence (k7=4): the bare s=0 last name; the RESOLVED
  // argument is the most recent person with that last name (napi)
  private val namePerson = s"($personsL)[napi+1]"
  private val nameWord = s"($lastsL)[tpi+1]"
  private val nameText = s"$nameWord || ' toured ' || $tourGpe || '.'"
  // quantifier sentence (k7=6): "P visited a <quant> of G." — the mined
  // path regularizes to the plain visit path (F13), so its triples
  // decode through the visited rule
  private val quantPerson = s"($personsL)[qpi+1]"
  private val quantNoun = s"($quantsL)[qni+1]"
  private val quantGpe =
    s"CASE WHEN tal THEN ($aliasesL)[qgi+1] ELSE ($gpesL)[qgi+1] END"
  private val quantGpeCanon = s"($gpesL)[qgi+1]"
  private val quantText =
    s"$quantPerson || ' visited a ' || $quantNoun || ' of ' || $quantGpe || '.'"

  /** Tour sentences soft-match the `visited` rule (one word substitution,
    * 0.8/3 < 0.5 threshold) — the nearest rule deterministically. */
  val kgTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id,
       |  ($personsL)[pi+1] AS subj,
       |  ($predsL)[ri] AS pred,
       |  CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS obj
       |FROM bb
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $tourPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 1
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $pronPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 2
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $namePerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 4
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $quantPerson, 'visited', $quantGpe
       |FROM xx WHERE k7 = 6""".stripMargin

  val kgCanonicalTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id,
       |  ($personsL)[pi+1] AS subj,
       |  ($predsL)[ri] AS pred,
       |  CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS obj,
       |  ($personsL)[pi+1] AS canonical_subj,
       |  ($gpesL)[gi+1] AS canonical_obj
       |FROM bb
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $tourPerson, 'visited', $tourGpe,
       |       $tourPerson, $tourGpeCanon
       |FROM xx WHERE k7 = 1
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $pronPerson, 'visited', $tourGpe,
       |       $pronPerson, $tourGpeCanon
       |FROM xx WHERE k7 = 2
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $namePerson, 'visited', $tourGpe,
       |       $namePerson, $tourGpeCanon
       |FROM xx WHERE k7 = 4
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $quantPerson, 'visited', $quantGpe,
       |       $quantPerson, $quantGpeCanon
       |FROM xx WHERE k7 = 6""".stripMargin

  val kgPathTypes: String =
    s"""$baseCte$xtraCte
       |SELECT type1, path, type2, count(*) AS cnt FROM (
       |  SELECT 'PERSON' AS type1, ($pathsL)[ri] AS path, 'GPE' AS type2 FROM bb
       |  UNION ALL SELECT 'PERSON', 'nsubj-1:tour:dobj', 'GPE' FROM xx WHERE k7 IN (1, 2, 4)
       |  UNION ALL SELECT 'PERSON', 'nsubj-1:visit:dobj', 'GPE' FROM xx WHERE k7 = 6
       |  UNION ALL SELECT 'PERSON', 'nsubj-1:pay:dobj', 'MONEY' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT 'PERSON(1)', 'nsubj-1:marry:dobj', 'PERSON(2)' FROM xx WHERE k7 = 5
       |) GROUP BY 1, 2, 3""".stripMargin

  val kgPathInstances: String =
    s"""$baseCte$xtraCte
       |SELECT arg1, path, arg2, count(*) AS cnt, min(example) AS example FROM (
       |  SELECT ($personsL)[pi+1] AS arg1,
       |         ($pathsL)[ri] AS path,
       |         CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS arg2,
       |         $mainTextSql AS example
       |  FROM bb
       |  UNION ALL SELECT $tourPerson, 'nsubj-1:tour:dobj', $tourGpe, $tourText
       |  FROM xx WHERE k7 = 1
       |  UNION ALL SELECT $pronPerson, 'nsubj-1:tour:dobj', $tourGpe, $pronText
       |  FROM xx WHERE k7 = 2
       |  UNION ALL SELECT $namePerson, 'nsubj-1:tour:dobj', $tourGpe, $nameText
       |  FROM xx WHERE k7 = 4
       |  UNION ALL SELECT $quantPerson, 'nsubj-1:visit:dobj', $quantGpe, $quantText
       |  FROM xx WHERE k7 = 6
       |  UNION ALL SELECT $moneyPerson, 'nsubj-1:pay:dobj', $moneyObj, $moneyText
       |  FROM xx WHERE k7 = 3
       |  UNION ALL SELECT $sp1, 'nsubj-1:marry:dobj', $sp2, $marryText
       |  FROM xx WHERE k7 = 5
       |) GROUP BY 1, 2, 3""".stripMargin

  /** Path-trigram (ngram-event) counts: the trigram decomposition of
    * each path is a pure function of the (finite) path inventory, so
    * the oracle embeds it as a VALUES table joined with per-path
    * instance counts. */
  val kgPathNgrams: String = {
    def trigrams(p: String): Seq[String] = {
      val segs = p.split(':')
      if (segs.length % 2 == 0) Nil
      else (0 until segs.length - 2 by 2)
        .map(i => s"${segs(i)}:${segs(i + 1)}:${segs(i + 2)}")
    }
    val allPaths = Gen.predPaths ++
      Seq("nsubj-1:tour:dobj", "nsubj-1:pay:dobj", "nsubj-1:marry:dobj")
    val values = allPaths.flatMap(p => trigrams(p).map(t => s"('$p','$t')"))
      .mkString(", ")
    s"""$baseCte$xtraCte,
       |allp AS (
       |  SELECT ($pathsL)[ri] AS path FROM bb
       |  UNION ALL SELECT 'nsubj-1:tour:dobj' FROM xx WHERE k7 IN (1, 2, 4)
       |  UNION ALL SELECT 'nsubj-1:visit:dobj' FROM xx WHERE k7 = 6
       |  UNION ALL SELECT 'nsubj-1:pay:dobj' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT 'nsubj-1:marry:dobj' FROM xx WHERE k7 = 5
       |),
       |pc AS (SELECT path, count(*) AS n FROM allp GROUP BY 1),
       |tg(path, context) AS (VALUES $values)
       |SELECT pc.path, tg.context, pc.n AS cnt
       |FROM pc JOIN tg ON pc.path = tg.path""".stripMargin
  }

  val kgValueTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id, $moneyPerson AS subj,
       |       'paid' AS pred, $moneyObj AS obj, $moneyVal AS value
       |FROM xx WHERE k7 = 3""".stripMargin

  val kgSymmetricTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id, $sp2 AS subj,
       |       'marriedBy' AS pred, $sp1 AS obj
       |FROM xx WHERE k7 = 5""".stripMargin

  /** Event bootstrap from visit seeds: the only trigger sharing
    * (person, gpe) argument pairs is `tour`; shared/total over distinct
    * pairs, score = shared/total * shared/(shared+1). */
  val kgEventBootstrapScores: String =
    s"""$baseCte$xtraCte,
       |vp AS (SELECT DISTINCT ${lastOf(s"($personsL)[pi+1]")} || ':::' ||
       |              lower(CASE WHEN al THEN ($aliasesL)[gi+1]
       |                         ELSE ($gpesL)[gi+1] END) AS pair
       |       FROM bb WHERE ri = 2),
       |tp AS (SELECT DISTINCT pair FROM (
       |         SELECT ${lastOf(tourPerson)} || ':::' || lower($tourGpe) AS pair
       |         FROM xx WHERE k7 = 1
       |         UNION ALL
       |         SELECT lower($nameWord) || ':::' || lower($tourGpe)
       |         FROM xx WHERE k7 = 4)),
       |sh AS (SELECT count(*) AS shared FROM tp JOIN vp ON tp.pair = vp.pair),
       |tot AS (SELECT count(*) AS total FROM tp)
       |SELECT 'tour nsubj:PERSON dobj:GPE' AS key, 'tour' AS "trigger",
       |       sh.shared AS shared, tot.total AS total_count,
       |       floor(sh.shared * 1.0 / tot.total * sh.shared / (sh.shared + 1)
       |             * 1e6 + 0.5) / 1e6 AS score
       |FROM sh, tot WHERE sh.shared > 0""".stripMargin

  /** Event-flavored embedding scoring (EventBootstrap.java:418-460):
    * per type key, tree vector = sum of fixed word vectors of the
    * trigger + the arg VALUES parsed from the key (role prefixes
    * stripped, lowercased); score = cosine(seed-tree centroid, tree)
    * · cnt/(cnt+1). The centroid is re-derived in SQL from the same
    * embedding VALUES; the count table is the independent kgEvents
    * derivation. */
  lazy val kgEventEmbScores: String = {
    val emb = graft.pipeline.KgPipeline.eventEmbedding.toSeq.sortBy(_._1)
      .map { case (w, v) => s"(${sqlStr(w)},${v(0)},${v(1)})" }.mkString(", ")
    s"""WITH ev0 AS ($kgEvents),
       |emb(w, ex, ey) AS (VALUES $emb),
       |cen AS (SELECT sum(ex) AS cx, sum(ey) AS cy FROM emb
       |        WHERE w IN ('visit', 'person', 'gpe')),
       |kw AS (SELECT key, cnt,
       |              unnest(string_split_regex(key, '\\s+')) AS part
       |       FROM ev0),
       |kv AS (SELECT key, cnt,
       |              coalesce(sum(e.ex), 0) AS vx,
       |              coalesce(sum(e.ey), 0) AS vy
       |       FROM kw LEFT JOIN emb e
       |         ON e.w = lower(CASE WHEN position(':' IN part) > 0
       |                             THEN substr(part, position(':' IN part) + 1)
       |                             ELSE part END)
       |       GROUP BY 1, 2)
       |SELECT key, cnt,
       |       floor(CASE WHEN sqrt(vx*vx + vy*vy) = 0
       |                    OR sqrt(cx*cx + cy*cy) = 0 THEN 0.0
       |                  ELSE (cx*vx + cy*vy) / sqrt(cx*cx + cy*cy)
       |                       / sqrt(vx*vx + vy*vy) END
       |             * cnt / (cnt + 1) * 1e6 + 0.5) / 1e6 AS score
       |FROM kv, cen""".stripMargin
  }

  /** Interleaved span sequence (kind, text, media_ref, order) — the
    * per-row invariant, recomputed independently. Span order: optional
    * filler, then per sentence s: text span + optional media span. */
  val kgSpansRoundtrip: String = {
    val mediaBefore =
      """(CASE WHEN (id + 0) % 4 = 0 AND s > 0 THEN 1 ELSE 0 END +
        | CASE WHEN (id + 1) % 4 = 0 AND s > 1 THEN 1 ELSE 0 END)""".stripMargin
    val filler = "CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END"
    val sentText = mainTextSql
    val totalMedia =
      """(CASE WHEN (id + 0) % 4 = 0 THEN 1 ELSE 0 END +
        | CASE WHEN id % 3 >= 1 AND (id + 1) % 4 = 0 THEN 1 ELSE 0 END +
        | CASE WHEN id % 3 >= 2 AND (id + 2) % 4 = 0 THEN 1 ELSE 0 END)""".stripMargin
    s"""$baseCte$xtraCte
       |SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, 0 AS ord,
       |       'text' AS kind,
       |       $fillerTextSql AS text,
       |       '' AS media_ref
       |FROM documents d WHERE d.doc_id % 2 = 0
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $filler + s + $mediaBefore,
       |       'text', $sentText, ''
       |FROM bb
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $filler + s + $mediaBefore + 1,
       |       'media', '', 'm-' || id || '-' || s
       |FROM bb WHERE (id + s) % 4 = 0
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $filler + (id % 3 + 1) + $totalMedia,
       |       'text',
       |       CASE k7 WHEN 1 THEN $tourText WHEN 2 THEN $pronText
       |               WHEN 3 THEN $moneyText WHEN 4 THEN $nameText
       |               WHEN 5 THEN $marryText
       |               ELSE $quantText END, ''
       |FROM xx""".stripMargin
  }

  /** Per-filler-doc noun/verb derivations, the base for term/event/PMI
    * oracles. */
  private val fillerCte: String =
    s"""WITH f AS (
       |  SELECT d.doc_id AS id,
       |         $fn1Sql AS n1,
       |         $fn2Sql AS n2,
       |         $fvLemmaSql AS fvl
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |)""".stripMargin

  /** Quant-sentence dep events (k7=6): the quantifier noun is a term
    * ("group") whose only context is its governing `dobj-1_visit` arc —
    * the partitive `prep of` / `det a` arcs fall to the stopword
    * exclusion. */
  private val quantEvLeg: String =
    s"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       |       ($quantsL)[CAST((doc_id*11) % 4 AS INT)+1] AS term,
       |       'dobj-1_visit' AS context
       |FROM documents WHERE doc_id % 7 = 6""".stripMargin

  val kgDepEvents: String =
    s"""$fillerCte
       |SELECT CAST(id AS VARCHAR) AS doc_id, n1 AS term,
       |       'nsubj-1_' || fvl AS context FROM f
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), n2, 'dobj-1_' || fvl FROM f
       |UNION ALL
       |$quantEvLeg""".stripMargin

  /** Typeless-indexer pairs for the term list {budget, report,
    * annual budget}: longest-first matching consumes "annual budget"
    * (docs id%24==0 — adjective present AND adj=annual AND n1=budget),
    * bare "budget" matches in the remaining n1=budget fillers
    * (id%4==0), "report" appears as n2 in id%12==6 fillers. */
  val kgTypelessPairs: String =
    s"""WITH d2 AS (
       |  SELECT d.doc_id AS id,
       |         $fvLemmaSql AS fvl
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |)
       |SELECT term, context, count(*) AS cnt FROM (
       |  SELECT 'annual_budget' AS term, 'nsubj-1_' || fvl AS context
       |  FROM d2 WHERE id % 24 = 0
       |  UNION ALL SELECT 'budget', 'nsubj-1_' || fvl
       |  FROM d2 WHERE id % 4 = 0 AND id % 24 <> 0
       |  UNION ALL SELECT 'report', 'dobj-1_' || fvl
       |  FROM d2 WHERE id % 12 = 6
       |) GROUP BY 1, 2""".stripMargin

  // Shared PMI index chain (A6/A7): ev → cells → marginals → idx. One
  // source of truth for the PMI formula — kgEntityIndex /
  // kgEntityExpansion / kgEntityExpansionFiltered previously inlined
  // three copies, and a threshold/rounding change had to be
  // hand-synchronized across them. `cellsSql` supplies the cells CTE(s)
  // (plain count, or the F10 total-count cut).
  private def pmiIdxCtes(cellsSql: String): String =
    s"""ev AS (
       |  SELECT n1 AS term, 'nsubj-1_' || fvl AS context FROM f
       |  UNION ALL SELECT n2, 'dobj-1_' || fvl FROM f
       |  UNION ALL SELECT term, context FROM ($quantEvLeg)
       |),
       |$cellsSql,
       |rt AS (SELECT term, sum(cnt) AS row_total FROM cells GROUP BY 1),
       |ct AS (SELECT context, sum(cnt) AS ctx_total FROM cells GROUP BY 1),
       |n AS (SELECT sum(cnt) AS n FROM cells),
       |idx AS (
       |  SELECT c.term, c.context, c.cnt,
       |         floor(ln(c.cnt / rt.row_total / (ct.ctx_total / n.n))
       |               * 1e6 + 0.5) / 1e6 AS pmi
       |  FROM cells c, rt, ct, n
       |  WHERE c.term = rt.term AND c.context = ct.context
       |    AND floor(ln(c.cnt / rt.row_total / (ct.ctx_total / n.n))
       |              * 1e6 + 0.5) / 1e6 > 0.1
       |)""".stripMargin

  private val plainCells =
    "cells AS (SELECT term, context, count(*) AS cnt FROM ev GROUP BY 1,2)"

  /** The expansion seed list — ONE definition (escaped) mirroring
    * KgPipeline's `Set(Gen.fillNouns(0), Gen.fillNouns(1))`; previously
    * four oracles re-derived this string independently, so a seed-set
    * change had to be hand-synchronized. */
  private val seedsSql =
    Seq(Gen.fillNouns(0), Gen.fillNouns(1)).map(sqlStr).mkString(",")

  /** Positive-centroid chain (cen / np / pt) over the idx CTE — shared
    * verbatim by the expansion and negative-seed oracles, so a
    * centroid/cosine tweak cannot silently reach one and not the
    * other. */
  private val posCenCtes =
    s"""cen AS (SELECT context, sum(pmi) AS w FROM idx
       |        WHERE term IN ($seedsSql) GROUP BY 1),
       |np AS (SELECT sqrt(sum(w*w)) AS norm_p FROM cen),
       |pt AS (
       |  SELECT i.term,
       |         sum(i.pmi * coalesce(cen.w, 0)) AS dot_pos,
       |         sqrt(sum(i.pmi * i.pmi)) AS norm
       |  FROM idx i LEFT JOIN cen ON i.context = cen.context
       |  GROUP BY 1
       |)""".stripMargin

  /** A12 centroid-cosine expansion over the shared idx chain; trailing
    * filters carry the F9 exclusions. */
  private def expansionSql(cellsSql: String, extraFilters: String): String =
    s"""$fillerCte,
       |${pmiIdxCtes(cellsSql)},
       |$posCenCtes
       |SELECT pt.term,
       |       floor(pt.dot_pos / pt.norm / np.norm_p * 1e6 + 0.5) / 1e6
       |         AS score
       |FROM pt, np WHERE pt.term NOT IN ($seedsSql)$extraFilters""".stripMargin

  val kgEntityIndex: String =
    s"""$fillerCte,
       |${pmiIdxCtes(plainCells)}
       |SELECT term, context, cnt, pmi FROM idx""".stripMargin

  val kgEntityExpansion: String = expansionSql(plainCells, "")

  /** A12 negative-seed leg (reject workflow): the rejected term is the
    * top of the positive-only ranking — picked on the QUANTIZED score
    * (floor(x·1e6 + 0.5)/1e6, the same IEEE ops expand() applies, so
    * the pick is engine-identical by construction rather than relying
    * on round()-tie parity) with the term tiebreak — then every score
    * re-ranks with the 0.5-weighted negative-centroid cosine
    * subtracted. The rejected term itself stays in the ranking (only
    * POSITIVE seeds are filtered from the output), mirroring
    * EntitySetStage.expand. */
  lazy val kgEntityExpansionNeg: String = {
    val seeds = seedsSql
    s"""$fillerCte,
       |${pmiIdxCtes(plainCells)},
       |$posCenCtes,
       |rej AS (SELECT pt.term FROM pt, np WHERE pt.term NOT IN ($seeds)
       |        ORDER BY floor(pt.dot_pos / pt.norm / np.norm_p * 1e6
       |                       + 0.5) / 1e6 DESC,
       |                 pt.term
       |        LIMIT 1),
       |cenn AS (SELECT context, sum(pmi) AS w FROM idx
       |         WHERE term IN (SELECT term FROM rej) GROUP BY 1),
       |nn AS (SELECT sqrt(sum(w*w)) AS norm_n FROM cenn),
       |pt2 AS (
       |  SELECT i.term,
       |         sum(i.pmi * coalesce(cp.w, 0)) AS dot_pos,
       |         sum(i.pmi * coalesce(cn.w, 0)) AS dot_neg,
       |         sqrt(sum(i.pmi * i.pmi)) AS norm
       |  FROM idx i LEFT JOIN cen cp ON i.context = cp.context
       |             LEFT JOIN cenn cn ON i.context = cn.context
       |  GROUP BY 1)
       |SELECT pt2.term,
       |       floor((pt2.dot_pos / pt2.norm / np.norm_p
       |              - 0.5 * (pt2.dot_neg / pt2.norm / nn.norm_n))
       |             * 1e6 + 0.5) / 1e6 AS score
       |FROM pt2, np, nn WHERE pt2.term NOT IN ($seeds)""".stripMargin
  }

  /** F9/F10-filtered expansion: the index is cut to terms with total
    * count > 100 (dropping every dobj-side noun on this corpus, so the
    * centroid comes from the surviving seed alone), marginals/N are
    * recomputed over the kept cells, and the F9 seed-candidate
    * exclusions apply to the ranked output. */
  val kgEntityExpansionFiltered: String = expansionSql(
    """cells0 AS (SELECT term, context, count(*) AS cnt FROM ev GROUP BY 1,2),
      |kept AS (SELECT term FROM cells0 GROUP BY 1 HAVING sum(cnt) > 100),
      |cells AS (SELECT c.* FROM cells0 c JOIN kept k ON c.term = k.term)""".stripMargin,
    """
      |  AND pt.term NOT LIKE '%tion' AND pt.term NOT LIKE '%ment'
      |  AND pt.term NOT LIKE 'www.%' AND pt.term NOT LIKE 'http%'
      |  AND pt.term NOT LIKE '%@%'""".stripMargin)

  /** Shared dense-feature CTEs for the expander oracles (A13/A14): the
    * PMI index chain, a context-ordered vocabulary, rounded per-term
    * total-PMI scores, the capped pool, one dense feature vector per
    * pool term. MATERIALIZED where referenced repeatedly — the unrolled
    * clustering would otherwise inline the chain exponentially. */
  private lazy val expanderCtes: String =
    s"""${pmiIdxCtes(plainCells)},
       |vocab AS MATERIALIZED (
       |  SELECT context, row_number() OVER (ORDER BY context) AS ci
       |  FROM (SELECT DISTINCT context FROM idx)),
       |tscore AS (SELECT term, floor(sum(pmi) * 1e6 + 0.5) / 1e6 AS score
       |           FROM idx GROUP BY 1),
       |pool AS (SELECT term, score,
       |         row_number() OVER (ORDER BY score DESC, term) AS pi
       |         FROM tscore ORDER BY score DESC, term LIMIT 20),
       |feats AS MATERIALIZED (
       |  SELECT p.pi, p.term, p.score,
       |         list(coalesce(i.pmi, 0.0) ORDER BY v.ci) AS x
       |  FROM pool p CROSS JOIN vocab v
       |  LEFT JOIN idx i ON i.term = p.term AND i.context = v.context
       |  GROUP BY p.pi, p.term, p.score)""".stripMargin

  /** A13 oracle: the agglomerative clustering UNROLLED — one generated
    * CTE block per potential merge step (19 = pool cap - 1), each step
    * recomputing centroids, pairwise gravitation (cosine rounded to 6 dp
    * exactly like Expanders.recommendSeeds), the argmax pair with the
    * same (g desc, i, j) tie-break, and the stop conditions
    * (merged size > 4, clusters < 3). Cluster identity = the minimal
    * pool index of its members, which is exactly the Scala vector
    * position root. The best-pair leg joins LEFT so a pool with a
    * single member (b$k empty — no pairs) carries its row through
    * unmerged instead of emptying every later step, matching the Scala
    * side's skip-the-loop behavior on < minClusters inputs. */
  lazy val kgSeedRecommendation: String = {
    def step(k: Int): String = {
      val p = k - 1
      val cos =
        s"""(floor(CASE WHEN sqrt(list_dot_product(ca.cen, ca.cen)) = 0
           |            OR sqrt(list_dot_product(cb.cen, cb.cen)) = 0 THEN 0.0
           |       ELSE list_dot_product(ca.cen, cb.cen) /
           |            (sqrt(list_dot_product(ca.cen, ca.cen)) *
           |             sqrt(list_dot_product(cb.cen, cb.cen))) END
           |       * 1e6 + 0.5) / 1e6)""".stripMargin
      s"""c$k AS MATERIALIZED (SELECT root, list(v ORDER BY ci) AS cen FROM (
         |    SELECT a.root AS root, ci.ci AS ci, avg(f.x[ci.ci]) AS v
         |    FROM s$p a JOIN feats f ON f.pi = a.item
         |    CROSS JOIN (SELECT ci FROM vocab) ci(ci)
         |    GROUP BY a.root, ci.ci) GROUP BY root),
         |ms$k AS MATERIALIZED (SELECT a.root, max(f.score) AS ms
         |  FROM s$p a JOIN feats f ON f.pi = a.item GROUP BY 1),
         |b$k AS MATERIALIZED (
         |  SELECT ca.root AS ri, cb.root AS rj,
         |    (msa.ms * msb.ms) / ((1.0 - $cos + 1e-9) * (1.0 - $cos + 1e-9)) AS g
         |  FROM c$k ca JOIN c$k cb ON ca.root < cb.root
         |  JOIN ms$k msa ON msa.root = ca.root JOIN ms$k msb ON msb.root = cb.root
         |  ORDER BY g DESC, ri, rj LIMIT 1),
         |z$k AS MATERIALIZED (SELECT
         |  (SELECT count(*) FROM s$p a, b$k b
         |   WHERE a.root = b.ri OR a.root = b.rj) AS msz,
         |  (SELECT count(DISTINCT root) FROM s$p) AS nc,
         |  (SELECT bool_or(stopped) FROM s$p) AS stp),
         |s$k AS MATERIALIZED (
         |  SELECT a.item,
         |    CASE WHEN b.ri IS NOT NULL
         |          AND NOT (z.stp OR z.nc < 3 OR z.msz > 4) AND a.root = b.rj
         |         THEN b.ri ELSE a.root END AS root,
         |    (z.stp OR z.nc < 3 OR z.msz > 4) AS stopped
         |  FROM s$p a CROSS JOIN z$k z LEFT JOIN b$k b ON true)""".stripMargin
    }
    val maxSteps = 19
    s"""$fillerCte,
       |$expanderCtes,
       |s0 AS MATERIALIZED (SELECT pi AS item, pi AS root, false AS stopped
       |  FROM feats),
       |${(1 to maxSteps).map(step).mkString(",\n")},
       |bestc AS (
       |  SELECT a.root FROM s$maxSteps a JOIN feats f ON f.pi = a.item
       |  GROUP BY a.root
       |  ORDER BY max(f.score) DESC,
       |           len(min(CASE WHEN f.pi = a.root THEN f.term END)) ASC,
       |           a.root ASC
       |  LIMIT 1)
       |SELECT CAST(row_number() OVER (ORDER BY f.score DESC, f.term) AS INT)
       |         AS rank, f.term
       |FROM s$maxSteps a
       |JOIN feats f ON f.pi = a.item
       |JOIN bestc b ON a.root = b.root""".stripMargin
  }

  /** A14 oracle: the MIRA update sequence as a recursive CTE — one
    * iteration per (epoch, example) visiting pool terms in term order,
    * hinge update tau = min(0.5, loss/||x||²), 50 epochs; final weights
    * score every term. Dense vectors in context order make the dot
    * products bit-identical to the Scala sorted-map iteration. */
  lazy val kgMiraScores: String = {
    val seeds = seedsSql
    s"""${fillerCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |$expanderCtes,
       |ex AS MATERIALIZED (
       |  SELECT term, x, row_number() OVER (ORDER BY term) AS ti,
       |         CASE WHEN term IN ($seeds) THEN 1.0 ELSE -1.0 END AS y
       |  FROM feats),
       |nn AS (SELECT count(*) AS n FROM ex),
       |mira(t, w) AS (
       |  -- the recursion's column type is pinned by this seed row: the
       |  -- 0.0 literal is DECIMAL(2,1), and without the DOUBLE cast
       |  -- every computed weight would be silently truncated to one
       |  -- decimal on re-entry
       |  SELECT 0, (SELECT list(CAST(0.0 AS DOUBLE) ORDER BY ci) FROM vocab)
       |  UNION ALL
       |  SELECT m.t + 1,
       |    CASE WHEN greatest(0.0, 1.0 - e.y * list_dot_product(m.w, e.x)) > 0
       |              AND list_dot_product(e.x, e.x) > 0
       |         THEN list_transform(range(1, len(m.w) + 1),
       |                i -> m.w[i] + least(0.5,
       |                       greatest(0.0, 1.0 - e.y * list_dot_product(m.w, e.x))
       |                       / list_dot_product(e.x, e.x)) * e.y * e.x[i])
       |         ELSE m.w END
       |  FROM mira m, ex e, nn
       |  WHERE e.ti = (m.t % nn.n) + 1 AND m.t < 50 * nn.n
       |)
       |SELECT e.term,
       |       floor(list_dot_product(mw.w, e.x) * 1e6 + 0.5) / 1e6
       |         AS mira_score
       |FROM ex e, (SELECT w FROM mira ORDER BY t DESC LIMIT 1) mw""".stripMargin
  }

  /** Unified term-occurrence set: filler NP suffixes (single nouns +
    * adjective multi-word suffixes) and name terms `surface/nnp` from
    * every sentence (F8 length/letter filter passes for the whole
    * name pool, asserted in unit tests). */
  private val termsCte: String =
    s"""$baseCte$xtraCte,
       |f2 AS (
       |  SELECT d.doc_id AS id,
       |         $fn1Sql AS n1,
       |         $fn2Sql AS n2,
       |         (d.doc_id % 6 = 0) AS hasadj,
       |         $fadjSql AS adj
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |),
       |t AS (
       |  SELECT id, n1 AS term FROM f2
       |  UNION ALL SELECT id, n2 FROM f2
       |  UNION ALL SELECT id, adj || ' ' || n1 FROM f2 WHERE hasadj
       |  UNION ALL SELECT id, ($personsL)[pi+1] || '/nnp' FROM bb
       |  UNION ALL SELECT id, CASE WHEN al THEN ($aliasesL)[gi+1]
       |                            ELSE ($gpesL)[gi+1] END || '/nnp' FROM bb
       |  UNION ALL SELECT id, $tourPerson || '/nnp' FROM xx WHERE k7 = 1
       |  UNION ALL SELECT id, $tourGpe || '/nnp' FROM xx WHERE k7 IN (1, 2, 4)
       |  UNION ALL SELECT id, $nameWord || '/nnp' FROM xx WHERE k7 = 4
       |  UNION ALL SELECT id, $moneyPerson || '/nnp' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT id, $sp1 || '/nnp' FROM xx WHERE k7 = 5
       |  UNION ALL SELECT id, $sp2 || '/nnp' FROM xx WHERE k7 = 5
       |  UNION ALL SELECT id, $quantNoun FROM xx WHERE k7 = 6
       |  UNION ALL SELECT id, $quantPerson || '/nnp' FROM xx WHERE k7 = 6
       |  UNION ALL SELECT id, $quantGpe || '/nnp' FROM xx WHERE k7 = 6
       |)""".stripMargin

  val kgTermRank: String =
    s"""$termsCte,
       |fg AS (
       |  SELECT term, count(DISTINCT id) AS doc_freq, count(*) AS total_freq
       |  FROM t WHERE id % 4 = 0 GROUP BY 1
       |), bg AS (
       |  SELECT term, count(DISTINCT id) AS bg_doc_freq
       |  FROM t WHERE id % 4 = 2 GROUP BY 1
       |)
       |SELECT fg.term, fg.doc_freq, fg.total_freq,
       |       floor(fg.doc_freq * ln(fg.doc_freq) /
       |             (coalesce(bg.bg_doc_freq, 0) + 1) * 1e6 + 0.5) / 1e6
       |         AS score
       |FROM fg LEFT JOIN bg ON fg.term = bg.term""".stripMargin

  /** O3 (top-K queue, size 10): deterministic (score desc, term)
    * ordering — same rounded-double score formula on both sides. */
  lazy val kgTermRankTop10: String =
    kgTermRank + "\nORDER BY score DESC, fg.term LIMIT 10"

  val kgPathRank: String =
    s"""$baseCte$xtraCte,
       |allp AS (
       |  SELECT id, 'PERSON' AS type1, ($pathsL)[ri] AS path, 'GPE' AS type2 FROM bb
       |  UNION ALL SELECT id, 'PERSON', 'nsubj-1:tour:dobj', 'GPE' FROM xx WHERE k7 IN (1, 2, 4)
       |  UNION ALL SELECT id, 'PERSON', 'nsubj-1:visit:dobj', 'GPE' FROM xx WHERE k7 = 6
       |  UNION ALL SELECT id, 'PERSON', 'nsubj-1:pay:dobj', 'MONEY' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT id, 'PERSON(1)', 'nsubj-1:marry:dobj', 'PERSON(2)' FROM xx WHERE k7 = 5
       |),
       |fg AS (SELECT type1, path, type2, count(*) AS cnt
       |       FROM allp WHERE id % 4 = 0 GROUP BY 1, 2, 3),
       |bg AS (SELECT type1, path, type2, count(*) AS cnt
       |       FROM allp WHERE id % 4 = 2 GROUP BY 1, 2, 3)
       |SELECT fg.type1, fg.path, fg.type2,
       |       fg.cnt AS fg_cnt,
       |       floor(fg.cnt * ln(fg.cnt) / (coalesce(bg.cnt, 0) + 1)
       |             * 1e6 + 0.5) / 1e6 AS score
       |FROM fg LEFT JOIN bg ON fg.type1 = bg.type1 AND fg.path = bg.path
       |                    AND fg.type2 = bg.type2""".stripMargin

  val kgBootstrapScores: String =
    s"""$baseCte$xtraCte,
       |inst AS (
       |  SELECT ($personsL)[pi+1] || ':::' ||
       |         CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS arg_pair,
       |         ($pathsL)[ri] AS path
       |  FROM bb
       |  UNION ALL SELECT $tourPerson || ':::' || $tourGpe, 'nsubj-1:tour:dobj'
       |  FROM xx WHERE k7 = 1
       |  UNION ALL SELECT $pronPerson || ':::' || $tourGpe, 'nsubj-1:tour:dobj'
       |  FROM xx WHERE k7 = 2
       |  UNION ALL SELECT $namePerson || ':::' || $tourGpe, 'nsubj-1:tour:dobj'
       |  FROM xx WHERE k7 = 4
       |  UNION ALL SELECT $quantPerson || ':::' || $quantGpe, 'nsubj-1:visit:dobj'
       |  FROM xx WHERE k7 = 6
       |  UNION ALL SELECT $moneyPerson || ':::' || $moneyObj, 'nsubj-1:pay:dobj'
       |  FROM xx WHERE k7 = 3
       |  UNION ALL SELECT $sp1 || ':::' || $sp2, 'nsubj-1:marry:dobj'
       |  FROM xx WHERE k7 = 5
       |),
       |seed_pairs AS (SELECT DISTINCT arg_pair FROM inst
       |               WHERE path = ${sqlStr(Gen.predPaths(0))}),
       |totals AS (SELECT path, count(DISTINCT arg_pair) AS total_count
       |           FROM inst GROUP BY 1),
       |shared AS (
       |  SELECT i.path, count(DISTINCT i.arg_pair) AS score
       |  FROM inst i JOIN seed_pairs s ON i.arg_pair = s.arg_pair GROUP BY 1
       |)
       |SELECT t.path, t.total_count, coalesce(sh.score, 0) AS score
       |FROM totals t LEFT JOIN shared sh ON t.path = sh.path
       |WHERE t.path <> ${sqlStr(Gen.predPaths(0))}""".stripMargin

  /** O2: candidate ranking over the bootstrap scores — path→repr is a
    * pure function of the (finite) path inventory; dedupe-by-repr and
    * the 200-cap are no-ops on this inventory (distinct reprs, < 200
    * rows), so the oracle is scores + repr + floored norm. */
  lazy val kgBootstrapCandidates: String = {
    val reprCase = (Gen.predPaths.zip(Gen.predPhrases).map { case (p, ph) =>
      s"WHEN ${sqlStr(p)} THEN ${sqlStr(s"person $ph gpe")}"
    } ++ Seq(
      "WHEN 'nsubj-1:tour:dobj' THEN 'person toured gpe'",
      "WHEN 'nsubj-1:pay:dobj' THEN 'person paid money'",
      "WHEN 'nsubj-1:marry:dobj' THEN 'person(1) married person(2)'"))
      .mkString(" ")
    s"""WITH sc AS ($kgBootstrapScores)
       |SELECT path, total_count, score,
       |       CASE path $reprCase END AS repr,
       |       floor(CAST(score AS DOUBLE) / greatest(total_count, 1)
       |             * 1e6 + 0.5) / 1e6 AS norm_score
       |FROM sc
       |WHERE CAST(score AS DOUBLE) / greatest(total_count, 1) >= 0.05""".stripMargin
  }

  val kgEvents: String =
    s"""$baseCte$xtraCte
       |SELECT key, count(*) AS cnt FROM (
       |  SELECT $fvLemmaSql || ' nsubj:' ||
       |         $fn1Sql || ' dobj:' ||
       |         $fn2Sql AS key
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL
       |  SELECT 'visit nsubj:PERSON dobj:GPE' FROM bb WHERE ri = 2
       |  UNION ALL SELECT 'tour nsubj:PERSON dobj:GPE' FROM xx WHERE k7 IN (1, 4)
       |  UNION ALL SELECT 'visit nsubj:PERSON dobj:' || $quantNoun
       |  FROM xx WHERE k7 = 6
       |  UNION ALL SELECT 'pay nsubj:PERSON dobj:MONEY' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT 'marry nsubj:PERSON dobj:PERSON' FROM xx WHERE k7 = 5
       |) GROUP BY 1""".stripMargin

  /** Event instance counts: keys keep the (lemmatized) argument VALUES —
    * filler events carry their noun pair, visit events the person last
    * name + city surface (lowercased by lemma()). */
  val kgEventInstances: String =
    s"""$baseCte$xtraCte
       |SELECT key, count(*) AS cnt FROM (
       |  SELECT $fvLemmaSql || ' nsubj:' ||
       |         $fn1Sql || ' dobj:' ||
       |         $fn2Sql AS key
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL
       |  SELECT 'visit nsubj:' || ${lastOf(s"($personsL)[pi+1]")} ||
       |         ' dobj:' ||
       |         lower(CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END)
       |  FROM bb WHERE ri = 2
       |  UNION ALL SELECT 'tour nsubj:' || ${lastOf(tourPerson)} ||
       |            ' dobj:' || lower($tourGpe) FROM xx WHERE k7 = 1
       |  UNION ALL SELECT 'tour nsubj:' || lower($nameWord) ||
       |            ' dobj:' || lower($tourGpe) FROM xx WHERE k7 = 4
       |  UNION ALL SELECT 'visit nsubj:' || ${lastOf(quantPerson)} ||
       |            ' dobj:' || $quantNoun FROM xx WHERE k7 = 6
       |  UNION ALL SELECT 'pay nsubj:' || ${lastOf(moneyPerson)} ||
       |            ' dobj:million' FROM xx WHERE k7 = 3
       |  UNION ALL SELECT 'marry nsubj:' || ${lastOf(sp1)} ||
       |            ' dobj:' || ${lastOf(sp2)} FROM xx WHERE k7 = 5
       |) GROUP BY 1""".stripMargin

  /** Event repr table: one linearized English-ish repr + first example
    * per type key. On this grammar each type key determines its repr, so
    * the shorter-repr merge is exercised in unit tests and trivially
    * consistent here. */
  val kgEventRepr: String =
    s"""$baseCte$xtraCte
       |SELECT key, repr, min(example) AS example FROM (
       |  SELECT $fvLemmaSql || ' nsubj:' ||
       |         $fn1Sql || ' dobj:' ||
       |         $fn2Sql AS key,
       |         $fn1Sql || ' ' ||
       |         $fvLemmaSql || ' ' ||
       |         $fn2Sql AS repr,
       |         $fillerTextSql AS example
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL
       |  SELECT 'visit nsubj:PERSON dobj:GPE', 'person visit gpe',
       |         $mainTextSql
       |  FROM bb WHERE ri = 2
       |  UNION ALL SELECT 'tour nsubj:PERSON dobj:GPE', 'person tour gpe',
       |            $tourText FROM xx WHERE k7 = 1
       |  UNION ALL SELECT 'tour nsubj:PERSON dobj:GPE', 'person tour gpe',
       |            $nameText FROM xx WHERE k7 = 4
       |  UNION ALL SELECT 'visit nsubj:PERSON dobj:' || $quantNoun,
       |            'person visit ' || $quantNoun, $quantText
       |  FROM xx WHERE k7 = 6
       |  UNION ALL SELECT 'pay nsubj:PERSON dobj:MONEY', 'person pay money',
       |            $moneyText FROM xx WHERE k7 = 3
       |  UNION ALL SELECT 'marry nsubj:PERSON dobj:PERSON', 'person marry person',
       |            $marryText FROM xx WHERE k7 = 5
       |) GROUP BY 1, 2""".stripMargin

  /** Event triples: filler sentences (even ids) yield
    * (n1, filler-verb-lemma, n2); 'visited' main sentences (ri=2) yield
    * (lemma of person head token, visit, lemma of city surface). */
  val kgEventTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       |       $fn1Sql AS subj,
       |       $fvLemmaSql AS pred,
       |       $fn2Sql AS obj
       |FROM documents d WHERE d.doc_id % 2 = 0
       |UNION ALL
       |SELECT CAST(id AS VARCHAR),
       |       lower(string_split(($personsL)[pi+1], ' ')[2]),
       |       'visit',
       |       lower(CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END)
       |FROM bb WHERE ri = 2
       |UNION ALL SELECT CAST(id AS VARCHAR), ${lastOf(tourPerson)}, 'tour',
       |          lower($tourGpe) FROM xx WHERE k7 = 1
       |UNION ALL SELECT CAST(id AS VARCHAR), lower($nameWord), 'tour',
       |          lower($tourGpe) FROM xx WHERE k7 = 4
       |UNION ALL SELECT CAST(id AS VARCHAR), ${lastOf(quantPerson)}, 'visit',
       |          $quantNoun FROM xx WHERE k7 = 6
       |UNION ALL SELECT CAST(id AS VARCHAR), ${lastOf(moneyPerson)}, 'pay',
       |          'million' FROM xx WHERE k7 = 3
       |UNION ALL SELECT CAST(id AS VARCHAR), ${lastOf(sp1)}, 'marry',
       |          ${lastOf(sp2)} FROM xx WHERE k7 = 5""".stripMargin

  /** The full path-repr inventory as a VALUES table — a pure function of
    * the (finite) generator grammar: one (type1, path, type2, repr) per
    * typed path, reprs being the shortest linearization each path
    * produces (the repr-table merge keeps the shortest). */
  private lazy val reprValues: String = {
    val rows = Gen.predPaths.zip(Gen.predPhrases).map { case (p, ph) =>
      s"('PERSON',${sqlStr(p)},'GPE',${sqlStr(s"person $ph gpe")})"
    } ++ Seq(
      "('PERSON','nsubj-1:tour:dobj','GPE','person toured gpe')",
      "('PERSON','nsubj-1:pay:dobj','MONEY','person paid money')",
      "('PERSON(1)','nsubj-1:marry:dobj','PERSON(2)','person(1) married person(2)')")
    s"rp(type1, path, type2, repr) AS (VALUES ${rows.mkString(", ")})"
  }

  /** F5: normalized-POS histogram — per-sentence-type token tag counts
    * recomputed from the grammar (the tokenizer/POS contract). */
  val kgPosHistogram: String =
    s"""$baseCte$xtraCte,
       |cnt(tag, n) AS (
       |  SELECT 'nn', 2 FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL SELECT 'vb', 1 FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL SELECT 'o',
       |    3 + CASE WHEN d.doc_id % 6 = 0 THEN 1 ELSE 0 END
       |  FROM documents d WHERE d.doc_id % 2 = 0
       |  UNION ALL SELECT 'nnp', 3 FROM bb
       |  UNION ALL SELECT 'vb', CASE WHEN ri = 5 THEN 2 ELSE 1 END FROM bb
       |  UNION ALL SELECT 'o', CASE WHEN ri = 2 THEN 1 ELSE 2 END FROM bb
       |  UNION ALL SELECT 'nnp', CASE k7 WHEN 1 THEN 3 WHEN 2 THEN 1
       |    WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 4 ELSE 3 END FROM xx
       |  UNION ALL SELECT 'nn', 1 FROM xx WHERE k7 IN (3, 6)
       |  UNION ALL SELECT 'vb', 1 FROM xx
       |  UNION ALL SELECT 'o', CASE k7 WHEN 2 THEN 2 WHEN 3 THEN 3
       |    WHEN 6 THEN 3 ELSE 1 END FROM xx
       |)
       |SELECT tag, CAST(sum(n) AS BIGINT) AS cnt FROM cnt GROUP BY 1""".stripMargin

  /** F14: only the bornIn sentences decode — every other candidate must
    * go through the soft matcher, where the same-path same-relation
    * negative rule vetoes it. */
  val kgVchRuleTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id,
       |  ($personsL)[pi+1] AS subj, 'bornIn' AS pred,
       |  CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS obj
       |FROM bb WHERE ri = 5""".stripMargin

  /** O5/J4-fuzzy: the six exact-resolved rules plus residesIn resolved
    * to the argmin-Levenshtein repr, tie-broken (d, repr, type1, path,
    * type2) exactly like the Scala min-struct. */
  lazy val kgFuzzyRules: String =
    s"""WITH $reprValues,
       |best AS (
       |  SELECT type1, path, type2 FROM rp
       |  ORDER BY levenshtein(repr, 'person resides in gpe'),
       |           repr, type1, path, type2
       |  LIMIT 1)
       |SELECT * FROM ($kgRules)
       |UNION ALL
       |SELECT type1 || '--' || path || '--' || type2,
       |       'residesIn',
       |       type1 || '--' || path || '--' || type2 || ' = residesIn'
       |FROM best""".stripMargin

  /** A11: embedding-centroid bootstrap scores over the repr inventory —
    * vectors are sums of the fixed word embedding, centroid = the seed
    * repr's vector, score = cosine quantized as floor(x·1e6 + 0.5)/1e6
    * (engine-portable — same IEEE ops as BootstrapStage). */
  lazy val kgBootstrapEmbScores: String = {
    val emb = graft.pipeline.KgPipeline.bootstrapEmbedding.toSeq.sortBy(_._1)
      .map { case (w, v) => s"(${sqlStr(w)},${v(0)},${v(1)})" }.mkString(", ")
    s"""WITH $reprValues,
       |emb(w, x, y) AS (VALUES $emb),
       |rw AS (SELECT type1, path, type2, repr,
       |              unnest(string_split(repr, ' ')) AS w FROM rp),
       |rv AS (SELECT type1, path, type2, repr,
       |              coalesce(sum(e.x), 0) AS vx, coalesce(sum(e.y), 0) AS vy
       |       FROM rw LEFT JOIN emb e ON e.w = rw.w GROUP BY 1, 2, 3, 4),
       |cen AS (SELECT vx AS cx, vy AS cy FROM rv
       |        WHERE repr = 'person lives in gpe')
       |SELECT type1, path, type2, repr,
       |  floor(CASE WHEN sqrt(vx*vx + vy*vy) = 0 OR sqrt(cx*cx + cy*cy) = 0
       |             THEN 0.0
       |             ELSE (cx*vx + cy*vy) / sqrt(cx*cx + cy*cy)
       |                  / sqrt(vx*vx + vy*vy) END * 1e6 + 0.5) / 1e6
       |    AS score
       |FROM rv, cen WHERE repr <> 'person lives in gpe'""".stripMargin
  }

  val kgRules: String =
    s"""$baseCte,
       |p AS (SELECT DISTINCT ($pathsL)[ri] AS path, ($predsL)[ri] AS rel FROM bb)
       |SELECT 'PERSON--' || path || '--GPE' AS pattern,
       |       rel AS rel_name,
       |       'PERSON--' || path || '--GPE = ' || rel AS rule_line
       |FROM p""".stripMargin

  val kgTriplesSoft: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id,
       |  ($personsL)[pi+1] AS subj,
       |  CASE WHEN ri = 6 THEN 'bornIn' ELSE ($predsL)[ri] END AS pred,
       |  CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS obj
       |FROM bb
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $tourPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 1
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $pronPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 2
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $namePerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 4
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $quantPerson, 'visited', $quantGpe
       |FROM xx WHERE k7 = 6""".stripMargin

  /** X2 coref slice: the pronoun sentences' triples alone — subject is
    * always the resolved antecedent. */
  val kgCorefTriples: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id, $pronPerson AS subj,
       |       'visited' AS pred, $tourGpe AS obj
       |FROM xx WHERE k7 = 2""".stripMargin

  /** A15/J9: P/R of the soft decode (kgTriplesSoft) vs the full decode
    * (kgTriples) — distinct-triple semi/anti counts, like
    * Export.score. */
  lazy val kgTriplePr: String =
    s"""WITH kk AS ($kgTriples),
       |rr AS ($kgTriplesSoft),
       |k AS (SELECT DISTINCT doc_id, subj, pred, obj FROM kk),
       |r AS (SELECT DISTINCT doc_id, subj, pred, obj FROM rr),
       |c AS (SELECT count(*) AS n FROM r WHERE EXISTS (
       |  SELECT 1 FROM k WHERE k.doc_id = r.doc_id AND k.subj = r.subj
       |    AND k.pred = r.pred AND k.obj = r.obj)),
       |s AS (SELECT count(*) AS n FROM r WHERE NOT EXISTS (
       |  SELECT 1 FROM k WHERE k.doc_id = r.doc_id AND k.subj = r.subj
       |    AND k.pred = r.pred AND k.obj = r.obj)),
       |m AS (SELECT count(*) AS n FROM k WHERE NOT EXISTS (
       |  SELECT 1 FROM r WHERE k.doc_id = r.doc_id AND k.subj = r.subj
       |    AND k.pred = r.pred AND k.obj = r.obj))
       |SELECT c.n AS correct, s.n AS spurious, m.n AS missing,
       |       floor(CAST(c.n AS DOUBLE) / (c.n + s.n) * 1e6 + 0.5) / 1e6
       |         AS precision,
       |       floor(CAST(c.n AS DOUBLE) / (c.n + m.n) * 1e6 + 0.5) / 1e6
       |         AS recall
       |FROM c, s, m""".stripMargin

  /** A15/J9 faithful-scorer oracle: entity alignment = every mention's
    * head END char offset (string-length arithmetic over the generated
    * surface forms, cumulative sentence offsets via a window sum);
    * relation consumption degenerates to 1 key + 1 response per
    * (doc, unordered offset pair) group on this corpus, so the counts
    * are: correct = every decoded instance except the withheld diedIn
    * ones (which respond as bornIn → type errors), money instances
    * decode on neither side (no PERSON-MONEY rule), and the
    * opposite-order marriage mentions are correct ONLY via the
    * symmetric swap alignment. */
  lazy val kgMentionPr: String = {
    val fillerText = fillerTextSql
    val mainText = mainTextSql
    val xtraText =
      s"""CASE x.k7 WHEN 1 THEN $tourText WHEN 2 THEN $pronText
         |WHEN 3 THEN $moneyText WHEN 4 THEN $nameText WHEN 5 THEN $marryText
         |ELSE $quantText END""".stripMargin
    s"""$baseCte$xtraCte,
       |flen AS (
       |  SELECT d.doc_id AS id,
       |         CASE WHEN d.doc_id % 2 = 0 THEN len($fillerText) ELSE 0 END AS fl
       |  FROM documents d),
       |mt AS (SELECT bb.*, $mainText AS mtext, ($personsL)[pi+1] AS pers FROM bb),
       |mo AS (SELECT mt.*, fl + coalesce(sum(len(mtext)) OVER (
       |         PARTITION BY mt.id ORDER BY s
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |       FROM mt JOIN flen ON flen.id = mt.id),
       |xoff AS (SELECT x.id, fl + t.tot AS xo
       |         FROM xx x JOIN flen ON flen.id = x.id
       |         JOIN (SELECT id, sum(len(mtext)) AS tot FROM mt GROUP BY 1) t
       |           ON t.id = x.id),
       |ents AS (
       |  SELECT id, off + len(pers) AS e FROM mo
       |  UNION ALL SELECT id, off + len(mtext) - 1 FROM mo
       |  UNION ALL SELECT x.id, xo + CASE x.k7
       |      WHEN 1 THEN len($tourPerson)
       |      WHEN 2 THEN CASE WHEN ($gendersL)[tpi+1] = 'M' THEN 2 ELSE 3 END
       |      WHEN 3 THEN len($moneyPerson)
       |      WHEN 4 THEN len($nameWord)
       |      WHEN 5 THEN len($sp1)
       |      ELSE len($quantPerson) END
       |    FROM xx x JOIN xoff ON xoff.id = x.id
       |  UNION ALL SELECT x.id, xo + len($xtraText) - 1
       |    FROM xx x JOIN xoff ON xoff.id = x.id),
       |ec AS (SELECT count(*) AS n FROM (SELECT DISTINCT id, e FROM ents)),
       |rc AS (SELECT
       |  (SELECT count(*) FROM bb WHERE ri <> 6) +
       |  (SELECT count(*) FROM xx WHERE k7 <> 3) AS c,
       |  (SELECT count(*) FROM bb WHERE ri = 6) AS t)
       |SELECT ec.n AS correct_ents,
       |  CAST(0 AS BIGINT) AS spurious_ents, CAST(0 AS BIGINT) AS missing_ents,
       |  rc.c AS correct_rels, rc.t AS type_errors,
       |  CAST(0 AS BIGINT) AS spurious_rels, CAST(0 AS BIGINT) AS missing_rels,
       |  floor(rc.c * 1.0 / (rc.c + rc.t) * 1e6 + 0.5) / 1e6 AS precision,
       |  floor(rc.c * 1.0 / (rc.c + rc.t) * 1e6 + 0.5) / 1e6 AS recall,
       |  floor(2.0 * (rc.c * 1.0 / (rc.c + rc.t)) * (rc.c * 1.0 / (rc.c + rc.t))
       |        / ((rc.c * 1.0 / (rc.c + rc.t)) + (rc.c * 1.0 / (rc.c + rc.t)))
       |        * 1e6 + 0.5) / 1e6
       |    AS f1
       |FROM ec, rc""".stripMargin
  }


  /** Embedding-backed soft matching: with movedTo removed, `moved to`
    * paths re-rank to worksIn because sim(move,work)=0.9 and
    * sim(to,in)=0.6 shrink the substitution costs (0.08 normalized) —
    * under exact-word similarity the alphabetical tie-break would pick
    * bornIn, so this output is observably embedding-driven. */
  val kgTriplesEmbSoft: String =
    s"""$baseCte$xtraCte
       |SELECT CAST(id AS VARCHAR) AS doc_id,
       |  ($personsL)[pi+1] AS subj,
       |  CASE WHEN ri = 4 THEN 'worksIn' ELSE ($predsL)[ri] END AS pred,
       |  CASE WHEN al THEN ($aliasesL)[gi+1] ELSE ($gpesL)[gi+1] END AS obj
       |FROM bb
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $tourPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 1
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $pronPerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 2
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $namePerson, 'visited', $tourGpe
       |FROM xx WHERE k7 = 4
       |UNION ALL
       |SELECT CAST(id AS VARCHAR), $quantPerson, 'visited', $quantGpe
       |FROM xx WHERE k7 = 6""".stripMargin

  /** Term doc/total frequencies (A3) over the combined term+name set. */
  val kgTermCounts: String =
    s"""$termsCte
       |SELECT term, count(DISTINCT id) AS doc_freq, count(*) AS total_freq
       |FROM t GROUP BY 1""".stripMargin

  /** A3 per-doc leg (rawCount parity, flat). */
  val kgTermDocCounts: String =
    s"""$termsCte
       |SELECT term, CAST(id AS VARCHAR) AS doc_id, count(*) AS cnt
       |FROM t GROUP BY 1, 2""".stripMargin

  private val goldL = sqlList(graft.pipeline.KgPipeline.expansionGold)

  /** Train-mode cost sweep (RelaxedDepPathRelationTagger.java:203-241):
    * full 216-point grid recomputed from closed-form alignment costs.
    * With `visited` withheld, the only soft-match decisions are 3-node
    * candidates (visit/tour/money — all sharing one distance form `dv`:
    * verb substitution min(r, d+i), two label/word insertions 2i, and an
    * end-label leg min(2.5, d+i)) against the five 5-node rules, plus
    * the marriage candidate whose both end labels mismatch (dv plus one
    * more min(2.5, d+i)). PathsSpec pins these closed forms to the
    * weighted DP across the entire grid. A cross-relation soft match
    * can only produce type errors against the full-rule dev key, so
    * F1 = 2PR/(P+R) with correct = the exact-decoded count E,
    * keys = E + V (visit-labeled candidates), responses growing with
    * each matching candidate family; argmax with the (f1 desc, replace,
    * insert, delete) tie-break. Match threshold: dist/5 < 0.5 ⇔
    * dist < 2.5 — every lattice distance is a multiple of 0.2, never
    * within 0.1 of the threshold, so the comparison is float-safe. */
  lazy val kgTunedCosts: String =
    s"""$baseCte$xtraCte,
       |cnts AS (
       |  SELECT
       |    (SELECT count(*) FROM bb WHERE ri <> 2) AS e,
       |    (SELECT count(*) FROM bb WHERE ri = 2)
       |      + (SELECT count(*) FROM xx WHERE k7 IN (1, 2, 4, 6)) AS v,
       |    (SELECT count(*) FROM xx WHERE k7 = 3) AS mny,
       |    (SELECT count(*) FROM xx WHERE k7 = 5) AS mar),
       |grid(c) AS (SELECT unnest([0.2, 0.4, 0.6, 0.8, 1.0, 1.2])),
       |sweep AS (
       |  SELECT r.c AS rc, i.c AS ic, d.c AS dc,
       |         least(r.c, d.c + i.c) + 2 * i.c
       |           + least(2.5, d.c + i.c) AS dv,
       |         least(2.5, d.c + i.c) AS endleg
       |  FROM grid r, grid i, grid d),
       |scored AS (
       |  SELECT rc, ic, dc,
       |    e * 1.0 / (e + CASE WHEN dv < 2.5 THEN v + mny ELSE 0 END
       |      + CASE WHEN dv + endleg < 2.5 THEN mar ELSE 0 END) AS p,
       |    e * 1.0 / (e + v) AS r
       |  FROM sweep, cnts),
       |fsc AS (SELECT rc, ic, dc,
       |               CASE WHEN p + r = 0 THEN 0
       |                    ELSE 2 * p * r / (p + r) END AS f1u
       |        FROM scored)
       |SELECT rc AS replace_cost, ic AS insert_cost, dc AS delete_cost,
       |       floor(f1u * 1e6 + 0.5) / 1e6 AS f1
       |FROM fsc ORDER BY f1u DESC, rc, ic, dc LIMIT 1""".stripMargin

  /** Simulation scorer (Simulation.java:17-70): per-rank P/R + ROC of
    * the expansion ranking vs the gold noun list — tpr = tp/|gold|
    * (= recall), fpr = fp/(N - |gold|) with N = the FULL ranking size
    * (rocScore's arithmetic verbatim), emitted for the same
    * [[graft.pipeline.KgPipeline.SimAt]]-capped prefix as the Spark
    * side. */
  lazy val kgEntitySim: String = {
    val goldN = graft.pipeline.KgPipeline.expansionGold.size
    val simAt = graft.pipeline.KgPipeline.SimAt
    s"""WITH r AS (
       |  SELECT term,
       |         row_number() OVER (ORDER BY score DESC, term) AS rank
       |  FROM ($kgEntityExpansion)),
       |rr AS (SELECT CAST(rank AS INT) AS rank, term,
       |              list_contains($goldL, term) AS is_gold
       |       FROM r WHERE rank <= $simAt),
       |c AS (SELECT rank, term, is_gold,
       |             sum(CASE WHEN is_gold THEN 1 ELSE 0 END)
       |               OVER (ORDER BY rank) AS tp,
       |             (SELECT count(*) FROM r) AS n
       |      FROM rr)
       |SELECT rank, term, is_gold,
       |       floor(tp * 1.0 / rank * 1e6 + 0.5) / 1e6 AS precision_at,
       |       floor(tp * 1.0 / $goldN * 1e6 + 0.5) / 1e6 AS recall_at,
       |       CASE WHEN n > $goldN
       |            THEN floor((rank - tp) * 1.0 / (n - $goldN)
       |                       * 1e6 + 0.5) / 1e6
       |            ELSE NULL END AS fpr
       |FROM c""".stripMargin
  }

  /** EDT-type dict (JetEngineBuilder.java:104-117): `noun | DEMO:DEMO 1`
    * lines over the DEMO entity set = sorted seeds + the top-SimAt
    * expansion ranking (the same bounded prefix the Spark side
    * collects). */
  lazy val kgEdtDict: String =
    s"""WITH r AS (SELECT term FROM ($kgEntityExpansion)
       |           ORDER BY score DESC, term
       |           LIMIT ${graft.pipeline.KgPipeline.SimAt}),
       |nouns AS (
       |  SELECT ${sqlStr(Gen.fillNouns(0))} AS noun
       |  UNION ALL SELECT ${sqlStr(Gen.fillNouns(1))}
       |  UNION ALL SELECT term FROM r)
       |SELECT noun, 'DEMO' AS etype,
       |       noun || ' | DEMO:DEMO 1' AS dict_line
       |FROM nouns""".stripMargin

  /** S11 status-store round-trip: the expected flattened status table —
    * corpora properties (including the quoting-stress note with colons,
    * quotes, tabs and a newline, rebuilt here from chr() codes), the
    * DEMO entity set in expansion-rank order, and one path per relation
    * from the rule inventory. Any quote/escape corruption in the Spark
    * side's YAML file round-trip diverges from this recomputation. */
  lazy val kgStatusRoundtrip: String =
    s"""WITH exp AS (
       |  SELECT term, rn FROM (
       |    SELECT term,
       |           row_number() OVER (ORDER BY score DESC, term) AS rn
       |    FROM ($kgEntityExpansion))
       |  WHERE rn <= ${graft.pipeline.KgPipeline.SimAt}),
       |rel AS (SELECT rel_name, pattern,
       |               row_number() OVER (PARTITION BY rel_name
       |                                  ORDER BY pattern) AS rn
       |        FROM ($kgRules))
       |SELECT 'corpora' AS section, 'main' AS name,
       |       'docCount' AS item_key,
       |       CAST(count(*) AS VARCHAR) AS item_value FROM documents
       |UNION ALL SELECT 'corpora', 'main', 'source', 'documents.parquet'
       |UNION ALL SELECT 'corpora', 'main', 'note',
       |  'synthetic: "interleaved" corpus' || chr(9) || 'with' || chr(9) ||
       |  'tabs' || chr(10) || 'and a newline'
       |UNION ALL SELECT 'entitySets', 'DEMO', CAST(rn - 1 AS VARCHAR), term
       |FROM exp
       |UNION ALL SELECT 'relations', rel_name, CAST(rn - 1 AS VARCHAR),
       |  pattern
       |FROM rel""".stripMargin
}
