package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Failures are not swallowed: a failed query
  * records its duration under "queries" AND its message under "errors",
  * and the line carries an "err_count" — a regression shows up red, not
  * as a suspiciously fast bench. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core (the driver contract benches at local[32] on
    // this box): an unset SPARK_GRAFT_CPUS must not silently measure a
    // local[4] run against local[32] baselines
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/ScalingBench: timestamp queries must not do
      // host-timezone-dependent work under spark-submit (build.sbt only
      // injects the -D for sbt-forked runs)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jstr(s: String): String = graft.core.JsonUtil.str(s)
    // untimed warmup: JIT + codegen + parquet reader init, so the first
    // timed query doesn't absorb ~5s of JVM warmup
    try {
      spark.range(0, 1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100).count()
    } catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // default 3 reps (override via SPARK_GRAFT_REPS): the whole query
    // set repeats; the line reports per-query MEDIANS across reps plus
    // EVERY rep's raw total, so host-mode drift (BASELINE.md: ±30%
    // run-to-run on this microVM) is visible inside one JSON artifact —
    // round-3's single-rep file could not distinguish a regression from
    // a degraded-host window
    val repsRaw = sys.env.get("SPARK_GRAFT_REPS")
    // malformed value → warn + default, never an uncaught
    // NumberFormatException that aborts the run before any JSON line
    val reps = repsRaw.flatMap(_.trim.toIntOption).map(_ max 1).getOrElse {
      repsRaw.foreach(v =>
        System.err.println(s"[bench] ignoring malformed SPARK_GRAFT_REPS=$v"))
      3
    }
    // dev-only focus filter (comma-separated names): time a handful
    // of queries with the same warmup/clearCache discipline as the
    // full set — the driver never sets this
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // ANY unknown name — or a filter that names nothing at all (e.g.
    // SPARK_GRAFT_ONLY="," splits to the empty set) — fails the run on
    // the JSON line itself (exit 1), never a stderr-only warning: a
    // partially-matching list would otherwise produce a green artifact
    // silently missing the misspelled query, an empty one a zero-query
    // "impossibly fast pass" — and stderr can fall outside the driver's
    // stdout-tail capture, so a targeted re-verification would read as
    // passing without ever having run
    only.map(_.diff(SparkEntry.queries.keySet))
      .collect {
        case u if u.nonEmpty =>
          s"unknown SPARK_GRAFT_ONLY queries: ${u.toSeq.sorted.mkString(",")}"
        case _ if only.exists(_.isEmpty) =>
          "SPARK_GRAFT_ONLY matched no queries"
      }
      .foreach { msg =>
        println(s"""{"metric":"total","value":0.00,"unit":"sec","queries":{},"err_count":1,"errors":{"_config":${jstr(msg)}},"rep_totals":[],"sf":${jstr(sfName(sfDir))}}""")
        spark.stop()
        sys.exit(1)
      }
    def oneRep(rep: Int): scala.collection.immutable.ListMap[String, Double] = {
      // multi-rep runs tag failures with the rep index, so an error
      // surfacing only in rep 2+ must not read as a rep-1 failure
      val tag = if (reps > 1) s"rep $rep: " else ""
      val pairs = SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // NonFatal only: an OOM/LinkageError must abort the run — timings
        // recorded after a fatal error in this JVM would be garbage that
        // looks legitimate
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          errors(name) = tag +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          System.err.println(s"[bench] $name FAILED: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // release any blocks a query's pipeline persisted (long-lived
        // sessions must not accumulate cache across queries) — OUTSIDE
        // the timed window: block release is session bookkeeping, not
        // query cost
        spark.catalog.clearCache()
        name -> dt
      }
      scala.collection.immutable.ListMap.from(pairs)
    }
    val allReps = (1 to reps).map(oneRep)
    // headline = per-query MEDIAN across reps: rep 1 alone carries every
    // one-time codegen/JIT cost (text_trainset's large filter expression
    // is ~24 s on rep 1 and ~1 s after) and this host drifts ±30%
    // between runs — a first-rep total systematically overstates steady
    // state. rep_totals keeps every raw rep visible alongside.
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = allReps.head.map { case (name, _) =>
      name -> median(allReps.map(_(name)))
    }
    // the driver's stdout-tail capture keeps exactly the LAST 2,000
    // bytes — round 4's 3-decimal 78-query line was 2,031 bytes, so the
    // {"metric":… prefix fell off and `parsed` stayed null. Per-query
    // times print at 1 decimal (100 ms — still 100× below this host's
    // ±30% run-to-run drift): the 81-query 2-decimal line measured
    // 1,965 bytes at sf0.001/1-rep, within ~35 bytes of the cliff once
    // sf0.1 medians and 3-rep totals widen it. Together with omitting
    // the empty errors object / redundant reps key and shortening sf
    // to the basename, the line stays comfortably under the window.
    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def fmtQ(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => jstr(k) + ":" + fmtQ(v) }
      .mkString("{", ",", "}")
    // omit the errors object entirely when empty: err_count:0 already
    // says it, and every byte counts against the 2,000-byte window
    val errs =
      if (errors.isEmpty) ""
      else "\"errors\":" + errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString("{", ",", "},")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // rep count = rep_totals.length; a separate "reps" key is redundant.
    // 1 decimal: raw rep totals exist to expose ±30% host drift — 100 ms
    // resolution is already 100× below that signal, and the saved bytes
    // buy query-count headroom inside the 2,000-byte capture window
    val totals = allReps.map(r =>
      "%.1f".formatLocal(java.util.Locale.ROOT, r.values.sum))
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"err_count":${errors.size},$errs"rep_totals":$totals,"sf":${jstr(sfName(sfDir))}}"""
    if (line.getBytes("UTF-8").length >= 1950)
      System.err.println(s"[bench] WARNING: JSON line ${line.getBytes("UTF-8").length}" +
        " bytes — approaching the driver's 2,000-byte tail-capture window")
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  /** Basename of the SF dir ("/root/testdata/sf0.1" → "sf0.1") — the
    * full path spent 16 bytes of the tail-capture window on a constant
    * prefix. */
  private def sfName(dir: String): String = {
    val trimmed = dir.reverse.dropWhile(_ == '/').reverse
    val base = trimmed.substring(trimmed.lastIndexOf('/') + 1)
    if (base.nonEmpty) base else dir
  }
}
