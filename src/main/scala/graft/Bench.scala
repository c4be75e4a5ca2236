package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r21: the whole-stage-codegen class cache defaults to 100
      // entries; a 154-query suite (or any long-running driver serving
      // many distinct plans — the 100 TB posture) thrashes it and pays
      // Janino recompile + classload on every re-run of every plan
      // (ZipFile.getEntryPos was a measured suite-wide profile line).
      // 5000 entries ≈ a few hundred MB ceiling of generated classes,
      // appropriate wherever a driver serves a dashboard/query mix.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb
    // session startup; touches the two fact tables' footers once.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/events.parquet").count()
    // JIT-warm the shared signature kernels (shingle/minhash/simhash/
    // hyperplane/cosine/NFC): whichever dedup/similarity query happens
    // to run first in map order would otherwise absorb their compile
    // time — round-over-round that made per-query numbers depend on
    // suite ORDER, not on the plans being measured.
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.SignatureExpressions._
      val warm = spark.range(50000L).selectExpr(
        "concat('quick brown fox ', id % 97, ' jumps over the lazy dog ', id % 13) AS t",
        "array(cast(id % 7 as double), 1.5, -2.25, 3.0) AS v")
      warm.select(
          minhashes(shingle_hashes(split(col("t"), " "), 3), 16).as("mh"),
          simhash64(split(col("t"), " ")).as("sh"),
          hyperplane_bucket(col("v"), 8).as("hb"),
          cosine_sim(col("v"), col("v")).as("cs"),
          length(nfc_casefold(col("t"))).as("nc"))
        .selectExpr("sum(size(mh))", "max(sh)", "max(hb)", "sum(cs)", "sum(nc)")
        .collect()
    }
    // Three timed runs per query, report the min: a single local[32]
    // pass is noisy (JIT warmup, GC pauses land on whichever query is
    // running), and kernel-heavy queries need ~2 passes before the JIT
    // compiles their hot loops; the min is the throughput the plan
    // actually sustains — which is what a warm long-running executor
    // delivers at the 100 TB design point.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 re-measures a subset under the SAME
    // session config and warm-up as the full suite — profiling a
    // "regressed" query under a different harness invites the
    // environmental misdiagnosis round 3 suffered
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(keys) => SparkEntry.queries.filter { case (k, _) => keys(k) }
      case None => SparkEntry.queries
    }
    // Machine load is THE confound this suite keeps re-litigating (rounds
    // 3–6 each spent forensic effort separating "plan regressed" from
    // "box was busy"). Record /proc/loadavg at bench start and end so the
    // reading is a fact in the artifact, not a reconstruction.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "unavailable" }
    val loadStart = loadavg()
    // r18 (VERDICT r17 task 3): two consecutive rounds of driver-run
    // forensics proved ambient load, not plan changes, drove the
    // headline ratio (r16 1.58x, r17 1.39x apparent — both collapse on
    // best-of-round evidence). Stamp the contamination verdict INTO the
    // artifact so no reader has to reconstruct it from iteration
    // spreads. 3.0 on the 32-core box ≈ 10% steal — above that,
    // per-query mins stop being plan measurements.
    // toDoubleOption, not toDouble: a typo'd env var must not abort a
    // full interleaved bench pair at startup
    val loadLimit = sys.env.get("SPARK_GRAFT_LOAD_LIMIT")
      .flatMap(_.toDoubleOption).getOrElse(3.0)
    val loadContaminated =
      try loadStart.split("\\s+").head.toDouble > loadLimit
      catch { case scala.util.control.NonFatal(_) => false }
    if (loadContaminated)
      System.err.println(
        s"BENCH: WARNING loadavg $loadStart exceeds $loadLimit at start — " +
          "timings will be load-contaminated; artifact is flagged " +
          "load_contaminated:true. Re-run on a quiet box before " +
          "re-pinning baselines or adjudicating regressions.")
    val raw = selected.map { case (name, fn) =>
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // isolate queries: intermediate caches (LSH signatures etc.) must
        // not squeeze the next query's execution memory
        spark.catalog.clearCache()
        (ok, elapsed)
      }
      name -> times
    }
    // Locale.ROOT: a comma decimal separator from the default locale would
    // corrupt the JSON.
    def f(d: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    // a failed iteration must not report its (fast) failure time as
    // sustained throughput: min over successes only, -1 if none
    val firstResults = raw.map { case (name, times) =>
      val good = times.filter(_._1).map(_._2)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    // Pinned per-query baselines, parsed EARLY: they drive both the r20
    // load-noise self-defense below and the vs_baseline block.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE_BENCH.json")
    val basePins: Map[String, Double] = try {
      val fl = new java.io.File(baselinePath)
      if (!fl.exists()) Map.empty
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val q = om.readTree(fl).get("queries")
        if (q == null) Map.empty
        else {
          val it = q.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble(-1.0) }
          b.result()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // r20 load-noise self-defense (SURVEY §6 bench contract): a key
    // whose min exceeds 3x its pin on a SHARED box is far more often a
    // load spike that straddled all its iterations than a plan change
    // (r19's driver run flagged 10x phantoms that two quiet runs
    // dissolved). Re-measure such keys once more in the SAME JVM after
    // the suite — the spike has usually passed — report BOTH readings
    // under "remeasured", and let the confirmed min stand as the key's
    // value, so the mover lists only flag regressions that survive a
    // second look. Sub-0.3s keys skip (spread noise dominates there).
    val suspects = firstResults.toSeq.filter { case (k, v) =>
      basePins.get(k).exists(b => v > 0 && b > 0 && v > 3 * b &&
        math.max(v, b) >= 0.3)
    }
    val remeasured: Seq[(String, Double, Double)] = suspects.map { case (k, first) =>
      val fn = selected(k)
      val again = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (ok, elapsed)
      }.filter(_._1).map(_._2)
      (k, first, if (again.nonEmpty) again.min else first)
    }
    val results = firstResults ++ remeasured.map { case (k, first, again) =>
      k -> math.min(first, again)
    }
    val remeasureJson = remeasured.sortBy(_._1).map { case (k, first, again) =>
      s"\"" + k + "\":{\"first\":" + f(first) + ",\"remeasure\":" + f(again) +
        ",\"confirmed\":" + (again > 3 * basePins.getOrElse(k, 0.0)) + "}"
    }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // Per-iteration times + relative spread, so an environmental outlier
    // (GC pause, machine load during one pass) is distinguishable from a
    // plan change without rerunning the whole suite. spread = (max-min)/min
    // over successful iterations; > ~0.5 means the min is not a stable
    // reading for that query.
    val itersJson = raw.map { case (k, times) =>
      s"\"" + k + "\":" + times.map { case (ok, t) => if (ok) f(t) else "-1" }
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val spreadJson = raw.map { case (k, times) =>
      val good = times.filter(_._1).map(_._2)
      val spread =
        if (good.size < 2 || good.min <= 0) -1.0
        else (good.max - good.min) / good.min
      s"\"" + k + "\":" + f(spread)
    }.mkString("{", ",", "}")
    // failed queries carry a -1 sentinel — they must not SUBTRACT from
    // the headline total
    val total = results.values.filter(_ >= 0).sum
    val loadEnd = loadavg()
    // sfDir/outPath come from the environment; a path with a quote or
    // backslash must not corrupt the one JSON line the driver parses
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench-out.json")
    val loadJson = s""""loadavg_start":${jstr(loadStart)},"loadavg_end":${jstr(loadEnd)},"load_contaminated":$loadContaminated"""
    // Streaming gates also record a drain rate (input rows ÷ summed
    // micro-batch time) — wall-clock timing alone hides whether a
    // streaming regression is in the drain or in the batch read-back.
    val streamJson = graft.queries.LwesQueries.streamThroughput.toSeq
      .sortBy(_._1).map { case (k, (rows, secs)) =>
        s"\"" + k + "\":{\"events\":" + rows + ",\"secs\":" + f(secs) +
          ",\"events_per_sec\":" + f(rows / secs) + "}"
      }.mkString("{", ",", "}")
    // Measured ANN recall@10 (recorded by the sim_*_recall gates as
    // they run): the floors are hash-gated booleans, but the VALUES
    // belong in the round artifact so a recall regression is visible
    // without re-reading gate internals.
    val annJson = graft.queries.Pipeline.annRecall.toSeq
      .sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // Pinned numeric baseline (VERDICT r12 task 6): when
    // BASELINE_BENCH.json exists (committed quiet-box per-query mins),
    // emit each query's current/baseline ratio plus the >1.5x movers —
    // so "within 2x of baseline" is a mechanical diff in the round
    // artifact, not round-history archaeology. Keys where BOTH current
    // and baseline are sub-0.3s are skipped in the mover lists (spread
    // noise dominates there, the documented §6 signature). Ratios use
    // the POST-remeasure values, so the mover lists only name keys
    // whose slowdown survived the second look. A missing/corrupt file
    // simply omits the block.
    val vsBaselineJson: Option[String] =
      if (basePins.isEmpty) None
      else {
        val ratios = results.toSeq.sortBy(_._1).flatMap { case (k, cur) =>
          val b = basePins.getOrElse(k, -1.0)
          if (cur > 0 && b > 0) Some((k, cur / b, b)) else None
        }
        val ratioJson = ratios.map { case (k, r, _) =>
          s"\"" + k + "\":" + f(r)
        }.mkString("{", ",", "}")
        // Noise floor on max(cur, base), not base alone: a 0.12s
        // baseline key that grows to 0.8s is exactly what the mover
        // list exists to surface (r13 verdict: text_chunks 6.7x was
        // hidden by the base-only floor).
        val slower = ratios.filter { case (_, r, b) => r > 1.5 && math.max(r * b, b) >= 0.3 }
          .map(_._1)
        val faster = ratios.filter { case (_, r, b) => r < 0.67 && math.max(r * b, b) >= 0.3 }
          .map(_._1)
        def arr(xs: Seq[String]) = xs.map(jstr).mkString("[", ",", "]")
        Some(s""""vs_baseline":{"ratios":$ratioJson,"slower_1_5x":${arr(slower)},"faster_1_5x":${arr(faster)}}""")
      }
    val vsBaseline = vsBaselineJson.map("," + _).getOrElse("")
    val json = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"iterations":$itersJson,"spread":$spreadJson,"streaming":$streamJson,"ann_recall":$annJson,"remeasured":$remeasureJson,"iters_per_query":$iters,$loadJson$vsBaseline,"sf":${jstr(sfDir)}}"""
    // Stdout tail capture can truncate the front of a very long single
    // line (BENCH_r03 parsed null that way) — persist to a file too, so
    // round-over-round comparison never depends on stdout buffer length.
    // A write failure must be VISIBLE (the file is the reliable channel),
    // but must not fail the bench whose numbers are already in hand.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"BENCH: failed to write $outPath: $e")
    }
    println(json)
    // The full line above is one very long JSON object; a stdout tail
    // window can truncate its FRONT and leave nothing parseable (BENCH_r03
    // and r04 both landed as parsed:null that way). Print a SHORT summary
    // object LAST — total, query count, sf, and where the full per-query
    // data lives — so any tail capture ends with a complete JSON line.
    // metric name differs from the full line's "total" so a consumer that
    // sums every metric:total line cannot double-count the run.
    println(s"""{"metric":"total_summary","value":${f(total)},"unit":"sec","n_queries":${results.size},"iters_per_query":$iters,$loadJson,"sf":${jstr(sfDir)},"detail":${jstr(outPath)}}""")
    spark.stop()
  }
}
