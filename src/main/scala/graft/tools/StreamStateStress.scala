package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Ingest-side streaming state at 10x+ (r17 verdict task 7): the C35
  * settle chain is 100x-audited (docs/SCALE_STRESS.md), but the
  * INGEST-side state stores — `nearDupBandVerdicts` bucket signature
  * lists and `dedupFirstSeen` booleans — only had sf0.1-scale gate
  * evidence plus spec-level saturation rows. This tool drives a
  * deterministic `mult`x (default 10x) planted-family corpus through
  * BOTH streaming operators, records each stateful operator's PEAK
  * state rows/bytes from the query progress history, and proves the
  * kept sets against batch oracles computed with INDEPENDENT plans:
  *
  *   - keep-best near-dup stream: the oracle replays the same greedy
  *     semantics wave by wave in BATCH mode (per-bucket sequential
  *     scan in (quality desc, id) order against signatures
  *     accumulated from prior waves, cap honored) — the stream's
  *     flatMapGroupsWithState never runs in the oracle; equality is
  *     exact-set equality on kept doc_ids, or the run FAILS (rc 1).
  *   - exact-dedup stream: oracle = first wave each text_md5 appears,
  *     smallest doc_id within that wave — a plain window argmin.
  *
  * The derived corpus reuses the keep-best gate's planted-family shape
  * (x4 id-space: every doc, a copy for every 3rd, a tail-variant for
  * every 5th) on top of the ScaleStress text-salted `mult`x documents
  * derivation, so cross-copy docs are genuine near-duplicates and the
  * band buckets see `mult`-times the family density — the saturation
  * direction that matters for the capped signature lists.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_SCALE_MULT (default 10), SPARK_GRAFT_SCALE_DIR
  * (default target/streamstress), SPARK_GRAFT_STRESS_WAVES (default
  * 12), SPARK_GRAFT_SCALE_JSON (default docs/STREAM_STATE_STRESS.json),
  * SPARK_GRAFT_CPUS (default 32).
  */
object StreamStateStress {

  private def env(k: String, d: String) = sys.env.getOrElse(k, d)

  def main(args: Array[String]): Unit = {
    val sfDir = env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = env("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val root = env("SPARK_GRAFT_SCALE_DIR", "target/streamstress")
    val waves = env("SPARK_GRAFT_STRESS_WAVES", "12").toInt
    val jsonOut = env("SPARK_GRAFT_SCALE_JSON", "docs/STREAM_STATE_STRESS.json")
    val cpus = env("SPARK_GRAFT_CPUS", "32").toInt

    val spark = SparkSession.builder()
      .appName("graft-stream-state-stress")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // peaks are read from recentProgress, which retains only this
      // many updates — keep it above any plausible wave count so early
      // micro-batches can never silently fall out of the max
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- derived corpus: ScaleStress multx documents + planted families
    val derived = s"$root/x$mult"
    ScaleStress.derive(spark, sfDir, derived, mult)
    val base = spark.read.parquet(s"$derived/documents.parquet")
    val corpus = base
      .select((col("doc_id") * 4).as("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .unionAll(base.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") * 4 + 1).as("doc_id"), col("text"),
          col("lang"), col("n_chars").cast("long")))
      .unionAll(base.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") * 4 + 2).as("doc_id"),
          concat(col("text"), lit(" extra tail words")).as("text"),
          col("lang"), col("n_chars").cast("long")))
      .withColumn("quality", length(col("text")).cast("double"))
      // wave = contiguous doc_id range, the gate's mtime-ordered shape
      .withColumn("wave", ntile(waves).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    corpus.write.mode("overwrite").partitionBy("wave")
      .parquet(s"$root/waves")
    val wavesDf = spark.read.parquet(s"$root/waves")
    val nDocs = wavesDf.count()
    println(s"[stream-stress] corpus: $nDocs docs in $waves waves (mult=$mult)")

    // ---- 1. keep-best near-dup stream over a file-per-wave source
    val srcDir = s"$root/src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcDir))
    new java.io.File(srcDir).mkdirs()
    // one parquet file per wave, mtime-ordered, so maxFilesPerTrigger=1
    // replays the gate's one-wave-per-micro-batch contract
    (1 to waves).foreach { w =>
      val f = s"$srcDir/wave-$w.parquet"
      val one = wavesDf.filter(col("wave") === w)
        .select("doc_id", "text", "lang", "n_chars", "quality")
        .repartition(1)
      one.write.mode("overwrite").parquet(s"$f.tmp")
      val part = new java.io.File(s"$f.tmp").listFiles()
        .find(x => x.getName.endsWith(".parquet") && !x.getName.startsWith("."))
        .get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(f))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$f.tmp"))
      new java.io.File(f).setLastModified(1700000000000L + w * 60000L)
    }

    val keptDir = s"$root/kept"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(keptDir))
    val ckpt = s"$root/ckpt-${System.nanoTime()}"
    val t0 = System.nanoTime()
    val q = {
      val in = spark.readStream
        .schema("doc_id long, text string, lang string, n_chars long, quality double")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .as[StreamOps.QNearDocRow]
      StreamOps.nearDupKeepBestVerdicts(spark, in)
        .writeStream
        .foreachBatch { (b: Dataset[StreamOps.BandVerdict], _: Long) =>
          StreamOps.keepUncollided(b.toDF())
            .write.mode("append").parquet(keptDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    val peakRows = if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max
    val peakBytes = if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max
    val streamKept = spark.read.parquet(keptDir).select("doc_id")
      .as[Long].collect().toSet
    println(f"[stream-stress] keepbest stream: ${streamKept.size} kept, " +
      f"peak state rows=$peakRows bytes=$peakBytes wall=$streamSec%.1f s")

    // ---- batch oracle: exact sequential replay, no streaming
    // machinery. Bucket state in the stream evolves sequentially —
    // wave by wave, within a wave in (quality desc, id) order — and
    // buckets are independent, so ONE batch flatMapGroups per bucket
    // scanning its rows in (wave, quality desc, id) order with the
    // identical stored-list rule (contains-dedup, cap) reproduces
    // every verdict, including cap-order effects on saturated buckets.
    // No state store, no micro-batches, one shuffle on bucket.
    val maxHamming = 3
    val maxBucket = 1024
    val keptOracle = wavesDf
      .withColumn("__sh", graft.operators.Dedup.simhashPortable(col("text")))
      .select(col("wave"), col("doc_id"), col("quality"), col("__sh").as("sig"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("__sh"), 12 * i).bitwiseAND(lit(0xfffL))): _*))
          .as(Seq("band", "bval")))
      .withColumn("bucket", (col("band").cast("long") * 4096L) + col("bval"))
      .select(col("bucket"), col("wave"), col("doc_id"), col("quality"), col("sig"))
      .as[(Long, Int, Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, it: Iterator[(Long, Int, Long, Double, Long)]) =>
        val rows = it.toArray.sortBy(r => (r._2, -r._4, r._3))
        var stored = List.empty[Long]
        var n = 0
        rows.iterator.map { r =>
          val hit = stored.exists(s =>
            java.lang.Long.bitCount(s ^ r._5) <= maxHamming)
          if (n < maxBucket && !stored.contains(r._5)) {
            stored = r._5 :: stored; n += 1
          }
          (r._3, hit)
        }
      }
      .toDF("doc_id", "collided")
      .groupBy("doc_id").agg(max(col("collided")).as("c"))
      .filter(!col("c")).select("doc_id").as[Long].collect().toSet

    val onlyStream = streamKept -- keptOracle
    val onlyOracle = keptOracle -- streamKept
    val equal = onlyStream.isEmpty && onlyOracle.isEmpty
    println(s"[stream-stress] keepbest equality: stream=${streamKept.size} " +
      s"oracle=${keptOracle.size} onlyStream=${onlyStream.size} " +
      s"onlyOracle=${onlyOracle.size} equal=$equal")

    // ---- 2. exact-dedup stream (dedupFirstSeen booleans)
    val dedupSrc = wavesDf
      .select(col("wave"), col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("n_chars"))
    val keptDir2 = s"$root/kept-exact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(keptDir2))
    val ckpt2 = s"$root/ckpt2-${System.nanoTime()}"
    val t1 = System.nanoTime()
    val q2 = {
      val in = spark.readStream
        .schema("doc_id long, text string, lang string, n_chars long, quality double")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("lang"),
          col("n_chars"))
        .as[StreamOps.DocRow]
      StreamOps.dedupFirstSeen(spark, in)
        .writeStream.format("parquet")
        .option("path", keptDir2)
        .option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q2.awaitTermination()
    val dedupSec = (System.nanoTime() - t1) / 1e9
    val stateOps2 = q2.recentProgress.flatMap(_.stateOperators)
    val peakRows2 = if (stateOps2.isEmpty) 0L else stateOps2.map(_.numRowsTotal).max
    val peakBytes2 = if (stateOps2.isEmpty) 0L else stateOps2.map(_.memoryUsedBytes).max
    val streamKept2 = spark.read.parquet(keptDir2).select("doc_id")
      .as[Long].collect().toSet
    // oracle: first wave a hash appears; smallest doc_id within it
    val oracle2 = dedupSrc
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_md5")
          .orderBy(col("wave"), col("doc_id"))))
      .filter(col("__rn") === 1).select("doc_id").as[Long].collect().toSet
    val equal2 = streamKept2 == oracle2
    println(s"[stream-stress] exact-dedup equality: stream=${streamKept2.size} " +
      s"oracle=${oracle2.size} equal=$equal2 peak rows=$peakRows2 bytes=$peakBytes2")

    val loadavg = scala.util.Try(
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg")).trim)
      .getOrElse("?")
    val json =
      f"""{"mult":$mult,"waves":$waves,"docs":$nDocs,"loadavg":"$loadavg","keepbest":{"kept_stream":${streamKept.size},"kept_oracle":${keptOracle.size},"equal":$equal,"peak_state_rows":$peakRows,"peak_state_bytes":$peakBytes,"stream_sec":$streamSec%.1f},"exact_dedup":{"kept_stream":${streamKept2.size},"kept_oracle":${oracle2.size},"equal":$equal2,"peak_state_rows":$peakRows2,"peak_state_bytes":$peakBytes2,"stream_sec":$dedupSec%.1f}}"""
    println(json)
    val p = java.nio.file.Paths.get(jsonOut)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json + "\n")
    spark.stop()
    if (!equal || !equal2) {
      System.err.println("[stream-stress] KEPT-SET MISMATCH — failing")
      sys.exit(1)
    }
  }
}
