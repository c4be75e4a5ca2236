package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Spans, TextAnalysis}
import graft.queries.Tables

/** Scale-stress audit (r13 verdict task 1): the driver testdata is
  * capped at sf0.1 and read-only, so the "survives 100×" claims in
  * SURVEY §2 are otherwise design arguments. This tool DERIVES a
  * deterministic `mult`× corpus from sf0.1 — union of id-shifted,
  * text-salted / vector-perturbed copies; the testdata directory is
  * never written — and pushes the heaviest operator chains through it
  * at 1× and `mult`×, reporting wall-clock and output rows per op so
  * superlinear blowups (all-pairs joins, driver-side collections,
  * single-task collapses) surface as measured time, not review
  * opinion.
  *
  * Derivation keeps the STRESSFUL structure real: each copy's text
  * gets a two-token salt drawn from a ~1000-word pool (cross-copy
  * docs become NEAR-duplicates, so dedup components grow ~mult-wide
  * and the C2/C16/C34 chains do mult× more edge work, while the BPE
  * vocab stays under its 65536 guard); embeddings get ±0.001
  * per-dimension deterministic noise (cross-copy vectors are
  * semantic near-dups at cosine ≈ 0.9999, densifying every ANN cell);
  * events keep their time range (10× density, same span — the 100 TB
  * shape where more traffic lands in the same day).
  *
  * ANN query sets are held at a FIXED size across scales (hash-rate
  * sampling), matching production serving: corpus-side cost must
  * scale ~linearly at constant query load.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_SCALE_MULT (default 10), SPARK_GRAFT_SCALE_DIR
  * (default target/scalestress), SPARK_GRAFT_SCALE_ITERS (default 2),
  * SPARK_GRAFT_SCALE_JSON (artifact path; default
  * docs/SCALE_STRESS.json), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_SCALE_ONLY (comma-separated op filter).
  */
object ScaleStress {

  private def env(k: String, d: String) = sys.env.getOrElse(k, d)

  def main(args: Array[String]): Unit = {
    val sfDir = env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = env("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val root = env("SPARK_GRAFT_SCALE_DIR", "target/scalestress")
    val iters = env("SPARK_GRAFT_SCALE_ITERS", "2").toInt
    val jsonOut = env("SPARK_GRAFT_SCALE_JSON", "docs/SCALE_STRESS.json")
    val cpus = env("SPARK_GRAFT_CPUS", "32").toInt
    val only: Set[String] = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(',').toSet).getOrElse(Set.empty)

    val spark = SparkSession.builder()
      .appName("graft-scale-stress")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val derived = s"$root/x$mult"
    derive(spark, sfDir, derived, mult)

    val scales = Seq("1x" -> sfDir, s"${mult}x" -> derived)
    val results = scala.collection.mutable.LinkedHashMap[String, Map[String, (Double, Long)]]()

    for ((opName, op) <- ops(spark, root) if only.isEmpty || only(opName)) {
      val perScale = for ((label, dir) <- scales) yield {
        var best = Double.MaxValue; var rows = 0L
        for (_ <- 0 until iters) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = op(dir)
          val sec = (System.nanoTime() - t0) / 1e9
          if (sec < best) best = sec
        }
        println(f"[scale-stress] $opName%-28s $label%-5s ${best}%8.2f s  rows=$rows")
        label -> (best, rows)
      }
      results(opName) = perScale.toMap
    }

    val loadavg = scala.util.Try(
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg")).trim)
      .getOrElse("?")
    val big = scales.last._1
    val opJson = results.map { case (name, m) =>
      val (s1, r1) = m("1x"); val (sN, rN) = m(big)
      f""""$name":{"sec_1x":$s1%.3f,"sec_${big}":$sN%.3f,"rows_1x":$r1,"rows_$big":$rN,"time_ratio":${sN / s1}%.2f}"""
    }.mkString(",")
    val json = s"""{"mult":$mult,"iters":$iters,"cpus":$cpus,"loadavg":"$loadavg","ops":{$opJson}}"""
    println(json)
    val p = java.nio.file.Paths.get(jsonOut)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json + "\n")
    spark.stop()
  }

  /** Deterministic `mult`× derivation of documents/embeddings/events
    * into `out` (idempotent: skipped when the marker file exists). */
  def derive(spark: SparkSession, sfDir: String, out: String, mult: Int): Unit = {
    val marker = java.nio.file.Paths.get(s"$out/_DERIVED_$mult")
    if (java.nio.file.Files.exists(marker)) return

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until mult).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .withColumn("text", concat(col("text"), lit(s" rp$i s"),
          pmod(hash(col("doc_id"), lit(i)), lit(997)).cast("string")))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until mult).map { i =>
      if (i == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> cast(x + (pmod(hash(vec_id * 1024 + j, $i), 200) - 100) / 100000.0d as float))"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // ts normalized to epoch-nano longs by Tables.events; written back
    // as LONG, which Tables.events reads verbatim on the derived dir.
    val ev = Tables.events(spark, sfDir)
    (0 until mult).map { i =>
      if (i == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.writeString(marker, "ok\n")
  }

  /** The heavy chains. Each op maps a table dir to a forced action's
    * output row count; wall time is measured around the WHOLE body
    * (training collects and writes included — those are exactly the
    * steps that could hide superlinear driver-side work). */
  def ops(spark: SparkSession, root: String): Seq[(String, String => Long)] = {
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    def fatZsjPath(dir: String): String =
      s"$root/zsj/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    def writeFatZsj(dir: String): Unit = {
      val out = fatZsjPath(dir)
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(out), true)
      Tables.events(spark, dir)
        .withColumn("ReceiptTime", expr("ts div 1000000"))
        .select("event_id", "user_id", "event_type", "value", "ReceiptTime")
        .repartition(1)
        .write.format("lwes").option("eventName", "Stress::E")
        .option(graft.sources.lwes.LwesOptions.Compression, "split-zstd")
        .mode("append").save(out)
    }

    Seq(
      // C14: the full clean-corpus pipeline gate body (exact dedup →
      // quality filter → minhash near-dup anti-join → decontamination).
      "clean_corpus_pipeline" -> { dir: String =>
        graft.SparkEntry.queries("pipeline_clean_corpus")(spark, dir).count()
      },

      // C2+C16+C34: LSH pairs → star CC → quality keep-best.
      "dedup_minhash_cc_keepbest" -> { dir: String =>
        val d = docs(dir)
        val pairs = Dedup.minhashPairs(d, "text", "doc_id",
          k = 32, bands = 8, w = 3, threshold = 0.8)
        val cc = Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"))
          .withColumnRenamed("id", "doc_id")
        Dedup.keepBestPerCluster(d, cc, "doc_id",
          col("n_chars").cast("double")).count()
      },

      // C35 settle path: portable-simhash pairs → CC → keep-best.
      "reconcile_keepbest" -> { dir: String =>
        graft.streaming.StreamOps.reconcileKeepBest(docs(dir),
          "doc_id", "text", col("n_chars").cast("double")).count()
      },

      // C35 settle path, r15 shape: the pair stage fed from the
      // stream's persisted signature journal (here computed batch-side
      // with the same kernel) — the full-text corpus parses once, and
      // this op measures that the sig-fed chain scales like the
      // from-text one minus the re-shingle.
      "reconcile_from_sigs" -> { dir: String =>
        val d = docs(dir)
        val sigs = d.select(col("doc_id"),
          Dedup.simhashPortable(col("text")).as("sig"))
        graft.streaming.StreamOps.reconcileKeepBest(d,
          "doc_id", "text", col("n_chars").cast("double"),
          sigs = Some(sigs)).count()
      },

      // C35 settle-path EQUIVALENCE at scale (r17 verdict task 5): runs
      // BOTH reconcile chains and fails unless the survivor sets are
      // IDENTICAL — the r15 "identical survivors" claim, promoted from
      // a 1×/10× observation to a measured requirement at whatever
      // mult this audit runs (100× for the r17 addendum). Also prints
      // the two quantities the verdict flagged as the ones that could
      // bend at 100×: banded-bucket max occupancy (vs the 8192
      // saturation cap) and the verified pair count; star-CC round
      // growth is covered by its own convergence guard (throws at 25).
      "reconcile_equiv" -> { dir: String =>
        val d = docs(dir)
        val sigs = d.select(col("doc_id"),
          Dedup.simhashPortable(col("text")).as("sig"))
        val occ = sigs.select(
            posexplode(array((0 until 4).map(i =>
              shiftrightunsigned(col("sig"), 12 * i)
                .bitwiseAND(lit(0xfffL))): _*)).as(Seq("band", "bval")))
          .groupBy(col("band"), col("bval")).count()
          .agg(max(col("count"))).head().getLong(0)
        val pairs = Dedup.simhashPairsFromSigs(sigs, "doc_id", "sig",
          maxHamming = 3, bits = 48).count()
        println(s"[scale-stress] reconcile_equiv max band occupancy = " +
          s"$occ (saturation cap 8192), verified pairs = $pairs")
        val fromText = graft.streaming.StreamOps.reconcileKeepBest(
          d, "doc_id", "text", col("n_chars").cast("double"))
        val fromSigs = graft.streaming.StreamOps.reconcileKeepBest(
          d, "doc_id", "text", col("n_chars").cast("double"),
          sigs = Some(sigs))
        val a = fromText.select("doc_id")
        val b = fromSigs.select("doc_id")
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        require(diff == 0, s"reconcile survivor sets diverge by $diff docs")
        fromText.count()
      },

      // C37: Lloyd training (treeAggregate) + within-cell dedup. The
      // cell count follows the SemDeDup parameter law (k ≈ n/occ, see
      // Similarity.suggestedCells): the first run of this audit held
      // k=16 FIXED across scales and measured the predicted Θ(n²/k)
      // blowup (184× time at 100× data) — within-cell all-pairs is
      // quadratic in occupancy, so the cell count must scale with the
      // corpus. At 100× this also exercises the large-k tight-loop
      // nearest_cell path (k=400 > the 64-cell unroll limit).
      "semantic_dedup_kmeans" -> { dir: String =>
        val e = emb(dir)
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("v_c"))
        val k = Similarity.suggestedCells(e.count())
        val cents = Similarity.kmeansCentroids(c, nLists = k, iters = 2)
          .orderBy(col("centroid_id")).collect()
          .map(_.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq)
          .toIndexedSeq
        Similarity.semanticDedupKMeans(e, "vec_id", "embedding",
          threshold = 0.95, cents).count()
      },

      // C37 with the O(sample·√k·dim) two-level trainer — same dedup,
      // same parameter law; the delta vs semantic_dedup_kmeans is the
      // trainer. At production k ≈ 10⁵ the flat trainer is ~√k ≈ 316×
      // more training FLOPs; here the corpora are small enough that
      // both fit, so this op mainly proves the hierarchical path stays
      // linear and correct end-to-end at 100×.
      "semantic_dedup_hier" -> { dir: String =>
        val e = emb(dir)
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("v_c"))
        val k = Similarity.suggestedCells(e.count())
        val cents = Similarity.kmeansCentroidsHierarchical(c, nLists = k)
          .orderBy(col("centroid_id")).collect()
          .map(_.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq)
          .toIndexedSeq
        Similarity.semanticDedupKMeans(e, "vec_id", "embedding",
          threshold = 0.95, cents).count()
      },

      // A-surface planning at FILE-COUNT scale (the ADVICE footer
      // concern): events spread over rows/5000 journals (20 → 2000
      // files across 1×..100×), then one full scan — wall time covers
      // listing, parallel footer fetch + cache, bin-packing, and the
      // read itself. Superlinear driver-side planning would surface
      // here long before 10⁶-file production layouts.
      "journal_plan_manyfiles" -> { dir: String =>
        val ev = Tables.events(spark, dir)
          .withColumn("ReceiptTime", expr("ts div 1000000"))
          .select("event_id", "user_id", "event_type", "value", "ReceiptTime")
        val nFiles = math.max(4L, ev.count() / 5000L).toInt
        val out = s"$root/manyfiles/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
        org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(out), true)
        ev.repartition(nFiles)
          .write.format("lwes").option("eventName", "Many::E")
          .mode("append").save(out)
        val n = spark.read.format("lwes")
          .schema("event_id long, user_id long, event_type string, " +
            "value double, ReceiptTime long")
          .option("eventName", "Many::E").load(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)), countDistinct(col("user_id")))
          .count()
        n
      },

      // C32 at scale: journal-sourced stateful dedup drain through the
      // lwes sink. 8 source journals at maxFilesPerTrigger=2 give 4
      // micro-batches at EVERY scale, so batch size — and the
      // flatMapGroupsWithState key space (≈ one key per distinct doc)
      // — grows with the corpus: 5k → 500k state keys across 1×..100×.
      // Measures the drain's per-row cost staying flat as state grows.
      "stream_dedup_drain" -> { dir: String =>
        import spark.implicits._
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val src = s"$root/streamsrc/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
        fs.delete(new org.apache.hadoop.fs.Path(src), true)
        docs(dir).select(col("doc_id"), md5(col("text")).as("text_md5"),
            col("lang"), col("n_chars").cast("long").as("n_chars"))
          .repartition(8)
          .write.format("lwes").option("eventName", "SS::D")
          .mode("append").save(src)
        val dst = java.nio.file.Files.createTempDirectory("ss-drain-dst").toString
        val ckpt = java.nio.file.Files.createTempDirectory("ss-drain-ck").toString
        val in = spark.readStream.format("lwes")
          .schema("doc_id long, text_md5 string, lang string, n_chars long")
          .option("eventName", "SS::D")
          .option("maxFilesPerTrigger", "2").load(src)
          .as[graft.streaming.StreamOps.DocRow]
        val q = graft.streaming.StreamOps.dedupFirstSeen(spark, in)
          .toDF()
          .writeStream.format("lwes")
          .option("eventName", "SS::O")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
        spark.read.format("lwes")
          .schema("doc_id long, text_md5 string, lang string, n_chars long")
          .option("eventName", "SS::O").load(dst).count()
      },

      // C30/C7: residual IVF-PQ with refine, FIXED ~40-query load.
      "ivfpq_refine_topk" -> { dir: String =>
        val e = emb(dir)
        val n = e.count()
        val rate = math.max(1L, n / 40L)
        val q = e.filter(pmod(xxhash64(col("vec_id")), lit(rate)) === 0)
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 10,
          nLists = 16, nprobe = 4, m = 16, ks = 32,
          residual = true, refine = 50).count()
      },

      // C28: cross-doc repeated-span mining (explode w-grams → agg).
      "repeated_spans" -> { dir: String =>
        Spans.repeatedSpans(docs(dir), "text", "doc_id",
          w = 8, minDocs = 2).count()
      },

      // C10: corpus-trained BPE (driver-side vocab hard-capped at
      // 65536 — the salt pool keeps real vocab under it) + encode.
      "bpe_train_encode" -> { dir: String =>
        val d = docs(dir)
        val merges = TextAnalysis.trainBpeMerges(d)
        // the metric is the summed BPE token count (head), not count()
        // of the 1-row aggregate — which is always 1 and meaningless
        TextAnalysis.tokenCounts(d, bpeMerges = Some(merges))
          .agg(sum(col("n_bpe"))).head().getLong(0)
      },

      // A22 write side: the whole events table into ONE .zsj journal.
      "zsj_write_fat" -> { dir: String =>
        writeFatZsj(dir)
        1L
      },

      // A22 read side: footer-indexed parallel scan of that one fat
      // file; require > 1 task so a split-path regression fails loudly.
      // Self-sufficient under SPARK_GRAFT_SCALE_ONLY: (re)writes its
      // input if the fat journal from zsj_write_fat isn't on disk.
      "zsj_split_scan" -> { dir: String =>
        val out = fatZsjPath(dir)
        val fs = org.apache.hadoop.fs.FileSystem
          .get(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(out))) writeFatZsj(dir)
        val df = spark.read.format("lwes")
          .schema("event_id long, user_id long, event_type string, " +
            "value double, ReceiptTime long")
          .option("eventName", "Stress::E")
          .option(graft.sources.lwes.LwesOptions.SplitTargetBytes, (1 << 20).toString)
          .load(out)
        require(df.rdd.getNumPartitions > 1,
          s"fat .zsj planned only ${df.rdd.getNumPartitions} task(s)")
        df.groupBy(col("event_type"))
          .agg(count(lit(1)), sum(col("value")), countDistinct(col("user_id")))
          .count()
      }
    )
  }
}
