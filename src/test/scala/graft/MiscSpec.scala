package graft

import graft.operators.{Multimodal, Sessions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Extensions registration, partitioned journal writes, multimodal
  * resize/frame-sample, session/funnel operators. */
class MiscSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("GraftExtensions injects lwes SQL functions via spark.sql.extensions") {
    val r = spark.sql(
      """SELECT lwes_event_name(bin) AS en,
        |       from_lwes(bin, 'id long').id AS id
        |FROM (SELECT to_lwes(named_struct('id', 42L), 'Ext::Reg') AS bin)""".stripMargin).head
    assert(r.getString(0) == "Ext::Reg" && r.getLong(1) == 42L)
  }

  test("approx_count_distinct stays within its rsd bound vs exact (B13 gate query)") {
    // q_approx_distinct gates this same 4x-rsd contract against the
    // DuckDB oracle at sf0.01/sf0.1 (Relational.scala B13); this spec
    // adds sf0.001 coverage and a fast local signal. HLL++ rsd default
    // is 0.05; the 0.01-rsd column uses more registers. 4x rsd is far
    // beyond estimator noise, tight enough to catch a broken sketch.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a5"),
      approx_count_distinct(col("l_partkey"), 0.01).as("a1"),
      countDistinct(col("l_orderkey")).as("e_ord"),
      countDistinct(col("l_partkey")).as("e_part")).head
    val (a5, a1, eOrd, ePart) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(a5 - eOrd).toDouble / eOrd <= 0.20,
      s"orderkey HLL estimate $a5 vs exact $eOrd")
    assert(math.abs(a1 - ePart).toDouble / ePart <= 0.04,
      s"partkey HLL(0.01) estimate $a1 vs exact $ePart")
  }

  test("partitionBy write produces dt= layout readable with partition pruning") {
    val dir = Files.createTempDirectory("lwes-pw").toString
    val df = Seq((1L, "2026-01-01", 10), (2L, "2026-01-01", 20),
      (3L, "2026-01-02", 30), (4L, "2026-01-03", 40))
      .toDF("id", "dt", "amount")
    df.repartition(2).write.format("lwes")
      .option("eventName", "P::E").option("partitionBy", "dt")
      .mode("append").save(dir)
    val dirs = new java.io.File(dir).list().filter(_.startsWith("dt=")).sorted
    assert(dirs.toSeq == Seq("dt=2026-01-01", "dt=2026-01-02", "dt=2026-01-03"))
    val back = spark.read.format("lwes").load(dir)
    assert(back.schema.fieldNames.contains("dt"))
    assert(back.count() == 4)
    // dt rides in the path, not the payload; filter prunes to one dir
    assert(back.filter($"dt" === "2026-01-02").select("id").head.getLong(0) == 3L)
    assert(back.groupBy("dt").agg(sum("amount").as("s")).orderBy("dt")
      .collect().map(_.getLong(1)).toSeq == Seq(30L, 30L, 40L))
  }

  test("multimodal resize emits deterministic fixed-budget bytes") {
    val docs = Seq((1L, "abcdefgh" * 20), (2L, "zyx")).toDF("doc_id", "text")
    val resized = Multimodal.resize(spark, Multimodal.withFakeMedia(docs), 64, 64)
      .orderBy("doc_id").collect()
    assert(resized.length == 2)
    assert(resized.forall(_.resized.length == 64 * 64 / 16))
    val again = Multimodal.resize(spark, Multimodal.withFakeMedia(docs), 64, 64)
      .orderBy("doc_id").collect()
    assert(resized.map(_.resized.toSeq).toSeq == again.map(_.resized.toSeq).toSeq)
  }

  test("multimodal frameSample fans out video rows to frame rows") {
    val docs = (1L to 40L).map(i => (i, s"payload-$i-" + ("x" * 50))).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs)
    val nVideos = media.filter($"media_type" === "video").count()
    assert(nVideos > 0)
    val frames = Multimodal.frameSample(spark, media, 4)
    val byDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    assert(byDoc.size == nVideos)
    assert(byDoc.values.forall(n => n >= 1 && n <= 4))
    assert(frames.collect().forall(f => f.frame.nonEmpty && f.frame_idx >= 0))
  }

  test("sessionize assigns per-user ordinal sessions on gaps") {
    val events = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 5000L, 3L), (1L, 5100L, 4L),
      (2L, 0L, 5L))
      .toDF("user_id", "ts", "event_id")
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id", gap = 1000L)
      .orderBy("user_id", "ts").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 1L, 2L, 2L, 1L))
  }

  test("funnelCounts counts ordered-stage completion") {
    val events = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full
      (2L, "view", 1L), (2L, "click", 2L), // view+click
      (3L, "click", 1L), (3L, "view", 2L), // out of order
      (4L, "view", 9L)) // view only
      .toDF("user_id", "event_type", "ts")
    val r = Sessions.funnelCounts(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).head
    assert(r.getLong(0) == 4L) // n_view
    assert(r.getLong(1) == 2L) // n_click after view
    assert(r.getLong(2) == 1L) // n_purchase after click
  }

  test("bucketed tables co-locate the join: no exchange before the sort-merge join") {
    val wh = Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      (1L to 10000L).map(i => (i % 500, i)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .option("path", s"$wh/ta").saveAsTable("graft_ta")
      (1L to 5000L).map(i => (i % 500, i * 2)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .option("path", s"$wh/tb").saveAsTable("graft_tb")
      val j = spark.table("graft_ta").join(spark.table("graft_tb"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketing pre-partitions both sides: the join needs NO exchange
      // (the only exchange allowed is none at all — the final group-by
      // reuses the join's bucket partitioning too, same key)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q_bucketed_join gate query: join runs with no exchange under the SMJ") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.queries.Relational.all("q_bucketed_join")._1
      q(spark, sf).collect() // first call writes the bucketed tables
      val j = q(spark, sf) // steady state: tables exist, pure join
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY exchange allowed is the 5-group final aggregation;
      // neither join input may shuffle (that's the bucketing win)
      val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      assert(!exchanges.contains("l_orderkey") && !exchanges.contains("o_orderkey"),
        s"join side shuffled: $exchanges\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_li__root_testdata_sf0_001")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_ord__root_testdata_sf0_001")
    }
  }

  test("salted skew join equals plain join and spreads the hot key") {
    import graft.operators.SkewJoin
    // hot key: 90% of left rows share key 1
    val left = (1L to 1000L).map(i => (if (i <= 900) 1L else i, i))
      .toDF("k", "row_id")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum("row_id")).head
    val saltedJ = SkewJoin.salted(left, right, "k", "row_id", salt = 8)
    assert(saltedJ.agg(count(lit(1)), sum("row_id")).head == plain)
    // deterministic
    assert(SkewJoin.salted(left, right, "k", "row_id", salt = 8)
      .agg(sum("row_id")).head == saltedJ.agg(sum("row_id")).head)
  }

  test("salted skew join rejects right/full outer (right-side replication breaks them)") {
    import graft.operators.SkewJoin
    val left = Seq((1L, 1L)).toDF("k", "row_id")
    val right = Seq((2L, "x")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(left, right, "k", "row_id", salt = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.salted(left, right, "k", "row_id", salt = 4, joinType = "full")
    }
    // left_anti stays supported and correct: unmatched left rows survive once
    assert(SkewJoin.salted(left, right, "k", "row_id", salt = 4,
      joinType = "left_anti").count() == 1)
  }

  test("round-trip elimination bails when a struct field shadows an LWES header attr") {
    import graft.functions.LwesExpressions.{from_lwes, to_lwes}
    // SiteID is coerced to uint16 on serialize: 70000 -> 4464. The
    // optimized (collapsed) plan must not silently change that result,
    // so the rule bails and the executed round-trip keeps the coercion.
    val df = Seq((70000L, "a")).toDF("SiteID", "name")
      .select(from_lwes(
        to_lwes(struct($"SiteID", $"name"), "RT::H"),
        "SiteID long, name string").as("e"))
    // if the rule wrongly collapsed the pair, this would read back 70000
    assert(df.select("e.SiteID").head.getLong(0) == 4464L)
    assert(df.select("e.name").head.getString(0) == "a")
  }

  test("optimizer eliminates from_lwes(to_lwes(s)) round-trips") {
    import graft.functions.LwesExpressions.{from_lwes, to_lwes}
    val df = Seq((1L, "a", 2.5), (2L, "b", -1.0)).toDF("id", "name", "score")
      .select(from_lwes(
        to_lwes(struct($"id", $"name", $"score"), "RT::E"),
        "name string, id long").as("e"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("from_lwes") && !opt.contains("FromLwes"))
    assert(df.select("e.id", "e.name").orderBy("e.id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("SQL DDL: CREATE TABLE ... USING lwes works like a Hive serde table") {
    val dir = Files.createTempDirectory("lwes-ddl").toString
    Seq((1L, "u1", 10.5), (2L, "u2", -3.25), (3L, "u1", 7.0))
      .toDF("id", "user", "amount")
      .write.format("lwes").option("eventName", "Tx::Row").mode("append").save(dir)
    spark.sql(s"""
      CREATE TABLE lwes_tx (id BIGINT, user STRING, amount DOUBLE)
      USING lwes OPTIONS (path '$dir', eventName 'Tx::Row')""")
    try {
      val r = spark.sql(
        "SELECT user, count(*) AS n, sum(amount) AS total FROM lwes_tx GROUP BY user ORDER BY user")
        .collect()
      assert(r.map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
        == Seq(("u1", 2L, 17.5), ("u2", 1L, -3.25)))
    } finally spark.sql("DROP TABLE lwes_tx")
  }

  test("AQE splits skewed partitions in a shuffle join (OptimizeSkewedJoin)") {
    // The salted-join operator covers the manual half of the skew story
    // (SkewJoin.scala, q_salted_join); this pins the AQE half: on a
    // synthetic 99%-one-key join, the final adaptive plan must contain a
    // skew-split AQEShuffleRead, so a config regression that silently
    // disables runtime skew handling fails a spec rather than a 100 TB
    // run. Thresholds are lowered because the test data is KBs, not GBs.
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(300000L)
        .selectExpr("IF(id % 100 < 99, 0L, id % 100) AS k", "id AS v")
      val right = spark.range(100L).selectExpr("id AS k", "id * 2 AS w")
      // collect() the join itself: .head/.count would plan a SEPARATE
      // limited query and leave this one's adaptive plan non-final
      val joined = left.join(right, "k")
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true") && plan.toLowerCase.contains("skew"),
        s"expected a skew-split AQEShuffleRead in the final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("zstd journals: DSv2 round-trip, local writer/reader, compaction to zstd") {
    // write side: compression=zstd must emit .zst files readable back
    val dir = Files.createTempDirectory("lwes-zstd").toString
    val src = Seq((1L, "a", 2.5), (2L, "b", -1.0), (3L, "a", 4.25))
      .toDF("id", "tag", "v")
    src.write.format("lwes")
      .option("eventName", "Z::E").option("compression", "zstd")
      .mode("append").save(dir)
    val written = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".zst"))
    assert(written.nonEmpty, "zstd write must produce .zst journals")
    val back = spark.read.format("lwes")
      .schema("id long, tag string, v double").option("eventName", "Z::E")
      .load(dir)
    assert(back.count() == 3)
    assert(back.agg(sum("v")).head.getDouble(0) == 5.75)

    // local-file writer/reader path (tools/specs use it directly)
    val lp = s"$dir/local.journal.zst"
    val w = graft.lwes.JournalWriter.create(lp)
    (0 until 50).foreach(i => w.write(
      graft.lwes.LwesEvent("Z::L").setInt64("id", i.toLong)))
    w.close()
    val r = graft.lwes.JournalReader.open(lp)
    try assert(r.iterator.size == 50) finally r.close()

    // compaction can re-encode gzip journals as zstd and keeps rows
    val cdir = Files.createTempDirectory("lwes-zstd-compact").toString
    (0 until 3).foreach { i =>
      src.withColumn("id", col("id") + lit(i * 10L))
        .write.format("lwes").option("eventName", "Z::E")
        .mode("append").save(cdir)
    }
    val (before, after) = graft.sources.lwes.Compact.compact(
      spark, cdir, targetFiles = 1, compression = "zstd")
    assert(before >= 3 && after == 1)
    val files = new java.io.File(cdir).listFiles.filter(f =>
      f.isFile && !f.getName.startsWith("."))
    assert(files.forall(_.getName.endsWith(".zst")),
      s"compaction output must be zstd: ${files.map(_.getName).toSeq}")
    val cback = spark.read.format("lwes")
      .schema("id long, tag string, v double").option("eventName", "Z::E")
      .load(cdir)
    assert(cback.count() == 9)
  }

  test("torn compressed tails end the file, not the job (zstd + gzip)") {
    // 100 TB reality: some harvested journals are always torn. A
    // truncated zstd frame (ZstdIOException) or corrupt gzip bytes
    // (ZipException) must yield the leading intact events and stop,
    // like the plain-journal EOF tolerance.
    val dir = Files.createTempDirectory("lwes-torn").toString
    def writeJournal(path: String): Unit = {
      val w = graft.lwes.JournalWriter.create(path)
      (0 until 5000).foreach(i => w.write(
        graft.lwes.LwesEvent("T::E").setInt64("id", i.toLong)))
      w.close()
    }
    def truncate(path: String, keep: Double): Unit = {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        java.util.Arrays.copyOf(bytes, (bytes.length * keep).toInt))
    }
    writeJournal(s"$dir/a.journal.zst")
    truncate(s"$dir/a.journal.zst", 0.5)
    writeJournal(s"$dir/b.journal.gz")
    truncate(s"$dir/b.journal.gz", 0.5)
    val df = spark.read.format("lwes").schema("id long").load(dir)
    // No task failure; whatever decodes before each tear survives. gzip
    // (32 KB deflate window) always salvages leading events; zstd's
    // corruption granularity is its 128 KB block, so a small torn file
    // may legitimately contribute 0 rows — the contract is "skip, don't
    // throw", and an intact sibling file is unaffected.
    val n = df.count()
    assert(n > 0 && n < 10000, s"expected a strict subset of 10000 rows, got $n")
    val gz = spark.read.format("lwes").schema("id long")
      .load(s"$dir/b.journal.gz")
    assert(gz.count() > 0, "gzip torn tail must still yield leading events")
  }

  test("DSv2 scan reports eventsParsed/eventsSkipped/tornFiles custom metrics") {
    val dir = Files.createTempDirectory("lwes-metrics").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
      .coalesce(1).write.format("lwes")
      .option("eventName", "M::One").mode("append").save(dir)
    Seq((4L, "d"), (5L, "e")).toDF("id", "t")
      .coalesce(1).write.format("lwes")
      .option("eventName", "M::Two").mode("append").save(dir)
    val df = spark.read.format("lwes").schema("id long, t string")
      .option("eventName", "M::One").load(dir)
    assert(df.collect().length == 3)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val m = scans.head.metrics
    assert(m("eventsParsed").value == 3, m.view.mapValues(_.value).toMap)
    assert(m("eventsSkipped").value == 2, "the two M::Two events are skipped")
    assert(m("tornFiles").value == 0)
    assert(m("corruptRecords").value == 0)
  }

  test("record-level resync: an undecodable payload costs one record, not the file") {
    val dir = Files.createTempDirectory("lwes-resync").toString
    val w = graft.lwes.JournalWriter.create(s"$dir/mixed.journal.gz")
    w.write(graft.lwes.LwesEvent("R::E").setInt64("id", 1L))
    // a correctly FRAMED record whose payload is garbage — captured
    // foreign traffic looks exactly like this
    w.writeRecord(Array.fill[Byte](30)(0xFF.toByte), 0, 30, 0L,
      Array[Byte](0, 0, 0, 0), 0, 0)
    w.write(graft.lwes.LwesEvent("R::E").setInt64("id", 2L))
    w.close()
    val df = spark.read.format("lwes").schema("id long").load(dir)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "events AFTER the bad record must survive (the reference loses them)")
    val m = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.metrics
    assert(m("corruptRecords").value == 1)
    assert(m("tornFiles").value == 0)
  }

  test("partitioned compaction: each dt= partition compacts in place") {
    val dir = Files.createTempDirectory("lwes-compact-part").toString
    val src = Seq((1L, "2026-01-01"), (2L, "2026-01-01"), (3L, "2026-01-02"))
      .toDF("id", "dt")
    // three appends -> 3+ small files per partition
    (0 until 3).foreach { i =>
      src.withColumn("id", col("id") + lit(i * 10L))
        .repartition(2)
        .write.format("lwes").option("eventName", "P::E")
        .option("partitionBy", "dt").mode("append").save(dir)
    }
    val (before, after) = graft.sources.lwes.Compact.compactPartitioned(
      spark, dir, targetFiles = 1)
    assert(before > 2 && after == 2, s"($before, $after)") // 1 file per dt
    val back = spark.read.format("lwes").schema("id long, dt string").load(dir)
    assert(back.count() == 9)
    // partition pruning still works on the compacted layout
    val d1 = back.filter(col("dt") === "2026-01-01")
    assert(d1.count() == 6)
    assert(d1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 11L, 12L, 21L, 22L))
  }

  test("giant unsplittable gzip: Compact restores parallelism, preserves structure") {
    // the giant-journal remediation (r19, tools/GiantJournalBench has
    // the measured numbers): ONE multi-event gzip journal in a
    // partitioned layout is one task by format law; a Compact pass to
    // `.zsj` multiplies tasks while preserving event types, per-event
    // values, and the partition layout exactly
    val dir = Files.createTempDirectory("lwes-giant-compact").toString
    Seq("a", "b").foreach { dt =>
      new java.io.File(s"$dir/dt=$dt").mkdirs()
      val w = graft.lwes.JournalWriter.create(s"$dir/dt=$dt/big.journal.gz")
      (0 until 60000).foreach { i =>
        w.write(graft.lwes.LwesEvent(if (i % 3 == 0) "G::A" else "G::B")
          .setInt64("id", i.toLong).setString("page", s"/p/${i % 7}"))
      }
      w.close()
    }
    // a tiny test corpus needs a tiny split target to show the slicing
    // (gzip files ignore it — unsplittable by format law either way)
    def readAll = spark.read.format("lwes")
      .schema("id long, page string, ev string, dt string")
      .option("eventNameColumn", "ev")
      .option(graft.sources.lwes.LwesOptions.SplitTargetBytes, "65536")
      .load(dir)
    val beforeRows = readAll
      .groupBy(col("dt"), col("ev")).agg(count(lit(1)).as("n"),
        sum(col("id")).as("s"))
      .orderBy(col("dt"), col("ev")).collect().map(_.toString).toSeq
    assert(readAll.rdd.getNumPartitions == 2, "one task per gzip journal")
    val (nb, na) = graft.sources.lwes.Compact.compactPartitioned(
      spark, dir, targetFiles = 4, frameBytes = Some(64 << 10))
    assert(nb == 2 && na >= 2, s"($nb, $na)")
    val afterRows = readAll
      .groupBy(col("dt"), col("ev")).agg(count(lit(1)).as("n"),
        sum(col("id")).as("s"))
      .orderBy(col("dt"), col("ev")).collect().map(_.toString).toSeq
    assert(afterRows == beforeRows,
      "compaction changed per-partition per-event-type content")
    assert(readAll.rdd.getNumPartitions > 2,
      "compacted .zsj should scan as more tasks than the gzip originals")
  }

  test("compaction skips torn journals and never deletes them") {
    // compaction deletes its inputs, so a torn file must be excluded
    // from the rewrite AND the delete — rewriting its salvageable
    // prefix then deleting the original would silently drop the rest
    val dir = Files.createTempDirectory("lwes-torn-compact").toString
    (0 until 2).foreach { i =>
      val w = graft.lwes.JournalWriter.create(s"$dir/good-$i.journal.gz")
      (0 until 100).foreach(j => w.write(
        graft.lwes.LwesEvent("T::E").setInt64("id", (i * 100 + j).toLong)))
      w.close()
    }
    val tornPath = s"$dir/torn.journal.zst"
    val w = graft.lwes.JournalWriter.create(tornPath)
    (0 until 5000).foreach(j => w.write(
      graft.lwes.LwesEvent("T::E").setInt64("id", (10000 + j).toLong)))
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tornPath))
    java.nio.file.Files.write(java.nio.file.Paths.get(tornPath),
      java.util.Arrays.copyOf(bytes, bytes.length / 2))
    val (before, after) = graft.sources.lwes.Compact.compact(
      spark, dir, targetFiles = 1)
    assert(before == 3 && after == 2, s"($before, $after)") // 1 compacted + torn
    assert(new java.io.File(tornPath).exists, "torn journal must survive untouched")
    // the healthy rows all made it into the compacted file
    val ids = spark.read.format("lwes").schema("id long")
      .load(new java.io.File(dir).listFiles
        .filter(f => f.getName.startsWith("compact-")).map(_.getPath).toSeq: _*)
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0 until 200).map(_.toLong).toSet)
  }

  test("filterBySourceQuality leaves the keep-set join strategy to AQE by default (C31)") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    import spark.implicits._
    val df = Seq(
      ("a.com", "solid readable prose with plenty of normal words here"),
      ("a.com", "another perfectly reasonable document of real sentences"),
      ("b.com", "@@@@ ~~~~ !!!! ????")).toDF("source", "text")
    val kept = graft.operators.TextAnalysis.filterBySourceQuality(
      df, minMeanQuality = 0.0, minDocs = 2L)
    val hints = kept.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(hints.nonEmpty)
    assert(hints.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty),
      s"unexpected forced join hints: $hints")
    // opt-in hint for known-small origin dimensions still available
    val forced = graft.operators.TextAnalysis.filterBySourceQuality(
      df, minMeanQuality = 0.0, minDocs = 2L, broadcastKeep = true)
    val forcedHints = forced.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(forcedHints.exists(h =>
      h.rightHint.exists(_.strategy.contains(BROADCAST)) ||
        h.leftHint.exists(_.strategy.contains(BROADCAST))))
    assert(kept.select("source").distinct().collect().map(_.getString(0)).toSeq
      == Seq("a.com"))
  }

  test("Tables.events normalizes ts to epoch-nanos long for all physical schemas") {
    // Regression pin for the r11 testdata drift: events.parquet moved from
    // nanosecond INT64 (read as long via nanosAsLong) to timestamp[us].
    // Tables.events owns the "ts is nanos-since-epoch LONG" contract; every
    // `ts div N` site downstream assumes it. Exercise all three physical
    // layouts through a ts-div query and demand identical answers.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val nanos = Seq(1700000000123456000L, 1700003600987654000L)
    def hourly(dir: String): Seq[(Long, Long)] = {
      val ev = graft.queries.Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType,
        s"$dir: ts must arrive as LongType")
      ev.select((col("ts") / lit(3600000000000L)).cast("long").as("hr"), col("ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    // layout 1: nanosecond INT64 (legacy driver testdata)
    val d1 = Files.createTempDirectory("ev-nanos").toString
    nanos.toDF("ts").write.mode("overwrite").parquet(s"$d1/events.parquet")
    // layout 2: TIMESTAMP (micros, UTC-adjusted)
    val d2 = Files.createTempDirectory("ev-micros").toString
    nanos.toDF("n").select(timestamp_micros((col("n") / 1000).cast("long")).as("ts"))
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    // layout 3: TIMESTAMP_NTZ (current driver testdata)
    val d3 = Files.createTempDirectory("ev-ntz").toString
    nanos.toDF("n").select(
      timestamp_micros((col("n") / 1000).cast("long")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$d3/events.parquet")
    val expect = nanos.map(n => (n / 3600000000000L, n / 1000 * 1000)).sorted
    assert(hourly(d2) == expect, "TIMESTAMP layout")
    assert(hourly(d3) == expect, "TIMESTAMP_NTZ layout")
    val h1 = hourly(d1)
    assert(h1.map(_._1) == expect.map(_._1) && h1.map(_._2) == nanos.sorted,
      "nano-INT64 layout preserves full nanos")
    // r13 ADVICE: events() must not mutate the session timezone, and the
    // NTZ-as-UTC reinterpretation must be timezone-FREE — identical
    // answers when the caller's session runs a non-UTC zone.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      assert(hourly(d3) == expect, "TIMESTAMP_NTZ layout under non-UTC session tz")
      assert(hourly(d2) == expect, "TIMESTAMP layout under non-UTC session tz")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York",
        "Tables.events must not mutate spark.sql.session.timeZone")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("bz2-compressed journals read via Hadoop codec detection") {
    val dir = Files.createTempDirectory("lwes-bz2").toString
    val fos = new java.io.FileOutputStream(s"$dir/j.journal.bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val w = new graft.lwes.JournalWriter(codec.createOutputStream(fos))
    (0 until 80).foreach(i => w.write(
      graft.lwes.LwesEvent("Bz::E").setInt64("id", i.toLong)))
    w.close()
    val df = spark.read.format("lwes").schema("id long").load(dir)
    assert(df.count() == 80)
    assert(df.agg(sum("id")).head.getLong(0) == (0 until 80).map(_.toLong).sum)
  }
}
