package graft.tools

import java.nio.file.Files

import graft.lwes.{JournalWriter, LwesEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Journal-scan throughput harness (the SURVEY §7 series): 5M events /
  * 64 gzip files on local[32], measuring events/s for (a) full
  * 7-column parse, (b) pruned 2-column parse, (c) eventName rejection —
  * each on the row path and the vectorized ColumnarBatch path. Run:
  * `sbt "runMain graft.tools.ScanThroughput"` (env:
  * SPARK_GRAFT_TP_EVENTS / _FILES / _CPUS to resize).
  */
object ScanThroughput {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_TP_EVENTS", "5000000").toInt
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_TP_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_TP_CPUS", "32")
    // "gz" (default — the production layout) or "none" (isolates parse
    // cost from decompress cost when profiling the reader itself)
    val ext = sys.env.getOrElse("SPARK_GRAFT_TP_CODEC", "gz") match {
      case "none" => ""
      case c => s".$c"
    }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_TP_CONTAINER=seq measures the SequenceFile byte path
    // (zlib block-compressed, the reference's Hive-table layout)
    val seqMode = sys.env.getOrElse("SPARK_GRAFT_TP_CONTAINER", "journal") == "seq"
    val dir = Files.createTempDirectory("lwes-tp").toString
    val perFile = nEvents / nFiles
    val codecDesc =
      if (seqMode) "SEQ-block-zlib"
      else if (ext.isEmpty) "uncompressed" else ext.stripPrefix(".")
    println(s"writing $nEvents events across $nFiles $codecDesc files...")
    def mkEvent(id: Long): LwesEvent =
      LwesEvent(if (id % 4 == 0) "Tp::Want" else "Tp::Skip")
        .setInt64("id", id)
        .setInt64("user", id % 99991)
        .setInt32("score", (id % 1000).toInt)
        .setString("page", s"/p/${id % 50}")
        .setString("cost", (id % 97 * 0.25).toString)
        .setBool("flag", id % 3 == 0)
        .setUInt16("site", (id % 5).toInt)
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { f =>
      if (seqMode) {
        import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile}
        val w = SequenceFile.createWriter(new org.apache.hadoop.conf.Configuration(),
          SequenceFile.Writer.file(new org.apache.hadoop.fs.Path(s"$dir/j$f.seq")),
          SequenceFile.Writer.keyClass(classOf[LongWritable]),
          SequenceFile.Writer.valueClass(classOf[BytesWritable]),
          SequenceFile.Writer.compression(SequenceFile.CompressionType.BLOCK))
        (0 until perFile).foreach { i =>
          val id = f.toLong * perFile + i
          val payload = graft.lwes.LwesCodec.serialize(mkEvent(id))
          val framed = new Array[Byte](payload.length + 4)
          framed(0) = (payload.length >>> 24).toByte
          framed(1) = (payload.length >>> 16).toByte
          framed(2) = (payload.length >>> 8).toByte
          framed(3) = payload.length.toByte
          System.arraycopy(payload, 0, framed, 4, payload.length)
          w.append(new LongWritable(id), new BytesWritable(framed))
        }
        w.close()
      } else {
        val w = JournalWriter.create(s"$dir/j$f.journal$ext")
        (0 until perFile).foreach(i => w.write(mkEvent(f.toLong * perFile + i)))
        w.close()
      }
    }

    val full = "id long, user long, score int, page string, cost double, " +
      "flag boolean, site int"
    def bench(tag: String, events: Int = nEvents)(run: => Unit): Unit = {
      run // warm (JIT + page cache)
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        run
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$tag%-28s ${events / best / 1e6}%6.2f M events/s  (best $best%.2f s)")
    }
    Seq(true, false).foreach { vec =>
      val mode = if (vec) "columnar" else "row"
      def read(schema: String) = spark.read.format("lwes").schema(schema)
        .option("vectorized", vec.toString).load(dir)
      // scan-only: drain the scan's output rows (post ColumnarToRow for
      // the vectorized path — the pipeline Spark actually feeds codegen)
      // without any aggregation diluting the parse delta
      bench(s"$mode scan-only 7-col")(
        read(full).queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next()
        })
      // aggregates FORCE the stated column set through the parser —
      // count() would let column pruning empty the read schema
      bench(s"$mode full 7-col agg")(read(full).agg(
        sum("id"), max("user"), sum("score"), max("page"), sum("cost"),
        sum(when(col("flag"), 1).otherwise(0)), max("site")).collect())
      bench(s"$mode pruned 2-col")(read(full)
        .agg(sum("id"), sum("score")).collect())
      bench(s"$mode eventName filter")(
        spark.read.format("lwes").schema("id long, cost double")
          .option("vectorized", vec.toString)
          .option("eventName", "Tp::Want").load(dir)
          .agg(sum("id"), sum("cost")).collect())
      // low-selectivity pushed attr predicate (~50 of 5M rows): the
      // vectorized path aborts each miss mid-payload
      bench(s"$mode attr predicate")(read(full)
        .filter(col("user") === 12345L)
        .agg(sum("id"), count(lit(1))).collect())
    }

    // array-typed attributes (r15 vectorized-array fill): a second
    // journal whose events carry int64[4] + string[2] arrays — both
    // output paths, aggregates forcing the array columns through the
    // parser (size + element_at so pruning can't drop them)
    if (!seqMode) {
      val adir = Files.createTempDirectory("lwes-tp-arr").toString
      val aEvents = math.max(nEvents / 5, 100000)
      val aPerFile = aEvents / nFiles
      java.util.stream.IntStream.range(0, nFiles).parallel().forEach { f =>
        val w = JournalWriter.create(s"$adir/a$f.journal$ext")
        (0 until aPerFile).foreach { i =>
          val id = f.toLong * aPerFile + i
          w.write(LwesEvent("Tp::Arr")
            .setInt64("id", id)
            .setInt64Array("ks", Array(id, id + 1, id % 97, id % 13))
            .setStringArray("ts", Array(s"t${id % 50}", "x")))
        }
        w.close()
      }
      Seq(true, false).foreach { vec =>
        val mode = if (vec) "columnar" else "row"
        bench(s"$mode array 3-col agg", aEvents)(
          spark.read.format("lwes")
            .schema("id long, ks array<long>, ts array<string>")
            .option("vectorized", vec.toString).load(adir)
            .agg(sum("id"), sum(element_at(col("ks"), 2)),
              sum(size(col("ts")))).collect())
      }
      // r17: NULLABLE arrays (N_*_ARRAY) — same shape as the classic
      // array scenario but every event carries null holes, so the
      // bitset decode/skip sits on the hot path; a third of the rows
      // also carry an UNPROJECTED fat nullable attr, which prices the
      // bitset length-skip exactly where pruning pays it
      val ndir = Files.createTempDirectory("lwes-tp-nul").toString
      val nEvts = math.max(nEvents / 5, 100000)
      val nPerFile = nEvts / nFiles
      java.util.stream.IntStream.range(0, nFiles).parallel().forEach { f =>
        val w = JournalWriter.create(s"$ndir/n$f.journal$ext")
        (0 until nPerFile).foreach { i =>
          val id = f.toLong * nPerFile + i
          val ev = LwesEvent("Tp::Nul")
            .setInt64("id", id)
            .setNullableArray("ks", graft.lwes.LwesType.Int64,
              Array[AnyRef](java.lang.Long.valueOf(id),
                if (id % 3 == 0) null else java.lang.Long.valueOf(id + 1),
                java.lang.Long.valueOf(id % 97),
                if (id % 5 == 0) null else java.lang.Long.valueOf(id % 13)))
            .setNullableArray("ts", graft.lwes.LwesType.Str,
              Array[AnyRef](s"t${id % 50}", if (id % 2 == 0) null else "x"))
          if (id % 3 == 0)
            ev.setNullableArray("fat", graft.lwes.LwesType.Int32,
              Array.tabulate[AnyRef](64)(j =>
                if (j % 4 == 0) null else java.lang.Integer.valueOf(j)))
          w.write(ev)
        }
        w.close()
      }
      Seq(true, false).foreach { vec =>
        val mode = if (vec) "columnar" else "row"
        bench(s"$mode nullable-arr 3-col agg", nEvts)(
          spark.read.format("lwes")
            .schema("id long, ks array<long>, ts array<string>")
            .option("vectorized", vec.toString).load(ndir)
            .agg(sum("id"), sum(element_at(col("ks"), 1)),
              sum(size(col("ts")))).collect())
      }

      // r16: uint64As=decimal + uint64[] — the last schema shape that
      // used to drag a MIXED scan onto the row reader. One journal with
      // a uint64 scalar AND a uint64 array; the whole-schema aggregate
      // shows the mixed scan's throughput on each path (pre-r16 the
      // "columnar" line here WAS the row path)
      val ddir = Files.createTempDirectory("lwes-tp-dec").toString
      val dEvents = math.max(nEvents / 5, 100000)
      val dPerFile = dEvents / nFiles
      java.util.stream.IntStream.range(0, nFiles).parallel().forEach { f =>
        val w = JournalWriter.create(s"$ddir/d$f.journal$ext")
        (0 until dPerFile).foreach { i =>
          val id = f.toLong * dPerFile + i
          w.write(LwesEvent("Tp::Dec")
            .setInt64("id", id)
            .setUInt64("u", -1L - id)
            .setUInt64Array("us", Array(id, -1L - id)))
        }
        w.close()
      }
      Seq(true, false).foreach { vec =>
        val mode = if (vec) "columnar" else "row"
        bench(s"$mode decimal-arr mixed agg", dEvents)(
          spark.read.format("lwes")
            .schema("id long, u decimal(20,0), us array<decimal(20,0)>")
            .option("uint64As", "decimal")
            .option("vectorized", vec.toString).load(ddir)
            .agg(sum("id"), max("u"), sum(element_at(col("us"), 1)))
            .collect())
      }
    }
    spark.stop()
  }
}
