package graft.sources.lwes

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Journal-directory compaction (SURVEY.md §2 A18).
  *
  * Streaming sinks land one journal per (epoch, partition) — at scale
  * that is the classic small-files problem (journals are also gzip and
  * unsplittable, so file count IS the read parallelism ceiling).
  * Compaction rewrites a directory's top-level journals into
  * ~`targetFiles` files in one distributed pass (coalesce — no
  * shuffle), then swaps them in: the compacted files are PROMOTED
  * first under collision-free names, the originals deleted after — a
  * crash mid-swap leaves duplicates (re-runnable), never data loss.
  *
  * Correctness guards, each load-bearing:
  *  - event types ride through the `eventNameColumn` round-trip, so
  *    heterogeneous directories keep per-event names;
  *  - schema inference is UNCAPPED here (every file, every event) —
  *    sampling would silently drop attributes that first appear late,
  *    and compaction deletes the only copy;
  *  - only the listed top-level files are read AND deleted —
  *    `k=v` partition subdirectories are untouched (compact them per
  *    directory);
  *  - streaming-sink epoch files without their `_epoch-*.manifest`
  *    commit marker are skipped (uncommitted / mid-promote epochs are
  *    not data yet), and `minAgeMs` skips files newer than a stability
  *    horizon so an actively-landing batch is left alone;
  *  - epoch MANIFESTS are deliberately left behind: a sink replaying a
  *    compacted-away epoch sees its manifest, takes the
  *    already-committed branch, and drops the replay instead of
  *    re-creating (= duplicating) the deleted journal.
  *
  * Concurrency contract: compaction may run beside a sink that is
  * APPENDING (new epochs land under new names and, inside `minAgeMs`,
  * are skipped), but NOT beside a reader TAILING the same directory —
  * the promoted `compact-*` files are new paths to it, so it would
  * re-ingest all compacted rows. Quiesce tailing readers (or point
  * them elsewhere) before compacting; batch readers are unaffected.
  */
object Compact extends org.apache.spark.internal.Logging {

  private val NameCol = "__compact_event_type"
  private val EpochFileName = """part-(q[0-9a-fA-F]+-e\d+)-\d+\.[^/]+""".r
  private val EpochManifestName = """_epoch-(q[0-9a-fA-F]+-e\d+)\.manifest""".r

  /** Compact every `k=v` partition subdirectory of `dir` to
    * `targetFiles` files each, preserving the partition layout (each
    * partition compacts independently — partition values live in the
    * PATH, not the records, so cross-partition merging would corrupt
    * them). Returns summed (filesBefore, filesAfter). Partitions are
    * processed sequentially — each is its own bounded Spark job — so an
    * operator can run this incrementally over however many `dt=` hours
    * a maintenance window allows; at 100 TB you point it at the
    * partitions behind the small-files alert, not the whole table. */
  def compactPartitioned(spark: SparkSession, dir: String, targetFiles: Int,
      compression: String = LwesWriteConfig.SplitZstd, minAgeMs: Long = 0L,
      frameBytes: Option[Int] = None): (Int, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .sortBy(_.getPath.getName)
    parts.foldLeft((0, 0)) { case ((b, a), s) =>
      val (pb, pa) = compact(spark, s.getPath.toString, targetFiles,
        compression, minAgeMs, frameBytes)
      (b + pb, a + pa)
    }
  }

  /** Rewrite `dir`'s top-level journals into `targetFiles` files.
    * Returns (filesBefore, filesAfter). */
  /** Compaction lands in the splittable `.zsj` container by DEFAULT
    * (A22) — the one pass that fixes the directory's two scale
    * problems together: file count drops to `targetFiles` AND each
    * compacted file scans as many tasks. `frameBytes` overrides the
    * writer's raw bytes per zstd frame (split granularity); classic
    * codecs stay available via `compression=` for lwes-java interop. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      compression: String = LwesWriteConfig.SplitZstd, minAgeMs: Long = 0L,
      frameBytes: Option[Int] = None): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val horizon = System.currentTimeMillis() - minAgeMs
    def journals() = {
      val all = fs.listStatus(p)
      val committed = all.collect {
        case s if s.isFile => s.getPath.getName match {
          case EpochManifestName(tok) => tok
          case _ => null
        }
      }.filter(_ != null).toSet
      all.filter { s =>
        s.isFile &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_") &&
          s.getModificationTime <= horizon &&
          (s.getPath.getName match {
            case EpochFileName(tok) => committed.contains(tok)
            case _ => true
          })
      }
    }
    val before = journals()
    if (before.isEmpty) return (0, 0)
    val paths = before.map(_.getPath.toString)
    // full-scan schema inference, but DISTRIBUTED: one executor pass
    // computing per-file attribute->type maps, widened on the driver in
    // path order (deterministic). The driver-side sampling inference
    // would either miss late-appearing attributes (and compaction
    // deletes the only copy) or decompress every journal single-threaded.
    val bconf = SerializableHadoopConf.broadcast(conf)
    // Damaged files are DETECTED here and excluded from the whole
    // compaction (not rewritten, NOT deleted). Two kinds of damage:
    //  - torn files (frame/codec-level corruption ends the stream): the
    //    batch reader salvages the leading events tolerantly, but
    //    compaction deletes its input — rewriting the salvageable prefix
    //    and deleting the original would silently discard the remainder;
    //  - resync-absorbed records (framed-but-undecodable payloads the
    //    reader skips WITHOUT raising, counted by `corruptRecords`):
    //    rewriting only the decodable events and deleting the original
    //    would silently drop those bytes too.
    // Either way the file is left in place: every byte kept for
    // forensics while the healthy files still compact.
    val perFile = spark.sparkContext.parallelize(paths.toSeq, paths.length)
      .map { path =>
        val seen = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.types.DataType]()
        var damaged = false
        try {
          val r = LwesDataSource.openReader(path, bconf.value.value, null, null)
          try {
            val it = r.iterator
            while (it.hasNext) {
              it.next().attrs.foreach { a =>
                val t = LwesOptions.sparkTypeFor(a.token)
                seen.updateWith(a.key) {
                  case Some(prev) => Some(LwesOptions.widen(prev, t))
                  case None => Some(t)
                }
              }
            }
            damaged = r.corruptRecords > 0
          } finally r.close()
        } catch {
          case e if LwesDataSource.isCorruption(e) => damaged = true
        }
        (path, damaged, seen.toSeq)
      }.collect()
    val tornPaths = perFile.collect { case (path, true, _) => path }.toSet
    if (tornPaths.nonEmpty)
      System.err.println(s"[graft-compact] skipping ${tornPaths.size} torn/" +
        s"corrupt journal(s), left in place: ${tornPaths.toSeq.sorted.mkString(", ")}")
    val goodBefore = before.filterNot(s => tornPaths.contains(s.getPath.toString))
    if (goodBefore.isEmpty) return (before.length, before.length)
    val goodPaths = goodBefore.map(_.getPath.toString)
    val union = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.types.DataType]()
    perFile.filter(!_._2).sortBy(_._1).foreach { case (_, _, attrs) =>
      attrs.foreach { case (k, t) =>
        union.updateWith(k) {
          case Some(prev) => Some(LwesOptions.widen(prev, t))
          case None => Some(t)
        }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      union.toSeq.map { case (k, t) =>
        org.apache.spark.sql.types.StructField(k, t, nullable = true) } :+
        org.apache.spark.sql.types.StructField(NameCol,
          org.apache.spark.sql.types.StringType, nullable = false))
    val df = spark.read.format("lwes").schema(schema)
      .option(LwesOptions.EventNameColumn, NameCol)
      .load(goodPaths.toIndexedSeq: _*)
    val tmp = new Path(p, s".compact-${java.util.UUID.randomUUID()}")
    val writer0 = df.coalesce(math.max(targetFiles, 1))
      .write.format("lwes")
      .option(LwesOptions.EventNameColumn, NameCol)
      .option(LwesOptions.Compression, compression)
    frameBytes.fold(writer0)(fb =>
        writer0.option(LwesOptions.SplitFrameBytes, fb.toString))
      .mode("append").save(tmp.toString)
    // promote first (fresh names cannot collide), delete originals
    // after; skip hidden leftovers (a task attempt killed before its
    // abort() leaves a torn .tmp behind — promoting it would surface a
    // partial journal)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    fs.listStatus(tmp)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .zipWithIndex.foreach { case (s, i) =>
        val ext = s.getPath.getName.substring(s.getPath.getName.lastIndexOf('.'))
        val dest = new Path(p, f"compact-$tag-$i%05d$ext")
        if (!fs.rename(s.getPath, dest))
          throw new java.io.IOException(s"promote ${s.getPath} failed")
        // carry the A27 zone-map sidecar across the rename (it pins
        // only the journal's byte length, which a rename preserves);
        // the brief sidecar-less window just reads as "no stats"
        val sc = LwesStats.sidecarPath(s.getPath)
        if (fs.exists(sc)) fs.rename(sc, LwesStats.sidecarPath(dest))
      }
    goodBefore.foreach { s =>
      fs.delete(s.getPath, false)
      // reap the replaced journal's sidecar too — stale (length-pinned)
      // but no reason to litter
      fs.delete(LwesStats.sidecarPath(s.getPath), false)
    }
    fs.delete(tmp, true)
    // merge-on-compact (r19): fold the directory's surviving sidecars
    // into the per-directory stats manifest, so the next scan's stats
    // wave is ONE read instead of one GET per journal. Best-effort —
    // a failed manifest write leaves the per-file sidecars canonical.
    try LwesStats.writeManifest(p, conf)
    catch { case scala.util.control.NonFatal(e) =>
      logWarning(s"stats manifest write for $dir failed (${e.getMessage}); " +
        "per-file sidecars remain canonical")
    }
    // "after" counts every visible top-level journal (the fresh
    // compact-* files post-date the stability horizon by construction)
    (before.length, fs.listStatus(p).count(s => s.isFile &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_")))
  }
}
