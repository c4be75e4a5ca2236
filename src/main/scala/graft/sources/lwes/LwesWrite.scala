package graft.sources.lwes

import java.util.UUID

import graft.lwes.{JournalWriter, LwesEvent}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("lwes")` — journal write path.
  *
  * One gzip journal per task (like JournalOutputFormat producing one
  * file per reducer). Row→event conversion mirrors
  * EventSerDe.serialize (reference EventSerDe.java:335-452):
  * float/double as strings, null columns unset, header attrs
  * (ReceiptTime/SenderIP/SenderPort/SiteID) lifted into the record
  * header by the journal layer.
  */
class LwesWriteBuilder(info: LogicalWriteInfo, options: CaseInsensitiveStringMap)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new LwesBatchWrite(info.schema(), options, doTruncate)
    override def toStreaming: streaming.StreamingWrite =
      new LwesStreamingWrite(info.schema(), options, info.queryId())
  }
}

/** `files`: streaming only — (hidden pending path, final path) per
  * journal the task parked; the driver's epoch commit promotes them.
  * `stats`: batch only — (final journal path, sidecar text) per
  * journal, so the driver commit can refresh each directory's stats
  * manifest without listing anything (r19). */
final case class LwesCommitMessage(path: String, count: Long,
    files: Seq[(String, String)] = Nil,
    stats: Seq[(String, String)] = Nil)
    extends WriterCommitMessage

/** Write-side options shared by the batch and streaming paths.
  * `eventNameCol` (option `eventNameColumn`): a column holding each
  * row's event type — enables writing heterogeneous journals (the
  * write-side counterpart of the A6 multi-event read); the column
  * itself is not written as an attribute. */
private[lwes] final case class LwesWriteConfig(path: String, eventName: String,
    attrFor: Map[String, String], compression: String, partitionBy: Seq[String],
    eventNameCol: Option[String] = None, frameBytes: Int = 4 << 20,
    esf: Option[graft.lwes.EsfTemplateDb] = None,
    latin1: Boolean = false,
    writeStats: Boolean = true)

private[lwes] object LwesWriteConfig {
  /** `split-zstd` writes the splittable `.zsj` container
    * ([[graft.lwes.SplitJournal]]): zstd frames at record boundaries +
    * a footer frame index, so ONE large journal later scans as N
    * tasks. DEFAULT for batch/streaming writes since r14 — measured
    * 5.9x scan speedup on one fat journal plus ~55% size cut vs gzip,
    * and the container stays a valid sequential zstd stream any reader
    * can consume. Classic codecs (gzip/deflate/bz2/zstd/none) remain
    * available via `compression=` for interop with lwes-java tooling
    * that expects the classic containers. */
  val SplitZstd = "split-zstd"
  val Compressions =
    Set("gzip", "deflate", "bz2", "bzip2", "zstd", "zst", "none", SplitZstd)

  def apply(options: CaseInsensitiveStringMap): LwesWriteConfig = {
    val path = LwesDataSource.paths(options).headOption
      .getOrElse(throw new IllegalArgumentException("lwes write needs a path"))
    val (attrFor, _) = LwesOptions.parseMapping(options.get(LwesOptions.Mapping))
    val compression =
      Option(options.get(LwesOptions.Compression)).getOrElse(SplitZstd).toLowerCase
    require(Compressions.contains(compression),
      s"unsupported lwes compression '$compression' (${Compressions.mkString("|")})")
    LwesWriteConfig(path,
      Option(options.get(LwesOptions.EventName)).getOrElse("Event"),
      attrFor, compression,
      Option(options.get("partitionBy")).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      Option(options.get(LwesOptions.EventNameColumn)),
      frameBytes = options.getInt(LwesOptions.SplitFrameBytes, 4 << 20),
      // parsed once on the driver (apply runs in the write factories);
      // the DB rides the serialized config to every task
      esf = Option(options.get(LwesOptions.Esf))
        .map(graft.lwes.Esf.load(_, LwesDataSource.hadoopConf())),
      latin1 = Option(options.get(LwesOptions.StringEncoding)) match {
        case None => false
        case Some(e) if e.equalsIgnoreCase("UTF-8") => false
        case Some(e) if e.equalsIgnoreCase("ISO-8859-1") => true
        case Some(e) => throw new IllegalArgumentException(
          s"unsupported ${LwesOptions.StringEncoding} '$e' (UTF-8|ISO-8859-1)")
      },
      writeStats = options.getBoolean(LwesOptions.WriteStats, true))
  }

  /** Codec for a journal write; read-side detection is by extension, so
    * the extension always comes from the codec's default one. */
  def codecFor(compression: String, conf: Configuration):
      Option[org.apache.hadoop.io.compress.CompressionCodec] = {
    val codec = compression match {
      case "gzip" => Some(new org.apache.hadoop.io.compress.GzipCodec)
      case "deflate" => Some(new org.apache.hadoop.io.compress.DefaultCodec)
      case "bz2" | "bzip2" => Some(new org.apache.hadoop.io.compress.BZip2Codec)
      case _ => None
    }
    codec.foreach {
      case c: org.apache.hadoop.conf.Configurable => c.setConf(conf)
      case _ =>
    }
    codec
  }

  /** (extension, stream wrapper) for a journal write. zstd is handled
    * through zstd-jni (the library Spark itself ships) because Hadoop's
    * ZStandardCodec requires the native libhadoop binding; everything
    * else rides the Hadoop codec so read-side extension detection stays
    * symmetric. */
  def streamCodecFor(compression: String, conf: Configuration):
      (String, java.io.OutputStream => java.io.OutputStream) =
    compression match {
      case "zstd" | "zst" =>
        ("zst", out => new com.github.luben.zstd.ZstdOutputStream(out))
      case "none" => ("journal", identity)
      case other =>
        val c = codecFor(other, conf).getOrElse(
          throw new IllegalArgumentException(s"unsupported lwes compression '$other'"))
        (c.getDefaultExtension.stripPrefix("."),
          out => c.createOutputStream(out))
    }
}

class LwesBatchWrite(schema: StructType, options: CaseInsensitiveStringMap,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val wc = LwesWriteConfig(options)
    LwesBatchWrite.encConflictFailFast(wc, schema)
    LwesBatchWrite.esfFailFast(wc, schema)
    val conf = LwesDataSource.hadoopConf()
    val p = new Path(wc.path)
    val fs = p.getFileSystem(conf)
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new LwesDataWriterFactory(wc, schema, SerializableHadoopConf.broadcast(conf))
  }

  /** r19: refresh each written directory's stats manifest from the
    * sidecar texts the tasks carried up — one read + one atomic write
    * per directory, no listing, so manifest coverage starts at the
    * FIRST write instead of the first compaction. Best-effort: a
    * failed refresh leaves per-file sidecars canonical. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (!options.getBoolean(LwesOptions.StatsManifest, true)) return
    val conf = LwesDataSource.hadoopConf()
    messages.collect { case m: LwesCommitMessage => m.stats }.flatten
      .groupBy { case (path, _) => new Path(path).getParent }
      .foreach { case (dir, entries) =>
        try LwesStats.mergeIntoManifest(dir,
          entries.map { case (p, t) => new Path(p).getName -> t }.toMap, conf)
        catch { case scala.util.control.NonFatal(e) =>
          LwesBatchWrite.logManifestSkip(dir.toString, e)
        }
      }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

object LwesBatchWrite extends org.apache.spark.internal.Logging {
  private[lwes] def logManifestSkip(dir: String, e: Throwable): Unit =
    logWarning(s"stats manifest refresh for $dir failed " +
      s"(${e.getMessage}); per-file sidecars remain canonical")

  /** Driver-side fail-fast for `stringEncoding=ISO-8859-1` combined
    * with a data column mapped to the reserved `enc` attribute: the
    * two would fight over the attribute's value, and failing in the
    * task constructor would cost task retries before surfacing. */
  private[lwes] def encConflictFailFast(wc: LwesWriteConfig,
      schema: StructType): Unit =
    if (wc.latin1 && schema.fields.exists(f =>
        wc.attrFor.getOrElse(f.name, f.name) == graft.lwes.LwesCodec.EncAttr))
      throw new IllegalArgumentException(
        s"${LwesOptions.StringEncoding}=ISO-8859-1 conflicts with a column " +
          s"mapped to the reserved attribute '${graft.lwes.LwesCodec.EncAttr}' — " +
          "drop the option and let the data column drive the codec instead")

  /** Driver-side ESF fail-fast: a template violation with a STATIC
    * event name should abort before any task launches (dynamic
    * eventNameColumn writes validate per encountered name in the
    * tasks — the name isn't known until the rows arrive). */
  private[lwes] def esfFailFast(wc: LwesWriteConfig, schema: StructType): Unit =
    wc.esf.foreach { db =>
      if (wc.eventNameCol.isEmpty) {
        val attrs = schema.fields.map(f => wc.attrFor.getOrElse(f.name, f.name))
        val skip = schema.fields.indices
          .map(i => wc.partitionBy.contains(schema.fields(i).name)).toArray
        EsfValidation.tokensFor(db, wc.eventName, schema, attrs, skip)
      }
    }
}

/** Streaming journal sink (`df.writeStream.format("lwes")`): one journal
  * per (epoch, partition) in the same append-only directory layout the
  * streaming READER tails — a graft stream can land journals that
  * another graft stream (or the batch reader) consumes directly.
  *
  * Epoch commit protocol (exactly-once visibility under replay):
  * tasks park output under hidden `.pending-part-q<qid>-e<epoch>-*`
  * names; this driver-side commit (a) drops the replay's output if the
  * epoch's `_epoch-q<qid>-e<epoch>.manifest` already exists (first
  * committed attempt wins, whole-epoch — never file-by-file, so a
  * replay with a DIFFERENT partition count cannot interleave with a
  * half-committed earlier layout), (b) otherwise deletes any visible
  * leftovers of a crashed mid-commit attempt for this (query, epoch),
  * promotes all pendings, and writes the manifest last. Readers
  * ([[LwesDataSource.listFiles]]) treat the manifest as the commit
  * marker: epoch-named files without one are invisible, so tailing
  * consumers never observe an uncommitted or partially-promoted epoch.
  * A DIFFERENT query (or the same sink dir after a checkpoint reset,
  * which changes the queryId) never collides with a previous run's
  * files, so its output is never mistaken for a replay and dropped. */
class LwesStreamingWrite(schema: StructType, options: CaseInsensitiveStringMap,
    queryId: String) extends streaming.StreamingWrite
    with org.apache.spark.internal.Logging {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    val wc = LwesWriteConfig(options)
    LwesBatchWrite.encConflictFailFast(wc, schema)
    LwesBatchWrite.esfFailFast(wc, schema)
    val conf = LwesDataSource.hadoopConf()
    val p = new Path(wc.path)
    p.getFileSystem(conf).mkdirs(p)
    new LwesStreamingDataWriterFactory(wc, schema,
      SerializableHadoopConf.broadcast(conf), queryId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = LwesDataSource.hadoopConf()
    val root = new Path(LwesWriteConfig(options).path)
    val fs = root.getFileSystem(conf)
    val token = s"${LwesStreamingWrite.queryTag(queryId)}-e$epochId"
    val manifest = new Path(root, s"_epoch-$token.manifest")
    val pairs = messages.toSeq.collect {
      case m: LwesCommitMessage => m.files }.flatten
    if (fs.exists(manifest)) {
      // a previous attempt committed this whole epoch — drop the replay
      pairs.foreach { case (p, _) =>
        fs.delete(new Path(p), false)
        fs.delete(LwesStats.sidecarPath(new Path(p)), false)
      }
      return
    }
    // clear leftovers of a crashed mid-promote attempt: its visible set
    // may be partial or partitioned differently, and mixing layouts
    // duplicates/loses rows — this attempt's pending set is complete.
    // Compare scheme-stripped paths: listStatus returns fully-qualified
    // URIs while the writer records the raw configured path.
    val keepPending = pairs.map(p => new Path(p._1).toUri.getPath).toSet
    LwesStreamingWrite.epochFiles(fs, root, token).foreach { s =>
      if (!keepPending.contains(s.getPath.toUri.getPath)) {
        logWarning(s"lwes sink: removing stale epoch file ${s.getPath} " +
          s"from an uncommitted attempt of epoch $epochId")
        fs.delete(s.getPath, false)
        // a stale file's sidecar must go with it: a later same-named
        // same-length promotion from a different layout would otherwise
        // inherit stats describing different records
        fs.delete(LwesStats.sidecarPath(s.getPath), false)
      }
    }
    pairs.foreach { case (pnd, fin) =>
      val f = new Path(fin)
      // sidecar first (best-effort — stats are an optimization, the
      // stream must never fail over them; the length pin makes any
      // mismatch a lost rename could leave inert)
      val scPnd = LwesStats.sidecarPath(new Path(pnd))
      if (fs.exists(scPnd)) {
        val scFin = LwesStats.sidecarPath(f)
        fs.delete(scFin, false) // crashed earlier attempt's copy
        if (!fs.rename(scPnd, scFin)) fs.delete(scPnd, false)
      }
      if (!fs.rename(new Path(pnd), f))
        throw new java.io.IOException(s"promote $pnd -> $fin failed")
    }
    val tmp = new Path(root, s"._epoch-$token.manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(pairs.map(_._2 + "\n").mkString.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, manifest) && !fs.exists(manifest))
      throw new java.io.IOException(s"cannot write epoch manifest $manifest")
    // r19: after the epoch is fully visible, fold this epoch's sidecar
    // texts into the per-directory STATS manifests (A33) — streamed
    // corpora get manifest coverage at ingest, like batch writes. A
    // replayed epoch returns above before reaching here; a crash
    // between the epoch manifest and this refresh only costs the
    // acceleration (per-file sidecars are canonical).
    if (options.getBoolean(LwesOptions.StatsManifest, true)) {
      messages.collect { case m: LwesCommitMessage => m.stats }.flatten
        .groupBy { case (path, _) => new Path(path).getParent }
        .foreach { case (dir, entries) =>
          try LwesStats.mergeIntoManifest(dir,
            entries.map { case (p, t) => new Path(p).getName -> t }.toMap, conf)
          catch { case scala.util.control.NonFatal(e) =>
            LwesBatchWrite.logManifestSkip(dir.toString, e)
          }
        }
    }
    maybeAutoCompact(epochId)
  }

  /** Post-commit small-file maintenance (see
    * [[LwesOptions.AutoCompactTarget]]): every N-th epoch, rewrite the
    * sink directory down to the target file count. Runs AFTER the
    * manifest is durable, so the epoch's data is committed whatever
    * happens here — a compaction failure is logged, never rethrown
    * (the stream must not fail over maintenance). */
  private def maybeAutoCompact(epochId: Long): Unit = try {
    // option parsing stays INSIDE the try: a malformed value
    // (autoCompactEveryEpochs=ten) must degrade like any other
    // maintenance failure, not kill the stream after a durable commit
    val target = Option(options.get(LwesOptions.AutoCompactTarget)).map(_.toInt)
    if (target.isEmpty) return
    val every = math.max(1,
      Option(options.get(LwesOptions.AutoCompactEvery)).map(_.toInt).getOrElse(10))
    if (epochId % every != every - 1) return // fires on the Nth commit
    val minAge =
      Option(options.get(LwesOptions.AutoCompactMinAgeMs)).map(_.toLong).getOrElse(0L)
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .foreach { spark =>
        val wc = LwesWriteConfig(options)
        val (b, a) =
          if (wc.partitionBy.nonEmpty)
            Compact.compactPartitioned(spark, wc.path, target.get,
              wc.compression, minAge)
          else
            Compact.compact(spark, wc.path, target.get, wc.compression, minAge)
        logInfo(s"lwes sink auto-compaction after epoch $epochId: " +
          s"$b files -> $a")
      }
  } catch {
    case scala.util.control.NonFatal(e) =>
      logWarning(s"lwes sink auto-compaction after epoch $epochId failed " +
        s"(epoch data is committed; will retry at the next interval)", e)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = LwesDataSource.hadoopConf()
    val root = new Path(LwesWriteConfig(options).path)
    val fs = root.getFileSystem(conf)
    messages.toSeq.collect { case m: LwesCommitMessage => m.files }
      .flatten.foreach { case (p, _) => fs.delete(new Path(p), false) }
  }
}

object LwesStreamingWrite {
  private[lwes] def queryTag(queryId: String): String =
    s"q${queryId.replace("-", "").take(12)}"

  /** Every file (visible `part-<token>-*` or parked `.pending-part-
    * <token>-*`) belonging to one (query, epoch), across partition
    * subdirectories. */
  private def epochFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      token: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory) { if (!n.startsWith(".") && !n.startsWith("_")) walk(s.getPath) }
      else if (n.startsWith(s"part-$token-") || n.startsWith(s".pending-part-$token-"))
        out += s
    }
    if (fs.exists(root)) walk(root)
    out.toSeq
  }
}

class LwesStreamingDataWriterFactory(wc: LwesWriteConfig, schema: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf],
    queryId: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LwesDataWriter(wc, schema, partitionId, taskId, bconf.value.value,
      s"part-${LwesStreamingWrite.queryTag(queryId)}-e$epochId")
}

class LwesDataWriterFactory(wc: LwesWriteConfig, schema: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LwesDataWriter(wc, schema, partitionId, taskId, bconf.value.value)
}

/** One journal per task, or one per (task, partition-value combination)
  * when `partitionBy` names columns — those route the row into a Hive
  * style `col=value/` subdirectory (readable back by the A14 partition
  * handling) and are not written as event attributes. */
class LwesDataWriter(wc: LwesWriteConfig, schema: StructType,
    partitionId: Int, taskId: Long, conf: Configuration,
    prefix: String = null)
    extends DataWriter[InternalRow] {

  private val dir = wc.path

  /** Streaming (prefix != null): epoch-stable names — no taskId, so a
    * replayed epoch regenerates the same name and the first committed
    * file wins. Batch: taskId-qualified, the commit coordinator ensures
    * a single committer per partition. */
  private val stableNames = prefix != null
  private val namePrefix = if (prefix == null) "part" else prefix
  private val split = wc.compression == LwesWriteConfig.SplitZstd
  private val ext: String =
    if (split) graft.lwes.SplitJournal.Extension
    else LwesWriteConfig.streamCodecFor(wc.compression, conf)._1
  private val fs = new Path(dir).getFileSystem(conf)
  private val attrs: Array[String] =
    schema.fields.map(f => wc.attrFor.getOrElse(f.name, f.name))
  private val partIdx: Array[Int] = wc.partitionBy.map(schema.fieldIndex).toArray
  private val nameIdx: Int = wc.eventNameCol.map(schema.fieldIndex).getOrElse(-1)
  private val isPartCol: Array[Boolean] =
    schema.fields.indices.map(i => partIdx.contains(i) || i == nameIdx).toArray

  // ESF template validation: static event name → validated once here
  // (the factories already failed fast on the driver); eventNameColumn
  // writes validate each event NAME on first encounter and cache the
  // per-field token/required arrays — per row it's one hash probe
  private val esfStatic: Option[EsfValidation.EsfWritePlan] =
    wc.esf.filter(_ => nameIdx < 0)
      .map(db => EsfValidation.tokensFor(db, wc.eventName, schema, attrs, isPartCol))
  private val esfByEvent =
    scala.collection.mutable.HashMap[String, EsfValidation.EsfWritePlan]()
  private def esfFor(name: String): EsfValidation.EsfWritePlan =
    esfStatic.getOrElse(esfByEvent.getOrElseUpdate(name,
      // LENIENT for multi-event writes: the schema is the union of
      // every event's columns, NULL meaning "unset" — only a non-null
      // value in an undeclared field is a violation (checked per row)
      EsfValidation.tokensFor(wc.esf.get, name, schema, attrs, isPartCol,
        strict = false)))

  // column carrying the receipt time (post-mapping): when present, the
  // final file name is tagged `.t<min>-<max>.` with the EXACT receipt
  // bounds of the records written — the scan prunes whole files from a
  // pushed ReceiptTime range filter on that tag alone (the journal
  // counterpart of a parquet footer's min/max stats)
  private val rtIdx: Int = {
    val i = attrs.indexOf(graft.lwes.LwesEvent.ReceiptTime)
    if (i >= 0 && isPartCol(i)) -1 else i
  }

  /** One open journal: writer, staging path, untagged destination, and
    * the receipt-time bounds of everything written into it. */
  private final class OpenJournal(raw: java.io.OutputStream,
      val tmp: Path, val dest: Path) {
    /** A27 zone-map accumulator. Batch writes drop the sidecar at task
      * commit; streaming writes park it beside the hidden pending
      * journal and the driver's epoch commit promotes both (or reaps
      * both when the epoch is a replay/stale attempt). */
    val stats: LwesStats.Tracker =
      if (wc.writeStats) new LwesStats.Tracker else null
    /** A31 per-FRAME zone-map accumulator (split journals only): the
      * writer's flush hook serializes it into the GSJ2 footer and swaps
      * in a fresh tracker for the next frame. `record()` observes
      * BEFORE handing the event to the writer, so a flush triggered by
      * the current record still covers it. */
    private var frameStats: LwesStats.Tracker =
      if (split && wc.writeStats) new LwesStats.Tracker else null
    val w: graft.lwes.JournalRecordWriter =
      if (split) new graft.lwes.SplitJournalWriter(raw, wc.frameBytes,
        frameStats = if (frameStats == null) null
        else (rawLen: Int) => {
          val text = frameStats.serialize(rawLen.toLong)
          frameStats = new LwesStats.Tracker
          text
        })
      else new JournalWriter(
        LwesWriteConfig.streamCodecFor(wc.compression, conf)._2(raw))
    /** Observe-then-write, in that order (see `frameStats`). */
    def record(ev: graft.lwes.LwesEvent): Unit = {
      if (stats != null) stats.observe(ev)
      if (frameStats != null) frameStats.observe(ev)
      w.write(ev)
    }
    var tMin: Long = Long.MaxValue
    var tMax: Long = Long.MinValue
    /** Destination with the exact receipt-bounds tag (when tracked). */
    def taggedDest: Path =
      if (rtIdx < 0 || tMin > tMax || tMin < 0) dest
      else new Path(dest.getParent,
        s"${dest.getName.stripSuffix("." + ext)}.t$tMin-$tMax.$ext")
  }

  // open journals: partition subdir ("" = unpartitioned) -> journal
  private val open = scala.collection.mutable.LinkedHashMap[String, OpenJournal]()
  private var count = 0L

  private def journalFor(subdir: String): OpenJournal =
    open.getOrElseUpdate(subdir, {
      val base = if (subdir.isEmpty) new Path(dir) else new Path(dir, subdir)
      fs.mkdirs(base)
      val tmp = new Path(base, s".$namePrefix-$partitionId-$taskId-${UUID.randomUUID()}.$ext.tmp")
      val dest = new Path(base,
        if (stableNames) f"$namePrefix-$partitionId%05d.$ext"
        else f"$namePrefix-$partitionId%05d-$taskId.$ext")
      val raw = fs.create(tmp, true)
      new OpenJournal(raw, tmp, dest)
    })

  override def write(row: InternalRow): Unit = {
    val name =
      if (nameIdx >= 0 && !row.isNullAt(nameIdx)) row.getUTF8String(nameIdx).toString
      else wc.eventName
    val ev = LwesEvent(name)
    // FIRST attribute, the lwes-java serialization order — readers
    // learn the charset before any string value
    if (wc.latin1)
      ev.setInt16(graft.lwes.LwesCodec.EncAttr, graft.lwes.LwesCodec.EncIso88591)
    val esf = if (wc.esf.isEmpty) null else esfFor(name)
    var i = 0
    while (i < schema.length) {
      if (!isPartCol(i)) {
        if (row.isNullAt(i)) {
          // a NULL column with a declared template default encodes the
          // default (lwes-java EventTemplateDB semantics — this also
          // satisfies `required`); without one, required stays fatal
          if (esf != null && esf.defaults(i) != null) {
            val d = esf.defaults(i)
            ev.set(d.key, d.token, d.value)
          } else if (esf != null && esf.required(i))
            throw new EsfValidationException(
              s"esf validation: required attribute '${attrs(i)}' of event " +
                s"'$name' is NULL (column '${schema.fields(i).name}')")
        } else {
          if (esf != null && esf.tokens(i) == EsfValidation.Undeclared)
            throw new EsfValidationException(
              s"esf validation: attribute '${attrs(i)}' (column " +
                s"'${schema.fields(i).name}') is not declared for event " +
                s"'$name' but carries a non-null value")
          val dt = schema.fields(i).dataType
          val v = row.get(i, dt) match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case other => other
          }
          if (esf == null) LwesOptions.setAttr(ev, attrs(i), dt, v)
          else {
            // declared max array length (lwes-java EventTemplateDB
            // size validation): an oversized array is a template
            // violation, named, not a silent truncation
            val cap = esf.maxLen(i)
            if (cap >= 0) {
              val len = v match {
                case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
                  ad.numElements()
                case b: Array[Byte] => b.length
                case _ => -1
              }
              if (len > cap)
                throw new EsfValidationException(
                  s"esf validation: attribute '${attrs(i)}' of event " +
                    s"'$name' carries $len elements, over the declared " +
                    s"max $cap (column '${schema.fields(i).name}')")
            }
            LwesOptions.setAttrAs(ev, attrs(i), esf.tokens(i), dt, v)
          }
        }
      }
      i += 1
    }
    // declared defaults with no DataFrame column at all: encoded for
    // every row (the template promises the attribute a value)
    if (esf != null) esf.extraDefaults.foreach { d =>
      if (!ev.isSet(d.key)) ev.set(d.key, d.token, d.value)
    }
    val subdir = partIdx.map { i =>
      val v = if (row.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
        else row.get(i, schema.fields(i).dataType).toString
      s"${schema.fields(i).name}=$v"
    }.mkString("/")
    val oj = journalFor(subdir)
    oj.record(ev)
    if (rtIdx >= 0) {
      // track what the journal layer actually stamps (unset attr → 0),
      // so the name tag is exact for every record in the file
      val t = ev.get(graft.lwes.LwesEvent.ReceiptTime)
        .map(_.value.asInstanceOf[Long]).getOrElse(0L)
      if (t < oj.tMin) oj.tMin = t
      if (t > oj.tMax) oj.tMax = t
    }
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    if (stableNames) {
      // Streaming: nothing becomes visible at task commit. Output is
      // parked under a hidden `.pending-` name and the DRIVER's epoch
      // commit promotes the whole epoch atomically behind a manifest —
      // a replay with a different partition count can therefore never
      // leave a mixed-layout set of visible files (see
      // LwesStreamingWrite.commit).
      // tagged names stay epoch-stable: a replayed epoch rewrites the
      // same rows, so the receipt bounds (and thus the name) recur
      val statsEntries = Seq.newBuilder[(String, String)]
      val files = open.values.toSeq.map { oj =>
        oj.w.close()
        val dest = oj.taggedDest
        val pending = new Path(dest.getParent, s".pending-${dest.getName}")
        fs.delete(pending, false) // stale same-task attempt
        // the stale attempt's sidecar goes too — if THIS attempt writes
        // none (writeStats flipped off between attempts), promotion must
        // not pair the replayed journal with the old attempt's stats
        fs.delete(LwesStats.sidecarPath(pending), false)
        // park the zone-map sidecar beside the pending journal (its
        // name is epoch-stable like the journal's, and `..pending-*`
        // never matches the epoch-file patterns) — the driver promotes
        // or reaps the two together
        if (oj.stats != null) {
          val len = fs.getFileStatus(oj.tmp).getLen
          val text = oj.stats.serialize(len)
          val sc = fs.create(LwesStats.sidecarPath(pending), true)
          try sc.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally sc.close()
          // carried for the post-promotion manifest refresh (r19)
          statsEntries += ((dest.toString, text))
        }
        if (!fs.rename(oj.tmp, pending))
          throw new java.io.IOException(s"rename ${oj.tmp} -> $pending failed")
        (pending.toString, dest.toString)
      }
      LwesCommitMessage(dir, count, files, statsEntries.result())
    } else {
      val statsEntries = Seq.newBuilder[(String, String)]
      open.values.foreach { oj =>
        oj.w.close()
        val dest = oj.taggedDest
        // sidecar FIRST (hidden name — invisible to listings either
        // way), then the journal rename: a visible journal always has
        // its stats, and an orphan sidecar is inert
        if (oj.stats != null) {
          val len = fs.getFileStatus(oj.tmp).getLen
          val text = oj.stats.serialize(len)
          val sc = fs.create(LwesStats.sidecarPath(dest), true)
          try sc.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally sc.close()
          // carried to the driver commit for the manifest refresh —
          // the text is a few hundred bytes per journal
          statsEntries += ((dest.toString, text))
        }
        if (!fs.rename(oj.tmp, dest))
          throw new java.io.IOException(s"rename ${oj.tmp} -> $dest failed")
      }
      LwesCommitMessage(dir, count, stats = statsEntries.result())
    }
  }

  override def abort(): Unit = {
    open.values.foreach { oj =>
      try oj.w.close() catch { case _: Throwable => }
      fs.delete(oj.tmp, false)
      // a commit that failed between the sidecar write and the journal
      // rename leaves an orphan sidecar under the would-be final (or
      // pending) name — inert (hidden, length-pinned) but litter; spare
      // journals that DID land before the failure (their sidecar is live)
      try {
        val dest = oj.taggedDest
        if (!fs.exists(dest)) fs.delete(LwesStats.sidecarPath(dest), false)
        if (stableNames) {
          val pending = new Path(dest.getParent, s".pending-${dest.getName}")
          if (!fs.exists(pending))
            fs.delete(LwesStats.sidecarPath(pending), false)
        }
      } catch { case _: Throwable => }
    }
  }

  override def close(): Unit = ()
}
