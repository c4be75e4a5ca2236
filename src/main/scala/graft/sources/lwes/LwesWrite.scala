package graft.sources.lwes

import java.util.UUID

import graft.lwes.{JournalWriter, LwesEvent}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
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
  }
}

final case class LwesCommitMessage(path: String, count: Long)
    extends WriterCommitMessage

class LwesBatchWrite(schema: StructType, options: CaseInsensitiveStringMap,
    truncate: Boolean) extends BatchWrite {

  private val path = LwesDataSource.paths(options).headOption
    .getOrElse(throw new IllegalArgumentException("lwes write needs a path"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = LwesDataSource.hadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val eventName = Option(options.get(LwesOptions.EventName)).getOrElse("Event")
    val (attrFor, _) = LwesOptions.parseMapping(options.get(LwesOptions.Mapping))
    val gzip = Option(options.get(LwesOptions.Compression)).forall(_ != "none")
    new LwesDataWriterFactory(path, schema, eventName, attrFor, gzip)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class LwesDataWriterFactory(dir: String, schema: StructType, eventName: String,
    attrFor: Map[String, String], gzip: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LwesDataWriter(dir, schema, eventName, attrFor, gzip, partitionId, taskId)
}

class LwesDataWriter(dir: String, schema: StructType, eventName: String,
    attrFor: Map[String, String], gzip: Boolean, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val ext = if (gzip) "gz" else "journal"
  private val tmpName = s".part-$partitionId-$taskId-${UUID.randomUUID()}.$ext.tmp"
  private val finalName = f"part-$partitionId%05d-$taskId.$ext"
  private val conf = new Configuration()
  private val fs = new Path(dir).getFileSystem(conf)
  private val tmpPath = new Path(dir, tmpName)
  private val out = {
    val raw = fs.create(tmpPath, true)
    new JournalWriter(
      if (gzip) new java.util.zip.GZIPOutputStream(raw, 1 << 16) else raw)
  }
  private val attrs: Array[String] = schema.fields.map(f => attrFor.getOrElse(f.name, f.name))
  private var count = 0L

  override def write(row: InternalRow): Unit = {
    val ev = LwesEvent(eventName)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val dt = schema.fields(i).dataType
        val v = row.get(i, dt) match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => other
        }
        LwesOptions.setAttr(ev, attrs(i), dt, v)
      }
      i += 1
    }
    out.write(ev)
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = new Path(dir, finalName)
    if (!fs.rename(tmpPath, dest))
      throw new java.io.IOException(s"rename $tmpPath -> $dest failed")
    LwesCommitMessage(dest.toString, count)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}
