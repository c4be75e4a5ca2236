package graft.sources.lwes

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Journal-directory compaction (SURVEY.md §2 A18).
  *
  * Streaming sinks land one journal per (epoch, partition) — at scale
  * that is the classic small-files problem (journals are also gzip and
  * unsplittable, so file count IS the read parallelism ceiling).
  * Compaction rewrites a directory into ~`targetFiles` journals in one
  * distributed pass (coalesce — no shuffle) and swaps them in: new
  * files land under a dot-prefixed temp dir (hidden from listings),
  * then replace the originals.
  *
  * Events carry their own attribute set, so no user schema is needed —
  * the union schema is inferred and each rewritten event carries
  * exactly its non-null columns. Rows are re-tagged with `eventName`
  * (single-event-type directories, the reference's `lwes.event_name`
  * table layout); compact multi-event directories one type at a time
  * with the `eventName` read option.
  */
object Compact {

  /** Rewrite `dir`'s journals into `targetFiles` files. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      eventName: String = "Event", compression: String = "gzip"): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    def journals() = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
    val before = journals()
    val df = spark.read.format("lwes").load(dir)
    val tmp = new Path(p, s".compact-${java.util.UUID.randomUUID()}")
    df.coalesce(math.max(targetFiles, 1))
      .write.format("lwes")
      .option(LwesOptions.EventName, eventName)
      .option(LwesOptions.Compression, compression)
      .mode("append").save(tmp.toString)
    // swap: remove originals, promote compacted files
    before.foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(tmp).filter(_.isFile).foreach { s =>
      if (!fs.rename(s.getPath, new Path(p, s.getPath.getName)))
        throw new java.io.IOException(s"promote ${s.getPath} failed")
    }
    fs.delete(tmp, true)
    (before.length, journals().length)
  }
}
