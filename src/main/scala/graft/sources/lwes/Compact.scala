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
  *    directory).
  */
object Compact {

  private val NameCol = "__compact_event_type"

  /** Rewrite `dir`'s top-level journals into `targetFiles` files.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      compression: String = "gzip"): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    def journals() = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
    val before = journals()
    if (before.isEmpty) return (0, 0)
    val df = spark.read.format("lwes")
      .option(LwesOptions.EventNameColumn, NameCol)
      .option(LwesOptions.InferMaxFiles, Int.MaxValue)
      .option(LwesOptions.InferMaxEvents, Int.MaxValue)
      .load(before.map(_.getPath.toString): _*)
    val tmp = new Path(p, s".compact-${java.util.UUID.randomUUID()}")
    df.coalesce(math.max(targetFiles, 1))
      .write.format("lwes")
      .option(LwesOptions.EventNameColumn, NameCol)
      .option(LwesOptions.Compression, compression)
      .mode("append").save(tmp.toString)
    // promote first (fresh names cannot collide), delete originals after
    val tag = java.util.UUID.randomUUID().toString.take(8)
    fs.listStatus(tmp).filter(_.isFile).zipWithIndex.foreach { case (s, i) =>
      val ext = s.getPath.getName.substring(s.getPath.getName.lastIndexOf('.'))
      if (!fs.rename(s.getPath, new Path(p, f"compact-$tag-$i%05d$ext")))
        throw new java.io.IOException(s"promote ${s.getPath} failed")
    }
    before.foreach(s => fs.delete(s.getPath, false))
    fs.delete(tmp, true)
    (before.length, journals().length)
  }
}
