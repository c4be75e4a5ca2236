package graft.sources.lwes

import java.nio.file.Files

import graft.lwes.{JournalWriter, LwesEvent}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scan-partition locality: block hosts flow from the listing
  * (`listLocatedStatus` — no per-file RPC) through `LwesInputPartition`
  * into `preferredLocations()`, and bin-packing groups files by primary
  * host so a bin's task reads every file locally. On a real HDFS/YARN
  * cluster this is the difference between node-local and remote reads
  * for every journal; on local FS it must be behavior-neutral.
  */
class LwesLocalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def part(path: String, len: Long, hosts: String*) =
    LwesInputPartition(path, len, Map.empty, hosts)

  test("block hosts extract byte-ranked from a located status") {
    import org.apache.hadoop.fs.{BlockLocation, FileStatus, LocatedFileStatus, Path}
    // a 3-block file: hostB serves 2 blocks (256 MB), hostA/hostC one each
    val blocks = Array(
      new BlockLocation(Array("hostA:9866", "hostB:9866"),
        Array("hostA", "hostB"), 0L, 128L << 20),
      new BlockLocation(Array("hostB:9866", "hostC:9866"),
        Array("hostB", "hostC"), 128L << 20, 128L << 20),
      new BlockLocation(Array("hostA:9866"), Array("hostA"),
        256L << 20, 64L << 20))
    val st = new LocatedFileStatus(new FileStatus(320L << 20, false, 2,
      128L << 20, 0L, new Path("/journals/j0.gz")), blocks)
    assert(LwesDataSource.hostsOf(st) == Seq("hostB", "hostA", "hostC"))
    // a plain (un-located) status yields no preference
    assert(LwesDataSource.hostsOf(new FileStatus(1L, false, 1, 1L, 0L,
      new Path("/journals/j1.gz"))) == Nil)
  }

  test("frame-run ranges rank hosts by overlapping block bytes") {
    import org.apache.hadoop.fs.{BlockLocation, FileStatus, LocatedFileStatus, Path}
    // 2-block file: block0 on A+B, block1 on B+C
    val blocks = Array(
      new BlockLocation(Array("hostA:9866", "hostB:9866"),
        Array("hostA", "hostB"), 0L, 1000L),
      new BlockLocation(Array("hostB:9866", "hostC:9866"),
        Array("hostB", "hostC"), 1000L, 1000L))
    val st = new LocatedFileStatus(new FileStatus(2000L, false, 2,
      1000L, 0L, new Path("/journals/big.zsj")), blocks)
    // a run fully inside block0 prefers its hosts only
    assert(LwesDataSource.hostsForRange(st, 100L, 900L).toSet ==
      Set("hostA", "hostB"))
    // a run fully inside block1
    assert(LwesDataSource.hostsForRange(st, 1100L, 1900L).toSet ==
      Set("hostB", "hostC"))
    // a straddling run ranks the host covering MORE of it first:
    // [800, 1900) = 200 bytes of block0 + 900 of block1 → B(1100), C(900), A(200)
    assert(LwesDataSource.hostsForRange(st, 800L, 1900L) ==
      Seq("hostB", "hostC", "hostA"))
    // an un-located status yields no preference
    assert(LwesDataSource.hostsForRange(new FileStatus(1L, false, 1, 1L, 0L,
      new Path("/j.zsj")), 0L, 1L) == Nil)
  }

  test("local-FS reads stay behavior-neutral (no locations, same results)") {
    val dir = Files.createTempDirectory("lwes-loc").toString
    (0 until 3).foreach { f =>
      val w = JournalWriter.create(s"$dir/j$f.journal")
      (0 until 5).foreach(i =>
        w.write(LwesEvent("L::E").setInt64("id", f * 10L + i)))
      w.close()
    }
    val df = spark.read.format("lwes").schema("id long").load(dir)
    assert(df.count() == 15)
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head.scan.asInstanceOf[LwesScan]
    val parts = scan.planInputPartitions()
    assert(parts.nonEmpty)
    assert(parts.forall(_.preferredLocations().isEmpty),
      "local filesystems carry no locality; scheduling must stay free")
  }

  test("bin-packing groups by primary host; one host per bin") {
    val slices = Array(
      part("/a/1", 10, "hostA"), part("/a/2", 10, "hostA"),
      part("/a/3", 10, "hostA"), part("/b/1", 10, "hostB"),
      part("/b/2", 10, "hostB"), part("/c/1", 10))
    // maxBytes large, openCost 0, parallelism 1 → maxSplit = total/1 =
    // 60: without host grouping everything would share one bin
    val bins = LwesScan.packPartitions(slices, 1L << 20, 0L, 1)
    assert(bins.length == 3, s"expected one bin per host, got ${bins.toSeq}")
    val byHost = bins.map {
      case m: LwesFilesPartition =>
        m.files.map(_.locations.headOption.getOrElse("")).distinct
      case p: LwesInputPartition => Seq(p.locations.headOption.getOrElse(""))
    }
    assert(byHost.forall(_.size == 1), "a bin must never mix hosts")
    assert(byHost.flatten.toSet == Set("hostA", "hostB", ""))
  }

  test("within a host group the size policy still splits bins") {
    val slices = (0 until 8).map(i => part(s"/a/$i", 100, "hostA")).toArray
    // openCost 0, parallelism 4 → maxSplit = 800/4 = 200 → 4 bins
    val bins = LwesScan.packPartitions(slices, 1L << 20, 0L, 4)
    assert(bins.length == 4)
    assert(bins.forall {
      case m: LwesFilesPartition => m.files.map(_.length).sum <= 200
      case _ => true
    })
  }

  test("multi-file bin ranks hosts by bytes held") {
    val bin = LwesFilesPartition(Seq(
      part("/x/1", 100, "hostA", "hostB"),
      part("/x/2", 50, "hostB"),
      part("/x/3", 30, "hostB", "hostC")))
    // hostB holds 180 bytes, hostA 100, hostC 30
    assert(bin.preferredLocations().toSeq == Seq("hostB", "hostA", "hostC"))
  }

  test("location-less files pack exactly as before (behavior-neutral)") {
    val slices = (0 until 6).map(i => part(s"/p/$i", 50)).toArray
    val bins = LwesScan.packPartitions(slices, 1L << 20, 0L, 2)
    assert(bins.length == 2)
    assert(bins.forall {
      case m: LwesFilesPartition => m.preferredLocations().isEmpty
      case p: LwesInputPartition => p.preferredLocations().isEmpty
    })
  }
}
