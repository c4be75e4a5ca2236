package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` plans of selected gate queries (plan
  * audit scaffolding for docs/PLANS.md). Args: sfDir key... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"===== $k =====")
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
