package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: `entry` returns rows at sf0.001 and every
  * `queries` key has an `oracleSql` twin. Run before each round close. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(s).count()
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"ENTRY_ROWS=$n QUERIES=${q.size} ORACLES=${o.size} " +
      s"MATCH=${q == o} ONLY_Q=${(q -- o).toSeq.sorted} ONLY_O=${(o -- q).toSeq.sorted}")
    s.stop()
  }
}
