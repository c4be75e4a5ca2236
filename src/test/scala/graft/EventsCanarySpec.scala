package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** q_events_canary: the testdata-contract gate must pass on real driver
  * testdata and must fail with the NAMED "testdata schema drift" error on
  * simulated drifts (wrong physical type; wrong time unit) — the r11
  * failure mode where a silent events.ts change cost 12 gate keys.
  */
class EventsCanarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canary(dir: String) =
    graft.queries.Events.all("q_events_canary")._1(spark, dir)

  test("canary is green on driver testdata and emits one stats row") {
    val r = canary("/root/testdata/sf0.001").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) > 0)                      // n
    assert(row.getLong(1) >= 946684800000000L)      // min_us ≥ 2000-01-01
    assert(row.getLong(2) < 4102444800000000L)      // max_us < 2100-01-01
  }

  test("a wrong physical type fails fast with the named drift message") {
    import spark.implicits._
    val dir = Files.createTempDirectory("canary-type").toString
    Seq(1.5d, 2.5d).toDF("ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    assert(e.getMessage.contains("DoubleType"))
  }

  test("a unit drift (seconds stored as long) fails with the named message") {
    import spark.implicits._
    // LONG contract is epoch NANOS; epoch seconds are ~9 orders too
    // small and must trip the range check, not silently hash-mismatch.
    val dir = Files.createTempDirectory("canary-unit").toString
    Seq(1700000000L, 1700000600L).toDF("ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    assert(e.getMessage.contains("unit"))
  }
}
