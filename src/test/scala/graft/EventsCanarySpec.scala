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
    .config("spark.sql.extensions", "graft.GraftExtensions")
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

  test("a unit drift (seconds written into timestamp micros) fails named") {
    import spark.implicits._
    // timestamp physical whose instants sit at ~1.7e9 MICROS (≈ 1970-01)
    // — the signature of epoch seconds written where micros belong; must
    // trip the range check, not silently hash-mismatch downstream.
    val dir = Files.createTempDirectory("canary-unit").toString
    Seq(new java.sql.Timestamp(1700000L), new java.sql.Timestamp(1700600L))
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    assert(e.getMessage.contains("unit"))
  }

  test("a LONG epoch-nanos layout fails fast as ORACLE drift, not later") {
    import spark.implicits._
    // Tables.events can normalize LONG nanos, but every events oracle
    // (this key's included) binds epoch_us(ts) — a DuckDB binder error
    // on BIGINT. The canary must name that as drift up front instead of
    // letting the suite die 20 keys later on a cross-engine bind.
    val dir = Files.createTempDirectory("canary-long").toString
    Seq(1700000000000000000L, 1700000600000000000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    assert(e.getMessage.contains("DuckDB"))
  }

  test("an empty events table fails with a named message, not an NPE") {
    import spark.implicits._
    val dir = Files.createTempDirectory("canary-empty").toString
    Seq.empty[java.sql.Timestamp].toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    assert(e.getMessage.contains("EMPTY"))
  }

  test("a legacy nano-INT64 annotation infers (nanosAsLong set pre-probe, restored after)") {
    // the probe read must set nanosAsLong BEFORE touching the footer so
    // a nano-annotated file reaches the named type check rather than
    // dying in schema inference with a raw AnalysisException. A nano
    // annotation infers as LongType -> the named oracle-drift message.
    val dir = Files.createTempDirectory("canary-nano").toString
    // write a nano-annotated parquet via arrow-free route: Spark cannot
    // write TIMESTAMP(NANOS), so exercise the conf-ordering contract by
    // clearing the conf and reading a plain LONG file (inference path
    // shared); the dedicated LONG test above covers the message.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    import spark.implicits._
    Seq(1700000000000000000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](canary(dir))
    assert(e.getMessage.contains("testdata schema drift"))
    // ...and RESTORED afterwards (r16): the legacy read behavior must
    // not leak into every later query on the shared session (getOption
    // surfaces the registered default "false" here, never "true")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true")
  }
}
