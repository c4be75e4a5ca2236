package graft.functions

import graft.functions.LwesExpressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LwesFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("to_lwes -> from_lwes round-trips typed fields") {
    val df = Seq((1L, "alpha", 2.5, true), (2L, "beta", -1.25, false))
      .toDF("id", "name", "score", "flag")
    val out = df
      .select(to_lwes(struct($"id", $"name", $"score", $"flag"), "T::E").as("bin"))
      .select(from_lwes($"bin", "id long, name string, score double, flag boolean").as("e"))
      .select("e.id", "e.name", "e.score", "e.flag")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSeq
      == Seq((1L, "alpha", 2.5, true), (2L, "beta", -1.25, false)))
  }

  test("lwes_event_name peeks the type; missing fields read as null") {
    val df = Seq((7L, "x")).toDF("id", "name")
    val bin = df.select(to_lwes(struct($"id", $"name"), "My::Type").as("bin"))
    assert(bin.select(lwes_event_name($"bin")).head.getString(0) == "My::Type")
    val e = bin.select(from_lwes($"bin", "id long, nope string").as("e"))
      .select("e.id", "e.nope").head
    assert(e.getLong(0) == 7L && e.isNullAt(1))
  }

  test("SQL registration: from_lwes/to_lwes/lwes_event_name usable in spark.sql") {
    LwesExpressions.register(spark)
    Seq((5L, "hello")).toDF("id", "msg").createOrReplaceTempView("src")
    val r = spark.sql(
      """SELECT lwes_event_name(bin) AS en,
        |       from_lwes(bin, 'id long, msg string').msg AS msg
        |FROM (SELECT to_lwes(struct(id, msg), 'Q::R') AS bin FROM src)""".stripMargin)
      .head
    assert(r.getString(0) == "Q::R" && r.getString(1) == "hello")
  }

  test("malformed bytes -> null, not an exception") {
    val df = Seq(Array[Byte](1, 2, 3)).toDF("bin")
    val r = df.select(from_lwes($"bin", "id long").as("e"),
      lwes_event_name($"bin").as("en")).head
    assert(r.isNullAt(0) || r.getStruct(0).isNullAt(0))
  }
}
