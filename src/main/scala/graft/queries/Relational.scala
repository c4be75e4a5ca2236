package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared table access for query packs. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Contract: `ts` is nanos-since-epoch LONG regardless of the physical
    * parquet layout. Old layouts store nanosecond INT64 (read verbatim via
    * `nanosAsLong`); current driver testdata stores `timestamp[us]`, which
    * arrives as TIMESTAMP/TIMESTAMP_NTZ and is normalized here to epoch
    * nanos, reinterpreting naive NTZ values as UTC via timezone-free
    * field arithmetic (no session-timezone dependence or mutation).
    * Every downstream `ts div N` site depends on this one boundary. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // NTZ carries no instant; reinterpret the naive value as UTC.
        // Done with timezone-FREE field arithmetic (days-since-epoch +
        // time-of-day micros, all extracted straight from the naive
        // value) rather than a cast to TimestampType, so the result is
        // identical under ANY caller session timezone and no session
        // config needs mutating (a cast would silently follow
        // spark.sql.session.timeZone at execution time). Matches
        // DuckDB's epoch_ns(ts) on the same naive timestamp.
        val dayMicros =
          unix_date(col("ts").cast(DateType)).cast(LongType) * lit(86400000000L)
        val todMicros =
          hour(col("ts")).cast(LongType) * lit(3600000000L) +
            minute(col("ts")).cast(LongType) * lit(60000000L) +
            // extract(SECOND) is decimal(8,6) seconds incl. the micros
            // fraction; ×1e6 in decimal is exact before the long cast
            (expr("extract(SECOND FROM ts)") * lit(1000000)).cast(LongType)
        df.withColumn("ts", (dayMicros + todMicros) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"events.ts unsupported type: $other")
    }
  }
}

/** Relational query surface (SURVEY.md §2 B) — the Hive-SQL capability
  * users ran through the reference SerDe, expressed as declarative
  * DataFrame plans on the TPC-H-ish testdata. Every query has a DuckDB
  * oracle with identical column names and deterministic ordering;
  * float aggregates are rounded at the final projection only.
  */
object Relational {
  import Tables.t

  /** B13 (formerly rows-only): HLL sketch VALUES are engine-specific,
    * but the estimator's tolerance contract is not — `q_approx_distinct`
    * now emits exact distinct counts plus booleans asserting the HLL
    * estimates sit within their rsd bounds (4× rsd: 20% for the default
    * 0.05 sketch, 4% for the 0.01 one), and the oracle replays the
    * exact counts with literal `true`s. HLL is a pure function of the
    * value set (no RNG, merge is commutative), so the booleans are
    * stable across runs and partitionings; a broken sketch — off by
    * orders — hash-mismatches the gate. The necessary-condition-oracle
    * pattern from the round-3 brief. */

  /** name -> (query fn, oracle SQL). */
  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // B13: HLL estimate-quality gate (see scaladoc above).
    "q_approx_distinct" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("l_orderkey")).as("exact_orders"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_orderkey")).as("__a5"),
            approx_count_distinct(col("l_partkey"), 0.01).as("__a1"))
          .select(col("l_returnflag"), col("n"),
            col("exact_orders"), col("exact_parts"),
            (abs(col("__a5") - col("exact_orders"))
              <= col("exact_orders") * lit(0.20)).as("hll_ok"),
            (abs(col("__a1") - col("exact_parts"))
              <= col("exact_parts") * lit(0.04)).as("hll_precise_ok"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS hll_ok, true AS hll_precise_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // B2: multi-key aggregation over the fact table (TPC-H Q1 shape).
    "q1_pricing" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // B1: selective filter + single aggregate (TPC-H Q6 shape); filters
    // and the 4-column projection push down to the parquet scan.
    "q6_revenue" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
      },
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // B3: dim filter -> join -> agg -> top-k (TPC-H Q3 shape); the
    // customer side is broadcast.
    "q3_shipping" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
            col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin)),

    // B4: EXISTS -> left-semi join.
    "q4_order_priority" -> ((
      (s: SparkSession, d: String) => {
        val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        ord.join(li, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // B5: 5-way star join with dim broadcast (TPC-H Q5 shape).
    "q5_local_supplier" -> ((
      (s: SparkSession, d: String) => {
        val asia = t(s, d, "region").filter(col("r_name") === "ASIA")
        val nat = t(s, d, "nation")
        val cust = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = t(s, d, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)),

    // B6: multi-join with expression aggregation (TPC-H Q9 shape).
    "q9_product_profit" -> ((
      (s: SparkSession, d: String) => {
        val part = t(s, d, "part").filter(col("p_name").contains("gear"))
        val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation")
        val ord = t(s, d, "orders")
        t(s, d, "lineitem")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
          // decimal accumulation: exact and order-independent, so the
          // result is stable across engines and partitionings
          .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("profit"))
          .orderBy(col("n_name"), col("o_year").desc)
      },
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
        |ORDER BY n_name, o_year DESC""".stripMargin)),

    // B7: left outer join + distribution (TPC-H Q13 shape).
    "q13_cust_dist" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders").filter(col("o_orderpriority") =!= "5-LOW")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // B8: NOT EXISTS -> left-anti join.
    "q_anti_join" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
        val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)),

    // B9: windowed top-k per group.
    "q_topk_window" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, d, "part")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("p_brand"), col("rnk"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rnk"))
      },
      """SELECT p_brand, rnk, p_partkey, p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        CAST(row_number() OVER (PARTITION BY p_brand
        |          ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
        |      FROM part) ranked
        |WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin)),

    // B10: running sum + lag over a keyed window.
    "q_running_sum" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").filter(col("o_custkey") <= 200)
          .withColumn("running_spend",
            round(sum(col("o_totalprice")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .withColumn("delta_prev",
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("delta_prev"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
        |FROM orders
        |WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // B11: ROLLUP multi-level aggregation.
    "q_rollup" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(round(sum(col("c_acctbal")), 2).as("total_bal"),
            count(lit(1)).as("n_cust"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      """SELECT r_name, n_name, round(sum(c_acctbal), 2) AS total_bal,
        |  count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    // B11b: CUBE — all grouping-set combinations in one pass.
    "q_cube" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // B19: salted skew join vs a plain-join oracle — the salt spreads
    // each key over 16 shuffle partitions and must be result-invisible.
    "q_salted_join" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"), col("s_nationkey"))
        graft.operators.SkewJoin
          .salted(li, sup, "l_suppkey", "l_orderkey", salt = 16)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_quantity")), 2).as("total_qty"))
          .orderBy(col("s_nationkey"))
      },
      """SELECT s_nationkey, count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // B12: exact distincts + conditional counts, pre-aggregated per side
    // so the nation join never fans out.
    // B36: PIVOT — wide-format reshaping (`groupBy().pivot()`), planned
    // as a single pass of conditional aggregates (one shuffle, same as
    // a plain groupBy — never a per-column self-join). The pivot value
    // list is pinned so the output schema is static: at 100 TB an
    // unpinned pivot means a separate values-discovery job first.
    "q_pivot" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(round(sum(col("l_quantity")), 2))
          .select(col("l_returnflag"),
            coalesce(col("F"), lit(0.0)).as("qty_f"),
            coalesce(col("O"), lit(0.0)).as("qty_o"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag,
        |  coalesce(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2), 0) AS qty_f,
        |  coalesce(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2), 0) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "q_distinct" -> ((
      (s: SparkSession, d: String) => {
        val supAgg = t(s, d, "supplier").groupBy(col("s_nationkey"))
          .agg(countDistinct(col("s_suppkey")).as("n_supp"))
        val custAgg = t(s, d, "customer").groupBy(col("c_nationkey"))
          .agg(countDistinct(col("c_custkey")).as("n_cust"),
            count(when(col("c_acctbal") > 0, 1)).as("n_pos_bal"))
        t(s, d, "nation")
          .join(supAgg, col("n_nationkey") === col("s_nationkey"), "left_outer")
          .join(custAgg, col("n_nationkey") === col("c_nationkey"), "left_outer")
          .select(col("n_name"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_pos_bal"), lit(0L)).as("n_pos_bal"))
          .orderBy(col("n_name"))
      },
      """SELECT n_name,
        |  coalesce(s.n_supp, 0) AS n_supp,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(c.n_pos_bal, 0) AS n_pos_bal
        |FROM nation
        |LEFT OUTER JOIN (SELECT s_nationkey, count(DISTINCT s_suppkey) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) s ON n_nationkey = s.s_nationkey
        |LEFT OUTER JOIN (SELECT c_nationkey, count(DISTINCT c_custkey) AS n_cust,
        |        count(*) FILTER (WHERE c_acctbal > 0) AS n_pos_bal
        |      FROM customer GROUP BY c_nationkey) c ON n_nationkey = c.c_nationkey
        |ORDER BY n_name""".stripMargin)),

    // B5/B6: revenue between a nation pair by year (TPC-H Q7 shape).
    "q7_volume" -> ((
      (s: SparkSession, d: String) => {
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // B3/B7: top customers by returned-item revenue (TPC-H Q10 shape).
    "q10_returned" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)),

    // B2/B18: promo revenue share (TPC-H Q14 shape) — ratio of exact
    // decimal sums, so the division inputs are engine-identical.
    "q14_promo" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) * sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
              .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
              / sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
                .cast("decimal(18,6)")).cast("double"), 6).as("promo_revenue_pct"))
      },
      """SELECT round(
        |    100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |  6) AS promo_revenue_pct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin)),

    // B18: CASE expressions + timestamp interval arithmetic (Q12 shape).
    "q12_shipmode" -> ((
      (s: SparkSession, d: String) => {
        val ord = t(s, d, "orders")
        t(s, d, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))
          .orderBy(col("l_returnflag"))
      },
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // B35: bucketed co-located join — both fact sides written bucketed
    // on the join key, so the sort-merge join needs NO shuffle of either
    // side (the zero-exchange plan is asserted in MiscSpec). This is the
    // 100 TB co-location pattern: pay the bucket shuffle once at ingest,
    // amortize it over every subsequent join on the key. First call per
    // session writes the bucketed tables (external, under tmpdir);
    // bench's min-of-3 therefore reports the steady-state join cost.
    "q_bucketed_join" -> ((
      (s: SparkSession, d: String) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val (li, ord) = (s"graft_bkt_li_$tag", s"graft_bkt_ord_$tag")
        if (!s.catalog.tableExists(li)) {
          val base = s"${System.getProperty("java.io.tmpdir")}/graft-bkt-$tag"
          t(s, d, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").option("path", s"$base/lineitem").saveAsTable(li)
          t(s, d, "orders").select("o_orderkey", "o_orderpriority")
            .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").option("path", s"$base/orders").saveAsTable(ord)
        }
        // merge hint: keep the SMJ (a broadcast would hide the
        // co-location being measured) without touching session conf
        s.table(li).hint("merge")
          .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))
  )
}
