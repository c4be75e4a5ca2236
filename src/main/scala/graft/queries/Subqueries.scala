package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subquery-shaped relational surface (SURVEY.md §2 B22-B28, B37-B39)
  * — the correlated/scalar/quantified-subquery query shapes Hive users
  * ran through the reference SerDe (TPC-H
  * Q2/Q8/Q11/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22 adapted to the testdata
  * schema, which has no partsupp/receiptdate — with B37-B39 the 22
  * TPC-H query shapes are all represented across B1-B39).
  *
  * The DuckDB oracles are written with genuine correlated subqueries /
  * EXISTS / scalar subqueries; the Spark side expresses the same
  * semantics as declarative joins + aggregations — the decorrelated
  * plan shape one wants at 100 TB anyway (Catalyst performs the same
  * decorrelation on its SQL path).
  *
  * Determinism rules (see also Relational): money sums go through
  * decimal(18,6); l_quantity is integral so double sums/avgs are exact
  * in any accumulation order; comparisons against derived scalars only
  * use exactly-representable values.
  */
object Subqueries {
  import Tables.t

  private def revDec =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // B22 (Q2 shape): correlated scalar MAX — per-nation top-balance
    // suppliers. max() picks an actual stored value, so the equality
    // re-join is exact cross-engine.
    "q2_max_balance" -> ((
      (s: SparkSession, d: String) => {
        val sup = t(s, d, "supplier")
        val mx = sup.groupBy(col("s_nationkey").as("__nk"))
          .agg(max(col("s_acctbal")).as("__mx"))
        sup.join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(mx), col("s_nationkey") === col("__nk") &&
            col("s_acctbal") === col("__mx"))
          .select(col("n_name"), col("s_name"), round(col("s_acctbal"), 2).as("acctbal"))
          .orderBy(col("n_name"), col("s_name"))
      },
      """SELECT n_name, s_name, round(s.s_acctbal, 2) AS acctbal
        |FROM supplier s JOIN nation ON s.s_nationkey = n_nationkey
        |WHERE s.s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
        |                     WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY n_name, s_name""".stripMargin)),

    // B23 (Q8 shape): market share — conditional revenue ratio per
    // order-year for one supplier nation.
    "q8_market_share" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .withColumn("rev", revDec)
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("n_name") === "NATION_7", col("rev"))
              .otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
              sum(col("rev")).cast("double"), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(sum(CASE WHEN n_name = 'NATION_7'
        |          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // B24 (Q15 shape): scalar subquery over an aggregate — supplier(s)
    // whose total revenue equals the global max (exact decimal sums, so
    // the equality is safe).
    "q15_top_supplier" -> ((
      (s: SparkSession, d: String) => {
        // rev is referenced twice (global max + equality join); an eager
        // localCheckpoint materializes the per-supplier aggregate once,
        // so lineitem is scanned/aggregated a single time instead of
        // relying on ReuseExchange to dedupe the two subtrees
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_suppkey")).agg(sum(revDec).as("__rev"))
          .localCheckpoint()
        val mx = rev.agg(max(col("__rev")).as("__mx"))
        rev.join(broadcast(mx), col("__rev") === col("__mx"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("__rev"), 2).cast("double").as("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      """WITH rev AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(round(r, 2) AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)),

    // B25 (Q17 shape): correlated AVG scalar subquery — revenue lost to
    // small orders of one brand. l_quantity is integral, so the per-part
    // avg is exact in both engines and the strict < cannot flip.
    "q17_small_qty" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val avgq = li.groupBy(col("l_partkey").as("__pk"))
          .agg(avg(col("l_quantity")).as("__aq"))
        li.join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#23")),
            col("l_partkey") === col("p_partkey"))
          .join(avgq, col("l_partkey") === col("__pk"))
          .filter(col("l_quantity") < lit(0.2) * col("__aq"))
          .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7,
            2).as("avg_yearly"))
      },
      """SELECT round(
        |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7, 2) AS avg_yearly
        |FROM lineitem l JOIN part ON l.l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                            WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // B26 (Q18 shape): aggregate-HAVING subquery — customers with
    // large-quantity orders (integral sums: exact).
    "q18_large_orders" -> ((
      (s: SparkSession, d: String) => {
        val big = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("__ok"))
          .agg(sum(col("l_quantity")).as("__q"))
          .filter(col("__q") > 250)
        t(s, d, "orders").join(big, col("o_orderkey") === col("__ok"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            round(col("o_totalprice"), 2).as("o_totalprice"),
            round(col("__q"), 2).as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      """WITH tq AS (
        |  SELECT l_orderkey, sum(l_quantity) AS q FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  round(o_totalprice, 2) AS o_totalprice, round(q, 2) AS total_qty
        |FROM orders JOIN tq ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // B27 (Q19 shape): disjunctive multi-clause predicate over a
    // broadcast dim join — each disjunct pairs brand/size/quantity.
    "q19_disjunctive" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
          .agg(round(sum(revDec), 2).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // B28 (Q21 shape): EXISTS + NOT EXISTS correlated self-joins — late
    // lines whose supplier is the SOLE late supplier on a multi-supplier
    // order ("late" = shipped >90 days after order date). The Spark side
    // is the decorrelated one-pass per-order aggregation; the oracle is
    // the literal double-correlated form.
    "q21_sole_late" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        // two-level aggregation instead of countDistinct×2: a single
        // Expand-free pass per (order, supplier), then per order — the
        // shape that holds when one order has thousands of lines
        val perSupp = li.groupBy(col("l_orderkey").as("__ok"), col("l_suppkey"))
          .agg(max(col("late")).as("__supp_late"),
            count(when(col("late"), lit(1))).as("__supp_late_lines"))
        val perOrder = perSupp.groupBy(col("__ok"))
          .agg(count(lit(1)).as("__n_supp"),
            count(when(col("__supp_late"), lit(1))).as("__n_late_supp"),
            max(when(col("__supp_late"), col("l_suppkey"))).as("__late_supp"),
            sum(when(col("__supp_late"), col("__supp_late_lines"))
              .otherwise(lit(0L))).as("__n_late_lines"))
          .filter(col("__n_supp") >= 2 && col("__n_late_supp") === 1)
        perOrder
          .join(broadcast(t(s, d, "supplier")), col("__late_supp") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("__n_late_lines")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // B29 (Q22 shape): global scalar threshold + anti-join — "idle"
    // customers with above-average balance and no RECENT orders (the
    // no-orders-ever set is empty on this data). The threshold is
    // derived from an exact decimal sum so both engines compare against
    // the identical double.
    "q22_idle_customers" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("__thr"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("__thr"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"),
            round(sum(col("c_acctbal").cast("decimal(18,2)")), 2).cast("double").as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // B37 (Q11 shape): grouped aggregate HAVING against a SCALED global
    // scalar over the same fact — "important" parts whose revenue from
    // a 3-nation supplier group exceeds 2x the average per-part share.
    // TPC-H's fixed FRACTION scales with SF (partsupp grows), so the
    // threshold derives from the part count instead: total * 2.0 /
    // count(part). Determinism: the per-part and total sums are exact
    // decimal(18,6); both engines cast the same decimals to double
    // (identical IEEE rounding), *2.0 is an exponent shift, and the
    // division double/int64 is one IEEE op — the strict > cannot flip.
    "q11_important_parts" -> ((
      (s: SparkSession, d: String) => {
        val nat3 = t(s, d, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        // rev is referenced twice (per-part rows + global total); the
        // eager localCheckpoint materializes the 3-nation aggregate once
        // (the q15 pattern) instead of re-scanning lineitem
        val rev = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat3), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(revDec).as("__v"))
          .localCheckpoint()
        val tot = rev.agg(sum(col("__v")).cast("double").as("__tot"))
        val cnt = t(s, d, "part").agg(count(lit(1)).as("__cnt"))
        rev.crossJoin(broadcast(tot)).crossJoin(broadcast(cnt))
          .filter(col("__v").cast("double") > col("__tot") * lit(2.0) / col("__cnt"))
          .select(col("l_partkey").as("partkey"),
            round(col("__v"), 2).cast("double").as("value"))
          .orderBy(col("value").desc, col("partkey"))
      },
      """WITH rev AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS partkey, CAST(round(v, 2) AS DOUBLE) AS value
        |FROM rev
        |WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) FROM rev) * 2.0 /
        |      (SELECT count(*) FROM part)
        |ORDER BY value DESC, partkey""".stripMargin)),

    // B38 (Q16 shape): COUNT(DISTINCT) under a NOT-IN exclusion
    // subquery + IN-list/negated-prefix dim filters — supplier variety
    // per (brand, type, size), excluding negative-balance suppliers.
    // The NOT IN set (s_suppkey) is non-null by construction, so the
    // Spark anti-join is exactly NOT IN (no three-valued-logic gap).
    "q16_supplier_variety" -> ((
      (s: SparkSession, d: String) => {
        val p = t(s, d, "part").filter(
          col("p_brand") =!= "Brand#13" &&
            !col("p_type").startsWith("PROMO") &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        val excl = t(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        t(s, d, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // B39 (Q20 shape): nested IN subqueries with a correlated scalar
    // threshold — suppliers in a nation group who shipped more than a
    // quarter of some red part's late-window volume. The Spark side
    // decorrelates to a two-level aggregate + per-part window sum (the
    // q21 pattern: no countDistinct blow-up, no re-scan for the
    // correlated total — the partition-window sum IS the per-part
    // denominator). 0.25 is dyadic and l_quantity integral, so both
    // sides of the strict > are exact doubles.
    "q20_excess_shippers" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val red = t(s, d, "part")
          .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
        val windowLines = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
          .join(broadcast(red), col("l_partkey") === col("p_partkey"))
        val perSuppPart = windowLines
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("__qs"))
        val withPartTotal = perSuppPart.withColumn("__pt",
          sum(col("__qs")).over(Window.partitionBy(col("l_partkey"))))
        val excess = withPartTotal
          .filter(col("__qs") > lit(0.25) * col("__pt"))
          .select(col("l_suppkey")).distinct()
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11", "NATION_19"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), round(col("s_acctbal"), 2).as("acctbal"))
          .orderBy(col("s_name"))
      },
      """SELECT s_name, round(s_acctbal, 2) AS acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3','NATION_7','NATION_11','NATION_19')
        |  AND s_suppkey IN (
        |    SELECT l1.l_suppkey FROM lineitem l1
        |    WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l1.l_shipdate >= TIMESTAMP '2001-06-01'
        |    GROUP BY l1.l_suppkey, l1.l_partkey
        |    HAVING sum(l1.l_quantity) > 0.25 * (
        |      SELECT sum(l2.l_quantity) FROM lineitem l2
        |      WHERE l2.l_partkey = l1.l_partkey
        |        AND l2.l_shipdate >= TIMESTAMP '2001-06-01'))
        |ORDER BY s_name""".stripMargin))
  )
}
