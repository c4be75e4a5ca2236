package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (SURVEY.md §2 B14-B16, B18) over the `events`
  * table. `ts` is nanos-since-epoch (read as long); all window specs are
  * keyed by user so no single-partition global sorts exist in any plan.
  */
object Events {
  import Tables.events

  private val SessionGapNs = 1800L * 1000 * 1000 * 1000 // 30 min

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // B34: interval-overlap join — session intervals of DIFFERENT users
    // that overlap in time, via grid-binned equi-join (never an
    // inequality cross-join). Oracle does the plain inequality join.
    "q_interval_join" -> ((
      (s: SparkSession, d: String) => {
        // micros on BOTH sides: DuckDB's parquet reader truncates nano
        // timestamps to micros, so nano-precision endpoints would differ
        val ev = events(s, d).withColumn("tus", expr("ts div 1000"))
        val iv = graft.operators.Sessions
          .sessionize(ev, "user_id", "tus", "event_id", 1800L * 1000 * 1000)
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("tus")).as("s"), max(col("tus")).as("e"))
        val pairs = graft.operators.Temporal
          .intervalJoin(iv, iv, "s", "e", binSize = 3600L * 1000 * 1000)
          .filter(col("a_user_id") < col("b_user_id"))
        pairs.agg(count(lit(1)).as("n_pairs"),
          sum(least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
            .as("total_overlap_us"))
      },
      s"""WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid, t
        |  FROM flagged),
        |iv AS (SELECT user_id, sid, min(t) AS s, max(t) AS e
        |       FROM sess GROUP BY user_id, sid)
        |SELECT count(*) AS n_pairs,
        |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS total_overlap_us
        |FROM iv a JOIN iv b
        |  ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e""".stripMargin)),

    // B30: cohort retention — users' first-activity day vs activity k
    // days later. Day arithmetic stays in epoch-nano longs (integer
    // division) so no timestamp type crosses the engine boundary.
    "q_retention" -> ((
      (s: SparkSession, d: String) => {
        val DayNs = 86400000000000L
        val days = events(s, d)
          .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
          .distinct()
        val cohort = days.groupBy(col("user_id").as("__u"))
          .agg(min(col("day")).as("cohort_day"))
        days.join(cohort, col("user_id") === col("__u"))
          .withColumn("k", col("day") - col("cohort_day"))
          .filter(col("k") <= 7)
          .groupBy(col("cohort_day"), col("k"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_day"), col("k"))
      },
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
        |SELECT c.cohort_day, d.day - c.cohort_day AS k, count(*) AS n_users
        |FROM days d JOIN cohort c ON d.user_id = c.user_id
        |WHERE d.day - c.cohort_day <= 7
        |GROUP BY c.cohort_day, k
        |ORDER BY cohort_day, k""".stripMargin)),

    // B31: exact percentiles (linear interpolation at p*(n-1), the
    // same definition as SQL quantile_cont) of the value distribution
    // per event type.
    "q_percentiles" -> ((
      (s: SparkSession, d: String) => {
        events(s, d)
          .groupBy(col("event_type"))
          .agg(round(percentile(col("value"), lit(0.5)), 4).as("p50"),
            round(percentile(col("value"), lit(0.9)), 4).as("p90"),
            round(percentile(col("value"), lit(0.99)), 4).as("p99"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // B14: gap-based sessionization (graft.operators.Sessions).
    "q_sessionize" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sessions
          .sessionize(events(s, d), "user_id", "ts", "event_id", SessionGapNs)
          .groupBy(col("user_id"))
          .agg(max(col("session_id")).cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
          .withColumn("events_per_session",
            round(col("n_events").cast("double") / col("n_sessions"), 4))
          .orderBy(col("user_id"))
      },
      s"""SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events,
        |  round(count(*)::DOUBLE / sum(new_s), 4) AS events_per_session
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${SessionGapNs}
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |) flagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // B15: funnel — first-touch per stage, ordered-stage counts
    // (graft.operators.Sessions.funnelCounts).
    "q_funnel" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sessions
          .funnelCounts(events(s, d), "user_id", "event_type", "ts",
            Seq("view", "click", "purchase"))
          .select(col("n_view"), col("n_click").as("n_view_click"),
            col("n_purchase").as("n_full_funnel"))
      },
      """SELECT count(t_view) AS n_view,
        |  CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |  CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id) stages""".stripMargin)),

    // B16: tumbling 1-hour windows as engine-portable epoch buckets.
    "q_event_window" -> ((
      (s: SparkSession, d: String) => {
        events(s, d)
          .withColumn("hour_bucket", expr("ts div 3600000000000"))
          .groupBy(col("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("hour_bucket"), col("event_type"))
      },
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY hour_bucket, event_type
        |ORDER BY hour_bucket, event_type""".stripMargin)),

    // B21: as-of join — each purchase matched to the user's most recent
    // click at-or-before it (graft.operators.Temporal).
    "q_asof_join" -> ((
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("value").as("click_value"))
        graft.operators.Temporal.asofJoin(
            purchases, clicks, Seq("user_id"), "ts", "ts",
            rightCols = Seq("click_id", "click_value"), tieBreak = "click_id")
          .select(col("event_id"), col("user_id"), col("click_id"),
            col("click_value"))
          .orderBy(col("event_id"))
      },
      """SELECT l.event_id, l.user_id, r.click_id, r.click_value
        |FROM (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, epoch_ns(ts) AS tns,
        |        event_id AS click_id, value AS click_value FROM events
        |      WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.tns >= r.tns
        |ORDER BY l.event_id""".stripMargin)),

    // B18 (strings): regex extraction from semi-structured props.
    "q_props_extract" -> ((
      (s: SparkSession, d: String) => {
        events(s, d)
          .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
          .groupBy(col("event_type"))
          .agg(round(avg(col("k")), 4).as("avg_k"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type,
        |  round(avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 4) AS avg_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // Testdata-contract canary (r13 verdict task 8): the r11 close lost
    // 12 gate keys to a silent driver-side change of events.ts's
    // physical parquet type. This key pins the contract end-to-end:
    // (1) the physical type must be one Tables.events can normalize,
    // (2) the normalized epoch range must be plausible (catches UNIT
    // drift — seconds/millis stored where micros/nanos are expected —
    // which type checks alone cannot see), and (3) count + min/max + a
    // modular checksum of every row's epoch-micros must hash-match
    // DuckDB's independent read of the same file. Any violation of
    // (1)/(2) fails fast with an explicit "testdata schema drift"
    // message instead of 12 confusing downstream hash mismatches.
    "q_events_canary" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
        // nanosAsLong BEFORE the probe read: a legacy nano-INT64
        // parquet annotation otherwise fails schema INFERENCE with a
        // raw "Illegal Parquet type" AnalysisException — the exact
        // unnamed-failure mode this canary exists to replace
        // ... and RESTORED after it: the legacy flag must not leak a
        // nano-INT64-as-LONG read behavior into every later query on
        // the shared session
        val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val physical =
          try Tables.t(s, d, "events").schema("ts").dataType
          finally prevNanos match {
            case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        // LongType (epoch nanos) is readable by Tables.events but NOT
        // by the suite's DuckDB oracles — epoch_us(BIGINT) is a binder
        // error in every events oracle, including this key's own. A
        // LONG layout therefore IS drift for the verification apparatus
        // and must fail here with the named message, not 20 keys later
        // with a cross-engine binder error.
        if (!Set[org.apache.spark.sql.types.DataType](
              TimestampType, TimestampNTZType).contains(physical))
          throw new IllegalStateException(
            s"testdata schema drift: events.ts physical type is $physical; " +
              "the oracle contract needs TIMESTAMP or TIMESTAMP_NTZ " +
              "(LONG epoch-nanos reads in Spark but no DuckDB oracle " +
              "binds epoch_us on it) — update Tables.events AND the " +
              "events oracles together before trusting any events gate")
        val stats = events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .agg(count(lit(1)).as("n"),
            min(col("tus")).as("min_us"), max(col("tus")).as("max_us"),
            sum(col("tus") % lit(1000000007L)).as("ck"))
        val r = stats.head()
        if (r.getLong(0) == 0L || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalStateException(
            "testdata schema drift: events table is EMPTY at " + d +
              " — min/max/checksum contracts are vacuous; regenerate " +
              "the driver testdata before trusting any events gate")
        val (lo, hi) = (946684800000000L, 4102444800000000L) // 2000..2100 UTC
        if (r.getLong(1) < lo || r.getLong(2) >= hi)
          throw new IllegalStateException(
            s"testdata schema drift: events.ts normalizes to epoch-micros " +
              s"range [${r.getLong(1)}, ${r.getLong(2)}], outside " +
              s"[$lo, $hi) (2000-01-01..2100-01-01 UTC) — likely a unit " +
              "change (seconds/millis) in the driver-generated parquet")
        stats
      },
      """SELECT count(*) AS n,
        |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us,
        |  CAST(sum(epoch_us(ts) % 1000000007) AS BIGINT) AS ck
        |FROM events""".stripMargin))
  )
}
