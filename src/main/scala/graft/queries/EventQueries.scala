package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream batch operators (SURVEY.md §2.10 W1-W2, T6) over the `events`
  * fixture: last-N-per-key recency windows (the conversation-history shape)
  * and time-bucketed aggregations (the batch twin of the Structured Streaming
  * windowed aggregates in graft.streaming).
  *
  * NOTE on timestamps: the fixture stores nanosecond timestamps; Spark
  * truncates to microseconds while DuckDB keeps nanos, so raw `ts` values can
  * never appear in an oracle-checked output — only `date_trunc` buckets or
  * epoch-derived integers. Window ORDER BY uses the microsecond-truncated key
  * on both sides.
  */
object EventQueries {

  private def dsum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T6/W1: last 3 events per user by recency (conversation window shape).
    "evt_user_last3" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"user_id", $"event_id", $"event_type", $"rn")
    }),

    // Tumbling 1-hour window aggregation (batch form of the streaming agg).
    "evt_hourly_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
    }),

    // Per-user daily activity (sessionization precursor).
    "evt_user_daily" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
    }),

    // Gap-based sessionization (batch twin of StreamingOps.sessionize):
    // 30-min inactivity gap per user → session groups via lag + cumsum.
    "evt_sessions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      Tables.events(s, dir)
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || $"us" - $"prev_us" > 30L * 60L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_events"),
             ((max($"us") - min($"us")) / lit(1000000L)).cast("long").as("duration_sec"),
             dsum($"value").as("total_value"))
    }),

    // Sliding 2h/1h window counts (batch twin of StreamingOps.windowedStats).
    "evt_sliding_2h" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "2 hours", "1 hour").getField("start").as("win_start"),
                 $"event_type")
        .agg(count(lit(1)).as("n_events"))
    }),

    // W1 conversation-context assembly (rag_engine.py:260-294 shape): the
    // last 3 events per user, newest first, folded into one context string.
    "evt_conversation_context" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .groupBy($"user_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct($"rn", $"event_type"))),
            x => x.getField("event_type")), " | ").as("context"))
    }),

    // Per-type global stats with order-independent double aggregation.
    "evt_type_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
             dsum($"value").as("total_value"),
             countDistinct($"user_id").as("n_users"))
    }),

    // As-of join: each purchase attached to the same user's most recent
    // click at-or-before it (inclusive), via the single-shuffle union-scan
    // operator. Clicks pre-deduped to one row per (user, ts) so "latest"
    // is well-defined; micros (not raw nanos ts) on both engines.
    "evt_asof_click" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).withColumn("us", unix_micros($"ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"us", $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"us").agg(max($"event_id").as("click_event_id"))
      graft.operators.AsOf.asOfJoin(purchases, clicks, Seq("user_id"), "us",
          Seq("click_event_id"))
        .select($"event_id", $"user_id",
          $"asof_click_event_id".as("click_event_id"),
          ($"us" - $"asof_us").as("gap_us"))
    }),

    // Interval-containment join via binning: purchases inside "incident
    // windows" (hours with >= 6 error events). The range predicate becomes
    // an equi-join on a 30-min bin plus a residual filter — never a
    // nested-loop product, whatever the interval count.
    "evt_incident_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val incidents = ev.filter($"event_type" === "error")
        .groupBy(date_trunc("hour", $"ts").as("hr"))
        .agg(count(lit(1)).as("n_errors"))
        .filter($"n_errors" >= 6)
        .select(unix_micros($"hr").as("start_us"),
          (unix_micros($"hr") + (3600L * 1000000L - 1L)).as("end_us"),
          $"n_errors")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", unix_micros($"ts").as("us"))
      graft.operators.RangeJoin
        .intervalJoin(purchases, "us", incidents, "start_us", "end_us",
          binWidth = 30L * 60L * 1000000L)
        .select($"event_id", $"start_us", $"n_errors")
    }))

  val oracle: Map[String, String] = Map(
    "evt_user_last3" ->
      """SELECT user_id, event_id, event_type, CAST(rn AS INT) AS rn FROM (
           SELECT user_id, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
           FROM events) WHERE rn <= 3""",
    "evt_hourly_stats" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY date_trunc('hour', ts), event_type""",
    "evt_user_daily" ->
      """SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events
         FROM events GROUP BY user_id, date_trunc('day', ts)""",
    "evt_sessions" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  epoch_us(date_trunc('microseconds', ts)) AS us
           FROM events),
         flagged AS (
           SELECT user_id, event_id, value, us,
             CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
         numbered AS (
           SELECT user_id, event_id, value, us,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           FROM flagged)
         SELECT user_id, session_seq, COUNT(*) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
         FROM numbered GROUP BY user_id, session_seq""",
    "evt_sliding_2h" ->
      """SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR * off AS win_start,
                event_type, COUNT(*) AS n_events
         FROM events, (SELECT unnest([0, 1]) AS off)
         GROUP BY date_trunc('hour', ts) - INTERVAL 1 HOUR * off, event_type""",
    "evt_conversation_context" ->
      """SELECT user_id,
           array_to_string(list(event_type ORDER BY rn ASC), ' | ') AS context
         FROM (
           SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn <= 3 GROUP BY user_id""",
    "evt_type_stats" ->
      """SELECT event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
         COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type""",
    // DuckDB's native ASOF JOIN as the oracle for the union-scan operator;
    // both sides on microsecond epochs so the inequality agrees with Spark's
    // micros-truncated timestamps.
    "evt_asof_click" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                     epoch_us(date_trunc('microseconds', ts)) AS us FROM events),
         p AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase'),
         c AS (SELECT user_id, us, MAX(event_id) AS click_event_id
               FROM ev WHERE event_type = 'click' GROUP BY user_id, us)
         SELECT p.event_id, p.user_id, c.click_event_id, p.us - c.us AS gap_us
         FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us""",
    // plain BETWEEN join oracles the binned equi-join encoding
    "evt_incident_join" ->
      """WITH inc AS (
           SELECT epoch_us(date_trunc('hour', ts)) AS start_us,
                  epoch_us(date_trunc('hour', ts)) + (3600000000 - 1) AS end_us,
                  CAST(COUNT(*) AS BIGINT) AS n_errors
           FROM events WHERE event_type = 'error'
           GROUP BY date_trunc('hour', ts) HAVING COUNT(*) >= 6),
         p AS (SELECT event_id, epoch_us(date_trunc('microseconds', ts)) AS us
               FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, i.start_us, i.n_errors
         FROM p JOIN inc i ON p.us BETWEEN i.start_us AND i.end_us""")
}
