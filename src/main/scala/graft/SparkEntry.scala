package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ThreatOps.qUserFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. preprocessing
    "q_preprocess" -> (ThreatOps.qPreprocess _),
    // B. behavioral / graph analytics
    "q_after_hours_top" -> (ThreatOps.qAfterHoursTop _),
    "q_resource_access" -> (ThreatOps.qResourceAccess _),
    "q_high_activity" -> (ThreatOps.qHighActivity _),
    "q_activity_patterns" -> (ThreatOps.qActivityPatterns _),
    "q_degree_centrality" -> (ThreatOps.qDegreeCentrality _),
    "q_activity_entropy" -> (ThreatOps.qActivityEntropy _),
    "q_temporal_entropy" -> (ThreatOps.qTemporalEntropy _),
    "q_resource_entropy" -> (ThreatOps.qResourceEntropy _),
    // C. feature extraction
    "q_user_features" -> (ThreatOps.qUserFeatures _),
    // E. relational core
    "q1_agg" -> (RelationalOps.q1Agg _),
    "q3_join" -> (RelationalOps.q3Join _),
    "q_window" -> (RelationalOps.qWindow _),
    "q_sessionize" -> (RelationalOps.qSessionize _),
    "q_windowed_counts" -> (RelationalOps.qWindowedCounts _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_preprocess" ->
      """SELECT event_id, user_id, event_type,
         json_extract_string(props,'$.k') AS resource,
         EXTRACT(hour FROM ts) AS hour_of_day,
         isodow(ts)-1 AS day_of_week,
         CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END::BIGINT AS is_weekend,
         CASE WHEN EXTRACT(hour FROM ts) < 8 OR EXTRACT(hour FROM ts) > 18 THEN 1 ELSE 0 END::BIGINT AS is_after_hours
         FROM events
         WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
         ORDER BY event_id""",
    "q_after_hours_top" ->
      """SELECT user_id, count(*) AS after_hours_count FROM events
         WHERE EXTRACT(hour FROM ts) < 8 OR EXTRACT(hour FROM ts) > 18
         GROUP BY user_id ORDER BY after_hours_count DESC, user_id LIMIT 10""",
    "q_resource_access" ->
      """SELECT user_id, count(DISTINCT json_extract_string(props,'$.k')) AS unique_resources,
         count(*) AS total_accesses
         FROM events GROUP BY user_id
         ORDER BY unique_resources DESC, user_id LIMIT 10""",
    "q_high_activity" ->
      """SELECT user_id, count(*) AS activity_count FROM events
         GROUP BY user_id ORDER BY activity_count DESC, user_id LIMIT 10""",
    "q_activity_patterns" ->
      """SELECT user_id, event_type, count(*) AS n FROM events
         GROUP BY user_id, event_type ORDER BY user_id, n DESC, event_type""",
    "q_degree_centrality" ->
      """SELECT user_id, count(*)*2 AS total_degree FROM events
         GROUP BY user_id ORDER BY total_degree DESC, user_id LIMIT 10""",
    "q_activity_entropy" ->
      """SELECT user_id,
         round(log2(sum(f)) - sum(f*log2(f))/sum(f), 4) AS activity_entropy,
         CAST(sum(f) AS BIGINT) AS activity_count
         FROM (SELECT user_id, event_type, count(*)::DOUBLE AS f FROM events GROUP BY 1,2)
         GROUP BY user_id ORDER BY activity_entropy DESC, user_id""",
    "q_temporal_entropy" ->
      """SELECT user_id,
         round(log2(sum(f)) - sum(f*log2(f))/sum(f), 4) AS temporal_entropy,
         CAST(sum(f) AS BIGINT) AS activity_count
         FROM (SELECT user_id, EXTRACT(hour FROM ts) AS h, count(*)::DOUBLE AS f FROM events GROUP BY 1,2)
         GROUP BY user_id ORDER BY temporal_entropy DESC, user_id""",
    "q_resource_entropy" ->
      """SELECT user_id,
         round(log2(sum(f)) - sum(f*log2(f))/sum(f), 4) AS resource_entropy,
         CAST(sum(f) AS BIGINT) AS access_count
         FROM (SELECT user_id, json_extract_string(props,'$.k') AS r, count(*)::DOUBLE AS f
               FROM events GROUP BY 1,2)
         GROUP BY user_id ORDER BY resource_entropy DESC, user_id""",
    "q_user_features" ->
      """WITH lg AS (
           SELECT user_id, event_type, json_extract_string(props,'$.k') AS resource,
             CASE WHEN EXTRACT(hour FROM ts) < 8 OR EXTRACT(hour FROM ts) > 18 THEN 1 ELSE 0 END AS iah,
             CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS iw
           FROM events),
         base AS (
           SELECT user_id, count(*) AS total_activities,
             CAST(sum(iah) AS BIGINT) AS after_hours_activities,
             CAST(sum(iw) AS BIGINT) AS weekend_activities,
             count(DISTINCT resource) AS unique_resources,
             count(DISTINCT event_type) AS activity_types
           FROM lg GROUP BY user_id),
         ae AS (
           SELECT user_id, round(log2(sum(f)) - sum(f*log2(f))/sum(f), 4) AS activity_entropy
           FROM (SELECT user_id, event_type, count(*)::DOUBLE AS f FROM events GROUP BY 1,2)
           GROUP BY user_id),
         te AS (
           SELECT user_id, round(log2(sum(f)) - sum(f*log2(f))/sum(f), 4) AS temporal_entropy
           FROM (SELECT user_id, EXTRACT(hour FROM ts) AS h, count(*)::DOUBLE AS f FROM events GROUP BY 1,2)
           GROUP BY user_id)
         SELECT b.user_id, total_activities, after_hours_activities, weekend_activities,
           unique_resources, activity_types, activity_entropy, temporal_entropy,
           round(after_hours_activities*1.0/greatest(total_activities,1), 4) AS after_hours_ratio,
           round(weekend_activities*1.0/greatest(total_activities,1), 4) AS weekend_ratio
         FROM base b JOIN ae USING(user_id) JOIN te USING(user_id)
         ORDER BY b.user_id""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
         round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_window" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER w AS order_rank,
             round(sum(o_totalprice) OVER w, 2) AS running_spend
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
         WHERE order_rank <= 3 ORDER BY o_custkey, order_rank""",
    "q_sessionize" ->
      """WITH s AS (
           SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         b AS (
           SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts)//1000000 - epoch_us(prev_ts)//1000000 > 1800
               THEN 1 ELSE 0 END AS new_sess
           FROM s),
         c AS (
           SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
           FROM b),
         g AS (
           SELECT user_id, session_id, count(*) AS n_events,
             epoch_us(max(ts))//1000000 - epoch_us(min(ts))//1000000 AS duration_s
           FROM c GROUP BY user_id, session_id)
         SELECT user_id, count(*) AS n_sessions,
           max(n_events) AS max_session_events,
           CAST(max(duration_s) AS BIGINT) AS max_session_duration_s,
           round(avg(n_events), 4) AS avg_session_events
         FROM g GROUP BY user_id ORDER BY user_id""",
    "q_windowed_counts" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
