package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators from the gap list (SURVEY.md §2.6) — joins, grouped
  * aggregation, window functions, set ops, event-time windows — so a user of
  * the reference gets a complete engine, and the bench has shuffle-bearing
  * plans to measure.
  *
  * FP discipline: per-row arithmetic stays in double (bit-identical across
  * engines); every multi-row sum is over DECIMAL so partial-aggregation
  * order can't produce cross-engine diffs.
  *
  * Output representation (round-1 driver finding): the driver's value-hash
  * renders DECIMAL scale metadata and TIMESTAMP tz-awareness differently
  * across its two read paths, so queries must never EMIT decimal/timestamp
  * columns even when values are equal. Sums stay DECIMAL internally and the
  * final projection casts to DOUBLE (the decimal sum is identical on both
  * engines, and decimal→double rounding is correctly-rounded on both, so the
  * double bits match); timestamps are emitted as formatted strings.
  */
object RelationalOps {

  val ops: Seq[Op] = Seq(

    // TPC-H Q1-shaped grouped aggregation over lineitem (partial agg +
    // single shuffle on the 4-value group key).
    Op("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.spreadSmall(Tables.lineitem(s, dir), col("l_orderkey"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Join pyramid: orders ⋈ customer ⋈ nation with the small dims broadcast
    // (no shuffle on the fact side beyond the final top-k), then top-10
    // customers by spend.
    Op("q_join_topk",
      """SELECT c.c_name, n.n_name,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |             JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY c.c_name, n.n_name
        |ORDER BY revenue DESC, c_name LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_name"), col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("orders"))
        .orderBy(desc("revenue"), asc("c_name")).limit(10)
    },

    // Event-time tumbling window aggregation (batch analog of the
    // Structured Streaming path in graft.streaming).
    Op("q_window_events",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("hour", "event_type")
    },

    // Running per-user cumulative value — ordered window frame (the R8
    // budget window generalized), deterministic tie-break on event_id.
    Op("q_running_total",
      """SELECT event_id, user_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_value"))
        .orderBy("user_id", "event_id")
    },

    // Exact continuous quantiles per group (corpus length distribution —
    // the stats a curation run reports). Both engines interpolate linearly
    // over the sorted values from exact integer inputs, so the doubles
    // match bit-for-bit. At 100 TB you'd switch to approx_percentile
    // (t-digest, mergeable partial aggs) — exact percentile holds the
    // group's values; fine per (small) group, documented tradeoff.
    Op("q_percentiles",
      """SELECT lang,
        |       quantile_cont(n_chars, 0.25) AS q25,
        |       quantile_cont(n_chars, 0.5)  AS q50,
        |       quantile_cont(n_chars, 0.75) AS q75,
        |       CAST(count(*) AS BIGINT) AS docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          expr("percentile(n_chars, 0.25D)").as("q25"),
          expr("percentile(n_chars, 0.5D)").as("q50"),
          expr("percentile(n_chars, 0.75D)").as("q75"),
          count(lit(1)).as("docs"))
        .orderBy("lang")
    },

    // Top-k per group, LOW-cardinality keys. The textbook row_number window
    // over PARTITION BY lang is wrong at 100 TB: five languages means five
    // giant window partitions, each sorted on one task. The scale shape is
    // a salted two-phase aggregation — per-(lang, salt) local top-3 with a
    // bounded collect (group/salt members only), then top-3-of-top-3s per
    // lang over <= salt*3 survivors. No Window node at all (plan-gated);
    // both aggregations combine map-side. The oracle uses the plain window
    // form — same rows, different plan, which is the point.
    Op("q_topk_per_group",
      """SELECT lang, rnk, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
        |              AS BIGINT) AS rnk
        |  FROM documents)
        |WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
      val local = Tables.documents(s, dir)
        .groupBy(col("lang"), pmod(xxhash64(col("doc_id")), lit(16L)).as("salt"))
        .agg(expr("slice(array_sort(collect_list(struct(-n_chars AS negn, doc_id))), 1, 3)").as("top"))
      val global = local.groupBy(col("lang"))
        .agg(expr("slice(array_sort(flatten(collect_list(top))), 1, 3)").as("top"))
      global
        .select(col("lang"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("lang"), (col("i") + 1).cast("bigint").as("rnk"),
          col("t.doc_id").as("doc_id"), (-col("t.negn")).as("n_chars"))
        .orderBy("lang", "rnk")
    },

    // As-of (backward) join — the time-series operator Spark has no native
    // form of: each click joins the latest view of the same user with
    // view.ts <= click.ts. Implemented as the ONE-PASS MERGE, not a join:
    // union both sides with a type tag, one user-partitioned window carries
    // the last non-null view forward (ties: views sort before clicks at
    // equal ts; event_id totalizes the order). One shuffle on user_id, no
    // inequality join — the naive form is O(clicks x views) per user and
    // un-broadcastable at scale; this shape is linear and stays linear at
    // 100 TB. (DuckDB has native ASOF JOIN; the oracle uses the same
    // union+window SQL instead because ASOF's tie semantics on equal
    // view timestamps are not pinned down, and the oracle must be
    // deterministic bit-for-bit.)
    Op("q_asof_join",
      """WITH u AS (
        |  SELECT event_id, user_id, ts, value,
        |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag,
        |         CASE WHEN event_type = 'view' THEN value END AS view_value,
        |         CASE WHEN event_type = 'view' THEN ts END AS view_ts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |w AS (
        |  SELECT event_id, user_id, ts, value, tag,
        |    last_value(view_value IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, tag, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv,
        |    last_value(view_ts IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, tag, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lts
        |  FROM u)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, value,
        |       coalesce(strftime(lts, '%Y-%m-%d %H:%M:%S.%f'), '') AS view_ts,
        |       coalesce(lv, -1.0) AS view_value
        |FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).where(col("event_type").isin("view", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          when(col("event_type") === "view", 0).otherwise(1).as("tag"),
          when(col("event_type") === "view", col("value")).as("view_value"),
          when(col("event_type") === "view", col("ts")).as("view_ts"))
      val w = Window.partitionBy("user_id").orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("event_id"), col("user_id"), col("ts"), col("value"), col("tag"),
          last(col("view_value"), ignoreNulls = true).over(w).as("lv"),
          last(col("view_ts"), ignoreNulls = true).over(w).as("lts"))
        .where(col("tag") === 1)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          col("value"),
          coalesce(date_format(col("lts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("")).as("view_ts"),
          coalesce(col("lv"), lit(-1.0)).as("view_value"))
        .orderBy("event_id")
    },

    // Semi-structured parsing (the reference's JSONL feedback source, S7):
    // typed extraction from a JSON string column + aggregation on the
    // extracted field.
    Op("q_json_props",
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("k_bucket"),
          col("value"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("k_bucket")
    },

    // Sessionization: lag() gap detection + running session counter — the
    // classic event-pipeline window pattern (gap > 30 min starts a session).
    Op("q_sessionize",
      """SELECT event_id, user_id,
        |       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // microsecond arithmetic (unix_micros/epoch_us) on both engines —
      // second-granularity casts truncate vs round differently at the edge
      // ts reads as TIMESTAMP_NTZ; session TZ is UTC so the LTZ cast is identity
      val tsMicros = unix_micros(col("ts").cast("timestamp"))
      val lagMicros = unix_micros(lag(col("ts"), 1).over(byUser).cast("timestamp"))
      val newSession = when(lag(col("ts"), 1).over(byUser).isNull, 1)
        .when(tsMicros - lagMicros > 1800000000L, 1)
        .otherwise(0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), newSession.as("new_session"))
        .select(col("event_id"), col("user_id"),
          sum(col("new_session")).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint").as("session_id"))
        .orderBy("user_id", "event_id")
    },

    // ROLLUP grouping sets: per (event_type, day) with day and grand totals.
    Op("q_rollup",
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
        |       CAST(count(*) AS BIGINT) AS events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY ROLLUP(event_type, date_trunc('day', ts))
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .rollup(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(date_format(col("d"), "yyyy-MM-dd"), lit("ALL")).as("day"),
          col("events"), col("total_value"))
        .orderBy("event_type", "day")
    },

    // Set operation: users with high-value clicks but no high-value purchase.
    Op("q_set_except",
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 190
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 190
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "click" && col("value") > 190).select("user_id").distinct()
        .except(ev.where(col("event_type") === "purchase" && col("value") > 190).select("user_id").distinct())
        .orderBy("user_id")
    },

    // Snapshot diff — the incremental-publish primitive between two corpus
    // versions: per-doc status added / removed / changed / unchanged, with
    // "changed" decided by content hash, never by re-comparing full text.
    // Old and new snapshots are derived deterministically from the one
    // documents table (old = doc_id % 11 <> 0, with doc_id % 13 = 0 texts
    // truncated to simulate edits; new = doc_id % 7 <> 0), so all four
    // statuses are populated. One full-outer shuffle join co-partitioned on
    // doc_id; at 100 TB both sides are bucketed tables on doc_id, making
    // the join exchange-free.
    Op("q_snapshot_diff",
      """WITH old AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN substring(text, 1, 50) ELSE text END) AS h
        |  FROM documents WHERE doc_id % 11 <> 0),
        |new AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.where(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 13 === 0, substring(col("text"), 1, 50))
            .otherwise(col("text"))).as("h"))
      val neu = docs.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h"))
      old.as("o").join(neu.as("n"), col("n.doc_id") === col("o.doc_id"), "full_outer")
        .select(coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
          when(col("o.doc_id").isNull, "added")
            .when(col("n.doc_id").isNull, "removed")
            .when(col("o.h") =!= col("n.h"), "changed")
            .otherwise("unchanged").as("status"))
        .orderBy("doc_id")
    }
  )
}
