package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Relational, TimeJoins}

/** The relational parity surface (SURVEY §2 A14 + framework operators
  * F10-F20, F37-F38) as driver-checkable queries over the testdata
  * star schema. Each query has a DuckDB oracle with matching column
  * names; double aggregates are rounded identically on both sides. */
object RelationalQueries {

  // Shared by the three as-of gates (plain / bucketed / timestamp-native
  // entry): latest click at-or-before each purchase, left-joined so
  // purchases with no prior click keep NULLs.
  private val asofOracleSql =
    s"""WITH e AS (SELECT user_id, ${Q.tsUs} AS ts, event_id,
          event_type FROM events),
        p AS (SELECT event_id AS evt_id, user_id, ts FROM e
          WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, event_id FROM e
          WHERE event_type = 'click'),
        j AS (SELECT p.evt_id, p.user_id, p.ts, c.ts AS prior_ts,
            c.event_id AS prior_event_id,
            row_number() OVER (PARTITION BY p.evt_id
              ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM p LEFT JOIN c
            ON p.user_id = c.user_id AND c.ts <= p.ts)
        SELECT evt_id, user_id, ts, prior_ts, prior_event_id
        FROM j WHERE rn = 1"""

  val all: Seq[Q] = Seq(

    // F20/F19: groupBy-aggregate with map-side partial agg (TPC-H Q1 shape).
    Q("q1_agg",
      (s, dir) => Q.t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
              round(CAST(sum(l_extendedprice) AS DOUBLE), 4) AS sum_price,
              round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc,
              count(*) AS cnt
              FROM lineitem GROUP BY 1, 2""")),

    // F1/F10: predicate + projection pushed to the parquet scan.
    Q("q_filter_scan",
      (s, dir) => Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
          col("l_discount") > 0.03)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue")),
      Some("""SELECT l_returnflag, count(*) AS cnt,
              round(CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4) AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.03
              GROUP BY 1""")),

    // F37: multi-way equi-join (orders ⋈ customer ⋈ nation).
    Q("q_join_3way",
      (s, dir) => Q.t(s, dir, "orders")
        .join(Q.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Q.t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 4).as("total")),
      Some("""SELECT n_name, count(*) AS cnt,
              round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1""")),

    // Broadcast join: part is always the small dim side.
    Q("q_broadcast_join",
      (s, dir) => Q.t(s, dir, "lineitem")
        .join(broadcast(Q.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt")),
      Some("""SELECT p_brand, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS cnt
              FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""")),

    // Salted skew-safe join — MUST equal the plain join (shared
    // oracle): salting is a physical rewrite, not a semantic one.
    Q("q_salted_join",
      (s, dir) => {
        val o = Q.t(s, dir, "orders")
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val c = Q.t(s, dir, "customer")
          .select(col("c_custkey").as("custkey"), col("c_nationkey"))
        graft.operators.Relational.saltedJoin(o, c, "custkey", salt = 8)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"),
            round(sum("o_totalprice"), 4).as("total"))
      },
      Some("""SELECT c_nationkey, count(*) AS cnt,
              round(sum(o_totalprice), 4) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1""")),

    // Semi-join shape: customers with/without orders per segment.
    Q("q_semi_anti",
      (s, dir) => {
        val activeCust = Q.t(s, dir, "orders").select(col("o_custkey")).distinct()
        Q.t(s, dir, "customer")
          .join(activeCust, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"), count(col("o_custkey")).as("n_with_orders"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_cust, count(o_custkey) AS n_with_orders
              FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) t
              ON c_custkey = o_custkey GROUP BY 1""")),

    // F14: total-order sort + top-k with output rank.
    Q("q_topk",
      (s, dir) => Relational.topK(
        Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        10, Seq(col("o_totalprice").desc, col("o_orderkey").asc)),
      Some("""SELECT o_orderkey, o_totalprice,
              CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
              FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // F18: secondary sort — per-user event sequence ordered by time.
    Q("q_secondary_sort",
      (s, dir) => Relational.secondarySort(
        Q.eventsUs(s, dir), "user_id", Seq("ts", "event_id"), "event_type")
        .select(col("user_id"), concat_ws(",", col("values")).as("seq"), col("cnt")),
      Some(s"""SELECT user_id,
               string_agg(event_type, ',' ORDER BY ${Q.tsUs}, event_id) AS seq,
               count(*) AS cnt
               FROM events GROUP BY 1""")),

    // Window function: running per-user sum (F18's Spark-native upgrade).
    Q("q_window_running",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Q.eventsUs(s, dir).filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
            round(sum("value").over(w), 6).as("running"))
      },
      Some(s"""SELECT user_id, event_id,
               round(CAST(sum(value) OVER (PARTITION BY user_id
                 ORDER BY ${Q.tsUs}, event_id) AS DOUBLE), 6) AS running
               FROM events WHERE user_id < 5""")),

    // Window navigation: per-user inter-event gaps via lag/lead.
    Q("q_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Q.eventsUs(s, dir).filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
            (col("ts") - lag("ts", 1).over(w)).as("gap_prev"),
            (lead("ts", 1).over(w) - col("ts")).as("gap_next"))
      },
      Some(s"""SELECT user_id, event_id,
               ${Q.tsUs} - lag(${Q.tsUs}, 1) OVER w AS gap_prev,
               lead(${Q.tsUs}, 1) OVER w - ${Q.tsUs} AS gap_next
               FROM events WHERE user_id < 5
               WINDOW w AS (PARTITION BY user_id ORDER BY ${Q.tsUs}, event_id)""")),

    // Exact percentiles (sort-based linear interpolation on both
    // engines: pos = p·(n−1), lower + frac·(upper−lower)).
    Q("q_percentile",
      (s, dir) => Q.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95")),
      Some("""SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
              FROM lineitem GROUP BY 1""")),

    // Distinct aggregation.
    Q("q_distinct_agg",
      (s, dir) => Q.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("nd_supp"),
          countDistinct("l_partkey").as("nd_part")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS nd_supp,
              count(DISTINCT l_partkey) AS nd_part FROM lineitem GROUP BY 1""")),

    // F38: union of heterogeneous inputs.
    Q("q_union_all",
      (s, dir) => Q.t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nk"), lit("cust").as("kind"))
        .unionByName(Q.t(s, dir, "supplier")
          .select(col("s_nationkey").cast("int").as("nk"), lit("supp").as("kind")))
        .groupBy("nk", "kind").agg(count(lit(1)).as("cnt")),
      Some("""SELECT nk, kind, count(*) AS cnt FROM (
              SELECT CAST(c_nationkey AS INT) AS nk, 'cust' AS kind FROM customer
              UNION ALL
              SELECT CAST(s_nationkey AS INT) AS nk, 'supp' AS kind FROM supplier)
              GROUP BY 1, 2""")),

    // A14 wordcount: tokenize + count.
    Q("q_wordcount",
      (s, dir) => Relational.wordCount(Q.t(s, dir, "documents"), "text"),
      Some("""SELECT token, count(*) AS cnt FROM (
              SELECT unnest(list_filter(regexp_split_to_array(text, ' +'),
                x -> x <> '')) AS token FROM documents)
              GROUP BY 1""")),

    // A14 histogram aggregation (AggregateWordHistogram family):
    // frequency-of-frequency over the word counts — two cascaded
    // aggregations, both map-side combining.
    Q("q_word_histogram",
      (s, dir) => Relational.wordCount(Q.t(s, dir, "documents"), "text")
        .groupBy(col("cnt").as("freq"))
        .agg(count(lit(1)).as("n_words"))
        .select(col("freq"), col("n_words")),
      Some("""SELECT cnt AS freq, count(*) AS n_words FROM (
              SELECT token, count(*) AS cnt FROM (
                SELECT unnest(list_filter(regexp_split_to_array(text, ' +'),
                  x -> x <> '')) AS token FROM documents)
              GROUP BY 1) GROUP BY 1""")),

    // A14 grep: regex filter + per-match count.
    Q("q_grep",
      (s, dir) => Relational.grep(Q.t(s, dir, "documents"), "text", "^s"),
      Some("""SELECT token, count(*) AS cnt FROM (
              SELECT unnest(list_filter(regexp_split_to_array(text, ' +'),
                x -> x <> '')) AS token FROM documents)
              WHERE regexp_matches(token, '^s')
              GROUP BY 1""")),

    // F25 shape: one global aggregate row.
    Q("q_global_agg",
      (s, dir) => Q.t(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").as("sum_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
          date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship")),
      Some("""SELECT count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
              round(CAST(avg(l_extendedprice) AS DOUBLE), 6) AS avg_price,
              strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
              strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
              FROM lineitem""")),

    // Tumbling 1-hour windows over the event stream (batch view of the
    // Structured Streaming pipeline in graft.streaming).
    Q("q_event_windows",
      (s, dir) => Q.eventsUs(s, dir)
        .groupBy(expr("ts div 3600000000").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 6).as("sum_value")),
      Some(s"""SELECT ${Q.tsUs} // 3600000000 AS hour, event_type,
               count(*) AS cnt, round(CAST(sum(value) AS DOUBLE), 6) AS sum_value
               FROM events GROUP BY 1, 2""")),

    // As-of join (union + running-window merge — no inequality join):
    // each purchase picks the user's latest click at-or-before it.
    Q("q_asof_join",
      (s, dir) => {
        val e = Q.eventsUs(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("evt_id"), col("user_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        TimeJoins.asofJoin(purchases, clicks, "user_id", "ts",
          Seq("event_id"), "prior_")
      },
      Some(asofOracleSql)),

    // Timestamp-NATIVE entry under the same oracle: events.ts is fed to
    // the operator in the file's own timestamp type (no µs pre-cast);
    // the operator normalizes internally via TimeEncodings, so the
    // output is epoch-µs either way. On legacy nanos-as-long data there
    // is no timestamp type to exercise — the gate then routes through
    // the µs loader and degenerates to q_asof_join exactly.
    Q("q_asof_join_ts",
      (s, dir) => {
        val raw = Q.events(s, dir)
        val e = if (raw.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType) Q.eventsUs(s, dir) else raw
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("evt_id"), col("user_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        TimeJoins.asofJoin(purchases, clicks, "user_id", "ts",
          Seq("event_id"), "prior_")
      },
      Some(asofOracleSql)),

    // The hot-key escape hatch under the SAME oracle: the merge window
    // is partitioned by (user, 6h time bucket) with predecessor seeds,
    // so one task buffers at most a bucket of one key's history — the
    // result is contract-identical to q_asof_join bit-for-bit.
    Q("q_asof_join_bucketed",
      (s, dir) => {
        val e = Q.eventsUs(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("evt_id"), col("user_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        TimeJoins.asofJoinBucketed(purchases, clicks, "user_id", "ts",
          Seq("event_id"), bucketWidth = 6L * 3600000000L, "prior_")
      },
      Some(asofOracleSql)),

    // Banded range join (equi-join on (key, time-band) + residual —
    // never a nested-loop theta join): clicks in the 24h before each
    // purchase, with empty windows kept as zero rows.
    Q("q_range_join",
      (s, dir) => {
        val e = Q.eventsUs(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("evt_id"), col("user_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        val dayUs = 86400000000L
        val agg = TimeJoins
          .bandedRangePairs(purchases, clicks, "user_id", "ts", dayUs)
          .groupBy("evt_id")
          .agg(count(lit(1)).as("n_win"), sum("b_value").as("_sv"))
        purchases.join(agg, Seq("evt_id"), "left").select(
          col("evt_id"), col("user_id"), col("ts"),
          coalesce(col("n_win"), lit(0L)).as("n_win"),
          round(coalesce(col("_sv"), lit(0.0)), 6).as("sum_val"))
      },
      Some(s"""WITH e AS (SELECT user_id, ${Q.tsUs} AS ts, event_id,
                event_type, value FROM events),
              p AS (SELECT event_id AS evt_id, user_id, ts FROM e
                WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts, value FROM e
                WHERE event_type = 'click')
              SELECT p.evt_id, p.user_id, p.ts,
                count(c.value) AS n_win,
                round(CAST(coalesce(sum(c.value), 0) AS DOUBLE), 6) AS sum_val
              FROM p LEFT JOIN c
                ON p.user_id = c.user_id
                AND c.ts > p.ts - 86400000000 AND c.ts <= p.ts
              GROUP BY 1, 2, 3""")),

    // F6/F28: CDC delta application (deletes + upserts), then aggregate.
    Q("q_delta_apply",
      (s, dir) => {
        val orders = Q.t(s, dir, "orders")
        val dels = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("change", lit("-"))
        val ups = orders.filter(col("o_orderkey") % 10 === 1)
          .withColumn("o_totalprice", col("o_totalprice") * 1.1)
          .withColumn("change", lit("+"))
        Relational.applyDelta(orders, dels.unionByName(ups), Seq("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 4).as("total"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
              round(CAST(sum(price) AS DOUBLE), 4) AS total FROM (
                SELECT o_orderstatus, o_totalprice AS price FROM orders
                WHERE o_orderkey % 10 NOT IN (0, 1)
                UNION ALL
                SELECT o_orderstatus, o_totalprice * 1.1 AS price FROM orders
                WHERE o_orderkey % 10 = 1)
              GROUP BY 1"""))
  )
}
