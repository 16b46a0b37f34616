package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.algorithms.{KMeans, MatrixVector, PageRank}

/** Second-wave coverage: the reference's remaining algorithm variants
  * (naive baselines A10-A11, KMeans with its actual cosine metric A2,
  * blocked GIM-V A4) plus Catalyst-free extras the Spark build gets for
  * free (rollup, except/intersect, deterministic sampling, regex
  * tokenization).
  */
object ExtraQueries {

  /** Element-wise cosine-distance SQL between two vector expressions —
    * three independent index-order left-folds, matching the Scala loop
    * in KMeans.cosDist exactly. */
  private def cosDistSql(a: String, b: String): String =
    s"""(1.0 - list_reduce([$a[i] * $b[i] for i in generate_series(1, len($a))],
          (x, y) -> x + y)
        / (sqrt(list_reduce([$a[i] * $a[i] for i in generate_series(1, len($a))],
            (x, y) -> x + y))
         * sqrt(list_reduce([$b[i] * $b[i] for i in generate_series(1, len($b))],
            (x, y) -> x + y))))"""

  /** Halton radical inverse of `i` in `base` over `k` digit positions:
    * Σ_j ((i ÷ baseʲ) mod base) · base^-(j+1), ascending j — the same
    * term order as the Spark fold, so the double sums are
    * bit-identical. */
  private def radInvSql(base: Int, k: Int): String =
    (0 until k).map { j =>
      val p = BigInt(base).pow(j)
      val q = BigInt(base).pow(j + 1)
      s"CAST((i // $p) % $base AS DOUBLE) * (1.0 / $q.0)"
    }.mkString(" + ")

  private def kmeansCosineSql(iters: Int, k: Int): String = {
    val assign = (i: Int) =>
      s"""a$i AS (SELECT id, vec, cid FROM (
         SELECT v.id, v.vec, c.cid,
           row_number() OVER (PARTITION BY v.id ORDER BY
             ${cosDistSql("v.vec", "c.vec")}, c.cid) AS rn
         FROM v CROSS JOIN c${i - 1} c) WHERE rn = 1)"""
    val recenter = (i: Int) =>
      s"""c$i AS (SELECT p.cid, coalesce(m.vec, p.vec) AS vec
         FROM c${i - 1} p LEFT JOIN (
           SELECT cid, list(m ORDER BY d) AS vec FROM (
             SELECT cid, d, avg(x) AS m FROM (
               SELECT cid, unnest(vec) AS x, generate_subscripts(vec, 1) AS d
               FROM a$i) GROUP BY 1, 2) GROUP BY 1) m
         ON p.cid = m.cid)"""
    s"""WITH v AS (SELECT vec_id AS id,
         [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS INT) - 1 AS cid, vec
         FROM (SELECT id, vec FROM v ORDER BY id LIMIT $k)),
       ${(1 to iters).map(i => assign(i) + ",\n" + recenter(i)).mkString(",\n")}
       SELECT c.cid, coalesce(s.n, 0) AS n,
         round(c.vec[1], 6) AS c0, round(c.vec[2], 6) AS c1,
         round(sqrt(list_reduce([y * y for y in c.vec], (a, b) -> a + b)), 6) AS cnorm
       FROM c$iters c LEFT JOIN (
         SELECT cid, count(*) AS n FROM a$iters GROUP BY 1) s ON c.cid = s.cid"""
  }

  val all: Seq[Q] = Seq(

    // A2 with the reference's actual metric: cosine KMeans over the real
    // 64-dim embeddings (ONE2ALL global center state, F25).
    Q("q_kmeans_cosine",
      (s, dir) => {
        val pts = Q.t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
        val model = KMeans.run(pts, k = 8, metric = "cosine", maxIterations = 2)
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rows = model.centers.map { case (cid, v) =>
          var ss = 0.0; var i = 0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          Row(cid, model.sizes.getOrElse(cid, 0L), r6(v(0)), r6(v(1)), r6(math.sqrt(ss)))
        }
        s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq),
          StructType(Seq(StructField("cid", IntegerType), StructField("n", LongType),
            StructField("c0", DoubleType), StructField("c1", DoubleType),
            StructField("cnorm", DoubleType))))
      },
      Some(kmeansCosineSql(2, 8))),

    // A10: naive loop-of-jobs PageRank — same semantics, no cached
    // co-partitioned static side; the SQL oracle is identical to
    // q_pagerank's (they MUST agree — that is the baseline's point).
    Q("q_naive_pagerank",
      (s, dir) => {
        val ncust = Q.t(s, dir, "customer").count()
        val edges = Q.t(s, dir, "orders")
          .select(col("o_custkey").as("src"),
            (lit(1L) + (col("o_custkey") * 7 + col("o_orderkey") * 3) % lit(ncust)).as("dst"))
          .distinct()
        PageRank.runNaive(edges, 0.8, iterations = 5)
          .select(col("node"), round(col("rank"), 6).as("rank"))
      },
      Some(s"""WITH edges AS (SELECT DISTINCT o_custkey AS src,
              1 + (o_custkey * 7 + o_orderkey * 3) % (SELECT count(*) FROM customer) AS dst
              FROM orders),
            deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
            nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
            r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
            ${(1 to 5).map { i =>
              s"""r$i AS (SELECT n.node, (1.0 - 0.8) + coalesce(c.s, 0.0) AS rank
               FROM nodes n LEFT JOIN (
                 SELECT e.dst AS node, sum(r.rank / d.d * 0.8) AS s
                 FROM edges e JOIN r${i - 1} r ON e.src = r.node
                 JOIN deg d ON e.src = d.src GROUP BY 1) c ON n.node = c.node)"""
            }.mkString(",\n")}
            SELECT node, round(rank, 6) AS rank FROM r5""")),

    // A4 blocked variant: tile-packed matrix-vector product (one step).
    Q("q_matvec_blocked",
      (s, dir) => {
        val m = Q.events(s, dir)
          .groupBy((col("event_id") % 40).as("i"), (col("user_id") % 40).as("j"))
          .agg(max("value").as("v"))
        val x0 = m.select(col("j")).distinct().withColumn("x", lit(1.0))
        MatrixVector.multiplyBlocked(m, x0, b = 8)
          .select(col("j"), round(col("x"), 6).as("x"))
      },
      Some("""WITH m AS (SELECT event_id % 40 AS i, user_id % 40 AS j, max(value) AS v
              FROM events GROUP BY 1, 2),
            x0 AS (SELECT DISTINCT j, CAST(1.0 AS DOUBLE) AS x FROM m)
            SELECT m.i AS j, round(sum(m.v * x.x), 6) AS x
            FROM m JOIN x0 x ON m.j = x.j GROUP BY m.i""")),

    // A14 TeraSort: total-order sort on the text key, one-pass validate
    // + order-sensitive checksum (reference TeraSort.java +
    // TeraValidate.java). The checksum is a polynomial fold over
    // char-level codes in GLOBAL sorted order, so it proves the range
    // partitioner + sort produced exactly the oracle's ORDER BY order —
    // only O(partitions) summaries ever reach the driver.
    Q("q_terasort",
      (s, dir) => {
        import s.implicits._
        val docs = Q.t(s, dir, "documents")
        val keyed = docs.select(col("text"),
          element_at(graft.functions.GraftFunctions.token_codes(array(col("text"))), 1)
            .as("code"))
        val sorted = graft.operators.Relational.totalOrderSort(keyed, "text")
        val (ok, n, chk) = graft.operators.Relational.teraSummary(sorted, "text", "code")
        Seq((ok, n, chk)).toDF("validated", "n_rows", "checksum")
      },
      Some("""WITH c AS (SELECT text,
                CASE WHEN length(text) = 0 THEN 0::BIGINT
                  ELSE list_reduce([ord(ch)::BIGINT for ch in string_split(text, '')],
                    (a, b) -> (a * 31 + b) % 1000000007) END AS code
                FROM documents)
              SELECT true AS validated, count(*) AS n_rows,
                CAST(list_reduce(list(code ORDER BY text),
                  (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS checksum
              FROM c""")),

    // Rollup (free from Catalyst; reference has no grouping sets at all).
    Q("q_rollup",
      (s, dir) => Q.t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(l_linestatus, 'ALL') AS ls,
              CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS cnt
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Cube + grouping sets (also free from Catalyst): all four
    // aggregation levels of (status, priority) in one pass.
    Q("q_cube",
      (s, dir) => Q.t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 4).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("cnt"), col("total")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
              coalesce(o_orderpriority, 'ALL') AS prio,
              count(*) AS cnt, round(sum(o_totalprice), 4) AS total
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // PiEstimator (stock example, `examples/PiEstimator.java`): Monte
    // Carlo quarter-circle counting over the DETERMINISTIC Halton
    // sequence (bases 2 and 3, like the reference's HaltonSequence) —
    // radical inverses are integer digit folds summed in identical
    // term order on both engines, so the estimate matches exactly.
    // n = |lineitem| keeps the workload sf-scaled.
    Q("q_pi",
      (s, dir) => {
        val n = Q.t(s, dir, "lineitem").count()
        def radInv(base: Int, k: Int) = (0 until k).map { j =>
          val p = BigInt(base).pow(j)
          val q = BigInt(base).pow(j + 1).toDouble
          (expr(s"id div $p") % base).cast("double") * (lit(1.0) / lit(q))
        }.reduce(_ + _)
        s.range(n)
          .select(radInv(2, 24).as("x"), radInv(3, 16).as("y"))
          .agg(count(lit(1)).as("n"),
            sum(when((col("x") - 0.5) * (col("x") - 0.5)
              + (col("y") - 0.5) * (col("y") - 0.5) <= 0.25, 1L)
              .otherwise(0L)).as("inside"))
          .select(col("n"), col("inside"),
            round(lit(4.0) * col("inside") / col("n"), 6).as("pi_est"))
      },
      Some(s"""WITH idx AS (SELECT row_number() OVER () - 1 AS i FROM lineitem),
              pts AS (SELECT ${radInvSql(2, 24)} AS x,
                ${radInvSql(3, 16)} AS y FROM idx),
              agg AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN (x - 0.5) * (x - 0.5)
                  + (y - 0.5) * (y - 0.5) <= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
                  AS inside FROM pts)
              SELECT n, inside, round(4.0 * inside / n, 6) AS pi_est
              FROM agg""")),

    // Pivot: one row per priority, one count column per order status
    // (fixed value list keeps the schema static and the oracle exact).
    Q("q_pivot",
      (s, dir) => Q.t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt")),
      Some("""SELECT o_orderpriority,
              count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
              count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
              count(*) FILTER (o_orderstatus = 'P') AS p_cnt
              FROM orders GROUP BY 1""")),

    // Set ops: except / intersect.
    Q("q_except",
      (s, dir) => Q.t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(Q.t(s, dir, "orders").select(col("o_custkey").as("custkey"))),
      Some("""SELECT c_custkey AS custkey FROM customer
              EXCEPT SELECT o_custkey AS custkey FROM orders""")),

    Q("q_intersect",
      (s, dir) => Q.t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))
        .intersect(Q.t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))),
      Some("""SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
              INTERSECT SELECT CAST(c_nationkey AS INT) AS nk FROM customer""")),

    // Deterministic hash-based Bernoulli sampling (reproducible across
    // engines, unlike RNG-based TABLESAMPLE). Bucket computed mod 1000
    // from the start — (key%1000)·761 mod 1000 ≡ (key·2654435761)%1000
    // for non-negative keys without the 64-bit overflow the full-width
    // multiply hits at key ≥ ~3.47e9 (same fix as
    // Pipeline.sampleByStrata).
    Q("q_hash_sample",
      (s, dir) => Q.t(s, dir, "orders")
        .filter(pmod(pmod(col("o_orderkey"), lit(1000L)) * lit(761L),
          lit(1000L)) < 100)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 4).as("total")),
      Some("""SELECT o_orderstatus, count(*) AS cnt,
              round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS total
              FROM orders WHERE ((o_orderkey % 1000) * 761 % 1000 + 1000) % 1000 < 100
              GROUP BY 1""")),

    // Gap-based sessionization over the event stream (30-min gap);
    // per-session stats — all integer-ns arithmetic, exact oracle.
    Q("q_sessionize",
      (s, dir) => graft.operators.Relational.sessionize(
        Q.eventsUs(s, dir), "user_id", "ts", "event_id", gap = 1800000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("start_us"),
          (max("ts") - min("ts")).as("dur_us")),
      Some(s"""WITH e AS (SELECT user_id, event_id, ${Q.tsUs} AS tns FROM events),
            g AS (SELECT user_id, event_id, tns,
              CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id)
                IS NULL OR tns - lag(tns) OVER (PARTITION BY user_id
                  ORDER BY tns, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s
              FROM e),
            s AS (SELECT user_id, tns,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              count(*) AS n_events, min(tns) AS start_us,
              max(tns) - min(tns) AS dur_us
            FROM s GROUP BY 1, 2""")),

    // BPE-ish regex tokenization (letters runs / digit runs / single
    // non-space symbols) — the second tokenizer the pipeline needs.
    Q("q_bpe_tokens",
      (s, dir) => Q.t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_bpe")),
      Some("""SELECT doc_id,
              len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe
              FROM documents"""))
  )
}
