package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pipeline, TimeJoins}

class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def noNestedLoop(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"theta join planned:\n$plan")
  }

  test("asofJoin picks the latest build row at-or-before each probe ts") {
    val probe = Seq((1L, 10L, "p10"), (1L, 25L, "p25"), (2L, 5L, "p5"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (3L, 1L, 999L)).toDF("k", "ts", "v")
    val out = TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    // equal ts is inclusive (p10 sees the ts=10 build row); p25 sees 20
    // not 30; key 2 has no build history at all -> nulls
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      Option(r.get(3)), Option(r.get(4)))).toSeq == Seq(
      (1L, 10L, "p10", Some(10L), Some(100L)),
      (1L, 25L, "p25", Some(20L), Some(200L)),
      (2L, 5L, "p5", None, None)))
  }

  test("asofJoin resolves duplicate build timestamps to the payload max") {
    val probe = Seq((1L, 50L)).toDF("k", "ts")
    val build = Seq((1L, 40L, 7L), (1L, 40L, 9L), (1L, 40L, 8L))
      .toDF("k", "ts", "v")
    val out = TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v")).collect()
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq((40L, 9L)))
  }

  test("asofJoin plans one exchange and no theta join") {
    // adaptive loader: survives the driver data's ts encoding changing
    // between nanos-as-long and native timestamp parquet
    val e = graft.queries.Q.eventsUs(spark, sf)
      .select($"user_id", $"ts", $"event_id")
    val out = TimeJoins.asofJoin(e, e, "user_id", "ts", Seq("event_id"))
    noNestedLoop(out)
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"want exactly 1 exchange, got $exchanges")
  }

  test("asofJoinBucketed equals the plain path on gaps, dup ts, and missing history") {
    // bucket width 7 (doesn't divide anything evenly); probe in a bucket
    // with no build rows (seed must carry across several empty buckets);
    // duplicate build ts with distinct payloads (tie-break must match);
    // key with no history at all (nulls)
    val probe = Seq((1L, 3L, "early"), (1L, 29L, "gap"), (1L, 40L, "dup"),
      (2L, 5L, "none")).toDF("k", "ts", "tag")
    val build = Seq((1L, 2L, 20L), (1L, 8L, 80L), (1L, 40L, 7L),
      (1L, 40L, 9L), (3L, 1L, 999L)).toDF("k", "ts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts").collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), Option(r.get(3)), Option(r.get(4)))).toSeq
    val plain = rows(TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v")))
    val bucketed = rows(TimeJoins.asofJoinBucketed(probe, build, "k", "ts",
      Seq("v"), bucketWidth = 7L))
    assert(bucketed == plain, s"bucketed=$bucketed plain=$plain")
    // sanity on content, not just agreement
    assert(plain == Seq(
      (1L, 3L, "early", Some(2L), Some(20L)),
      (1L, 29L, "gap", Some(8L), Some(80L)),
      (1L, 40L, "dup", Some(40L), Some(9L)),
      (2L, 5L, "none", None, None)))
  }

  test("asofJoinBucketed: single-key million-row history matches plain bit-for-bit") {
    // THE hot-key scenario the bucketed path exists for: one key whose
    // entire history would land in one task's window buffer on the
    // plain path. 10^6 build rows, 10^5 probes, duplicate timestamps
    // with distinct payloads sprinkled in (id*3 mod p wraps).
    val p = 999983L
    val build = spark.range(1000000).select(lit(1L).as("k"),
      (col("id") * 3L % p).as("ts"), (col("id") % 1000L).as("v"))
    val probe = spark.range(100000).select(lit(1L).as("k"),
      (col("id") * 17L % p).as("ts"))
    def sig(df: org.apache.spark.sql.DataFrame) = {
      val h = hash(struct(df.columns.map(col): _*))
      df.agg(count(lit(1)), sum(h.cast("long"))).collect()(0)
    }
    val plain = sig(TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v")))
    val bucketed = sig(TimeJoins.asofJoinBucketed(probe, build, "k", "ts",
      Seq("v"), bucketWidth = 4096L))
    assert(bucketed == plain, s"bucketed=$bucketed plain=$plain")
    assert(plain.getLong(0) == 100000L)
  }

  test("time operators accept native timestamp columns, matching integer-µs inputs") {
    import graft.operators.Relational
    def ntz(df: org.apache.spark.sql.DataFrame) = df.withColumn("ts",
      expr("timestampadd(MICROSECOND, ts, timestamp_ntz'1970-01-01 00:00:00')"))
    val probe = Seq((1L, 10L, "p10"), (1L, 25L, "p25"), (2L, 5L, "p5"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (3L, 1L, 999L)).toDF("k", "ts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().toSeq
    // the normalized output must EQUAL the integer-µs path bit-for-bit
    // (same columns, same long values) for all four entry points
    assert(rows(TimeJoins.asofJoin(ntz(probe), ntz(build), "k", "ts", Seq("v")))
      == rows(TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v"))))
    assert(rows(TimeJoins.asofJoinBucketed(ntz(probe), ntz(build), "k", "ts",
        Seq("v"), bucketWidth = 7L))
      == rows(TimeJoins.asofJoinBucketed(probe, build, "k", "ts", Seq("v"),
        bucketWidth = 7L)))
    assert(rows(TimeJoins.bandedRangePairs(ntz(probe), ntz(build), "k", "ts", 10L))
      == rows(TimeJoins.bandedRangePairs(probe, build, "k", "ts", 10L)))
    val ev = Seq((1L, 5L, 1L), (1L, 8L, 2L), (1L, 30L, 3L), (2L, 9L, 4L))
      .toDF("k", "ts", "id")
    assert(rows(Relational.sessionize(ntz(ev), "k", "ts", "id", gap = 10L))
      == rows(Relational.sessionize(ev, "k", "ts", "id", gap = 10L)))
    // mixed encodings also converge: timestamp probe against integer build
    assert(rows(TimeJoins.asofJoin(ntz(probe), build, "k", "ts", Seq("v")))
      == rows(TimeJoins.asofJoin(probe, build, "k", "ts", Seq("v"))))
  }

  test("asof validation: unorderable payload, reserved names, prefix collisions") {
    val probe = Seq((1L, 5L)).toDF("k", "ts")
    val mapBuild = Seq((1L, 3L, Map("a" -> 1))).toDF("k", "ts", "m")
    val e1 = intercept[IllegalArgumentException] {
      TimeJoins.asofJoin(probe, mapBuild, "k", "ts", Seq("m"))
    }
    assert(e1.getMessage.contains("unorderable"))
    val build = Seq((1L, 3L, 30L)).toDF("k", "ts", "v")
    val e2 = intercept[IllegalArgumentException] {
      TimeJoins.asofJoin(probe.withColumn("_tag", lit(1)), build,
        "k", "ts", Seq("v"))
    }
    assert(e2.getMessage.contains("reserved"))
    val e3 = intercept[IllegalArgumentException] {
      TimeJoins.asofJoin(probe.withColumn("asof_v", lit(1)), build,
        "k", "ts", Seq("v"))
    }
    assert(e3.getMessage.contains("collide"))
    val e4 = intercept[IllegalArgumentException] {
      TimeJoins.bandedRangePairs(probe.withColumn("_band", lit(1)), build,
        "k", "ts", 10L)
    }
    assert(e4.getMessage.contains("reserved"))
    val e5 = intercept[IllegalArgumentException] {
      TimeJoins.bandedRangePairs(probe.withColumn("b_ts", lit(1L)), build,
        "k", "ts", 10L)
    }
    assert(e5.getMessage.contains("collide"))
  }

  test("bandedRangePairs returns each in-window pair exactly once") {
    val w = 10L
    val probe = Seq((1L, 20L, "a"), (1L, 21L, "b"), (2L, 15L, "c"))
      .toDF("k", "ts", "p")
    val build = Seq(
      (1L, 10L), // == 20-w: EXCLUDED for a (half-open), out of range for b
      (1L, 11L), // in for a (band below a's); == 21-w: excluded for b
      (1L, 20L), // == a.ts: included; in for b
      (1L, 21L), // == b.ts: included; after a
      (1L, 22L), // after both
      (2L, 5L),  // == 15-w: excluded
      (3L, 20L)  // wrong key
    ).toDF("k", "ts")
    val got = TimeJoins.bandedRangePairs(probe, build, "k", "ts", w)
      .select($"p", $"b_ts").as[(String, Long)].collect().sorted.toSeq
    assert(got == Seq(("a", 11L), ("a", 20L), ("b", 20L), ("b", 21L)))
    noNestedLoop(TimeJoins.bandedRangePairs(probe, build, "k", "ts", w))
  }

  test("bandedRangePairs matches a brute-force theta join on real data") {
    val e = graft.queries.Q.eventsUs(spark, sf)
      .select($"user_id".as("k"), $"ts", $"event_id".as("id"))
    val probe = e.filter($"id" % 5 === 0)
    val w = 3600L * 1000000L
    val banded = TimeJoins.bandedRangePairs(probe, e, "k", "ts", w)
      .select($"id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = probe.as("p").join(e.as("b"),
        $"p.k" === $"b.k" && $"b.ts" > $"p.ts" - w && $"b.ts" <= $"p.ts")
      .select($"p.id", $"b.id").as[(Long, Long)].collect().sorted.toSeq
    assert(banded == brute && banded.nonEmpty)
  }

  test("packSequences: boundary-crossing rule, shard isolation, oversized doc") {
    val docs = Seq(
      (0L, "t t t", "en"),   // shard 0: 3 tok, cum 3  -> pack 0
      (4L, "t t t t", "en"), // shard 0: 4 tok, cum 7  -> pack 0 (prev 3 < 10)
      (8L, "t t t t t", "en"), // shard 0: cum 12 -> pack 0 (prev 7 < 10)
      (12L, "t t", "en"),    // shard 0: prev 12 >= 10 -> pack 1
      (1L, String.valueOf("t " * 25).trim, "en"), // shard 1: 25 tok > budget
      (5L, "t", "en"),       // shard 1: prev 25 -> pack 2
      (2L, "t t t", "de")    // different stratum: its own counter
    ).toDF("doc_id", "text", "lang")
    val out = Pipeline.packSequences(docs, "doc_id", "text", "lang",
        budget = 10L, shards = 4)
      .select($"doc_id", $"shard", $"pack").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 2L, 0L),
      (4L, 0L, 0L), (5L, 1L, 2L), (8L, 0L, 0L), (12L, 0L, 1L)))
  }

  test("scrubPii replaces in order and counts each class") {
    val df = Seq(
      (1L, "mail a.b+c@ex-1.org then +1-555-1234 and 98765 end"),
      (2L, "digits 123 stay short but 123456 is a run"),
      (3L, "clean text only")).toDF("id", "text")
    val out = Pipeline.scrubPii(df, "text")
      .select($"id", $"scrubbed", $"n_email", $"n_phone", $"n_num")
      .collect().sortBy(_.getLong(0)).toSeq
    assert(out(0).getString(1) == "mail <EMAIL> then <PHONE> and <NUM> end")
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) == (1, 1, 1))
    // the email's digits are consumed by <EMAIL>, not double-counted;
    // short digit runs survive
    assert(out(1).getString(1) == "digits 123 stay short but <NUM> is a run")
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getInt(4)) == (0, 0, 1))
    assert(out(2).getString(1) == "clean text only")
  }

  test("scrubPii phone classes: dashed/dotted/spaced 10-digit, parens, +CC forms") {
    val cases = Seq(
      // (id, text, expected scrubbed, expected n_phone)
      (1L, "call 555-123-4567 now", "call <PHONE> now", 1),
      (2L, "call 555.123.4567 now", "call <PHONE> now", 1),
      (3L, "call 555 123 4567 now", "call <PHONE> now", 1),
      (4L, "call (555) 123-4567 now", "call <PHONE> now", 1),
      (5L, "call (555)123-4567 now", "call <PHONE> now", 1),
      (6L, "call +1 555 123 4567 now", "call <PHONE> now", 1),
      (7L, "call +44-555-123-4567 now", "call <PHONE> now", 1),
      (8L, "call +1-555-1234 now", "call <PHONE> now", 1),
      // NOT phones: 7-digit local (no area), year ranges, bare runs —
      // these stay in the <NUM> class so audits don't overcount
      (9L, "call 123-4567 now", "call 123-<NUM> now", 0),
      (10L, "range 100-2000 here", "range 100-<NUM> here", 0),
      (11L, "date 2023-12-31 here", "date <NUM>-12-31 here", 0)
    ).toDF("id", "text", "want", "wantPhones")
    val got = Pipeline.scrubPii(cases, "text")
      .select($"id", $"scrubbed", $"want", $"n_phone", $"wantPhones")
      .collect().sortBy(_.getLong(0))
    for (r <- got) {
      assert(r.getString(1) == r.getString(2),
        s"id ${r.getLong(0)}: got '${r.getString(1)}' want '${r.getString(2)}'")
      assert(r.getInt(3) == r.getInt(4),
        s"id ${r.getLong(0)}: n_phone ${r.getInt(3)} want ${r.getInt(4)}")
    }
  }
}
