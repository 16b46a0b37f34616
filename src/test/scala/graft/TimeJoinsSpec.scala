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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id", ($"ts" / 1000).cast("long").as("ts"), $"event_id")
    val out = TimeJoins.asofJoin(e, e, "user_id", "ts", Seq("event_id"))
    noNestedLoop(out)
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"want exactly 1 exchange, got $exchanges")
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id".as("k"), ($"ts" / 1000).cast("long").as("ts"),
        $"event_id".as("id"))
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
}
