package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Sources
import graft.streaming.EventStreams

/** Gate entries for the source/streaming surfaces that were previously
  * spec-only (VERDICT r5 "What's missing" #2): the driver's oracle runs
  * DuckDB over the fixed parquet tables, so each query ROUND-TRIPS data
  * derived from a parquet table through the source under test (text KV
  * files, Last.fm triples, the streaming sessionizer in batch
  * execution) and aggregates back to something the oracle computes from
  * the parquet directly — a broken reader/parser would corrupt keys,
  * drop rows or shift sessions and hash-mismatch.
  */
object SourceQueries {

  val all: Seq[Q] = Seq(

    // F2/F3 typed-KV text ingest (the reference's
    // KeyValueTextInputFormat + Int/Long typed siblings): documents
    // (doc_id, source) serialized as key<TAB>value lines, read back via
    // the typed KV reader, aggregated per source. Key parsing feeds
    // sum_id, value parsing feeds the grouping — either breaking
    // hash-mismatches.
    Q("q_kv_ingest",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_kv_gate").toString + "/lines"
        Q.t(s, dir, "documents")
          .select(concat_ws("\t", col("doc_id"), col("source")).as("value"))
          .write.mode("overwrite").text(tmp)
        Sources.typedKvText(s, tmp, keyType = "long", valueType = "string")
          .groupBy(col("value").as("source"))
          .agg(count(lit(1)).as("n_docs"), sum("key").as("sum_id"))
          .select(col("source"), col("n_docs"), col("sum_id"))
      },
      Some("""SELECT source, count(*) AS n_docs,
              CAST(sum(doc_id) AS BIGINT) AS sum_id
              FROM documents GROUP BY 1""")),

    // A3 Last.fm play-count triples (IterKmeans_Lastfm.java:182-201):
    // events serialized as user<TAB>artist<TAB>name<TAB>plays lines plus
    // two malformed lines (short line, unparsable number) that the
    // parse-and-skip loop must drop, read back via lastfmPlays,
    // aggregated per artist. Plays survive the double→text→double round
    // trip exactly (shortest-repr formatting), so sums match to the
    // rounded digit.
    Q("q_lastfm_ingest",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_lastfm_gate").toString + "/lines"
        Q.events(s, dir)
          .select(concat_ws("\t", col("user_id"), col("event_id") % 50,
            lit("artist-name"), col("value")).as("value"))
          .unionByName(s.createDataFrame(Seq(
            Tuple1("malformed line without fields"),
            Tuple1("7\t8\tname\tnot-a-number"))).toDF("value"))
          .write.mode("overwrite").text(tmp)
        Sources.lastfmPlays(s, tmp)
          .groupBy("artist")
          .agg(count(lit(1)).as("n_plays_rows"),
            round(sum("plays"), 6).as("total_plays"))
      },
      Some("""SELECT event_id % 50 AS artist, count(*) AS n_plays_rows,
              round(sum(value), 6) AS total_plays
              FROM events GROUP BY 1""")),

    // F7 JDBC ingest (DBInputFormat; reference example
    // DBCountPageView.java): supplier round-trips through an embedded
    // in-memory Derby database — written with Spark's JDBC sink, read
    // back through Sources.jdbc as a RANGED PARALLEL scan
    // (partitionColumn on the key, 4 range partitions — the shape a
    // 100 TB extract uses against a sharded RDBMS), then aggregated per
    // nation. Derby uppercases identifiers, so the readback re-aliases;
    // a reader that dropped rows, mangled types, or double-read a range
    // boundary hash-mismatches against the parquet oracle.
    Q("q_jdbc_ingest",
      (s, dir) => {
        val url = "jdbc:derby:memory:graft_jdbc_gate;create=true"
        val driver = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        val jprops = new java.util.Properties()
        driver.foreach { case (k, v) => jprops.setProperty(k, v) }
        val supp = Q.t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        supp.write.mode("overwrite").jdbc(url, "graft_supplier", jprops)
        val hi = supp.agg(max("s_suppkey")).collect()(0).getLong(0) // O(1)
        Sources.jdbc(s, url, "graft_supplier", driver ++ Map(
            "partitionColumn" -> "S_SUPPKEY", "lowerBound" -> "1",
            "upperBound" -> hi.toString, "numPartitions" -> "4"))
          .groupBy(col("s_nationkey").cast("int").as("nation"))
          .agg(count(lit(1)).as("n_supp"),
            round(sum("s_acctbal"), 4).as("total_bal"))
      },
      Some("""SELECT CAST(s_nationkey AS INT) AS nation,
              count(*) AS n_supp, round(sum(s_acctbal), 4) AS total_bal
              FROM supplier GROUP BY 1""")),

    // Streaming gap sessionization through a REAL StreamingQuery (the
    // q_dedup_stream two-micro-batch pattern): the events table is
    // time-split at its ts midpoint into two parquet files whose
    // mtimes force the file source to deliver the EARLY half in
    // micro-batch 1 and the late half in micro-batch 2
    // (maxFilesPerTrigger=1) — so every session straddling the split
    // must be carried across the batch boundary in keyed state, and a
    // sessionizer that dropped or re-opened state would split or merge
    // sessions and hash-mismatch. flatMapGroupsWithState emits every
    // CLOSED session (each user's final session stays open pending
    // more data, exactly as a production stream holds it), so the
    // oracle is the window-function session computation MINUS each
    // user's last session. Same 30-min gap and epoch-µs arithmetic as
    // q_sessionize; all-integer, exact, split-point-independent.
    Q("q_sessionize_stream",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}
        val events = Q.eventsUs(s, dir).select(col("user_id"), col("ts"))
        val mm = events.agg(min("ts"), max("ts")).collect()(0)
        val mid = mm.getLong(0) / 2 + mm.getLong(1) / 2
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_sessionize_stream_gate").toString
        def parts(): Set[java.nio.file.Path] = {
          val st = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
            .filter(_.toString.endsWith(".parquet")).toSet
          finally st.close()
        }
        events.filter(col("ts") <= mid).coalesce(1)
          .write.mode("append").parquet(tmp)
        val early = parts()
        events.filter(col("ts") > mid).coalesce(1)
          .write.mode("append").parquet(tmp)
        val late = parts() -- early
        // deterministic micro-batch order: the file source admits files
        // by mtime, so pin early ≺ late explicitly rather than trusting
        // write-time ms resolution
        val t0 = System.currentTimeMillis()
        early.foreach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 - 120000)))
        late.foreach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0)))
        val stream = s.readStream
          .schema(events.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp)
          .as[EventStreams.SessionEvent]
        val sink = s"sessionize_stream_out_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        val q = EventStreams.sessionizeStream(stream,
            gapNanos = 1800000000L, GroupStateTimeout.NoTimeout())
          .toDF()
          .writeStream.outputMode("append")
          .format("memory").queryName(sink)
          .trigger(Trigger.AvailableNow())
          .start()
        if (!q.awaitTermination(180000)) {
          q.stop()
          sys.error("q_sessionize_stream: stream did not finish in 180 s")
        }
        val out = s.table(sink)
          .select("user_id", "session_start", "session_end", "n_events")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        s.catalog.dropTempView(sink)
        out
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, ${Q.tsUs} AS tns FROM events),
            g AS (SELECT user_id, event_id, tns,
              CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id)
                IS NULL OR tns - lag(tns) OVER (PARTITION BY user_id
                  ORDER BY tns, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s
              FROM e),
            s AS (SELECT user_id, tns,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                ROWS UNBOUNDED PRECEDING) AS sid FROM g),
            agg AS (SELECT user_id, sid, min(tns) AS session_start,
              max(tns) AS session_end, count(*) AS n_events
              FROM s GROUP BY 1, 2),
            last AS (SELECT user_id, max(sid) AS sid FROM agg GROUP BY 1)
            SELECT a.user_id, a.session_start, a.session_end, a.n_events
            FROM agg a LEFT JOIN last l
              ON a.user_id = l.user_id AND a.sid = l.sid
            WHERE l.user_id IS NULL""")),

    // Watermarked streaming dedup through a REAL StreamingQuery (not
    // batch-executed): the documents table is written twice as two
    // parquet files, maxFilesPerTrigger=1 forces the copies into
    // separate micro-batches, and dropDuplicatesWithinWatermark must
    // carry its key state across the batch boundary to drop the second
    // arrival of every row — at-least-once ingestion in, exactly-once
    // out. Both copies are bit-identical (same doc_id/text/ts), so
    // whichever arrival survives, the output SET equals the documents
    // table itself — a deterministic oracle with no dependence on file
    // ordering. Without cross-batch state the count would be 2x.
    Q("q_dedup_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Q.t(s, dir, "documents").select(col("doc_id"), col("text"))
        // ONE constant event time for every row: the watermark after
        // batch 1 is t − 30 min < t, so no key's state can expire
        // before batch 2 at ANY corpus size (id-proportional spacing
        // would outrun the horizon past ~1.8M ids)
        val withTs = docs.withColumn("ts", lit(1700000000L * 1000000000L))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_dedup_stream_gate").toString
        withTs.coalesce(1).write.mode("append").parquet(tmp)
        withTs.coalesce(1).write.mode("append").parquet(tmp)
        val stream = s.readStream.schema(withTs.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp)
        // unique sink name: the gate runs repeatedly in one session
        // (bench reps); results never depend on it
        val sink = s"dedup_stream_out_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        val q = EventStreams.dedupStream(stream, Seq("doc_id"))
          .writeStream.outputMode("append")
          .format("memory").queryName(sink)
          .trigger(Trigger.AvailableNow())
          .start()
        // a timed-out stream means PARTIAL output — fail loudly rather
        // than hand the oracle a mid-stream snapshot
        if (!q.awaitTermination(180000)) {
          q.stop()
          sys.error("q_dedup_stream: stream did not finish in 180 s")
        }
        // copy out of the memory sink and drop its temp view so
        // repeated in-session runs don't accumulate corpus copies in
        // the driver
        val out = s.table(sink).select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        s.catalog.dropTempView(sink)
        out
      },
      Some("SELECT doc_id, text FROM documents"))
  )
}
