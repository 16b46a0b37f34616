package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the training-data/event side of the engine
  * needs but Spark has no native physical operator for: the as-of join
  * (latest build row at-or-before each probe timestamp) and the banded
  * range join (build rows inside a bounded time window of each probe).
  *
  * Both are expressed so Catalyst never plans the quadratic
  * theta-join a naive `a.join(b, a("ts") >= b("ts"))` would produce
  * (BroadcastNestedLoopJoin — a scan of the build side per probe row):
  * the as-of join is a union + running-window merge (one shuffle of
  * each side on the key, one sequential pass per key), and the range
  * join buckets time into `window`-sized bands so the candidate space
  * is an EQUI-join on (key, band) with a residual filter — the classic
  * bucketed-interval-join rewrite.
  */
object TimeJoins {

  /** As-of join: for every probe row, attach the build row with the
    * largest `tsCol` ≤ the probe's `tsCol` within the same `keyCol`
    * group (NULLs when no build row precedes the probe). The payload
    * columns arrive prefixed with `prefix`, alongside `prefix+tsCol`.
    * `tsCol` may be integer time (caller's unit) or a native
    * TIMESTAMP/TIMESTAMP_NTZ column — timestamp inputs are normalized
    * to epoch-µs BIGINT in the output (true of every operator here).
    *
    * Plan shape: tag both sides, union, one running
    * `last(payload, ignoreNulls)` window per key ordered by
    * (ts, side-tag, payload) — a single hash-partition shuffle on the
    * key and a streaming running-frame scan per partition; no
    * inequality join, no per-probe re-scan of the build side. At equal
    * timestamps the build row sorts BEFORE the probe (tag 0 < 1), so
    * "at-or-before" is inclusive; duplicate build (key, ts) pairs
    * resolve deterministically to the payload-struct maximum. NOTE:
    * the payload struct is the window order's final tie-breaker, so
    * which duplicate wins depends on the ORDER `payloadCols` is listed
    * in (struct comparison is field-by-field, left to right) — and
    * every payload column must therefore be of an orderable type
    * (validated up front; a map-typed payload is rejected instead of
    * failing analysis mid-plan). Input frames must not already use the
    * `_k/_t/_tag/_p/_row/_bkt` working names (validated too).
    *
    * 100 TB posture: cost is one exchange of |probe|+|build| rows on
    * the key plus a per-key linear merge — the same asymptotics as a
    * sort-merge join. A single key's history must fit one task's
    * window buffer (spilled by `WindowExec` when large); for a hotter
    * key than that, [[asofJoinBucketed]] bounds the buffer by a coarse
    * time bucket instead of the whole history.
    */
  def asofJoin(probe0: DataFrame, build0: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val (probe, build) = acceptTs(probe0, build0, tsCol)
    validateAsof(probe, build, tsCol, payloadCols, prefix)
    val payload = struct((tsCol +: payloadCols).map(c => build(c).as(c)): _*)
    val bTagged = build.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(0).as("_tag"), payload.as("_p"))
    val pPayloadType = bTagged.schema("_p").dataType
    val probeCols = probe.columns.toSeq
    val pTagged = probe.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(1).as("_tag"), lit(null).cast(pPayloadType).as("_p"),
      struct(probeCols.map(col): _*).as("_row"))
    val unioned = bTagged.withColumn("_row",
        lit(null).cast(pTagged.schema("_row").dataType))
      .unionByName(pTagged)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = unioned
      .withColumn("_asof", last("_p", ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val outCols = probeCols.map(c => col(s"_row.$c").as(c)) ++
      (tsCol +: payloadCols).map(c => col(s"_asof.$c").as(s"$prefix$c"))
    merged.select(outCols: _*)
  }

  /** Timestamp-native entry: a TIMESTAMP/TIMESTAMP_NTZ `tsCol` on
    * either side is normalized to epoch-µs BIGINT (both inputs AND the
    * operator's output/interval unit become µs); integer time columns
    * pass through in the caller's unit. Users of timestamp-typed
    * tables call the operators directly — no pre-cast ceremony. */
  private def acceptTs(probe: DataFrame, build: DataFrame,
      tsCol: String): (DataFrame, DataFrame) =
    (graft.functions.TimeEncodings.acceptTimestamp(probe, tsCol),
      graft.functions.TimeEncodings.acceptTimestamp(build, tsCol))

  private val AsofReserved = Seq("_k", "_t", "_tag", "_p", "_row", "_bkt")

  /** Fail-fast input validation shared by both as-of paths: reserved
    * working names, orderable payload types (the payload struct is a
    * window sort key — a map-typed payload would fail analysis deep in
    * the plan), and output-prefix collisions with probe columns. */
  private def validateAsof(probe: DataFrame, build: DataFrame,
      tsCol: String, payloadCols: Seq[String], prefix: String): Unit = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val collide =
      (probe.columns ++ build.columns).filter(AsofReserved.contains).distinct
    require(collide.isEmpty, "asofJoin: input uses reserved working " +
      s"column name(s) ${collide.mkString(", ")} — rename before joining")
    val unorderable = (tsCol +: payloadCols).filterNot(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(build.schema(c).dataType))
    require(unorderable.isEmpty, "asofJoin: payload column(s) " +
      s"${unorderable.mkString(", ")} have unorderable types (the payload " +
      "struct is the merge window's deterministic tie-breaker)")
    val dups = (tsCol +: payloadCols).map(prefix + _)
      .filter(probe.columns.contains)
    require(dups.isEmpty, "asofJoin: output column name(s) " +
      s"${dups.mkString(", ")} collide with probe columns — use another prefix")
  }

  /** [[asofJoin]] for HOT keys: same results contract, bit-for-bit,
    * but the merge window is partitioned by (key, coarse time bucket)
    * instead of key alone, so one task's window buffer holds at most a
    * bucket's rows — a single key with more history than a task buffer
    * (the one documented caveat of the plain path) stops being a
    * straggler/spill hazard. The price is one extra bucket-granular
    * window pass (rows = distinct (key, bucket) pairs, ~|build|/width)
    * computing each bucket's SEED: the closing build row of the latest
    * earlier non-empty bucket, unioned into the bucket's merge so
    * probes that precede every in-bucket build row still see their
    * predecessor. Seed selection uses the same (ts, payload) maximum
    * as the merge order, so duplicate-(key, ts) resolution is
    * IDENTICAL to the plain path (spec-pinned on a single-key
    * million-row history).
    *
    * Pick `bucketWidth` so a key's densest bucket fits a task buffer
    * (e.g. an hour/day of a symbol's ticks); at 100 TB the bucket also
    * spreads one key's merge across `history/width` tasks instead of
    * one.
    */
  def asofJoinBucketed(probe0: DataFrame, build0: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], bucketWidth: Long,
      prefix: String = "asof_"): DataFrame = {
    // timestamp-typed inputs normalize to epoch-µs, so bucketWidth is µs
    val (probe, build) = acceptTs(probe0, build0, tsCol)
    validateAsof(probe, build, tsCol, payloadCols, prefix)
    require(bucketWidth > 0, "bucketWidth must be positive")
    val payload = struct((tsCol +: payloadCols).map(c => build(c).as(c)): _*)
    val bTagged = withBand(build.select(col(keyCol).as("_k"),
      col(tsCol).as("_t"), lit(0).as("_tag"), payload.as("_p")),
      "_t", bucketWidth, "_bkt")
    val pPayloadType = bTagged.schema("_p").dataType
    val probeCols = probe.columns.toSeq
    val pTagged = withBand(probe.select(col(keyCol).as("_k"),
      col(tsCol).as("_t"), lit(1).as("_tag"),
      lit(null).cast(pPayloadType).as("_p"),
      struct(probeCols.map(col): _*).as("_row")), "_t", bucketWidth, "_bkt")

    // Each (key, bucket)'s closing build row: the lexicographic
    // (ts, payload) maximum — exactly the row the plain path's running
    // window would carry out of the bucket.
    val closings = bTagged.groupBy("_k", "_bkt")
      .agg(max(struct(col("_t"), col("_p"))).as("_close"))
    val probeBuckets = pTagged.select("_k", "_bkt").distinct()
    // Seed of probe bucket b = last closing among build buckets < b.
    // Markers (tag 0) sort before the same bucket's closing (tag 1), so
    // the running frame at a marker holds earlier buckets' closings only.
    // This window is bucket-granular: ~|history|/bucketWidth rows per
    // key, not |history|.
    val sw = Window.partitionBy("_sk").orderBy(col("_sb"), col("_stag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = closings.select(col("_k").as("_sk"), col("_bkt").as("_sb"),
        lit(1).as("_stag"), col("_close"))
      .unionByName(probeBuckets.select(col("_k").as("_sk"),
        col("_bkt").as("_sb"), lit(0).as("_stag"),
        lit(null).cast(closings.schema("_close").dataType).as("_close")))
      .withColumn("_seed", last("_close", ignoreNulls = true).over(sw))
      .filter(col("_stag") === 0 && col("_seed").isNotNull)
    // A seed's ts lies in an earlier bucket, so it sorts before every
    // in-bucket row — the merge below needs no special casing.
    val seedRows = seeds.select(col("_sk").as("_k"),
      col("_seed._t").as("_t"), lit(0).as("_tag"),
      col("_seed._p").as("_p"),
      lit(null).cast(pTagged.schema("_row").dataType).as("_row"),
      col("_sb").as("_bkt"))
    val unioned = bTagged
      .withColumn("_row", lit(null).cast(pTagged.schema("_row").dataType))
      .unionByName(pTagged).unionByName(seedRows)
    val w = Window.partitionBy("_k", "_bkt")
      .orderBy(col("_t"), col("_tag"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = unioned
      .withColumn("_asof", last("_p", ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val outCols = probeCols.map(c => col(s"_row.$c").as(c)) ++
      (tsCol +: payloadCols).map(c => col(s"_asof.$c").as(s"$prefix$c"))
    merged.select(outCols: _*)
  }

  /** Banded range join: all (probe, build) pairs sharing `keyCol` with
    * build.`tsCol` in the half-open interval
    * (probe.ts − window, probe.ts]. Inner semantics — probes with an
    * empty window vanish (re-attach them with a right-join on the
    * probe id if zero-rows matter, as `q_range_join` does).
    *
    * Plan shape: both sides band time by `floor(ts / window)`; a build
    * row's interval can only intersect a probe in the probe's own band
    * or the one below it, so the probe side replicates ×2 across
    * (band−1, band) and the candidate space becomes an EQUI-join on
    * (key, band) + a residual interval filter. Each true pair is
    * produced exactly once (the build row's band is unique). Cost:
    * shuffle of |build| + 2·|probe| on (key, band) — never the
    * |probe|·|build| nested-loop a raw inequality join plans — and
    * banding keys the exchange on (key, band), so a hot key's rows
    * spread across its time range instead of one partition.
    * `window` trades replication (×2, fixed) against residual
    * selectivity: a band ≈ the query interval keeps candidate pairs
    * within ~2× of the true pairs at any scale.
    */
  def bandedRangePairs(probe0: DataFrame, build0: DataFrame, keyCol: String,
      tsCol: String, window: Long, buildPrefix: String = "b_"): DataFrame = {
    // timestamp-typed inputs normalize to epoch-µs, so window is µs
    val (probe, build) = acceptTs(probe0, build0, tsCol)
    require(window > 0, "window must be positive")
    val reserved = Seq("_k", "_band", "_band0", "_graft_band_r")
    val collide =
      (probe.columns ++ build.columns).filter(reserved.contains).distinct
    require(collide.isEmpty, "bandedRangePairs: input uses reserved working " +
      s"column name(s) ${collide.mkString(", ")} — rename before joining")
    val dups = build.columns.map(buildPrefix + _).filter(probe.columns.contains)
    require(dups.isEmpty, "bandedRangePairs: prefixed build column(s) " +
      s"${dups.mkString(", ")} collide with probe columns — use another prefix")
    val build2 = withBand(build.select(
        build.columns.map(c => col(c).as(s"$buildPrefix$c")).toSeq: _*),
      s"$buildPrefix$tsCol", window, "_band")
      .withColumn("_k", col(s"$buildPrefix$keyCol"))
    val probe2 = withBand(probe, tsCol, window, "_band0")
      .withColumn("_band", explode(array(col("_band0") - 1, col("_band0"))))
      .drop("_band0")
      .withColumn("_k", col(keyCol))
    probe2.join(build2, Seq("_k", "_band"))
      .filter(col(s"$buildPrefix$tsCol") > col(tsCol) - window &&
        col(s"$buildPrefix$tsCol") <= col(tsCol))
      .drop("_k", "_band")
  }

  /** Time band by EXACT long floor division — `(ts − pmod(ts, w)) div w`
    * never leaves integer arithmetic. The tempting
    * `floor(ts / w.toDouble)` rounds the numerator to a double first;
    * at epoch-nanosecond magnitudes (~1e18, ulp 128) a sub-1024-unit
    * band would mis-bucket boundary rows. The pmod form is also true
    * FLOOR division for negative timestamps (numerator is an exact
    * multiple of w), where `div` alone truncates toward zero and would
    * merge bands −1 and 0. */
  private def withBand(df: DataFrame, tsCol: String, window: Long,
      out: String): DataFrame =
    df.withColumn("_graft_band_r", pmod(col(tsCol), lit(window)))
      .withColumn(out, expr(s"(`$tsCol` - _graft_band_r) div ${window}L"))
      .drop("_graft_band_r")
}
