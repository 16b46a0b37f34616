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
    *
    * Plan shape: tag both sides, union, one running
    * `last(payload, ignoreNulls)` window per key ordered by
    * (ts, side-tag, payload) — a single hash-partition shuffle on the
    * key and a streaming running-frame scan per partition; no
    * inequality join, no per-probe re-scan of the build side. At equal
    * timestamps the build row sorts BEFORE the probe (tag 0 < 1), so
    * "at-or-before" is inclusive; duplicate build (key, ts) pairs
    * resolve deterministically to the payload-struct maximum (the
    * payload is the window order's final tie-breaker).
    *
    * 100 TB posture: cost is one exchange of |probe|+|build| rows on
    * the key plus a per-key linear merge — the same asymptotics as a
    * sort-merge join. A single key's history must fit one task's
    * window buffer (spilled by `WindowExec` when large); a hotter key
    * than that calls for pre-bucketing time coarsely and seeding each
    * bucket with its predecessor's closing row.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
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
  def bandedRangePairs(probe: DataFrame, build: DataFrame, keyCol: String,
      tsCol: String, window: Long, buildPrefix: String = "b_"): DataFrame = {
    require(window > 0, "window must be positive")
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
