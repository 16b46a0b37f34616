package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The reference's classic MapReduce example surface (A14,
  * `ExampleDriver.java:56-81`: wordcount, grep, sort, join,
  * secondarysort, aggregate*), re-expressed as one-line declarative
  * DataFrame recipes so Catalyst plans them (pushdown, partial
  * aggregation, broadcast) instead of hand-built map/reduce chains.
  */
object Relational {

  /** WordCount (`examples/.../WordCount.java`): tokenize + count.
    * `explode` + hash-agg gives map-side partial counts (the reference's
    * combiner, F19) for free. */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Grep (`examples/.../Grep.java`): regex filter + per-match count,
    * sorted descending — the reference runs two chained MR jobs for
    * this; here it is filter → agg → sort in one plan. */
  def grep(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token").rlike(pattern))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Top-k by arbitrary ordering with a dense output rank. Total-order
    * sort (F14): Spark's range partitioner does the sampling the
    * reference's `InputSampler`/`TotalOrderPartitioner` does by hand. */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))

  /** Secondary sort (F18, `examples/.../SecondarySort.java`): group by
    * key, values ordered within the group — expressed as
    * sort_array(collect_list(struct(order, value))) so ordering happens
    * in the agg buffer, not a per-group shuffle sort. */
  def secondarySort(
      df: DataFrame, keyCol: String, orderCols: Seq[String], valueCol: String): DataFrame = {
    val packed = struct((orderCols :+ valueCol).map(col): _*)
    df.groupBy(col(keyCol))
      .agg(transform(sort_array(collect_list(packed)), s => s(valueCol))
        .as("values"), count(lit(1)).as("cnt"))
  }

  /** TeraSort-style total-order sort (F14/F16, reference
    * `examples/terasort/TeraSort.java`): `orderBy` plans a
    * range-partitioning exchange whose boundary sampling is exactly the
    * reference's `TeraInputFormat.writePartitionFile` sampler; every
    * partition then holds a disjoint key range in partition order. */
  def totalOrderSort(df: DataFrame, keyCol: String): DataFrame =
    df.orderBy(col(keyCol))

  /** TeraValidate (`examples/terasort/TeraValidate.java`): verify the
    * sorted output — within-partition order plus cross-partition
    * boundary order. Returns true iff globally sorted. Per-partition
    * summaries are O(partitions) at the driver, never the data. */
  def teraValidate(sorted: DataFrame, keyCol: String): Boolean = {
    val idx = sorted.columns.indexOf(keyCol)
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var first: String = null
      var last: String = null
      var ok = true
      rows.foreach { r =>
        val k = r.get(idx).toString
        if (first == null) first = k
        else if (k < last) ok = false
        last = k
      }
      if (first == null) Iterator.empty
      else Iterator((pid, first, last, ok))
    }.collect().sortBy(_._1)
    summaries.forall(_._4) &&
      summaries.sliding(2).forall {
        case Array((_, _, lastA, _), (_, firstB, _, _)) => lastA <= firstB
        case _                                          => true
      }
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gap` (units of the ts
    * column — here epoch-nanos). Pure window functions, one shuffle on
    * the key; the streaming twin is
    * `EventStreams.runningUserTotals`-style keyed state. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      orderTieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, orderTieCol)
    df.withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new")
  }

  /** CDC delta application (F6/F28): `delta` rows carry `change` ∈
    * {"+","-"}; '-' deletes the matching base key, '+' inserts the new
    * row version. The reference encodes this as IFile triples
    * (`IFile.TrippleWriter`, `IFile.java:255-430`); here it is an
    * anti-join + union — both sides shuffle once on the key. */
  def applyDelta(base: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val deletedKeys = delta.filter(col("change") === "-" || col("change") === "+")
      .select(keyCols.map(col): _*).distinct()
    val inserts = delta.filter(col("change") === "+").drop("change")
    base.join(deletedKeys, keyCols, "left_anti").unionByName(inserts)
  }
}
