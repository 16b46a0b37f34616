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
    * reference's `InputSampler`/`TotalOrderPartitioner` does by hand.
    *
    * The rank is NOT a window function: an unpartitioned rank window
    * sprays WindowExec's "moving all data to a single partition"
    * warning (and Spark 4's `EliminateWindowPartitions` folds away any
    * constant partition spec that would silence it). `orderBy.limit`
    * already yields ONE partition in sorted order — `TakeOrderedAndProject`
    * /`GlobalLimit` contract — so the rank is just the row position:
    * zipWithIndex over ≤ k rows, no extra job on a single partition. */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame = {
    // coalesce(1) + local sort over the ≤k limited rows: TakeOrderedAndProject
    // yields one sorted partition already (both no-ops then), but the
    // Sort+GlobalLimit fallback (spark.sql.execution.topKSortFallbackThreshold
    // below k) does not contractually keep the rows sorted through the
    // single-partition exchange — without the re-sort the ranks would be
    // silently wrong, and on ≤k rows the guard costs nothing.
    val limited = df.orderBy(order: _*).limit(k)
      .coalesce(1).sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(limited.schema.fields :+
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val ranked = limited.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1).toInt)
    }
    limited.sparkSession.createDataFrame(ranked, schema)
  }

  /** Skew-safe equi-join (100 TB posture): a single hot key floods one
    * shuffle partition in a plain sort-merge join, and AQE's skew split
    * only helps when the skew is visible at runtime stats granularity.
    * Salting fixes it structurally: each `big` row gets a deterministic
    * salt in [0, salt) from a stable row hash, the `small` side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `salt` partitions while
    * every row still meets exactly one replica of its match, so the
    * result is bit-identical to the plain inner join (gate-enforced:
    * `q_salted_join` shares the plain join's oracle).
    * Shuffle cost: |big| unchanged, |small| × salt — size `salt` to the
    * skew factor, keep `small` the dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Salt from the row's POSITION (monotonically_increasing_id =
    // partitionId·2³³ + row index — consecutive rows cycle through all
    // `salt` values), never from row content: a content hash gives every
    // byte-identical duplicate of a hot row the SAME salt, so a key
    // whose skew comes from duplicate rows still floods one partition.
    // Any salt assignment is correct (each big row meets exactly one
    // replica of its match — gate-enforced against the plain join), so
    // the round-robin costs nothing and spreads true duplicates evenly.
    val bigS = big.withColumn("_salt", saltColumn(salt))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** The salt assignment [[saltedJoin]] applies to the big side —
    * package-visible so specs can assert the duplicate-row spreading
    * contract directly. */
  private[graft] def saltColumn(salt: Int): Column =
    pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int")

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

  /** Key comparison in the column's NATIVE ordering (a string compare
    * would call "10" < "9" for numeric keys): nulls first like Spark's
    * default sort order; strings and binary in unsigned-byte UTF-8 /
    * `BinaryType` order; everything else via its own `Comparable`
    * (covers the numeric/date/timestamp/decimal key types a sortable
    * column can hold).
    *
    * Strings deliberately do NOT use `String.compareTo`: Java compares
    * UTF-16 code units, which orders supplementary-plane characters
    * (surrogate pairs, 0xD800-0xDFFF units) BELOW [U+E000, U+FFFF] —
    * whereas Spark's `UTF8String` and DuckDB both compare UTF-8 bytes
    * (== code-point order). A validator in UTF-16 order would call a
    * correctly-Spark-sorted frame with an emoji key "unsorted". */
  private def compareBytes(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private[graft] def keyCompare(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: Array[Byte], y: Array[Byte]) => compareBytes(x, y)
    case (x: String, y: String) =>
      compareBytes(x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: Comparable[_], _) => x.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ => throw new IllegalArgumentException(
      s"unsupported sort-key type ${a.getClass.getName}")
  }

  /** TeraValidate (`examples/terasort/TeraValidate.java`): verify the
    * sorted output — within-partition order plus cross-partition
    * boundary order, compared in the key's native ordering. Returns
    * true iff globally sorted. Per-partition summaries are
    * O(partitions) at the driver, never the data. */
  def teraValidate(sorted: DataFrame, keyCol: String): Boolean = {
    val idx = sorted.columns.indexOf(keyCol)
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var hasAny = false
      var first: Any = null
      var last: Any = null
      var ok = true
      rows.foreach { r =>
        val k = r.get(idx)
        if (!hasAny) { first = k; hasAny = true }
        else if (keyCompare(k, last) < 0) ok = false
        last = k
      }
      if (!hasAny) Iterator.empty
      else Iterator((pid, first, last, ok))
    }.collect().sortBy(_._1)
    summaries.forall(_._4) &&
      summaries.sliding(2).forall {
        case Array((_, _, lastA, _), (_, firstB, _, _)) =>
          keyCompare(lastA, firstB) <= 0
        case _ => true
      }
  }

  /** One-pass TeraSort audit (sortedness + row count + order-sensitive
    * checksum), the reference's TeraValidate output shape: per
    * partition (first, last, ok, rows, fold of `codeCol` in row order),
    * combined at the driver in partition order — O(partitions) driver
    * data, a single job over the sorted frame.
    *
    * The checksum is fold(acc → acc·mult + code mod P) over the GLOBAL
    * row order, stitched from per-partition folds with
    * fold(A ++ B) = fold(A)·mult^|B| + fold(B) (mod P) — so it equals a
    * single-threaded fold over the fully sorted data and an oracle can
    * reproduce it with `ORDER BY` + `list_reduce`. Rows must carry a
    * long `codeCol` in [0, P); ties in the sort key must map to equal
    * codes for the checksum to be order-stable (e.g. code = hash of the
    * key itself). */
  def teraSummary(sorted: DataFrame, keyCol: String, codeCol: String,
      mult: Long = 131L): (Boolean, Long, Long) = {
    val P = 1000000007L
    val kIdx = sorted.columns.indexOf(keyCol)
    val cIdx = sorted.columns.indexOf(codeCol)
    val parts = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var hasAny = false
      var first: Any = null
      var last: Any = null
      var ok = true
      var fold = 0L
      var n = 0L
      rows.foreach { r =>
        val k = r.get(kIdx)
        if (!hasAny) { first = k; hasAny = true }
        else if (keyCompare(k, last) < 0) ok = false
        last = k
        fold = (fold * mult + ((r.getLong(cIdx) % P) + P) % P) % P
        n += 1
      }
      if (!hasAny) Iterator.empty
      else Iterator((pid, first, last, ok, fold, n))
    }.collect().sortBy(_._1)
    def powMod(base: Long, e: Long): Long = {
      var b = base % P; var r = 1L; var k = e
      while (k > 0) {
        if ((k & 1) == 1) r = r * b % P
        b = b * b % P
        k >>= 1
      }
      r
    }
    val sortedOk = parts.forall(_._4) &&
      parts.sliding(2).forall {
        case Array((_, _, lastA, _, _, _), (_, firstB, _, _, _, _)) =>
          keyCompare(lastA, firstB) <= 0
        case _ => true
      }
    val (checksum, rows) = parts.foldLeft((0L, 0L)) {
      case ((acc, n), (_, _, _, _, fold, pn)) =>
        ((acc * powMod(mult, pn) + fold) % P, n + pn)
    }
    (sortedOk, rows, checksum)
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gap` (units of the ts
    * column). An integer `tsCol` keeps the caller's unit; a
    * TIMESTAMP/TIMESTAMP_NTZ `tsCol` is normalized to epoch-µs (output
    * included), making `gap` µs — see
    * [[graft.functions.TimeEncodings]]. Pure window functions, one
    * shuffle on the key; the streaming twin is
    * `EventStreams.runningUserTotals`-style keyed state. */
  def sessionize(df0: DataFrame, keyCol: String, tsCol: String,
      orderTieCol: String, gap: Long): DataFrame = {
    val df = graft.functions.TimeEncodings.acceptTimestamp(df0, tsCol)
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
