package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential comparison oracle, the Spark form of the reference's
  * `compseqfile` tool (A8, `CompSeqFile.java:19-74`): zip two keyed
  * results and report Σ/avg/max |Δ| — the check the reference uses to
  * validate incremental vs full recomputation. */
object DiffStats {

  final case class Stats(rows: Long, onlyLeft: Long, onlyRight: Long,
      total: Double, avg: Double, max: Double) {
    def within(eps: Double): Boolean = onlyLeft == 0 && onlyRight == 0 && max <= eps
  }

  /** Compare `left` and `right` on `keyCol`, measuring |Δ| of `valueCol`. */
  def compare(left: DataFrame, right: DataFrame,
      keyCol: String, valueCol: String): Stats = {
    val l = left.select(col(keyCol).as("k"), col(valueCol).as("lv"))
    val r = right.select(col(keyCol).as("k"), col(valueCol).as("rv"))
    val joined = l.join(r, Seq("k"), "full_outer").select(
      when(col("lv").isNull, 1L).otherwise(0L).as("ol"),
      when(col("rv").isNull, 1L).otherwise(0L).as("or"),
      when(col("lv").isNotNull && col("rv").isNotNull,
        abs(col("lv") - col("rv"))).as("d"))
    val row = joined.agg(
      count(lit(1)).as("rows"), sum("ol").as("onlyL"), sum("or").as("onlyR"),
      coalesce(sum("d"), lit(0.0)).as("total"),
      coalesce(avg("d"), lit(0.0)).as("avg"),
      coalesce(max("d"), lit(0.0)).as("max")).collect()(0)
    Stats(row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5))
  }
}
