package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{langIdHeuristic, qualityScore, tokens}

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs, chained from the individual operators so the
  * whole thing is one lazy plan:
  *
  *   1. quality floor ([[graft.functions.TextFunctions.qualityScore]]
  *      ≥ `minQuality`) and language filter
  *      ([[graft.functions.TextFunctions.langIdHeuristic]] == `lang`) —
  *      pure per-row projections, fused into the scan;
  *   2. exact dedup: lowest id survives per identical text (one shuffle
  *      keyed by text);
  *   3. near-dup drop: SimHash pairs within Hamming ≤ `maxHamming`
  *      over the survivors ([[Dedup.simhashNearDups]] — banded,
  *      bucket-capped), greedily dropping the higher id of each pair.
  *
  * Returns the surviving rows of `df` unchanged. Deterministic end to
  * end, so the `q_pipeline_clean` gate mirrors every step in SQL.
  */
object Pipeline {

  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double, lang: String, maxHamming: Int = 3): DataFrame = {
    val toksC = tokens(col(textCol))
    val kept = df.filter(qualityScore(toksC) >= minQuality &&
      langIdHeuristic(toksC) === lang)
    // exact dedup as groupBy-min + id semi-join, NOT a window over the
    // text: the groupBy partial-aggregates map-side, so a pathological
    // hot text (millions of identical docs) never floods one partition
    // the way a text-partitioned window would; the semi-join keys on
    // the unique id — skew-free by construction.
    val firstIds = kept.groupBy(col(textCol)).agg(min(col(idCol)).as("_keep"))
      .select(col("_keep"))
    val deduped = kept
      .join(firstIds, col(idCol) === col("_keep"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drop = Dedup.simhashNearDups(deduped, idCol, textCol, maxHamming)
      .select(col("b").as(idCol)).distinct()
    deduped.join(drop, Seq(idCol), "left_anti")
  }
}
