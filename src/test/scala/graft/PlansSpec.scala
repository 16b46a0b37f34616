package graft

import org.apache.spark.sql.functions._

import graft.plans.DotProductRewrite
import graft.sources.Sources

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("DotProductRewrite replaces the HOF idiom and preserves results") {
    // parquet-backed (not constant-foldable), coalesce ⇒ non-nullable
    // elements so the conservative rewrite is allowed to fire
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(
        array(coalesce(col("c_acctbal"), lit(0.0)),
          coalesce(col("c_nationkey").cast("double"), lit(0.0))).as("a"),
        array(coalesce(col("c_nationkey").cast("double"), lit(0.0)),
          coalesce(col("c_acctbal"), lit(0.0))).as("b"))
    // QueryExecution caches its optimized plan, so build a fresh
    // DataFrame for each phase
    def hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))

    val before = hof.collect().map(_.getDouble(0)).toSeq
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      val rewritten = hof
      val optimized = rewritten.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dotproduct"), s"no rewrite in:\n$optimized")
      val after = rewritten.collect().map(_.getDouble(0)).toSeq
      assert(after == before)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite does NOT fire for nullable-element arrays") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("a"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      // cast keeps containsNull=true → null-element semantics differ →
      // the conservative rule must leave the plan alone
      assert(!hof.queryExecution.optimizedPlan.toString.contains("dotproduct"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("lmScore plans shuffled count joins, no cartesian blowup") {
    // the only nested-loop allowed is the broadcast of the 1-ROW
    // vocabulary frame; everything else must be key-partitioned or
    // broadcast-hash — a cartesian over the bigram tables would be the
    // corpus-squared accident this pin exists to catch
    val docs = (1L to 50L).map(i => (i, s"p$i q$i r$i s$i"))
      .toDF("doc_id", "text")
    val out = graft.operators.Pipeline.lmScore(docs, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in lmScore:\n$plan")
    val bnlj = plan.linesIterator
      .count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"want at most the 1-row vocab BNLJ, got $bnlj")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 12, s"lmScore exchange count regressed: $exchanges")
  }

  test("kvText source splits on separator and handles missing values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"),
      "k1\tv1\nk2\tv2 with\ttabs\nnokv\n")
    val rows = Sources.kvText(spark, dir).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(rows("k1").contains("v1"))
    assert(rows("k2").contains("v2 with\ttabs"))
    assert(rows("nokv").isEmpty)
    val typed = Sources.typedKvText(spark, dir, "string", "string")
    assert(typed.schema.fieldNames.toSeq == Seq("key", "value"))
  }
}
