package graft

import org.apache.spark.sql.functions._

import graft.algorithms.{IncrementalPageRank, PageRank}

/** Incremental-vs-full differential tests — the reference's own oracle
  * strategy (`compseqfile`/`compagerank`, SURVEY §5): after a graph
  * delta, the incremental continuation must match a full recomputation
  * within the filter-threshold-dependent error. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(n: Int, e: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (1 to e).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
  }

  test("incr(G+dG) with theta=0 converges to full(G+dG)") {
    val base = randomEdges(60, 220, seed = 7)
    val edges1 = base.toDF("src", "dst")
    // damping 0.5 → geometric convergence 0.5^k: 25 iterations ≈ 3e-8,
    // tight enough for the 1e-6 equality assertion below
    val preserved = IncrementalPageRank.preserve(edges1, 0.5, iterations = 25)

    // delta: sources 0..9 get entirely new out-edges
    val changed = base.map(_._1).distinct.filter(_ < 10)
    val edges2 = base.filterNot { case (s, _) => s < 10 }
      .++(changed.map(s => (s, (s * 13 + 3) % 60)))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")

    val incr = IncrementalPageRank.incremental(
      edges2, preserved, changed.toDF("src"), 0.5,
      iterations = 25, filterThreshold = 0.0)
      .as[(Long, Double)].collect().toMap

    // oracle: full from-scratch recomputation on the updated graph
    val full = PageRank.run(edges2, 0.5, maxIterations = 50)
      .dynamic.as[(Long, Double)].collect().toMap

    val common = incr.keySet & full.keySet
    assert(common.nonEmpty)
    for (nd <- common)
      assert(math.abs(incr(nd) - full(nd)) < 1e-6,
        s"node $nd incr=${incr(nd)} full=${full(nd)}")
  }

  test("filter threshold bounds the error against full recomputation") {
    val base = randomEdges(80, 320, seed = 11)
    val edges1 = base.toDF("src", "dst")
    val preserved = IncrementalPageRank.preserve(edges1, 0.5, iterations = 15)

    val changed = base.map(_._1).distinct.filter(_ % 7 == 0)
    val edges2 = base.filterNot { case (s, _) => s % 7 == 0 }
      .++(changed.flatMap(s => Seq((s, (s * 13 + 3) % 80), (s, (s * 5 + 1) % 80))))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")

    val theta = 1e-3
    val incr = IncrementalPageRank.incremental(
      edges2, preserved, changed.toDF("src"), 0.5,
      iterations = 20, filterThreshold = theta)
      .as[(Long, Double)].collect().toMap

    val full = PageRank.run(edges2, 0.5, maxIterations = 40)
      .dynamic.as[(Long, Double)].collect().toMap

    // CompSeqFile-style divergence stats: max |Δ| bounded by a modest
    // multiple of θ (change propagation stops below θ per key).
    val diffs = full.collect { case (nd, r) if incr.contains(nd) => math.abs(r - incr(nd)) }
    val maxDiff = diffs.max
    assert(maxDiff < theta * 50, s"max divergence $maxDiff vs theta $theta")
    assert(diffs.sum / diffs.size < theta * 10)
  }

  test("preserved state round-trips through parquet") {
    val edges = randomEdges(40, 120, seed = 3).toDF("src", "dst")
    val p = IncrementalPageRank.preserve(edges, 0.8, iterations = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    p.write(dir)
    val p2 = graft.core.PreservedState.read(spark, dir)
    assert(p2.kvs.count() == p.kvs.count())
    assert(p2.out.count() == p.out.count())
  }
}
