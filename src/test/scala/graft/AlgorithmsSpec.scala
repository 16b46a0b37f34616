package graft

import org.apache.spark.sql.functions._
import graft.algorithms.{KMeans, MatrixVector, PageRank}

/** Differential tests: each iterative algorithm vs a driver-side naive
  * recomputation (the reference's own oracle strategy — `naivepagerank`
  * etc., SURVEY §5). */
class AlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  // Small deterministic graph: 0..5, a mix of fan-in/fan-out + a sink.
  private val edgeList = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L), (4L, 0L),
    (4L, 1L), (4L, 2L), (5L, 4L), (1L, 5L))

  private def naivePageRank(iters: Int, damping: Double): Map[Long, Double] = {
    val out = edgeList.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edgeList.map(_._1) ++ edgeList.map(_._2)).distinct
    var rank = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contribs = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for ((s, ds) <- out; d <- ds) contribs(d) += damping * rank(s) / ds.size
      rank = nodes.map(n => n -> ((1.0 - damping) + contribs(n))).toMap
    }
    rank
  }

  test("PageRank matches naive loop at fixed iterations") {
    val edges = edgeList.toDF("src", "dst")
    val got = PageRank.run(edges, damping = 0.8, maxIterations = 5)
      .dynamic.as[(Long, Double)].collect().toMap
    val want = naivePageRank(5, 0.8)
    assert(got.keySet == want.keySet)
    for ((n, r) <- want) assert(math.abs(got(n) - r) < 1e-9, s"node $n: ${got(n)} vs $r")
  }

  test("PageRank converges under threshold and stops early") {
    val edges = edgeList.toDF("src", "dst")
    val res = PageRank.run(edges, maxIterations = 50, threshold = 1e-6)
    assert(res.iterations < 50)
    assert(res.lastDistance < 1e-6)
    // converged ranks ≈ 30-iteration naive run
    val got = res.dynamic.as[(Long, Double)].collect().toMap
    val want = naivePageRank(60, 0.8)
    for ((n, r) <- want) assert(math.abs(got(n) - r) < 1e-4)
  }

  test("KMeans (euclidean) matches naive loop") {
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.2)), (2L, Array(0.2, 0.1)),
      (3L, Array(5.0, 5.0)), (4L, Array(5.1, 4.9)), (5L, Array(4.9, 5.2)),
      (6L, Array(0.1, 5.0)), (7L, Array(0.0, 5.1)))
    val df = pts.toDF("id", "vec")
    val model = KMeans.run(df, k = 3, metric = "euclidean", maxIterations = 5)

    // naive driver-side loop, same pinned init (3 lowest ids)
    var centers: Seq[Array[Double]] = pts.sortBy(_._1).take(3).map(_._2)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (_ <- 1 to 5) {
      val byC = pts.groupBy { case (_, v) => centers.zipWithIndex.minBy {
        case (c, i) => (d2(v, c), i) }._2 }
      centers = centers.indices.map { i =>
        byC.get(i).map { m =>
          val n = m.size
          m.map(_._2).transpose.map(_.sum / n).toArray
        }.getOrElse(centers(i))
      }
    }
    val got = model.centers.sortBy(_._1).map(_._2)
    assert(got.length == 3)
    for ((g, w) <- got.zip(centers))
      assert(math.sqrt(d2(g, w)) < 1e-9, s"${g.toList} vs ${w.toList}")
  }

  test("distributed naive KMeans (A11) matches the engine exactly") {
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.2)), (2L, Array(0.2, 0.1)),
      (3L, Array(5.0, 5.0)), (4L, Array(5.1, 4.9)), (5L, Array(4.9, 5.2)),
      (6L, Array(0.1, 5.0)), (7L, Array(0.0, 5.1))).toDF("id", "vec")
    val model = KMeans.run(pts, k = 3, metric = "euclidean", maxIterations = 5)
    val naive = KMeans.runNaive(pts, k = 3, iterations = 5)
      .select("cid", "cvec", "n").as[(Int, Array[Double], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(naive.keySet == model.centers.map(_._1).toSet)
    for ((cid, v) <- model.centers) {
      val (nv, n) = naive(cid)
      assert(v.zip(nv).map { case (a, b) => math.abs(a - b) }.max < 1e-9)
      assert(n == model.sizes(cid))
    }
  }

  test("distributed naive matvec (A11) matches the engine exactly") {
    val cells = Seq(
      (0L, 0L, 2.0), (0L, 1L, 1.0), (1L, 1L, 3.0), (1L, 2L, -1.0),
      (2L, 0L, 0.5), (2L, 2L, 4.0), (3L, 1L, 2.5))
    val m = cells.toDF("i", "j", "v")
    val x0 = Seq((0L, 1.0), (1L, 1.0), (2L, 1.0)).toDF("j", "x")
    val engine = MatrixVector.run(m, x0, maxIterations = 3, normalize = true)
      .dynamic.as[(Long, Double)].collect().toMap
    val naive = MatrixVector.runNaive(m, x0, iterations = 3, normalize = true)
      .as[(Long, Double)].collect().toMap
    assert(naive.keySet == engine.keySet)
    for ((j, v) <- engine) assert(math.abs(naive(j) - v) < 1e-12)
  }

  test("KMeans cosine metric separates by direction") {
    val pts = Seq(
      (0L, Array(1.0, 0.01)), (1L, Array(2.0, 0.0)), (2L, Array(9.0, 0.1)),
      (3L, Array(0.01, 1.0)), (4L, Array(0.0, 3.0)), (5L, Array(0.2, 8.0)))
    val model = KMeans.run(pts.toDF("id", "vec"), k = 2, metric = "cosine",
      maxIterations = 5)
    val asg = KMeans.assignments(pts.toDF("id", "vec"), model, "cosine")
      .as[(Long, Int)].collect().toMap
    assert(asg(0L) == asg(1L) && asg(1L) == asg(2L))
    assert(asg(3L) == asg(4L) && asg(4L) == asg(5L))
    assert(asg(0L) != asg(3L))
  }

  test("MatrixVector plain matches naive, blocked matches plain") {
    val cells = Seq(
      (0L, 0L, 2.0), (0L, 1L, 1.0), (1L, 1L, 3.0), (1L, 2L, -1.0),
      (2L, 0L, 0.5), (2L, 2L, 4.0), (3L, 1L, 2.5))
    val m = cells.toDF("i", "j", "v")
    val x0 = Seq((0L, 1.0), (1L, 1.0), (2L, 1.0)).toDF("j", "x")

    // one un-normalized step vs naive
    val y1 = MatrixVector.multiply(m, x0).as[(Long, Double)].collect().toMap
    val naive = cells.groupBy(_._1).view.mapValues(_.map { case (_, j, v) => v * 1.0 }.sum)
    for ((i, v) <- naive) assert(math.abs(y1(i) - v) < 1e-12)

    val yb = MatrixVector.multiplyBlocked(m, x0, b = 2).as[(Long, Double)].collect().toMap
    assert(yb == y1)

    // 3 normalized iterations run end-to-end
    val res = MatrixVector.run(m, x0, maxIterations = 3, normalize = true)
    val xs = res.dynamic.as[(Long, Double)].collect().toMap
    assert(math.abs(xs.values.map(math.abs).sum - 1.0) < 1e-9)
  }

  test("iterated blocked matvec (A4) matches the scalar engine") {
    val cells = Seq(
      (0L, 0L, 2.0), (0L, 1L, 1.0), (1L, 1L, 3.0), (1L, 2L, -1.0),
      (2L, 0L, 0.5), (2L, 2L, 4.0), (3L, 1L, 2.5), (5L, 5L, 1.5))
    val m = cells.toDF("i", "j", "v")
    val x0 = Seq((0L, 1.0), (1L, 1.0), (2L, 1.0), (5L, 2.0)).toDF("j", "x")
    val scalar = MatrixVector.run(m, x0, maxIterations = 3, normalize = true)
      .dynamic.as[(Long, Double)].collect().toMap
    val blocked = MatrixVector.runBlocked(m, x0, b = 2, maxIterations = 3,
      normalize = true).dynamic.as[(Long, Double)].collect().toMap
    assert(blocked.keySet == scalar.keySet)
    for ((j, v) <- scalar) assert(math.abs(blocked(j) - v) < 1e-12)
    // un-normalized path too
    val s2 = MatrixVector.run(m, x0, maxIterations = 2, normalize = false)
      .dynamic.as[(Long, Double)].collect().toMap
    val b2 = MatrixVector.runBlocked(m, x0, b = 3, maxIterations = 2,
      normalize = false).dynamic.as[(Long, Double)].collect().toMap
    assert(b2 == s2)
  }

  test("tileSizeFor keeps tiles dense as dimension grows at fixed degree") {
    import graft.algorithms.IncrementalMatVec.tileSizeFor
    // the ScaleBench 100x hazard: dim=400k, deg≈38 → a fixed b=64 gives
    // 0.39 expected cells/tile (tile layer ≈ pure overhead, OOMed 8g);
    // the rule must return a b with >= target expected cells
    for ((dim, nnz) <- Seq((4000L, 150000L), (40000L, 1500000L),
        (400000L, 15000000L), (4000000L, 150000000L))) {
      val b = tileSizeFor(dim, nnz)
      val cellsPerTile = nnz.toDouble * b * b / (dim.toDouble * dim)
      assert(cellsPerTile >= 4.0 - 1e-9, s"dim=$dim b=$b → $cellsPerTile")
      // tid packing bound: at most 1000 column blocks
      assert(math.ceil(dim.toDouble / b) <= 1000.0, s"dim=$dim b=$b")
      assert(b >= 16)
    }
    // dense-enough matrices floor at minB, not below
    assert(tileSizeFor(100L, 10000L) == 16)
    // the packing bound dominates for huge sparse dims
    assert(tileSizeFor(10000000L, 10000000L) >= 10000)
  }
}
