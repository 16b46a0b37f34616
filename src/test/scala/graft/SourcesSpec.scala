package graft

import org.apache.spark.sql.functions._

import graft.algorithms.KMeans
import graft.sources.Sources
import graft.util.Generators

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("Last.fm KV ingest feeds KMeans end-to-end (A3)") {
    // two taste groups: users 0-4 play artists 0-2, users 5-9 artists 7-9
    val lines = (0 until 10).flatMap { u =>
      val artists = if (u < 5) Seq(0, 1, 2) else Seq(7, 8, 9)
      artists.map(a => s"$u\t$a\tartist_$a\t${10 + (u + a) % 5}")
    } ++ Seq("malformed line", "1\t2")
    val dir = java.nio.file.Files.createTempDirectory("graft_lastfm")
    java.nio.file.Files.write(dir.resolve("plays.txt"),
      lines.mkString("\n").getBytes)

    val plays = Sources.lastfmPlays(spark, dir.toString)
    assert(plays.count() == 30) // malformed lines dropped

    // per-user dense play vector over the 10-artist space
    val vecs = plays.groupBy("user")
      .agg(map_from_entries(collect_list(
        struct(col("artist").cast("int"), col("plays")))).as("m"))
      .select(col("user").as("id"),
        transform(sequence(lit(0), lit(9)),
          a => coalesce(col("m")(a), lit(0.0))).as("vec"))
    val model = KMeans.run(vecs, k = 2, metric = "cosine", maxIterations = 5)
    val asg = KMeans.assignments(vecs, model, "cosine")
      .as[(Long, Int)].collect().toMap
    assert((0L to 4L).map(asg).toSet.size == 1)
    assert((5L to 9L).map(asg).toSet.size == 1)
    assert(asg(0L) != asg(9L))
  }

  test("JDBC source round-trips through embedded Derby (F7)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.25))
      .toDF("id", "name", "x")
    val jprops = new java.util.Properties()
    props.foreach { case (k, v) => jprops.setProperty(k, v) }
    df.write.mode("overwrite").jdbc(url, "graft_rt", jprops)
    val back = Sources.jdbc(spark, url, "graft_rt", props)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.25)))
  }

  test("co-bucketed tables join with no exchange and no sort (F33 co-location)") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_name"))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    Sources.writeBucketed(c, "b_cust", "k", 4)
    Sources.writeBucketed(o, "b_ord", "k", 4)
    val j = spark.table("b_ord").join(spark.table("b_cust"), "k")
    val plan = j.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(!plan.contains("Sort "), s"bucketed join still sorts:\n$plan")
    // and the co-located plan returns the same rows as the plain join
    assert(j.count() == o.join(c, "k").count())
    spark.sql("DROP TABLE b_cust"); spark.sql("DROP TABLE b_ord")
  }

  test("typed generators: heavy-tailed degrees, weights, bipartite dst (A12)") {
    val pg = Generators.graphTyped(spark, n = 2000, kind = "pg")
    val degs = pg.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d"), avg("d")).collect()(0)
    val (maxD, avgD) = (degs.getLong(0), degs.getDouble(1))
    // lognormal(-1, 2.3): most nodes degree 1, rare large hubs
    assert(maxD >= 10 * avgD, s"max=$maxD avg=$avgD not heavy-tailed")

    val sp = Generators.graphTyped(spark, n = 500, kind = "sp")
    assert(sp.columns.toSeq == Seq("src", "dst", "weight"))
    assert(sp.filter(col("weight") <= 0).count() == 0)

    val nmf = Generators.graphTyped(spark, n = 500, kind = "nmf", m = 50)
    assert(nmf.agg(max("dst")).collect()(0).getLong(0) < 50)

    // determinism: same (kind, n) → identical edge set
    val again = Generators.graphTyped(spark, n = 500, kind = "sp")
    assert(sp.exceptAll(again).count() == 0 && again.exceptAll(sp).count() == 0)
  }

  test("power matrix generator: <= dim cells per row, values in [0,1), deterministic") {
    val m = Generators.matrixPower(spark, m = 200, dim = 5)
    assert(m.columns.toSeq == Seq("i", "j", "v"))
    val perRow = m.groupBy("i").agg(count(lit(1)).as("c"))
    assert(perRow.filter(col("c") > 5).count() == 0)
    assert(m.filter(col("v") < 0 || col("v") >= 1).count() == 0)
    assert(m.filter(col("j") < 0 || col("j") >= 200).count() == 0)
    // duplicate column draws collapse, so some rows sit below dim
    assert(perRow.filter(col("c") < 5).count() > 0)
    val again = Generators.matrixPower(spark, m = 200, dim = 5)
    assert(m.exceptAll(again).count() == 0 && again.exceptAll(m).count() == 0)
    // and it drives the matvec engine end-to-end
    val x0 = m.select(col("j")).distinct().withColumn("x", lit(1.0))
    val res = graft.algorithms.MatrixVector.run(m, x0, maxIterations = 3)
    assert(res.dynamic.count() > 0)
  }
}
