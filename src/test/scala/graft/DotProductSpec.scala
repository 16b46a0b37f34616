package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = df.select(
      GraftFunctions.dot_product(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (a, b) => a + b).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null and length-mismatch handling") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val r = df.select(
      GraftFunctions.dot_product(col("a"), col("b")).as("d"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (p, q) => p + q).as("hof"))
      .collect()
    // Length mismatch → null, matching the HOF chain (zip_with pads the
    // shorter side with nulls and the fold propagates them).
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(r(2).getDouble(0) == 1.0 * 3.0 + 2.0 * 4.0)
    assert(r(2).getDouble(0) == r(2).getDouble(1))
  }

  test("usable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }
}
