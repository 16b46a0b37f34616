package graft

import org.apache.spark.sql.types._

import graft.functions.TimeEncodings
import graft.queries.Q

/** Drift guard for the driver-owned test data: one named test per
  * table asserting the loaded schema is what the query surface
  * assumes. Time columns are allowed to be ANY encoding
  * [[TimeEncodings]] adapts (the generator has already switched events
  * from TIMESTAMP(NANOS)-as-long to native timestamp[µs] once); every
  * other column is pinned exactly. When the generator retypes a column
  * again, this suite fails loudly in ONE place instead of scattering
  * analysis errors across the oracle gates. */
class SchemaGuardSpec extends SparkSpec {

  // expected (column -> dtype); Right(dtype) = exact, Left(()) = any
  // TimeEncodings-adaptable encoding
  private val time = Left(())
  private val tables: Map[String, Seq[(String, Either[Unit, DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> Right(IntegerType),
      "r_name" -> Right(StringType)),
    "nation" -> Seq("n_nationkey" -> Right(IntegerType),
      "n_name" -> Right(StringType), "n_regionkey" -> Right(IntegerType)),
    "customer" -> Seq("c_custkey" -> Right(LongType),
      "c_name" -> Right(StringType), "c_nationkey" -> Right(IntegerType),
      "c_acctbal" -> Right(DoubleType), "c_mktsegment" -> Right(StringType)),
    "supplier" -> Seq("s_suppkey" -> Right(LongType),
      "s_name" -> Right(StringType), "s_nationkey" -> Right(IntegerType),
      "s_acctbal" -> Right(DoubleType)),
    "part" -> Seq("p_partkey" -> Right(LongType),
      "p_name" -> Right(StringType), "p_brand" -> Right(StringType),
      "p_type" -> Right(StringType), "p_size" -> Right(IntegerType),
      "p_retailprice" -> Right(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Right(LongType),
      "o_custkey" -> Right(LongType), "o_orderstatus" -> Right(StringType),
      "o_totalprice" -> Right(DoubleType), "o_orderdate" -> time,
      "o_orderpriority" -> Right(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Right(LongType),
      "l_partkey" -> Right(LongType), "l_suppkey" -> Right(LongType),
      "l_linenumber" -> Right(IntegerType), "l_quantity" -> Right(DoubleType),
      "l_extendedprice" -> Right(DoubleType), "l_discount" -> Right(DoubleType),
      "l_tax" -> Right(DoubleType), "l_returnflag" -> Right(StringType),
      "l_linestatus" -> Right(StringType), "l_shipdate" -> time),
    "events" -> Seq("event_id" -> Right(LongType), "ts" -> time,
      "user_id" -> Right(LongType), "event_type" -> Right(StringType),
      "value" -> Right(DoubleType), "props" -> Right(StringType)),
    "documents" -> Seq("doc_id" -> Right(LongType),
      "text" -> Right(StringType), "lang" -> Right(StringType),
      "source" -> Right(StringType), "n_chars" -> Right(LongType)),
    "embeddings" -> Seq("vec_id" -> Right(LongType),
      "embedding" -> Right(ArrayType(FloatType)), "label" -> Right(IntegerType)))

  for ((table, expect) <- tables.toSeq.sortBy(_._1))
    test(s"$table: columns and dtypes match what the queries assume") {
      // events must go through the adaptive loader (a legacy nanos file
      // needs the conf set before the read)
      val df = if (table == "events") Q.events(spark, sf)
        else Q.t(spark, sf, table)
      assert(df.columns.toSeq == expect.map(_._1),
        s"column set/order drifted: ${df.columns.toSeq}")
      for ((name, want) <- expect) want match {
        case Right(dt) => assert(df.schema(name).dataType == dt,
          s"$table.$name retyped to ${df.schema(name).dataType}, expected $dt")
        case Left(_) => assert(TimeEncodings.isTimeEncoded(df, name),
          s"$table.$name retyped to ${df.schema(name).dataType}, which no " +
            "TimeEncodings branch adapts — add one before trusting the gates")
      }
      assert(df.limit(1).count() == 1, s"$table is empty")
    }

  test("eventsUs surfaces ts as epoch-µs BIGINT on the current data") {
    val df = Q.eventsUs(spark, sf)
    assert(df.schema("ts").dataType == LongType)
    // epoch-µs for any plausible event time is 15-17 digits; a raw
    // nanos value leaking through unconverted would be ~1000x larger
    val ts = df.select("ts").limit(1).collect()(0).getLong(0)
    assert(ts > 1e14.toLong && ts < 1e17.toLong, s"ts=$ts not epoch-µs scale")
  }
}
