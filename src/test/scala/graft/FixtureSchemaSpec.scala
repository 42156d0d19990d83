package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fixture-contract canary. The driver regenerates the parquet fixtures
  * between rounds and has already changed physical types once
  * (`events.ts`: TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), which silently
  * broke every query touching `events` until each failed individually.
  * This spec asserts the ENGINE-FACING schema — what `Tables.*` hands to
  * operators after loading/normalization — so the next physical-layout
  * change fails here first, as one named assertion per table, instead of
  * as dozens of downstream AnalysisExceptions. */
class FixtureSchemaSpec extends SparkSpec {

  private def loaded(name: String) =
    Tables.load(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loads with ts as session-TZ TIMESTAMP (either fixture vintage)") {
    val s = Tables.events(spark, sfDir).schema.fields.map(f => f.name -> f.dataType).toMap
    assert(s("ts") == TimestampType, s"ts loaded as ${s("ts")}")
    assert(s("event_id") == LongType && s("user_id") == LongType)
    assert(s("event_type") == StringType && s("props") == StringType)
    assert(s("value") == DoubleType)
  }

  test("embeddings loads with embedding as array<float>") {
    val s = loaded("embeddings")
    assert(s("embedding") == ArrayType(FloatType, containsNull = true) ||
           s("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding loaded as ${s("embedding")}")
    assert(s("vec_id") == LongType)
  }

  test("documents loads with text/lang/source as string") {
    val s = loaded("documents")
    assert(s("doc_id") == LongType)
    assert(s("text") == StringType && s("lang") == StringType && s("source") == StringType)
    assert(s("n_chars") == LongType)
  }

  test("orders and lineitem date columns load as a timestamp type") {
    // Operators only compare/truncate these — either TIMESTAMP or
    // TIMESTAMP_NTZ works (session TZ is UTC), but a LongType or string
    // vintage would need a loader branch like events got.
    val ts = Set[DataType](TimestampType, TimestampNTZType)
    assert(ts.contains(loaded("orders")("o_orderdate")))
    assert(ts.contains(loaded("lineitem")("l_shipdate")))
  }

  test("TPC-H key columns load with integral types") {
    assert(loaded("customer")("c_custkey") == LongType)
    assert(loaded("orders")("o_custkey") == LongType)
    assert(loaded("lineitem")("l_orderkey") == LongType)
    assert(loaded("part")("p_partkey") == LongType)
    assert(Set[DataType](IntegerType, LongType).contains(loaded("nation")("n_nationkey")))
  }
}
