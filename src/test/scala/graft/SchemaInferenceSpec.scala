package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.pipeline.SchemaInference

class SchemaInferenceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("payload explosion infers types and keeps passthrough columns") {
    val si = new SchemaInference()
    val df = Seq(
      ("""{"id": 1, "name": "a", "score": 1.5}""", 10L),
      ("""{"id": 2, "name": "b", "score": 2.5}""", 11L)).toDF("data", "ts")
    val out = si.explodePayload(df, "db", "t1", "data", keep = Seq("ts"))
    assert(out.columns.toSet == Set("id", "name", "score", "ts"))
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("score").dataType == DoubleType)
    assert(out.count() == 2)
  }

  test("schema drift folds in: new columns appear, conflicts degrade to string") {
    val si = new SchemaInference()
    si.explodePayload(Seq("""{"id": 1, "x": 5}""").toDF("data"), "db", "t2", "data", Nil)
    assert(si.inferredSchema("db", "t2").get("x").dataType == LongType)
    // batch 2: x becomes a string, new column y arrives
    val out = si.explodePayload(
      Seq("""{"id": 2, "x": "five", "y": true}""").toDF("data"), "db", "t2", "data", Nil)
    val sch = si.inferredSchema("db", "t2").get
    assert(sch("x").dataType == StringType) // conflict → string, not a crash
    assert(sch("y").dataType == BooleanType)
    assert(out.columns.toSet == Set("id", "x", "y"))
    // long→double widens
    val si2 = new SchemaInference()
    si2.explodePayload(Seq("""{"n": 1}""").toDF("data"), "d", "t", "data", Nil)
    si2.explodePayload(Seq("""{"n": 1.5}""").toDF("data"), "d", "t", "data", Nil)
    assert(si2.inferredSchema("d", "t").get("n").dataType == DoubleType)
  }

  test("config-format timestamp coercion converts present columns, skips absent") {
    val si = new SchemaInference()
    val df = si.explodePayload(
      Seq("""{"id": 1, "gmt_created": "2024-03-01T10:30:00Z"}""").toDF("data"),
      "d", "ts", "data", Nil)
    val out = SchemaInference.coerceTimestamps(df,
      Seq("gmt_created", "gmt_modified"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    assert(out.schema("gmt_created").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(!out.columns.contains("gmt_modified"), "absent column stays absent")
    val ts = out.select("gmt_created").head().getTimestamp(0)
    assert(ts.toInstant.toString == "2024-03-01T10:30:00Z")
  }
}
