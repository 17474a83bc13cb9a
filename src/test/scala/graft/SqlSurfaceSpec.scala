package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The engine's surface is reachable from pure SQL: tables as views,
  * the native expressions (cosine_sim, srp_sig) callable from SQL, and
  * SQL results identical to the DataFrame-API formulation — a user can
  * drive this library entirely through `spark.sql`.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("SQL and DataFrame API produce identical aggregates") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql("""
      SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem_v
      WHERE l_shipdate <= '2000-12-01'
      GROUP BY l_returnflag""")
    val viaApi = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
    assert(viaSql.collect().toSet == viaApi.collect().toSet)
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("native expressions are callable from SQL") {
    graft.functions.VectorFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val row = spark.sql("""
      SELECT vec_id,
             round(cosine_sim(embedding, embedding), 6) AS self_sim,
             srp_sig(embedding, 64, 6, 0) AS sig
      FROM emb_v ORDER BY vec_id LIMIT 1""").head()
    assert(row.getDouble(1) == 1.0, "self-cosine must be exactly 1")
    val sig = row.getLong(2)
    assert(sig >= 0 && sig < 64, "6-bit signature range")
    // SQL and Column API agree on the signature
    val viaApi = Tables.embeddings(spark, sf).orderBy(col("vec_id")).limit(1)
      .select(graft.functions.VectorFunctions
        .srpSig(col("embedding"), 64, 6, 0).as("sig"))
      .head().getLong(0)
    assert(viaApi == sig)
  }

  test("round-4 sketch/PQ functions are callable from SQL") {
    graft.functions.VectorFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    // bloom: build from SQL, probe from SQL — a member must hit
    val filter = spark.sql("""
      SELECT bloom_agg(xxhash64(text), 65536, 5) AS bf FROM docs_v""")
      .head().getAs[Array[Byte]](0)
    val filterHex = "X'" + filter.map("%02x".format(_)).mkString + "'"
    val hits = spark.sql(
      "SELECT count(*) AS n FROM docs_v WHERE " +
        s"bloom_contains(xxhash64(text), $filterHex, 65536, 5)").head().getLong(0)
    assert(hits == Tables.documents(spark, sf).count(),
      "every inserted key must probe true (no false negatives via SQL)")
    // freq_sketch from SQL
    val top = spark.sql("""
      SELECT freq_sketch(t.token, 64) AS s FROM (
        SELECT explode(split(lower(text), ' ')) AS token FROM docs_v) t""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.nonEmpty && top.size <= 64)
  }
}
