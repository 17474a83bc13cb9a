package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Layout.writeBucketed(orders, "b_orders", s"$wh/b_orders", 8, Seq("o_orderkey"))
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$wh/b_lineitem", 8, Seq("o_orderkey"))
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(joined.count() == lineitem.count())
    // correctness identical to the plain join
    val plain = orders.join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(joined.count() == plain.count())
  }

  test("salted join equals plain join, with salted shuffle keys in the plan") {
    import spark.implicits._
    val large = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1), ("k5", 2)).toDF("key", "w")
    val salted = Layout.saltedJoin(large, small, "key", salts = 8)
    val plain = large.join(small, "key")
    assert(salted.count() == plain.count())
    assert(salted.select("key", "v", "w").except(plain.select("key", "v", "w")).isEmpty)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), "salt key absent from the plan")
  }
}
