package graft.tools
object HashBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32")
    import org.apache.spark.sql.functions._
    val df = graft.Tables.table(spark, "/root/testdata/sf0.1", "lineitem")
      .select(concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("k")).cache()
    df.count()
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime(); df.select(max(c)).collect()
      val t1 = System.nanoTime(); df.select(max(c)).collect()
      println(f"HB $name%-12s ${(System.nanoTime()-t1)/1e9}%.3f (cold ${(t1-t0)/1e9}%.3f)")
    }
    time("md5conv")(org.apache.spark.sql.functions.conv(substring(md5(col("k")),1,15),16,10).cast("long"))
    time("md5only")(length(md5(col("k"))).cast("long"))
    time("xxhash64")(xxhash64(col("k")))
    spark.stop()
  }
}
