package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage profile of a declared query: runs it cold + warm and prints
  * every stage of the WARM run with wall, executor task time, shuffle
  * bytes and record counts — the "which operator is the time" lens the
  * optimization rounds need before touching a query (guide §1: measure
  * first; the Spark UI is disabled in the bench session, this is its
  * batch stand-in).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProfile <query> [warmRuns]
  */
object StageProfile {
  final case class StageRow(id: Int, name: String, wallMs: Long,
                            taskMs: Long, tasks: Int,
                            shufReadMB: Double, shufWriteMB: Double,
                            inRecords: Long, outRecords: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <query> [warmRuns]")
    val name = args(0)
    val warmRuns = args.lift(1).map(_.toInt).getOrElse(1)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = graft.SparkEntry.queries(name)

    val stages = TrieMap.empty[Int, StageRow]
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = e.stageInfo
          val m = si.taskMetrics
          stages(si.stageId) = StageRow(
            si.stageId, si.name,
            (for {s <- si.submissionTime; c <- si.completionTime} yield c - s)
              .getOrElse(-1L),
            m.executorRunTime, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.recordsRead,
            m.outputMetrics.recordsWritten)
        }
    })

    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sf).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // listener events are delivered asynchronously: settle the bus
    // before every capture toggle so trailing stages of the profiled
    // run are counted and late events from the previous run's release
    // jobs are not misattributed (r19 ADVICE; listenerBus.waitUntilEmpty
    // is private[spark] — the ReconcileIoBench settle-sleep stands in)
    def drain(): Unit = Thread.sleep(400)
    val cold = once(); release()
    var lastWarm = 0.0
    (1 to warmRuns).foreach { i =>
      drain()
      stages.clear()
      capture = i == warmRuns // profile only the last warm run
      lastWarm = once()
      if (i < warmRuns) release()
    }
    drain()
    capture = false
    println(f"[profile] $name cold=$cold%.2fs warm=$lastWarm%.2fs " +
      s"stages=${stages.size}")
    val rows = stages.values.toSeq.sortBy(-_.wallMs)
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s " +
      f"${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"in_rec"}%10s  name")
    rows.foreach { r =>
      println(f"${r.id}%6d ${r.wallMs}%8d ${r.taskMs}%8d ${r.tasks}%6d " +
        f"${r.shufReadMB}%9.2f ${r.shufWriteMB}%9.2f ${r.inRecords}%10d  " +
        r.name.take(90))
    }
    println(f"[profile] warm wall total over stages: " +
      f"${rows.map(_.wallMs).sum}%d ms; sum task ${rows.map(_.taskMs).sum}%d ms")
    spark.stop()
  }
}
