package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic harness: `runMain graft.Profile <sfDir> <query>[,<query>…]`
  * splits a query's wall time into plan-build / optimize / execute and
  * counts the jobs, stages, and tasks the execution scheduled. Deep
  * composite plans at small SF are stage-count-bound (~100-200ms fixed
  * cost per stage: codegen + AQE materialization + scheduling), so the
  * stage count, not the task time, is what to optimize locally. */
object Profile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROF_MIN_PART", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
        val ms = (for (a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime)
          yield a - b).getOrElse(0L)
        if (ms > 500) {
          val m = s.stageInfo.taskMetrics
          println(f"[stage] ${ms}%6dms tasks=${s.stageInfo.numTasks}%3d " +
            f"run=${m.executorRunTime}%dms cpu=${m.executorCpuTime / 1000000}%dms " +
            f"deser=${m.executorDeserializeTime}%dms " +
            s.stageInfo.name.take(80) + " | rdds: " +
            s.stageInfo.rddInfos.map(r => s"${r.name}@${r.scope.map(_.name).getOrElse("?")}")
              .mkString(", ").take(300))
        }
      }
    })

    for (name <- names.split(',')) {
      // listener events are delivered async; give the bus a moment to
      // drain the previous query's events before resetting counters
      Thread.sleep(300)
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime
      df.queryExecution.executedPlan // force analysis + optimization
      val t2 = System.nanoTime
      val n = df.count()
      val t3 = System.nanoTime
      if (sys.env.contains("PROF_EXPLAIN"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/plan_$name.txt"),
          df.queryExecution.executedPlan.toString)
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"[profile] $name%-22s build=${ms(t0, t1)}%8.1fms " +
        f"optimize=${ms(t1, t2)}%8.1fms exec=${ms(t2, t3)}%8.1fms " +
        f"rows=$n%6d jobs=$jobs stages=$stages tasks=$tasks")
    }
    spark.stop()
  }
}
