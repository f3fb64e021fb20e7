package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-round profiler (r15, guide §1): for each query, measure
  * where the wall-clock goes — Catalyst planning vs executed tasks vs
  * scheduling overhead — and how much per-query driver-side job churn
  * there is (iterative operators run dozens of jobs whose fixed costs
  * dominate at bench SF).
  *
  * Per query it reports:
  *   - plan_s   : time to resolve `queryExecution.executedPlan` (analysis+optimization+physical planning)
  *   - wall_s   : end-to-end evaluation (same noop-equivalent consumption as Bench)
  *   - jobs     : Spark jobs launched (≈ actions + shuffle-stage groups under AQE)
  *   - stages   : completed stages
  *   - tasks    : completed tasks
  *   - task_s   : sum of task durations (executor-side busy time)
  *   - sched_s  : wall_s - plan_s - (critical-path estimate is not derivable
  *                cheaply; task_s/cpus approximates ideal parallel time)
  *
  * Output: JSON lines to /tmp/graft_profile.json. Never run by the
  * driver; dev-only (SPARK_GRAFT_ONLY honored).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (e.taskInfo != null) taskNanos += e.taskInfo.duration * 1000000L
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def consume(df: DataFrame): Unit =
      df.queryExecution.executedPlan.execute().foreachPartition(
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          it.foreach(_ => ()))

    // warmup pass at the bench's warmup SF so JIT/codegen caches are hot
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if (Files.isDirectory(Paths.get(warmDir))) {
      names.foreach { case (_, fn) =>
        try consume(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    }

    val sb = new StringBuilder
    names.foreach { case (name, fn) =>
      try {
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        jobs = 0; stages = 0; tasks = 0; taskNanos = 0L
        plan.execute().foreachPartition(
          (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
            it.foreach(_ => ()))
        val t2 = System.nanoTime()
        // give the listener bus a beat to drain
        Thread.sleep(50)
        val planS = (t1 - t0) / 1e9
        val wallS = (t2 - t1) / 1e9
        val line = f"""{"q":"$name","plan_s":$planS%.3f,"wall_s":$wallS%.3f,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"task_s":${taskNanos / 1e9}%.3f}"""
        println("PROFILE " + line)
        sb.append(line).append('\n')
      } catch {
        case t: Throwable =>
          println(s"PROFILE_ERR $name ${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(120)}")
      }
    }
    Files.write(Paths.get("/tmp/graft_profile.json"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
