package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Empirical profiler (optimization guide §1.1/§7.1 with the UI disabled):
  * runs named queries with a SparkListener attached and prints, per job,
  * wall duration, stage count, task count, summed task time, GC time, and
  * shuffle read/write bytes — the "which stage is the time going to"
  * breakdown the Stages tab would show. Second run per query so warm cost
  * is separable from first-touch cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val runs = sys.env.getOrElse("GRAFT_PROFILE_RUNS", "2").toInt

    case class StageAgg(var tasks: Int = 0, var taskMs: Long = 0,
                        var gcMs: Long = 0, var shufRead: Long = 0,
                        var shufWrite: Long = 0, var input: Long = 0,
                        var spill: Long = 0, var name: String = "")
    val stages = mutable.Map[Int, StageAgg]()
    val jobStages = mutable.Map[Int, Seq[Int]]()
    val jobTimes = mutable.Map[Int, (Long, Long)]()
    val jobOrder = mutable.ArrayBuffer[Int]()

    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        jobStages(j.jobId) = j.stageIds
        jobTimes(j.jobId) = (j.time, 0L)
        jobOrder += j.jobId
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        jobTimes(j.jobId) = (jobTimes(j.jobId)._1, j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val a = stages.getOrElseUpdate(s.stageInfo.stageId, StageAgg())
        // the callsite name is a useless lambda; the RDD scope names carry
        // the operator identities (Scan parquet, Exchange, HashAggregate…)
        a.name = s.stageInfo.rddInfos.sortBy(_.id)
          .map(r => r.scope.map(_.name).getOrElse(r.name))
          .distinct.mkString(">").take(120)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val a = stages.getOrElseUpdate(t.stageId, StageAgg())
        a.tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          a.taskMs += m.executorRunTime
          a.gcMs += m.jvmGCTime
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.input += m.inputMetrics.bytesRead
          a.spill += m.memoryBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- args; run <- 1 to runs) {
      listener.synchronized { stages.clear(); jobStages.clear(); jobTimes.clear(); jobOrder.clear() }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      listener.synchronized {
        println(f"##### $name run$run rows=$n wall=$wall%.2f s jobs=${jobOrder.size}")
        for (j <- jobOrder) {
          val (s0, s1) = jobTimes(j)
          val dur = if (s1 > 0) (s1 - s0) / 1e3 else -1.0
          val st = jobStages.getOrElse(j, Nil).flatMap(stages.get)
          val tasks = st.map(_.tasks).sum
          val taskS = st.map(_.taskMs).sum / 1e3
          val gcS = st.map(_.gcMs).sum / 1e3
          val sr = st.map(_.shufRead).sum / 1e6
          val sw = st.map(_.shufWrite).sum / 1e6
          val sp = st.map(_.spill).sum / 1e6
          val head = st.sortBy(-_.taskMs).headOption.map(_.name).getOrElse("")
          if (dur > 0.05 || taskS > 0.1)
            println(f"  job$j%-4d ${dur}%7.2f s  stages=${jobStages(j).size}%-3d tasks=$tasks%-5d taskTime=$taskS%8.2f s gc=$gcS%6.2f s shufR=$sr%8.1fMB shufW=$sw%8.1fMB spill=$sp%6.1fMB  top:$head")
        }
      }
    }
    spark.stop()
  }
}
