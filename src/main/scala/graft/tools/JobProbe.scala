package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-loop measurement (optimization guide §1): runs named queries with
  * the BENCH session shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions
  * = cpus) and prints every Spark job the query launches — wall duration,
  * total task time, and the job's call site — so a multi-second query can
  * be attributed to its constituent jobs (fixture commits, bloom builds,
  * stream micro-batches, the final count) instead of guessed at.
  *
  * Usage: runMain graft.tools.JobProbe <sfDir> q_a,q_b[,...] [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, var desc: String, t0: Long,
        var wallMs: Long = -1, var taskMs: Long = 0, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, desc, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(j => j.wallMs = e.time - j.t0)
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageInfo.stageId);
               j <- jobs.get(jid) if j.desc == "?") {
            j.desc = e.stageInfo.name.take(140)
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid);
             m <- Option(e.taskMetrics)) {
          j.taskMs += m.executorRunTime; j.nTasks += 1
        }
      }
    }

    // one untimed warm pass (JIT/codegen), matching Bench methodology
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    names.foreach { n =>
      (1 to reps).foreach { rep =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        spark.sparkContext.addSparkListener(listener)
        // poor-man's sampling profiler over the DRIVER main thread: the
        // job listener above attributes executor time; this attributes
        // the between-jobs gap (planning, manifest folds, fs ops)
        val mainT = Thread.currentThread()
        val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val st = mainT.getStackTrace
            // topmost graft/parquet/catalyst frame = what the driver is doing
            val interesting = st.find { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.startsWith("org.apache.parquet") ||
              c.contains("catalyst") || c.contains("datasources") ||
              c.contains("QueryExecution") || c.contains("RuleExecutor")
            }.orElse(st.headOption)
            interesting.foreach { f =>
              val k = s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}"
              samples.merge(k, 1, (a, b) => a + b)
            }
            Thread.sleep(10)
          }
        })
        sampler.setDaemon(true); sampler.start()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        sampling = false
        Thread.sleep(300) // let queued listener events drain
        spark.sparkContext.removeSparkListener(listener)
        val snap = jobs.synchronized { jobs.values.toVector }
        println(f"[probe] ===== $n rep$rep total=${dt}%.3fs jobs=${snap.size} " +
          f"jobWallSum=${snap.map(_.wallMs).filter(_ > 0).sum / 1000.0}%.3fs =====")
        import scala.jdk.CollectionConverters._
        val tot = samples.values.asScala.map(_.toInt).sum.max(1)
        samples.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, c) =>
          println(f"[probe]   drv ${c.toInt * 100.0 / tot}%5.1f%% (${c}%4d) $k")
        }
        snap.sortBy(-_.wallMs).take(40).foreach { j =>
          println(f"[probe]   job=${j.id}%4d wall=${j.wallMs / 1000.0}%7.3fs " +
            f"taskTime=${j.taskMs / 1000.0}%7.3fs tasks=${j.nTasks}%4d  ${j.desc.take(110)}")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
