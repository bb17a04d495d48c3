package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Dev-only: full-pipeline leg with per-stage task-time attribution —
  * used to find where 4-core core-seconds inflate vs 1-core (memory
  * bandwidth / GC / shuffle). args: pagesPath dumpPath workDir cores
  * [warm|cold]. Run pinned (taskset -c <cpus> + ActiveProcessorCount,
  * same shape as BenchLeg) for faithful numbers. Prints total wall +
  * a ranking keyed by Pipeline's `graft-stage:` job descriptions of
  * taskSec / gcSec / tasks / shuffle MB. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val Array(pagesPath, dumpPath, workDir, coresStr) = args.take(4)
    val cores = coresStr.toInt
    val warm = args.lift(4).forall(_ == "warm")
    val spark = graft.BenchLeg.pipelineSession(cores)

    val stageDesc = new TrieMap[Int, String]()       // stageId -> description
    // (taskSec, gcSec, nTasks, shuffleMB) per description
    val byDesc = new TrieMap[String, (Double, Double, Long, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("(untagged)")
        js.stageInfos.foreach(si => stageDesc.update(si.stageId, desc))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val desc = stageDesc.getOrElse(si.stageId, "(unknown)")
        val shufMb = (m.shuffleWriteMetrics.bytesWritten +
          m.shuffleReadMetrics.totalBytesRead) / 1e6
        val prev = byDesc.getOrElse(desc, (0.0, 0.0, 0L, 0.0))
        byDesc.update(desc, (
          prev._1 + m.executorRunTime / 1e3,
          prev._2 + m.jvmGCTime / 1e3,
          prev._3 + si.numTasks,
          prev._4 + shufMb))
      }
    })

    if (warm) {
      val dir = s"$workDir-warmup"
      val out = graft.kg.Pipeline.run(spark,
        spark.read.parquet(pagesPath).limit(800),
        spark.read.parquet(dumpPath).limit(300), dir)
      out.triples.count()
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      byDesc.clear(); stageDesc.clear()
    }

    val t0 = System.nanoTime()
    val out = graft.kg.Pipeline.run(spark,
      spark.read.parquet(pagesPath), spark.read.parquet(dumpPath), workDir)
    val nTriples = out.triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val totTask = byDesc.values.map(_._1).sum
    val totGc = byDesc.values.map(_._2).sum
    val totShuf = byDesc.values.map(_._4).sum
    println(f"[ppipe] cores=$cores wall=$wall%.1f taskSec=$totTask%.1f " +
      f"gcSec=$totGc%.1f shufMB=$totShuf%.0f triples=$nTriples")
    byDesc.toSeq.sortBy(-_._2._1).take(40).foreach {
      case (desc, (run, gc, n, shuf)) =>
        println(f"[ppipe]   $run%8.1fs gc=$gc%6.1f tasks=$n%5d shufMB=$shuf%8.1f  $desc")
    }
    spark.stop()
  }
}
