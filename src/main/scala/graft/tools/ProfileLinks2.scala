package graft.tools

import graft.kg._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B timing of the linkTop1 DAG over a committed bench work
  * dir. args: workDir [cores] [comma-separated variants]. */
object ProfileLinks2 {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val cores = args.lift(1).map(_.toInt).getOrElse(4)
    val variants = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("pairgen", "singlegen", "pairgen2", "singlegen2"))
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUF", (4 * cores).toString))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("GRAFT_COAL", "false"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(n: String) = spark.read.parquet(s"$work/$n")
    val names = rd("names"); val postings = rd("postings")
    val postings3g = rd("postings3g"); val postingsPair = rd("postings_pair")
    val mentions = rd("mentions")

    val cfg = LinkerConfig(limit = 32, fuzzy = true, cutByRelevance = true,
      computeAmbiguity = false, minShouldMatch = true)

    val ts = NameIndex.tokenStats(postings).localCheckpoint(eager = true)
    val nRows = names.count()
    val idfm = NameIndex.idfMaps(names, ts, nRows).localCheckpoint(eager = true)
    val index = NameIndexTables(names, postings, postings3g, Some(postingsPair),
      tokenStats = Some(ts), idfMaps = Some(idfm), nameRowCount = Some(nRows),
      hotTokens = Some(Set.empty))

    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val gcTime = new java.util.concurrent.atomic.AtomicLong()
    val nTasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          taskTime.addAndGet(te.taskMetrics.executorRunTime)
          gcTime.addAndGet(te.taskMetrics.jvmGCTime)
          nTasks.incrementAndGet()
        }
    })
    def metrics(label: String, wall: Double): Unit = {
      println(f"[plinks] $label wall=$wall%.1f taskSec=${taskTime.get() / 1000.0}%.1f " +
        f"gcSec=${gcTime.get() / 1000.0}%.1f tasks=${nTasks.get()} " +
        f"par=${taskTime.get() / 1000.0 / wall}%.2f")
      taskTime.set(0); gcTime.set(0); nTasks.set(0)
    }

    for (variant <- variants) {
      if (variant == "exps") {
        val md = Linker.distinctMentions(mentions)
        val t0 = System.nanoTime()
        val n = Linker.fuzzyExpansions(md, postings3g, ts, cfg).count()
        metrics("exps", (System.nanoTime() - t0) / 1e9)
        println("  expansions = " + n)
      } else if (variant == "plan") {
        println(Linker.linkTop1(spark, mentions, index, cfg, 1.2)
          .queryExecution.executedPlan.toString)
      } else if (variant == "xmetrics") {
        // run, then walk the FINAL adaptive plan printing per-node
        // metrics — finds which exchanges/sorts carry the bytes
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
        val df = Linker.linkTop1(spark, mentions, index, cfg, 1.2)
        val qe = df.queryExecution
        val n = qe.toRdd.count() // executes THIS plan (metrics accumulate on it)
        println("  links = " + n)
        def walk(p: SparkPlan, depth: Int): Unit = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
          case q: QueryStageExec => walk(q.plan, depth)
          case r: ReusedExchangeExec =>
            println(" " * depth + s"[reused] ${r.nodeName}")
          case _ =>
            val interesting = true
            if (interesting) {
              val ms = p.metrics.toSeq
                .filter { case (k, m) => m.value > 0 &&
                  (k.contains("rows") || k.contains("size") ||
                    k.contains("bytes") || k.contains("spill") ||
                    m.name.exists(n => n.contains("rows") || n.contains("size") ||
                      n.contains("bytes") || n.contains("spill"))) }
                .sortBy(_._1)
                .map { case (k, m) => s"${m.name.getOrElse(k)}=${m.value}" }
                .mkString(" | ")
              if (ms.nonEmpty) println(" " * depth + s"${p.nodeName}: $ms")
            }
            p.children.foreach(walk(_, depth + 1))
        }
        walk(qe.executedPlan, 0)
      } else {
        val c2 = cfg.copy(fuzzyPairGen = variant.startsWith("pair"),
          fuzzy = !variant.startsWith("nofuzzy"))
        val t0 = System.nanoTime()
        val n = Linker.linkTop1(spark, mentions, index, c2, 1.2).count()
        metrics(variant, (System.nanoTime() - t0) / 1e9)
        println("  links = " + n)
      }
    }
    spark.stop()
  }
}
