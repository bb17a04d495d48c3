package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: pipeline scaling legs without the query sweep.
  * args: [pages] [legCores Seq] e.g. `192000 1,4`. */
object BenchPipeline {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchpipe-$cpus")
      .config("spark.sql.shuffle.partitions", 4 * cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(96000)
    val legCores = args.lift(1).getOrElse("1,4").split(",").map(_.trim.toInt).toSeq
    val nEntities = math.min(32000, math.max(400, nPages / 6))
    val root = s"/tmp/graft-benchpipe-${ProcessHandle.current().pid()}"

    var spark = session(32)
    graft.kg.Fixtures.pages(spark, nPages, nEntities)
      .write.mode("overwrite").parquet(s"$root/pages")
    graft.kg.Fixtures.dumpLines(spark, nEntities)
      .write.mode("overwrite").parquet(s"$root/dump")
    spark.stop()

    val legs = legCores.map { cores =>
      val s = session(cores)
      val t0 = System.nanoTime()
      val out = graft.kg.Pipeline.run(s,
        s.read.parquet(s"$root/pages"), s.read.parquet(s"$root/dump"),
        s"$root/work-$cores")
      val n = out.triples.count()
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      println(f"[benchpipe] local[$cores] $sec%.1f s  ${nPages / sec}%.0f pages/s  triples=$n")
      (cores, nPages / sec)
    }
    if (legs.size >= 2) {
      val eff = (legs.last._2 / legs.head._2) / (legs.last._1.toDouble / legs.head._1)
      println(f"[benchpipe] efficiency ${eff}%.3f")
    }
  }
}
