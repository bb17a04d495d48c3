package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: materialize a bench corpus (pages + dump parquet) at a path,
  * so pinned BenchLeg JVMs can be driven directly for stage-level
  * profiling. args: pages root. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(384000)
    val root = args.lift(1).getOrElse("/tmp/graft-corpus")
    val nEntities = math.min(32000, math.max(400, nPages / 6))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.kg.Fixtures.pages(spark, nPages, nEntities)
      .write.mode("overwrite").parquet(s"$root/pages")
    graft.kg.Fixtures.dumpLines(spark, nEntities)
      .write.mode("overwrite").parquet(s"$root/dump")
    println(s"[gencorpus] $root pages=$nPages entities=$nEntities")
    spark.stop()
  }
}
