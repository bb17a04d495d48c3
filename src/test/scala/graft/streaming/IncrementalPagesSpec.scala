package graft.streaming

import graft.SparkSpec
import graft.kg.Fixtures
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental ingest: AvailableNow drains new batches only; restart
  * resumes from the stream checkpoint without reprocessing. */
class IncrementalPagesSpec extends SparkSpec {
  import spark.implicits._

  test("incremental extract+detect is exactly-once across restarts") {
    val root = Files.createTempDirectory("graft-stream").toString
    val pagesDir = s"$root/pages"; val outDir = s"$root/mentions"
    val ckpt = s"$root/ckpt"

    // batch 1: pages 0..99
    Fixtures.pages(spark, 100, 300).write.mode("append").parquet(pagesDir)
    IncrementalPages.run(spark, pagesDir, outDir, ckpt).awaitTermination()
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 > 0)

    // batch 2: 100 more pages appended; resumed stream processes ONLY them
    Fixtures.pages(spark, 100, 300, seed = 43L).write.mode("append").parquet(pagesDir)
    IncrementalPages.run(spark, pagesDir, outDir, ckpt).awaitTermination()
    val n2 = spark.read.parquet(outDir).count()
    assert(n2 > n1)

    // third run with nothing new: no duplicates appended (exactly-once)
    IncrementalPages.run(spark, pagesDir, outDir, ckpt).awaitTermination()
    assert(spark.read.parquet(outDir).count() == n2)

    // equivalence with the batch path on the same input
    val batch = graft.kg.DetectMentions.mentions(
      spark.read.parquet(pagesDir)
        .withColumn("extracted_text", graft.kg.ExtractText.extract(col("html"))),
      "extracted_text")
    assert(batch.count() == n2)
  }

  test("watermarked tumbling-window mention rate") {
    val root = Files.createTempDirectory("graft-stream2").toString
    Fixtures.pages(spark, 200, 300).write.parquet(s"$root/pages")
    IncrementalPages.mentionRate(spark, s"$root/pages", s"$root/rate", s"$root/ckpt")
      .awaitTermination()
    val out = spark.read.parquet(s"$root/rate")
    assert(out.count() > 0)
    assert(out.columns.toSet == Set("win_start", "lang", "mentions", "pages"))
    // window starts align to 10-minute boundaries
    val misaligned = out.filter(minute(col("win_start")) % 10 =!= 0).count()
    assert(misaligned == 0)
  }
}
