package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Multimodal binary-column plumbing (decode stub, features, frames). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val rows = (0 until 32).map { i =>
      val payload = Array.tabulate[Byte](512 + i * 97)(j => ((i * 31 + j) % 251).toByte)
      (s"m$i", if (i % 2 == 0) "image/png" else "video/mp4", payload,
        (640 + i, 480 + i, i * 1000))
    }
    rows.toDF("media_id", "mime", "payload", "meta")
      .withColumn("meta", col("meta").cast("struct<width:int,height:int,duration_ms:int>"))
      .cache()
  }

  test("media schema contract parses and matches the table") {
    val ddl = DataType.fromDDL(Multimodal.MediaSchemaDdl).asInstanceOf[StructType]
    assert(ddl.fieldNames.toSeq == Seq("media_id", "mime", "payload", "meta"))
  }

  test("decode stub is deterministic and bounded") {
    val out = Multimodal.process(media).cache()
    val d = out.select("media_id", "decoded.*").collect()
    assert(d.length == 32)
    d.foreach { r =>
      assert(r.getAs[Int]("decoded_width") >= 1 && r.getAs[Int]("decoded_width") <= 1920)
      assert(r.getAs[Int]("decoded_height") >= 1 && r.getAs[Int]("decoded_height") <= 1080)
    }
    // determinism: second run identical
    val d2 = Multimodal.process(media).select("media_id", "decoded.*").collect()
    assert(d.map(_.toString).sorted.sameElements(d2.map(_.toString).sorted))
  }

  test("feature vectors have the declared dim and range") {
    val f = Multimodal.process(media, dim = 16)
      .select(col("media_id"), col("features")).collect()
    f.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("features")
      assert(v.length == 16)
      v.foreach(x => assert(x >= -1.0f && x <= 1.0f))
    }
  }

  test("frame sampling yields fixed-size windows") {
    val frames = media.select(col("media_id"),
      explode(Multimodal.frameSample(col("payload"), frameBytes = 64, everyK = 2)).as("f"))
    val sizes = frames.select(length(col("f"))).distinct().as[Int].collect()
    assert(sizes.forall(_ <= 64) && sizes.exists(_ == 64))
  }

  test("resizeMeta preserves aspect ratio within the box") {
    val out = Multimodal.process(media).select("meta", "meta_resized").collect()
    out.foreach { r =>
      val rz = r.getStruct(1)
      assert(rz.getInt(0) <= 224 && rz.getInt(1) <= 224)
    }
    // no upscale: smaller-than-box input stays unchanged
    val tiny = Seq(("t", "image/png", Array[Byte](1, 2), (100, 50, 0))).toDF(
      "media_id", "mime", "payload", "meta")
      .withColumn("meta", col("meta").cast("struct<width:int,height:int,duration_ms:int>"))
    val rz = Multimodal.process(tiny).select("meta_resized.*").first()
    assert(rz.getInt(0) == 100 && rz.getInt(1) == 50)
  }

  test("media pipeline plan has no shuffle (single narrow stage)") {
    val plan = Multimodal.process(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
