package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("assets: binary payload + typed metadata, deterministic modality") {
    val df = Multimodal.assets(spark, sfDir)
    assert(df.schema("payload").dataType === BinaryType)
    assert(df.schema("meta").dataType.typeName === "struct")
    val m = df.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(m === Set("image", "audio", "video"))
    // payload round-trips the source text bytes
    val r = df.filter(col("asset_id") === 0L)
      .select(col("payload"), col("meta.n_bytes")).collect()(0)
    assert(r.getAs[Array[Byte]](0).length === r.getLong(1))
  }

  test("feature extraction: fixed-size normalized histogram per asset") {
    val rows = Multimodal.features(spark, sfDir).limit(20).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](2)
      assert(f.length === 16)
      assert(math.abs(f.sum - 1.0) < 1e-6) // normalized histogram
    }
  }

  test("fakeDecode is deterministic and total") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.fakeDecode(b).toSeq === Multimodal.fakeDecode(b).toSeq)
    assert(Multimodal.fakeDecode(Array.empty[Byte]).toSeq === Seq.fill(16)(0.0))
    assert(Multimodal.fakeDecode(null).toSeq === Seq.fill(16)(0.0))
  }

  test("frame sampling: video assets only, n frames per asset") {
    val frames = Multimodal.frameSample(spark, sfDir, nFrames = 4)
    val perAsset = frames.groupBy("asset_id").count().collect()
    assert(perAsset.nonEmpty)
    assert(perAsset.forall(_.getLong(1) === 4L))
    assert(frames.filter(col("frame_len") <= 0).count() === 0)
  }

  test("resize: every payload hits the target byte budget") {
    val out = Multimodal.resize(spark, sfDir, targetBytes = 128)
    assert(out.filter(col("resized_len") =!= 128).count() === 0)
  }
}
