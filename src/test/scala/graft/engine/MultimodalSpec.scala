package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private lazy val media = Multimodal.generate(spark, 300).cache()

  test("media table schema and determinism") {
    val row = media.filter(_.media_id == 42L).collect().head
    val row2 = Multimodal.generate(spark, 300).filter(_.media_id == 42L).collect().head
    assert(java.util.Arrays.equals(row.payload, row2.payload))
    assert(row.kind == "image" || row.kind == "audio" || row.kind == "video")
    val schema = media.toDF().schema.fieldNames.toSet
    assert(schema == Set("media_id", "kind", "payload", "meta"))
  }

  test("feature extraction: fixed width, deterministic, batch-processed") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 300)
    assert(feats.forall(_.feature.length == 16))
    val f42a = feats.find(_.media_id == 42L).get.feature.toSeq
    val f42b = Multimodal.extractFeatures(media, dim = 16)
      .filter(_.media_id == 42L).collect().head.feature.toSeq
    assert(f42a == f42b)
    // byte count survives as metadata
    val m42 = media.filter(_.media_id == 42L).collect().head
    assert(feats.find(_.media_id == 42L).get.n_bytes == m42.payload.length)
  }

  test("frame sampling explodes only videos at the stride") {
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty)
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(_.payload.length <= 64))
  }

  test("resize rescales image metadata, passes payload through") {
    val resized = Multimodal.resizeMeta(media.toDF(), maxSide = 64)
    val r = resized.filter(col("kind") === "image").select("meta.width", "meta.height").collect()
    assert(r.forall(row => row.getInt(0) <= 64 && row.getInt(1) <= 64))
    val bytesBefore = media.toDF().agg(sum(length(col("payload")))).collect()(0).getLong(0)
    val bytesAfter = resized.agg(sum(length(col("payload")))).collect()(0).getLong(0)
    assert(bytesBefore == bytesAfter)
  }
}
