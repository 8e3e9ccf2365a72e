package graft

import graft.multimodal.{MediaAsset, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic features from payload bytes") {
    val asset = MediaAsset(7L, Array[Byte](0, 10, 20), "image/fake", 640, 480)
    val f = Multimodal.decodeStub(asset)
    assert(f.doc_id === 7L)
    assert(f.byte_len === 3L)
    assert(math.abs(f.mean_byte - 10.0) < 1e-12)
    assert(f.head_features === Seq(0.0f, 10 / 255.0f, 20 / 255.0f))
  }

  test("distributed batch decode preserves schema and row count") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.columns.toSeq ===
      Seq("doc_id", "media_type", "byte_len", "mean_byte", "head_features"))
    assert(feats.count() === 500)
    // byte_len of the fake payload equals n_chars (ascii text)
    val joined = feats.join(Tables.t(spark, sfDir, "documents"), "doc_id")
      .filter($"byte_len" =!= $"n_chars").count()
    assert(joined === 0)
  }

  test("chunk sampling yields ceil(len/(chunk*stride)) chunks of bounded size") {
    val media = Multimodal.mediaTable(spark, sfDir).limit(20)
    val chunks = Multimodal.sampleChunks(media, chunk = 32, stride = 4)
    val bad = chunks.filter(length($"chunk_bytes") > 32).count()
    assert(bad === 0)
    val counts = chunks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(Tables.t(spark, sfDir, "documents"), "doc_id")
      .select($"n", (($"n_chars" - 1) / 128).cast("int") + 1)
      .as[(Long, Int)].collect()
    counts.foreach { case (n, expected) => assert(n === expected.toLong) }
  }
}
