package graft.media

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("decode pipeline: typed boundary, deterministic stub features") {
    val feats = MediaPipeline.decodeFeatures(
      MediaPipeline.mediaTable(spark, dir)).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.byte_len > 0)
      assert(f.width >= 16 && f.width < 16 + 1280)
      assert(f.height >= 16 && f.height < 16 + 720)
      assert(f.dominant >= 0 && f.dominant <= 255)
      assert(f.frames >= 1 && f.frames <= 4)
      assert(f.mime.startsWith("image/"))
    }
    // deterministic: a second run produces identical features
    val again = MediaPipeline.decodeFeatures(
      MediaPipeline.mediaTable(spark, dir)).collect()
    assert(feats.sortBy(_.media_id).toSeq === again.sortBy(_.media_id).toSeq)
  }

  test("decode runs partition-wise without collapsing parallelism") {
    val media = MediaPipeline.mediaTable(spark, dir).repartition(4)
    val decoded = MediaPipeline.decodeFeatures(media)
    assert(decoded.rdd.getNumPartitions === 4)
    assert(decoded.count() === 500)
  }

  test("frame sampling explodes 1->N with per-frame hashes") {
    val rows = MediaQueries.mediaFrames(spark, dir).collect()
    val byMedia = rows.groupBy(_.getLong(0))
    assert(byMedia.size === 500)
    byMedia.values.foreach { fs =>
      val n = fs.head.getInt(1)
      assert(fs.map(_.getInt(2)).sorted.toSeq === (1 to n))
      assert(fs.map(_.getString(3)).distinct.length === n)
    }
  }
}
