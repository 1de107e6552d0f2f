package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.multimodal.MultimodalOps

/** Multimodal plumbing: sniffing is real; decode is a deterministic
  * stub (no codec libs in this container) — assert schema, batch
  * shapes, determinism, and frame fan-out cardinality.
  */
class MultimodalSpec extends SparkSpec {

  private def blob(magic: Array[Int], n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    val rnd = new scala.util.Random(seed)
    rnd.nextBytes(b)
    magic.zipWithIndex.foreach { case (v, i) => b(i) = v.toByte }
    b
  }

  private lazy val media = {
    val png = blob(Array(0x89, 'P', 'N', 'G'), 256, 1)
    val jpg = blob(Array(0xff, 0xd8, 0xff), 300, 2)
    val wav = {
      val b = blob(Array('R', 'I', 'F', 'F'), 400, 3)
      Array('W', 'A', 'V', 'E').zipWithIndex.foreach { case (c, i) => b(8 + i) = c.toByte }
      b
    }
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, png), Row(2L, jpg), Row(3L, wav)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
  }

  test("withMeta sniffs formats and attaches typed struct") {
    val out = MultimodalOps.withMeta(media).repartition(3) // exercise multi-partition path
    assert(out.schema("meta").dataType == MultimodalOps.metaSchema)
    val fmts = out.select("id", "meta.format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fmts == Map(1L -> "png", 2L -> "jpeg", 3L -> "wav"))
  }

  test("extractFeatures is deterministic with exact dim") {
    val a = MultimodalOps.extractFeatures(media, dim = 64).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = MultimodalOps.extractFeatures(media, dim = 64).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet == Set(1L, 2L, 3L))
    a.foreach { case (k, v) => assert(v.length == 64 && v == b(k)) }
  }

  test("resizeImage emits exactly w*h values") {
    val px = MultimodalOps.resizeImage(media, 8, 6).select("pixels")
      .collect().map(_.getSeq[Float](0))
    assert(px.forall(_.length == 48))
  }

  test("real png decode: actual dimensions and real resized pixels") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val checker = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 5; y <- 0 until 3)
      checker.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val white = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) white.setRGB(x, y, 0xffffff)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, pngBytes(checker)), Row(2L, pngBytes(white))),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    // withMeta reports the REAL dimensions (stills: no duration/rate)
    val metas = MultimodalOps.withMeta(df)
      .select("id", "meta.format", "meta.width", "meta.height", "meta.duration_ms")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(metas(1L) == (("png", 5, 3, 0L)), metas)
    assert(metas(2L) == (("png", 4, 4, 0L)), metas)
    // resize goes through the real AWT path: a solid-white image
    // resizes to all-1.0 grayscale pixels, exactly w*h of them
    val px = MultimodalOps.resizeImage(df, 2, 2).select("id", "pixels")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(px(2L).length == 4 && px(2L).forall(_ == 1.0f), px(2L))
    assert(px(1L).length == 4 && px(1L).forall(v => v >= 0f && v <= 1f), px(1L))
  }

  test("sampleFrames fan-out matches duration/step") {
    val out = MultimodalOps.sampleFrames(media, everyMs = 5000)
    val counts = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durs = MultimodalOps.withMeta(media).select("id", "meta.duration_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) => assert(n == durs(id) / 5000 + 1) }
    assert(out.schema("frame_features").dataType == ArrayType(FloatType))
  }
}
