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
