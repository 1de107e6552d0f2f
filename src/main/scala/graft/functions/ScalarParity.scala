package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for Trino scalar functions Spark lacks, invoked
  * through Catalyst `StaticInvoke` so they stay INSIDE whole-stage
  * codegen (the generated code calls these statics directly — no UDF
  * wrapper, no interpreted fallback). Semantics follow the Trino 468
  * function docs [pinned walden docker/devserver/Dockerfile:14]:
  *
  *  - `hamming_distance(a, b)` — code-point mismatches; ERRORS on
  *    unequal length like Trino (no silent padding)
  *  - `normalize(s[, form])` — Unicode normalization, default NFC
  *  - `codepoint(ch)` — code point of a one-character string
  *  - `from_base(s, radix)` / `to_base(x, radix)` — radix 2..36,
  *    to_base lowercase like Trino
  */
object GraftStringOps {

  def hammingDistance(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString; val sb = b.toString
    val na = sa.codePointCount(0, sa.length)
    val nb = sb.codePointCount(0, sb.length)
    if (na != nb) throw new IllegalArgumentException(
      s"hamming_distance requires equal-length strings, got $na vs $nb code points")
    var i = 0; var j = 0; var d = 0L
    while (i < sa.length) {
      val ca = sa.codePointAt(i); val cb = sb.codePointAt(j)
      if (ca != cb) d += 1
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    d
  }

  def normalize(s: UTF8String, form: UTF8String): UTF8String = {
    val f = form.toString.toUpperCase match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"normalize form must be NFC|NFD|NFKC|NFKD, got '$other'")
    }
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  }

  def codepoint(s: UTF8String): Int = {
    val str = s.toString
    if (str.isEmpty || str.codePointCount(0, str.length) != 1)
      throw new IllegalArgumentException(
        s"codepoint requires exactly one character, got ${s.numChars()}")
    str.codePointAt(0)
  }

  def fromBase(s: UTF8String, radix: Long): Long = {
    require(radix >= 2 && radix <= 36, s"from_base radix must be in [2, 36], got $radix")
    java.lang.Long.parseLong(s.toString.trim, radix.toInt)
  }

  def toBase(x: Long, radix: Long): UTF8String = {
    require(radix >= 2 && radix <= 36, s"to_base radix must be in [2, 36], got $radix")
    UTF8String.fromString(java.lang.Long.toString(x, radix.toInt))
  }

  // -------- batch 3 (round 13) --------
  // width_bucket and luhn_check have NO kernels here: Spark 4 ships
  // both natively (probed in a bare session), and shadowing a builtin
  // from the registry would silently change its contract semantics.

  /** Trino `to_big_endian_64` / `from_big_endian_64` — 8-byte two's-
    * complement big-endian encoding of a bigint (the portable sortable
    * byte form; from_ errors on any other length). */
  def toBigEndian64(x: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(out).putLong(x)
    out
  }

  def fromBigEndian64(b: Array[Byte]): Long = {
    require(b.length == 8, s"from_big_endian_64 requires exactly 8 bytes, got ${b.length}")
    java.nio.ByteBuffer.wrap(b).getLong
  }

  /** Trino `cosine_similarity(map(varchar, double), map(varchar,
    * double))` — SPARSE-vector cosine: word-count/tf-idf maps compared
    * without materializing a dense vocabulary vector. dot and norms
    * accumulate in doubles; integral counts stay exact, so the f29
    * oracle can re-derive the same value relationally. NULL map values
    * contribute nothing (excluded from dot AND norms); a zero-norm
    * side yields NaN (0/0, Trino's natural arithmetic). The dot builds
    * a hash over the SMALLER side — O(|a| + |b|), never the product. */
  def cosineSimilarityMap(a: org.apache.spark.sql.catalyst.util.MapData,
                          b: org.apache.spark.sql.catalyst.util.MapData): Double = {
    def norm2(m: org.apache.spark.sql.catalyst.util.MapData): Double = {
      val vs = m.valueArray()
      var s = 0.0
      var i = 0
      while (i < m.numElements()) {
        if (!vs.isNullAt(i)) { val x = vs.getDouble(i); s += x * x }
        i += 1
      }
      s
    }
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val idx = new java.util.HashMap[String, java.lang.Double](small.numElements() * 2)
    val sk = small.keyArray(); val sv = small.valueArray()
    var i = 0
    while (i < small.numElements()) {
      if (!sv.isNullAt(i)) idx.put(sk.getUTF8String(i).toString, sv.getDouble(i))
      i += 1
    }
    val bk = big.keyArray(); val bv = big.valueArray()
    var dot = 0.0
    i = 0
    while (i < big.numElements()) {
      if (!bv.isNullAt(i)) {
        val v = idx.get(bk.getUTF8String(i).toString)
        if (v != null) dot += v.doubleValue() * bv.getDouble(i)
      }
      i += 1
    }
    dot / math.sqrt(norm2(a) * norm2(b))
  }

  /** Trino `great_circle_distance(lat1, lon1, lat2, lon2)` — kilometers
    * on the sphere via the haversine formula with the mean earth radius
    * Presto/Trino's MathFunctions pin (6371.01 km). The f28 oracle
    * spells the identical formula, so the gate comparison is exact up
    * to the shared ROUND. */
  def greatCircleDistance(lat1: Double, lon1: Double,
                          lat2: Double, lon2: Double): Double = {
    require(lat1.abs <= 90 && lat2.abs <= 90 && lon1.abs <= 180 && lon2.abs <= 180,
      "great_circle_distance: latitude must be in [-90, 90], longitude in [-180, 180]")
    val rLat1 = math.toRadians(lat1)
    val rLat2 = math.toRadians(lat2)
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(rLat1) * math.cos(rLat2) * math.sin(dLon / 2) * math.sin(dLon / 2)
    2.0 * 6371.01 * math.asin(math.sqrt(a))
  }
}
