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
}
