package graft

/** ANN QUALITY envelope (VERDICT r4 #4): the oracle rows prove
  * Spark == DuckDB on the same algorithm; these tests measure the
  * algorithm itself against exact search — the recall evidence a real
  * pipeline records before trusting an ANN index. Run at sf0.01 (the
  * correctness-gate scale). Both ANN paths are deterministic, so the
  * measured recall is a fixed property of (algorithm, dataset) and the
  * bounds below are tight-but-safe floors, not flaky estimates.
  */
class VectorRecallSpec extends SparkSpec {
  import org.apache.spark.sql.functions.{col, max}

  private val dir = sf("sf0.01")
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("v04 banded-LSH pairs: exact-verified (no false positives), recall floor vs v01") {
    val exact = q("v01_cosine_pairs").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = q("v04_ann_lsh").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is 1.0 BY CONSTRUCTION: every candidate is re-scored
    // with the exact cosine before the threshold — assert it anyway
    assert(ann.subsetOf(exact),
      s"false positives from the LSH path: ${(ann -- exact).take(5)}")
    assert(exact.nonEmpty, "baseline produced no pairs — test data changed?")
    val recall = ann.size.toDouble / exact.size
    info(f"v04 pair recall = $recall%.3f (${ann.size}/${exact.size})")
    assert(recall >= 0.55,
      f"v04 recall $recall%.3f below the documented floor 0.55 " +
        "(16-bit hyperplane signatures, 4 bands x 4 bits)")
  }

  test("LSH geometry is parametric and wider bands cut bucket saturation") {
    import graft.operators.VectorOps
    // the pinned entry IS the parametric operator at (16, 4) — one code
    // path, so the oracle-checked geometry and the production-tunable
    // one can never drift
    val entryPairs = q("v04_ann_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val paramPairs = VectorOps.annPairs(spark, dir, nPlanes = 16, bandBits = 4, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(paramPairs == entryPairs)
    // the 10x bench measured the 4-bit geometry saturating (BENCH_SF1:
    // 16 bucket values per band -> quadratic candidate growth). The
    // lever: more bits per band. 8-bit bands over 64 planes keep 8
    // bands (recall knob) while multiplying bucket values x16 — max
    // occupancy must drop, and with it the within-bucket pair count.
    def maxOcc(nPlanes: Int, bits: Int): Long =
      VectorOps.bandOccupancy(spark, dir, nPlanes, bits)
        .agg(max(col("count"))).head().getLong(0)
    val narrow = maxOcc(16, 4)
    val wide = maxOcc(64, 8)
    info(s"max band-bucket occupancy: 4-bit=$narrow, 8-bit=$wide")
    assert(wide < narrow / 2,
      s"8-bit bands should cut max occupancy well below 4-bit ($wide vs $narrow)")
    // exact verification holds at ANY geometry: no false positives
    val exact = q("v01_cosine_pairs").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val widePairs = VectorOps.annPairs(spark, dir, 64, 8, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(widePairs.subsetOf(exact), (widePairs -- exact).take(5))
  }

  test("v05 IVF top-k: recall@3 floor vs an independent exact computation") {
    // exact neighbors computed DRIVER-SIDE from the raw embeddings — an
    // implementation independent of every Spark expression under test
    val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exactTop3: Map[Long, Set[Long]] = (0L until 5L).map { idQ =>
      val vq = vecs(idQ)
      idQ -> vecs.iterator.filter(_._1 != idQ)
        .map { case (id, v) => (id, cos(vq, v)) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val ivf = q("v05_ann_ivf").select("id_q", "id_c").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val hits = exactTop3.map { case (idQ, ex) =>
      val got = ivf.getOrElse(idQ, Set.empty)
      val h = (ex intersect got).size
      info(s"v05 query $idQ: recall@3 = $h/3")
      h
    }.sum
    val recall = hits.toDouble / (exactTop3.size * 3)
    info(f"v05 recall@3 = $recall%.3f ($hits/${exactTop3.size * 3})")
    // 2-probe IVF with ~2% sampled centroids measures 0.60 here (0.40
    // single-probe — the probe count is the recall lever); neighbors
    // past the second-choice cell are missed by design
    assert(recall >= 0.50, f"v05 recall@3 $recall%.3f below the documented floor 0.50")

    // v07 (same cells, int8-quantized scoring) must not lose recall to
    // quantization: same candidate sets, and 8-bit symmetric codes
    // perturb cosines far less than the ranking gaps at this scale
    val ivfQ = q("v07_ann_ivf_q").select("id_q", "id_c").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val hitsQ = exactTop3.map { case (idQ, ex) =>
      (ex intersect ivfQ.getOrElse(idQ, Set.empty)).size
    }.sum
    val recallQ = hitsQ.toDouble / (exactTop3.size * 3)
    info(f"v07 recall@3 = $recallQ%.3f ($hitsQ/${exactTop3.size * 3})")
    // integer comparison: the float spelling (recallQ >= recall - 1/15)
    // fails the exactly-one-lost case on rounding at some hit counts
    assert(hitsQ >= hits - 1,
      s"quantized scoring lost more than one neighbor vs float IVF: $hitsQ vs $hits hits")
  }
}
