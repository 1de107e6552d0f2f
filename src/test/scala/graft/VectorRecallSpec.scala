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
        "(20-bit hyperplane signatures, 5 bands x 4 bits — geometryFor(500))")
  }

  test("LSH geometry is parametric and wider bands cut bucket saturation") {
    import graft.operators.VectorOps
    // the pinned entry IS the parametric operator at (16, 4) — one code
    // path, so the oracle-checked geometry and the production-tunable
    // one can never drift
    val entryPairs = q("v04_ann_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (gp, gb) = VectorOps.geometryFor(500)
    val paramPairs = VectorOps.annPairs(spark, dir, nPlanes = gp, bandBits = gb, threshold = 0.35)
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

  test("geometryFor: oracle anchor at gate scale, log-N bits, banded-cap law") {
    import graft.operators.VectorOps.geometryFor
    // the correctness gate's scale IS the oracle geometry — adaptive
    // and DuckDB-checked entries are one code path at sf0.01
    assert(geometryFor(500) == (20, 4))
    assert(geometryFor(50) == (20, 4)) // floor: tiny corpora keep the demo geometry
    // bits grow with log2(N / targetOccupancy): occupancy — and the
    // quadratic within-bucket term — stays flat as the corpus grows
    assert(geometryFor(2000)._2 == 6)
    assert(geometryFor(20000)._2 == 10)
    assert(geometryFor(20000) == (230, 10))
    val bitsUp = Seq(500L, 2000L, 20000L, 200000L, 2000000L).map(geometryFor(_)._2)
    assert(bitsUp == bitsUp.sorted, s"bits must be monotone in N: $bitsUp")
    // band count holds model recall at the design similarity (~N^0.5
    // growth — the classical LSH exponent) until the cap
    assert(geometryFor(200000)._1 / geometryFor(200000)._2 > 23)
    assert(geometryFor(1L << 40)._1 / geometryFor(1L << 40)._2 == 32,
      "band count must cap (documented recall decay past the cap)")
  }

  test("v04 adaptive geometry at 10x scale: planted near-dup recall, flat occupancy") {
    import org.apache.spark.sql.functions.{broadcast, expr, max => smax}
    import graft.operators.VectorOps
    val sqlc = spark
    import sqlc.implicits._
    // ---- build a 20k corpus: sf0.1 embeddings x10 (ScaleUp's rotation
    // rule — cross-replica cosine structure scrambled, so candidate
    // rates scale like a genuinely bigger corpus), plus PLANTED
    // near-dup pairs at exact cosines (the data has no natural pairs
    // above 0.5 at this scale to measure recall on)
    val base = Tables(spark, sf("sf0.1"), "embeddings").select("vec_id", "embedding")
    val span = base.agg(smax(col("vec_id"))).head().getLong(0) + 1
    val reps = spark.range(0, 10).select(col("id").cast("int").as("__r"))
    val scaled = base.crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("__r") * span)
      .withColumn("embedding", expr(
        """transform(sequence(0, size(embedding) - 1),
             i -> element_at(embedding, ((i + __r) % size(embedding)) + 1))"""))
      .drop("__r")
    // planted pair i: (seed vec i, 10_000_000 + i) at cosine c exactly
    // (c*v_hat + sqrt(1-c^2)*w_hat, w_hat deterministic and orthonormal
    // to v) — 40 pairs at 0.85 (clear near-dups), 40 at 0.65 (the
    // design-similarity margin)
    def plant(seed: Array[Float], c: Double, salt: Int): Array[Float] = {
      val v = seed.map(_.toDouble)
      val vh = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
      val w0 = Array.tabulate(v.length) { i =>
        val h = ((salt * 64 + i).toLong * 2654435761L + 1013904223L) & 0xffffffffL
        h.toDouble / 4294967296.0 * 2 - 1
      }
      val proj = vh.zip(w0).map { case (a, b) => a * b }.sum
      val wh = {
        val w = w0.zip(vh).map { case (b, a) => b - proj * a }
        val n = math.sqrt(w.map(x => x * x).sum); w.map(_ / n)
      }
      val s = math.sqrt(1 - c * c)
      vh.zip(wh).map { case (a, b) => (c * a + s * b).toFloat }
    }
    val seeds = base.filter(col("vec_id") < 80).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val plantedRows = seeds.map { case (id, v) =>
      val c = if (id < 40) 0.85 else 0.65
      (10000000L + id, plant(v, c, salt = id.toInt))
    }
    val dir = java.nio.file.Files.createTempDirectory("v04scale").toString
    scaled.unionByName(plantedRows.toSeq.toDF("vec_id", "embedding"))
      .write.parquet(s"$dir/embeddings.parquet")

    val n = Tables(spark, dir, "embeddings").count()
    val (np, bb) = VectorOps.geometryFor(n)
    assert(bb == 10, s"20k corpus must widen bands to 10 bits, got ($np, $bb)")
    // ---- the REAL entry (adaptive) against the planted ground truth
    val pairs = SparkEntry.queries("v04_ann_lsh")(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(ids: Range): Double =
      ids.count(i => pairs.contains((i.toLong, 10000000L + i))).toDouble / ids.size
    val rHigh = recallOf(0 until 40)
    val rMargin = recallOf(40 until 80)
    info(f"planted recall: cos=0.85 -> $rHigh%.2f, cos=0.65 -> $rMargin%.2f (geometry ($np, $bb))")
    // collision model predicts 0.97 at 0.85 and 0.61 at 0.65 for
    // (230, 10); floors leave room for float32 seed noise
    assert(rHigh >= 0.80, f"near-dup (0.85) recall $rHigh%.2f below 0.80")
    assert(rMargin >= 0.35, f"design-margin (0.65) recall $rMargin%.2f below 0.35")
    // ---- the scale property itself: adaptive bits hold per-bucket
    // occupancy flat where the gate geometry saturates linearly
    def maxOcc(p: Int, b: Int): Long =
      VectorOps.bandOccupancy(spark, dir, p, b).agg(smax(col("count"))).head().getLong(0)
    val occAdaptive = maxOcc(np, bb)
    val occPinned = maxOcc(16, 4)
    info(s"max band-bucket occupancy at 20k rows: adaptive=$occAdaptive, (16,4)=$occPinned")
    assert(occAdaptive < occPinned / 4,
      s"adaptive geometry must cut bucket saturation: $occAdaptive vs $occPinned")
    assert(occAdaptive <= 256, s"occupancy should stay near targetOccupancy: $occAdaptive")
  }

  test("int8 pre-score bound is certified: holds for EVERY pair at the gate corpus") {
    // The v04 candidate prefilter drops a pair only when a quantized
    // upper bound on its cosine is below the threshold. Soundness is a
    // THEOREM (|e_i| <= s/2 for round-half-up codes), not a tuning —
    // this test re-derives the bound driver-side with an independent
    // implementation and checks it against the exact cosine for all
    // ~125k pairs of the gate corpus: no exact pair can ever be lost.
    val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    case class Q(q: Array[Int], s: Double, l1: Long, n: Double)
    def quant(v: Array[Double]): Q = {
      val s = math.max(v.map(math.abs).max, 1e-30) / 127.0
      val q = v.map(x => math.floor(x / s + 0.5).toInt)
      Q(q, s, q.map(x => math.abs(x).toLong).sum, math.sqrt(v.map(x => x * x).sum))
    }
    val qs = vecs.map(quant)
    var worstGap = Double.MaxValue // min over pairs of (bound - cos)
    var checked = 0
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val (a, b) = (qs(i), qs(j))
      var qdot = 0L; var dot = 0.0; var k = 0
      while (k < a.q.length) {
        qdot += a.q(k).toLong * b.q(k); dot += vecs(i)(k) * vecs(j)(k); k += 1
      }
      val cos = dot / (a.n * b.n)
      val bound = a.s * b.s * (qdot + a.l1 / 2.0 + b.l1 / 2.0 + a.q.length / 4.0) /
        (a.n * b.n)
      assert(bound + 1e-9 >= cos,
        f"bound violated for pair ($i, $j): bound=$bound%.9f cos=$cos%.9f")
      worstGap = math.min(worstGap, bound - cos)
      checked += 1
    }
    info(f"checked $checked pairs; tightest bound-cos gap = $worstGap%.6f")
    // and the margin is TIGHT enough to be useful as a filter: the
    // typical slack is a few hundredths of cosine (else the prefilter
    // would pass everything and the byte cut would be fiction)
    val sampleSlack = (0 until 200).map { i =>
      val (a, b) = (qs(i % qs.length), qs((i * 7 + 1) % qs.length))
      a.s * b.s * (a.l1 / 2.0 + b.l1 / 2.0 + a.q.length / 4.0) / (a.n * b.n)
    }
    val meanSlack = sampleSlack.sum / sampleSlack.size
    info(f"mean certified slack = $meanSlack%.4f")
    assert(meanSlack < 0.05, f"certified slack $meanSlack%.4f too wide to filter anything")
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

    // v07 — TRAINED spherical-kmeans cells (fixed k=10 broadcast side)
    // with int8-quantized scoring and 4 balanced probes. Cells differ
    // from v05's skew-sampled ones, so this is an absolute floor, not a
    // same-cell parity: 4-probe candidate coverage measures 0.60 here
    // and 8-bit symmetric codes perturb cosines far less than the
    // ranking gaps, so at most one neighbor may flip.
    val ivfQ = q("v07_ann_ivf_q").select("id_q", "id_c").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val hitsQ = exactTop3.map { case (idQ, ex) =>
      (ex intersect ivfQ.getOrElse(idQ, Set.empty)).size
    }.sum
    val recallQ = hitsQ.toDouble / (exactTop3.size * 3)
    info(f"v07 recall@3 = $recallQ%.3f ($hitsQ/${exactTop3.size * 3})")
    assert(hitsQ >= 8,
      s"v07 trained-cell quantized recall@3 fell below 8/15: $hitsQ")
  }

  test("v08 semantic dedup: sound vs exact pairs, greedy-min dominator, cluster recall") {
    // exact ground truth: v01's brute-force pairs at the same 0.35
    // threshold, keyed by the higher id (the one v08 may drop)
    val exact = q("v01_cosine_pairs").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val partners = exact.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).toSet }
    val out = q("v08_semantic_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty, "v08 dropped nothing at sf0.01 — test data changed?")
    assert(out.map(_._1).distinct.length == out.length, "one verdict row per dropped vector")
    out.foreach { case (b, _, dom, nDom, maxCos) =>
      // greedy keep-lowest-id: the dominator always precedes the dropped
      assert(dom < b, s"dominator $dom does not precede dropped $b")
      // SOUND: every claimed domination is a true >=0.35 cosine pair
      // (cell-scoping can only REMOVE candidates, never invent one)
      assert(partners.getOrElse(b, Set.empty).contains(dom),
        s"v08 claims $dom dominates $b but the exact pair set disagrees")
      assert(nDom >= 1 && nDom <= partners(b).size,
        s"$b: n_dom $nDom outside [1, ${partners(b).size}]")
      assert(maxCos >= 0.35 && maxCos <= 1.0, s"$b: max_cos $maxCos out of range")
    }
    // cluster recall: fraction of exact pairs landing in one cell. k=10
    // cells at 500 vecs — random assignment would capture ~1/k = 0.10;
    // trained cells measure 0.417 (113/271): the clustering genuinely
    // concentrates semantic neighbors. Floor safely under the measured
    // fixed value (deterministic index + corpus).
    val captured = out.map(_._4).sum
    val recall = captured.toDouble / exact.length
    info(f"v08 cluster pair recall = $recall%.3f ($captured/${exact.length})")
    assert(recall >= 0.35, f"v08 cluster recall $recall%.3f below floor 0.35")
  }

  test("v08 cell-count law: gate anchor, monotone, N^1.5 candidate work") {
    import graft.operators.VectorOps.dedupCellsFor
    // the gate corpus must land on EXACTLY the k=10 index v05/v07
    // share — that anchors the oracle numbers
    assert(dedupCellsFor(500) == 10)
    // monotone in N, never below the floor
    val ns = Seq(1L, 500L, 5000L, 50000L, 500000L, 5000000L, 5L * 1000 * 1000 * 1000)
    val ks = ns.map(dedupCellsFor)
    assert(ks == ks.sorted && ks.forall(_ >= 10), s"law not monotone: $ks")
    // total candidate work N^2/2k must stay within the N^1.5 family:
    // 100x the corpus => <= ~1000x the pairs (plus law rounding slack),
    // never the 10000x a fixed k would give
    for (Seq(a, b) <- ns.filter(_ >= 500).sliding(2).map(_.toSeq).toSeq if b == a * 10) {
      val growth = (b.toDouble * b / dedupCellsFor(b)) / (a.toDouble * a / dedupCellsFor(a))
      assert(growth <= 35.0, s"pair-work growth $growth for 10x at N=$a exceeds the N^1.5 law")
    }
  }

  test("t26 semantic decontamination: banded regime is a sound subset of exact, recall floor") {
    import graft.operators.VectorOps
    import graft.Tables
    val all = Tables(spark, dir, "embeddings")
    val train = all.filter(col("vec_id") % 20 =!= 0)
    val ev = all.filter(col("vec_id") % 20 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val exact = rows(VectorOps.semanticDecontaminate(train, ev, 0.35))
    val banded = rows(VectorOps.semanticDecontaminateBanded(train, ev, 0.35))
    assert(exact.nonEmpty, "exact regime flagged nothing — test data changed?")
    // soundness: verification is exact, so every banded flag is an
    // exact flag, its hit count never exceeds exact's, its max cosine
    // never exceeds exact's, and its first_hit is one of exact's hits
    // (so never SMALLER than exact's smallest)
    assert(banded.keySet.subsetOf(exact.keySet),
      s"banded flagged non-contaminated ids: ${(banded.keySet -- exact.keySet).take(5)}")
    banded.foreach { case (id, (n, fh, mc)) =>
      val (en, efh, emc) = exact(id)
      assert(n <= en && fh >= efh && mc <= emc, s"id $id: banded ($n,$fh,$mc) vs exact ($en,$efh,$emc)")
    }
    // recall, planted-leakage regime: real semantic contamination is
    // HIGH-cosine (a paraphrase embeds near-identically) — plant eval
    // copies of every 7th train vector and flag at 0.9. An identical
    // vector shares EVERY band with its source, so the banded regime
    // must recover ALL planted sources — deterministic recall 1.0 on
    // the leakage it is built to catch
    val plantedSrc = train.filter(col("vec_id") % 7 === 1)
    val planted = plantedSrc.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"))
    val srcIds = plantedSrc.select("vec_id").collect().map(_.getLong(0)).toSet
    val bandedHi = rows(VectorOps.semanticDecontaminateBanded(train, planted, 0.9))
    val exactHi = rows(VectorOps.semanticDecontaminate(train, planted, 0.9))
    assert(srcIds.subsetOf(bandedHi.keySet),
      s"banded missed planted identical leaks: ${(srcIds -- bandedHi.keySet).take(5)}")
    assert(bandedHi.keySet.subsetOf(exactHi.keySet))
    // AUTO geometry from the threshold (r11): the collision law must
    // reproduce the measured anchors — wide bands for contamination-
    // grade thresholds, narrow bands for low ones
    assert(VectorOps.bandGeometryFor(0.8) == ((64, 8)),
      VectorOps.bandGeometryFor(0.8))
    assert(VectorOps.bandGeometryFor(0.35) == ((32, 4)),
      VectorOps.bandGeometryFor(0.35))
    // the geometry lever at LOW thresholds: cos 0.35 pairs agree per
    // plane with p ~ 0.61, so 8-bit bands collide at p^8 ~ 2% — the
    // auto default (`banded` above, 32x4 at 0.35) must hold the
    // narrow-band recall floor the hand-tuned 20x4 measured (0.58),
    // and an explicitly WIDE geometry shows why the law picks narrow
    val bandedWide = rows(VectorOps.semanticDecontaminateBanded(train, ev, 0.35,
      nPlanes = 64, bandBits = 8))
    assert(bandedWide.keySet.subsetOf(exact.keySet))
    val rAuto = banded.size.toDouble / exact.size
    val rWide = bandedWide.size.toDouble / exact.size
    info(f"banded decontam recall at 0.35: auto(32x4)=$rAuto%.3f, 64x8=$rWide%.3f")
    assert(rAuto > rWide && rAuto >= 0.55,
      f"auto-geometry recall $rAuto%.3f should beat wide $rWide%.3f and clear 0.55")
    // ...and at the HIGH-threshold regime the auto pick keeps the
    // planted-leakage guarantee asserted above (bandedHi ran on auto
    // geometry: identical vectors collide in every band, recall 1.0)
    // the exact regime refuses an outsized eval suite BY NAME
    val e = intercept[IllegalArgumentException] {
      VectorOps.semanticDecontaminate(train, all.crossJoin(
        spark.range(201).toDF("rep")).select(col("vec_id"), col("embedding")), 0.35)
    }
    assert(e.getMessage.contains("semanticDecontaminateBanded"), e.getMessage)
  }
}
