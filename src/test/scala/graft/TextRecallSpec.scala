package graft

import org.apache.spark.sql.functions._

/** Text near-dup QUALITY envelope — the t02 analog of VectorRecallSpec:
  * the oracle rows prove Spark == DuckDB on the same banded algorithm;
  * this measures the ALGORITHM against exact all-pairs Jaccard at
  * sf0.01 (500 docs — 125k pairs, trivially brute-forceable in a spec,
  * never in production). Both sides use the IDENTICAL shingle /
  * fingerprint / jaccard spelling (TextOps.shingleSql + xxhash64 +
  * sorted_intersect_size), so the only difference under test is the
  * banded candidate generation. Deterministic — the bounds are fixed
  * properties of (algorithm, dataset), not flaky estimates.
  */
class TextRecallSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("t02 minhash-LSH: exact-verified (no false positives), recall floor vs brute force") {
    graft.functions.GraftFunctions.register(spark)
    // the same signature pipeline t02 runs (shingleSql is the shared
    // single spelling), minus the LSH: every doc's sorted fingerprints
    val sigs = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .selectExpr("doc_id", s"${graft.operators.TextOps.shingleSql} AS sh")
      .selectExpr("doc_id", "size(sh) AS n",
        "sort_array(array_distinct(transform(sh, t -> xxhash64(t)))) AS hs")
      .filter(col("n") > 0)
    val brute = sigs.select(col("doc_id").as("doc_a"), col("n").as("na"), col("hs").as("ha"))
      .crossJoin(sigs.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("hs").as("hb")))
      .filter(col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b", "na", "nb", "sorted_intersect_size(ha, hb) AS ni")
      .select(col("doc_a"), col("doc_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = SparkEntry.queries("t02_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // precision is 1.0 BY CONSTRUCTION (every candidate re-verifies
    // with the exact jaccard) — assert it anyway
    assert(lsh.subsetOf(brute),
      s"false positives from the banded path: ${(lsh -- brute).take(5)}")
    assert(brute.nonEmpty, "brute force found no dup pairs — test data changed?")
    val recall = lsh.size.toDouble / brute.size
    info(f"t02 pair recall = $recall%.3f (${lsh.size}/${brute.size})")
    // 4 bands x 4 correlated rotations of disjoint 32-bit md5 lanes:
    // at jaccard >= 0.8 a band collision is near-certain; the floor is
    // deliberately conservative against corpus drift
    assert(recall >= 0.9,
      f"t02 recall $recall%.3f below the documented floor 0.9")
  }

  test("t04 char-5-gram banding: exact-verified, recall floor vs brute force") {
    graft.functions.GraftFunctions.register(spark)
    // brute force = the r5 exact all-pairs-within-source definition t04
    // used before banding replaced the quadratic (source, length-bucket)
    // join — the ground truth the banded candidates are measured against
    val sets = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "source",
        """array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)),
             i -> substring(text, i, 5))) AS gs""")
      .selectExpr("doc_id", "source", "size(gs) AS n",
        "sort_array(transform(gs, g -> xxhash64(g))) AS hs")
    val brute = sets.select(col("source"), col("doc_id").as("doc_a"), col("n").as("na"), col("hs").as("ha"))
      .join(sets.select(col("source"), col("doc_id").as("doc_b"), col("n").as("nb"), col("hs").as("hb")), "source")
      .filter(col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b", "na", "nb", "sorted_intersect_size(ha, hb) AS ni")
      .select(col("doc_a"), col("doc_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val banded = SparkEntry.queries("t04_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(banded.subsetOf(brute),
      s"false positives from the banded path: ${(banded -- brute).take(5)}")
    assert(brute.nonEmpty, "brute force found no 5-gram dup pairs — test data changed?")
    val recall = banded.size.toDouble / brute.size
    info(f"t04 pair recall = $recall%.3f (${banded.size}/${brute.size})")
    // At jaccard >= 0.6, one-band collision odds per 4-rotation band are
    // lower than t02's 0.8-threshold case, but the corpus's true dup
    // pairs are near-identical (jaccard ~0.9+) where collision is
    // near-certain; floor kept conservative against corpus drift.
    assert(recall >= 0.8,
      f"t04 recall $recall%.3f below the documented floor 0.8")
  }

  test("t21 simhash pairs: OUTPUT is band-geometry-invariant (B=4/5/6/7 identical)") {
    // The adaptive geometry (simhashBlocksFor) is pure cost tuning:
    // pigeonhole completeness says any pair within hamming 3 agrees on
    // B-3 of B blocks for EVERY B, and the exact bit_count verify
    // rejects everything else — so all geometries must emit exactly
    // the same pair set. This is what lets the corpus size pick the
    // geometry without touching the DuckDB oracle. B=7 exercises the
    // generalized ladder (computed widths, adaptive key spacing).
    val byB = Seq(4, 5, 6, 7).map { b =>
      b -> graft.operators.TextOps.simhashPairs(spark, dir, Some(b))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }.toMap
    assert(byB(4).nonEmpty, "no simhash near-dup pairs at sf0.01 — test data changed?")
    info(s"t21 pairs at sf0.01: ${byB(4).size}")
    for (b <- Seq(5, 6, 7)) assert(byB(b) == byB(4),
      s"B=$b diverges: only-in-4=${(byB(4) -- byB(b)).take(3)} only-in-$b=${(byB(b) -- byB(4)).take(3)}")
  }

  test("simhash band ladder: tier bounds and key-packing invariants hold for B=4..12") {
    import graft.operators.TextOps.{simhashBlocksFor, simhashWidths}
    for (b <- 4 to 12) {
      val ws = simhashWidths(b)
      assert(ws.sum == 64 && ws.length == b, s"B=$b widths $ws")
      assert(ws.max - ws.min <= 1, s"B=$b widths not balanced: $ws")
      // the banded join key packs B-3 included blocks widths.max apart
      // — must stay within a positive signed long
      assert((b - 3 - 1) * ws.max + ws.max <= 63, s"B=$b key overflows a long")
    }
    // the measured tier boundaries from rounds 6-7 are unchanged
    assert(simhashBlocksFor(30000) == 4)
    assert(simhashBlocksFor(40000) == 5)
    assert(simhashBlocksFor(6000000) == 5)
    assert(simhashBlocksFor(8000000) == 6)
    // the ladder now extends past B=6 (ADVICE r7 #3): ~214M docs was
    // the old ceiling; the bound law picks 7 just past it
    assert(simhashBlocksFor(300000000L) == 7)
    assert(simhashBlocksFor(4000000000L) == 8)
    // monotone: more docs never picks a narrower geometry
    val ns = Seq(1L, 1000L, 1e5.toLong, 1e7.toLong, 1e9.toLong, 1e11.toLong, 1e13.toLong)
    val tiers = ns.map(simhashBlocksFor)
    assert(tiers == tiers.sorted, s"non-monotone tiers: $tiers")
    assert(tiers.last == 12, "cap tier reachable")
  }

  test("t23 boilerplate: per-doc coverage invariants at the gate corpus") {
    val out = SparkEntry.queries("t23_boilerplate")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(out.size == 500, "one row per document")
    // invariants: coverage within [0, n_tokens]; kept is the complement;
    // a doc shorter than the 8-token window can never be covered
    out.foreach { case (id, (nt, ndup, ncov, kept, frac)) =>
      assert(ncov >= 0 && ncov <= nt, s"doc $id coverage $ncov outside [0, $nt]")
      assert(kept == nt - ncov, s"doc $id kept $kept != $nt - $ncov")
      if (nt < 8) assert(ncov == 0 && ndup == 0, s"doc $id shorter than the window but covered")
      if (ndup == 0) assert(ncov == 0, s"doc $id covered without a dup-gram hit")
      if (ncov > 0) assert(ndup > 0 && frac > 0.0)
    }
    // the corpus has NO byte-identical doc twins (t01 n_dups = 0), yet
    // overlapping shared windows still fully cover some docs
    assert(out.values.exists(_._5 == 1.0), "expected fully-covered docs at sf0.01")
    // a doc whose every 8-gram is unique corpus-wide keeps every token
    assert(out.values.exists { case (nt, ndup, _, _, _) => nt >= 8 && ndup == 0 },
      "expected some fully-unique docs at sf0.01")
    info(s"t23: ${out.values.count(_._3 > 0)} of 500 docs carry boilerplate")
  }

  test("t23 boilerplate: hand-computed planted fixture (twin, partial overlap, short, NULL)") {
    // planted corpus, every expected row derived by hand:
    //   0/1 identical 12-token twins        -> every window dup, frac 1.0
    //   2   12 unique tokens                -> zero coverage
    //   3   shares ONE 8-gram with 0 (c..j at start 3) -> 8 covered, 4 kept
    //   4   7 tokens (shorter than window)  -> zero grams, zero coverage
    //   5   NULL text                       -> 0 tokens, frac 0.0
    val tmp = java.nio.file.Files.createTempDirectory("t23corpus").toString
    import spark.implicits._
    Seq(
      (0L, "a b c d e f g h i j k l"),
      (1L, "a b c d e f g h i j k l"),
      (2L, "m n o p q r s t u v w x"),
      (3L, "z1 z2 c d e f g h i j z3 z4"),
      (4L, "p1 p2 p3 p4 p5 p6 p7"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("t23_boilerplate")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val expected = Map(
      0L -> (12L, 5L, 12L, 0L, 1.0),
      1L -> (12L, 5L, 12L, 0L, 1.0),
      2L -> (12L, 0L, 0L, 12L, 0.0),
      3L -> (12L, 1L, 8L, 4L, 0.666667),
      4L -> (7L, 0L, 0L, 7L, 0.0),
      5L -> (0L, 0L, 0L, 0L, 0.0))
    assert(got == expected, s"planted fixture mismatch: $got")

    // t29 strips the SAME corpus: the twins vanish, the unique doc
    // survives whole, doc 3 keeps exactly its 4 non-window tokens in
    // order, short/NULL docs pass through untouched (r11)
    val stripped = SparkEntry.queries("t29_boilerplate_strip")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val expectedStrip = Map(
      0L -> (12L, 0L, ""),
      1L -> (12L, 0L, ""),
      2L -> (12L, 12L, "m n o p q r s t u v w x"),
      3L -> (12L, 4L, "z1 z2 z3 z4"),
      4L -> (7L, 7L, "p1 p2 p3 p4 p5 p6 p7"),
      5L -> (0L, 0L, ""))
    assert(stripped == expectedStrip, s"planted strip mismatch: $stripped")
  }
}
