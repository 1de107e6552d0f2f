package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.VectorIndex
import graft.store.{GraftTable, StatsPruner}

/** Persisted IVF index: build (k-means + clustered assignment table),
  * probe-pruned search, self-hit sanity.
  */
class VectorIndexSpec extends SparkSpec {

  test("build + search: self is the nearest neighbor; probes prune files") {
    val root = Files.createTempDirectory("graft_ivf").toString
    val emb = Tables(spark, sf(), "embeddings")
    val idx = VectorIndex.build(spark, emb, root, nCentroids = 8)

    val q = emb.filter(col("vec_id") === 7L)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val hits = idx.search(q, k = 3, nprobe = 2).collect()
    assert(hits.nonEmpty && hits.head.getLong(0) == 7L, hits.mkString(";"))
    assert(math.abs(hits.head.getDouble(2) - 1.0) < 1e-9)

    // clustered layout: a single-cell predicate keeps a strict subset
    // of files (the "inverted list" is the stats pruning)
    val t = GraftTable.load(spark, s"$root/assignments")
    val files = t.history.last.added
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    val kept = StatsPruner.prune(files,
      Seq(EqualTo(UnresolvedAttribute("cent_id"), Literal(0L))), t.schema)
    assert(files.size > 1 && kept.size < files.size,
      s"expected pruning, got ${kept.size}/${files.size}")

    // reload from disk works (index is fully persisted state)
    val again = VectorIndex.load(spark, root).search(q, k = 1, nprobe = 2).collect()
    assert(again.head.getLong(0) == 7L)

    // QUANTIZED search (the production shape): same probed cells, int8
    // codes scored with exact integer dots — self-hit still first
    // (quantized self-cosine is exactly 1 up to the shared rounding),
    // and the top-k set stays within one neighbor of the float ranking
    val qf = idx.search(q, k = 5, nprobe = 2).collect().map(_.getLong(0)).toSet
    val qz = idx.searchQuantized(q, k = 5, nprobe = 2).collect()
    assert(qz.head.getLong(0) == 7L, qz.mkString(";"))
    assert(math.abs(qz.head.getDouble(2) - 1.0) < 1e-6, qz.head.toString)
    val overlap = (qf intersect qz.map(_.getLong(0)).toSet).size
    assert(overlap >= 4, s"quantized top-5 drifted from float top-5: $overlap/5")
  }

  test("PQ layer: searchPq serves off bucket-pruned 8-byte codes (round 13)") {
    val root = Files.createTempDirectory("graft_ivfpq").toString
    val emb = Tables(spark, sf(), "embeddings")
    // small codebook (16 codewords) — the fixture corpus is small; the
    // layout and pruning, not the codebook size, are under test
    val idx = VectorIndex.build(spark, emb, root, nCentroids = 8,
      pqSubspaces = Some(8), pqCodewords = 16, codeBuckets = 8)

    val q = emb.filter(col("vec_id") === 7L)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val hits = idx.searchPq(q, k = 5, nprobe = 3).collect()
    // self-hit: vector 7's own codes reconstruct its subvectors best,
    // so its ADC (squared L2 to its codewords) is the group minimum
    assert(hits.head.getLong(0) == 7L, hits.mkString(";"))
    assert(hits.map(_.getDouble(2)).toSeq == hits.map(_.getDouble(2)).toSeq.sorted)

    // coarse agreement with the float ranking over the same probed
    // cells: at 16 codewords on this tiny fixture the quantization is
    // deliberately blunt, AND PQ ranks by L2 ADC where search() ranks
    // by cosine — recall floors are PqSpec's job (trained geometry,
    // proper codebook size); here only layout + pruning are under test
    val fl = idx.search(q, k = 5, nprobe = 3).collect().map(_.getLong(0)).toSet
    val overlap = (fl intersect hits.map(_.getLong(0)).toSet).size
    assert(overlap >= 2, s"PQ top-5 unrelated to float top-5: $overlap/5")

    // the serving contract: the codes read is bucket-file-pruned by the
    // probes' cent_id IN conjunct (GraftTable.read's direct-load twin
    // of the catalog scan's static pruning)
    val codes = GraftTable.load(spark, s"$root/pq_codes")
    val all = codes.read().inputFiles.length
    val pruned = codes.read(filters = Seq(col("cent_id").isin(0L, 1L))).inputFiles.length
    assert(all > 2 && pruned < all, s"expected bucket pruning, got $pruned/$all files")
    // and a probe on an EMPTY bucket set reads nothing but stays correct
    assert(codes.read(filters = Seq(col("cent_id") === -1L)).count() == 0L)

    // reload from disk: the PQ layer is fully persisted state
    val again = VectorIndex.load(spark, root).searchPq(q, k = 1, nprobe = 3).collect()
    assert(again.head.getLong(0) == 7L)
    // a pre-PQ index rejects searchPq loudly, by feature name
    val noPq = Files.createTempDirectory("graft_ivf_nopq").toString
    VectorIndex.build(spark, emb, noPq, nCentroids = 8)
    val e = intercept[IllegalArgumentException](
      VectorIndex.load(spark, noPq).searchPq(q, k = 1))
    assert(e.getMessage.contains("pqSubspaces"), e.getMessage)
  }

  test("searchPq(refine): exact re-rank lifts recall@k to probe coverage; candidate-sized (r14)") {
    val root = Files.createTempDirectory("graft_ivfpq_rf").toString
    // sf0.1 (5000 vectors): big enough that blunt ADC visibly misranks
    // and the exact re-rank has something to recover
    val emb = Tables(spark, sf("sf0.1"), "embeddings")
    val idx = VectorIndex.build(spark, emb, root, nCentroids = 16,
      pqSubspaces = Some(8), pqCodewords = 16, codeBuckets = 8)

    // exact ground truth, driver-side and independent of every Spark
    // expression under test (the VectorRecallSpec v05 device)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val k = 10
    val queries = (0L until 8L).map(i => i -> vecs(i))
    var hitsPq = 0; var hitsRf = 0
    queries.foreach { case (idQ, vq) =>
      val exact = vecs.iterator.map { case (id, v) => (id, cos(vq, v)) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
      val qArr = vq.map(_.toFloat)
      val plain = idx.searchPq(qArr, k, nprobe = 12).collect().map(_.getLong(0)).toSet
      val refined = idx.searchPq(qArr, k, nprobe = 12, refine = 20 * k)
        .collect().map(_.getLong(0)).toSet
      hitsPq += (exact intersect plain).size
      hitsRf += (exact intersect refined).size
    }
    val total = queries.size * k
    info(f"recall@$k: plain ADC = ${hitsPq.toDouble / total}%.3f, " +
      f"refine=${20 * k} = ${hitsRf.toDouble / total}%.3f ($hitsRf/$total)")
    // the re-rank can only use what ADC surfaced, but with a 20k pool
    // it must (a) never lose to plain ADC and (b) approach the probe-
    // coverage ceiling (measured 0.838 vs plain ADC 0.263):
    // deterministic build + corpus, floor with slack
    assert(hitsRf >= hitsPq, s"refine lost recall: $hitsRf < $hitsPq")
    assert(hitsRf.toDouble / total >= 0.70,
      f"refined recall ${hitsRf.toDouble / total}%.3f below floor 0.70")

    // output contract: exact cosine, descending
    val q0 = vecs(0L).map(_.toFloat)
    val rf = idx.searchPq(q0, k, nprobe = 8, refine = 10 * k).collect()
    assert(rf.head.getLong(0) == 0L && math.abs(rf.head.getDouble(2) - 1.0) < 1e-9,
      s"self-hit must lead the refined ranking: ${rf.take(3).mkString(";")}")
    assert(rf.map(_.getDouble(2)).toSeq == rf.map(_.getDouble(2)).toSeq.sortBy(-_))
    // refined hits come FROM the ADC candidate pool (it is a re-rank,
    // not a second search)
    val pool = idx.searchPq(q0, 10 * k, nprobe = 8).collect().map(_.getLong(0)).toSet
    assert(rf.map(_.getLong(0)).toSet.subsetOf(pool))

    // the refine fetch is CANDIDATE-sized: a broadcast semi-join against
    // the probe-pruned assignments scan — never a shuffle of the corpus
    val plan = idx.searchPq(q0, k, nprobe = 8, refine = 10 * k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"refine must semi-join the candidate ids:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"candidate ids must broadcast:\n${plan.take(2000)}")
    // refine < k is a contract violation, named
    val e = intercept[IllegalArgumentException](idx.searchPq(q0, k = 10, refine = 5))
    assert(e.getMessage.contains("refine"), e.getMessage)
  }

  test("append: new vectors searchable without retraining; layout + replays hold (r13)") {
    val root = Files.createTempDirectory("graft_ivf_app").toString
    val emb = Tables(spark, sf(), "embeddings")
    val idx = VectorIndex.build(spark, emb, root, nCentroids = 8,
      pqSubspaces = Some(8), pqCodewords = 16, codeBuckets = 8)
    val q = emb.filter(col("vec_id") === 7L)
      .select("embedding").collect().head.getSeq[Float](0).toArray

    // append an exact copy of vector 7 under a new id: cosine-argmax
    // assignment must land it in 7's cell, and both search paths must
    // surface it (cosine exactly 1; identical PQ codes)
    val newcomer = emb.filter(col("vec_id") === 7L)
      .selectExpr("9001L AS vec_id", "embedding")
    val n = idx.append(newcomer)
    assert(n == 1L)
    val asg = GraftTable.load(spark, s"$root/assignments").read()
      .filter(col("vec_id").isin(7L, 9001L))
      .select("vec_id", "cent_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg(9001L) == asg(7L), s"appended copy landed in a different cell: $asg")
    val fl = idx.search(q, k = 3, nprobe = 2).collect().map(_.getLong(0)).toSet
    assert(fl.contains(9001L) && fl.contains(7L), s"float search misses newcomer: $fl")
    val pq = idx.searchPq(q, k = 3, nprobe = 3).collect().map(_.getLong(0)).toSet
    assert(pq.contains(9001L) && pq.contains(7L), s"PQ search misses newcomer: $pq")

    // the bucket layout survives the append: pruning still strict
    val codes = GraftTable.load(spark, s"$root/pq_codes")
    val all = codes.read().inputFiles.length
    val pruned = codes.read(filters = Seq(col("cent_id") === asg(7L))).inputFiles.length
    assert(pruned < all, s"append degraded bucket pruning: $pruned/$all")

    // labeled replays are exactly-once on BOTH tables independently,
    // and the return value reports what actually applied (r13 review)
    val more = emb.filter(col("vec_id") === 3L).selectExpr("9002L AS vec_id", "embedding")
    assert(idx.append(more, op = Some("t:1"), opFamily = Some("t:")) == 1L)
    val (av, cv) = (GraftTable.load(spark, s"$root/assignments").currentVersion,
      codes.currentVersion)
    assert(idx.append(more, op = Some("t:1"), opFamily = Some("t:")) == 0L,
      "a fully dedup'd replay must report 0 appended")
    assert(GraftTable.load(spark, s"$root/assignments").currentVersion == av,
      "replayed append re-committed assignments")
    assert(codes.currentVersion == cv, "replayed append re-committed codes")

    // maintenance consolidates the append-era small files; answers and
    // the codes table's bucket pruning survive (plain compact is
    // bucket-preserving by the store contract)
    val filesBefore = codes.read().inputFiles.length
    idx.maintain()
    assert(codes.read().inputFiles.length < filesBefore,
      "maintain() did not consolidate the codes files")
    val pq2 = idx.searchPq(q, k = 3, nprobe = 3).collect().map(_.getLong(0)).toSet
    assert(pq2.contains(9001L) && pq2.contains(7L), s"post-maintain search broke: $pq2")
    val prunedAfter = codes.read(filters = Seq(col("cent_id") === asg(7L))).inputFiles.length
    assert(prunedAfter < codes.read().inputFiles.length,
      "post-compact bucket pruning lost")
  }
}
