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
