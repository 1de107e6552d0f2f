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
}
