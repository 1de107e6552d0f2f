package graft

import org.apache.spark.sql.functions._

/** Product quantization (round 12, VectorOps.pqCodebookSampled /
  * pqCodebookTrained / pqEncode / pqAdcTopK): trained-codebook recall
  * floor vs exact L2 top-k, compression accounting, deterministic
  * encode, and trained-beats-nothing sanity (the sampled construction
  * itself is fully oracle-checked by v09).
  */
class PqSpec extends SparkSpec {
  import graft.operators.VectorOps

  private def embeddings = {
    graft.functions.GraftFunctions.register(spark)
    graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
  }

  test("trained codebooks: ADC top-10 recall >= 0.5 vs exact L2 top-10") {
    // the fixture embeddings are near-random — distance concentration
    // makes this PQ's WORST case, so the floor needs the full k=256
    // codeword budget (real embedding manifolds cluster and do better)
    val e = embeddings.cache()
    val cb = VectorOps.pqCodebookTrained(e, dim = 64, m = 8, k = 256)
    val codes = VectorOps.pqEncode(e, cb, dim = 64, m = 8)
    val queries = e.filter(col("vec_id") < 20).selectExpr("vec_id AS id_q", "v")
    val approx = VectorOps.pqAdcTopK(queries, codes, cb, dim = 64, m = 8, topK = 10)
      .select(col("id_q"), col("id_c")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // exact L2 top-10 per query (500 vectors: brute force is the oracle)
    val exact = queries.select(col("id_q"), col("v").as("qv"))
      .join(e.selectExpr("vec_id AS id_c", "v AS cv"), col("id_q") =!= col("id_c"))
      .withColumn("d", expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_q")).orderBy(col("d"), col("id_c"))))
      .filter(col("rn") <= 10)
      .select(col("id_q"), col("id_c")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 8 bytes out of 256 preserve neighborhood structure: the classic
    // PQ operating point on 64-dim data lands well above 0.5 recall@10
    assert(mean >= 0.5, f"mean recall@10 $mean%.3f < 0.5 with trained codebooks")
    e.unpersist()
  }

  test("32x compression accounting and deterministic encode") {
    val e = embeddings
    val cb = VectorOps.pqCodebookSampled(e.filter(col("vec_id") < 256), dim = 64, m = 8)
    val codes1 = VectorOps.pqEncode(e, cb, dim = 64, m = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val codes2 = VectorOps.pqEncode(e, cb, dim = 64, m = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(codes1.toSeq == codes2.toSeq, "encode must be deterministic")
    // 8 codes per vector, each addressing <= 256 codewords = 8 bytes of
    // information vs 64 * 4-byte floats
    val perVec = codes1.groupBy(_._1).values.map(_.length).toSet
    assert(perVec == Set(8), s"expected 8 codes per vector, got $perVec")
    assert(codes1.forall(_._3 < 256), "codeword ids must fit one byte")
  }

  test("trained codebooks reduce reconstruction MSE vs sampled ones at equal k") {
    // reconstruction MSE = the k-means objective itself: the mean over
    // vectors of sum-of-subspace L2² to the assigned codeword — trained
    // centroids must beat k arbitrary sample vectors by construction
    val e = embeddings.cache()
    def mse(cb: org.apache.spark.sql.DataFrame): Double = {
      VectorOps.pqEncode(e, cb, dim = 64, m = 8)
        .join(broadcast(cb), Seq("j", "c"))
        .join(e, Seq("vec_id"))
        .withColumn("d", expr(
          "aggregate(zip_with(slice(v, j * 8 + 1, 8), cw, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
        .groupBy("vec_id").agg(sum("d").as("err"))
        .agg(avg("err")).head().getDouble(0)
    }
    val sampled = mse(
      VectorOps.pqCodebookSampled(e.filter(col("vec_id") < 32), dim = 64, m = 8))
    val trained = mse(
      VectorOps.pqCodebookTrained(e, dim = 64, m = 8, k = 32))
    assert(trained < sampled,
      f"trained MSE $trained%.4f not below sampled $sampled%.4f at equal k")
    e.unpersist()
  }
}
