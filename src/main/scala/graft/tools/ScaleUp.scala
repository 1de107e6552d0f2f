package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.GraftSession

/** Bench-only dataset scale-up: replicate the driver's sf0.1 tables K
  * times with key remapping so the result behaves like a genuinely
  * larger corpus (VERDICT r4 #8: "bench at sf1 once" — the driver ships
  * no sf1, so this builds one under /tmp for SCALING measurements, not
  * correctness: the DuckDB oracle never sees it).
  *
  * Faithful scaling requires more than row duplication:
  *  - Foreign keys offset per replica (`key + r * (max+1)`) so join
  *    fan-outs stay constant: each order still has ~4 lineitems, each
  *    customer the same order count. The nation/region dimensions stay
  *    fixed (25/5 rows at every TPC-H scale), so group cardinalities on
  *    them grow in ROWS, not groups — exactly like real TPC-H.
  *  - Document text must NOT be copied verbatim: 10 exact copies of
  *    every doc would grow near-dup pair outputs ~K^2 (and collapse
  *    under exact dedup), misrepresenting the dedup workloads. Each
  *    replica deterministically SUBSTITUTES ~40% of word occurrences
  *    (replica-keyed suffix, chosen by a word-keyed hash so the same
  *    word maps the same way everywhere in a replica) and then
  *    re-orders each doc's words by a replica-keyed hash sort. The
  *    substitution is the load-bearing half: re-ordering alone leaves
  *    every ORDER-INVARIANT signature identical across replicas —
  *    simhash (per-word-multiset bit votes: measured hamming 0 between
  *    a doc and any reordering) and most of the char-5-gram set
  *    (intra-word grams survive) — which made t21's sf10 answer and
  *    t04's sf10 candidate set grow ~K^2 (the round-7 235 s / 250 s
  *    sf10 outliers). A consistent 40% vocabulary remap keeps
  *    within-replica similarity structure intact (shared words stay
  *    shared) while pushing cross-replica simhash far past hamming 3
  *    and cross-replica gram Jaccard far below the 0.6 answer/band
  *    regime.
  *  - Embeddings rotate by r positions per replica: norms and
  *    per-dimension distributions are preserved, cross-replica cosine
  *    structure is scrambled, so ANN candidate rates scale linearly.
  *  - Events offset user_id per replica (same sessions-per-user shape)
  *    and keep timestamps (window densities grow linearly).
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <srcSfDir> <outDir> [factor] [documents]")
    val (srcDir, outDir) = (args(0), args(1))
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    // single-table modes (round-8 probes: the t21 band ladder needs a
    // 1300x+ docs-only corpus; the v04 artifact fix needs sf10's
    // embeddings regenerated — scaling the other tables is pure waste)
    args.drop(3).headOption match {
      case Some("documents") => scaleDocs(spark, srcDir, outDir, k)
      case Some("embeddings") => scaleEmbeddings(spark, srcDir, outDir, k)
      case Some("events") => scaleEvents(spark, srcDir, outDir, k)
      case Some(other) => sys.error(s"unknown table mode '$other'")
      case None => scaleAll(spark, srcDir, outDir, k)
    }
    println(s"""{"scaleup": "$outDir", "factor": $k}""")
  }

  def scaleAll(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val reps = spark.range(0, k).select(col("id").cast("int").as("__r"))

    /** Offset span for a key DOMAIN, from the table that OWNS the key
      * (its primary side) — a child FK column's own max understates the
      * domain whenever some parent rows have no children (in TPC-H a
      * third of customers have no orders), which would shift parent and
      * child replicas by different amounts and misalign every join. */
    def span(ownerTable: String, keyCol: String): Long =
      Tables(spark, srcDir, ownerTable).agg(max(col(keyCol))).head.getLong(0) + 1L

    val custSpan = span("customer", "c_custkey")
    val suppSpan = span("supplier", "s_suppkey")
    val partSpan = span("part", "p_partkey")
    val ordSpan = span("orders", "o_orderkey")

    /** Cross-join with the replica table; offset each key by
      * r * its DOMAIN span — one pass, no shuffle beyond the write. */
    def replicate(t: String, keys: Seq[(String, Long)]): DataFrame = {
      val rep = Tables(spark, srcDir, t).crossJoin(broadcast(reps))
      keys.foldLeft(rep) { case (d, (c, sp)) =>
        d.withColumn(c, col(c) + col("__r") * sp)
      }
    }

    def write(t: String, df: DataFrame): Unit = {
      // repartition before the write (r15): the broadcast crossJoin
      // preserves the source's single partition, so the scaled facts
      // were landing as ONE file with ONE row group — every scan of
      // them ran as a single task, serializing the scan+partial-agg
      // stage and flattening any core-scaling measurement (guide §6:
      // parallel-readable output sizing). The docs/embeddings/events
      // single-table modes already did this.
      df.drop("__r")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"scaled $t x$k")
    }

    // fixed dimensions: copy verbatim
    for (t <- Seq("region", "nation"))
      write(t, Tables(spark, srcDir, t))

    write("customer", replicate("customer", Seq("c_custkey" -> custSpan)))
    write("supplier", replicate("supplier", Seq("s_suppkey" -> suppSpan)))
    write("part", replicate("part", Seq("p_partkey" -> partSpan)))
    write("orders", replicate("orders",
      Seq("o_orderkey" -> ordSpan, "o_custkey" -> custSpan)))
    write("lineitem", replicate("lineitem",
      Seq("l_orderkey" -> ordSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)))
    // events: the Tables loader expects ts as RAW EPOCH-NANOS INT64
    // (driver parquet is TIMESTAMP(NANOS) read under nanosAsLong) and
    // converts unconditionally — write ts back in that shape or every
    // events query fails on the scaled dataset
    write("events", replicate("events",
      Seq("event_id" -> span("events", "event_id"), "user_id" -> span("events", "user_id")))
      .withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("long")))

    // documents: per-replica deterministic word substitution + re-order
    // (see scaladoc — substitution defeats order-invariant signatures)
    write("documents", scaledDocs(spark, srcDir, reps))

    // embeddings: rotate the vector by r positions per replica, AND —
    // once r wraps past the dimension count — flip signs by a
    // wrap-keyed per-position hash. Rotation ALONE is cyclic in dim:
    // replicas r and r+dim get the IDENTICAL transform, so any factor
    // > dim (the 100x probe at dim=64) mints exact cross-replica
    // duplicates — the round-8 v04 probe at the 0.6 design threshold
    // measured exactly 36 replica-pairs x 2000 vectors = 72k bogus
    // answer pairs. Sign flips preserve norms and per-dimension
    // magnitude distributions while scrambling cosine across wraps
    // (~half the terms negate); replicas below one wrap are
    // byte-identical to the old generator, keeping sf1 comparable.
    write("embeddings", scaledEmbeddings(spark, srcDir, reps))
  }

  /** The embeddings table's replica transform (see the scaleAll
    * comment), shared with the embeddings-only mode. */
  private def scaledEmbeddings(spark: SparkSession, srcDir: String,
                               reps: DataFrame): DataFrame = {
    val span = Tables(spark, srcDir, "embeddings")
      .agg(max(col("vec_id"))).head.getLong(0) + 1L
    Tables(spark, srcDir, "embeddings").crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("__r") * span)
      .withColumn("embedding", expr(
        """transform(sequence(0, size(embedding) - 1),
             i -> CAST(element_at(embedding, ((i + __r) % size(embedding)) + 1)
                  * IF(__r < size(embedding)
                       OR pmod(xxhash64(i, CAST(FLOOR(__r / size(embedding)) AS INT)), 2) = 0,
                       1.0D, -1.0D) AS FLOAT))"""))
  }

  /** Embeddings-only scale-up (ANN probes; same rationale as
    * [[scaleDocs]]). */
  def scaleEmbeddings(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val reps = spark.range(0, k).select(col("id").cast("int").as("__r"))
    scaledEmbeddings(spark, srcDir, reps)
      .drop("__r")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"scaled embeddings x$k")
  }

  /** The documents table's replica transform, shared by [[scaleAll]]
    * and the docs-only mode. */
  private def scaledDocs(spark: SparkSession, srcDir: String,
                         reps: DataFrame): DataFrame = {
    val span = Tables(spark, srcDir, "documents")
      .agg(max(col("doc_id"))).head.getLong(0) + 1L
    Tables(spark, srcDir, "documents").crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("__r") * span)
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        array_join(
          expr("""array_sort(transform(
               transform(split(text, ' '),
                 w -> IF(pmod(xxhash64(w, __r), 10) < 4,
                         concat(w, '~', __r), w)),
               w -> struct(xxhash64(w, __r, 7919) AS h, w AS w))).w"""),
          " ")))
  }

  /** Docs-only scale-up (band-ladder probes). Repartitions the output
    * so a many-hundred-replica corpus lands as parallel-readable files
    * rather than one giant row group per source file. */
  /** Events-only scale-up (round-10 pattern-family probes): user_id /
    * event_id offset per replica (same sessions-per-user shape, key
    *-group count grows linearly), timestamps kept; ts written back as
    * raw epoch nanos, the shape the Tables loader expects. */
  def scaleEvents(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val reps = spark.range(0, k).select(col("id").cast("int").as("__r"))
    def span(c: String): Long =
      Tables(spark, srcDir, "events").agg(max(col(c))).head.getLong(0) + 1L
    val (eSpan, uSpan) = (span("event_id"), span("user_id"))
    Tables(spark, srcDir, "events").crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("__r") * eSpan)
      .withColumn("user_id", col("user_id") + col("__r") * uSpan)
      .withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("long"))
      .drop("__r")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"scaled events x$k")
  }

  def scaleDocs(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val reps = spark.range(0, k).select(col("id").cast("int").as("__r"))
    scaledDocs(spark, srcDir, reps)
      .drop("__r")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"scaled documents x$k")
  }
}
