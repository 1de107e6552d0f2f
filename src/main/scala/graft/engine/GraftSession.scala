package graft.engine

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Replaces the reference's Trino coordinator+worker composition
  * (walden `tf/main.tf:82-114`, `tf/trino-values.yaml`) with one Spark
  * process: Catalyst is the optimizer, Tungsten the execution engine,
  * AQE the runtime re-planner. Defaults are chosen for the 100 TB
  * design point, scaled down to local[N]:
  *
  *  - AQE on (runtime join re-planning, partition coalescing, skew-join
  *    splitting) — stands in for Trino's CBO + fault-tolerant exchange.
  *  - CBO on; users should `ANALYZE TABLE` large tables.
  *  - shuffle partitions default to cores in local mode; on a real
  *    cluster this would be 2-3x total executor cores (AQE coalesces
  *    down, so erring high is safe).
  *  - UTC session timezone: oracle/engine parity and sane timestamp
  *    semantics across a fleet.
  */
object GraftSession {

  /** Cores to use locally; the driver exports SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String = s"local[$cpus]",
              shufflePartitions: Int = cpus.toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.mergeSchema", "false")
      // TIMESTAMP(NANOS) parquet (e.g. the events table) reads as raw
      // long; loaders convert to µs explicitly (graft.Tables). Session-
      // level so per-table loads need no conf side effects.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Column RENAME support: the store stamps parquet.field.id into
      // every file; read-side id resolution (the Iceberg rule) lets
      // pre-rename files surface renamed columns. Inert for schemas
      // without ids (external parquet reads unchanged). Write side is
      // Spark's default, re-pinned so no deployment can silently write
      // id-less files a post-rename read would resolve to NULL.
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      // Runtime bloom-filter semi-join pruning (explicit, though on by
      // default): a selective dimension filter builds a bloom of its
      // join keys at runtime and drops non-matching fact rows BEFORE
      // the fact-side shuffle — at 100 TB that is the difference
      // between shuffling the whole fact table and shuffling the
      // matching slice. PlanSpec gates the injection.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Storage-partitioned joins (round 12): scans of bucketed
      // GraftTables report KeyGroupedPartitioning, and co-bucketed
      // joins plan with ZERO exchanges — the 100 TB fact-fact join
      // strategy. pushPartValues aligns mismatched occupied-bucket
      // sets between the two sides (default on, re-pinned).
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // Cached relations KEEP their output partitioning (Spark 4 flips
      // this to true, letting AQE re-partition cached plans — which
      // makes a persisted repartition(key) useless as a co-partitioned
      // join input: the planner must assume Unknown and re-shuffles
      // above every InMemoryTableScan). False restores the classic
      // contract the iterative operators rely on (pageRank's
      // loop-invariant edge/node caches join exchange-free each round).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")

  /** Create (or reuse) a session and register graft SQL functions. */
  def create(master: String = s"local[$cpus]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
