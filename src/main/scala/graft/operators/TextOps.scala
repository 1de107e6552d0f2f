package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryEntry, Tables}

/** Training-data text pipeline operators over `documents` — the
  * beyond-reference surface (builder prompt): exact dedup, MinHash+LSH
  * near-dedup, SimHash, n-gram Jaccard, language ID, quality scoring,
  * token counting, document fingerprinting.
  *
  * Scale design (100 TB discipline): every operator is a pure
  * shuffle-parallel dataflow — shingle explosion is linear in corpus
  * size, candidate generation goes through LSH band buckets (never an
  * all-pairs join), and verification touches only bucket-collision
  * pairs. Hash functions are md5-based so the DuckDB oracle can follow
  * bit-for-bit (lexicographic min over fixed-width hex == numeric min);
  * a production deployment would swap in xxhash64 via the same plans.
  */
object TextOps {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  /** Distinct word 5-grams per doc — the shared front half of the
    * decontamination entries (t13 broadcast-verify / t24 bloom-probe;
    * one spelling so the two are provably the same overlap measure). */
  /** THE word-5-gram spelling (parameterized by the word-array column
    * name) — shared by the batch gram explode below and the streaming
    * twin ([[graft.streaming.EventStream.decontaminateDocs]]), so the
    * two can never measure different grams.
    *
    * r14: the spelling is now the fused [[graft.functions.WordGrams]]
    * kernel — bit-identical to the relational
    * `array_distinct(transform(sequence(0, size(ws) - 5),
    *    i -> concat_ws(' ', ws[i], ..., ws[i+4])))`
    * (FunctionsSpec parity-pins the two, short/empty arrays included),
    * which paid interpreted lambda dispatch + 5 GetArrayItem evals +
    * an interpreted concat_ws PER GRAM, then re-walked the array for
    * the distinct. Every call site (t13/t24/t25 batch, streaming
    * decontaminate) switches together by construction. */
  private[graft] def wordFiveGramArraySqlOver(ws: String): String =
    s"word_grams($ws, 5)"
  private[graft] val wordFiveGramArraySql: String = wordFiveGramArraySqlOver("ws")

  private[graft] def wordFiveGrams(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .selectExpr("doc_id", "source", "split(lower(text), ' ') AS ws")
      .filter(size(col("ws")) >= 5)
      .selectExpr("doc_id", "source", s"explode($wordFiveGramArraySql) AS g")
  }

  /** DuckDB twin of the decontamination overlap measure — shared by
    * t13 and t24, which differ only in the Spark-side PLAN (broadcast
    * verify vs bloom prefilter + shuffled verify), never the answer. */
  private val oDecontaminate: String =
    """WITH base AS (SELECT doc_id, source, STRING_SPLIT(LOWER(text), ' ') AS ws
          FROM documents WHERE LEN(STRING_SPLIT(LOWER(text), ' ')) >= 5),
        grams AS (SELECT DISTINCT doc_id, source,
            UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws) - 3),
              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS g
          FROM base),
        ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0)
        SELECT doc_id, source, COUNT(*) AS n_overlap, COUNT(*) >= 5 AS contaminated
        FROM grams JOIN ev USING (g)
        WHERE doc_id % 17 <> 0 GROUP BY doc_id, source"""

  /** THE simhash signature — ONE spelling shared by t03 (signatures)
    * and t21 (banded near-dup pairs): md5(word) nibbles vote per bit,
    * weighted by term frequency; output is the 64-char bit string
    * (string form keeps the pair entries' banding/hamming in plain
    * codegen'd string ops with an exact DuckDB twin). */
  private def simhashSigs(s: SparkSession, d: String): DataFrame = {
    // ONE fused pass ([[graft.functions.Simhash64]]): the old
    // relational spelling exploded every word x64 bit positions
    // through two shuffles (~200M aggregated rows at 20k docs, growing
    // linearly with corpus bytes x64). Votes are order-independent
    // integer sums, so the fused kernel is bit-identical and the
    // DuckDB oracle twin below is untouched.
    graft.functions.GraftFunctions.register(s)
    docs(s, d)
      // WORDLESS docs are ABSENT from the signature set — the contract
      // the relational spelling established (explode + LEN(w) > 0
      // emitted zero rows for NULL / '' / all-space text) and the
      // DuckDB twin still enforces. Without this filter the fused
      // kernel would hand every empty doc the all-zero signature, and
      // K empty docs would emit K^2/2 spurious hamming-0 "near-dup"
      // pairs in t21. `trim` strips exactly ' ' (matching the
      // split-on-space tokenizer: any other whitespace IS a word).
      .where("text IS NOT NULL AND trim(text) != ''")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .selectExpr("doc_id", "simhash64(text) AS simhash")
  }

  /** DuckDB twin of [[simhashSigs]] — ends in a `sigs(doc_id, simhash)`
    * CTE. */
  private val oSimhashSigs =
    """toks AS (
          SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w
          FROM documents),
        words AS (
          SELECT doc_id, MD5(w) AS h FROM toks WHERE LEN(w) > 0),
        bits AS (SELECT doc_id, pos,
            CAST(FLOOR((STRPOS('0123456789abcdef', SUBSTRING(h, CAST(FLOOR(pos / 4) AS INT) + 1, 1)) - 1)
              / POWER(2, 3 - pos % 4)) AS INT) % 2 AS bit
          FROM words, (SELECT UNNEST(RANGE(0, 64)) AS pos) p),
        votes AS (SELECT doc_id, pos, SUM(bit * 2 - 1) AS vote
          FROM bits GROUP BY doc_id, pos),
        sigs AS (SELECT doc_id,
            STRING_AGG(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
          FROM votes GROUP BY doc_id)"""

  /** Corpus-adaptive simhash band geometry (t21): number of blocks B
    * the 64-bit signature splits into for the hamming<=3 search.
    * Candidates come from agreeing exactly on B-3 of the B blocks
    * (C(B,3) join families); matched width is the sum of the included
    * block widths, so RANDOM collisions per doc are about
    * C(B,3) * N / 2^matched. B=4 matches one 16-bit block — at
    * corpus sizes past ~2^15 those buckets saturate and random
    * candidate pairs grow ~N^2/2^16 (the round-7 sf10 bench measured
    * exactly this: 250 s, dominated by band-join output). Growing B
    * widens the matched key (B=5: 25 bits over 10 families, B=6: 31
    * bits over 20) at a linear cost of C(B,3) rows/doc — the classical
    * Manku et al. WWW'07 table construction. Pick the smallest B whose
    * expected random candidates per doc stay <= ~2; the OUTPUT is
    * B-invariant (pigeonhole completeness + exact hamming verify), so
    * geometry is pure cost tuning and the DuckDB oracle is untouched.
    *
    * The ladder is open-ended (ADVICE r7 #3): widths distribute 64
    * bits as evenly as B allows, and the tier bound uses the exact
    * worst-case matched width 64 − (three widest blocks). Capped at
    * B=12 — matched >=46 bits over 220 families, i.e. candidates/doc
    * <=2 out to N ≈ 6e11 docs (a 100 TB corpus at 1 KB/doc is ~1e11),
    * beyond which candidates grow linearly again, documented. Tiers
    * B>=7 are constructed by the same law as the measured 4/5/6 but
    * have no at-scale measurement yet (geometry invariance is spec'd
    * for B=4..7 in TextRecallSpec). */
  private[graft] def simhashWidths(nb: Int): Seq[Int] = {
    val base = 64 / nb
    val extra = 64 % nb
    Seq.fill(extra)(base + 1) ++ Seq.fill(nb - extra)(base)
  }
  private[graft] def simhashBlocksFor(n: Long): Int =
    (4 to 12).find { b =>
      val ws = simhashWidths(b)
      val matched = 64 - ws.sorted.reverse.take(3).sum
      val fam = b.toLong * (b - 1) * (b - 2) / 6
      fam * n <= 2L * (1L << matched)
    }.getOrElse(12)

  /** t21's pair pipeline, geometry-forceable for the invariance spec.
    * Block values ride as ints sliced from the packed 64-bit signature
    * (shiftrightunsigned off `(hi << 32) | lo`) — integer-only
    * transport, no signature strings cross the shuffle. */
  /** Shuffle-partition count for a corpus-sized banded self-join, from
    * the banded-row estimate (population x families) — the SCALE.md r9
    * (c) operating rule ENCODED IN THE OPERATOR (round 10, r9 verdict
    * #4): the SHUFFLE_HASH build side inflates ~10x when built into an
    * UnsafeHashedRelation, so the OOM knob is per-partition build size
    * and partition count alone cures it (measured: 150M banded rows at
    * 32 partitions OOMs an 8 GB heap, at 512 completes in 58 s,
    * byte-identical output). ~293k rows/partition was the validated
    * point; book 250k with the session default as the floor and 4096
    * as the ceiling. Callers apply it through an EXPLICIT repartition
    * on the join keys: a user-specified partition count is exempt from
    * AQE post-shuffle coalescing, which would otherwise merge the
    * byte-small partitions right back (it sizes by shuffle BYTES and
    * cannot see build-side inflation). */
  private[operators] def bandJoinPartitions(s: SparkSession, bandedRows: Long): Int = {
    val session = s.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(session, math.min(4096, math.ceil(bandedRows / 250000.0).toInt))
  }

  private[graft] def simhashPairs(s: SparkSession, d: String,
      forceBlocks: Option[Int] = None): DataFrame = {
    // geometry picks by the SIGNATURE population — wordless docs are
    // absent from the signature set (filter mirrors simhashSigs), so
    // counting them too could select one tier higher than the actual
    // band-join population warrants near a boundary (ADVICE r7 #1)
    val population = docs(s, d)
      .where("text IS NOT NULL AND trim(text) != ''").count()
    val nb = forceBlocks.getOrElse(simhashBlocksFor(population))
    val widths = simhashWidths(nb)
    val offs = widths.scanLeft(0)(_ + _)
    // families = all ways to EXCLUDE 3 blocks; incl(j) = matched blocks
    val incl: Seq[Seq[Int]] =
      (0 until nb).combinations(nb - 3).map(_.toSeq).toSeq
    def blockExpr(i: Int): String =
      s"CAST(shiftrightunsigned(fullsig, ${64 - offs(i) - widths(i)}) & ${(1L << widths(i)) - 1}L AS INT)"
    // per-family key: included block values packed widths.max bits
    // apart — injective, and (B-3-1)*spacing + max <= 54 bits at every
    // tier of the ladder, so the key stays one positive long; join key
    // is (band, bval) — both ints
    val spacing = widths.max
    def keyExpr(set: Seq[Int]): String =
      set.map(i => s"CAST(bk$i AS BIGINT)")
        .reduce((a, b) => s"((($a) << $spacing) | ($b))")
    val sigs = simhashSigs(s, d)
      .selectExpr("doc_id",
        "CAST(conv(substring(simhash, 1, 32), 2, 10) AS LONG) AS hi",
        "CAST(conv(substring(simhash, 33, 32), 2, 10) AS LONG) AS lo")
      .selectExpr("doc_id", "hi", "lo", "shiftleft(hi, 32) | lo AS fullsig")
      .selectExpr(Seq("doc_id", "hi", "lo") ++
        (0 until nb).map(i => s"${blockExpr(i)} AS bk$i"): _*)
    val banded = sigs.select(
      Seq(col("doc_id"), col("hi"), col("lo")) ++
        (0 until nb).map(i => col(s"bk$i")) :+
        explode(array(incl.zipWithIndex.map { case (set, j) =>
          struct(lit(j).as("band"), expr(keyExpr(set)).as("bval"))
        }: _*)).as("bb"): _*)
      .select(Seq(col("doc_id"), col("hi"), col("lo"),
        col("bb.band").as("band"), col("bb.bval").as("bval")) ++
        (0 until nb).map(i => col(s"bk$i")): _*)
    val l = banded.select(Seq(col("doc_id").as("doc_a"),
      col("hi").as("hia"), col("lo").as("loa"), col("band"), col("bval")) ++
      (0 until nb).map(i => col(s"bk$i").as(s"bka$i")): _*)
    val r = banded.select(Seq(col("doc_id").as("doc_b"),
      col("hi").as("hib"), col("lo").as("lob"), col("band"), col("bval")) ++
      (0 until nb).map(i => col(s"bk$i").as(s"bkb$i")): _*)
    // FIRST-MATCH-FAMILY emission (the round-6 discipline, generalized):
    // a pair is emitted only by its lowest fully-agreeing family —
    // earlier families must differ in >=1 included block — so dup
    // classes that collide in every family verify ONCE and no trailing
    // distinct() is needed. Unrolled int compares, codegen'd.
    val firstMatch = (0 until incl.size - 1).map { j =>
      val diff = incl(j).map(i => s"bka$i != bkb$i").mkString(" OR ")
      s"(band <= $j OR ($diff))"
    }.mkString(" AND ")
    // corpus-sized both sides: shuffle on the band key, never broadcast.
    // Partition count sized by the operator from the banded-row
    // estimate (population x families) — the SCALE.md (c) rule; the
    // explicit same-key repartition co-partitions both sides (no extra
    // exchange) and is exempt from AQE coalescing
    val parts = bandJoinPartitions(s, population * incl.size)
    l.repartition(parts, col("band"), col("bval")).hint("shuffle_hash")
      .join(r.repartition(parts, col("band"), col("bval")), Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr(firstMatch))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(hia ^ hib) + bit_count(loa ^ lob) AS INT) AS hamming"))
      .filter(col("hamming") <= 3)
  }

  /** Two-level prefix sum of `toks` within `source` — the ONE spelling
    * t19 (packing, doc_id order) and t22 (mixing, hash order) share.
    * Never a source-only row-level window (one task per source at 100
    * TB): prefix-sum within (source, shard) — `shardExpr` MUST be
    * monotone in `orderCol` so within-shard prefix + preceding-shard
    * totals IS the global prefix — then cumulate the per-shard totals
    * over metadata-sized rows and broadcast the offsets back. Emits
    * `before` (global exclusive prefix); drops the plumbing columns.
    * Both consumers' plan shapes are gated in PlanSpec. */
  private def twoLevelPrefix(df: DataFrame, orderCol: String,
      shardExpr: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = df.withColumn("shard", shardExpr)
    val inShard = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = sharded
      .withColumn("before_in_shard", coalesce(sum(col("toks")).over(inShard), lit(0L)))
    val acrossShards = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("source"), col("shard"))
      .agg(sum(col("toks")).as("shard_toks"))
      .withColumn("offset", coalesce(sum(col("shard_toks")).over(acrossShards), lit(0L)))
      .select(col("source").as("o_source"), col("shard").as("o_shard"), col("offset"))
    withLocal
      .join(broadcast(offsets),
        col("source") === col("o_source") && col("shard") === col("o_shard"))
      .withColumn("before", col("offset") + col("before_in_shard"))
      .drop("o_source", "o_shard", "offset", "before_in_shard")
  }

  /** Weighted corpus mixing under a global token budget — the PUBLIC
    * operator behind t22 (r7 verdict #6 lifted the demo's name-parsed
    * weight into this explicit parameter). Selects documents from each
    * source in deterministic selection-hash order (md5 of doc_id)
    * until the source's share of `budgetTokens` is spent.
    *
    * `weights` is a metadata-sized `(source, weight)` table — INTEGER
    * weights, one row per source: each source's budget is
    * `weight * budgetTokens div sum(weights)`, all-integer arithmetic
    * (a double intermediate would let two engines round an ulp apart
    * at a floor() boundary and flip a doc across the budget line). A
    * zero-weight source gets budget 0 and is absent from the mix;
    * sources missing from the table are dropped (inner join).
    *
    * SCALE: the per-source cumulative sum is [[twoLevelPrefix]] (t19's
    * sharded shape — the shard is the leading byte of the selection
    * hash, order-aligned because fixed-width hex sorts as strings), so
    * no source ever funnels through one task; budgets re-enter the
    * plan as a broadcast literal frame. Docs with NULL text are
    * excluded (Spark's legacy sizeOfNull would count them -1 where
    * SUM-skipping engines ignore them). */
  def sourceMix(docsDf: DataFrame, weights: DataFrame,
                budgetTokens: Long): DataFrame = {
    val s = docsDf.sparkSession
    import s.implicits._
    require(budgetTokens >= 0, s"sourceMix: negative budget $budgetTokens")
    val wRows = weights
      .selectExpr("CAST(source AS STRING) AS source", "CAST(weight AS BIGINT) AS weight")
      .collect()
    require(wRows.nonEmpty, "sourceMix: empty weight table")
    require(wRows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "sourceMix: NULL source or weight in the weight table")
    require(wRows.forall(_.getLong(1) >= 0),
      s"sourceMix: negative weight for ${wRows.filter(_.getLong(1) < 0).map(_.getString(0)).mkString(",")}")
    require(wRows.map(_.getString(0)).distinct.length == wRows.length,
      "sourceMix: duplicate source in the weight table")
    val sumW = wRows.map(_.getLong(1)).sum
    require(sumW > 0, "sourceMix: all weights are zero")
    val budgets = wRows.toSeq
      .map(r => (r.getString(0), r.getLong(1) * budgetTokens / sumW))
      .toDF("b_source", "budget_tokens")
    val base = docsDf
      .where("text IS NOT NULL")
      .selectExpr("doc_id", "source", "size(split(text, ' ')) AS toks",
        "md5(CAST(doc_id AS STRING)) AS h")
    twoLevelPrefix(base, "h",
        expr("conv(substring(h, 1, 2), 16, 10)").cast("long"))
      .withColumn("cum", col("before") + col("toks"))
      .join(broadcast(budgets), col("source") === col("b_source"))
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("source"), col("budget_tokens"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("mix_tokens"))
      .select("source", "budget_tokens", "n_docs", "mix_tokens")
  }

  /** Deterministic global shuffle + sharding for training output — the
    * LAST step of a pre-training pipeline: the curated corpus becomes N
    * shards whose membership AND within-shard order are a pure function
    * of (doc id, seed), independent of input layout, partition count,
    * or cluster size (walden's stack leaves this to the training job;
    * a 100 TB corpus needs it done ON the engine).
    *
    * Mechanics: `perm_key` = md5 of `id:seed` (hex — fixed-width, so
    * STRING order == numeric order, the t12/t19 idiom); docs map to
    * 65536 hex buckets (first 4 key chars) and buckets range-map to
    * shards (`floor(bucket * nShards / 65536)` — balanced to ±1 bucket,
    * ≤1.6% skew at 1024 shards). SCALE: ONE hash exchange on the shard
    * id (uniform by construction — no skew, no range-sampling
    * nondeterminism, unlike repartitionByRange whose sampled bounds
    * depend on layout), then a per-partition sort; writers stream
    * sorted runs. Re-running on re-ingested data yields byte-identical
    * shard files — the reproducibility contract a training run audits
    * against.
    */
  def shardForTraining(docsDf: DataFrame, nShards: Int, seed: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"shardForTraining: nShards must be in [1, 65536], got $nShards")
    // reserved-output guard (the decontaminateDocs discipline): a
    // re-sharding run whose input already carries these columns must
    // reject loudly, not silently clobber the caller's data
    val clash = docsDf.columns.toSet.intersect(Set("perm_key", "shard"))
    require(clash.isEmpty,
      s"shardForTraining emits ${clash.mkString(", ")} — rename or drop the " +
        "input column(s) first")
    docsDf
      .withColumn("perm_key",
        md5(concat(col(idCol).cast("string"), lit(":"), lit(seed.toString))))
      .withColumn("shard",
        (conv(substring(col("perm_key"), 1, 4), 16, 10).cast("long") *
          nShards / 65536).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("perm_key"))
  }

  /** Write [[shardForTraining]] output as one parquet file per shard
    * (`outDir/shard=<i>/`): every shard's rows live in exactly one
    * task post-exchange, so `partitionBy` emits one sorted file each. */
  def writeTrainingShards(docsDf: DataFrame, outDir: String, nShards: Int,
      seed: Long, idCol: String = "doc_id"): Unit =
    shardForTraining(docsDf, nShards, seed, idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** The shared front half of the boilerplate pair (t23 detect / t29
    * strip): tokenized docs plus the 1-based start positions of every
    * word 8-gram that appears in ≥2 documents. ONE md5-keyed gram
    * shuffle (high-cardinality, skew-free): "h in ≥2 distinct docs" is
    * min(doc_id)≠max(doc_id) over the h partition — a window pair on
    * the SAME exchange, replacing the r10 countDistinct-agg + semi
    * join whose partial aggregate below the exchange defeated reuse
    * and re-ran the whole tokenize+explode gram pass a second time
    * (3 corpus scans → 2, the explode exactly once). */
  private def boilerplateHits(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val base = docs(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .selectExpr("doc_id",
        "filter(split(lower(coalesce(text, '')), ' '), w -> length(w) > 0) AS ws")
    // r14: fused kernel (word_gram_md5s) replaces the interpreted
    // transform/concat_ws/md5 HOF — one MessageDigest pass per window,
    // no joined-gram string ever built; posexplode supplies the same
    // 1-based position the struct lambda carried
    val grams = base.filter(size(col("ws")) >= 8)
      .selectExpr("doc_id", "posexplode(word_gram_md5s(ws, 8)) AS (p, h)")
      .selectExpr("doc_id", "p + 1 AS i", "h")
    import org.apache.spark.sql.expressions.Window
    val byH = Window.partitionBy("h")
    val hits = grams
      .withColumn("multi",
        min(col("doc_id")).over(byH) =!= max(col("doc_id")).over(byH))
      .filter(col("multi")).select("doc_id", "i")
    (base, hits)
  }

  /** Auto-regime crossover for [[decontaminate]]: DISTINCT eval grams
    * at or below this count take the broadcast-verify plan (t13's —
    * the eval side ships to every executor once, the corpus stream
    * never shuffles); above it the bloom-prefilter + shuffled-verify
    * plan (t24's — one <=8 MB bitset to the driver, map-side probe,
    * survivors-only shuffle). MEASURED round 9 (SCALE.md decontam
    * table, 0.44M-6.9M-doc corpora, eval sides 15k -> 13.5M grams):
    * broadcast wins at every tier up to 3.15M grams; at 13.5M grams
    * the two regimes are a DEAD HEAT (70.3 s vs 70.6 s) — so the flip
    * sits between 3M and 13M on this hardware, and 4M is the safe
    * pre-crossover pick (also ~200 MB of gram strings, a deliberate
    * margin below executor broadcast comfort; Spark hard-refuses at
    * 8 GB / 512M rows). SECOND AXIS the count cannot see: the bloom
    * prefilter's value is proportional to the corpus MISS rate — on
    * the gram-saturated synthetic corpus (probe hit rates near 100%)
    * bloom lost 3.5x at 3.15M grams because nothing was filtered,
    * while a REAL decontamination suite (hit rate ~0) shifts the
    * crossover well below this threshold. Callers who know their hit
    * rate should force the regime; the auto pick is tuned for the
    * conservative high-hit case. The bloom side's own clamps (numBits
    * cap 1 << 26 = ~6.7M grams at the 10 bits/item design point) mark
    * where its fpr degrades — warned loudly in the build. */
  val DecontamBroadcastMaxGrams: Long = 4L * 1000 * 1000

  /** Below this eval-gram count the auto regime does NOT probe the
    * corpus: the broadcast relation is a few tens of MB at most, bloom
    * cannot meaningfully beat shipping it, and the probe job would
    * cost more than it could save. Between this and
    * [[DecontamBroadcastMaxGrams]] the regime hinges on the corpus HIT
    * rate (SCALE.md r9 (a) finding 2) — the auto pick samples it. */
  val DecontamAutoProbeMinGrams: Long = 1L * 1000 * 1000

  /** Corpus grams sampled by the auto regime's hit-rate probe,
    * INTERLEAVED across the corpus (round 11, r10 verdict #2): an
    * equal-share prefix of EVERY input partition rather than one
    * global stream prefix. Each task stops after its share, so the
    * cost envelope stays "read ~this many grams, never a full pass",
    * but a corpus whose contaminated docs cluster in late PARTITIONS
    * (the adversarial ordering a stream prefix reads as ~0%) now
    * contributes those partitions to the sample. Residual bias:
    * clustering WITHIN a partition's own prefix — gram order inside a
    * partition tracks doc order; the decision only needs hit-rate
    * ORDER OF MAGNITUDE (the threshold separates ~0% held-out suites
    * from tens-of-percent saturated corpora), and a wrong pick only
    * costs time, never changes the exact result. */
  val DecontamProbeSampleGrams: Int = 100 * 1000

  /** Sampled hit rate at or above which the middle band keeps the
    * broadcast plan: bloom's prescreen pays for its probe + survivor
    * shuffle only when it kills >=90% of the stream (at ~100% hit it
    * measured 3.5x SLOWER than broadcast at 3.15M grams — SCALE.md r9
    * (a)). */
  val DecontamProbeHighHitRate: Double = 0.10

  /** Benchmark decontamination, ONE operator with the regime choice the
    * two entries used to leave to the caller (r8 verdict "Next round"
    * #2): count a training doc's distinct grams overlapping an eval
    * set, flag docs at >= 5 overlaps.
    *
    * `trainGrams` = (doc_id, source, g) distinct grams per training
    * doc; `evalGrams` = (g) the held-out set (deduped here).
    *
    * `regime`:
    *  - `"broadcast"` — t13's plan, fully LAZY (no driver action at
    *    construction): eval grams broadcast, corpus stream joins
    *    map-side. The right plan while the suite is benchmark-sized.
    *  - `"bloom"` — t24's plan, EAGER at construction (the eval-gram
    *    count sizes the filter; the bitset build collects ~8 MB):
    *    distributed partial blooms over xxhash64(g) merge into one
    *    bitset, a codegen'd might_contain thins the corpus stream
    *    map-side, and an exact shuffled-hash join over survivors kills
    *    false positives — bit-identical answers by construction.
    *  - `"auto"` — counts the eval grams (the same ONE metadata-sized
    *    action the bloom build needs anyway) and picks: above
    *    `broadcastMaxGrams` bloom, at or below `probeMinGrams`
    *    broadcast, and in the MIDDLE BAND (round 10, r9 verdict #2) it
    *    measures the axis the count cannot see — corpus hit rate:
    *    build the bloom (the bloom regime needs it anyway), probe
    *    ~[[DecontamProbeSampleGrams]] corpus grams against it sampled
    *    as an equal-share prefix of EVERY partition (round 11 — each
    *    task stops after its share, so the cost envelope stays one
    *    bounded narrow job, never a full pass; see the constant's doc
    *    for the bias analysis),
    *    and keep broadcast only when the sampled hit rate reaches
    *    `probeHighHitRate` (a saturated corpus, where the prescreen
    *    filters nothing and measured 3.5x slower) — a realistic ~0%
    *    suite takes the bloom plan well below the 4M size crossover.
    * Eager regimes localCheckpoint the deduped eval grams first, so
    * the count / bloom build / verify join read ONE materialization
    * instead of recomputing the gram lineage three times (ADVICE r8).
    */
  /** The t24 bloom build over a deduped `g` gram frame: ~10 bits/item
    * (~1% fpr), 64 Kbit floor for tiny suites, 1 << 26 bit cap on the
    * shipped literal; returns null iff the frame is empty. PAST THE
    * CAP the fpr degrades with est (and Spark's BloomFilterAggregate
    * has its own silent ceilings: estimatedNumItems clamps to
    * spark.sql.optimizer.runtime.bloomFilter.maxNumItems, default 4M,
    * numBits to ...bloomFilter.maxNumBits, default 1 << 26) —
    * correctness is untouched wherever an exact verify follows, but
    * probe SELECTIVITY decays, so warn loudly instead of silently
    * (ADVICE r8). Shared by [[decontaminate]] and the streaming twin
    * ([[graft.streaming.EventStream.decontaminateDocs]]). */
  private[graft] def bloomBytesFor(eg: DataFrame, est0: Long): Array[Byte] = {
    val s = eg.sparkSession
    graft.functions.GraftFunctions.register(s)
    val est = math.max(est0, 1L)
    val numBits = math.min(math.max(est * 10L, 1L << 16), 1L << 26)
    if (est * 10L > numBits || est > s.conf.getOption(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
        .map(_.toLong).getOrElse(4L * 1000 * 1000))
      log.warn(s"decontaminate bloom: $est eval grams exceed the " +
        s"10-bits/item design point at numBits=$numBits (or Spark's " +
        "bloomFilter.maxNumItems clamp) — answers stay exact via the " +
        "verify join, but probe selectivity degrades; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits} " +
        "to restore the ~1% fpr design point")
    eg.agg(call_function("bloom_build", col("g"), lit(est), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  def decontaminate(trainGrams: DataFrame, evalGrams: DataFrame,
                    regime: String = "auto",
                    broadcastMaxGrams: Long = DecontamBroadcastMaxGrams,
                    probeMinGrams: Long = DecontamAutoProbeMinGrams,
                    probeHighHitRate: Double = DecontamProbeHighHitRate): DataFrame = {
    val s = trainGrams.sparkSession
    graft.functions.GraftFunctions.register(s)
    def overlap(joined: DataFrame): DataFrame = joined
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= 5)
    def broadcastPlan(eg: DataFrame): DataFrame =
      overlap(trainGrams.join(broadcast(eg), "g"))
    def bloomPlan(eg: DataFrame, bf: Array[Byte]): DataFrame = {
      // bf is null only when the eval side is empty — nothing can
      // overlap, and the exact join says so on its own
      val survivors =
        if (bf == null) trainGrams
        else trainGrams.filter(call_function("might_contain", lit(bf), col("g")))
      overlap(survivors.join(eg.hint("shuffle_hash"), "g"))
    }
    regime match {
      case "broadcast" => broadcastPlan(evalGrams.select("g").distinct())
      case "bloom" =>
        val eg = evalGrams.select("g").distinct().localCheckpoint()
        bloomPlan(eg, bloomBytesFor(eg, eg.count()))
      case "auto" =>
        val eg = evalGrams.select("g").distinct().localCheckpoint()
        val n = eg.count()
        if (n > broadcastMaxGrams) bloomPlan(eg, bloomBytesFor(eg, n))
        else if (n <= probeMinGrams) broadcastPlan(eg)
        else {
          // middle band: the regime hinges on corpus hit rate (SCALE.md
          // r9 (a) finding 2). The bloom regime needs the bitset anyway,
          // so build it, probe a bounded INTERLEAVED corpus-gram sample
          // (equal share of every partition's prefix — a global stream
          // prefix read adversarially ordered corpora as ~0%, r10
          // verdict #2), and decide.
          val bf = bloomBytesFor(eg, n)
          val gdf = trainGrams.select("g")
          val nParts = math.max(1, gdf.queryExecution.toRdd.getNumPartitions)
          val perPart = math.max(1L,
            (DecontamProbeSampleGrams.toLong + nParts - 1) / nParts).toInt
          import s.implicits._
          val sample = gdf.as[String].mapPartitions(_.take(perPart)).toDF("g")
            .agg(
              sum(when(call_function("might_contain", lit(bf), col("g")), 1L)
                .otherwise(0L)).as("hits"),
              count(lit(1)).as("n"))
            .head()
          val sampled = sample.getLong(1)
          val hitRate =
            if (sampled == 0L) 1.0 // empty corpus: either plan is free
            else sample.getLong(0).toDouble / sampled
          if (hitRate >= probeHighHitRate) broadcastPlan(eg)
          else bloomPlan(eg, bf)
        }
      case other => sys.error(
        s"decontaminate regime must be 'auto', 'broadcast' or 'bloom', got '$other'")
    }
  }

  /** The ONE quality-score definition: t07 reports it per-doc, t17
    * gates on it, t20 tunes its threshold — spelled once per engine so
    * the three can never drift. Intermediates are selected as NAMED
    * columns (n_words, punct_ratio, digit_ratio) and `score` computes
    * from those names. */
  private object Quality {
    // spark-side expression strings
    val nWords = "size(split(text, ' '))"
    // r14 (guide §4.1 — prefer built-ins): the class-member count was
    // spelled length(regexp_replace(text, '[^C]', '')) — a full regex
    // engine pass + replaced-string build per document just to count
    // characters. length(text) - length(translate(text, C, '')) is the
    // same code-point count (translate deletes exactly the class
    // members; both sides count code points) through the codegen'd
    // StringTranslate built-in, no regex. Value-identical by
    // construction; the DuckDB oracle keeps the regexp spelling.
    val punct =
      "CAST(length(text) - length(translate(text, '.!?,;', '')) AS DOUBLE) / length(text)"
    val digit =
      "CAST(length(text) - length(translate(text, '0123456789', '')) AS DOUBLE) / length(text)"
    val score =
      """CASE WHEN n_words >= 10 THEN 1.0 ELSE n_words / 10.0 END
         * (1.0 - punct_ratio) * (1.0 - digit_ratio)"""
    // duckdb-side spellings of the same expressions
    val duckNWords = "LEN(STRING_SPLIT(text, ' '))"
    val duckPunct =
      "CAST(LENGTH(REGEXP_REPLACE(text, '[^.!?,;]', '', 'g')) AS DOUBLE) / LENGTH(text)"
    val duckDigit =
      "CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS DOUBLE) / LENGTH(text)"
    val duckScore =
      """CASE WHEN n_words >= 10 THEN 1.0 ELSE n_words / 10.0 END
         * (1.0 - punct_ratio) * (1.0 - digit_ratio)"""
  }

  /** Word 3-shingle set of a `ws` token-array column — ONE spelling
    * shared by the batch pipeline (t02) and the streaming ingest filter
    * (`EventStream.nearDedupDocs`), so the two can never diverge.
    * Non-nullable by construction (the `coalesce(.., array())` is
    * load-bearing — see the t02 comment on InferFiltersFromConstraints);
    * empty for sub-3-word docs so the sequence bound never goes
    * negative. */
  private[graft] val shingleSql: String =
    // r14: fused kernel (WordGrams — statically non-null, so the CASE
    // stays non-nullable without the old coalesce); bit-identical to
    // the array_distinct(transform(...)) spelling on the size >= 3
    // branch (FunctionsSpec parity)
    "CASE WHEN size(ws) >= 3 THEN word_grams(ws, 3) ELSE array() END"

  /** The 16 minhash lanes over a per-shingle md5-hex array column: 4
    * disjoint 32-bit digest lanes x 4 cyclic rotations, each an in-row
    * `array_min` fold. Fixed-width lowercase hex makes lexicographic
    * MIN == numeric MIN. Shared by t02 and the streaming near-dup
    * filter; the DuckDB oracle reproduces the same slicing verbatim. */
  private[graft] def minhashLanes(hd: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    (0 until 16).map { j =>
      val base0 = (j % 4) * 8      // which 8-hex-char lane
      val rot = (j / 4) * 2        // cyclic rotation within it
      array_min(transform(hd, h => concat(
        substring(h, base0 + rot + 1, 8 - rot),
        substring(h, base0 + 1, rot))))
    }

  /** The t02 MinHash+LSH near-dup pipeline as oracle SQL — shared by
    * t02 (raw pairs) and t14 (connected-component cluster rollup). */
  private val minhashPairsOracle: String =
    """WITH base AS (
          SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents
          WHERE LEN(STRING_SPLIT(LOWER(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
          UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM base),
        shd AS (SELECT doc_id, MD5(shingle) AS hd FROM sh),
        mh AS (SELECT doc_id, j,
            MIN(SUBSTRING(hd, CAST((j % 4) * 8 + (j // 4) * 2 + 1 AS INT), CAST(8 - (j // 4) * 2 AS INT))
             || SUBSTRING(hd, CAST((j % 4) * 8 + 1 AS INT), CAST((j // 4) * 2 AS INT))) AS sig
          FROM shd, (SELECT UNNEST(RANGE(0, 16)) AS j) jt GROUP BY doc_id, j),
        sigs AS (SELECT doc_id, LIST(sig ORDER BY j) AS sl FROM mh GROUP BY doc_id),
        bands AS (SELECT doc_id,
          UNNEST(LIST_TRANSFORM(RANGE(0, 4),
            b -> CAST(b AS VARCHAR) || ':' || sl[b+1] || '|' || sl[b+5] || '|' || sl[b+9] || '|' || sl[b+13])) AS band_key
          FROM sigs),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS ni FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
          GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b,
          CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS jaccard
        FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
        WHERE CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) >= 0.8"""

  val entries: Seq[QueryEntry] = Seq(

    // ------------------------------------------------------------------
    // Exact dedup: content-hash groups per source (hash-groupBy; at
    // scale this is one shuffle on md5(text)).
    QueryEntry("t01_dedup_exact",
      (s, d) => {
        docs(s, d).groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
        COUNT(DISTINCT MD5(text)) AS n_unique,
        COUNT(*) - COUNT(DISTINCT MD5(text)) AS n_dups
        FROM documents GROUP BY source""")),

    // ------------------------------------------------------------------
    // MinHash + LSH near-dedup: word 3-shingles -> 16 minhashes ->
    // 4 bands of 4 -> band-bucket self-join for candidates -> exact
    // Jaccard verification on candidates only.
    QueryEntry("t02_minhash_lsh",
      (s, d) => {
        // Fully in-row signature computation: per document, the
        // distinct-shingle set, ONE md5 per shingle, 16 minhash lanes
        // as array_min folds over the digest array, and a sorted
        // xxhash64 fingerprint for the verification kernel — all in
        // narrow projections with ZERO shuffles before candidate
        // generation. (r1 exploded shingles to rows and ran a 16-agg
        // groupBy — a corpus-word-count-sized shuffle that existed
        // only to compute a per-doc min; the in-row fold deletes that
        // stage entirely, which also makes the query insensitive to
        // scheduler latency: fewer stages, fewer barriers.)
        // The only shuffles left are the band-bucket self-join of a
        // 4-rows-per-doc table and the two candidate->fingerprint
        // joins; candidates verify via the codegen'd sorted-merge
        // intersection (same kernel as t04). 64-bit fingerprint
        // collisions are the t04 argument: negligible.
        graft.functions.GraftFunctions.register(s)
        // The corpus lands as few/large parquet row groups; without an
        // explicit repartition the per-row CPU below runs on the scan's
        // handful of partitions. CPU-bound stages must not inherit the
        // scan's partitioning — hash-distribute by doc_id first.
        //
        // The coalesce(.., array()) is load-bearing: it makes `sh`
        // statically non-nullable, so InferFiltersFromConstraints has
        // no isnotnull(..) to derive from the final jaccard filter.
        // Without it, Catalyst infers isnotnull over the DOWNSTREAM
        // size/sort_array expressions, substitutes the whole shingle
        // pipeline into that predicate during pushdown, and evaluates
        // it inside the SINGLE-TASK scan filter below the repartition
        // (measured: 4.6 s single-threaded at sf0.1) — and the
        // branch-specific inferred filters also make the four consumer
        // subtrees non-identical, defeating exchange reuse.
        val raw = docs(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .selectExpr("doc_id", s"$shingleSql AS sh")
          // FUSED kernel (round 7): one pass computes the shingle
          // count, 16 md5 minhash lanes, and the distinct sorted
          // xxhash fingerprints — replacing one md5 transform, 16
          // array_min lane folds, and an xxhash transform+sort of
          // interpreted HOF evaluation per document. Bit-identical
          // (mins and sorted sets are order-free); oracle untouched.
          .selectExpr("doc_id", "shingle_sig(sh, false, true) AS sig")
          .selectExpr("doc_id", "sig.n AS n", "sig.hs AS hs", "sig.sl AS sl")
        // 16 minhash lanes = cheap string slices of the single 32-hex
        // digest: 4 disjoint 32-bit lanes x 4 cyclic rotations.
        // Fixed-width lowercase hex means lexicographic MIN == numeric
        // MIN, and the same slicing is reproduced verbatim in the
        // DuckDB oracle. Each lane is an in-row array_min fold.
        //
        // The trailing repartition is a MATERIALIZATION point, not a
        // distribution change: it puts an exchange ABOVE the per-doc
        // md5/minhash/fingerprint compute, so the four consumers below
        // (two band-join sides, two fingerprint-join sides) reuse ONE
        // computed copy via exchange reuse instead of re-running the
        // hash pipeline four times. Payload is doc_id + 16 slices + the
        // 64-bit fingerprint set (~1 KB/doc) — far smaller than
        // re-reading and re-hashing the corpus text per branch, at any
        // scale. It also leaves the data hash-clustered by doc_id,
        // which the fingerprint joins then consume without a further
        // shuffle on their build side.
        val sigs = raw
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // Band grouping: band b takes lane b's four ROTATIONS (indices
        // b, b+4, b+8, b+12), so each band reads a DISJOINT 32-bit
        // digest lane — bands are independent families, which is what
        // the OR-across-bands recall argument needs. (Grouping by
        // rotation instead would make every band a function of the
        // same four lanes — correlated misses.) Within a band the four
        // mins are correlated orderings of one lane; that only inflates
        // candidates, and verification filters those exactly.
        val bands = sigs.selectExpr("doc_id",
          """explode(transform(sequence(0, 3),
               b -> concat(b, ':', sl[b], '|', sl[b+4], '|', sl[b+8], '|', sl[b+12]))) AS band_key""")
        val cand = bands.select(col("doc_id").as("doc_a"), col("band_key"))
          // corpus-sized both sides: shuffle on the band key (that IS
          // the LSH bucketing), never broadcast
          .join(bands.select(col("doc_id").as("doc_b"), col("band_key")).hint("SHUFFLE_HASH"), "band_key")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        // Verification: candidates re-join the per-doc fingerprints
        // (column pruning drops hd/sl from this branch, so the md5
        // work is not recomputed here) and count the intersection with
        // the codegen'd sorted-merge kernel. Both fingerprint sides
        // prune sigs to the same (doc_id, n, hs) columns, so they share
        // one reused exchange — and sigs is already hash-clustered by
        // doc_id, the join key, so neither build side re-shuffles.
        val hsets = sigs.select(col("doc_id"), col("n"), col("hs"))
        cand
          // hsets is corpus-sized: shuffle-hash on the unique doc key,
          // never broadcast (VERDICT r1 scale rule)
          .join(hsets.select(col("doc_id").as("doc_a"), col("n").as("na"), col("hs").as("ha"))
            .hint("SHUFFLE_HASH"), "doc_a")
          .join(hsets.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("hs").as("hb"))
            .hint("SHUFFLE_HASH"), "doc_b")
          .selectExpr("doc_a", "doc_b", "na", "nb", "sorted_intersect_size(ha, hb) AS ni")
          .select(col("doc_a"), col("doc_b"),
            (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
      },
      Some(minhashPairsOracle)),

    // ------------------------------------------------------------------
    // SimHash signatures: 64-bit signature from md5(word) nibbles,
    // per-bit majority vote weighted by term frequency.
    QueryEntry("t03_simhash",
      (s, d) => simhashSigs(s, d),
      Some(s"""WITH $oSimhashSigs SELECT doc_id, simhash FROM sigs""")),

    // ------------------------------------------------------------------
    // SimHash near-dup PAIRS — Manku/Google web-dedup: hamming <= 3
    // over the 64-bit signatures via block-combination bands
    // (pigeonhole: the <= 3 differing bits fall in <= 3 blocks, so the
    // pair agrees exactly on SOME choice of B-3 blocks — the band
    // equi-join over all C(B,3) choices generates every true pair,
    // never all-pairs). Geometry is corpus-size-adaptive (see
    // [[simhashBlocksFor]]); the OUTPUT is geometry-invariant by the
    // pigeonhole argument, so the oracle never changes.
    QueryEntry("t21_simhash_pairs",
      (s, d) => simhashPairs(s, d),
      Some(s"""WITH $oSimhashSigs,
        bands AS (SELECT doc_id, simhash, b AS band,
            SUBSTRING(simhash, b * 16 + 1, 16) AS bval
          FROM sigs, (SELECT UNNEST(RANGE(0, 4)) AS b) bs),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.simhash AS sa, b.simhash AS sb
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
        scored AS (SELECT doc_a, doc_b,
            CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
              i -> CASE WHEN SUBSTRING(sa, i, 1) <> SUBSTRING(sb, i, 1)
                   THEN 1 ELSE 0 END)) AS INT) AS hamming
          FROM cand)
        SELECT DISTINCT doc_a, doc_b, hamming FROM scored WHERE hamming <= 3""")),

    // ------------------------------------------------------------------
    // Character 5-gram Jaccard near-dup, blocked by source. Candidate
    // generation is the SAME 16-lane/4-band minhash family t02 uses —
    // over the gram md5s instead of word shingles — so the pair space
    // is band-bucket-bounded (linear in corpus size), never the
    // within-block quadratic the r5 sf1 bench measured (46.5 s for 10x
    // rows under the old (source, length-bucket) join). The oracle
    // reproduces the banding verbatim, so Spark == DuckDB is exact BY
    // CONSTRUCTION; the banding's recall against brute-force all-pairs
    // is measured separately in TextRecallSpec (the t02 discipline).
    QueryEntry("t04_ngram_jaccard",
      (s, d) => {
        // Exact verification with a codegen'd kernel: each doc's gram
        // set is hashed+sorted ONCE (xxhash64 per gram, 64-bit
        // fingerprint — collision odds are negligible and a collision
        // could only nudge one intersection count by 1); every
        // candidate pair is then one allocation-free sorted-merge count
        // (graft.functions.SortedIntersectSize) inside whole-stage
        // codegen, after a length-ratio prefilter. Both filters are
        // result-neutral relative to the oracle: ratio < 0.6 implies
        // jaccard <= min/max < 0.6, so the oracle needs neither.
        graft.functions.GraftFunctions.register(s)
        // Same scan-parallelism policy as t02: the gram hashing/sorting
        // and the pair kernel below are pure CPU — spread them across
        // all cores, not the scan's row-group count. The trailing
        // repartition on sigs is the t02 materialization point: one
        // computed copy of the md5/minhash/fingerprint work feeds all
        // four join branches via exchange reuse.
        // FUSED signature kernel (round 7): char_grams emits the gram
        // array in one generated loop and shingle_sig computes distinct
        // count + 16 md5 lanes + sorted xxhash fingerprints in ONE pass
        // — the relational spelling ran ~19 interpreted HOF passes per
        // doc (2.9B lane lambda evals at sf10). Outputs bit-identical
        // (mins and sorted sets are order-free); oracle untouched.
        val sigs = docs(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .selectExpr("doc_id", "source",
            "shingle_sig(char_grams(text, 5), true, false) AS sig")
          .selectExpr("doc_id", "source", "sig.n AS n", "sig.hs AS hs", "sig.sl AS sl")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // Band grouping identical to t02: band b = lane b's four
        // rotations, each band a disjoint 32-bit digest lane. The
        // source column rides along so the equi-join key is
        // (source, band_key) — same-source pairs only, as before. The
        // gram count n rides along too: the length-ratio prefilter
        // (jaccard <= min/max, so ratio < 0.6 implies jaccard < 0.6 —
        // result-neutral) runs INSIDE the band join, before the
        // distinct, so impossible pairs never reach the dedup shuffle
        // or the verify joins.
        val bands = sigs.selectExpr("doc_id", "source", "n",
          """explode(transform(sequence(0, 3),
               b -> concat(b, ':', sl[b], '|', sl[b+4], '|', sl[b+8], '|', sl[b+12]))) AS band_key""")
        // Corpus-sized both sides: shuffle on the band key (that IS the
        // LSH bucketing), never broadcast.
        val cand = bands.select(col("source"), col("doc_id").as("doc_a"), col("n").as("na"), col("band_key"))
          .join(bands.select(col("source"), col("doc_id").as("doc_b"), col("n").as("nb"), col("band_key"))
            .hint("SHUFFLE_HASH"), Seq("source", "band_key"))
          .filter(col("doc_a") < col("doc_b"))
          .filter(least(col("na"), col("nb")).cast("double") >=
            greatest(col("na"), col("nb")) * 0.6)
          .select("doc_a", "doc_b").distinct()
        val hsets = sigs.select(col("doc_id"), col("n"), col("hs"))
        cand
          .join(hsets.select(col("doc_id").as("doc_a"), col("n").as("na"), col("hs").as("ha"))
            .hint("SHUFFLE_HASH"), "doc_a")
          .join(hsets.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("hs").as("hb"))
            .hint("SHUFFLE_HASH"), "doc_b")
          .selectExpr("doc_a", "doc_b", "na", "nb",
            "sorted_intersect_size(ha, hb) AS ni")
          .select(col("doc_a"), col("doc_b"),
            (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
          .filter(col("jaccard") >= 0.6)
      },
      Some("""WITH grams AS (SELECT doc_id, source,
          LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 4, 1) + 1),
            i -> SUBSTRING(text, i, 5))) AS gs
          FROM documents),
        shd AS (SELECT doc_id, MD5(UNNEST(gs)) AS hd FROM grams),
        mh AS (SELECT doc_id, j,
            MIN(SUBSTRING(hd, CAST((j % 4) * 8 + (j // 4) * 2 + 1 AS INT), CAST(8 - (j // 4) * 2 AS INT))
             || SUBSTRING(hd, CAST((j % 4) * 8 + 1 AS INT), CAST((j // 4) * 2 AS INT))) AS sig
          FROM shd, (SELECT UNNEST(RANGE(0, 16)) AS j) jt GROUP BY doc_id, j),
        sigs AS (SELECT doc_id, LIST(sig ORDER BY j) AS sl FROM mh GROUP BY doc_id),
        bands AS (SELECT s.doc_id, g.source,
          UNNEST(LIST_TRANSFORM(RANGE(0, 4),
            b -> CAST(b AS VARCHAR) || ':' || sl[b+1] || '|' || sl[b+5] || '|' || sl[b+9] || '|' || sl[b+13])) AS band_key
          FROM sigs s JOIN grams g USING (doc_id)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.source = b.source AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
          CAST(LEN(LIST_INTERSECT(ga.gs, gb.gs)) AS DOUBLE) /
            (LEN(ga.gs) + LEN(gb.gs) - LEN(LIST_INTERSECT(ga.gs, gb.gs))) AS jaccard
        FROM cand c
          JOIN grams ga ON ga.doc_id = c.doc_a
          JOIN grams gb ON gb.doc_id = c.doc_b
        WHERE CAST(LEN(LIST_INTERSECT(ga.gs, gb.gs)) AS DOUBLE) /
            (LEN(ga.gs) + LEN(gb.gs) - LEN(LIST_INTERSECT(ga.gs, gb.gs))) >= 0.6""")),

    // ------------------------------------------------------------------
    // Document fingerprints: whole-doc content hash over normalized text
    // + a winnowing-style min-hash over character 8-grams.
    QueryEntry("t05_fingerprint",
      (s, d) => {
        // rolling_fp via the fused [[graft.functions.MinGramMd5]]
        // kernel — bit-identical to the HOF spelling (parity-asserted
        // in FunctionsSpec), which paid interpreted-lambda dispatch per
        // character window
        graft.functions.GraftFunctions.register(s)
        docs(s, d)
          .select(col("doc_id"),
            trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
          .selectExpr("doc_id", "md5(norm) AS fp",
            "min_gram_md5(norm, 8) AS rolling_fp")
      },
      Some("""SELECT doc_id, MD5(norm) AS fp,
          LIST_MIN(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(norm) - 7, 1) + 1),
            i -> MD5(SUBSTRING(norm, i, 8)))) AS rolling_fp
        FROM (SELECT doc_id,
          TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS norm
          FROM documents) t""")),

    // ------------------------------------------------------------------
    // Language ID: stopword-dictionary hit scoring (n-gram heuristic).
    QueryEntry("t06_langid",
      (s, d) => {
        docs(s, d)
          .select(col("doc_id"), col("lang"), split(lower(col("text")), " ").as("ws"))
          .selectExpr("doc_id", "lang",
            "size(array_intersect(ws, array('the','a','of','is','and','to','in'))) AS s_en",
            "size(array_intersect(ws, array('el','la','de','es','y','en','que'))) AS s_es",
            "size(array_intersect(ws, array('le','la','de','et','un','une','que'))) AS s_fr",
            "size(array_intersect(ws, array('der','die','das','und','ist','ein','zu'))) AS s_de")
          .selectExpr("doc_id", "lang",
            """CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                 WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                 WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                 WHEN s_fr >= s_de THEN 'fr'
                 ELSE 'de' END AS pred_lang""",
            "s_en", "s_es", "s_fr", "s_de")
      },
      Some("""WITH x AS (SELECT doc_id, lang, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents),
        sc AS (SELECT doc_id, lang,
          LEN(LIST_INTERSECT(ws, ['the','a','of','is','and','to','in'])) AS s_en,
          LEN(LIST_INTERSECT(ws, ['el','la','de','es','y','en','que'])) AS s_es,
          LEN(LIST_INTERSECT(ws, ['le','la','de','et','un','une','que'])) AS s_fr,
          LEN(LIST_INTERSECT(ws, ['der','die','das','und','ist','ein','zu'])) AS s_de
          FROM x)
        SELECT doc_id, lang,
          CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
               WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
               WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
               WHEN s_fr >= s_de THEN 'fr'
               ELSE 'de' END AS pred_lang,
          s_en, s_es, s_fr, s_de
        FROM sc""")),

    // ------------------------------------------------------------------
    // Quality scoring: length / punctuation / stopword / digit ratios +
    // a composite score. All int/int double divisions — bit-identical.
    QueryEntry("t07_quality",
      (s, d) => {
        docs(s, d)
          .selectExpr("doc_id",
            "length(text) AS n_chars_obs",
            s"${Quality.nWords} AS n_words",
            s"${Quality.punct} AS punct_ratio",
            s"${Quality.digit} AS digit_ratio",
            """CAST(size(filter(split(lower(text), ' '),
                 w -> array_contains(array('the','a','of','is','and','to','in'), w))) AS DOUBLE)
               / size(split(text, ' ')) AS stopword_ratio""")
          .selectExpr("doc_id", "n_chars_obs", "n_words", "punct_ratio",
            "digit_ratio", "stopword_ratio",
            s"${Quality.score} AS quality_score")
      },
      Some(s"""WITH x AS (SELECT doc_id,
          LENGTH(text) AS n_chars_obs,
          ${Quality.duckNWords} AS n_words,
          ${Quality.duckPunct} AS punct_ratio,
          ${Quality.duckDigit} AS digit_ratio,
          CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
            w -> LIST_CONTAINS(['the','a','of','is','and','to','in'], w))) AS DOUBLE)
            / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio
          FROM documents)
        SELECT doc_id, n_chars_obs, n_words, punct_ratio, digit_ratio, stopword_ratio,
          ${Quality.duckScore} AS quality_score
        FROM x""")),

    // ------------------------------------------------------------------
    // Token counting: whitespace + BPE-ish regex tokenization.
    QueryEntry("t08_tokens",
      (s, d) => {
        docs(s, d).selectExpr("doc_id",
          "size(split(text, ' ')) AS ws_tokens",
          "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS re_tokens",
          "length(text) AS n_chars_obs",
          "CAST(length(text) AS DOUBLE) / size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS chars_per_token")
      },
      Some("""SELECT doc_id,
        LEN(STRING_SPLIT(text, ' ')) AS ws_tokens,
        LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
        LENGTH(text) AS n_chars_obs,
        CAST(LENGTH(text) AS DOUBLE) / LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS chars_per_token
        FROM documents""")),

    // ------------------------------------------------------------------
    // PII redaction: regex scrub of emails / NANP-style phone numbers /
    // IPv4 addresses before training. The synthetic corpus carries no
    // PII, so both engines first INJECT deterministic fake PII into a
    // doc_id-keyed subset (identical spelling both sides), then redact
    // — the counts prove the scrubber fires, and the distinct-hash of
    // the redacted text proves the rewrite is byte-identical. At scale
    // this is one narrow regexp pass, no shuffle except the final
    // per-source rollup.
    QueryEntry("t10_pii_redact",
      (s, d) => {
        // regexes via the Column API: Scala strings reach the regex
        // engine verbatim (selectExpr would re-process backslashes in
        // SQL literals)
        val eRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val pRe = "\\+1-555-0[0-9]{3}"
        val iRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
        docs(s, d)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 7 === 0,
                concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com")))
              .when(col("doc_id") % 11 === 0,
                concat(col("text"), lit(" call +1-555-0"),
                  lpad((col("doc_id") % 1000).cast("string"), 3, "0")))
              .when(col("doc_id") % 13 === 0,
                concat(col("text"), lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".1")))
              .otherwise(col("text")).as("raw"))
          .select(col("doc_id"), col("source"),
            size(regexp_extract_all(col("raw"), lit(eRe), lit(0))).as("n_emails"),
            size(regexp_extract_all(col("raw"), lit(pRe), lit(0))).as("n_phones"),
            size(regexp_extract_all(col("raw"), lit(iRe), lit(0))).as("n_ips"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              eRe, "<EMAIL>"), pRe, "<PHONE>"), iRe, "<IP>").as("clean"))
          .groupBy(col("source"))
          .agg(sum(col("n_emails")).as("emails"),
            sum(col("n_phones")).as("phones"),
            sum(col("n_ips")).as("ips"),
            count(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1)).as("docs_touched"),
            countDistinct(md5(col("clean"))).as("distinct_clean"))
      },
      Some("""WITH injected AS (SELECT doc_id, source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               WHEN doc_id % 11 = 0 THEN text || ' call +1-555-0' || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               WHEN doc_id % 13 = 0 THEN text || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               ELSE text END AS raw
          FROM documents),
        scrubbed AS (SELECT doc_id, source,
          LEN(REGEXP_EXTRACT_ALL(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          LEN(REGEXP_EXTRACT_ALL(raw, '\+1-555-0[0-9]{3}')) AS n_phones,
          LEN(REGEXP_EXTRACT_ALL(raw, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips,
          REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\+1-555-0[0-9]{3}', '<PHONE>', 'g'),
            '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS clean
          FROM injected)
        SELECT source, CAST(SUM(n_emails) AS BIGINT) AS emails,
          CAST(SUM(n_phones) AS BIGINT) AS phones,
          CAST(SUM(n_ips) AS BIGINT) AS ips,
          COUNT(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 END) AS docs_touched,
          COUNT(DISTINCT MD5(clean)) AS distinct_clean
        FROM scrubbed GROUP BY source""")),

    // ------------------------------------------------------------------
    // Within-document repetition metrics (Gopher-style quality rules):
    // duplicate-word fraction and most-frequent-bigram fraction, the
    // signals used to drop boilerplate/spam before training. The
    // bigram mode is computed via explode + per-(doc,gram) count + max
    // — two shuffles, both linear in corpus size, skew-free (keys are
    // (doc_id, gram)).
    QueryEntry("t11_repetition",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val base = docs(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .selectExpr("doc_id", "split(lower(text), ' ') AS ws")
          .filter(size(col("ws")) >= 2)
        val wordStats = base.selectExpr("doc_id",
          "size(ws) AS n_words",
          "size(array_distinct(ws)) AS n_distinct")
        // r14: non-dedupe mode of the fused gram kernel (the metric
        // needs occurrence counts) — was the interpreted
        // transform/concat_ws HOF per bigram
        val topBigram = base
          .selectExpr("doc_id", "explode(word_grams(ws, 2, false)) AS gram")
          .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"),
            sum(col("c")).as("n_bigrams"))
        wordStats.join(topBigram, "doc_id")
          .selectExpr("doc_id", "n_words",
            "round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac",
            "round(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac",
            "CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_words > 0.9 AS BOOLEAN) AS repetitive")
      },
      Some("""WITH base AS (
          SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents
          WHERE LEN(STRING_SPLIT(LOWER(text), ' ')) >= 2),
        wordstats AS (SELECT doc_id, LEN(ws) AS n_words,
            LEN(LIST_DISTINCT(ws)) AS n_distinct FROM base),
        grams AS (SELECT doc_id,
            UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
              i -> ws[i] || ' ' || ws[i+1])) AS gram FROM base),
        gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram),
        tb AS (SELECT doc_id, MAX(c) AS top_bigram_n, CAST(SUM(c) AS BIGINT) AS n_bigrams
          FROM gc GROUP BY doc_id)
        SELECT w.doc_id, w.n_words,
          ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
          ROUND(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac,
          (1.0 - CAST(n_distinct AS DOUBLE) / n_words) > 0.9 AS repetitive
        FROM wordstats w JOIN tb ON tb.doc_id = w.doc_id""")),

    // ------------------------------------------------------------------
    // Deterministic train/val/test split: assignment is a pure function
    // of a content-independent key hash (the q24 cross-engine trick —
    // md5 hex compares identically in both engines), so the split is
    // reproducible, join-free, and stable under re-partitioning /
    // re-ingestion — the property a 100 TB training pipeline actually
    // needs (no sampling state, no shuffle; splits recoverable from the
    // key alone).
    QueryEntry("t12_split",
      (s, d) => {
        docs(s, d)
          .selectExpr("doc_id", "source",
            """CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) < 'd' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) < 'f' THEN 'val'
                    ELSE 'test' END AS split""")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""SELECT source,
          CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
               WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val'
               ELSE 'test' END AS split,
          COUNT(*) AS n_docs
        FROM documents GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Benchmark decontamination: flag training documents sharing word
    // 5-grams with a held-out eval set (here the deterministic
    // doc_id % 17 subset standing in for an eval benchmark). The
    // classic pre-training hygiene step: eval grams are deduped, the
    // overlap join runs on the gram string (one shuffle, keys are
    // grams — high cardinality, skew-free), and each training doc
    // reports how many of its distinct 5-grams appear anywhere in the
    // eval set. The eval side is benchmark-sized BY CONTRACT (a
    // held-out eval suite, not the corpus), so the planner's broadcast
    // of the deduped eval grams is the correct 100 TB plan: the
    // corpus-sized gram stream flows map-side against it, no shuffle
    // of the big side at all (asserted in PlanSpec).
    QueryEntry("t13_decontaminate",
      (s, d) => {
        // `grams` feeds both branches, but this is NOT double compute:
        // the %17 filters are deterministic doc_id predicates, so
        // Catalyst pushes them below the explode/split into each
        // branch's scan — the eval branch processes 1/17 of the rows,
        // the train branch the other 16/17; total gram work ~= one
        // corpus pass, split disjointly. Since round 9 the three
        // decontamination entries are ONE operator ([[decontaminate]])
        // in its three regimes; this one forces broadcast (fully lazy,
        // the entry contract).
        val grams = wordFiveGrams(s, d)
        decontaminate(
          grams.filter(col("doc_id") % 17 =!= 0),
          grams.filter(col("doc_id") % 17 === 0),
          regime = "broadcast")
      },
      Some(oDecontaminate)),

    // ------------------------------------------------------------------
    // Near-duplicate cluster resolution: connected components over the
    // t02 pair graph — the step that turns pairwise "A~B" into "keep
    // one doc per duplicate cluster". Spark-first iterative min-label
    // propagation: each round joins edge endpoints to current labels
    // and takes the per-node min (the public Hash-to-Min / GraphX
    // pattern); rounds = graph diameter (dup clusters are near-cliques
    // — 2-3 rounds), each round one join + one aggregation, both
    // shuffle-parallel on node keys. localCheckpoint truncates the
    // iterative lineage. The fixpoint check rides ON the checkpoint
    // materialization via observe() — ONE action per round (r5 verdict:
    // the separate changed-labels count() doubled the short-stage count
    // and amplified 19x under host contention; an iterative loop's
    // driver barriers multiply scheduler latency, so each round must
    // pay exactly one). The oracle computes the same components with a
    // recursive reachability CTE.
    QueryEntry("t14_dup_clusters",
      (s, d) => {
        val pairs = entries.find(_.name == "t02_minhash_lsh").get.fn(s, d)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        val edges = pairs.union(
          pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        var labels = edges.select(col("doc_a").as("node")).distinct()
          .withColumn("label", col("node")).localCheckpoint()
        var changed = 1L
        var rounds = 0
        while (changed > 0 && rounds < 25) { // 25 >> any real dup-graph diameter
          // SHUFFLE_HASH (r14, guide §3.1): checkpointed RDDs carry no
          // stats, so both per-round joins planned as SortMergeJoin —
          // re-sorting the edge and label streams every round. Hash
          // joins drop the sorts; rows identical (strategy only).
          val nbrMin = edges
            .join(labels.select(col("node").as("doc_b"), col("label"))
              .hint("SHUFFLE_HASH"), "doc_b")
            .groupBy(col("doc_a").as("node")).agg(min(col("label")).as("nbr_label"))
          // the changed-count is an observed metric of the SAME job that
          // materializes the checkpoint — no second pass, no extra stages
          val obs = new org.apache.spark.sql.Observation(s"t14_changed_r$rounds")
          val next = labels.join(nbrMin.hint("SHUFFLE_HASH"), Seq("node"), "left")
            .select(col("node"), col("label"),
              least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"))
            .observe(obs, coalesce(sum(when(col("new_label") =!= col("label"), 1L)
              .otherwise(0L)), lit(0L)).as("changed"))
            .localCheckpoint()
          changed = obs.get("changed").asInstanceOf[Long]
          labels = next.select(col("node"), col("new_label").as("label"))
          rounds += 1
        }
        require(changed == 0, s"label propagation did not converge in $rounds rounds")
        labels.groupBy(col("label").as("cluster"))
          .agg(count(lit(1)).as("n_docs"), (count(lit(1)) - 1).as("n_removable"))
      },
      Some(s"""WITH pairs AS ($minhashPairsOracle),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach AS (
          WITH RECURSIVE walk(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node)
          SELECT node, MIN(label) AS cluster FROM walk GROUP BY node)
        SELECT cluster, COUNT(*) AS n_docs, COUNT(*) - 1 AS n_removable
        FROM reach GROUP BY cluster""")),

    // ------------------------------------------------------------------
    // Stratified sampling: exactly k docs per source stratum, chosen by
    // a deterministic content-independent hash order (reproducible
    // across runs/engines/partitionings — no RNG state). One window
    // per stratum; at scale this is a single shuffle on the stratum
    // key, and k rows per stratum stream out of each group.
    QueryEntry("t15_stratified_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        docs(s, d)
          .withColumn("rk", md5(concat_ws(":", lit("strat"), col("doc_id"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))))
          .filter(col("rn") <= 10)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"),
            countDistinct(col("doc_id")).as("n_distinct"),
            min(col("rk")).as("first_rk"))
      },
      Some("""WITH ranked AS (SELECT source, doc_id,
          MD5('strat:' || CAST(doc_id AS VARCHAR)) AS rk,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY MD5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
        SELECT source, COUNT(*) AS n_sampled, COUNT(DISTINCT doc_id) AS n_distinct,
          MIN(rk) AS first_rk
        FROM ranked WHERE rn <= 10 GROUP BY source""")),

    // ------------------------------------------------------------------
    // Corpus-statistics scoring: per-word corpus frequencies joined
    // back per document — the unigram-LM-style commonness signal a
    // curation pass thresholds on (a high avg frequency = boilerplate/
    // stopword soup; very low = noise/garble). All-integer math until
    // the final reported ratio, so the hash is exact.
    // Scale shape: explode is linear; word counts are one map-side-
    // combined shuffle on the word key; the join back to occurrences
    // shuffles on the same key. Stopword keys are hot BY DESIGN —
    // AQE's skew-join split handles the join side (PlanSpec asserts
    // the mechanism); the count side is fine because partial
    // aggregation collapses hot keys map-side.
    QueryEntry("t16_word_freq",
      (s, d) => {
        val w = docs(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("word"))
        val wf = w.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        w.join(wf, "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("cnt")).as("sum_cnt"),
            round(sum(col("cnt")).cast("double") / count(lit(1)), 6).as("avg_freq"))
      },
      Some("""WITH w AS (SELECT doc_id,
            UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS word FROM documents),
        wf AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word)
        SELECT doc_id, COUNT(*) AS n_words,
          CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
          ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6) AS avg_freq
        FROM w JOIN wf USING (word)
        GROUP BY doc_id""")),

    // ------------------------------------------------------------------
    // END-TO-END curation pipeline: the composition a pre-training data
    // run actually executes, every stage reusing a derivation already
    // oracle-proven on its own — quality gate (t07 score), exact dedup
    // keeping the smallest doc_id per md5 (t01), benchmark
    // decontamination dropping docs sharing >=5 distinct 5-grams with
    // the eval subset (t13, doc_id % 17 standing in for the benchmark),
    // hash split (t12) — reported as per-(source, split) counts, token
    // totals, and an order-insensitive decimal quality sum.
    // Scale shape: each stage is one bounded shuffle (window on
    // md5(text); gram join vs a broadcast-sized eval side; final
    // groupBy); nothing corpus-sized is collected or broadcast, and
    // dropping a stage never changes another stage's plan — the
    // pipeline is linear, restartable at any materialized boundary.
    QueryEntry("t17_curation_pipeline",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val scored = docs(s, d).selectExpr("doc_id", "source", "text",
            s"${Quality.nWords} AS n_words",
            s"${Quality.punct} AS punct_ratio",
            s"${Quality.digit} AS digit_ratio")
          .selectExpr("doc_id", "source", "text", "n_words",
            s"${Quality.score} AS quality_score")
          .filter(col("quality_score") >= 0.5 && col("n_words") >= 5)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        val kept = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val corpus = kept.filter(col("doc_id") % 17 =!= 0)
        // r14: same fused gram kernel as the decontamination family
        // (was the interpreted transform/concat_ws HOF — see
        // wordFiveGramArraySqlOver)
        def grams(df: org.apache.spark.sql.DataFrame) = df
          .selectExpr("doc_id", "split(lower(text), ' ') AS ws")
          .filter(size(col("ws")) >= 5)
          .selectExpr("doc_id", "explode(word_grams(ws, 5)) AS g")
        val evalGrams = grams(docs(s, d).filter(col("doc_id") % 17 === 0))
          .select("g").distinct()
        val contaminatedIds = grams(corpus).join(evalGrams, "g")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
          .filter(col("n_overlap") >= 5).select("doc_id")
        corpus.join(contaminatedIds, Seq("doc_id"), "left_anti")
          .selectExpr("source", "n_words", "quality_score",
            """CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) < 'd' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) < 'f' THEN 'val'
                    ELSE 'test' END AS split""")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).cast("bigint").as("n_tokens"),
            round(graft.Parity.dsum(col("quality_score")), 6).as("sum_quality"))
      },
      Some(s"""WITH scored AS (SELECT doc_id, source, text,
            ${Quality.duckNWords} AS n_words,
            ${Quality.duckPunct} AS punct_ratio,
            ${Quality.duckDigit} AS digit_ratio
          FROM documents),
        q AS (SELECT doc_id, source, text, n_words,
            ${Quality.duckScore} AS quality_score
          FROM scored),
        gated AS (SELECT * FROM q WHERE quality_score >= 0.5 AND n_words >= 5),
        kept AS (SELECT * FROM (SELECT gated.*,
            ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn FROM gated)
          WHERE rn = 1),
        corpus AS (SELECT * FROM kept WHERE doc_id % 17 <> 0),
        evg AS (SELECT DISTINCT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws) - 3),
              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS g
          FROM (SELECT STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents
                WHERE doc_id % 17 = 0 AND LEN(STRING_SPLIT(LOWER(text), ' ')) >= 5)),
        cg AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws) - 3),
              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS g
          FROM (SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM corpus
                WHERE LEN(STRING_SPLIT(LOWER(text), ' ')) >= 5)),
        contaminated AS (SELECT doc_id FROM cg JOIN evg USING (g)
          GROUP BY doc_id HAVING COUNT(*) >= 5)
        SELECT source,
          CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
               WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val'
               ELSE 'test' END AS split,
          COUNT(*) AS n_docs,
          CAST(SUM(n_words) AS BIGINT) AS n_tokens,
          ROUND(${graft.Parity.oSum("quality_score")}, 6) AS sum_quality
        FROM corpus
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Context-window chunking: split each document into word chunks of
    // size 64 with overlap 16 (stride 48) — the preprocessing step that
    // fits long documents into a model's context window while keeping
    // boundary continuity. Pure expression work: sequence() for chunk
    // starts, slice() for the words — one narrow pass, explode output
    // linear in total tokens / stride. Short docs yield their single
    // whole-doc chunk.
    QueryEntry("t18_chunking",
      (s, d) => {
        docs(s, d)
          .selectExpr("doc_id", "split(text, ' ') AS ws")
          .selectExpr("doc_id", "size(ws) AS n_words",
            "explode(sequence(0, greatest(size(ws) - 17, 0), 48)) AS start", "ws")
          .selectExpr("doc_id", "n_words", "CAST(start / 48 AS BIGINT) AS chunk_id",
            "array_join(slice(ws, start + 1, 64), ' ') AS chunk",
            "least(size(ws) - start, 64) AS chunk_words")
      },
      Some("""WITH base AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
        starts AS (SELECT doc_id, LEN(ws) AS n_words, ws,
            UNNEST(RANGE(0, GREATEST(LEN(ws) - 16, 1), 48)) AS start
          FROM base)
        SELECT doc_id, n_words, CAST(start / 48 AS BIGINT) AS chunk_id,
          ARRAY_TO_STRING(LIST_SLICE(ws, start + 1, start + 64), ' ') AS chunk,
          LEAST(LEN(ws) - start, 64) AS chunk_words
        FROM starts""")),

    // ------------------------------------------------------------------
    // Sequence packing: assign documents to fixed token-budget bins by
    // cumulative token count in a deterministic order — the
    // sample-efficiency step that fills every training sequence instead
    // of padding per document. Deterministic: order is (source,
    // doc_id), budget 2048 whitespace tokens.
    //
    // SCALE: the prefix sum is TWO-LEVEL ([[twoLevelPrefix]], shared
    // with t22), never one serial pass per source. A single
    // Window.partitionBy(source) would funnel each source's entire row
    // set through ONE task (straggler/OOM at 100 TB, where a source is
    // billions of docs). The shard function floor(doc_id / width) is
    // monotone in the doc_id order (width from one column-pruned max()
    // reduce), so the helper's order-alignment contract holds and the
    // "before" values are identical to the serial formulation.
    // PlanSpec gates the shape (no source-only window).
    QueryEntry("t19_packing",
      (s, d) => {
        val base = docs(s, d)
          .selectExpr("doc_id", "source", "size(split(text, ' ')) AS toks")
        val maxId = base.agg(max(col("doc_id"))).head.getLong(0)
        val shards = 256L
        val width = math.max(1L, maxId / shards + 1L)
        twoLevelPrefix(base, "doc_id", (col("doc_id") / lit(width)).cast("long"))
          .selectExpr("source", "CAST(FLOOR(before / 2048) AS BIGINT) AS bin",
            "toks")
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast("long").as("bin_tokens"))
      },
      Some("""WITH t AS (SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS toks
          FROM documents),
        c AS (SELECT source, toks,
            COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM t)
        SELECT source, CAST(FLOOR(before / 2048) AS BIGINT) AS bin,
          COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Quality operating curve: docs/tokens SURVIVING each quality-score
    // decile threshold — the tuning query behind t17's fixed gate
    // ("which threshold keeps the token budget we need?"). One pass:
    // decile histogram + reverse-cumulative window over ten rows per
    // source (the window input is deciles, not docs — metadata-sized).
    QueryEntry("t20_quality_curve",
      (s, d) => {
        val scored = docs(s, d)
          .selectExpr("source",
            s"${Quality.nWords} AS n_words",
            s"${Quality.punct} AS punct_ratio",
            s"${Quality.digit} AS digit_ratio")
          .selectExpr("source", "n_words AS toks", s"${Quality.score} AS q")
          // decile clamped to [0,9] (q == 1.0 lands in the top decile)
          .selectExpr("source", "toks",
            "least(CAST(FLOOR(q * 10) AS BIGINT), CAST(9 AS BIGINT)) AS decile")
          .groupBy(col("source"), col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("toks")).cast("long").as("tk"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("decile").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        scored
          .withColumn("surviving_docs", sum(col("n")).over(w).cast("long"))
          .withColumn("surviving_tokens", sum(col("tk")).over(w).cast("long"))
          .selectExpr("source", "decile", "n AS n_docs", "tk AS n_tokens",
            "surviving_docs", "surviving_tokens")
      },
      Some(s"""WITH scored AS (SELECT source,
            ${Quality.duckNWords} AS n_words,
            ${Quality.duckPunct} AS punct_ratio,
            ${Quality.duckDigit} AS digit_ratio
          FROM documents),
        q AS (SELECT source, n_words AS toks,
            ${Quality.duckScore} AS q
          FROM scored),
        dec AS (SELECT source, toks,
            LEAST(CAST(FLOOR(q * 10) AS BIGINT), 9) AS decile FROM q),
        hist AS (SELECT source, decile, COUNT(*) AS n,
            CAST(SUM(toks) AS BIGINT) AS tk
          FROM dec GROUP BY 1, 2)
        SELECT source, decile, n AS n_docs, tk AS n_tokens,
          CAST(SUM(n) OVER (PARTITION BY source ORDER BY decile DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS surviving_docs,
          CAST(SUM(tk) OVER (PARTITION BY source ORDER BY decile DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS surviving_tokens
        FROM hist""")),

    // ------------------------------------------------------------------
    // Weighted corpus mixing under a token budget — the sampling-ratio
    // step a pre-training run executes after curation: give each source
    // a mixing weight, spend a global token budget (here half the
    // corpus) across sources in proportion, and select each source's
    // docs in a deterministic hash order until its share is spent.
    // Distinct from t15 (fixed k docs per stratum) and t19 (packing
    // into fixed bins): the budget is in TOKENS and the per-source
    // share comes from the weight vector. Weights are proportional to
    // the source index + 1 (a skewed mix exercising the arithmetic);
    // ALL budget math is integer (idx+1)*T div sumIdx — a double
    // intermediate would let Spark and DuckDB round an ulp apart at a
    // floor() boundary and flip a doc across the budget line.
    //
    // SCALE: the per-source cumulative sum is [[twoLevelPrefix]] (t19's
    // shape, shared spelling) — the shard is the leading byte of the
    // selection hash, which is order-ALIGNED because fixed-width
    // lowercase hex sorts as strings. No source ever funnels through
    // one task. Budgets come from ONE metadata-sized prelim job (the
    // 20-row per-source agg collects; totals/normalizer are driver
    // sums over those 20 rows; the per-source budget table re-enters
    // the plan as a broadcast literal frame — the corpus is scanned
    // once in the prelim and once in the main job, never more).
    QueryEntry("t22_source_mix",
      (s, d) => {
        // ONE prelim job: per-source token mass + the DEMO weight
        // (proportional to the source index + 1 — a skewed vector
        // exercising the arithmetic; production callers hand
        // [[sourceMix]] an explicit weight table instead), 20 rows.
        val srcRows = docs(s, d)
          .where("text IS NOT NULL")
          .selectExpr("source", "size(split(text, ' ')) AS toks",
            "CAST(substring(source, 4) AS BIGINT) + 1 AS widx")
          .groupBy(col("source"), col("widx"))
          .agg(sum(col("toks")).cast("long").as("src_toks")).collect()
        // Spark's non-ANSI CAST silently NULLs a source not named
        // 'srcN' (DuckDB raises) — a nonconforming corpus must fail
        // loudly here, not surface as a parity divergence (ADVICE r7
        // #2)
        val bad = srcRows.filter(_.isNullAt(1)).map(_.getString(0))
        require(bad.isEmpty,
          s"t22's demo weight vector parses the source NAME as 'srcN'; " +
            s"nonconforming sources: ${bad.mkString(",")} — call " +
            "TextOps.sourceMix with an explicit weight table instead")
        val budgetT = srcRows.map(_.getLong(2)).sum / 2
        import s.implicits._
        val weights = srcRows.toSeq
          .map(r => (r.getString(0), r.getLong(1))).toDF("source", "weight")
        sourceMix(docs(s, d), weights, budgetT)
      },
      Some("""WITH t AS (SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS toks,
            MD5(CAST(doc_id AS VARCHAR)) AS h,
            CAST(SUBSTRING(source, 4) AS BIGINT) + 1 AS widx
          FROM documents WHERE text IS NOT NULL),
        tot AS (SELECT CAST(SUM(toks) AS BIGINT) // 2 AS budget_t FROM t),
        sw AS (SELECT source, widx FROM t GROUP BY 1, 2),
        si AS (SELECT SUM(widx) AS sum_idx FROM sw),
        budgets AS (SELECT source, widx * budget_t // sum_idx AS budget_tokens
          FROM sw, tot, si),
        c AS (SELECT source, toks,
            SUM(toks) OVER (PARTITION BY source ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
        SELECT c.source, CAST(b.budget_tokens AS BIGINT) AS budget_tokens,
          COUNT(*) AS n_docs, CAST(SUM(c.toks) AS BIGINT) AS mix_tokens
        FROM c JOIN budgets b ON b.source = c.source
        WHERE c.cum <= b.budget_tokens
        GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // [[sourceMix]] under an EXPLICIT weight table (r8 verdict "Next
    // round" #7): the production calling convention — weights come in
    // as a (source, weight) relation (here VALUES-built; in a real
    // pipeline a config table), not parsed from source names like
    // t22's demo vector. Exercises the operator's documented edges:
    // a zero-weight source (src1 — budget 0, absent from the mix) and
    // sources missing from the table (src4+ — dropped by the inner
    // join). The oracle takes the SAME VALUES table.
    QueryEntry("t22b_source_mix_table",
      (s, d) => {
        import s.implicits._
        val weights = Seq(("src0", 3L), ("src1", 0L), ("src2", 5L), ("src3", 2L))
          .toDF("source", "weight")
        sourceMix(docs(s, d), weights, budgetTokens = 4000L)
      },
      Some("""WITH w(source, weight) AS (
            VALUES ('src0', 3), ('src1', 0), ('src2', 5), ('src3', 2)),
          t AS (SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS toks,
              MD5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents WHERE text IS NOT NULL),
          si AS (SELECT SUM(weight) AS sw FROM w),
          budgets AS (SELECT source, weight * 4000 // sw AS budget_tokens FROM w, si),
          c AS (SELECT source, toks,
              SUM(toks) OVER (PARTITION BY source ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t)
          SELECT c.source, CAST(b.budget_tokens AS BIGINT) AS budget_tokens,
            COUNT(*) AS n_docs, CAST(SUM(c.toks) AS BIGINT) AS mix_tokens
          FROM c JOIN budgets b ON b.source = c.source
          WHERE c.cum <= b.budget_tokens
          GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Cross-document repeated-substring (boilerplate) detection — the
    // exact-substring tier of training-data dedup (Lee et al.,
    // "Deduplicating Training Data Makes Language Models Better",
    // ACL'22): a word 8-gram occurring in >=2 DISTINCT docs is
    // boilerplate (headers, license blocks, templated spans — content
    // document-level dedup can't see because the surrounding text
    // differs); every token covered by any such window is removable.
    // Lee et al. use 50-token windows over a suffix array; the
    // shuffle-parallel re-expression is sliding-gram hashing — window
    // length is a corpus knob (8 here: synthetic docs average ~60
    // tokens), detection is exact either way. Distinct from t01 (whole-
    // doc dup), t04/t02 (doc-level near-dup) and t13 (grams vs a FIXED
    // eval set): the dup set here is corpus-global, self-referential.
    // Per doc: token count, dup-gram occurrences, tokens covered by
    // >=1 dup window, the post-removal token count, boilerplate
    // fraction. (Exact duplicate docs with >=8 tokens come out
    // bp_frac=1.0 — every window repeats — asserted vs t01 in
    // TextRecallSpec.)
    //
    // SCALE: linear explode (L-7 grams/doc), the global count keyed on
    // md5(gram) — fixed 32-byte shuffle keys however long the text
    // window is (at 50-token windows raw keys would be ~10x wider) and
    // collision-safe at corpus scale (128 bits vs ~2^47 distinct grams
    // per 100 TB). Coverage is a per-doc COUNT(DISTINCT pos) over an
    // 8x-bounded explode of hit windows — all shuffles key on gram
    // hash or doc_id, nothing corpus-sized is collected or broadcast,
    // no join ever exceeds the hit set. A doc's gram rows fan out
    // linearly, so skew is bounded by the longest DOCUMENT, not by
    // gram popularity (the md5 count absorbs popular grams map-side).
    QueryEntry("t23_boilerplate",
      (s, d) => {
        val (base, hits) = boilerplateHits(s, d)
        // Coverage = |union of the hit windows [i, i+7]| — computed as
        // a per-doc interval SWEEP (sorted by start, each window adds
        // its part past the running max end), NOT an 8x position
        // explode + COUNT(DISTINCT): one doc_id shuffle of the hit set
        // itself vs 8x its volume through an Expand-planned distinct
        // aggregate, and the same pass folds the hit count (window
        // starts are unique per doc, so count(*) == the old
        // COUNT(DISTINCT i)). Identical math, asserted by the planted
        // fixture + unchanged oracle.
        import org.apache.spark.sql.expressions.Window
        val sweep = Window.partitionBy("doc_id").orderBy("i")
          .rowsBetween(Window.unboundedPreceding, -1)
        val agg = hits
          .withColumn("add", greatest(lit(0),
            col("i") + lit(7) -
              greatest(coalesce(max(col("i") + lit(7)).over(sweep), col("i") - 1),
                col("i") - 1)))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_dup_grams"),
            sum(col("add")).cast("long").as("n_covered"))
        base.selectExpr("doc_id", "CAST(size(ws) AS BIGINT) AS n_tokens")
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
            coalesce(col("n_covered"), lit(0L)).as("n_covered"),
            (col("n_tokens") - coalesce(col("n_covered"), lit(0L))).as("kept_tokens"),
            when(col("n_tokens") > 0,
              round(coalesce(col("n_covered"), lit(0L)).cast("double") / col("n_tokens"), 6))
              .otherwise(lit(0.0)).as("bp_frac"))
      },
      Some("""WITH base AS (SELECT doc_id,
            LIST_FILTER(STRING_SPLIT(LOWER(COALESCE(text, '')), ' '), w -> LEN(w) > 0) AS ws
          FROM documents),
        idx AS (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws) - 6)) AS i
          FROM base WHERE LEN(ws) >= 8),
        grams AS (SELECT doc_id, i,
            MD5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7]) AS h
          FROM idx),
        dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        hits AS (SELECT doc_id, i FROM grams JOIN dup USING (h)),
        cov AS (SELECT doc_id, COUNT(DISTINCT p) AS n_covered FROM
          (SELECT doc_id, UNNEST(RANGE(i, i + 8)) AS p FROM hits) GROUP BY doc_id),
        nh AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM hits GROUP BY doc_id)
        SELECT b.doc_id, LEN(b.ws) AS n_tokens,
          COALESCE(nh.n_dup_grams, 0) AS n_dup_grams,
          COALESCE(cov.n_covered, 0) AS n_covered,
          LEN(b.ws) - COALESCE(cov.n_covered, 0) AS kept_tokens,
          CASE WHEN LEN(b.ws) > 0
            THEN ROUND(CAST(COALESCE(cov.n_covered, 0) AS DOUBLE) / LEN(b.ws), 6)
            ELSE 0.0 END AS bp_frac
        FROM base b LEFT JOIN nh USING (doc_id) LEFT JOIN cov USING (doc_id)""")),

    // ------------------------------------------------------------------
    // Boilerplate REMOVAL (round 11) — the surgery t23 only measures:
    // every token inside a cross-document duplicated 8-gram window is
    // cut, the survivors reassemble in order (the C4/RefinedWeb-style
    // cleanup step). Same two shuffles as t23 (md5 gram key + doc_id)
    // plus one doc_id-keyed collect of window STARTS — never the 8x
    // expanded positions; the per-doc membership test runs inside one
    // codegen'd HOF pass over the token array (cost O(tokens x
    // windows) per doc, bounded by doc length — a narrow map stage at
    // corpus scale). The DuckDB oracle recomputes the full surgery
    // relationally (no lambda-index dependence) and hash-compares the
    // REASSEMBLED TEXT itself, not just counts. Docs with NULL/empty
    // text keep an empty kept_text ('' both sides).
    QueryEntry("t29_boilerplate_strip",
      (s, d) => {
        val (base, hits) = boilerplateHits(s, d)
        val starts = hits.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("i"))).as("starts"))
        base.join(starts, Seq("doc_id"), "left")
          .selectExpr("doc_id", "CAST(size(ws) AS BIGINT) AS n_tokens",
            """CASE WHEN starts IS NULL THEN ws
               ELSE filter(transform(sequence(1, size(ws)),
                 p -> CASE WHEN exists(starts, st -> st <= p AND p <= st + 7)
                      THEN NULL ELSE ws[p - 1] END), x -> x IS NOT NULL)
               END AS kept_ws""")
          .selectExpr("doc_id", "n_tokens",
            "CAST(size(kept_ws) AS BIGINT) AS kept_tokens",
            "concat_ws(' ', kept_ws) AS kept_text")
      },
      Some("""WITH base AS (SELECT doc_id,
            LIST_FILTER(STRING_SPLIT(LOWER(COALESCE(text, '')), ' '), w -> LEN(w) > 0) AS ws
          FROM documents),
        idx AS (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws) - 6)) AS i
          FROM base WHERE LEN(ws) >= 8),
        grams AS (SELECT doc_id, i,
            MD5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7]) AS h
          FROM idx),
        dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        hits AS (SELECT doc_id, i FROM grams JOIN dup USING (h)),
        covp AS (SELECT DISTINCT doc_id, p FROM
          (SELECT doc_id, UNNEST(RANGE(i, i + 8)) AS p FROM hits)),
        pos AS (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws) + 1)) AS p FROM base),
        keptw AS (SELECT pos.doc_id, pos.p, pos.ws[pos.p] AS w
          FROM pos LEFT JOIN covp ON pos.doc_id = covp.doc_id AND pos.p = covp.p
          WHERE covp.p IS NULL)
        SELECT b.doc_id, CAST(LEN(b.ws) AS BIGINT) AS n_tokens,
          CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
          COALESCE(k.kept_text, '') AS kept_text
        FROM base b LEFT JOIN
          (SELECT doc_id, COUNT(*) AS kept_tokens,
             STRING_AGG(w, ' ' ORDER BY p) AS kept_text
           FROM keptw GROUP BY doc_id) k USING (doc_id)""")),

    // ------------------------------------------------------------------
    // Decontamination, bloom-prefiltered — t13's answer under the plan
    // a LARGE eval suite needs. t13's broadcast of the deduped eval
    // gram STRINGS is the right 100 TB plan while the suite is
    // benchmark-sized; once the held-out side grows past broadcast
    // comfort (full eval harnesses ship tens of millions of grams;
    // ~50-byte strings, several GB with join-hash overhead), the
    // correct shape is the classic build/probe semi-join filter that
    // Spark's own InjectRuntimeFilter plants when stats allow — built
    // HERE explicitly because the build side is a computed gram set,
    // which stats-based planner rules can't see through:
    //   build: distributed partial blooms over xxhash64(g) on the eval
    //     grams, merged into ONE serialized bitset (~10 bits/gram —
    //     60x smaller than broadcasting the strings);
    //   probe: codegen'd might_contain() thins the corpus-sized gram
    //     stream MAP-SIDE, before any shuffle;
    //   verify: the exact join now runs as a SHUFFLED hash join over
    //     survivors only — bloom false positives die here, so the
    //     answer is bit-identical to t13 (same oracle, asserted
    //     row-for-row in FunctionsSpec).
    // Only the bloom bytes cross to the driver (capped 8 MB at the
    // 1 << 26 numBits ceiling); the eval-gram count that sizes it is
    // the build stage's one metadata-sized action.
    // NOTE: EAGER at DataFrame construction (unlike every other entry):
    // the bloom regime's eval-gram count + bitset build run as Spark
    // jobs inside the entry fn — plan-inspection tooling enumerating
    // entries executes them (documented operator contract; the eval
    // lineage is localCheckpointed so it computes ONCE, ADVICE r8).
    QueryEntry("t24_decontaminate_bloom",
      (s, d) => {
        val grams = wordFiveGrams(s, d)
        decontaminate(
          grams.filter(col("doc_id") % 17 =!= 0),
          grams.filter(col("doc_id") % 17 === 0),
          regime = "bloom")
      },
      Some(oDecontaminate)),

    // ------------------------------------------------------------------
    // The AUTO regime (r8 verdict "Next round" #2): ONE decontamination
    // operator that measures the eval side (the same count the bloom
    // build needs anyway) and picks broadcast-verify vs bloom+shuffle
    // at the [[DecontamBroadcastMaxGrams]] crossover. At every test SF
    // the eval suite is benchmark-sized, so this resolves to t13's
    // broadcast plan — the point is that a 50M-gram eval suite needs NO
    // code change, only this entry's shape. Same oracle as t13/t24
    // (the regime choice may never change the answer; forced-regime
    // equality is asserted in FunctionsSpec). Eager at construction
    // (the count), like t24.
    QueryEntry("t25_decontaminate_auto",
      (s, d) => {
        val grams = wordFiveGrams(s, d)
        decontaminate(
          grams.filter(col("doc_id") % 17 =!= 0),
          grams.filter(col("doc_id") % 17 === 0),
          regime = "auto")
      },
      Some(oDecontaminate)),

    // ------------------------------------------------------------------
    // Deterministic training shards (round 11): [[shardForTraining]]'s
    // membership and order are pure functions of (doc_id, seed), so
    // DuckDB can recompute the whole assignment — per-shard counts,
    // char totals, the key range, and the FIRST doc in shard order
    // (min_by proves the within-shard ordering contract, not just
    // membership). The 4-hex-digit bucket parse is spelled with
    // strpos in the oracle (DuckDB has no conv()); layout invariance
    // and one-file-per-shard are spec'd in FunctionsSpec.
    QueryEntry("t27_train_shards",
      (s, d) => {
        shardForTraining(docs(s, d), nShards = 8, seed = 42)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).cast("long").as("n_chars"),
            min(col("perm_key")).as("first_key"),
            max(col("perm_key")).as("last_key"),
            expr("min_by(CAST(doc_id AS STRING), perm_key)").as("first_doc"))
      },
      Some("""WITH k AS (SELECT doc_id, text,
            MD5(CAST(doc_id AS VARCHAR) || ':42') AS perm_key FROM documents),
          b AS (SELECT *,
            (STRPOS('0123456789abcdef', SUBSTRING(perm_key, 1, 1)) - 1) * 4096 +
            (STRPOS('0123456789abcdef', SUBSTRING(perm_key, 2, 1)) - 1) * 256 +
            (STRPOS('0123456789abcdef', SUBSTRING(perm_key, 3, 1)) - 1) * 16 +
            (STRPOS('0123456789abcdef', SUBSTRING(perm_key, 4, 1)) - 1) AS bucket
            FROM k),
          sh AS (SELECT *, CAST(FLOOR(bucket * 8.0 / 65536) AS INT) AS shard FROM b)
          SELECT shard, COUNT(*) AS n_docs,
            CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
            MIN(perm_key) AS first_key, MAX(perm_key) AS last_key,
            MIN_BY(CAST(doc_id AS VARCHAR), perm_key) AS first_doc
          FROM sh GROUP BY shard""")),

    // ------------------------------------------------------------------
    // Deterministic k-per-stratum sampling via Trino's min_by(x, y, n)
    // (round 11, functions/MinKBy.scala): the hashed-key selection t15
    // spells with a ROW_NUMBER window — but as ONE hash aggregation
    // with O(k) per-group state and map-side partial merge, no
    // per-group sort. At 100 TB "5 sample docs per source" must not
    // sort every source's full contents to discard all but 5; this
    // plan's only exchange is the group-by's, and the oracle IS the
    // window spelling, proving the two select identical rows (PlanSpec
    // asserts the window-free plan).
    QueryEntry("t28_stratified_minby",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        docs(s, d)
          .groupBy(col("source"))
          .agg(expr(
            "min_by(doc_id, md5(concat(CAST(doc_id AS STRING), ':s7')), 5)")
            .as("picks"))
          .selectExpr("source", "posexplode(picks) AS (rk0, doc_id)")
          .selectExpr("source", "CAST(rk0 + 1 AS INT) AS rk", "doc_id")
      },
      Some("""WITH r AS (SELECT source, doc_id,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY MD5(CAST(doc_id AS VARCHAR) || ':s7')) AS rk
            FROM documents)
          SELECT source, CAST(rk AS INT) AS rk, doc_id FROM r WHERE rk <= 5""")),

    // ------------------------------------------------------------------
    // BM25 top-k retrieval (round 14): the classic sparse-retrieval
    // scorer a curation pipeline uses to pull topical training data
    // (and the baseline every dense retriever is measured against) —
    // Robertson/Okapi BM25 for a fixed 3-term query, k1=1.2, b=0.75.
    //
    // Scale shape: ONE pass over the corpus — tokens explode, the
    // query-term filter cuts the stream to matching rows BEFORE any
    // shuffle (the explode+filter fuses into the scan projection), tf
    // aggregates on (doc, term) carrying dl in the group key (dl is
    // functionally dependent on doc — no join back to a stats table),
    // df is a 3-row aggregate OF tf, and the corpus constants (N,
    // sum dl) are a 1-row broadcast. Per-term scores are summed as
    // DECIMAL(38,18) — order-free, so shuffle order can never flip the
    // rounded score — and the top-10 cut ranks by the ROUNDED score
    // with doc_id ties, deterministic on both engines. At 100 TB: the
    // only corpus-sized work is the scan; everything post-filter is
    // query-matched rows (a vanishing fraction), df/corpus stats are
    // metadata-sized broadcasts.
    QueryEntry("t31_bm25_topk",
      (s, d) => {
        val terms = Seq("vector", "hash", "join")
        val base = docs(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        val corpus = base.select(size(col("ws")).as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        val tf = base
          .select(col("doc_id"), size(col("ws")).as("dl"),
            explode(col("ws")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        // THE scorer lives in TextIndex.bm25Ranked — one spelling for
        // the entry and the served index path (r14 review)
        TextIndex.bm25Ranked(tf, df, corpus, k = 10)
      },
      Some("""WITH base AS (
          SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents),
        stats AS (SELECT doc_id, LEN(ws) AS dl FROM base),
        corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM stats),
        tok AS (SELECT doc_id, LEN(ws) AS dl, UNNEST(ws) AS term FROM base),
        tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok
          WHERE term IN ('vector', 'hash', 'join') GROUP BY 1, 2, 3),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        sc AS (SELECT t.doc_id,
            CAST(LN((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * (t.tf * 2.2) /
              (t.tf + 1.2 * (0.25 + 0.75 * t.dl /
                 (CAST(c.sum_dl AS DOUBLE) / c.n_docs))) AS DECIMAL(38,18)) AS s
          FROM tf t JOIN df d USING (term) CROSS JOIN corpus c),
        agg AS (SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 6) AS bm25,
            COUNT(*) AS n_terms
          FROM sc GROUP BY doc_id)
        SELECT doc_id, bm25, n_terms, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rk
          FROM agg) t
        WHERE rk <= 10""")),

    // ------------------------------------------------------------------
    // Exact-substring span dedup (round 14): the ExactSubstr idea of
    // Lee et al. 2021 ("Deduplicating Training Data Makes Language
    // Models Better") at fixed window length — every L=8-token window
    // that appears VERBATIM in >= 2 distinct documents marks its
    // tokens as duplicated; per document, the merged covered-token
    // count and ratio. Near-dups that MinHash scores at the document
    // grain surface here at the SPAN grain — the operator a pipeline
    // uses to STRIP copied passages instead of dropping whole docs.
    //
    // Scale shape (the suffix-array replacement that survives a
    // cluster): windows are corpus-token-sized but NARROW — each row
    // is (doc_id, pos, md5(window)) and never the window text, so the
    // hash shuffle moves 16-byte keys (the t04 collision argument:
    // 128-bit keys, cross-doc false positives negligible). One shuffle
    // on the hash, a partition-frame window flags windows in >= 2
    // distinct docs (min(doc_id) != max(doc_id)), and coverage merges
    // per doc by exploding ONLY the flagged windows' L positions
    // (duplicated-token-sized, not corpus-sized) into a distinct
    // count. No driver state; the only sort is the window's in-
    // partition sort of the hash stream.
    QueryEntry("t32_exact_substr_spans",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val L = 8
        val P = s.sparkContext.defaultParallelism
        // r14 optimization (guide §1.2: don't compute things twice;
        // §2.4: share one exchange). The r13 shape consumed `wins`
        // twice (dup aggregate, flag join) and `base` three times;
        // column pruning specialized each consumer's below-exchange
        // subtree, so NOTHING was reused: documents was scanned 3x and
        // the md5-over-every-window Generate — the CPU of this
        // operator — ran twice. Now: ONE tokenize exchange whose two
        // consumers prune to the identical {doc_id, ws} subtree
        // (ReusedExchange), ONE window-hash pass shuffled ONCE on the
        // hash, and the duplicate flag read off a partition-frame
        // window — >= 2 distinct docs iff min(doc_id) != max(doc_id) —
        // so the countDistinct two-phase aggregate and the join back
        // onto the window stream both disappear. The n >= L guard
        // moved INTO the generator (empty array => zero rows) so it
        // cannot be pushed below the shared exchange and split it.
        val base = docs(s, d)
          .repartition(P, col("doc_id"))
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        val wins = base
          .selectExpr("doc_id",
            // r14: fused kernel — same md5-per-window stream, no
            // interpreted lambda or joined-gram string; empty for
            // sub-L docs exactly like the CASE guard it replaces
            s"posexplode(word_gram_md5s(ws, $L))")
          .toDF("doc_id", "pos", "wh")
          .repartition(P, col("wh"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("wh"))
        val covered = wins
          .withColumn("mnd", min(col("doc_id")).over(w))
          .withColumn("mxd", max(col("doc_id")).over(w))
          .filter(col("mnd") =!= col("mxd"))
          .select(col("doc_id"), col("pos"))
          .repartition(P, col("doc_id"))
          .selectExpr("doc_id", s"explode(sequence(pos, pos + ${L - 1})) AS j")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("j")).as("n_dup_tokens"))
        base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
            round(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
              col("n_tokens"), 6).as("dup_ratio"))
      },
      Some("""WITH base AS (
          SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents),
        sized AS (SELECT doc_id, ws, LEN(ws) AS n FROM base),
        win AS (SELECT doc_id, UNNEST(RANGE(0, n - 8 + 1)) AS pos, ws
          FROM sized WHERE n >= 8),
        wh AS (SELECT doc_id, pos,
            MD5(ARRAY_TO_STRING(ws[pos+1:pos+8], ' ')) AS wh
          FROM win),
        dup AS (SELECT wh FROM wh GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
        cov AS (SELECT h.doc_id, COUNT(DISTINCT j) AS n_dup_tokens
          FROM wh h JOIN dup USING (wh),
               UNNEST(RANGE(h.pos, h.pos + 8)) t(j)
          GROUP BY h.doc_id)
        SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
          COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
          ROUND(CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / s.n, 6) AS dup_ratio
        FROM sized s LEFT JOIN cov c ON c.doc_id = s.doc_id""")),

    // ------------------------------------------------------------------
    // Exact-substring STRIP (round 14) — t32's surgery, the t23 -> t29
    // pairing at the span grain: Lee et al. keep ONE occurrence of each
    // duplicated passage. Canonical holder of a window = the MIN doc_id
    // containing it; every OTHER doc strips the tokens that window
    // covers, and the text is rebuilt from the surviving tokens in
    // order. Detection cost is t32's (narrow md5-keyed shuffle); the
    // canonical choice IS the min(doc_id) the dup window computes
    // anyway; the strip
    // itself is an IN-ROW rebuild (the covered-position set joins back
    // doc-level and a transform/filter drops tokens by index — no
    // re-explode, no per-token shuffle, order preserved for free).
    QueryEntry("t33_exact_substr_strip",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val L = 8
        val P = s.sparkContext.defaultParallelism
        // Same r14 single-pass restructure as t32 (see its comment):
        // one tokenize exchange reused by both consumers, one
        // window-hash pass shuffled once on the hash, canon/duplicate
        // read off a partition-frame window — canon IS min(doc_id)
        // over the hash partition, and >= 2 distinct docs iff
        // min != max, so the aggregate+join pair collapses into the
        // window that was computing min anyway.
        val base = docs(s, d)
          .repartition(P, col("doc_id"))
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        val wins = base
          .selectExpr("doc_id",
            // r14: fused kernel — same md5-per-window stream, no
            // interpreted lambda or joined-gram string; empty for
            // sub-L docs exactly like the CASE guard it replaces
            s"posexplode(word_gram_md5s(ws, $L))")
          .toDF("doc_id", "pos", "wh")
          .repartition(P, col("wh"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("wh"))
        val covSet = wins
          .withColumn("canon", min(col("doc_id")).over(w))
          .withColumn("mxd", max(col("doc_id")).over(w))
          .filter(col("canon") =!= col("mxd") && col("doc_id") =!= col("canon"))
          .select(col("doc_id"), col("pos"))
          .repartition(P, col("doc_id"))
          .selectExpr("doc_id", s"explode(sequence(pos, pos + ${L - 1})) AS j")
          .groupBy(col("doc_id"))
          .agg(collect_set(col("j")).as("cov"))
        base.select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
          .join(covSet, Seq("doc_id"), "left")
          .selectExpr("doc_id", "ws", "CAST(n AS BIGINT) AS n_tokens",
            "coalesce(cov, CAST(array() AS array<int>)) AS cov")
          .selectExpr("doc_id", "n_tokens",
            "CAST(size(cov) AS BIGINT) AS n_stripped",
            // in-row rebuild: drop tokens whose index is covered; a
            // split() token is never NULL, so NULL is a safe tombstone
            """array_join(filter(
                 transform(ws, (w, i) ->
                   CASE WHEN array_contains(cov, i) THEN CAST(NULL AS STRING)
                        ELSE w END),
                 x -> x IS NOT NULL), ' ') AS text_stripped""")
      },
      Some("""WITH base AS (
          SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws FROM documents),
        sized AS (SELECT doc_id, ws, LEN(ws) AS n FROM base),
        win AS (SELECT doc_id, UNNEST(RANGE(0, n - 8 + 1)) AS pos, ws
          FROM sized WHERE n >= 8),
        wh AS (SELECT doc_id, pos,
            MD5(ARRAY_TO_STRING(ws[pos+1:pos+8], ' ')) AS wh
          FROM win),
        canon AS (SELECT wh, MIN(doc_id) AS canon FROM wh
          GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
        cov AS (SELECT h.doc_id, j
          FROM wh h JOIN canon c USING (wh),
               UNNEST(RANGE(h.pos, h.pos + 8)) t(j)
          WHERE h.doc_id <> c.canon
          GROUP BY h.doc_id, j),
        covl AS (SELECT doc_id, LIST(j) AS cov FROM cov GROUP BY doc_id)
        SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
          CAST(LEN(COALESCE(c.cov, [])) AS BIGINT) AS n_stripped,
          COALESCE(ARRAY_TO_STRING(
            LIST_TRANSFORM(
              LIST_FILTER(RANGE(0, s.n), i -> NOT LIST_CONTAINS(COALESCE(c.cov, []), i)),
              i -> s.ws[i + 1]), ' '), '') AS text_stripped
        FROM sized s LEFT JOIN covl c ON c.doc_id = s.doc_id""")),

    // ------------------------------------------------------------------
    // WEIGHTED sampling without replacement (round 14): Efraimidis-
    // Spirakis A-ES — per source, keep the k docs with the smallest
    // -ln(u)/w, u a deterministic md5-derived uniform, w the doc's
    // quality weight (n_chars + 1 here; any positive score plugs in).
    // The quality-WEIGHTED subsample is the curation step between
    // t15's uniform strata and t20's hard quality cut: long/high-
    // quality docs are proportionally favored, yet every doc keeps a
    // nonzero chance — the standard data-mixing primitive. One shuffle
    // (the per-source rank over k-bounded state via min_k ordering);
    // deterministic end to end, so the oracle re-derives the identical
    // sample. Float ledger: u is an EXACT 32-bit integer scaled by an
    // exact power of two on both engines (hex digits -> integer, the
    // same left-to-right construction), ln is the t31-proven
    // cross-engine kernel, and the RANK key rounds to 10 digits with
    // doc_id ties — a flip would need a 1e-10 key coincidence.
    // WINDOW-FREE (the t28 device): min_by(doc_id, sample_key, 20)
    // holds O(k) state per source with map-side partial merge — ties
    // on the key break by the PAYLOAD (doc_id), exactly the oracle's
    // ORDER BY (sample_key, doc_id) — where a per-source ROW_NUMBER
    // would sort every source's full contents (source skew at scale).
    // The picked ids (k x sources rows) broadcast back onto the keyed
    // frame to carry sample_key into the output.
    QueryEntry("t34_weighted_sample",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val keyed = docs(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("u",
            (conv(substring(md5(concat(col("doc_id").cast("string"), lit(":ws14"))), 1, 8),
              16, 10).cast("double") + 1.0) / 4294967296.0)
          .withColumn("sample_key",
            round(-org.apache.spark.sql.functions.log(col("u")) /
              (col("n_chars").cast("double") + 1.0), 10))
        val picks = keyed
          .groupBy(col("source"))
          .agg(expr("min_by(doc_id, sample_key, 20)").as("ids"))
          .selectExpr("source", "posexplode(ids) AS (rk0, doc_id)")
          .selectExpr("source", "CAST(rk0 + 1 AS INT) AS rk", "doc_id")
        keyed.select(col("doc_id"), col("sample_key"))
          .join(broadcast(picks), Seq("doc_id"))
          .select(col("source"), col("rk"), col("doc_id"), col("sample_key"))
      },
      Some("""WITH keyed AS (
          SELECT doc_id, source,
            ROUND(-LN((LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
                i -> (POSITION(SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || ':ws14'), i, 1)
                        IN '0123456789abcdef') - 1) * POWER(16, 8 - i)))
              + 1.0) / 4294967296.0)
              / (CAST(n_chars AS DOUBLE) + 1.0), 10) AS sample_key
          FROM documents)
        SELECT source, rk, doc_id, sample_key FROM (
          SELECT source, doc_id, sample_key,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY sample_key, doc_id) AS INT) AS rk
          FROM keyed) t
        WHERE rk <= 20"""))
  )
}
