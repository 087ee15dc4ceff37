package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling (S3 — app/prepare_data.py:16-17 samples ~1000 docs with
  * `sample(fraction, seed=0).limit(n)`).
  *
  * Two forms:
  *  - `bernoulliSample` is the reference's own operator verbatim. Its
  *    output depends on partition layout (Spark seeds the RNG per
  *    partition), so it is reproducible only for a fixed layout — fine for
  *    one-off corpus prep, wrong for anything that must replay identically
  *    after a repartition. Excluded from the SQL oracle for that reason
  *    (SURVEY.md §2.1).
  *  - `deterministicSample` is the engine's replacement: order every row by
  *    a seeded content hash of its id and take the first n. The "random"
  *    order is a pure function of (doc_id, seed) — independent of partition
  *    layout, stable across engines (md5 is identical in Spark and DuckDB),
  *    and replayable: the same seed always selects the same n docs.
  *
  * Scale notes (100 TB): the hash is computed in the scan projection and
  * `limit` after `orderBy` plans as TakeOrderedAndProject — a per-partition
  * top-n heap + driver merge of n rows, NOT a global sort. Sampling n docs
  * from 10^10 never shuffles the corpus.
  */
object Sampling {

  /** Seeded hash key in [0,1)-like hex space: md5("<id>:<seed>"). */
  def sampleKey(id: Column, seed: Long): Column =
    md5(concat(id.cast("string"), lit(s":$seed")))

  /** First 8 hex chars of an md5 column as a long in [0, 2^32) — THE
    * cross-engine parity contract with the oracle spelling
    * `('0x' || substring(h, 1, 8))::BIGINT`. Every md5-derived integer
    * (weighted sampling, count-min buckets) must go through here so the
    * substring bounds can never drift between call sites. */
  def hex8Int(hexCol: Column): Column =
    conv(substring(hexCol, 1, 8), 16, 10).cast("long")

  /** Reference-parity Bernoulli sample (partition-layout-dependent). */
  def bernoulliSample(df: DataFrame, fraction: Double, seed: Long, n: Int): DataFrame =
    df.sample(withReplacement = false, fraction, seed).limit(n)

  /** Deterministic seeded sample of n rows keyed by `idCol`: stable under
    * repartition, re-execution, and engine change. */
  def deterministicSample(df: DataFrame, idCol: String, n: Int, seed: Long): DataFrame =
    df.withColumn("sample_key", sampleKey(col(idCol), seed))
      .orderBy(col("sample_key"), col(idCol))
      .limit(n)

  /** Deterministic train/val/test split: each row is assigned a split by
    * the RANGE its seeded hash key's first two hex chars fall in, giving
    * 1/256 granularity. Pure string comparison on the md5 hex — md5 is
    * lowercase hex in Spark and DuckDB alike, so lexicographic = numeric
    * order and the assignment is engine-exact with no hex parsing.
    *
    * This is the standard leakage-safe split for a training corpus:
    * membership is a pure function of (id, seed) — stable under
    * repartition, re-ingestion, and incremental appends (a new doc never
    * moves an old doc between splits, unlike row_number() % k), and the
    * same seed replays the same split forever. Embarrassingly parallel:
    * one projection, no shuffle. Defaults: ~80/10/10 (204/26/26 of 256).
    */
  // ~80/10/10 defaults plus the split seed, named so the declared oracle
  // SQL derives EVERY parameter from the same constants
  // (SparkEntry.hashSplitOracleSql) and none can silently diverge
  val DefaultVal256 = 26
  val DefaultTest256 = 26
  val DefaultSplitSeed = 0L

  def hashSplit(df: DataFrame, idCol: String, seed: Long = DefaultSplitSeed,
                val256: Int = DefaultVal256, test256: Int = DefaultTest256): DataFrame = {
    val (trainEnd, valEnd) = splitThresholds(val256, test256)
    val b = substring(sampleKey(col(idCol), seed), 1, 2)
    df.withColumn("split",
      when(b < lit(trainEnd), "train")
        .when(b < lit(valEnd), "val")
        .otherwise("test"))
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    * rank rows by u^(1/w) for a per-row uniform u and take the top n —
    * selection probability proportional to weight, exactly the
    * importance-sampling primitive for domain/language re-mixing.
    *
    * Determinism: u is derived from the seeded md5 key's first 8 hex
    * chars — (int+1)/2^32, a bit-exact rational in (0,1] — so the sample
    * is a pure function of (id, weight, seed), invariant to partition
    * layout and engine (DuckDB parses the same hex via '0x'::BIGINT).
    * Ranking uses the ln-monotone form ln(u)/w (identical order, no
    * pow). Non-positive weights are excluded (A-ES is undefined there).
    *
    * Cross-engine caveat: ln is the ONE non-exact op in the key, and JVM
    * Math.log vs libm log are each 1-ulp-accurate without being
    * guaranteed to agree — so a pair of keys straddling the rank-n
    * boundary by < 1 ulp could in principle select differently per
    * engine. Adjacent-key gaps scale like 1/n (~1e-3 at n=500, ~1e-7 at
    * n=10^7) against 1e-16 ulp noise, so the declared set-compare is
    * safe by many orders of magnitude at any tested SF — but it is
    * "overwhelmingly improbable", not "immune".
    *
    * Scale notes: key computed in the scan projection; orderBy+limit
    * plans as TakeOrderedAndProject — per-partition top-n heap + driver
    * merge of n rows, never a global sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, seed: Long): DataFrame = {
    val v = hex8Int(sampleKey(col(idCol), seed))
    val u = (v.cast("double") + 1.0) / 4294967296.0
    df.filter(col(weightCol) > 0)
      .withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
      .orderBy(desc("__aes_key"), col(idCol))
      .limit(n)
      .drop("__aes_key")
  }

  /** Per-group weighted reservoir (Efraimidis–Spirakis A-Res, grouped):
    * within each group, rank rows by the same ln(u)/w key as
    * `weightedSample` and keep the top `nPerGroup` — the "k docs per
    * language/domain, length-weighted" primitive corpus balancing runs
    * after mixing weights are chosen. Selection odds within a group are
    * proportional to weight; membership is a pure function of
    * (id, weight, seed), so appends to OTHER groups never disturb a
    * group's reservoir.
    *
    * Determinism: same contract (and same cross-engine ln caveat) as
    * `weightedSample` — the declared query emits the selected SET per
    * group, never the key, so only rank-boundary order can matter and
    * adjacent-key gaps (~1/groupSize) dwarf 1-ulp ln noise.
    *
    * Scale notes (100 TB): ONE exchange by group for the ranking window;
    * the key is computed in the scan projection. Group count is
    * unbounded (this is the per-group form of the TakeOrderedAndProject
    * plan, which cannot express "top n PER group" without a window). */
  def groupedWeightedSample(df: DataFrame, groupCol: String, idCol: String,
                            weightCol: String, nPerGroup: Int,
                            seed: Long): DataFrame = {
    val v = hex8Int(sampleKey(col(idCol), seed))
    val u = (v.cast("double") + 1.0) / 4294967296.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(desc("__aes_key"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
      .withColumn("__aes_rank", row_number().over(w))
      .filter(col("__aes_rank") <= nPerGroup)
      .drop("__aes_key", "__aes_rank")
  }

  /** The two hex-pair range bounds for hashSplit, shared with the oracle
    * SQL generator. Threshold 256 means "above every hex pair": "g" > any
    * [0-9a-f]{2} string lexicographically, so comparisons stay plain
    * string ops. */
  def splitThresholds(val256: Int, test256: Int): (String, String) = {
    require(val256 >= 0 && test256 >= 0 && val256 + test256 <= 255,
      "val256 + test256 must leave at least 1/256 for train")
    def hex2(i: Int) = if (i >= 256) "g" else f"$i%02x"
    (hex2(256 - val256 - test256), hex2(256 - test256))
  }

  /** Deterministic stratified sample: the first `nPerGroup` rows of EACH
    * group in seeded-hash order — the corpus-balancing op (equal docs per
    * language/source/domain) training pipelines run before mixing.
    * Same determinism contract as deterministicSample; one shuffle
    * (the per-group ranking window), no global sort. */
  /** Cumulative Poisson(1) CDF thresholds for k = 0..6 (mass above k=7 is
    * ~1e-5 and maps to k=7). Computed once here and interpolated into the
    * engine expression AND the oracle SQL, so the ladder cannot
    * desynchronize: Double.toString round-trips, and both engines parse
    * the literal to the identical IEEE double. */
  val PoissonCum: Seq[Double] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var acc = 0.0
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      acc += e1 / fact
      acc
    }
  }

  /** Poisson bootstrap (the scalable bootstrap: Chamandy et al. /
    * Google's "Estimating Uncertainty for Massive Data Streams"): each
    * row enters replica r with weight k ~ Poisson(1), derived
    * DETERMINISTICALLY from md5(row key, replica) through the inverse
    * CDF — so resampled aggregates are exactly replayable on any engine,
    * and the spread across replicas estimates the statistic's sampling
    * error without ever materializing a resample. Statistic here:
    * per-returnflag discounted revenue (decimal-exact weighted sums).
    *
    * Scale notes (100 TB): one scan, `replicas`x row fan-out, one
    * groupBy — no shuffle beyond the aggregate; the classical bootstrap
    * (N draws WITH replacement per replica) cannot be expressed as a
    * scan at all, which is the point of the Poisson form. */
  def poissonBootstrap(lineitem: DataFrame, replicas: Int = 3): DataFrame = {
    val u = hex8Int(md5(concat(
      col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"), lit("#"),
      col("replica").cast("string")))).cast("double") / lit(4294967296.0)
    val k = PoissonCum.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (c, i)) =>
        acc.when(col("__u") < lit(c), lit(i.toLong))
      }.otherwise(lit(7L))
    lineitem
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("__rev"))
      .withColumn("replica",
        explode(array((0 until replicas).map(r => lit(r.toLong)): _*)))
      .withColumn("__u", u)
      .withColumn("__k", k)
      .groupBy("l_returnflag", "replica")
      .agg(sum(col("__k")).as("boot_rows"),
        sum(col("__k") * col("__rev")).cast("double").as("boot_revenue"))
      .orderBy("l_returnflag", "replica")
  }

  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       nPerGroup: Int, seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", sampleKey(col(idCol), seed))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= nPerGroup)
  }

  /** Class-balanced downsample: every class capped to the SMALLEST
    * class's row count (exact parity — the majority-class rebalance a
    * classifier-training feed needs), kept rows chosen in seeded md5
    * order so the draw is replayable and layout-independent.
    *
    * Scale notes (100 TB): one count aggregate (map-side combined) finds
    * the floor — a 1-row broadcast — and the per-class ranking is the
    * stratifiedSample window: rank truncation happens inside each class
    * partition via WindowGroupLimit-style early stop, never a global
    * sort. */
  def balancedSample(df: DataFrame, classCol: String, idCol: String,
                     seed: Long): DataFrame = {
    val floorN = df.groupBy(classCol).agg(count(lit(1)).as("__n"))
      .agg(min("__n").as("__floor"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol))
      .orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", sampleKey(col(idCol), seed))
      .withColumn("sample_rank", row_number().over(w))
      .crossJoin(broadcast(floorN))
      .filter(col("sample_rank") <= col("__floor"))
      .drop("__floor")
  }
}
