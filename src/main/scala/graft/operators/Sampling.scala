package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-construction operators for training pipelines: deterministic
  * sampling, per-source mixture weighting, and token-budget shard packing.
  *
  * All three are DETERMINISTIC functions of the data (no RNG state, no
  * `rand()`): re-running on any cluster layout yields the same rows, which
  * is what makes 100 TB pipeline runs reproducible, resumable, and
  * auditable (and what lets a SQL oracle verify them exactly — `rand()`
  * based sampling is unverifiable by construction).
  */
object Sampling {

  /** Multiplicative hash on the 32-bit residue of `id`, in [0, 2^32).
    * Chosen over xxhash64/murmur because the arithmetic (one multiply, one
    * mod) is reproducible in ANY engine — the property that makes sampling
    * decisions portable across the pipeline boundary (Spark writes, some
    * other system re-derives membership). The multiplier is odd (a
    * bijection mod 2^32, uniform over sequential ids) and < 2^31, so the
    * intermediate product stays under 2^63: no Long overflow under Spark's
    * ANSI mode and no bigint overflow in SQL engines, for ANY 64-bit id.
    * Swap in a stronger expression-level hash if ids are adversarial.
    */
  def bucketHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(4294967296L)) * lit(1103515245L), lit(4294967296L))

  /** Deterministic `fraction`-sample: keeps rows whose [[bucketHash]] falls
    * below `fraction` of the hash space. Narrow (no shuffle, no state);
    * membership is a pure function of the id.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction out of [0,1]")
    df.filter(bucketHash(col(idCol)) < lit((fraction * 4294967296.0).toLong))
  }

  /** Mixture weighting: per-source keep-fractions applied with the same
    * deterministic hash (sources absent from `weights` are dropped). The
    * building block of training-mix construction — upweight curated
    * sources, downsample bulk crawl — as one narrow filter pass over the
    * corpus.
    */
  def mixSources(df: DataFrame, sourceCol: String, idCol: String,
                 weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    weights.values.foreach(w => require(w >= 0.0 && w <= 1.0, s"weight $w out of [0,1]"))
    val cutoff = weights.foldLeft(lit(-1L)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit((w * 4294967296.0).toLong)).otherwise(acc)
    }
    df.filter(bucketHash(col(idCol)) < cutoff)
  }

  /** Stratified split assignment: adds a `split` column mapping each row to
    * the named fraction band its [[bucketHash]] falls in (e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`). The standard
    * train/val/test carve-out as a pure hash of the id: narrow, no RNG
    * state, stable under reruns/re-partitioning, and a doc can never
    * migrate between splits when the corpus grows (membership depends only
    * on its own id) — the property that prevents test-set leakage across
    * dataset versions. Fractions must sum to <= 1; the remainder (if any)
    * gets split = null (held out entirely).
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    splits.foreach { case (n, f) =>
      require(f >= 0.0 && f <= 1.0, s"split $n fraction $f out of [0,1]") }
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => (c * 4294967296.0).toLong)
    val h = bucketHash(col(idCol))
    val assign = splits.zip(cuts).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, ((name, _), cut)) =>
        when(h < cut, lit(name)).otherwise(acc)
      }
    // reverse + otherwise-chaining puts the FIRST band's condition
    // innermost, so h is compared against ascending cut points correctly.
    df.withColumn("split", assign)
  }

  /** Per-group quota cap — the "at most k documents per domain" crawl-
    * curation rule: within each group keep the `k` rows with the smallest
    * (bucketHash(id), id), i.e. a deterministic uniform choice that is
    * stable under reruns, repartitioning, and corpus growth (a kept doc is
    * only ever evicted by a hash-smaller newcomer, never by layout). Adds
    * `rk` (1-based rank within the group) to the survivors.
    *
    * Scale shape: one shuffle on the group key. The rank <= k filter
    * compiles to WindowGroupLimit, so each map task forwards at most k rows
    * per group it sees before the shuffle — a heavy-hitter domain costs
    * k·numMapTasks shuffled rows, not its full row count, which is what
    * makes the cap safe on skewed web crawls.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucketHash(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Temperature-based mixture sampling (the multilingual/multi-source
    * n^alpha reweighting of XLM-R / mC4): sampling probability of source i
    * is q_i = n_i^alpha / sum_j n_j^alpha, flattening the source
    * distribution as alpha drops below 1 (alpha=1 keeps natural
    * proportions; alpha→0 approaches uniform-over-sources). Realized as
    * deterministic per-source keep-fractions f_i = min(1, budget·q_i/n_i)
    * applied through [[bucketHash]] — the expected kept count is
    * budget·q_i (capped at n_i), and membership stays a pure function of
    * the id (stable under reruns and layout, nested across budgets).
    *
    * Scale shape: one |sources|-row aggregate collected to the driver (the
    * same driver-sized statistics exchange AQE performs), folded back as a
    * literal cutoff map over one narrow filter pass — no shuffle of the
    * corpus itself. Keep-fractions are rounded to 6 decimals so an external
    * system (or the SQL oracle) re-deriving them computes the identical
    * cutoff; with alpha=0.5 the n^alpha term is sqrt — correctly rounded
    * IEEE in every engine — making the whole decision bit-reproducible.
    */
  def temperatureMixture(df: DataFrame, sourceCol: String, idCol: String,
                         budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0,1]")
    val countRows = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect()
    // A null source has no mixture weight: it would inflate the n^alpha
    // denominator here yet never match mixSources' equality filter — those
    // rows would silently vanish and their budget share never be realized.
    // Same loud failure as temperatureMixtureWeighted.
    require(!countRows.exists(_.isNullAt(0)),
      s"temperatureMixture: rows with a null `$sourceCol` have no mixture " +
        "weight; filter or key them first")
    val counts = countRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // An EMPTY corpus is not a data bug — incremental pipelines see empty
    // batches routinely — the mixture of nothing is nothing.
    if (counts.isEmpty) return df.limit(0)
    val denom = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val fractions = counts.map { case (src, n) =>
      val q = math.pow(n.toDouble, alpha) / denom
      val f = math.min(1.0, budget * q / n)
      // 6-decimal rounding: the portability boundary — any engine
      // recomputing f from (n, budget, alpha) lands on the same cutoff.
      src -> (math.round(f * 1e6) / 1e6)
    }
    mixSources(df, sourceCol, idCol, fractions)
  }

  /** [[temperatureMixture]] with source sizes measured in a WEIGHT column
    * (token or byte counts) instead of document counts — training budgets
    * are token budgets, and a source of few huge documents must be treated
    * as large. q_i ∝ w_i^alpha over per-source total weight w_i; keep
    * fraction f_i = min(1, budget·q_i/w_i), so expected kept WEIGHT per
    * source is budget·q_i (capped). Membership stays the same pure
    * [[bucketHash]] of the id: a document is kept or dropped atomically
    * (fractional-document budgets make no sense for training), so realized
    * weight converges to the target as corpus size grows.
    *
    * Same scale shape as the unweighted form: one |sources|-row aggregate
    * to the driver, fractions rounded to 6 decimals for cross-engine
    * re-derivation, one narrow filter pass, no corpus shuffle.
    */
  def temperatureMixtureWeighted(df: DataFrame, sourceCol: String,
                                 idCol: String, weightCol: String,
                                 budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0,1]")
    val weightRows = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol)).cast("long").as("w"))
      .collect()
    // Null sources would silently drop in mixSources' equality filter while
    // still inflating the denominator; an all-null weight column sums to
    // null. Both are data bugs — fail with the cause, not an NPE.
    require(!weightRows.exists(_.isNullAt(0)),
      s"temperatureMixtureWeighted: rows with a null `$sourceCol` cannot " +
        "be mixed; filter or key them first")
    require(!weightRows.exists(_.isNullAt(1)),
      s"some source has only null `$weightCol` values; clean the weights first")
    val weights = weightRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // Empty corpus: empty mixture, same reasoning as temperatureMixture.
    if (weights.isEmpty) return df.limit(0)
    require(weights.values.forall(_ > 0),
      s"every source needs positive total `$weightCol`; got ${weights.filter(_._2 <= 0)}")
    val denom = weights.values.map(w => math.pow(w.toDouble, alpha)).sum
    val fractions = weights.map { case (src, w) =>
      val q = math.pow(w.toDouble, alpha) / denom
      val f = math.min(1.0, budget * q / w)
      src -> (math.round(f * 1e6) / 1e6)
    }
    mixSources(df, sourceCol, idCol, fractions)
  }

  /** Deterministic global shuffle for training order: every row gets a
    * `shuffle_pos` in [0, N) — its position in the corpus ordered by
    * (seeded id hash, id) — so shard writers, resumed jobs, and external
    * systems all reproduce the SAME training order from (data, seed) alone,
    * with a different permutation per seed. The standard "shuffle the
    * corpus before SGD" step, made a pure function of the data.
    *
    * Scale shape: the hash key is uniform on [0, 2^32), so key-range
    * buckets are balanced BY CONSTRUCTION (no sampling, no skew); the
    * global position is the same two-phase distributed prefix sum as
    * [[packByBudget]] — per-bucket counts (≤P rows) to the driver, offsets
    * folded back, within-bucket row_number — no single-partition window
    * anywhere. Ties (hash collisions) break by id, so the permutation is
    * total and layout-independent.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 0L,
                           numPartitions: Int = 0): DataFrame = {
    val m = 4294967296L // 2^32
    require(seed >= 0 && seed < m, s"seed=$seed out of [0, 2^32)")
    val p = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val key = pmod((pmod(col(idCol).cast("long"), lit(m)) + lit(seed)) *
      lit(1103515245L), lit(m))
    val width = m / p + (if (m % p == 0) 0L else 1L)
    val withKey = df.withColumn("__sk", key)
      .withColumn("__pid", (col("__sk") / lit(width)).cast("int"))
    val totalRows = withKey.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect()
    // A null id hashes to a null bucket and has no position in the
    // permutation — fail loudly (matching packByBudget) instead of
    // emitting colliding or null positions.
    require(!totalRows.exists(_.isNullAt(0)),
      s"deterministicShuffle: rows with a null `$idCol` have no shuffle " +
        "position; filter or key them first")
    val totals = totalRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    // Offsets are folded back via a BROADCAST JOIN on the ≤P-row
    // (bucket, offset) table, not a P-branch `when` chain: a chained
    // conditional is a P-deep expression tree — linear per-row eval and a
    // codegen blowup once P reaches cluster-real partition counts (1000+).
    // The join is on the window's own partition key, so it adds no
    // exchange before the window shuffle.
    val offsetDf = broadcast(df.sparkSession.createDataFrame(
      (0 until p).map(i => (i, offsets(i)))).toDF("__pid", "__boff"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__sk"), col(idCol))
    withKey.join(offsetDf, Seq("__pid"))
      .withColumn("shuffle_pos",
        col("__boff") + row_number().over(w).cast("long") - 1L)
      .drop("__sk", "__pid", "__boff")
  }

  /** Pack id-ordered rows into contiguous shards of ~`budget` weight (e.g.
    * token count): shard = floor(exclusive-prefix-sum(weight) / budget).
    * The global prefix sum is computed scalably in two phases — range
    * partition by id, per-partition running sums, then a driver-side
    * exclusive scan over the P per-partition totals (P rows, the same
    * driver-sized statistics exchange AQE does) broadcast back as offsets.
    * No single-partition window, no O(rows) driver state — this survives
    * 100 TB where `Window.orderBy(id)` without partitionBy would serialize
    * the corpus through one task.
    */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    // Integral weights only: phase 1 collects per-bucket totals as BIGINT
    // and phase 2's window sum must be the SAME arithmetic. A fractional
    // weight column would make the truncated phase-1 totals diverge from
    // phase 2's exact sums and silently shift shard assignments near bucket
    // boundaries — round weights explicitly before packing instead.
    val wType = df.schema(weightCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(wType),
      s"packByBudget requires an integral weight column; `$weightCol` is $wType")
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    // Bucket each row by a DETERMINISTIC id-range split computed from the
    // exact id bounds — NOT repartitionByRange, whose sampled bounds are
    // seeded by the runtime RDD id: the totals job and the window job would
    // each re-sample and could disagree near bucket boundaries, silently
    // corrupting the prefix sum. A computed bucket column is identical in
    // every execution (and engine) by construction; under heavy id skew the
    // buckets are uneven, which costs balance, never correctness.
    val bounds = df.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long"),
      count(when(col(idCol).isNull, lit(1)))).head()
    // A null id has no position in the id order (and would NPE the totals
    // collect below) — reject loudly rather than assign it a shard.
    require(bounds.getLong(2) == 0L,
      s"packByBudget: ${bounds.getLong(2)} rows have a null `$idCol`; " +
        "filter or key them before packing")
    if (bounds.isNullAt(0)) return df.withColumn("shard", lit(null).cast("int"))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // Bucket width via BigInt: hi - lo + 1 overflows Long when the id range
    // spans more than 2^63 (e.g. hashed ids covering the full 64-bit space).
    val span = BigInt(hi) - BigInt(lo) + 1
    val width = (span / p + (if (span % p == 0) BigInt(0) else BigInt(1))).max(1)
    // DECIMAL(38,0) subtraction + integer DIV: exact over the full 64-bit id
    // range (BIGINT `id - lo` would overflow for the same extreme ranges;
    // double `/` loses exactness past 2^53). DIV on decimals yields BIGINT.
    val bucket = expr(s"CAST((CAST(`$idCol` AS DECIMAL(38,0)) - CAST($lo AS DECIMAL(38,0))) " +
      s"DIV CAST($width AS DECIMAL(38,0)) AS INT)")
    val withPid = df.withColumn("__pid", bucket)
    // Phase 1: per-bucket totals — at most P rows to the driver.
    val totals = withPid.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).cast("long").as("__w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    // Broadcast-join the ≤P-row (bucket, offset) table instead of a
    // P-branch `when` chain (see deterministicShuffle for why the chain
    // degrades at cluster-real P).
    val offsetDf = broadcast(spark.createDataFrame(
      (0 until p).map(i => (i, offsets(i)))).toDF("__pid", "__boff"))
    // Phase 2: within-bucket exclusive running sum + the bucket offset.
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(offsetDf, Seq("__pid"))
      .withColumn("__excl", col("__boff") + coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("__excl") / budget).cast("int"))
      .drop("__pid", "__excl", "__boff")
  }
}
