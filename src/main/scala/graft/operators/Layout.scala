package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Physical data-layout operators: Z-order clustering and the clustered
  * parquet sink. At 100 TB the layout of data at rest decides how much of
  * it queries must read — parquet row-group min/max pruning and partition
  * pruning only bite when values are clustered, and a single-column sort
  * clusters exactly one column. Z-ordering (interleave the bits of two key
  * columns, range-partition + sort by the result) bounds the min/max span
  * of BOTH columns in every file, so selective predicates on either key
  * skip most of the corpus.
  *
  * The reference scopes layout to file sort order preserved through scans
  * (`/root/reference/tests/join.rs:49-62`); the write side here is the
  * complement a training-data pipeline needs to PRODUCE such data.
  *
  * All pure declarative Spark: the Morton key is a codegen'd Catalyst
  * expression ([[HashExpressions.InterleaveBits]]), the shuffle is one
  * `repartitionByRange` (range bounds from Spark's reservoir sample), the
  * sort is partition-local. Nothing here collects data to the driver.
  */
object Layout {

  /** Morton key of two non-negative integer columns (low 32 bits each). */
  def zkey(x: Column, y: Column): Column = HashExpressions.interleaveBits(x, y)

  /** Normalize a column to [0, 65535] given its global [lo, hi]. Raw
    * interleaving is useless when the key ranges differ in magnitude (the
    * narrow key's bits all sit below the wide key's, so every range cut
    * lands on wide-key bits only and the narrow key never clusters —
    * caught by `LayoutSpec`); equal-width normalization is the same move
    * Delta's OPTIMIZE ZORDER makes with per-column range ids. Double math:
    * overflow-safe for any long range, and bucketing needs no exactness.
    */
  private def scaled16(c: Column, lo: Long, hi: Long): Column = {
    val width = math.max(1L, hi - lo).toDouble
    least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - lo.toDouble) / width * 65535.0).cast("long")))
  }

  private def zkeyScaled(df: DataFrame, xCol: String, yCol: String): Column = {
    // One tiny stats aggregate to the driver (4 scalars) — the same
    // driver-sized statistics exchange AQE performs.
    val r = df.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).head()
    // min/max aggregates are NULL on an empty frame or an all-null key
    // column; fail with an actionable message instead of an opaque NPE
    // deep inside the write job.
    require((0 to 3).forall(i => !r.isNullAt(i)),
      s"zorder key stats unavailable: input is empty or '$xCol'/'$yCol' " +
        "is entirely NULL — z-ordering needs at least one non-null value " +
        "in both key columns")
    zkey(scaled16(col(xCol), r.getLong(0), r.getLong(1)),
         scaled16(col(yCol), r.getLong(2), r.getLong(3)))
  }

  /** Cluster a frame on the Z-order curve of (xCol, yCol): one range
    * shuffle on the Morton key of the range-normalized columns, then a
    * partition-local sort. Output partitions tile the curve, so each holds
    * a compact rectangle-ish region of (x, y) space — per-file min/max
    * spans shrink on BOTH columns (measured in `LayoutSpec`), which is
    * what turns parquet min/max stats into actual I/O skipping.
    */
  def zorderByRange(df: DataFrame, numPartitions: Int,
                    xCol: String, yCol: String): DataFrame = {
    require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")
    df.withColumn("__z", zkeyScaled(df, xCol, yCol))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Clustered parquet sink: hive-partition directories on `partitionCols`,
    * Z-order-cluster rows within each output task on (xCol, yCol), and
    * bound file size with `maxRecordsPerFile` (the writer rolls files, so a
    * skewed partition produces more files instead of one huge one). The
    * shuffle ranges over (partitionCols, z) so each task writes few
    * partition directories and the curve stays contiguous inside each.
    */
  def writeClustered(df: DataFrame, path: String, partitionCols: Seq[String],
                     xCol: String, yCol: String, numTasks: Int,
                     maxRecordsPerFile: Long): Unit = {
    require(numTasks >= 1, s"numTasks=$numTasks must be >= 1")
    require(maxRecordsPerFile >= 1,
      s"maxRecordsPerFile=$maxRecordsPerFile must be >= 1")
    val keyed = df.withColumn("__z", zkeyScaled(df, xCol, yCol))
    val rangeCols = partitionCols.map(col) :+ col("__z")
    keyed
      .repartitionByRange(numTasks, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .drop("__z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Deterministic curated-output sink — the end-of-pipeline step every
    * training-data funnel finishes with: survivors land as partitioned
    * parquet whose layout is a pure function of the DATA, independent of
    * cluster size, input partitioning, or scheduling.
    *
    * Contract (each part spec-pinned in `LayoutSpec`):
    *  - directories: one hive partition dir per (`partitionCol`,
    *    `__file`) pair, where `__file = xxhash64(sortCols) mod
    *    filesPerPartition` — a deterministic row→file assignment, so the
    *    EXACT file count per partition value is `filesPerPartition` (for
    *    values with ≥1 row in every bucket) and rerunning on a different
    *    layout reproduces the same row sets per directory;
    *  - one parquet file per leaf directory: the repartition below hashes
    *    on exactly the directory key, so each leaf's rows live in one
    *    task;
    *  - rows inside each file are sorted by `sortCols` — byte-stable
    *    content given a duplicate-free sort key, and row-group min/max
    *    stats that actually prune on the sort key at read time.
    *
    * Scale shape: one hash shuffle on the directory key; the skew guard
    * is `filesPerPartition` (a hot partition value spreads over that many
    * tasks). Partition-value cardinality × filesPerPartition should be
    * sized ≥ cluster parallelism, same sizing rule as any bucketed write.
    *
    * The reference has no write path at all (its sink is the client
    * stream, SURVEY §2.3); this is the beyond-reference complement a
    * pipeline needs to PRODUCE curated corpora.
    */
  /** Root directory for curated-sink outputs whose location the caller
    * doesn't pin: `spark.graft.curatedSinkRoot` if set, else a
    * user-scoped tmpdir. Queries that write as a side effect (p86/p91)
    * resolve through this, making the on-disk side effect explicit and
    * isolable — two concurrent sessions over the same fixture point the
    * conf at disjoint roots instead of racing on one directory.
    */
  def sinkRoot(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption("spark.graft.curatedSinkRoot").getOrElse(
      System.getProperty("java.io.tmpdir") +
        s"/graft-curated-${System.getProperty("user.name", "u")}")

  def writeCurated(df: DataFrame, path: String, partitionCol: String,
                   sortCols: Seq[String], filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition >= 1,
      s"filesPerPartition=$filesPerPartition must be >= 1")
    require(sortCols.nonEmpty,
      "writeCurated needs sortCols: a deterministic layout needs a " +
        "total row order (use the id/key column)")
    val withFile = df.withColumn("__file",
      if (filesPerPartition == 1) lit(0)
      else pmod(xxhash64(sortCols.map(col): _*),
        lit(filesPerPartition.toLong)).cast("int"))
    withFile
      .repartition(col(partitionCol), col("__file"))
      .sortWithinPartitions(
        (col(partitionCol) +: col("__file") +: sortCols.map(col)): _*)
      .write
      .partitionBy(partitionCol, "__file")
      .mode("overwrite")
      .parquet(path)
  }

  /** Read a [[writeCurated]] directory back, dropping the internal
    * `__file` bucket column. Partition-column values round-trip through
    * directory names — keep partition columns string/integral.
    */
  def readCurated(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.parquet(path).drop("__file")

  /** [[readCurated]] with the writer's LOGICAL schema supplied explicitly
    * (pre-`__file`): exact round-trip types with no partition-value
    * inference, and an empty sink directory (an empty funnel is a legal
    * outcome of a 100 TB filter chain) reads back as an empty frame
    * instead of failing schema inference.
    */
  def readCurated(spark: org.apache.spark.sql.SparkSession, path: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add(org.apache.spark.sql.types.StructField(
        "__file", org.apache.spark.sql.types.IntegerType, nullable = true)))
      .parquet(path).drop("__file")

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetFileBytes) similarly-sized files. Streaming
    * ingest and per-task writes leave 100 TB corpora as millions of
    * KB-scale files whose open/footer overhead dominates scans; compaction
    * is the standing maintenance operator every lakehouse runs (Delta
    * OPTIMIZE / Iceberg rewrite_data_files — same arithmetic). Sizing is
    * measured from the filesystem, not guessed: parquet's on-disk bytes
    * already reflect encoding + compression. Round-robin repartition (not
    * coalesce: coalesce merges map-side and would skew file sizes by
    * input-file placement) redistributes rows evenly. Returns the file
    * count written.
    */
  def compact(df: DataFrame, outPath: String, targetFileBytes: Long,
              inputBytes: Long): Int = {
    require(targetFileBytes >= 1, "targetFileBytes must be positive")
    val q = math.max(1L, (inputBytes + targetFileBytes - 1) / targetFileBytes)
    // A Long→Int wrap would hand repartition a negative count deep inside
    // the write job; any file count near Int range means targetFileBytes
    // was nonsense for this input anyway — fail with the arithmetic shown.
    require(q <= 10_000_000L,
      s"compact would write $q files ($inputBytes bytes / $targetFileBytes " +
        "per file) — raise targetFileBytes")
    val n = q.toInt
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }

  /** Directory variant: measures input bytes via the Hadoop FileSystem
    * (works for HDFS/S3A/local alike), then [[compact]]s.
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, inPath: String,
                 outPath: String, targetFileBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    compact(spark.read.parquet(inPath), outPath, targetFileBytes, bytes)
  }

  /** Per-partition [min, max] of `c` — the spans parquet would store as
    * row-group stats under the current physical layout. `spanFraction`
    * reduces them to one number: mean fraction of the global value range a
    * partition covers (1.0 = no clustering, ~1/P = perfect).
    */
  def partitionSpans(df: DataFrame, c: String): DataFrame =
    df.select(spark_partition_id().as("pid"), col(c).cast("long").as("v"))
      .groupBy(col("pid"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
           count(lit(1)).as("n_rows"))

  def spanFraction(df: DataFrame, c: String): Double = {
    val spans = partitionSpans(df, c)
    val g = df.agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
    val width = math.max(1L, g.getLong(1) - g.getLong(0))
    val m = spans.agg(avg(col("hi") - col("lo"))).head().getDouble(0)
    m / width
  }
}
