package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling a fact table once into N buckets
  * on its join key makes every subsequent equi-join on that key
  * shuffle-free (Spark reads matching buckets side by side — the
  * co-located-join strategy the reference achieves with its hash
  * repartition + stage placement, and the single biggest repeated-join
  * saving at 100 TB: the shuffle happens once at write time, not once per
  * query).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting). Clears
    * both the catalog entry and any orphaned warehouse directory from a
    * previous JVM (the in-memory catalog forgets tables across restarts but
    * the warehouse dir survives — LOCATION_ALREADY_EXISTS otherwise).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** Join two tables bucketed on the same key without any exchange.
    * Callers should verify with `.explain` that no Exchange appears above
    * either scan (BucketingSpec pins this).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
