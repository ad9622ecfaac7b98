package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Non-parquet source-format coverage (the reference reads CSV and
  * hive-partitioned tables, `/root/reference/Cargo.toml` csv feature,
  * `tests/join.rs:49-62`): deterministic CSV and hive-partitioned copies of
  * the driver's parquet tables, written once per (sfDir, format) into a
  * scratch directory and then read back through Spark's real CSV /
  * partition-discovery scan paths — so partition pruning, schema
  * application, and header handling are exercised against the same data the
  * DuckDB oracle reads from parquet.
  */
object DerivedSources {

  private def scratchRoot: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_derived"

  /** Scratch directory keyed by the sf dir's ABSOLUTE path plus the source
    * parquet's (mtime, length): two different dirs sharing a basename get
    * distinct caches, and a regenerated source file changes the key so the
    * stale derivation is never served (it is rewritten, not reused).
    */
  private def derivedDir(sfDir: String, kind: String, sourceTable: String): String = {
    val abs = Paths.get(sfDir).toAbsolutePath
    val src = abs.resolve(s"$sourceTable.parquet")
    val ver =
      if (Files.exists(src)) s"${Files.getLastModifiedTime(src).toMillis}-${Files.size(src)}"
      else "absent"
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$abs|$ver") & 0xffffffffL)
    s"$scratchRoot/${abs.getFileName}-$key/$kind"
  }

  private def ensure(dir: String)(write: String => Unit): String = {
    if (!Files.exists(Paths.get(dir, "_SUCCESS"))) write(dir)
    dir
  }

  /** Ensure the CSV copy of supplier exists; returns its directory. */
  def supplierCsvDir(spark: SparkSession, sfDir: String): String = {
    val parquet = Tables.load(spark, sfDir, "supplier")
    ensure(derivedDir(sfDir, "supplier_csv", "supplier")) { d =>
      parquet.coalesce(1).write.mode("overwrite").option("header", "true").csv(d)
    }
  }

  /** CSV part files of the supplier copy (the work units a feed hands out). */
  def supplierCsvFiles(spark: SparkSession, sfDir: String): Seq[String] = {
    val dir = supplierCsvDir(spark, sfDir)
    val stream = Files.list(Paths.get(dir))
    // Files.list holds an open DirectoryStream until closed — leaking one
    // fd per call otherwise.
    try stream.toArray.map(_.toString).filter(p => p.endsWith(".csv")).sorted.toSeq
    finally stream.close()
  }

  /** Supplier CSV split into SEVERAL part files — the multi-unit feed
    * shape ([[graft.sources.feed.DynamicWorkUnitFeed]] needs units it can
    * stage across micro-batches). Which rows land in which file is
    * layout-dependent; the UNION of the files is always exactly the
    * supplier table, which is all the feed contract (and the oracle)
    * observes. Split by key range so the derivation is deterministic.
    */
  def supplierCsvMultiFiles(spark: SparkSession, sfDir: String): Seq[String] = {
    val dir = ensure(derivedDir(sfDir, "supplier_csv_multi", "supplier")) { d =>
      Tables.load(spark, sfDir, "supplier")
        .repartitionByRange(4, col("s_suppkey"))
        .write.mode("overwrite").option("header", "true").csv(d)
    }
    val stream = Files.list(Paths.get(dir))
    try stream.toArray.map(_.toString).filter(_.endsWith(".csv")).sorted.toSeq
    finally stream.close()
  }

  /** Supplier table as CSV with header; read back with the parquet schema
    * (CSV carries no types — the explicit schema path is the one users hit).
    */
  def supplierCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = supplierCsvDir(spark, sfDir)
    spark.read.schema(Tables.load(spark, sfDir, "supplier").schema)
      .option("header", "true").csv(dir)
  }

  /** Part table as ORC (the bundled non-parquet columnar format; the
    * reference's multi-format source surface, `Cargo.toml` csv/avro
    * features — spark-avro isn't in this image, ORC is).
    */
  def partOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(derivedDir(sfDir, "part_orc", "part")) { d =>
      Tables.load(spark, sfDir, "part").write.mode("overwrite").orc(d)
    }
    spark.read.orc(dir)
  }

  /** Supplier as an Avro object-container file (written once via the Avro
    * core library — spark-avro's connector is not bundled in this image, so
    * both write and read go through Avro's own reader/writer; the read path
    * is the `AvroWorkUnit` V2 partition reader). Returns the file path.
    */
  def supplierAvroFile(spark: SparkSession, sfDir: String): String = {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecordBuilder, GenericRecord}
    val dir = ensure(derivedDir(sfDir, "supplier_avro", "supplier")) { d =>
      Files.createDirectories(Paths.get(d))
      val schema = SchemaBuilder.record("supplier").fields()
        .requiredLong("s_suppkey").requiredString("s_name")
        .requiredInt("s_nationkey").requiredDouble("s_acctbal")
        .endRecord()
      val rows = Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
        .collect()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(s"$d/supplier.avro"))
      try rows.foreach { r =>
        w.append(new GenericRecordBuilder(schema)
          .set("s_suppkey", r.get(0).asInstanceOf[Number].longValue())
          .set("s_name", r.getString(1))
          .set("s_nationkey", r.get(2).asInstanceOf[Number].intValue())
          .set("s_acctbal", r.get(3).asInstanceOf[Number].doubleValue())
          .build())
      } finally w.close()
      Files.createFile(Paths.get(d, "_SUCCESS"))
    }
    s"$dir/supplier.avro"
  }

  /** Documents metadata as JSON-lines (string/long columns only — no
    * timestamp serialization ambiguity); read back through Spark's JSON
    * scan with an explicit schema.
    */
  def documentsJson(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("doc_id", "source", "lang", "n_chars")
    val dir = ensure(derivedDir(sfDir, "documents_json", "documents")) { d =>
      Tables.load(spark, sfDir, "documents")
        .select(cols.map(col): _*)
        .coalesce(1).write.mode("overwrite").json(d)
    }
    spark.read
      .schema("doc_id BIGINT, source STRING, lang STRING, n_chars BIGINT")
      .json(dir)
  }

  /** Orders hive-partitioned by order year: `o_year=YYYY/` directories.
    * Reading back goes through partition discovery; a filter on `o_year`
    * must prune at the PartitionFilters level (asserted in SourcesSpec).
    */
  def ordersHivePartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(derivedDir(sfDir, "orders_hive", "orders")) { d =>
      Tables.load(spark, sfDir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(d)
    }
    spark.read.parquet(dir)
  }
}
