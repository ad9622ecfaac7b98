package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.feed.{CsvWorkUnit, DynamicWorkUnitFeed, WorkUnitFeedRegistry}

/** The work-unit-feed source must (a) produce exactly the rows of the fed
  * files, (b) consult the driver-side provider at EXECUTION time — a feed
  * whose contents change between runs yields different results for the same
  * reader config (the defining property of the reference's
  * `WorkUnitFeed`: units are discovered as the query runs, not at planning
  * time), and (c) fan units out as one Spark partition each.
  */
class WorkUnitFeedSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeCsv(name: String, rows: Seq[String]): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_feed_$name.csv")
    Files.write(p, ("k,v" +: rows).mkString("\n").getBytes)
    p.toString
  }

  private def readFeed(id: String) =
    spark.read.format("graft.sources.feed.WorkUnitFeedTableProvider")
      .option("feed.id", id)
      .option("schema", "k BIGINT, v STRING")
      .load()

  test("feed rows equal fed file contents; one partition per unit") {
    val f1 = writeCsv("a", Seq("1,x", "2,y"))
    val f2 = writeCsv("b", Seq("3,z"))
    WorkUnitFeedRegistry.register("t1",
      () => Seq(CsvWorkUnit(f1, header = true), CsvWorkUnit(f2, header = true)))
    val df = readFeed("t1")
    assert(df.rdd.getNumPartitions == 2, "one Spark partition per work unit")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("provider is consulted at execution time, not planning time") {
    val f1 = writeCsv("c", Seq("10,a"))
    val f2 = writeCsv("d", Seq("20,b"))
    @volatile var units = Seq(CsvWorkUnit(f1, header = true))
    WorkUnitFeedRegistry.register("t2", () => units)
    // ONE DataFrame reused across the mutation: if the provider were
    // snapshotted at load()/planning time, the second count would still
    // see 1. (A fresh readFeed per count would pass even then — vacuous.)
    val df = readFeed("t2")
    assert(df.count() == 1)
    // New units appear AFTER the reader was configured AND first executed —
    // a re-execution of the same plan must see them.
    units = Seq(CsvWorkUnit(f1, header = true), CsvWorkUnit(f2, header = true))
    assert(df.count() == 2,
      "execution did not pick up newly fed work units")
  }

  test("quoted CSV fields round-trip: commas, escaped quotes, newlines, empties") {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_feed_quoted.csv")
    Files.write(p, Seq(
      "k,v",
      "1,\"a,b\"",                 // comma inside quotes
      "2,\"say \"\"hi\"\"\"",      // escaped quote
      "3,\"line1\nline2\"",        // newline inside quotes
      "4,",                        // empty field -> null
      "5,plain"
    ).mkString("\n").getBytes)
    WorkUnitFeedRegistry.register("tq",
      () => Seq(CsvWorkUnit(p.toString, header = true)))
    val rows = readFeed("tq").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L) == Some("a,b"))
    assert(rows(2L) == Some("say \"hi\""))
    assert(rows(3L) == Some("line1\nline2"))
    assert(rows(4L) == None, "empty field reads as null, like Spark's csv source")
    assert(rows(5L) == Some("plain"))
  }

  test("unregistered feed fails loudly") {
    val e = intercept[Exception] { readFeed("nope").count() }
    assert(e.getMessage != null)
  }

  // The reference routes work units to chosen workers
  // (src/events/route_tasks.rs); Spark's scheduler consumes the same intent
  // through InputPartition.preferredLocations. Explicit hosts win; file
  // units fall back to filesystem block hosts (locality is a hint, so the
  // query result is identical either way — asserted by q51 staying green).
  test("work units expose preferred locations to the scheduler") {
    val f1 = writeCsv("loc", Seq("1,x"))
    // Explicit routing: the reference's route-tasks case.
    val pinned = CsvWorkUnit(f1, header = true, preferredHosts = Seq("host-a", "host-b"))
    assert(pinned.preferredLocations().toSeq == Seq("host-a", "host-b"))
    // File fallback: local filesystem blocks report localhost.
    val _ = spark // force session init so SparkContext.getOrCreate finds it
    val unpinned = CsvWorkUnit(f1, header = true)
    assert(unpinned.preferredLocations().contains("localhost"),
      s"expected local-FS block host, got ${unpinned.preferredLocations().toSeq}")
    // A missing file must degrade to "no preference", never fail the scan.
    assert(CsvWorkUnit("/no/such/file.csv", header = true)
      .preferredLocations().isEmpty)
  }

  private def readDynamicFeed(id: String, maxPerBatch: Int) =
    spark.readStream.format("graft.sources.feed.WorkUnitFeedTableProvider")
      .option("feed.id", id)
      .option("feed.maxUnitsPerBatch", maxPerBatch.toString)
      .option("schema", "k BIGINT, v STRING")
      .load()

  // The reference's defining feed behavior: units stream INTO a running
  // query (work_unit_feed.rs:125-180) — work discovered after execution
  // starts still reaches the result. Batch DSv2 can't do this (partitions
  // fix at planInputPartitions); the micro-batch path must.
  test("units offered after earlier micro-batches completed reach the running query") {
    val f1 = writeCsv("dyn1", Seq("1,x"))
    val f2 = writeCsv("dyn2", Seq("2,y"))
    val f3 = writeCsv("dyn3", Seq("3,z"))
    val feed = DynamicWorkUnitFeed.create("dyn-t1")
    feed.offer(Seq(CsvWorkUnit(f1, header = true)))
    val q = readDynamicFeed("dyn-t1", maxPerBatch = 0)
      .writeStream.format("memory").queryName("dyn_t1_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dyn_t1_sink").count() == 1,
        "first batch must hold only the initially-known unit")
      // Discovered mid-query — AFTER the first batch fully processed.
      feed.offer(Seq(CsvWorkUnit(f2, header = true),
        CsvWorkUnit(f3, header = true)))
      q.processAllAvailable()
      val rows = spark.table("dyn_t1_sink").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(rows == Seq((1L, "x"), (2L, "y"), (3L, "z")),
        s"late-discovered units must join the same query's result: $rows")
    } finally { q.stop(); DynamicWorkUnitFeed.remove("dyn-t1") }
  }

  // The reference dispatches units in bounded chunks
  // (query_coordinator.rs:38-41); the admission-cap analog must bound
  // units (hence rows, at 1 row/unit here) per micro-batch.
  test("maxUnitsPerBatch bounds admission per micro-batch (backpressure)") {
    val files = (0 until 5).map(i => writeCsv(s"bp$i", Seq(s"$i,r$i")))
    val feed = DynamicWorkUnitFeed.create("dyn-bp")
    feed.offer(files.map(CsvWorkUnit(_, header = true)))
    val q = readDynamicFeed("dyn-bp", maxPerBatch = 2)
      .writeStream.format("memory").queryName("dyn_bp_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dyn_bp_sink").count() == 5,
        "all units must eventually process")
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"5 units at cap 2 need >= 3 batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 2),
        s"a batch exceeded the 2-unit cap: ${batches.map(_.numInputRows).toSeq}")
    } finally { q.stop(); DynamicWorkUnitFeed.remove("dyn-bp") }
  }
}
