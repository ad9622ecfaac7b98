package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.feed.{CsvWorkUnit, WorkUnitFeedRegistry}

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
}
