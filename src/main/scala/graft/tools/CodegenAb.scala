package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Codegen A/B harness: times a query set under the session default
  * (whole-stage codegen + generated expression code) and under
  * `factoryMode=NO_CODEGEN` + `wholeStage=false` (fully interpreted
  * expression evaluation) IN THE SAME JVM, interleaved per query so JIT and
  * page-cache warmth are shared equally by both arms.
  *
  * Motivation: round 7 converted the six sketch expressions from
  * `CodegenFallback` to `doGenCode`, and the grading machine then measured
  * p09/p49 (the two queries dominated by those expressions) 4-6x slower
  * than the same code on the build machine, while queries without codegen
  * changes (p48/p15) improved on both machines. If generated code were the
  * regression, the NO_CODEGEN arm would win here; committed output
  * (`AB_CODEGEN_r*.json`) records the answer on whatever machine runs it.
  *
  * Usage: `runMain graft.tools.CodegenAb [sfDir] [query...]`
  * (defaults: SPARK_GRAFT_SF_DIR, the round-7 regression set + two
  * no-codegen-change controls). Also prints a MetricsReport stage breakdown
  * per query (default arm) so a slow stage is attributable.
  */
object CodegenAb {

  /** The driver-measured round-7 regressions, their suspected cause class,
    * and two controls whose expressions did NOT change in round 7.
    */
  private val defaultSet = Seq(
    "p09_simhash_sigs",          // sketch doGenCode conversion (suspect)
    "p49_bloom_decontamination", // sketch doGenCode conversion (suspect)
    "p23_bm25_search",           // regressed, no codegen change
    "p57_curation_pipeline",     // regressed, no codegen change
    "p27_centroid_confusion",    // large driver-vs-local spread
    "q87_ndv_sized_agg",         // large driver-vs-local spread
    "p48_best_of_cluster",       // control: improved on both machines
    "p15_winnow_fingerprints")   // control: improved on both machines

  private val interpretedConf = Map(
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
    "spark.sql.codegen.wholeStage" -> "false")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = if (args.length > 1) args.tail.toSeq else defaultSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val spark = GraftSession.builder(s"local[$cpus]", "graft-codegen-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def best(name: String): Double = (1 to iters).map(_ => time(name)).min

    val saved = interpretedConf.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    val rows = names.map { n =>
      val dflt = best(n)
      interpretedConf.foreach { case (k, v) => spark.conf.set(k, v) }
      val interp =
        try best(n)
        finally saved.foreach { case (k, vOpt) =>
          vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      println(f"[ab] $n%-28s default=$dflt%7.3f s  no_codegen=$interp%7.3f s" +
        f"  ratio=${interp / dflt}%5.2f")
      (n, dflt, interp)
    }

    // Hostname lookup can throw on misconfigured resolvers and runs after
    // the whole A/B — never let provenance stamping lose a completed run.
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => sys.env.getOrElse("HOSTNAME", "unknown") }
    val json = rows.map { case (n, d, i) =>
      s""""$n":{"default":${f"$d%.3f"},"no_codegen":${f"$i%.3f"}}"""
    }.mkString("{", ",", s""","sf":"$sfDir","cpus":$cpus,"iters":$iters,"run_host":"$host"}""")
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("AB_CODEGEN.json"), json.getBytes("UTF-8"))

    // Stage breakdown (default arm) for attribution: which stage carries
    // the wall clock, and is it scan, shuffle or expression-bound.
    names.foreach { n =>
      println(s"---- stages: $n ----")
      println(MetricsReport.render(
        MetricsReport.collect(SparkEntry.queries(n)(spark, sfDir))))
    }
    spark.stop()
  }
}
