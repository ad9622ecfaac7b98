package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.Shell

/** The interactive surface ([[graft.tools.Shell]]): suite-scoped view
  * binding, SQL execution, the stage-tree :explain, and corpus-query
  * dispatch — the engine's analog of the reference's cli/console pair.
  */
class ShellSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(stmt: String): String = {
    Shell.execute(spark, sf001, ":suite fixture")
    Shell.execute(spark, sf001, stmt)
  }

  test("plain SQL over the fixture catalog renders rows") {
    val out = run("SELECT count(*) AS n FROM nation;")
    assert(out.contains("n"))
    assert(out.contains("25"))
  }

  test(":suite tpcds binds the adapter views") {
    Shell.execute(spark, sf001, ":suite tpcds")
    val out = Shell.execute(spark, sf001,
      "SELECT count(*) AS n FROM store_sales")
    assert("\\b\\d+\\b".r.findFirstIn(out).exists(_.toLong > 0))
  }

  test(":explain renders the executed stage tree with metrics") {
    val out = run(":explain SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus")
    assert(out.contains("Stage"), out.take(200))
    assert(out.contains("numOutputRows"), out.take(200))
  }

  test(":q dispatches a corpus query by name") {
    val out = run(":q q01_pricing_summary")
    assert(out.contains("s)"), out.take(200)) // timing suffix
    assert(!out.contains("unknown query"))
  }

  test("unknown suite and unknown command fail gracefully") {
    assert(run(":suite nope").contains("unknown suite"))
    assert(run(":wat").contains("unknown command"))
    assert(run(":q nope").contains("unknown query"))
  }

  test("row output is bounded at 200 rows") {
    val out = run("SELECT explode(sequence(1, 500)) AS v;")
    assert(out.contains("only showing top 200 rows"))
  }
}
