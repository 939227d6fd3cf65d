package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.operators.Audit.Rule._

class AuditSpec extends SparkSpec {

  private def fixture = df("id BIGINT, v DOUBLE, tag STRING",
    Row(1L, 0.5, "click"), Row(2L, 1.5, "view"), Row(3L, null, "click"),
    Row(4L, -0.1, null), Row(5L, 0.9, "Click"), Row(1L, 0.0, "view"))

  private def report(rules: Audit.Rule*): Map[String, (Long, Long, Boolean)] =
    Audit.audit(fixture, rules).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("not_null counts nulls only") {
    val r = report(NotNull("v"), NotNull("tag"), NotNull("id"))
    assert(r("not_null(v)") == ((1L, 6L, false)))
    assert(r("not_null(tag)") == ((1L, 6L, false)))
    assert(r("not_null(id)") == ((0L, 6L, true)))
  }

  test("in_range ignores nulls and is inclusive at both rails") {
    val r = report(InRange("v", 0.0, 1.0))
    // violations: 1.5 and -0.1; 0.0/0.5/0.9 in range, null skipped
    assert(r("in_range(v,0.0,1.0)") == ((2L, 6L, false)))
  }

  test("matches is full-match over non-nulls") {
    val r = report(Matches("tag", "[a-z]+"))
    // 'Click' fails the full match; null skipped
    assert(r("matches(tag)") == ((1L, 6L, false)))
  }

  test("accepted_values flags out-of-set non-nulls") {
    val r = report(AcceptedValues("tag", Seq("click", "view")))
    assert(r("accepted_values(tag)") == ((1L, 6L, false)))
  }

  test("unique counts surplus rows per duplicated key, null is a level") {
    val r = report(Unique(Seq("id")), Unique(Seq("tag")),
      Unique(Seq("id", "tag")))
    assert(r("unique(id)") == ((1L, 6L, false)))     // id 1 twice
    assert(r("unique(tag)") == ((2L, 6L, false)))    // click x2, view x2
    assert(r("unique(id,tag)") == ((0L, 6L, true)))
  }

  test("mixed report: one row per rule, pass iff zero violations") {
    val out = Audit.audit(fixture,
      Seq(NotNull("id"), InRange("v", 0.0, 1.0), Unique(Seq("id"))))
    assert(out.columns.toSeq ==
      Seq("rule", "violations", "total", "pass"))
    assert(out.count() == 3)
    assert(out.filter("pass").count() == 1)
  }

  test("empty frame: zero violations, zero totals, unique passes") {
    val empty = fixture.filter("id < 0")
    val out = Audit.audit(empty, Seq(NotNull("v"), Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("not_null(v)") == ((0L, 0L)))
    assert(out("unique(id)") == ((0L, 0L)))
  }

  test("row-local rules share ONE aggregation pass") {
    val plan = Audit.audit(fixture,
      Seq(NotNull("v"), InRange("v", 0.0, 1.0), Matches("tag", "[a-z]+"),
        AcceptedValues("tag", Seq("click", "view"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans <= 1, s"expected one source scan, plan:\n$plan")
  }

  test("rejects duplicate rule names and empty rule lists") {
    intercept[IllegalArgumentException](
      Audit.audit(fixture, Seq(NotNull("v"), NotNull("v"))))
    intercept[IllegalArgumentException](Audit.audit(fixture, Nil))
    intercept[IllegalArgumentException](InRange("v", 2.0, 1.0))
    intercept[IllegalArgumentException](AcceptedValues("v", Nil))
  }
}
