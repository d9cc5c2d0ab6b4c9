package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Expectations
import graft.oracle.Expectations._

class ExpectationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (id, name, score, tag, fk)
    (1L, "alice", 10.0, "AA", 1),
    (2L, "bob", -5.0, "BB", 1),     // range violation
    (3L, null.asInstanceOf[String], 50.0, "CC", 2), // null name
    (4L, "dave", 200.0, "d7", 9),   // range + regex + fk violations
    (4L, "dave2", 30.0, "EE", 2)    // duplicate id
  ).toDF("id", "name", "score", "tag", "fk")

  private def dim = Seq(1, 2, 3).toDF("k")

  private def results(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each check counts exactly its violations, in one result frame") {
    val out = Expectations.run(fixture, Seq(
      NotNull("name"),
      InRange("score", 0.0, 100.0),
      MatchesRegex("tag", "^[A-Z]{2}$"),
      Unique(Seq("id")),
      ReferencedIn("fk", dim, "k")))
    val m = results(out)
    assert(m("not_null(name)") === 1L)
    assert(m("in_range(score)") === 2L)   // -5 and 200
    assert(m("matches_regex(tag)") === 1L) // d7
    assert(m("unique(id)") === 1L)         // second id=4 row
    assert(m("referenced_in(fk)") === 1L)  // fk=9
    assert(out.select($"n_rows").distinct().as[Long].collect().toSeq === Seq(5L))
  }

  test("null values pass range/regex/fk checks (absence is NotNull's job)") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[String], null.asInstanceOf[java.lang.Integer]))
      .toDF("id", "score", "tag", "fk")
    val m = results(Expectations.run(df, Seq(
      InRange("score", 0.0, 1.0),
      MatchesRegex("tag", "^x$"),
      ReferencedIn("fk", dim, "k"))))
    assert(m.values.forall(_ == 0L))
  }

  test("a clean table reports zero violations everywhere") {
    val m = results(Expectations.run(fixture.filter($"id" <= 2), Seq(
      NotNull("name"), Unique(Seq("id")), ReferencedIn("fk", dim, "k"))))
    assert(m.values.forall(_ == 0L))
  }

  test("result frame carries one row per check with the shared row total") {
    val out = Expectations.run(fixture, Seq(
      NotNull("name"), InRange("score", 0.0, 100.0),
      MatchesRegex("tag", "^[A-Z]{2}$")))
    assert(out.columns.toSeq === Seq("check_name", "n_violations", "n_rows"))
    assert(results(out).size === 3)
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.run(fixture, Seq(NotNull("name"), NotNull("name")))
    }
  }
}
