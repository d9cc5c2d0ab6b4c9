package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextOps

/** PII redaction and vocabulary top-k: exact counts, placeholder
  * substitution, and the TakeOrdered (not global-sort) plan. */
class RedactVocabSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("redact replaces every email and URL and counts them exactly") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org plus https://x.y/z?q=1 end"),
      (2L, "no pii here at all"),
      (3L, "http://plain.example and trailing text")).toDF("id", "t")
    val got = df.select(col("id"),
      TextOps.emailCount(col("t")).as("ne"),
      TextOps.urlCount(col("t")).as("nu"),
      TextOps.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L)._1 === 2 && got(1L)._2 === 1)
    assert(got(1L)._3 === "mail <EMAIL> and <EMAIL> plus <URL> end")
    assert(got(2L) === ((0, 0, "no pii here at all")))
    assert(got(3L)._1 === 0 && got(3L)._2 === 1)
    assert(!got.values.exists(v => v._3.contains("@") && v._1 > 0))
  }

  test("a userinfo URL is one URL, never also an email (ADVICE r6 overlap)") {
    val df = Seq(
      (1L, "see https://user@host.com/x for details"),
      (2L, "mail a@b.co then https://u@h.org/p and b@c.io end"))
      .toDF("id", "t")
    val got = df.select(col("id"),
      TextOps.emailCount(col("t")).as("ne"),
      TextOps.urlCount(col("t")).as("nu"),
      TextOps.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // the URL's userinfo must not be counted or rewritten as an email
    assert(got(1L) === ((0, 1, "see <URL> for details")))
    // standalone emails still count around an embedded userinfo URL
    assert(got(2L) === ((2, 1, "mail <EMAIL> then <URL> and <EMAIL> end")))
  }

  test("vocabulary top-k counts tokens exactly with a deterministic tie order") {
    val df = Seq("b b b a a c", "a c d", "e").map(Tuple1(_)).toDF("text")
    val got = df
      .select(explode(TextOps.words(TextOps.normalized(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("top-k plans TakeOrderedAndProject, not a global sort of the token stream") {
    val df = (0 until 200).map(i => s"tok$i alpha beta").map(Tuple1(_)).toDF("text")
    val plan = df
      .select(explode(TextOps.words(TextOps.normalized(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"want TakeOrdered:\n$plan")
  }
}
