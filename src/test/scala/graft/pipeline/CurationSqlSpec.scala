package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Sampling
import graft.text.TextOps

/** The SQL-visible curation surface (§2.7 extended to the LLM wave): the
  * deterministic-curation scalars registered through GraftExtensions must
  * be callable from `spark.sql` and agree exactly with their Column-API
  * forms — an analyst writing pure SQL gets the same buckets, tokens,
  * language ids and fingerprints the pipeline operators use. */
class CurationSqlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "la comida que el perro come es una manzana con los granos"),
    (3L, "Contact me at alice@example.com or https://example.com today"),
    (4L, "der Hund und die Katze sind nicht das Problem für den Mann"))
    .toDF("doc_id", "text")

  test("curation scalars are SQL-visible and equal their Column forms") {
    docs.createOrReplaceTempView("curation_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_bucket(doc_id) AS b,
        |  graft_bucket32(doc_id) AS b32,
        |  graft_token_count(text) AS n,
        |  graft_lang_id(text) AS lang,
        |  graft_fingerprint(text) AS fp,
        |  graft_redact(text) AS red,
        |  graft_words(text) AS toks
        |FROM curation_docs ORDER BY doc_id""".stripMargin)
    val viaApi = docs.select(col("doc_id"),
        Sampling.bucket(col("doc_id")).as("b"),
        Sampling.bucket32(col("doc_id")).as("b32"),
        TextOps.tokenCountWs(col("text")).as("n"),
        TextOps.langId(TextOps.words(TextOps.normalized(col("text"))))
          .as("lang"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.redact(col("text")).as("red"),
        TextOps.words(TextOps.normalized(col("text"))).as("toks"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // sanity on the values themselves, not just agreement
    val langs = viaSql.select($"lang").as[String].collect()
    assert(langs(0) === "en" && langs(3) === "de")
  }

  test("pure-SQL deterministic sampling picks the exact Sampling.sample set") {
    docs.createOrReplaceTempView("curation_docs")
    val sqlKept = spark.sql(
      "SELECT doc_id FROM curation_docs WHERE graft_bucket(doc_id) < 5000")
      .as[Long].collect().sorted.toSeq
    val apiKept = Sampling.sample(docs, col("doc_id"), 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(sqlKept === apiKept)
  }

  test("wrong arity fails loudly at analysis") {
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_bucket(1, 2)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("expects 1")), s"unexpected: $ex")
  }
}
