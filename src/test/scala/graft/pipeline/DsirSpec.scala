package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.curate.Dsir

/** Contract of DSIR importance weighting: target-typical tokens score
  * positive, off-target tokens negative, token-less docs are 0, and the
  * weight decomposes as an exact sum of per-token bucket ratios. */
class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // target docs (t=true) are all "alpha"; raw pool adds "omega"-heavy docs
  private def corpus = Seq(
    (1L, "alpha alpha alpha", true),
    (2L, "alpha alpha alpha", true),
    (3L, "alpha alpha omega", false),
    (4L, "omega omega omega", false),
    (5L, "", false))
    .toDF("doc_id", "text", "t")

  test("target-typical docs outweigh off-target docs; empty doc is 0") {
    // alpha small relative to the per-bucket counts so the smoothing mass
    // doesn't flatten the ratio (with alpha*B comparable to the totals,
    // every weight shrinks toward ln(t_raw/t_tgt)-ish constants)
    val r = Dsir.importanceWeights(corpus, "doc_id", "text", col("t"),
        buckets = 16, alpha = 0.1)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1)._3 > r(3)._3 && r(3)._3 > r(4)._3,
      "weights must order by target-token density")
    assert(r(4)._3 < 0.0, "pure off-target doc scores negative")
    assert(r(1)._3 > 0.0, "pure target-token doc scores positive")
    assert(r(5) == ((false, 0L, 0.0)), "token-less doc: n=0, logw=0")
    assert(r(1)._1 && !r(3)._1, "is_target flag is provenance")
  }

  test("weight equals the hand-computed smoothed bucket ratio sum") {
    // single-token docs so the sum has one term per token
    val tiny = Seq((1L, "x", true), (2L, "x", false), (3L, "y", false))
      .toDF("doc_id", "text", "t")
    val r = Dsir.importanceWeights(tiny, "doc_id", "text", col("t"),
        buckets = 4, alpha = 0.5)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // x: c_tgt=1, c_raw=2; y: c_tgt=0, c_raw=1; t_tgt=1, t_raw=3; aB=2
    def lr(ct: Double, cr: Double) =
      math.log((ct + 0.5) / (1 + 2.0)) - math.log((cr + 0.5) / (3 + 2.0))
    assert(math.abs(r(1) - lr(1, 2)) < 1e-12)
    assert(math.abs(r(3) - lr(0, 1)) < 1e-12)
    assert(r(1) == r(2), "same text, same weight regardless of flag")
  }

  test("materialized (scratchDir) path is value-identical to the lazy path") {
    val lazyR = Dsir.importanceWeights(corpus, "doc_id", "text", col("t"),
      buckets = 16, alpha = 0.1).orderBy("doc_id").collect().toSeq
    val mat = Dsir.importanceWeights(corpus, "doc_id", "text", col("t"),
      buckets = 16, alpha = 0.1,
      scratchDir = Some(tmpDir("dsir-scratch"))).orderBy("doc_id")
    assert(mat.collect().toSeq === lazyR)
    // exactly one tokenize of the corpus: the scoring side reads the
    // materialization, not the text
    val scans = mat.queryExecution.executedPlan.toString
    assert(!scans.contains("regexp_replace") ||
      scans.linesIterator.count(_.contains("Generate explode(ws")) <= 1,
      "materialized plan must not re-tokenize per consumer")
  }

  test("guards: bucket and alpha bounds") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(corpus, "doc_id", "text", col("t"), buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(corpus, "doc_id", "text", col("t"), alpha = 0.0)
    }
  }
}
