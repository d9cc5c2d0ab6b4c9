package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Sampling
import graft.text.TextOps

/** The fused DSIR feature kernel must be BYTE-EQUAL to the composed form
  * it replaces — same tokens, same md5 buckets, same corner cases — on
  * text that exercises every branch of the regex semantics it re-derives:
  * punctuation DELETION without a token boundary ("a,b" is one token),
  * space collapse, leading/trailing trim, unicode (lowercased by lower()
  * then dropped by the ASCII class), digits, empties and nulls. */
class TokenBucketsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    "The quick brown fox  jumps",
    "a,b c;;d  e!!",
    "  leading and trailing  ",
    "ALL CAPS 123 mixedCase42",
    "punct-only !!! ,,, ...",
    "unicode: ÉLÈVE naïve 東京 test",
    "K (kelvin sign) lowercases into ascii k",
    "", " ", "\t\n", null,
    "a" * 500 + " tail",
    (0 until 50).map(i => s"w$i").mkString(","))

  test("token_buckets == composed bucket32-per-token form, all corners") {
    val df = rows.toDF("text").withColumn("id", monotonically_increasing_id())
    for (buckets <- Seq(2, 256, 10007)) {
      val composed = df.select(col("id"),
        explode(TextOps.words(TextOps.normalized(col("text")))).as("w"))
        .filter(col("w") =!= "")
        .select(col("id"),
          (Sampling.bucket32(col("w")) % buckets).cast("int").as("b"))
        .groupBy("id").agg(collect_list("b").as("bs"))
        .as[(Long, Seq[Int])].collect().toMap
      val kernel = df.select(col("id"),
        call_function("token_buckets", col("text"), lit(buckets)).as("bs"))
        .as[(Long, Option[Seq[Int]])].collect().toMap
      df.select("id").as[Long].collect().foreach { id =>
        val k = kernel(id)
        if (rows(id.toInt) == null) assert(k.isEmpty, s"null text row $id")
        else assert(k.getOrElse(Nil) == composed.getOrElse(id, Nil),
          s"row $id (buckets=$buckets): '${rows(id.toInt)}'")
      }
    }
  }

  test("fast_tokens == words(normalized(text)), all corners incl. the " +
    "empty-string sentinel") {
    val df = rows.toDF("text").withColumn("id", monotonically_increasing_id())
    val composed = df.select(col("id"),
      TextOps.words(TextOps.normalized(col("text"))).as("ws"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    val kernel = df.select(col("id"),
      call_function("fast_tokens", col("text")).as("ws"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    composed.keys.foreach { id =>
      assert(kernel(id) == composed(id),
        s"row $id: '${rows(id.toInt)}' → ${kernel(id)} vs ${composed(id)}")
    }
  }

  test("token_bucket_counts == dense histogram of token_buckets, " +
    "all corners") {
    val df = rows.toDF("text").withColumn("id", monotonically_increasing_id())
    for (buckets <- Seq(2, 256)) {
      val perOcc = df.select(col("id"),
        call_function("token_buckets", col("text"), lit(buckets)).as("bs"))
        .as[(Long, Option[Seq[Int]])].collect().toMap
      val counts = df.select(col("id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.TokenBucketCounts(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("text")),
            org.apache.spark.sql.graft.ColumnBridge.expression(lit(buckets))))
          .as("cv"))
        .as[(Long, Option[Seq[Int]])].collect().toMap
      perOcc.keys.foreach { id =>
        (perOcc(id), counts(id)) match {
          case (None, cv) => assert(cv.isEmpty, s"null text row $id")
          case (Some(bs), cv) =>
            val expect = Seq.tabulate(buckets)(b => bs.count(_ == b))
            assert(cv.contains(expect),
              s"row $id (buckets=$buckets): '${rows(id.toInt)}'")
        }
      }
    }
  }

  test("kernel stays inside whole-stage codegen") {
    val dir = tmpDir("tokbuckets")
    rows.filter(_ != null).toDF("text").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(call_function("token_buckets", col("text"), lit(256)))
    val generated = q.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(generated.contains("TokenBuckets.compute"),
      "the generated code must call the fused kernel")
  }
}
