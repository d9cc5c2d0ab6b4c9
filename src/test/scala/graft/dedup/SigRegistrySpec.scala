package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Contract of [[Dedup.incrementalDedupSigs]] — the signature-registry
  * incremental near-dup form:
  *  1. EQUALITY: on any (existing, incoming) split its kept set equals
  *     [[Dedup.incrementalDedup]]'s (the corpus-rescanning form) at the
  *     recall-total config — same drop rule, same pair set, reached
  *     without re-shingling the registry;
  *  2. COMPOSITION: folding batch after batch through the accumulated
  *     `registryRows` equals the text-registry form fed the same
  *     accumulated corpus — the registry rows carry everything a later
  *     batch needs;
  *  3. corner rows: empty/punctuation-only docs get NULL-sig registry
  *     rows, never pair, and never break a later batch.
  */
class SigRegistrySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

  private val cfg = (2, 16, 8, 0.9) // n, bands, rowsPerBand, threshold

  private def keptTextForm(existing: DataFrame, incoming: DataFrame): Set[Long] = {
    val (n, b, r, t) = cfg
    Dedup.incrementalDedup(existing, incoming, "doc_id", "text", n, b, r, t)
      .select("doc_id").as[Long].collect().toSet
  }

  private def keptSigForm(registry: DataFrame, incoming: DataFrame): Set[Long] = {
    val (n, b, r, t) = cfg
    Dedup.incrementalDedupSigs(registry, incoming, "doc_id", "text", n, b, r, t)
      .kept.select("doc_id").as[Long].collect().toSet
  }

  private def registryOf(df: DataFrame): DataFrame = {
    val (n, b, r, _) = cfg
    df.select(col("doc_id"), col("text"))
      .join(Dedup.signatureArrays(df, "doc_id", "text", n, b * r)
        .withColumnRenamed("doc", "doc_id"), Seq("doc_id"), "left")
  }

  test("sig form == text form on the real corpus (every 3rd doc incoming)") {
    val existing = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    val viaText = keptTextForm(existing, incoming)
    val viaSig = keptSigForm(registryOf(existing), incoming)
    assert(viaSig === viaText)
    assert(viaSig.nonEmpty && viaSig.size < incoming.count(),
      "fixture sanity: some incoming docs must actually drop")
  }

  test("the adaptive semi-filter skip never changes the kept set") {
    // registrySizeHint drives a PLAN choice only (skip the candidate
    // semi-join when candidates reach half the registry): force both
    // branches on the same split and pin equality — a hint of 0 makes
    // every candidate set 'big' (always skip), no hint always filters
    val (n, b, r, t) = cfg
    val existing = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    val reg = registryOf(existing)
    def kept(hint: Long): Set[Long] =
      Dedup.incrementalDedupSigs(reg, incoming, "doc_id", "text", n, b, r, t,
          registrySizeHint = hint)
        .kept.select("doc_id").as[Long].collect().toSet
    assert(kept(0L) === kept(-1L),
      "skip-semi and filter-semi branches must produce the same survivors")
    assert(kept(Long.MaxValue) === kept(-1L),
      "an over-large hint (never skip) must also be a no-op on the result")
  }

  test("batch-over-batch fold through registryRows == text form on the " +
      "accumulated corpus") {
    val (n, b, r, t) = cfg
    val batches = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    var registry = registryOf(docs.limit(0))
    var allPrior = docs.limit(0)
    for (batch <- batches) {
      val step = Dedup.incrementalDedupSigs(registry, batch,
        "doc_id", "text", n, b, r, t)
      val viaSig = step.kept.select("doc_id").as[Long].collect().toSet
      val viaText = keptTextForm(allPrior, batch)
      assert(viaSig === viaText,
        s"fold diverged from the text form on a batch of ${batch.count()}")
      registry = registry.unionByName(step.registryRows).localCheckpoint(true)
      allPrior = allPrior.unionByName(batch).localCheckpoint(true)
    }
  }

  test("fuzz: sig form == text form across random corpora and splits") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "λμ", "nu", "Xi", "omi.cron", "pi!")
    def doc(): String = {
      val len = 1 + rnd.nextInt(12)
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val (n, b, r, t) = (2, 8, 4, 0.6) // looser config: more pairs fire
    for (trial <- 1 to 3) {
      val base = (1L to 60L).map { i =>
        // a mix of fresh docs, exact dups, and near-dups of earlier docs
        val text = rnd.nextInt(3) match {
          case 0 => doc()
          case 1 if i > 1 => // exact dup of a random earlier doc
            s"dup of ${1 + rnd.nextInt(i.toInt - 1)}"
          case _ => doc() + " tail" + rnd.nextInt(3)
        }
        (i, text)
      }
      // resolve the "dup of k" markers to doc k's text
      val byId = base.toMap
      def resolve(s: String): String =
        if (s.startsWith("dup of ")) byId(s.drop(7).toLong) match {
          case again if again.startsWith("dup of ") => doc() // no chains
          case x => x
        } else s
      val rows = base.map { case (i, s) => (i, resolve(s)) }
      val cut = 20 + rnd.nextInt(20)
      val existing = rows.take(cut).toDF("doc_id", "text")
      val incoming = rows.drop(cut).toDF("doc_id", "text")
      val viaText = Dedup.incrementalDedup(existing, incoming,
          "doc_id", "text", n, b, r, t)
        .select("doc_id").as[Long].collect().toSet
      val reg = existing
        .join(Dedup.signatureArrays(existing, "doc_id", "text", n, b * r)
          .withColumnRenamed("doc", "doc_id"), Seq("doc_id"), "left")
      val viaSig = Dedup.incrementalDedupSigs(reg, incoming,
          "doc_id", "text", n, b, r, t)
        .kept.select("doc_id").as[Long].collect().toSet
      assert(viaSig === viaText, s"trial $trial (cut $cut) diverged")
    }
  }

  test("empty/punctuation-only docs: NULL-sig registry rows, kept, inert") {
    val (n, b, r, t) = cfg
    val weird = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, ""),
      (3L, "...!!!"),
      (4L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val step = Dedup.incrementalDedupSigs(registryOf(weird.limit(0)), weird,
      "doc_id", "text", n, b, r, t)
    assert(step.kept.select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 3L), "4 is an exact dup of 1; degenerate docs keep")
    val regRows = step.registryRows.collect()
    assert(regRows.length === 4)
    assert(regRows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet
      === Set(2L, 3L), "no-shingle docs must carry NULL sigs")
    // a later batch against that registry: the null-sig rows are inert,
    // and a near-dup of doc 1 still drops via the stored signature
    val later = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "completely unrelated words about streaming dedup registries"))
      .toDF("doc_id", "text")
    val step2 = Dedup.incrementalDedupSigs(step.registryRows, later,
      "doc_id", "text", n, b, r, threshold = 0.5)
    assert(step2.kept.select("doc_id").as[Long].collect().toSet === Set(11L))
  }
}
