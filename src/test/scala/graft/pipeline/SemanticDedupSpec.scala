package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sim.Similarity

/** [[Similarity.semanticDedup]] — the SemDeDup rule pinned at unit size:
  * keep-least-centroid-similar, greedy scan against ALL earlier-ranked
  * members (dropped or not), clusters fully isolated. */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Int, Seq[Float])*) =
    rows.toDF("id", "c", "e")
      .select(col("id"), col("c"), col("e").cast("array<float>"))

  private def kept(d: org.apache.spark.sql.DataFrame, tau: Double): Set[Long] =
    Similarity.semanticDedup(d, "id", "e", "c", tau)
      .select("id").as[Long].collect().toSet

  test("the least-centroid-similar member survives; its near-dups drop") {
    // cluster 0: two near-identical vectors + one off-axis outlier. The
    // centroid leans toward the pair, so the OUTLIER ranks first (lowest
    // centroid cosine) and survives; of the pair, the earlier-ranked one
    // survives and the other drops (cos(pair) ≈ 1 > tau).
    val d = df(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0.999f, 0.04f)),
      (3L, 0, Seq(0.2f, 0.98f)))
    val k = kept(d, tau = 0.9)
    assert(k.contains(3L), "the outlier must survive")
    assert(k.size == 2 && (k.contains(1L) ^ k.contains(2L)),
      s"exactly one of the near-dup pair survives: $k")
  }

  test("greedy scan counts DROPPED earlier members too") {
    // a ~ b (cos > tau), b ~ c, a !~ c. Rank order (by centroid-sim asc,
    // id) puts a first. b drops against a; c must STILL drop against b —
    // the reference implementation scans all earlier-ranked members,
    // dropped or not — even though c's only above-threshold neighbor was
    // itself dropped.
    val a = Seq(1f, 0f, 0f)
    val b = Seq(0.77f, 0.638f, 0f) // cos(a,b) ≈ 0.77, cos(b,c) ≈ 0.77
    val c = Seq(0.186f, 0.982f, 0f) // cos(a,c) ≈ 0.19
    val d = df((1L, 0, a), (2L, 0, b), (3L, 0, c))
    val k = kept(d, tau = 0.75)
    // rank is by centroid cosine: verify the premise that a or c ranks
    // before b (b is centroid-most by construction: it IS the middle)
    assert(!k.contains(2L), "b drops against an earlier member")
    assert(k.size == 1 || k.size == 2,
      s"c's fate follows the greedy rule, never a revival: $k")
    // exact expectation: centroid ≈ normalize(a+b+c); b is closest to it,
    // so rank = (a or c), (the other), b. cos(a,c) < tau keeps both; b
    // drops against whichever of a/b pair-threshold hits first.
    assert(k == Set(1L, 3L), s"a and c survive, b drops: $k")
  }

  test("clusters are fully isolated: identical vectors in different " +
      "clusters both survive") {
    val v = Seq(1f, 0f)
    val d = df((1L, 0, v), (2L, 1, v), (3L, 0, v))
    val k = kept(d, tau = 0.9)
    assert(k.contains(2L), "the other cluster's copy is untouched")
    assert((k - 2L).size == 1, s"within cluster 0 one copy survives: $k")
  }

  test("tau above every pairwise cosine keeps everything") {
    val d = df((1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f)),
      (3L, 1, Seq(0.6f, 0.8f)))
    assert(kept(d, tau = 0.99) == Set(1L, 2L, 3L))
  }

  private def centroidsOf(d: org.apache.spark.sql.DataFrame) =
    d.groupBy(col("c"))
      .agg(graft.sim.VectorMean.column(col("e")).as("e"))

  private def emptyReg(d: org.apache.spark.sql.DataFrame) =
    d.select(col("c"), lit(0.0).as("nrm"), col("e")).limit(0)

  private def keptInc(batch: org.apache.spark.sql.DataFrame,
      centroids: org.apache.spark.sql.DataFrame,
      registry: org.apache.spark.sql.DataFrame, tau: Double): Set[Long] =
    Similarity.semanticDedupIncremental(batch, "id", "e", "c",
        centroids, registry, tau)
      .kept.select("id").as[Long].collect().toSet

  test("incremental: a registry seed drops a batch near-dup; the batch " +
      "never re-decides the registry") {
    val all = df(
      (1L, 0, Seq(1f, 0f)), // batch 1
      (2L, 0, Seq(0.999f, 0.04f)), (3L, 0, Seq(0.2f, 0.98f))) // batch 2
    val cents = centroidsOf(all)
    val r1 = Similarity.semanticDedupIncremental(
      all.filter(col("id") === 1L), "id", "e", "c", cents, emptyReg(all),
      tau = 0.9)
    assert(r1.kept.select("id").as[Long].collect().toSet == Set(1L))
    val k2 = keptInc(all.filter(col("id") =!= 1L), cents, r1.newMembers,
      tau = 0.9)
    assert(k2 == Set(3L),
      s"the near-dup of the seed drops, the outlier survives: $k2")
  }

  test("incremental: the registry carries DROPPED members — a later " +
      "batch still drops against them") {
    // call 1: a ~ b (cos > tau), b drops against a. call 2: c ~ b only.
    // c must STILL drop — the registry ships all prior members, kept and
    // dropped, exactly like the batch rule's greedy scan.
    val a = Seq(1f, 0f, 0f)
    val b = Seq(0.77f, 0.638f, 0f)
    val c = Seq(0.186f, 0.982f, 0f) // cos(b,c) ≈ 0.77, cos(a,c) ≈ 0.19
    val all = df((1L, 0, a), (2L, 0, b), (3L, 0, c))
    val cents = centroidsOf(all)
    val r1 = Similarity.semanticDedupIncremental(
      all.filter(col("id") < 3L), "id", "e", "c", cents, emptyReg(all),
      tau = 0.75)
    assert(r1.kept.select("id").as[Long].collect().toSet == Set(1L),
      "b drops against a within the first batch")
    val k2 = keptInc(all.filter(col("id") === 3L), cents, r1.newMembers,
      tau = 0.75)
    assert(k2.isEmpty, s"c must drop against the DROPPED b: $k2")
  }

  test("incremental with an empty registry equals batch semanticDedup " +
      "when given the same centroids") {
    val d = df(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0.999f, 0.04f)),
      (3L, 0, Seq(0.2f, 0.98f)), (4L, 1, Seq(0f, 1f)),
      (5L, 1, Seq(0.04f, 0.999f)), (6L, 1, Seq(0.9f, 0.44f)))
    // batch semanticDedup computes per-cluster centroids internally as
    // the members' mean — hand the SAME means to the incremental form
    val inc = keptInc(d, centroidsOf(d), emptyReg(d), tau = 0.9)
    assert(inc == kept(d, tau = 0.9), s"incremental ≠ batch: $inc")
  }

  test("composes with kmeansCentroids + assignClusters when no cluster " +
      "column exists (the scaladoc's no-labels path)") {
    // two tight direction groups, far apart: k-means with k=2 separates
    // them, then semantic dedup collapses each group's near-identical
    // tail — the end-to-end path a user without precomputed labels runs
    val d = Seq(
      (1L, Seq(1f, 0.01f)), (2L, Seq(0.999f, 0.03f)), (3L, Seq(0.997f, 0f)),
      (4L, Seq(0.01f, 1f)), (5L, Seq(0.02f, 0.999f)))
      .toDF("id", "e")
      .select(col("id"), col("e").cast("array<float>"))
    val cents = Similarity.kmeansCentroids(d, "id", "e", nCentroids = 2,
      iterations = 2)
    val assigned = Similarity.assignClusters(d, cents, "id", "e")
    val kept = Similarity.semanticDedup(assigned, "id", "e", "cluster",
        tau = 0.95)
      .select("id").as[Long].collect().toSet
    // each direction group keeps at least one member and drops at least
    // one near-duplicate; members of different groups never interact
    assert(kept.intersect(Set(1L, 2L, 3L)).nonEmpty &&
      kept.intersect(Set(1L, 2L, 3L)).size < 3,
      s"group A must dedup internally: $kept")
    assert(kept.intersect(Set(4L, 5L)).size == 1,
      s"group B keeps exactly one of its near-identical pair: $kept")
  }

  test("incremental: a batch cluster missing from the fixed centroids " +
      "still dedups (ranked by id), never silently survives") {
    val v = Seq(1f, 0f)
    val d = df((1L, 7, v), (2L, 7, v)) // cluster 7 has no centroid row
    val cents = centroidsOf(df((9L, 0, Seq(0f, 1f)))) // only cluster 0
    val k = keptInc(d, cents, emptyReg(d), tau = 0.9)
    assert(k == Set(1L), s"the id-ranked first copy survives, the " +
      s"duplicate drops even without a centroid: $k")
  }

  test("null cluster ids pass through undeduped in both forms and never " +
      "enter the registry") {
    val v = Seq(1f, 0f)
    val rows = Seq[(Long, Option[Int], Seq[Float])](
      (1L, None, v), (2L, None, v), (3L, Some(0), v))
    val d = rows.toDF("id", "c", "e")
      .select(col("id"), col("c"), col("e").cast("array<float>"))
    // batch form: the two unassigned duplicates both survive
    assert(kept(d, tau = 0.9).intersect(Set(1L, 2L)) == Set(1L, 2L))
    // incremental: same, and newMembers carries only the assigned row
    val r = Similarity.semanticDedupIncremental(d, "id", "e", "c",
      centroidsOf(d.filter(col("c").isNotNull)), emptyReg(d), tau = 0.9)
    assert(r.kept.select("id").as[Long].collect().toSet
      .intersect(Set(1L, 2L)) == Set(1L, 2L))
    assert(r.newMembers.count() == 1)
  }

  test("a cluster over maxCluster fails loudly, naming the knob") {
    val d = df((1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f)),
      (3L, 0, Seq(0.6f, 0.8f)))
    val e = intercept[Exception] {
      Similarity.semanticDedup(d, "id", "e", "c", tau = 0.9, maxCluster = 2)
        .count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m =>
      m.contains("maxMembers") && m.contains("re-cluster")),
      s"expected the loud guard message, got: ${chain(e)}")
  }
}
