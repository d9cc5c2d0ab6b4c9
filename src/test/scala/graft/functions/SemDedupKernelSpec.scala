package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel properties for [[SemDedupDrops]]/[[SemDedupSweep]] — no
  * Spark jobs: the kernels are exercised on hand-built catalyst rows
  * against an INDEPENDENT plain-Scala statement of the paper rule, over
  * random clusters drawn from a tiny component grid (ties, zero vectors
  * → NaN cosines, and null embeddings all occur naturally). */
class SemDedupKernelSpec extends AnyFunSuite {

  private case class M(id: Long, csim: Option[Double], nrm: Option[Double],
      emb: Option[Array[Float]])

  private def row(m: M): InternalRow = new GenericInternalRow(Array[Any](
    m.id,
    m.csim.map(d => d: Any).orNull,
    m.nrm.map(d => d: Any).orNull,
    m.emb.map(e => new GenericArrayData(e.map(f => f: Any)): Any).orNull))

  private def membersArr(ms: Seq[M]): ArrayData =
    new GenericArrayData(ms.map(m => row(m): Any).toArray)

  private def seedsArr(ss: Seq[(Option[Double], Option[Array[Float]])])
      : ArrayData =
    new GenericArrayData(ss.map { case (nrm, emb) =>
      new GenericInternalRow(Array[Any](
        nrm.map(d => d: Any).orNull,
        emb.map(e => new GenericArrayData(e.map(f => f: Any)): Any).orNull))
        : Any
    }.toArray)

  /** Independent reference: the paper rule spelled directly. */
  private def referenceDrops(ms: Seq[M], tau: Double,
      seeds: Seq[(Option[Double], Option[Array[Float]])]): Set[Long] = {
    // rank ascending by (csim, id): null csim FIRST, doubles by Java's
    // total order (NaN greatest) — Spark's asc-nulls-first window order
    val ranked = ms.sortWith { (a, b) =>
      (a.csim, b.csim) match {
        case (None, None) => a.id < b.id
        case (None, _) => true
        case (_, None) => false
        case (Some(x), Some(y)) =>
          val c = java.lang.Double.compare(x, y)
          if (c != 0) c < 0 else a.id < b.id
      }
    }
    def hit(ea: Array[Float], na: Double, eb: Array[Float], nb: Double)
        : Boolean = {
      if (ea.length != eb.length) return false // null dot never drops
      var acc = 0.0
      var i = 0
      while (i < ea.length) { acc += ea(i).toDouble * eb(i).toDouble; i += 1 }
      val cos = acc / (na * nb)
      cos.isNaN || cos >= tau // Spark SQL >=: NaN compares greatest
    }
    val dropped = scala.collection.mutable.Set[Long]()
    for (i <- ranked.indices) {
      val b = ranked(i)
      if (b.emb.isDefined && b.nrm.isDefined) {
        val seedHit = seeds.exists { case (sn, se) =>
          sn.isDefined && se.isDefined &&
            hit(se.get, sn.get, b.emb.get, b.nrm.get)
        }
        val earlierHit = (0 until i).exists { j =>
          val a = ranked(j) // dropped or not — the boolean-matrix sweep
          a.emb.isDefined && a.nrm.isDefined &&
            hit(a.emb.get, a.nrm.get, b.emb.get, b.nrm.get)
        }
        if (seedHit || earlierHit) dropped += b.id
      }
    }
    dropped.toSet
  }

  private def kernelDrops(ms: Seq[M], tau: Double): Set[Long] = {
    val out = SemDedupDrops.compute(membersArr(ms), tau, maxMembers = 1 << 20)
    (0 until out.numElements()).map(out.getLong).toSet
  }

  private def kernelSweep(ms: Seq[M], tau: Double,
      seeds: Seq[(Option[Double], Option[Array[Float]])]): Set[Long] = {
    val out = SemDedupSweep.compute(membersArr(ms), seedsArr(seeds), tau,
      maxMembers = 1 << 20)
    (0 until out.numElements()).map(out.getLong).toSet
  }

  private def nrmOf(e: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < e.length) { acc += e(i).toDouble * e(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  // random clusters from a {-1, 0, 1, 2} component grid: identical vectors
  // (csim ties), zero vectors (0/0 = NaN cosines), occasional null
  // embeddings — every edge the kernel special-cases occurs naturally
  private def randomCluster(rnd: scala.util.Random, maxSize: Int)
      : (Seq[M], Double) = {
    val dim = 2 + rnd.nextInt(2)
    val grid = Array(-1f, 0f, 1f, 2f)
    val size = rnd.nextInt(maxSize + 1)
    val ms = (0 until size).map { i =>
      if (rnd.nextInt(10) == 0) M(i.toLong, None, None, None)
      else {
        val e = Array.fill(dim)(grid(rnd.nextInt(grid.length)))
        val n = nrmOf(e)
        // csim as the true cosine to a random "centroid" — or NaN when
        // either norm is zero, mirroring the production projection
        val c = Array.fill(dim)(grid(rnd.nextInt(grid.length)))
        var dot = 0.0
        for (d <- 0 until dim) dot += e(d).toDouble * c(d).toDouble
        val csim = dot / (n * nrmOf(c))
        M(i.toLong, Some(csim), Some(n), Some(e))
      }
    }
    val tau = Array(0.0, 0.3, 0.7, 0.95)(rnd.nextInt(4))
    (ms, tau)
  }

  test("property: kernel == independent reference (2000 random clusters)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2000) {
      val (ms, tau) = randomCluster(rnd, maxSize = 8)
      val k = kernelDrops(ms, tau)
      val r = referenceDrops(ms, tau, Nil)
      assert(k == r, s"trial $trial tau $tau: kernel $k != reference $r " +
        s"on ${ms.mkString("; ")}")
    }
  }

  test("property: sweep(members, seeds) == drops over seeds-prepended " +
      "members, restricted to member ids (1000 random cases)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 1000) {
      val (ms, tau) = randomCluster(rnd, maxSize = 6)
      val (seedMs, _) = randomCluster(rnd, maxSize = 5)
      val seeds = seedMs.map(s => (s.nrm, s.emb))
      val viaSweep = kernelSweep(ms, tau, seeds)
      // encode seeds as batch members ranked before everything real:
      // csim = -Infinity, ids disjoint (negative) — their own drop marks
      // are discarded by the id restriction, and dropped members still
      // sweep, so the encoding is exact
      val seededMembers = seedMs.zipWithIndex.map { case (s, i) =>
        M(-1L - i, Some(Double.NegativeInfinity), s.nrm, s.emb)
      } ++ ms
      val viaDrops = kernelDrops(seededMembers, tau)
        .filter(id => ms.exists(_.id == id))
      assert(viaSweep == viaDrops,
        s"trial $trial tau $tau: sweep $viaSweep != encoded drops $viaDrops")
      // and the reference agrees with the sweep directly
      assert(viaSweep == referenceDrops(ms, tau, seeds),
        s"trial $trial: sweep disagrees with the seeded reference")
    }
  }

  test("null seeds array means an empty registry") {
    val ms = Seq(
      M(1L, Some(0.5), Some(1.0), Some(Array(1f, 0f))),
      M(2L, Some(0.6), Some(1.0), Some(Array(1f, 0f))))
    val out = SemDedupSweep.compute(membersArr(ms), null, 0.9, 1 << 20)
    assert((0 until out.numElements()).map(out.getLong).toSet == Set(2L))
  }
}
