package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B profile: degree-ordered triangle counting, wedge-JOIN form
  * (materializes every wedge through a hash exchange, r1–r15) vs the
  * intersection form (adjacency arrays + in-stage array_intersect,
  * r16). Interleaved passes over (a) the q166 supplier co-part graph at
  * $SPARK_GRAFT_SF_DIR — near-complete at sf0.1, the wedge-heavy shape —
  * and (b) the sparse circulant decade fixture at ×10/×100 (the
  * m_triangles shape). Prints per-pass seconds; first pass per side is
  * the warmup. Also cross-checks that both forms return identical
  * per-node counts (full exceptAll both ways) before timing.
  */
object TriProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cpus.toInt)

    def coPart(): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val ps = li.select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        .distinct()
      ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("src"), col("y.sk").as("dst"))
    }
    def sparse(times: Int): DataFrame = {
      val n = 20000
      graft.Tables.load(spark, sfDir, "lineitem")
        .select((col("l_orderkey") % n).as("a"),
          ((col("l_orderkey") + lit(1) + col("l_partkey") % 6) % n).as("b"))
        .distinct()
        .select(col("a"), col("b"), graft.ops.Replicate.rep(times).as("r"))
        .select((col("a") * times + col("r")).as("src"),
          (col("b") * times + col("r")).as("dst"))
        .repartition(spark.sparkContext.defaultParallelism)
    }

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def wedge(e: DataFrame): DataFrame =
      graft.graph.Triangles.perNodeWedge(e)
    def inter(e: DataFrame): DataFrame =
      graft.graph.Triangles.perNode(e)

    // equality gate (sf0.001 co-part + a sparse x3 — cheap, exact)
    val small = {
      val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      val ps = li.select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        .distinct()
      ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("src"), col("y.sk").as("dst"))
    }
    require(wedge(small).exceptAll(inter(small)).isEmpty &&
      inter(small).exceptAll(wedge(small)).isEmpty,
      "forms disagree on sf0.001 co-part graph")
    println("[tri] equality gate passed (sf0.001 co-part)")

    val fixtures: Seq[(String, () => DataFrame)] = args.toSeq match {
      case Nil => Seq(
        "copart_sf" -> (() => coPart()),
        "sparse_x10" -> (() => sparse(10)),
        "sparse_x100" -> (() => sparse(100)))
      case names => names.map {
        case "copart_sf" => "copart_sf" -> (() => coPart())
        case s if s.startsWith("sparse_x") =>
          s -> (() => sparse(s.stripPrefix("sparse_x").toInt))
        case other => sys.error(s"unknown fixture $other")
      }
    }
    // decision + stats-cost probe
    if (sys.env.get("TRI_DECIDE").nonEmpty) {
      val which = sys.env("TRI_DECIDE")
      val e = (if (which == "copart_sf") coPart()
        else if (which.startsWith("/")) spark.read.parquet(which)
        else sparse(which.stripPrefix("sparse_x").toInt))
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        val dense = graft.graph.Triangles.denseByEstimate(e, "src", "dst")
        println(f"[tri] decide($which) dense=$dense in ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
      val t1 = System.nanoTime()
      noop(graft.graph.Triangles.perNodeWedge(e))
      println(f"[tri] wedge full ${(System.nanoTime()-t1)/1e9}%.2f s")
      val t2 = System.nanoTime()
      noop(graft.graph.Triangles.perNode(e))
      println(f"[tri] adaptive full ${(System.nanoTime()-t2)/1e9}%.2f s")
      spark.stop(); return
    }
    // stage decomposition mode: time the intersect form's sub-plans
    if (sys.env.get("TRI_STAGES").contains("1")) {
      val e = coPart().cache(); e.count()
      val und = graft.graph.Triangles.canonical(e, "src", "dst")
      val ori = graft.graph.Triangles.oriented(und)
      for (i <- 1 to 2) {
        println(f"[tri] und   ${time(noop(und))}%.2f")
        println(f"[tri] ori   ${time(noop(ori))}%.2f")
        val eo = ori.select(col("u"), col("v"))
        val nbrs = eo.groupBy(col("u").as("node"))
          .agg(collect_list(col("v")).as("ns"))
        println(f"[tri] nbrs  ${time(noop(nbrs))}%.2f")
        val tri = eo
          .join(nbrs.select(col("node").as("v"), col("ns").as("nv")), Seq("v"))
          .join(nbrs.select(col("node").as("u"), col("ns").as("nu")), Seq("u"))
          .select(col("u"), col("v"),
            explode(array_intersect(col("nu"), col("nv"))).as("w"))
        println(f"[tri] tri   ${time(noop(tri))}%.2f")
        println(f"[tri] agg   ${time(noop(tri.select(explode(array(col("u"), col("v"), col("w"))).as("node")).groupBy("node").agg(count(lit(1)).as("n_triangles"))))}%.2f")
        println(f"[tri] aggS  ${time(noop(graft.graph.Triangles.perNodeFromOriented(ori)))}%.2f")
      }
      spark.stop(); return
    }
    fixtures.foreach { case (name, mk) =>
      val e = mk().cache()
      e.count() // materialize fixture untimed
      val passes = 3
      val (tw, ti) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (i <- 0 until passes) { // strict interleave
        spark.sparkContext.setJobDescription(s"$name wedge pass$i")
        tw(i) = time(noop(wedge(e)))
        spark.sparkContext.setJobDescription(s"$name intersect pass$i")
        ti(i) = time(noop(inter(e)))
      }
      println(f"[tri] $name%-12s wedge ${tw.map(t => f"$t%.2f").mkString(" ")}" +
        f"  intersect ${ti.map(t => f"$t%.2f").mkString(" ")}")
      e.unpersist()
    }
    spark.stop()
  }
}
