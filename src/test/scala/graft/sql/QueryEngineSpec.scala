package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.CompareTables

class QueryEngineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("preview returns at most n rows with the table's schema (W4)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    QueryEngine.registerCorpus(spark, sfDir)
    val p = QueryEngine.preview(spark, "region", 3)
    assert(p.count() === 3)
    assert(p.columns.nonEmpty)
  }

  test("countRows matches df.count (A2)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    QueryEngine.registerCorpus(spark, sfDir)
    val n = QueryEngine.countRows(spark, "nation").head().getLong(0)
    assert(n === spark.read.parquet(s"$sfDir/nation.parquet").count())
  }

  test("unload writes a parquet result readable with identical content (K5)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    QueryEngine.registerCorpus(spark, sfDir)
    val sql = "SELECT r_regionkey, r_name FROM region"
    val out = tmpDir("unload") + "/res"
    QueryEngine.unload(spark, sql, out)
    val back = spark.read.parquet(out)
    val direct = spark.sql(sql)
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty)
  }

  test("unloadCsv writes a single header'd CSV file (K6)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    QueryEngine.registerCorpus(spark, sfDir)
    val out = tmpDir("unload-csv") + "/res"
    QueryEngine.unloadCsv(spark, "SELECT r_regionkey, r_name FROM region", out)
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(
      s"$out/${files.head}").getLines().toSeq
    assert(lines.head === "r_regionkey,r_name")
    assert(lines.size === 1 + spark.sql("SELECT * FROM region").count())
  }

  test("bucketed tables join without a shuffle on either side") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    QueryEngine.saveBucketed(orders, "orders_b", "o_custkey", 8)
    QueryEngine.saveBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
      "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      joined.collect() // force final (AQE-resolved) plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it returns the same rows as the plain join
      val plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("file-list reconciliation detects missing and unexpected URIs (J3)") {
    val expected = Seq("a/1.parquet", "a/2.parquet", "a/3.parquet")
    val ok = CompareTables.reconcileFileLists(expected, expected.reverse)
    assert(ok.isReconciled)
    val bad = CompareTables.reconcileFileLists(expected,
      Seq("a/1.parquet", "a/4.parquet"))
    assert(bad.missing === Seq("a/2.parquet", "a/3.parquet"))
    assert(bad.unexpected === Seq("a/4.parquet"))
  }
}
