package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensureRegistered(s)
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class CoreEngineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("filter translator covers all ops and ANDs terms") {
    val terms = Seq(
      FilterTerm("l_quantity", ">=", 10.0),
      FilterTerm("l_quantity", "<", 20.0),
      FilterTerm("l_returnflag", "in", Seq("A", "N")),
      FilterTerm("l_linestatus", "!=", "ZZZ"))
    val got = li.filter(Translator.filterColumn(terms).get).count()
    val want = li.filter(
      col("l_quantity") >= 10.0 && col("l_quantity") < 20.0 &&
        col("l_returnflag").isin("A", "N") && col("l_linestatus") =!= "ZZZ").count()
    assert(got === want && got > 0)
  }

  test("unknown ops are rejected") {
    intercept[IllegalArgumentException] {
      Translator.filterColumn(Seq(FilterTerm("x", "like", "%a%")))
    }
    intercept[IllegalArgumentException] {
      Translator.aggColumn(AggSpec("x", "median", "m"))
    }
  }

  test("groupby merged equals direct groupBy") {
    val got = GroupByEngine.groupbyDf(li, Seq("l_returnflag"),
      Seq(AggSpec("l_quantity", "sum", "s"), AggSpec("l_quantity", "count", "c")))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count("l_quantity").as("c"))
      .orderBy("l_returnflag").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("concat-combine then re-aggregate equals direct groupBy (sum/count)") {
    // property from SURVEY §5: concat ∘ re-aggregate ≡ direct groupBy
    val concat = GroupByEngine.groupbyDfSharded(li, pmod(col("l_orderkey"), lit(4)),
      Seq("l_returnflag"), Seq(AggSpec("l_quantity", "sum", "s")))
    assert(concat.count() > 3) // duplicate keys survive concat
    val remerged = concat.groupBy("l_returnflag").agg(sum("s").as("s"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val direct = li.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(remerged.toSeq === direct.toSeq)
  }

  test("aggregate=false projects without grouping") {
    val df = GroupByEngine.groupbyDf(li, Seq("l_orderkey"),
      Seq(AggSpec("l_quantity", "sum", "l_quantity")),
      where = Seq(FilterTerm("l_returnflag", "==", "A")), aggregate = false)
    assert(df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
    assert(df.count() === li.filter(col("l_returnflag") === "A").count())
  }

  test("missing shards are pruned; all-missing yields None") {
    val good = s"$sf/lineitem.parquet"
    val bad = s"$sf/nope_does_not_exist.parquet"
    val some = GroupByEngine.groupby(spark, Seq(good, bad), Seq("l_returnflag"),
      Seq(AggSpec("l_quantity", "sum", "s")))
    assert(some.isDefined && some.get.count() > 0)
    val none = GroupByEngine.groupby(spark, Seq(bad, s"$sf/missing_dir/x.parquet"),
      Seq("l_returnflag"), Seq(AggSpec("l_quantity", "sum", "s")))
    assert(none.isEmpty)
  }

  test("bare-column agg shorthand defaults to sum with same output name") {
    // reference README.md:105 shorthand: groupby(files, keys, ['fare_amount'])
    val short = GroupByEngine.groupbyDf(li, Seq("l_returnflag"),
      Seq(AggSpec("l_quantity"))).orderBy("l_returnflag").collect()
    val full = GroupByEngine.groupbyDf(li, Seq("l_returnflag"),
      Seq(AggSpec("l_quantity", "sum", "l_quantity"))).orderBy("l_returnflag").collect()
    assert(short.toSeq === full.toSeq)
  }

  test("ops api answers ping and info") {
    assert(OpsApi.ping(spark) === "pong")
    val info = OpsApi.info(spark)
    assert(info.defaultParallelism > 0 && info.appName === "graft-test")
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching column sets with its oracle declaration") {
    // every oracle key must exist in queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
