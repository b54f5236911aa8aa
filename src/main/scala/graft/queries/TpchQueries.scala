package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Classic TPC-H query shapes adapted to the testdata schema, plus window
  * and null-handling suites — exercises the full analytic grammar. */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q19 shape (adapted to the trimmed part schema): disjunctive
    // OR-of-ANDs predicate spanning both join sides — the classic test that
    // the optimizer still pushes the per-side residuals below the join and
    // keeps the whole thing in one codegen span
    "q88_tpch_q19" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = broadcast(t(s, d, "part"))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10: returned-item reporting — who returned the most revenue
    // in one quarter (4-table star, top 20)
    "q89_tpch_q10" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1996-04-01"))
      val ret = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      ret.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q1: the full pricing summary (8 aggregates incl. computed
    // disc_price/charge in exact cents math)
    "q58_tpch_q1" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= tsLit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) *
               (lit(100L) + cents(col("l_tax")))).cast("double") / 1e6).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q4: order-priority checking (semi join on late lineitems)
    "q59_tpch_q4" -> ((s, d) => {
      val late = t(s, d, "lineitem").filter(col("l_shipdate") > tsLit("1997-06-01"))
      t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1997-01-01") &&
          col("o_orderdate") < tsLit("1997-10-01"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q12: shipping modes... adapted: priority-class conditional sums
    "q60_tpch_q12" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14: promo revenue share (conditional revenue / total revenue)
    "q61_tpch_q14" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1997-03-01") &&
          col("l_shipdate") < tsLit("1997-04-01"))
      val joined = li.join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      joined.agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_revenue_pct"))
        .select(round(col("promo_revenue_pct"), 6).as("promo_revenue_pct"))
    }),

    // window-function suite: lag/lead/dense_rank/ntile over one pass
    "q62_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("rnk"),
          ntile(4).over(w).as("quartile"),
          coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_order"),
          coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // arg-max/min aggregates: the order carrying each segment's max price
    "q63_minmax_by" -> ((s, d) => {
      t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("top_order"),
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("bottom_order"),
          max("o_totalprice").as("top_price"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q2 (adapted: lineitem's distinct (part, supplier) pairs stand in
    // for the absent partsupp table): cheapest-supplier-per-part in one
    // region, min_by with a deterministic (acctbal, suppkey) tie-break
    "q100_tpch_q2" -> ((s, d) => {
      // part slice joins BEFORE the pair-distinct: the dedup shuffle then
      // carries only the selected parts' lineitems (~5% here), not the
      // whole fact table — the ordering that matters at 100 TB
      val pairs = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 25))
          .select("p_partkey", "p_name")), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("l_suppkey")).distinct()
      val supEu = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      pairs
        .join(broadcast(supEu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey", "p_name")
        .agg(expr(
          "min_by(struct(s_acctbal, s_name, n_name), struct(s_acctbal, s_suppkey))")
          .as("best"))
        .select(col("best.s_acctbal").as("s_acctbal"), col("best.s_name").as("s_name"),
          col("best.n_name").as("n_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"))
    }),

    // TPC-H Q7: volume shipping between two nations, revenue by
    // (supplier nation, customer nation, ship year)
    "q101_tpch_q7" -> ((s, d) => {
      val sn = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val cn = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .select("c_custkey", "cust_nation")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8: national market share — one nation's slice of a product
    // type's revenue into one region, per order year (exact integer
    // revenue units; one deterministic division at the end)
    "q102_tpch_q8" -> ((s, d) => {
      val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      val amCust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
          col("c_nationkey") === col("cnk"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val sn = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
            col("o_orderdate") < tsLit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        // exact-integer cent sums → ExactRound half-up grid (the r14
        // laundered-quotient census flagged the old round(num/den, 6):
        // an IEEE quotient whose .5 ties may flip across engines)
        .agg(sum(when(col("supp_nation") === "NATION_5", rev).otherwise(0L))
          .as("__num"), sum(rev).as("__den"))
        .select(col("o_year"),
          graft.ops.ExactRound.ratioRoundedCol(col("__num"), col("__den"), 6)
            .as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 (adapted: p_retailprice stands in for the absent
    // ps_supplycost): profit by supplier nation and order year, exact
    // integer 1e-4 units until the final division
    "q103_tpch_q9" -> ((s, d) => {
      val profit = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) -
        cents(col("p_retailprice")) * col("l_quantity").cast("long") * lit(100L)
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_name").contains("red"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(profit).cast("double") / 10000.0).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 (adapted: per-part shipped revenue from one nation's
    // suppliers stands in for partsupp stock value): parts whose value
    // exceeds 1/1000 of the total — threshold compared in exact integers
    "q104_tpch_q11" -> ((s, d) => {
      val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      val natSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val perPart = t(s, d, "lineitem")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey").agg(sum(rev).as("value_u"))
      perPart.crossJoin(broadcast(perPart.agg(sum(col("value_u")).as("total_u"))))
        .filter(col("value_u") * 1000 > col("total_u"))
        .select(col("l_partkey").as("p_partkey"),
          (col("value_u").cast("double") / 10000.0).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    }),

    // TPC-H Q13: customer distribution — how many customers placed k
    // non-urgent orders, including the zero-order bucket (left join)
    "q105_tpch_q13" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15: top supplier by quarterly revenue — the max located via a
    // broadcast scalar, compared in exact integer revenue units
    "q106_tpch_q15" -> ((s, d) => {
      val perSupp = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-04-01") &&
          col("l_shipdate") < tsLit("1996-07-01"))
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("rev_u"))
      perSupp.crossJoin(broadcast(perSupp.agg(max(col("rev_u")).as("max_u"))))
        .filter(col("rev_u") === col("max_u"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev_u").cast("double") / 10000.0).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 (adapted: lineitem pairs for partsupp; negative-acctbal
    // suppliers stand in for the complaint filter): supplier counts per
    // (brand, type, size) slice
    "q107_tpch_q16" -> ((s, d) => {
      // both filters run BEFORE the pair-distinct (same 100 TB ordering as
      // q100): the dedup shuffle carries only qualifying parts' lineitems
      // from non-complaint suppliers
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#3" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier").filter(col("s_acctbal") >= 0)
          .select("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct() // (group key, supplier) unique ⇒ the count below IS a
        .groupBy("p_brand", "p_type", "p_size") // distinct-supplier count,
        .agg(count(lit(1)).as("supplier_cnt")) // with one dedup pass not two
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q17: small-quantity-order revenue. The 0.2·avg(quantity)
    // correlated threshold is evaluated in EXACT integer math
    // (5·qty·count < sum ⟺ qty < 0.2·avg — no cross-engine float
    // boundary), via one window over the part-filtered scan (single
    // shuffle, no self-join)
    "q108_tpch_q17" -> ((s, d) => {
      val w = Window.partitionBy("l_partkey")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_brand") === "Brand#5" && col("p_type") === "SMALL")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .withColumn("sq", sum(col("l_quantity").cast("long")).over(w))
        .withColumn("cq", count(lit(1)).over(w))
        .filter(col("l_quantity").cast("long") * 5 * col("cq") < col("sq"))
        .agg(sum(cents(col("l_extendedprice"))).as("__cs"))
        .select(graft.ops.ExactRound.ratioRoundedCol(
          col("__cs"), lit(700L), 4).as("avg_yearly"))
    }),

    // TPC-H Q18: large-volume customers (orders above a quantity sum
    // threshold), top 100 by order value
    "q109_tpch_q18" -> ((s, d) => {
      val big = t(s, d, "lineitem").groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t(s, d, "orders").join(big, col("o_orderkey") === col("bk"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    }),

    // TPC-H Q20 (adapted: shipped-quantity sums from lineitem stand in for
    // partsupp availability): suppliers in one nation who moved >50 units
    // of any 'small%' part in a year
    "q110_tpch_q20" -> ((s, d) => {
      val shipped = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01"))
        .join(broadcast(t(s, d, "part").filter(col("p_name").startsWith("small"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .filter(col("qty") > 50)
        .select("l_suppkey").distinct()
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_11")),
          col("s_nationkey") === col("n_nationkey"))
        .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),

    // TPC-H Q21 (adapted: l_returnflag = 'R' stands in for the absent
    // receipt/commit-date lateness): suppliers who were the SOLE returned
    // supplier on a finished multi-supplier order
    "q111_tpch_q21" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      // two plain aggs instead of two countDistincts in one: the (order,
      // supplier) pre-aggregate dedups first, so the per-order roll-up
      // counts rows — no multi-distinct Expand multiplying the input
      li.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_returnflag") === "R").as("ret"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("ns"),
          sum(when(col("ret"), 1L).otherwise(0L)).as("nr"),
          max(when(col("ret"), col("l_suppkey"))).as("rsupp"))
        .filter(col("ns") > 1 && col("nr") === 1)
        .groupBy("rsupp").agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, d, "supplier")), col("rsupp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }),

    // TPC-H Q22 (adapted: nationkey mod 10 stands in for the absent phone
    // country code; "no recent orders" for "no orders"): rich-but-idle
    // customers per code. The above-average filter is exact integer math
    // (cents·count > sum-of-cents)
    "q112_tpch_q22" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .withColumn("cntrycode", col("c_nationkey") % 10)
        .filter(col("cntrycode").isin(0, 1, 2, 3, 4))
      val ref = cust.filter(col("c_acctbal") > 0)
        .agg(sum(cents(col("c_acctbal"))).as("sum_c"), count(lit(1)).as("n_c"))
      cust.crossJoin(broadcast(ref))
        .filter(cents(col("c_acctbal")) * col("n_c") > col("sum_c"))
        .join(t(s, d, "orders").filter(col("o_orderdate") >= tsLit("2000-01-01"))
          .select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // null creation + handling: nullif/coalesce/null-aware counts + grouping
    "q64_null_handling" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          col("l_quantity"))
        .groupBy("flag_or_null")
        .agg(count(lit(1)).as("n_rows"), count(col("flag_or_null")).as("n_nonnull"),
          sum("l_quantity").as("sum_qty"))
        .select(coalesce(col("flag_or_null"), lit("<null>")).as("flag"),
          col("n_rows"), col("n_nonnull"), col("sum_qty"))
        .orderBy("flag")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q88_tpch_q19" ->
      s"""SELECT ${revenueSql("l_extendedprice", "l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 40)
            OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 50)""",

    "q89_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q58_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         ${revenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))
              * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1e6 AS sum_charge,
         avg(l_quantity) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q59_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q60_tpch_q12" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q61_tpch_q14" ->
      """SELECT round(
           CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE),
           6) AS promo_revenue_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""",

    "q62_window_suite" ->
      """SELECT o_custkey, o_orderkey,
         CAST(dense_rank() OVER w AS INT) AS rnk,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         coalesce(lag(o_orderkey) OVER w, -1) AS prev_order,
         coalesce(lead(o_orderkey) OVER w, -1) AS next_order
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q63_minmax_by" ->
      """WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey),
         r AS (SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY o_totalprice DESC, o_orderkey DESC) rt,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY o_totalprice ASC, o_orderkey ASC) rb
           FROM j)
         SELECT c_mktsegment,
           max(CASE WHEN rt = 1 THEN o_orderkey END) AS top_order,
           max(CASE WHEN rb = 1 THEN o_orderkey END) AS bottom_order,
           max(o_totalprice) AS top_price
         FROM r GROUP BY 1 ORDER BY 1""",

    "q100_tpch_q2" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         sup AS (SELECT s_suppkey, s_acctbal, s_name, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
         j AS (SELECT p_partkey, p_name, s_acctbal, s_name, n_name,
             row_number() OVER (PARTITION BY p_partkey
               ORDER BY s_acctbal, s_suppkey) AS rn
           FROM part JOIN pairs ON p_partkey = l_partkey
           JOIN sup ON l_suppkey = s_suppkey
           WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 25)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM j
         WHERE rn = 1 ORDER BY s_acctbal DESC, p_partkey""",

    "q101_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q102_tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         ${graft.ops.ExactRound.ratioRoundedSql(
        """sum(CASE WHEN n_name = 'NATION_5'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END)""",
        """sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))""",
        6)} AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_type = 'ECONOMY'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND o_custkey IN (SELECT c_custkey FROM customer
             JOIN nation cn ON c_nationkey = cn.n_nationkey
             JOIN region ON cn.n_regionkey = r_regionkey
             WHERE r_name = 'AMERICA')
         GROUP BY 1 ORDER BY 1""",

    "q103_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE) / 10000.0
           AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY 1, 2 DESC""",

    "q104_tpch_q11" ->
      """WITH pp AS (SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS v
           FROM lineitem
           WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
             JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
           GROUP BY 1),
         tot AS (SELECT sum(v) AS t FROM pp)
         SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) / 10000.0 AS value
         FROM pp, tot WHERE v * 1000 > t
         ORDER BY value DESC, p_partkey""",

    "q105_tpch_q13" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
           GROUP BY 1)
         SELECT c_count, count(*) AS custdist FROM pc
         GROUP BY 1 ORDER BY 2 DESC, 1 DESC""",

    "q106_tpch_q15" ->
      """WITH ps AS (SELECT l_suppkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_u
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-04-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
           GROUP BY 1)
         SELECT s_suppkey, s_name, CAST(rev_u AS DOUBLE) / 10000.0 AS total_revenue
         FROM ps JOIN supplier ON l_suppkey = s_suppkey
         WHERE rev_u = (SELECT max(rev_u) FROM ps)
         ORDER BY s_suppkey""",

    "q107_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
         FROM part JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
           ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#3'
           AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
           AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
         GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1, 2, 3""",

    "q108_tpch_q17" ->
      s"""WITH lp AS (SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'),
         w AS (SELECT *,
             sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sq,
             count(*) OVER (PARTITION BY l_partkey) AS cq
           FROM lp)
         SELECT ${graft.ops.ExactRound.ratioRoundedSql(
             "sum(CAST(round(l_extendedprice * 100) AS BIGINT))", "700", 4)}
           AS avg_yearly
         FROM w WHERE CAST(l_quantity AS BIGINT) * 5 * cq < sq""",

    "q109_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q110_tpch_q20" ->
      """SELECT s_name, s_acctbal FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_11'
           AND s_suppkey IN (
             SELECT l_suppkey FROM lineitem
             JOIN part ON l_partkey = p_partkey
             WHERE p_name LIKE 'small%'
               AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             GROUP BY l_suppkey, l_partkey
             HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
         ORDER BY s_name""",

    "q111_tpch_q21" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'),
         po AS (SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS ns,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nr,
             max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS rsupp
           FROM li GROUP BY 1)
         SELECT s_name, count(*) AS numwait FROM po
         JOIN supplier ON rsupp = s_suppkey
         WHERE ns > 1 AND nr = 1
         GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 100""",

    "q112_tpch_q22" ->
      """WITH cust AS (SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
           FROM customer WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4)),
         ref AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c,
             count(*) AS n_c
           FROM cust WHERE c_acctbal > 0)
         SELECT cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
         FROM cust, ref
         WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_c > sum_c
           AND NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q64_null_handling" ->
      """SELECT coalesce(nullif(l_returnflag, 'N'), '<null>') AS flag,
         count(*) AS n_rows, count(nullif(l_returnflag, 'N')) AS n_nonnull,
         sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY nullif(l_returnflag, 'N')
         ORDER BY 1"""
  )
}
