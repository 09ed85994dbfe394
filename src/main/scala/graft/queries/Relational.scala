package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef._

/** Relational core: scans, filters, hash aggregations, joins (broadcast +
  * shuffle), semi/anti joins, window functions, top-k — the general query
  * surface the reference delegates to DuckDB (SURVEY.md §2.2/2.3/2.5/2.7,
  * e.g. cli_wrapper/main.py:344-383 arbitrary SQL passthrough).
  *
  * Scale notes: all aggregations are partial-agg (map-side combine) hash
  * aggregates; dimension joins (region/nation/customer/supplier/part) are
  * broadcast; only lineitem⋈orders shuffles, on the join key. Window ops
  * partition by a high-cardinality key — no single-partition sorts.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact-decimal projection of a 2-dp double column (see QueryDef). */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val all: Seq[QueryDef] = Seq(

    // ---- TPC-H Q1 shape: wide hash aggregate with exact sums -------------
    // sum_charge's ORACLE needs two exactness guards, both caught by the
    // 10× gate as a last-ULP drift at 6M rows (the engine was exact —
    // Spark's precision-adjust keeps the triple product at DECIMAL(38,6)
    // and BigDecimal→double casts are correctly rounded):
    //  1. factors cast narrow (DECIMAL(4,2)): DuckDB's multiply rule ADDS
    //     widths ((18,2)×(19,2)×(19,2) → 56 > 38), leaving exact range;
    //     (18,2)×(4,2)×(4,2) → width 26 stays exact decimal.
    //  2. the final decimal→double goes THROUGH VARCHAR: DuckDB's direct
    //     DECIMAL(38,6)→DOUBLE cast double-rounds (int128 → double, THEN
    //     ÷10^6) once the scaled integer exceeds 2^53 (here 2.8e16);
    //     text round-trips are parsed with a single correct rounding.
    //     Scale-2/scale-4 sums in this registry stay below 2^53 internal
    //     units, which is why only this column ever drifted.
    sql("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      val one = lit(1).cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) *
              (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- top-k: TakeOrderedAndProject, no full sort ----------------------
    sql("q2_topk_orders",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""") { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- star join through two broadcast dims ----------------------------
    sql("q3_revenue_by_nation",
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""") { (s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- left-semi join (EXISTS) -----------------------------------------
    sql("q4_priority_with_big_lines",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- left-anti join (NOT EXISTS) -------------------------------------
    sql("q5_customers_without_big_orders",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // ---- TPC-H Q6 shape: selective filter → single-row exact agg ---------
    sql("q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- ranking window: top-3 parts per brand ---------------------------
    sql("q7_top_parts_per_brand",
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""") { (s, dir) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    },

    // ---- running-sum window partitioned by a scalable key ----------------
    sql("q8_running_qty_by_supplier",
      // l_quantity as the last sort key: the synthetic generator emits
      // duplicate (orderkey, linenumber) pairs, and without a total order
      // the running sum at tied rows is engine-dependent
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""") { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
        // running_qty as final key: duplicate (suppkey, orderkey,
        // linenumber) rows exist in the data and differ only in their
        // running value — without it the output order isn't total
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },

    // ---- exact distinct aggregation --------------------------------------
    sql("q9_distinct_suppliers_per_flag",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag")
    },

    // ---- TPC-H Q17 shape: per-key scalar aggregate feeding a filter ------
    sql("q11_small_quantity_revenue",
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS half_avg
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN pa ON l_partkey = pk
        |WHERE l_quantity < half_avg""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val pa = li.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.5) * (sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1)))).as("half_avg"))
      li.join(pa, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("total_price"))
    },

    // ---- ranking + offset windows together -------------------------------
    sql("q12_price_rank_lag",
      """SELECT p_brand, p_partkey, p_retailprice,
        |  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
        |  LAG(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS prev_price
        |FROM part
        |WHERE p_size <= 10
        |ORDER BY p_brand, p_partkey""") { (s, dir) =>
      val bySize = Window.partitionBy("p_brand").orderBy("p_size")
      val byKey = Window.partitionBy("p_brand").orderBy("p_partkey")
      t(s, dir, "part")
        .filter(col("p_size") <= 10)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          dense_rank().over(bySize).as("size_rank"),
          lag(col("p_retailprice"), 1).over(byKey).as("prev_price"))
        .orderBy("p_brand", "p_partkey")
    },

    // ---- 4-way join: lineitem⋈orders (shuffle) + 2 broadcast dims --------
    sql("q10_volume_by_region",
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""") { (s, dir) =>
      val one = lit(1).cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("r_name")
    },

    // ---- TPC-H Q13 shape: LEFT OUTER join + two-level aggregation --------
    sql("q13_customer_order_counts",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- set operations: UNION / INTERSECT / EXCEPT ----------------------
    sql("q14_nation_set_ops",
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |                         UNION SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)) AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |                         INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |                         EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)) AS n_except""") { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("k"))
      c.union(sup).distinct().agg(count(lit(1)).as("n_union"))
        .crossJoin(c.intersect(sup).agg(count(lit(1)).as("n_intersect")))
        .crossJoin(c.except(sup).agg(count(lit(1)).as("n_except")))
    },

    // ---- ROLLUP grouping sets with exact-decimal sums --------------------
    sql("q15_rollup_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""") { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        // subtotal rows are NULL-keyed; DuckDB's ASC default is nulls
        // LAST, Spark's is nulls first — align explicitly
        .orderBy(col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)
    },

    // ---- FULL OUTER join of two aggregates -------------------------------
    sql("q16_balance_bucket_full_outer",
      """SELECT COALESCE(cb.bucket, sb.bucket) AS bucket,
        |  cb.n_customers, sb.n_suppliers
        |FROM (SELECT CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bucket, COUNT(*) AS n_customers
        |      FROM customer GROUP BY 1) cb
        |FULL OUTER JOIN
        |     (SELECT CAST(FLOOR(s_acctbal / 1000) AS BIGINT) AS bucket, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY 1) sb
        |ON cb.bucket = sb.bucket
        |ORDER BY 1""") { (s, dir) =>
      val cb = t(s, dir, "customer")
        .groupBy(floor(col("c_acctbal") / 1000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_customers"))
      val sb = t(s, dir, "supplier")
        .groupBy(floor(col("s_acctbal") / 1000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_suppliers"))
      cb.join(sb, Seq("bucket"), "full_outer")
        .select(col("bucket"), col("n_customers"), col("n_suppliers"))
        .orderBy("bucket")
    }
  )
}
