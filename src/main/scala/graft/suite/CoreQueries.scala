package graft.suite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}

/** Scan / filter / projection / aggregation / join queries — SURVEY.md §2
  * rows S4, P4-P7, P9-P11, F1-F2, A1, A4, J1, U1, D2, O1-O2.
  *
  * Scale notes (100 TB): every query here is a declarative plan — filters and
  * projections reach the parquet scan (PushedFilters/ReadSchema), dimension
  * joins are explicitly `broadcast()` (region/nation/customer/part are tiny
  * relative to the fact tables), and aggregations are partial (map-side
  * combine) before the single hash-exchange on the group keys.
  */
object CoreQueries {

  /** TPC-H Q1-shaped pricing summary — exercises predicate pushdown, partial
    * aggregation, DECIMAL-exact sums. Mirrors the reference's ad-hoc
    * filtered aggregates (AWS_Athena_queries.sql:79-93).
    */
  private val q01 = GQuery(
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter(to_date($"l_shipdate") <= lit("2000-01-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_extendedprice"), 4).as("avg_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
      ROUND(AVG(l_quantity), 4) AS avg_qty,
      ROUND(AVG(l_extendedprice), 4) AS avg_price,
      ROUND(AVG(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-01-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Top-10 orders by revenue: fact-fact join on the shuffle key, then a
    * broadcast dim join (customer). Global top-k with a unique tiebreak.
    */
  private val q02 = GQuery(
    (s, d) => {
      import s.implicits._
      val rev = T.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(28,4)")).cast("double").as("revenue"))
      rev.join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(T.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name",
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
          $"revenue")
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""SELECT o_orderkey, c_name,
      STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date, revenue
      FROM (SELECT l_orderkey,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_orderkey) r
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  /** Star-schema rollup: customer ⋈ nation ⋈ region, both dims broadcast —
    * zero shuffles beyond the final aggregation (SURVEY §2.4 J1).
    */
  private val q03 = GQuery(
    (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("total_acctbal"),
          round(avg($"c_acctbal"), 4).as("avg_acctbal"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      ROUND(AVG(c_acctbal), 4) AS avg_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Parts by type: broadcast dim join into the fact aggregation. */
  private val q04 = GQuery(
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d)), $"l_partkey" === $"p_partkey")
        .groupBy($"p_type")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total_qty"),
          round(avg($"l_extendedprice"), 4).as("avg_price"))
        .orderBy($"p_type")
    },
    Some("""SELECT p_type, COUNT(*) AS n_items,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      ROUND(AVG(l_extendedprice), 4) AS avg_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type ORDER BY p_type"""))

  /** FK extraction via regexp (reference ref_to_uuid,
    * Glue_tranformation_json_parquet.py:24-26) mapped onto c_name's
    * "Customer#NNN" pattern — regex runs inside whole-stage codegen.
    */
  private val q05 = GQuery(
    (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .select($"c_custkey",
          regexp_extract($"c_name", "Customer#(\\d+)", 1).as("cust_num_str"))
        .withColumn("cust_num", $"cust_num_str".cast("long"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, REGEXP_EXTRACT(c_name, 'Customer#(\d+)', 1) AS cust_num_str,
      CAST(REGEXP_EXTRACT(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num
      FROM customer ORDER BY c_custkey"""))

  /** JSONPath extraction over a serialized-JSON column (reference jget,
    * Glue_tranformation_json_parquet.py:28-31) + TRY_CAST (P9).
    */
  private val q06 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")
        .withColumn("k_mod", pmod($"k", lit(10)))
        .groupBy($"k_mod")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy($"k_mod")
    },
    Some("""SELECT TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY k_mod ORDER BY k_mod"""))

  /** Coalesce/NULLIF ladder (reference's shape-tolerant coalesce ladders,
    * Glue_tranformation_json_parquet.py:31,142-147) + null-guard predicates.
    */
  private val q07 = GQuery(
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select(coalesce(nullif($"l_returnflag", lit("N")),
          nullif($"l_linestatus", lit("O")), lit("none")).as("flag"))
        .groupBy($"flag").agg(count(lit(1)).as("n"))
        .orderBy($"flag")
    },
    Some("""SELECT COALESCE(NULLIF(l_returnflag, 'N'), NULLIF(l_linestatus, 'O'), 'none') AS flag,
      COUNT(*) AS n FROM lineitem GROUP BY flag ORDER BY flag"""))

  /** IN-list + BETWEEN + conditional counts (P5, P6; ad-hoc sanity counts of
    * AWS_Athena_queries.sql:70-93 re-expressed as one pass).
    */
  private val q08 = GQuery(
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(when($"o_totalprice".between(1000, 100000), 1L).otherwise(0L)).as("n_mid"),
          sum(when($"o_orderdate" >= lit("1997-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("n_recent"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CASE WHEN o_totalprice BETWEEN 1000 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
      CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_recent
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** UNION + DISTINCT + sorted output (U1, D2). */
  private val q09 = GQuery(
    (s, d) => {
      import s.implicits._
      T.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
        .union(T.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey")))
        .distinct()
        .orderBy($"nationkey")
    },
    Some("""SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      UNION SELECT CAST(s_nationkey AS INTEGER) FROM supplier ORDER BY nationkey"""))

  /** Date arithmetic: add_months + portable integer age computation (F7, F8;
    * reference age-at-reference-date, test.py:326).
    */
  private val q10 = GQuery(
    (s, d) => {
      import s.implicits._
      val refY = lit(2000); val refM = lit(6); val refD = lit(15)
      T.orders(s, d)
        .withColumn("od", to_date($"o_orderdate"))
        .withColumn("age_years",
          (refY - year($"od") -
            when(month($"od") > refM ||
              (month($"od") === refM && dayofmonth($"od") > refD), 1).otherwise(0))
            .cast("long"))
        .withColumn("bill_month",
          date_format(add_months($"od", 3), "yyyy-MM"))
        .groupBy($"age_years", $"bill_month")
        .agg(count(lit(1)).as("n"))
        .orderBy($"age_years", $"bill_month")
    },
    Some("""SELECT (2000 - EXTRACT(YEAR FROM o_orderdate) -
        CASE WHEN EXTRACT(MONTH FROM o_orderdate) > 6
          OR (EXTRACT(MONTH FROM o_orderdate) = 6 AND EXTRACT(DAY FROM o_orderdate) > 15)
        THEN 1 ELSE 0 END) AS age_years,
      STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m') AS bill_month,
      COUNT(*) AS n
      FROM orders GROUP BY age_years, bill_month ORDER BY age_years, bill_month"""))

  def all: Map[String, GQuery] = Map(
    "q01_pricing_summary" -> q01,
    "q02_top_revenue_orders" -> q02,
    "q03_region_rollup" -> q03,
    "q04_parts_by_type" -> q04,
    "q05_regexp_fk_extract" -> q05,
    "q06_json_get" -> q06,
    "q07_coalesce_ladder" -> q07,
    "q08_inlist_between" -> q08,
    "q09_union_distinct" -> q09,
    "q10_date_arith" -> q10,
  )
}
