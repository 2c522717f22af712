package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** Relational core: tpc-h-style aggregates/joins, sql surface (windows, subqueries, set ops, pivot/cube/rollup, scalar/date/json/array functions), sources, temporal joins, skew handling, and storage layout — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (S1, F1/F2, P1-P4, A1/A2, J1/J2, O1 analogues)
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          round(decSum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(lit("1995-01-01"), lit("1996-12-31"))
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q03_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    "q04_broadcast_join" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), decSum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    }),
    "q05_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),
    "q06_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),
    "q07_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"))
        .orderBy("l_suppkey")
    }),
    "q08_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "q09_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 100000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),
    "q10_setops" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val building = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withOrders = orders.select(col("o_custkey").as("custkey"))
      building.intersect(withOrders).withColumn("tag", lit("both"))
        .unionAll(building.except(withOrders).withColumn("tag", lit("no_orders")))
        .select("tag", "custkey")
        .orderBy("tag", "custkey")
    }),
    "q11_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // full CUBE lattice with grouping() flags disambiguating the
    // CUBE-generated nulls from (hypothetical) data nulls
    "q25_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          grouping(col("o_orderstatus")).cast("long").as("g_st"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),
    // frame-based window aggregates: running + moving sums over an
    // explicit ROWS frame, dense_rank, ntile — all on the same total
    // per-supplier order so every value is deterministic. The order key
    // includes l_partkey: (shipdate, orderkey, linenumber) alone ties at
    // sf0.1, and a ROWS frame over a tied order is engine-dependent
    "q26_window_frames" -> ((s, dir) => {
      val ord = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_shipdate"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("qty"),
          sum(col("qty")).over(ord.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)).as("running_qty"),
          sum(col("qty")).over(ord.rowsBetween(-3, Window.currentRow))
            .as("mov_qty"),
          dense_rank().over(Window.partitionBy("l_suppkey")
            .orderBy(col("qty").desc)).cast("long").as("qty_rank"),
          ntile(4).over(ord).cast("long").as("quartile"))
        // the presentation sort needs the same tie-breaker as the window
        // order (the 3-col prefix ties at sf0.1); dropped after sorting
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
        .drop("l_partkey")
    }),
    // EXISTS / NOT EXISTS through the SQL-text surface: Catalyst must
    // rewrite both to semi/anti joins (q19 covers correlated SCALAR
    // subqueries; this covers the predicate-subquery rewrite path)
    "q29_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_v c
          |WHERE EXISTS (SELECT 1 FROM orders_v o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 100000)
          |  AND NOT EXISTS (SELECT 1 FROM orders_v o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    }),
    // the salted join produces EXACTLY the plain join's rows (the salt
    // only refines shuffle granularity), so the oracle is the plain join
    "q28_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      val p = t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      graft.operators.Skew
        .saltedJoin(li, p, Seq("l_partkey"), col("l_orderkey"), salts = 8)
        .groupBy("l_partkey", "p_name")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
        .orderBy("l_partkey")
    }),
    // per-key top-k via the bounded combiner aggregate (TopKAggregator)
    // instead of a window sort — same rows as the row_number oracle
    "q27_topk_agg" -> ((s, dir) => {
      graft.operators.TopK.perKey(t(s, dir, "orders"),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3)
        .orderBy("o_custkey", "rank")
    }),
    "q12_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          when(col("o_totalprice") > 200000.0, lit("big"))
            .when(col("o_totalprice") > 100000.0, lit("mid"))
            .otherwise(lit("small")).as("bucket"),
          length(col("o_orderpriority")).cast("long").as("prio_len"))
        .orderBy("o_orderkey")
    }),
    "q13_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 3)
        .orderBy("o_custkey")
    }),
    "q14_json_funcs" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),
    "q15_quantiles" -> ((s, dir) => {
      // exact interpolated percentiles (sort-based, deterministic) — NOT
      // approx_percentile, whose sketch differs across engines. The
      // array form computes all three from ONE value-counts buffer
      // instead of three independent percentile aggregates.
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("__p"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          round(col("__p").getItem(0), 6).as("p25"),
          round(col("__p").getItem(1), 6).as("p50"),
          round(col("__p").getItem(2), 6).as("p75"),
          col("n"))
        .orderBy("l_returnflag")
    }),
    // the distinct-year set is emitted as a joined string, not a raw
    // array: the result is equally gateable (same content, same order) and
    // the driver's hash compare can sort a string column where it cannot
    // sort numpy arrays
    "q16_array_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(
          sort_array(collect_set(year(col("o_orderdate")).cast("long")))
            .as("years_arr"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"),
          array_join(col("years_arr").cast("array<string>"), ",").as("years"),
          col("n_orders"),
          size(col("years_arr")).cast("long").as("n_years"))
        .orderBy("o_custkey")
    }),
    "q17_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          datediff(lit("1998-12-31").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("age_days"))
        .orderBy("o_orderkey")
    }),

    // SQL-text entry path (parser → analyzer), with correlated scalar
    // subqueries Catalyst rewrites into joins. The predicate is pure
    // DECIMAL arithmetic (price*count > 2*sum) — an avg() threshold would
    // divide, and Spark's decimal avg rounds while DuckDB's returns
    // double, so boundary rows could disagree.
    "q19_sql_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
          |FROM orders_v o
          |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
          |    (SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
          |  > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |         FROM orders_v i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin)
    }),
    "q18_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(decSum(col("l_quantity")))
        .select(col("l_linestatus"),
          col("A").as("qty_a"), col("N").as("qty_n"), col("R").as("qty_r"))
        .orderBy("l_linestatus")
    }),
    // corpus mixing: keep all of src0, half of src1, a quarter of src2,
    // 10% of everything else — per-row hash decision, no shuffle
    "q47_source_mix" -> ((s, dir) => {
      graft.operators.Sampling.sourceMix(t(s, dir, "documents"),
        "doc_id", "source",
        Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultFraction = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),
    // reproducible hash-split: every doc gets a deterministic
    // train/val/test label (pure function of doc_id — stable across
    // partitionings, engines, and separate jobs)
    "q56_hash_split" -> ((s, dir) => {
      graft.operators.Sampling.hashSplit(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }),
    // keep ~25% of rows, decided by a pure hash of (seed, doc_id) — the
    // same row set on any engine, partitioning, or re-run
    "q49_hash_sample" -> ((s, dir) => {
      graft.operators.Sampling.hashSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", fraction = 0.25)
        .orderBy("doc_id")
    }),
    // stable per-group subsample: at most 10 docs per source, chosen by
    // hash order
    "q57_group_cap" -> ((s, dir) => {
      graft.operators.Sampling.groupCap(
        t(s, dir, "documents").select(col("source"), col("doc_id")),
        Seq("source"), "doc_id", n = 10)
        .orderBy("source", "doc_id")
    }),

    // ---- event streams (batch formulation of the streaming ops)
    "q60_event_windows" -> ((s, dir) => {
      graft.streaming.EventStreams.windowedCounts(events(s, dir))
        .orderBy("window_start", "event_type")
    }),
    "q61_event_sessions" -> ((s, dir) => {
      graft.streaming.EventStreams.sessionize(events(s, dir))
        .orderBy("user_id", "session_id")
    }),
    "q62_asof_join" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("secs", unix_timestamp(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("secs"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy("user_id", "secs").agg(max(col("value")).as("err_value"))
      TemporalJoins.asofJoin(clicks, errors, "user_id", "secs")
        .select(col("user_id"), col("event_id"),
          col("secs").as("click_secs"),
          col("asof_secs").as("err_secs"), col("asof_err_value").as("err_value"))
        .orderBy("user_id", "event_id")
    }),
    "q63_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("secs"))
      TemporalJoins.rangeSelfJoinPairs(ev, "user_id", "event_id", "secs",
        maxGap = 60L)
        .select(col("user_id"), col("id_a"), col("id_b"),
          col("gap").as("gap_secs"))
        .orderBy("user_id", "id_a", "id_b")
    }),

    // errors in the hour before each click (two-frame range join,
    // batch formulation of EventStreams.streamingIntervalJoin)
    "q64_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("secs"))
      val clicks = ev.filter(col("event_type") === "click")
      val errors = ev.filter(col("event_type") === "error")
      TemporalJoins.rangeJoin(clicks, errors, "user_id", "event_id", "secs",
        maxBefore = 3600L, maxAfter = 0L)
        .select(col("user_id"), col("id_l").as("click_id"),
          col("secs_l").as("click_secs"),
          col("id_r").as("err_id"), col("secs_r").as("err_secs"))
        .orderBy("user_id", "click_id", "err_id")
    }),
    // Z-order (Morton) layout values: equi-depth 4-bit buckets per
    // dimension (exact-percentile cuts, rounded on-engine — the q97
    // contract), bits interleaved — the clustering key a lakehouse
    // table optimizer range-writes by so min/max file stats prune
    // multi-predicate scans in EVERY listed dimension
    "q140_zorder_values" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val Seq(cutsC, cutsP) = graft.operators.Layout.equiDepthCutsAll(
        orders, Seq("o_custkey", "o_totalprice"), 4)
      orders.select(col("o_orderkey"),
        graft.operators.Layout.bucketOf(col("o_custkey"), cutsC)
          .as("b_cust"),
        graft.operators.Layout.bucketOf(col("o_totalprice"), cutsP)
          .as("b_price"))
        .select(col("o_orderkey"), col("b_cust"), col("b_price"),
          graft.operators.Layout.zValue(
            Seq(col("b_cust"), col("b_price")), 4).as("zval"))
        .orderBy("o_orderkey")
    }),
    // compaction sizing (the other half of a table-optimize run): file
    // count packing per-row byte sizes into 256 KiB targets — one
    // two-scalar aggregation, the number a 100 TB OPTIMIZE feeds to
    // its per-partition rewrites
    "q141_compaction_plan" -> ((s, dir) => {
      graft.operators.Layout.compactionPlan(
        t(s, dir, "documents"),
        octet_length(col("text")) + lit(64), targetBytes = 262144L)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  round(l_extendedprice * l_discount, 4) AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q05_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q06_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) sub
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q07_distinct_agg" ->
      """SELECT l_suppkey,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q09_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q10_setops" ->
      """SELECT 'both' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders) a
        |UNION ALL
        |SELECT 'no_orders' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders) b
        |ORDER BY tag, custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q25_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q26_window_frames" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running_qty,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_qty,
        |  CAST(dense_rank() OVER (PARTITION BY l_suppkey
        |    ORDER BY CAST(l_quantity AS BIGINT) DESC) AS BIGINT) AS qty_rank,
        |  CAST(ntile(4) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS BIGINT)
        |    AS quartile
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "q27_topk_agg" ->
      """SELECT o_custkey, CAST(rank AS BIGINT) AS rank,
        |  o_totalprice, o_orderkey
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders)
        |WHERE rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,
    "q29_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q28_salted_join" ->
      """SELECT l_partkey, p_name, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY l_partkey, p_name
        |ORDER BY l_partkey""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q13_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "q14_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q15_quantiles" ->
      """SELECT l_returnflag,
        |  round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 6) AS p25,
        |  round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS p50,
        |  round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 6) AS p75,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q16_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list_distinct(list(CAST(year(o_orderdate) AS BIGINT)))), ',') AS years,
        |  count(*) AS n_orders,
        |  CAST(len(list_distinct(list(CAST(year(o_orderdate) AS BIGINT)))) AS BIGINT) AS n_years
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q17_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS age_days
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q19_sql_subquery" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |         FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    // cutoffs are the driver-side (fraction * 10^6).toLong literals
    "q47_source_mix" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${h60("'graft:'||doc_id")} % 1000000 AS bkt
         |  FROM documents)
         |SELECT doc_id, source FROM b
         |WHERE bkt < CASE source
         |  WHEN 'src0' THEN 1000000
         |  WHEN 'src1' THEN 500000
         |  WHEN 'src2' THEN 250000
         |  ELSE 100000 END
         |ORDER BY doc_id""".stripMargin,

    // equi-depth cuts via quantile_cont (the q97-validated pairing for
    // Spark's exact `percentile`), bucket = count of cuts exceeded,
    // Morton interleave as explicit shift/mask terms
    "q140_zorder_values" -> {
      val probs = (1 until 16).map(i => s"${i.toDouble / 16}").mkString(", ")
      val interleave = (0 until 4).flatMap { i =>
        Seq(s"(((b_cust >> $i) & 1) << ${2 * i})",
          s"(((b_price >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"""WITH cuts AS (
         |  SELECT
         |    list_transform(quantile_cont(o_custkey, [$probs]),
         |      x -> round(x, 6)) AS cc,
         |    list_transform(quantile_cont(o_totalprice, [$probs]),
         |      x -> round(x, 6)) AS cp
         |  FROM orders),
         |b AS (
         |  SELECT o_orderkey,
         |    len(list_filter(cuts.cc, c -> o_custkey > c)) AS b_cust,
         |    len(list_filter(cuts.cp, c -> o_totalprice > c)) AS b_price
         |  FROM orders CROSS JOIN cuts)
         |SELECT o_orderkey, CAST(b_cust AS BIGINT) AS b_cust,
         |  CAST(b_price AS BIGINT) AS b_price,
         |  CAST($interleave AS BIGINT) AS zval
         |FROM b ORDER BY o_orderkey""".stripMargin
    },
    // n_files = max(1, ceil(total/target)) over exact per-row sizes
    "q141_compaction_plan" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(octet_length(encode(text)) + 64), 0)
         |    AS BIGINT) AS total_bytes,
         |  CAST(greatest(1, ceil(
         |    CAST(coalesce(sum(octet_length(encode(text)) + 64), 0)
         |      AS DOUBLE) / 262144)) AS BIGINT) AS n_files
         |FROM documents""".stripMargin,
    // cutoff is the driver-side (0.25 * 10^6).toLong literal
    "q49_hash_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${h60("'graft:'||doc_id")} % 1000000 < 250000
         |ORDER BY doc_id""".stripMargin,
    "q56_hash_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${h60("'graft:'||doc_id")} % 1000000 AS bkt
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN bkt < 800000 THEN 'train'
         |       WHEN bkt < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "q57_group_cap" ->
      s"""WITH b AS (
         |  SELECT source, doc_id,
         |    ${h60("'graft:'||doc_id")} % 1000000 AS bkt
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) AS rn
         |  FROM b)
         |SELECT source, doc_id FROM r WHERE rn <= 10
         |ORDER BY source, doc_id""".stripMargin,

    // ---- event-stream oracles (batch formulation)
    "q60_event_windows" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q61_event_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, secs,
        |    lag(secs) OVER (PARTITION BY user_id ORDER BY secs, event_id) AS prev_secs
        |  FROM e),
        |flagged AS (
        |  SELECT user_id, event_id, secs,
        |    CASE WHEN prev_secs IS NULL OR secs - prev_secs > 1800
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, secs,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY secs, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(secs) AS sess_start, max(secs) AS sess_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q62_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs
        |  FROM events),
        |r AS (SELECT user_id, secs, max(value) AS err_value
        |      FROM e WHERE event_type = 'error' GROUP BY 1, 2),
        |l AS (SELECT user_id, event_id, secs FROM e WHERE event_type = 'click')
        |SELECT l.user_id, l.event_id, l.secs AS click_secs,
        |  r.secs AS err_secs, r.err_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.secs >= r.secs
        |ORDER BY l.user_id, event_id""".stripMargin,
    "q63_range_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs
        |  FROM events)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  b.secs - a.secs AS gap_secs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(b.secs - a.secs) <= 60
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,

    "q64_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs
        |  FROM events),
        |c AS (SELECT user_id, event_id, secs FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id AS err_user, event_id AS err_id, secs AS err_secs
        |      FROM e WHERE event_type = 'error')
        |SELECT user_id, c.event_id AS click_id, c.secs AS click_secs,
        |  err_id, err_secs
        |FROM c JOIN r ON user_id = err_user
        |  AND err_secs BETWEEN c.secs - 3600 AND c.secs
        |ORDER BY user_id, click_id, err_id""".stripMargin,
  )
}
