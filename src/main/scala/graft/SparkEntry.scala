package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}

/** Driver contract — the engine's query surface over the driver's parquet
  * fixtures, with a DuckDB-runnable oracle per query.
  *
  * Conventions keeping the Spark result and the DuckDB oracle hash-equal:
  *   - integer outputs are always BIGINT (Spark `long`);
  *   - money/ratio aggregates sum exact DECIMAL then cast to DOUBLE (sum
  *     order independence), or are pure double arithmetic on identical
  *     inputs (bit-identical in both engines);
  *   - every query ends in a total ORDER BY (deterministic row order);
  *   - hashes are md5-derived (portable), never Spark-internal murmur3.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper timestamp. The fixture writes
    * TIMESTAMP(NANOS) which Spark only reads as a nanos BIGINT (under
    * `spark.sql.legacy.parquet.nanosAsLong`) — convert with integer
    * division (a double roundtrip would lose precision past 2^53).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Closed-form messy URL from doc_id — the q150/q151 fixture: every
    * canonicalization hazard at once (mixed-case scheme and host, www
    * on id%3==0, a default :80 port on id%4==0 and a real :8080 on
    * id%4==1, a trailing path slash on evens, tracking params around a
    * real one, a fragment). The oracle predicts the CANONICAL form in
    * closed form rather than replaying the chain.
    */
  private def messyUrl(d: Column): Column = concat(
    when(d % 2 === 0, lit("HTTP")).otherwise(lit("https")),
    lit("://"),
    when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
    lit("Site"), (d % 7).cast("string"),
    when(d % 5 === 0, lit(".co.uk")).otherwise(lit(".Example.com")),
    when(d % 4 === 0, lit(":80"))
      .when(d % 4 === 1, lit(":8080")).otherwise(lit("")),
    lit("/Articles/"), d.cast("string"),
    when(d % 2 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&id="), d.cast("string"),
    lit("&utm_campaign=x&fbclid=abc#Section-"), (d % 3).cast("string"))

  /** Closed-form anchor markup from doc_id — the q152/q153 fixture:
    * two messy double-quoted hrefs (case, www, default port, tracking
    * param, fragment, trailing slash) whose canonical targets the
    * oracle predicts in closed form. Link A lands on
    * site{(d+3)%7}.example.com, link B on site{(2d+1)%7}.co.uk.
    */
  private def linkHtml(d: Column): Column = concat(
    lit("<html><body><p>intro</p><a class=\"m\" href=\"HTTP://Site"),
    ((d + 3) % 7).cast("string"),
    lit(".Example.com/From/"), d.cast("string"),
    lit("?utm_source=a&x="), (d % 3).cast("string"),
    lit("#f\">one</a><div><a href=\"https://WWW.Site"),
    ((d * 2 + 1) % 7).cast("string"),
    lit(".co.uk:443/Page/\">two</a></div></body></html>"))

  /** documents with the column names the Jaccard operators expect. */
  private def docsAsCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id").as("docId"), col("text"))

  /** documents globally sorted by doc_id BEFORE the caller's expensive
    * per-doc projections. A global sort samples its child to compute
    * range bounds, re-executing everything below the exchange — with a
    * trailing `orderBy` that means every kernel runs twice. Sorting the
    * bare scan first and applying the (order-preserving, narrow)
    * projections above it keeps the output sorted while the sampling
    * pass re-reads only the scan: measured 5.8 s → 3.2 s on
    * q54_char_shingles at sf0.1.
    */
  private def docsSorted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").orderBy("doc_id")

  private def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Jaccard.allPairs(docsAsCorpus(spark, "/root/testdata/sf0.001"))

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // ---- the reference's own query family, over the documents table
    "q20_jac_doc_sizes" -> ((s, dir) => {
      Jaccard.docSizes(Jaccard.tokenized(docsAsCorpus(s, dir)))
        .select(col("docId").as("doc_id"), col("size"))
        .orderBy("doc_id")
    }),
    "q21_jac_word_df" -> ((s, dir) => {
      Jaccard.postings(Jaccard.tokenized(docsAsCorpus(s, dir)))
        .groupBy("word")
        .agg(count(lit(1)).as("df"))
        .orderBy("word")
    }),
    "q22_jac_pairs" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.pairIntersections(Jaccard.postings(Jaccard.tokenized(docs)))
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"), col("inter"))
        .orderBy("doc_a", "doc_b")
    }),
    "q23_jac_sim" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.allPairs(docs)
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
          col("inter"), col("sizeA").as("size_a"), col("sizeB").as("size_b"),
          round(col("similarity"), 4).as("similarity"))
        .orderBy("doc_a", "doc_b")
    }),
    "q24_jac_topk" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.topKNeighbors(Jaccard.allPairs(docs), 3)
        .select(col("doc").as("doc_id"), col("neighbor").as("neighbor_id"),
          round(col("similarity"), 4).as("similarity"),
          col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")
    }),
    // G1 — the materialized posting lists themselves (word → sorted doc
    // set), oracle-gated: the one §2.1 operator that was previously
    // spec-gated only. The list is serialized with array_join (the q16
    // precedent) because the driver's pandas comparator cannot sort raw
    // array columns.
    "q68_posting_lists" -> ((s, dir) => {
      val toks = Jaccard.tokenized(docsAsCorpus(s, dir))
      Jaccard.postingLists(Jaccard.postings(toks))
        .select(col("word"), array_join(col("docIds"), ",").as("doc_ids"))
        .orderBy("word")
    }),

    // ---- deduplication suite (training-data pipeline)
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("text_hash")
    }),
    // MinHash sketches 3-word shingle sets, not unigram sets: the fixture
    // corpus has a ~31-word vocabulary, so unigram sets are near-identical
    // across docs and LSH banding would degenerate to an all-pairs join.
    "q31_minhash_sig" -> ((s, dir) => {
      Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id", "text",
        k = 8, tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id"), col("perm").cast("long").as("perm"),
          col("min_hash"))
        .orderBy("doc_id", "perm")
    }),
    "q32_lsh_candidates" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
        .orderBy("id_a", "id_b")
    }),
    // MinHash-estimated Jaccard on the LSH candidate pairs: fraction of
    // the k=8 permutations on which the two signatures agree — the cheap
    // verify step between banding and an exact n-gram check
    "q48_minhash_estimate" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
        .select("id_a", "id_b")
      Dedup.minHashEstimate(cands, sigs, "doc_id", k = 8)
        .orderBy("id_a", "id_b")
    }),
    "q33_simhash" -> ((s, dir) => {
      Dedup.simHashes(docsSorted(s, dir), "doc_id", "text", bits = 32)
    }),
    // the same SimHash via the SQL-TEXT entry path: parser → analyzer →
    // the registry-registered native kernels (graft_simhash), proving the
    // SparkSessionExtensions/SQL surface end to end; gated by the SAME
    // oracle as q33
    "q55_sql_native_simhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id,
          |  graft_simhash(transform(tokens,
          |    t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)),
          |    32) AS simhash
          |FROM (
          |  SELECT doc_id, array_distinct(filter(
          |    split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '), '\\s+'),
          |    x -> x != '')) AS tokens
          |  FROM documents_v
          |  WHERE lower(text) RLIKE '[a-z0-9]')
          |ORDER BY doc_id""".stripMargin)
    }),
    // exact all-pairs verifier, candidate-/block-scoped by contract:
    // maxBlockSize enforces "blocks don't grow with the corpus" in-plan
    // (raise_error before the quadratic join); the scale path is q65
    "q34_simhash_neardups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sims = Dedup.simHashes(docs, "doc_id", "text", bits = 32)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Dedup.simHashNearDups(sims, "doc_id", col("source"), maxHamming = 8,
        maxBlockSize = 10000L)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),
    // the SAME near-dup pairs as q34, produced by the scale-safe path:
    // pigeonhole banding over the 32-bit simhash (9 bands for
    // maxHamming=8) — candidates from an equi-join on (source, band#,
    // band bits), Hamming verified on candidates only. Gated by q34's
    // oracle verbatim, proving the banded path emits exactly the
    // all-pairs verifier's result with no block-wide self-join
    "q65_simhash_neardups_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sims = Dedup.simHashes(docs, "doc_id", "text", bits = 32)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Dedup.simHashNearDupsBanded(sims, "doc_id", col("source"),
        maxHamming = 8, bits = 32)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),
    "q35_ngram_neardups" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, blockCol = col("source"), minJaccard = 0.2)
        .select(col("id_a"), col("id_b"),
          col("inter").cast("long").as("inter"),
          col("size_a").cast("long").as("size_a"),
          col("size_b").cast("long").as("size_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "q37_hll_registers" -> ((s, dir) => {
      // portable HLL sketch of distinct-token counts per source: the
      // registers are deterministic integers, so they gate exactly.
      // rlike pre-filter + outer explode: equivalent to inner explode
      // (empty-token docs emit nothing either way) without the inferred
      // size()>0 filter that re-runs the tokenizer in the scan filter
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("source"), TextFunctions.normalizeTokens(col("text")).as("__toks"))
        .select(col("source"), explode_outer(col("__toks")).as("tok"))
      graft.operators.Hll.registers(posts, Seq("source"), "tok", m = 64)
        .orderBy("source", "bucket")
    }),
    // same signature values as q31, computed from EXPLODED (id, token)
    // postings via the typed MinHashAggregator UDAF — gated by the SAME
    // oracle SQL as q31, proving the two formulations equivalent
    "q38_minhash_postings" -> ((s, dir) => {
      GraftFunctions.register(s)
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          Dedup.shingleTokenizer(3)(col("text")).as("__sh"))
        .select(col("doc_id"), explode_outer(col("__sh")).as("word"))
      Dedup.minHashSignaturesFromPostings(posts, "doc_id", "word", k = 8)
        .select(col("doc_id"), col("perm").cast("long").as("perm"),
          col("min_hash"))
        .orderBy("doc_id", "perm")
    }),
    // the double-math estimate on top of the q37 registers, rounded to
    // 6 dp (the registers are exact-gated; the estimate's arithmetic is
    // reproduced op-for-op in the oracle so it gates too)
    "q39_hll_estimate" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("source"), TextFunctions.normalizeTokens(col("text")).as("__toks"))
        .select(col("source"), explode_outer(col("__toks")).as("tok"))
      val regs = graft.operators.Hll.registers(posts, Seq("source"), "tok",
        m = 64)
      graft.operators.Hll.estimate(regs, Seq("source"), m = 64)
        .select(col("source"), round(col("estimate"), 6).as("estimate"))
        .orderBy("source")
    }),
    // exact all-pairs verifier, block-scoped by contract: maxBlockSize
    // enforces the bound in-plan (see q34); the scale path is q66
    "q36_cosine_neardups" -> ((s, dir) => {
      Dedup.cosineNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
        blockCol = col("label"), minCosine = 0.3, maxBlockSize = 10000L)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // cosine near-dups behind LSH candidate generation — the scale path
    // cosineNearDups' scaladoc defers to, now gated end to end: SRP
    // buckets → shared-bucket candidate pairs → exact cosine ≥ τ on
    // candidates only (no block-wide self-join anywhere in the plan)
    "q66_cosine_neardups_lsh" -> ((s, dir) => {
      Dedup.cosineNearDupsLsh(t(s, dir, "embeddings"), "vec_id",
        "embedding", tables = 2, planes = 4, minCosine = 0.3, dim = 64)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // near-dup CLUSTER resolution: connected components over the LSH
    // candidate graph (transitive-closure dedup policy)
    "q45_neardup_components" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.connectedComponents(cands, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    // the SAME labeling via large-star/small-star contraction — the
    // O(log)-round extreme-scale path (diameter-independent), gated by
    // q45's oracle verbatim to prove the two formulations agree
    "q69_neardup_components_star" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.connectedComponentsStar(cands, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    // benchmark decontamination: training docs (source != src0) whose
    // 3-gram coverage of any held-out src0 doc crosses the threshold
    "q46_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.ngramOverlap(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, minCoverage = 0.2)
        .select(col("doc_id"), col("bench_id"),
          col("shared").cast("long").as("shared"), col("bench_sz"),
          round(col("coverage"), 4).as("coverage"))
        .orderBy("doc_id", "bench_id")
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

    // ---- similarity search (ANN)
    "q40_knn_brute" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      Knn.bruteForceTopK(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // dim=64 is the embeddings fixture's (uniform) vector length — passing
    // it skips the one-row probe job the operator otherwise runs
    "q41_lsh_buckets" -> ((s, dir) => {
      Knn.lshBuckets(t(s, dir, "embeddings"), "vec_id", "embedding",
        tables = 2, planes = 4, dim = 64)
        .select(col("vec_id"), col("htable").cast("long").as("htable"),
          col("bucket"))
        .orderBy("vec_id", "htable")
    }),
    "q42_knn_lsh" -> ((s, dir) => {
      Knn.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, tables = 2, planes = 4, dim = 64)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // IVF coarse index: nearest-centroid cell per vector (seed centroids
    // = the 16 lowest-id vectors; see Knn.ivfSeedCentroids)
    // centroid seeds use the SAME `vec_id < 16` predicate as the oracle
    // SQL (not ivfSeedCentroids' lowest-k, which only coincides while
    // fixture ids are contiguous from 0) — the gate must not depend on
    // that fixture accident
    "q43_ivf_assign" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Knn.ivfAssign(embs, "vec_id", "embedding", cents)
        .orderBy("vec_id")
    }),
    "q44_knn_ivf" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Knn.ivfTopK(embs, embs.filter(col("vec_id") < 20), cents,
        "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // q43's assignment after ONE Lloyd iteration: seeds → assign →
    // ordered-fold element-wise means (bit-reproducible, see
    // Knn.ivfRefine) → reassign with the refined centroids. Gates the
    // whole refine step — means, empty-cell fallback, and the final
    // assignment — against the op-for-op SQL reproduction
    "q67_ivf_refined_assign" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val refined = Knn.ivfRefine(embs, "vec_id", "embedding", cents,
        iters = 1)
      Knn.ivfAssign(embs, "vec_id", "embedding", refined)
        .orderBy("vec_id")
    }),
    // the full ANN search over REFINED centroids: ivfRefine → ivfTopK —
    // q44's search with the better quantizer, proving the refine output
    // drops into the probe/re-rank path end to end
    "q74_knn_ivf_refined" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val seeds = embs.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val refined = Knn.ivfRefine(embs, "vec_id", "embedding", seeds,
        iters = 1)
      Knn.ivfTopK(embs, embs.filter(col("vec_id") < 20), refined,
        "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- text analysis (training-data curation)
    "q50_token_counts" -> ((s, dir) => {
      docsSorted(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_words"),
          TextAnalysis.subwordCountApprox(col("text")).as("n_subwords"))
    }),
    "q51_quality" -> ((s, dir) => {
      TextAnalysis.qualityStats(docsSorted(s, dir), "doc_id", "text")
    }),
    "q52_langid" -> ((s, dir) => {
      TextAnalysis.langId(docsSorted(s, dir), "doc_id", "text")
    }),
    "q53_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprints(docsSorted(s, dir), "doc_id", "text")
    }),
    // char-shingle near-dup primitive: gate the full shingle SET per doc
    // (count + md5 of the sorted joined shingles), not just a count
    "q54_char_shingles" -> ((s, dir) => {
      GraftFunctions.register(s)
      docsSorted(s, dir)
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          TextFunctions.charShingles(col("text"), 5).as("sh"))
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          md5(array_join(array_sort(col("sh")), "|")).as("shingle_md5"))
    }),

    // TF-IDF + BM25 relevance weights over the inverted index
    "q58_term_scores" -> ((s, dir) => {
      TextAnalysis.termScores(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("word"), col("tf"),
          round(col("tfidf"), 6).as("tfidf"),
          round(col("bm25"), 6).as("bm25"))
        .orderBy("doc_id", "word")
    }),
    // keyword extraction: top-3 terms per doc by tf-idf (rank on the
    // UNROUNDED score, ties by word — deterministic in both engines)
    "q59_keywords" -> ((s, dir) => {
      val scores = TextAnalysis.termScores(t(s, dir, "documents"),
        "doc_id", "text")
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word").asc)
      scores.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("word"),
          round(col("tfidf"), 6).as("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
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

    // ---- multimodal metadata plumbing (stub decode)
    "q71_mm_frames" -> ((s, dir) => {
      // mixed-modality view of the documents fixture: every third doc is
      // treated as video; frame-sample those at 5 s
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text",
        when(col("doc_id") % 3 === 0, lit("video")).otherwise(lit("image")))
      graft.multimodal.Multimodal.sampleFrames(assets, everyMs = 5000L)
        .orderBy("id", "frame_ts_ms")
    }),
    // full multimodal -> ANN composition, REAL features end to end
    // (round 10): BMP fixtures decode through the JDK reader, the
    // 16-bin grayscale histogram of the DECODED PIXELS is the
    // embedding (histEmbedBytes — the honest version of the stubEmbed
    // seam), and the IVF index runs over it. The oracle re-derives the
    // histograms from the closed-form pixel formula and replays the
    // whole search — a stub fallback would hash-fail
    "q72_mm_embed_knn" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      val embs = graft.multimodal.Multimodal.embedPartitions(assets, dim = 16)
      // id < 8 predicate mirrors the oracle (see q43 note)
      val cents = embs.filter(col("id") < 8)
        .select(col("id").as("cid"), col("embedding").as("cvec"))
      Knn.ivfTopK(embs, embs.filter(col("id") < 10), cents,
        "id", "embedding", k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // stub resize: byte-budget plumbing (target w*h*c capped by source)
    "q73_mm_resize" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text",
        when(col("doc_id") % 4 === 0, lit("audio")).otherwise(lit("image")))
      graft.multimodal.Multimodal.stubResize(assets, w = 8, h = 6)
        .orderBy("id")
    }),
    "q70_mm_meta" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text", "image")
      graft.multimodal.Multimodal.stubDecodeMeta(assets)
        .select(col("id"), col("modality"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("duration_ms"))
        .orderBy("id")
    }),

    // duplicated-span removal (RefinedWeb "remove duplicated spans" at
    // chunk granularity — the operation q76 only measures): cut every
    // 8-token window shared by more than 2 docs, reassemble the rest
    "q96_drop_dup_chunks" -> ((s, dir) => {
      graft.operators.Chunking.dropDuplicatedChunks(
        t(s, dir, "documents"), "doc_id", "text", width = 8, maxDf = 2L)
        .orderBy("doc_id")
    }),

    // the SAME metadata as q70, produced through the imperative
    // mapPartitions decoder seam (decodePartitions + stubDecodeBytes)
    // instead of the columnar stubDecodeMeta projection — the two paths
    // are value-identical by construction, so q70's oracle gates the
    // seam a real codec would plug into
    "q95_mm_decode_seam" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text", "image")
      graft.multimodal.Multimodal.decodePartitions(assets).toDF()
        .select(col("id"), col("modality"), col("nBytes").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("durationMs").as("duration_ms"))
        .orderBy("id")
    }),

    // ---- repetition / sub-document duplication / frequency sketches
    // Gopher-style repetition gate: top-n-gram and duplicate-n-gram
    // fractions per doc (word bigrams + trigrams off one tokenizer pass)
    "q75_repetition_stats" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text",
        ns = Seq(2, 3))
        .orderBy("doc_id")
    }),
    // C4/RefinedWeb-style sub-document duplication: 8-word chunks counted
    // corpus-wide; per-doc fraction of chunks that appear elsewhere
    "q76_chunk_stats" -> ((s, dir) => {
      Dedup.chunkStats(t(s, dir, "documents"), "doc_id", "text",
        chunkWords = 8)
        .orderBy("doc_id")
    }),
    // count-min sketch cells over the token OCCURRENCE stream (multiset —
    // contrast q37's HLL, which sketches the distinct set). Deterministic
    // integers, so the registers gate exactly, like q37
    "q77_cms_registers" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(col("__ws")).as("tok"))
      CountMin.registers(posts, "tok", depth = 4, width = 64)
        .orderBy("row", "bucket")
    }),
    // CMS point estimates for the exact top-10 tokens, next to their true
    // counts — the heavy-hitter readout (est ≥ exact; both engines
    // compute the same deterministic cells, so any collision inflates
    // both sides identically)
    "q78_cms_heavy_hitters" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(col("__ws")).as("tok"))
      val top = posts.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(10)
      val regs = CountMin.registers(posts, "tok", depth = 4, width = 64)
      CountMin.estimate(regs, top.select("tok"), "tok", depth = 4, width = 64)
        .join(top, "tok")
        .select(col("tok"), col("exact"), col("est"))
        .orderBy("tok")
    }),
    // the corpus AFTER exact dedup (keeper = min doc_id per content
    // hash) — the materialization q30's group table feeds
    "q79_dedup_keep_first" -> ((s, dir) => {
      Dedup.exactDeduped(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // Bloom filter of the benchmark corpus's 3-shingle set — the
    // broadcastable membership sketch (deterministic bit rows, exact gate
    // like q37's HLL registers and q77's CMS cells)
    "q80_bloom_bits" -> ((s, dir) => {
      GraftFunctions.register(s)
      val bench = t(s, dir, "documents")
        .filter(col("source") === "src0" &&
          lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(array_distinct(
          GraftFunctions.wordNGrams(col("__ws"), 3))).as("shingle"))
      graft.operators.Bloom.bits(bench, "shingle", m = 65536, k = 3)
        .orderBy("bit")
    }),
    // q46's decontamination overlap answered from the q80 sketch instead
    // of the cross-corpus posting join: the training side never shuffles
    // by content — k broadcast joins + one per-doc aggregation. n_maybe
    // counts shingles the filter flags (includes its deterministic false
    // positives; both engines reproduce them bit-identically)
    "q81_bloom_decontaminate" -> ((s, dir) => {
      GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      def shingles(df: DataFrame): DataFrame = df
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(col("doc_id"), explode_outer(array_distinct(
          GraftFunctions.wordNGrams(col("__ws"), 3))).as("shingle"))
      val benchBits = graft.operators.Bloom.bits(
        shingles(docs.filter(col("source") === "src0")).select("shingle"),
        "shingle", m = 65536, k = 3)
      graft.operators.Bloom.probeStats(benchBits,
        shingles(docs.filter(col("source") =!= "src0")),
        "doc_id", "shingle", m = 65536, k = 3)
        .orderBy("doc_id")
    }),
    // sequence packing: deterministic doc → token-budget pack assignment
    // (hash-sharded, per-shard prefix sums — no global sort anywhere)
    "q82_token_packing" -> ((s, dir) => {
      graft.operators.Packing.assignPacks(t(s, dir, "documents"),
        "doc_id", "text", budget = 512, shards = 8)
        .orderBy("doc_id")
    }),
    // pack-level rollup with an order-sensitive digest of each pack's
    // concatenated text — proves the assembled training sequences are
    // byte-deterministic, not just the assignment
    "q83_pack_digests" -> ((s, dir) => {
      graft.operators.Packing.packDigests(t(s, dir, "documents"),
        "doc_id", "text", budget = 512, shards = 8)
        .orderBy("shard", "pack_id")
    }),

    // C4-style blocklist screening: the list folds into the expression
    // tree — a pure narrow projection, no join, no shuffle
    "q84_blocklist" -> ((s, dir) => {
      graft.operators.Scrub.blocklistStats(t(s, dir, "documents"),
        "doc_id", "text", terms = Seq("slow", "dup", "batch"),
        maxBlocked = 2)
        .orderBy("doc_id")
    }),
    // PII-shaped regex redaction over event payloads (digit runs →
    // <NUM>); match counts via engine-portable split cardinality
    "q85_redact" -> ((s, dir) => {
      graft.operators.Scrub.redact(
        t(s, dir, "events").select(col("event_id"), col("props")),
        "props", rules = Seq(("[0-9]+", "<NUM>")))
        .orderBy("event_id")
    }),
    // temperature-rebalanced (T=2) source mixing with rates derived from
    // the data in one tiny broadcast agg — corpus never shuffles
    "q86_temperature_mix" -> ((s, dir) => {
      graft.operators.Sampling.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", keepLargest = 0.5)
        .orderBy("doc_id")
    }),
    // the near-dup dedup pipeline end to end: shingles → minhash → LSH
    // candidates → connected components → keeper corpus (q45's labeling
    // turned into the deduplicated corpus a trainer actually reads)
    "q87_neardup_keepers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
        tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.nearDupKeepers(docs, "doc_id",
        Dedup.connectedComponents(cands, "id_a", "id_b"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // corpus-relative quality gate: drop the worst quartile by alpha
    // ratio — threshold is one exact-percentile scalar joined back by
    // broadcast, so the corpus never shuffles
    "q88_quality_gate" -> ((s, dir) => {
      graft.functions.TextAnalysis.qualityPercentileGate(
        t(s, dir, "documents"), "doc_id", "text",
        metric = "alpha_ratio", q = 0.25)
        .orderBy("doc_id")
    }),
    // context-length chunking: 32-token windows, stride 16 (50% overlap)
    // — fixed-width training/RAG pieces, digest-gated like q83's packs
    "q89_token_chunks" -> ((s, dir) => {
      graft.operators.Chunking.tokenChunks(t(s, dir, "documents"),
        "doc_id", "text", width = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // SemDeDup-style semantic dedup: Lloyd-REFINED IVF cells (seed +
    // one ivfRefine round, the q67 pattern) → within-cell cosine pairs
    // → components → keeper corpus. Blocking key is the quantizer cell —
    // sized by the centroid count, a knob scaled with the corpus, unlike
    // q36's fixed label blocks; refinement is the shape a real SemDeDup
    // deployment runs (balanced cells, not arbitrary seed vectors)
    "q90_semantic_keepers" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val seeds = Knn.ivfSeedCentroids(embs, "vec_id", "embedding",
        kCells = 16)
      val cents = Knn.ivfRefine(embs, "vec_id", "embedding", seeds,
        iters = 1)
      Dedup.semanticKeepers(embs.select(col("vec_id"), col("label")),
        embs, "vec_id", "embedding", cents, minCosine = 0.3)
        .orderBy("vec_id")
    }),
    // CCNet-style perplexity proxy: unigram LM counted on src0, scoring
    // every other source with add-one smoothing (OOV path exercised by
    // construction). Per-doc sums fold token-sorted — bit-reproducible
    "q91_unigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.unigramLogProb(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("sum_logprob"), 6).as("sum_logprob"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    }),
    // winnowing fingerprints (MOSS): window-min selection over char
    // 5-gram hashes, window 4 — guaranteed detection of shared
    // substrings ≥ 8 chars at ~2/5 storage density
    "q101_winnow" -> ((s, dir) => {
      TextAnalysis.winnowFingerprints(t(s, dir, "documents"),
        "doc_id", "text", k = 5, w = 4)
        .orderBy("doc_id", "fingerprint")
    }),
    // MOSS overlap detection over the q101 fingerprints at detection
    // selectivity (k=16): posting join on fingerprint, stop-gram-like
    // hot fingerprints (df > 5) pruned via broadcast anti-join
    "q102_winnow_overlap" -> ((s, dir) => {
      TextAnalysis.winnowOverlapPairs(t(s, dir, "documents"),
        "doc_id", "text", k = 16, w = 8, minShared = 2L,
        maxDocFrequency = 5L)
        .orderBy("id_a", "id_b")
    }),
    // corpus composition report: docs/tokens/mean-length by source ×
    // predicted language with rollup subtotals — one tokenizer pass,
    // group count bounded by |sources| × |languages|
    "q100_corpus_report" -> ((s, dir) => {
      TextAnalysis.corpusReport(t(s, dir, "documents"), "text", "source")
        .orderBy(col("source").asc_nulls_first,
          col("lang_pred").asc_nulls_first)
    }),
    // native one-pass text canonicalization (NFC + control-char strip +
    // whitespace collapse + trim) — the zeroth stage of a web curation
    // cascade, one codegen kernel instead of three regex passes
    "q99_clean_text" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.GraftFunctions.cleanText(col("text"))
            .as("clean_text"))
        .withColumn("clean_len", length(col("clean_text")).cast("long"))
        .orderBy("doc_id")
    }),
    // CCNet-style perplexity bucketing over the q91 scores: tercile cut
    // points (exact percentile, rounded 6 dp, broadcast) split the
    // scored corpus into head / middle / tail — the relative LM gate
    "q97_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.perplexityBuckets(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 6).as("avg_logprob"), col("bucket"))
        .orderBy("doc_id")
    }),
    // DSIR importance weights: log-likelihood ratio of a target model
    // (src0) vs a raw-pool model (src1) over the remaining 18 sources —
    // one tokenizer pass, two vocabulary-sized count joins
    "q98_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") === "src1"),
        docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_weight"), 6).as("log_weight"),
          round(col("avg_log_weight"), 6).as("avg_log_weight"))
        .orderBy("doc_id")
    }),
    // frequency-ranked vocabulary with min-count 2: ids via the
    // two-level ranking (offset over distinct counts + partitioned
    // within-count rank) — equals the oracle's global row_number
    "q92_vocab" -> ((s, dir) => {
      TextAnalysis.buildVocab(t(s, dir, "documents"), "text",
        minCount = 2L)
        .orderBy("token_id")
    }),
    // numericalization under q92's vocabulary: every doc's token-id
    // sequence (position-sorted, OOV → 0) — the trainer-input array the
    // packing (q82/q83) and chunking (q89) stages consume upstream of
    // the tokenizer itself. The id array is serialized with array_join
    // (the q16 precedent) for the driver's pandas comparator.
    "q93_token_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.tokenIds(docs,
        TextAnalysis.buildVocab(docs, "text", minCount = 2L),
        "doc_id", "text")
        .select(col("doc_id"),
          array_join(col("token_ids").cast("array<string>"), ",")
            .as("token_ids"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),
    // recall@5 of the q42 LSH index against q40's brute-force ground
    // truth on the 20 probe queries — "measure, don't guess" for the
    // approximate paths (the filter on query_id pushes through the
    // rank window's partition key, so only probe partitions rank)
    "q94_ann_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val exact = Knn.bruteForceTopK(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      val approx = Knn.lshTopK(embs, "vec_id", "embedding", k = 5,
        tables = 2, planes = 4, dim = 64)
        .filter(col("query_id") < 20)
      Knn.recallAtK(approx, exact)
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("recall"), 6).as("recall"))
        .orderBy("query_id")
    }),
    // BPE training, iteration 0: adjacent character-pair counts over
    // the word-frequency vocabulary — the one corpus-scale pass of
    // tokenizer training; everything after it is vocab-sized
    "q103_bpe_pairs" -> ((s, dir) => {
      Bpe.initialPairStats(t(s, dir, "documents"), "text")
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
    }),
    // the learned BPE merge table (8 merges): driver loop over the
    // vocabulary table only; argmax ties break on the pair ascending so
    // the table is partitioning-invariant. The loop isn't SQL, but its
    // OUTPUT is: the oracle replays each step's argmax over the
    // vocabulary rewritten by the prior merges fixed as literals;
    // exact merges also hand-verified in BpeSpec
    "q104_bpe_merges" -> ((s, dir) => {
      Bpe.learnMerges(t(s, dir, "documents"), "text", numMerges = 8)
        .orderBy("merge_rank")
    }),
    // incremental ingest dedup: the src0 batch probed against the
    // already-indexed rest of the corpus via MinHash band join — never
    // batch×batch, never index×index (q32's parameters, split sides)
    "q105_incremental_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalLshMatches(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .orderBy("batch_id", "index_id")
    }),
    // BPE encoding of the corpus vocabulary with a FIXED merge table
    // (rank order (a,n) (s,c) (sc,an) (e,r) — merge 3 consumes the
    // products of merges 1-2, exercising merged-symbol reuse). Fixed
    // merges make the kernel value-checkable in SQL; composing with the
    // LEARNED table is BpeSpec's job (iterative argmax isn't
    // SQL-expressible). Pieces serialized — the array-column trap
    "q106_bpe_encode" -> ((s, dir) => {
      Bpe.encodeWords(t(s, dir, "documents"), "text", BpeFixedMerges)
        .select(col("word"), col("freq"),
          array_join(col("pieces"), " ").as("pieces"), col("n_pieces"))
        .orderBy("word")
    }),
    // bigram LM with stupid backoff: counted on src0, scoring every
    // other source; seen bigrams score the conditional MLE, unseen back
    // off to 0.4x the smoothed unigram. Pair-sorted fold — bit-
    // reproducible (the q91 contract, one order of ngram up)
    "q107_bigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramLogProb(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sum_logprob"), 6).as("sum_logprob"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    }),
    // cross-source vocabulary overlap from bottom-64 KMV sketches: the
    // corpus collapses to one 64-long sketch per source, every pairwise
    // Jaccard estimate reads sketches only — no corpus join
    "q108_kmv_overlap" -> ((s, dir) => {
      Kmv.kmvCrossJaccard(
        Kmv.vocabSketch(t(s, dir, "documents"), "source", "text", k = 64),
        "source", k = 64)
        .orderBy("group_a", "group_b")
    }),
    // corpus token budget under the q106 tokenizer: per-doc BPE token
    // counts via the vocabulary join — the merge fold never touches the
    // corpus, only distinct words
    "q109_bpe_token_counts" -> ((s, dir) => {
      Bpe.bpeTokenCounts(t(s, dir, "documents"), "doc_id", "text",
        BpeFixedMerges)
        .orderBy("doc_id")
    }),
    // the d×d covariance of the embedding table in one distributed pass
    // — the corpus-scale half of PCA (the eigensolve is driver-sized);
    // bit-exact fold form for the oracle, plain-sum form at scale
    "q110_pca_covariance" -> ((s, dir) => {
      Pca.covariance(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("i", "j")
    }),
    // the projection half of PCA, gated against a FIXTURE component
    // table whose entries are exact binary doubles (n/32) shared
    // verbatim with the oracle — the broadcast-literal q116 pattern.
    // The Jacobi eigensolve is driver-sized and not SQL-expressible;
    // the composed principalComponents→project path (orthonormality,
    // eigen-residual, known eigensystems) is PcaSpec's job
    "q111_pca_project" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val comps = s.createDataFrame(PcaFixtureBases)
        .toDF("component", "basis", "offset")
      Pca.project(embs, "vec_id", "embedding", comps)
        .select(col("vec_id"),
          round(element_at(col("proj"), 1), 6).as("p0"),
          round(element_at(col("proj"), 2), 6).as("p1"),
          round(element_at(col("proj"), 3), 6).as("p2"),
          round(element_at(col("proj"), 4), 6).as("p3"))
        .orderBy("vec_id")
    }),
    // quality-classifier gradient at w=0 (p ≡ 0.5 exactly): the one
    // value-gated distributed pass every training iteration repeats —
    // per-bucket doc-id-ordered folds of x·(p−y)
    "q112_lr_gradient" -> ((s, dir) => {
      val feats = QualityLr.hashedFeatures(t(s, dir, "documents"),
        "doc_id", "text", col("source") === lit("src0"), dim = 64)
      QualityLr.gradient(feats,
        QualityLr.LrModel(Array.fill(64)(0.0), 0.0))
        .select(col("j"), round(col("grad"), 6).as("grad"))
        .orderBy("j")
    }),
    // full curated-vs-crawl training chain (2 GD iterations, lr=0.5,
    // 64 hashed buckets) + scoring pass — the oracle re-derives the
    // SAME chain in SQL (weights and all), so the gate proves the
    // trained model bit-for-bit, not just the plumbing
    "q113_lr_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = QualityLr.train(docs, "doc_id", "text",
        col("source") === lit("src0"), dim = 64, iters = 2, lr = 0.5)
      QualityLr.scores(docs, "doc_id", "text", m)
        .select(col("doc_id"), round(col("prob"), 6).as("prob"))
        .orderBy("doc_id")
    }),
    // Gopher §A1.1 document rules, published thresholds — per-rule
    // verdicts + conjunction, one scan, zero shuffle
    "q114_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // PQ encoding under deterministic seed codebooks (m=8 subspaces ×
    // 16 entries): the 32×-compressed index ADC scans read
    "q115_pq_codes" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding",
        m = 8, ksub = 16)
      Pq.pqEncode(embs, "vec_id", "embedding", cb)
        .select(col("vec_id"),
          array_join(transform(col("codes"), c => c.cast("string")), ",")
            .as("codes"))
        .orderBy("vec_id")
    }),
    // ADC top-5 for the probe set: per-query m×ksub distance table,
    // candidates scored by table lookups over CODES only
    "q116_pq_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding",
        m = 8, ksub = 16)
      val codes = Pq.pqEncode(embs, "vec_id", "embedding", cb)
      Pq.pqTopK(codes, embs.filter(col("vec_id") < 20), cb,
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc"), 6).as("adc"))
        .orderBy("query_id", "rank")
    }),
    // one per-subspace Lloyd round over the seed codebooks, then
    // re-encode — the composed refinement path (the q67→q74 pattern)
    "q117_pq_refined_codes" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cb0 = Pq.pqSeedCodebooks(embs, "vec_id", "embedding",
        m = 8, ksub = 16)
      val cb1 = Pq.pqRefine(embs, "vec_id", "embedding", cb0, iters = 1)
      Pq.pqEncode(embs, "vec_id", "embedding", cb1)
        .select(col("vec_id"),
          array_join(transform(col("codes"), c => c.cast("string")), ",")
            .as("codes"))
        .orderBy("vec_id")
    }),
    // C4 line-level cleaning (Raffel et al. §2.2) over a deterministic
    // page rendering of the fixture: every 8th word boundary becomes a
    // sentence end + line break (the fixture has no native line
    // structure — the SAME regex renders the page on both engines), and
    // the line-drop token is the fixture word "slow" so the published
    // javascript rule fires on real rows (~23% of 8-word lines). Short
    // docs (< 3 surviving sentences) fail the page gate — real per-doc
    // verdict variation, not a degenerate all-pass
    "q118_c4_clean" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((?:[a-z]+ ){7}[a-z]+)( |$)", "$1.\n")
          .as("page"))
      Scrub.c4Clean(pages, "doc_id", "page", lineDropToken = "slow")
        .withColumnRenamed("text_clean", "page_clean")
        .orderBy("doc_id")
    }),
    // IVFADC with RESIDUAL encoding (Jégou §III-A) — the q44 coarse
    // quantizer (16 low-id centroids, nprobe=2) fronting residual-domain
    // ADC: codes quantize x − centroid(cell), queries build one distance
    // table PER PROBED CELL from their own residual. Same storage as
    // raw-vector PQ, better recall at equal m/ksub — the production
    // composition the paper actually describes
    "q119_ivf_pq_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val (cents, cb, queries) = ivfAdcIndex(embs)
      Pq.ivfPqTopKResidual(embs, queries, cents, cb,
        "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc"), 6).as("adc"))
        .orderBy("query_id", "rank")
    }),

    // REAL image decode through the decodePartitions seam: BMPs
    // synthesized per doc_id (JDK ImageIO writer), decoded by the JDK
    // ImageIO reader — width/height/channels come from decoded pixels,
    // and the oracle predicts them (plus the closed-form BI_RGB byte
    // size) straight from doc_id, so a stub fallback would hash-fail
    "q122_mm_real_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val w = (id % 13 + 1).toInt
        val h = (id % 7 + 1).toInt
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(id, w, h))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.imageDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),

    // SQL-text registry gates (the q55 pattern) for the remaining
    // native kernels: the Spark side is spark.sql(...) through the
    // function registry, hash-gated by the SAME oracles as the Column-
    // API queries (q101/q54/q99)
    "q123_sql_native_winnow" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, fingerprint FROM (
          |  SELECT doc_id,
          |    explode_outer(graft_winnow(concat_ws(' ',
          |      filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |        '\\s+'), x -> x != '')), 5, 4)) AS fingerprint
          |  FROM documents_v WHERE doc_id IS NOT NULL)
          |WHERE fingerprint IS NOT NULL
          |ORDER BY doc_id, fingerprint""".stripMargin)
    }),
    "q124_sql_native_char_ngrams" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      // sort INSIDE, kernel OUTSIDE (the q54 docsSorted shape): a global
      // sort above the kernel would run it twice — once for the range
      // partitioner's sampling pass, once for the sort itself
      s.sql(
        """SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_shingles,
          |  md5(array_join(array_sort(sh), '|')) AS shingle_md5
          |FROM (
          |  SELECT doc_id, graft_char_ngrams(concat_ws(' ',
          |    filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |      '\\s+'), x -> x != '')), 5) AS sh
          |  FROM (SELECT doc_id, text FROM documents_v ORDER BY doc_id)
          |  WHERE lower(text) RLIKE '[a-z0-9]')""".stripMargin)
    }),
    "q125_sql_native_clean_text" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, graft_clean_text(text) AS clean_text,
          |  CAST(length(graft_clean_text(text)) AS BIGINT) AS clean_len
          |FROM documents_v ORDER BY doc_id""".stripMargin)
    }),

    // recall@5 of the IVFADC compressed search against the exact
    // brute-force cosine top-5 — the evaluation loop that tunes nprobe
    // on the production ANN stack (q94's readout over q119's index)
    "q128_ivfadc_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val (cents, cb, queries) = ivfAdcIndex(embs)
      val approx = Pq.ivfPqTopKResidual(embs, queries, cents, cb,
        "vec_id", "embedding", k = 5, nprobe = 2)
      val exact = Knn.bruteForceTopK(embs, queries,
        "vec_id", "embedding", k = 5)
      Knn.recallAtK(approx, exact)
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("recall"), 6).as("recall"))
        .orderBy("query_id")
    }),

    // token-budget selection: the greedy (quality DESC, id) prefix of
    // the corpus that fills a 12k-token budget with whole documents —
    // value-keyed cumulative table + one boundary-group window, never
    // a corpus-wide window (the single-partition cumsum trap)
    "q127_token_budget" -> ((s, dir) => {
      TextAnalysis.tokenBudgetSelect(t(s, dir, "documents"),
        "doc_id", "text", budgetTokens = 12000L)
        .orderBy("doc_id")
    }),

    // WITHIN-document repeated-span removal: any 2-token run already
    // seen earlier in the same document is cut (first occurrence
    // survives) — the removal form of the dup2gram_frac metric Gopher
    // gates on; perfectly row-local, zero shuffles
    "q126_drop_repeated_spans" -> ((s, dir) => {
      graft.operators.Chunking.dropRepeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", width = 2)
        .orderBy("doc_id")
    }),

    // ExactSubstr-grade span removal (Lee et al. 2022): stride-1
    // 8-token shingles at arbitrary boundaries, df > 2 spans removed as
    // merged maximal runs — catches the boundary-straddling duplicates
    // q96's fixed windows miss
    "q120_drop_dup_spans" -> ((s, dir) => {
      graft.operators.Chunking.dropDuplicatedSpans(
        t(s, dir, "documents"), "doc_id", "text", width = 8, maxDf = 2L)
        .orderBy("doc_id")
    }),

    // quality-aware keeper corpus (FineWeb-style): q87's clusters, but
    // each cluster contributes its BEST exemplar, not its lowest id.
    // The quality expr deliberately produces NULLs (n_chars % 97 == 0)
    // so the oracle gates the nulls-sort-last argmax ordering too.
    "q121_best_keepers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
        tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.bestKeepers(docs, "doc_id",
        Dedup.connectedComponents(cands, "id_a", "id_b"),
        expr("nullif(n_chars % 97, 0)"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // SQL-text registry gates for the last four native kernels
    // (the q123–q125 pattern): the Spark side goes parser → analyzer →
    // registry-registered kernel, hash-gated by the same oracle family
    // as the Column-API twin.
    "q129_sql_native_word_ngrams" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      // sort INSIDE, kernel OUTSIDE (the q124 docsSorted shape): a
      // global sort above the kernel would run it twice — once for the
      // range partitioner's sampling pass, once for the sort itself.
      // DELIBERATE FRAGILITY, pinned at Spark 4.1: the output order
      // relies on the subquery's ORDER BY surviving optimization, which
      // Spark preserves today but does not contractually guarantee. A
      // top-level ORDER BY was tried (round 10) and made it WORSE:
      // EliminateSorts keeps the OUTER sort and removes the inner one,
      // putting the kernel below the range shuffle — kernel ×2 at
      // scale. If a version bump unsorts this, the driver comparator
      // (tools/compare.py) row-sorts before hashing so the GATE stays
      // green; re-pin by re-checking the executed plan's Sort position.
      s.sql(
        """SELECT doc_id, CAST(size(ng) AS BIGINT) AS n_ngrams,
          |  md5(array_join(array_sort(ng), '|')) AS ngram_md5
          |FROM (
          |  SELECT doc_id, array_distinct(graft_word_ngrams(
          |    filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |      '\\s+'), x -> x != ''), 3)) AS ng
          |  FROM (SELECT doc_id, text FROM documents_v ORDER BY doc_id)
          |  WHERE lower(text) RLIKE '[a-z0-9]')""".stripMargin)
    }),
    // q31's signature table through SQL text: the tokenize → md5-hash →
    // native k-permutation kernel chain as nested subqueries (Catalyst
    // collapses them exactly like the Column API's .select chain), outer
    // posexplode_outer so no inferred size()>0 filter re-runs the chain
    // in the scan
    "q130_sql_native_minhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, CAST(perm AS BIGINT) AS perm, min_hash FROM (
          |  SELECT doc_id,
          |    posexplode_outer(graft_minhash_sig(hashes, 8)) AS (perm, min_hash)
          |  FROM (
          |    SELECT doc_id, transform(tokens,
          |      t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)
          |        % 2147483629) AS hashes
          |    FROM (
          |      SELECT doc_id, array_distinct(graft_word_ngrams(
          |        filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |          '\\s+'), x -> x != ''), 3)) AS tokens
          |      FROM documents_v
          |      WHERE lower(text) RLIKE '[a-z0-9]')))
          |ORDER BY doc_id, perm""".stripMargin)
    }),
    // q41's bucket table through SQL text: the driver-computed
    // hyperplanes ride as CAST('<Double.toString>' AS DOUBLE) literals
    // (guaranteed round-trip), so the SQL path buckets bit-identically
    // to the typed-literal Column path
    "q131_sql_native_srp" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql(
        s"""SELECT vec_id, CAST(htable AS BIGINT) AS htable, bucket FROM (
           |  SELECT vec_id, 0 AS htable,
           |    graft_srp_bucket(embedding, ${srpPlanesSql(0, 4, 64)}) AS bucket
           |  FROM embeddings_v WHERE embedding IS NOT NULL
           |  UNION ALL
           |  SELECT vec_id, 1 AS htable,
           |    graft_srp_bucket(embedding, ${srpPlanesSql(1, 4, 64)}) AS bucket
           |  FROM embeddings_v WHERE embedding IS NOT NULL)
           |ORDER BY vec_id, htable""".stripMargin)
    }),
    // q40's exact top-k through SQL text: per-VECTOR norms in the CTEs
    // (n norm scans, not 2P), broadcast-hinted small query side, native
    // graft_dot_f32 as the only per-pair work
    "q132_sql_native_dot" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql(
        """WITH q AS (
          |  SELECT vec_id AS query_id, embedding AS qv,
          |    sqrt(graft_dot_f32(embedding, embedding)) AS qn
          |  FROM embeddings_v WHERE vec_id < 20),
          |c AS (
          |  SELECT vec_id AS neighbor_id, embedding AS cv,
          |    sqrt(graft_dot_f32(embedding, embedding)) AS cn
          |  FROM embeddings_v),
          |scored AS (
          |  SELECT /*+ BROADCAST(q) */ query_id, neighbor_id,
          |    graft_dot_f32(qv, cv) / (qn * cn) AS cosine
          |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, cosine,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          |  FROM scored)
          |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
          |FROM ranked WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin)
    }),

    // REAL audio metadata at the codec seam (the q122 pattern): hand-
    // assembled RIFF fixtures whose closed-form header fields the oracle
    // predicts from doc_id — the JDK AudioSystem parser must actually
    // read them (the md5-derived stub could never hash-match)
    "q133_mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "audio", graft.multimodal.Multimodal.syntheticWav(id))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.audioDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("sample_rate"),
          col("height").cast("long").as("bits"),
          col("channels").cast("long").as("channels"),
          col("durationMs").as("duration_ms"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),
    // REAL video-container metadata: hand-assembled ISO-BMFF fixtures
    // (ftyp + moov(mvhd + trak(tkhd))) parsed by the pure-JVM box walk —
    // dimensions/duration/track-count from actual spec offsets
    "q134_mm_mp4_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticMp4(id))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.videoDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("n_tracks"),
          col("durationMs").as("duration_ms"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),

    // the nprobe tuning curve on q128's fixture: micro-averaged recall@5
    // at nprobe ∈ {1,2,4,8}, against BOTH ground truths — exact L2
    // (what ADC approximates) and exact cosine (the repo's q128
    // convention). Splitting the two separates quantization/probe error
    // from metric mismatch. Measured at sf0.01 the two recalls are
    // IDENTICAL (near-uniform norms → coincident rankings) and both
    // FALL as probes widen — with untrained seed codebooks on
    // distance-concentrated uniform vectors, ADC noise swamps the true
    // distance spread, so the wider pool only admits imposters (see the
    // ScaleBench sweep: one Lloyd round lifts every level but the shape
    // persists; a clustered corpus is what inverts it).
    "q135_nprobe_recall_curve" -> ((s, dir) => {
      import s.implicits._
      val embs = t(s, dir, "embeddings")
      val (cents, cb, queries) = ivfAdcIndex(embs)
      // ONE sweep pass: cells probed once at the widest setting,
      // residual-domain ADC computed once per candidate, each width
      // re-ranks its probe_rank<=width subset — N widths never cost N
      // full searches
      val sweep = Pq.ivfPqTopKSweepResidual(embs, queries, cents, cb,
        "vec_id", "embedding", k = 5, nprobes = Seq(1, 2, 4, 8))
        .select(col("nprobe"), col("query_id"), col("neighbor_id"))
      val exactCos = Knn.bruteForceTopK(embs, queries,
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val exactL2 = Knn.bruteForceTopKL2(embs, queries,
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      def hits(exact: DataFrame, as: String) = sweep
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("nprobe")).agg(count(lit(1)).as(as))
      val totals = broadcast(exactCos
        .agg(count(lit(1)).as("n_exact"),
          countDistinct(col("query_id")).as("n_queries")))
      // left join from the width list: a width with zero hits keeps its
      // row (coalesce 0) instead of vanishing from the curve
      Seq(1, 2, 4, 8).toDF("nprobe")
        .join(hits(exactL2, "n_hit_l2"), Seq("nprobe"), "left")
        .join(hits(exactCos, "n_hit_cos"), Seq("nprobe"), "left")
        .crossJoin(totals)
        .select(col("nprobe").cast("long").as("nprobe"),
          col("n_queries"),
          coalesce(col("n_hit_l2"), lit(0L)).as("n_hit_l2"),
          coalesce(col("n_hit_cos"), lit(0L)).as("n_hit_cos"),
          col("n_exact"),
          round(coalesce(col("n_hit_l2"), lit(0L)).cast("double")
            / col("n_exact"), 6).as("recall_l2"),
          round(coalesce(col("n_hit_cos"), lit(0L)).cast("double")
            / col("n_exact"), 6).as("recall_cos"))
        .orderBy("nprobe")
    }),

    // k-NN majority-vote label prediction on the probe set: the vote
    // composes with ANY neighbor frame (here exact top-5; swap in
    // lshTopK/ivfPqTopK unchanged) — label propagation for an
    // embedding-curated corpus
    "q136_knn_label_vote" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val topk = Knn.bruteForceTopK(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      graft.operators.Classify.classifyByVote(topk, embs, "vec_id", "label")
        .select(col("query_id"),
          col("pred_label").cast("long").as("pred_label"),
          col("n_votes"), col("n_neighbors"))
        .orderBy("query_id")
    }),
    // Rocchio nearest-centroid prediction: the |labels|×d model builds
    // in one pass (bit-exact blocked fold, the q110 contract) and
    // broadcasts; per-row work is |labels| dot products
    "q137_centroid_classify" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = graft.operators.Classify.labelCentroids(
        embs, "vec_id", "embedding", "label", bitExact = true)
      graft.operators.Classify.centroidTopLabel(
        embs.filter(col("vec_id") < 20), "vec_id", "embedding",
        cents, "label")
        .select(col("query_id"),
          col("pred_label").cast("long").as("pred_label"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id")
    }),
    // the mixed-type dot kernel through SQL text: q132's query with
    // graft_dot in place of graft_dot_f32 — float×float through the
    // mixed kernel is value-identical to the f32 kernel, so the same
    // oracle gates both registry paths
    "q139_sql_native_dot_mixed" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql(
        """WITH q AS (
          |  SELECT vec_id AS query_id, embedding AS qv,
          |    sqrt(graft_dot(embedding, embedding)) AS qn
          |  FROM embeddings_v WHERE vec_id < 20),
          |c AS (
          |  SELECT vec_id AS neighbor_id, embedding AS cv,
          |    sqrt(graft_dot(embedding, embedding)) AS cn
          |  FROM embeddings_v),
          |scored AS (
          |  SELECT /*+ BROADCAST(q) */ query_id, neighbor_id,
          |    graft_dot(qv, cv) / (qn * cn) AS cosine
          |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, cosine,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
          |  FROM scored)
          |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
          |FROM ranked WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin)
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
    // REAL video FRAME decode (closing the one documented stub): an
    // uncompressed-DIB AVI needs no codec library — the pure-JVM
    // RIFF/AVI walk extracts actual frame rasters, and every frame's
    // exact grayscale sum is re-derived by the oracle from the
    // closed-form pixel formula (id, frame, x, y) → rgb
    "q144_mm_avi_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets)
        .toDF()
        .orderBy("id", "frame_idx")
    }),
    // REAL MJPEG frame decode (the last documented codec stub): each
    // 00dc chunk is a standalone baseline JPEG, decoded by the same
    // ImageIO path as still images. Uniform-gray frames at quality 1.0
    // round-trip bit-exactly (constant block = DC only, Y = gray
    // value), so the oracle predicts every frame's sum as w·h·gray
    "q164_mm_mjpeg_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticMjpegAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets)
        .toDF()
        .orderBy("id", "frame_idx")
    }),

    // the crawl-to-corpus chain END TO END, every stage count and the
    // terminal text digest predicted by the oracle: gzipped WARC →
    // HTTP 200 → declared-charset decode (é only survives the latin-1
    // slice through the declaration) → robots gate (/private slice
    // blocked) → curation cascade with html extraction + template-line
    // dedup + quality gate + exact and LSH near-dedup. Counts are the
    // cascade's own stageCounts; digests are mod-p md5 sums of the
    // stage's exact text, so a drift at ANY layer (framing, charset,
    // extraction, line-df, keeper rule) breaks a row
    "q165_crawl_to_corpus" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, tx) =>
          (id, graft.corpus.Warc.syntheticCrawlWarc(id, tx)) }
        .toDF("id", "content")
      val fetched = graft.corpus.Warc.records(segs).toDF()
        .filter(col("warc_type") === "response" &&
          graft.corpus.Warc.httpStatus(col("payload").cast("string"))
            === 200)
        .select(col("id"), col("target_uri"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .map { case (id, uri, p) =>
          (id, uri, graft.corpus.Warc.decodeHttpBody(p)) }
        .toDF("id", "uri", "html")
      val robotsTxt = "User-agent: *\nDisallow: /private\n"
      val robots = (0 until 7)
        .map(i => (s"site$i.example.com", robotsTxt))
        .toDF("host", "txt")
      val allowed = graft.operators.Robots.gate(
        fetched
          .withColumn("host", graft.operators.Urls.host(col("uri")))
          .withColumn("path",
            regexp_extract(col("uri"), "://[^/]*(/.*)$", 1)),
        graft.operators.Robots.rules(robots, "host", "txt", "graftbot")
          .toDF(),
        "host", "path")
        .filter(col("allowed"))
        .select(col("id"), col("html").as("text"))
      val res = graft.pipeline.CurationPipeline.run(allowed, "id", "text",
        languages = Set.empty, spanDedup = Some((4, 2L)),
        spanMode = graft.pipeline.CurationPipeline.SpanLines,
        html = true, stageCounts = true)
      val P = 1000000007L
      def digestAgg(name: String, df: DataFrame, textC: Column) =
        df.agg(count(lit(1)).cast("long").as("n"),
          sum(pmod(HashFunctions.md5Long(textC), lit(P))).as("digest"))
          .select(lit(name).as("stage"), col("n"), col("digest"))
      val countRows = Seq(
        "03_cascade_input" -> res.counts("input"),
        "04_after_quality" -> res.counts("after_quality"),
        "05_after_line_dedup" -> res.counts("after_span_dedup"),
        "06_after_exact_dedup" -> res.counts("after_exact_dedup"),
        "07_after_near_dedup" -> res.counts("after_near_dedup"))
        .map { case (k, n) => (k, n, None: Option[Long]) }
        .toDF("stage", "n", "digest")
      digestAgg("01_fetched", fetched, col("html"))
        .unionAll(digestAgg("02_allowed", allowed, col("text")))
        .unionAll(countRows)
        .unionAll(digestAgg("08_curated", res.curated, col("text")))
        .orderBy("stage")
    }),

    // TRAINED same-script language ID: two Romance-like languages in
    // one script, sharing words a stopword lexicon would key on
    // ('casa', 'ladra', 'agua' appear in BOTH) — separable only by
    // character-transition statistics. Hashed char-3-gram features
    // through the q113 LR trainer; the oracle replays construction,
    // training, and scoring bit-exactly (the q112/q113 fold contract)
    "q166_langid_trained" -> ((s, dir) => {
      GraftFunctions.register(s)
      val vocabA = Seq("la", "casa", "roja", "el", "perro", "ladra",
        "mucho", "agua")
      val vocabB = Seq("a", "casa", "vermelha", "o", "cachorro", "ladra",
        "muito", "agua")
      val words = (0 until 8).map { i =>
        val idx = pmod(col("doc_id") * 7 + lit(i * 3), lit(8))
          .cast("int") + 1
        when(col("doc_id") % 2 === 0, element_at(typedlit(vocabA), idx))
          .otherwise(element_at(typedlit(vocabB), idx))
      }
      val docs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), concat_ws(" ", words: _*).as("text"))
      val tok = QualityLr.charNgramTokens(3)
      val m = QualityLr.train(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, dim = 64, iters = 2, lr = 0.5,
        tokenize = tok)
      QualityLr.scores(docs, "doc_id", "text", m, tokenize = tok)
        .select(col("doc_id"), round(col("prob"), 6).as("prob"),
          when(col("prob") >= 0.5, lit("es")).otherwise(lit("pt"))
            .as("lang_pred"))
        .orderBy("doc_id")
    }),

    // HTML → text extraction (the step BEFORE every text operator in a
    // web-scrape pipeline): each doc's text is wrapped in a fixed
    // markup shell (script/style subtrees, block tags, all six common
    // entities), extracted by the RE2-compatible regexp_replace chain,
    // and hash-gated — the oracle replays the identical chain on the
    // identical wrapper
    "q148_html_to_text" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>t</title><style>p { color: red; }" +
          "</style></head><body><h1>Doc &amp; title</h1><p>"),
        col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 < 2;" +
          "</script><div>tail &lt;b&gt; &quot;q&#39;s&quot;" +
          " &nbsp;end</div></body></html>"))
      t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"),
          graft.operators.Scrub.htmlToText(html).as("__t"))
        .select(col("doc_id"), md5(col("__t")).as("text_md5"),
          length(col("__t")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // cross-document LINE dedup (CCNet paragraph-hash dedup — the unit
    // web boilerplate repeats at): each doc is wrapped in a four-line
    // shell — corpus-wide header, its own text, a footer shared by its
    // doc_id % 7 group, a unique signature — and every line seen in
    // more than 4 distinct docs vanishes from ALL of them (first copy
    // included), so only the doc's own text and signature survive
    "q149_drop_dup_lines" -> ((s, dir) => {
      val wrapped = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          lit("site navigation home about contact"),
          col("text"),
          concat(lit("footer group "),
            (col("doc_id") % 7).cast("string")),
          concat(lit("doc signature "),
            col("doc_id").cast("string"))).as("text"))
      graft.operators.Chunking.dropDuplicatedLines(
        wrapped, "doc_id", "text", maxDf = 4L)
        .orderBy("doc_id")
    }),

    // URL canonicalization (RefinedWeb's identity layer — the key URL
    // dedup and per-host stats hash): every hazard at once via the
    // messyUrl fixture; the oracle predicts the canonical URL, host,
    // and registrable domain in CLOSED FORM — a normalizer that
    // mis-handles any one hazard (case, www, default port, tracking
    // params, fragment, trailing slash, cc-SLD) can't match
    "q150_url_normalize" -> ((s, dir) => {
      val d = col("doc_id")
      val u = messyUrl(d)
      t(s, dir, "documents").where(d.isNotNull)
        .select(d, graft.operators.Urls.normalize(u).as("url_norm"),
          graft.operators.Urls.host(u).as("host"),
          graft.operators.Urls.registrableDomain(
            graft.operators.Urls.host(u)).as("domain"))
        .orderBy("doc_id")
    }),

    // per-domain document cap (the anti-domination sampler every web
    // corpus runs: one site must not swamp the mix): registrable
    // domain off the canonical host feeds the deterministic
    // hash-ordered groupCap — at sf0.01 example.com holds 4/5 of the
    // corpus and gets cut to 5 docs like every small .co.uk site
    "q151_domain_cap" -> ((s, dir) => {
      val d = col("doc_id")
      val base = t(s, dir, "documents").where(d.isNotNull)
        .select(d, graft.operators.Urls.registrableDomain(
          graft.operators.Urls.host(messyUrl(d))).as("domain"))
      graft.operators.Sampling.groupCap(base, Seq("domain"), "doc_id",
        n = 5)
        .orderBy("domain", "doc_id")
    }),

    // link extraction + canonicalization (the web-graph edge source;
    // htmlToText deliberately DROPS anchors, so links must be pulled
    // first): both messy hrefs per doc come out normalized, with their
    // registrable target domain — all oracle-predicted in closed form
    "q152_link_extract" -> ((s, dir) => {
      val d = col("doc_id")
      t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          posexplode(graft.operators.Urls.extractHrefs(linkHtml(d))))
        .select(d, col("pos").cast("long").as("link_idx"),
          graft.operators.Urls.normalize(col("col")).as("url_norm"),
          graft.operators.Urls.registrableDomain(
            graft.operators.Urls.host(col("col"))).as("dst_domain"))
        .orderBy("doc_id", "link_idx")
    }),

    // host-graph PageRank (the structural quality signal — Common
    // Crawl publishes exactly this host ranking): src domain from each
    // doc's own canonical URL, dst domains from its extracted links,
    // distinct edges, 3 damped power-iteration rounds with dangling
    // redistribution; the oracle unrolls all three rounds over the
    // same closed-form edge list (the q104 convention)
    "q153_host_pagerank" -> ((s, dir) => {
      val d = col("doc_id")
      val src = graft.operators.Urls.registrableDomain(
        graft.operators.Urls.host(messyUrl(d)))
      val edges = t(s, dir, "documents").where(d.isNotNull)
        .select(src.as("src"), explode(
          graft.operators.Urls.extractHrefs(linkHtml(d))).as("__l"))
        .select(col("src"), graft.operators.Urls.registrableDomain(
          graft.operators.Urls.host(col("__l"))).as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst",
        iterations = 3, damping = 0.85)
        .select(col("id").as("domain"), col("pr"))
        .orderBy("domain")
    }),

    // writing-system profile (the script gate a multilingual cascade
    // runs BEFORE stopword langid): closed-form Cyrillic/CJK/Greek
    // tails of varying mass on top of the Latin base text, so the
    // dominant-script argmax flips with document length — the oracle
    // replays the same explicit codepoint-range counts
    "q154_script_profile" -> ((s, dir) => {
      val d = col("doc_id")
      val mixed = concat(col("text"),
        when(d % 4 === 0, repeat(lit(" привет мир"), 12))
          .when(d % 4 === 1, repeat(lit(" 你好世界"), 30))
          .when(d % 4 === 2, lit(" γειά σου"))
          .otherwise(lit("")))
      graft.functions.TextAnalysis.scriptProfile(
        t(s, dir, "documents").where(d.isNotNull)
          .select(d, mixed.as("text")),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // WARC record parse (ISO 28500 — Common Crawl's distribution
    // format, the TRUE first input of a web pipeline): closed-form
    // segments (one warcinfo + id%3+1 responses) walked by the real
    // byte-level Content-Length-framed parser; the oracle re-derives
    // every record's type, URI, length, and payload md5 from the id —
    // a boundary-scanning shortcut could not survive payloads
    // containing boundary-like bytes, and a stub could never hash-match
    "q155_warc_records" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticWarc(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("id", "rec_idx")
    }),

    // the SAME record walk over Common Crawl's real wire format: every
    // record gzip-compressed as its own member (.warc.gz layout),
    // members concatenated per segment. The oracle is q155's — the
    // reader must inflate member-by-member and recover byte-identical
    // framing, or every length and payload md5 mismatches
    "q161_warc_gz_records" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticWarcGz(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("id", "rec_idx")
    }),

    // ingest-time LSH gate, run in batch: src0 arrivals vs the banded
    // index of the landed corpus — the q105 collision rule's COMPLEMENT
    // (a doc survives iff it shares no band with any indexed doc), so
    // the oracle is the anti-join of q105's hit set. Broadcast-probe
    // shape (streamingLshGate): one distinct index build, reused across
    // the per-band hash probes
    "q162_streaming_lsh_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = Dedup.indexBandKeys(docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
      Dedup.streamingLshGate(docs.filter(col("source") === "src0"),
        "text", idx, k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // the SAME gate in the corpus-scale shuffle shape (lshGate): band
    // keys explode into (band, band_key) rows, ONE semi-join probes the
    // index, colliding ids anti-join out — no broadcast anywhere, so it
    // holds when the index outgrows the q162 broadcast path. Same
    // oracle complement
    "q163_lsh_gate_batch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = Dedup.indexBandKeys(docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
      Dedup.lshGate(docs.filter(col("source") === "src0"),
        "doc_id", "text", idx, k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // the FULL crawl ingestion chain, end to end: WARC framing → HTTP
    // response (status line, headers, blank line) → HTML body → text
    // extraction. Every hop is gated at once — the oracle predicts the
    // status, headers, body length, AND the final extracted-text hash
    // in closed form; a shortcut at any layer (boundary-scan WARC,
    // body-leaking header split, markup in the text) breaks the hash
    "q156_warc_http_text" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.corpus.Warc.syntheticHttpWarc(id,
            s"<html><body><div>Nav | Bar</div><p>$text</p>" +
              "</body></html>"))
        }.toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .filter(col("warc_type") === "response")
        .select(col("id"), col("payload").cast("string").as("__p"))
        .select(col("id"),
          graft.corpus.Warc.httpStatus(col("__p")).as("status"),
          graft.corpus.Warc.httpHeader(col("__p"), "Content-Type")
            .as("content_type"),
          graft.corpus.Warc.httpHeader(col("__p"), "X-Doc").as("x_doc"),
          graft.corpus.Warc.httpHeader(col("__p"), "Content-Length")
            .cast("long").as("body_len"),
          md5(graft.operators.Scrub.htmlToText(
            graft.corpus.Warc.httpBody(col("__p")))).as("text_md5"))
        .orderBy("id")
    }),

    // robots.txt gating (RFC 9309): one policy file across all seven
    // fixture hosts — wildcard group with a longest-match Allow
    // carve-out under a Disallow, plus a bot-specific group that
    // REPLACES (not merges with) the wildcard for its agents. Gated
    // for both an unlisted agent (falls to '*') and graftbot; every
    // decision and deciding prefix predicted in closed form
    "q157_robots_gate" -> ((s, dir) => {
      import s.implicits._
      val robotsTxt =
        """# crawl policy
          |User-agent: *
          |Disallow: /private
          |Allow: /private/ok
          |Disallow: /*.tmp$
          |Allow: /p*ok
          |Crawl-delay: 5
          |
          |User-agent: graftbot
          |User-agent: otherbot
          |Disallow: /bot-only
          |Disallow: /*?sid=
          |""".stripMargin
      val robots = (0 until 7)
        .map(h => (s"site$h.example.com", robotsTxt)).toDF("host", "txt")
      val d = col("doc_id")
      val urls = t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          concat(lit("site"), (d % 7).cast("string"),
            lit(".example.com")).as("host"),
          // seven path shapes exercising every §2.2.3 rule form:
          // prefix allow-override (0/1), wildcard query disallow for
          // the bot group only (2), $-anchored wildcard disallow (3),
          // mid-path-star allow (4), $-discrimination non-match (5),
          // bot-only literal prefix (6)
          when(d % 7 === 0, concat(lit("/private/ok/"), d.cast("string")))
            .when(d % 7 === 1, concat(lit("/private/"), d.cast("string")))
            .when(d % 7 === 2, concat(lit("/public/"), d.cast("string"),
              lit("?sid="), (d % 3).cast("string")))
            .when(d % 7 === 3, concat(lit("/tmp/"), d.cast("string"),
              lit(".tmp")))
            .when(d % 7 === 4, concat(lit("/p/"), d.cast("string"),
              lit("/ok")))
            .when(d % 7 === 5, concat(lit("/t/"), d.cast("string"),
              lit(".tmpx")))
            .otherwise(concat(lit("/bot-only/"), d.cast("string")))
            .as("path"))
      val star = graft.operators.Robots.gate(urls,
        graft.operators.Robots.rules(robots, "host", "txt", "crawler")
          .toDF(),
        "host", "path")
        .withColumnRenamed("allowed", "allowed_star")
        .withColumnRenamed("matched_prefix", "prefix_star")
      graft.operators.Robots.gate(star,
        graft.operators.Robots.rules(robots, "host", "txt", "graftbot")
          .toDF(),
        "host", "path")
        .withColumnRenamed("allowed", "allowed_bot")
        .withColumnRenamed("matched_prefix", "prefix_bot")
        .orderBy("doc_id")
    }),

    // sitemap URL discovery: two <loc> entries per doc (one carrying
    // the protocol-mandated &amp; escape and sloppy whitespace),
    // extracted, entity-decoded, and canonicalized — the oracle
    // predicts both final URLs in closed form
    "q158_sitemap_locs" -> ((s, dir) => {
      val d = col("doc_id")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc> HTTP://Site"),
        (d % 7).cast("string"),
        lit(".Example.com/sm/"), d.cast("string"),
        lit(" </loc></url><url><loc>https://site"),
        ((d + 1) % 7).cast("string"),
        lit(".example.com/q?a=1&amp;b="), (d % 5).cast("string"),
        lit("</loc></url></urlset>"))
      t(s, dir, "documents").where(d.isNotNull)
        .select(d, posexplode(
          graft.operators.Urls.extractSitemapLocs(xml)))
        .select(d, col("pos").cast("long").as("loc_idx"),
          graft.operators.Urls.normalize(col("col")).as("url_norm"))
        .orderBy("doc_id", "loc_idx")
    }),

    // charset-aware body decode: the fixture bodies are REAL
    // ISO-8859-1 (accented chars as single high bytes — invalid
    // UTF-8), declared in their Content-Type; the decoder must honor
    // the declaration to round-trip the text, and a UTF-8-assuming
    // cast would hash-mismatch on every row
    "q159_warc_charset" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticLatin1Warc(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("payload")).as[(Long, Array[Byte])]
        .map { case (id, p) =>
          (id, graft.corpus.Warc.decodeHttpBody(p)) }
        .toDF("id", "body")
        .select(col("id"),
          graft.operators.Scrub.htmlToText(col("body")).as("__t"))
        .select(col("id"), col("__t").as("text"),
          length(col("__t")).cast("long").as("n_chars"),
          md5(col("__t")).as("text_md5"))
        .orderBy("id")
    }),

    // page metadata extraction (the curation signals a page carries
    // about ITSELF): entity-decoded title, meta description in BOTH
    // attribute orders (alternating by parity), the page's own
    // canonical URL fed through the normalizer, the html lang claim,
    // and the robots-noindex flag — all closed-form
    "q160_html_meta" -> ((s, dir) => {
      val d = col("doc_id")
      val desc = concat(lit("Desc &quot;"), (d % 9).cast("string"),
        lit("&quot;"))
      val metaDesc = when(d % 2 === 0,
        concat(lit("<meta name=\"description\" content=\""), desc,
          lit("\">")))
        .otherwise(concat(lit("<meta content=\""), desc,
          lit("\" name=\"description\">")))
      val html = concat(
        lit("<!DOCTYPE html><html lang=\"en-US\"><head><title> Doc " +
          "&amp; Title "),
        d.cast("string"),
        lit(" </title>"), metaDesc,
        lit("<link rel=\"canonical\" href=\"HTTP://Site"),
        (d % 7).cast("string"),
        lit(".Example.com/c/"), d.cast("string"), lit("\">"),
        when(d % 5 === 0,
          lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
          .otherwise(lit("")),
        lit("</head><body><p>x</p></body></html>"))
      t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          graft.operators.Scrub.htmlTitle(html).as("title"),
          graft.operators.Scrub.htmlMetaContent(html, "description")
            .as("description"),
          graft.operators.Urls.normalize(
            graft.operators.Scrub.htmlCanonical(html))
            .as("canonical_norm"),
          graft.operators.Scrub.htmlLang(html).as("lang"),
          graft.operators.Scrub.htmlNoindex(html).as("noindex"))
        .orderBy("doc_id")
    }),

    // REAL frame sampling: every 2nd frame decodes, the rest only walk
    // container headers (the bounded-decode-cost shape of a 100 TB
    // video pipeline); frame_idx keeps the original index, and the
    // oracle is q144's restricted to the sampled frames
    "q146_mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets, everyNth = 2)
        .toDF()
        .orderBy("id", "frame_idx")
    }),

    // REAL image resize (the honest version of q73's byte-budget
    // stub): decode → deterministic nearest-neighbor resample →
    // exact grayscale sum of the RESIZED raster, every value
    // re-derived by the oracle from the closed-form pixel formula
    // through the same integer source-pixel mapping
    "q147_mm_real_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.resizeGraySums(assets, outW = 8, outH = 6)
        .toDF()
        .orderBy("id")
    }),

    // REAL audio SAMPLE decode (completing the modality trio: q142
    // image pixels, q144 video frames, here PCM samples): the JDK
    // AudioSystem stream decodes the WAV fixtures' 16-bit frames and
    // every window's exact |sample| sum is re-derived by the oracle
    // from syntheticWav's closed-form sample formula
    "q145_mm_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "audio", graft.multimodal.Multimodal.syntheticWav(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.audioEnergyWindows(assets,
        windowFrames = 16)
        .toDF()
        .orderBy("id", "window_idx")
    }),

    // multi-width LSH banding tuning curve from ONE signature pass and
    // ONE band join (the q135 once-then-subset pattern for the dedup
    // family): per band count, candidate volume and recall of the
    // est-Jaccard ≥ 0.5 pairs — truth enumerated within the WIDEST
    // (most permissive) level, the same widest-probe convention as
    // q135's ground truth. N band settings never cost N shuffles
    "q143_lsh_band_sweep" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val sweep = Dedup.lshCandidatesSweep(sigs, "doc_id", k = 8,
        bandCounts = Seq(1, 2, 4, 8))
      val widest = sweep.filter(col("bands") === 8).select("id_a", "id_b")
      val truth = Dedup.minHashEstimate(widest, sigs, "doc_id", k = 8)
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
      val totals = broadcast(truth.agg(count(lit(1)).as("n_true")))
      // anchor on the level list (the q135 left-join convention): a
      // level with zero candidates keeps its row
      import s.implicits._
      Seq(1, 2, 4, 8).toDF("bands")
        .join(sweep.groupBy("bands").agg(count(lit(1)).as("n_candidates")),
          Seq("bands"), "left")
        .join(sweep.join(truth, Seq("id_a", "id_b"), "left_semi")
          .groupBy("bands").agg(count(lit(1)).as("n_true_found")),
          Seq("bands"), "left")
        .crossJoin(totals)
        .select(col("bands").cast("long").as("bands"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_true_found"), lit(0L)).as("n_true_found"),
          col("n_true"),
          round(coalesce(col("n_true_found"), lit(0L)).cast("double")
            / col("n_true"), 6).as("recall"))
        .orderBy("bands")
    }),

    // REAL pixel-derived features at the embed seam (the q122/q133
    // fixture pattern): BMPs decode through the JDK reader and the
    // 16-bin grayscale histogram comes from the DECODED raster; the
    // oracle re-derives every bin count from the closed-form pixel
    // formula (id, x, y) → rgb, so the hash-derived stub could never
    // match. Output: one row per (id, bin) with the normalized mass
    "q142_mm_real_embed" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.embedPartitions(assets, dim = 16)
        .select(col("id"), posexplode(col("embedding")).as(Seq("bin", "f")))
        .select(col("id"), col("bin").cast("long").as("bin"),
          round(col("f").cast("double"), 6).as("frac"))
        .orderBy("id", "bin")
    }),

    // the same prediction through the LITERAL-model projection (no
    // join, no window — the streaming-legal form); gated by the SAME
    // oracle as q137, proving the two formulations identical
    "q138_centroid_classify_lit" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = graft.operators.Classify.labelCentroids(
        embs, "vec_id", "embedding", "label", bitExact = true)
      graft.operators.Classify.centroidTopLabelLit(
        embs.filter(col("vec_id") < 20), "vec_id", "embedding",
        cents, "label")
        .select(col("query_id"),
          col("pred_label").cast("long").as("pred_label"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id")
    })
  )

  /** One hash table's SRP hyperplanes as a SQL array-of-arrays literal
    * (q131's SQL-text path). String-cast literals, not bare decimals:
    * Spark parses `0.123456` as DECIMAL, while `CAST('<toString>' AS
    * DOUBLE)` is the exact `Double.parseDouble` round-trip of the
    * driver-computed plane component.
    */
  private def srpPlanesSql(table: Int, planes: Int, dim: Int): String =
    graft.operators.Knn.srpPlanes(table, planes, dim)
      .map(_.map(v => s"CAST('$v' AS DOUBLE)").mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** q119/q128's shared IVFADC index fixture (centroid seeds, seed
    * codebooks, probe query set) — ONE definition so the recall readout
    * can never measure a different index than the top-k it evaluates
    * (the oracle side shares `IvfAdcCtes` the same way).
    */
  private def ivfAdcIndex(embs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // codebooks trained on RESIDUALS (Jégou §III-A), seeded from
    // NON-centroid rows: the centroid vectors' own residuals are
    // exactly zero and would collapse all 16 seeds into one point
    val cb = Pq.pqSeedCodebooks(
      Pq.residuals(embs, "vec_id", "embedding", cents)
        .filter(col("vec_id") >= 16),
      "vec_id", "rvec", m = 8, ksub = 16)
    (cents, cb, embs.filter(col("vec_id") < 20))
  }

  /** q106's corpus-independent merge table (see the query comment). */
  private val BpeFixedMerges: Seq[(String, String)] =
    Seq(("a", "n"), ("s", "c"), ("sc", "an"), ("e", "r"))

  /** q104's merge table as learned at sf0.01, fixed as literals for the
    * oracle (the q106 precedent). The oracle does NOT trust these as the
    * answer — it re-derives merge k as the argmax of pair stats over the
    * vocabulary rewritten by merges < k, so DuckDB checks every row of
    * the training loop's output even though the loop itself isn't SQL;
    * the literals only pin the rewrite path, and a wrong literal would
    * desynchronize the replayed argmax from Spark's row and fail the
    * hash gate.
    *
    * SCOPE: the pinned path is sf0.01's — the driver's correctness gate
    * runs there. At other scale factors the corpus statistics (and so
    * the true argmax order) can differ; measured at sf0.1 the rank-7/8
    * merges swap, and the replay correctly reports the divergence. A
    * different gate SF means re-deriving these literals (run q104 and
    * paste), not a code change.
    *
    * The pin hides NO performance issue (round-10 evidence, sf0.1
    * measured via `learnMerges(verbose = true)`): after the one
    * corpus-scale `wordCounts` pass, each merge round is a
    * vocabulary-sized argmax + rewrite — warm ~0.15 s/round at sf0.1,
    * 8 merges ≈ 1.7 s total; ScaleBench records the 10× walls. The
    * single-row argmax collect is BPE's irreducible sequential
    * dependency, not a scale bottleneck.
    */
  private val BpeLearnedMerges: Seq[(String, String)] =
    Seq(("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
      ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"))

  /** q111's fixture component table: 4 pseudo-components over d=64 with
    * EXACT binary-representable entries (n/32, |n| ≤ 16) and offsets
    * (n/16), emitted verbatim into both the Spark frame and the oracle's
    * VALUES literal — so the centered-projection folds are bit-identical
    * in both engines and the hash gate needs no tolerance.
    */
  private val PcaFixtureBases: Seq[(Int, Seq[Double], Double)] =
    (0 until 4).map { k =>
      (k, (0 until 64).map(i => (((i * 7 + k * 13) % 33) - 16) / 32.0),
        (k - 2) / 16.0)
    }

  // ------------------------------------------------------------ oracle SQL

  /** Java's `\s` is `[ \t\n\x0B\f\r]` but RE2's (DuckDB's) `\s` omits
    * vertical tab — spell the Java class out explicitly so the engines
    * can never diverge on control characters.
    */
  private val WsClass = """ \t\n\x0b\f\r"""

  /** DuckDB tokenizer matching TextFunctions.normalizeTokens. */
  private val ToksCte =
    s"""toks AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '')) AS tokens
      |  FROM documents
      |)""".stripMargin

  /** DuckDB non-deduped normalized words (TextFunctions.normalizedWords). */
  private val WordsCte =
    s"""words AS (
      |  SELECT doc_id, source, text, list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '') AS ws
      |  FROM documents
      |)""".stripMargin

  /** DuckDB 60-bit md5 hash matching HashFunctions.md5Long. */
  private def h60(x: String): String =
    s"('0x'||substr(md5($x),1,15))::BIGINT"

  /** DuckDB live-doc words (id present + ≥1 alnum char) matching the
    * filter in TextAnalysis.repetitionStats / Dedup.chunkStats.
    */
  private val LiveWordsCte =
    s"""ws AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '') AS w
      |  FROM documents
      |  WHERE doc_id IS NOT NULL
      |    AND regexp_matches(lower(text), '[a-z0-9]')
      |)""".stripMargin

  /** DuckDB token OCCURRENCE stream (multiset, no doc key) matching the
    * q77/q78 postings projection.
    */
  private val TokStreamCte =
    s"""tokstream AS (
      |  SELECT unnest(list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '')) AS tok
      |  FROM documents
      |  WHERE regexp_matches(lower(text), '[a-z0-9]')
      |)""".stripMargin

  /** DuckDB replica of the [[graft.operators.QualityLr]] training chain:
    * hashed L1-normalized tf features, then per GD iteration — per-doc
    * bucket-ordered score folds, sigmoid, per-bucket doc-ordered
    * gradient folds, `w ← w − lr·g/n` — exactly the accumulation tree
    * the Spark side fixes by value. Emits CTEs `feats`, `nn`, and
    * `p1, g1, gb1, w1, b1, …, p{iters+1}` (scores under the final
    * weights); the caller appends the final SELECT.
    */
  /** The q112/q113 corpus head: curated-vs-crawl label over normalized
    * WORD tokens. `lrChainSql` swaps it out for other feature streams
    * (q166 feeds char n-grams through the same training replay).
    */
  private lazy val LrWordsLwCte =
    s"""lw AS (
       |  SELECT doc_id,
       |    CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y,
       |    list_filter(
       |      string_split_regex(
       |        regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
       |        '[$WsClass]+'),
       |      x -> x != '') AS ws
       |  FROM documents
       |  WHERE doc_id IS NOT NULL
       |    AND regexp_matches(lower(text), '[a-z0-9]'))""".stripMargin

  private def lrChainSql(dim: Int, iters: Int, lr: Double,
                         lwCte: String = LrWordsLwCte): String = {
    val fold = "(u, v) -> u + v"
    def pCte(tIt: Int): String = {
      val (from, term, bias) =
        if (tIt == 1) ("feats f", "f.x * 0.0", "0.0")
        else (s"feats f LEFT JOIN w${tIt - 1} wp ON f.j = wp.j",
          "f.x * coalesce(wp.w, 0.0)", s"(SELECT b FROM b${tIt - 1})")
      s"""p$tIt AS (
         |  SELECT doc_id, y, 1.0 / (1.0 + exp(-(z))) AS p
         |  FROM (SELECT f.doc_id, f.y,
         |          list_reduce(list($term ORDER BY f.j), $fold)
         |            + $bias AS z
         |        FROM $from GROUP BY f.doc_id, f.y))""".stripMargin
    }
    def gradCtes(tIt: Int): String = {
      val wPrev =
        if (tIt == 1) "0.0" else "coalesce(wp.w, 0.0)"
      val wFrom =
        if (tIt == 1) s"g$tIt g CROSS JOIN nn"
        else s"g$tIt g LEFT JOIN w${tIt - 1} wp ON g.j = wp.j CROSS JOIN nn"
      val bPrev = if (tIt == 1) "0.0" else s"(SELECT b FROM b${tIt - 1})"
      s"""g$tIt AS (
         |  SELECT f.j,
         |    list_reduce(list(f.x * r.r ORDER BY f.doc_id), $fold) AS g
         |  FROM feats f JOIN (SELECT doc_id, p - y AS r FROM p$tIt) r
         |    ON f.doc_id = r.doc_id
         |  GROUP BY f.j),
         |gb$tIt AS (
         |  SELECT list_reduce(list(p - y ORDER BY doc_id), $fold) AS g
         |  FROM p$tIt),
         |w$tIt AS (
         |  SELECT g.j, $wPrev - $lr * g.g / n AS w FROM $wFrom),
         |b$tIt AS (
         |  SELECT $bPrev - $lr * g / n AS b FROM gb$tIt CROSS JOIN nn)"""
        .stripMargin
    }
    val iterCtes = (1 to iters).map(tc => pCte(tc) + ",\n" + gradCtes(tc))
    (Seq(
      s"""$lwCte,
         |feats AS (
         |  SELECT doc_id, y, j, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS x
         |  FROM (
         |    SELECT doc_id, y, n,
         |      CAST(${h60("w")} % $dim AS INT) AS j, count(*) AS c
         |    FROM (SELECT doc_id, y, len(ws) AS n, unnest(ws) AS w FROM lw)
         |    GROUP BY 1, 2, 3, 4)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lw)"""
        .stripMargin) ++ iterCtes ++ Seq(pCte(iters + 1))).mkString(",\n")
  }

  /** DuckDB replica of [[graft.operators.Pq]]: seed codebooks (`cb`),
    * and — parameterized by codebook CTE name and suffix — the
    * per-(vector, subspace, entry) squared-L2 table (`dist\$sfx`,
    * position-ordered fold seeded 0.0, Spark's exact tree) and the
    * per-subspace argmin (`best\$sfx`, ties → lowest cid). m=8 × 8-wide
    * subspaces, ksub=16.
    */
  private def pqDistSql(cbName: String, sfx: String): String =
    s"""dist$sfx AS (
       |  SELECT e.vec_id, c.sub, c.cid,
       |    list_reduce(list_prepend(0.0,
       |      [(CAST(e.embedding[c.sub*8+p] AS DOUBLE) - c.cvec[p])
       |        * (CAST(e.embedding[c.sub*8+p] AS DOUBLE) - c.cvec[p])
       |       FOR p IN generate_series(1, 8)]),
       |      (u, v) -> u + v) AS d2
       |  FROM emb e CROSS JOIN $cbName c),
       |best$sfx AS (
       |  SELECT vec_id, sub, cid, d2,
       |    row_number() OVER (PARTITION BY vec_id, sub
       |                       ORDER BY d2, cid) AS rn
       |  FROM dist$sfx)""".stripMargin

  private val PqBaseSql: String =
    s"""emb AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE vec_id IS NOT NULL),
       |seeds AS (SELECT vec_id AS cid, embedding FROM emb
       |          ORDER BY vec_id LIMIT 16),
       |cb AS (
       |  SELECT s.sub, se.cid,
       |    list_transform(se.embedding[(s.sub*8+1):(s.sub*8+8)],
       |      x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM seeds se
       |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) s),
       |${pqDistSql("cb", "")}""".stripMargin

  /** DuckDB MinHash signature CTE (k=8) matching
    * Dedup.minHashSignatures over 3-word shingles — same md5-derived
    * hashes, same permutation constants mod HashFunctions.MinHashPrime.
    * Requires `words` + `sh` (WordsCte, ShinglesCte) upstream.
    */
  private val SigCte =
    s"""shposts AS (SELECT doc_id, unnest(shingles) AS word FROM sh
       |            WHERE len(shingles) > 0),
       |sig AS (
       |  SELECT doc_id, perm,
       |    min((((perm+1)*1299721 % 2147483629)
       |         * (${h60("word")} % 2147483629)
       |         + (perm*7919+104729) % 2147483629) % 2147483629) AS min_hash
       |  FROM shposts
       |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS perm) perms
       |  GROUP BY doc_id, perm)""".stripMargin

  /** DuckDB 32-bit SimHash CTE matching Dedup.simHashes. */
  private val SimHashCte =
    s"""hashed AS (
       |  SELECT doc_id, list_transform(tokens, t -> ${h60("t")}) AS hashes
       |  FROM toks WHERE len(tokens) > 0),
       |votes AS (
       |  SELECT doc_id, b, sum(((h >> b) & 1)*2 - 1) AS v
       |  FROM (SELECT doc_id, unnest(hashes) AS h FROM hashed) eh
       |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bits
       |  GROUP BY doc_id, b),
       |simhash AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
       |      AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** DuckDB left-fold double dot product matching Knn.cosine's
    * `aggregate` (list_reduce starts from the first element, which equals
    * a 0.0-seeded fold for IEEE addition).
    */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"ii -> CAST($a[ii] AS DOUBLE) * CAST($b[ii] AS DOUBLE)), " +
      "(acc, el) -> acc + el)"

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  /** Closed-form replay of the q72/q142 REAL-embedding fixture: BMP
    * pixel (x, y) of doc `id` is `(id·2654435761 + 7x + 131y) mod 2²⁴`
    * (what `Multimodal.syntheticBmp` paints and the JDK decoder reads
    * back losslessly), gray = integer mean of the sRGB channels, 16
    * equal bins, embedding = per-bin pixel mass as FLOAT (the same
    * double-divide-then-float-cast as `histEmbedBytes`). Provides
    * `bfull` (id, npx, bin, cnt) and `emb` (id, embedding).
    */
  private val HistEmbCte =
    """px AS (
      |  SELECT d.doc_id AS id,
      |    CAST((d.doc_id % 13 + 1) * (d.doc_id % 7 + 1) AS BIGINT) AS npx,
      |    (d.doc_id * 2654435761 + x.x * 7 + y.y * 131) % 16777216 AS v
      |  FROM documents d,
      |    unnest(generate_series(0, d.doc_id % 13)) AS x(x),
      |    unnest(generate_series(0, d.doc_id % 7)) AS y(y)
      |  WHERE d.doc_id IS NOT NULL),
      |hist AS (
      |  SELECT id, npx,
      |    (((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3) // 16 AS bin,
      |    count(*) AS cnt
      |  FROM px GROUP BY id, npx, bin),
      |bfull AS (
      |  SELECT ids.id, ids.npx, CAST(b.bin AS BIGINT) AS bin,
      |    coalesce(h.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT id, npx FROM px) ids
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) b
      |  LEFT JOIN hist h ON h.id = ids.id AND h.bin = b.bin),
      |emb AS (
      |  SELECT id, list(CAST(CAST(cnt AS DOUBLE) / npx AS FLOAT)
      |    ORDER BY bin) AS embedding
      |  FROM bfull GROUP BY id)""".stripMargin

  /** DuckDB sign-random-projection bucket matching Knn.lshBucket. */
  private def duckProj(t: Int, p: Int, vec: String): String =
    s"list_reduce(list_transform(generate_series(1, len($vec)), " +
      s"ii -> CAST($vec[ii] AS DOUBLE) * " +
      s"((('0x'||substr(md5('plane:$t:$p:'||(ii-1)),1,15))::BIGINT " +
      s"% 1000000 - 500000)::DOUBLE / 1000000.0)), (acc, el) -> acc + el)"

  private def duckBucket(t: Int, planes: Int, vec: String): String =
    (0 until planes)
      .map(p => s"(CASE WHEN ${duckProj(t, p, vec)} > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")

  /** DuckDB 3-word shingles matching TextFunctions.wordShingles(_, 3). */
  private val ShinglesCte =
    """sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(1, len(ws) - 2)),
      |      i -> array_to_string(ws[i:i+2], ' '))) AS shingles
      |  FROM words WHERE len(ws) > 0
      |)""".stripMargin

  /** Shared by q162 (streamingLshGate broadcast shape) and q163 (lshGate
    * shuffle shape): the q105 banded-collision hit set, anti-joined —
    * a src0 doc survives the ingest gate iff it shares no LSH band with
    * any indexed (non-src0) document.
    */
  private lazy val LshGateOracle =
    s"""WITH $WordsCte,
       |$ShinglesCte,
       |$SigCte,
       |banded AS (
       |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
       |    list(min_hash ORDER BY perm) AS band_key
       |  FROM sig GROUP BY doc_id, band),
       |src AS (SELECT doc_id, source FROM documents),
       |hit AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |  JOIN src sa ON sa.doc_id = a.doc_id
       |  JOIN src sb ON sb.doc_id = b.doc_id
       |  WHERE sa.source = 'src0' AND sb.source <> 'src0')
       |SELECT d.doc_id FROM documents d
       |WHERE d.source = 'src0'
       |  AND d.doc_id NOT IN (SELECT doc_id FROM hit)
       |ORDER BY doc_id""".stripMargin

  /** Shared by q31 (array formulation) and q38 (postings/UDAF
    * formulation) — both must reproduce the identical signature table.
    */
  /** Shared by q70 (columnar stub decode) and q95 (mapPartitions seam):
    * the two Spark paths are value-identical by construction.
    */
  private val MmMetaOracle =
    """WITH h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(hex(encode(text))), 1, 15))::BIGINT AS hv,
      |    encode(text) AS blob
      |  FROM documents)
      |SELECT doc_id AS id, 'image' AS modality,
      |  CAST(octet_length(blob) AS BIGINT) AS n_bytes,
      |  CAST(hv % 512 + 64 AS BIGINT) AS width,
      |  CAST((hv >> 9) % 512 + 64 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(0 AS BIGINT) AS duration_ms
      |FROM h ORDER BY id""".stripMargin

  private val MinHashSigOracle =
    s"""WITH $WordsCte,
       |$ShinglesCte,
       |$SigCte
       |SELECT doc_id, CAST(perm AS BIGINT) AS perm, min_hash
       |FROM sig ORDER BY doc_id, perm""".stripMargin

  /** Shared by q40 (Column API) and q132 (SQL-text registry path). */
  private lazy val KnnBruteOracle =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${duckCos("qv", "cv")} AS cosine
       |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Shared by q41 (Column API) and q131 (SQL-text registry path). */
  private lazy val SrpBucketsOracle =
    s"""WITH b AS (
       |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
       |  FROM embeddings)
       |SELECT vec_id, CAST(htable AS BIGINT) AS htable, bucket
       |FROM b ORDER BY vec_id, htable""".stripMargin

  /** Shared by q33 (DataFrame formulation) and q55 (SQL-text entry path
    * through the registered native kernels) — identical SimHash table.
    */
  /** Shared by q101 (Column API) and q123 (SQL-text registry path). */
  private lazy val WinnowingOracle =
    s"""WITH $WordsCte,
       |canon AS (
       |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words
       |  WHERE doc_id IS NOT NULL),
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(c) >= 5 THEN
       |      list_transform(range(0, length(c) - 5 + 1),
       |        p -> ('0x'||substr(md5(substr(c, p + 1, 5)),1,15))::BIGINT)
       |    ELSE CAST([] AS BIGINT[]) END AS h
       |  FROM canon),
       |fps AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(h) > 0 THEN
       |      list_transform(range(0, greatest(len(h) - 4, 0) + 1),
       |        i -> list_min(h[(i+1):(i+4)]))
       |    ELSE CAST([] AS BIGINT[]) END)) AS fingerprint
       |  FROM grams)
       |SELECT doc_id, fingerprint FROM fps
       |ORDER BY doc_id, fingerprint""".stripMargin

  /** Shared by q99 (Column API) and q125 (SQL-text registry path). */
  private lazy val CleanTextOracle =
    s"""SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |    '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
       |    '[$WsClass]+', ' ', 'g')) AS clean_text,
       |  CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |    '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
       |    '[$WsClass]+', ' ', 'g'))) AS BIGINT) AS clean_len
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Shared by q54 (Column API) and q124 (SQL-text registry path). */
  private lazy val CharShinglesOracle =
    s"""WITH $WordsCte,
       |canon AS (SELECT doc_id, array_to_string(ws, ' ') AS c
       |          FROM words WHERE len(ws) > 0),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(1, length(c) - 4)),
       |    i -> substr(c, i, 5))) AS shl
       |  FROM canon)
       |SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
       |  md5(array_to_string(list_sort(shl), '|')) AS shingle_md5
       |FROM sh ORDER BY doc_id""".stripMargin

  /** The residual front half shared by q119/q128 (via [[IvfAdcCtes]])
    * and q135's sweep: coarse assign → residuals → residual-seeded
    * codebooks → codes, plus the probe-rank-carrying `probedr`.
    * Residual seeds skip vec_id < 16 — the centroid rows' residuals
    * are exactly zero (see `ivfAdcIndex`).
    */
  private lazy val IvfAdcResidualBase =
    s"""cents AS (SELECT vec_id AS ccid, embedding AS ccvec
         |          FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.ccid,
         |    ${duckCos("e.embedding", "c.ccvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, ccid FROM (
         |    SELECT vec_id, ccid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, ccid) AS arn
         |    FROM ascored) x WHERE arn = 1),
         |resid AS (
         |  SELECT e.vec_id, a.ccid,
         |    [CAST(e.embedding[i] AS DOUBLE) - CAST(c.ccvec[i] AS DOUBLE)
         |     FOR i IN generate_series(1, len(e.embedding))] AS rv
         |  FROM embeddings e JOIN assigned a USING (vec_id)
         |  JOIN cents c USING (ccid)),
         |rseeds AS (SELECT vec_id AS cid, rv FROM resid
         |           WHERE vec_id >= 16 ORDER BY vec_id LIMIT 16),
         |cbr AS (
         |  SELECT s.sub, se.cid, se.rv[(s.sub*8+1):(s.sub*8+8)] AS cvec
         |  FROM rseeds se
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) s),
         |rdist AS (
         |  SELECT r.vec_id, c.sub, c.cid,
         |    list_reduce(list_prepend(0.0,
         |      [(r.rv[c.sub*8+p] - c.cvec[p])
         |        * (r.rv[c.sub*8+p] - c.cvec[p])
         |       FOR p IN generate_series(1, 8)]),
         |      (u, v) -> u + v) AS d2
         |  FROM resid r CROSS JOIN cbr c),
         |best AS (
         |  SELECT vec_id, sub, cid,
         |    row_number() OVER (PARTITION BY vec_id, sub
         |                       ORDER BY d2, cid) AS rn
         |  FROM rdist),
         |codes AS (SELECT vec_id, sub, cid FROM best WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |probedr AS (
         |  SELECT query_id, ccid, pr FROM (
         |    SELECT query_id, c.ccid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.ccvec")} DESC, c.ccid) AS pr
         |    FROM q CROSS JOIN cents c) y),
         |qresid AS (
         |  SELECT p.query_id, p.ccid, p.pr,
         |    [CAST(qq.qv[i] AS DOUBLE) - CAST(c.ccvec[i] AS DOUBLE)
         |     FOR i IN generate_series(1, len(qq.qv))] AS qrv
         |  FROM probedr p JOIN q qq USING (query_id)
         |  JOIN cents c USING (ccid)),
         |qdist AS (
         |  SELECT qr.query_id, qr.ccid, qr.pr, c.sub, c.cid,
         |    list_reduce(list_prepend(0.0,
         |      [(qr.qrv[c.sub*8+p] - c.cvec[p])
         |        * (qr.qrv[c.sub*8+p] - c.cvec[p])
         |       FOR p IN generate_series(1, 8)]),
         |      (u, v) -> u + v) AS d2
         |  FROM qresid qr CROSS JOIN cbr c)""".stripMargin

  /** q119's full CTE chain over the RESIDUAL form (Jégou §III-A):
    * [[IvfAdcResidualBase]] + nprobe=2 candidates, per-cell residual
    * ADC, rank — shared with q128's recall readout.
    */
  private lazy val IvfAdcCtes =
    s"""$IvfAdcResidualBase,
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id, a.ccid
         |  FROM probedr p JOIN assigned a ON p.ccid = a.ccid
         |  WHERE p.pr <= 2 AND query_id != a.vec_id),
         |adc AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    list_reduce(list_prepend(0.0, list(qd.d2 ORDER BY co.sub)),
         |      (u, v) -> u + v) AS adc
         |  FROM cand
         |  JOIN codes co ON co.vec_id = cand.neighbor_id
         |  JOIN qdist qd ON qd.query_id = cand.query_id
         |    AND qd.ccid = cand.ccid
         |    AND qd.sub = co.sub AND qd.cid = co.cid
         |  GROUP BY cand.query_id, cand.neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
         |  FROM adc)""".stripMargin

  private val SimHashOracle =
    s"""WITH $ToksCte,
       |$SimHashCte
       |SELECT doc_id, simhash FROM simhash ORDER BY doc_id""".stripMargin

  /** Shared by q34 (all-pairs-within-block verifier) and q65 (pigeonhole
    * banding) — the two formulations must emit the identical pair set,
    * which is exactly what gating both on one oracle proves.
    */
  private val SimHashNearDupOracle =
    s"""WITH $ToksCte,
       |$SimHashCte,
       |sims AS (
       |  SELECT s.doc_id, s.simhash, d.source
       |  FROM simhash s JOIN documents d ON s.doc_id = d.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b
       |  ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
       |ORDER BY id_a, id_b""".stripMargin

  /** Component = min reachable id over the symmetric q32 candidate
    * edges: the recursive closure, grouped to the per-node minimum.
    * Shared by q45 (hash-min propagation) and q69 (large-star/small-star
    * contraction) — both must produce the identical labeling.
    */
  /** Shared by q45/q69 (the labeling itself) and q87 (the keeper corpus
    * derived from it): everything up to the transitive closure `reach`.
    */
  private lazy val ComponentsCtes =
    s"""$WordsCte,
       |$ShinglesCte,
       |$SigCte,
       |banded AS (
       |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
       |    list(min_hash ORDER BY perm) AS band_key
       |  FROM sig GROUP BY doc_id, band),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges2 AS (SELECT id_a AS s, id_b AS t FROM cand
       |           UNION ALL SELECT id_b, id_a FROM cand),
       |reach AS (
       |  SELECT s AS id, s AS comp FROM edges2
       |  UNION
       |  SELECT e.t AS id, r.comp FROM reach r JOIN edges2 e ON e.s = r.id)""".stripMargin

  private lazy val NearDupComponentsOracle =
    s"""WITH RECURSIVE $ComponentsCtes
       |SELECT id AS doc_id, min(comp) AS component
       |FROM reach GROUP BY id
       |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
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
    "q20_jac_doc_sizes" ->
      s"""WITH $ToksCte
         |SELECT doc_id, CAST(len(tokens) AS BIGINT) AS size
         |FROM toks WHERE len(tokens) > 0
         |ORDER BY doc_id""".stripMargin,
    "q21_jac_word_df" ->
      s"""WITH $ToksCte
         |SELECT word, count(*) AS df FROM (
         |  SELECT doc_id, unnest(tokens) AS word FROM toks WHERE len(tokens) > 0) p
         |GROUP BY word
         |ORDER BY word""".stripMargin,
    "q22_jac_pairs" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_jac_sim" ->
      s"""WITH $ToksCte,
         |sizes AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS sz FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS similarity
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q24_jac_topk" ->
      s"""WITH $ToksCte,
         |sizes AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS sz FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |sims AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS similarity
         |  FROM pairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id),
         |directed AS (
         |  SELECT doc_a AS doc_id, doc_b AS neighbor_id, similarity FROM sims
         |  UNION ALL
         |  SELECT doc_b AS doc_id, doc_a AS neighbor_id, similarity FROM sims)
         |SELECT doc_id, neighbor_id, round(similarity, 4) AS similarity, rank
         |FROM (
         |  SELECT doc_id, neighbor_id, similarity,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM directed) ranked
         |WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,
    // tokens are distinct per doc (array_distinct in the tokenizer), so
    // (doc, word) postings are unique and the plain ordered list IS the
    // sorted doc set
    "q68_posting_lists" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0)
         |SELECT word,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids
         |FROM posts GROUP BY word
         |ORDER BY word""".stripMargin,

    // ---- dedup suite oracles
    "q30_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin,
    "q31_minhash_sig" -> MinHashSigOracle,
    "q38_minhash_postings" -> MinHashSigOracle,
    "q32_lsh_candidates" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS n_shared_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,
    // candidates = the q32 banding CTE; estimate = fraction of the k=8
    // perms agreeing (n/8 is a dyadic rational — exact in double)
    "q48_minhash_estimate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT c.id_a, c.id_b,
         |  CAST(sum(CASE WHEN sa.min_hash = sb.min_hash
         |    THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS est_jaccard
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.id_a
         |JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm = sa.perm
         |GROUP BY c.id_a, c.id_b
         |ORDER BY id_a, id_b""".stripMargin,
    // the sweep's semantics stated directly: finest (bands=8,
    // one-perm) matches; a level-B band is matched iff its aligned
    // group of 8/B finest bands fully matched; truth = est ≥ 0.5
    // within the widest level's candidates
    "q143_lsh_band_sweep" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |fb AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.perm AS band
         |  FROM sig a JOIN sig b
         |    ON a.perm = b.perm AND a.min_hash = b.min_hash
         |    AND a.doc_id < b.doc_id),
         |lvls AS (SELECT unnest([1, 2, 4, 8]) AS bands),
         |grp AS (
         |  SELECT l.bands, fb.id_a, fb.id_b,
         |    fb.band // (8 // l.bands) AS g, count(*) AS nb
         |  FROM fb CROSS JOIN lvls l
         |  GROUP BY l.bands, fb.id_a, fb.id_b, g),
         |cand AS (
         |  SELECT bands, id_a, id_b, count(*) AS n_shared_bands
         |  FROM grp WHERE nb = 8 // bands
         |  GROUP BY bands, id_a, id_b),
         |widest AS (SELECT id_a, id_b FROM cand WHERE bands = 8),
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(sum(CASE WHEN sa.min_hash = sb.min_hash
         |      THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS ej
         |  FROM widest c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm = sa.perm
         |  GROUP BY c.id_a, c.id_b),
         |truth AS (SELECT id_a, id_b FROM est WHERE ej >= 0.5),
         |tt AS (SELECT count(*) AS n_true FROM truth),
         |counts AS (
         |  SELECT bands, count(*) AS n_candidates FROM cand GROUP BY bands),
         |found AS (
         |  SELECT bands, count(*) AS n_true_found
         |  FROM cand JOIN truth USING (id_a, id_b) GROUP BY bands)
         |SELECT CAST(l.bands AS BIGINT) AS bands,
         |  coalesce(c.n_candidates, 0) AS n_candidates,
         |  coalesce(f.n_true_found, 0) AS n_true_found,
         |  tt.n_true,
         |  round(CAST(coalesce(f.n_true_found, 0) AS DOUBLE)
         |    / tt.n_true, 6) AS recall
         |FROM lvls l
         |LEFT JOIN counts c ON l.bands = c.bands
         |LEFT JOIN found f ON l.bands = f.bands
         |CROSS JOIN tt
         |ORDER BY bands""".stripMargin,

    "q33_simhash" -> SimHashOracle,
    "q55_sql_native_simhash" -> SimHashOracle,
    "q34_simhash_neardups" -> SimHashNearDupOracle,
    "q65_simhash_neardups_banded" -> SimHashNearDupOracle,
    "q35_ngram_neardups" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.shingles, b.shingles)) AS inter,
         |    len(a.shingles) AS size_a, len(b.shingles) AS size_b
         |  FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT id_a, id_b, inter, size_a, size_b,
         |    CASE WHEN size_a + size_b - inter > 0
         |      THEN CAST(inter AS DOUBLE) / (size_a + size_b - inter)
         |      ELSE 0.0 END AS jaccard
         |  FROM pairs)
         |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(size_a AS BIGINT) AS size_a, CAST(size_b AS BIGINT) AS size_b,
         |  round(jaccard, 4) AS jaccard
         |FROM scored WHERE jaccard >= 0.2
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_hll_registers" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT source, unnest(t.tokens) AS tok
         |          FROM toks t JOIN documents d ON t.doc_id = d.doc_id
         |          WHERE len(t.tokens) > 0),
         |hashed AS (SELECT source, ${h60("tok")} AS h FROM posts),
         |ranked AS (
         |  SELECT source, CAST(h % 64 AS BIGINT) AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 55
         |      ELSE CAST(log2((h // 64) & (-(h // 64))) AS BIGINT) + 1
         |    END AS rho
         |  FROM hashed)
         |SELECT source, bucket, max(rho) AS rho
         |FROM ranked GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,
    // estimate arithmetic mirrors Hll.estimate op-for-op: same alpha
    // expression, same 2^-rho sum, same linear-counting branch (natural
    // log), so the doubles agree and round(6) gates bit-exactly
    "q39_hll_estimate" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT source, unnest(t.tokens) AS tok
         |          FROM toks t JOIN documents d ON t.doc_id = d.doc_id
         |          WHERE len(t.tokens) > 0),
         |hashed AS (SELECT source, ${h60("tok")} AS h FROM posts),
         |ranked AS (
         |  SELECT source, CAST(h % 64 AS BIGINT) AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 55
         |      ELSE CAST(log2((h // 64) & (-(h // 64))) AS BIGINT) + 1
         |    END AS rho
         |  FROM hashed),
         |regs AS (SELECT source, bucket, max(rho) AS rho
         |         FROM ranked GROUP BY source, bucket),
         |agg AS (SELECT source, sum(power(2.0, -rho)) AS s,
         |          count(*) AS nonzero
         |        FROM regs GROUP BY source),
         |est AS (SELECT source, 64.0 - nonzero AS zeros,
         |          (0.7213 / (1.0 + 1.079 / 64) * 64 * 64)
         |            / (s + (64.0 - nonzero)) AS raw
         |        FROM agg)
         |SELECT source,
         |  round(CASE WHEN raw <= 2.5 * 64 AND zeros > 0
         |    THEN 64.0 * ln(64.0 / zeros) ELSE raw END, 6) AS estimate
         |FROM est ORDER BY source""".stripMargin,
    "q36_cosine_neardups" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${duckCos("a.embedding", "b.embedding")} AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM pairs WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    // the q41/q42 bucket CTE in pair form: shared-bucket candidates, then
    // the exact cosine threshold on candidates only (same duckCos fold as
    // the Spark-side native kernel — bit-identical doubles)
    "q66_cosine_neardups_lsh" ->
      s"""WITH bkt AS (
         |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
         |  FROM embeddings),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bkt a JOIN bkt b
         |    ON a.htable = b.htable AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b,
         |    ${duckCos("ea.embedding", "eb.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings ea ON cand.id_a = ea.vec_id
         |  JOIN embeddings eb ON cand.id_b = eb.vec_id)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM scored WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // component = min reachable id: the recursive closure over the
    // symmetric q32 candidate edges, grouped to the per-node minimum.
    // Shared by q45 (hash-min propagation) and q69 (large-star/small-star
    // contraction): both formulations must produce the identical labeling
    "q45_neardup_components" -> NearDupComponentsOracle,
    "q69_neardup_components_star" -> NearDupComponentsOracle,

    // coverage = shared / len(benchmark shingle set); shingles are
    // distinct per doc so the postings count IS the intersection size
    "q46_decontaminate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |corp AS (
         |  SELECT doc_id, unnest(shingles) AS shingle
         |  FROM sh WHERE source != 'src0'),
         |ben AS (SELECT doc_id, shingles FROM sh WHERE source = 'src0'),
         |bp AS (
         |  SELECT doc_id AS bench_id, unnest(shingles) AS shingle FROM ben),
         |bs AS (SELECT doc_id AS bench_id, len(shingles) AS bench_sz
         |       FROM ben),
         |ov AS (
         |  SELECT corp.doc_id, bp.bench_id, count(*) AS shared
         |  FROM corp JOIN bp USING (shingle)
         |  GROUP BY corp.doc_id, bp.bench_id),
         |scored AS (
         |  SELECT doc_id, bench_id, shared, bench_sz,
         |    CAST(shared AS DOUBLE) / bench_sz AS coverage
         |  FROM ov JOIN bs USING (bench_id))
         |SELECT doc_id, bench_id, CAST(shared AS BIGINT) AS shared,
         |  CAST(bench_sz AS BIGINT) AS bench_sz,
         |  round(coverage, 4) AS coverage
         |FROM scored WHERE coverage >= 0.2
         |ORDER BY doc_id, bench_id""".stripMargin,

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

    // ---- ANN oracles
    "q40_knn_brute" -> KnnBruteOracle,
    "q132_sql_native_dot" -> KnnBruteOracle,
    "q139_sql_native_dot_mixed" -> KnnBruteOracle,

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
    "q41_lsh_buckets" -> SrpBucketsOracle,
    "q131_sql_native_srp" -> SrpBucketsOracle,
    "q42_knn_lsh" ->
      s"""WITH bkt AS (
         |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
         |  FROM embeddings),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         |  FROM bkt a JOIN bkt b
         |    ON a.htable = b.htable AND a.bucket = b.bucket
         |    AND a.vec_id != b.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qa.embedding", "qb.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings qa ON cand.query_id = qa.vec_id
         |  JOIN embeddings qb ON cand.neighbor_id = qb.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q43_ivf_assign" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |scored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |ranked AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |  FROM scored)
         |SELECT vec_id, cid FROM ranked WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    "q44_knn_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |probed AS (
         |  SELECT query_id, cid FROM (
         |    SELECT query_id, c.cid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.cvec")} DESC, c.cid) AS pr
         |    FROM q CROSS JOIN cents c) y WHERE pr <= 2),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id
         |  FROM probed p JOIN assigned a ON p.cid = a.cid
         |  WHERE query_id != a.vec_id),
         |rescored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings qe ON cand.query_id = qe.vec_id
         |  JOIN embeddings ne ON cand.neighbor_id = ne.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM rescored)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    // one Lloyd iteration op-for-op: assign with the seeds, per-(cell,
    // component) ORDERED left-fold mean over float→double casts (same
    // fold as Knn.ivfRefine — list_reduce seeds from the first element,
    // which equals a 0.0-seeded fold for IEEE addition), one
    // double→float rounding, empty cells keep their seed, reassign.
    // Fixture dim is 64 (as in q41's bucket oracle)
    "q67_ivf_refined_assign" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |comp AS (
         |  SELECT a.cid, ii AS pos, e.vec_id,
         |    CAST(e.embedding[ii] AS DOUBLE) AS x
         |  FROM assigned a JOIN embeddings e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS ii) idx),
         |means AS (
         |  SELECT cid, pos,
         |    CAST(list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / count(*) AS FLOAT) AS m
         |  FROM comp GROUP BY cid, pos),
         |rcents AS (
         |  SELECT c.cid, coalesce(mv.cvec, c.cvec) AS cvec
         |  FROM cents c LEFT JOIN (
         |    SELECT cid, list(m ORDER BY pos) AS cvec
         |    FROM means GROUP BY cid) mv USING (cid)),
         |rescored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN rcents c)
         |SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM rescored) x WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    // q44's probe/re-rank tail over q67's refined centroids: the seed
    // assign → fold means → refined-cell assign, then each query probes
    // its 2 nearest refined cells and re-ranks exactly
    "q74_knn_ivf_refined" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |comp AS (
         |  SELECT a.cid, ii AS pos, e.vec_id,
         |    CAST(e.embedding[ii] AS DOUBLE) AS x
         |  FROM assigned a JOIN embeddings e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS ii) idx),
         |means AS (
         |  SELECT cid, pos,
         |    CAST(list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / count(*) AS FLOAT) AS m
         |  FROM comp GROUP BY cid, pos),
         |rcents AS (
         |  SELECT c.cid, coalesce(mv.cvec, c.cvec) AS cvec
         |  FROM cents c LEFT JOIN (
         |    SELECT cid, list(m ORDER BY pos) AS cvec
         |    FROM means GROUP BY cid) mv USING (cid)),
         |rascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN rcents c),
         |rassigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM rascored) x WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |probed AS (
         |  SELECT query_id, cid FROM (
         |    SELECT query_id, c.cid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.cvec")} DESC, c.cid) AS pr
         |    FROM q CROSS JOIN rcents c) y WHERE pr <= 2),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id
         |  FROM probed p JOIN rassigned a ON p.cid = a.cid
         |  WHERE query_id != a.vec_id),
         |rescored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings qe ON cand.query_id = qe.vec_id
         |  JOIN embeddings ne ON cand.neighbor_id = ne.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM rescored)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // ---- repetition / chunk-dup / CMS oracles
    // docs shorter than n words have no width-n grams: no agg row for
    // that (doc, n), so the CASE max is NULL — and one-word docs vanish
    // entirely (no grams at any width), both matching the Spark pivot
    "q75_repetition_stats" ->
      s"""WITH $LiveWordsCte,
         |grams AS (
         |  SELECT doc_id, 2 AS n,
         |    unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM ws
         |  UNION ALL
         |  SELECT doc_id, 3 AS n,
         |    unnest(list_transform(range(1, len(w) - 1),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |  FROM ws),
         |cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams
         |        GROUP BY 1, 2, 3),
         |agg AS (SELECT doc_id, n, max(c) AS maxc, sum(c) AS sumc,
         |          count(*) AS distc
         |        FROM cnt GROUP BY 1, 2)
         |SELECT doc_id,
         |  round(max(CASE WHEN n = 2 THEN maxc::DOUBLE / sumc END), 4)
         |    AS top2gram_frac,
         |  round(max(CASE WHEN n = 2 THEN 1.0 - distc::DOUBLE / sumc END), 4)
         |    AS dup2gram_frac,
         |  round(max(CASE WHEN n = 3 THEN maxc::DOUBLE / sumc END), 4)
         |    AS top3gram_frac,
         |  round(max(CASE WHEN n = 3 THEN 1.0 - distc::DOUBLE / sumc END), 4)
         |    AS dup3gram_frac
         |FROM agg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q76_chunk_stats" ->
      s"""WITH $LiveWordsCte,
         |chunks AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(0, CAST(ceil(len(w) / 8.0) AS INT)),
         |    i -> array_to_string(w[i*8+1:i*8+8], ' '))) AS ch
         |  FROM ws WHERE len(w) > 0),
         |gc AS (SELECT ch, count(*) AS n FROM chunks GROUP BY 1)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_chunks,
         |  round(CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS dup_chunk_frac
         |FROM chunks JOIN gc USING (ch)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q77_cms_registers" ->
      s"""WITH $TokStreamCte,
         |cells AS (
         |  SELECT CAST(r AS BIGINT) AS "row",
         |    ${h60("r || ':' || tok")} % 64 AS bucket
         |  FROM tokstream
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs)
         |SELECT "row", bucket, count(*) AS cnt FROM cells
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q78_cms_heavy_hitters" ->
      s"""WITH $TokStreamCte,
         |exactc AS (SELECT tok, count(*) AS exact FROM tokstream
         |           GROUP BY 1),
         |top AS (SELECT tok, exact FROM exactc
         |        ORDER BY exact DESC, tok LIMIT 10),
         |cells AS (
         |  SELECT r, ${h60("r || ':' || tok")} % 64 AS bucket
         |  FROM tokstream
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs),
         |regs AS (SELECT r, bucket, count(*) AS cnt FROM cells
         |         GROUP BY 1, 2),
         |est AS (
         |  SELECT t.tok, min(coalesce(g.cnt, 0)) AS est
         |  FROM top t
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs
         |  LEFT JOIN regs g ON g.r = rs.r
         |    AND g.bucket = ${h60("rs.r || ':' || t.tok")} % 64
         |  GROUP BY 1)
         |SELECT t.tok, t.exact, CAST(e.est AS BIGINT) AS est
         |FROM top t JOIN est e USING (tok) ORDER BY tok""".stripMargin,
    "q79_dedup_keep_first" ->
      s"""SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d
         |JOIN (SELECT min(doc_id) AS doc_id FROM documents
         |      GROUP BY md5(text)) k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q80_bloom_bits" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |bsh AS (SELECT unnest(shingles) AS shingle FROM sh
         |        WHERE source = 'src0')
         |SELECT DISTINCT ${h60("j || ':' || shingle")} % 65536 AS bit
         |FROM bsh CROSS JOIN
         |  (SELECT unnest(generate_series(0, 2)) AS j) js
         |ORDER BY bit""".stripMargin,
    "q81_bloom_decontaminate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |bits AS (
         |  SELECT DISTINCT ${h60("j || ':' || shingle")} % 65536 AS bit
         |  FROM (SELECT unnest(shingles) AS shingle FROM sh
         |        WHERE source = 'src0') bsh
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) js),
         |probes AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
         |           WHERE source != 'src0'),
         |flags AS (
         |  SELECT doc_id,
         |    (${h60("'0:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |    AND (${h60("'1:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |    AND (${h60("'2:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |      AS maybe
         |  FROM probes)
         |SELECT doc_id, count(*) AS n_probes,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_maybe
         |FROM flags GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // window frames: both engines default to RANGE ... CURRENT ROW, and
    // ids are unique within a shard, so the prefix sums agree exactly
    "q82_token_packing" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |    ${h60("'pack:' || doc_id")} % 8 AS shard
         |  FROM ws),
         |a AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |      AS BIGINT) AS cum_tokens
         |  FROM c)
         |SELECT doc_id, shard, n_tokens, cum_tokens,
         |  CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 512)
         |    AS BIGINT) AS pack_id
         |FROM a ORDER BY doc_id""".stripMargin,
    "q83_pack_digests" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |    ${h60("'pack:' || doc_id")} % 8 AS shard
         |  FROM ws),
         |a AS (
         |  SELECT doc_id, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |      AS cum
         |  FROM c),
         |p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT)
         |      AS pack_id
         |  FROM a)
         |SELECT shard, pack_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  md5(string_agg(d.text, ' ' ORDER BY doc_id)) AS pack_md5
         |FROM p JOIN documents d USING (doc_id)
         |GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,

    "q84_blocklist" ->
      s"""WITH $WordsCte
         |SELECT doc_id,
         |  CAST(len(list_filter(ws,
         |    w -> w IN ('slow', 'dup', 'batch'))) AS BIGINT) AS n_blocked,
         |  CAST(len(list_intersect(list_distinct(ws),
         |    ['slow', 'dup', 'batch'])) AS BIGINT) AS n_blocked_distinct,
         |  len(list_filter(ws, w -> w IN ('slow', 'dup', 'batch'))) <= 2
         |    AS keep
         |FROM words WHERE doc_id IS NOT NULL
         |ORDER BY doc_id""".stripMargin,
    // counts via split cardinality: both engines' regex split keeps
    // trailing empty fields, so len(parts) - 1 = number of matches
    "q85_redact" ->
      s"""SELECT event_id, props,
         |  regexp_replace(props, '[0-9]+', '<NUM>', 'g')
         |    AS props_redacted,
         |  CAST(len(string_split_regex(props, '[0-9]+')) - 1 AS BIGINT)
         |    AS n_0
         |FROM events ORDER BY event_id""".stripMargin,
    // cutoffs re-derived from the data with IEEE-exact ops only
    // (sqrt, *, /, floor) in the same order the operator applies them
    "q86_temperature_mix" ->
      s"""WITH c AS (
         |  SELECT source, count(*) AS n FROM documents GROUP BY source),
         |m AS (SELECT max(n) AS max_n FROM c),
         |r AS (
         |  SELECT source,
         |    CAST(floor(LEAST(1.0, 0.5 * sqrt(
         |      CAST(max_n AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000.0)
         |      AS BIGINT) AS cut
         |  FROM c CROSS JOIN m),
         |b AS (
         |  SELECT doc_id, source,
         |    ${h60("'graft:'||doc_id")} % 1000000 AS bkt
         |  FROM documents)
         |SELECT doc_id, source FROM b JOIN r USING (source)
         |WHERE bkt < cut
         |ORDER BY doc_id""".stripMargin,
    // q45's component labeling folded into the corpus: keep every doc
    // outside any cluster plus each cluster's min-id representative
    "q87_neardup_keepers" ->
      s"""WITH RECURSIVE $ComponentsCtes,
         |comp AS (
         |  SELECT id, min(comp) AS component FROM reach GROUP BY id)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
         |WHERE comp.id IS NULL OR comp.component = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // exact interpolated percentile (quantile_cont ≡ Spark `percentile`,
    // the q15 convention); both engines gate on the 6-dp-rounded scalar
    // so a last-ulp interpolation difference cannot flip a boundary row
    "q88_quality_gate" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    round(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 4) AS alpha_ratio
         |  FROM documents),
         |t AS (
         |  SELECT round(CAST(quantile_cont(alpha_ratio, 0.25) AS DOUBLE), 6)
         |    AS threshold
         |  FROM s)
         |SELECT doc_id, alpha_ratio, threshold
         |FROM s CROSS JOIN t
         |WHERE alpha_ratio >= threshold
         |ORDER BY doc_id""".stripMargin,
    // window starts every 16 tokens; the last window reaches the end, and
    // docs shorter than the width yield their single short window
    "q89_token_chunks" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, w,
         |    greatest(1, CAST(ceil((len(w) - 32) / 16.0) AS BIGINT) + 1)
         |      AS nc
         |  FROM ws),
         |ch AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    w[CAST(i*16 + 1 AS BIGINT):CAST(i*16 + 32 AS BIGINT)] AS toks
         |  FROM c, unnest(generate_series(0, nc - 1)) AS u(i))
         |SELECT doc_id, chunk_idx,
         |  CAST(len(toks) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(toks, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // q43's assignment feeding within-cell cosine edges, then the q45
    // recursive closure; keeper = unlabeled or the component minimum
    "q90_semantic_keepers" ->
      s"""WITH RECURSIVE cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |sassigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |comp AS (
         |  SELECT a.cid, ii AS pos, e.vec_id,
         |    CAST(e.embedding[ii] AS DOUBLE) AS x
         |  FROM sassigned a JOIN embeddings e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS ii) idx),
         |means AS (
         |  SELECT cid, pos,
         |    CAST(list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / count(*) AS FLOAT) AS m
         |  FROM comp GROUP BY cid, pos),
         |rcents AS (
         |  SELECT c.cid, coalesce(mv.cvec, c.cvec) AS cvec
         |  FROM cents c LEFT JOIN (
         |    SELECT cid, list(m ORDER BY pos) AS cvec
         |    FROM means GROUP BY cid) mv USING (cid)),
         |rascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN rcents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM rascored) x WHERE rn = 1),
         |cand AS (
         |  SELECT a.vec_id AS s, b.vec_id AS t
         |  FROM assigned a JOIN assigned b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${duckCos("ea.embedding", "eb.embedding")} >= 0.3),
         |edges2 AS (SELECT s, t FROM cand UNION ALL SELECT t, s FROM cand),
         |reach AS (
         |  SELECT s AS id, s AS comp FROM edges2
         |  UNION
         |  SELECT e.t AS id, r.comp FROM reach r JOIN edges2 e ON e.s = r.id),
         |labels AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
         |SELECT emb.vec_id, emb.label
         |FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.id
         |WHERE l.component IS NULL OR l.component = emb.vec_id
         |ORDER BY emb.vec_id""".stripMargin,
    // unigram LM trained on src0, scored on the rest with add-one
    // smoothing; per-doc sum folds the token-ORDERED lp list (seeding
    // from the first element ≡ a 0.0 seed for IEEE addition), mirroring
    // the Spark side's sort_array fold bit for bit
    "q91_unigram_logprob" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) * ln((CAST(coalesce(c, 0) AS DOUBLE) + 1.0)
         |      / (n_occ + n_vocab)) AS lp
         |  FROM occ LEFT JOIN counts USING (word) CROSS JOIN scalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lp ORDER BY word), (a, b) -> a + b) AS sum_lp
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(sum_lp, 6) AS sum_logprob,
         |  round(sum_lp / CAST(n_tokens AS DOUBLE), 6) AS avg_logprob
         |FROM agg ORDER BY doc_id""".stripMargin,
    // range() is exclusive where Spark's sequence() is inclusive (+1);
    // list slices are 1-based inclusive and clamp like Spark's slice
    "q101_winnow" -> WinnowingOracle,
    // the SAME oracle gates the SQL-text path: q123's Spark side is
    // spark.sql(...) through the function registry
    "q123_sql_native_winnow" -> WinnowingOracle,
    // q101's selection chain at k=16/w=8, df-pruned, self-joined
    "q102_winnow_overlap" ->
      s"""WITH $WordsCte,
         |canon AS (
         |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words
         |  WHERE doc_id IS NOT NULL),
         |grams AS (
         |  SELECT doc_id,
         |    CASE WHEN length(c) >= 16 THEN
         |      list_transform(range(0, length(c) - 16 + 1),
         |        p -> ('0x'||substr(md5(substr(c, p + 1, 16)),1,15))::BIGINT)
         |    ELSE CAST([] AS BIGINT[]) END AS h
         |  FROM canon),
         |fps AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(h) > 0 THEN
         |      list_transform(range(0, greatest(len(h) - 8, 0) + 1),
         |        i -> list_min(h[(i+1):(i+8)]))
         |    ELSE CAST([] AS BIGINT[]) END)) AS fingerprint
         |  FROM grams),
         |dfreq AS (
         |  SELECT fingerprint, count(*) AS d FROM fps GROUP BY 1),
         |pruned AS (
         |  SELECT f.doc_id, f.fingerprint
         |  FROM fps f JOIN dfreq USING (fingerprint) WHERE d <= 5)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS shared_fps
         |FROM pruned a JOIN pruned b USING (fingerprint)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,
    // q52's language label + q50's token count, rolled up (the CASE
    // tie-break order matches langPredFromHits exactly)
    "q100_corpus_report" ->
      s"""WITH $WordsCte,
         |perdoc AS (
         |  SELECT source, CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS BIGINT) AS hits_en,
         |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','de','et','un','une','est','que','pour'))) AS BIGINT) AS hits_fr,
         |    CAST(len(list_filter(ws, w -> w IN ('el','la','los','de','y','un','una','es','que','para'))) AS BIGINT) AS hits_es,
         |    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ein','eine','ist','nicht','mit','von'))) AS BIGINT) AS hits_de
         |  FROM words),
         |lab AS (
         |  SELECT source, n_words,
         |    CASE
         |      WHEN hits_de = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'de'
         |      WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'en'
         |      WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'es'
         |      WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'fr'
         |      ELSE 'und' END AS lang_pred
         |  FROM perdoc)
         |SELECT source, lang_pred, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_tokens,
         |  round(avg(n_words), 4) AS avg_tokens
         |FROM lab
         |GROUP BY ROLLUP(source, lang_pred)
         |ORDER BY source NULLS FIRST, lang_pred NULLS FIRST""".stripMargin,
    // the kernel's one pass ≡ NFC → strip non-ws controls → collapse the
    // tokenizer's ws class → trim (space-only trim is exact: after the
    // collapse every whitespace IS a space)
    "q99_clean_text" -> CleanTextOracle,
    "q125_sql_native_clean_text" -> CleanTextOracle,
    // q91's scoring chain + tercile cut points (quantile_cont = Spark's
    // exact interpolated percentile; both sides round the thresholds to
    // 6 dp and compare the RAW ordered-fold scores, so classification
    // is engine-identical)
    "q97_ppl_buckets" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) * ln((CAST(coalesce(c, 0) AS DOUBLE) + 1.0)
         |      / (n_occ + n_vocab)) AS lp
         |  FROM occ LEFT JOIN counts USING (word) CROSS JOIN scalars),
         |sc AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lp ORDER BY word), (a, b) -> a + b)
         |      / CAST(sum(occ) AS DOUBLE) AS avg_lp
         |  FROM contrib GROUP BY doc_id),
         |thr AS (
         |  SELECT
         |    round(CAST(quantile_cont(avg_lp, 0.3333333333333333) AS DOUBLE),
         |      6) AS t_lo,
         |    round(CAST(quantile_cont(avg_lp, 0.6666666666666666) AS DOUBLE),
         |      6) AS t_hi
         |  FROM sc)
         |SELECT doc_id, n_tokens, round(avg_lp, 6) AS avg_logprob,
         |  CASE WHEN avg_lp >= t_hi THEN 'head'
         |       WHEN avg_lp >= t_lo THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sc CROSS JOIN thr ORDER BY doc_id""".stripMargin,
    // two add-one-smoothed unigram models (target src0, raw src1); the
    // per-word term is occ * (ln(target) - ln(raw)) in BOTH engines so
    // the token-sorted fold stays bit-identical
    "q98_dsir_weights" ->
      s"""WITH twords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |tcounts AS (
         |  SELECT word, count(*) AS tc
         |  FROM (SELECT unnest(ws) AS word FROM twords) GROUP BY 1),
         |tscalars AS (SELECT CAST(sum(tc) AS DOUBLE) AS t_occ,
         |               CAST(count(*) AS DOUBLE) AS t_vocab FROM tcounts),
         |rwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src1' AND regexp_matches(lower(text), '[a-z0-9]')),
         |rcounts AS (
         |  SELECT word, count(*) AS rc
         |  FROM (SELECT unnest(ws) AS word FROM rwords) GROUP BY 1),
         |rscalars AS (SELECT CAST(sum(rc) AS DOUBLE) AS r_occ,
         |               CAST(count(*) AS DOUBLE) AS r_vocab FROM rcounts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source NOT IN ('src0', 'src1') AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) *
         |      (ln((CAST(coalesce(tc, 0) AS DOUBLE) + 1.0)
         |         / (t_occ + t_vocab)) -
         |       ln((CAST(coalesce(rc, 0) AS DOUBLE) + 1.0)
         |         / (r_occ + r_vocab))) AS lw
         |  FROM occ LEFT JOIN tcounts USING (word)
         |    LEFT JOIN rcounts USING (word)
         |    CROSS JOIN tscalars CROSS JOIN rscalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lw ORDER BY word), (a, b) -> a + b) AS sum_lw
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(sum_lw, 6) AS log_weight,
         |  round(sum_lw / CAST(n_tokens AS DOUBLE), 6) AS avg_log_weight
         |FROM agg ORDER BY doc_id""".stripMargin,
    // the two-level Spark ranking must equal this one global row_number
    "q92_vocab" ->
      s"""WITH vwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents WHERE regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT token, count(*) AS cnt
         |  FROM (SELECT unnest(ws) AS token FROM vwords) GROUP BY 1
         |  HAVING count(*) >= 2)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |    AS token_id,
         |  token, cnt
         |FROM counts ORDER BY token_id""".stripMargin,
    // q92's vocabulary (one global row_number here — the Spark side's
    // two-level ranking is pinned equal by q92 itself) joined back over
    // position-indexed tokens; OOV coalesces to 0
    "q93_token_ids" ->
      s"""WITH vwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents WHERE regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT token, count(*) AS cnt
         |  FROM (SELECT unnest(ws) AS token FROM vwords) GROUP BY 1
         |  HAVING count(*) >= 2),
         |vocab AS (
         |  SELECT token,
         |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |      AS token_id
         |  FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |posts AS (
         |  SELECT doc_id, i AS pos, ws[i] AS token
         |  FROM dwords, unnest(generate_series(1, len(ws))) AS t(i)),
         |ids AS (
         |  SELECT doc_id,
         |    list(coalesce(token_id, 0) ORDER BY pos) AS ids
         |  FROM posts LEFT JOIN vocab USING (token)
         |  GROUP BY doc_id)
         |SELECT doc_id, array_to_string(ids, ',') AS token_ids,
         |  CAST(len(ids) AS BIGINT) AS n_tokens
         |FROM ids ORDER BY doc_id""".stripMargin,
    // q40's exact top-5 and q42's LSH top-5 (probes only), overlapped:
    // per-probe hit counts and recall. Candidate restriction to the
    // probes BEFORE ranking ≡ the Spark side's post-rank filter (rank
    // partitions by query)
    "q94_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |escored AS (
         |  SELECT query_id, neighbor_id, ${duckCos("qv", "cv")} AS cosine
         |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM escored) x WHERE rank <= 5),
         |bkt AS (
         |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
         |  FROM embeddings),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         |  FROM bkt a JOIN bkt b
         |    ON a.htable = b.htable AND a.bucket = b.bucket
         |    AND a.vec_id != b.vec_id
         |  WHERE a.vec_id < 20),
         |ascored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qa.embedding", "qb.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings qa ON cand.query_id = qa.vec_id
         |  JOIN embeddings qb ON cand.neighbor_id = qb.vec_id),
         |approx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM ascored) y WHERE rank <= 5),
         |ecnt AS (SELECT query_id, count(*) AS n_exact
         |         FROM exact GROUP BY 1),
         |hits AS (
         |  SELECT e.query_id, count(*) AS n_hit
         |  FROM exact e JOIN approx a
         |    USING (query_id, neighbor_id)
         |  GROUP BY 1)
         |SELECT query_id, n_exact,
         |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |  round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_exact, 6) AS recall
         |FROM ecnt LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // ---- text analysis oracles
    "q50_token_counts" ->
      s"""WITH $WordsCte
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(ws,
         |    w -> greatest(1, CAST(ceil(length(w)/4.0) AS BIGINT)))), 0)
         |    AS BIGINT) AS n_subwords
         |FROM words ORDER BY doc_id""".stripMargin,
    "q51_quality" ->
      s"""WITH $WordsCte
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique,
         |  round(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS alpha_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS digit_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9$WsClass]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE)
         |    / greatest(len(ws), 1), 4) AS stopword_ratio,
         |  round(CAST(len(list_distinct(ws)) AS DOUBLE)
         |    / greatest(len(ws), 1), 4) AS unique_ratio
         |FROM words ORDER BY doc_id""".stripMargin,
    "q52_langid" ->
      s"""WITH $WordsCte,
         |hits AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS BIGINT) AS hits_en,
         |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','de','et','un','une','est','que','pour'))) AS BIGINT) AS hits_fr,
         |    CAST(len(list_filter(ws, w -> w IN ('el','la','los','de','y','un','una','es','que','para'))) AS BIGINT) AS hits_es,
         |    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ein','eine','ist','nicht','mit','von'))) AS BIGINT) AS hits_de
         |  FROM words)
         |SELECT doc_id, hits_en, hits_fr, hits_es, hits_de,
         |  CASE
         |    WHEN hits_de = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'de'
         |    WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'en'
         |    WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'es'
         |    WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'fr'
         |    ELSE 'und' END AS lang_pred
         |FROM hits ORDER BY doc_id""".stripMargin,
    "q53_fingerprint" ->
      s"""WITH $WordsCte,
         |canon AS (
         |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words)
         |SELECT doc_id, md5(c) AS canon_md5,
         |  CAST(CASE WHEN length(c) = 0 THEN 0
         |    ELSE list_reduce(
         |      list_transform(string_split(c, ''), ch -> CAST(ascii(ch) AS BIGINT)),
         |      (acc, x) -> (acc * 257 + x) % 2147483647)
         |    END AS BIGINT) AS rolling_fp
         |FROM canon ORDER BY doc_id""".stripMargin,

    "q54_char_shingles" -> CharShinglesOracle,
    "q124_sql_native_char_ngrams" -> CharShinglesOracle,

    // arithmetic mirrors TextAnalysis.termScores op-for-op (same literal
    // structure, e.g. (1.2 + 1) not 2.2, so the IEEE ops line up); avg of
    // BIGINT is exact-sum/count in both engines
    "q58_term_scores" ->
      s"""WITH $WordsCte,
         |live AS (SELECT doc_id, ws FROM words WHERE len(ws) > 0),
         |posts AS (SELECT doc_id, unnest(ws) AS word FROM live),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM posts GROUP BY 1, 2),
         |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM live),
         |scalars AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |              avg(dl) AS avgdl FROM dl)
         |SELECT tf.doc_id, tf.word, tf.tf,
         |  round(tf * (ln((n_docs + 1) / (df + 1)) + 1), 6) AS tfidf,
         |  round(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
         |    * (tf * (1.2 + 1) / (tf + 1.2 * ((1 - 0.75)
         |        + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6) AS bm25
         |FROM tf
         |JOIN dft USING (word)
         |JOIN dl ON tf.doc_id = dl.doc_id
         |CROSS JOIN scalars
         |ORDER BY tf.doc_id, word""".stripMargin,
    "q59_keywords" ->
      s"""WITH $WordsCte,
         |live AS (SELECT doc_id, ws FROM words WHERE len(ws) > 0),
         |posts AS (SELECT doc_id, unnest(ws) AS word FROM live),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM posts GROUP BY 1, 2),
         |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |scalars AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM live),
         |scored AS (
         |  SELECT tf.doc_id, tf.word,
         |    tf * (ln((n_docs + 1) / (df + 1)) + 1) AS tfidf
         |  FROM tf JOIN dft USING (word) CROSS JOIN scalars),
         |ranked AS (
         |  SELECT doc_id, word, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, word) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, word, round(tfidf, 6) AS tfidf, rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,
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

    // hex of a byte-slice is a prefix of the full hex (2 chars/byte), so
    // the sliced blob's md5 gates without blob substring support
    "q73_mm_resize" ->
      """WITH a AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'audio' ELSE 'image' END AS modality,
        |    encode(text) AS blob
        |  FROM documents),
        |b AS (
        |  SELECT id, CASE WHEN modality = 'image' THEN 3 ELSE 1 END AS c,
        |    octet_length(blob) AS nb, hex(blob) AS hx
        |  FROM a),
        |r AS (SELECT id, c, least(c * 48, nb) AS n_out, hx FROM b)
        |SELECT id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
        |  CAST(c AS BIGINT) AS channels, CAST(n_out AS BIGINT) AS n_bytes_out,
        |  md5(substr(hx, 1, CAST(2 * n_out AS INT))) AS out_md5
        |FROM r ORDER BY id""".stripMargin,

    // REAL embeddings + IVF (round 10): the grayscale-histogram CTE
    // re-derives every embedding from the closed-form pixel formula,
    // then the q44 IVF shape replays the whole search
    "q72_mm_embed_knn" ->
      s"""WITH $HistEmbCte,
         |cents AS (SELECT id AS cid, embedding AS cvec FROM emb WHERE id < 8),
         |ascored AS (
         |  SELECT e.id, c.cid, ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |q AS (SELECT id AS query_id, embedding AS qv FROM emb WHERE id < 10),
         |probed AS (
         |  SELECT query_id, cid FROM (
         |    SELECT query_id, c.cid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.cvec")} DESC, c.cid) AS pr
         |    FROM q CROSS JOIN cents c) y WHERE pr <= 2),
         |cand AS (
         |  SELECT query_id, a.id AS neighbor_id
         |  FROM probed p JOIN assigned a ON p.cid = a.cid
         |  WHERE query_id != a.id),
         |rescored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand JOIN emb qe ON cand.query_id = qe.id
         |  JOIN emb ne ON cand.neighbor_id = ne.id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM rescored)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // ---- multimodal metadata oracle (stub decode is deterministic md5 math)
    "q71_mm_frames" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(hex(encode(text))), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE doc_id % 3 = 0),
        |v AS (
        |  SELECT doc_id AS id, (hv >> 18) % 60000 AS duration_ms
        |  FROM h WHERE (hv >> 18) % 60000 > 0)
        |SELECT id, CAST(duration_ms AS BIGINT) AS duration_ms,
        |  CAST(unnest(generate_series(0, duration_ms - 1, 5000)) AS BIGINT)
        |    AS frame_ts_ms
        |FROM v ORDER BY id, frame_ts_ms""".stripMargin,
    // 8-token non-overlapping windows, df over DISTINCT docs, windows
    // with df > 2 cut, survivors rejoined in chunk order
    "q96_drop_dup_chunks" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, w,
         |    greatest(1, CAST(ceil((len(w) - 8) / 8.0) AS BIGINT) + 1) AS nc
         |  FROM ws),
         |ch AS (
         |  SELECT doc_id, i AS idx,
         |    w[CAST(i*8 + 1 AS BIGINT):CAST(i*8 + 8 AS BIGINT)] AS toks,
         |    md5(array_to_string(
         |      w[CAST(i*8 + 1 AS BIGINT):CAST(i*8 + 8 AS BIGINT)], ' ')) AS h
         |  FROM c, unnest(generate_series(0, nc - 1)) AS u(i)),
         |hot AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df FROM ch GROUP BY h)
         |  WHERE df > 2)
         |SELECT doc_id,
         |  coalesce(array_to_string(flatten(
         |    list(toks ORDER BY idx) FILTER (h NOT IN (SELECT h FROM hot))),
         |    ' '), '') AS clean_text,
         |  CAST(count(*) FILTER (h NOT IN (SELECT h FROM hot)) AS BIGINT)
         |    AS n_kept_chunks,
         |  CAST(count(*) FILTER (h IN (SELECT h FROM hot)) AS BIGINT)
         |    AS n_dropped_chunks
         |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q70_mm_meta" -> MmMetaOracle,
    // same oracle: the mapPartitions seam must agree with the columnar
    // stub path row for row
    "q95_mm_decode_seam" -> MmMetaOracle,

    // word-frequency-weighted adjacent char pairs; within-word
    // multiplicity preserved (one row per position i)
    "q103_bpe_pairs" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |pr AS (
         |  SELECT substring(word, CAST(i AS INT), 1) AS left_sym,
         |    substring(word, CAST(i AS INT) + 1, 1) AS right_sym, freq
         |  FROM wf, unnest(generate_series(1, len(word) - 1)) AS t(i))
         |SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
         |FROM pr GROUP BY left_sym, right_sym
         |ORDER BY pair_count DESC, left_sym, right_sym""".stripMargin,

    // replay of the BPE training loop: step k rewrites the character
    // vocabulary by the k-1 PRIOR merges (literals, nested rank-order
    // folds — the q106 machinery) and re-derives merge k as the argmax
    // of the resulting pair stats, tie order (count DESC, l, r) — every
    // output row of Spark's driver loop is value-checked even though
    // the loop itself isn't SQL-expressible
    "q104_bpe_merges" -> {
      val steps = BpeLearnedMerges.indices.map { i =>
        val k = i + 1
        s"""step$k AS (
           |  SELECT $k AS merge_rank, left_sym, right_sym, pair_count FROM (
           |    SELECT p.l AS left_sym, p.r AS right_sym,
           |      CAST(sum(freq) AS BIGINT) AS pair_count
           |    FROM (
           |      SELECT unnest([{'l': s2[j], 'r': s2[j+1]}
           |          FOR j IN generate_series(1, len(s2) - 1)]) AS p, freq
           |      FROM (SELECT ${duckBpeFolds(BpeLearnedMerges.take(i))} AS s2, freq
           |            FROM chars))
           |    GROUP BY 1, 2
           |    ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1))""".stripMargin
      }
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |${steps.mkString(",\n")}
         |${BpeLearnedMerges.indices
            .map(i => s"SELECT * FROM step${i + 1}")
            .mkString("\nUNION ALL\n")}
         |ORDER BY merge_rank""".stripMargin
    },
    // q32's signature/banding CTEs, sides split by source: batch bands
    // (src0) join index bands (everything else)
    "q105_incremental_lsh" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band),
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT a.doc_id AS batch_id, b.doc_id AS index_id,
         |  count(*) AS n_shared_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_key = b.band_key
         |JOIN src sa ON sa.doc_id = a.doc_id
         |JOIN src sb ON sb.doc_id = b.doc_id
         |WHERE sa.source = 'src0' AND sb.source <> 'src0'
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY batch_id, index_id""".stripMargin,

    // the merge folds nest in rank order (innermost = merge 1), each
    // replicating applyMerge's left-to-right non-overlapping rewrite:
    // list_reduce seeds from the first element where Spark folds from
    // an empty accumulator — equivalent, since the empty-acc iteration
    // always lands in the append branch
    "q106_bpe_encode" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |enc AS (SELECT word, freq, ${duckBpeFolds(BpeFixedMerges)} AS pieces
         |        FROM chars)
         |SELECT word, freq, array_to_string(pieces, ' ') AS pieces,
         |  CAST(len(pieces) AS INT) AS n_pieces
         |FROM enc ORDER BY word""".stripMargin,

    // q91's oracle one ngram order up: seen bigrams score the
    // conditional MLE, unseen back off to 0.4x the smoothed unigram;
    // parenthesization mirrors the Spark expression exactly (ratio
    // first, then the backoff scale) for bit parity
    "q107_bigram_logprob" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |mbi AS (
         |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
         |  FROM mwords, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
         |big AS (SELECT w1, w2, count(*) AS c2 FROM mbi GROUP BY 1, 2),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |dbi AS (
         |  SELECT doc_id, ws[CAST(i AS INT)] AS w1,
         |    ws[CAST(i AS INT) + 1] AS w2
         |  FROM dwords, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
         |occ AS (
         |  SELECT doc_id, w1, w2, count(*) AS oc FROM dbi GROUP BY 1, 2, 3),
         |contrib AS (
         |  SELECT doc_id, occ.w1, occ.w2, oc,
         |    CAST(oc AS DOUBLE) * (CASE WHEN b.c2 IS NOT NULL
         |      THEN ln(CAST(b.c2 AS DOUBLE) / CAST(cp.c AS DOUBLE))
         |      ELSE ln(0.4 * ((CAST(coalesce(cc.c, 0) AS DOUBLE) + 1.0)
         |        / (n_occ + n_vocab))) END) AS lp
         |  FROM occ LEFT JOIN big b ON b.w1 = occ.w1 AND b.w2 = occ.w2
         |  LEFT JOIN counts cp ON cp.word = occ.w1
         |  LEFT JOIN counts cc ON cc.word = occ.w2
         |  CROSS JOIN scalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(oc) AS BIGINT) AS n_bigrams,
         |    list_reduce(list(lp ORDER BY w1, w2), (a, b) -> a + b) AS sum_lp
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, round(sum_lp, 6) AS sum_logprob,
         |  round(sum_lp / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob
         |FROM agg ORDER BY doc_id""".stripMargin,

    // bottom-64 KMV per source over distinct 60-bit token hashes; the
    // pair stage reads sketches only. list_sort(list_distinct(concat))
    // == Spark sort_array(array_union) — both dedupe then sort
    "q108_kmv_overlap" ->
      s"""WITH $WordsCte,
         |toks AS (
         |  SELECT DISTINCT source, ${h60("word")} AS h
         |  FROM (SELECT source, unnest(ws) AS word FROM words)),
         |sk AS (
         |  SELECT source, (list(h ORDER BY h))[1:64] AS sketch
         |  FROM toks GROUP BY source)
         |SELECT a.source AS group_a, b.source AS group_b,
         |  CAST(len(u) AS INT) AS n_union_sample,
         |  CAST(len(list_intersect(list_intersect(u, a.sketch), b.sketch))
         |    AS INT) AS n_shared,
         |  round(CAST(len(list_intersect(list_intersect(u, a.sketch),
         |      b.sketch)) AS DOUBLE) / CAST(len(u) AS DOUBLE), 6)
         |    AS est_jaccard
         |FROM sk a JOIN sk b ON a.source < b.source,
         |  LATERAL (SELECT
         |    (list_sort(list_distinct(list_concat(a.sketch, b.sketch))))[1:64]
         |      AS u) AS lu
         |ORDER BY group_a, group_b""".stripMargin,

    // q106's encoded vocabulary joined back to the corpus occurrence
    // stream, summed per document
    "q109_bpe_token_counts" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |enc AS (SELECT word, ${duckBpeFolds(BpeFixedMerges)} AS pieces
         |        FROM chars),
         |occ AS (
         |  SELECT doc_id, unnest(ws) AS word FROM words
         |  WHERE doc_id IS NOT NULL)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(pieces)) AS BIGINT) AS n_bpe_tokens
         |FROM occ JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // moments and means replay the blocked fold tree: per (vec_id % 32)
    // block in vec_id order, then across blocks in block order — the
    // exact accumulation tree blockedCovariance fixes by value, then
    // cov = E[xy] − E[x]E[y] with the exact Spark parenthesization.
    // `+ 0` after round: DuckDB's round keeps IEEE −0.0 where Spark's
    // (BigDecimal) returns +0.0, and the driver sorts rows by str(value)
    "q110_pca_covariance" ->
      s"""WITH x AS (
         |  SELECT vec_id, vec_id % 32 AS blk, CAST(i AS INT) - 1 AS i,
         |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xi
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
         |  WHERE vec_id IS NOT NULL),
         |p AS (
         |  SELECT a.vec_id, a.blk, a.i AS i, b.i AS j, a.xi * b.xi AS prod
         |  FROM x a JOIN x b USING (vec_id)),
         |mo1 AS (
         |  SELECT blk, i, j,
         |    list_reduce(list(prod ORDER BY vec_id), (u, w) -> u + w) AS s
         |  FROM p GROUP BY blk, i, j),
         |mo AS (
         |  SELECT i, j,
         |    list_reduce(list(s ORDER BY blk), (u, w) -> u + w) AS s
         |  FROM mo1 GROUP BY i, j),
         |mu1 AS (
         |  SELECT blk, i,
         |    list_reduce(list(xi ORDER BY vec_id), (u, w) -> u + w) AS s
         |  FROM x GROUP BY blk, i),
         |mu AS (
         |  SELECT i,
         |    list_reduce(list(s ORDER BY blk), (u, w) -> u + w) AS s
         |  FROM mu1 GROUP BY i),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
         |       WHERE vec_id IS NOT NULL)
         |SELECT mo.i AS i, mo.j AS j,
         |  round(mo.s / n - (ma.s / n) * (mb.s / n), 6) + 0 AS cov
         |FROM mo JOIN mu ma ON ma.i = mo.i JOIN mu mb ON mb.i = mo.j
         |CROSS JOIN nn
         |ORDER BY i, j""".stripMargin,

    // Pca.project against the shared fixture basis: per (vector,
    // component) the centered coordinate is a left fold over the 64
    // exact products (list_prepend 0.0 + list_reduce ≡ Spark's
    // `aggregate` seed), so both engines compute bit-identical doubles
    // before the 6-dp round; `+ 0` normalizes −0.0 (the q112 note)
    "q111_pca_project" -> {
      val rows = PcaFixtureBases.map { case (k, basis, off) =>
        s"($k, [${basis.mkString(", ")}]::DOUBLE[], $off)"
      }
      s"""WITH comps AS (
         |  SELECT * FROM (VALUES
         |    ${rows.mkString(",\n    ")})
         |    AS t(component, basis, oset)),
         |proj AS (
         |  SELECT vec_id, component,
         |    list_reduce(list_prepend(0.0,
         |      [CAST(embedding[i] AS DOUBLE) * basis[i]
         |        FOR i IN generate_series(1, 64)]),
         |      (a, b) -> a + b) - oset AS coord
         |  FROM embeddings CROSS JOIN comps
         |  WHERE vec_id IS NOT NULL),
         |agg AS (
         |  SELECT vec_id, list(coord ORDER BY component) AS cs
         |  FROM proj GROUP BY vec_id)
         |SELECT vec_id,
         |  round(cs[1], 6) + 0 AS p0, round(cs[2], 6) + 0 AS p1,
         |  round(cs[3], 6) + 0 AS p2, round(cs[4], 6) + 0 AS p3
         |FROM agg ORDER BY vec_id""".stripMargin
    },

    // the training chain's first gradient pass (w=0 → p ≡ 0.5); `+ 0`
    // because gradients can round to −0.0 in DuckDB (+0.0 in Spark)
    "q112_lr_gradient" ->
      s"""WITH ${lrChainSql(64, 1, 0.5)}
         |SELECT j, round(g, 6) + 0 AS grad FROM g1 ORDER BY j"""
        .stripMargin,

    // the full 2-iteration training chain re-derived in SQL — the
    // trained weights must agree bit-for-bit for these to hash-match
    "q113_lr_scores" ->
      s"""WITH ${lrChainSql(64, 2, 0.5)}
         |SELECT doc_id, round(p, 6) AS prob FROM p3 ORDER BY doc_id"""
        .stripMargin,

    // Gopher rule replica: same metrics, same double divisions, same
    // inclusive thresholds; list_sum of an empty list is NULL in DuckDB
    // (Spark's fold seeds 0) — coalesce restores the match
    "q114_gopher_rules" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    list_filter(
         |      string_split_regex(
         |        regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |        '[$WsClass]+'),
         |      x -> x != '') AS ws,
         |    list_filter(
         |      list_transform(string_split_regex(text, '\\n'),
         |        l -> trim(l)),
         |      l -> l != '') AS ls
         |  FROM documents WHERE doc_id IS NOT NULL),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS nw,
         |    CAST(greatest(len(ws), 1) AS DOUBLE) AS nwd,
         |    CAST(greatest(len(ls), 1) AS DOUBLE) AS nl,
         |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))),
         |      0) AS DOUBLE) AS sumlen,
         |    CAST(length(text) - length(replace(text, '#', ''))
         |      AS BIGINT) AS hashes,
         |    CAST(length(text) - length(replace(text, '...', ''))
         |      AS BIGINT) AS ell,
         |    CAST(len(list_filter(ls,
         |      l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS DOUBLE)
         |      AS bullets,
         |    CAST(len(list_filter(ls,
         |      l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
         |      AS ell_lines,
         |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
         |      AS DOUBLE) AS alpha,
         |    ${TextAnalysis.GopherStopwords.map(sw =>
             s"(CASE WHEN list_contains(ws, '$sw') THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS stophits
         |  FROM d),
         |r AS (
         |  SELECT doc_id, nw AS n_words,
         |    nw BETWEEN 50 AND 100000 AS r_word_count,
         |    (sumlen / nwd >= 3.0 AND sumlen / nwd <= 10.0)
         |      AS r_mean_word_len,
         |    (hashes + ell / 3) / nwd <= 0.1 AS r_symbol_ratio,
         |    bullets / nl <= 0.9 AS r_bullet_lines,
         |    ell_lines / nl <= 0.3 AS r_ellipsis_lines,
         |    alpha / nwd >= 0.8 AS r_alpha_words,
         |    stophits >= 2 AS r_stopwords
         |  FROM m)
         |SELECT doc_id, n_words, r_word_count, r_mean_word_len,
         |  r_symbol_ratio, r_bullet_lines, r_ellipsis_lines,
         |  r_alpha_words, r_stopwords,
         |  (r_word_count AND r_mean_word_len AND r_symbol_ratio
         |    AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
         |    AND r_stopwords) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "q115_pq_codes" ->
      s"""WITH $PqBaseSql
         |SELECT vec_id,
         |  array_to_string(list(CAST(cid AS VARCHAR) ORDER BY sub), ',')
         |    AS codes
         |FROM best WHERE rn = 1
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // ADC: the probe's distance-table rows ARE its dist rows (probes
    // are corpus members); candidate score folds in subspace order
    "q116_pq_topk" ->
      s"""WITH $PqBaseSql,
         |adc AS (
         |  SELECT d.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(0.0, list(d.d2 ORDER BY d.sub)),
         |      (u, v) -> u + v) AS adc
         |  FROM best b
         |  JOIN dist d ON d.sub = b.sub AND d.cid = b.cid
         |    AND d.vec_id < 20
         |  WHERE b.rn = 1
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc, neighbor_id) AS rank
         |  FROM adc)
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // one Lloyd round: id-ordered mean folds per (sub, entry, pos),
    // empty entries keep their seed vector, then re-encode under cb1
    "q117_pq_refined_codes" ->
      s"""WITH $PqBaseSql,
         |comp AS (
         |  SELECT b.vec_id, b.sub, b.cid AS code, t.p AS pos,
         |    CAST(e.embedding[b.sub*8+t.p] AS DOUBLE) AS x
         |  FROM best b JOIN emb e ON e.vec_id = b.vec_id,
         |    unnest(generate_series(1, 8)) t(p)
         |  WHERE b.rn = 1),
         |means AS (
         |  SELECT sub, code AS cid, pos,
         |    list_reduce(list_prepend(0.0, list(x ORDER BY vec_id)),
         |      (u, v) -> u + v) / count(*) AS mval
         |  FROM comp GROUP BY sub, code, pos),
         |cb1 AS (
         |  SELECT cb.sub, cb.cid,
         |    coalesce(mv.mvec, cb.cvec) AS cvec
         |  FROM cb LEFT JOIN (
         |    SELECT sub, cid, list(mval ORDER BY pos) AS mvec
         |    FROM means GROUP BY sub, cid) mv
         |    ON mv.sub = cb.sub AND mv.cid = cb.cid),
         |${pqDistSql("cb1", "1")}
         |SELECT vec_id,
         |  array_to_string(list(CAST(cid AS VARCHAR) ORDER BY sub), ',')
         |    AS codes
         |FROM best1 WHERE rn = 1
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // the same page rendering (8-word sentences, one per line), then the
    // C4 rules: keep lines ending in terminal punctuation with >= 5
    // words and no drop token; page verdicts for phrase/brace/sentence
    // minimum. Sentence count = terminal marks in the SURVIVING lines
    "q118_c4_clean" ->
      s"""WITH pages AS (
         |  SELECT doc_id,
         |    regexp_replace(text, '((?:[a-z]+ ){7}[a-z]+)( |$$)',
         |      '\\1.' || chr(10), 'g') AS page
         |  FROM documents),
         |lns AS (
         |  SELECT doc_id, page, string_split(page, chr(10)) AS ls
         |  FROM pages),
         |kept AS (
         |  SELECT doc_id, page, ls,
         |    list_filter(ls, l ->
         |      regexp_matches(rtrim(l), '[.!?"'']$$')
         |      AND len(list_filter(
         |        string_split_regex(trim(l), '[ \t]+'), x -> x != ''))
         |        >= 5
         |      AND NOT contains(lower(l), 'slow')) AS ks
         |  FROM lns),
         |stats AS (
         |  -- array_to_string(empty) is NULL in DuckDB, '' in Spark
         |  SELECT doc_id,
         |    coalesce(array_to_string(ks, chr(10)), '') AS page_clean,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(ks) AS BIGINT) AS n_kept_lines,
         |    contains(lower(page), 'lorem ipsum') AS has_page_phrase,
         |    (contains(page, '{') OR contains(page, '}')) AS has_brace,
         |    CAST(length(regexp_replace(
         |      coalesce(array_to_string(ks, chr(10)), ''),
         |      '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences
         |  FROM kept)
         |SELECT doc_id, page_clean, n_lines, n_kept_lines,
         |  has_page_phrase, has_brace, n_sentences,
         |  (NOT has_page_phrase AND NOT has_brace AND n_sentences >= 3)
         |    AS keep
         |FROM stats ORDER BY doc_id""".stripMargin,

    // IVFADC: the q44 probe/assign CTEs bound the candidates, the q116
    // PQ machinery scores them — per-candidate ADC folds in subspace
    // order (the Spark side's bit-reproducible tree)
    "q119_ivf_pq_topk" ->
      s"""WITH $IvfAdcCtes
         |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // recall@5 of the IVFADC compressed search against the exact
    // brute-force COSINE top-5 (the repo's ground-truth convention):
    // how much of the true neighborhood the coarse-probe + ADC stack
    // recovers — the number that tunes nprobe in production
    "q128_ivfadc_recall" ->
      s"""WITH $IvfAdcCtes,
         |approx AS (
         |  SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
         |ec2 AS (SELECT vec_id AS neighbor_id, embedding AS ecv
         |        FROM embeddings),
         |escored AS (
         |  SELECT query_id, neighbor_id, ${duckCos("qv", "ecv")} AS cosine
         |  FROM ec2 CROSS JOIN q WHERE query_id != neighbor_id),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM escored) x WHERE rank <= 5),
         |ecnt AS (SELECT query_id, count(*) AS n_exact
         |         FROM exact GROUP BY 1),
         |hits AS (
         |  SELECT e.query_id, count(*) AS n_hit
         |  FROM exact e JOIN approx a
         |    USING (query_id, neighbor_id)
         |  GROUP BY 1)
         |SELECT query_id, n_exact,
         |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |  round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_exact, 6) AS recall
         |FROM ecnt LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin,


    // the oracle predicts what REAL decoding must return: the synthetic
    // dims from doc_id, 3 bands (24-bit BMP), and the uncompressed
    // BI_RGB byte size 54 + h*ceil(3w/4)*4 — a stub fallback (md5-
    // derived 64..575 dims) could never match
    "q122_mm_real_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(doc_id % 13 + 1 AS BIGINT) AS width,
         |  CAST(doc_id % 7 + 1 AS BIGINT) AS height,
         |  CAST(3 AS BIGINT) AS channels,
         |  CAST(54 + (doc_id % 7 + 1)
         |    * (((doc_id % 13 + 1) * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,

    // the identical wrapper + the identical RE2 chain (DuckDB string
    // literals pass backslashes through to RE2, so the whitespace
    // class reads the same; the newline replacement is chr(10)
    // because RE2 rewrite strings don't interpret \n)
    "q148_html_to_text" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>t</title><style>p { color: red; }' ||
        |    '</style></head><body><h1>Doc &amp; title</h1><p>' || text ||
        |    '</p><script type="text/javascript">var x = 1 < 2;' ||
        |    '</script><div>tail &lt;b&gt; &quot;q&#39;s&quot;' ||
        |    ' &nbsp;end</div></body></html>' AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s1 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s2b AS (SELECT doc_id, regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '(?i)<br(?:/?|\s[^>]*)>|</p>|</div>|</li>|</tr>|</h[1-6]>', chr(10), 'g')
        |  AS t FROM s2b),
        |s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g')
        |  AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '&nbsp;', ' ', 'g')
        |  AS t FROM s4),
        |s6 AS (SELECT doc_id, regexp_replace(t, '&lt;', '<', 'g')
        |  AS t FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(t, '&gt;', '>', 'g')
        |  AS t FROM s6),
        |s8 AS (SELECT doc_id, regexp_replace(t, '&quot;', '"', 'g')
        |  AS t FROM s7),
        |s9 AS (SELECT doc_id, regexp_replace(t, '&#39;', '''', 'g')
        |  AS t FROM s8),
        |s10 AS (SELECT doc_id, regexp_replace(t, '&amp;', '&', 'g')
        |  AS t FROM s9),
        |x1 AS (SELECT doc_id, regexp_replace(t,
        |  '[ \t\x0B\f\r]*\n[ \t\n\x0B\f\r]*', chr(10), 'g') AS t FROM s10),
        |x2 AS (SELECT doc_id, regexp_replace(t,
        |  '[ \t\x0B\f\r]+', ' ', 'g') AS t FROM x1),
        |x AS (SELECT doc_id, regexp_replace(t,
        |  '^[ \n]+|[ \n]+$', '', 'g') AS t FROM x2)
        |SELECT doc_id, md5(t) AS text_md5,
        |  CAST(length(t) AS BIGINT) AS n_chars
        |FROM x ORDER BY doc_id""".stripMargin,

    // the identical four-line wrapper; hot = lines in > 4 distinct
    // docs; all occurrences of hot lines drop, survivors rejoin in
    // line order (the Spark side keys on md5(line), the oracle on the
    // line itself — equivalent up to md5 collisions)
    "q149_drop_dup_lines" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    'site navigation home about contact' || chr(10) || text ||
        |    chr(10) || 'footer group ' || CAST(doc_id % 7 AS VARCHAR) ||
        |    chr(10) || 'doc signature ' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |l AS (
        |  SELECT doc_id, i - 1 AS idx, ls[i] AS line
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM w),
        |    unnest(generate_series(1, len(ls))) AS u(i)),
        |hot AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line)
        |  WHERE df > 4)
        |SELECT doc_id,
        |  coalesce(array_to_string(
        |    list(line ORDER BY idx)
        |      FILTER (line NOT IN (SELECT line FROM hot)),
        |    chr(10)), '') AS clean_text,
        |  CAST(count(*) FILTER (line NOT IN (SELECT line FROM hot))
        |    AS BIGINT) AS n_kept_lines,
        |  CAST(count(*) FILTER (line IN (SELECT line FROM hot))
        |    AS BIGINT) AS n_dropped_lines
        |FROM l GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the canonical URL predicted in CLOSED FORM from the fixture's
    // construction: scheme/host lowercased, www and the default :80
    // gone, the vanity :8080 kept, path case PRESERVED with the
    // trailing slash trimmed, only the id param surviving, fragment
    // dropped; domain takes three labels under the co.uk cc-SLD rule
    "q150_url_normalize" ->
      """SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) ||
        |    '://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '.co.uk'
        |          ELSE '.example.com' END) ||
        |    (CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id AS VARCHAR) ||
        |    '?id=' || CAST(doc_id AS VARCHAR) AS url_norm,
        |  'site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '.co.uk'
        |          ELSE '.example.com' END) AS host,
        |  CASE WHEN doc_id % 5 = 0
        |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
        |    ELSE 'example.com' END AS domain
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "q151_domain_cap" ->
      s"""WITH dmn AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
         |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
         |    ELSE 'example.com' END AS domain
         |  FROM documents WHERE doc_id IS NOT NULL),
         |r AS (
         |  SELECT domain, doc_id,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY ${h60("'graft:'||doc_id")} % 1000000, doc_id) AS rn
         |  FROM dmn)
         |SELECT doc_id, domain FROM r WHERE rn <= 5
         |ORDER BY domain, doc_id""".stripMargin,

    // both links' canonical forms predicted in closed form from the
    // linkHtml construction (tracking param and fragment gone, case
    // folded, www/:443 stripped, trailing slash trimmed, path case
    // preserved)
    "q152_link_extract" ->
      """SELECT doc_id, link_idx, url_norm, dst_domain FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS link_idx,
        |    'http://site' || CAST((doc_id + 3) % 7 AS VARCHAR) ||
        |      '.example.com/From/' || CAST(doc_id AS VARCHAR) ||
        |      '?x=' || CAST(doc_id % 3 AS VARCHAR) AS url_norm,
        |    'example.com' AS dst_domain
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT),
        |    'https://site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) ||
        |      '.co.uk/Page',
        |    'site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) || '.co.uk'
        |  FROM documents WHERE doc_id IS NOT NULL)
        |ORDER BY doc_id, link_idx""".stripMargin,

    // three unrolled damped power-iteration rounds over the closed-form
    // domain edge list; every arithmetic step in DOUBLE (CAST(0.85 AS
    // DOUBLE), 1.0 - that) so both engines fold the same ulps; the
    // dangling term is identically zero here (every fixture node has
    // outlinks) but stays in the formula the operator implements
    "q153_host_pagerank" -> {
      val dampD = "CAST(0.85 AS DOUBLE)"
      def round(k: Int): String =
        s"""d$k AS (
           |  SELECT coalesce(sum(pr), 0) AS dm FROM p$k
           |  WHERE nd NOT IN (SELECT s FROM deg)),
           |p${k + 1} AS (
           |  SELECT nodes.nd,
           |    (1.0 - $dampD) / (SELECT n FROM nn) + $dampD * (
           |      coalesce((SELECT sum(p.pr / deg.od)
           |        FROM e JOIN deg USING (s) JOIN p$k p ON p.nd = e.s
           |        WHERE e.t = nodes.nd), 0)
           |      + (SELECT dm FROM d$k) / (SELECT n FROM nn)) AS pr
           |  FROM nodes)""".stripMargin
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
         |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
         |    ELSE 'example.com' END AS s
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e AS (
         |  SELECT DISTINCT s, 'example.com' AS t FROM base
         |  UNION
         |  SELECT s, 'site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) ||
         |    '.co.uk' FROM base),
         |nodes AS (
         |  SELECT DISTINCT nd FROM (
         |    SELECT s AS nd FROM e UNION ALL SELECT t AS nd FROM e) u),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |deg AS (
         |  SELECT s, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY s),
         |p0 AS (SELECT nd, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
         |${round(0)},
         |${round(1)},
         |${round(2)}
         |SELECT nd AS domain, pr FROM p3 ORDER BY domain""".stripMargin
    },

    // the identical mixed-script construction; counts via the same
    // \x{...} codepoint classes (hex class syntax reads identically to
    // Java regex and RE2); tie-break CASE order = the precedence order
    // of TextAnalysis.ScriptRanges
    "q154_script_profile" ->
      """WITH m AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN repeat(' привет мир', 12)
        |         WHEN doc_id % 4 = 1 THEN repeat(' 你好世界', 30)
        |         WHEN doc_id % 4 = 2 THEN ' γειά σου'
        |         ELSE '' END AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |c AS (
        |  SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]',
        |      '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', '', 'g'))
        |      AS BIGINT) AS n_cjk,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari
        |  FROM m),
        |g AS (SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_cjk,
        |  n_arabic, n_hangul, n_devanagari) AS gm FROM c)
        |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
        |  n_arabic, n_hangul, n_devanagari,
        |  CASE WHEN gm = 0 THEN 'none'
        |       WHEN n_latin = gm THEN 'latin'
        |       WHEN n_cyrillic = gm THEN 'cyrillic'
        |       WHEN n_greek = gm THEN 'greek'
        |       WHEN n_cjk = gm THEN 'cjk'
        |       WHEN n_arabic = gm THEN 'arabic'
        |       WHEN n_hangul = gm THEN 'hangul'
        |       ELSE 'devanagari' END AS dominant_script,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE CAST(gm AS DOUBLE) / n_chars END AS dominant_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    // every record field re-derived from the id: the warcinfo row plus
    // id%3+1 response rows with the synthetic URI and payload rebuilt
    // verbatim (length and md5 over the same ASCII bytes)
    "q155_warc_records" ->
      """WITH info AS (
        |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS rec_idx,
        |    'warcinfo' AS warc_type, '' AS target_uri,
        |    'software: graft/1.0' AS payload
        |  FROM documents WHERE doc_id IS NOT NULL),
        |resp AS (
        |  SELECT doc_id AS id, CAST(r + 1 AS BIGINT) AS rec_idx,
        |    'response' AS warc_type,
        |    'http://site' || CAST((doc_id + r) % 7 AS VARCHAR) ||
        |      '.example.com/page/' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(r AS VARCHAR) AS target_uri,
        |    'payload ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |      CAST(r AS VARCHAR) || ' ' ||
        |      repeat('a', CAST((doc_id + r) % 23 AS INT)) AS payload
        |  FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(r)
        |  WHERE doc_id IS NOT NULL),
        |allr AS (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |SELECT id, rec_idx, warc_type, target_uri,
        |  CAST(length(payload) AS BIGINT) AS content_length,
        |  md5(payload) AS payload_md5
        |FROM allr ORDER BY id, rec_idx""".stripMargin,

    // gzip is framing, not content: after member-per-record inflation
    // the record stream is byte-identical to q155's, so the oracle is
    // the same id-derived rebuild
    "q161_warc_gz_records" ->
      """WITH info AS (
        |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS rec_idx,
        |    'warcinfo' AS warc_type, '' AS target_uri,
        |    'software: graft/1.0' AS payload
        |  FROM documents WHERE doc_id IS NOT NULL),
        |resp AS (
        |  SELECT doc_id AS id, CAST(r + 1 AS BIGINT) AS rec_idx,
        |    'response' AS warc_type,
        |    'http://site' || CAST((doc_id + r) % 7 AS VARCHAR) ||
        |      '.example.com/page/' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(r AS VARCHAR) AS target_uri,
        |    'payload ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |      CAST(r AS VARCHAR) || ' ' ||
        |      repeat('a', CAST((doc_id + r) % 23 AS INT)) AS payload
        |  FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(r)
        |  WHERE doc_id IS NOT NULL),
        |allr AS (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |SELECT id, rec_idx, warc_type, target_uri,
        |  CAST(length(payload) AS BIGINT) AS content_length,
        |  md5(payload) AS payload_md5
        |FROM allr ORDER BY id, rec_idx""".stripMargin,

    // the q105 collision rule's complement: src0 docs sharing NO band
    // with any non-src0 doc. Both gate shapes (q162 broadcast probes,
    // q163 explode+semi+anti) must reproduce it exactly
    "q162_streaming_lsh_gate" -> LshGateOracle,
    "q163_lsh_gate_batch" -> LshGateOracle,

    // the whole chain predicted in CLOSED FORM: the fixture corpus is
    // single-spaced ASCII, so extraction of the known wrapper is
    // exactly 'Nav | Bar' + newline + the original text
    "q156_warc_http_text" ->
      """SELECT doc_id AS id, CAST(200 AS BIGINT) AS status,
        |  'text/html; charset=utf-8' AS content_type,
        |  CAST(doc_id AS VARCHAR) AS x_doc,
        |  CAST(length('<html><body><div>Nav | Bar</div><p>' || text ||
        |    '</p></body></html>') AS BIGINT) AS body_len,
        |  md5('Nav | Bar' || chr(10) || text) AS text_md5
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY id""".stripMargin,

    // decisions in closed form: '*' group disallows /private except
    // the longer /private/ok allow; the graftbot group sees ONLY its
    // own /bot-only rule (specific group replaces the wildcard)
    // every decision predicted in closed form from doc_id % 7: the '*'
    // group disallows case 1 (prefix) and case 3 ($-anchored wildcard,
    // which must NOT catch case 5's '.tmpx'); the bot group — which
    // REPLACES '*', so cases 1/3 come back allowed — disallows case 2
    // (wildcard query rule) and case 6 (literal prefix)
    "q157_robots_gate" ->
      """SELECT doc_id,
        |  'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
        |  CASE doc_id % 7
        |    WHEN 0 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN '/public/' || CAST(doc_id AS VARCHAR) ||
        |      '?sid=' || CAST(doc_id % 3 AS VARCHAR)
        |    WHEN 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR) || '.tmp'
        |    WHEN 4 THEN '/p/' || CAST(doc_id AS VARCHAR) || '/ok'
        |    WHEN 5 THEN '/t/' || CAST(doc_id AS VARCHAR) || '.tmpx'
        |    ELSE '/bot-only/' || CAST(doc_id AS VARCHAR) END AS path,
        |  doc_id % 7 NOT IN (1, 3) AS allowed_star,
        |  CASE doc_id % 7 WHEN 0 THEN '/private/ok'
        |    WHEN 1 THEN '/private' WHEN 3 THEN '/*.tmp$'
        |    WHEN 4 THEN '/p*ok' ELSE '' END AS prefix_star,
        |  doc_id % 7 NOT IN (2, 6) AS allowed_bot,
        |  CASE doc_id % 7 WHEN 2 THEN '/*?sid='
        |    WHEN 6 THEN '/bot-only' ELSE '' END AS prefix_bot
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // both discovered URLs in closed form: trimmed, entity-decoded
    // (&amp; → &), then canonicalized like any crawl frontier entry
    "q158_sitemap_locs" ->
      """SELECT doc_id, loc_idx, url_norm FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS loc_idx,
        |    'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.example.com/sm/' || CAST(doc_id AS VARCHAR) AS url_norm
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT),
        |    'https://site' || CAST((doc_id + 1) % 7 AS VARCHAR) ||
        |      '.example.com/q?a=1&b=' || CAST(doc_id % 5 AS VARCHAR)
        |  FROM documents WHERE doc_id IS NOT NULL)
        |ORDER BY doc_id, loc_idx""".stripMargin,

    // the decoded latin-1 text predicted verbatim (both engines count
    // codepoints and hash UTF-8 bytes)
    "q159_warc_charset" ->
      """SELECT doc_id AS id,
        |  'Café naïve ' || CAST(doc_id AS VARCHAR) AS text,
        |  CAST(length('Café naïve ' || CAST(doc_id AS VARCHAR))
        |    AS BIGINT) AS n_chars,
        |  md5('Café naïve ' || CAST(doc_id AS VARCHAR)) AS text_md5
        |FROM documents WHERE doc_id IS NOT NULL ORDER BY id""".stripMargin,

    // every metadata field in closed form; description is identical
    // for both attribute orders, so the parity split gates both match
    // branches
    "q160_html_meta" ->
      """SELECT doc_id,
        |  'Doc & Title ' || CAST(doc_id AS VARCHAR) AS title,
        |  'Desc "' || CAST(doc_id % 9 AS VARCHAR) || '"' AS description,
        |  'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com/c/' || CAST(doc_id AS VARCHAR)
        |    AS canonical_norm,
        |  'en-us' AS lang,
        |  doc_id % 5 = 0 AS noindex
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // q144's semantics restricted to the sampled frames
    "q146_mm_frame_sample" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id, f.f AS frame_idx,
         |    CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
         |    CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
         |    (d.doc_id * 2654435761 + f.f * 1009 + x.x * 7 + y.y * 131)
         |      % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f),
         |    unnest(generate_series(0, d.doc_id % 8 + 1)) AS x(x),
         |    unnest(generate_series(0, d.doc_id % 5 + 1)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL AND f.f % 2 = 0)
         |SELECT id, frame_idx, width, height,
         |  width * height AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id, frame_idx, width, height
         |ORDER BY id, frame_idx""".stripMargin,

    // output pixel (x, y) reads source pixel (x·sw // 8, y·sh // 6) —
    // the same integer nearest-neighbor mapping as resizeGraySums,
    // composed with the q122/q142 closed-form source-pixel formula
    "q147_mm_real_resize" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id,
         |    (d.doc_id * 2654435761
         |      + ((x.x * (d.doc_id % 13 + 1)) // 8) * 7
         |      + ((y.y * (d.doc_id % 7 + 1)) // 6) * 131) % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, 7)) AS x(x),
         |    unnest(generate_series(0, 5)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL)
         |SELECT id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
         |  CAST(48 AS BIGINT) AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id
         |ORDER BY id""".stripMargin,

    // every window's |sample| sum re-derived from syntheticWav's
    // closed-form PCM formula (sample i of doc id is
    // (31·id + 7i) mod 2¹⁶ − 2¹⁵, interleaved over id%2+1 channels,
    // (id%50+1)·8 frames) — only a real sample decode can match
    "q145_mm_audio_energy" ->
      s"""WITH a AS (
         |  SELECT doc_id AS id,
         |    CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
         |    CAST((doc_id % 50 + 1) * 8 AS BIGINT) AS frames
         |  FROM documents WHERE doc_id IS NOT NULL),
         |s AS (
         |  SELECT id,
         |    (i.i // ch) // 16 AS window_idx,
         |    i.i // ch AS frame,
         |    abs((id * 31 + i.i * 7) % 65536 - 32768) AS a_s
         |  FROM a, unnest(generate_series(0, ch * frames - 1)) AS i(i))
         |SELECT id, CAST(window_idx AS BIGINT) AS window_idx,
         |  CAST(count(DISTINCT frame) AS BIGINT) AS n_frames,
         |  CAST(sum(a_s) AS BIGINT) AS abs_sum
         |FROM s GROUP BY id, window_idx
         |ORDER BY id, window_idx""".stripMargin,

    // every frame's gray sum re-derived from the closed-form pixel
    // formula — only REAL decoded frame rasters can match (sum of
    // BIGINT is HUGEINT in DuckDB, hence the cast)
    "q144_mm_avi_frames" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id, f.f AS frame_idx,
         |    CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
         |    CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
         |    (d.doc_id * 2654435761 + f.f * 1009 + x.x * 7 + y.y * 131)
         |      % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f),
         |    unnest(generate_series(0, d.doc_id % 8 + 1)) AS x(x),
         |    unnest(generate_series(0, d.doc_id % 5 + 1)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL)
         |SELECT id, frame_idx, width, height,
         |  width * height AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id, frame_idx, width, height
         |ORDER BY id, frame_idx""".stripMargin,

    // uniform gray frames: REAL JPEG decode must land exactly on the
    // closed form w·h·((id·2654435761 + 1009f) mod 256)
    "q164_mm_mjpeg_frames" ->
      """SELECT d.doc_id AS id, f.f AS frame_idx,
        |  CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
        |  CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
        |  CAST((d.doc_id % 8 + 2) * (d.doc_id % 5 + 2) AS BIGINT) AS n_px,
        |  CAST((d.doc_id % 8 + 2) * (d.doc_id % 5 + 2)
        |    * ((d.doc_id * 2654435761 + f.f * 1009) % 256) AS BIGINT)
        |    AS gray_sum
        |FROM documents d,
        |  unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f)
        |WHERE d.doc_id IS NOT NULL
        |ORDER BY id, frame_idx""".stripMargin,

    // the whole chain replayed: decoded html + extracted text in
    // closed form (the fixture wrapper is fixed and the corpus is
    // single-line ASCII), robots = the id % 5 slice, then the
    // cascade's own semantics stage by stage — q51's quality formulas,
    // q149's line-df dedup, min-id exact keepers, and the q105-family
    // MinHash/banding/verified-jaccard near-dedup, all over the
    // REWRITTEN text. Digests are mod-p md5 sums of the stage texts
    "q165_crawl_to_corpus" ->
      s"""WITH base AS (
         |  SELECT doc_id AS id, text,
         |    '<html><body><div>Home | About | Contact</div><p>Resume ' ||
         |      CAST(doc_id AS VARCHAR) || ' é</p><p>' || text ||
         |      '</p><div>(c) 2026 Example Corp.</div></body></html>'
         |      AS html,
         |    'Home | About | Contact' || chr(10) || 'Resume ' ||
         |      CAST(doc_id AS VARCHAR) || ' é' || chr(10) || text ||
         |      chr(10) || '(c) 2026 Example Corp.' AS xtext
         |  FROM documents WHERE doc_id IS NOT NULL),
         |allowed AS (SELECT * FROM base WHERE id % 5 <> 0),
         |xw AS (
         |  SELECT id, xtext, list_filter(string_split_regex(
         |      regexp_replace(lower(xtext), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'), x -> x != '') AS ws
         |  FROM allowed),
         |quality AS (
         |  SELECT id, xtext FROM xw
         |  WHERE len(ws) >= 5
         |    AND round(CAST(length(xtext) - length(regexp_replace(xtext,
         |      '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(xtext), 1), 4) >= 0.5
         |    AND round(CAST(len(list_distinct(ws)) AS DOUBLE)
         |      / greatest(len(ws), 1), 4) <= 1.01),
         |l AS (
         |  SELECT id, i - 1 AS idx, ls[i] AS line
         |  FROM (SELECT id, string_split(xtext, chr(10)) AS ls
         |        FROM quality),
         |    unnest(generate_series(1, len(ls))) AS u(i)),
         |hot AS (
         |  SELECT line FROM (
         |    SELECT line, count(DISTINCT id) AS df FROM l GROUP BY line)
         |  WHERE df > 2),
         |rew AS (
         |  SELECT id,
         |    array_to_string(list(line ORDER BY idx)
         |      FILTER (line NOT IN (SELECT line FROM hot)), chr(10))
         |      AS rtext,
         |    count(*) FILTER (line NOT IN (SELECT line FROM hot))
         |      AS n_kept
         |  FROM l GROUP BY id),
         |live AS (SELECT id, rtext FROM rew WHERE n_kept > 0),
         |exact AS (SELECT min(id) AS id FROM live GROUP BY rtext),
         |ek AS (SELECT v.id, v.rtext FROM live v
         |       JOIN exact e ON e.id = v.id),
         |rw AS (
         |  SELECT id, list_filter(string_split_regex(
         |      regexp_replace(lower(rtext), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'), x -> x != '') AS ws
         |  FROM ek),
         |rsh AS (
         |  SELECT id, list_distinct(list_transform(
         |    generate_series(1, greatest(1, len(ws) - 2)),
         |    i -> array_to_string(ws[i:i+2], ' '))) AS shingles
         |  FROM rw WHERE len(ws) > 0),
         |rposts AS (SELECT id, unnest(shingles) AS word FROM rsh
         |           WHERE len(shingles) > 0),
         |rsig AS (
         |  SELECT id, perm,
         |    min((((perm+1)*1299721 % 2147483629)
         |         * (${h60("word")} % 2147483629)
         |         + (perm*7919+104729) % 2147483629) % 2147483629)
         |      AS min_hash
         |  FROM rposts
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS perm) perms
         |  GROUP BY id, perm),
         |rband AS (
         |  SELECT id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM rsig GROUP BY id, band),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM rband a JOIN rband b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.id < b.id),
         |sz AS (SELECT id, len(shingles) AS sz FROM rsh),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
         |  FROM rposts a JOIN rposts b
         |    ON a.word = b.word AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |ver AS (
         |  SELECT c.id_a, c.id_b
         |  FROM cand c
         |  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
         |  JOIN sz sa ON sa.id = c.id_a
         |  JOIN sz sb ON sb.id = c.id_b
         |  WHERE (sa.sz + sb.sz - i.n) > 0
         |    AND CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n)
         |      >= CAST(0.8 AS DOUBLE)),
         |losers AS (SELECT DISTINCT id_b AS id FROM ver),
         |keep AS (SELECT e.id FROM exact e
         |         WHERE e.id NOT IN (SELECT id FROM losers))
         |SELECT '01_fetched' AS stage, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${h60("html")} % 1000000007) AS BIGINT) AS digest
         |FROM base
         |UNION ALL SELECT '02_allowed', CAST(count(*) AS BIGINT),
         |  CAST(sum(${h60("html")} % 1000000007) AS BIGINT) FROM allowed
         |UNION ALL SELECT '03_cascade_input', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM allowed
         |UNION ALL SELECT '04_after_quality', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM quality
         |UNION ALL SELECT '05_after_line_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM live
         |UNION ALL SELECT '06_after_exact_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM exact
         |UNION ALL SELECT '07_after_near_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM keep
         |UNION ALL SELECT '08_curated', CAST(count(*) AS BIGINT),
         |  CAST(sum(${h60("rtext")} % 1000000007) AS BIGINT)
         |FROM live JOIN keep USING (id)
         |ORDER BY stage""".stripMargin,

    // the same LR training replay as q113, with the corpus head swapped
    // for the synthetic two-language fixture and char-3-gram windows
    // over the canonical text (q54's substr contract — the kernel
    // DISTINCTs windows, so each present n-gram contributes 1/len)
    "q166_langid_trained" ->
      s"""WITH ${lrChainSql(64, 2, 0.5,
             """lw AS (
               |  SELECT doc_id,
               |    CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS y,
               |    list_distinct(list_transform(
               |      generate_series(1, greatest(1, length(c) - 2)),
               |      i -> substr(c, i, 3))) AS ws
               |  FROM (
               |    SELECT doc_id, array_to_string([
               |      CASE WHEN doc_id % 2 = 0
               |        THEN (['la','casa','roja','el','perro','ladra',
               |               'mucho','agua'])[(doc_id*7 + i*3) % 8 + 1]
               |        ELSE (['a','casa','vermelha','o','cachorro',
               |               'ladra','muito','agua'])[(doc_id*7 + i*3) % 8 + 1]
               |      END FOR i IN generate_series(0, 7)], ' ') AS c
               |    FROM documents WHERE doc_id IS NOT NULL))""".stripMargin)}
         |SELECT doc_id, round(p, 6) AS prob,
         |  CASE WHEN p >= 0.5 THEN 'es' ELSE 'pt' END AS lang_pred
         |FROM p3 ORDER BY doc_id""".stripMargin,

    // every bin count re-derived from the closed-form pixel formula —
    // the REAL decoded raster must produce these masses
    "q142_mm_real_embed" ->
      s"""WITH $HistEmbCte
         |SELECT id, bin,
         |  round(CAST(CAST(CAST(cnt AS DOUBLE) / npx AS FLOAT) AS DOUBLE),
         |    6) AS frac
         |FROM bfull ORDER BY id, bin""".stripMargin,

    // the oracle states the SEMANTICS directly — a per-doc window
    // cumsum in greedy (quality DESC, id) order, kept while <= budget;
    // the Spark side's bucketed two-phase form is provably the same set
    "q127_token_budget" ->
      s"""WITH $WordsCte,
         |s AS (
         |  SELECT doc_id,
         |    round(CAST(length(text) - length(regexp_replace(text,
         |      '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 4) AS quality,
         |    CAST(len(ws) AS BIGINT) AS n_tokens
         |  FROM words WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |g AS (
         |  SELECT doc_id, quality, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
         |  FROM s)
         |SELECT doc_id, quality, n_tokens FROM g
         |WHERE cum <= 12000 ORDER BY doc_id""".stripMargin,

    // per-doc first-seen mask: position p (0-based) repeats iff its
    // 2-gram appears among positions < p (list_position returns 0, not
    // NULL, on a miss — hence `> 0`); the token mask is q120's with the
    // repeat-start list in place of the hot-position list
    "q126_drop_repeated_spans" ->
      s"""WITH $LiveWordsCte,
         |hs AS (
         |  SELECT doc_id, w,
         |    CASE WHEN len(w) >= 2 THEN
         |      [md5(array_to_string(
         |        w[CAST(p + 1 AS BIGINT):CAST(p + 2 AS BIGINT)], ' '))
         |        FOR p IN generate_series(0, len(w) - 2)]
         |    ELSE CAST([] AS VARCHAR[]) END AS h
         |  FROM ws),
         |rp AS (
         |  SELECT doc_id, w,
         |    [CAST(p - 1 AS INT) FOR p IN generate_series(1, len(h))
         |      IF list_position(h[1:CAST(p - 1 AS BIGINT)], h[p]) > 0] AS ps
         |  FROM hs),
         |masked AS (
         |  SELECT doc_id,
         |    [w[i] FOR i IN generate_series(1, len(w))
         |      IF len(list_filter(ps, p -> p < i AND i <= p + 2)) = 0]
         |      AS kept,
         |    len(w) AS n, len(ps) AS nrp
         |  FROM rp)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(coalesce(len(kept), 0) AS BIGINT) AS n_kept_tokens,
         |  CAST(n - coalesce(len(kept), 0) AS BIGINT) AS n_dropped_tokens,
         |  CAST(nrp AS BIGINT) AS n_repeat_starts
         |FROM masked ORDER BY doc_id""".stripMargin,

    // stride-1 shingle hashes → df>2 hot set → per-doc hot start
    // positions → index-mask reassembly. DuckDB's 1-based i maps to
    // Spark's 0-based token index i-1: dropped iff p < i AND i <= p+8
    "q120_drop_dup_spans" ->
      s"""WITH $LiveWordsCte,
         |sh AS (
         |  SELECT doc_id, CAST(p AS INT) AS p,
         |    md5(array_to_string(
         |      w[CAST(p + 1 AS BIGINT):CAST(p + 8 AS BIGINT)], ' ')) AS h
         |  FROM ws, unnest(generate_series(0, len(w) - 8)) AS t(p)
         |  WHERE len(w) >= 8),
         |hot AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df FROM sh GROUP BY h)
         |  WHERE df > 2),
         |hp AS (
         |  SELECT doc_id, list(p ORDER BY p) AS ps
         |  FROM sh JOIN hot USING (h) GROUP BY doc_id),
         |masked AS (
         |  SELECT ws.doc_id,
         |    [w[i] FOR i IN generate_series(1, len(w))
         |      IF len(list_filter(coalesce(ps, []),
         |        p -> p < i AND i <= p + 8)) = 0] AS kept,
         |    len(w) AS n
         |  FROM ws LEFT JOIN hp ON ws.doc_id = hp.doc_id)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(coalesce(len(kept), 0) AS BIGINT) AS n_kept_tokens,
         |  CAST(n - coalesce(len(kept), 0) AS BIGINT) AS n_dropped_tokens
         |FROM masked ORDER BY doc_id""".stripMargin,

    // q87's clusters with a quality argmax keeper: rank within each
    // component with nulls sorted LAST ((q IS NULL) leads the ORDER BY,
    // matching the Spark side's min(struct(isNull, -q, id)))
    "q121_best_keepers" ->
      s"""WITH RECURSIVE $ComponentsCtes,
         |comp AS (
         |  SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |qd AS (
         |  SELECT d.doc_id, d.source, d.n_chars, comp.component,
         |    nullif(d.n_chars % 97, 0) AS q
         |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY component
         |      ORDER BY (q IS NULL), q DESC, doc_id) AS rn
         |    FROM qd WHERE component IS NOT NULL) z
         |  WHERE rn = 1)
         |SELECT doc_id, source, n_chars FROM qd
         |WHERE component IS NULL OR doc_id IN (SELECT doc_id FROM win)
         |ORDER BY doc_id""".stripMargin,

    // deduped 3-word shingle digest per doc — the q124/q54 gate shape
    // (count + md5 of the sorted shingle list) for the native word-ngram
    // kernel's SQL-text path
    "q129_sql_native_word_ngrams" ->
      s"""WITH $WordsCte,
         |$ShinglesCte
         |SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_ngrams,
         |  md5(array_to_string(list_sort(shingles), '|')) AS ngram_md5
         |FROM sh ORDER BY doc_id""".stripMargin,
    // the q31/q38 signature oracle gates the SQL-text minhash path too
    "q130_sql_native_minhash" -> MinHashSigOracle,

    // the oracle predicts what REAL WAV header parsing must return —
    // the closed-form RIFF fields syntheticWav writes (8 kHz, 16-bit,
    // id-derived channels/frames); the stub's md5-derived values could
    // never match
    "q133_mm_wav_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(16 AS BIGINT) AS bits,
         |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
         |  CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
         |  CAST(44 + (doc_id % 50 + 1) * 8 * (doc_id % 2 + 1) * 2
         |    AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,
    // closed-form ISO-BMFF fields syntheticMp4 writes: 16.16 fixed-point
    // presentation dims, mvhd duration at timescale 600, one track,
    // fixed 232-byte layout
    "q134_mm_mp4_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(doc_id % 640 + 16 AS BIGINT) AS width,
         |  CAST(doc_id % 360 + 16 AS BIGINT) AS height,
         |  CAST(1 AS BIGINT) AS n_tracks,
         |  CAST((doc_id % 120 + 1) * 1000 AS BIGINT) AS duration_ms,
         |  CAST(232 AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,

    // the q128 chain with the probe cutoff made a VARIABLE: every
    // candidate carries its centroid's probe rank, ADC distances are
    // computed once, and each nprobe level re-ranks the pr<=level
    // subset — exactly what Pq.ivfPqTopK(nprobe = p) produces per level
    "q135_nprobe_recall_curve" ->
      s"""WITH $IvfAdcResidualBase,
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id, a.ccid, p.pr
         |  FROM probedr p JOIN assigned a ON p.ccid = a.ccid
         |  WHERE query_id != a.vec_id),
         |adc AS (
         |  SELECT cand.query_id, cand.neighbor_id, cand.pr,
         |    list_reduce(list_prepend(0.0, list(qd.d2 ORDER BY co.sub)),
         |      (u, v) -> u + v) AS adc
         |  FROM cand
         |  JOIN codes co ON co.vec_id = cand.neighbor_id
         |  JOIN qdist qd ON qd.query_id = cand.query_id
         |    AND qd.ccid = cand.ccid
         |    AND qd.sub = co.sub AND qd.cid = co.cid
         |  GROUP BY cand.query_id, cand.neighbor_id, cand.pr),
         |lv AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |lvl_ranked AS (
         |  SELECT l.nprobe, a.query_id, a.neighbor_id,
         |    row_number() OVER (PARTITION BY l.nprobe, a.query_id
         |      ORDER BY a.adc, a.neighbor_id) AS rank
         |  FROM lv l JOIN adc a ON a.pr <= l.nprobe),
         |approx AS (
         |  SELECT nprobe, query_id, neighbor_id
         |  FROM lvl_ranked WHERE rank <= 5),
         |ec2 AS (SELECT vec_id AS neighbor_id, embedding AS ecv
         |        FROM embeddings),
         |escored AS (
         |  SELECT query_id, neighbor_id, ${duckCos("qv", "ecv")} AS cosine,
         |    ${duckDot("qv", "qv")} + ${duckDot("ecv", "ecv")}
         |      - 2 * ${duckDot("qv", "ecv")} AS dist2
         |  FROM ec2 CROSS JOIN q WHERE query_id != neighbor_id),
         |exact_cos AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM escored) x WHERE rank <= 5),
         |exact_l2 AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY dist2, neighbor_id) AS rank
         |    FROM escored) x WHERE rank <= 5),
         |percq_cos AS (
         |  SELECT l.nprobe, e.query_id, count(*) AS n_exact,
         |    sum(CASE WHEN a.neighbor_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS n_hit
         |  FROM lv l CROSS JOIN exact_cos e
         |  LEFT JOIN approx a ON a.nprobe = l.nprobe
         |    AND a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |  GROUP BY 1, 2),
         |percq_l2 AS (
         |  SELECT l.nprobe, e.query_id,
         |    sum(CASE WHEN a.neighbor_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS n_hit
         |  FROM lv l CROSS JOIN exact_l2 e
         |  LEFT JOIN approx a ON a.nprobe = l.nprobe
         |    AND a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |  GROUP BY 1, 2),
         |agg_cos AS (
         |  SELECT nprobe, count(*) AS n_queries, sum(n_hit) AS n_hit_cos,
         |    sum(n_exact) AS n_exact
         |  FROM percq_cos GROUP BY nprobe),
         |agg_l2 AS (
         |  SELECT nprobe, sum(n_hit) AS n_hit_l2
         |  FROM percq_l2 GROUP BY nprobe)
         |SELECT CAST(c.nprobe AS BIGINT) AS nprobe,
         |  CAST(n_queries AS BIGINT) AS n_queries,
         |  CAST(n_hit_l2 AS BIGINT) AS n_hit_l2,
         |  CAST(n_hit_cos AS BIGINT) AS n_hit_cos,
         |  CAST(n_exact AS BIGINT) AS n_exact,
         |  round(CAST(n_hit_l2 AS DOUBLE) / n_exact, 6) AS recall_l2,
         |  round(CAST(n_hit_cos AS DOUBLE) / n_exact, 6) AS recall_cos
         |FROM agg_cos c JOIN agg_l2 USING (nprobe)
         |ORDER BY nprobe""".stripMargin,

    // q40's exact top-5 feeding a per-query label vote; ties to the
    // smallest label, vote counts and totals as integers
    "q136_knn_label_vote" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${duckCos("qv", "cv")} AS cosine
         |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored),
         |votes AS (
         |  SELECT r.query_id, e.label AS lab, count(*) AS n_votes
         |  FROM ranked r JOIN embeddings e ON r.neighbor_id = e.vec_id
         |  WHERE r.rank <= 5 AND e.label IS NOT NULL
         |  GROUP BY 1, 2),
         |best AS (
         |  SELECT query_id, lab, n_votes,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY n_votes DESC, lab) AS rn,
         |    sum(n_votes) OVER (PARTITION BY query_id) AS n_neighbors
         |  FROM votes)
         |SELECT query_id, CAST(lab AS BIGINT) AS pred_label,
         |  CAST(n_votes AS BIGINT) AS n_votes,
         |  CAST(n_neighbors AS BIGINT) AS n_neighbors
         |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin,

    // the q110 blocked-fold contract per (label, dim): id-ordered folds
    // inside id%32 blocks, block sums fold in block order, mean = sum/n
    // per element — then cosine argmax against the broadcast model.
    // Shared by q137 (joined-frame argmax) and q138 (literal-model
    // `greatest` projection — the streaming-legal form): the two
    // formulations must predict identically, which sharing the oracle
    // proves.
    "q138_centroid_classify_lit" -> CentroidClassifyOracle,
    "q137_centroid_classify" -> CentroidClassifyOracle
  )

  private lazy val CentroidClassifyOracle =
      s"""WITH x AS (
         |  SELECT vec_id, label, vec_id % 32 AS blk, CAST(i AS INT) - 1 AS i,
         |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xi
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
         |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
         |    AND label IS NOT NULL),
         |c1 AS (
         |  SELECT label, blk, i,
         |    list_reduce(list(xi ORDER BY vec_id), (u, w) -> u + w) AS s
         |  FROM x GROUP BY 1, 2, 3),
         |csum AS (
         |  SELECT label, i,
         |    list_reduce(list(s ORDER BY blk), (u, w) -> u + w) AS s
         |  FROM c1 GROUP BY 1, 2),
         |cn AS (
         |  SELECT label, count(DISTINCT vec_id) AS n FROM x GROUP BY 1),
         |cent AS (
         |  SELECT label, list(s / n ORDER BY i) AS cvec
         |  FROM csum JOIN cn USING (label) GROUP BY label),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, label, ${duckCos("qv", "cvec")} AS cos
         |  FROM q CROSS JOIN cent),
         |best AS (
         |  SELECT query_id, label, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, label) AS rn
         |  FROM scored)
         |SELECT query_id, CAST(label AS BIGINT) AS pred_label,
         |  round(cos, 6) + 0 AS cos
         |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** DuckDB replica of [[graft.operators.Bpe.encodeSymbols]]: nested
    * left-to-right merge folds over the `syms` column, innermost fold =
    * rank-1 merge.
    */
  private def duckBpeFolds(merges: Seq[(String, String)]): String =
    merges.foldLeft("syms") { case (inner, (l, r)) =>
      s"""list_reduce(list_transform($inner, s -> [s]),
         |  (acc, x) -> CASE WHEN acc[-1] = '$l' AND x[1] = '$r'
         |    THEN list_append(list_slice(acc, 1, len(acc) - 1), '$l$r')
         |    ELSE list_append(acc, x[1]) END)""".stripMargin
    }
}
