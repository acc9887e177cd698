package graft.queries

import graft.Tables.t
import graft.ops.{Completeness, Islands, PhraseIndexJoin, Upsert}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.1–§2.7) expressed over
  * the driver's synthetic tables, each with a DuckDB oracle.
  *
  * Numeric determinism rule used throughout: aggregate integers, not
  * doubles. Money columns are quantized to exact integer cents before any
  * sum, so results are bit-identical regardless of partitioning, engine, or
  * summation order. Derived ratios use identical expression structure in
  * both dialects (IEEE ops on identical inputs are deterministic).
  */
object Relational {

  /** Exact sum of a fixed-point decimal column: quantize → integer sum →
    * descale. Deterministic under any aggregation order.
    */
  private def moneySum(c: Column, scale: Int = 10000): Column =
    sum(round(c * scale).cast("long")) / scale.toDouble

  val entries: Map[String, Q] = Map(

    // ---- S2: full table scan ------------------------------------------
    "s2_scan_nation" -> Q(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (s, dir) =>
      t(s, dir, "nation")
    },

    // ---- S3: filtered + ordered + limited work queue (top-k) ----------
    "s3_workqueue_topk" -> Q(
      """SELECT event_id, date_trunc('second', ts) AS ts_s, user_id, event_type, value
        |FROM events WHERE value > 100 ORDER BY ts, event_id LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("value") > 100)
        .orderBy("ts", "event_id")
        .limit(100)
        .select(col("event_id"), date_trunc("second", col("ts")).as("ts_s"),
          col("user_id"), col("event_type"), col("value"))
    },

    // ---- S4: LIKE-pattern scan ----------------------------------------
    "s4_like_scan" -> Q(
      "SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE 'small%'") { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").startsWith("small"))
        .select("p_partkey", "p_name", "p_brand")
    },

    // ---- S8: upsert (insert-or-update keyed on o_orderkey) ------------
    "s8_upsert" -> Q(
      """WITH upd AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
        |                    'U' AS o_orderstatus
        |             FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT * FROM upd
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_orderkey % 10 <> 0""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
      val upd = o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("o_orderstatus", lit("U"))
      Upsert(o, upd, Seq("o_orderkey"))
    },

    // ---- P1: column projection ----------------------------------------
    "p1_projection" -> Q(
      "SELECT o_orderkey, o_custkey FROM orders") { (s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_custkey")
    },

    // ---- P2: IS NULL / IS NOT NULL ------------------------------------
    "p2_null_predicates" -> Q(
      """SELECT count(*) AS n_total,
        |       count(nullif(o_orderstatus, 'O')) AS n_nonnull,
        |       count(CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 END) AS n_null
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("st", expr("nullif(o_orderstatus, 'O')"))
        .agg(count(lit(1)).as("n_total"),
          count(col("st")).as("n_nonnull"),
          count(when(col("st").isNull, 1)).as("n_null"))
    },

    // ---- P3: multi-key equality predicates ----------------------------
    "p3_multikey_eq" -> Q(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |WHERE l_returnflag = 'A' AND l_linestatus = 'F' AND l_discount = 0.05
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F" &&
          col("l_discount") === 0.05)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    },

    // ---- P4: range predicates on date/timestamp -----------------------
    "p4_range_pred" -> Q(
      """SELECT l_returnflag, count(*) AS n,
        |       sum(cast(round(l_quantity * 100) AS bigint)) / 100.0 AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity"), 100).as("sum_qty"))
    },

    // ---- P5: timestamp-age predicate (fixed "now" for determinism) ----
    "p5_age_pred" -> Q(
      """SELECT event_type, count(*) AS n FROM events
        |WHERE ts < TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 1 DAY
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("ts") < expr("timestamp'2024-01-15 00:00:00' - INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
    },

    // ---- P6: group-completeness gate ----------------------------------
    "p6_completeness_gate" -> Q(
      """SELECT user_id, count(*) AS n FROM events
        |WHERE user_id NOT IN (SELECT user_id FROM events WHERE value >= 480)
        |GROUP BY user_id""".stripMargin) { (s, dir) =>
      Completeness.gate(t(s, dir, "events"), Seq("user_id"), col("value") < 480)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"))
    },

    // ---- J1: equi left-outer join fact→dim ----------------------------
    "j1_left_join" -> Q(
      """SELECT o.o_orderstatus, count(*) AS n,
        |       sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS bigint)) / 10000.0 AS revenue
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- J2: equi join + interval range predicate ---------------------
    "j2_join_range_pred" -> Q(
      """SELECT year(o.o_orderdate) AS order_year, count(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate < o.o_orderdate + INTERVAL 120 DAY
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 120 DAYS"))
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- J3: dim left-outer join --------------------------------------
    "j3_left_outer_dim" -> Q(
      """SELECT s.s_suppkey, s.s_name, n.n_name
        |FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin) { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      sup.join(n, sup("s_nationkey") === n("n_nationkey"), "left")
        .select("s_suppkey", "s_name", "n_name")
    },

    // ---- J4: broadcast hash joins against small dims ------------------
    "j4_broadcast_dims" -> Q(
      """SELECT r.r_name, count(*) AS n_cust,
        |       sum(cast(round(c.c_acctbal * 100) AS bigint)) / 100.0 AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal"), 100).as("sum_bal"))
    },

    // ---- J5: adjacent-year self-join (fill-from-neighbor shape) -------
    "j5_adjacent_year_selfjoin" -> Q(
      """WITH cy AS (SELECT DISTINCT o_custkey AS c, year(o_orderdate) AS y FROM orders)
        |SELECT a.y AS order_year, count(*) AS n_pairs
        |FROM cy a JOIN cy b ON a.c = b.c AND b.y = a.y + 1
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val cy = t(s, dir, "orders")
        .select(col("o_custkey").as("c"), year(col("o_orderdate")).as("y"))
        .distinct()
      val a = cy.as("a")
      val b = cy.as("b")
      a.join(b, col("a.c") === col("b.c") && col("b.y") === col("a.y") + 1)
        .groupBy(col("a.y").as("order_year"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // ---- J6: blocked fuzzy join (block key + similarity predicate) ----
    "j6_fuzzy_blocked_join" -> Q(
      """SELECT a.c_nationkey AS nationkey, count(*) AS n_pairs
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        | AND a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 2
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      // Scale notes: the natural block key (nationkey) has only 25 distinct
      // values, so the blocked pair expansion is quadratic per nation and
      // an unsalted shuffle join caps parallelism at 25 skewed tasks. Salt
      // the probe side by hash(key) and replicate the build side across all
      // salts → the join key becomes (nation, salt) with 25 × SALT balanced
      // groups at any data size. Under broadcast (small build side) the
      // shuffle disappears, so ALSO repartition the probe side — otherwise a
      // single parquet split serializes every comparison into one task. The
      // 3-arg banded levenshtein (returns -1 past the threshold) is O(len·k)
      // instead of O(len²) — the dominant per-pair cost in the ER join.
      val SALT = 8
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("k1"), col("c_name").as("nm1"),
          col("c_nationkey").as("nationkey"))
        .withColumn("_sa", pmod(xxhash64(col("k1")), lit(SALT)))
        .repartition(s.sparkContext.defaultParallelism,
          col("nationkey"), col("_sa"))
      val b = c.select(col("c_custkey").as("k2"), col("c_name").as("nm2"),
          col("c_nationkey").as("nk2"))
        .withColumn("_sb", explode(array((0 until SALT).map(lit(_)): _*)))
      a.join(b, col("nationkey") === col("nk2") && col("_sa") === col("_sb") &&
          col("k1") < col("k2") &&
          levenshtein(col("nm1"), col("nm2"), 2) >= 0)
        .groupBy("nationkey")
        .agg(count(lit(1)).as("n_pairs"))
    },

    // ---- J7: substring-containment join + uniqueness gate -------------
    "j7_substring_unique_match" -> Q(
      """WITH ph AS (SELECT doc_id, array_to_string(string_split(text, ' ')[10:14], ' ') AS phrase
        |            FROM documents),
        |m AS (SELECT ph.doc_id, d.doc_id AS other_id
        |      FROM ph JOIN documents d
        |        ON contains(d.text, ph.phrase) AND d.doc_id <> ph.doc_id)
        |SELECT doc_id, min(other_id) AS matched_doc FROM m
        |GROUP BY doc_id HAVING count(*) = 1""".stripMargin) { (s, dir) =>
      // A containment join has no equi key → broadcast nested loop. The
      // probe side comes off a single parquet file (1 input split), which
      // would serialize the whole O(n·m) scan into one task — repartition it
      // to the cluster's parallelism so the loop fans out.
      val d = t(s, dir, "documents")
      val ph = d.select(col("doc_id"),
          array_join(slice(split(col("text"), " "), 10, 5), " ").as("phrase"))
        .repartition(s.sparkContext.defaultParallelism)
      val m = ph.join(
        broadcast(d.select(col("doc_id").as("other_id"), col("text"))),
        col("text").contains(col("phrase")) && col("other_id") =!= col("doc_id"))
      m.groupBy("doc_id")
        .agg(min(col("other_id")).as("matched_doc"), count(lit(1)).as("_n"))
        .filter(col("_n") === 1)
        .select("doc_id", "matched_doc")
    },

    // ---- J7b: the same containment join on the inverted-index scale
    //      path (ops.PhraseIndexJoin) — same oracle; the broadcast nested
    //      loop above stays as the small-scale verifier. Candidate
    //      generation is an equi join on the phrase's inner token n-gram
    //      (a necessary condition of character containment), residual
    //      contains() runs on candidates only — the shape that survives a
    //      corpus too big to broadcast. ----------------------------------
    "j7b_phrase_index_match" -> Q(
      """WITH ph AS (SELECT doc_id, array_to_string(string_split(text, ' ')[10:14], ' ') AS phrase
        |            FROM documents),
        |m AS (SELECT ph.doc_id, d.doc_id AS other_id
        |      FROM ph JOIN documents d
        |        ON contains(d.text, ph.phrase) AND d.doc_id <> ph.doc_id)
        |SELECT doc_id, min(other_id) AS matched_doc FROM m
        |GROUP BY doc_id HAVING count(*) = 1""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val ph = d.select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 10, 5), " ").as("phrase"))
      PhraseIndexJoin.containsJoin(ph,
          d.select(col("doc_id").as("other_id"), col("text")),
          "doc_id", "phrase", "other_id", "text")
        .filter(col("other_id") =!= col("doc_id"))
        .groupBy("doc_id")
        .agg(min(col("other_id")).as("matched_doc"), count(lit(1)).as("_n"))
        .filter(col("_n") === 1)
        .select("doc_id", "matched_doc")
    },

    // ---- J8: blocked dedup-candidate self-join ------------------------
    "j8_dedup_candidates" -> Q(
      """SELECT a.doc_id AS id1, b.doc_id AS id2, a.lang
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang
        | AND floor(a.n_chars / 100) = floor(b.n_chars / 100)
        | AND split_part(a.text, ' ', 1) = split_part(b.text, ' ', 1)
        | AND a.doc_id < b.doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id").as("id1"), col("lang"),
        floor(col("n_chars") / 100).as("bkt1"),
        element_at(split(col("text"), " "), 1).as("w1"))
      val b = d.select(col("doc_id").as("id2"), col("lang").as("lang2"),
        floor(col("n_chars") / 100).as("bkt2"),
        element_at(split(col("text"), " "), 1).as("w2"))
      a.join(b, col("lang") === col("lang2") && col("bkt1") === col("bkt2") &&
          col("w1") === col("w2") && col("id1") < col("id2"))
        .select("id1", "id2", "lang")
    },

    // ---- A1: counts (global + filtered) -------------------------------
    "a1_counts" -> Q(
      """SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
        |       (SELECT count(*) FROM orders) AS n_orders,
        |       (SELECT count(*) FROM lineitem WHERE l_discount > 0.05) AS n_discounted""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.agg(count(lit(1)).as("n_lineitem"),
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
        .crossJoin(t(s, dir, "orders").agg(count(lit(1)).as("n_orders")))
        .select("n_lineitem", "n_orders", "n_discounted")
    },

    // ---- A2+A3: conditional count by group + status CASE --------------
    "a2_a3_crawl_status" -> Q(
      """SELECT user_id, count(*) AS n_total,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
        |       CASE WHEN count(CASE WHEN event_type = 'error' THEN 1 END) = 0 THEN 'complete'
        |            WHEN count(CASE WHEN event_type = 'error' THEN 1 END) < 3 THEN 'partial'
        |            ELSE 'incomplete' END AS status
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val nErr = count(when(col("event_type") === "error", 1))
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_total"), nErr.as("n_err"),
          when(nErr === 0, "complete").when(nErr < 3, "partial")
            .otherwise("incomplete").as("status"))
    },

    // ---- A4: GROUP BY + HAVING count > 1 ------------------------------
    "a4_having" -> Q(
      """SELECT n_chars, count(*) AS n_docs, min(doc_id) AS min_doc
        |FROM documents GROUP BY n_chars HAVING count(*) > 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("n_chars")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .filter(col("n_docs") > 1)
    },

    // ---- A5: min/max scalar aggregates --------------------------------
    "a5_minmax" -> Q(
      """SELECT date_trunc('second', min(ts)) AS min_ts,
        |       date_trunc('second', max(ts)) AS max_ts, count(*) AS n
        |FROM events""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .agg(date_trunc("second", min(col("ts"))).as("min_ts"),
          date_trunc("second", max(col("ts"))).as("max_ts"),
          count(lit(1)).as("n"))
    },

    // ---- A7: distinct --------------------------------------------------
    "a7_distinct" -> Q(
      "SELECT DISTINCT lang, source FROM documents") { (s, dir) =>
      t(s, dir, "documents").select("lang", "source").distinct()
    },

    // ---- A8: distinct-set aggregate ------------------------------------
    "a8_distinct_set_agg" -> Q(
      """SELECT lang,
        |       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          countDistinct(col("source")).as("n_sources"))
    },

    // ---- A9: bool_or / bool_and group predicates ----------------------
    "a9_bool_agg" -> Q(
      """SELECT user_id,
        |       cast(bool_or(event_type = 'error') AS int) AS any_error,
        |       cast(bool_and(value < 480) AS int) AS all_small
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("cast(bool_or(event_type = 'error') as int)").as("any_error"),
          expr("cast(bool_and(value < 480) as int)").as("all_small"))
    },

    // ---- A10+F17: match-cardinality counters, integer-floor percent ---
    "a10_f17_floor_pct" -> Q(
      """SELECT event_type, count(*) AS n,
        |       cast(floor(100 * count(*) / (SELECT count(*) FROM events)) AS bigint) AS pct
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val byType = t(s, dir, "events").groupBy("event_type").agg(count(lit(1)).as("n"))
      byType
        .withColumn("_total", sum(col("n")).over(Window.partitionBy()))
        .withColumn("pct", floor(lit(100) * col("n") / col("_total")))
        .select("event_type", "n", "pct")
    },

    // ---- A11+F12: gaps-and-islands year condense ----------------------
    "a11_islands_condense" -> Q(
      """WITH y AS (SELECT DISTINCT o_custkey AS c, year(o_orderdate) AS y FROM orders),
        |r AS (SELECT c, y, y - row_number() OVER (PARTITION BY c ORDER BY y) AS g FROM y),
        |i AS (SELECT c, min(y) AS lo, max(y) AS hi FROM r GROUP BY c, g)
        |SELECT c AS o_custkey,
        |       string_agg(CASE WHEN lo = hi THEN lo::varchar
        |                       ELSE lo::varchar || '-' || hi::varchar END, ', ' ORDER BY lo) AS years
        |FROM i GROUP BY c""".stripMargin) { (s, dir) =>
      val y = t(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      Islands.condense(y, Seq("o_custkey"), "yr", "years")
    },

    // ---- A11 (UDAF form): same condense as a typed Aggregator ----------
    "a11b_condense_udaf" -> Q(
      """WITH y AS (SELECT DISTINCT o_custkey AS c, year(o_orderdate) AS y FROM orders),
        |r AS (SELECT c, y, y - row_number() OVER (PARTITION BY c ORDER BY y) AS g FROM y),
        |i AS (SELECT c, min(y) AS lo, max(y) AS hi FROM r GROUP BY c, g)
        |SELECT c AS o_custkey,
        |       string_agg(CASE WHEN lo = hi THEN lo::varchar
        |                       ELSE lo::varchar || '-' || hi::varchar END, ', ' ORDER BY lo) AS years
        |FROM i GROUP BY c""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(graft.functions.CondenseAgg.toColumn.name("years"))
        .toDF("o_custkey", "years")
    },

    // ---- W1: pivot (long → wide) ---------------------------------------
    "w1_pivot" -> Q(
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'view') AS view,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0)
    },

    // ---- W2: conditional per-group sort key (stamp-coalesce shape) ----
    "w2_conditional_sortkey" -> Q(
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS day,
        |       cast(bool_or(value > 400) OVER (PARTITION BY user_id, cast(ts AS date)) AS int) AS any_big,
        |       CASE WHEN bool_or(value > 400) OVER (PARTITION BY user_id, cast(ts AS date))
        |            THEN event_id ELSE cast(round(value * 100) AS bigint) END AS sort_key
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("ts").cast("date"))
      val anyBig = expr("bool_or(value > 400)").over(w)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          anyBig.cast("int").as("any_big"),
          when(anyBig, col("event_id"))
            .otherwise(round(col("value") * 100).cast("long")).as("sort_key"))
    },

    // ---- W3: uniqueness-gated assignment ------------------------------
    "w3_unique_gate" -> Q(
      """WITH p AS (SELECT * FROM events
        |           WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-02'),
        |c AS (SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id) AS n FROM p)
        |SELECT event_id, user_id FROM c WHERE n = 1""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "events").filter(col("event_type") === "purchase" &&
        col("ts") < lit("2024-01-02").cast("timestamp"))
      p.withColumn("_n", count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("_n") === 1)
        .select("event_id", "user_id")
    },

    // ---- O1+O2+O3: multi-column asc/desc sort + limit (top-k) ---------
    "o_topk_orders" -> Q(
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },

    // ---- O5: keyset-free pagination — ORDER BY + LIMIT/OFFSET (Spark
    //      supports OFFSET since 3.4; a total order makes the page
    //      deterministic). The API-paging shape; at corpus scale deep
    //      offsets degrade (every page sorts the prefix) — keyset
    //      pagination (WHERE key > last_seen, s3's work-queue shape) is
    //      the scale path, which is why BOTH exist here. ---------------
    "o5_pagination" -> Q(
      """SELECT o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15 OFFSET 30""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(30).limit(15)
        .select("o_orderkey", "o_totalprice")
    },

    // ---- U1: set difference (anti join) -------------------------------
    "u1_anti_join" -> Q(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001)""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(year(col("o_orderdate")) === 2001)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey")
    },

    // ---- U2: union with provenance tag --------------------------------
    "u2_union_tagged" -> Q(
      """SELECT o_orderkey, 'high' AS tag FROM orders WHERE o_totalprice > 300000
        |UNION ALL
        |SELECT o_orderkey, 'late' AS tag FROM orders WHERE year(o_orderdate) = 2001""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey"), lit("high").as("tag"))
        .unionByName(
          o.filter(year(col("o_orderdate")) === 2001)
            .select(col("o_orderkey"), lit("late").as("tag")))
    },

    // ---- U3: dedup on key subset --------------------------------------
    "u3_dropdup" -> Q(
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, dir) =>
      t(s, dir, "customer").dropDuplicates(Seq("c_mktsegment", "c_nationkey"))
        .select("c_mktsegment", "c_nationkey")
    },

    // ---- T1: incremental watermark (new-since-max-processed) ----------
    "t1_watermark_incremental" -> Q(
      """WITH wm AS (SELECT max(ts) AS m FROM events WHERE ts < TIMESTAMP '2024-01-15')
        |SELECT event_type, count(*) AS n FROM events, wm WHERE ts > m GROUP BY event_type""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
      val wm = e.filter(col("ts") < lit("2024-01-15").cast("timestamp"))
        .agg(max(col("ts")).as("m"))
      e.crossJoin(broadcast(wm))
        .filter(col("ts") > col("m"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
    }
  )
}
