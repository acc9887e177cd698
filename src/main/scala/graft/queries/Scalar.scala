package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Scalar-function operator inventory (SURVEY.md §2.8): enum codecs,
  * sequence explode, regex extraction, date formatting, string kernels.
  */
object Scalar {

  val entries: Map[String, Q] = Map(

    // ---- F1+F2: bidirectional enum codec (letter ↔ int) ---------------
    "f2_enum_codec" -> Q(
      """WITH coded AS (
        |  SELECT CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
        |              WHEN 'view' THEN 3 WHEN 'purchase' THEN 4 ELSE 5 END AS code
        |  FROM events)
        |SELECT code,
        |       CASE code WHEN 1 THEN 'S' WHEN 2 THEN 'C' WHEN 3 THEN 'V'
        |            WHEN 4 THEN 'P' ELSE 'E' END AS letter,
        |       count(*) AS n
        |FROM coded GROUP BY code""".stripMargin) { (s, dir) =>
      val code = when(col("event_type") === "signup", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "view", 3)
        .when(col("event_type") === "purchase", 4)
        .otherwise(5)
      val letter = when(col("code") === 1, "S").when(col("code") === 2, "C")
        .when(col("code") === 3, "V").when(col("code") === 4, "P").otherwise("E")
      t(s, dir, "events")
        .select(code.as("code"))
        .groupBy("code")
        .agg(count(lit(1)).as("n"))
        .withColumn("letter", letter)
        .select("code", "letter", "n")
    },

    // ---- F13: year-range parse → sequence explode ---------------------
    "f13_explode_sequence" -> Q(
      """WITH span AS (SELECT o_custkey, year(min(o_orderdate)) AS lo, year(max(o_orderdate)) AS hi
        |              FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, cast(u.yr AS int) AS yr
        |FROM span, unnest(generate_series(lo, hi)) AS u(yr)""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(year(min(col("o_orderdate"))).as("lo"), year(max(col("o_orderdate"))).as("hi"))
        .select(col("o_custkey"),
          explode(sequence(col("lo"), col("hi"))).as("yr"))
    },

    // ---- F14: regex extraction ----------------------------------------
    "f14_regex_extract" -> Q(
      """SELECT cast(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS int) AS brand_num,
        |       count(*) AS n
        |FROM part GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"))
        .groupBy("brand_num")
        .agg(count(lit(1)).as("n"))
    },

    // ---- F15: date/time formatting + parts ----------------------------
    "f15_date_format" -> Q(
      """SELECT strftime(ts, '%m/%d/%Y') AS mdy, year(ts) AS y, month(ts) AS m,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "MM/dd/yyyy").as("mdy"),
          year(col("ts")).as("y"), month(col("ts")).as("m"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- F15b: date arithmetic (add/diff/truncate/boundaries) ----------
    "f15b_date_arith" -> Q(
      """SELECT o_orderkey,
        |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
        |       date_diff('day', DATE '1992-01-01', o_orderdate) AS age_days,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |       cast(dayofweek(o_orderdate) AS int) AS dow
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,
      // ansi twin: Spark's dayofweek is 1-based Sunday=1 where DuckDB's
      // is 0-based Sunday=0 — the one semantic (not syntactic) gap here,
      // so the mechanical translation can't be row-exact
      ansi = """SELECT o_orderkey,
        |       date_format(o_orderdate + INTERVAL 30 DAY, 'yyyy-MM-dd') AS due,
        |       datediff(o_orderdate, DATE '1992-01-01') AS age_days,
        |       date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
        |       date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end,
        |       cast(dayofweek(o_orderdate) - 1 AS int) AS dow
        |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("age_days"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"))
    },

    // ---- F16b: math kernel (abs/mod/power/sqrt/log/round family) -------
    "f16b_math_funcs" -> Q(
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS dev,
        |       cast(l_partkey % 7 AS bigint) AS bucket,
        |       round(power(l_quantity, 2), 4) AS qty_sq,
        |       round(sqrt(l_extendedprice), 6) AS price_root,
        |       round(ln(l_extendedprice + 1), 6) AS price_ln,
        |       cast(ceil(l_quantity / 8) AS bigint) AS pallets,
        |       cast(floor(l_quantity / 8) AS bigint) AS full_pallets
        |FROM lineitem WHERE l_orderkey < 300""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("dev"),
          (col("l_partkey") % 7).as("bucket"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_root"),
          round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
          ceil(col("l_quantity") / 8).as("pallets"),
          floor(col("l_quantity") / 8).as("full_pallets"))
    },

    // ---- F16c: null-handling conditionals (coalesce/nullif/greatest) ---
    "f16c_null_conditionals" -> Q(
      """SELECT user_id,
        |       coalesce(nullif(event_type, 'error'), 'recovered') AS label,
        |       greatest(value, 100.0) AS floored,
        |       least(value, 400.0) AS capped,
        |       CASE WHEN value IS NULL THEN -1 ELSE 1 END AS has_value
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(col("user_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("recovered")).as("label"),
          greatest(col("value"), lit(100.0)).as("floored"),
          least(col("value"), lit(400.0)).as("capped"),
          when(col("value").isNull, -1).otherwise(1).as("has_value"))
    },

    // ---- F16: string kernel (split/contains/upper/trim) ---------------
    "f16_string_funcs" -> Q(
      """SELECT split_part(text, ' ', 1) AS first_word,
        |       cast(contains(text, 'spark') AS int) AS has_spark,
        |       upper(lang) AS lang_u, count(*) AS n
        |FROM documents GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(element_at(split(col("text"), " "), 1).as("first_word"),
          col("text").contains("spark").cast("int").as("has_spark"),
          upper(col("lang")).as("lang_u"))
        .agg(count(lit(1)).as("n"))
    }
  )
}
