package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Scalar function surface (reference: none built in — all row compute is
  * user Haskell in TransformFuncs, SURVEY.md §2.6; Spark's functions
  * library substitutes): string, date/time, math, conditional, JSON.
  * Every function used here has identical semantics in DuckDB so results
  * hash-match. */
object Scalars {

  /** String functions over part. */
  def scalarString(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_brand").as("lbrand"),
        length($"p_name").as("name_len"),
        substring($"p_type", 1, 5).as("type5"),
        concat_ws("|", $"p_brand", $"p_type").as("joined"),
        regexp_replace($"p_name", "a", "@").as("subbed"),
        trim(lit("  x  ")).as("trimmed"),
        ($"p_name".contains("o")).as("has_o"),
        ($"p_type".startsWith("PROMO")).as("is_promo"))
      .orderBy($"p_partkey")
  }

  val scalarStringSql: String =
    """SELECT p_partkey,
      | UPPER(p_name) AS uname, LOWER(p_brand) AS lbrand,
      | CAST(LENGTH(p_name) AS INT) AS name_len,
      | SUBSTRING(p_type, 1, 5) AS type5,
      | CONCAT_WS('|', p_brand, p_type) AS joined,
      | REGEXP_REPLACE(p_name, 'a', '@', 'g') AS subbed,
      | TRIM('  x  ') AS trimmed,
      | CONTAINS(p_name, 'o') AS has_o,
      | STARTS_WITH(p_type, 'PROMO') AS is_promo
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time functions over orders. */
  def scalarDate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"),
        to_date(date_trunc("month", $"o_orderdate")).as("month_start"),
        datediff(to_date(lit("2000-01-01")), to_date($"o_orderdate"))
          .as("days_to_y2k"))
      .orderBy($"o_orderkey")
  }

  val scalarDateSql: String =
    """SELECT o_orderkey,
      | CAST(YEAR(o_orderdate) AS INT) AS y,
      | CAST(MONTH(o_orderdate) AS INT) AS m,
      | CAST(DAY(o_orderdate) AS INT) AS d,
      | CAST(QUARTER(o_orderdate) AS INT) AS q,
      | CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
      | CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math functions (exact or correctly-rounded only, so bits match). */
  def scalarMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer")
      .select(
        $"c_custkey",
        abs($"c_acctbal").as("abs_bal"),
        round($"c_acctbal", 1).as("round1"),
        floor($"c_acctbal").cast("long").as("fl"),
        ceil($"c_acctbal").cast("long").as("ce"),
        sqrt(abs($"c_acctbal")).as("sq"),
        ($"c_custkey" % 7).as("mod7"),
        greatest($"c_acctbal", lit(0.0)).as("pos_bal"),
        least($"c_acctbal", lit(0.0)).as("neg_bal"),
        signum($"c_acctbal").as("sgn"))
      .orderBy($"c_custkey")
  }

  val scalarMathSql: String =
    """SELECT c_custkey,
      | ABS(c_acctbal) AS abs_bal,
      | ROUND(c_acctbal, 1) AS round1,
      | CAST(FLOOR(c_acctbal) AS BIGINT) AS fl,
      | CAST(CEIL(c_acctbal) AS BIGINT) AS ce,
      | SQRT(ABS(c_acctbal)) AS sq,
      | c_custkey % 7 AS mod7,
      | GREATEST(c_acctbal, 0.0) AS pos_bal,
      | LEAST(c_acctbal, 0.0) AS neg_bal,
      | CAST(SIGN(c_acctbal) AS DOUBLE) AS sgn
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** CASE WHEN + JSON field extraction over events.props. */
  def scalarCaseJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select(
        $"event_id",
        when($"value" >= 250, "high").when($"value" >= 100, "mid")
          .otherwise("low").as("bucket"),
        get_json_object($"props", "$.k").cast("int").as("k"),
        ($"event_type" === "purchase").as("is_purchase"))
      .orderBy($"event_id")
  }

  val scalarCaseJsonSql: String =
    """SELECT event_id,
      | CASE WHEN value >= 250 THEN 'high'
      |      WHEN value >= 100 THEN 'mid' ELSE 'low' END AS bucket,
      | CAST(props->>'$.k' AS INT) AS k,
      | event_type = 'purchase' AS is_purchase
      |FROM events ORDER BY event_id""".stripMargin

  /** Array/higher-order functions over the token array of each document:
    * element access, slice, distinct, sort, filter/transform/aggregate
    * lambdas — outputs reduced to scalars so both engines hash the same
    * flat schema. */
  def scalarArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("ts", split($"text", " "))
      .select(
        $"doc_id",
        size($"ts").as("n_tokens"),
        element_at($"ts", 1).as("first_tok"),
        element_at($"ts", -1).as("last_tok"),
        array_join(slice($"ts", 1, 3), "_").as("head3"),
        size(array_distinct($"ts")).as("n_distinct"),
        array_contains($"ts", "the").as("has_the"),
        array_join(array_sort(array_distinct(slice($"ts", 1, 5))), ",").as("sorted5"),
        aggregate(transform($"ts", t => length(t)), lit(0), (a, x) => a + x)
          .as("sum_len"),
        size(filter($"ts", t => length(t) > 4)).as("n_long"))
      .orderBy($"doc_id")
  }

  val scalarArraySql: String =
    """SELECT doc_id,
      | CAST(len(ts) AS INT) AS n_tokens,
      | ts[1] AS first_tok,
      | ts[-1] AS last_tok,
      | array_to_string(list_slice(ts, 1, 3), '_') AS head3,
      | CAST(len(list_distinct(ts)) AS INT) AS n_distinct,
      | list_contains(ts, 'the') AS has_the,
      | array_to_string(list_sort(list_distinct(list_slice(ts, 1, 5))), ',') AS sorted5,
      | CAST(list_sum(list_transform(ts, t -> length(t))) AS INT) AS sum_len,
      | CAST(len(list_filter(ts, t -> length(t) > 4)) AS INT) AS n_long
      |FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Regex scalar family: extract / count / global replace / match test.
    * Patterns stay in the class both engines' regex dialects (Java vs
    * RE2) agree on — character classes, quantifiers, no backrefs. */
  def scalarRegex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        regexp_extract($"text", "([a-z]{7,})", 1).as("first_long_word"),
        regexp_count($"text", lit("[aeiou]{2}")).cast("long")
          .as("n_double_vowels"),
        substring(regexp_replace($"text", "[aeiou]", "_"), 1, 40)
          .as("devoweled_prefix"),
        $"text".rlike("data").as("mentions_data"))
      .orderBy($"doc_id")
  }

  val scalarRegexSql: String =
    """SELECT doc_id,
      | regexp_extract(text, '([a-z]{7,})', 1) AS first_long_word,
      | CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT) AS n_double_vowels,
      | substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_prefix,
      | regexp_matches(text, 'data') AS mentions_data
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "scalar_regex" -> (scalarRegex _),
    "scalar_string" -> (scalarString _),
    "scalar_date" -> (scalarDate _),
    "scalar_math" -> (scalarMath _),
    "scalar_array" -> (scalarArray _),
    "scalar_case_json" -> (scalarCaseJson _))

  val oracles: Map[String, String] = Map(
    "scalar_regex" -> scalarRegexSql,
    "scalar_string" -> scalarStringSql,
    "scalar_date" -> scalarDateSql,
    "scalar_math" -> scalarMathSql,
    "scalar_array" -> scalarArraySql,
    "scalar_case_json" -> scalarCaseJsonSql)
}
