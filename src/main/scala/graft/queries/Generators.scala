package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Generator (1→N, the UDTF superset the reference cannot express —
  * SURVEY.md §2.6: TransformFunc is total 1→1) and the full-outer join
  * completing the outer-join matrix. */
object Generators {

  /** Explode each document into (doc_id, pos, token) rows — the
    * tokenize generator. Restricted to doc_id < 50 to keep the driver
    * compare payload bounded. */
  def explodeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
      .orderBy($"doc_id", $"pos")
  }

  val explodeTokensSql: String =
    """SELECT doc_id,
      | CAST(unnest(range(0, len(string_split(text, ' ')))) AS INT) AS pos,
      | unnest(string_split(text, ' ')) AS token
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id, pos""".stripMargin

  /** Full outer join: per-nation customer and supplier counts, either
    * side may be absent. */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
      .groupBy($"c_nationkey".as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val p = Tables(s, dir, "supplier")
      .groupBy($"s_nationkey".as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(p, $"nk_c" === $"nk_s", "full_outer")
      .select(coalesce($"nk_c", $"nk_s").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nationkey")
  }

  val joinFullOuterSql: String =
    """SELECT COALESCE(c.nk, s.nk) AS nationkey,
      | COALESCE(c.n_cust, 0) AS n_cust,
      | COALESCE(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      |  ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  val queries: Map[String, QFn] = Map(
    "explode_tokens" -> (explodeTokens _),
    "join_full_outer" -> (joinFullOuter _))

  val oracles: Map[String, String] = Map(
    "explode_tokens" -> explodeTokensSql,
    "join_full_outer" -> joinFullOuterSql)
}
