package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, document fingerprinting, and n-gram-heuristic
  * language ID. All are pure column expressions (whole-stage codegen'd,
  * no UDFs) and every metric uses exact integer arithmetic or a single
  * final division so the DuckDB oracle hash-matches.
  */
object Text {

  /** Stopword lists for the n-gram language heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "有", "和", "人", "不"))

  /** Tokens / distinct tokens / type-token ratio / average token length /
    * md5 fingerprint of the sorted distinct token set (canonical
    * fingerprint dedup key). */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("ts", split($"text", " "))
      .select(
        $"doc_id",
        $"lang",
        size($"ts").as("n_tokens"),
        size(array_distinct($"ts")).as("n_distinct"),
        (size(array_distinct($"ts")).cast("double") / size($"ts")).as("ttr"),
        (aggregate(transform($"ts", t => length(t)), lit(0),
          (acc, x) => acc + x).cast("double") / size($"ts")).as("avg_len"),
        md5(concat_ws(" ", array_sort(array_distinct($"ts"))))
          .as("fingerprint"))
      .orderBy($"doc_id")
  }

  val textStatsSql: String =
    """SELECT doc_id, lang,
      | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
      | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS ttr,
      | CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS avg_len,
      | md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
      |   AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword ratio, short-token ratio, repetition —
    * the heuristics used for pretraining-corpus filtering, as exact
    * integer counts plus single divisions. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val allStops = langStopwords.flatMap(_._2).distinct.sorted
    Tables(s, dir, "documents")
      .withColumn("ts", split($"text", " "))
      .select(
        $"doc_id",
        size($"ts").as("n_tokens"),
        size(filter($"ts", t => t.isin(allStops.map(x => x: Any): _*)))
          .as("n_stop"),
        (size(filter($"ts", t => t.isin(allStops.map(x => x: Any): _*)))
          .cast("double") / size($"ts")).as("stop_ratio"),
        size(filter($"ts", t => length(t) <= 2)).as("n_short"),
        ($"n_chars" >= 100 && $"n_chars" <= 450).as("len_ok"))
      .orderBy($"doc_id")
  }

  val textQualitySql: String = {
    val stops = langStopwords.flatMap(_._2).distinct.sorted
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       | CAST(len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS INT) AS n_stop,
       | CAST(len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS DOUBLE)
       |   / len(string_split(text, ' ')) AS stop_ratio,
       | CAST(len(list_filter(string_split(text, ' '), t -> length(t) <= 2)) AS INT) AS n_short,
       | n_chars >= 100 AND n_chars <= 450 AS len_ok
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** (score, lang) structs per language for a text column — argmax via
    * array_max gives the language guess with a deterministic tie-break
    * (higher lang code wins). Shared by textLangid and Pipeline. */
  def langScores(text: Column): Column = {
    val scored = langStopwords.map { case (lang, words) =>
      struct(
        size(array_intersect(array_distinct(split(text, " ")),
          lit(words.toArray))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*))
  }

  /** SQL twin of `langScores(...).getField("lang")`: a CASE chain in
    * descending lang order so ties resolve to the greater code. */
  def langGuessSql(textExpr: String): String = {
    def cnt(words: Seq[String]): String = {
      val l = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect(list_distinct(string_split($textExpr, ' ')), $l))"
    }
    val by = langStopwords.toMap
    val (de, en, es, fr, zh) =
      (cnt(by("de")), cnt(by("en")), cnt(by("es")), cnt(by("fr")), cnt(by("zh")))
    s"""CASE WHEN $zh >= $en AND $zh >= $de AND $zh >= $es AND $zh >= $fr THEN 'zh'
       |     WHEN $fr >= $en AND $fr >= $de AND $fr >= $es THEN 'fr'
       |     WHEN $es >= $en AND $es >= $de THEN 'es'
       |     WHEN $en >= $de THEN 'en'
       |     ELSE 'de' END""".stripMargin
  }

  /** Language ID: count distinct-token hits against each language's
    * stopword list, argmax with deterministic tie-break (higher lang code
    * wins ties — array_max over (score, lang) structs). */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang".as("labeled"),
        langScores($"text").getField("lang").as("guessed"),
        langScores($"text").getField("score").as("score"))
      .orderBy($"doc_id")
  }

  val textLangidSql: String = {
    def cnt(words: Seq[String]): String = {
      val l = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect(list_distinct(string_split(text, ' ')), $l))"
    }
    val by = langStopwords.toMap
    // descending lang order so ties resolve to the greater code, matching
    // array_max over (score, lang) structs
    s"""WITH c AS (SELECT doc_id, lang AS labeled,
       |  ${cnt(by("de"))} AS de_c, ${cnt(by("en"))} AS en_c,
       |  ${cnt(by("es"))} AS es_c, ${cnt(by("fr"))} AS fr_c,
       |  ${cnt(by("zh"))} AS zh_c
       | FROM documents)
       |SELECT doc_id, labeled,
       | CASE WHEN zh_c >= en_c AND zh_c >= de_c AND zh_c >= es_c AND zh_c >= fr_c THEN 'zh'
       |      WHEN fr_c >= en_c AND fr_c >= de_c AND fr_c >= es_c THEN 'fr'
       |      WHEN es_c >= en_c AND es_c >= de_c THEN 'es'
       |      WHEN en_c >= de_c THEN 'en'
       |      ELSE 'de' END AS guessed,
       | CAST(GREATEST(de_c, en_c, es_c, fr_c, zh_c) AS INT) AS score
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish regex tokenization (word pieces + punctuation as separate
    * tokens) and a polynomial rolling-hash fingerprint — both in exact
    * integer arithmetic so the oracle hash-matches. The rolling hash is
    * the order-SENSITIVE fingerprint (md5-of-sorted-set in textStats is
    * the order-free one). */
  def textTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Column API, not expr strings: SQL literals would eat the \s escape
    val tokenRe = lit("[a-z0-9]+|[^a-z0-9\\s]")
    // Spark's split("",-1) keeps a trailing empty string — drop empties
    val chars = filter(split($"text", ""), c => c =!= "")
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        size(split($"text", " ")).as("n_ws_tokens"),
        size(regexp_extract_all($"text", tokenRe, lit(0))).as("n_bpe_tokens"),
        aggregate(transform(chars, c => ascii(c).cast("long")), lit(7L),
          (acc, x) => (acc * 31 + x) % 2147483647L).as("rolling_hash"))
      .orderBy($"doc_id")
  }

  val textTokensSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
      | list_reduce(
      |   list_prepend(CAST(7 AS BIGINT),
      |     list_transform(string_split_regex(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |   (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals: documents whose duplicate-token
    * mass is high are boilerplate/spam candidates. Per doc: total
    * tokens, distinct tokens, and the count of the single most frequent
    * token; flag docs where >= 20% of tokens are repeats (exact integer
    * threshold 5·(n_tokens − n_distinct) >= n_tokens). One explode +
    * two aggregations — the (doc_id, token) groupBy is map-side
    * combinable, so the shuffle carries per-partition partial counts,
    * not raw tokens; no windows, no UDFs. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max($"c").as("top_tok_n"))
      .where(lit(5) * ($"n_tokens" - $"n_distinct") >= $"n_tokens")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_tok_n")
      .orderBy($"doc_id")
  }

  val textRepetitionSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |per AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |        CAST(COUNT(*) AS BIGINT) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_tok_n
      |        FROM per GROUP BY 1)
      |SELECT doc_id, n_tokens, n_distinct, top_tok_n
      |FROM agg WHERE 5 * (n_tokens - n_distinct) >= n_tokens
      |ORDER BY doc_id""".stripMargin

  /** PII detection + redaction (the C4-style scrub stage): count and
    * redact emails, IPv4 addresses, and phone numbers with regexes that
    * parse identically under Java regex and DuckDB's RE2. The corpus is
    * synthetic, so deterministic PII fixtures are planted inside the
    * query (doc_id-derived, identical in both engines) — the detection
    * and redaction paths are then exercised on known-positive rows, and
    * the redacted-text fingerprint proves the REPLACEMENT is
    * byte-identical, not just the counts. Pure column expressions, no
    * UDFs. */
  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val phoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  def textPii(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Tables(s, dir, "documents")
      .withColumn("body", concat($"text",
        when($"doc_id" % 17 === 3,
          concat(lit(" contact user"), $"doc_id", lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 23 === 5,
          concat(lit(" from 10.0."), ($"doc_id" % 200).cast("string"),
            lit(".1 call 555-867-530"), ($"doc_id" % 10).cast("string")))
          .otherwise(lit(""))))
    planted.select(
      $"doc_id",
      regexp_count($"body", lit(emailRe)).cast("long").as("n_email"),
      regexp_count($"body", lit(ipRe)).cast("long").as("n_ip"),
      regexp_count($"body", lit(phoneRe)).cast("long").as("n_phone"),
      md5(regexp_replace(regexp_replace(regexp_replace($"body",
        emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>"))
        .as("redacted_fp"))
      .orderBy($"doc_id")
  }

  val textPiiSql: String =
    """WITH planted AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 17 = 3
      |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 23 = 5
      |      THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
      |           '.1 call 555-867-530' || CAST(doc_id % 10 AS VARCHAR)
      |      ELSE '' END AS body
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(body, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(body, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(body, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
      |  md5(regexp_replace(regexp_replace(regexp_replace(body,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_fp
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary statistics: per-token document frequency over
    * the whole corpus — the input to stopword discovery, vocab pruning,
    * and idf weighting in every text pipeline. Exact and integer-only:
    * tokens DEDUPLICATED per document (df counts documents, not
    * occurrences), then one count per token, top-25 by
    * (df DESC, token ASC) for a deterministic result. Scale shape:
    * explode + per-doc distinct + one aggregation — the distinct is
    * per-document-local (array_distinct before the explode, no extra
    * shuffle), the groupBy partial-aggregates map-side, and the top-25
    * is a TakeOrdered, never a global sort. */
  def textDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("token"))
      .where(length($"token") > 0)
      // (doc_id, token) pairs are already unique after the per-doc
      // array_distinct, so a plain count IS the document frequency —
      // no second distinct-aggregation level over the exploded stream
      .groupBy($"token")
      .agg(count($"doc_id").cast("long").as("df"))
      .orderBy($"df".desc, $"token".asc)
      .limit(25)
  }

  val textDfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents)
      |SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |FROM tok WHERE len(token) > 0
      |GROUP BY token ORDER BY df DESC, token ASC LIMIT 25""".stripMargin

  /** Out-of-vocabulary quality gate (the CCNet/C4 "common token"
    * filter): the vocabulary is the corpus's top-16 tokens by document
    * frequency — DERIVED from the data (the [[textDf]] statistic put to
    * work), not a fixed list — and each document scores the fraction of
    * its token occurrences outside it. The vocab is metadata-sized
    * (the stopword-list shape: one tiny aggregate collected to the
    * driver, broadcast as a literal into the scoring projection), so
    * the scoring pass is a pure column expression over the corpus —
    * no join, no shuffle beyond the vocab aggregate. Exact integers +
    * one final division. */
  def textOov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab: Seq[String] = Tables(s, dir, "documents")
      .select(explode(array_distinct(split($"text", " "))).as("t"))
      .where(length($"t") > 0)
      .groupBy($"t").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"t".asc).limit(16)
      .collect().map(_.getString(0)).toSeq
    val ts = filter(split($"text", " "), t => length(t) > 0)
    Tables(s, dir, "documents")
      .withColumn("ts", ts)
      .select(
        $"doc_id",
        size($"ts").as("n_tokens"),
        size(filter($"ts",
          t => !t.isin(vocab.map(x => x: Any): _*))).as("n_oov"))
      // guarded ratio: a token-free document is NULL in both engines
      // (unguarded, Spark's Divide gives NULL but DuckDB gives NaN)
      .withColumn("oov_ratio",
        when($"n_tokens" > 0, $"n_oov".cast("double") / $"n_tokens"))
      .orderBy($"doc_id")
  }

  val textOovSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |  FROM documents),
      |vocab AS (
      |  SELECT list(t ORDER BY t) AS vs FROM (
      |    SELECT t FROM (
      |      SELECT t, COUNT(*) AS df FROM tok WHERE len(t) > 0 GROUP BY t)
      |    ORDER BY df DESC, t LIMIT 16)),
      |per AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tokens,
      |    len(list_filter(string_split(text, ' '),
      |      x -> len(x) > 0 AND NOT list_contains(v.vs, x))) AS n_oov
      |  FROM documents CROSS JOIN vocab v)
      |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
      |  CAST(n_oov AS INT) AS n_oov,
      |  CASE WHEN n_tokens > 0
      |    THEN CAST(n_oov AS DOUBLE) / n_tokens END AS oov_ratio
      |FROM per ORDER BY doc_id""".stripMargin

  /** Bigram-LM fluency score (the CCNet-style LM quality filter with a
    * corpus-trained model): score each document by the mean corpus
    * frequency of its token TRANSITIONS — fluent text reuses common
    * transitions, keyboard-mash and boilerplate-noise text does not.
    *
    * The model is the corpus bigram table pruned to the TOP
    * [[LmModelCap]] bigrams by count (min count 3; ties broken
    * lexicographically, so the cut is deterministic in both engines);
    * transitions outside it floor to 1 (the unseen/rare smoothing).
    * The rank cap — not a count threshold — is what makes the model
    * BOUNDED BY CONSTRUCTION at any corpus size (a fixed threshold
    * admits ~linearly many bigram types as the corpus grows), so the
    * broadcast is always driver-safe and scoring is a broadcast LEFT
    * join: the corpus-sized side never shuffles on the zipfian bigram
    * key (a hash-partitioned join there would send every "of the" to
    * one task), and the only exchange is the per-doc aggregation on
    * the uniform doc_id. Exact integers end-to-end; the mean is a
    * scaled integer division. */
  val LmModelCap = 65536
  def textLmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreFrom(s, Tables(s, dir, "documents"), LmModelCap)

  /** The scorer over any `(doc_id, text)` frame with the cap as a
    * parameter — factored so the floor/cap/tie contracts are pinnable
    * on a synthetic fixture (TextLmSpec). */
  private[operators] def lmScoreFrom(s: SparkSession,
      docs: org.apache.spark.sql.DataFrame, cap: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bg = docs
      .withColumn("ts", split($"text", " "))
      .where(size($"ts") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ts)-2), i -> concat(ts[i], ' ', ts[i+1]))"))
        .as("bg"))
    val model = bg.groupBy($"bg").agg(count(lit(1)).as("cnt"))
      .where($"cnt" >= 3)
      .orderBy($"cnt".desc, $"bg".asc).limit(cap)
    bg.join(broadcast(model), Seq("bg"), "left")
      .select($"doc_id", coalesce($"cnt", lit(1L)).as("c"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"c").as("freq_total"))
      .withColumn("fluency_x100", expr("freq_total * 100 div n_bigrams"))
      .orderBy($"doc_id")
  }

  val textLmScoreSql: String =
    s"""WITH bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> ts[i] || ' ' || ts[i+1])) AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      |  WHERE len(ts) >= 2),
      |model AS (
      |  SELECT bg, cnt FROM (
      |    SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY 1 HAVING COUNT(*) >= 3)
      |  ORDER BY cnt DESC, bg ASC LIMIT $LmModelCap)
      |SELECT b.doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(coalesce(m.cnt, 1)) AS BIGINT) AS freq_total,
      |  (CAST(SUM(coalesce(m.cnt, 1)) AS BIGINT) * 100) // COUNT(*)
      |    AS fluency_x100
      |FROM bg b LEFT JOIN model m USING (bg)
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "text_stats" -> (textStats _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_tokens" -> (textTokens _),
    "text_repetition" -> (textRepetition _),
    "text_df" -> (textDf _),
    "text_lm_score" -> (textLmScore _),
    "text_oov" -> (textOov _),
    "text_pii" -> (textPii _))

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_tokens" -> textTokensSql,
    "text_repetition" -> textRepetitionSql,
    "text_df" -> textDfSql,
    "text_lm_score" -> textLmScoreSql,
    "text_oov" -> textOovSql,
    "text_pii" -> textPiiSql)
}
