package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q._

/** End-to-end training-data pipeline compositions: the individual text /
  * dedup operators chained the way a pretraining corpus build actually
  * uses them. Both stay pure column expressions + joins (no UDFs), so
  * the whole pipeline is one Catalyst plan — filters push down through
  * the composition and the oracle hash-matches.
  */
object Pipeline {

  /** Train/eval decontamination by n-gram overlap (the GPT-3/PaLM-style
    * n-gram collision check; 3-gram shingles here because the synthetic
    * docs are short): a training doc is contaminated when it shares >= 5
    * distinct shingles with the held-out split (source 'src19').
    *
    * Scale shape: the eval split is tiny relative to training (here 25 of
    * 500; in production a few thousand eval docs vs billions of training
    * docs), so the distinct eval-shingle set broadcasts and the check is
    * one broadcast semi-ish join over the training shingle index — the
    * fact table shuffles only for the per-doc overlap count. Reuses the
    * shared shingle cache with the dedup family. */
  /** The contamination core shared by [[decontaminate]] and
    * [[pipelineCorpusBuild]]: training docs (source, per-doc eval
    * overlap count) with >= 5 distinct shingles shared with the
    * held-out split — one broadcast join over the shingle index plus
    * one per-doc aggregation, nothing else. */
  private def contaminatedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables(s, dir, "documents").select($"doc_id", $"source")
    val sh = Dedup.shingles(s, dir).join(src, "doc_id")
    val evalShingles = sh.where($"source" === "src19")
      .select($"s").distinct()
    sh.where($"source" =!= "src19")
      .join(broadcast(evalShingles), "s")
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_overlap"))
      .where($"n_overlap" >= 5)
  }

  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables(s, dir, "documents").select($"doc_id", $"source")
    val train = Dedup.shingles(s, dir).join(src, "doc_id")
      .where($"source" =!= "src19")
    val nPerDoc = train.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
    contaminatedDocs(s, dir)
      .join(nPerDoc, "doc_id")
      .select($"doc_id", $"source", $"n_overlap", $"n_shingles")
      .orderBy($"doc_id")
  }

  /** CTE chain matching [[contaminatedDocs]] exactly — interpolated
    * into both oracles (`sh`/`src`/`ev`/`tr`/`contaminated`), the same
    * sharing discipline as `$shinglesSql`. */
  private val contaminationSqlCtes: String =
    s"""sh AS (${Dedup.shinglesSqlPublic}),
       |src AS (SELECT doc_id, source FROM documents),
       |ev AS (SELECT DISTINCT s FROM sh JOIN src USING (doc_id)
       |       WHERE source = 'src19'),
       |tr AS (SELECT sh.doc_id, src.source, sh.s FROM sh JOIN src USING (doc_id)
       |       WHERE source <> 'src19'),
       |contaminated AS (
       |  SELECT tr.doc_id, tr.source, COUNT(*) AS n_overlap
       |  FROM tr JOIN ev USING (s) GROUP BY 1, 2
       |  HAVING COUNT(*) >= 5)""".stripMargin

  val decontaminateSql: String =
    s"""WITH $contaminationSqlCtes,
       |n AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY 1)
       |SELECT doc_id, source, n_overlap, n_shingles
       |FROM contaminated JOIN n USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Corpus curation: length window -> stopword-ratio quality gate (exact
    * integers: 10·n_stop >= n_tokens) -> language-ID gate (guessed 'en')
    * -> exact dedup keeping the lowest doc_id per text. One declarative
    * plan: the n_chars window pushes to the parquet scan, every gate is a
    * codegen'd column filter, and the only shuffle is the final dedup
    * groupBy — exactly what a 100 TB curation run needs. */
  /** The length-window + stopword-ratio gate stage shared by
    * [[pipelineCuration]] and [[pipelineCorpusBuild]] — ONE definition
    * of what "passes the quality gates" means, in Scala and (below,
    * [[gatedSqlCtes]]) in oracle SQL, so the two pipelines cannot
    * silently diverge. */
  private def gatedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enStops = Text.langStopwords.toMap.apply("en")
    val ts = split($"text", " ")
    Tables(s, dir, "documents")
      .where($"n_chars".between(100, 450))
      .withColumn("n_tokens", size(ts))
      .withColumn("n_stop",
        size(filter(ts, t => t.isin(enStops.map(x => x: Any): _*))))
      .where($"n_stop" * 10 >= $"n_tokens")
  }

  /** `gated` CTE pair matching [[gatedDocs]] exactly. */
  private def gatedSqlCtes: String = {
    val stops = Text.langStopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""gated0 AS (
       |  SELECT doc_id, text, lang, source,
       |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> list_contains($stops, t))) AS INT) AS n_stop
       |  FROM documents
       |  WHERE n_chars BETWEEN 100 AND 450),
       |gated AS (SELECT * FROM gated0 WHERE n_stop * 10 >= n_tokens)""".stripMargin
  }

  def pipelineCuration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gatedDocs(s, dir)
      .where(Text.langScores($"text").getField("lang") === "en")
      .groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
        min($"n_tokens").as("n_tokens"))
      .select($"keep_id", $"n_copies", $"n_tokens")
      .orderBy($"keep_id")
  }

  val pipelineCurationSql: String =
    s"""WITH $gatedSqlCtes
       |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
       |  MIN(n_tokens) AS n_tokens
       |FROM gated
       |WHERE (${Text.langGuessSql("text")}) = 'en'
       |GROUP BY text
       |ORDER BY keep_id""".stripMargin

  /** Deterministic train/valid/test assignment by content-free key hash
    * — the split every training-data pipeline needs, done so it is (a)
    * reproducible across runs/engines (md5 of the doc id, no RNG state),
    * (b) stable under corpus growth (a doc's split never changes when
    * others are added), and (c) embarrassingly parallel (pure column
    * expression, no shuffle until the audit aggregation). 80/10/10 via
    * md5 bucket mod 100; the query returns the per-(lang, split) audit
    * counts a pipeline would assert on before training. */
  /** md5 split bucket in [0, 100) and the 80/10/10 split name — ONE
    * definition shared by [[sampleSplit]] and [[pipelineCorpusBuild]]
    * (Scala here, [[splitSqlExprs]] for the oracles). */
  private def splitBucket: org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
  private def splitName(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
  /** (bucket expression over doc_id, split CASE over `bucket`). */
  private val splitSqlExprs: (String, String) = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100",
    "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END")

  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("split", splitName(splitBucket))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang", $"split")
  }

  val sampleSplitSql: String =
    s"""WITH b AS (SELECT lang, n_chars,
       |    ${splitSqlExprs._1} AS bucket
       |  FROM documents)
       |SELECT lang,
       |  ${splitSqlExprs._2} AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Concat-and-chunk sequence packing (the GPT pretraining shape):
    * documents are concatenated in deterministic doc_id order and cut
    * into fixed 512-token training sequences; the query returns the
    * per-sequence audit (docs starting there, their token mass, and how
    * many cross the boundary).
    *
    * The packing position of a doc is a GLOBAL running token sum — the
    * one operation a naive `Window.orderBy` does on a single partition
    * (Spark collapses an unpartitioned ordered window to one task; at
    * 100 TB that is THE scale bug). Implemented instead as the textbook
    * two-phase distributed prefix sum: (1) range-bucket the id space —
    * one tiny min/max stats job sizes 32 contiguous buckets; (2) running
    * sums WITHIN each bucket (parallel windows); (3) one 32-row window
    * over the per-bucket totals yields exclusive bucket offsets,
    * broadcast back. Driver traffic is 2 longs + 32 rows regardless of
    * corpus size. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val seqLen = 512L
    val docs = Tables(s, dir, "documents")
      .select($"doc_id".cast("long").as("doc_id"),
        size(split($"text", " ")).cast("long").as("tok"))
    val r = docs.agg(min($"doc_id"), max($"doc_id")).head()
    val (minId, maxId) = (r.getLong(0), r.getLong(1))
    val span = (maxId - minId) / 32 + 1
    val b = docs.withColumn("bucket",
      floor(($"doc_id" - minId) / span).cast("long"))
    val inBucket = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // partitioned by a CONSTANT, not left unpartitioned: the frame is
    // the bounded 32-row per-bucket totals (single partition is the
    // point), and the constant keeps Spark's "No Partition Defined for
    // Window" warning out of bench logs so a real unpartitioned-window
    // regression elsewhere stays greppable. pmod(bucket, 1) — always 0
    // — rather than lit(0), which constant-folding prunes from the
    // partition spec, resurrecting the warning.
    val overBuckets = Window.partitionBy(pmod($"bucket", lit(1)))
      .orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy($"bucket").agg(sum($"tok").as("btot"))
      .withColumn("boff", coalesce(sum($"btot").over(overBuckets), lit(0L)))
      .select($"bucket", $"boff")
    b.withColumn("cum", sum($"tok").over(inBucket))
      .join(broadcast(offsets), "bucket")
      .withColumn("start", $"boff" + $"cum" - $"tok")
      .withColumn("seq_id", floor($"start" / seqLen))
      .withColumn("crosses",
        (floor(($"start" + $"tok" - 1) / seqLen) > $"seq_id").cast("long"))
      .groupBy($"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"),
        sum($"crosses").as("n_spanning"))
      .orderBy($"seq_id")
  }

  val packSequencesSql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok,
      |    CAST(SUM(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |                        AND CURRENT ROW) - tok AS BIGINT) AS start
      |  FROM d)
      |SELECT start // 512 AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN (start + tok - 1) // 512 > start // 512
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
      |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin

  /** Deterministic language-mix rebalancing: downsample every language
    * to the SMALLEST language's document count (a uniform mix), keeping
    * a doc iff its content-free hash bucket clears the language's keep
    * rate — reproducible across runs/engines (no RNG), growth-stable
    * per doc, and decided by an EXACT integer cross-multiply
    * (bucket · n_lang < min_n · 10^6), so no float threshold drift.
    * The per-language counts and the global min are tiny aggregates
    * broadcast back; the row-level gate is a pure column expression.
    * The query returns the per-language audit a pipeline asserts on. */
  def sampleRebalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = 1000000L
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars",
        (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
    val langN = docs.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
    val minN = langN.agg(min($"n_lang").as("min_n"))
    docs.join(broadcast(langN), "lang")
      .crossJoin(broadcast(minN))
      .withColumn("kept", ($"bucket" * $"n_lang" < $"min_n" * buckets).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_before"), sum($"kept").as("n_after"),
        sum(when($"kept" === 1, $"n_chars").otherwise(0L)).as("chars_after"))
      .orderBy($"lang")
  }

  val sampleRebalanceSql: String =
    """WITH d AS (
      |  SELECT lang, n_chars,
      |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000000 AS bucket
      |  FROM documents),
      |ln AS (SELECT lang, COUNT(*) AS n_lang FROM d GROUP BY 1),
      |mn AS (SELECT MIN(n_lang) AS min_n FROM ln)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before,
      |  CAST(SUM(CASE WHEN bucket * n_lang < min_n * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
      |  CAST(SUM(CASE WHEN bucket * n_lang < min_n * 1000000 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after
      |FROM d JOIN ln USING (lang) CROSS JOIN mn
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** EXACT group-wise top-k selection — "keep the best k documents per
    * language" (by quality proxy; here n_chars with doc_id as the
    * deterministic tiebreak), the per-domain/per-language cap every
    * curation pipeline applies.
    *
    * Scale shape: the naive `row_number() OVER (PARTITION BY lang ...)`
    * puts EVERY row of a group in one task — the zipfian-language
    * corpus (half the crawl is English) kills it at 100 TB. Two phases
    * instead, both exact: (1) rank within (lang, salt) — salt =
    * doc_id % 64, deterministic, so the hot language spreads over 64
    * tasks — and keep k per salted cell (any global top-k member is
    * top-k within its own cell, so no candidate is lost); (2) rank the
    * ≤ 64·k survivors per language. Phase 2 touches ≤ 64·k rows per
    * group REGARDLESS of corpus size; k and the salt width are the only
    * constants. The oracle computes the naive single-phase ranking —
    * exactness of the two-phase reduction is what hash-equality
    * proves. */
  def pipelineTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 3
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars",
        size(split($"text", " ")).cast("long").as("n_tokens"))
    val phase1 = Window.partitionBy($"lang", $"doc_id" % 64)
      .orderBy($"n_chars".desc, $"doc_id".asc)
    val cand = docs.withColumn("crn", row_number().over(phase1))
      .where($"crn" <= k).drop("crn")
    val phase2 = Window.partitionBy($"lang")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    cand.withColumn("rank", row_number().over(phase2).cast("long"))
      .where($"rank" <= k)
      .select($"lang", $"rank", $"doc_id", $"n_chars", $"n_tokens")
      .orderBy($"lang", $"rank")
  }

  val pipelineTopkPerGroupSql: String =
    """WITH d AS (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, n_chars, n_tokens,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM d)
      |SELECT lang, rank, doc_id, n_chars, n_tokens
      |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin

  /** The whole corpus build as ONE declarative plan — quality gates →
    * exact dedup → eval-set removal + n-gram decontamination → split
    * assignment → per-(split, lang) audit. This is the end-to-end
    * composition a pretraining data team actually ships; every stage is
    * one of the registered operators, literally composed (the
    * contaminated set IS [[decontaminate]]'s output).
    *
    * Scale shape, stage by stage: the n_chars window pushes to the
    * parquet scan; the token gates are codegen'd column filters; exact
    * dedup is one hash-shuffle on text (swap in the fingerprint column
    * at 100 TB — same plan); the contaminated set comes from the
    * factored [[contaminatedDocs]] core (one broadcast eval-shingle
    * join + one per-doc aggregation — NOT the full decontaminate
    * report, which adds a corpus-wide shingle-count join this pipeline
    * would discard); its anti-join keys on the unique uniform doc_id
    * and is NOT hint-broadcast (hot shingles can inflate the
    * contaminated set on a pathological corpus; AQE broadcasts it when
    * actually small); split assignment is a pure md5 expression
    * (reproducible, growth-stable); the audit aggregate is
    * partial-agg'd below its exchange. No shuffle keys on anything
    * skewed, no forced broadcast of anything corpus-proportional. */
  def pipelineCorpusBuild(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // exact dedup keeping the min-id row: struct-min is deterministic
    // (doc_id unique and leading)
    val deduped = gatedDocs(s, dir).groupBy($"text")
      .agg(min(struct($"doc_id", $"lang", $"source", $"n_tokens")).as("m"))
      .select($"m.doc_id", $"m.lang", $"m.source", $"m.n_tokens")
    val clean = deduped
      .where($"source" =!= "src19") // the eval split itself never trains
      .join(contaminatedDocs(s, dir).select($"doc_id"),
        Seq("doc_id"), "left_anti")
    clean
      .withColumn("split", splitName(splitBucket))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
      .orderBy($"split", $"lang")
  }

  val pipelineCorpusBuildSql: String =
    s"""WITH $contaminationSqlCtes,
       |$gatedSqlCtes,
       |deduped AS (
       |  SELECT doc_id, lang, source, n_tokens FROM (
       |    SELECT doc_id, lang, source, n_tokens,
       |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |    FROM gated)
       |  WHERE rn = 1),
       |clean AS (
       |  SELECT * FROM deduped
       |  WHERE source <> 'src19'
       |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |b AS (SELECT lang, n_tokens,
       |    ${splitSqlExprs._1} AS bucket
       |  FROM clean)
       |SELECT ${splitSqlExprs._2} AS split,
       |  lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  val queries: Map[String, QFn] = Map(
    "pipeline_corpus_build" -> (pipelineCorpusBuild _),
    "decontaminate" -> (decontaminate _),
    "pipeline_curation" -> (pipelineCuration _),
    "pipeline_topk_per_group" -> (pipelineTopkPerGroup _),
    "sample_split" -> (sampleSplit _),
    "pack_sequences" -> (packSequences _),
    "sample_rebalance" -> (sampleRebalance _))

  val oracles: Map[String, String] = Map(
    "pipeline_corpus_build" -> pipelineCorpusBuildSql,
    "decontaminate" -> decontaminateSql,
    "pipeline_curation" -> pipelineCurationSql,
    "pipeline_topk_per_group" -> pipelineTopkPerGroupSql,
    "sample_split" -> sampleSplitSql,
    "pack_sequences" -> packSequencesSql,
    "sample_rebalance" -> sampleRebalanceSql)
}
