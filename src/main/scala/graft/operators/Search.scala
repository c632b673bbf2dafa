package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, ColTransform, FoldSpec, FsStore, Ops, TableRef, Views}

/** Ranked retrieval and corpus mixing — the serving / data-mixture
  * stages of a training-data pipeline.
  *
  * `text_ranked_search` extends the boolean postings probe of
  * [[IncrementalDedup.textSearch]] to SCORED retrieval: a term-frequency
  * inverted index as a persistent graft view (a GENERATOR re-key whose
  * key collisions — one row per token occurrence — are folded by
  * [[FoldSpec.FoldSum]] into the tf), probed by leading key and ranked
  * by an exact-integer tf·idf score.
  *
  * `pipeline_mix` is the data-mixture stage: an exact largest-remainder
  * allocation of a document budget across weighted sources, selected by
  * a two-pass distributed threshold (histogram + boundary-bucket rank)
  * instead of a global per-source sort — the selection window only ever
  * ranks one md5-prefix bucket per source.
  */
object Search {

  /** Token-level term-frequency inverted index over catalog table
    * `docs`: key `(token, doc_id)`, value `tf`. The transform explodes
    * one row PER OCCURRENCE, so equal keys collide by design and the
    * combinable [[FoldSpec.FoldSum]] accumulates them into the term
    * frequency — the generator+fold composition (the reference's total
    * 1→1 TransformFunc can express neither half,
    * messdb-base/src/MessDB/Table.hs:24-40). Refresh rides the O(delta)
    * combinable re-key path: a crawl batch re-tokenizes only the docs
    * chunks it touched. */
  def declareTfIndex(views: Views, name: String, docsTable: String,
      indexTarget: Option[Long] = None): Unit =
    views.declare(name, docsTable,
      ColTransform("graft-tf-idx-v1", Seq("token", "doc_id"),
        Seq(explode(expr("filter(split(text, ' '), t -> length(t) > 0)"))
          .as("token"),
          col("doc_id"), lit(1L).as("tf")),
        generates = true, outTarget = indexTarget),
      FoldSpec.FoldSum)

  /** Build-once memo key for the docs parquet
    * ([[graft.core.FsUtil.parquetFingerprint]] — same discipline as
    * the shingle/vector index builds). */
  private def docsFingerprint(dir: String): Seq[String] =
    graft.core.FsUtil.parquetFingerprint(dir, "documents")

  /** Ranked search served FROM the tf index: pick three mid-frequency
    * terms (document-frequency ranks 11–13 — selective enough that the
    * probe's leading-key range prunes chunk files), score each candidate
    * doc by the exact-integer tf·idf sum
    * `tf * ((1_000_000 * N) / df)` (truncating division — positive
    * operands, so DuckDB's floor `//` agrees), and return the top 10 by
    * (score DESC, doc_id). The index is built ONCE per corpus version
    * (fingerprinted memo) and the probe is the measured path — the
    * search-engine serving shape over a 100 TB corpus: term selection
    * is a corpus-level stat job (the `text_df` family), the probe opens
    * only the chunk files whose key range can contain the query terms. */
  def textRankedSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = graft.core.FsUtil.sideStoreDir("rank-index", dir)
    val store = new FsStore(base.toString)
    val ops = new Ops(s, store, 8192)
    val cat = new Catalog(store)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val op = graft.core.Hashing.opHash(
      "graft-rank-index-v1" +: docsFingerprint(dir))
    // liveness-validated memo: a tmp cleaner sweeping chunk files while
    // the memo entry survives triggers a rebuild, not a dangling hash
    val idxRef = TableRef(graft.core.FsUtil.memoizedLiveTable(store, op) {
      val views = new Views(ops, cat)
      cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
      declareTfIndex(views, "tf_idx", "docs")
      views.refresh("tf_idx").hash
    })
    // N from the in-hand corpus frame (cached), NOT the side store's
    // catalog: the catalog entry can lag the fingerprint-memoized index
    // under in-place corpus rewrites, and the on-disk count is what the
    // oracle sees
    val n = docs.count()
    // deterministic query workload: df ranks 11-13 (total order:
    // df DESC, token ASC — token is unique within the aggregate)
    // top-13 collected, ranks 11-13 kept on the driver (13 rows — the
    // collect is workload-picker-sized, not data-sized)
    val terms = ops.scan(idxRef)
      .groupBy($"token").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"token".asc)
      .limit(13)
      .collect().drop(10).map(r => (r.getString(0), r.getLong(1)))
    val idf = terms.map { case (t, df) => (t, (1000000L * n) / df) }.toSeq
    val termFrame = broadcast(idf.toDF("token", "idf_s"))
    ops.scan(idxRef)
      .where($"token".isin(terms.map(_._1): _*))
      .join(termFrame, "token")
      .groupBy($"doc_id")
      .agg(sum($"tf" * $"idf_s").as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(10)
  }

  val textRankedSearchSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok WHERE len(token) > 0 GROUP BY 1, 2),
      |dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |terms AS (
      |  SELECT token, (1000000 * n.n) // df AS idf_s
      |  FROM dfs CROSS JOIN n ORDER BY df DESC, token LIMIT 3 OFFSET 10)
      |SELECT tf.doc_id, CAST(SUM(tf.tf * terms.idf_s) AS BIGINT) AS score
      |FROM tf JOIN terms ON tf.token = terms.token
      |GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** Per-source mixture weight 1..4, derived from the source name so
    * the oracle reproduces it (`srcN` → 1 + N % 4). */
  private def srcWeight(source: String): Long =
    1L + source.drop(3).toLong % 4

  /** Largest-remainder (Hamilton) apportionment: integer quotas
    * proportional to `weights` that sum to `budget` EXACTLY — floor
    * shares first, then one extra seat each to the largest remainders
    * (ties by name ascending — total order, deterministic). */
  def largestRemainder(weights: Seq[(String, Long)],
      budget: Long): Map[String, Long] = {
    val bigW = weights.map(_._2).sum
    val base = weights.map { case (name, w) =>
      (name, budget * w / bigW, budget * w % bigW)
    }
    val extra = (budget - base.map(_._2).sum).toInt
    val bumped = base.sortBy { case (name, _, rem) => (-rem, name) }
      .take(extra).map(_._1).toSet
    base.map { case (name, b, _) =>
      name -> (b + (if (bumped(name)) 1L else 0L))
    }.toMap
  }

  /** Exact data-mixture sampling: allocate a budget of total/2
    * documents across sources proportionally to their weights with the
    * LARGEST-REMAINDER method (quotas sum to the budget exactly), then
    * select each source's quota as its docs with the smallest
    * `(md5(doc_id), doc_id)` keys — content-free, deterministic,
    * growth-stable sampling, no RNG.
    *
    * Selection is a two-pass distributed threshold, not a per-source
    * global sort: pass 1 histograms `(source, 3-hex-digit md5 prefix)`
    * (≤ sources×4096 rows — metadata-sized at any corpus size); the
    * driver walks each source's buckets to find the boundary bucket
    * containing its quota-th key; pass 2 keeps whole buckets below the
    * boundary and ranks ONLY inside the boundary bucket — the
    * row_number window partitions by (source, bucket), so its largest
    * partition is ~1/4096 of a source, never the source itself (the
    * 100 TB shape; a naive per-source rank puts the whole hot source
    * in one task). Driver state: quotas + cuts, O(sources). */
  def pipelineMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"source")
      .withColumn("m", md5($"doc_id".cast("string")))
      .withColumn("bkt", substring($"m", 1, 3))
    // pass 0: per-source counts (bounded-cardinality dimension)
    val perSrc = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val total = perSrc.map(_._2).sum
    val budget = total / 2
    val quota: Map[String, Long] = largestRemainder(
      perSrc.map { case (src, _) => (src, srcWeight(src)) }, budget)
    val bySrc = perSrc.toMap
    quota.foreach { case (src, q) =>
      require(q <= bySrc(src), s"quota $q exceeds $src's ${bySrc(src)} " +
        "docs — weights too skewed for a budget of half the corpus")
    }
    // pass 1: (source, bucket) histogram; driver finds each source's
    // boundary bucket and how many keys to take inside it
    val hist = docs.groupBy($"source", $"bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val cuts: Seq[(String, String, Long)] = perSrc.map { case (src, _) =>
      var remaining = quota(src)
      var cutBkt = ""
      var kIn = 0L
      val it = hist.filter(_._1 == src).sortBy(_._2).iterator
      while (remaining > 0 && it.hasNext) {
        val (_, bkt, c) = it.next()
        if (c >= remaining) { cutBkt = bkt; kIn = remaining; remaining = 0 }
        else remaining -= c
      }
      (src, cutBkt, kIn)
    }
    // pass 2: whole buckets below the cut pass; only the boundary
    // bucket ranks (partition = one bucket of one source)
    val cutFrame = broadcast(cuts.toDF("source", "cut_bkt", "k_in"))
    val rn = row_number().over(
      Window.partitionBy($"source", $"bkt").orderBy($"m", $"doc_id"))
    docs.join(cutFrame, "source")
      .where($"bkt" <= $"cut_bkt")
      .withColumn("rn", rn)
      .where($"bkt" < $"cut_bkt" || $"rn" <= $"k_in")
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val pipelineMixSql: String =
    """WITH w AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src,
      |         1 + CAST(substr(source, 4) AS BIGINT) % 4 AS w
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_src) AS BIGINT) // 2 AS budget,
      |         CAST(SUM(w) AS BIGINT) AS bw
      |  FROM w),
      |alloc AS (
      |  SELECT source, (budget * w) // bw AS base, (budget * w) % bw AS rem
      |  FROM w CROSS JOIN tot),
      |extra AS (
      |  SELECT (SELECT budget FROM tot) - CAST(SUM(base) AS BIGINT) AS e
      |  FROM alloc),
      |quota AS (
      |  SELECT source,
      |         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
      |                        <= (SELECT e FROM extra)
      |                THEN 1 ELSE 0 END AS q
      |  FROM alloc),
      |sel AS (
      |  SELECT doc_id, source,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT sel.doc_id, sel.source
      |FROM sel JOIN quota ON sel.source = quota.source
      |WHERE sel.rn <= quota.q ORDER BY sel.doc_id""".stripMargin

  val queries: Map[String, graft.queries.Q.QFn] = Map(
    "text_ranked_search" -> (textRankedSearch _),
    "pipeline_mix" -> (pipelineMix _))
  val oracles: Map[String, String] = Map(
    "text_ranked_search" -> textRankedSearchSql,
    "pipeline_mix" -> pipelineMixSql)
}
