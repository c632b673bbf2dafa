package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** The messdb-tool analogue (/root/reference/messdb-tool/src/messdb-tool.hs:34-54):
  * import / export / schema / query against a store+catalog, driven from
  * the command line. Also the SURVEY §7.3 "minimum end-to-end slice":
  * ingest → canonicalize+hash → upsert-merge into named table → range
  * query → export JSON; a second identical ingest is a 100% memo hit,
  * observable in the printed stats.
  *
  * Usage:
  *   graft.Cli <storeDir> import-parquet <table> <path> <keyCols,>
  *   graft.Cli <storeDir> import-csv <table> <path> <keyCols,>
  *   graft.Cli <storeDir> import-json <table> <path> <keyCols,>
  *   graft.Cli <storeDir> sql (<script> | -c <script> | -f <file>)...
  *   graft.Cli <storeDir> range <table> <lo> <hi>
  *   graft.Cli <storeDir> lookup <table> <key>
  *   graft.Cli <storeDir> export-json <table>
  *   graft.Cli <storeDir> export-csv <table> <outDir>
  *   graft.Cli <storeDir> print-schema <table>
  *   graft.Cli <storeDir> verify <table>
  *   graft.Cli <storeDir> delete-range <table> <lo> <hi>
  *   graft.Cli <storeDir> push <dstStoreDir> [rootHash]
  *   graft.Cli <storeDir> tables
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case storeDir :: rest =>
      val store = new FsStore(storeDir)
      val ops = new Ops(spark, store,
        sys.env.get("SPARK_GRAFT_CHUNK_ROWS").map(_.toLong)
          .getOrElse(Ops.DefaultChunkTargetRows))
      val cat = new Catalog(store)
      rest match {
        case "import-parquet" :: table :: path :: keys :: Nil =>
          importDf(ops, cat, table, spark.read.parquet(path), keys.split(",").toSeq)
        case "import-csv" :: table :: path :: keys :: Nil =>
          // header-row CSV, columns matched by NAME in any order
          // (Tool/Csv.hs:22-64, Row.hs:117-124); schema inferred unless
          // the table already exists in the catalog
          val df = cat.schemaOf(table) match {
            case Some(s) => graft.sources.Csv.readNameMatched(spark, path, s)
            case None => spark.read.option("header", "true")
              .option("inferSchema", "true").csv(path)
          }
          importDf(ops, cat, table, df, keys.split(",").toSeq)
        case "import-json" :: table :: path :: keys :: Nil =>
          // JSON-lines, fields matched by NAME — the inverse of
          // export-json, so export → import round-trips a table
          val df = cat.schemaOf(table) match {
            case Some(s) => graft.sources.Json.readNameMatched(spark, path, s)
            case None => spark.read.json(path)
          }
          importDf(ops, cat, table, df, keys.split(",").toSeq)
        case "sql" :: rest if rest.nonEmpty =>
          // O34: run N ;-separated SQL statements in order; DDL/writes
          // mutate the catalog, queries print JSON lines. Reference
          // parity (messdb-tool.hs:164-196): any mix of `-c <script>`
          // and `-f <scriptFile>` arguments concatenates IN ORDER; a
          // single bare argument is a script. ONE SqlSession carries
          // BEGIN/COMMIT/ROLLBACK state across every statement of every
          // argument, so a replayed DDL+DML script file is one atomic
          // transaction if it says so.
          def scriptsOf(a: List[String]): List[String] = a match {
            case "-c" :: s :: t => s :: scriptsOf(t)
            case "-f" :: p :: t =>
              new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(p)),
                java.nio.charset.StandardCharsets.UTF_8) :: scriptsOf(t)
            case Nil => Nil
            case other =>
              sys.error(s"sql: expected -c <script> / -f <file>, " +
                s"got: ${other.mkString(" ")}")
          }
          val scripts = rest match {
            case s :: Nil if s != "-c" && s != "-f" => List(s)
            case _ => scriptsOf(rest)
          }
          val session = new graft.sql.SqlSession(spark, ops, cat)
          scripts.foreach { script =>
            graft.sql.GraftSql.splitStatements(script).foreach { s =>
              session.execute(s) match {
                case Right(root) => println(s"root=$root")
                case Left(df) => printJson(df)
              }
            }
          }
        case "range" :: table :: lo :: hi :: Nil =>
          val ref = need(cat, table)
          val m = ops.meta(ref)
          val (loV, hiV) = (parseKey(spark, m, lo), parseKey(spark, m, hi))
          val out = ops.rangeFilter(ref,
            Some(Bound(Seq(loV), inclusive = true)),
            Some(Bound(Seq(hiV), inclusive = false)))
          printJson(ops.scanOrdered(out))
          printStats(store)
        case "lookup" :: table :: key :: Nil =>
          val ref = need(cat, table)
          printJson(ops.lookup(ref, Seq(parseKey(spark, ops.meta(ref), key))))
        case "export-json" :: table :: Nil =>
          // JSON-lines export (Tool/Json.hs:16-32), ordered scan; binary
          // columns render as hex (Table/Bytes.hs:16-28 parity)
          printJson(ops.scanOrdered(need(cat, table)))
        case "export-csv" :: table :: outDir :: Nil =>
          graft.sources.Hex.encode(ops.scanOrdered(need(cat, table))).coalesce(1)
            .write.mode("overwrite").option("header", "true").csv(outDir)
          println(s"wrote $outDir")
        case "print-schema" :: table :: Nil =>
          val m = ops.meta(need(cat, table))
          println(s"""{"keyCols":${m.keyCols.mkString("[\"", "\",\"", "\"]")},"schema":${m.schema.json}}""")
        case "describe" :: table :: Nil =>
          // debugPrintTrie analogue (Trie.hs:633-668): chunk-tree dump
          val ref = need(cat, table)
          val m = ops.meta(ref)
          println(s"table=$table hash=${ref.hash} rows=${m.rows} " +
            s"chunks=${m.chunks.length} target=${m.chunkTargetRows} " +
            s"keys=${m.keyCols.mkString(",")}")
          m.chunks.foreach { c =>
            println(s"  chunk ${c.hash.take(12)}… rows=${c.rows} " +
              s"min=${c.minKeyHex.take(16)} max=${c.maxKeyHex.take(16)}")
          }
        case "tables" :: Nil =>
          cat.root.toSeq.sortBy(_._1).foreach { case (n, e) =>
            println(s"$n\t${e.tableHash}\tkeys=${e.keyCols.mkString(",")}")
          }
        case "log" :: Nil =>
          // git-like history: every statement created a new root
          cat.log().foreach { h =>
            val names = cat.rootAt(h).keys.toSeq.sorted.mkString(",")
            println(s"$h\ttables=[$names]")
          }
        case "checkout" :: rootHash :: Nil =>
          cat.checkout(rootHash)
          println(s"root=$rootHash")
        case "delete-range" :: table :: lo :: hi :: Nil =>
          // retention delete: drop keys in [lo, hi] (inclusive), O(edge
          // chunks) through the complement-range merge
          val ref = need(cat, table)
          val m = ops.meta(ref)
          val out = ops.deleteRange(ref,
            Some(Bound(Seq(parseKey(spark, m, lo)), inclusive = true)),
            Some(Bound(Seq(parseKey(spark, m, hi)), inclusive = true)))
          if (out == ref) println(s"no rows in range; root unchanged")
          else {
            // no-op deletes must not mint empty commits (same rule as
            // Views.refresh)
            val root = cat.put(table, out)
            println(s"table=$table hash=${out.hash} rows=${ops.rowCount(out)} root=$root")
          }
        case "verify" :: table :: Nil =>
          // checkTrie analogue (O17): verify chunk hashes, counts, key
          // ranges, and disjointness against the stored metadata
          val problems = ops.verifyTable(need(cat, table))
          if (problems.isEmpty) println("ok")
          else {
            problems.foreach(p => System.err.println(p))
            sys.exit(1)
          }
        case "count" :: table :: Nil =>
          // COUNT(*) from chunk metadata — no data read
          val ref = cat.get(table).getOrElse(sys.error(s"no such table: $table"))
          println(ops.rowCount(ref))
        case "push" :: dstDir :: rest if rest.length <= 1 =>
          // git-push-style incremental replication to another store:
          // only objects the destination lacks move (content addressing
          // = the transfer protocol); the pointer advances fast-forward
          val root = rest.headOption
            .orElse(store.currentRootHash)
            .getOrElse(sys.error("empty store: nothing to push"))
          val st = Replicate.push(store, new FsStore(dstDir), root)
          println(s"pushed root=$root roots=${st.copiedRoots} " +
            s"tables=${st.copiedTables} chunks=${st.copiedChunks} " +
            s"skipped=${st.skippedChunks}")
        case "diff" :: table :: oldRoot :: Nil =>
          // git-like: what changed in `table` since version `oldRoot`
          val cur = cat.get(table).getOrElse(sys.error(s"no such table: $table"))
          val old = cat.rootAt(oldRoot).getOrElse(table,
            sys.error(s"table $table absent in root $oldRoot"))
          printJson(ops.diff(graft.core.TableRef(old.tableHash), cur))
        case "gc" :: rest if rest.isEmpty ||
            rest == List("--keep-history") || rest == List("--prune-history") ||
            (rest.length == 2 && rest.head == "--keep-last" &&
              rest(1).matches("[0-9]+")) =>
          // default (and --keep-history) retains every version in the
          // root log — safe for a git-like versioned store; the
          // destructive sweep of all non-current history requires an
          // explicit --prune-history; --keep-last N is the retention
          // policy in between (keep the N newest versions, like
          // snapshot-expiry maintenance on table formats)
          val keep = rest match {
            case List("--prune-history") => Seq.empty
            case List("--keep-last", n) => cat.log(n.toInt)
            case _ => cat.log(Int.MaxValue)
          }
          val s = graft.core.Gc.run(ops.store, keep)
          println(s"kept roots=${s.keptRoots} tables=${s.keptTables} chunks=${s.keptChunks}; " +
            s"deleted roots=${s.deletedRoots} tables=${s.deletedTables} " +
            s"chunks=${s.deletedChunks} memos=${s.deletedMemos}")
        case other =>
          System.err.println(s"unknown command: ${other.mkString(" ")}")
          sys.exit(2)
      }
    case Nil =>
      System.err.println("usage: graft.Cli <storeDir> <command> ...")
      sys.exit(2)
  }

  private def importDf(ops: Ops, cat: Catalog, table: String,
      df: org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit = {
    val incoming = ops.fromDataFrame(df, keys)
    val merged = cat.get(table) match {
      case Some(existing) => ops.upsert(existing, incoming) // last wins
      case None => incoming
    }
    val root = cat.put(table, merged)
    println(s"table=$table hash=${merged.hash} rows=${ops.meta(merged).rows} root=$root")
    printStats(ops.store)
  }

  private def need(cat: Catalog, table: String): TableRef =
    cat.get(table).getOrElse {
      System.err.println(s"no such table: $table"); sys.exit(2)
    }

  private def parseKey(spark: SparkSession, m: TableMeta, s: String): Any = {
    import org.apache.spark.sql.types._
    m.schema(m.keyCols.head).dataType match {
      case LongType => s.toLong
      case IntegerType => s.toInt
      case ShortType => s.toShort
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case dt: DecimalType =>
        new java.math.BigDecimal(s).setScale(dt.scale)
      case DateType => java.sql.Date.valueOf(s) // yyyy-MM-dd
      case TimestampType => DateTimeUtil.sessionTimestamp(spark, s)
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(s, DateTimeUtil.wallClockFmt)
      case BooleanType => s.toBoolean
      case _ => s
    }
  }

  /** JSON-lines output, streamed; binary columns as lowercase hex
    * (Table/Bytes.hs:16-28 serialization parity). */
  private def printJson(df: org.apache.spark.sql.DataFrame): Unit =
    graft.sources.Hex.encode(df).toJSON.toLocalIterator()
      .forEachRemaining(println(_))

  private def printStats(store: GraftStore): Unit =
    println(store.stats.snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("stats: ", " ", ""))
}
