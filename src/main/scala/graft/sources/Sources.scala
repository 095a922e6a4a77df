package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the fixture parquet readers in
  * [[graft.Tables]] (SURVEY.md §2.3 scans/sinks rows).
  *
  * The reference reads via JDBC re-scan (O1/O2) and writes via per-tuple
  * JDBC UPDATE (O17–O21); here every format goes through the
  * DataFrameReader/Writer so pushdown, partitioning and vectorization
  * apply uniformly. CSV/JSON always take an explicit schema — inference
  * is a full extra pass over the data, unacceptable at scale.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JDBC scan with partitioned parallel reads — the scale-correct form
    * of the reference's single-connection `SELECT *` (O1,
    * StreamGeneratorThread.java:53-58). Untested here (no database in
    * the container) but kept to document the intended surface. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Schema-evolution read: union the schemas of all parquet footers
    * under `path` (columns added over time arrive as nulls in old
    * files). `mergeSchema` is a footer-only pass — no data scan — but
    * still O(files); production tables pin the merged schema in a
    * catalog instead of re-deriving it per query, so this is the
    * ingest-time tool, not the hot path. */
  def readParquetEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Evolution read beyond added-columns: reads a sequence of file
    * **generations** (snapshots written under different schemas) into
    * the single **current** schema `target`, reconciling per generation
    *
    *  - **renames** via `renames: old -> new` (a generation that still
    *    stores the old name reads it into the new one);
    *  - **type widening** (int→long, float→double, …): each stored
    *    column is cast to its target type, but only if the stored type
    *    upcasts losslessly — a narrowing evolution (long→int) is a data
    *    bug and fails fast instead of silently truncating 100 TB;
    *  - **added columns**: generations without a target column surface
    *    it as typed nulls.
    *
    * Parquet's own `mergeSchema` refuses exactly these conflicts
    * (CANNOT_MERGE_SCHEMAS on an int→long change), which is why the
    * unit of evolution is the generation, aligned BEFORE the union —
    * the same shape a table format's catalog uses: schema-per-snapshot,
    * resolved at read, no data rewrite. */
  def readParquetEvolved(spark: SparkSession, generations: Seq[String],
      target: StructType, renames: Map[String, String] = Map.empty): DataFrame =
    generations.map(path => alignToSchema(spark.read.parquet(path), target, renames))
      .reduce(_ unionByName _)

  /** Align one generation (a DataFrame read under its stored schema) to
    * `target`: stored columns cast with checked LOSSLESS widening,
    * renamed columns mapped via `renames: old -> new`, absent columns
    * surfaced as typed nulls. The shared alignment step of
    * [[readParquetEvolved]] and [[readVersionEvolved]]. */
  private[sources] def alignToSchema(df: DataFrame, target: StructType,
      renames: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    def checkedCast(name: String, from: org.apache.spark.sql.types.DataType,
        to: org.apache.spark.sql.types.DataType): Unit =
      require(from == to ||
        org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
        s"column $name: stored type $from does not widen losslessly to $to")
    val stored = df.schema.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      val source =
        if (stored.contains(f.name)) Some(f.name)
        else renames.collectFirst {
          case (o, n) if n == f.name && stored.contains(o) => o
        }
      source match {
        case Some(s) =>
          checkedCast(s, stored(s), f.dataType)
          col(s).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Small-file compaction — the 100 TB housekeeping operator: a table
    * ingested by many micro-batches accumulates files far smaller than
    * a scan task wants (every file costs a footer read, a task
    * schedule, and an object-store request). Rewrites `inPath` into
    * ~`targetRecordsPerFile`-sized files. A plain `repartition(n)` is a
    * full shuffle; for append-mostly tables run this per partition
    * directory so only the small-file tail is rewritten. Returns
    * (files before, files after). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetRecordsPerFile: Long): (Int, Int) = {
    import org.apache.spark.sql.functions.input_file_name
    val df = spark.read.parquet(inPath)
    val before = df.select(input_file_name()).distinct().count().toInt
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
    df.repartition(nFiles)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
    val after = spark.read.parquet(outPath)
      .select(input_file_name()).distinct().count().toInt
    (before, after)
  }

  /** Range-clustered write — the data-skipping layout: rows are
    * range-partitioned AND sorted within files on `keyCol`, so every
    * file covers a disjoint key interval and parquet row-group min/max
    * statistics let a point or range predicate skip all but the
    * relevant files. This is the poor-man's Z-order for a single
    * dominant predicate column; at 100 TB it turns a full scan into a
    * handful of row groups. The sort is per-partition (no global
    * sort barrier beyond the range exchange's sampling pass). */
  def writeRangeLayout(df: DataFrame, path: String, keyCol: String,
      numFiles: Int): Unit =
    rangeCluster(df, keyCol, numFiles)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The clustering transform alone (range exchange + in-partition
    * sort) — reused by the path writer above, by catalog inserts
    * honoring `layout.range`, and by layout-aware compaction. */
  def rangeCluster(df: DataFrame, keyCol: String, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)

  /** Bit-interleaved Z-order key over two non-negative integer columns
    * (each masked to `bits` low bits): bit i of `x` lands at position
    * 2i, bit i of `y` at 2i+1. Unrolled fold → one codegen'd expression,
    * no UDF. Inputs must already be comparable-scale (normalized); use
    * [[writeZOrderLayout]] for automatic min-max normalization.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(org.apache.spark.sql.functions.lit(0L)) {
      (acc, i) =>
        acc
          .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
          .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** The DuckDB rendering of [[zorderKey]] (generated unrolled OR chain
    * — exact bit-for-bit parity with the Spark fold). */
  def zorderKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Multi-dimensional clustering: min-max-normalize two columns to
    * `bits`-bit ranks, range-partition + sort by their interleaved
    * Z-order key, and write. Files then cover small RECTANGLES in
    * (c1, c2) space instead of stripes in one column, so parquet
    * min/max row-group stats prune scans filtered on EITHER column —
    * the data-skipping layout for two-predicate workloads (the same
    * contract as Delta's OPTIMIZE ZORDER BY). Normalization is linear
    * min-max (one tiny agg job); heavily skewed dimensions would want
    * rank (quantile) normalization instead — documented trade-off.
    */
  def writeZOrderLayout(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int, bits: Int = 10): Unit =
    zorderCluster(df, c1, c2, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The Z-order clustering transform alone (min-max normalize, range
    * exchange + sort by the interleaved key) — see [[writeZOrderLayout]]
    * for the layout contract. */
  def zorderCluster(df: DataFrame, c1: String, c2: String,
      numFiles: Int, bits: Int = 10): DataFrame = {
    val r = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return df // empty batch: as-is
    val (lo1, hi1, lo2, hi2) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val n = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(n), floor((c.cast("double") - lo) / (hi - lo) * (n + 1))
        .cast("long"))
    val zk = "__zkey"
    df.withColumn(zk,
        zorderKey(norm(col(c1), lo1, hi1), norm(col(c2), lo2, hi2), bits))
      .repartitionByRange(numFiles, col(zk))
      .sortWithinPartitions(zk)
      .drop(zk)
  }

  /** Apply the table's DECLARED clustering (`layout.range` = one key,
    * or `layout.zorder` = "c1,c2"; `layout.files` caps files per
    * batch) to a batch about to be committed. Columns missing from the
    * batch (or no declared layout) pass the batch through unchanged —
    * layout is an optimization, never a write barrier. */
  private[sources] def clusterByLayout(df: DataFrame, table: String,
      toRelease: scala.collection.mutable.Buffer[DataFrame]): DataFrame =
    clusterByLayoutProps(df, tableProperties(table), toRelease)

  private[sources] def clusterByLayoutProps(df: DataFrame,
      props: Map[String, String],
      toRelease: scala.collection.mutable.Buffer[DataFrame] =
        scala.collection.mutable.Buffer.empty): DataFrame = {
    val files = props.get("layout.files").map(_.trim.toInt).getOrElse(8)
    props.get("layout.range").map(_.trim) match {
      case Some(key) if df.schema.fieldNames.contains(key) =>
        rangeCluster(df, key, files)
      case _ =>
        props.get("layout.zorder")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty)) match {
          case Some(Array(c1, c2))
              if df.schema.fieldNames.contains(c1) &&
                df.schema.fieldNames.contains(c2) =>
            // pin the batch before the bounds aggregate: the z-order
            // normalization needs min/max FIRST, and without
            // materialization an INSERT ... SELECT's arbitrary query
            // would execute twice (once for bounds, once for the
            // write). persist (recomputable, caller unpersists after
            // the commit via clusterCleanup) rather than
            // localCheckpoint (non-fault-tolerant, never released)
            val pinned = df.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            toRelease.append(pinned)
            zorderCluster(pinned, c1, c2, files)
          case _ => df
        }
    }
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar format Spark ships natively (vectorized
    * reader, predicate pushdown, column pruning all apply, same as
    * parquet). Schema is taken from the ORC footers (self-describing);
    * pass a `StructType` via `.schema` upstream only to pin column
    * order. Avro is NOT exposed: the `spark-avro` datasource module is
    * not on this classpath (only avro-core), and adding deps is out of
    * contract. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  // ---- Snapshot-versioned table (manifest-pinned file lists) ----------
  //
  // The minimal table format: every commit writes its data files into an
  // immutable batch directory, then atomically publishes a manifest
  // (v<N>.manifest, one absolute file path per line) that names the
  // table's EXACT file set at that version. Readers resolve a manifest
  // once and scan only its files, so they are isolated from concurrent
  // commits (no torn reads of a directory being rewritten), old versions
  // remain queryable (time travel), and a bad commit is undone by
  // re-publishing an old file list (rollback without data movement).
  // This is the property the incremental-dedup store had to hand-roll
  // (pin the file list at call time) and the contract Delta/Iceberg
  // scale to thousands of commits; directory listing is the anti-pattern
  // it replaces. The manifest write is temp-file + atomic rename.

  // ---- writer-recorded per-file footer schemas (`_COLS` sidecars) --------
  // Read paths that need a PER-FILE schema (the eq-delete generation
  // split, the evolved-read generation grouping) used to open O(files)
  // parquet footers driver-side — serial metadata IO that stalls the
  // driver on a wide CDF range (round-9 verdict). The WRITER knows the
  // footer shape at commit time, so every batch write now records it:
  // a `_COLS` sidecar at the batch root (`*\t<schemaJson>` — applies to
  // every parquet file below) or, for pre-written streaming epoch
  // files, appended per-file lines (`<basename>\t<schemaJson>`). The
  // underscore prefix keeps it invisible to Spark's file index.
  // Resolution falls back to a footer open ONLY for pre-sidecar files —
  // counted in [[footerProbes]] so EqualityDeleteSpec can witness the
  // zero-open path.

  private[graft] val footerProbes =
    new java.util.concurrent.atomic.AtomicLong(0)
  // file -> footer schema; entries are immutable once written (batch
  // dirs are uuid-named and never rewritten), so a process-wide cache
  // is safe and collapses repeated CDF ranges to zero metadata IO.
  // BOUNDED: an always-on maintainer driver resolves one entry per
  // data file ever written across every table in the process —
  // unbounded, that is a slow heap leak, so the cache resets once it
  // crosses a generous ceiling (a reset only costs re-reading _COLS
  // sidecar lines, never parquet footers, for files still referenced)
  private val fileSchemaCacheMax = 1 << 16
  private val fileSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def recordBatchCols(batchPath: String, footer: StructType): Unit = {
    val p = java.nio.file.Paths.get(batchPath, "_COLS")
    // a 0-partition write creates no dir — nothing to describe
    if (java.nio.file.Files.exists(p.getParent))
      java.nio.file.Files.write(p, s"*\t${footer.json}\n".getBytes("UTF-8"))
  }

  /** Append per-file footer-schema lines next to pre-written files (the
    * streaming-epoch commit path, where many epochs share one dir).
    * Epoch commits are serialized per query; a torn line from a crash
    * mid-append is skipped by the defensive parse and that file simply
    * falls back to a footer probe. */
  private[sources] def recordFileCols(files: Seq[String],
      footer: StructType): Unit =
    files.groupBy(f => java.nio.file.Paths.get(f).getParent).foreach {
      case (dir, fs) if dir != null && java.nio.file.Files.exists(dir) =>
        val lines = fs.map(f =>
          s"${java.nio.file.Paths.get(f).getFileName}\t${footer.json}\n")
          .mkString
        java.nio.file.Files.write(dir.resolve("_COLS"),
          lines.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      case _ => ()
    }

  private def parseColsLines(p: java.nio.file.Path): Seq[(String, StructType)] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq.flatMap { l =>
      l.split("\t", 2) match {
        case Array(n, j) =>
          try Some(n -> org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[StructType])
          catch { case _: Exception => None } // torn/foreign line: skip
        case _ => None
      }
    }

  /** Footer schema of one committed parquet file, resolved from the
    * writer-recorded `_COLS` sidecar (exact-name line in the file's own
    * dir, else the nearest ancestor's `*` line), with a counted footer
    * open only for pre-sidecar files. */
  private[sources] def fileSchemaOf(spark: SparkSession,
      file: String): StructType = {
    val cached = fileSchemaCache.get(file)
    if (cached != null) return cached
    val fp = java.nio.file.Paths.get(file)
    val base = fp.getFileName.toString
    @annotation.tailrec
    def lookup(dir: java.nio.file.Path, depth: Int): Option[StructType] =
      if (dir == null || depth > 8) None
      else {
        val c = dir.resolve("_COLS")
        val hit =
          if (!java.nio.file.Files.exists(c)) None
          else {
            val lines = parseColsLines(c)
            lines.collectFirst { case (n, s) if n == base => s }
              .orElse(lines.collectFirst { case ("*", s) => s })
          }
        hit match {
          case some @ Some(_) => some
          case None => lookup(dir.getParent, depth + 1)
        }
      }
    val resolved = lookup(fp.getParent, 0).getOrElse {
      footerProbes.incrementAndGet()
      spark.read.parquet(file).schema
    }
    if (fileSchemaCache.size() >= fileSchemaCacheMax)
      fileSchemaCache.clear()
    fileSchemaCache.put(file, resolved)
    resolved
  }

  private def manifestDir(table: String) = new java.io.File(table)

  private[sources] def versionsOf(table: String): Seq[Int] = {
    val d = manifestDir(table)
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName)
      .collect { case s if s.matches("v\\d+\\.manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  private[sources] def filesOf(table: String, version: Int): Seq[String] = {
    val p = java.nio.file.Paths.get(table, s"v$version.manifest")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
      // `#`-prefixed lines are metadata trailers (staged-sidecar
      // pointers), not data files
      .filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  /** Latest committed version of `table`, or 0 if none. */
  def latestVersion(table: String): Int = versionsOf(table).lastOption.getOrElse(0)

  /** Commit `df` to `table` as a new version. `overwrite = false`
    * appends to the previous version's file set; `true` replaces it.
    * Returns the published version number.
    *
    * Optimistic concurrency: the data batch is written ONCE (immutable,
    * uniquely named), then the manifest publish claims the next version
    * number atomically ([[publishManifest]]); if a concurrent committer
    * claimed it first, the commit RE-READS the new latest file set and
    * retries with the next number — append commits commute (each
    * retry re-carries the winner's files, so no commit is ever lost)
    * and an overwrite retry still means "replace whatever is latest".
    * This is the contended-commit protocol every shared table format
    * needs (Delta/Iceberg do the same dance against the log store);
    * a bounded attempt count turns pathological contention into a loud
    * failure instead of livelock. */
  /** On a lineage table, a caller batch must never supply the reserved
    * `_row_id` column: the read-side coalesce PREFERS a materialized
    * column, so forged or duplicated ids would silently corrupt row
    * identity (and multiply matches in the lineage feed's full-outer
    * join). Mirrors the enable-time guard; the internal rewrite paths
    * that legitimately materialize ids (CoW survivors, the SQL delta
    * write) publish directly and never pass through here. */
  private def requireNoForgedRowIds(table: String, schema: StructType,
      op: String): Unit =
    require(!(schema.fieldNames.contains(RowIds.COL) &&
        RowIds.enabled(table)),
      s"$op on $table: the batch carries ${RowIds.COL}, the reserved " +
        "lineage identity column — ids are table-assigned, never " +
        "caller-supplied")

  def commitVersion(df: DataFrame, table: String,
      overwrite: Boolean = false): Int = {
    requireNoForgedRowIds(table, df.schema, "commitVersion")
    val files = writeBatch(df, table)
    try publishNextVersion(table, files, overwrite,
      batchSchema = Some(df.schema))
    catch { case e: IllegalArgumentException =>
      // schema-incompatible append (or exhausted publish race): nothing
      // was published, so the just-written batch would be stranded —
      // delete it before surfacing the rejection
      files.headOption.foreach(f =>
        deleteBatchDir(java.nio.file.Paths.get(f).getParent))
      throw e
    }
  }

  /** Append-commit PRE-WRITTEN immutable files (a streaming epoch's
    * task outputs) as the next version — the publish half of
    * [[commitVersion]] for writers that already landed their parquet
    * through the executor-side writer machinery. */
  def commitVersionFiles(table: String, files: Seq[String],
      batchSchema: Option[StructType] = None): Int = {
    batchSchema.foreach(s =>
      requireNoForgedRowIds(table, s, "commitVersionFiles"))
    // pre-written epoch files share dirs across epochs — record their
    // footer shape per file so CDF readers never re-open the footers
    batchSchema.foreach(recordFileCols(files, _))
    publishNextVersion(table, files, overwrite = false,
      batchSchema = batchSchema)
  }

  /** Write `df` as an immutable, uniquely-named batch directory under
    * the table and return its file list — the data half of every
    * commit path. */
  private def writeBatch(df: DataFrame, table: String): Seq[String] = {
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-${java.util.UUID.randomUUID().toString.take(12)}")
    writePartitionedBatch(df, table, batch.toString)
    // recursive walk (partitioned batches nest c=v/ dirs); a
    // 0-partition input (e.g. TRUNCATE's empty frame) yields Nil
    batchParquetFiles(batch)
  }

  /** Recursively delete a directory tree (a rejected/orphaned batch
    * dir, a dropped table, a dropped namespace) — partitioned writes
    * create subdirectories, so a flat listFiles().delete() would
    * silently leave the tree (and its data) stranded on disk. The ONE
    * destructive-filesystem helper; every caller routes through it. */
  private[graft] def deleteTree(path: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(path).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  private def deleteBatchDir(path: java.nio.file.Path): Unit =
    deleteTree(path)

  /** The ONE contended-publish loop shared by every commutable commit
    * path ([[commitVersion]], [[commitVersionChecked]]): claim
    * latest+1, and on losing the race re-read the new latest (append
    * re-carries the winner's files; overwrite still replaces whatever
    * is latest) and try the next number. Bounded so pathological
    * contention fails loudly instead of livelocking. NOT used by
    * [[mergeVersion]]/[[rollbackTo]], whose semantics do not commute
    * with a racing commit — they DETECT the conflict instead. */
  private def publishNextVersion(table: String, newFiles: Seq[String],
      overwrite: Boolean, batchSchema: Option[StructType] = None): Int = {
    var attempt = 0
    while (true) {
      val prev = latestVersion(table)
      val next = prev + 1
      val carried = if (overwrite || prev == 0) Nil else filesOf(table, prev)
      // Declared-schema carry-forward: once a table has been evolved
      // (some prior version pinned a sidecar), a PLAIN append must not
      // silently revert the read surface to "footer of the first data
      // file" — with mixed file generations that is an arbitrary
      // generation, and evolved columns can vanish from SQL reads. So
      // an append onto a declared version re-declares: previous schema
      // evolved by the incoming batch's (strict — a narrowing batch is
      // REJECTED here, before any manifest is published, same contract
      // as commitVersionEvolving). Overwrites replace the file set
      // wholesale, so the batch footer IS the schema — no sidecar.
      // Computed before the publish so an incompatible batch fails
      // without claiming a version number.
      val declaredNext: Option[StructType] =
        if (overwrite || prev == 0)
          // an EMPTY replacing/first version has no data-file footer to
          // fall back to — pin the batch schema or the table becomes
          // unreadable (schemaOf would .head an empty file list)
          if (newFiles.isEmpty) batchSchema else None
        else batchSchema.flatMap(bs =>
          declaredSchema(table, prev).map(ds =>
            evolveSchema(ds, bs, Map.empty)))
      // DV + eq carry: an APPEND keeps the previous files in the
      // manifest, so their deleted rows must stay deleted in the new
      // version; an overwrite replaces the file set and starts clean.
      // STAGED before the claim (recomputed per attempt against the
      // re-read latest) so a concurrent carry pass can never observe
      // the claimed manifest without its delete state.
      val dv = if (overwrite || prev == 0) Map.empty[String, java.util.BitSet]
        else carriedDv(table, prev, carried)
      val eq = if (overwrite || prev == 0) Nil
        else carriedEq(table, prev, carried)
      val staged =
        (if (dv.nonEmpty) Map("dv" -> stageSidecar(table, "dv",
          dvText(dv).getBytes("UTF-8"))) else Map.empty[String, String]) ++
          (if (eq.nonEmpty) Map("eq" -> stageSidecar(table, "eq",
            eqText(eq).getBytes("UTF-8"))) else Map.empty[String, String])
      try {
        publishManifest(table, next, carried ++ newFiles, staged)
        promoteStaged(table, next, staged)
        declaredNext.foreach(publishSchema(table, next, _))
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          discardStaged(table, staged)
          attempt += 1
          require(attempt < 64,
            s"publishNextVersion: lost the publish race $attempt times on $table")
      }
    }
    -1 // unreachable
  }

  /** Publish `files` as version latest+1, REQUIRING that `basedOn` is
    * still the latest — the conflict-DETECTING publish for operations
    * whose file list was derived from a specific version and is stale
    * the moment anyone else commits (merge's carried list, rollback's
    * restore target). A lost race surfaces as ConcurrentModification
    * with a clear retry instruction, never a silent lost update and
    * never a raw filesystem exception. */
  private[sources] def publishIfLatest(table: String, basedOn: Int,
      files: Seq[String], op: String): Int = {
    val next = basedOn + 1
    try {
      publishManifest(table, next, files)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"$op on $table was based on v$basedOn but another commit " +
            s"claimed v$next first; re-read the table and retry the $op")
    }
  }

  /** Re-publish `version`'s exact file list as the new latest —
    * rollback with zero data movement. Conflict-detecting: if another
    * commit lands while rolling back, the rollback FAILS (restoring
    * over an unseen commit would silently discard it). */
  def rollbackTo(table: String, version: Int): Int = {
    // the restored version's DV + eq state rides the claim (staged) —
    // a racing committer's carry pass must never see the rolled-back
    // manifest without its delete sidecars
    val next = publishIfLatestWith(table, latestVersion(table),
      filesOf(table, version), "rollback",
      dv = dvOf(table, version), eq = eqOf(table, version))
    // a rollback restores the old SCHEMA contract too, or readers of
    // the restored file set would see a later declared schema — and
    // the old stats sidecar (identical file set, identical stats)
    declaredSchema(table, version).foreach(publishSchema(table, next, _))
    copyStatsSidecar(table, version, next)
    next
  }

  /** Atomically publish `files` as the `version` manifest, or throw
    * `FileAlreadyExistsException` if that version was already claimed.
    *
    * The content is written to a temp file first, then HARD-LINKED to
    * the manifest name: link creation is the one filesystem primitive
    * that both fails atomically when the target exists (the version
    * claim — O_EXCL semantics) and exposes only complete content to
    * readers (the link points at fully-written bytes). The previous
    * `Files.move` without REPLACE_EXISTING looked equivalent but its
    * exists-check + rename is NOT atomic on POSIX — two racing
    * committers could both pass the check and the second rename would
    * silently OVERWRITE the first manifest, losing a commit. */
  private[sources] def publishManifest(table: String, version: Int,
      files: Seq[String], sidecars: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Paths.get(table)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, s".v$version", ".tmp")
    // trailer lines point at PRE-STAGED sidecar files (see
    // [[stageSidecar]]) so a reader that can see this manifest can
    // always resolve complete DV/eq state — the claim and its
    // correctness-bearing sidecars publish as one atomic unit
    val lines = files ++ sidecars.toSeq.sortBy(_._1)
      .map { case (ext, name) => s"#sidecar\t$ext\t$name" }
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes("UTF-8"))
    try java.nio.file.Files.createLink(dir.resolve(s"v$version.manifest"), tmp)
    finally java.nio.file.Files.deleteIfExists(tmp)
    // row-lineage tables persist the version's id assignment eagerly
    // (deterministic derivation makes this a best-effort cache write —
    // a crash here self-heals on the next read); disabled tables pay
    // one properties-file probe
    if (RowIds.enabled(table)) RowIds.ensure(table, version)
  }

  // ---- staged sidecars: closing the claim→sidecar publish window -----
  //
  // A committer that writes its DV/eq sidecars AFTER claiming the
  // manifest leaves a window in which a racing committer's carry pass
  // reads the claimed version WITHOUT its sidecars — the brand-new
  // delete entries silently drop out of every later version and the
  // retired rows resurrect (the classic sidecar TOCTOU). Closed here
  // by inverting the order: sidecar CONTENT is written to a
  // uniquely-named staged file BEFORE the claim, the manifest carries a
  // `#sidecar <ext> <name>` trailer naming it, and the atomic manifest
  // link publishes both at once. After a successful claim the staged
  // file is renamed to the canonical `v<N>.<ext>`; if the committer
  // dies in between, any reader repairs the rename on first resolve.

  /** Write sidecar bytes under a unique staged name (returns it). */
  private def stageSidecar(table: String, ext: String,
      bytes: Array[Byte]): String = {
    val name = s".staged-${java.util.UUID.randomUUID().toString.take(12)}.$ext"
    val dir = java.nio.file.Paths.get(table)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".stage", ".tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    name
  }

  /** ext -> staged-file name for a version's manifest trailers. */
  private[sources] def sidecarPointersOf(table: String,
      version: Int): Map[String, String] = {
    val p = java.nio.file.Paths.get(table, s"v$version.manifest")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .filter(_.startsWith("#sidecar\t"))
      .flatMap { l =>
        scala.util.Try {
          val Array(_, ext, name) = l.split("\t", 3)
          ext -> name
        }.toOption
      }.toMap
  }

  /** Resolve a version's sidecar file: the canonical `v<N>.<ext>` if
    * present, else the manifest's staged pointer (repair-renaming it to
    * canonical opportunistically — racing the committer's own rename is
    * benign, ATOMIC_MOVE of the same source lets exactly one win). */
  private def resolveSidecar(table: String, version: Int,
      ext: String): Option[java.nio.file.Path] = {
    val canonical = java.nio.file.Paths.get(table, s"v$version.$ext")
    if (java.nio.file.Files.exists(canonical)) Some(canonical)
    else sidecarPointersOf(table, version).get(ext).flatMap { name =>
      val staged = java.nio.file.Paths.get(table, name)
      if (java.nio.file.Files.exists(staged)) {
        scala.util.Try(java.nio.file.Files.move(staged, canonical,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE))
        if (java.nio.file.Files.exists(canonical)) Some(canonical)
        else if (java.nio.file.Files.exists(staged)) Some(staged)
        else None
      } else if (java.nio.file.Files.exists(canonical)) Some(canonical)
      else None
    }
  }

  private def promoteStaged(table: String, version: Int,
      staged: Map[String, String]): Unit =
    staged.foreach { case (ext, name) =>
      scala.util.Try(java.nio.file.Files.move(
        java.nio.file.Paths.get(table, name),
        java.nio.file.Paths.get(table, s"v$version.$ext"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE))
    }

  private def discardStaged(table: String, staged: Map[String, String]): Unit =
    staged.foreach { case (_, name) =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, name))
    }

  /** [[publishIfLatest]] with sidecar content published atomically with
    * the claim (ext -> serialized bytes). On a lost race the staged
    * files are deleted before the conflict surfaces. */
  private[sources] def publishIfLatestStaged(table: String, basedOn: Int,
      files: Seq[String], op: String,
      sidecarBytes: Map[String, Array[Byte]]): Int = {
    val staged = sidecarBytes.map { case (ext, bytes) =>
      ext -> stageSidecar(table, ext, bytes) }
    val next = basedOn + 1
    try {
      publishManifest(table, next, files, staged)
      promoteStaged(table, next, staged)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        discardStaged(table, staged)
        throw new java.util.ConcurrentModificationException(
          s"$op on $table was based on v$basedOn but another commit " +
            s"claimed v$next first; re-read the table and retry the $op")
    }
  }

  /** The common conflict-detecting publish with DV + eq entries riding
    * the claim — every row-delete-bearing commit path routes here. */
  private[sources] def publishIfLatestWith(table: String, basedOn: Int,
      files: Seq[String], op: String,
      dv: Map[String, java.util.BitSet] = Map.empty,
      eq: Seq[EqEntry] = Nil): Int =
    publishIfLatestStaged(table, basedOn, files, op,
      (if (dv.nonEmpty) Map("dv" -> dvText(dv).getBytes("UTF-8"))
       else Map.empty[String, Array[Byte]]) ++
        (if (eq.nonEmpty) Map("eq" -> eqText(eq).getBytes("UTF-8"))
         else Map.empty[String, Array[Byte]]))

  /** Read `table` at `version` (default: latest) by its pinned file
    * list. An empty table (version 0) is an error by design — there is
    * no schema to serve. Deleted-row positions recorded in the
    * version's DV sidecar ([[deleteWhereDv]]) are filtered out. */
  def readVersion(spark: SparkSession, table: String,
      version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(table) else version
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    if (files.isEmpty)
      // an emptied version (delete-all / TRUNCATE / CREATE) serves its
      // pinned declared schema as an empty relation
      declaredSchema(table, v) match {
        case Some(s) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        case None => throw new IllegalArgumentException(
          s"$table v$v has an empty file list and no declared schema")
      }
    else if (partitionColumnsOf(table).nonEmpty)
      // partitioned: the manifest index reattaches partition columns
      // from the hive paths (a flat read would null them)
      applyEq(spark,
        applyDv(ManifestFileIndex.frameForFiles(spark, table, v, None),
          dvOf(table, v)), table, v)
    else
      // DECLARED schema where one exists: after a type widening, file
      // generations mix (int32 and int64 cnt); footer inference would
      // pick whichever file lists first and crash on the other
      // generation — the declared read widens narrow generations
      // through the parquet reader's type promotion instead
      applyEq(spark,
        applyDv(declaredSchema(table, v)
          .fold(spark.read)(sc => spark.read.schema(sc))
          .parquet(files: _*), dvOf(table, v)), table, v)
  }

  // ---- deletion vectors: merge-on-read row-level deletes -------------
  //
  // A point DELETE on a copy-on-write table rewrites the whole
  // containing file — at 100 TB a one-row GDPR erasure becomes a
  // multi-GB write. The `v<N>.dv` sidecar replaces that with
  // MERGE-ON-READ: the delete COMMIT records only (file -> deleted row
  // positions) next to an UNCHANGED manifest (zero data-file rewrite),
  // and every reader filters the marked positions out via the scan's
  // own `_metadata.row_index`. Deletes become metadata-speed; the read
  // tax is one broadcast bitset probe per row of a DV'd file, and it is
  // RECLAIMED — compaction ([[compactVersion]]) and the targeted
  // [[purgeDv]] rewrite absorb DVs back into clean files. This is the
  // Delta/Iceberg deletion-vector design on the manifest format:
  //  - positions come from the parquet scan's stable `_metadata.row_index`
  //    (data files are immutable, so a position pins a row forever);
  //  - the sidecar is commit metadata (KBs), published with the same
  //    atomic protocol as the manifest, versioned with it (time travel
  //    sees each version's own DVs; rollback restores them);
  //  - appends CARRY the previous version's DVs forward (a deleted row
  //    must not resurrect under an unrelated commit), rewrites DROP the
  //    entries of the files they replace, vacuum sweeps the sidecar
  //    with its manifest.

  /** file -> deleted-row positions for a version; empty if the version
    * has no DV sidecar. Malformed lines degrade to "no DV" for their
    * file — that file's rows all read as live, which is the only safe
    * default (a dropped DELETE is recoverable by re-running it; rows
    * silently vanishing to a parse bug are not). */
  def dvOf(table: String, version: Int): Map[String, java.util.BitSet] =
    resolveSidecar(table, version, "dv") match {
      case None => Map.empty
      case Some(p) => scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(p)).asScala
        .filter(_.nonEmpty)
        .flatMap { line =>
          scala.util.Try {
            val Array(f, b64) = line.split("\t", 2)
            f -> java.util.BitSet.valueOf(
              java.util.Base64.getDecoder.decode(b64))
          }.toOption
        }.toMap
    }

  /** Total deleted positions recorded for a version — the DV pressure
    * gauge a table owner reads before scheduling [[purgeDv]]. */
  def dvRowCount(table: String, version: Int): Long =
    dvOf(table, version).valuesIterator.map(_.cardinality().toLong).sum

  /** Publish `dv` as the version's DV sidecar (atomic move, same
    * protocol as stats). An empty map publishes nothing — absence IS
    * the clean state. */
  private[sources] def dvText(dv: Map[String, java.util.BitSet]): String =
    dv.toSeq.sortBy(_._1).map { case (f, bits) =>
      s"$f\t${java.util.Base64.getEncoder.encodeToString(bits.toByteArray)}"
    }.mkString("\n")

  // (DV sidecars are no longer written post-claim — content is staged
  // before the manifest claim and published atomically with it via
  // [[publishIfLatestWith]]/[[publishNextVersion]].)

  /** `file:`-scheme scan paths normalized to the absolute form
    * manifests store (`_metadata.file_path` renders `file:///x`,
    * `input_file_name()` renders `file://x` — both must hit the same
    * sidecar key). The URI form is also percent-ENCODED — a space in a
    * hive partition value (`prio=4-NOT SPECIFIED`) renders `%20` — so
    * decode through java.net.URI; an unparsable (already-raw) string
    * falls back to the scheme strip. */
  private[graft] def normalizePath(p: String): String =
    if (!p.startsWith("file:")) p
    else scala.util.Try {
      val u = new java.net.URI(p)
      val path = Option(u.getPath).filter(_.nonEmpty)
      // a host-less `file://x/y` form parses `x` as authority — reattach
      path.map(pt => Option(u.getAuthority).fold(pt)(a => s"/$a$pt"))
        .getOrElse(p.replaceFirst("^file:/+", "/"))
    }.getOrElse(p.replaceFirst("^file:/+", "/"))

  /** Filter `df` (a file-sourced scan of this table's parquet) down to
    * rows NOT marked deleted in `dv`. The probe is one broadcast-held
    * bitset lookup on the scan's own (file_path, row_index) metadata —
    * no join, no shuffle; files without a DV entry pass through on the
    * map-side fast path. Kept out of the plan entirely when `dv` is
    * empty, so clean versions keep the untouched vectorized scan. */
  private[graft] def applyDv(df: DataFrame,
      dv: Map[String, java.util.BitSet]): DataFrame =
    dvFilter(df, dv, keepDeleted = false)

  /** The shared DV row filter: `keepDeleted = false` keeps live rows
    * (every read path), `true` keeps exactly the marked rows (the CDF's
    * delete emission for a grown DV). */
  private[sources] def dvFilter(df: DataFrame, dv: Map[String, java.util.BitSet],
      keepDeleted: Boolean): DataFrame =
    if (dv.isEmpty) df
    else {
      val holder = new DvHolder(dv.map { case (f, b) => f -> b.toByteArray })
      val keep =
        if (keepDeleted) udf((p: String, i: Long) => !holder.alive(p, i))
        else udf((p: String, i: Long) => holder.alive(p, i))
      val cols = df.columns
      df.withColumn("__dv_path", col("_metadata.file_path"))
        .withColumn("__dv_idx", col("_metadata.row_index"))
        .filter(keep(col("__dv_path"), col("__dv_idx")))
        .select(cols.map(col).toSeq: _*)
    }

  // (DV carry for append paths is computed by [[carriedDv]] and staged
  // WITH the manifest claim — see the staged-sidecar protocol above.)

  /** Merge-on-read DELETE: rows matching `cond` are MARKED in the DV
    * sidecar of a new version whose manifest is byte-identical to the
    * previous one — no data file is read beyond the candidate scan, and
    * NONE is rewritten. SQL semantics match [[deleteWhere]] (NULL
    * predicate rows survive). `fileMayMatch` prunes the candidate scan
    * the way it prunes deleteWhere's rewrite set; `maxDvRows` bounds
    * the driver-held position set — a delete wider than that is not a
    * point delete and FALLS BACK to the copy-on-write path, whose cost
    * model (rewrite the affected files) is right for bulk deletes.
    * Returns (version, rows marked, usedDv). */
  def deleteWhereDv(spark: SparkSession, table: String,
      cond: org.apache.spark.sql.Column,
      fileMayMatch: String => Boolean = _ => true,
      maxDvRows: Int = 1 << 20): (Int, Long, Boolean) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val candidates = files.filter(fileMayMatch)
    if (candidates.isEmpty) return (v, 0L, true)
    val prevDv = dvOf(table, v)
    // candidate scan: matching rows' (file, position), minus rows the
    // previous DV (or a pending eq entry) already deleted — marking a
    // dead row would double-count here and double-delete in the CDF;
    // partition-aware so the predicate may reference partition columns
    val matched = applyEq(spark,
        applyDv(readFileSubset(spark, table, v, candidates), prevDv),
        table, v)
      .filter(coalesce(cond, lit(false)))
      .select(col("_metadata.file_path").as("__p"),
        col("_metadata.row_index").as("__i"))
      .limit(maxDvRows + 1).collect()
    if (matched.length > maxDvRows)
      // bulk delete: the position set would outgrow commit metadata —
      // the copy-on-write rewrite is the right tool at this width
      return deleteWhere(spark, table, cond, fileMayMatch) match {
        case (nv, _, _) => (nv, -1L, false)
      }
    if (matched.isEmpty) return (v, 0L, true) // provable no-op: no commit
    val merged = scala.collection.mutable.Map.empty[String, java.util.BitSet]
    prevDv.foreach { case (f, b) =>
      merged(f) = b.clone().asInstanceOf[java.util.BitSet] }
    matched.foreach { r =>
      val f = normalizePath(r.getString(0))
      val i = r.getLong(1)
      require(i <= Int.MaxValue, s"row index $i overflows the DV bitset")
      merged.getOrElseUpdate(f, new java.util.BitSet()).set(i.toInt)
    }
    // same file list, new version: the whole commit is sidecar metadata
    // (merged DV + carried eq ride the claim atomically)
    val next = publishIfLatestWith(table, v, files, "dv-delete",
      dv = merged.toMap, eq = eqOf(table, v))
    declaredSchema(table, v).foreach(publishSchema(table, next, _))
    copyStatsSidecar(table, v, next) // identical files: stats/bloom hold
    (next, matched.length.toLong, true)
  }

  /** Per-file keep-decision from V1 `sources.Filter` conjuncts against
    * the stats/bloom sidecars — [[ManifestFileIndex]]'s `statsKeeper`
    * restated for scans that receive pushdown as source filters (the
    * bucketed scan). Strictly conservative: any shape or type it does
    * not understand KEEPS the file; dropping is only ever proven by a
    * recorded min/max interval or a bloom's definite absence. */
  private[sources] def filterKeeper(table: String, version: Int,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : String => Boolean = {
    import org.apache.spark.sql.sources._
    if (filters.isEmpty) return _ => true
    val numStats = statsOf(table, version)
    val strStats = statsOfString(table, version)
    lazy val blooms: Map[(String, String),
        org.apache.spark.util.sketch.BloomFilter] =
      bloomsOf(table, version).map { case (k, bytes) =>
        k -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      }
    val haveBlooms = bloomColumnsOf(table).nonEmpty
    def num(v: Any): Option[BigDecimal] = v match {
      case null => None
      case b: Byte => Some(BigDecimal(b.toInt))
      case s: Short => Some(BigDecimal(s.toInt))
      case i: Int => Some(BigDecimal(i))
      case l: Long => Some(BigDecimal(l))
      case f: Float => Some(BigDecimal(f.toDouble))
      case d: Double => Some(BigDecimal(d))
      case bd: java.math.BigDecimal => Some(BigDecimal(bd))
      case bd: BigDecimal => Some(bd)
      case _ => None
    }
    def render(v: Any): Option[String] = v match {
      case null => None
      case _: Byte | _: Short | _: Int | _: Long => Some(v.toString)
      case s: String => Some(s)
      case _ => None
    }
    def keep(f: String, flt: Filter): Boolean = flt match {
      case EqualTo(c, v) =>
        val range = num(v).forall(x => numStats.get((f, c)).forall {
          case (mn, mx) => mn <= x && x <= mx
        }) && (v match {
          case s: String => strStats.get((f, c)).forall {
            case (mn, mx) => mn.compareTo(s) <= 0 && mx.compareTo(s) >= 0
          }
          case _ => true
        })
        val bloomOk = !haveBlooms || render(v).forall(s =>
          blooms.get((f, c)).forall(_.mightContainString(s)))
        range && bloomOk
      case In(c, vs) =>
        val cand = vs.filter(_ != null)
        cand.isEmpty || cand.exists(v => keep(f, EqualTo(c, v)))
      case GreaterThan(c, v) =>
        num(v).forall(x => numStats.get((f, c)).forall(_._2 > x)) &&
          (v match {
            case s: String =>
              strStats.get((f, c)).forall(_._2.compareTo(s) > 0)
            case _ => true
          })
      case GreaterThanOrEqual(c, v) =>
        num(v).forall(x => numStats.get((f, c)).forall(_._2 >= x)) &&
          (v match {
            case s: String =>
              strStats.get((f, c)).forall(_._2.compareTo(s) >= 0)
            case _ => true
          })
      case LessThan(c, v) =>
        num(v).forall(x => numStats.get((f, c)).forall(_._1 < x)) &&
          (v match {
            case s: String =>
              strStats.get((f, c)).forall(_._1.compareTo(s) < 0)
            case _ => true
          })
      case LessThanOrEqual(c, v) =>
        num(v).forall(x => numStats.get((f, c)).forall(_._1 <= x)) &&
          (v match {
            case s: String =>
              strStats.get((f, c)).forall(_._1.compareTo(s) <= 0)
            case _ => true
          })
      case And(l, r) => keep(f, l) && keep(f, r)
      case Or(l, r) => keep(f, l) || keep(f, r)
      case _ => true
    }
    f => filters.forall(keep(f, _))
  }

  /** Commit a DELTA: every base file of `basedOn` carried
    * byte-identical, `newFiles` appended, and `deletes` OR-merged into
    * the carried DV sidecar — the driver half of the SQL
    * MERGE/UPDATE/DELETE merge-on-read path ([[GraftDeltaBatchWrite]]).
    * Conflict-detecting (a racing commit fails the publish loudly);
    * schema, stats, and blooms carry forward, only the appended batch
    * is scanned. */
  private[sources] def commitDelta(spark: SparkSession, table: String,
      basedOn: Int, deletes: Map[String, java.util.BitSet],
      newFiles: Seq[String]): Int = {
    val files = filesOf(table, basedOn)
    val known = files.toSet
    deletes.keys.foreach(f => require(known.contains(f),
      s"delta delete references a file outside v$basedOn: $f"))
    val merged = scala.collection.mutable.Map.empty[String, java.util.BitSet]
    dvOf(table, basedOn).foreach { case (f, b) =>
      merged(f) = b.clone().asInstanceOf[java.util.BitSet] }
    deletes.foreach { case (f, b) =>
      merged.get(f) match {
        case Some(acc) => acc.or(b)
        case None => merged(f) = b
      }
    }
    // merged DV + carried eq ride the claim (base files all carry)
    val next = publishIfLatestWith(table, basedOn, files ++ newFiles,
      "delta-write", dv = merged.toMap,
      eq = carriedEq(table, basedOn, files))
    declaredSchema(table, basedOn).foreach(publishSchema(table, next, _))
    val schemaCols = schemaOf(spark, table, basedOn).fieldNames.toSet
    val statCols = statsColumnsOf(table).filter(schemaCols.contains)
    if (statCols.nonEmpty)
      commitStats(spark, table, next, statCols, carryFrom = basedOn)
    val bloomCols = bloomColumnsOf(table).filter(schemaCols.contains)
    if (bloomCols.nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = basedOn)
    next
  }

  /** REORG PURGE: rewrite ONLY the DV'd files with their deletions
    * applied and publish a version with no DV entries for them — the
    * reclamation half of merge-on-read (Delta's `REORG TABLE ... APPLY
    * (PURGE)`). Untouched files (the vast majority at 100 TB) carry
    * forward with their stats; the rewrite is bounded by DV'd-file
    * bytes, not table bytes. Returns (version, files purged). */
  def purgeDv(spark: SparkSession, table: String): (Int, Int) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val dv = dvOf(table, v)
    if (dv.isEmpty) return (v, 0)
    val files = filesOf(table, v)
    val affected = files.filter(dv.contains)
    val carried = files.filterNot(dv.contains)
    // eq-deleted rows of a rewritten file must not resurrect (the new
    // files fall outside every entry's scope) — apply pending eq sets
    // here; carried files keep their entries (staged with the claim)
    val survivors = applyEq(spark,
      applyDv(readFileSubsetForRewrite(spark, table, v, affected), dv),
      table, v)
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-purge-${java.util.UUID.randomUUID().toString.take(8)}")
    writePartitionedBatch(survivors, table, batch.toString)
    val newFiles = batchParquetFiles(batch)
    val next =
      // pending eq entries of the untouched files ride the claim
      try publishIfLatestWith(table, v, carried ++ newFiles, "dv-purge",
        eq = carriedEq(table, v, carried))
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    rewriteSchemaCarry(spark, table, v, next)
    val stattedCols = statsOf(table, v).keys.map(_._2).toSeq.distinct ++
      statsOfString(table, v).keys.map(_._2).toSeq.distinct
    if (stattedCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitStats(spark, table, next, stattedCols.distinct, carryFrom = v)
    val bloomCols = bloomsOf(table, v).keys.map(_._2).toSeq.distinct
    if (bloomCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    // no DV publish: every DV'd file was rewritten — the new version is
    // clean and reads on the untouched vectorized fast path again
    // (pending eq entries DID carry for the untouched files — staged
    // with the claim above)
    (next, affected.length)
  }

  // ---- equality deletes: O(keys) CDC upsert commits -----------------
  //
  // [[mergeVersionDv]] is merge-on-read on the WRITE side too — but it
  // still pays a write-time candidate scan to turn retired keys into
  // file positions. At streaming-CDC rates against 100 TB that scan IS
  // the commit cost: every micro-batch opens every candidate file the
  // key stats cannot rule out. Iceberg's equality delete files answer
  // this by recording only the RETIRED KEYS and deferring the position
  // lookup to read and compaction time. The `v<N>.eq` sidecar lists
  // entries `keyCols \t keysParquetDir \t basedOnVersion`:
  //  - an entry's SCOPE is the manifest of `basedOn` — exactly the
  //    files committed BEFORE it — intersected with the reading
  //    version's manifest. A commit's own appended rows (and every
  //    later append) are outside every earlier scope, so
  //    last-writer-wins composes across any number of eq commits;
  //  - the write cost is O(distinct change keys): one metadata-scale
  //    parquet of keys plus the appended upsert batch. NO base data
  //    file is opened at commit time (EqualityDeleteSpec pins this
  //    with an input-metrics listener);
  //  - every reader drops in-scope rows matching a key set via a
  //    broadcast anti-join per entry — the read tax that [[purgeEq]]
  //    (and any full rewrite, e.g. compaction) reclaims;
  //  - [[vacuumVersions]] retains expired manifests that are still
  //    pinned as a kept version's scope (the manifest file only — its
  //    data files follow the normal liveness rule).

  /** One pending equality-delete set: `keyCols` name the equality
    * columns, `dataPath` the parquet directory of distinct retired key
    * tuples, `basedOn` the version whose manifest is the entry's file
    * scope. */
  case class EqEntry(keyCols: Seq[String], dataPath: String, basedOn: Int)

  /** The version's pending equality-delete entries; empty if none.
    * Malformed lines degrade to "no entry" — same recoverable-loud
    * default as [[dvOf]] (a dropped delete is re-runnable; rows
    * silently vanishing to a parse bug would not be). */
  def eqOf(table: String, version: Int): Seq[EqEntry] =
    resolveSidecar(table, version, "eq") match {
      case None => Nil
      case Some(p) => scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(p)).asScala.toSeq
        .filter(_.nonEmpty)
        .flatMap { line =>
          scala.util.Try {
            val Array(k, d, b) = line.split("\t", 3)
            EqEntry(k.split(",").toSeq, d, b.toInt)
          }.toOption
        }
    }

  /** Total pending equality-delete keys for a version — the pressure
    * gauge a table owner reads before scheduling [[purgeEq]], computed
    * from the key parquets' footers (metadata-scale, no scan). */
  def eqKeyCount(spark: SparkSession, table: String, version: Int): Long =
    eqOf(table, version).map(e =>
      scala.util.Try(spark.read.parquet(e.dataPath).count()).getOrElse(0L)).sum

  private[sources] def eqText(entries: Seq[EqEntry]): String =
    entries.map(e =>
      s"${e.keyCols.mkString(",")}\t${e.dataPath}\t${e.basedOn}")
      .mkString("\n")

  // (eq sidecars likewise publish atomically with the manifest claim —
  // see the staged-sidecar protocol.)

  /** An entry's file scope: `basedOn`'s manifest, normalized; a
    * vacuumed (or otherwise unreadable) scope manifest degrades to the
    * empty scope — [[vacuumVersions]] retains pinned manifests, so
    * this is strictly a belt-and-braces default. */
  private[sources] def eqScope(table: String, e: EqEntry): Set[String] =
    scala.util.Try(filesOf(table, e.basedOn)).getOrElse(Nil)
      .map(normalizePath).toSet

  /** The pending eq entries that survive into a version keeping exactly
    * `keptFiles` — computed BEFORE the claim by every staged-sidecar
    * commit path. */
  private[sources] def carriedEq(table: String, from: Int,
      keptFiles: Seq[String]): Seq[EqEntry] = {
    val kept = keptFiles.map(normalizePath).toSet
    eqOf(table, from).filter(e => (eqScope(table, e) & kept).nonEmpty)
  }

  /** The DV entries that survive into a version keeping exactly
    * `keptFiles` (manifest-path keyed, no normalization — DV keys are
    * manifest paths already). */
  private[sources] def carriedDv(table: String, from: Int,
      keptFiles: Seq[String]): Map[String, java.util.BitSet] = {
    val kept = keptFiles.toSet
    dvOf(table, from).filter { case (f, _) => kept(f) }
  }

  /** Drop rows of in-scope files whose key tuple appears in a pending
    * equality-delete set — the read half of the eq design: one
    * BROADCAST anti-join per entry (key sets are metadata-scale), with
    * the file-scope test riding the join condition so out-of-scope
    * rows (each entry's own upserts and everything appended later)
    * never match. `df` must be a file-sourced scan of this version's
    * parquet (the probe reads `_metadata.file_path`). */
  private[sources] def applyEq(spark: SparkSession, df: DataFrame,
      table: String, version: Int): DataFrame =
    eqFilterEntries(spark, df, table, version, eqOf(table, version))

  /** [[applyEq]]'s core over an explicit entry list — [[readChanges]]
    * needs to apply the from-time subset against the to-time frame. */
  private[sources] def eqFilterEntries(spark: SparkSession, df: DataFrame,
      table: String, version: Int, entries: Seq[EqEntry]): DataFrame = {
    if (entries.isEmpty) df
    else {
      val current = filesOf(table, version).map(normalizePath).toSet
      val cols = df.columns
      val tagged = df.withColumn("__eq_path", col("_metadata.file_path"))
      entries.foldLeft(tagged) { (acc, e) =>
        val scope = eqScope(table, e) & current
        // a generation predating a key column serves it as NULL, and a
        // NULL key matches nothing — skipping the entry for such a
        // frame (readVersionEvolved applies per generation) IS the
        // declared semantic, not a hole
        if (scope.isEmpty || !e.keyCols.forall(cols.contains)) acc
        else {
          val inScope = udf((p: String) => scope.contains(normalizePath(p)))
          val keys = spark.read.parquet(e.dataPath)
          val keyCond = e.keyCols.map(k => acc(k) === keys(k)).reduce(_ && _)
          acc.join(broadcast(keys),
            keyCond && inScope(col("__eq_path")), "left_anti")
        }
      }.select(cols.map(col).toSeq: _*)
    }
  }

  /** Exactly the rows a set of eq `entries` retires from `df` — the
    * CDF's delete-emission helper ([[readChanges]]): marker left-outer
    * joins instead of anti (a row matching several entries must still
    * appear once, with its original multiplicity). */
  private[sources] def eqRetired(spark: SparkSession, df: DataFrame, table: String,
      currentFiles: Set[String], entries: Seq[EqEntry]): DataFrame = {
    val cols = df.columns
    val tagged = df.withColumn("__eq_path", col("_metadata.file_path"))
    val (marked, names) =
      entries.zipWithIndex.foldLeft((tagged, Seq.empty[String])) {
        case ((acc, ns), (e, i)) =>
          val scope = eqScope(table, e) & currentFiles
          // mirror eqFilterEntries' per-generation skip: a frame whose
          // footer schema predates a later-added key column serves it
          // as NULL (matches nothing) — skipping the entry IS the
          // declared semantic, and joining on the absent column would
          // throw AnalysisException instead
          if (scope.isEmpty || !e.keyCols.forall(cols.contains)) (acc, ns)
          else {
            val inScope = udf((p: String) => scope.contains(normalizePath(p)))
            val hit = s"__eq_hit_$i"
            val keys = spark.read.parquet(e.dataPath)
              .withColumn(hit, lit(1))
            val keyCond = e.keyCols.map(k => acc(k) === keys(k)).reduce(_ && _)
            val joined = acc.join(broadcast(keys),
              keyCond && inScope(col("__eq_path")), "left_outer")
            // shed the keys-side columns (same names as the row's own)
            (e.keyCols.foldLeft(joined)((d, k) => d.drop(keys(k))),
              ns :+ hit)
          }
      }
    if (names.isEmpty) df.filter(lit(false))
    else marked
      .filter(names.map(n => col(n) === 1).reduce(_ || _))
      .select(cols.map(col).toSeq: _*)
  }

  /** Physical row positions retired by eq `entries` within exactly
    * `files` — the POSITION form of [[eqRetired]], for consumers whose
    * unit is a (file, bitset) partition (the streaming CDF). One
    * bounded Spark job per entry: the entry's scoped files read with
    * ONLY its key columns + the scan's row-index metadata, one
    * broadcast semi-join against the key parquet, positions collected
    * as bitsets (same driver footprint as the DV sidecars themselves).
    * Per-generation safe: files whose footer schema predates a key
    * column are skipped for that entry — the declared NULL-key-matches-
    * nothing semantic, mirroring [[eqFilterEntries]]. Keys of the
    * returned map are manifest paths. */
  private[sources] def eqRetiredPositions(spark: SparkSession,
      table: String, files: Seq[String],
      entries: Seq[EqEntry]): Map[String, java.util.BitSet] = {
    if (files.isEmpty || entries.isEmpty)
      return Map.empty
    val byPath = files.map(f => normalizePath(f) -> f).toMap
    val out = scala.collection.mutable.Map.empty[String, java.util.BitSet]
    entries.foreach { e =>
      val scoped = eqScope(table, e)
      val target = files.filter(f => scoped.contains(normalizePath(f)))
      if (target.nonEmpty) {
        // generation split: only files whose footer carries every key
        // column participate — resolved from the writer-recorded
        // `_COLS` sidecars, so a wide CDF range costs zero driver-side
        // footer opens ([[fileSchemaOf]])
        val usable = target.filter(f =>
          e.keyCols.forall(
            fileSchemaOf(spark, f).fieldNames.contains))
        if (usable.nonEmpty) {
          val keys = spark.read.parquet(e.dataPath)
          val probe = spark.read.parquet(usable: _*)
            .select((e.keyCols.map(col) :+
              col("_metadata.file_path").as("__p") :+
              col("_metadata.row_index").as("__i")): _*)
          val keyCond = e.keyCols.map(k => probe(k) === keys(k))
            .reduce(_ && _)
          probe.join(broadcast(keys), keyCond, "left_semi")
            .select("__p", "__i").collect().foreach { r =>
              val f = byPath.getOrElse(normalizePath(r.getString(0)),
                r.getString(0))
              val i = r.getLong(1)
              require(i <= Int.MaxValue,
                s"row index $i overflows the eq position bitset")
              out.getOrElseUpdate(f, new java.util.BitSet()).set(i.toInt)
            }
        }
      }
    }
    out.toMap
  }

  /** Equality-delete MERGE: the O(keys) CDC upsert commit. Semantics
    * equal [[mergeVersionDv]]/[[mergeVersion]] — for each change key
    * the stored rows disappear, each `upsert` row appears exactly once,
    * `delete` ops just remove, a NULL change key matches nothing — but
    * the commit NEVER opens a base file: it writes the distinct change
    * keys as an equality-delete parquet scoped to the pre-commit
    * manifest, appends the upsert rows, and publishes both as sidecar
    * metadata. Write cost O(change keys); the deferred position work
    * moves to readers (broadcast anti-join per pending entry) until
    * [[purgeEq]] absorbs it. Returns (version, retired key count). */
  def mergeVersionEq(spark: SparkSession, table: String,
      changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): (Int, Long) = {
    require(keyCols.nonEmpty, "mergeVersionEq needs at least one key column")
    requireNoForgedRowIds(table, changes.schema, "mergeVersionEq")
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val eqDir = java.nio.file.Paths.get(table, "eqdel",
      s"eq-${java.util.UUID.randomUUID().toString.take(12)}")
    // the retired-key set: upsert AND delete ops both retire the stored
    // row; NULL-keyed changes match nothing (dropped here, so the key
    // parquet stays a pure equality set). The key count rides the
    // write itself as an Observation — no second job re-reading the
    // parquet just to count it — and a second Observation upstream of
    // the key projection counts upsert ops in the SAME pass, replacing
    // the separate `upserts.isEmpty` probe job.
    val keyObs = new org.apache.spark.sql.Observation()
    val upObs = new org.apache.spark.sql.Observation()
    spark.sparkContext.setJobDescription(s"mergeEq:keywrite $table")
    changes
      .observe(upObs,
        count(when(col(opCol) === "upsert", lit(1))).as("nu"))
      .select(keyCols.map(col): _*).na.drop("any", keyCols)
      .distinct().coalesce(1)
      .observe(keyObs, count(lit(1)).as("n"))
      .write.parquet(eqDir.toString)
    spark.sparkContext.setJobDescription(null)
    def obsLong(o: org.apache.spark.sql.Observation, k: String): Long =
      Option(o.get.getOrElse(k, null)) match {
        case Some(n: Number) => n.longValue()
        case _ => 0L
      }
    val nKeys = obsLong(keyObs, "n")
    val upserts = changes.filter(col(opCol) === "upsert").drop(opCol)
    val hasUpserts = obsLong(upObs, "nu") > 0
    if (nKeys == 0 && !hasUpserts) { // provable no-op: no commit
      deleteTree(eqDir)
      return (v, 0L)
    }
    // appended rows align to the version's effective schema — the
    // partition-aware subset reader's shape, so a partitioned table's
    // batch keeps its partition column and lands hive-laid. Schema
    // only: a footer probe, never a data scan. With the mergeSchema
    // session opt-in, a batch carrying NEW columns evolves the target
    // instead of silently dropping them.
    val targetSchema0 =
      if (files.nonEmpty)
        readFileSubset(spark, table, v, Seq(files.head)).schema
      else schemaOf(spark, table, v)
    val evolved = mergeEvolution(spark, table, v,
      StructType(changes.drop(opCol).schema.fields), targetSchema0)
    val targetSchema = evolved.fold(targetSchema0)(_ =>
      evolveSchema(targetSchema0, changes.drop(opCol).schema, Map.empty))
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-eqmerge-${java.util.UUID.randomUUID().toString.take(8)}")
    val newFiles =
      if (!hasUpserts) Seq.empty[String]
      else {
        writePartitionedBatch(
          alignToSchema(upserts, targetSchema, Map.empty),
          table, batch.toString)
        batchParquetFiles(batch)
      }
    // the new eq entry (and carried DV + prior entries) ride the CLAIM
    // itself: a concurrent committer that loses the race on v+1 and
    // retries its carry pass against this version can never read the
    // manifest without the brand-new entry — the silent-resurrection
    // TOCTOU the post-claim publishEq form had
    val next =
      try publishIfLatestWith(table, v, files ++ newFiles, "eq-merge",
        dv = dvOf(table, v),
        eq = eqOf(table, v) :+ EqEntry(keyCols, eqDir.toString, v))
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (hasUpserts) deleteBatchDir(batch)
          deleteTree(eqDir)
          throw e
      }
    evolved match {
      // evolution PINS the new declared schema (old versions keep
      // theirs — time travel reads the pre-evolution shape forever)
      case Some(e) => publishSchema(table, next, e)
      case None =>
        declaredSchema(table, v).foreach(publishSchema(table, next, _))
    }
    // stats/blooms: carried files carry; ONLY the appended batch is
    // scanned, and only when the table already keeps skipping sidecars
    // — a bare table's eq merge touches zero data files beyond its own
    // batch write
    val schemaCols = schemaOf(spark, table, v).fieldNames.toSet
    if (statsOf(table, v).nonEmpty || statsOfString(table, v).nonEmpty ||
        statsColumnsOf(table).nonEmpty) {
      val statCols = (keyCols ++ statsColumnsOf(table))
        .distinct.filter(schemaCols.contains)
      if (statCols.nonEmpty)
        commitStats(spark, table, next, statCols, carryFrom = v)
    }
    val bloomCols = bloomColumnsOf(table).filter(schemaCols.contains)
    if (bloomCols.nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, nKeys)
  }

  /** REORG PURGE for equality deletes: rewrite exactly the in-scope
    * files with every pending key set (and their DVs) applied, publish
    * a version with NO eq sidecar — the reclamation half of the eq
    * design. Out-of-scope files (each entry's own upserts plus
    * everything later) carry forward byte-identical with their
    * stats/blooms/DVs; the rewrite is bounded by in-scope bytes.
    * Returns (version, files rewritten). */
  def purgeEq(spark: SparkSession, table: String): (Int, Int) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val entries = eqOf(table, v)
    if (entries.isEmpty) return (v, 0)
    val current = filesOf(table, v)
    val inScope = entries.map(e => eqScope(table, e))
      .reduce(_ | _) & current.map(normalizePath).toSet
    val (affected, carried) =
      current.partition(f => inScope.contains(normalizePath(f)))
    if (affected.isEmpty) { // stale entries: absorb as metadata only
      // DVs carry (identical files); NO eq rides the claim — absorbing
      // the dead entries is this branch's whole point
      val next = publishIfLatestWith(table, v, current, "eq-purge",
        dv = dvOf(table, v))
      declaredSchema(table, v).foreach(publishSchema(table, next, _))
      copyStatsSidecar(table, v, next)
      return (next, 0)
    }
    val dv = dvOf(table, v)
    val survivors = applyEq(spark,
      applyDv(readFileSubsetForRewrite(spark, table, v, affected), dv),
      table, v)
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-eqpurge-${java.util.UUID.randomUUID().toString.take(8)}")
    writePartitionedBatch(survivors, table, batch.toString)
    val newFiles = batchParquetFiles(batch)
    // rewritten files' DVs are absorbed with their eq entries; carried
    // (out-of-scope) files keep theirs — staged with the claim; no eq
    // rides: every in-scope file was rewritten, the version is clean
    val next =
      try publishIfLatestWith(table, v, carried ++ newFiles, "eq-purge",
        dv = dv.filter { case (f, _) => !inScope.contains(f) })
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    rewriteSchemaCarry(spark, table, v, next)
    val stattedCols = statsOf(table, v).keys.map(_._2).toSeq.distinct ++
      statsOfString(table, v).keys.map(_._2).toSeq.distinct
    if (stattedCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitStats(spark, table, next, stattedCols.distinct, carryFrom = v)
    val bloomCols = bloomsOf(table, v).keys.map(_._2).toSeq.distinct
    if (bloomCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, affected.length)
  }

  // ---- schema-per-version: the evolution half of the format ---------
  //
  // A version's schema is pinned in a `v<N>.schema` sidecar (JSON,
  // published with the same temp-file + atomic-link protocol as the
  // manifest). Readers of an OLD version see that version's pinned
  // schema forever; an evolving commit widens/renames/extends the
  // declared schema so readers of the NEW version see old files
  // null-filled (added columns), losslessly widened, or mapped through
  // the recorded rename. Sidecar-less versions (every pre-evolution
  // commit) fall back to the head data file's footer, so the feature is
  // strictly additive.

  /** Field-metadata key recording a rename's previous column name. */
  val RenamedFrom = "graft.renamedFrom"

  private[sources] def publishSchema(table: String, version: Int,
      schema: StructType): Unit = {
    val dir = java.nio.file.Paths.get(table)
    val tmp = java.nio.file.Files.createTempFile(dir, s".v$version-schema", ".tmp")
    java.nio.file.Files.write(tmp, schema.json.getBytes("UTF-8"))
    try java.nio.file.Files.createLink(dir.resolve(s"v$version.schema"), tmp)
    catch { // a racing duplicate publish of the same version is benign
      case _: java.nio.file.FileAlreadyExistsException => ()
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** The declared (pinned) schema of `version`, if one was published. */
  def declaredSchema(table: String, version: Int): Option[StructType] = {
    val p = java.nio.file.Paths.get(table, s"v$version.schema")
    if (!java.nio.file.Files.exists(p)) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .asInstanceOf[StructType])
  }

  /** Effective schema of `version`: the pinned sidecar, else the head
    * data file's footer (pre-evolution versions). */
  def schemaOf(spark: SparkSession, table: String, version: Int): StructType =
    declaredSchema(table, version).getOrElse(
      spark.read.parquet(filesOf(table, version).head).schema)

  /** Evolve `prev` (the table's declared schema) by `cur` (the incoming
    * batch's): kept fields widen losslessly or keep their type,
    * `renames: old -> new` re-key a field (the old name is recorded in
    * field metadata so readers can map pre-rename files), fields absent
    * from the batch stay (nullable — new files null-fill them), new
    * fields append (nullable — old files null-fill them). A narrowing
    * type change fails fast: silently truncating 100 TB is a data bug,
    * not an evolution. */
  private[sources] def evolveSchema(prev: StructType, cur: StructType,
      renames: Map[String, String]): StructType = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{MetadataBuilder, StructField}
    val curBy = cur.fields.map(f => f.name -> f).toMap
    val kept = prev.fields.map { f =>
      val newName = renames.getOrElse(f.name, f.name)
      val meta =
        if (newName != f.name)
          new MetadataBuilder().withMetadata(f.metadata)
            .putString(RenamedFrom, f.name).build()
        else f.metadata
      curBy.get(newName) match {
        case Some(c) if c.dataType == f.dataType =>
          StructField(newName, f.dataType, f.nullable || c.nullable, meta)
        case Some(c) if Cast.canUpCast(f.dataType, c.dataType) =>
          StructField(newName, c.dataType, f.nullable || c.nullable, meta)
        case Some(c) =>
          require(Cast.canUpCast(c.dataType, f.dataType),
            s"column $newName: ${c.dataType} vs ${f.dataType} is a narrowing evolution")
          StructField(newName, f.dataType, f.nullable || c.nullable, meta)
        case None => StructField(newName, f.dataType, nullable = true, meta)
      }
    }
    val keptNames = kept.map(_.name).toSet
    val added = cur.fields.filterNot(f => keptNames.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true, f.metadata))
    StructType(kept ++ added)
  }

  /** Write-side schema evolution opt-in (Delta's `mergeSchema`): with
    * `spark.graft.mergeSchema=true` in the session, the keyed CDC
    * merge paths ([[mergeVersionEq]]/[[mergeVersionDv]]) auto-EVOLVE
    * the declared schema by the change batch's — new columns append
    * (old rows read as typed nulls), types widen losslessly — instead
    * of silently dropping the new columns at alignment. Off by
    * default: an unannounced schema change in a CDC feed is usually a
    * bug upstream, and opt-in is the Delta contract too. */
  private[sources] def mergeSchemaOn(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.mergeSchema")
      .exists(_.equalsIgnoreCase("true"))

  /** The CDC-merge evolution decision: Some(evolved declared schema)
    * when the session opted in AND the incoming batch actually extends
    * or widens the table; None leaves the schema contract untouched.
    * `effective` is the version's full logical shape INCLUDING
    * partition columns (the footer-based schemaOf misses those on a
    * hive-laid table — losing them from the declared schema would be
    * an evolution bug, not an evolution). */
  private def mergeEvolution(spark: SparkSession, table: String, v: Int,
      incoming: StructType, effective: StructType): Option[StructType] =
    if (!mergeSchemaOn(spark)) None
    else {
      val cur = declaredSchema(table, v).getOrElse(effective)
      val e = evolveSchema(cur, incoming, Map.empty)
      if (e == cur) None else Some(e)
    }

  /** Append-commit `df` under SCHEMA EVOLUTION: the new version's
    * declared schema is the previous declared schema evolved by `df`'s
    * (see [[evolveSchema]]). Old versions keep their pinned schema;
    * [[readVersionEvolved]] of the new version aligns every file
    * generation to the declared one. Assumes a single evolving writer
    * (concurrent SCHEMA changes need a catalog lock in any format;
    * concurrent data appends remain safe — the data publish still goes
    * through the OCC loop). */
  def commitVersionEvolving(df: DataFrame, table: String,
      renames: Map[String, String] = Map.empty): Int = {
    requireNoForgedRowIds(table, df.schema, "commitVersionEvolving")
    val prevV = latestVersion(table)
    val declared =
      if (prevV == 0) df.schema
      else evolveSchema(schemaOf(df.sparkSession, table, prevV), df.schema, renames)
    // same guard as alterSchema: an evolution must not rename a pending
    // eq entry's key column out from under its read-time anti-join
    val pendingKeys = eqOf(table, prevV).flatMap(_.keyCols).toSet
    val lost = pendingKeys -- declared.fieldNames.toSet
    require(lost.isEmpty,
      s"evolving commit on $table would rename pending equality-delete " +
        s"key column(s) ${lost.mkString(", ")} — purge_eq first")
    val v = publishNextVersion(table, writeBatch(df, table), overwrite = false)
    publishSchema(table, v, declared)
    v
  }

  /** Read `version` under its DECLARED schema, aligning every file
    * generation: stored columns cast with checked lossless widening,
    * renamed columns mapped via the recorded [[RenamedFrom]] metadata,
    * columns a generation predates arriving as typed nulls. A
    * generation = the files sharing one footer schema — bounded by the
    * number of evolutions, never the file count; the per-file schema
    * comes from the writer-recorded `_COLS` sidecar ([[fileSchemaOf]],
    * the file -> schema-id pin a catalog-scale format keeps), not a
    * footer open per file. */
  def readVersionEvolved(spark: SparkSession, table: String,
      version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(table) else version
    require(v > 0, s"$table has no committed versions")
    val declared = schemaOf(spark, table, v)
    val renames = declared.fields.flatMap { f =>
      if (f.metadata.contains(RenamedFrom))
        Some(f.metadata.getString(RenamedFrom) -> f.name)
      else None
    }.toMap
    val dv = dvOf(table, v)
    filesOf(table, v)
      // generation key from the writer-recorded sidecar, not a footer
      // open per file; a recorded/probed nullability drift can only
      // SPLIT a generation (each split is aligned independently and
      // unioned — correct either way), never merge two
      .groupBy(f => fileSchemaOf(spark, f))
      .values.toSeq
      // DV/eq filters BEFORE alignment: the probes need the file
      // scan's own _metadata columns, which the aligning select drops
      .map(g => alignToSchema(
        applyEq(spark, applyDv(spark.read.parquet(g: _*), dv), table, v),
        declared, renames))
      .reduce(_ unionByName _)
  }

  /** Per-file min/max column statistics for a version, persisted as a
    * `v<N>.stats` sidecar next to the manifest — the data-skipping half
    * of the minimal table format (what Delta/Iceberg keep per file in
    * the commit log). Stats are harvested in ONE Spark job over the
    * version's files (`groupBy(input_file_name())`), at commit time —
    * when the data is already hot — never at read time.
    *
    * [[readVersionPruned]] then answers a range predicate by dropping
    * every file whose [min, max] interval misses the query range BEFORE
    * `spark.read` ever sees it. Parquet row-group stats do this within
    * a file the scan already opened; manifest stats skip the file open
    * (and at cluster scale, the task) entirely. Composed with
    * [[writeRangeLayout]] / [[writeZOrderLayout]] — which make per-file
    * intervals disjoint/tight — a selective range query touches O(1)
    * files out of thousands; on unclustered data intervals all overlap
    * and pruning honestly degrades to reading everything (kept-file
    * count is returned so callers can SEE the clustering payoff).
    * Files without a stats row (e.g. committed before stats existed)
    * are always kept — pruning is an optimization, never a filter.
    *
    * Values are stored as decimal strings and compared as BigDecimal:
    * exact for every integer/decimal clustering key (the only sane
    * Z-order/range keys; float keys would inherit float comparison
    * anyway).
    */
  def commitStats(spark: SparkSession, table: String, version: Int,
      cols: Seq[String], carryFrom: Int = -1): Unit = {
    val files = filesOf(table, version)
    // incremental: a file already covered by `carryFrom`'s sidecar is
    // immutable (batch dirs never rewrite), so its stats copy forward
    // without touching the data — what makes per-commit stats O(delta)
    val carried: Map[(String, String), (BigDecimal, BigDecimal)] =
      if (carryFrom > 0) statsOf(table, carryFrom) else Map.empty
    val carriedStr: Map[(String, String), (String, String)] =
      if (carryFrom > 0) statsOfString(table, carryFrom) else Map.empty
    val (have, need) = files.partition(f =>
      cols.forall(c => carried.contains((f, c)) ||
        carriedStr.contains((f, c))))
    val computed =
      if (need.isEmpty) (Seq.empty[String], Seq.empty[String]) else {
      val df = spark.read.parquet(need: _*)
      // partition columns live in paths, not data files — a declared
      // stats column absent from the files is skipped (its pruning is
      // the partition filter's job), never an unresolved-column crash
      val presentCols = cols.filter(df.schema.fieldNames.contains(_))
      val strCols = presentCols.filter(c =>
        df.schema.fields.exists(f => f.name == c &&
          f.dataType == org.apache.spark.sql.types.StringType)).toSet
      // numeric min/max rendered as plain strings, NOT rounded through a
      // fixed decimal scale: a half-up-rounded stored max below the true
      // max would let pruning drop files that contain matching rows (the
      // one bug class a stats sidecar must never have). BigDecimal
      // parses the full double/decimal/integer renderings exactly;
      // unparseable values (NaN/Infinity) and all-NULL files simply get
      // no stats row — unstatted means never pruned.
      //
      // STRING columns (the lang/source/category predicates that
      // dominate text-corpus scans) get tagged `S:`+base64 lines — a
      // pre-string reader's BigDecimal parse fails on the tag and
      // degrades to "no stats" (never a wrong prune). ASCII-only guard:
      // Spark computes string min/max in UTF-8 binary order while the
      // driver-side prune compares UTF-16 code units; the two agree
      // exactly on ASCII and can diverge beyond it, so non-ASCII bounds
      // are simply not written (conservative, file always read).
      val aggs = presentCols.flatMap(c => Seq(
        org.apache.spark.sql.functions.min(col(c))
          .cast("string").as(s"min_$c"),
        org.apache.spark.sql.functions.max(col(c))
          .cast("string").as(s"max_$c")))
      // CBO harvest riding the SAME job: per-file row counts + one
      // mergeable HLL sketch per column (Datasketches — union across
      // files at read time gives the version's NDV without rescanning;
      // cast-to-string is injective per column type, so NDV survives).
      // These feed the DSv2 Statistics the planner sees (numRows +
      // columnStats.distinctCount) — join reordering and broadcast
      // decisions get real cardinalities before AQE ever runs.
      val ndvAggs =
        Seq(org.apache.spark.sql.functions.count(lit(1)).as("__nrows")) ++
          presentCols.map(c => org.apache.spark.sql.functions
            .hll_sketch_agg(col(c).cast("string"), 12).as(s"__hll_$c"))
      def asciiOk(s: String) = s.forall(_ < 128) && s.length <= 256
      def b64(s: String) = java.util.Base64.getEncoder
        .encodeToString(s.getBytes("UTF-8"))
      if (aggs.isEmpty) (Seq.empty[String], Seq.empty[String])
      else {
        spark.sparkContext.setJobDescription(s"stats $table")
        val rows = try df
          .groupBy(org.apache.spark.sql.functions.input_file_name().as("file"))
          .agg((aggs ++ ndvAggs).head, (aggs ++ ndvAggs).tail: _*)
          .collect().toSeq
        finally spark.sparkContext.setJobDescription(null)
        val statLines = rows.flatMap { r =>
          // normalizePath, not a bare scheme strip: hive partition
          // values with spaces render percent-encoded from
          // input_file_name() while manifests store the raw form — an
          // encoded sidecar key would silently miss every lookup
          val file = normalizePath(r.getString(0))
          presentCols.zipWithIndex.flatMap { case (c, i) =>
            (Option(r.getString(1 + 2 * i)), Option(r.getString(2 + 2 * i))) match {
              case (Some(lo), Some(hi)) if strCols.contains(c) =>
                if (asciiOk(lo) && asciiOk(hi))
                  Some(s"$file\t$c\tS:${b64(lo)}\tS:${b64(hi)}")
                else None
              case (Some(lo), Some(hi))
                  if scala.util.Try(BigDecimal(lo)).isSuccess &&
                    scala.util.Try(BigDecimal(hi)).isSuccess =>
                Some(s"$file\t$c\t$lo\t$hi")
              case _ => None
            }
          }
        }
        val base = 1 + 2 * presentCols.length
        val ndvLines = rows.flatMap { r =>
          val file = normalizePath(r.getString(0))
          val enc = java.util.Base64.getEncoder
          Seq(s"R\t$file\t${r.getLong(base)}") ++
            presentCols.zipWithIndex.flatMap { case (c, j) =>
              Option(r.getAs[Array[Byte]](base + 1 + j))
                .map(sk => s"H\t$file\t$c\t${enc.encodeToString(sk)}")
            }
        }
        (statLines, ndvLines)
      }
    }
    val (computedStats, computedNdv) = computed
    val carriedLines = have.flatMap(f => cols.flatMap { c =>
      carried.get((f, c)).map { case (lo, hi) => s"$f\t$c\t$lo\t$hi" }
        .orElse(carriedStr.get((f, c)).map { case (lo, hi) =>
          val enc = java.util.Base64.getEncoder
          s"$f\t$c\tS:${enc.encodeToString(lo.getBytes("UTF-8"))}" +
            s"\tS:${enc.encodeToString(hi.getBytes("UTF-8"))}"
        })
    })
    val lines = (carriedLines ++ computedStats).sorted
    val dir = java.nio.file.Paths.get(table)
    val tmp = java.nio.file.Files.createTempFile(dir, s".s$version", ".tmp")
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve(s"v$version.stats"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // the NDV/rowcount sidecar, same carry discipline: covered files'
    // entries copy forward untouched
    val (ndvRowsC, ndvSketchC) =
      if (carryFrom > 0) ndvOf(table, carryFrom)
      else (Map.empty[String, Long], Map.empty[(String, String), Array[Byte]])
    val enc = java.util.Base64.getEncoder
    val ndvCarried = have.flatMap { f =>
      ndvRowsC.get(f).map(n => s"R\t$f\t$n").toSeq ++
        cols.flatMap(c => ndvSketchC.get((f, c))
          .map(sk => s"H\t$f\t$c\t${enc.encodeToString(sk)}"))
    }
    val ndvAll = (ndvCarried ++ computedNdv).sorted
    if (ndvAll.nonEmpty) {
      val tmpN = java.nio.file.Files.createTempFile(dir, s".n$version", ".tmp")
      java.nio.file.Files.write(tmpN, ndvAll.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmpN, dir.resolve(s"v$version.ndv"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** The `v<N>.ndv` sidecar: per-file row counts and per-(file, col)
    * serialized HLL sketches. Absent/malformed lines degrade to
    * "unknown" — the planner then simply gets no estimate. */
  def ndvOf(table: String,
      version: Int): (Map[String, Long], Map[(String, String), Array[Byte]]) = {
    val p = java.nio.file.Paths.get(table, s"v$version.ndv")
    if (!java.nio.file.Files.exists(p)) (Map.empty, Map.empty)
    else {
      val dec = java.util.Base64.getDecoder
      val ls = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(p)).asScala.filter(_.nonEmpty)
      val rows = ls.flatMap { l =>
        scala.util.Try {
          val Array("R", f, n) = l.split("\t", 3); f -> n.toLong
        }.toOption
      }.toMap
      val sketches = ls.flatMap { l =>
        scala.util.Try {
          val Array("H", f, c, b) = l.split("\t", 4)
          (f, c) -> dec.decode(b)
        }.toOption
      }.toMap
      (rows, sketches)
    }
  }

  /** Exact live row count of a version FROM METADATA alone (sidecar
    * row counts minus DV'd positions), or None when any file lacks
    * coverage — the planner's numRows source. Rows shadowed by pending
    * eq entries are NOT subtracted (unknowable without a scan): the
    * count stays a conservative upper bound, which is the safe side
    * for broadcast decisions. */
  def versionRows(table: String, version: Int): Option[Long] =
    rowsForFiles(table, version, filesOf(table, version))

  /** [[versionRows]] for an arbitrary FILE SUBSET — what a pruned scan
    * (bucket/stats skipping) reports for exactly the files it will
    * read; per-file DV cardinalities subtract per file. */
  def rowsForFiles(table: String, version: Int,
      fs: Seq[String]): Option[Long] = {
    if (fs.isEmpty) return Some(0L)
    val (rows, _) = ndvOf(table, version)
    if (!fs.forall(f => rows.contains(normalizePath(f)))) None
    else {
      val dv = dvOf(table, version)
      Some(math.max(0L, fs.map { f0 =>
        val f = normalizePath(f0)
        rows(f) - dv.get(f).map(_.cardinality().toLong).getOrElse(0L)
      }.sum))
    }
  }

  /** col -> NDV estimate for an arbitrary FILE SUBSET by unioning the
    * per-file HLL sketches (no scan) — only columns every subset file
    * carries a sketch for appear. What a (possibly pruned) scan hands
    * the planner as `columnStats`. */
  def ndvStatsForFiles(table: String, version: Int,
      fs: Seq[String]): Map[String, Long] = {
    if (fs.isEmpty) return Map.empty
    val (_, sk) = ndvOf(table, version)
    val norm = fs.map(normalizePath)
    sk.keys.map(_._2).toSeq.distinct.flatMap { c =>
      val sks = norm.flatMap(f => sk.get((f, c)))
      if (sks.length != norm.length) None
      else scala.util.Try {
        val u = new org.apache.datasketches.hll.Union(12)
        sks.foreach(b => u.update(
          org.apache.datasketches.hll.HllSketch.heapify(b)))
        c -> math.round(u.getEstimate)
      }.toOption
    }.toMap
  }

  /** Version-level NDV for `column` (union over ALL files). */
  def versionNdv(table: String, version: Int,
      column: String): Option[Long] =
    ndvStatsForFiles(table, version, filesOf(table, version)).get(column)

  /** Per-file BLOOM FILTER sidecar (`v<N>.bloom`) — the skipping device
    * min/max stats cannot be: a POINT predicate (`k = X`, `k IN (…)`)
    * on a high-cardinality column that is NOT the clustering key hits
    * every file's [min, max] interval, but a per-file Bloom answers
    * "definitely absent" for all but the files that contain (or
    * falsely claim) the key — Delta's bloom filter index, derived here
    * from one distributed `aggregateByKey` over the version's files
    * (BloomFilter is mergeable, so the build is map-side combinable;
    * at 100 TB each file's bloom is built by the tasks that would read
    * it anyway at commit time). False positives only ever KEEP a file;
    * absence of a sidecar or a column keeps the file too — pruning is
    * an optimization, never a filter. `carryFrom` copies immutable
    * files' blooms forward, so per-commit cost is O(delta). */
  def commitBlooms(spark: SparkSession, table: String, version: Int,
      cols: Seq[String], expectedPerFile: Long = 100000L,
      fpp: Double = 0.01, carryFrom: Int = -1): Unit = {
    import org.apache.spark.util.sketch.BloomFilter
    val files = filesOf(table, version)
    val carried: Map[(String, String), Array[Byte]] =
      if (carryFrom > 0) bloomsOf(table, carryFrom) else Map.empty
    val (have, need) = files.partition(f =>
      cols.forall(c => carried.contains((f, c))))
    val computed: Seq[((String, String), Array[Byte])] =
      if (need.isEmpty) Seq.empty
      else {
        // DECLARED-schema read, like deleteWhere/mergeVersion: a
        // mixed-generation `need` set must not lose evolved columns to
        // one file's footer inference
        val df = declaredSchema(table, version)
          .fold(spark.read)(sc => spark.read.schema(sc)).parquet(need: _*)
        val present = cols.filter(df.schema.fieldNames.contains(_))
        if (present.isEmpty) Seq.empty
        else {
          // ONE job and ONE scan of the `need` files builds every
          // column's filters together (this previously ran one
          // RDD job + full re-scan PER column — 2 bloom columns on a
          // store meant 2 extra jobs per merge, engine-wide)
          spark.sparkContext.setJobDescription(s"blooms $table")
          val perFile = try df
            .select((org.apache.spark.sql.functions.input_file_name()
              .as("f") +: present.map(c => col(c).cast("string").as(c)))
              .toIndexedSeq: _*)
            // normalizePath (not a scheme strip): percent-encoded hive
            // partition dirs must land under the manifest's raw key
            .rdd.map(r => (normalizePath(r.getString(0)), r))
            .aggregateByKey(
              Array.fill(present.size)(
                BloomFilter.create(expectedPerFile, fpp)))(
              (bs, r) => {
                var i = 0
                while (i < bs.length) {
                  if (!r.isNullAt(i + 1)) bs(i).putString(r.getString(i + 1))
                  i += 1
                }
                bs
              },
              (a, b) => {
                var i = 0
                while (i < a.length) { a(i).mergeInPlace(b(i)); i += 1 }
                a
              })
            .collect().toSeq
          finally spark.sparkContext.setJobDescription(null)
          perFile.flatMap { case (f, bs) =>
            present.zipWithIndex.map { case (c, i) =>
              val bos = new java.io.ByteArrayOutputStream()
              bs(i).writeTo(bos)
              (f, c) -> bos.toByteArray
            }
          }
        }
      }
    val lines = (have.flatMap(f => cols.flatMap(c =>
      carried.get((f, c)).map(bytes => (f, c) -> bytes))) ++ computed)
      .map { case ((f, c), bytes) =>
        s"$f\t$c\t${java.util.Base64.getEncoder.encodeToString(bytes)}"
      }.sorted
    val dir = java.nio.file.Paths.get(table)
    val tmp = java.nio.file.Files.createTempFile(dir, s".b$version", ".tmp")
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve(s"v$version.bloom"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** (file, col) -> serialized bloom for a version; malformed lines
    * degrade to "no bloom" (file kept), same contract as stats. */
  def bloomsOf(table: String,
      version: Int): Map[(String, String), Array[Byte]] = {
    val p = java.nio.file.Paths.get(table, s"v$version.bloom")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .filter(_.nonEmpty)
      .flatMap { line =>
        scala.util.Try {
          val Array(f, c, b64) = line.split("\t", 3)
          (f, c) -> java.util.Base64.getDecoder.decode(b64)
        }.toOption
      }.toMap
  }

  /** MERGE as a copy-on-write commit at FILE granularity — the table
    * format's answer to "update/delete a handful of keys in a
    * thousand-file table without rewriting it". `changes` carries the
    * table schema plus an `op` column (`upsert` | `delete`), one row
    * per key (LWW-dedup upstream — [[Warehouse.dedupByKey]] — if the
    * batch can repeat keys).
    *
    * The stats sidecar decides which files the change-set can possibly
    * touch: a file is REWRITTEN only if some change key falls inside
    * its [min, max] key interval (a file without stats must be assumed
    * affected); every other file is carried into the new manifest
    * untouched — no read, no write, stats copied forward
    * ([[commitStats]] `carryFrom`). Rewriting = base rows of affected
    * files minus ALL changed keys, plus the upsert rows (covers
    * update, delete, and brand-new keys in one union). Old versions
    * still read the original files — MERGE is just another commit, so
    * time travel and pinned readers hold by construction.
    *
    * At 100 TB this is the difference between a MERGE that reads the
    * change-set + O(affected files) and one that reads the table: with
    * range/Z-order clustering, a dimension-delta's keys land in a few
    * files. The change-key set collected to the driver is commit
    * metadata (CDC-batch-sized), not data. Returns (new version,
    * affected files rewritten, files carried untouched). */
  def mergeVersion(spark: SparkSession, table: String, changes: DataFrame,
      key: String, opCol: String = "op",
      keyProbeLimit: Int = 100000): (Int, Int, Int) = {
    requireNoForgedRowIds(table, changes.schema, "mergeVersion")
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val (affected, untouched) =
      mergeAffected(spark, table, v, changes, key, keyProbeLimit)
    mergeRewrite(spark, table, v, changes, key, opCol,
      affected, untouched, files)
  }

  /** The merge-key → affected-file probe shared by [[mergeVersion]]
    * and [[mergeVersionDv]]: partition version `v`'s files into
    * (affected, untouched) by intersecting each file's stats interval
    * for `key` with the change set's distinct keys. */
  private def mergeAffected(spark: SparkSession, table: String, v: Int,
      changes: DataFrame, key: String,
      keyProbeLimit: Int): (Seq[String], Seq[String]) = {
    val stats = statsOf(table, v)
    val files = filesOf(table, v)
    import scala.collection.Searching._
    // a NULL merge key equals no stored key (SQL semantics): it selects
    // no file for rewrite and deletes nothing; a null-key upsert row
    // still flows through the insert union below
    //
    // The change-key collect is BOUNDED: at most keyProbeLimit+1
    // distinct keys come to the driver. A small (CDC-batch-sized)
    // change set uses the sorted driver probe; a wide delta switches to
    // the join path below, whose driver-side result is the FILE list
    // (bounded by file count), never the key set.
    // the file-interval probe is TYPED: numeric keys compare through
    // decimal(38,6) against the numeric stats sidecar; STRING keys
    // compare as strings against the S:-tagged sidecar (ASCII-guarded
    // write side makes the comparison order-safe); any other key type
    // degrades to "every file affected" — coarser, never wrong
    val keyType = changes.schema(key).dataType
    val numericKey = keyType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType |
           _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }
    val stringKey = keyType == org.apache.spark.sql.types.StringType
    if (!numericKey) {
      val (affected, untouched) =
        if (!stringKey) (files, Seq.empty[String])
        else {
          val sStats = statsOfString(table, v)
          val sProbe = changes.filter(col(key).isNotNull)
            .select(col(key).cast("string")).distinct()
            .limit(keyProbeLimit + 1).collect().map(_.getString(0))
          if (sProbe.length > keyProbeLimit) (files, Seq.empty[String])
          else {
            val sorted = sProbe.sorted
            files.partition { f =>
              sStats.get((f, key)) match {
                case Some((mn, mx)) =>
                  import scala.collection.Searching._
                  val i = sorted.search(mn).insertionPoint
                  i < sorted.length && sorted(i).compareTo(mx) <= 0
                case None => true
              }
            }
          }
        }
      return (affected, untouched)
    }
    val probe = changes.filter(col(key).isNotNull)
      .select(col(key).cast("decimal(38,6)")).distinct()
      .limit(keyProbeLimit + 1).collect()
    val (affected, untouched) =
      if (probe.length <= keyProbeLimit) {
        val changeKeys = probe.map(r => BigDecimal(r.getDecimal(0))).sorted
        files.partition { f =>
          stats.get((f, key)) match {
            case Some((mn, mx)) =>
              // any change key inside the file's interval? (sorted probe)
              val i = changeKeys.search(mn)(Ordering[BigDecimal]).insertionPoint
              i < changeKeys.length && changeKeys(i) <= mx
            case None => true // no stats: must assume affected
          }
        }
      } else {
        // join-based file-interval intersection: broadcast the tiny
        // (file, min, max) relation from the driver-held stats against
        // the distributed change keys; only hit FILE NAMES are
        // collected. Interval ends are relaxed by one key quantum
        // (decimal(38,6)) so the cast can only widen, never shrink —
        // keeping an extra file is correct, missing one is data loss.
        val statted = files.flatMap(f =>
          stats.get((f, key)).map { case (mn, mx) =>
            (f, mn.toString, mx.toString) })
        val noStats = files.filter(f => !stats.contains((f, key))).toSet
        import spark.implicits._
        val hit =
          if (statted.isEmpty) Set.empty[String]
          else changes.filter(col(key).isNotNull)
            .select(col(key).cast("decimal(38,6)").as("__k"))
            .join(org.apache.spark.sql.functions.broadcast(
              statted.toDF("__f", "__mn", "__mx").select(col("__f"),
                (col("__mn").cast("decimal(38,6)") - lit(0.000001)).as("__mn"),
                (col("__mx").cast("decimal(38,6)") + lit(0.000001)).as("__mx"))),
              col("__k") >= col("__mn") && col("__k") <= col("__mx"))
            .select("__f").distinct().collect().map(_.getString(0)).toSet
        files.partition(f => noStats.contains(f) || hit.contains(f))
      }
    (affected, untouched)
  }

  /** The rewrite-and-publish half of [[mergeVersion]], shared by the
    * numeric-, string-, and untyped-key probe paths. */
  private def mergeRewrite(spark: SparkSession, table: String, v: Int,
      changes: DataFrame, key: String, opCol: String,
      affected: Seq[String], untouched: Seq[String],
      files: Seq[String]): (Int, Int, Int) = {
    // read affected files under the DECLARED schema where one exists —
    // a mixed-generation rewrite must not narrow to one file's footer;
    // subset reads are partition-aware (hive path values reattach)
    val base =
      if (affected.nonEmpty)
        // DV'd/eq-deleted rows are already deleted: the rewrite drops
        // them for good (untouched files keep their entries via
        // carryDv/carryEq)
        applyEq(spark,
          applyDv(readFileSubsetForRewrite(spark, table, v, affected),
            dvOf(table, v)),
          table, v)
      else if (files.nonEmpty)
        readFileSubset(spark, table, v, Seq(files.head))
          .filter(org.apache.spark.sql.functions.lit(false))
      else
        // merging into an emptied (delete-all/TRUNCATE) version: the
        // whole change set is inserts against the pinned schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaOf(spark, table, v))
    val upserts0 = changes.filter(col(opCol) === "upsert").drop(opCol)
    val survivors = base.join(
      changes.select(col(key)).distinct(), Seq(key), "left_anti")
    // lineage: survivors carry their materialized ids; brand-new upsert
    // rows carry NULL and draw from the new file's range at read time
    val upserts =
      if (survivors.columns.contains(RowIds.COL) &&
          !upserts0.columns.contains(RowIds.COL))
        upserts0.withColumn(RowIds.COL,
          lit(null).cast(org.apache.spark.sql.types.LongType))
      else upserts0
    val rewritten = survivors.unionByName(upserts)
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-merge-${java.util.UUID.randomUUID().toString.take(8)}")
    writePartitionedBatch(rewritten, table, batch.toString)
    val newFiles = batchParquetFiles(batch)
    // conflict-DETECTING publish: the untouched list was computed
    // against v — a blind next-number retry after a racing commit would
    // silently drop the racer's files, so a lost race must fail loudly
    // (the caller re-reads and re-merges). The just-written batch is
    // deleted first: no manifest references it, and a retried merge
    // writes a fresh batch, so leaving it would strand disk forever.
    val next =
      // untouched files' DVs + pending eq entries ride the claim
      try publishIfLatestWith(table, v, untouched ++ newFiles, "merge",
        dv = carriedDv(table, v, untouched),
        eq = carriedEq(table, v, untouched))
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    // stats for the merge key PLUS every declared stats column — a
    // merge that recorded only the key would silently drop the other
    // columns' skipping metadata for this version; reads stay correct
    // but the NEXT commit's carryFrom would miss and rescan the table
    val schemaCols = schemaOf(spark, table, v).fieldNames.toSet
    val statCols = (Seq(key) ++ statsColumnsOf(table))
      .distinct.filter(schemaCols.contains)
    commitStats(spark, table, next, statCols, carryFrom = v)
    // same for the bloom sidecar: untouched files carry their filters
    // forward, rewritten files get fresh ones (mirrors GraftBatchWrite)
    val bloomCols = bloomColumnsOf(table).filter(schemaCols.contains)
    if (bloomCols.nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    rewriteSchemaCarry(spark, table, v, next)
    (next, affected.length, untouched.length)
  }

  /** Merge-on-read MERGE: the keyed merge lands WITHOUT rewriting any
    * base file. Matched base rows — the stored versions of keys being
    * upserted or deleted — are MARKED in the new version's DV sidecar;
    * the upsert rows append as one new file batch; every base file
    * carries forward byte-identical with its stats/bloom sidecars. The
    * read tax is the same broadcast bitset probe the DV delete pays,
    * only on DV-carrying versions; [[purgeDv]] reclaims.
    *
    * At 100 TB this turns a CDC batch of point updates from "rewrite
    * every hit file" ([[mergeVersion]]'s copy-on-write, right for wide
    * deltas) into "append the new rows + publish positions": commit
    * I/O is O(changed rows), not O(hit-file bytes) — a one-row update
    * in a clustered 1 GB file costs a position bit and one appended
    * row, not a gigabyte rewrite.
    *
    * SEMANTICS equal [[mergeVersion]]: for each change key the stored
    * rows disappear; each `upsert` row appears exactly once; `delete`
    * ops just remove; a NULL change key matches nothing. CDF consumers
    * observe an updated key as delete(old)+insert(new) inside one
    * version — the standard shape ([[readChanges]] emits a carried
    * file's newly-marked positions as deletes). A change set whose
    * matched-position count exceeds `maxDvRows` is not a point merge:
    * it FALLS BACK to the copy-on-write rewrite, whose cost model is
    * right at that width. Returns (version, rows marked, usedDv). */
  def mergeVersionDv(spark: SparkSession, table: String,
      changes: DataFrame, key: String, opCol: String = "op",
      maxDvRows: Int = 1 << 20,
      keyProbeLimit: Int = 100000): (Int, Long, Boolean) = {
    requireNoForgedRowIds(table, changes.schema, "mergeVersionDv")
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val (affected, _) =
      mergeAffected(spark, table, v, changes, key, keyProbeLimit)
    val prevDv = dvOf(table, v)
    // positions of live base rows whose key appears in the change set
    // (upsert AND delete ops both retire the stored row) — bounded
    // collect, minus rows the previous DV already deleted
    val matched =
      if (affected.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else applyEq(spark,
          applyDv(readFileSubset(spark, table, v, affected), prevDv),
          table, v)
        .select(col(key), col("_metadata.file_path").as("__p"),
          col("_metadata.row_index").as("__i"))
        .join(changes.filter(col(key).isNotNull).select(key).distinct(),
          Seq(key), "left_semi")
        .select("__p", "__i")
        .limit(maxDvRows + 1).collect()
    if (matched.length > maxDvRows)
      return mergeVersion(spark, table, changes, key, opCol,
        keyProbeLimit) match { case (nv, _, _) => (nv, -1L, false) }
    val upserts = changes.filter(col(opCol) === "upsert").drop(opCol)
    val hasUpserts = !upserts.isEmpty
    if (matched.isEmpty && !hasUpserts) return (v, 0L, true) // no-op
    val merged = scala.collection.mutable.Map.empty[String, java.util.BitSet]
    prevDv.foreach { case (f, b) =>
      merged(f) = b.clone().asInstanceOf[java.util.BitSet] }
    matched.foreach { r =>
      val f = normalizePath(r.getString(0))
      val i = r.getLong(1)
      require(i <= Int.MaxValue, s"row index $i overflows the DV bitset")
      merged.getOrElseUpdate(f, new java.util.BitSet()).set(i.toInt)
    }
    // the appended rows must be aligned to the version's effective
    // schema themselves — the rewrite path gets that from unionByName
    // with the base; lossy types fail loudly, missing columns null-fill.
    // On a PARTITIONED table the footer-derived schemaOf misses the
    // partition columns (they live in paths) — take the target schema
    // from the partition-aware subset reader instead, so the batch
    // keeps the partition column and lands hive-laid. With the
    // mergeSchema session opt-in, a batch carrying NEW columns evolves
    // the target instead of silently dropping them.
    val targetSchema0 =
      if (files.nonEmpty)
        readFileSubset(spark, table, v, Seq(files.head)).schema
      else schemaOf(spark, table, v)
    val evolved = mergeEvolution(spark, table, v,
      StructType(changes.drop(opCol).schema.fields), targetSchema0)
    val targetSchema = evolved.fold(targetSchema0)(_ =>
      evolveSchema(targetSchema0, changes.drop(opCol).schema, Map.empty))
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-dvmerge-${java.util.UUID.randomUUID().toString.take(8)}")
    val newFiles =
      if (!hasUpserts) Seq.empty[String]
      else {
        writePartitionedBatch(
          alignToSchema(upserts, targetSchema, Map.empty),
          table, batch.toString)
        batchParquetFiles(batch)
      }
    val next =
      // merged DV + carried eq entries ride the claim (every base
      // file carries)
      try publishIfLatestWith(table, v, files ++ newFiles, "dv-merge",
        dv = merged.toMap, eq = carriedEq(table, v, files))
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (hasUpserts) deleteBatchDir(batch); throw e
      }
    evolved match {
      // evolution PINS the new declared schema; old versions keep theirs
      case Some(e) => publishSchema(table, next, e)
      case None =>
        declaredSchema(table, v).foreach(publishSchema(table, next, _))
    }
    // carried files carry their stats/blooms; only the appended batch
    // is scanned (a DV'd file's interval stays conservative — it may
    // cover deleted rows, which can only keep extra files, never lose)
    val schemaCols = schemaOf(spark, table, v).fieldNames.toSet
    val statCols = (Seq(key) ++ statsColumnsOf(table))
      .distinct.filter(schemaCols.contains)
    commitStats(spark, table, next, statCols, carryFrom = v)
    val bloomCols = bloomColumnsOf(table).filter(schemaCols.contains)
    if (bloomCols.nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, matched.length.toLong, true)
  }

  /** (file, col) -> (min, max) stats for a version, or empty if the
    * version has no stats sidecar. */
  def statsOf(table: String, version: Int): Map[(String, String), (BigDecimal, BigDecimal)] = {
    val p = java.nio.file.Paths.get(table, s"v$version.stats")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .filter(_.nonEmpty)
      .flatMap { line =>
        val Array(f, c, lo, hi) = line.split("\t", 4)
        // a malformed/legacy line must degrade to "no stats" (file
        // always read), never to a read-path exception
        scala.util.Try((f, c) -> (BigDecimal(lo), BigDecimal(hi))).toOption
      }.toMap
  }

  /** (file, col) -> (min, max) STRING stats for a version — the tagged
    * `S:`+base64 lines [[commitStats]] writes for string columns.
    * Malformed lines degrade to "no stats" (file always read), same
    * contract as the numeric map. */
  def statsOfString(table: String,
      version: Int): Map[(String, String), (String, String)] = {
    val p = java.nio.file.Paths.get(table, s"v$version.stats")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .filter(_.nonEmpty)
      .flatMap { line =>
        scala.util.Try {
          val Array(f, c, lo, hi) = line.split("\t", 4)
          require(lo.startsWith("S:") && hi.startsWith("S:"))
          val dec = java.util.Base64.getDecoder
          (f, c) -> (new String(dec.decode(lo.drop(2)), "UTF-8"),
            new String(dec.decode(hi.drop(2)), "UTF-8"))
        }.toOption
      }.toMap
  }

  /** The file-pruning decision, exposed for tests and for callers that
    * want the skipping ratio: the version's files split into (kept,
    * skipped) for the predicate `col BETWEEN lo AND hi`. */
  def pruneFiles(table: String, version: Int, column: String,
      lo: BigDecimal, hi: BigDecimal): (Seq[String], Seq[String]) = {
    val stats = statsOf(table, version)
    filesOf(table, version).partition { f =>
      stats.get((f, column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi // interval overlap
        case None => true // no stats: must read
      }
    }
  }

  /** Read `table` at `version` restricted to `col BETWEEN lo AND hi`,
    * scanning only the files whose stats interval overlaps the range.
    * The residual filter is still applied (stats prune FILES, not
    * rows), so the result is exactly `readVersion(...).filter(...)` —
    * SourcesSpec proves it. */
  def readVersionPruned(spark: SparkSession, table: String, column: String,
      lo: BigDecimal, hi: BigDecimal, version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(table) else version
    require(v > 0, s"$table has no committed versions")
    val (kept, _) = pruneFiles(table, v, column, lo, hi)
    if (kept.isEmpty) {
      // every file skipped: serve the empty relation with the right schema
      readVersion(spark, table, v)
        .filter(org.apache.spark.sql.functions.lit(false))
    } else {
      // the pruned read serves the same delete state as readVersion:
      // DV positions AND pending eq entries both filter (the scope
      // intersection handles the file subset)
      val df = applyEq(spark,
        applyDv(declaredSchema(table, v)
          .fold(spark.read)(sc => spark.read.schema(sc))
          .parquet(kept: _*), dvOf(table, v)), table, v)
      // bounds cast to the COLUMN's type on the literal side, so the
      // residual range predicate still pushes down to the parquet scan
      val dt = df.schema(column).dataType
      val loL = org.apache.spark.sql.functions.lit(lo.bigDecimal).cast(dt)
      val hiL = org.apache.spark.sql.functions.lit(hi.bigDecimal).cast(dt)
      df.filter(col(column) >= loL && col(column) <= hiL)
    }
  }

  /** Point/IN-pruned read: only the files whose stats interval / bloom
    * sidecar can hold one of `values` for `column` are opened (sidecar
    * metadata, never a scan), then the residual IN predicate applies —
    * and pushes into the parquet reader for row-group pruning. The
    * point-lookup sibling of [[readVersionPruned]]'s range form; the
    * index-posting-fetch shape. Returns (frame, files read, files in
    * the version) so callers can witness the skip. */
  def readVersionForKeys(spark: SparkSession, table: String,
      column: String, values: Seq[Any],
      version: Int = -1): (DataFrame, Int, Int) = {
    val v = if (version < 0) latestVersion(table) else version
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    if (values.isEmpty)
      // an empty key set matches nothing — never open a file for it
      return (readVersion(spark, table, v)
        .filter(org.apache.spark.sql.functions.lit(false)),
        0, files.length)
    val keep = filterKeeper(table, v, Seq(
      org.apache.spark.sql.sources.In(column, values.toArray)))
    val kept = files.filter(keep)
    val df =
      if (kept.isEmpty)
        readVersion(spark, table, v)
          .filter(org.apache.spark.sql.functions.lit(false))
      else
        // the partition-aware subset reader: hive-laid tables get
        // their partition columns reattached from the paths (a flat
        // read would null them and the residual IN would silently
        // drop every row)
        applyEq(spark,
          applyDv(readFileSubset(spark, table, v, kept),
            dvOf(table, v)), table, v)
    (df.filter(col(column).isin(values: _*)), kept.length, files.length)
  }

  /** Write with an inline data-quality audit, metrics harvested from
    * the WRITE's own scan via the `Observation` API — row count, per-key
    * null count, and an exact decimal sum ride along with the job, so
    * the audit costs ZERO extra passes over the data. At 100 TB the
    * difference between "write, then re-scan to audit" and this is the
    * whole table read twice; observed metrics are also the natural
    * reconciliation numbers to store next to a
    * [[commitVersion]] manifest (what Delta's commit stats are).
    * Returns (rows, nullKeys, totalSum) observed during the write. */
  def writeWithAudit(df: DataFrame, path: String, keyCol: String,
      sumCol: String): (Long, Long, java.math.BigDecimal) = {
    val obs = org.apache.spark.sql.Observation("write_audit")
    df.observe(obs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"),
        org.apache.spark.sql.functions.count_if(col(keyCol).isNull).as("null_keys"),
        org.apache.spark.sql.functions.sum(
          col(sumCol).cast("decimal(18,4)")).as("total"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val m = obs.get
    (m("rows").asInstanceOf[Long], m("null_keys").asInstanceOf[Long],
      m("total").asInstanceOf[java.math.BigDecimal])
  }

  /** CHECK-constraint-enforcing commit onto the versioned table (the
    * Delta `CHECK` / NOT NULL enforcement semantics): every named
    * predicate must hold on EVERY row of the batch or the commit does
    * not happen — no manifest is published, the table's latest version
    * is untouched, and the caller gets the per-constraint violation
    * counts to act on ([[q96_constraints]] AUDITS after the fact; this
    * REJECTS at the write boundary, which is where a contract is worth
    * enforcing). Violation counting rides the write's own scan via
    * `Observation` (writeWithAudit's zero-extra-pass device) — the data
    * files are written once, then either published or DELETED on
    * rejection (no manifest ever references them, so readers never saw
    * them; a crashed writer could still strand a batch dir, which is
    * invisible to every reader for the same reason).
    *
    * Returns either the published version or the violation counts. */
  def commitVersionChecked(df: DataFrame, table: String,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      overwrite: Boolean = false): Either[Map[String, Long], Int] = {
    require(checks.nonEmpty, "commitVersionChecked needs at least one check")
    requireNoForgedRowIds(table, df.schema, "commitVersionChecked")
    val spark = df.sparkSession
    val obs = org.apache.spark.sql.Observation()
    val aggs = checks.map { case (name, pred) =>
      org.apache.spark.sql.functions.count_if(!coalesce(pred, lit(false)))
        .as(name)
    }
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-${java.util.UUID.randomUUID().toString.take(12)}")
    writePartitionedBatch(df.observe(obs, aggs.head, aggs.tail: _*),
      table, batch.toString)
    val violations = checks.map { case (name, _) =>
      name -> obs.get(name).asInstanceOf[Long] }.toMap
    if (violations.valuesIterator.exists(_ > 0L)) {
      // rejected: remove the just-written batch so nothing is stranded
      // (recursive — a partitioned write nests directories)
      deleteBatchDir(batch)
      Left(violations)
    } else {
      val newFiles = batchParquetFiles(batch)
      try Right(publishNextVersion(table, newFiles, overwrite,
        batchSchema = Some(df.schema)))
      catch { case e: IllegalArgumentException =>
        deleteBatchDir(batch) // incompatible-schema rejection: no strand
        throw e
      }
    }
  }

  /** Publish `files` as a REPLACING version derived from `basedOn` —
    * the commit half of the row-level-operation BatchWrite (MERGE /
    * UPDATE rewrites): conflict-detecting because the replacement rows
    * were computed against `basedOn`, and declared schema carries
    * forward (the rewrite preserves the table schema). */
  private[sources] def publishReplacing(table: String, basedOn: Int,
      files: Seq[String]): Int = {
    val next = publishIfLatest(table, basedOn, files, "row-level rewrite")
    declaredSchema(table, basedOn).foreach(publishSchema(table, next, _))
    next
  }

  /** ALTER TABLE as a metadata-only commit: re-publish the latest
    * version's exact file set under `schema` as a new version. Zero
    * data movement; conflict-detecting (an ALTER racing a data commit
    * must not silently drop the racer's files). The stats sidecar is
    * copied verbatim — identical file set, identical stats — so file
    * skipping survives a schema change. */
  def alterSchema(table: String, schema: StructType): Int = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    // a pending equality-delete entry keys on COLUMN NAMES — an ALTER
    // that renames or drops one would silently skip the entry at read
    // time (missing column ⇒ NULL key ⇒ no match) and resurrect the
    // deleted rows. Refuse before publishing anything.
    val pendingKeys = eqOf(table, v).flatMap(_.keyCols).toSet
    val lost = pendingKeys -- schema.fieldNames.toSet
    require(lost.isEmpty,
      s"ALTER on $table would rename/drop pending equality-delete key " +
        s"column(s) ${lost.mkString(", ")} — purge_eq first")
    val next = publishIfLatestWith(table, v, filesOf(table, v), "alter",
      dv = dvOf(table, v), eq = eqOf(table, v))
    publishSchema(table, next, schema)
    copyStatsSidecar(table, v, next)
    next
  }

  private[sources] def copyStatsSidecar(table: String, from: Int,
      to: Int): Unit = {
    // bloom + ndv sidecars travel with stats — every caller has an
    // identical file set, so all stay valid verbatim. DV and eq are
    // NOT copied here: they are correctness-bearing and ride each
    // commit's atomic staged-sidecar claim instead (a post-claim copy
    // re-opens the carry-pass TOCTOU this protocol closes).
    Seq("stats", "bloom", "ndv").foreach { kind =>
      val src = java.nio.file.Paths.get(table, s"v$from.$kind")
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.copy(src,
          java.nio.file.Paths.get(table, s"v$to.$kind"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Per-table properties sidecar (`table.properties`, JSON) — catalog
    * metadata like `stats.columns` that must outlive any one session.
    * Written once at CREATE; absent file reads as empty. */
  def writeTableProperties(table: String, props: Map[String, String]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    val json = props.toSeq.sortBy(_._1).map { case (k, v) =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      "\"" + esc(k) + "\":\"" + esc(v) + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "table.properties"),
      json.getBytes("UTF-8"))
  }

  def tableProperties(table: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(table, "table.properties")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      // flat string->string JSON object (the only shape we write)
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
      val pat = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      def unesc(x: String) = x.replace("\\\"", "\"").replace("\\\\", "\\")
      pat.findAllMatchIn(s).map(m =>
        unesc(m.group(1)) -> unesc(m.group(2))).toMap
    }
  }

  /** The `stats.columns` table property parsed to column names. */
  private[sources] def statsColumnsOf(table: String): Seq[String] =
    tableProperties(table).get("stats.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** The `bloom.columns` table property parsed to column names. */
  private[sources] def bloomColumnsOf(table: String): Seq[String] =
    tableProperties(table).get("bloom.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Exact physical bytes of a version — the manifest's file list
    * sized from the filesystem (driver-side, metadata-cheap). The
    * planner-statistics source for every scan path that is not a
    * FileScan (the V1 DV wrap, the meta-column scan): Catalyst's
    * broadcast decision then fires BEFORE AQE, exactly as for a plain
    * parquet dimension. */
  private[sources] def versionBytes(table: String, version: Int): Long = {
    val v = if (version < 0) latestVersion(table) else version
    filesOf(table, v).map(f =>
      scala.util.Try(java.nio.file.Files.size(
        java.nio.file.Paths.get(f))).getOrElse(0L)).sum
  }

  /** The `partition.columns` table property — identity partition
    * columns declared at CREATE (`PARTITIONED BY (c)` through the
    * catalog). Batches land hive-laid-out (`c=v/` dirs inside the
    * immutable batch dir), values live in paths not data files, and
    * [[ManifestFileIndex]] serves a real partition spec so Catalyst's
    * `partitionFilters` drop whole directories at planning time —
    * the coarse pruning tier ABOVE stats/bloom skipping. */
  def partitionColumnsOf(table: String): Seq[String] =
    tableProperties(table).get("partition.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** The `bucket.column`/`bucket.count` table properties — the hash
    * bucket layout declared at CREATE (`PARTITIONED BY (bucket(n, c))`
    * through the catalog). Every commit routes rows to
    * `pmod(hash(c), n)` and lands them under `_b=<id>` dirs; the
    * catalog serves bucketed versions through a scan that reports
    * `KeyGroupedPartitioning`, so co-bucketed joins skip the shuffle
    * entirely (storage-partitioned join) and point predicates on the
    * bucket column prune to a single bucket's files. */
  def bucketSpecOf(table: String): Option[(String, Int)] =
    for {
      c <- tableProperties(table).get("bucket.column")
      n <- tableProperties(table).get("bucket.count")
    } yield (c.trim, n.trim.toInt)

  /** The writer-side bucket id — codegen'd column expression, no UDF:
    * Spark's `hash()` is Murmur3 seed 42, exactly what
    * [[GraftBucketFunction]] declares to the optimizer. */
  private[sources] def bucketIdColumn(c: Column, n: Int): Column =
    pmod(hash(c), lit(n))

  /** A HIDDEN partition transform (Iceberg's model): `PARTITIONED BY
    * (days(ts) | months(ts) | years(ts) | hours(ts) | truncate(n, c))`
    * through the catalog. The derived value lives ONLY in `_pt=<v>`
    * directory names — never in data files, never in the read schema —
    * and is recomputed from the source column on every write/rewrite,
    * so DML can never desynchronize it. Pruning happens in
    * [[ManifestFileIndex.listFiles]]: a pushed predicate on the RAW
    * source column converts to a window test against each file's
    * `_pt` segment (a 100 TB daily-partitioned events table drops
    * whole days driver-side before stats are even consulted). `width`
    * is the truncate width; 0 for the temporal kinds. */
  case class PartTransform(kind: String, column: String, width: Int)

  /** The declared hidden transform, from the `ptransform.*` table
    * properties ([[GraftCatalog.createTable]] writes them). */
  def partTransformOf(table: String): Option[PartTransform] = {
    val props = tableProperties(table)
    for {
      kind <- props.get("ptransform.kind")
      c <- props.get("ptransform.column")
    } yield PartTransform(kind.trim, c.trim,
      props.get("ptransform.width").map(_.trim.toInt).getOrElse(0))
  }

  /** PARTITION-SPEC EVOLUTION for temporal transforms: re-declare the
    * table's hidden transform (`days(ts)` → `hours(ts)` as an events
    * table grows, or back down as it cools). Old files keep their
    * layout — their `_pt` dir values stay day-shaped — and KEEP
    * PRUNING correctly, because the pruning window is inferred from
    * each value's shape, not from the declaration
    * ([[ManifestFileIndex]]'s `windowOf`): Iceberg's per-file spec-id
    * semantics with the spec id encoded in the value itself. New
    * commits (and any rewrite: compaction, purge, merge survivors) lay
    * out under the NEW transform, so the table converges to the new
    * spec at its natural rewrite cadence, never via a forced rewrite.
    *
    * Constraints (refused loudly): both old and new transform must be
    * temporal kinds on the SAME source column — predicates on that
    * column are what both generations' windows answer; a column or
    * family change would make old `_pt` values semantically dangling.
    * Tables without a transform (identity/bucket/flat) cannot acquire
    * one here: their existing files carry no `_pt` segment at all. */
  def setPartTransform(table: String, t: PartTransform): Unit = {
    val temporal = Set("years", "months", "days", "hours")
    require(temporal.contains(t.kind),
      s"SET PARTITIONING: '${t.kind}' is not a temporal transform — " +
        "only years/months/days/hours evolve in place")
    val cur = partTransformOf(table).getOrElse(
      throw new IllegalArgumentException(
        s"$table has no hidden partition transform to evolve — " +
          "existing files carry no _pt layout; CREATE a transform table " +
          "or rewrite into one"))
    require(temporal.contains(cur.kind),
      s"SET PARTITIONING: current transform '${cur.kind}' is not " +
        "temporal and cannot evolve in place")
    require(cur.column == t.column,
      s"SET PARTITIONING must keep the source column: table partitions " +
        s"on ${cur.column}(…), requested ${t.column}(…) — old _pt values " +
        "would answer predicates on the wrong column")
    writeTableProperties(table, tableProperties(table) ++ Map(
      "ptransform.kind" -> t.kind,
      "ptransform.column" -> t.column,
      "ptransform.width" -> t.width.toString))
  }

  /** The writer-side derived partition value — codegen'd expressions.
    * Temporal kinds format in the session time zone for TIMESTAMP (the
    * engine standardizes on UTC), wall-clock for TIMESTAMP_NTZ, and
    * calendar-day for DATE; dir values sort lexically = chronologically.
    * Integral truncate is floor-to-multiple via `pmod` (negative values
    * truncate toward -inf, Iceberg's contract); string truncate is the
    * first `width` chars. */
  private[sources] def transformColumn(t: PartTransform, c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = t.kind match {
    case "years" => date_format(c, "yyyy")
    case "months" => date_format(c, "yyyy-MM")
    case "days" => date_format(c, "yyyy-MM-dd")
    case "hours" => date_format(c, "yyyy-MM-dd-HH")
    case "truncate" => dt match {
      case org.apache.spark.sql.types.StringType =>
        substring(c, 1, t.width)
      case _ => (c - pmod(c, lit(t.width))).cast(dt)
    }
    case other => throw new IllegalStateException(
      s"unknown partition transform kind $other")
  }

  /** Write `df` into `batchPath` honoring the table's declared identity
    * partitioning — the ONE physical-batch writer every commit and
    * rewrite path routes through, so a partitioned table can never
    * accumulate mixed flat/hive batches (which would make partition
    * inference throw on read). */
  private def writePartitionedBatch(df: DataFrame, table: String,
      batchPath: String): Unit = {
    // job label only (guide §1.5) — identifies batch-write jobs in the
    // UI/profiler; cleared by the caller's next label or query end
    df.sparkSession.sparkContext.setJobDescription(s"batchwrite $table")
    try writePartitionedBatch0(df, table, batchPath)
    finally df.sparkSession.sparkContext.setJobDescription(null)
  }

  private def writePartitionedBatch0(df: DataFrame, table: String,
      batchPath: String): Unit = bucketSpecOf(table) match {
    case Some((c, n)) =>
      require(df.schema.fieldNames.contains(c),
        s"bucketed table $table: batch is missing bucket column $c")
      // hash-bucket layout: the id lives in `_b=<id>` DIR NAMES (parsed
      // back by the SPJ scan), never in data files; repartition on it
      // first so one commit writes ~one file per bucket instead of
      // tasks x buckets small files
      df.withColumn("_b", bucketIdColumn(col(c), n))
        .repartition(n, col("_b"))
        .write.mode(SaveMode.ErrorIfExists).partitionBy("_b")
        .parquet(batchPath)
      recordBatchCols(batchPath, df.schema) // _b lives in dir names only
    case None => partTransformOf(table) match {
      case Some(t) =>
        require(df.schema.fieldNames.contains(t.column),
          s"transform-partitioned table $table: batch is missing " +
            s"source column ${t.column}")
        // hidden transform layout: the derived value lives in `_pt=<v>`
        // DIR NAMES only (recomputed from the source column on every
        // write, so rewrites can never desynchronize it) — data files
        // keep the full declared schema including the source column.
        // Pre-shuffle on the derived value (the bucket branch's move):
        // without it every task writes every _pt dir it sees — an
        // hours(ts) commit from 32 tasks over a month fragments into
        // tasks × dirs small files; with it one exchange yields ~one
        // file per partition dir per commit (Delta's optimized write)
        df.withColumn("_pt",
            transformColumn(t, col(t.column), df.schema(t.column).dataType))
          .repartition(col("_pt"))
          .write.mode(SaveMode.ErrorIfExists).partitionBy("_pt")
          .parquet(batchPath)
        recordBatchCols(batchPath, df.schema) // _pt in dir names only
      case None =>
        val parts = partitionColumnsOf(table)
          .filter(df.schema.fieldNames.contains(_))
        val w = df.write.mode(SaveMode.ErrorIfExists)
        (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
          .parquet(batchPath)
        // hive layout moves the partition columns out of data files
        recordBatchCols(batchPath, StructType(
          df.schema.filterNot(f => parts.contains(f.name))))
    }
  }

  /** List the parquet files of a just-written batch dir (recursive —
    * partitioned batches nest `c=v/` directories). */
  private def batchParquetFiles(batch: java.nio.file.Path): Seq[String] = {
    if (!java.nio.file.Files.exists(batch)) return Seq.empty
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(batch).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(p))
      .map(_.toString).toSeq.sorted
  }

  /** Read an explicit FILE SUBSET of a version under the declared
    * schema, with partition-column values reattached from the paths —
    * the reader every rewrite path (delete survivors, merge base, DV
    * candidates, purge) must use on a partitioned table, because a
    * plain `spark.read.parquet(files)` would surface the partition
    * columns as NULL (they live in directory names, not data files)
    * and a rewrite would PERSIST those nulls. Non-partitioned tables
    * take the direct multi-file read unchanged. */
  private[sources] def readFileSubset(spark: SparkSession, table: String,
      version: Int, files: Seq[String]): DataFrame =
    if (partitionColumnsOf(table).isEmpty)
      declaredSchema(table, version)
        .fold(spark.read)(s => spark.read.schema(s)).parquet(files: _*)
    else
      // partition-aware: a restricted manifest index serves the subset
      // as ONE relation with partition columns reattached from the
      // hive paths (a flat multi-file read would surface them as NULL
      // and a rewrite would persist the nulls)
      ManifestFileIndex.frameForFiles(spark, table, version,
        Some(files.toSet))

  /** The subset read every copy-on-write REWRITE must use: lineage
    * tables ([[RowIds.enabled]]) read survivors WITH their row ids so
    * the rewrite materializes them into the new files; everything
    * else takes the plain declared-schema subset read. */
  private[sources] def readFileSubsetForRewrite(spark: SparkSession,
      table: String, version: Int, files: Seq[String]): DataFrame =
    if (RowIds.enabled(table))
      RowIds.readFileSubsetWithRowIds(spark, table, version, files)
    else readFileSubset(spark, table, version, files)

  /** Schema carry for a rewrite commit: the declared schema where one
    * exists; on a lineage table WITHOUT one, pin the pre-rewrite
    * effective schema (minus the internal `_row_id` column) — the
    * materialized column must never leak into footer-inferred reads. */
  private def rewriteSchemaCarry(spark: SparkSession, table: String,
      v: Int, next: Int): Unit =
    declaredSchema(table, v) match {
      case Some(s) => publishSchema(table, next, s)
      case None if RowIds.enabled(table) =>
        publishSchema(table, next, StructType(
          schemaOf(spark, table, v).fields
            .filterNot(_.name == RowIds.COL)))
      case None => ()
    }

  /** Create an empty table: version 1 is an empty file set whose
    * declared schema is the DDL schema — what `CREATE TABLE g.t (...)`
    * through [[GraftCatalog]] publishes. Readers of v1 see an empty
    * relation under exactly that schema; the first data commit evolves
    * from it like any append. */
  def createEmptyTable(table: String, schema: StructType): Int = {
    require(latestVersion(table) == 0,
      s"$table already has committed versions")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    publishManifest(table, 1, Nil)
    publishSchema(table, 1, schema)
    1
  }

  /** File-granular copy-on-write DELETE: files that `fileMayMatch`
    * proves cannot contain a matching row are carried untouched into
    * the new version (no read, no write); the rest are rewritten with
    * the negated predicate. SQL semantics: rows where the predicate is
    * NULL survive. Conflict-detecting publish (a racing commit fails
    * the delete loudly); stats and declared schema carry forward.
    * Returns (new version, files rewritten, files carried) — with a
    * provable no-op (zero affected files) the CURRENT version is
    * returned unchanged, no empty commit. */
  def deleteWhere(spark: SparkSession, table: String,
      cond: org.apache.spark.sql.Column,
      fileMayMatch: String => Boolean = _ => true): (Int, Int, Int) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val (affected, carried) = files.partition(fileMayMatch)
    if (affected.isEmpty) return (v, 0, carried.length)
    // rewrite under the DECLARED schema: mixed-generation affected
    // files (an ADD COLUMN between appends) must not have the survivor
    // rewrite silently narrowed to whichever file's footer schema
    // inference happened to pick — older files null-fill, newer files
    // keep their evolved columns
    // DV'd and eq-deleted rows of the affected files are already
    // deleted — the rewrite must not resurrect them (carried files keep
    // their DV/eq entries); partition-aware subset read, or a
    // partitioned rewrite would persist NULL partition columns
    val survivors = applyEq(spark,
        applyDv(readFileSubsetForRewrite(spark, table, v, affected),
          dvOf(table, v)),
        table, v)
      .filter(!coalesce(cond, lit(false)))
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-delete-${java.util.UUID.randomUUID().toString.take(8)}")
    writePartitionedBatch(survivors, table, batch.toString)
    val newFiles = batchParquetFiles(batch)
    val next =
      // rewritten files' DVs/eq absorb; carried files' ride the claim
      try publishIfLatestWith(table, v, carried ++ newFiles, "delete",
        dv = carriedDv(table, v, carried),
        eq = carriedEq(table, v, carried))
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    if ((carried ++ newFiles).isEmpty)
      // delete-all on a sidecar-less version: pin the pre-delete
      // effective schema or the empty version has NO schema source at
      // all and every later read/insert dies resolving it
      publishSchema(table, next, StructType(
        schemaOf(spark, table, v).fields
          .filterNot(_.name == RowIds.COL)))
    else
      rewriteSchemaCarry(spark, table, v, next)
    val stattedCols = statsOf(table, v).keys.map(_._2).toSeq.distinct ++
      statsOfString(table, v).keys.map(_._2).toSeq.distinct
    if (stattedCols.nonEmpty)
      commitStats(spark, table, next, stattedCols.distinct, carryFrom = v)
    val bloomCols = bloomsOf(table, v).keys.map(_._2).toSeq.distinct
    if (bloomCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, affected.length, carried.length)
  }

  /** Copy-on-write UPDATE: rows matching `cond` get each `sets` column
    * replaced by its expression; everything else — including the
    * matched rows' OTHER columns and, on a lineage table, every row's
    * `_row_id` ([[RowIds]]) — carries byte-for-byte. Identity
    * preservation is the operator's reason to exist next to
    * delete+reinsert: an id-preserving update is what lets the lineage
    * change feed ([[RowIds.readChangesLineage]]) pair the row's before
    * and after images as `update_preimage`/`update_postimage` instead
    * of an unrelated delete+insert. SQL semantics: NULL-predicate rows
    * are untouched. `fileMayMatch` prunes the rewrite set exactly as
    * in [[deleteWhere]] — at 100 TB a keyed update with range/Z-order
    * clustering rewrites a few files, never the table. Returns
    * (new version, rows updated, files rewritten, files carried). */
  def updateWhere(spark: SparkSession, table: String,
      cond: org.apache.spark.sql.Column, sets: Map[String, Column],
      fileMayMatch: String => Boolean = _ => true): (Int, Long, Int, Int) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    require(sets.nonEmpty, "updateWhere needs at least one assignment")
    require(!sets.contains(RowIds.COL),
      s"${RowIds.COL} is the lineage identity — it cannot be assigned")
    val files = filesOf(table, v)
    val (affected, carried) = files.partition(fileMayMatch)
    if (affected.isEmpty) return (v, 0L, 0, carried.length)
    val base = applyEq(spark,
      applyDv(readFileSubsetForRewrite(spark, table, v, affected),
        dvOf(table, v)),
      table, v)
    sets.keys.foreach(c => require(base.columns.contains(c),
      s"updateWhere: $table has no column $c"))
    val hit = coalesce(cond, lit(false))
    val obs = new org.apache.spark.sql.Observation()
    val rewritten0 = base.observe(obs,
      sum(when(hit, 1L).otherwise(0L)).as("updated"))
    // ONE simultaneous projection — SQL UPDATE evaluates the predicate
    // and every RHS against the PRE-update row. A sequential
    // withColumn fold would let later assignments (and a predicate
    // referencing a set column) observe already-updated values, making
    // the result depend on Map iteration order (sets=Map(a->b, b->a)
    // must swap, not copy).
    val rewritten = rewritten0.select(base.columns.map { c =>
      sets.get(c) match {
        case Some(e) =>
          when(hit, e.cast(base.schema(c).dataType)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toSeq: _*)
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-update-${java.util.UUID.randomUUID().toString.take(8)}")
    writePartitionedBatch(rewritten, table, batch.toString)
    val newFiles = batchParquetFiles(batch)
    val next =
      // rewritten files' DVs/eq absorb; carried files' ride the claim
      try publishIfLatestWith(table, v, carried ++ newFiles, "update",
        dv = carriedDv(table, v, carried),
        eq = carriedEq(table, v, carried))
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    rewriteSchemaCarry(spark, table, v, next)
    val stattedCols = statsOf(table, v).keys.map(_._2).toSeq.distinct ++
      statsOfString(table, v).keys.map(_._2).toSeq.distinct
    if (stattedCols.nonEmpty)
      commitStats(spark, table, next, stattedCols.distinct, carryFrom = v)
    val bloomCols = bloomsOf(table, v).keys.map(_._2).toSeq.distinct
    if (bloomCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    val updated = Option(obs.get.getOrElse("updated", null)) match {
      case Some(n: Number) => n.longValue()
      case _ => 0L
    }
    (next, updated, affected.length, carried.length)
  }

  /** Change data feed between two versions — what a downstream consumer
    * replays instead of re-reading the table (Delta's CDF, derived here
    * from the manifest structure alone): because data files are
    * immutable and a version IS its file set, the delta between
    * `fromVersion` and `toVersion` is exactly the rows of the files
    * that LEFT the set (emitted as `delete`) plus the rows of the files
    * that JOINED it (emitted as `insert`). An append commit yields pure
    * inserts; a [[mergeVersion]] yields the rewritten files' old rows
    * as deletes and their new rows as inserts (an unchanged row inside
    * a rewritten file appears as delete+insert of equal rows — a
    * keyed consumer applies it as a no-op upsert, the standard CDF
    * contract); carried files contribute NOTHING, which is the point —
    * feed size is O(changed files), not O(table).
    */
  def readChanges(spark: SparkSession, table: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    val before = filesOf(table, fromVersion).toSet
    val after = filesOf(table, toVersion).toSet
    val gone = (before -- after).toSeq.sorted
    val added = (after -- before).toSeq.sorted
    val dvFrom = dvOf(table, fromVersion)
    val dvTo = dvOf(table, toVersion)
    // DV view of the feed: a departing file's rows already DV-deleted at
    // `from` were emitted in an earlier delta — don't re-delete them; an
    // arriving file's rows DV-deleted at `to` never became visible — don't
    // insert them; and a CARRIED file whose DV grew contributes exactly
    // the newly-marked positions as deletes (the merge-on-read commit's
    // whole delta — still O(changed rows), never O(table))
    // each side reads under ITS version's full delete state (DV + eq):
    // a departing file's eq-dead rows were emitted as deletes when
    // their entry arrived — re-emitting them on departure would double-
    // delete; an arriving file can likewise already sit inside a
    // later-range entry's scope
    def read(fs: Seq[String], dv: Map[String, java.util.BitSet],
        atVersion: Int, change: String): Option[DataFrame] =
      if (fs.isEmpty) None
      else Some(
        eqFilterEntries(spark, applyDv(spark.read.parquet(fs: _*), dv),
          table, atVersion, eqOf(table, atVersion))
        .withColumn("_change_type", org.apache.spark.sql.functions.lit(change)))
    val dvDelta: Map[String, java.util.BitSet] =
      (before & after).toSeq.flatMap { f =>
        val grown = dvTo.getOrElse(f, new java.util.BitSet())
          .clone().asInstanceOf[java.util.BitSet]
        dvFrom.get(f).foreach(grown.andNot)
        if (grown.isEmpty) None else Some(f -> grown)
      }.toMap
    val dvDeletes: Option[DataFrame] =
      if (dvDelta.isEmpty) None
      else Some(dvFilter(spark.read.parquet(dvDelta.keys.toSeq.sorted: _*),
        dvDelta, keepDeleted = true)
        .withColumn("_change_type", org.apache.spark.sql.functions.lit("delete")))
    // equality-delete view of the feed: entries ADDED in (from, to]
    // retire the still-live rows of their in-scope carried files —
    // emitted as deletes. "Still-live" means live under the FROM-time
    // delete state (dvTo on carried files equals dvFrom + the dvDelta
    // already emitted above; OLD eq entries' rows were dead at `from`),
    // so: read the new entries' scoped files, apply dvTo and the old
    // entries, keep exactly the rows the new key sets hit. This is the
    // deferred-position trade made explicit — the CDF pays the scan the
    // eq COMMIT skipped, still bounded by in-scope files, never O(table).
    val eqFromPaths = eqOf(table, fromVersion).map(_.dataPath).toSet
    val eqToAll = eqOf(table, toVersion)
    val (eqOld, eqNew) = eqToAll.partition(e => eqFromPaths.contains(e.dataPath))
    val eqDeletes: Option[DataFrame] =
      if (eqNew.isEmpty) None
      else {
        val afterNorm = after.map(normalizePath)
        val scoped = eqNew.map(e => eqScope(table, e))
          .reduce(_ | _) & afterNorm & before.map(normalizePath)
        if (scoped.isEmpty) None
        else {
          val scopedFiles = after.toSeq.filter(f =>
            scoped.contains(normalizePath(f))).sorted
          val live = eqFilterEntries(spark,
            applyDv(spark.read.parquet(scopedFiles: _*), dvTo),
            table, toVersion, eqOld)
          val retired = eqRetired(spark, live, table, afterNorm, eqNew)
          Some(retired.withColumn("_change_type",
            org.apache.spark.sql.functions.lit("delete")))
        }
      }
    val parts = Seq(read(gone, dvFrom, fromVersion, "delete"), dvDeletes,
      eqDeletes, read(added, dvTo, toVersion, "insert")).flatten
    if (parts.nonEmpty) parts.reduce(_ unionByName _)
    else
      readVersion(spark, table, toVersion)
        .withColumn("_change_type",
          org.apache.spark.sql.functions.lit("insert"))
        .filter(org.apache.spark.sql.functions.lit(false))
  }

  /** The table's commit log as a DataFrame — DESCRIBE HISTORY for the
    * minimal table format: one row per version with its file count,
    * total bytes, whether a stats sidecar exists, and the manifest's
    * publish time. Everything comes from manifests + the filesystem
    * (KB-scale metadata), no data files are opened — the audit surface
    * a table owner queries before time-traveling or vacuuming. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versionsOf(table).map { v =>
      val fs = filesOf(table, v)
      val bytes = fs.map(f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
      val mtime = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(table, s"v$v.manifest")).toMillis
      val hasStats = java.nio.file.Files.exists(
        java.nio.file.Paths.get(table, s"v$v.stats"))
      (v, fs.length.toLong, bytes, hasStats, new java.sql.Timestamp(mtime))
    }.toDF("version", "n_files", "total_bytes", "has_stats", "committed_at")
      .orderBy("version")
  }

  /** VACUUM: physically delete data files referenced ONLY by expired
    * versions. Keeps the newest `keepLast` manifests (and every file
    * any of them references — a file shared with an old version
    * survives); older manifests are removed, bounding time travel to
    * the kept horizon. This is the storage-reclamation half of the
    * table-format lifecycle (commit → compact → vacuum); the safety
    * property — never delete a file a kept manifest references — is
    * what distinguishes it from naive directory cleanup, and the
    * reason readers pinned within the horizon are never broken.
    * Returns (manifests removed, data files deleted). */
  def vacuumVersions(table: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the latest version")
    val versions = versionsOf(table)
    // lineage: persist every KEPT version's id assignment BEFORE any
    // manifest leaves — derivation walks the manifest chain, so a kept
    // (or tag-pinned) version without its sidecar must never outlive
    // its predecessors. A derivation FAILURE aborts the vacuum: a
    // swallowed error here would let the sweep delete the only
    // manifests the ids can still be derived from.
    // a TAGGED version is pinned: its manifest, sidecars, and files
    // all survive the sweep regardless of age (drop_tag releases it).
    // A version a live shallow CLONE was cut from is pinned the same
    // way — the clone's manifests list THIS table's files, so sweeping
    // them would corrupt the clone ([[cloneTable]] registers the pin,
    // [[detachClone]] releases it).
    val tagged = Refs.tagsOf(table).values.toSet ++ clonePins(table)
    if (RowIds.enabled(table))
      (versions.takeRight(keepLast) ++ versions.filter(tagged.contains))
        .distinct.sorted.foreach(v => RowIds.ridOf(table, v))
    val (expired0, kept0) = versions.splitAt(math.max(0, versions.length - keepLast))
    val (keptTagged, expired) = expired0.partition(tagged.contains)
    val kept = keptTagged ++ kept0
    // a live BRANCH's manifests reference parent files (the fork carries
    // them verbatim) — every file any branch version lists is pinned, or
    // a parent vacuum could cut the ground from under an open WAP branch
    val branchFiles = Refs.branchesOf(table).keysIterator.flatMap { b =>
      val bd = Refs.branchDir(table, b)
      versionsOf(bd).flatMap(bv => filesOf(bd, bv))
    }.toSet
    val keepFiles = kept.flatMap(v => filesOf(table, v)).toSet ++ branchFiles
    val deadFiles = expired.flatMap(v => filesOf(table, v)).toSet -- keepFiles
    // ownership guard: a table only ever deletes files under its OWN
    // root. A shallow clone's manifests list the source's files — the
    // clone expiring its early versions must drop the references, not
    // the source's data (the source's own vacuum, gated by the clone
    // pin above, is the single authority over those bytes).
    val root = java.nio.file.Paths.get(table).toAbsolutePath.normalize
      .toString + java.io.File.separator
    val swept = deadFiles.filter(f =>
      java.nio.file.Paths.get(f).toAbsolutePath
        .normalize.toString.startsWith(root))
    swept.foreach(f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    // a kept version's eq entries pin their scope MANIFESTS (the file
    // list is how the scope resolves at read time) and their key
    // parquets — both survive the sweep; the scope's DATA files follow
    // the normal liveness rule above (a vanished scope file simply
    // drops out of the intersection)
    val keptEq = kept.flatMap(v => eqOf(table, v))
    val pinnedScopes = keptEq.map(_.basedOn).toSet
    val pinnedEqData = keptEq.map(e => normalizePath(e.dataPath)).toSet
    expired.foreach { v =>
      // an expired version whose files a live BRANCH still pins keeps
      // its manifest as the sweep ledger: deleting it now would orphan
      // those files forever once the branch expires or drops (no
      // manifest would reference them, so no later vacuum could judge
      // them dead)
      val branchPinned =
        filesOf(table, v).exists(branchFiles.contains)
      if (!pinnedScopes.contains(v) && !branchPinned)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(table, s"v$v.manifest"))
      // sidecars travel with their manifest
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.stats"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.bloom"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.schema"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.dv"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.ndv"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.rid"))
      // an expired version's eq sidecar goes; its key parquets go too
      // unless a kept version still lists them
      eqOf(table, v).map(e => normalizePath(e.dataPath)).distinct
        .filterNot(pinnedEqData.contains)
        .foreach(d => deleteTree(java.nio.file.Paths.get(d)))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(table, s"v$v.eq"))
      // un-promoted staged sidecars this version pointed at go with it
      sidecarPointersOf(table, v).values.foreach(n =>
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(table, n)))
    }
    // stranded staged sidecars: a crashed or raced commit leaves
    // `.staged-*` files no kept manifest points to. Sweep the provably
    // dead ones — unreferenced AND past the in-flight grace window (a
    // commit stages milliseconds before its claim; 15 min is paranoid)
    val pointed = kept.flatMap(v =>
      sidecarPointersOf(table, v).values).toSet
    val cutoff = System.currentTimeMillis() - 15L * 60 * 1000
    val dir = manifestDir(table)
    if (dir.exists()) dir.listFiles().toSeq
      .filter(f => f.getName.startsWith(".staged-") &&
        !pointed.contains(f.getName) && f.lastModified() < cutoff)
      .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
    // count only what the ownership guard let this table DELETE —
    // foreign (clone-shared) references merely expired
    (expired.length, swept.size)
  }

  // ---- shallow clone: zero-copy table fork ---------------------------

  /** Live clone registrations of `table`: (id, clone path, cut
    * version). The operator's audit surface — a clone deleted without
    * [[detachClone]] leaves its pin here; removing `_clones/<id>`
    * releases it manually. */
  def listClones(table: String): Seq[(String, String, Int)] = {
    val dir = java.nio.file.Paths.get(table, "_clones").toFile
    if (!dir.exists()) Seq.empty
    else dir.listFiles().toSeq.flatMap { f =>
      scala.util.Try {
        val Array(dst, v) = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .trim.split("\t", 2)
        (f.getName, dst, v.toInt)
      }.toOption
    }
  }

  /** Versions of `table` some live shallow clone was cut from — each
    * pins its manifest, files, and sidecars against [[vacuumVersions]]
    * exactly like a tag. */
  def clonePins(table: String): Set[Int] =
    listClones(table).map(_._3).toSet

  /** SHALLOW CLONE: fork `srcTable`'s latest version into a brand-new
    * independent table that shares the source's DATA FILES byte-for-
    * byte — the commit copies only metadata (manifest, schema, DV,
    * stats/bloom sidecars, table properties; pending equality-delete
    * KEY parquets are copied into the clone's own tree so the source
    * never owes the clone anything but data bytes). Writes to either
    * table diverge freely afterwards: each side's commits reference
    * its own new batches, and the vacuum ownership guard means the
    * clone can never delete source bytes.
    *
    * Source-side safety: the cut version is registered under
    * `<src>/_clones/` and [[vacuumVersions]] pins it like a tag, so
    * the source's sweeps cannot strand the clone; [[detachClone]]
    * releases the pin once the clone has localized its data. Lineage
    * (row-id) sources are refused — their identity derivation walks
    * the source's own manifest chain, which a fork cannot carry.
    * Returns the pinned source version. */
  def cloneTable(spark: SparkSession, srcTable: String,
      dstTable: String): Int = {
    val v = latestVersion(srcTable)
    require(v > 0, s"$srcTable has no committed versions")
    require(latestVersion(dstTable) == 0 &&
        !java.nio.file.Paths.get(dstTable, "table.properties").toFile.exists(),
      s"cloneTable: $dstTable already exists")
    require(!RowIds.enabled(srcTable),
      "cloneTable: row-lineage sources cannot be shallow-cloned — the " +
        "id derivation walks the source's manifest chain; " +
        "materialize a copy instead")
    // the pin lands FIRST, atomically (torn pins must be
    // unrepresentable — a half-written pin read as "no pin" would let
    // a racing source vacuum sweep the shared bytes), and only then is
    // the cut manifest re-verified: if a sweep won the race the clone
    // aborts loudly instead of publishing dangling references
    val cloneId = java.util.UUID.randomUUID().toString.take(12)
    val pinDir = java.nio.file.Paths.get(srcTable, "_clones")
    java.nio.file.Files.createDirectories(pinDir)
    val tmp = java.nio.file.Files.createTempFile(pinDir, ".pin", ".tmp")
    java.nio.file.Files.write(tmp, s"$dstTable\t$v".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, pinDir.resolve(cloneId),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try {
      require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(srcTable, s"v$v.manifest")),
        s"cloneTable: version $v of $srcTable was vacuumed before the " +
          "clone pin landed — retry against the new latest")
      val files = filesOf(srcTable, v)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dstTable))
      // delete state materializes EXACTLY: the cut version's DV marks
      // OR the eq entries' scope-resolved retired positions. Carrying
      // the entries themselves would rebase their scope onto the
      // clone's v1 (ALL cut files) and wrongly delete rows the
      // source's narrower per-entry scopes excluded — e.g. a key's
      // own post-entry upsert batch.
      val dv0 = dvOf(srcTable, v)
      val eqPos = eqRetiredPositions(spark, srcTable, files,
        eqOf(srcTable, v))
      val dv = (dv0.keySet ++ eqPos.keySet).map { f =>
        val b = new java.util.BitSet()
        dv0.get(f).foreach(b.or)
        eqPos.get(f).foreach(b.or)
        f -> b
      }.toMap
      val staged =
        if (dv.nonEmpty) Map("dv" -> stageSidecar(dstTable, "dv",
          dvText(dv).getBytes("UTF-8")))
        else Map.empty[String, String]
      publishManifest(dstTable, 1, files, staged)
      promoteStaged(dstTable, 1, staged)
      declaredSchema(srcTable, v).foreach(publishSchema(dstTable, 1, _))
      // path-keyed skipping sidecars stay valid verbatim (shared paths)
      Seq("stats", "bloom", "ndv").foreach { ext =>
        val s = java.nio.file.Paths.get(srcTable, s"v$v.$ext")
        if (java.nio.file.Files.exists(s))
          java.nio.file.Files.copy(s,
            java.nio.file.Paths.get(dstTable, s"v1.$ext"))
      }
      writeTableProperties(dstTable, tableProperties(srcTable) ++
        Map("clone.of" -> srcTable, "clone.id" -> cloneId))
      v
    } catch { case e: Throwable =>
      // a failed clone must not leak its pin (it would block the
      // source's vacuum forever) or a half-built clone tree
      java.nio.file.Files.deleteIfExists(pinDir.resolve(cloneId))
      deleteTree(java.nio.file.Paths.get(dstTable))
      throw e
    }
  }

  /** Localize and release a shallow clone: compact the clone (every
    * live row rewrites into clone-owned files), expire the foreign-
    * referencing history, then release the source-side pin. After
    * this the two tables share nothing and the source may vacuum
    * freely. */
  def detachClone(spark: SparkSession, dstTable: String,
      targetRecordsPerFile: Long = 1 << 20): Unit = {
    val props = tableProperties(dstTable)
    val src = props.getOrElse("clone.of",
      throw new IllegalArgumentException(
        s"$dstTable is not a clone (no clone.of property)"))
    val id = props.getOrElse("clone.id",
      throw new IllegalArgumentException(
        s"$dstTable carries clone.of=$src but no clone.id — release " +
          s"the pin manually (${src}/_clones/) and drop clone.of"))
    compactVersion(spark, dstTable, targetRecordsPerFile)
    vacuumVersions(dstTable, keepLast = 1)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(src, "_clones", id))
    writeTableProperties(dstTable, props - "clone.of" - "clone.id")
  }

  /** Compaction as a COMMIT: rewrite the latest version's (typically
    * many small, per-micro-batch) files into ~`targetRecordsPerFile`
    * files and publish the result as a new version. Readers pinned to
    * older versions are untouched — their files are never deleted or
    * rewritten — which is exactly what directory-overwrite compaction
    * ([[compact]]) cannot offer; this is OPTIMIZE for the minimal
    * table format. Returns (new version, files before, files after). */
  def compactVersion(spark: SparkSession, table: String,
      targetRecordsPerFile: Long): (Int, Int, Int) = {
    val v = latestVersion(table)
    val before = filesOf(table, v).length
    val df =
      if (RowIds.enabled(table)) RowIds.readVersionWithRowIds(spark, table, v)
      else readVersion(spark, table, v)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
    // conflict-DETECTING publish: the compacted content was read at v —
    // an overwrite retry after a racing append would silently discard
    // the racer's rows, so a lost race fails loudly instead. On loss
    // the just-written (unreferenced) compacted batch is deleted so a
    // retried compaction cannot strand disk.
    //
    // A table with a DECLARED layout (`layout.range`/`layout.zorder`
    // properties) is re-CLUSTERED here, not just coalesced — compaction
    // is the global pass that restores tight per-file intervals after
    // many per-batch-clustered appends (Delta's OPTIMIZE ZORDER BY).
    val toRelease = scala.collection.mutable.Buffer.empty[DataFrame]
    val compacted = {
      val props = tableProperties(table)
      if (props.contains("layout.range") || props.contains("layout.zorder")) {
        val withCount = props + ("layout.files" ->
          props.getOrElse("layout.files", nFiles.toString))
        clusterByLayoutProps(df, withCount, toRelease)
      } else if (bucketSpecOf(table).isDefined)
        // the batch writer re-buckets (repartition on the bucket id)
        // anyway — a coalescing pre-shuffle here would just be a second
        // exchange of the whole table
        df
      else df.repartition(nFiles)
    }
    val newFiles =
      try writeBatch(compacted, table)
      finally toRelease.foreach(_.unpersist(false))
    val next =
      try publishIfLatest(table, v, newFiles, "compaction")
      catch {
        case e: java.util.ConcurrentModificationException =>
          newFiles.headOption.foreach(f => deleteBatchDir(
            java.nio.file.Paths.get(f).getParent))
          throw e
      }
    rewriteSchemaCarry(spark, table, v, next)
    // no DV carry: compaction reads through readVersion (DVs applied)
    // and rewrites every file — the new version is clean by definition
    //
    // RE-HARVEST skipping sidecars: every file is new, so "carry" has
    // nothing to carry — without this a whole-table OPTIMIZE would
    // silently drop stats/bloom file skipping until the next ANALYZE
    // (the scoped form already re-stats; this one must too)
    val stattedCols = (statsOf(table, v).keys.map(_._2).toSeq ++
      statsOfString(table, v).keys.map(_._2).toSeq ++
      statsColumnsOf(table)).distinct
    if (stattedCols.nonEmpty && newFiles.nonEmpty)
      commitStats(spark, table, next, stattedCols, carryFrom = v)
    val bloomCols = (bloomsOf(table, v).keys.map(_._2).toSeq ++
      bloomColumnsOf(table)).distinct
    if (bloomCols.nonEmpty && newFiles.nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, before, filesOf(table, next).length)
  }

  /** SCOPED compaction — `OPTIMIZE ... WHERE` for the manifest format:
    * rewrite only the files `fileMayMatch` selects (typically one
    * partition's directory, or "files under N bytes") into
    * ~`targetRecordsPerFile` files; everything else carries forward
    * byte-identical with its stats/bloom/DV/eq sidecars. At 100 TB
    * whole-table [[compactVersion]] is a scheduled luxury; the
    * operational loop compacts the ONE hot partition the last hour of
    * micro-batches fragmented — cost bounded by scope bytes, never
    * table bytes. Scoped files absorb their DV marks and any pending
    * eq deletes (the rewrite reads through both); carried files keep
    * theirs. Returns (version, files before in scope, files after). */
  def compactVersionWhere(spark: SparkSession, table: String,
      targetRecordsPerFile: Long,
      fileMayMatch: String => Boolean): (Int, Int, Int) = {
    val v = latestVersion(table)
    require(v > 0, s"$table has no committed versions")
    val files = filesOf(table, v)
    val (affected, carried) = files.partition(fileMayMatch)
    if (affected.isEmpty) return (v, 0, 0)
    val dv = dvOf(table, v)
    val scoped = applyEq(spark,
      applyDv(readFileSubsetForRewrite(spark, table, v, affected), dv),
      table, v)
    val rows = scoped.count()
    val nFiles = math.max(1,
      math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
    // same layout discipline as the full pass: declared clusterings
    // re-cluster the scope; bucketed tables re-bucket in the batch
    // writer; plain tables coalesce
    val toRelease = scala.collection.mutable.Buffer.empty[DataFrame]
    val compacted = {
      val props = tableProperties(table)
      if (props.contains("layout.range") || props.contains("layout.zorder")) {
        val withCount = props + ("layout.files" ->
          props.getOrElse("layout.files", nFiles.toString))
        clusterByLayoutProps(scoped, withCount, toRelease)
      } else if (bucketSpecOf(table).isDefined) scoped
      else if (partitionColumnsOf(table).nonEmpty)
        // one exchange keyed by the partition columns so each hive dir
        // lands as ~1 file per target-size unit, not one per input task
        scoped.repartition(nFiles,
          partitionColumnsOf(table).map(col): _*)
      else if (partTransformOf(table).isDefined) {
        val t = partTransformOf(table).get
        scoped.repartition(nFiles,
          transformColumn(t, col(t.column), scoped.schema(t.column).dataType))
      } else scoped.repartition(nFiles)
    }
    val batch = java.nio.file.Paths.get(table, "data",
      s"batch-opt-${java.util.UUID.randomUUID().toString.take(8)}")
    val newFiles =
      try {
        writePartitionedBatch(compacted, table, batch.toString)
        batchParquetFiles(batch)
      } finally toRelease.foreach(_.unpersist(false))
    val next =
      // scoped files' DV marks are applied and absorbed; carried files
      // keep theirs (and their pending eq entries) — staged at claim
      try publishIfLatestWith(table, v, carried ++ newFiles,
        "scoped compaction",
        dv = dv.filter { case (f, _) => !affected.contains(f) },
        eq = carriedEq(table, v, carried))
      catch {
        case e: java.util.ConcurrentModificationException =>
          deleteBatchDir(batch); throw e
      }
    rewriteSchemaCarry(spark, table, v, next)
    val stattedCols = statsOf(table, v).keys.map(_._2).toSeq.distinct ++
      statsOfString(table, v).keys.map(_._2).toSeq.distinct
    if (stattedCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitStats(spark, table, next, stattedCols.distinct, carryFrom = v)
    val bloomCols = bloomsOf(table, v).keys.map(_._2).toSeq.distinct
    if (bloomCols.nonEmpty && (carried ++ newFiles).nonEmpty)
      commitBlooms(spark, table, next, bloomCols, carryFrom = v)
    (next, affected.length, newFiles.length)
  }
}

/** Executor-side deletion-vector probe: ships the serialized bitsets
  * once per task (closure broadcast), deserializes them LAZILY per JVM
  * (transient), and answers "is (file, position) live" with one hash
  * probe + one bit test — no join, no shuffle, no per-row decode. */
private[graft] final class DvHolder(ser: Map[String, Array[Byte]])
  extends Serializable {
  @transient private lazy val sets: Map[String, java.util.BitSet] =
    ser.map { case (f, b) => f -> java.util.BitSet.valueOf(b) }
  def alive(path: String, idx: Long): Boolean =
    sets.get(Sources.normalizePath(path)) match {
      case Some(bits) => idx > Int.MaxValue || !bits.get(idx.toInt)
      case None => true
    }
}
