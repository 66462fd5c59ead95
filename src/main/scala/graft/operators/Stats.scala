package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet footer-stats manifest: per-file, per-column row counts,
  * null counts, and min/max — the metadata a scan's row-group skipping
  * runs on, surfaced as a queryable DataFrame.
  *
  * Why it matters at 100 TB: file/row-group skipping is the difference
  * between reading 100 TB and reading 200 GB for a narrow predicate,
  * and whether it CAN fire is a property of the physical layout
  * ([[Layout.compact]] clustering / [[Layout.compactZOrder]]). This
  * manifest is the measurement side of that loop — `skippableFiles`
  * reports exactly which files a predicate would prune, so layout
  * decisions are driven by numbers instead of hope. The same manifest
  * pattern is what table formats (Delta/Iceberg) persist natively;
  * here it is computed from the footers that plain parquet already
  * carries.
  *
  * Scale shape: the file listing is the only driver-side work; footer
  * reads (a few KB each) are distributed over executors, one task per
  * file batch. Nothing reads data pages.
  */
object Stats {

  /** Per-(file, leaf column) footer statistics. Columns:
    * file, column (dotted path), ptype (parquet physical type), rows,
    * nulls, min_str / max_str (string render, null when absent), and
    * min_num / max_num (doubles for numeric physical types, null
    * otherwise — usable for range-skipping arithmetic in SQL).
    */
  /** Recursive data-file listing (partitioned tables nest files under
    * dt=... dirs). Driver-side, O(files) — the same cost any scan's
    * file index already pays.
    */
  private def listParquetFiles(spark: SparkSession,
                               dir: String): Seq[String] =
    listParquetFilesWithSize(spark, dir).map(_._1)

  private def listParquetFilesWithSize(spark: SparkSession,
                                       dir: String)
      : Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
        f.getLen > 0)
      .map(f => (f.getPath.toString, f.getLen)).toSeq
  }

  def parquetFileStats(spark: SparkSession, dir: String): DataFrame =
    statsForFiles(spark, listParquetFiles(spark, dir))

  /** Footer stats for an explicit file list — the unit of incremental
    * manifest maintenance.
    */
  private def statsForFiles(spark: SparkSession,
                            files: Seq[String]): DataFrame = {
    import spark.implicits._
    val confAccess =
      org.apache.spark.sql.GraftSqlBridge.hadoopConfAccessor(spark)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 64)))
      .mapPartitions { paths =>
        val conf = confAccess()
        paths.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks
            (0 until blocks.size()).flatMap { b =>
              val cols = blocks.get(b).getColumns
              (0 until cols.size()).map { c =>
                val cc = cols.get(c)
                val st = cc.getStatistics
                val has = st != null && !st.isEmpty
                val hasVals = has && st.hasNonNullValue
                def num(v: AnyRef): Option[Double] = v match {
                  case n: java.lang.Number => Some(n.doubleValue())
                  case _ => None
                }
                // exact integral bounds: INT32/INT64 stats surface as
                // boxed Integer/Long — kept as Long so 64-bit hash keys
                // (xxhash64 buckets) never round through a double, and
                // row groups merge NUMERICALLY (the string min/max
                // merge below is lexicographic — correct for UTF8
                // stats, wrong for decimal renders of integers)
                def intg(v: AnyRef): Option[Long] = v match {
                  case n: java.lang.Integer => Some(n.longValue())
                  case n: java.lang.Long => Some(n.longValue())
                  case _ => None
                }
                (p, cc.getPath.toDotString,
                  cc.getPrimitiveType.getPrimitiveTypeName.name(),
                  cc.getValueCount,
                  if (has) st.getNumNulls else -1L,
                  if (hasVals) Option(st.minAsString) else None,
                  if (hasVals) Option(st.maxAsString) else None,
                  if (hasVals) num(st.genericGetMin.asInstanceOf[AnyRef])
                  else None,
                  if (hasVals) num(st.genericGetMax.asInstanceOf[AnyRef])
                  else None,
                  if (hasVals) intg(st.genericGetMin.asInstanceOf[AnyRef])
                  else None,
                  if (hasVals) intg(st.genericGetMax.asInstanceOf[AnyRef])
                  else None)
              }
            }.iterator
          } finally reader.close()
        }
      }
      .toDF("file", "column", "ptype", "rows", "nulls",
        "min_str", "max_str", "min_num", "max_num",
        "min_int", "max_int")
      // one row per (file, column): merge row groups
      .groupBy($"file", $"column", $"ptype")
      .agg(sum($"rows").as("rows"),
        sum($"nulls").as("nulls"),
        min($"min_str").as("min_str"), max($"max_str").as("max_str"),
        min($"min_num").as("min_num"), max($"max_num").as("max_num"),
        min($"min_int").as("min_int"), max($"max_int").as("max_int"))
  }

  /** Files a `column BETWEEN lo AND hi` predicate would skip entirely
    * (footer range disjoint from [lo, hi], or the column is all null).
    * The report that licenses a clustered rewrite: on a range-clustered
    * layout most files are skippable for a narrow predicate; on a
    * write-order layout almost none are.
    */
  def skippableFiles(spark: SparkSession, dir: String, column: String,
                     lo: Double, hi: Double): DataFrame =
    skippableFilesFrom(parquetFileStats(spark, dir), column, lo, hi)

  /** [[skippableFiles]] over an already-computed stats table — the
    * form a PERSISTED manifest consumes (no footer sweep).
    */
  def skippableFilesFrom(stats: DataFrame, column: String,
                         lo: Double, hi: Double): DataFrame =
    stats
      .where(col("column") === column)
      .where((col("min_num").isNotNull && col("max_num").isNotNull &&
        (col("max_num") < lo || col("min_num") > hi)) ||
        (col("nulls") >= 0 && col("nulls") === col("rows")))
      .select(col("file"), col("rows"), col("min_num"), col("max_num"))

  /** String twin of [[skippableFiles]]: files a `column = value`
    * predicate skips entirely, decided on the footer's string min/max.
    * Sound because the orderings agree end to end: parquet UTF8 stats,
    * Spark string comparison, and the manifest round trip are all
    * unsigned-byte-lexicographic on UTF-8; writer-side stat truncation
    * only WIDENS the bounds (truncated max is incremented), so a
    * skipped file provably cannot contain the value.
    */
  def skippableFilesEq(spark: SparkSession, dir: String, column: String,
                       value: String): DataFrame =
    skippableFilesEqFrom(parquetFileStats(spark, dir), column, value)

  /** [[skippableFilesEq]] over an already-computed stats table. */
  def skippableFilesEqFrom(stats: DataFrame, column: String,
                           value: String): DataFrame =
    stats
      .where(col("column") === column)
      .where((col("min_str").isNotNull && col("max_str").isNotNull &&
        (lit(value) < col("min_str") || lit(value) > col("max_str"))) ||
        (col("nulls") >= 0 && col("nulls") === col("rows")))
      .select(col("file"), col("rows"), col("min_str"), col("max_str"))

  /** Manifest-driven pruned scan: read ONLY the files whose footer
    * range can intersect `column BETWEEN lo AND hi`, then apply the
    * predicate row-exactly on the survivors. This is the consuming
    * side of [[skippableFiles]] — the poor-man's version of what
    * Delta/Iceberg do from their persisted manifests, available on
    * plain parquet directories.
    *
    * Layout-independent result: pruning only removes files the
    * predicate provably rejects, so the output hash-matches the same
    * predicate over a full scan regardless of clustering. The WIN is
    * layout-dependent: on a range-clustered layout ([[Layout.compact]]
    * with cluster columns) a narrow predicate reads a handful of files
    * instead of the table — at 100 TB the difference between a scan
    * and a lookup.
    *
    * Scope: flat (non-hive-partitioned) directories — for partitioned
    * layouts, partition pruning already does this from the directory
    * structure; this operator covers the clustering WITHIN files that
    * partition columns can't express. Footer reads are distributed;
    * the driver handles only file-name lists.
    */
  def readSkipping(spark: SparkSession, dir: String, column: String,
                   lo: Double, hi: Double): DataFrame =
    prunedRead(spark, dir,
      skippableFiles(spark, dir, column, lo, hi),
      col(column) >= lo && col(column) <= hi)

  /** Categorical twin of [[readSkipping]]: `column = value` over a
    * string column, pruning on footer string ranges — the read path
    * for a corpus clustered by language/source/domain, where a
    * single-category job should touch only that category's files.
    */
  def readSkippingEq(spark: SparkSession, dir: String, column: String,
                     value: String): DataFrame =
    prunedRead(spark, dir,
      skippableFilesEq(spark, dir, column, value),
      col(column) === value)

  /** Read `dir` minus the files `skippable` names, then apply `pred`
    * row-exactly. Files the skip report does not mention are ALWAYS
    * read — so a stale or partial stats source can only lose pruning,
    * never rows.
    */
  private def prunedRead(spark: SparkSession, dir: String,
                         skippable: DataFrame,
                         pred: org.apache.spark.sql.Column): DataFrame = {
    val all = listParquetFiles(spark, dir)
    val skip = skippable
      .select(col("file")).collect().map(_.getString(0)).toSet
    val keep = all.filterNot(skip)
    if (keep.isEmpty)
      // schema-preserving empty result (every file pruned)
      spark.read.parquet(dir).where(lit(false))
    else
      spark.read.parquet(keep: _*).where(pred)
  }

  // ---------- persisted manifest ----------

  /** The footer-stats manifest PERSISTED as a parquet table — what
    * Delta/Iceberg keep natively, maintained here for plain parquet
    * directories. [[parquetFileStats]] recomputed per query is a full
    * footer sweep + listing every time — minutes of metadata work per
    * query at 100 TB; the persisted manifest makes pruning a read of
    * an O(files × columns) table instead.
    *
    * Contract: data files are IMMUTABLE once written (the parquet/data
    * -lake convention — appends add files, compaction writes new ones);
    * the manifest is keyed by file name, so [[refreshManifest]] carries
    * existing rows verbatim, reads footers ONLY for files it has not
    * seen, and drops rows for files that vanished. Consumers treat the
    * manifest as advisory: [[readSkippingManifest]] never prunes a
    * file the manifest does not cover, so a stale manifest costs
    * pruning, never correctness.
    */
  def writeManifest(spark: SparkSession, dir: String,
                    manifestPath: String): Unit = {
    parquetFileStats(spark, dir).write.mode("overwrite")
      .parquet(manifestPath)
    // drop any cached listing of the (just-replaced) manifest files
    spark.catalog.refreshByPath(manifestPath)
  }

  /** Incrementally refresh a persisted manifest after appends /
    * compactions / deletes: footer reads happen only for files not yet
    * in the manifest. Driver traffic is the file-name lists — the same
    * O(files) any scan's file index pays.
    */
  def refreshManifest(spark: SparkSession, dir: String,
                      manifestPath: String): Unit = {
    import spark.implicits._
    val current = listParquetFiles(spark, dir).toSet
    val old = spark.read.parquet(manifestPath)
    val known = old.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (current -- known).toSeq.sorted
    val kept = old.join(
      broadcast(spark.createDataset(current.toSeq).toDF("file")),
      Seq("file"), "left_semi")
    val refreshed =
      (if (fresh.isEmpty) kept
       else kept.unionByName(statsForFiles(spark, fresh)))
        // manifest-sized, not data-sized: materialize before the
        // self-overwrite (Spark cannot overwrite a path mid-read)
        .transform(Checkpoints.stage)
    refreshed.write.mode("overwrite").parquet(manifestPath)
    spark.catalog.refreshByPath(manifestPath)
  }

  /** [[writeManifest]] when no manifest exists yet, [[refreshManifest]]
    * otherwise — the one maintenance call every store append/compact
    * site needs, tolerant of stores created before their manifest
    * existed (absent manifest = first write, full footer sweep once).
    */
  def upsertManifest(spark: SparkSession, dir: String,
                     manifestPath: String): Unit =
    if (pathExists(spark, manifestPath))
      refreshManifest(spark, dir, manifestPath)
    else writeManifest(spark, dir, manifestPath)

  /** [[upsertManifest]] scoped to ONE changed subdirectory — the
    * batch-append fast path: manifest rows under `changedDir` are
    * replaced wholesale with fresh footer stats (exact under retry
    * overwrites, which swap that dir's files), every other row carries
    * verbatim, and nothing else is listed or footer-read. A store-wide
    * [[refreshManifest]] pays a full recursive listing plus a
    * known-file collect per append; this pays one small-dir listing.
    * Falls back to a full [[writeManifest]] when no manifest exists.
    */
  def upsertManifestFor(spark: SparkSession, dir: String,
                        manifestPath: String,
                        changedDir: String): Unit = {
    if (!pathExists(spark, manifestPath)) {
      writeManifest(spark, dir, manifestPath); return
    }
    val p = new org.apache.hadoop.fs.Path(changedDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = fs.makeQualified(p).toString.stripSuffix("/") + "/"
    val files = listParquetFiles(spark, changedDir)
    val kept = spark.read.parquet(manifestPath)
      .where(!col("file").startsWith(prefix))
    val refreshed =
      (if (files.isEmpty) kept
       else kept.unionByName(statsForFiles(spark, files)))
        // manifest-sized; materialize before the self-overwrite
        .transform(Checkpoints.stage)
    refreshed.write.mode("overwrite").parquet(manifestPath)
    spark.catalog.refreshByPath(manifestPath)
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Manifest-pruned read of an EXPLICIT directory set keyed on one
    * integer column — [[readTouchedKeysManifest]] for gen=/batch=
    * stores ([[committedViewDirs]] supplies `dirs`), tolerant of an
    * ABSENT manifest: no manifest = full read of `dirs`, pruning is
    * only ever an optimization (the advisory-manifest contract —
    * stale or missing costs reading, never rows). File-granular
    * superset: callers keep their exact row-level filters.
    */
  def readTouchedKeysUnder(spark: SparkSession, dirs: Seq[String],
                           manifestPath: String, c: String,
                           probes: DataFrame): DataFrame = {
    require(dirs.nonEmpty, "readTouchedKeysUnder: empty committed view")
    if (!pathExists(spark, manifestPath))
      return spark.read.parquet(dirs: _*)
    val keep = touchedKeysKeptFilesUnder(spark, dirs, manifestPath, c,
      probes)
    if (keep.isEmpty) spark.read.parquet(dirs: _*).where(lit(false))
    else spark.read.parquet(keep: _*)
  }

  // ---------- committed gen=/batch= store protocol ----------

  /** True iff `root` holds at least one READER-VISIBLE committed
    * parquet data file. Files under any path component starting with
    * `_` or `.` (a crashed write's `_temporary/` attempt dirs,
    * `_SUCCESS`, hidden files) are invisible to Spark's parquet
    * reader, so counting them as "committed" would make a bootstrap
    * probe claim a store exists while `spark.read.parquet` finds zero
    * files — permanently poisoning every retry after a first-batch
    * crash.
    */
  def hasCommittedParquet(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path): Boolean = {
    val qRoot = fs.makeQualified(root)
    def readerVisible(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur != qRoot) {
        val nm = cur.getName
        if (nm.startsWith("_") || nm.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    val it = fs.listFiles(qRoot, true)
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .exists(f => f.isFile && f.getLen > 0 &&
        f.getPath.getName.endsWith(".parquet") &&
        readerVisible(f.getPath))
  }

  /** The committed READ VIEW of a `gen=`/`batch=` store: the newest
    * committed `gen=<t>` compaction (if any) plus committed
    * `batch=<id>` dirs with id > t. Generation selection makes
    * compaction atomic from the reader's side — a reader resolves
    * either the old generation + its batch dirs or the new generation,
    * never a mix. Commit state is judged per sub-directory by
    * reader-visible parquet ([[hasCommittedParquet]]), so a crashed
    * write is ignored until its retry commits it. Empty = no committed
    * store content.
    */
  def committedViewDirs(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootP)) return Nil
    val dirs = fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath)
      .filter(p => hasCommittedParquet(fs, p))
    val gens = dirs.filter(_.getName.startsWith("gen="))
      .map(p => (p.getName.stripPrefix("gen=").toLong, p))
    val tok = if (gens.isEmpty) Long.MinValue else gens.map(_._1).max
    val batches = dirs
      .filter(_.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong > tok)
    (gens.filter(_._1 == tok).map(_._2) ++ batches)
      .map(_.toString).toSeq
  }

  /** The store's committed (generation token, max batch token) —
    * `Long.MinValue` for whichever side is absent. The read head of
    * the monotone batch sequence every `gen=`/`batch=` store shares.
    */
  def committedTokens(spark: SparkSession, root: String): (Long, Long) = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootP)) return (Long.MinValue, Long.MinValue)
    val dirs = fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath)
      .filter(p => hasCommittedParquet(fs, p))
    def maxOf(prefix: String): Long = {
      val ts = dirs.filter(_.getName.startsWith(prefix))
        .map(_.getName.stripPrefix(prefix).toLong)
      if (ts.isEmpty) Long.MinValue else ts.max
    }
    (maxOf("gen="), maxOf("batch="))
  }

  /** Thrown when an as-of read asks for a snapshot the vacuum has
    * already destroyed — named, with the store's surviving floor, so
    * a reproducibility pipeline fails at the read instead of silently
    * training on a different corpus than the one it recorded.
    */
  final class SnapshotUnavailableException(msg: String)
    extends IllegalStateException(msg)

  /** The oldest batch token whose snapshot is still exactly
    * reconstructible from disk — `Long.MinValue` when ALL history
    * survives. Derived from the compaction protocol's one-cycle
    * vacuum grace, no manifest needed: a fold vacuums only what the
    * PREVIOUS fold superseded, so with fewer than two committed
    * generations nothing has ever been vacuumed (first-fold grace
    * keeps every original batch dir), and with two or more the
    * OLDEST SURVIVING generation token is exactly the horizon — every
    * gen/batch dir above it is still present (the completed cycle
    * that superseded it vacuumed everything at or below it, and a
    * fold crashed before its vacuum leaves an extra old generation,
    * which only LOWERS the floor — still exact, never unsound).
    */
  def snapshotFloor(spark: SparkSession, root: String): Long = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootP)) return Long.MinValue
    val gens = fs.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") &&
        hasCommittedParquet(fs, p))
      .map(_.getName.stripPrefix("gen=").toLong)
    if (gens.length < 2) Long.MinValue else gens.min
  }

  /** AS-OF (snapshot) view of a `gen=`/`batch=` store: the committed
    * dirs that reconstruct the store exactly as [[committedViewDirs]]
    * would have resolved it when the newest committed token was
    * `asOf` — the reproducible-training-data read ("train on the
    * corpus as of batch 41", audit a past decision, diff two
    * snapshots). Resolution: the newest committed `gen=<g>` with
    * g ≤ asOf (if any) plus committed `batch=<id>` dirs with
    * g < id ≤ asOf. Throws [[SnapshotUnavailableException]] when
    * `asOf` predates [[snapshotFloor]] — the protocol's one-cycle
    * vacuum grace makes that floor exact, so an answer is either
    * bit-identical to the historical view or a named refusal, never a
    * silent partial corpus.
    *
    * COMPLIANCE: time travel never undoes a takedown. A readout over
    * an as-of view must still anti-join the family's CURRENT deleted
    * set (`<root>_deleted`'s live view) — retraction is retroactive
    * across snapshots, exactly as vacuuming a tombstoned row is.
    */
  def committedViewDirsAsOf(spark: SparkSession, root: String,
                            asOf: Long): Seq[String] = {
    val floor = snapshotFloor(spark, root)
    if (asOf < floor)
      throw new SnapshotUnavailableException(
        s"store at $root cannot serve a snapshot as of $asOf: " +
          s"compaction has vacuumed history below token $floor " +
          "(one-cycle grace keeps exactly the dirs above the " +
          "second-newest generation); re-run against a token >= " +
          s"$floor, or retain more history by compacting less often")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootP)) return Nil
    val dirs = fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath)
      .filter(p => hasCommittedParquet(fs, p))
    val gens = dirs.filter(_.getName.startsWith("gen="))
      .map(p => (p.getName.stripPrefix("gen=").toLong, p))
      .filter(_._1 <= asOf)
    val tok = if (gens.isEmpty) Long.MinValue else gens.map(_._1).max
    val batches = dirs.filter(_.getName.startsWith("batch="))
      .filter { p =>
        val id = p.getName.stripPrefix("batch=").toLong
        id > tok && id <= asOf
      }
    (gens.filter(_._1 == tok).map(_._2) ++ batches)
      .map(_.toString).toSeq
  }

  private def retractionFloorPath(root: String) =
    new org.apache.hadoop.fs.Path(
      s"${root.stripSuffix("/")}__retract_floor")

  /** Record that the fold at `tok` applied TOMBSTONES to `root` —
    * i.e. raw dirs below `tok` still on disk (one-cycle grace)
    * contain rows whose tombstones the fold just cleared. A sibling
    * marker file (metadata-only, monotone max, written under the
    * family lease by the compactor) carries the token; snapshot
    * readers refuse below it: after a takedown is folded, the
    * pre-takedown corpus must be unreproducible EVEN WHILE its dirs
    * await the next vacuum — right-to-be-forgotten bounds time
    * travel, not the other way around.
    */
  def recordRetractionFloor(spark: SparkSession, root: String,
                            tok: Long): Unit = {
    val p = retractionFloorPath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (tok > retractionFloor(spark, root)) {
      val out = fs.create(p, true)
      try out.write(tok.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** The newest token at which a fold applied tombstones to `root` —
    * `Long.MinValue` when no takedown was ever folded (or the marker
    * is unreadable: absent/corrupt reads as "no floor", which is safe
    * only because the NEXT fold's vacuum destroys the dirs anyway;
    * the marker narrows the one-cycle exposure window, it does not
    * carry the whole compliance story).
    */
  def retractionFloor(spark: SparkSession, root: String): Long = {
    val p = retractionFloorPath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      if (!fs.exists(p)) Long.MinValue
      else {
        val in = fs.open(p)
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          .trim.toLong
        finally in.close()
      }
    } catch { case _: Exception => Long.MinValue }
  }

  /** [[openCommittedStore]]'s as-of twin: snapshot resolution via
    * [[committedViewDirsAsOf]] (named refusal below the vacuum
    * floor), then the same order-insensitive, int-width-equivalent
    * schema assertion — a drifted HISTORICAL dir fails at open too.
    * Empty view (asOf below the first batch) returns None.
    */
  def openCommittedStoreAsOf(spark: SparkSession, root: String,
                             asOf: Long,
                             expected: Seq[(String, String)],
                             who: String): Option[DataFrame] = {
    val dirs = committedViewDirsAsOf(spark, root, asOf)
    if (dirs.isEmpty) None
    else {
      val intWidths = Set("tinyint", "smallint", "int", "bigint")
      def canon(t: String): String =
        if (intWidths(t)) "integral" else t
      val df = spark.read.parquet(dirs: _*)
      val found = df.schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      val foundM = found.map { case (n, t) => n -> canon(t) }.toMap
      val ok = foundM.keySet == expected.map(_._1).toSet &&
        expected.forall { case (n, t) =>
          t == "*" || foundM.get(n).contains(canon(t))
        }
      if (!ok)
        throw new StoreSchemaException(
          s"$who: snapshot of $root as of $asOf has a drifted " +
            "schema — expected {" +
            expected.map { case (n, t) => s"$n: $t" }.mkString(", ") +
            "}, found {" +
            found.map { case (n, t) => s"$n: $t" }.mkString(", ") +
            "}; refusing the read")
      Some(df)
    }
  }

  /** One store root's health, from FS metadata only — see
    * [[storeStats]]. Tokens are Long.MinValue when absent.
    */
  final case class StoreStats(root: String, newestGen: Long,
                              newestBatch: Long,
                              batchDirsAboveGen: Int,
                              viewFiles: Int, viewBytes: Long)

  /** FS-metadata store health — the signal an OPTIMIZE/vacuum
    * scheduler needs without reading a single data row: per root, the
    * committed sequence head (newest `gen=`/`batch=` token), the
    * COMPACTION DEBT (committed batch dirs above the newest
    * generation — exactly what the next fold would fold), and the
    * committed view's file count and byte size (small-file pressure:
    * debt × files-per-batch is the open() cost every reader pays
    * until someone compacts). Tombstone siblings are their own
    * sequences — pass them explicitly (`<root>_deleted`,
    * `<root>/deleted`) to see the backlog a compaction would fold and
    * clear. Read-only; pairs with [[writerLeaseStatus]] for the
    * who-is-writing half of the console.
    */
  def storeStats(spark: SparkSession, roots: Seq[String])
      : Seq[StoreStats] =
    roots.filter(_.nonEmpty).distinct.map { r =>
      val rootP = new org.apache.hadoop.fs.Path(r)
      val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(rootP))
        StoreStats(r, Long.MinValue, Long.MinValue, 0, 0, 0L)
      else {
        val (gTok, bTok) = committedTokens(spark, r)
        val debt = fs.listStatus(rootP).filter(_.isDirectory)
          .map(_.getPath)
          .filter(p => p.getName.startsWith("batch=") &&
            hasCommittedParquet(fs, p))
          .count(_.getName.stripPrefix("batch=").toLong > gTok)
        val files = committedViewDirs(spark, r).flatMap { d =>
          fs.listStatus(new org.apache.hadoop.fs.Path(d))
            .filter(s => s.isFile &&
              s.getPath.getName.endsWith(".parquet"))
        }
        StoreStats(r, gTok, bTok, debt, files.size,
          files.map(_.getLen).sum)
      }
    }

  /** Thresholds for [[maintainStores]] — a family is DUE when any of:
    * compaction debt (committed batch dirs above the newest
    * generation) ≥ `minDebt`; tombstone backlog (debt of the family's
    * `_deleted` / `_deleted_nodes` siblings) ≥ `minTombstones`
    * (retraction compliance wants physical drops promptly — lower to
    * 1 to fold on every takedown); committed-view file count ≥
    * `minViewFiles` (small-file pressure; disabled by default — debt
    * already tracks it for append-heavy stores).
    * `retainSnapshotsFrom` is the RETENTION PIN: a debt-triggered
    * fold is skipped (`skipped_retention`) when its vacuum would
    * destroy the history a snapshot at or above that token needs —
    * pin the token a training run reads as-of, and OPTIMIZE leaves
    * its corpus reconstructible until the pin lifts. A tombstone
    * backlog folds THROUGH the pin: takedown compliance beats
    * reproducibility (the retraction floor then refuses pre-takedown
    * snapshots by name).
    */
  final case class MaintenancePolicy(minDebt: Int = 8,
                                     minTombstones: Int = 2,
                                     minViewFiles: Int = Int.MaxValue,
                                     retainSnapshotsFrom: Long =
                                       Long.MaxValue)

  /** One [[maintainStores]] decision: what the scheduler saw
    * (`debt` / `tombstoneDebt` / `viewFiles`, from FS metadata only)
    * and what it did — `compacted` (with the new generation token),
    * `skipped_below_threshold`, `skipped_retention` (a debt fold
    * would destroy a pinned snapshot's history — see
    * [[MaintenancePolicy.retainSnapshotsFrom]]), or
    * `skipped_lease_held` (a LIVE writer holds the family — the
    * named conflict is surfaced in `detail`, not thrown: a
    * maintenance sweep over many families must not die because one
    * is mid-ingestion).
    */
  final case class MaintenanceOutcome(root: String, debt: Int,
                                      tombstoneDebt: Int,
                                      viewFiles: Int, action: String,
                                      newGen: Option[Long],
                                      detail: String)

  /** Debt-driven OPTIMIZE scheduler — the consumer half of
    * [[storeStats]]'s console: for each `(root, compact)` family,
    * read the FS-metadata health (no data rows touched), and when the
    * policy says the family is due, run its compactor — the
    * ALREADY-FENCED family compactor (compactNearDupStoreBanded,
    * compactEmbedStore, compactPqCodeStore, …) or a bare
    * `() => compactCommittedStore(spark, root, shape)` for plain
    * stores; the thunk returns the new generation token. Below
    * threshold the family is untouched (not even listed beyond the
    * stats read). A family whose lease is held by a live writer is
    * reported, not thrown — quiesce the gate (or let its own in-sink
    * maintenance run) and sweep again. Tombstone backlog is read from
    * the `_deleted` and `_deleted_nodes` sibling sequences
    * automatically. Run it from a cron/driver loop with the same
    * policy everywhere; at 100 TB this is the OPTIMIZE scheduler — a
    * metadata-only sweep deciding which few of thousands of store
    * families pay a fold this cycle.
    */
  def maintainStores(spark: SparkSession,
                     families: Seq[(String, () => Option[Long])],
                     policy: MaintenancePolicy = MaintenancePolicy())
      : Seq[MaintenanceOutcome] =
    families.map { case (root, compact) =>
      val s = storeStats(spark, Seq(root)).head
      val tombDebt = storeStats(spark,
          Seq(s"${root}_deleted", s"${root}_deleted_nodes"))
        .map(_.batchDirsAboveGen).sum
      val dueCompliance = tombDebt >= policy.minTombstones
      val due = dueCompliance ||
        s.batchDirsAboveGen >= policy.minDebt ||
        s.viewFiles >= policy.minViewFiles
      // a fold's vacuum destroys history below the CURRENT newest
      // generation (snapshotFloor rises to it): a retention pin
      // blocks debt-triggered folds that would unmake a pinned
      // snapshot — but a tombstone backlog folds ANYWAY (takedown
      // compliance beats reproducibility, exactly as the retraction
      // floor refuses pre-takedown snapshots by name afterwards)
      val pinBlocked = !dueCompliance &&
        s.newestGen != Long.MinValue &&
        s.newestGen > policy.retainSnapshotsFrom
      if (!due)
        MaintenanceOutcome(root, s.batchDirsAboveGen, tombDebt,
          s.viewFiles, "skipped_below_threshold", None, "")
      else if (pinBlocked)
        MaintenanceOutcome(root, s.batchDirsAboveGen, tombDebt,
          s.viewFiles, "skipped_retention", None,
          s"fold would vacuum history below gen=${s.newestGen}, " +
            "destroying snapshots pinned from " +
            s"${policy.retainSnapshotsFrom}")
      else
        try {
          val g = compact()
          // None from the compactor = tombstone backlog with nothing
          // foldable on the main sequence (an append-free gate store):
          // the read path's anti-join keeps the retraction in force;
          // the physical drop lands with the next append's fold —
          // reported, not hidden, so a sweep's log shows the deferral
          MaintenanceOutcome(root, s.batchDirsAboveGen, tombDebt,
            s.viewFiles,
            if (g.isDefined) "compacted" else "no_fold_available",
            g, "")
        } catch {
          case e: ConcurrentWriterException =>
            MaintenanceOutcome(root, s.batchDirsAboveGen, tombDebt,
              s.viewFiles, "skipped_lease_held", None, e.getMessage)
        }
    }

  /** The token a SUPERSEDING generation must carry: one above the
    * newest committed gen/batch token across `roots` (a store plus
    * any sibling projection) — writing `gen=<this>` hides every
    * earlier batch in the committed view atomically, the
    * rebuild-on-retract primitive behind the graph stores' deletion
    * path.
    */
  def supersedingToken(spark: SparkSession, roots: Seq[String]): Long = {
    val head = roots.map { r =>
      val (g, b) = committedTokens(spark, r)
      math.max(g, b)
    }.max
    if (head == Long.MinValue) 1L else head + 1L
  }

  /** Guard for the monotone batch-id contract shared by every append
    * AND tombstone delete on a `gen=`/`batch=` store: a write at an id
    * not above the newest generation token would be invisible to
    * [[committedViewDirs]] and vacuumed by the next compaction (silent
    * data loss), and a write below the newest batch token would lose
    * every newest-wins fold to data it is supposed to supersede.
    * Equality with the newest BATCH token is allowed — a retried batch
    * rewrites its own directory (the overwrite-idempotence story).
    * `roots` lists every directory participating in the sequence
    * (e.g. a store plus its `_deleted` sibling).
    */
  def requireMonotoneBatch(spark: SparkSession, roots: Seq[String],
                           batchId: Long, who: String): Unit = {
    val toks = roots.map(r => committedTokens(spark, r))
    val genTok = toks.map(_._1).max
    val batTok = toks.map(_._2).max
    require(batchId > genTok && batchId >= batTok,
      s"$who: batchId=$batchId is not on the store's monotone " +
        s"sequence (newest gen=$genTok, newest batch=$batTok over " +
        s"${roots.mkString(", ")}); a write below the head would be " +
        "invisible after compaction or lose every newest-wins fold — " +
        "resume appends/deletes ABOVE the store's current head")
  }

  /** Thrown when a store's committed view does not carry its family's
    * expected schema: a drifted or corrupted store dir fails LOUDLY at
    * open ("store at PATH: expected/found"), instead of an obscure
    * analysis error mid-query — or worse, a silent cast.
    */
  final class StoreSchemaException(msg: String)
    extends IllegalStateException(msg)

  /** Open a `gen=`/`batch=` store's committed view with the family's
    * schema asserted at open: field (name → type) must match
    * `expected` (order-insensitive; nullability ignored — parquet
    * writers vary it; INTEGER WIDTHS equivalent — key columns carry
    * the corpus's key type, int nationkeys vs bigint doc ids, and the
    * folds widen losslessly, so int-vs-bigint is legitimate variation
    * while string/double/array drift is the corruption this catches).
    * Types are `DataType.simpleString` renders ("bigint", "int",
    * "array<bigint>", …). Empty stores behave exactly as the
    * unguarded read did (the caller's committed-content probe is the
    * emptiness contract, not this). An expected type of `"*"` checks
    * the column's PRESENCE only — for payload columns whose type
    * legitimately follows the corpus (e.g. a label store's label).
    */
  def openCommittedStore(spark: SparkSession, root: String,
                         expected: Seq[(String, String)],
                         who: String): DataFrame = {
    val intWidths = Set("tinyint", "smallint", "int", "bigint")
    def canon(t: String): String =
      if (intWidths(t)) "integral" else t
    val df = spark.read.parquet(committedViewDirs(spark, root): _*)
    val found = df.schema.fields
      .map(f => f.name -> f.dataType.simpleString).toSeq
    val foundM = found.map { case (n, t) => n -> canon(t) }.toMap
    val ok = foundM.keySet == expected.map(_._1).toSet &&
      expected.forall { case (n, t) =>
        t == "*" || foundM.get(n).contains(canon(t))
      }
    if (!ok)
      throw new StoreSchemaException(
        s"$who: store at $root has a drifted schema — expected {" +
          expected.map { case (n, t) => s"$n: $t" }.mkString(", ") +
          "}, found {" +
          found.map { case (n, t) => s"$n: $t" }.mkString(", ") +
          "}; refusing the read (a drifted store dir would otherwise " +
          "surface as an unrelated mid-query analysis error, or " +
          "silently cast)")
    df
  }

  // ---------- writer fence (store-family leases) ----------

  /** Thrown when a second concurrent writer tries to claim a store
    * family another sink is still maintaining. The quiesce contract
    * between ingestion gates and retraction sinks — previously a
    * docstring — fails FAST and NAMED here, instead of surfacing later
    * as a monotone-sequence violation in whichever writer loses the
    * interleave.
    */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** The lease marker for a store-family root: a sibling FILE (never a
    * dir under the root — readers glob the root's `gen=`/`batch=`
    * children and must not see it).
    */
  def writerLeasePath(root: String): String =
    s"${root.stripSuffix("/")}__writer_lease"

  // intra-process holder registry: lease file path → the claim id
  // holding it (the streaming query's UUID once it launches; a unique
  // sync-claim id during a fenced batch mutation or a sink's pre-start
  // window; LEASE_STARTING only for direct acquireWriterLease callers
  // that pass no holder). Liveness is checked here, so a lease whose
  // holder terminated — even if the async release listener has not
  // fired yet — is reclaimable without manual intervention.
  private val LEASE_STARTING = new java.util.UUID(0L, 0L)
  private val leaseHolders =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.UUID]()
  // sync-claim ids currently alive in this JVM: a claim id in here is
  // live by definition (its owning scope has not exited) — the batch
  // analogue of a StreamingQuery's isActive.
  private val liveSyncClaims =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()

  private def leaseIsLive(spark: SparkSession,
                          qid: java.util.UUID): Boolean =
    qid == LEASE_STARTING || liveSyncClaims.contains(qid) ||
      // streaming holders register under q.runId, which is unique PER
      // RUN — a checkpoint resume mints a new runId while q.id stays
      // constant, so a predecessor's late termination event can never
      // pass an ownership check against its successor's registration
      spark.streams.active.exists(q => q.runId == qid && q.isActive)

  /** Mint a claim id that [[leaseIsLive]] reports live until
    * [[dropSyncClaim]] — the holder identity for synchronous (batch
    * mutation / sink pre-start) lease scopes, so their releases are
    * ownership-checked instead of clobbering a successor's claim.
    */
  private[graft] def newSyncClaim(): java.util.UUID = {
    val id = java.util.UUID.randomUUID()
    liveSyncClaims.add(id): Unit
    id
  }
  private[graft] def dropSyncClaim(id: java.util.UUID): Unit = {
    liveSyncClaims.remove(id): Unit
  }

  // test seam: invoked with the lease path right before the atomic
  // cross-process create — lets a spec interleave a foreign process's
  // file into the claim window and observe the named refusal.
  private[graft] var leaseClaimTestHook: String => Unit = _ => ()

  // test seam: invoked with (root, newGenToken) between a
  // compaction's fold write and its vacuum — the crash-injection
  // point for the gen=/batch= recovery spec.
  private[graft] var compactionTestHook: (String, Long) => Unit =
    (_, _) => ()

  /** Heartbeat cadence for held writer leases: a daemon refresher
    * bumps every held lease file's mtime this often, so OTHER
    * processes can tell a live holder from a crashed one. The mtime
    * IS the heartbeat (set by the holder's refresher and by every
    * claim/record write); no file body parsing is involved.
    */
  @volatile var leaseHeartbeatIntervalMs: Long = 60000L

  /** Stale-heartbeat grace: a FOREIGN process's lease file whose
    * mtime is older than this is treated as a crashed holder and
    * reclaimed (the atomic create-if-absent still arbitrates, so two
    * stale-reclaimers resolve to exactly one winner); a fresher
    * foreign file keeps the named refusal. Default = 10 heartbeat
    * intervals — generous against clock skew between writers (local
    * FS mtimes come from each writer's clock) and refresher
    * scheduling jitter. Set to Long.MaxValue to disable cross-process
    * reclaim entirely (the pre-heartbeat behavior: only
    * [[releaseWriterLease]] breaks a crashed foreign holder's lease).
    */
  @volatile var leaseStaleGraceMs: Long = 600000L

  // the refresher needs a Hadoop conf off-thread; captured at claim
  // time (any claimer's conf resolves the same lease paths)
  @volatile private var leaseHadoopConf
      : org.apache.hadoop.conf.Configuration = _
  private val leaseRefresherStarted =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  // mtime-only refresh: setTimes on a path whose lease was released
  // (and file deleted) throws FileNotFound and is skipped — the
  // refresher can never resurrect a released lease file, unlike a
  // rewrite would
  private def refreshHeldLeases(): Unit = {
    val conf = leaseHadoopConf
    if (conf != null) {
      val now = System.currentTimeMillis()
      leaseHolders.keySet().forEach { p =>
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).setTimes(hp, now, -1)
        } catch { case _: Throwable => () }
      }
    }
  }

  private val lastLeaseRefresh =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def ensureLeaseRefresher(): Unit =
    if (leaseRefresherStarted.compareAndSet(false, true)) {
      val ex = java.util.concurrent.Executors
        .newSingleThreadScheduledExecutor { r =>
          val t = new Thread(r, "graft-lease-heartbeat")
          t.setDaemon(true)
          t
        }
      // a fixed 1 s tick with a due-check (instead of scheduling at
      // the interval itself) so interval changes apply from the next
      // tick; a tick with nothing due — or nothing held — is a no-op
      ex.scheduleWithFixedDelay(new Runnable {
        def run(): Unit = {
          val now = System.currentTimeMillis()
          if (now - lastLeaseRefresh.get() >= leaseHeartbeatIntervalMs
              && !leaseHolders.isEmpty) {
            lastLeaseRefresh.set(now)
            refreshHeldLeases()
          }
        }
      }, 1000L, 1000L, java.util.concurrent.TimeUnit.MILLISECONDS): Unit
    }

  /** Claim the writer lease on every store-family root in `roots` for
    * one writer, atomically per root intra-process (the holder
    * registry's putIfAbsent/CAS is the arbiter between two writers of
    * one JVM — the common deployment, one driver per store family) and
    * cross-process (the arbiter is a create-if-absent of the lease
    * file — `fs.create(path, overwrite = false)`, atomic on HDFS and
    * on object stores with conditional create; on a LOCAL filesystem
    * Hadoop's ChecksumFileSystem implements it as exists-then-create,
    * so the cross-process arm is best-effort there — local FS is the
    * single-driver deployment, where the intra-process registry is the
    * real arbiter — and a file that appears between the inspection and
    * the create still loses us the claim instead of being clobbered).
    * Throws [[ConcurrentWriterException]] when a root is held by a
    * LIVE writer; ANY failure — conflict or I/O — rolls back every
    * registry entry and lease file this call placed, and never touches
    * a file another writer owns. A lease whose in-process holder has
    * terminated is reclaimed by CAS (exactly one of two racing
    * reclaimers wins; covers the async-release race on sequential
    * resume), and the reclaim path re-inspects the lease FILE too.
    * Cross-process liveness is the HEARTBEAT: holders refresh their
    * lease files' mtime every [[leaseHeartbeatIntervalMs]], so a
    * foreign file whose mtime is stale past [[leaseStaleGraceMs]] is
    * a crashed process and is reclaimed (create-if-absent arbitrates
    * racing reclaimers); a fresh foreign file keeps the named refusal
    * — break a wedged one manually with [[releaseWriterLease]].
    * `holder` is the registry identity for this claim (a sync-claim id
    * from [[newSyncClaim]], or the default LEASE_STARTING sentinel)
    * and is stamped into the file body, so the ownership-checked
    * release can tell its own file from a reclaimer's fresh one.
    */
  def acquireWriterLease(spark: SparkSession, roots: Seq[String],
                         owner: String,
                         holder: java.util.UUID = LEASE_STARTING)
      : Unit = {
    val paths = roots.map(writerLeasePath).distinct.sorted
    val appId = spark.sparkContext.applicationId
    // rollback sets: registry entries this call placed; lease files
    // this call created
    val registered = scala.collection.mutable.ArrayBuffer[String]()
    val created = scala.collection.mutable.ArrayBuffer[String]()
    def fail(p: String, heldBy: String): Nothing =
      throw new ConcurrentWriterException(
        s"$owner: store family at ${p.stripSuffix("__writer_lease")} " +
          s"is leased by $heldBy — a second concurrent writer on one " +
          "gen=/batch= sequence interleaves appends and deletes " +
          "(silent data loss); quiesce the holding sink first, or " +
          "break a crashed process's stale lease with " +
          "Stats.releaseWriterLease")
    try {
      paths.foreach { p =>
        // intra-process claim: putIfAbsent is the atomic arbiter
        // between two writers of this JVM; a terminated holder is
        // swapped out by CAS, so two racing reclaimers resolve to
        // exactly one winner (the loser re-reads and either sees the
        // winner — live — or retries on a vacated slot)
        @annotation.tailrec
        def claimRegistry(): Unit = {
          val prev = leaseHolders.putIfAbsent(p, holder)
          if (prev != null) {
            if (leaseIsLive(spark, prev))
              fail(p, s"query $prev (this app)")
            else if (!leaseHolders.replace(p, prev, holder))
              claimRegistry() // registry moved under us: re-read
          }
        }
        claimRegistry()
        registered += p
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
        // cross-process inspection — on EVERY path, including the
        // intra-process reclaim: a lease file from another app is
        // reclaimed ONLY when its heartbeat (mtime) is stale past the
        // grace window — a crashed foreign process no longer wedges
        // the family forever; our own app's stale file (terminated
        // holder, or a file this JVM lost track of after a listener
        // raced a crash) is removed so the create below arbitrates
        // cleanly
        if (fs.exists(hp)) {
          val body = try {
            val in = fs.open(hp)
            try org.apache.commons.io.IOUtils.toString(in, "UTF-8")
            finally in.close()
          } catch { case _: Throwable => "" }
          if (!body.contains(s"app=$appId")) {
            val hbAge = try
              System.currentTimeMillis() -
                fs.getFileStatus(hp).getModificationTime
            catch { case _: Throwable => 0L }
            if (hbAge <= leaseStaleGraceMs)
              fail(p, if (body.isEmpty) "an unreadable lease"
                else s"$body (heartbeat ${hbAge}ms old — a live " +
                  "process; stale-lease reclaim needs age > " +
                  s"$leaseStaleGraceMs ms)")
          }
          fs.delete(hp, false): Unit
        }
        leaseClaimTestHook(p)
        // cross-process arbiter: atomic create-if-absent — a file
        // that appeared since the inspection means another process
        // claimed the family first
        val out = try fs.create(hp, false) catch {
          case e: java.io.IOException =>
            if (fs.exists(hp))
              fail(p, "a lease file created concurrently by " +
                "another process")
            else throw e
        }
        try out.write(
          s"owner=$owner;app=$appId;holder=$holder".getBytes("UTF-8"))
        finally out.close()
        created += p
      }
      leaseHadoopConf = spark.sessionState.newHadoopConf()
      ensureLeaseRefresher()
    } catch {
      case t: Throwable =>
        // conflict or I/O failure mid-claim must not leave the family
        // stuck: delete only files this call created, drop only
        // registry entries this call placed (conditional on `holder`,
        // so a successor's claim is never clobbered), then rethrow
        created.foreach { p =>
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(spark.sessionState.newHadoopConf())
              .delete(hp, false): Unit
          } catch { case _: Throwable => () }
        }
        registered.foreach(p => leaseHolders.remove(p, holder): Unit)
        throw t
    }
  }

  /** Record the streaming query run now holding leases acquired with
    * [[acquireWriterLease]] (`to` = the query's runId — unique per
    * run, so a checkpoint resume's successor never shares an identity
    * with its predecessor) — conditional on the expected pre-start
    * holder, so a lease operator-broken and re-claimed mid-start is
    * never clobbered. Rewrites the lease file body's holder stamp to
    * match, so the ownership-checked release's file-side check stays
    * aligned with the registry. Enables the terminated-holder reclaim.
    */
  def recordLeaseHolder(spark: SparkSession, roots: Seq[String],
                        from: java.util.UUID,
                        to: java.util.UUID): Unit =
    roots.map(writerLeasePath).distinct.foreach { p =>
      if (leaseHolders.replace(p, from, to)) {
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
          val body = try {
            val in = fs.open(hp)
            try org.apache.commons.io.IOUtils.toString(in, "UTF-8")
            finally in.close()
          } catch { case _: Throwable => "" }
          if (body.contains(s"holder=$from")) {
            val out = fs.create(hp, true)
            try out.write(
              body.replace(s"holder=$from", s"holder=$to")
                .getBytes("UTF-8"))
            finally out.close()
          }
        } catch { case _: Throwable => () }
      }
    }

  private def releaseLease(spark: SparkSession, path: String): Unit = {
    leaseHolders.remove(path)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(hp, false): Unit
  }

  /** Release (or operator-break) the writer leases on `roots`.
    * UNCONDITIONAL — the operator's crowbar for a crashed process's
    * stale lease. Idempotent; deleting a missing lease is a no-op.
    * Running writers release through [[releaseWriterLeaseOwned]].
    */
  def releaseWriterLease(spark: SparkSession,
                         roots: Seq[String]): Unit =
    roots.map(writerLeasePath).distinct
      .foreach(p => releaseLease(spark, p))

  /** Ownership-checked release: drop the leases on `roots` only where
    * the registry still names `holder`. A predecessor query's LATE
    * termination event can fire after a successor sink has
    * liveness-reclaimed the family (the sequential-resume story); an
    * unconditional release there would delete the successor's lease
    * and let a third writer in — defeating the fence in exactly the
    * interleave it exists to prevent. The lease FILE is deleted only
    * when the conditional registry remove succeeds AND the file body
    * still carries this holder's stamp — a reclaiming acquirer that
    * slipped into the remove→delete window has already replaced the
    * file with its own stamp, which this release then leaves alone
    * (the residual read→delete gap is best-effort on filesystems
    * without conditional delete; the heartbeat makes any leaked file
    * reclaimable after grace).
    */
  def releaseWriterLeaseOwned(spark: SparkSession, roots: Seq[String],
                              holder: java.util.UUID): Unit =
    roots.map(writerLeasePath).distinct.foreach { p =>
      if (leaseHolders.remove(p, holder)) {
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
          val body = try {
            val in = fs.open(hp)
            try org.apache.commons.io.IOUtils.toString(in, "UTF-8")
            finally in.close()
          } catch { case _: Throwable => "" }
          if (body.contains(s"holder=$holder"))
            fs.delete(hp, false): Unit
        } catch { case _: Throwable => () }
      }
    }

  /** One status row per family root — the operator's read-only
    * console for the fence, the look-before-you-break companion to
    * [[releaseWriterLease]]: `(root, leased, holderLive, holder,
    * leaseFileBody)`. `leased` = a registry entry OR a lease file
    * exists; `holderLive` = this JVM's registry holder is live (a
    * running query or an open sync claim) — false for a terminated
    * holder awaiting reclaim AND for a foreign process's file (whose
    * liveness this JVM cannot see; the body's `owner=…;app=…` says
    * whose it is). Never mutates.
    */
  def writerLeaseStatus(spark: SparkSession, roots: Seq[String])
      : Seq[(String, Boolean, Boolean, String, String)] =
    roots.filter(_.nonEmpty).distinct.map { r =>
      val p = writerLeasePath(r)
      val holder = Option(leaseHolders.get(p))
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      val body =
        if (!fs.exists(hp)) ""
        else try {
          val in = fs.open(hp)
          try org.apache.commons.io.IOUtils.toString(in, "UTF-8")
          finally in.close()
        } catch { case _: Throwable => "<unreadable>" }
      (r, holder.isDefined || body.nonEmpty,
        holder.exists(leaseIsLive(spark, _)),
        holder.map(_.toString).getOrElse(""), body)
    }

  // store-family roots whose lease the current thread's enclosing
  // scope already holds (a leased streaming sink's foreachBatch, or an
  // outer withWriterLease): fenced batch mutators called from such a
  // scope are reentrant no-ops on these roots instead of
  // self-conflicting with the lease their caller holds.
  private val heldByThread = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Mark `roots` as lease-held by the current thread for the duration
    * of `body`, WITHOUT claiming — the bridge a leased streaming
    * sink's foreachBatch uses so the fenced batch mutators it calls
    * (compactions, tombstone deletes, store rebuilds) recognize the
    * enclosing query's lease instead of conflicting with it.
    * Composable: nested scopes add, and restore on exit.
    */
  def withHeldLeases[T](roots: Seq[String])(body: => T): T = {
    val ps = roots.filter(_.nonEmpty).map(writerLeasePath).toSet
    val prev = heldByThread.get()
    heldByThread.set(prev ++ ps)
    try body finally heldByThread.set(prev)
  }

  /** Run one BATCH store-family mutation under the writer fence: claim
    * the lease on every root the enclosing scope does not already
    * hold, run `body`, release (ownership-checked). The batch half of
    * the quiesce contract — a compaction, takedown, or rebuild against
    * a LIVE streaming gate's family throws
    * [[ConcurrentWriterException]] in the caller's thread, exactly
    * like a conflicting sink would; against a quiesced family it
    * claims, mutates, and releases synchronously. Reentrant: called
    * from a leased sink's foreachBatch (under [[withHeldLeases]]) or
    * from an outer withWriterLease, already-held roots are skipped, so
    * in-sink maintenance pays no per-batch lease churn. FAMILY-scoped:
    * a held primary root also covers its tombstone siblings
    * (`<root>_deleted`, `<root>_deleted_nodes`) and any subdirectory
    * (`<root>/codes`, `<root>/vecs`, …) — the sibling dirs the docs
    * already declare covered by the primary root's lease, so in-sink
    * tombstone compaction never claims (and can never leak) a
    * separate sibling lease mid-cycle.
    */
  def withWriterLease[T](spark: SparkSession, roots: Seq[String],
                         owner: String)(body: => T): T = {
    val held = heldByThread.get()
    def coveredByHeld(r: String): Boolean = {
      val n = r.stripSuffix("/")
      held(writerLeasePath(n)) || held.exists { hp =>
        val base = hp.stripSuffix("__writer_lease")
        n.startsWith(base) && {
          val rest = n.substring(base.length)
          rest.startsWith("/") || rest.startsWith("_deleted")
        }
      }
    }
    val toClaim = roots.filter(_.nonEmpty).distinct
      .filterNot(coveredByHeld)
    if (toClaim.isEmpty) return body
    val claim = newSyncClaim()
    try {
      acquireWriterLease(spark, toClaim, owner, claim)
      try withHeldLeases(toClaim)(body)
      finally releaseWriterLeaseOwned(spark, toClaim, claim)
    } finally dropSyncClaim(claim)
  }

  /** Fold a `gen=`/`batch=` store's committed view into one compacted
    * `gen=<maxBatchId>` generation shaped by `shape` (the OPTIMIZE
    * primitive behind every incremental store's compaction path), then
    * vacuum only what a FULL compaction cycle has already superseded:
    * generations and batch dirs folded into the PREVIOUS generation.
    * The one-cycle grace period is the retention story for readers
    * racing the compactor — an in-flight scan that resolved the
    * previous generation still has every file it listed.
    * Overwrite-idempotent: a crashed or retried compaction rewrites
    * the same generation; an uncommitted generation dir is invisible
    * to readers. Returns the new generation token, or None when there
    * was nothing to fold.
    */
  def compactCommittedStore(spark: SparkSession, root: String,
                            shape: DataFrame => DataFrame)
      : Option[Long] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootP)) return None
    // the OPTIMIZE primitive claims the family lease itself: calling
    // it directly against a LIVE gate's root is exactly the
    // batch-vs-stream interleave the fence refuses, and the directory
    // listing below must see a frozen sequence head. The fenced
    // compactors built on top already hold their root — reentrant
    // no-op there, including tombstone (`_deleted`) and subdir
    // (codes/, vecs/) siblings of a held family root.
    withWriterLease(spark, Seq(root), "compactCommittedStore(batch)") {
      val dirs = fs.listStatus(rootP).filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => hasCommittedParquet(fs, p))
      val gens = dirs.filter(_.getName.startsWith("gen="))
        .map(p => (p.getName.stripPrefix("gen=").toLong, p))
      val prevTok =
        if (gens.isEmpty) Long.MinValue else gens.map(_._1).max
      val foldable = dirs.filter(_.getName.startsWith("batch="))
        .map(p => (p.getName.stripPrefix("batch=").toLong, p))
        .filter(_._1 > prevTok)
      if (foldable.isEmpty) None
      else {
        val newTok = foldable.map(_._1).max
        val viewPaths = (gens.filter(_._1 == prevTok).map(_._2) ++
          foldable.map(_._2)).map(_.toString).toSeq
        shape(spark.read.parquet(viewPaths: _*))
          .write.mode("overwrite").parquet(s"$root/gen=$newTok")
        // crash seam: fires between the fold commit and the vacuum —
        // lets a spec kill the compactor at the protocol's most
        // delicate point and machine-check the old-or-new-never-a-mix
        // reader claim plus re-run recovery
        compactionTestHook(root, newTok)
        val stale =
          gens.filter(_._1 < prevTok).map(_._2) ++
            dirs.filter(_.getName.startsWith("batch="))
              .filter(_.getName.stripPrefix("batch=").toLong <= prevTok)
        stale.foreach(p => fs.delete(p, true))
        Some(newTok)
      }
    }
  }

  /** [[readSkipping]] through a persisted manifest: no footer sweep,
    * no listing beyond the one the read itself needs. Files the
    * manifest does not cover (e.g. appended since the last refresh)
    * are read unconditionally.
    */
  def readSkippingManifest(spark: SparkSession, dir: String,
                           column: String, lo: Double, hi: Double,
                           manifestPath: String): DataFrame =
    prunedRead(spark, dir,
      skippableFilesFrom(spark.read.parquet(manifestPath), column, lo, hi),
      col(column) >= lo && col(column) <= hi)

  /** Conjunctive multi-range pruned read through a persisted manifest:
    * `c₁ BETWEEN lo₁ AND hi₁ AND c₂ BETWEEN lo₂ AND hi₂ AND …`. A file
    * provably disjoint on ANY conjunct cannot satisfy the conjunction,
    * so the skip set is the UNION of the per-column skip sets — this is
    * where a Z-ordered layout ([[Layout.compactZOrder]]) earns its
    * keep: every file covers a small hyper-rectangle, so EVERY
    * predicate column prunes, where a linearly-sorted layout prunes
    * only on its leading column.
    */
  def readSkippingAndManifest(spark: SparkSession, dir: String,
                              ranges: Seq[(String, Double, Double)],
                              manifestPath: String): DataFrame = {
    require(ranges.nonEmpty, "readSkippingAndManifest: need >= 1 range")
    val stats = spark.read.parquet(manifestPath)
    val skippable = ranges
      .map { case (c, lo, hi) => skippableFilesFrom(stats, c, lo, hi) }
      .reduce(_ unionByName _)
    val pred = ranges
      .map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    prunedRead(spark, dir, skippable, pred)
  }

  /** Categorical twin of [[readSkippingManifest]]. */
  def readSkippingEqManifest(spark: SparkSession, dir: String,
                             column: String, value: String,
                             manifestPath: String): DataFrame =
    prunedRead(spark, dir,
      skippableFilesEqFrom(spark.read.parquet(manifestPath), column, value),
      col(column) === value)

  // ---------- touched-pair pruning (banded signature stores) ----------

  /** The data files of `dir` a probe SET over the integer cluster pair
    * (c1, c2) cannot prune — the store-scan accounting unit of
    * [[readTouchedPairsManifest]], exposed so tests and maintenance
    * jobs can audit exactly which files a batch's store scan opens.
    *
    * Soundness: a file with footer ranges [a_mn, a_mx] × [b_mn, b_mx]
    * can contain probe (p1, p2) only if p1 ∈ [a_mn, a_mx]; when the
    * file holds a SINGLE c1 value (a_mn = a_mx — the common case for a
    * (c1, c2)-range-clustered layout with more files than c1 values),
    * additionally only if p2 ∈ [b_mn, b_mx]. A file spanning several
    * c1 values is kept on the c1 test alone (its c2 footer range does
    * not bound any single c1 slice). Files the manifest does not cover
    * are ALWAYS kept — stale manifests cost pruning, never rows.
    * Bounds come from the manifest's EXACT integral columns
    * (`min_int`/`max_int` — boxed footer values merged numerically
    * across row groups; `min_num`/`max_num` doubles are lossy past
    * 2^53 for xxhash64 bucket keys, and the string stats merge
    * lexicographically, which is wrong for decimal integer renders).
    */
  def touchedPairsKeptFiles(spark: SparkSession, dir: String,
                            manifestPath: String, c1: String, c2: String,
                            probes: DataFrame): Seq[String] =
    touchedPairsKeptFilesUnder(spark, Seq(dir), manifestPath, c1, c2,
      probes)

  /** [[touchedPairsKeptFiles]] over an EXPLICIT set of directories —
    * the streaming-store form, where the candidate files are the
    * current generation view's dirs rather than everything under one
    * root (a superseded generation awaiting vacuum must not be read
    * even though the manifest may still cover it).
    */
  def touchedPairsKeptFilesUnder(spark: SparkSession, dirs: Seq[String],
                                 manifestPath: String, c1: String,
                                 c2: String,
                                 probes: DataFrame): Seq[String] = {
    val stats = spark.read.parquet(manifestPath)
    def ranges(c: String, a: String): DataFrame =
      stats
        .where(col("column") === c &&
          col("ptype").isin("INT32", "INT64"))
        .select(col("file"),
          col("min_int").as(s"__${a}_mn"),
          col("max_int").as(s"__${a}_mx"),
          (col("nulls") >= 0 && col("nulls") === col("rows"))
            .as(s"__${a}_nul"))
    val withStats = ranges(c1, "a").join(ranges(c2, "b"), "file")
    // all-null cluster columns cannot match any (non-null) probe; a
    // file with absent bounds is unprunable and simply never skipped
    val prunable = withStats.where(
      (!col("__a_nul") && !col("__b_nul") &&
        col("__a_mn").isNotNull && col("__a_mx").isNotNull &&
        col("__b_mn").isNotNull && col("__b_mx").isNotNull) ||
        col("__a_nul") || col("__b_nul"))
    val p = probes
      .select(col(c1).cast("long").as("__p1"),
        col(c2).cast("long").as("__p2"))
      .where(col("__p1").isNotNull && col("__p2").isNotNull)
      .distinct()
    val hit = !col("__a_nul") && !col("__b_nul") &&
      col("__p1") >= col("__a_mn") && col("__p1") <= col("__a_mx") &&
      (col("__a_mn") < col("__a_mx") ||
        (col("__p2") >= col("__b_mn") && col("__p2") <= col("__b_mx")))
    // metadata × batch-bounded probe set — never data-sized; collected
    // as file NAMES only (the prunedRead driver-traffic contract)
    val skip = prunable.join(p, hit, "left_anti")
      .select(col("file")).collect().map(_.getString(0)).toSet
    dirs.flatMap(d => listParquetFiles(spark, d)).filterNot(skip)
  }

  /** Store scan pruned to the files a touched-(c1, c2) set can live in
    * — the read path for incremental near-dup signature/code stores
    * persisted range-clustered by (c1, c2) ([[Dedup.writeBandedSigStore]]
    * / [[Dedup.writeCodeStore]]): a batch's store scan opens only
    * touched-bucket files instead of the whole store. File-granular:
    * the result is a SUPERSET of the touched rows, so callers keep
    * their exact row-level filter (the incremental operators' touched
    * semi join). Empty kept set → schema-preserving empty result.
    */
  def readTouchedPairsManifest(spark: SparkSession, dir: String,
                               manifestPath: String, c1: String,
                               c2: String, probes: DataFrame): DataFrame = {
    val keep = touchedPairsKeptFiles(spark, dir, manifestPath, c1, c2,
      probes)
    if (keep.isEmpty) spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(keep: _*)
  }

  // ---------- touched-key pruning (single-key stores) ----------

  /** Single-key twin of [[touchedPairsKeptFilesUnder]]: the data files
    * a probe SET over one integer column cannot prune — for stores
    * range-clustered by a single key (the window-fingerprint store).
    * Same soundness contract: a file the manifest does not cover, or
    * whose bounds are absent, is always read.
    */
  def touchedKeysKeptFiles(spark: SparkSession, dir: String,
                           manifestPath: String, c: String,
                           probes: DataFrame): Seq[String] =
    touchedKeysKeptFilesUnder(spark, Seq(dir), manifestPath, c, probes)

  /** [[touchedKeysKeptFiles]] over an EXPLICIT set of directories —
    * the streaming-store form (see [[touchedPairsKeptFilesUnder]]).
    */
  def touchedKeysKeptFilesUnder(spark: SparkSession, dirs: Seq[String],
                                manifestPath: String, c: String,
                                probes: DataFrame): Seq[String] =
    touchedKeysKeptFilesFrom(spark.read.parquet(manifestPath),
      dirs.flatMap(d => listParquetFiles(spark, d)), c, probes)

  /** The pruning core over an ALREADY-LOADED stats table and file
    * list — what [[KeyPruner]] calls per probe after paying the
    * manifest read and the listing once.
    */
  def touchedKeysKeptFilesFrom(stats: DataFrame, files: Seq[String],
                               c: String,
                               probes: DataFrame): Seq[String] = {
    val ranges = stats
      .where(col("column") === c && col("ptype").isin("INT32", "INT64"))
      .select(col("file"), col("min_int").as("__mn"),
        col("max_int").as("__mx"),
        (col("nulls") >= 0 && col("nulls") === col("rows")).as("__nul"))
    val prunable = ranges.where(
      (!col("__nul") && col("__mn").isNotNull && col("__mx").isNotNull)
        || col("__nul"))
    val p = probes.select(col(c).cast("long").as("__p"))
      .where(col("__p").isNotNull).distinct()
    val hit = !col("__nul") &&
      col("__p") >= col("__mn") && col("__p") <= col("__mx")
    val skip = prunable.join(p, hit, "left_anti")
      .select(col("file")).collect().map(_.getString(0)).toSet
    files.filterNot(skip)
  }

  /** Per-CALL cached key pruner: ONE manifest read (staged in memory)
    * and ONE store listing serve every later probe — the form the
    * ITERATIVE incremental operators need. k-core's closure and peel
    * loops probe the member store every round; routing each probe
    * through [[readTouchedKeysUnder]] re-reads the manifest parquet
    * and re-lists the store per round, a fixed cost that outweighed
    * the pruning at bench scale (x_kcore_incremental 2.9× in the r11
    * window — root-caused to exactly this). The capture is pinned at
    * construction: build one pruner per operator call, AFTER any
    * store write its probes must observe.
    */
  final class KeyPruner private[operators] (spark: SparkSession,
                                            dirs: Seq[String],
                                            manifestPath: String,
                                            c: String) {
    require(dirs.nonEmpty, "KeyPruner: empty committed view")
    private val sized: Seq[(String, Long)] =
      dirs.flatMap(d => listParquetFilesWithSize(spark, d))
    private val files: Seq[String] = sized.map(_._1)

    /** Total committed data bytes — the regime signal callers gate
      * on: below a threshold a single staged full-view read beats
      * per-probe pruning (each probe is a scheduler round trip), above
      * it pruning is the only shape that scales. Comes from the
      * listing already paid; never a data scan.
      */
    val totalBytes: Long = sized.map(_._2).sum

    private lazy val stats: Option[DataFrame] =
      if (!pathExists(spark, manifestPath)) None
      else Some(Checkpoints.stage(spark.read.parquet(manifestPath)))

    def keptFiles(probes: DataFrame): Seq[String] = stats match {
      case None => files
      case Some(st) => touchedKeysKeptFilesFrom(st, files, c, probes)
    }

    /** Pruned store scan for one probe set — [[readTouchedKeysUnder]]
      * semantics (uncovered files always read; file-granular superset,
      * callers keep their row filter) at per-probe join cost only.
      */
    def read(probes: DataFrame): DataFrame = {
      val keep = keptFiles(probes)
      if (keep.isEmpty) spark.read.parquet(dirs: _*).where(lit(false))
      else spark.read.parquet(keep: _*)
    }
  }

  def keyPruner(spark: SparkSession, dirs: Seq[String],
                manifestPath: String, c: String): KeyPruner =
    new KeyPruner(spark, dirs, manifestPath, c)

  /** Store scan pruned to the files a touched-key set can live in —
    * single-key twin of [[readTouchedPairsManifest]]. File-granular
    * superset: callers keep their exact row-level filter.
    */
  def readTouchedKeysManifest(spark: SparkSession, dir: String,
                              manifestPath: String, c: String,
                              probes: DataFrame): DataFrame = {
    val keep = touchedKeysKeptFiles(spark, dir, manifestPath, c, probes)
    if (keep.isEmpty) spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(keep: _*)
  }

  // ---------- per-file bloom manifest (point-lookup pruning) ----------

  /** Per-file BLOOM manifest over one key column — the pruning index
    * min/max footer stats cannot be for point probes on a
    * hash-distributed key (every file's [min, max] spans the whole id
    * domain, so range stats keep everything; this is the gap Delta's
    * bloom file index fills). One column-pruned scan of `(c,
    * input_file_name)` builds a fixed-size bloom per data file
    * ([[graft.functions.BloomAggregator]] — blobs merge as byte-OR, so
    * partials are map-side and the blob is partitioning-independent);
    * blob size is MEASURED, not guessed: m = nextPow2(bitsPerKey ×
    * largest file's key count), uniform across files so merge never
    * sees mixed widths. Default 16 bits/key ≈ 0.05 % false-positive
    * per probe per file (k = 6): a 20-id lookup over a 100k-file store
    * expects ≈ 1 false file open. Keys are hashed with Spark's
    * `xxhash64` on BOTH build and probe side — callers must probe with
    * the same column TYPE they built with (xxhash64 is type-sensitive).
    * Nulls never enter the bloom and null probes never match. Rebuild
    * after compaction like every manifest; a stale manifest costs
    * pruning, never rows (uncovered files are always read).
    */
  def writeKeyBloomManifest(spark: SparkSession, dir: String, c: String,
                            manifestPath: String, bitsPerKey: Int = 16,
                            numHashes: Int = 6): Unit = {
    import spark.implicits._
    require(bitsPerKey >= 1 && numHashes >= 1)
    val keyed = spark.read.parquet(dir)
      .where(col(c).isNotNull)
      .select(input_file_name().as("file"), xxhash64(col(c)).as("__h"))
    val maxKeys = keyed.groupBy(col("file"))
      .agg(count(lit(1)).as("n")).agg(max(col("n")))
      .as[Option[Long]].head().getOrElse(0L)
    val mBits =
      graft.functions.BloomFilters.sizeBits(maxKeys * bitsPerKey)
    val bloomAgg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BloomAggregator(mBits, numHashes))
    keyed.groupBy(col("file"))
      .agg(bloomAgg(col("__h")).as("bloom"),
        count(lit(1)).as("n_keys"))
      .withColumn("m", lit(mBits))
      .withColumn("k", lit(numHashes))
      .write.mode("overwrite").parquet(manifestPath)
    spark.catalog.refreshByPath(manifestPath)
  }

  /** The data files a POINT-PROBE set over `c` can possibly touch,
    * per the bloom manifest: a file is kept iff some probe's k bit
    * positions are all set in its blob — or the manifest does not
    * cover it (soundness: bloom misses are impossible by construction,
    * manifest gaps always read). Probe hashes are computed by the same
    * `xxhash64` the build used and collected driver-side (point
    * lookups are small by contract — `maxProbes` guards the collect
    * BEFORE it runs); the blob test itself runs distributed over the
    * manifest rows, so blobs never reach the driver. File-granular
    * superset: callers keep their exact row filter.
    */
  def pointLookupKeptFiles(spark: SparkSession, dirs: Seq[String],
                           manifestPath: String, c: String,
                           probes: DataFrame,
                           maxProbes: Int = 65536): Seq[String] = {
    import spark.implicits._
    val pdf = probes.where(col(c).isNotNull)
      .select(xxhash64(col(c)).as("__h")).distinct()
    val guarded = pdf.limit(maxProbes + 1).as[Long].collect()
    require(guarded.length <= maxProbes,
      s"point-lookup probe set exceeds $maxProbes keys — " +
        "use the clustered/manifest range paths for batch probes")
    val hs = guarded
    val man = spark.read.parquet(manifestPath)
      .select(col("file"), col("m"), col("k"), col("bloom"))
      .as[(String, Int, Int, Array[Byte])]
    // `input_file_name()` (build side) renders file:///p, the Hadoop
    // listing (probe side) file:/p — compare through Path, which
    // normalizes both to one form
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toString
    val covered = man.map(_._1).collect().map(norm).toSet
    val hit = man.filter { r =>
      hs.exists(h =>
        graft.functions.BloomFilters.mightContain(r._4, r._2, r._3, h))
    }.map(_._1).collect().map(norm).toSet
    dirs.flatMap(d => listParquetFiles(spark, d))
      .filter(f => !covered(norm(f)) || hit(norm(f)))
  }

  /** Point-lookup read through the bloom manifest: the probed rows of
    * `dir`, opening only the files [[pointLookupKeptFiles]] keeps.
    * Row-exact via a broadcast semi join on the (small, bounded) probe
    * set — bloom false positives cost a file open, never a row.
    */
  def readPointLookup(spark: SparkSession, dir: String,
                      manifestPath: String, c: String,
                      probes: DataFrame,
                      maxProbes: Int = 65536): DataFrame = {
    val keep = pointLookupKeptFiles(spark, Seq(dir), manifestPath, c,
      probes, maxProbes)
    val base =
      if (keep.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(keep: _*)
    base.join(broadcast(probes.select(col(c)).distinct()),
      Seq(c), "left_semi")
  }

  // ---------- snapshot diff ----------

  /** Keyed DIFF between two snapshots of the same schema — the audit
    * read behind every store's time travel ("what changed between the
    * corpus batch 3 trained on and batch 7"): one full-outer join on
    * `keys`, each non-key column carried as `old_<c>` / `new_<c>`,
    * classified `added` / `removed` / `changed` (null-safe value
    * compare, so a value going null is a change, not a phantom
    * removal) with unchanged rows dropped. Both inputs must share the
    * exact column set; presence rides explicit flags, never value
    * nullability. One shuffle per side plus the join — the diff of
    * two 100 TB snapshots is a co-partitioned join on the key, and
    * unchanged keys (the overwhelming mass) produce no output rows.
    */
  def keyedDiff(oldSnap: DataFrame, newSnap: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keyedDiff needs at least one key column")
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      s"snapshot schemas differ: ${oldSnap.columns.mkString(",")} vs " +
        newSnap.columns.mkString(","))
    val vals = oldSnap.columns.filterNot(keys.contains).toSeq
    val a = oldSnap.select(keys.map(col) ++
      vals.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__ina"): _*)
    val b = newSnap.select(keys.map(col) ++
      vals.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__inb"): _*)
    val changed = vals
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .foldLeft(lit(false))(_ || _)
    a.join(b, keys, "full_outer")
      .withColumn("status",
        when(col("__inb").isNull, lit("removed"))
          .when(col("__ina").isNull, lit("added"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(keys.map(col) ++
        vals.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))) :+
        col("status"): _*)
  }

  // ---------- corpus profile + drift ----------

  /** Long-format exact profile of `cols`: one row per column with
    * (column, n_rows, n_nulls, n_distinct) — all integers, one
    * aggregation pass (count_distinct columns share the same job;
    * Spark plans multi-distinct via expand, map-side partials intact).
    * The measurement half of drift detection.
    */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    // internal aliases are INDEX-based and the long-format rows are
    // built programmatically (structs + inline), never via
    // selectExpr/stack — a column named with quotes, spaces, or
    // reserved words must not reach the SQL parser, and the label
    // rides as a lit(), not an interpolated string literal
    val aggs = count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(df.col(c).isNull.cast("long")).as(s"__nulls_$i"),
        count_distinct(df.col(c)).as(s"__ndv_$i")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__ndv_$i").as("n_distinct"))
    }: _*)
    one.select(inline(rows))
  }

  /** Drift report between two snapshots of the same schema (the
    * ingest regression alarm: a crawler change that halves a source's
    * language diversity or starts emitting null text shows up here
    * before it poisons training): [[profileTable]] of each side,
    * full-outer joined per column. All integer columns — exact,
    * oracle-checkable; thresholding is the caller's policy.
    */
  def profileDrift(a: DataFrame, b: DataFrame,
                   cols: Seq[String]): DataFrame = {
    val pa = profileTable(a, cols)
      .select(col("column"), col("n_rows").as("n_a"),
        col("n_nulls").as("nulls_a"), col("n_distinct").as("ndv_a"))
    val pb = profileTable(b, cols)
      .select(col("column"), col("n_rows").as("n_b"),
        col("n_nulls").as("nulls_b"), col("n_distinct").as("ndv_b"))
    pa.join(pb, Seq("column"), "full_outer")
  }
}
