package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Load layer — reference parity for `etl/pipeline.py:239-310` (K1-K5,
  * A1-A2), re-targeted from SQLite to Parquet tables under a warehouse
  * directory (one subdir per table).
  *
  * Scale notes: full refresh is an atomic-enough `SaveMode.Overwrite`; the
  * keyed upsert is anti-join + union (one shuffle on the key — the MERGE
  * building block on immutable storage); lineage columns are constants per
  * run, stamped once at plan time (NOT per-row current_timestamp()).
  */
final class Load(warehouse: String) {

  def tablePath(name: String): String = s"$warehouse/$name"

  /** K4: audit columns appended to every row (pipeline.py:277-279). */
  def withLineage(df: DataFrame, runId: String, loadedAt: String): DataFrame =
    df.withColumn("_etl_run_id", lit(runId))
      .withColumn("_etl_loaded_at", lit(loadedAt))

  /** K1+K2: full-refresh write, skipping (and reporting) empty inputs
    * (pipeline.py:273-280). Returns rows written.
    *
    * SINGLE-scan: the old shape ran `df.count()` before the write — a full
    * extra pass over the input per load, doubling load cost at 100 TB just
    * to report rows. Now the skip-empty probe is `isEmpty` (a limit-1 job
    * that stops at the first non-empty partition) and the row count rides
    * the write itself as an `observe` metric, so the input is computed once.
    */
  def fullRefresh(df: DataFrame, name: String): Long = {
    if (df.isEmpty) 0L
    else Load.writeCounted(df, _.write.mode(SaveMode.Overwrite).parquet(tablePath(name)))
  }

  /** Bucketed refresh: pre-shuffle the table ONCE on its join/agg key so
    * every later equi-join or aggregation on that key runs with zero
    * exchanges (BucketingSpec proves the plan). Bucket metadata lives in
    * the session catalog (`saveAsTable` is how Spark records it — a plain
    * parquet path has nowhere to put it), with the data as an external
    * table under the warehouse. Worth it for tables JOINED REPEATEDLY by
    * the same key; a one-shot join is cheaper to just shuffle.
    */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    keys: Seq[String]): Long = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", tablePath(name))
      .mode(SaveMode.Overwrite)
      .saveAsTable(name)
    // EXACT row count from the committed files' parquet footers — not an
    // observe metric: the bucketing spec inserts its own exchange above any
    // metric point, and a shuffle-map stage re-executed after a fetch
    // failure would double-count there. Footers are written once at commit,
    // so their row counts are exact regardless of task retries, and summing
    // them is a metadata-only pass (one footer read per file, no data scan).
    Load.parquetRowCount(df.sparkSession, tablePath(name))
  }

  /** Bucketed APPEND: add a batch to an existing bucketed table, keeping
    * the bucket spec (Spark validates it — an append with a different
    * bucketBy fails instead of silently mixing layouts). This is the index
    * -maintenance write: per-ingest batches land pre-shuffled on the same
    * key as the base table, so probe joins stay exchange-free as the table
    * grows. Returns the EXACT rows appended (footer-count delta around the
    * commit — same retry-proof accounting as `writeBucketed`; two
    * metadata-only passes).
    */
  def appendBucketed(df: DataFrame, name: String, buckets: Int,
                     keys: Seq[String]): Long = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val before = Load.parquetRowCount(df.sparkSession, tablePath(name))
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", tablePath(name))
      .mode(SaveMode.Append)
      .saveAsTable(name)
    Load.parquetRowCount(df.sparkSession, tablePath(name)) - before
  }

  /** K1 at scale: refresh of a PARTITIONED table. Rows land in one
    * directory per partition value (`part=.../`), so downstream readers get
    * partition pruning for free. `targetPartitions` repartitions by the
    * partition columns first — one shuffle that both co-locates writers
    * (one file per partition dir per task, not one per task × partition:
    * the small-files killer at 100 TB) and bounds file count.
    *
    * Default is a TRUE full refresh (static overwrite — partition values
    * absent from this load are removed, never served stale).
    * `onlyTouchedPartitions = true` switches to dynamic overwrite for
    * incremental reloads: only the partition values present in `df` are
    * rewritten, everything else is intentionally left as loaded before.
    */
  def fullRefreshPartitioned(df: DataFrame, name: String,
                             partitionCols: Seq[String],
                             targetPartitions: Int = 0,
                             onlyTouchedPartitions: Boolean = false): Long = {
    // Same single-scan contract as fullRefresh: limit-1 empty probe, row
    // count observed on the write pass. The repartition happens BELOW the
    // metric point so CollectMetrics runs in the write (result) stage —
    // a metric under the exchange would sit in the shuffle-map stage, where
    // re-executed tasks after a fetch failure double-count.
    if (df.isEmpty) 0L
    else {
      val arranged =
        if (targetPartitions > 0)
          df.repartition(targetPartitions, partitionCols.map(df(_)): _*)
        else df.repartition(partitionCols.map(df(_)): _*)
      Load.writeCounted(arranged, counted => counted.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode",
          if (onlyTouchedPartitions) "dynamic" else "static")
        .partitionBy(partitionCols: _*).parquet(tablePath(name)))
    }
  }

  /** K3: INSERT-OR-REPLACE one keyed row into a table (pipeline.py:286-296),
    * creating it if absent (K5's CREATE IF NOT EXISTS).
    */
  def upsertRow(spark: SparkSession, name: String, keys: Seq[String],
                row: DataFrame): Unit = {
    val path = tablePath(name)
    val fs = Load.fsFor(spark, path)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val merged =
      if (exists) Relational.upsertByKey(spark.read.parquet(path), row, keys)
      else row
    Load.replaceTable(spark, merged, path)
  }

  /** A2: one etl_runs metrics row (pipeline.py:286-297 success /
    * 302-308 failure), shaped by Schemas.EtlRuns.
    */
  def metricsRow(spark: SparkSession, runId: String, startedAt: String,
                 completedAt: String, status: String, tablesLoaded: Int,
                 totalRows: Long, durationSeconds: Double): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(runId, startedAt, completedAt, status,
        tablesLoaded, totalRows, durationSeconds)),
      Schemas.EtlRuns)

  /** Load every transformed table (K1/K2/K4) and return per-table rows
    * written (A1 — pipeline.py:269-284).
    */
  def loadAll(tables: Map[String, DataFrame], runId: String,
              loadedAt: String): Map[String, Long] =
    tables.map { case (name, df) =>
      name -> fullRefresh(withLineage(df, runId, loadedAt), name)
    }
}

object Load {

  /** Execute `write` over `df` with a row-count metric OBSERVED on the write
    * pass itself (`Dataset.observe` → CollectMetrics): the count costs no
    * extra job and no second scan of the input. Exactness contract: the
    * accumulator is exactly-once only for RESULT-stage tasks — callers must
    * not introduce an exchange ABOVE the metric point (fullRefresh and
    * fullRefreshPartitioned observe atop the final frame, directly under the
    * write). Bucketed writes CANNOT satisfy that (the bucketing spec inserts
    * its own shuffle above the plan), which is why `writeBucketed`/
    * `appendBucketed` count committed parquet footers instead of observing.
    * Returns the rows that flowed into the write.
    */
  private[etl] def writeCounted(df: DataFrame, write: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }

  /** EXACT row count of a committed parquet table from file-footer metadata
    * alone: every footer records its file's row count at commit time, so
    * the sum is immune to task retries and costs one footer read per file —
    * no data pages are touched. The post-commit accounting pass for writes
    * whose plan shape rules out an exactly-once observe metric.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    // a not-yet-created table has zero rows — the before-count of a first
    // append must not throw FileNotFoundException
    if (!fs.exists(root)) return 0L
    val conf = spark.sparkContext.hadoopConfiguration
    val rootDepth = root.depth()
    // UNCOMMITTED files don't count: a crashed or in-flight job leaves
    // `_temporary/.../part-*.parquet` attempts that the committer never
    // promoted — counting them over-reports (and double-reports retried
    // tasks). Readers skip underscore/dot-prefixed paths; so does this walk.
    def committed(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur.depth() > rootDepth) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    val it = fs.listFiles(root, true)
    var sum = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && committed(f.getPath)) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try sum += reader.getRecordCount
        finally reader.close()
      }
    }
    sum
  }

  /** FileSystem for `path`'s own scheme — FileSystem.get(conf) alone
    * resolves the DEFAULT filesystem and throws "Wrong FS" the moment the
    * warehouse lives on s3a://, hdfs://, ... while defaultFS differs.
    */
  def fsFor(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(path), spark.sparkContext.hadoopConfiguration)

  /** Replace the table at `path` with `df` via stage-then-rename. Parquet
    * has no in-place merge; writing straight over `path` (delete + full
    * second write) leaves the table missing for the whole rewrite. Staging
    * the new data first and swapping with a RENAME shrinks the unprotected
    * window to one metadata operation and writes the data exactly once.
    */
  def replaceTable(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val staged = s"$path.staging"
    df.write.mode(SaveMode.Overwrite).parquet(staged)
    val fs = fsFor(spark, path)
    val target = new org.apache.hadoop.fs.Path(path)
    fs.delete(target, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), target))
      sys.error(s"rename $staged -> $path failed")
  }

  /** Compact a fragmented flat Parquet table to ~`targetFileBytes` files —
    * the maintenance pass micro-batch pipelines need: frequent small loads
    * leave thousands of tiny files whose open/footer costs come to dominate
    * scans. The rewrite sizes output from the MEASURED input bytes (never a
    * row-count guess), no-ops when the table is empty or already at/below
    * the target file count, and swaps atomically through `replaceTable`.
    * Returns (filesBefore, filesAfter).
    *
    * Preconditions, enforced:
    *  - NOT a streaming file-sink table: those carry a `_spark_metadata`
    *    transaction log that readers trust over the directory listing;
    *    rewriting the files would orphan the log and make compacted rows
    *    invisible. Stop the stream and migrate such tables first.
    *  - NOT partitioned: a flat rewrite would silently destroy the
    *    `col=value` layout (and its pruning); compact leaf partition
    *    directories individually instead.
    *  - Single writer: like every non-transactional Parquet rewrite, the
    *    caller must ensure nothing appends between the read snapshot and
    *    the swap — run it in the maintenance window of the load schedule.
    */
  /** `compact` for PARTITIONED tables: walks the `col=value` directory tree
    * and compacts each LEAF partition directory independently, preserving
    * the layout (and therefore partition pruning) exactly — the companion
    * `compact` correctly refuses these tables, and partitioned layouts are
    * where micro-batch loads fragment worst (`fullRefreshPartitioned` with
    * `onlyTouchedPartitions` appends a few files per run per partition).
    *
    * Durability: each leaf is rewritten under `<root>/.compact-staging/...`
    * (dot-prefixed — readers listing the table never see half-written
    * files), then swapped in as original → `.compact-trash`, staged → leaf,
    * drop trash. At EVERY crash point at least one complete copy of the
    * leaf exists on disk, and the next run's recovery pass restores any
    * trash leaf whose target went missing BEFORE dropping the hidden dirs —
    * a mid-swap crash never loses a partition. The reader-visible gap is
    * the instant between the two renames (Parquet directories have no
    * transaction log to do better with). Leaves already at/below their
    * target file count are untouched, so re-running is cheap and
    * idempotent; independent leaves compact CONCURRENTLY (each leaf job is
    * small — serial execution would idle the cluster once per leaf ×
    * thousands of leaves). Same single-writer precondition as `compact`.
    * Returns (filesBefore, filesAfter) summed over all leaves.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetFileBytes: Long = 128L * 1024 * 1024,
                         maxConcurrentLeaves: Int = 8): (Int, Int) = {
    val fs = fsFor(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootEntries = fs.listStatus(root)
    require(!rootEntries.exists(_.getPath.getName == "_spark_metadata"),
      s"$path is a streaming file-sink table (_spark_metadata present) — " +
        "compacting would orphan the sink log and hide rows from readers")
    require(rootEntries.exists(e => e.isDirectory && e.getPath.getName.contains("=")),
      s"$path has no col=value partition directories — use compact instead")
    val staging = new org.apache.hadoop.fs.Path(root, ".compact-staging")
    val trash = new org.apache.hadoop.fs.Path(root, ".compact-trash")
    def rel(p: org.apache.hadoop.fs.Path, base: org.apache.hadoop.fs.Path) =
      p.toUri.getPath.stripPrefix(base.toUri.getPath).stripPrefix("/")
    // Recovery from a previous crashed run: a trash leaf whose target leaf
    // is missing holds the ONLY copy of that partition — restore it first.
    if (fs.exists(trash)) {
      def dirLeaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
        val st = fs.listStatus(p)
        val dirs = st.filter(_.isDirectory).toSeq
        if (st.exists(_.isFile) || dirs.isEmpty) Seq(p)
        else dirs.flatMap(d => dirLeaves(d.getPath))
      }
      dirLeaves(trash).foreach { t =>
        val target = new org.apache.hadoop.fs.Path(root, rel(t, trash))
        if (!fs.exists(target)) {
          fs.mkdirs(target.getParent)
          if (!fs.rename(t, target))
            sys.error(s"recovery rename $t -> $target failed")
        }
      }
    }
    // Only now are the hidden dirs stale-by-construction and safe to drop.
    fs.delete(staging, true)
    fs.delete(trash, true)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val dirs = fs.listStatus(p)
        .filter(e => e.isDirectory && e.getPath.getName.contains("="))
      if (dirs.isEmpty) Seq(p) else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    def compactLeaf(leaf: org.apache.hadoop.fs.Path): (Int, Int) = {
      val parts = fs.listStatus(leaf)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (parts.isEmpty) (0, 0)
      else {
        val totalBytes = parts.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
        if (parts.length <= nOut) (parts.length, parts.length)
        else {
          val leafRel = rel(leaf, root)
          val staged = new org.apache.hadoop.fs.Path(staging, leafRel)
          val trashed = new org.apache.hadoop.fs.Path(trash, leafRel)
          // A leaf dir has no partition subdirs, so this read sees only the
          // data columns — partition values stay encoded in the dir name.
          spark.read.parquet(leaf.toString).coalesce(nOut)
            .write.mode(SaveMode.Overwrite).parquet(staged.toString)
          fs.mkdirs(trashed.getParent)
          if (!fs.rename(leaf, trashed))
            sys.error(s"rename $leaf -> $trashed failed")
          if (!fs.rename(staged, leaf))
            sys.error(s"rename $staged -> $leaf failed (original preserved in $trashed)")
          fs.delete(trashed, true)
          (parts.length, fs.listStatus(leaf)
            .count(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
        }
      }
    }
    val leafList = leaves(root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrentLeaves, leafList.size)))
    val results =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(leafList.map(l =>
            scala.concurrent.Future(compactLeaf(l)))),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    fs.delete(staging, true)
    fs.delete(trash, true)
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /** `compactPartitioned` for PATHOLOGICAL partition counts: ONE Spark job
    * instead of one-per-leaf. At tens of thousands of fragmented leaves the
    * per-leaf variant's driver thread pool becomes the scheduler bottleneck
    * (round-3 verdict); here the driver does a single metadata sweep to find
    * fragmented leaves, reads JUST those directories (explicit leaf paths
    * under `basePath` — untouched leaves are never opened), repartitions by
    * the partition columns — co-locating each partition's rows into one
    * writer task → one output file per leaf — and commits through DYNAMIC
    * partition overwrite, so only the fragmented partition values are
    * replaced and pruning layout is preserved exactly.
    *
    * Trade vs the per-leaf variant: a leaf larger than `targetFileBytes`
    * comes out as ONE file here (the hash repartition cannot split a single
    * partition value without a nondeterministic salt, which task retries
    * forbid) — acceptable because this path exists for the many-tiny-leaves
    * pathology; use `compactPartitioned` when individual leaves are huge.
    * Same single-writer precondition. Returns (filesBefore, filesAfter)
    * summed over all leaves.
    */
  def compactPartitionedByRewrite(spark: SparkSession, path: String,
                                  targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = fsFor(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootEntries = fs.listStatus(root)
    require(!rootEntries.exists(_.getPath.getName == "_spark_metadata"),
      s"$path is a streaming file-sink table (_spark_metadata present) — " +
        "compacting would orphan the sink log and hide rows from readers")
    require(rootEntries.exists(e => e.isDirectory && e.getPath.getName.contains("=")),
      s"$path has no col=value partition directories — use compact instead")
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val dirs = fs.listStatus(p)
        .filter(e => e.isDirectory && e.getPath.getName.contains("="))
      if (dirs.isEmpty) Seq(p) else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    def leafFiles(l: org.apache.hadoop.fs.Path) = fs.listStatus(l)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val leafList = leaves(root)
    val stats = leafList.map(l => l -> leafFiles(l))
    val before = stats.map(_._2.length).sum
    val fragmented = stats.filter { case (_, fls) =>
      val nOut = math.max(1,
        math.ceil(fls.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
      fls.length > nOut
    }.map(_._1)
    if (fragmented.isEmpty) return (before, before)
    val rowsBefore = parquetRowCount(spark, path)
    // partition column names, in directory order, from any leaf's rel path
    val partCols = fragmented.head.toUri.getPath
      .stripPrefix(root.toUri.getPath).stripPrefix("/")
      .split("/").map(_.split("=")(0)).toSeq
    // Partition values must round-trip BYTE-IDENTICALLY through the
    // read-rewrite cycle: with type inference on, a leaf like `hour=00` is
    // read back as int 0 and rewritten to `hour=0` — and since dynamic
    // overwrite only deletes the partitions it WRITES, the original
    // `hour=00` directory would survive and readers would see those rows
    // twice. Inference off keeps partition columns as strings, so the
    // directory names are reproduced exactly. Session conf (no per-read
    // option exists for it) — restored afterwards.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      spark.read.option("basePath", path)
        .parquet(fragmented.map(_.toString): _*)
        .repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*)
        .parquet(path)
    } finally spark.conf.set(inferKey, prevInfer)
    // belt-and-braces: compaction must preserve rows EXACTLY. If a
    // partition value still failed to round-trip (some exotic encoding),
    // dynamic overwrite lands the rows in a NEW leaf while the original
    // survives — rows double. Footer counts are metadata-only, so the
    // invariant is cheap to enforce and strictly better than silent dups.
    val rowsAfter = parquetRowCount(spark, path)
    require(rowsAfter == rowsBefore,
      s"compaction changed the table's row count ($rowsBefore -> $rowsAfter) — " +
        "a partition value did not round-trip through the rewrite and its " +
        "rows were duplicated into a new leaf; inspect the partition layout")
    val after = leaves(root).map(l => leafFiles(l).length).sum
    (before, after)
  }

  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = fsFor(spark, path)
    val target = new org.apache.hadoop.fs.Path(path)
    val entries = fs.listStatus(target)
    require(!entries.exists(_.getPath.getName == "_spark_metadata"),
      s"$path is a streaming file-sink table (_spark_metadata present) — " +
        "compacting would orphan the sink log and hide rows from readers")
    require(!entries.exists(e => e.isDirectory && e.getPath.getName.contains("=")),
      s"$path is partitioned — compact leaf partition directories individually")
    val parts = entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty) return (0, 0)
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= nOut) return (parts.length, parts.length)
    replaceTable(spark, spark.read.parquet(path).coalesce(nOut), path)
    val after = fs.listStatus(target)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
