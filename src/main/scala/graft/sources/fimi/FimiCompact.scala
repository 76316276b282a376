package graft.sources.fimi

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession

/** OPTIMIZE / small-file COMPACTION for fimi snapshot tables — the
  * lakehouse maintenance operation a streaming sink makes necessary:
  * every micro-batch epoch commits its own small files, so after N
  * epochs the latest generation is N× over-filed and scan planning,
  * split scheduling, and the manifest fold all pay per-file costs that
  * compaction amortizes away.
  *
  * Semantics (Delta/Iceberg OPTIMIZE, minus row tracking):
  *  - content-identical: the compacted generation holds exactly the
  *    latest generation's lines, in the same global order (consecutive
  *    bin-packing + in-order byte concatenation — never a shuffle);
  *  - a NEW snapshot version with a `#truncate` marker: older versions'
  *    files stay on disk, so `versionAsOf` time travel keeps working
  *    across a compaction, and a reader mid-scan on the old file list
  *    never sees a file vanish;
  *  - single-file bins are NOT rewritten: the new manifest references
  *    the original file by name (files are immutable and may be shared
  *    across generations — [[FimiLog.vacuum]]'s keep-set is
  *    reference-counted across retained versions, so sharing is safe).
  *    At 100 TB this is the difference between moving the small-file
  *    tail and moving the whole table;
  *  - tids are GENERATION-SCOPED: `tid = fileOrdinal << 40 | byteOffset`
  *    (FimiDataSourceV2), so merging files necessarily re-tids the new
  *    generation — same as OPTIMIZE re-rowing in engines without row
  *    tracking. Old versions' tids are untouched. Anything keyed on tid
  *    must be derived per-snapshot (the same rule the batch scan's
  *    path-ordinal tids already impose).
  *
  * CONCURRENCY: compaction must not clobber a commit that lands while
  * it is copying (the streaming sink is exactly the workload it runs
  * alongside). The truncate manifest it writes lists a snapshot of the
  * file set it READ — committing that list after someone else's commit
  * would silently erase the interloper's files from every later read.
  * So the commit is OPTIMISTIC: the manifest is attempted only at
  * `observed latest + 1`; if that version is already taken, this
  * attempt's output files are deleted (they are unreferenced orphans —
  * invisible) and the whole compaction restarts from a fresh file
  * list, up to [[MaxAttempts]] before aborting with a
  * ConcurrentModificationException — the Delta/Iceberg OPTIMIZE
  * conflict rule, never commit-a-stale-truncate.
  *
  * Execution shape: the driver does O(files) planning (greedy
  * consecutive bins up to `targetBytes`), each MULTI-FILE bin is one
  * task doing a streaming byte copy of its files (no parsing, no
  * decompression — a 100 TB compaction moves bytes at disk/network
  * speed), and the driver collects only the O(bins) output names
  * before the usual two-phase commit: staged dot-dir → rename into the
  * table → manifest rename as the atomic commit point. A crash
  * anywhere before the manifest write leaves only invisible orphans.
  */
object FimiCompact {

  /** Optimistic-commit attempts before giving up on a hot table. */
  val MaxAttempts = 3

  /** Test-only: runs immediately before each attempt's manifest commit —
    * the injection point FimiLogSpec uses to land a concurrent commit in
    * the window the optimistic check protects. */
  private[fimi] var beforeCommitHook: () => Unit = () => ()

  /** Compact the LATEST generation of `table` into files of about
    * `targetBytes`. Returns the number of files the new generation
    * holds, or 0 if compaction would not reduce the file count (no
    * commit is made in that case).
    *
    * `clusterBy` (SORT-CLUSTERED OPTIMIZE — Delta's `OPTIMIZE ZORDER
    * BY`): instead of order-preserving byte concatenation, the latest
    * generation is REWRITTEN with rows clustered on the given EVOLVED
    * columns, so each output file covers a narrow range of the cluster
    * key and the manifest's per-file stats (see [[FimiStats]]) actually
    * prune — the layout move that makes data skipping bite after a
    * write pattern scattered the key. One column: exact range
    * clustering (optimal in 1-D). 2–4 numeric columns: Morton
    * interleave of 16-bit quantized ranks (the `rel_zorder` arithmetic
    * applied to layout) — locality in every dimension at once. Other
    * multi-column shapes: lexicographic range sort (leading columns
    * bound tightest). Unlike plain compaction this REORDERS rows, so
    * the new generation's positional tids re-key (the same contract
    * every OPTIMIZE already documents); content is preserved as a
    * multiset and old versions stay time-travel-readable. */
  def compact(
      spark: SparkSession,
      table: String,
      targetBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val destPath = new Path(table)
    val fs = destPath.getFileSystem(conf)
    if (clusterBy.nonEmpty)
      return compactClustered(spark, fs, destPath, targetBytes, clusterBy)
    require(FimiLog.exists(fs, destPath),
      s"fimi compact: $table has no ${FimiLog.DirName} snapshot log — " +
        "compaction only applies to snapshot tables (write with " +
        ".option(\"snapshots\", \"true\") first)")
    var attempt = 0
    while (true) {
      attempt += 1
      attemptOnce(spark, fs, destPath, targetBytes) match {
        case Some(n) => return n
        case None if attempt >= MaxAttempts =>
          throw new java.util.ConcurrentModificationException(
            s"fimi compact: $table gained new commits during each of " +
              s"$MaxAttempts compaction attempts; re-run when the " +
              "write rate allows, or raise targetBytes")
        case None => () // conflicting commit landed: restart from fresh list
      }
    }
    0 // unreachable
  }

  /** Sort-clustered rewrite (see [[compact]]'s `clusterBy` doc): plan a
    * range/z-ordered shuffle of the latest generation, write one staged
    * file per range partition through [[FimiLineWriter]] (stats
    * included), and commit optimistically at base+1 — same conflict
    * rule as plain compaction, retried up to [[MaxAttempts]]. */
  private def compactClustered(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      destPath: Path,
      targetBytes: Long,
      clusterBy: Seq[String]): Int = {
    import org.apache.spark.sql.functions._
    require(FimiLog.exists(fs, destPath),
      s"fimi compact: $destPath has no ${FimiLog.DirName} snapshot log")
    require(clusterBy.size <= 4,
      s"fimi optimize: at most 4 cluster columns (got ${clusterBy.size})")
    var attempt = 0
    while (attempt < MaxAttempts) {
      attempt += 1
      val baseVersion = FimiLog.latestVersion(fs, destPath)
      val names = FimiLog.resolve(fs, destPath, baseVersion)
      if (names.isEmpty) return 0
      val schema = FimiLog.schemaAt(fs, destPath, baseVersion)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .getOrElse(FimiTable.Schema)
      val extras = FimiTable.extrasOf(schema)
      clusterBy.foreach { c =>
        require(extras.exists(_.name.equalsIgnoreCase(c)),
          s"fimi optimize: cluster column $c is not an evolved column of " +
            s"$destPath (evolved: ${extras.map(_.name).mkString(", ")}; " +
            "tid is positional and items is the basket array — neither " +
            "is a cluster key)")
      }
      val cols = clusterBy.map(c => extras.find(_.name.equalsIgnoreCase(c)).get)
      val totalBytes =
        names.map(n => fs.getFileStatus(new Path(destPath, n)).getLen).sum
      val numBins = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
      val df = spark.read.format("fimi")
        .option("versionAsOf", baseVersion.get).load(destPath.toString)
      import org.apache.spark.sql.types._
      val numericZ = cols.size >= 2 && cols.forall(f =>
        f.dataType == LongType || f.dataType == IntegerType ||
          f.dataType == DoubleType)
      val (clustered, sortCols) =
        if (cols.size == 1)
          (df, Seq(col(cols.head.name)))
        else if (numericZ) {
          // Morton interleave of quantized ranks: bit i of column j
          // lands at position i*n + (n-1-j) — the rel_zorder arithmetic
          // generalized to n dims. Mins/maxes come from one aggregate
          // over the generation; nulls quantize to 0 (first). Bits per
          // dimension cap so the TOP interleave position stays below
          // bit 63 (n=4 → 15 bits): bit 63 would flip the Long sign and
          // split the z-curve at the sign boundary, wrecking the
          // leading dimension's file ranges.
          val aggs = cols.flatMap(f => Seq(
            min(col(f.name).cast("double")), max(col(f.name).cast("double"))))
          val mm = df.agg(aggs.head, aggs.tail: _*).head()
          val n = cols.size
          val dimBits = math.min(16, 63 / n)
          val qMax = (1L << dimBits) - 1
          val zs = cols.zipWithIndex.map { case (f, j) =>
            val lo = if (mm.isNullAt(2 * j)) 0.0 else mm.getDouble(2 * j)
            val hi = if (mm.isNullAt(2 * j + 1)) 0.0 else mm.getDouble(2 * j + 1)
            val span = if (hi > lo) hi - lo else 1.0
            val q = when(col(f.name).isNull, lit(0L)).otherwise(
              least(greatest(
                ((col(f.name).cast("double") - lit(lo)) / lit(span) * qMax.toDouble)
                  .cast("long"), lit(0L)), lit(qMax)))
            (0 until dimBits).map(i =>
              shiftleft(shiftright(q, i).bitwiseAND(lit(1L)),
                i * n + (n - 1 - j))).reduce((a, b) => a + b)
          }
          (df.withColumn("__graft_z", zs.reduce(_ + _)), Seq(col("__graft_z")))
        } else (df, cols.map(f => col(f.name)))
      val sorted = clustered
        .repartitionByRange(numBins, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val stagingDir = new Path(destPath, s".graft-zorder-$tag")
      val stagingStr = stagingDir.toString
      val kvs = FimiTable.confKVs(spark.sessionState.newHadoopConf())
      val itemsIdx = schema.fieldNames.indexOf("items")
      val cells = FimiTable.cellLayout(schema, schema)
      // one staged file per non-empty range partition, written through
      // the standard line writer (cells + stats included)
      val written: Array[(Int, String, Option[String])] = sorted
        .queryExecution.toRdd.mapPartitionsWithIndex { (i, rows) =>
          if (!rows.hasNext) Iterator.empty
          else {
            val c = FimiTable.rebuildConf(kvs)
            // the task ATTEMPT id rides the staged name (the
            // FimiWriterFactory convention): under speculation two
            // attempts of partition i must never write one file — only
            // the winning attempt's name reaches the driver, the
            // loser's file dies with the staging dir
            val attempt = Option(org.apache.spark.TaskContext.get())
              .map(_.taskAttemptId()).getOrElse(0L)
            val outName = f"zorder-$i%05d-$attempt-$tag.dat"
            val w = new FimiLineWriter(
              new Path(stagingStr, outName), c, itemsIdx, cells)
            var ok = false
            try {
              rows.foreach(w.write)
              val msg = w.commit().asInstanceOf[FimiCommitMessage]
              ok = true
              Iterator.single((i, outName, msg.statsJson))
            } finally if (!ok) w.abort()
          }
        }.collect() // O(bins) names — driver-side by design
      val ordered = written.sortBy(_._1)
      ordered.foreach { case (_, n, _) =>
        val s = new Path(stagingDir, n)
        if (!fs.rename(s, new Path(destPath, n)))
          throw new java.io.IOException(
            s"fimi optimize: rename $s -> $destPath/$n failed")
      }
      val outNames = ordered.map(_._2).toSeq
      val stats = ordered.collect { case (_, n, Some(j)) => n -> j }.toMap
      beforeCommitHook()
      val v = baseVersion.map(_ + 1).getOrElse(0L)
      val won = FimiLog.write(fs, destPath, v, None, truncate = true, outNames,
        op = Some(s"OPTIMIZE ZORDER(${clusterBy.mkString(",")})"),
        stats = stats)
      if (won) {
        FimiLog.maybeCheckpoint(fs, destPath)
        fs.delete(stagingDir, true)
        return outNames.size
      }
      outNames.foreach(n => fs.delete(new Path(destPath, n), false))
      fs.delete(stagingDir, true)
    }
    throw new java.util.ConcurrentModificationException(
      s"fimi optimize: $destPath gained new commits during each of " +
        s"$MaxAttempts clustered-rewrite attempts; re-run when the write " +
        "rate allows")
  }

  /** One optimistic attempt: Some(newFileCount) on success (0 = nothing
    * to do), None when a concurrent commit invalidated the snapshot the
    * attempt was built on. */
  private def attemptOnce(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      destPath: Path,
      targetBytes: Long): Option[Int] = {
    val conf = spark.sessionState.newHadoopConf()
    val baseVersion = FimiLog.latestVersion(fs, destPath)
    val names = FimiLog.resolve(fs, destPath, baseVersion)
    val stats: Seq[FileStatus] =
      names.map(n => fs.getFileStatus(new Path(destPath, n)))
    // Raw byte concatenation is only line-safe for uncompressed text
    // (the reader treats extension-less output as plain); a compressed
    // member would be silently mis-read, so refuse loudly.
    val codecs = new CompressionCodecFactory(conf)
    stats.foreach { st =>
      require(codecs.getCodec(st.getPath) == null,
        s"fimi compact: ${st.getPath} is compressed; compaction " +
          "requires uncompressed members")
    }
    // Greedy CONSECUTIVE bins (order-preserving): a bin closes once it
    // holds >= targetBytes.
    val bins = Vector.newBuilder[Vector[FileStatus]]
    var cur = Vector.empty[FileStatus]
    var curBytes = 0L
    stats.foreach { st =>
      if (cur.nonEmpty && curBytes + st.getLen > targetBytes) {
        bins += cur; cur = Vector.empty; curBytes = 0L
      }
      cur :+= st; curBytes += st.getLen
    }
    if (cur.nonEmpty) bins += cur
    val packed = bins.result()
    if (packed.size >= stats.size) return Some(0)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val stagingDir = new Path(destPath, s".graft-compact-$tag")
    val stagingStr = stagingDir.toString
    val kvs = FimiTable.confKVs(conf)
    // Only multi-file bins copy bytes; single-file bins keep their
    // original name in the new manifest (zero data movement).
    val copyWork = packed.zipWithIndex.collect {
      case (fsts, i) if fsts.size > 1 => (i, fsts.map(_.getPath.toString))
    }
    // One task per copied bin: stream-copy members in order, guaranteeing
    // a line terminator between members (native .dat inputs may lack the
    // trailing newline the connector's own writer always emits).
    val copied: Map[Int, String] = spark.sparkContext
      .parallelize(copyWork, math.max(1, copyWork.size))
      .map { case (i, paths) =>
        val c = FimiTable.rebuildConf(kvs)
        val outName = f"compact-$i%05d-$tag.dat"
        val outPath = new Path(stagingStr, outName)
        val sfs = outPath.getFileSystem(c)
        val out = sfs.create(outPath, true)
        try {
          val buf = new Array[Byte](1 << 20)
          var last: Byte = '\n'
          paths.foreach { p =>
            if (last != '\n') { out.write('\n'); last = '\n' }
            val in = sfs.open(new Path(p))
            try {
              var n = in.read(buf)
              while (n > 0) {
                out.write(buf, 0, n)
                last = buf(n - 1)
                n = in.read(buf)
              }
            } finally in.close()
          }
          if (last != '\n') out.write('\n')
        } finally out.close()
        (i, outName)
      }
      .collect() // O(copied bins) names — driver-side by design
      .toMap
    copied.values.toSeq.sorted.foreach { n =>
      val s = new Path(stagingDir, n)
      if (!fs.rename(s, new Path(destPath, n)))
        throw new java.io.IOException(
          s"fimi compact: rename $s -> $destPath/$n failed")
    }
    // manifest order = bin order (the new generation's tid ordinals)
    val outNames = packed.indices.map { i =>
      copied.getOrElse(i, packed(i).head.getPath.getName)
    }
    // CONTENT STATS for copied bins: a bin is exactly its members'
    // union (byte concatenation), so stats MERGE — rows/nulls sum,
    // min/max widen — when every member has them; single-file bins
    // keep their name and therefore their original stats line. An
    // unstated member leaves the bin stats-less (conservative: never
    // prune on a partial range).
    val extras: Map[String, org.apache.spark.sql.types.DataType] =
      FimiLog.schemaAt(fs, destPath, baseVersion)
        .map(j => FimiTable.extrasOf(
          org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .map(f => f.name -> f.dataType).toMap)
        .getOrElse(Map.empty)
    val binStats: Map[String, String] =
      if (extras.isEmpty || copied.isEmpty) Map.empty
      else {
        val baseStats = FimiLog.statsAt(fs, destPath, baseVersion)
        // all-null synthesis for unstated members: a file first listed
        // BEFORE every evolved column existed is provably all-null for
        // them (immutability), so it merges as (rows≈1, all nulls) —
        // the fudge scale never flips a null-count comparison, because
        // nulls == rows holds per member exactly when the member is
        // all-null
        val prov = FimiLog.provenance(fs, destPath)
        def memberStats(name: String): Option[FimiStats.FileStats] =
          baseStats.get(name).flatMap(FimiStats.parse(_, extras)).orElse {
            if (extras.keys.forall(c => prov.colAdded.get(c).exists(av =>
                prov.fileFirst.get(name).exists(_ < av))))
              Some(FimiStats.FileStats(1L,
                extras.map { case (c, _) =>
                  c -> FimiStats.ColStats(None, None, 1L) }))
            else None
          }
        copyWork.flatMap { case (i, paths) =>
          FimiStats.merge(
            paths.map(p => memberStats(new Path(p).getName)), extras)
            .map(j => copied(i) -> j)
        }.toMap
      }
    // OPTIMISTIC commit: only at observed-base + 1 — a taken version
    // means someone committed since `names` was resolved, and this
    // truncate list is stale. Clean up and signal a restart.
    beforeCommitHook()
    val v = baseVersion.map(_ + 1).getOrElse(0L)
    val won = FimiLog.write(fs, destPath, v, None, truncate = true, outNames,
      op = Some("OPTIMIZE"), stats = binStats)
    if (won) {
      FimiLog.maybeCheckpoint(fs, destPath)
      fs.delete(stagingDir, true)
      Some(outNames.size)
    } else {
      copied.values.foreach(n => fs.delete(new Path(destPath, n), false))
      fs.delete(stagingDir, true)
      None
    }
  }
}
