package graft.sources.fimi

import java.util.OptionalLong

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE DATA FEED for fimi snapshot tables — the Delta
  * `table_changes` / Iceberg changelog affordance: read the rows a
  * range of commits added and removed, without replaying the DML.
  *
  * Surface: `spark.read.format("fimi").option("changesFrom", v1)
  * [.option("changesTo", v2)].load(tableDir)` returns one row per
  * changed (tid, items) with three extra columns — `_change_type`
  * (`insert` | `delete`), `_commit_version`, and `_commit_timestamp`
  * (the manifest's `#ts` commit instant). Versions are inclusive on
  * both ends; `changesTo` defaults to the latest commit.
  *
  * Granularity contract (the copy-on-write reality every COW lakehouse
  * shares): the scan is FILE-granular. An append commit contributes
  * its files as `insert` rows. A table-replacing commit (row-level
  * DELETE/UPDATE/MERGE, INSERT OVERWRITE, TRUNCATE, OPTIMIZE) is
  * diffed against the previous version's listing: files only in the
  * new listing read as `insert`, files only in the old listing as
  * `delete` — so rows of a rewritten file that the DML did NOT touch
  * appear as a delete/insert pair ("carryover"). [[FimiChanges.net]]
  * cancels those pairs declaratively, yielding net CONTENT changes per
  * commit at basket granularity (tids are positional and change across
  * rewrites, so content — the `items` array — is the only identity
  * that survives a rewrite; this matches the engine's own tid
  * contract, FimiRowLevel.scala scaladoc).
  *
  * tid semantics: an `insert` row carries the tid a batch read AT that
  * commit's version assigns it (file ordinal in the commit's resolved
  * listing); a `delete` row carries its tid at the PREVIOUS version —
  * so change rows join positionally against `versionAsOf` reads of the
  * matching snapshot.
  *
  * Scale posture: planning is one names-only log listing plus cached
  * manifest parses (the same incremental fold every read rides);
  * partitions cover ONLY the files the range's commits touched — a
  * 100 TB table whose last night of commits moved 30 GB plans a 30 GB
  * scan, never a table scan. Files are byte-range split like the batch
  * scan; column pruning reaches the inner reader. History must be
  * retained: a range reaching below VACUUM's boundary fails loudly
  * (the listing diff would be unreconstructable), never returns a
  * partial feed.
  */
object FimiChanges {
  val FromOption = "changesFrom"
  /** Timestamp form of [[FromOption]] (epoch millis or a
    * `java.sql.Timestamp`-parseable string): the feed starts at the
    * first commit whose `#ts` instant is AT OR AFTER the given time —
    * resolved once at planning through the same commit ledger
    * TIMESTAMP AS OF reads, so a copied/restored log keeps its
    * history. Mutually exclusive with [[FromOption]]. */
  val FromTsOption = "changesFromTimestamp"
  val ToOption = "changesTo"
  val ChangeTypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  /** The three change-metadata columns appended after the table's own. */
  val ChangeFields: Seq[StructField] = Seq(
    StructField(ChangeTypeCol, StringType, nullable = false),
    StructField(VersionCol, LongType, nullable = false),
    StructField(TimestampCol, TimestampType, nullable = false))

  val ChangeColNames: Set[String] = ChangeFields.map(_.name).toSet

  val Schema: StructType =
    StructType(FimiTable.Schema.fields.toSeq ++ ChangeFields)

  /** The feed's relation schema for a table schema: the table's own
    * columns (evolved extras included — the feed serves the same row
    * shape the snapshot reads do) plus the change metadata. */
  def schemaFor(tableSchema: StructType): StructType =
    StructType(tableSchema.fields.toSeq ++ ChangeFields)

  def requested(options: CaseInsensitiveStringMap): Boolean =
    options.containsKey(FromOption) || options.containsKey(FromTsOption)

  /** One commit's file-level diff: the files it added and removed,
    * each with its ordinal in the listing that side resolves against
    * (added: the commit's own version; removed: the previous version)
    * — the snapshot-positional tid contract. `truncate`/`op` carry the
    * commit's kind for consumers that classify commits (the append-only
    * stream's OPTIMIZE ride-through). */
  private[fimi] case class CommitDiff(
      version: Long,
      tsMicros: Long,
      added: Seq[(String, Int)],
      removed: Seq[(String, Int)],
      truncate: Boolean,
      op: Option[String])

  /** Validate `[from, to]` against the log and produce each commit's
    * diff, version order, as a SINGLE-USE LAZY iterator: validation and
    * the listing seed are paid up front, but per-commit diff work is
    * paid only as far as the caller consumes — so capped streaming
    * admission over a deep backlog costs O(admitted versions) per
    * trigger, not O(backlog). A PURE function of the immutable manifest
    * log — the batch scan and the streaming source both plan through
    * it, so a replayed streaming offset re-derives the identical
    * batch. Metadata cost: one names-only log listing plus cached
    * manifest parses. Fails loudly on vacuumed history (the listing
    * diff would be unreconstructable) — with one exception carved out:
    * an APPEND at the retention boundary still diffs exactly (its
    * removed set is empty and its added set is its own manifest). */
  private[fimi] def diffRange(
      fs: org.apache.hadoop.fs.FileSystem,
      table: Path,
      from: Long,
      to: Long): Iterator[CommitDiff] =
    diffRange(fs, table, from, to, FimiLog.history(fs, table))

  /** [[diffRange]] with the caller's already-fetched history — callers
    * that list the log for their own validation avoid a second
    * names-only listing per plan. */
  private[fimi] def diffRange(
      fs: org.apache.hadoop.fs.FileSystem,
      table: Path,
      from: Long,
      to: Long,
      hist: Seq[FimiLog.HistoryEntry]): Iterator[CommitDiff] = {
    validateRange(table, from, to, hist)
    val retained = hist.map(_.version).toSet
    val manifestByV = FimiLog.manifests(fs, table).map(m => m.version -> m).toMap
    val tsByV = hist.map(h => h.version -> h.tsMillis * 1000L).toMap

    // listing at from-1, the diff seed (see scaladoc for the boundary
    // carve-out)
    val m0 = manifestByV(from)
    var prev: Vector[String] =
      if (from == 0) Vector.empty
      else if (retained.contains(from - 1))
        FimiLog.resolve(fs, table, Some(from - 1)).toVector
      else if (!m0.truncate)
        FimiLog.resolve(fs, table, Some(from)).toVector
          .dropRight(m0.files.size)
      else throw new IllegalArgumentException(
        s"fimi: a change range cannot START at version $from of $table — " +
          s"it is a table-replacing commit whose removed set needs the " +
          s"version-${from - 1} listing, which was vacuumed; start at " +
          s"version ${from + 1}, or re-read the version-$from snapshot")

    (from to to).iterator.map { v =>
      val m = manifestByV(v)
      val cur: Vector[String] =
        (if (m.truncate) Vector.empty[String] else prev) ++ m.files
      val (added, removed) =
        if (m.truncate) {
          val prevSet = prev.toSet
          val curSet = cur.toSet
          (cur.filterNot(prevSet), prev.filterNot(curSet))
        } else (m.files.toVector, Vector.empty[String])
      val curOrd = cur.zipWithIndex.toMap
      val prevOrd = prev.zipWithIndex.toMap
      val d = CommitDiff(v, tsByV(v),
        added.map(n => n -> curOrd(n)),
        removed.map(n => n -> prevOrd(n)),
        m.truncate, m.op)
      prev = cur
      d
    }
  }

  /** Validate an OPTION range [from, to] against the log's retention —
    * the same loud contract [[diffRange]] enforces, factored out so
    * PLAN-LEVEL pruning can clamp the walked range without weakening
    * the user-facing contract: an out-of-history or vacuumed range is a
    * user error whether or not the optimizer pushed a narrowing
    * predicate (pruning is a work skip, never a validity change). */
  private[fimi] def validateRange(
      table: Path, from: Long, to: Long,
      hist: Seq[FimiLog.HistoryEntry]): Unit = {
    require(hist.nonEmpty, s"fimi: $table has an empty snapshot log")
    val latest = hist.last.version
    require(from >= 0 && from <= to && to <= latest,
      s"fimi: invalid change range [$from, $to] on $table " +
        s"(latest committed version: $latest)")
    val retained = hist.map(_.version).toSet
    (from to to).foreach { v =>
      require(retained.contains(v),
        s"fimi: version $v of $table is not retained (earliest " +
          s"retained: ${hist.head.version}); the change feed cannot " +
          "reconstruct vacuumed history")
    }
    if (from > 0 && !retained.contains(from - 1) &&
        hist.find(_.version == from).exists(_.truncate))
      throw new IllegalArgumentException(
        s"fimi: a change range cannot START at version $from of $table — " +
          s"it is a table-replacing commit whose removed set needs the " +
          s"version-${from - 1} listing, which was vacuumed; start at " +
          s"version ${from + 1}, or re-read the version-$from snapshot")
  }

  /** Byte-range split the diffs' touched files into read partitions
    * (same split semantics and tid-overflow guards as the batch scan:
    * `maxSplitBytes` ranges, compressed files unsplittable, loud
    * failure past the per-file 1 TiB offset range or the file-ordinal
    * range — a silent overflow would collide tids and break the
    * positional snapshot join). */
  private[fimi] def planPartitions(
      fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      table: Path,
      diffs: IterableOnce[CommitDiff],
      maxSplitBytes: Long): Array[FimiChangesPartition] = {
    val codecs = new CompressionCodecFactory(conf)
    def splits(name: String, ordinal: Int): Seq[FimiInputPartition] = {
      val p = new Path(table, name)
      val len = fs.getFileStatus(p).getLen
      require(len < (1L << FimiTable.OffsetBits),
        s"fimi changes: $p is $len bytes; tid offset range is " +
          s"${1L << FimiTable.OffsetBits} (1 TiB) per file")
      require(ordinal < (1 << (63 - FimiTable.OffsetBits)),
        s"fimi changes: file ordinal $ordinal exceeds the tid " +
          "file-ordinal range")
      val splittable = codecs.getCodec(p) == null
      FimiTable.splitRanges(splittable, len, maxSplitBytes)
        .map { case (s, l) => FimiInputPartition(p.toString, ordinal, s, l) }
    }
    val out = Array.newBuilder[FimiChangesPartition]
    diffs.iterator.foreach { d =>
      d.added.foreach { case (n, o) =>
        splits(n, o).foreach(ip =>
          out += FimiChangesPartition(ip, insert = true, d.version, d.tsMicros))
      }
      d.removed.foreach { case (n, o) =>
        splits(n, o).foreach(ip =>
          out += FimiChangesPartition(ip, insert = false, d.version, d.tsMicros))
      }
    }
    out.result()
  }

  /** Net CONTENT changes per commit: cancel each version's carryover
    * delete/insert pairs (rows of rewritten files the commit did not
    * actually change) by signed counting per (version, items), leaving
    * one row per net-changed basket content —
    * `(items, _change_type, _commit_version, n_baskets)` where
    * `n_baskets` is how many baskets of that exact content the commit
    * net-added (insert) or net-removed (delete). One hash-partitioned
    * aggregate over the (already file-pruned) raw feed; no collect, no
    * join. */
  def net(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    changes
      .withColumn("__w",
        when(col(ChangeTypeCol) === "insert", 1L).otherwise(-1L))
      .groupBy(col(VersionCol), col("items"))
      .agg(sum(col("__w")).as("__net"))
      .filter(col("__net") =!= 0L)
      .select(
        col("items"),
        when(col("__net") > 0, lit("insert")).otherwise(lit("delete"))
          .as(ChangeTypeCol),
        col(VersionCol),
        abs(col("__net")).as("n_baskets"))
  }
}

/** Column pruning plus PLAN-LEVEL pruning on the two change-metadata
  * columns: `_commit_version` bounds intersect the diff range (commits
  * outside the bound are never even diffed), and an `_change_type`
  * equality drops the whole other side's partitions (an insert-only
  * consumer reads half the bytes). Every filter is also returned as
  * residual, so Spark re-evaluates it above the scan — pruning is a
  * pure work skip, never a semantics change (the batch scan's
  * tid-range rule). Row-content predicates stay above the scan: the
  * feed's work unit is the touched file, and carryover cancellation
  * needs whole files anyway. */
class FimiChangesScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  /** The underlying table's schema at latest (evolved extras included). */
  private val tableSchema: StructType = FimiTable.schemaFor(options)
  private var requiredSchema: StructType = FimiChanges.schemaFor(tableSchema)
  private var pruneFilters: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruneFilters = filters.filter(f =>
      versionBound(f).isDefined || sideBound(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pruneFilters

  /** The impossible range: lo > hi, so planning yields zero partitions. */
  private val EmptyBound = (Long.MaxValue, Long.MinValue)

  /** [lo, hi] version bound implied by one filter, if it names
    * `_commit_version`. Strict inequalities at the Long extremes
    * saturate to the EMPTY range instead of wrapping (r18 ADVICE:
    * `v+1`/`v-1` overflow would silently widen the bound to no-prune —
    * harmless to semantics since every filter is residual, but the
    * pruning contract would quietly degrade). */
  private def versionBound(f: Filter): Option[(Long, Long)] = f match {
    case EqualTo(FimiChanges.VersionCol, v: Long) => Some((v, v))
    case GreaterThan(FimiChanges.VersionCol, v: Long) =>
      Some(if (v == Long.MaxValue) EmptyBound else (v + 1, Long.MaxValue))
    case GreaterThanOrEqual(FimiChanges.VersionCol, v: Long) => Some((v, Long.MaxValue))
    case LessThan(FimiChanges.VersionCol, v: Long) =>
      Some(if (v == Long.MinValue) EmptyBound else (Long.MinValue, v - 1))
    case LessThanOrEqual(FimiChanges.VersionCol, v: Long) => Some((Long.MinValue, v))
    case In(FimiChanges.VersionCol, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
      val ls = vs.map(_.asInstanceOf[Long]); Some((ls.min, ls.max))
    case And(l, r) =>
      (versionBound(l), versionBound(r)) match {
        case (Some((al, ah)), Some((bl, bh))) =>
          Some((math.max(al, bl), math.min(ah, bh)))
        case (a, b) => a.orElse(b)
      }
    case _ => None
  }

  /** Exact version SET implied by one filter, when derivable (EqualTo /
    * In) — lets a sparse `IN (5, 90000)` prune to exactly two commits
    * instead of diffing the whole [5, 90000] span. */
  private def versionSetOf(f: Filter): Option[Set[Long]] = f match {
    case EqualTo(FimiChanges.VersionCol, v: Long) => Some(Set(v))
    case In(FimiChanges.VersionCol, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
      Some(vs.map(_.asInstanceOf[Long]).toSet)
    case And(l, r) =>
      (versionSetOf(l), versionSetOf(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case _ => None
  }

  /** Allowed change sides (insert=true) implied by one filter, if it
    * names `_change_type`. */
  private def sideBound(f: Filter): Option[Set[Boolean]] = f match {
    case EqualTo(FimiChanges.ChangeTypeCol, v: String) => v match {
      case "insert" => Some(Set(true))
      case "delete" => Some(Set(false))
      case _ => Some(Set.empty[Boolean]) // matches neither side
    }
    case In(FimiChanges.ChangeTypeCol, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      Some(vs.map(_.asInstanceOf[String]).collect {
        case "insert" => true
        case "delete" => false
      }.toSet)
    case And(l, r) =>
      (sideBound(l), sideBound(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case _ => None
  }

  private val session = org.apache.spark.sql.SparkSession.active
  private val hadoopKVs = FimiTable.confKVs(session.sessionState.newHadoopConf())
  private val maxSplitBytes: Long =
    Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(session.sessionState.conf.filesMaxPartitionBytes)
  private val sep: String = Option(options.get("sep")).getOrElse("\\s+")

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = {
    require(options.get("versionAsOf") == null,
      s"fimi: ${FimiChanges.FromOption} and versionAsOf are mutually " +
        s"exclusive (use ${FimiChanges.ToOption} to bound the change range)")
    val dest = FimiTable.paths(options) match {
      case Seq(one) => one
      case many => throw new IllegalArgumentException(
        s"fimi: a change-feed read needs exactly one table path; got $many")
    }
    val from = (Option(options.get(FimiChanges.FromOption)),
        Option(options.get(FimiChanges.FromTsOption))) match {
      case (Some(v), None) => v.toLong
      case (None, Some(ts)) => resolveFromTimestamp(dest, ts)
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        s"fimi: ${FimiChanges.FromOption} and ${FimiChanges.FromTsOption} " +
          "are mutually exclusive")
      case (None, None) => throw new IllegalStateException(
        "fimi: change-feed scan built without a start option")
    }
    val vBound = pruneFilters.flatMap(versionBound)
      .foldLeft((Long.MinValue, Long.MaxValue)) { case ((lo, hi), (l, h)) =>
        (math.max(lo, l), math.min(hi, h))
      }
    val vSet = pruneFilters.flatMap(versionSetOf).reduceOption(_ intersect _)
    val sides = pruneFilters.flatMap(sideBound)
      .foldLeft(Set(true, false))(_ intersect _)
    new FimiChangesScan(dest, hadoopKVs, requiredSchema, maxSplitBytes, sep,
      from,
      Option(options.get(FimiChanges.ToOption)).map(_.toLong),
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      vBound, sides, vSet,
      FimiTable.extrasOf(tableSchema))
  }

  /** First version whose commit instant is at or after `ts` (epoch
    * millis or a Timestamp-parseable string), resolved through
    * [[FimiLog.versionAtOrAfter]] — the checkpointed `#ts` ledger, so
    * commits VACUUM expired still anchor the boundary exactly. When the
    * resolved start itself was vacuumed its changes are gone — refuse
    * rather than serve a silently partial feed. No commit at or after
    * the instant resolves to latest+1 (a batch read errors on the
    * empty range; a stream waits for future commits). */
  private def resolveFromTimestamp(dest: String, ts: String): Long = {
    val ms =
      try ts.toLong
      catch { case _: NumberFormatException =>
        java.sql.Timestamp.valueOf(ts).getTime }
    val table = new Path(dest)
    val fs = table.getFileSystem(FimiTable.rebuildConf(hadoopKVs))
    require(FimiLog.exists(fs, table),
      s"fimi: $dest keeps no snapshot log; the change feed reads " +
        "manifest history (write with .option(\"snapshots\", \"true\"))")
    val hist = FimiLog.history(fs, table)
    require(hist.nonEmpty, s"fimi: $dest has an empty snapshot log")
    FimiLog.versionAtOrAfter(fs, table, ms) match {
      case None => hist.last.version + 1
      case Some(v) if v >= hist.head.version => v
      case Some(v) => throw new IllegalArgumentException(
        s"fimi: ${FimiChanges.FromTsOption}=$ms resolves to version $v " +
          s"of $dest, which was vacuumed (earliest retained version: " +
          s"${hist.head.version}); pass ${FimiChanges.FromOption} with " +
          "a retained version instead")
    }
  }
}

/** One input partition of the change feed: a byte range of one touched
  * data file, tagged with the side of the diff it came from and the
  * commit it belongs to. `inner` carries the file ordinal IN THE
  * LISTING THE SIDE RESOLVES AGAINST (insert: the commit's own version;
  * delete: the previous version) so tids match snapshot reads. */
case class FimiChangesPartition(
    inner: FimiInputPartition,
    insert: Boolean,
    version: Long,
    tsMicros: Long) extends InputPartition

class FimiChangesScan(
    tablePath: String,
    hadoopKVs: Array[(String, String)],
    requiredSchema: StructType,
    maxSplitBytes: Long,
    sep: String,
    fromVersion: Long,
    toVersion: Option[Long],
    maxFilesPerTrigger: Option[Int] = None,
    versionBound: (Long, Long) = (Long.MinValue, Long.MaxValue),
    sides: Set[Boolean] = Set(true, false),
    versionSet: Option[Set[Long]] = None,
    tableExtras: Seq[StructField] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def description(): String = {
    val vb =
      if (versionBound == ((Long.MinValue, Long.MaxValue))) ""
      else s", versionBound=[${versionBound._1},${versionBound._2}]"
    val sd =
      if (sides == Set(true, false)) ""
      else s", sides=${sides.map(s => if (s) "insert" else "delete").mkString("+")}"
    s"fimi changes $tablePath, versions=[$fromVersion," +
      s"${toVersion.map(_.toString).getOrElse("latest")}]$vb$sd"
  }

  /** Streaming form: the feed as an UNBOUNDED source — each micro-batch
    * is a whole number of commits (offsets are versions), so downstream
    * per-version processing (e.g. [[FimiChanges.net]] in foreachBatch)
    * stays exact. `changesTo` has no meaning on an unbounded read;
    * bound a drain with `Trigger.AvailableNow` instead. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(toVersion.isEmpty,
      s"fimi: ${FimiChanges.ToOption} does not apply to a streaming " +
        "change feed (bound a drain with Trigger.AvailableNow)")
    new FimiChangesMicroBatchStream(tablePath, hadoopKVs, requiredSchema,
      sep, maxSplitBytes, fromVersion, maxFilesPerTrigger,
      versionBound, sides, versionSet, tableExtras)
  }

  /** Driver-side plan: fold the manifest tail once, diff each commit in
    * the range against its predecessor's listing, split the touched
    * files. Metadata cost: one log listing + cached manifest parses. */
  private lazy val partitions: Array[FimiChangesPartition] = {
    val conf = FimiTable.rebuildConf(hadoopKVs)
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    require(FimiLog.exists(fs, table),
      s"fimi: $tablePath keeps no snapshot log; the change feed reads " +
        "manifest history (write with .option(\"snapshots\", \"true\"))")
    val hist = FimiLog.history(fs, table)
    require(hist.nonEmpty, s"fimi: $tablePath has an empty snapshot log")
    val to = toVersion.getOrElse(hist.last.version)
    // the FULL option range must be valid regardless of pushed
    // predicates — a vacuumed or out-of-history range is a user error
    // whether or not the optimizer narrowed the plan (pruning is a
    // work skip, never a validity change)
    FimiChanges.validateRange(table, fromVersion, to, hist)
    // pushed _commit_version bounds intersect the option range at
    // planning: out-of-bound commits are never even diffed; an exact
    // pushed version SET prunes sparse IN lists to their members; a
    // pushed side drops the other side's partitions. An empty
    // intersection (or an impossible side set) plans zero partitions.
    val lo = math.max(fromVersion, versionBound._1)
    val hi = math.min(to, versionBound._2)
    if (lo > hi || sides.isEmpty) Array.empty[FimiChangesPartition]
    else FimiChanges.planPartitions(fs, conf, table,
      FimiChanges.diffRange(fs, table, lo, hi, hist)
        .filter(d => versionSet.forall(_.contains(d.version)))
        .map(d => d.copy(
          added = if (sides(true)) d.added else Nil,
          removed = if (sides(false)) d.removed else Nil)),
      maxSplitBytes)
  }

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new FimiChangesReaderFactory(hadoopKVs, requiredSchema, sep, tableExtras)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(partitions.map(_.inner.length).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

/** Offset = the next commit version to process (everything below it is
  * delivered). The manifest log IS the durable source of truth, so the
  * stream needs no discovery state of its own: a replayed offset range
  * re-derives the identical diff from the immutable manifests. */
case class FimiChangesOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"changesVersion":$version}"""
}

object FimiChangesOffset {
  private val Re = """\{"changesVersion":(-?\d+)\}""".r
  def fromJson(json: String): FimiChangesOffset = json.trim match {
    case Re(v) => FimiChangesOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"bad fimi changes offset: $other")
  }
}

/** STREAMING change feed: commits become micro-batches — the
  * incremental-consumption shape (`spark.readStream.format("fimi")
  * .option("changesFrom", v).load(tableDir)` → transform → sink) a
  * downstream pipeline runs instead of re-reading snapshots.
  *
  * Batches are VERSION-ALIGNED: a micro-batch is always a whole number
  * of commits, never a partial one, so per-version semantics
  * (carryover netting, ordered apply) hold within every batch.
  * Admission control maps `maxFilesPerTrigger` onto the diff's touched
  * files — versions are admitted in order until the next one would
  * exceed the cap (always at least one), and `Trigger.AvailableNow`
  * drains exactly the commits present at query start, then stops.
  * Vacuum mid-stream of not-yet-delivered versions fails loudly on the
  * next trigger (never a silent gap); retention policy must outlast
  * consumer lag, the same contract every changelog store has. */
class FimiChangesMicroBatchStream(
    tablePath: String,
    hadoopKVs: Array[(String, String)],
    requiredSchema: StructType,
    sep: String,
    maxSplitBytes: Long,
    fromVersion: Long,
    maxFilesPerTrigger: Option[Int],
    versionBound: (Long, Long) = (Long.MinValue, Long.MaxValue),
    sides: Set[Boolean] = Set(true, false),
    versionSet: Option[Set[Long]] = None,
    tableExtras: Seq[StructField] = Nil)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val conf = FimiTable.rebuildConf(hadoopKVs)
  private val table = new Path(tablePath)
  private def fs = table.getFileSystem(conf)

  // a directory with no snapshot log has no commit history to stream —
  // fail at construction, not by idling forever at latest = -1 (the
  // batch path's guard lives in its own planning and never runs here)
  require(FimiLog.exists(fs, table),
    s"fimi: $tablePath keeps no snapshot log; the change feed reads " +
      "manifest history (write with .option(\"snapshots\", \"true\"))")

  // a start far beyond the next commit is almost certainly a typo'd
  // version: the batch path fails loudly via validateRange, and an
  // idle-forever stream would mask it as an empty feed (r18 ADVICE).
  // latest+1 stays legal — subscribing one version AHEAD is the
  // tail-the-table case (Delta's startingVersion contract).
  locally {
    val latest = FimiLog.latestVersion(fs, table).getOrElse(-1L)
    require(fromVersion <= latest + 1,
      s"fimi: ${FimiChanges.FromOption}=$fromVersion is beyond the next " +
        s"commit of $tablePath (latest committed version: $latest); a " +
        "stream may subscribe at most one version ahead (latest + 1)")
  }

  override def initialOffset(): Offset = FimiChangesOffset(fromVersion)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Latest committed version when `prepareForTriggerAvailableNow` ran —
    * the drain target (commits landing after query start wait for the
    * next run). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(FimiLog.latestVersion(fs, table).getOrElse(-1L))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FimiChangesOffset].version
    val latest = availableNowTarget
      .getOrElse(FimiLog.latestVersion(fs, table).getOrElse(-1L))
    if (latest < s) return FimiChangesOffset(s)
    FimiTable.fileCap(limit) match {
      case None => FimiChangesOffset(latest + 1)
      case Some(cap) =>
        // admit whole versions in order until the next would exceed the
        // file budget; always admit at least one (progress guarantee).
        // diffRange is LAZY, so a deep backlog costs O(admitted) per
        // trigger, not O(backlog)
        var files = 0L
        var end = s
        FimiChanges.diffRange(fs, table, s, latest).takeWhile { d =>
          val c = d.added.size + d.removed.size
          val ok = end == s || files + c <= cap
          if (ok) { files += c; end = d.version + 1 }
          ok
        }.foreach(_ => ())
        FimiChangesOffset(end)
    }
  }

  /** True end of available commits, for lag reporting — capped at an
    * AvailableNow target so the engine never reports lag the run will
    * deliberately not drain, and floored at the subscription start so a
    * stream subscribed ahead of the table never reports an offset
    * behind its own committed position. */
  override def reportLatestOffset(): Offset =
    FimiChangesOffset(math.max(fromVersion,
      availableNowTarget.getOrElse(FimiLog.latestVersion(fs, table).getOrElse(-1L)) + 1))

  /** Legacy uncapped form (engines that don't do admission control). */
  override def latestOffset(): Offset =
    FimiChangesOffset(FimiLog.latestVersion(fs, table).getOrElse(-1L) + 1)

  /** OFFSETS always advance through every commit (a contiguous version
    * range is the replay contract); pushed bounds only skip the READ
    * work of out-of-bound commits inside each batch — the residual
    * filter above the scan would drop their rows anyway. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FimiChangesOffset].version
    val e = end.asInstanceOf[FimiChangesOffset].version
    if (e <= s) return Array.empty
    FimiChanges.planPartitions(fs, conf, table,
      FimiChanges.diffRange(fs, table, s, e - 1)
        .filter(d => d.version >= versionBound._1 && d.version <= versionBound._2)
        .filter(d => versionSet.forall(_.contains(d.version)))
        .map(d => d.copy(
          added = if (sides(true)) d.added else Nil,
          removed = if (sides(false)) d.removed else Nil)),
      maxSplitBytes)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FimiChangesReaderFactory(hadoopKVs, requiredSchema, sep, tableExtras)

  override def deserializeOffset(json: String): Offset =
    FimiChangesOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Wraps the batch line reader: the inner reader serves the table-side
  * subset of the pruned schema (tid, items and any evolved extras); the
  * three change columns are per-partition constants appended on the
  * driver-planned metadata. Old-generation files on the delete side
  * simply carry fewer cells — the positional prefix property null-fills
  * them exactly like a snapshot read. */
class FimiChangesReaderFactory(
    hadoopKVs: Array[(String, String)],
    requiredSchema: StructType,
    sep: String,
    tableExtras: Seq[StructField] = Nil) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[FimiChangesPartition]
    val innerSchema = StructType(requiredSchema.fields.filterNot(f =>
      FimiChanges.ChangeColNames.contains(f.name)))
    val inner = new FimiPartitionReader(
      part.inner, FimiTable.rebuildConf(hadoopKVs), innerSchema, sep, -1,
      tableExtras)
    val innerIdx = innerSchema.fieldNames.zipWithIndex.toMap
    val changeType =
      UTF8String.fromString(if (part.insert) "insert" else "delete")

    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val in = inner.get()
        val row = new GenericInternalRow(requiredSchema.length)
        var i = 0
        while (i < requiredSchema.length) {
          val f = requiredSchema.fields(i)
          f.name match {
            case FimiChanges.ChangeTypeCol => row.update(i, changeType)
            case FimiChanges.VersionCol => row.update(i, part.version)
            case FimiChanges.TimestampCol => row.update(i, part.tsMicros)
            case other => row.update(i, in.get(innerIdx(other), f.dataType))
          }
          i += 1
        }
        row
      }
      override def close(): Unit = inner.close()
    }
  }
}
