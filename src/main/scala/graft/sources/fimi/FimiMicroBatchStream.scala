package graft.sources.fimi

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming micro-batch read for the `fimi` connector: new transaction
  * files landing in the directory become batches — the
  * landing-corpus ingestion shape (`spark.readStream.format("fimi")
  * .load(dir)` → miners / dedup / quality operators downstream).
  *
  * Offsets are positions in a DISCOVERY LOG: each `latestOffset` lists
  * the directory, appends unseen files (ordered by (modTime, path) for
  * determinism within a discovery batch) to the log, and persists the
  * increment under `<checkpointLocation>/graft-fimi-log/<from>-<to>`
  * before the offset is returned — so a restart rebuilds the identical
  * log (and therefore identical file→ordinal assignment) from the
  * checkpoint, and an offset the engine replays always maps to the same
  * files. A file's tid ordinal is its log position, making streaming
  * tids stable across restarts and disjoint across files, exactly like
  * the batch scan's path-sorted ordinals.
  *
  * Scale posture: discovery is one `listStatus` per trigger; per-batch
  * work is proportional to NEW files only; the log write is one small
  * rename-committed file per non-empty discovery. Readers are the batch
  * readers (byte-range semantics per whole file — a landing file is one
  * split; files larger than a split would arrive through the batch
  * path). The in-memory seen-set is one entry per file — the same
  * driver-side envelope as Spark's own FileStreamSource.
  */
class FimiMicroBatchStream(
    optionPaths: Seq[String],
    hadoopKVs: Array[(String, String)],
    requiredSchema: StructType,
    sep: String,
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None,
    ignoreChanges: Boolean = false,
    tableExtras: Seq[org.apache.spark.sql.types.StructField] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf: Configuration = FimiTable.rebuildConf(hadoopKVs)
  private val logDir = new Path(checkpointLocation, "graft-fimi-log")
  private def fs = logDir.getFileSystem(conf)

  /** Discovery log: file path per position; positions are tid ordinals. */
  private val log = mutable.ArrayBuffer.empty[String]
  private val seen = mutable.HashSet.empty[String]

  /** Durable OPTIMIZE ride-through classification (see [[discover]]):
    * `explained` = files whose disappearance from the listing is proven
    * safe compaction; `skipMarked` = compaction outputs whose content
    * the log already delivers (seen, never logged). Persisted as
    * `acct-<seq>` increments next to the discovery log, so the
    * classification survives restarts AND outlives VACUUM of the
    * optimize commits it was derived from — without it, a routine
    * vacuum after a ridden-through compaction would make the gone
    * files unexplainable forever and kill a fully caught-up stream. */
  private val explained = mutable.HashSet.empty[String]
  private val skipMarked = mutable.HashSet.empty[String]
  /** Files whose disappearance `ignoreChanges` FORGAVE as a genuine
    * data change (third acct marker, r18 ADVICE): without durably
    * recording them, `gone.diff(explained)` stays non-empty forever
    * after a ride-through and every subsequent trigger repeats the
    * full-history classification walk — breaking the documented
    * O(new manifests) per-trigger posture. */
  private val forgiven = mutable.HashSet.empty[String]
  private var acctSeq = 0
  restore()

  private def restore(): Unit = {
    if (!fs.exists(logDir)) return
    val st = fs.listStatus(logDir).map(_.getPath)
    st.filter(_.getName.matches("\\d+-\\d+"))
      .sortBy(_.getName.split("-")(0).toLong)
      .foreach { p =>
        readLines(p).foreach { f => if (seen.add(f)) log += f }
      }
    st.filter(_.getName.matches("acct-\\d+"))
      .sortBy(_.getName.stripPrefix("acct-").toLong)
      .foreach { p =>
        acctSeq = math.max(acctSeq, p.getName.stripPrefix("acct-").toLong.toInt + 1)
        readLines(p).foreach {
          case l if l.startsWith("E ") => explained += l.stripPrefix("E ")
          case l if l.startsWith("S ") =>
            val f = l.stripPrefix("S ")
            skipMarked += f
            seen += f // accounted content: never re-delivered, never logged
          case l if l.startsWith("F ") => forgiven += l.stripPrefix("F ")
          case _ => ()
        }
      }
  }

  private def readLines(p: Path): Seq[String] = {
    val in = fs.open(p)
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    content.split("\n").filter(_.nonEmpty).toSeq
  }

  /** Persist one classification increment atomically (temp + rename).
    * Durability comes BEFORE the in-memory sets advance, mirroring
    * [[persist]]. A sequence-number collision (a concurrent writer, a
    * pre-existing file from a crashed attempt) bumps `acctSeq` and
    * RETRIES at the next number instead of silently dropping the
    * increment (r18 ADVICE): re-derivation determinism only holds
    * while the source manifests still exist — once the optimize
    * commits are vacuumed, a dropped classification is unrecoverable
    * and a caught-up stream would fail permanently. */
  private[graft] def persistAcct(
      newExplained: Iterable[String],
      newSkip: Iterable[String],
      newForgiven: Iterable[String] = Nil): Unit = {
    fs.mkdirs(logDir)
    val body = (newExplained.toSeq.sorted.map("E " + _) ++
      newSkip.toSeq.sorted.map("S " + _) ++
      newForgiven.toSeq.sorted.map("F " + _)).mkString("", "\n", "\n")
    var attempts = 0
    while (true) {
      val name = s"acct-$acctSeq"
      val target = new Path(logDir, name)
      if (fs.exists(target)) { acctSeq += 1 }
      else {
        val tmp = new Path(logDir, s".$name.tmp")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        if (fs.rename(tmp, target)) { acctSeq += 1; return }
        fs.delete(tmp, false)
        // rename refused: either a racer landed this name (retry at the
        // next sequence) or the store failed — bounded so a broken
        // rename syscall cannot wedge the driver in an infinite loop
        attempts += 1
        if (!fs.exists(target) || attempts >= 64)
          throw new java.io.IOException(
            s"fimi stream: rename $tmp -> $target failed; refusing to " +
              "use an un-persisted ride-through classification")
        acctSeq += 1
      }
    }
  }

  /** Persist one log increment atomically (temp + rename): the offset
    * is only visible to the engine after its files are durable. */
  private def persist(from: Int, files: Seq[String]): Unit = {
    fs.mkdirs(logDir)
    val name = s"$from-${from + files.size}"
    val tmp = new Path(logDir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      files.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(logDir, name)
    // a same-named entry can only be a finished duplicate of this exact
    // increment (the name is the [from, to) range and entries are
    // immutable) — e.g. a crash after a previous rename; keep it
    if (fs.exists(target)) { fs.delete(tmp, false); return }
    if (!fs.rename(tmp, target))
      // the offset must NOT advance past an un-persisted increment: a
      // restart could then never rebuild the checkpointed log range
      throw new java.io.IOException(
        s"fimi stream: rename $tmp -> $target failed; refusing to " +
          "advance the offset past an un-persisted log increment")
  }

  override def initialOffset(): Offset = FimiOffset(0)

  /** ADMISSION CONTROL (`maxFilesPerTrigger` option +
    * `Trigger.AvailableNow`): discovery always advances the durable log
    * to everything available (so nothing is ever re-listed), but the
    * offset HANDED TO THE ENGINE is capped — a backfill over a
    * directory of 100k landed files proceeds as bounded micro-batches
    * instead of one giant batch, and an AvailableNow run drains exactly
    * the files present when the query started, in those same bounded
    * steps, then stops. Row/byte limits don't map onto a file-position
    * log and read as all-available (the engine's own rate tracking
    * still applies); a composite limit honors its tightest file cap. */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Files available when `prepareForTriggerAvailableNow` ran — the
    * drain target an AvailableNow run stops at (files landing after
    * query start wait for the next run). */
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(discover())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowTarget.getOrElse(discover())
    val from = start.asInstanceOf[FimiOffset].files
    val to = FimiTable.fileCap(limit) match {
      case Some(n) => math.min(avail, from + math.max(n, 1))
      case None => avail
    }
    FimiOffset(math.max(from, to))
  }

  /** True end of available data, for progress reporting — independent
    * of any per-trigger cap (but capped at an AvailableNow target, so
    * the engine never reports lag the run will deliberately not drain). */
  override def reportLatestOffset(): Offset =
    FimiOffset(availableNowTarget.getOrElse(log.size))

  /** Legacy uncapped form (engines that don't do admission control). */
  override def latestOffset(): Offset = FimiOffset(discover())

  /** Advance the discovery log to everything currently available and
    * return its size (the uncapped latest offset). */
  private def discover(): Int = {
    // Manifest-logged (snapshot / streaming-sink) directories discover
    // through the log by NAME only, in COMMIT order: one names-only
    // listing plus O(new manifests) cached-fold opens per trigger —
    // never a per-file getFileStatus (which would make every trigger
    // O(all files ever committed) on a long-lived source). Orphans from
    // failed sink attempts never enter the stream. Plain directories
    // keep modTime-ordered listing discovery (statuses are free with
    // the listing there).
    val fresh: Seq[String] = loggedDir match {
      case Some((p, f)) =>
        val current = FimiLog.resolve(f, p, None).map(n => new Path(p, n).toString)
        val gone = seen.diff(current.toSet)
        val freshAll = current.filterNot(seen.contains)
        // fast path: every vanished file is already durably explained
        // (safe compaction) or durably forgiven (an ignoreChanges
        // ride-through of a genuine data change) — no re-classification
        // walk per trigger in either steady state
        if (gone.diff(explained).diff(forgiven).isEmpty) freshAll
        else {
          // Files this stream already discovered have left the latest
          // listing — a table-replacing commit rewrote or dropped them.
          //
          // OPTIMIZE RIDE-THROUGH: compaction (`#op OPTIMIZE`) rewrites
          // bytes but preserves row content exactly (FimiCompact
          // contract, spec-proven), so an optimize commit whose removed
          // files are ALL in the discovery log is content the stream
          // already delivers from its immutable log positions (the old
          // files stay on disk until VACUUM) — its added files are
          // marked seen WITHOUT being logged, and nothing duplicates.
          // Chains (optimize of optimize output) account through the
          // walk in version order. The classification is a pure
          // function of the durable log + immutable manifests, so a
          // cold restart re-derives the identical skip set.
          //
          // Anything the walk cannot explain as safe compaction —
          // row-level DML, INSERT OVERWRITE, TRUNCATE, an optimize of
          // files this stream never discovered, or history vacuumed
          // past the stream's lag — FAILS LOUDLY with the remedy
          // (Delta's data-update detection contract): an append-only
          // stream cannot represent updates or deletes.
          val hist = FimiLog.history(f, p)
          val startV =
            if (hist.head.version == 0 || !hist.head.truncate) hist.head.version
            else hist.head.version + 1
          // accounted = content the stream delivers (or has skip-marked)
          // regardless of how manifests were since rewritten: the
          // durable log + the durable skip set — so compaction CHAINS
          // keep accounting even after VACUUM expired their early links
          var accounted = log.toSet ++ skipMarked
          val newExplained = scala.collection.mutable.Set.empty[String]
          val newSkip = scala.collection.mutable.Set.empty[String]
          if (startV <= hist.last.version)
            FimiChanges.diffRange(f, p, startV, hist.last.version).foreach { d =>
              // OPTIMIZE and OPTIMIZE ZORDER(...) both preserve row
              // content as a multiset (clustering only reorders), which
              // is exactly what the accounting needs
              if (d.truncate && d.op.exists(_.startsWith("OPTIMIZE"))) {
                val rm = d.removed.map(x => new Path(p, x._1).toString)
                val ad = d.added.map(x => new Path(p, x._1).toString)
                if (rm.forall(accounted.contains)) {
                  accounted ++= ad
                  newExplained ++= rm.filterNot(explained)
                  newSkip ++= ad.filterNot(skipMarked)
                }
              }
            }
          val unexplained = gone.diff(explained).diff(newExplained).diff(forgiven)
          // the ride-through applies BEFORE the opt-in: ignoreChanges
          // forgives only the UNEXPLAINED remainder (genuine data
          // changes) — it must never cause proven-safe compaction
          // output to re-deliver the whole table as duplicates
          if (unexplained.nonEmpty && !ignoreChanges)
            throw new IllegalStateException(
              s"fimi stream: ${unexplained.size} already-delivered file(s) " +
                s"were replaced by a table-replacing commit on $p " +
                "(row-level DML, INSERT OVERWRITE, TRUNCATE, or a " +
                "compaction the log cannot account for); an append-only " +
                "stream cannot represent updates or deletes. Stream the " +
                "CHANGE FEED instead (readStream.format(\"fimi\")" +
                ".option(\"changesFrom\", <version>)), or set " +
                ".option(\"ignoreChanges\", \"true\") to accept re-delivered " +
                "rewritten rows")
          // forgiven files persist as a third marker (r18 ADVICE):
          // without it they never leave gone.diff(explained) and every
          // later trigger would repeat this full-history walk
          val newForgiven = if (ignoreChanges) unexplained else Set.empty[String]
          if (newExplained.nonEmpty || newSkip.nonEmpty || newForgiven.nonEmpty) {
            persistAcct(newExplained, newSkip, newForgiven) // durability first
            explained ++= newExplained
            newSkip.foreach { s => skipMarked += s; seen += s }
            forgiven ++= newForgiven
          }
          freshAll.filterNot(skipMarked.contains)
        }
      case None =>
        FimiTable.resolveDataFiles(conf, optionPaths, None)
          .filterNot(st => seen.contains(st.getPath.toString))
          .sortBy(st => (st.getModificationTime, st.getPath.toString))
          .map(_.getPath.toString)
    }
    if (fresh.nonEmpty) {
      val from = log.size
      persist(from, fresh)
      fresh.foreach { f => seen.add(f); log += f }
    }
    log.size
  }

  /** The single manifest-logged source directory, if that is what this
    * stream reads (probed once — a directory does not stop being a
    * snapshot table mid-stream). */
  private lazy val loggedDir: Option[(Path, org.apache.hadoop.fs.FileSystem)] =
    optionPaths match {
      case Seq(one) =>
        val p = new Path(one)
        val f = p.getFileSystem(conf)
        if (f.exists(p) && f.getFileStatus(p).isDirectory && FimiLog.exists(f, p))
          Some((p, f))
        else None
      case _ => None
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FimiOffset].files, end.asInstanceOf[FimiOffset].files)
    require(e <= log.size,
      s"offset $e beyond the restored discovery log (${log.size}) — checkpoint log missing entries")
    (s until e).map { ord =>
      val p = new Path(log(ord))
      val len = fs.getFileStatus(p).getLen
      FimiInputPartition(log(ord), ord, 0L, len): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FimiPartitionReaderFactory(hadoopKVs, requiredSchema, sep, -1, tableExtras)

  override def deserializeOffset(json: String): Offset = FimiOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Offset = number of files in the discovery log. */
case class FimiOffset(files: Int) extends Offset {
  override def json(): String = s"""{"files":$files}"""
}

object FimiOffset {
  private val Re = """\{"files":(\d+)\}""".r
  def fromJson(json: String): FimiOffset = json.trim match {
    case Re(n) => FimiOffset(n.toInt)
    case other => throw new IllegalArgumentException(s"bad fimi offset: $other")
  }
}
