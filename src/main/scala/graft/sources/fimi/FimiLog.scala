package graft.sources.fimi

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned MANIFEST LOG for fimi table directories — the minimal
  * lakehouse commit protocol the connector's exactly-once streaming
  * sink and snapshot/time-travel reads both ride on.
  *
  * Layout: `<table>/_fimi_log/<version 20-digit>.manifest`, one
  * immutable manifest per committed write. A manifest lists the data
  * file NAMES the commit added (relative to the table dir), plus
  * optional header lines: `#truncate` (this commit REPLACES the table —
  * readers drop every file from older versions), `#epoch <id>` (the
  * streaming micro-batch epoch that produced it — the idempotence key
  * for replayed epochs, mirroring Spark's own FileStreamSink metadata
  * log, which also keys by batch id alone), and `#ts <epochMillis>`
  * (the commit instant, stamped by the writer — `TIMESTAMP AS OF`
  * resolves against it, so a backup/restore/`distcp` that rewrites
  * file mtimes cannot rewrite commit history; mtime remains the
  * fallback for legacy manifests only).
  *
  * Commit protocol (both batch and streaming): task writers stage
  * files under a hidden directory, the driver renames committed task
  * files into the table dir under globally-unique names, and THEN
  * writes the manifest via temp-file + atomic rename. The manifest
  * rename is the commit point: a crash anywhere before it leaves only
  * orphan data files that no manifest references — invisible to
  * manifest-aware readers, re-added by the replayed commit, and never
  * double-counted. Snapshots are immutable: `truncate` on a snapshot
  * table keeps old generations' files on disk (older versions must
  * stay readable) and merely marks the reset in the new manifest.
  *
  * Read resolution: fold manifests in version order (optionally
  * stopping at `versionAsOf`), clearing the accumulated list at each
  * truncate marker. File ordinal = position in the resolved list,
  * which is append-only within a generation — so tids are stable for
  * the lifetime of a snapshot, exactly like the batch scan's
  * path-sorted ordinals.
  *
  * SCALE POSTURE — the fold is INCREMENTAL and CHECKPOINTED, so
  * neither per-epoch streaming commits nor per-read planning pay
  * O(all-versions-ever) file opens:
  *
  *  - Manifests are immutable once committed, so their parsed form is
  *    cached per (log dir, version) for the JVM's lifetime; every call
  *    re-LISTS the log dir (one names-only RPC — how new commits from
  *    other writers are discovered) but opens only manifests it has
  *    never parsed. A long-lived streaming driver therefore opens O(1)
  *    manifest per epoch commit, not O(epochs-so-far).
  *  - Every [[CheckpointInterval]] commits the writer lands a
  *    `<version>.checkpoint` next to the manifests: the folded file
  *    list at that version, every committed epoch id, and the
  *    version→commit-ts history. A COLD reader (fresh JVM) resolves
  *    any version from the nearest checkpoint at or below it plus the
  *    manifest tail — bounded opens regardless of table age. The fold
  *    is associative, so a checkpoint is pure derived state: losing
  *    one (or racing on writing one) never loses data.
  *  - [[vacuum]] retires history: it checkpoints the retention
  *    boundary, then deletes expired manifests, superseded
  *    checkpoints, and data files referenced ONLY by expired versions.
  *    Reads at retained versions are unaffected (their file sets are
  *    disjoint from the deleted set by construction); reads at expired
  *    versions fail loudly with the earliest retained version, never
  *    as an empty table. Orphan files no manifest ever referenced are
  *    deliberately NOT deleted — an in-flight concurrent commit stages
  *    data files before its manifest lands, and deleting them would
  *    tear that commit (Delta's retention-window rationale).
  *
  * [[contentOpens]] counts every manifest/checkpoint content read, so
  * specs assert the bounded-opens contract instead of trusting it.
  */
object FimiLog {
  val DirName = "_fimi_log"

  /** A checkpoint lands every this-many manifests (see scale posture). */
  val CheckpointInterval = 10

  def logDir(table: Path): Path = new Path(table, DirName)

  def exists(fs: FileSystem, table: Path): Boolean = fs.exists(logDir(table))

  case class Manifest(
      version: Long,
      epoch: Option[Long],
      truncate: Boolean,
      files: Seq[String],
      ts: Option[Long] = None,
      op: Option[String] = None,
      // `#schema <StructType.json>` — SCHEMA EVOLUTION: the table's full
      // logical schema FROM this version on (ALTER TABLE ADD COLUMNS
      // commits an empty manifest carrying it). Schema folds
      // independently of `#truncate`: columns only ever APPEND over a
      // table's lifetime (the positional-cell file encoding depends on
      // the prefix property), so a table-replacing commit keeps the
      // evolved schema and its new files simply carry null extras.
      schemaJson: Option[String] = None,
      // `#stats <file> <json>` — per-file CONTENT STATS for data
      // skipping (rows + per-evolved-column min/max/null-count),
      // stamped by the writer that created the file. Data files are
      // immutable, so a stats line from ANY manifest stays valid for
      // the file's lifetime; re-listing commits (DML truncates,
      // OPTIMIZE) need not repeat survivors' stats.
      stats: Map[String, String] = Map.empty)

  /** Folded log state at `version`: the resolved file list, every epoch
    * id committed at or below it, the version→commit-ts history, and
    * the earliest version [[vacuum]] has retained (0 = full history). */
  case class Checkpoint(
      version: Long,
      epochs: Set[Long],
      vts: Map[Long, Long],
      minRetained: Long,
      files: Seq[String],
      schemaJson: Option[String] = None,
      stats: Map[String, String] = Map.empty)

  private val NameRe = """(\d{20})\.manifest""".r
  private val CkptRe = """(\d{20})\.checkpoint""".r

  /** Total manifest+checkpoint CONTENT reads since JVM start — the
    * bounded-opens contract's measurable side (specs assert deltas). */
  private[fimi] val contentOpens = new AtomicLong(0L)

  // Manifests are immutable once committed, so parsed forms cache for
  // the JVM lifetime. The key carries the file's (mtime, length) from
  // the listing — NOT just the version — because a table dir can be
  // deleted and recreated at the same path (the engine's own work-table
  // queries do exactly that every call), and a version-only key would
  // serve the PREVIOUS incarnation's parse. Same guard covers vacuum's
  // checkpoint refresh (delete-then-rename = new identity).
  private val manifestCache = TrieMap.empty[(String, Long, Long, Long), Manifest]
  private val checkpointCache = TrieMap.empty[(String, Long, Long, Long), Checkpoint]

  /** Test hook: forget every parsed manifest/checkpoint, simulating a
    * cold driver JVM (the listing itself is never cached). */
  private[graft] def clearCache(): Unit = {
    manifestCache.clear()
    checkpointCache.clear()
  }

  /** One names-only listing of the log dir: manifest and checkpoint
    * versions (sorted) plus each file's (mtime, length) identity — the
    * cache key component and the legacy `#ts` mtime fallback, both free
    * with the listing. */
  private case class Listing(
      versions: Vector[Long],
      checkpoints: Vector[Long],
      manifestMeta: Map[Long, (Long, Long)],
      checkpointMeta: Map[Long, (Long, Long)]) {
    def mtime(v: Long): Long = manifestMeta(v)._1
  }

  private def list(fs: FileSystem, table: Path): Listing = {
    val dir = logDir(table)
    if (!fs.exists(dir))
      return Listing(Vector.empty, Vector.empty, Map.empty, Map.empty)
    val vs = Vector.newBuilder[Long]
    val cs = Vector.newBuilder[Long]
    val mm = Map.newBuilder[Long, (Long, Long)]
    val cm = Map.newBuilder[Long, (Long, Long)]
    fs.listStatus(dir).foreach { st =>
      st.getPath.getName match {
        case NameRe(v) =>
          vs += v.toLong
          mm += (v.toLong -> ((st.getModificationTime, st.getLen)))
        case CkptRe(v) =>
          cs += v.toLong
          cm += (v.toLong -> ((st.getModificationTime, st.getLen)))
        case _ => ()
      }
    }
    Listing(vs.result().sorted, cs.result().sorted, mm.result(), cm.result())
  }

  private def readAll(fs: FileSystem, p: Path): String = {
    contentOpens.incrementAndGet()
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def manifest(
      fs: FileSystem, table: Path, l: Listing, version: Long): Manifest = {
    val dir = logDir(table)
    val (mt, len) = l.manifestMeta(version)
    manifestCache.getOrElseUpdate((dir.toString, version, mt, len), {
      val text = readAll(fs, new Path(dir, f"$version%020d.manifest"))
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val (headers, files) = lines.partition(_.startsWith("#"))
      Manifest(
        version = version,
        epoch = headers.collectFirst { case h if h.startsWith("#epoch ") =>
          h.stripPrefix("#epoch ").trim.toLong },
        truncate = headers.contains("#truncate"),
        files = files,
        ts = headers.collectFirst { case h if h.startsWith("#ts ") =>
          h.stripPrefix("#ts ").trim.toLong },
        op = headers.collectFirst { case h if h.startsWith("#op ") =>
          h.stripPrefix("#op ").trim },
        schemaJson = headers.collectFirst { case h if h.startsWith("#schema ") =>
          h.stripPrefix("#schema ").trim },
        stats = headers.collect { case h if h.startsWith("#stats ") =>
          val Array(n, j) = h.stripPrefix("#stats ").split(" ", 2)
          n -> j }.toMap)
    })
  }

  private def checkpoint(
      fs: FileSystem, table: Path, l: Listing, version: Long): Checkpoint = {
    val dir = logDir(table)
    val (mt, len) = l.checkpointMeta(version)
    checkpointCache.getOrElseUpdate((dir.toString, version, mt, len), {
      val text = readAll(fs, new Path(dir, f"$version%020d.checkpoint"))
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val (headers, files) = lines.partition(_.startsWith("#"))
      Checkpoint(
        version = version,
        epochs = headers.collect { case h if h.startsWith("#epoch ") =>
          h.stripPrefix("#epoch ").trim.toLong }.toSet,
        vts = headers.collect { case h if h.startsWith("#vts ") =>
          val Array(v, t) = h.stripPrefix("#vts ").trim.split(":", 2)
          v.toLong -> t.toLong }.toMap,
        minRetained = headers.collectFirst { case h if h.startsWith("#minretained ") =>
          h.stripPrefix("#minretained ").trim.toLong }.getOrElse(0L),
        files = files,
        schemaJson = headers.collectFirst { case h if h.startsWith("#schemajson ") =>
          h.stripPrefix("#schemajson ").trim },
        stats = headers.collect { case h if h.startsWith("#fstats ") =>
          val Array(n, j) = h.stripPrefix("#fstats ").split(" ", 2)
          n -> j }.toMap)
    })
  }

  /** All committed manifests, version order. Warm JVM: zero content
    * opens beyond never-seen versions. */
  def manifests(fs: FileSystem, table: Path): Seq[Manifest] =
    { val l = list(fs, table); l.versions.map(manifest(fs, table, l, _)) }

  /** Largest checkpoint version ≤ `target` in `l`, if any. */
  private def ckptAtOrBelow(l: Listing, target: Long): Option[Long] =
    l.checkpoints.takeWhile(_ <= target).lastOption

  /** The file list visible at `versionAsOf` (latest when None), table-dir
    * relative, in ordinal order. Fails loudly on an unknown version —
    * a silent empty read would look like an empty table — and names the
    * earliest retained version when the requested one was vacuumed. */
  def resolve(fs: FileSystem, table: Path, versionAsOf: Option[Long]): Seq[String] = {
    val l = list(fs, table)
    val target = versionAsOf match {
      case Some(v) =>
        if (!l.versions.contains(v)) failUnknown(fs, table, l, v)
        v
      case None =>
        if (l.versions.isEmpty) return Seq.empty
        l.versions.last
    }
    val (base, from) = ckptAtOrBelow(l, target) match {
      case Some(cv) => (checkpoint(fs, table, l, cv).files.toVector, cv)
      case None =>
        // no checkpoint at or below target: the fold must start at the
        // true version 0 — a listing whose smallest version is later
        // means history below it was vacuumed without a usable
        // checkpoint (unreachable through this object's own vacuum,
        // which always checkpoints the boundary first)
        require(l.versions.head == 0L,
          s"fimi: cannot resolve version $target of $table — manifests " +
            s"before version ${l.versions.head} are gone and no checkpoint " +
            "covers the gap")
        (Vector.empty[String], -1L)
    }
    l.versions.filter(v => v > from && v <= target)
      .foldLeft(base) { (acc, v) =>
        val m = manifest(fs, table, l, v)
        (if (m.truncate) Vector.empty else acc) ++ m.files
      }
  }

  private def failUnknown(
      fs: FileSystem, table: Path, l: Listing, v: Long): Nothing = {
    // distinguish "never existed" from "existed, vacuumed": the latest
    // checkpoint's vts history knows every version ever committed
    val knownExpired = l.checkpoints.lastOption.exists { cv =>
      val c = checkpoint(fs, table, l, cv)
      c.vts.contains(v) && v < earliestRetained(l)
    }
    if (knownExpired)
      throw new IllegalArgumentException(
        s"fimi: version $v of $table was vacuumed; earliest retained " +
          s"version is ${earliestRetained(l)}")
    throw new IllegalArgumentException(
      s"fimi: versionAsOf=$v not in ${logDir(table)} " +
        s"(versions: ${l.versions.mkString(",")})")
  }

  private def earliestRetained(l: Listing): Long =
    l.versions.headOption.getOrElse(0L)

  def latestVersion(fs: FileSystem, table: Path): Option[Long] =
    list(fs, table).versions.lastOption

  /** The table's full schema JSON visible at `versionAsOf` (latest when
    * None): the newest `#schema` header at or below the target, resolved
    * from the nearest checkpoint's folded schema plus the manifest tail
    * — bounded opens, like every other fold. None = the table never
    * evolved (the connector's base schema applies). An unknown target
    * version resolves leniently to the fold at or below it: callers
    * needing loud unknown-version failure go through [[resolve]], which
    * every scan already does. */
  def schemaAt(fs: FileSystem, table: Path, versionAsOf: Option[Long]): Option[String] = {
    val l = list(fs, table)
    if (l.versions.isEmpty) return None
    val target = versionAsOf.getOrElse(l.versions.last)
    val (seed, from) = ckptAtOrBelow(l, target) match {
      case Some(cv) => (checkpoint(fs, table, l, cv).schemaJson, cv)
      case None => (None, -1L)
    }
    l.versions.filter(v => v > from && v <= target)
      .foldLeft(seed) { (acc, v) =>
        manifest(fs, table, l, v).schemaJson.orElse(acc)
      }
  }

  /** PROVENANCE over the retained manifests: the first retained version
    * listing each file, and the first retained version whose committed
    * schema contains each column — the shared inputs of the all-null
    * inference (a file listed before a column existed is provably null
    * for it; see FimiStats) and the `files` metadata relation. One pass
    * over cached manifest parses; vacuumed history simply starts the
    * walk at the earliest retained manifest (callers treat a missing
    * entry conservatively). */
  case class Provenance(fileFirst: Map[String, Long], colAdded: Map[String, Long])

  def provenance(fs: FileSystem, table: Path): Provenance = {
    var colAdded = Map.empty[String, Long]
    var fileFirst = Map.empty[String, Long]
    manifests(fs, table).foreach { m =>
      m.schemaJson.foreach { j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.foreach { f =>
            if (!colAdded.contains(f)) colAdded += f -> m.version
          }
      }
      m.files.foreach { n =>
        if (!fileFirst.contains(n)) fileFirst += n -> m.version
      }
    }
    Provenance(fileFirst, colAdded)
  }

  /** Per-file content-stats JSON visible at `versionAsOf` (latest when
    * None): the union of every retained manifest's `#stats` lines up to
    * the target, seeded from the nearest checkpoint's folded stats —
    * bounded opens. Files without an entry (legacy writers, adopted
    * native files) simply have no stats and are never pruned. */
  def statsAt(
      fs: FileSystem, table: Path, versionAsOf: Option[Long]): Map[String, String] = {
    val l = list(fs, table)
    if (l.versions.isEmpty) return Map.empty
    val target = versionAsOf.getOrElse(l.versions.last)
    val (seed, from) = ckptAtOrBelow(l, target) match {
      case Some(cv) => (checkpoint(fs, table, l, cv).stats, cv)
      case None => (Map.empty[String, String], -1L)
    }
    l.versions.filter(v => v > from && v <= target)
      .foldLeft(seed) { (acc, v) => acc ++ manifest(fs, table, l, v).stats }
  }

  /** One snapshot-history row per RETAINED commit (vacuum deletes
    * expired manifests, so history spans what is still readable). */
  case class HistoryEntry(
      version: Long,
      tsMillis: Long,
      operation: String,
      truncate: Boolean,
      epoch: Option[Long],
      fileCount: Int)

  /** The table's commit history, version order: commit instant (`#ts`,
    * mtime fallback for legacy manifests), operation (`#op`, derived
    * from the manifest shape for legacy manifests: epoch ⇒ STREAMING
    * APPEND, truncate ⇒ OVERWRITE, else APPEND), the truncate flag,
    * the streaming epoch if any, and the manifest's file-listing size
    * (files ADDED for an append manifest; the generation's FULL listing
    * for a truncate manifest — the `truncate` column disambiguates).
    * Warm JVM: zero content opens beyond never-seen manifests (the
    * same immutability cache every read rides). */
  def history(fs: FileSystem, table: Path): Seq[HistoryEntry] = {
    val l = list(fs, table)
    l.versions.map { v =>
      val m = manifest(fs, table, l, v)
      HistoryEntry(
        version = v,
        tsMillis = m.ts.getOrElse(l.mtime(v)),
        operation = m.op.getOrElse(
          if (m.epoch.isDefined) "STREAMING APPEND"
          else if (m.truncate) "OVERWRITE"
          else "APPEND"),
        truncate = m.truncate,
        epoch = m.epoch,
        fileCount = m.files.size)
    }
  }

  /** Commit instant of `version`: the `#ts` header stamped at commit,
    * falling back to manifest mtime for legacy manifests (pre-`#ts`). */
  private def commitTs(
      fs: FileSystem, table: Path, l: Listing, version: Long): Long =
    manifest(fs, table, l, version).ts.getOrElse(l.mtime(version))

  /** Largest committed version whose commit instant is at or before
    * `tsMillis` — TIMESTAMP AS OF semantics. Resolution uses the `#ts`
    * header each commit stamps into its manifest (so copied/restored
    * log dirs keep their history; mtime is only the legacy fallback).
    * None = no version was committed yet at that instant. Fails loudly
    * when the matching version exists in the checkpointed history but
    * was vacuumed — never silently resolves to a later snapshot. */
  def versionAt(fs: FileSystem, table: Path, tsMillis: Long): Option[Long] = {
    val l = list(fs, table)
    // the latest checkpoint's vts history answers for every version at
    // or below it without opening those manifests (a cold reader's
    // fast path); only the tail pays a (cached) manifest parse
    val hist: Map[Long, Long] =
      l.checkpoints.lastOption.map(checkpoint(fs, table, l, _).vts).getOrElse(Map.empty)
    def at(v: Long): Long = hist.getOrElse(v, commitTs(fs, table, l, v))
    val live = l.versions.filter(at(_) <= tsMillis)
    if (live.nonEmpty) return Some(live.max)
    // nothing live matches: the true match may have been vacuumed —
    // consult the checkpointed ts history before declaring "too early"
    val expired = hist.collect { case (v, t) if t <= tsMillis => v }
    if (expired.nonEmpty)
      throw new IllegalArgumentException(
        s"fimi: timestamp $tsMillis ms resolves to version " +
          s"${expired.max} of $table, which was vacuumed; earliest " +
          s"retained version is ${earliestRetained(l)}")
    None
  }

  /** Smallest committed version whose commit instant is at or after
    * `tsMillis` — the change feed's starting-timestamp resolution. Uses
    * the checkpointed version→ts history plus the retained manifest
    * tail, so commits VACUUM expired still anchor the boundary exactly
    * (the same ledger [[versionAt]] reads). None = every known commit
    * is strictly earlier. The returned version may itself be expired —
    * callers that need its data must check retention. */
  def versionAtOrAfter(fs: FileSystem, table: Path, tsMillis: Long): Option[Long] = {
    val l = list(fs, table)
    if (l.versions.isEmpty) return None
    val hist: Map[Long, Long] =
      l.checkpoints.lastOption.map(checkpoint(fs, table, l, _).vts).getOrElse(Map.empty)
    (hist.keySet ++ l.versions).toSeq.sorted.iterator
      .map(v => v -> hist.getOrElse(v, commitTs(fs, table, l, v)))
      .collectFirst { case (v, t) if t >= tsMillis => v }
  }

  /** Every epoch id any committed manifest carries — checkpoint + tail,
    * so a streaming driver's replay check opens O(new manifests). */
  def epochCommitted(fs: FileSystem, table: Path, epoch: Long): Boolean = {
    val l = list(fs, table)
    if (l.versions.isEmpty) return false
    ckptAtOrBelow(l, l.versions.last) match {
      case Some(cv) =>
        checkpoint(fs, table, l, cv).epochs.contains(epoch) ||
          l.versions.filter(_ > cv)
            .exists(manifest(fs, table, l, _).epoch.contains(epoch))
      case None =>
        l.versions.exists(manifest(fs, table, l, _).epoch.contains(epoch))
    }
  }

  /** Write manifest `version` atomically (temp + rename), stamping the
    * commit instant as a `#ts` header and (when given) the committing
    * OPERATION as a `#op` header — the verb `history` surfaces
    * (CREATE TABLE / APPEND / OVERWRITE / DELETE / UPDATE / MERGE /
    * OPTIMIZE / STREAMING APPEND). Returns false if that version
    * already exists (concurrent writer won the race — caller picks the
    * next version and retries). */
  def write(
      fs: FileSystem,
      table: Path,
      version: Long,
      epoch: Option[Long],
      truncate: Boolean,
      files: Seq[String],
      op: Option[String] = None,
      schemaJson: Option[String] = None,
      stats: Map[String, String] = Map.empty): Boolean = {
    val dir = logDir(table)
    fs.mkdirs(dir)
    val name = f"$version%020d.manifest"
    val target = new Path(dir, name)
    if (fs.exists(target)) return false
    val header =
      Seq(s"#ts ${System.currentTimeMillis()}") ++
        epoch.map(e => s"#epoch $e").toSeq ++
        (if (truncate) Seq("#truncate") else Nil) ++
        op.map(o => s"#op $o").toSeq ++
        schemaJson.map(j => s"#schema $j").toSeq ++
        stats.toSeq.sortBy(_._1).map { case (n, j) => s"#stats $n $j" }
    val body = (header ++ files).mkString("", "\n", "\n")
    val tmp = new Path(dir, s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(target)) { fs.delete(tmp, false); false }
    else if (commitExclusive(fs, tmp, target)) true
    else { fs.delete(tmp, false); false }
  }

  /** Atomically publish `tmp` as `target`, FAILING if target exists —
    * the one-winner-per-version guarantee, across PROCESSES. On
    * HDFS-like stores `rename` already has refuse-if-target-exists
    * semantics. On the LOCAL filesystem it does not: POSIX rename(2)
    * silently REPLACES an existing target, so two JVMs racing the same
    * version through exists-then-rename could lose the first writer's
    * manifest in the window between the check and the rename. There,
    * link(2) (`Files.createLink`) is the atomic exclusive publish: it
    * fails with EEXIST if the target appeared meanwhile, and the linked
    * content is the fully-written temp file, so readers never see a
    * torn manifest. Two-process contention is spec-gated in
    * FimiRaceSpec. */
  private def commitExclusive(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    // getUri.getScheme, not getScheme: the FileSystem base class's
    // getScheme THROWS UnsupportedOperationException (only overriders
    // have it), and an exception here would fail every commit on such
    // filesystems where plain rename worked
    val local = fs.getUri != null && fs.getUri.getScheme == "file"
    // degraded fallback for local filesystems whose link(2) is
    // unavailable/denied: EXACTLY the pre-link protocol (fresh
    // exists-check immediately before the rename) — the clobber window
    // shrinks back to the pre-change size, never wider, and a broken
    // link syscall cannot wedge the writer into an infinite
    // bump-version loop
    def renameFallback(): Boolean =
      if (fs.exists(target)) false else fs.rename(tmp, target)
    if (local) {
      val t = new java.io.File(target.toUri.getPath).toPath
      val s = new java.io.File(tmp.toUri.getPath).toPath
      try {
        java.nio.file.Files.createLink(t, s)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException => renameFallback()
        case _: java.io.IOException =>
          // EEXIST surfaces as FileAlreadyExists above; any other IO
          // error is NOT a lost race — report the race only if the
          // target actually appeared
          if (fs.exists(target)) false else renameFallback()
      }
    } else fs.rename(tmp, target)
  }

  /** Fold the full checkpoint state at `version` from the nearest
    * older checkpoint plus the manifest tail. */
  private def foldState(
      fs: FileSystem, table: Path, l: Listing, version: Long): Checkpoint = {
    val seed = ckptAtOrBelow(l, version).map(checkpoint(fs, table, l, _))
      .getOrElse(Checkpoint(-1L, Set.empty, Map.empty, 0L, Vector.empty))
    l.versions.filter(v => v > seed.version && v <= version)
      .foldLeft(seed) { (st, v) =>
        val m = manifest(fs, table, l, v)
        Checkpoint(
          version = v,
          epochs = st.epochs ++ m.epoch,
          vts = st.vts + (v -> commitTs(fs, table, l, v)),
          minRetained = st.minRetained,
          files = (if (m.truncate) Vector.empty else st.files.toVector) ++ m.files,
          schemaJson = m.schemaJson.orElse(st.schemaJson),
          stats = st.stats ++ m.stats)
      }
  }

  /** Atomically land (or refresh — vacuum raises minRetained) the
    * checkpoint file for `state`. Delete-then-rename: a reader in the
    * gap falls back to the manifests, which are still present. */
  private def writeCheckpoint(
      fs: FileSystem, table: Path, state: Checkpoint): Unit = {
    val dir = logDir(table)
    val name = f"${state.version}%020d.checkpoint"
    // stats prune to the checkpoint's own file list: entries for files
    // no retained version serves would otherwise accumulate forever
    val liveStats = {
      val live = state.files.toSet
      state.stats.filter { case (n, _) => live.contains(n) }
    }
    val header =
      state.epochs.toSeq.sorted.map(e => s"#epoch $e") ++
        state.vts.toSeq.sortBy(_._1).map { case (v, t) => s"#vts $v:$t" } ++
        Seq(s"#minretained ${state.minRetained}") ++
        state.schemaJson.map(j => s"#schemajson $j").toSeq ++
        liveStats.toSeq.sortBy(_._1).map { case (n, j) => s"#fstats $n $j" }
    val body = (header ++ state.files).mkString("", "\n", "\n")
    val tmp = new Path(dir, s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, name)
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) fs.delete(tmp, false)
    // no cache put: the next read keys on the fresh file's (mtime, len)
  }

  /** Called by writers after a successful commit: land a checkpoint if
    * [[CheckpointInterval]] manifests accumulated since the last one.
    * Cost when not due: the listing the caller's commit already paid,
    * amortized zero opens (the fold reads only cached manifests). */
  def maybeCheckpoint(fs: FileSystem, table: Path): Unit = {
    val l = list(fs, table)
    if (l.versions.isEmpty) return
    val latest = l.versions.last
    val since = ckptAtOrBelow(l, latest) match {
      case Some(cv) => l.versions.count(v => v > cv)
      case None => l.versions.size
    }
    if (since >= CheckpointInterval)
      writeCheckpoint(fs, table, foldState(fs, table, l, latest))
  }

  case class VacuumStats(
      retainedFrom: Long,
      dataFilesDeleted: Int,
      manifestsDeleted: Int,
      checkpointsDeleted: Int)

  /** Retire history: keep the newest `retainLast` versions readable,
    * delete everything only the expired versions referenced.
    *
    * Order of operations makes every step crash-safe for concurrent
    * readers at retained versions:
    *  1. checkpoint the retention boundary (so resolving it never
    *     needs the manifests about to be deleted) with `minRetained`
    *     raised — expired reads now fail loudly with the boundary;
    *  2. delete expired manifests and superseded checkpoints;
    *  3. delete data files referenced by expired versions but by NO
    *     retained version. Files never referenced by any manifest are
    *     left alone — they may belong to an in-flight commit.
    * A reader pinned at a retained version sees an identical file set
    * throughout; a reader at an expired version fails with the
    * earliest retained version, never an empty table. */
  def vacuum(fs: FileSystem, table: Path, retainLast: Int): VacuumStats = {
    require(retainLast >= 1, s"vacuum: retainLast must be >= 1, got $retainLast")
    val l = list(fs, table)
    if (l.versions.size <= retainLast)
      return VacuumStats(l.versions.headOption.getOrElse(0L), 0, 0, 0)
    val boundary = l.versions(l.versions.size - retainLast)
    // 1. boundary checkpoint (forced, minRetained raised)
    writeCheckpoint(fs, table,
      foldState(fs, table, l, boundary).copy(minRetained = boundary))
    // union of every retained version's visible files — the keep set
    val retained = l.versions.filter(_ >= boundary)
    val keep = retained.foldLeft(Set.empty[String]) { (acc, v) =>
      val m = manifest(fs, table, l, v)
      if (v == boundary) acc ++ resolve(fs, table, Some(boundary))
      else acc ++ m.files
    }
    // files referenced by SOME expired version (and no retained one)
    val expired = l.versions.filter(_ < boundary)
    val dead = expired.foldLeft(Set.empty[String]) { (acc, v) =>
      acc ++ manifest(fs, table, l, v).files
    } -- keep
    val dir = logDir(table)
    // 2. expired manifests + superseded checkpoints
    expired.foreach { v =>
      fs.delete(new Path(dir, f"$v%020d.manifest"), false)
      manifestCache.keys.filter(k => k._1 == dir.toString && k._2 == v)
        .foreach(manifestCache.remove)
    }
    val oldCkpts = l.checkpoints.filter(_ < boundary)
    oldCkpts.foreach { v =>
      fs.delete(new Path(dir, f"$v%020d.checkpoint"), false)
      checkpointCache.keys.filter(k => k._1 == dir.toString && k._2 == v)
        .foreach(checkpointCache.remove)
    }
    // 3. dead data files
    dead.foreach(n => fs.delete(new Path(table, n), false))
    VacuumStats(boundary, dead.size, expired.size, oldCkpts.size)
  }
}
