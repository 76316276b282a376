package graft.sources.fimi

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned MANIFEST LOG for fimi table directories — the minimal
  * lakehouse commit protocol the connector's exactly-once streaming
  * sink and snapshot/time-travel reads both ride on.
  *
  * Layout: `<table>/_fimi_log/<version 20-digit>.manifest`, one
  * immutable manifest per committed write. A manifest lists the data
  * file NAMES the commit added (relative to the table dir), plus
  * optional header lines: `#truncate` (this commit REPLACES the table —
  * readers drop every file from older versions) and `#epoch <id>`
  * (the streaming micro-batch epoch that produced it — the idempotence
  * key for replayed epochs, mirroring Spark's own FileStreamSink
  * metadata log, which also keys by batch id alone).
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
  * Scale posture: one manifest per commit (not per file), listed once
  * per planning on the driver; resolution is O(total committed files)
  * string work — the same envelope as any file-listing planner. A
  * 100 TB deployment would checkpoint the folded list periodically
  * (compaction); the fold is already associative, so that is an
  * incremental change, documented rather than built.
  */
object FimiLog {
  val DirName = "_fimi_log"

  def logDir(table: Path): Path = new Path(table, DirName)

  def exists(fs: FileSystem, table: Path): Boolean = fs.exists(logDir(table))

  case class Manifest(
      version: Long,
      epoch: Option[Long],
      truncate: Boolean,
      files: Seq[String])

  private val NameRe = """(\d{20})\.manifest""".r

  /** All committed manifests, version order. Temp files are hidden
    * (dot-prefixed) and never match the name pattern. */
  def manifests(fs: FileSystem, table: Path): Seq[Manifest] = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case NameRe(v) => Some((v.toLong, st.getPath))
          case _ => None
        }
      }
      .sortBy(_._1)
      .map { case (v, p) =>
        val in = fs.open(p)
        val text =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
        val (headers, files) = lines.partition(_.startsWith("#"))
        Manifest(
          version = v,
          epoch = headers.collectFirst { case h if h.startsWith("#epoch ") =>
            h.stripPrefix("#epoch ").trim.toLong },
          truncate = headers.contains("#truncate"),
          files = files)
      }
  }

  /** The file list visible at `versionAsOf` (latest when None), table-dir
    * relative, in ordinal order. Fails loudly on an unknown version —
    * a silent empty read would look like an empty table. */
  def resolve(fs: FileSystem, table: Path, versionAsOf: Option[Long]): Seq[String] = {
    val all = manifests(fs, table)
    val upTo = versionAsOf match {
      case None => all
      case Some(v) =>
        require(all.exists(_.version == v),
          s"fimi: versionAsOf=$v not in ${logDir(table)} " +
            s"(versions: ${all.map(_.version).mkString(",")})")
        all.takeWhile(_.version <= v)
    }
    upTo.foldLeft(Vector.empty[String]) { (acc, m) =>
      (if (m.truncate) Vector.empty else acc) ++ m.files
    }
  }

  def latestVersion(fs: FileSystem, table: Path): Option[Long] =
    manifests(fs, table).lastOption.map(_.version)

  /** Largest committed version whose manifest existed at or before
    * `tsMillis` — TIMESTAMP AS OF semantics. The manifest rename IS the
    * commit instant, so its modification time is the commit time; the
    * fold over versions is monotone in both version and mtime, making
    * the max well-defined. None = no version was committed yet at that
    * instant (distinct from an unknown explicit version, which fails
    * loudly in [[resolve]]). */
  def versionAt(fs: FileSystem, table: Path, tsMillis: Long): Option[Long] = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case NameRe(v) if st.getModificationTime <= tsMillis => Some(v.toLong)
          case _ => None
        }
      }
      .sorted.lastOption
  }

  def epochCommitted(fs: FileSystem, table: Path, epoch: Long): Boolean =
    manifests(fs, table).exists(_.epoch.contains(epoch))

  /** Write manifest `version` atomically (temp + rename). Returns false
    * if that version already exists (concurrent writer won the race —
    * caller picks the next version and retries). */
  def write(
      fs: FileSystem,
      table: Path,
      version: Long,
      epoch: Option[Long],
      truncate: Boolean,
      files: Seq[String]): Boolean = {
    val dir = logDir(table)
    fs.mkdirs(dir)
    val name = f"$version%020d.manifest"
    val target = new Path(dir, name)
    if (fs.exists(target)) return false
    val header =
      epoch.map(e => s"#epoch $e").toSeq ++ (if (truncate) Seq("#truncate") else Nil)
    val body = (header ++ files).mkString("", "\n", "\n")
    val tmp = new Path(dir, s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(target)) { fs.delete(tmp, false); false }
    else if (fs.rename(tmp, target)) true
    else { fs.delete(tmp, false); false }
  }
}
