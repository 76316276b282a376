package graft.sources.fimi

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}

/** EXACTLY-ONCE streaming sink for the fimi connector
  * (`df.writeStream.format("fimi").start(dir)`): micro-batch epochs
  * commit through the [[FimiLog]] manifest protocol, so a replayed
  * epoch — the failure mode Structured Streaming's contract allows
  * (crash after the sink committed but before the engine checkpointed
  * its own commit marker) — is detected and dropped instead of
  * duplicating rows.
  *
  * Two-phase commit per epoch, mirroring the batch writer:
  *  1. task writers stage lines under
  *     `<dest>/.graft-streaming-e<epoch>-.../part-*.dat` — one file per
  *     task, UUID-tagged so attempts never collide;
  *  2. `commit(epoch, msgs)` first checks the manifest log: if any
  *     committed manifest already carries `#epoch <epoch>`, this is a
  *     replay — the staged files are deleted and the commit is a no-op;
  *  3. otherwise committed task files rename into the table dir
  *     (per-file-atomic) and ONE manifest listing them lands via
  *     temp+rename — the atomic commit point. A crash between steps 3's
  *     renames and the manifest leaves orphans no manifest references:
  *     manifest-aware readers (the connector auto-prefers the log —
  *     see [[FimiScan]]) never see them, and the engine replays the
  *     epoch, whose fresh commit supersedes them.
  *
  * The idempotence key is the epoch id alone — the precedent set by
  * Spark's own FileStreamSink metadata log; two concurrent queries
  * streaming into one directory are out of contract there and here.
  *
  * Scale posture: per-epoch driver work is one names-only log listing
  * + one manifest write + |tasks| renames. The replay check and the
  * next-version probe ride [[FimiLog]]'s incremental fold: manifests
  * parse once per JVM (immutable, cached) and a checkpoint lands every
  * [[FimiLog.CheckpointInterval]] epochs, so per-epoch manifest OPENS
  * are O(1) for the stream's whole lifetime and a RESTARTED driver
  * rebuilds its replay state from checkpoint + tail, not from every
  * epoch ever committed. No durable driver state beyond the log itself
  * — restart-safe by construction.
  */
class FimiStreamingWrite(
    dest: String,
    hadoopKVs: Array[(String, String)],
    itemsIdx: Int,
    cells: Seq[(String, Int, org.apache.spark.sql.types.DataType)] = Nil)
    extends StreamingWrite {

  private def conf = FimiTable.rebuildConf(hadoopKVs)
  private def destPath = new Path(dest)

  private def stagingDir(epochId: Long) =
    new Path(dest, s".graft-streaming-e$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FimiStreamingWriterFactory(dest, hadoopKVs, itemsIdx, cells)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = destPath.getFileSystem(conf)
    fs.mkdirs(destPath)
    if (FimiLog.epochCommitted(fs, destPath, epochId)) {
      // replayed epoch: the previous attempt's manifest is the truth;
      // this attempt's staged files are surplus
      fs.delete(stagingDir(epochId), true)
      return
    }
    val committed = messages.toSeq.map {
      case m: FimiCommitMessage =>
        val s = new Path(m.stagedPath)
        val target = new Path(destPath, s.getName)
        if (!fs.rename(s, target) && !fs.exists(target))
          throw new java.io.IOException(
            s"fimi streaming commit: rename $s -> $target failed")
        (s.getName, m.statsJson)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    val finalNames = committed.map(_._1)
    // manifest rename = the commit point; version race with a concurrent
    // batch writer resolves by retrying at the next version
    var v = FimiLog.latestVersion(fs, destPath).map(_ + 1).getOrElse(0L)
    while (!FimiLog.write(fs, destPath, v, Some(epochId), truncate = false,
        finalNames, op = Some("STREAMING APPEND"),
        stats = committed.collect { case (n, Some(j)) => n -> j }.toMap))
      v += 1
    // periodic checkpoint keeps cold-reader planning and restarted-driver
    // replay checks bounded however many epochs this stream ever commits
    FimiLog.maybeCheckpoint(fs, destPath)
    fs.delete(stagingDir(epochId), true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = destPath.getFileSystem(conf)
    fs.delete(stagingDir(epochId), true)
  }
}

class FimiStreamingWriterFactory(
    dest: String,
    hadoopKVs: Array[(String, String)],
    itemsIdx: Int,
    cells: Seq[(String, Int, org.apache.spark.sql.types.DataType)] = Nil)
    extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int,
      taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val tag = java.util.UUID.randomUUID().toString.replaceAll("-", "").take(8)
    val file = new Path(
      new Path(dest, s".graft-streaming-e$epochId"),
      f"part-$partitionId%05d-e$epochId-$tag.dat")
    new FimiLineWriter(file, FimiTable.rebuildConf(hadoopKVs), itemsIdx, cells)
  }
}
