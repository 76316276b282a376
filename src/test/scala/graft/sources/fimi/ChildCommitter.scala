package graft.sources.fimi

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Second-JVM contender for FimiRaceSpec: lands `n` append commits on a
  * shared fimi manifest log through the SAME protocol the engine's
  * writers run (version probe → write at next → bump on loss), from a
  * genuinely separate process — no shared JVM caches, no shared locks,
  * only the filesystem's own atomicity. Prints one summary line the
  * spec parses. */
object ChildCommitter {
  def main(args: Array[String]): Unit = {
    val table = new Path(args(0))
    val n = args(1).toInt
    val tag = args(2)
    val fs = table.getFileSystem(new Configuration())
    var wins = 0
    var losses = 0
    while (wins < n) {
      // stage the data file first (writer protocol: data lands before
      // the manifest that makes it visible), one single-item basket
      // named after the file so readers can attribute it
      val name = f"$tag-$wins%03d.dat"
      val out = fs.create(new Path(table, name), true)
      try out.write(f"$tag-$wins%03d\n".getBytes("UTF-8"))
      finally out.close()
      var v = FimiLog.latestVersion(fs, table).map(_ + 1).getOrElse(0L)
      while (!FimiLog.write(fs, table, v, None, truncate = false,
          Seq(name), op = Some("APPEND"))) {
        losses += 1
        v += 1
      }
      wins += 1
    }
    // the spec asserts on this exact line
    println(s"child-committer wins=$wins losses=$losses")
  }
}
