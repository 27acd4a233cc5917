package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Advisory single-writer lock for [[ShardSink]] table MAINTENANCE —
 * upgrades the documented "sequential single-writer discipline" of
 * [[ShardDelete]]/[[ShardCompact]]/[[ShardSnapshot]] from a caller
 * promise to a structural guarantee: two concurrent maintenance runs on
 * one table race the manifest read-merge-write, and the loser's publish
 * silently un-publishes the winner's shards. With the lock, the loser
 * fails LOUD before touching anything.
 *
 * Mechanics: EXCLUSIVE CREATE of `_LOCK` (fails on every filesystem
 * when the file exists — the same primitive the index meta publishes
 * use; a temp+rename would silently overwrite on RawLocalFileSystem).
 * The file carries `token\tepochMillis` (the token is the release
 * identity; the timestamp is informational — lease EXPIRY is judged by
 * the file's MTIME, which exists from the exclusive create itself, so
 * a reader landing between another writer's create and its content
 * write sees "held, identity unknown", never a breakable lock). A
 * holder that crashed leaves the file behind; a later writer breaks it
 * once the LEASE has expired (delete + one retry — two breakers racing
 * both delete idempotently, exclusive create picks the single winner). Release deletes the file
 * only if it still carries OUR token; finding someone else's token
 * means the lease expired mid-run and another writer took over — the
 * release throws so the overlap is surfaced, never silent (the work
 * already published is manifest-consistent; what is lost is the
 * single-writer guarantee for the overlap window, which the operator
 * must report).
 *
 * The lease default (10 min) bounds maintenance-run length, not data
 * size: a longer run on a huge table should pass a longer lease. The
 * lock is ADVISORY — appends via the sink keep their lock-free
 * contract (concurrent appends merge manifests by design); only the
 * copy-on-write mutators and snapshot publication take it.
 */
object ShardLock {

  val FileName = "_LOCK"

  final class LockHeldException(msg: String) extends IllegalStateException(msg)

  private def lockPath(dir: Path) = new Path(dir, FileName)

  private def readLock(fs: FileSystem, p: Path): Option[(String, Long)] =
    try {
      scala.util.Using.resource(fs.open(p)) { in =>
        val line = scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toSeq.headOption.getOrElse("")
        val tab = line.indexOf('\t')
        if (tab <= 0) None
        else Some((line.substring(0, tab), line.substring(tab + 1).toLong))
      }
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: NumberFormatException => None // torn write — treat as breakable
    }

  private def tryAcquire(fs: FileSystem, p: Path, token: String): Boolean = {
    val out = try fs.create(p, false) catch {
      case _: java.io.IOException => return false
    }
    scala.util.Using.resource(out) { o =>
      o.write(s"$token\t${System.currentTimeMillis()}\n".getBytes("UTF-8"))
    }
    true
  }

  /**
   * Run `body` holding the table's maintenance lock. Throws
   * [[LockHeldException]] (fail-fast, nothing touched) when another
   * writer holds an unexpired lock; breaks an EXPIRED lock (holder
   * crashed or exceeded its lease) with one retry.
   */
  def withLock[T](
      spark: SparkSession, path: String, leaseMs: Long = 600000L)(body: => T): T = {
    require(leaseMs > 0, s"leaseMs must be positive: $leaseMs")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val p = lockPath(dir)
    val token = UUID.randomUUID().toString
    var acquired = tryAcquire(fs, p, token)
    if (!acquired) {
      val holder = readLock(fs, p)
      // lease expiry is judged by the lock FILE's mtime, not its content:
      // a reader can land in the tiny window between another writer's
      // exclusive create and its content write — an empty/torn read must
      // mean "held, identity unknown", never "expired" (content-based
      // expiry would break a just-created live lock there). mtime exists
      // from the create itself; a vanished file means the holder released
      // — retry the acquire.
      val expired = try {
        System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > leaseMs
      } catch { case _: java.io.FileNotFoundException => true }
      if (!expired)
        throw new LockHeldException(
          s"maintenance lock on $path held by ${holder.map(_._1).getOrElse("?")} " +
            s"since ${holder.map(_._2).getOrElse(0L)} — another delete/upsert/" +
            "compact/snapshot is running; retry after it finishes (or after " +
            s"its ${leaseMs}ms lease expires if it crashed)")
      fs.delete(p, false) // break the stale lock; idempotent across racers
      acquired = tryAcquire(fs, p, token)
      if (!acquired)
        throw new LockHeldException(
          s"maintenance lock on $path re-taken while breaking a stale one — " +
            "another writer won the race; retry")
    }
    var bodyError: Throwable = null
    try body
    catch {
      // a non-local return from the body is SUCCESS, not failure — the
      // release path must still throw loud on an overlap
      case t: scala.runtime.NonLocalReturnControl[_] => throw t
      case t: Throwable => bodyError = t; throw t
    }
    finally {
      def overlap(msg: String): Unit = {
        val e = new LockHeldException(msg)
        // never mask the body's own failure — attach the overlap report
        if (bodyError != null) bodyError.addSuppressed(e) else throw e
      }
      readLock(fs, p) match {
        case Some((t, _)) if t == token => fs.delete(p, false)
        case Some((t, _)) => overlap(
          s"maintenance lock on $path now carries token $t, not ours — " +
            "our lease expired mid-run and another writer took over; " +
            "the runs overlapped (each publish is individually atomic, " +
            "but last-writer-wins applied across them — verify the table)")
        case None => overlap( // broken and released already — same report
          s"maintenance lock on $path vanished mid-run — our lease " +
            "expired and another writer's run completed; the runs " +
            "overlapped — verify the table")
      }
    }
  }
}
