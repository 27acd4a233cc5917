package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Advisory single-writer lock for [[ShardSink]] table writes — upgrades
 * the documented "sequential single-writer discipline" of
 * [[ShardDelete]]/[[ShardCompact]]/[[ShardSnapshot]] AND the sink's own
 * job-level commit from a caller promise to a structural guarantee: two
 * concurrent manifest writers on one table race the read-merge-write,
 * and the loser's publish silently un-publishes the winner's shards.
 * With the lock, the loser fails LOUD before touching anything. The
 * sink's commit taking the lock also closes the vacuum-vs-append race:
 * an append's rename-then-manifest window can never interleave with a
 * [[ShardSnapshot.vacuum]] listing, because both hold the same lock.
 * (Task-level writes need no lock — they live under `_staging-*`, which
 * no maintenance pass touches.)
 *
 * Mechanics: EXCLUSIVE CREATE of `_LOCK` (fails on every filesystem
 * when the file exists — the same primitive the index meta publishes
 * use; a temp+rename would silently overwrite on RawLocalFileSystem).
 * The file carries `token\tepochMillis` (the token is the release
 * identity; the timestamp is informational — lease EXPIRY is judged by
 * the file's MTIME, which exists from the exclusive create itself, so
 * a reader landing between another writer's create and its content
 * write sees "held, identity unknown", never a breakable lock). While
 * the body runs, a HEARTBEAT daemon refreshes the lock file's mtime
 * every leaseMs/3, so lease expiry genuinely means a CRASHED holder —
 * a long-running maintenance pass on a huge table keeps its lock for
 * as long as it is alive, not for as long as the lease guessed.
 *
 * Breaking a stale lock is ATOMIC via rename: the breaker renames
 * `_LOCK` to a breaker-unique name — of N racing breakers exactly one
 * rename succeeds — then re-checks the renamed file's mtime. Finding it
 * FRESH means the rename stole a live lock that another breaker had
 * just re-created in the check-to-rename window; the breaker restores
 * it (rename back, mtime preserved) and fails loud instead of
 * acquiring. (Residual three-writer corner: if a third writer created a
 * new `_LOCK` before the restore, the restore fails, the stolen file is
 * dropped, and the robbed holder's RELEASE throws the overlap report —
 * degraded to loud detection, never to silent concurrent mutation.)
 *
 * Release deletes the file only if it still carries OUR token; finding
 * someone else's token means the lease expired mid-run (heartbeat died
 * or the process stalled past the lease) and another writer took over —
 * the release throws so the overlap is surfaced, never silent.
 */
object ShardLock {

  val FileName = "_LOCK"

  /** Default lease. Thanks to the heartbeat this bounds crash DETECTION
    * latency, not run length — pass a longer lease only to tolerate
    * longer heartbeat gaps (GC pauses, slow object stores). */
  val DefaultLeaseMs = 600000L

  /** `retryable` distinguishes the two failure classes: an ACQUIRE
    * failure (someone else is running — waiting and retrying is sound,
    * and the sink's commit does exactly that for mergeable appends)
    * from a RELEASE overlap report (our lease expired mid-run and
    * another writer's run interleaved — retrying would re-publish over
    * a table whose state we can no longer vouch for; stay loud). */
  final class LockHeldException(msg: String, val retryable: Boolean = false)
      extends IllegalStateException(msg)

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

  /** Per-path in-JVM acquire guard: `create(overwrite = false)` is
    * atomic on HDFS and precondition-capable object stores (the
    * deployment targets), but on the LOCAL filesystem it is
    * check-then-act — two threads of ONE process can both pass the
    * exists check and both believe they hold the lock (observed as a
    * double-held commit under a loaded full-suite run: both bootstrap
    * `_SCHEMA`, one collides, the other reports a release overlap).
    * Same-process racers — exactly the local-mode case — serialize
    * here; cross-process atomicity stays the filesystem's contract. */
  private val acquireGuards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def acquireGuard(p: Path): Object =
    acquireGuards.computeIfAbsent(p.toString, _ => new Object)

  private def tryAcquire(fs: FileSystem, p: Path, token: String): Boolean = {
    val out = try fs.create(p, false) catch {
      case _: java.io.IOException => return false
    }
    // a token write that fails midway must not leave a token-less _LOCK
    // behind: its creator could never release it (readLock sees no
    // token), and every other writer would wait out the full lease
    try {
      scala.util.Using.resource(out) { o =>
        o.write(s"$token\t${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      }
    } catch {
      case t: Throwable =>
        try fs.delete(p, false) catch { case _: Throwable => () }
        throw t
    }
    true
  }

  private def mtimeExpired(fs: FileSystem, p: Path, leaseMs: Long): Boolean =
    try {
      System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > leaseMs
    } catch { case _: java.io.FileNotFoundException => true }

  /**
   * Run `body` holding the table's write lock. Throws
   * [[LockHeldException]] (fail-fast, nothing touched) when another
   * writer holds an unexpired lock; breaks an EXPIRED lock (holder
   * crashed) atomically via rename, with one acquire retry.
   */
  def withLock[T](
      spark: SparkSession, path: String,
      leaseMs: Long = DefaultLeaseMs)(body: => T): T = {
    val dir = new Path(path)
    withLock(dir.getFileSystem(spark.sessionState.newHadoopConf()),
      path, leaseMs)(body)
  }

  /** Same contract, for callers that already hold a FileSystem (the
    * sink's job commit runs on the driver with its serialized conf). */
  def withLock[T](
      fs: FileSystem, path: String, leaseMs: Long)(body: => T): T = {
    require(leaseMs > 0, s"leaseMs must be positive: $leaseMs")
    val dir = new Path(path)
    val p = lockPath(dir)
    val token = UUID.randomUUID().toString
    // the whole acquire-or-break sequence runs under the per-path
    // in-JVM guard (see [[acquireGuard]]); the BODY runs outside it
    val acquired = acquireGuard(p).synchronized {
    var ok = tryAcquire(fs, p, token)
    if (!ok) {
      val holder = readLock(fs, p)
      // lease expiry is judged by the lock FILE's mtime, not its content:
      // a reader can land in the tiny window between another writer's
      // exclusive create and its content write — an empty/torn read must
      // mean "held, identity unknown", never "expired" (content-based
      // expiry would break a just-created live lock there). mtime exists
      // from the create itself; a vanished file means the holder released
      // — retry the acquire.
      if (!mtimeExpired(fs, p, leaseMs))
        throw new LockHeldException(
          s"maintenance lock on $path held by ${holder.map(_._1).getOrElse("?")} " +
            s"since ${holder.map(_._2).getOrElse(0L)} — another writer is " +
            "running; retry after it finishes (or after its " +
            s"${leaseMs}ms lease expires if it crashed)", retryable = true)
      // ATOMIC break: rename the stale lock to a breaker-unique name.
      // Exactly one racing breaker's rename succeeds; a plain delete here
      // could remove ANOTHER breaker's freshly re-created live lock.
      val broken = new Path(dir, s"$FileName.breaking-$token")
      val renamed = try fs.rename(p, broken) catch {
        case _: java.io.IOException => false
      }
      if (renamed) {
        if (!mtimeExpired(fs, broken, leaseMs)) {
          // we stole a LIVE lock (re-created between our expiry check and
          // our rename) — put it back, mtime intact, and fail loud
          val restored = try fs.rename(broken, p) catch {
            case _: java.io.IOException => false
          }
          if (!restored) try fs.delete(broken, false) catch {
            case _: Throwable => ()
          }
          throw new LockHeldException(
            s"maintenance lock on $path was re-taken while we broke a " +
              "stale one — another writer won the race; retry" +
              (if (restored) "" else " (the robbed holder will report the overlap at release)"),
            retryable = true)
        }
        try fs.delete(broken, false) catch { case _: Throwable => () }
      }
      ok = tryAcquire(fs, p, token)
      if (!ok)
        throw new LockHeldException(
          s"maintenance lock on $path re-taken while breaking a stale one — " +
            "another writer won the race; retry", retryable = true)
    }
    ok
    }
    assert(acquired) // every !ok path above threw
    // heartbeat: refresh the lock's mtime while the body runs, so only a
    // CRASHED holder ever expires. Failures degrade silently to the old
    // lease-bounded behavior (release still detects any takeover loud).
    // The refresh re-reads the token FIRST and touches the file only
    // when it is still ours: after a mid-run takeover (our lease expired,
    // another writer broke and re-created the lock) a blind setTimes
    // would keep the USURPER's lock perpetually fresh — if that new
    // holder then crashed, its lock could not expire until our body
    // finished, delaying recovery. On a foreign token the daemon stops
    // itself (release still reports the overlap loud; stopping here just
    // surfaces the takeover to recovery earlier than release time).
    val hb = new Thread(() => {
      try {
        var mine = true
        while (mine && !Thread.interrupted()) {
          Thread.sleep(math.max(1000L, leaseMs / 3))
          readLock(fs, p) match {
            case Some((t, _)) if t == token =>
              fs.setTimes(p, System.currentTimeMillis(), -1)
            case _ => mine = false // taken over (or vanished) — stop
          }
        }
      } catch { case _: Throwable => () }
    }, s"graft-shardlock-heartbeat-${dir.getName}")
    hb.setDaemon(true)
    hb.start()
    var bodyError: Throwable = null
    try body
    catch {
      // a non-local return from the body is SUCCESS, not failure — the
      // release path must still throw loud on an overlap
      case t: scala.runtime.NonLocalReturnControl[_] => throw t
      case t: Throwable => bodyError = t; throw t
    }
    finally {
      hb.interrupt()
      try hb.join(2000) catch { case _: InterruptedException => () }
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
