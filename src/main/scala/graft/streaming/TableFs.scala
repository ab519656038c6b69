package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}

/** The storage seam of the manifest/committer stack: every byte of table
  * metadata and staging I/O goes through the Hadoop [[FileSystem]] API —
  * resolved per path from the active session's Hadoop configuration — so
  * the entire lakehouse layer runs wherever Spark itself reads and writes:
  * `file:` (the default in local mode), `hdfs:`, or any object-store
  * connector on the classpath (`s3a:`, `gs:`, `abfs:`). Paths stay plain
  * strings throughout the engine (scheme-less strings resolve against
  * `fs.defaultFS`, exactly like Spark's own readers), and this object is
  * the only place they bind to a concrete filesystem.
  *
  * ATOMICITY CONTRACT, per operation class:
  *  - [[writeAtomic]] (manifest/OPS/TAGS flips) publishes by the
  *    mechanism the scheme actually makes atomic:
  *      - rename-atomic filesystems (local, HDFS): a unique temp +
  *        [[renameOverwrite]] — java.nio `ATOMIC_MOVE` on the local
  *        scheme (POSIX rename(2) replaces atomically) and
  *        `FileContext.rename(OVERWRITE)` elsewhere (atomic on HDFS);
  *      - ATOMIC-PUT object stores ([[isAtomicPutScheme]]: `s3a:`,
  *        `gs:`, `abfs:`, …): a DIRECT overwrite-put — a single-object
  *        PUT is atomic there (the new bytes become visible at close,
  *        a torn object is impossible), while "rename" is copy+delete
  *        and must never carry a commit.
  *    Either way a reader sees the old bytes or the new, never a tear.
  *    Overwrite-put is last-writer-wins, exactly like rename-overwrite —
  *    CONCURRENT writers additionally need a compare-and-swap guard:
  *    [[CasCommitter]] (OS file lock, local only) or
  *    [[ConditionalPutCommitter]] (create-if-absent slot claim, the
  *    object-store protocol).
  *  - everything else (staging listings, sidecar reads/writes, GC
  *    deletes) needs only read-after-write visibility, which every
  *    current store provides.
  */
private[graft] object TableFs {

  /** The Hadoop configuration metadata I/O binds to — resolved from the
    * ACTIVE session on every call (memoized per session instance, so the
    * hot path pays one reference compare, not a SparkConf→HadoopConf
    * copy). A process-wide snapshot here would be wrong in exactly one
    * nasty way: first touch on a thread without an active session (or
    * before the session is built) would permanently bind all manifest I/O
    * to a bare `new Configuration()` — dropping `fs.defaultFS` and
    * object-store credentials, so metadata could silently resolve against
    * a different filesystem than the data Spark writes. Sessionless
    * callers fall back to the last session's conf if one was ever seen,
    * else a bare Configuration — and re-resolve as soon as a session
    * appears.
    */
  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        val c = cachedConf
        if (c != null && (c._1 eq s)) c._2
        else {
          val fresh = s.sessionState.newHadoopConf()
          cachedConf = (s, fresh)
          fresh
        }
      case None =>
        val c = cachedConf
        if (c != null) c._2 else fallbackConf
    }

  @volatile private var cachedConf
    : (org.apache.spark.sql.SparkSession, Configuration) = null
  private lazy val fallbackConf = new Configuration()

  def path(s: String): Path = new Path(s)

  def fs(s: String): FileSystem = path(s).getFileSystem(conf)

  def exists(s: String): Boolean = fs(s).exists(path(s))

  def isDirectory(s: String): Boolean = {
    val f = fs(s)
    val p = path(s)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def mkdirs(s: String): Unit = { fs(s).mkdirs(path(s)); () }

  /** File statuses under `s`, empty when `s` is missing (the
    * `Option(listFiles()).getOrElse(empty)` idiom of the java.io era). */
  def list(s: String): Seq[FileStatus] = {
    val f = fs(s)
    val p = path(s)
    if (!f.exists(p)) Seq.empty else f.listStatus(p).toSeq
  }

  def readString(s: String): String = {
    val in = fs(s).open(path(s))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.commons.io.IOUtils.copy(in, out)
      new String(out.toByteArray, UTF_8)
    } finally in.close()
  }

  def readStringOpt(s: String): Option[String] =
    if (exists(s)) Some(readString(s)) else None

  def readBytes(s: String): Array[Byte] = {
    val in = fs(s).open(path(s))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.commons.io.IOUtils.copy(in, out)
      out.toByteArray
    } finally in.close()
  }

  /** Plain overwrite-in-place write — for sidecars whose readers tolerate
    * a torn write being retried (never for the manifest protocol). */
  def writeBytes(s: String, body: Array[Byte]): Unit = {
    val out = fs(s).create(path(s), true)
    try out.write(body) finally out.close()
  }

  def writeString(s: String, body: String): Unit =
    writeBytes(s, body.getBytes(UTF_8))

  /** Schemes whose single-object PUT is atomic (bytes become visible at
    * stream close; a torn object is impossible) and whose rename is
    * copy+delete — the object-store profile. Seeded with the connectors
    * in public use; tests (or an unlisted connector) register theirs via
    * [[registerAtomicPutScheme]].
    */
  private val atomicPutSchemes: java.util.Set[String] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Seq("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
      "oss", "cos", "obs", "swift").foreach(s.add)
    s
  }

  /** Declare `scheme` an atomic-put (object-store-profile) scheme. */
  def registerAtomicPutScheme(scheme: String): Unit = {
    atomicPutSchemes.add(scheme); ()
  }

  /** True when `s` resolves to an atomic-put object-store scheme (see
    * [[atomicPutSchemes]]). */
  def isAtomicPutScheme(s: String): Boolean = {
    val scheme = fs(s).getUri.getScheme
    scheme != null && atomicPutSchemes.contains(scheme)
  }

  /** Atomically publish `body` at `dir/finalName` — by unique temp +
    * rename-with-overwrite on rename-atomic filesystems, by direct
    * overwrite-put on atomic-put object stores (where the PUT itself is
    * the atomic flip and a rename would be an unsafe copy+delete). The
    * temp carries the `MANIFEST.tmp-` prefix so the staging GC
    * recognizes crashed leftovers. */
  def writeAtomic(dir: String, finalName: String, body: String): Unit =
    if (isAtomicPutScheme(dir))
      writeBytes(s"$dir/$finalName", body.getBytes(UTF_8))
    else {
      mkdirs(dir)
      val tmp = s"$dir/MANIFEST.tmp-${java.util.UUID.randomUUID()}"
      writeBytes(tmp, body.getBytes(UTF_8))
      renameOverwrite(tmp, s"$dir/$finalName")
    }

  /** Atomic rename-with-overwrite. On the LOCAL scheme this MUST be
    * java.nio `ATOMIC_MOVE` (POSIX rename(2) replaces the destination
    * atomically): Hadoop's local `FileContext.rename(OVERWRITE)` is
    * delete-then-rename, which opens a window where the destination —
    * the MANIFEST — does not exist; a reader in that window sees an
    * empty table, and a failed second half resets it. On HDFS the
    * FileContext overwrite rename IS atomic (DFS rename2), which is the
    * property the commit protocol needs there. */
  def renameOverwrite(src: String, dst: String): Unit =
    if (isLocal(src)) {
      val sf = localFile(src)
      java.nio.file.Files.move(sf.toPath, localFile(dst).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // the temp was written through the checksummed LocalFileSystem;
      // the raw move bypasses that layer, so drop its .crc sibling here
      // (the destination deliberately carries none — readers tolerate a
      // missing crc, never a mismatched one)
      val crc = new java.io.File(sf.getParentFile, s".${sf.getName}.crc")
      if (crc.isFile) { crc.delete(); () }
    } else
      FileContext.getFileContext(fs(src).getUri, conf)
        .rename(path(src), path(dst), Options.Rename.OVERWRITE)

  /** Recursive delete; false/no-op when missing. */
  def delete(s: String): Unit = {
    val f = fs(s)
    val p = path(s)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  def mtime(s: String): Long = fs(s).getFileStatus(path(s)).getModificationTime

  /** Refresh a path's modification time to now (the staging-GC age floor);
    * stores that do not support setTimes (object stores) simply keep the
    * create time, which only makes GC MORE conservative there. */
  def touch(s: String): Unit =
    try fs(s).setTimes(path(s), System.currentTimeMillis(), -1)
    catch { case _: UnsupportedOperationException => () }

  def create(s: String): java.io.OutputStream = fs(s).create(path(s), true)

  def open(s: String): java.io.InputStream = fs(s).open(path(s))

  def fileLength(s: String): Long = fs(s).getFileStatus(path(s)).getLen

  /** True when `s` resolves to the local filesystem (`file:` or the
    * checksummed LocalFileSystem) — the schemes where OS-level file locks
    * ([[CasCommitter]]) and java.io interop are meaningful. */
  def isLocal(s: String): Boolean = {
    val scheme = fs(s).getUri.getScheme
    scheme == null || scheme == "file"
  }

  /** The raw local path for java.io interop — only valid when
    * [[isLocal]]. */
  def localFile(s: String): java.io.File = {
    val u = path(s).toUri
    new java.io.File(Option(u.getPath).getOrElse(s))
  }
}
