package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** [[TableIO]] over the Hadoop FileSystem API — the deployment
  * implementation for every store Hadoop fronts (HDFS, S3A, GCS, ABFS,
  * plain `file://`). Each path resolves its OWN FileSystem from its
  * scheme, so one installed instance serves a deployment that mixes
  * stores (e.g. staging on local disk, tables on `s3a://`).
  *
  * Primitive → store mapping (the contract [[TableIO]]'s scaladoc
  * documents):
  *  - `putIfAbsent` = EXCLUSIVE create (`create(overwrite = false)`).
  *    Atomic claim on HDFS (namenode-arbitrated) and on conditional-PUT
  *    stores where the connector maps exclusive create to
  *    If-None-Match. Unlike the local hard-link impl, the claimed file
  *    becomes VISIBLE before its content finishes streaming on some
  *    stores — commit formats tolerate this the same way they tolerate
  *    any in-flight write: losers re-read after the claim settles, and
  *    every claimed payload is written before the claim's result is
  *    acted on in-process.
  *  - `mirror` = idempotent server-side copy (existing target wins).
  *  - `moveReplace` / `move` = FileContext rename with / without
  *    OVERWRITE — atomic on HDFS; object stores emulate per-object.
  *
  * Instantiable executor-side (a no-arg constructor builds the default
  * Configuration there), matching the seam's requirement that
  * `TableIO.current` be installed on executors too. */
final class HadoopTableIO(mkConf: () => Configuration)
    extends TableIO with Serializable {

  def this() = this(() => new Configuration())

  @transient private lazy val conf: Configuration = mkConf()
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)
  private def fc(p: Path): FileContext =
    FileContext.getFileContext(p.toUri, conf)
  private def hp(s: String): Path = new Path(s)

  override def exists(path: String): Boolean = {
    val p = hp(path); fs(p).exists(p)
  }
  override def isDirectory(path: String): Boolean = {
    val p = hp(path)
    try fs(p).getFileStatus(p).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }
  override def list(dir: String): Seq[String] = {
    val p = hp(dir)
    try fs(p).listStatus(p).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }
  override def length(path: String): Long = {
    val p = hp(path)
    try fs(p).getFileStatus(p).getLen
    catch { case _: java.io.FileNotFoundException => 0L }
  }
  override def lastModified(path: String): Long = {
    val p = hp(path)
    try fs(p).getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }
  }
  override def mkdirs(dir: String): Unit = {
    val p = hp(dir); fs(p).mkdirs(p); ()
  }

  override def readBytes(path: String): Array[Byte] = {
    val p = hp(path)
    val in = fs(p).open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
  override def readString(path: String): String =
    new String(readBytes(path), StandardCharsets.UTF_8)
  override def readLines(path: String): Seq[String] =
    // java.nio readAllLines semantics: split on \n / \r\n, no trailing
    // empty line for a trailing terminator
    readString(path).split("\r?\n", -1).toSeq match {
      case init :+ "" => init
      case all => all
    }
  override def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = hp(path)
    val out = fs(p).create(p, /* overwrite = */ true)
    try out.write(bytes) finally out.close()
  }

  /** Schemes where `create(overwrite = false)` is a true atomic claim:
    * HDFS arbitrates exclusive create at the namenode; local and view
    * filesystems inherit POSIX O_EXCL. Object-store connectors (s3a,
    * gs, abfs, …) historically check existence at `create()` and land
    * the object at `close()` — last-writer-wins, NOT a claim — unless
    * the connector maps exclusive create to a conditional PUT. */
  private val AtomicCreateSchemes = Set("hdfs", "file", "viewfs", "webhdfs")

  /** Capability strings a connector may publish when exclusive create
    * is honored as a conditional PUT (S3A publishes the first when
    * `fs.s3a.create.conditional.enabled` is on, Hadoop 3.4.1+). */
  private val ConditionalCreateCapabilities = Seq(
    "fs.s3a.capability.conditional.create", "fs.capability.create.conditional")

  private def supportsAtomicCreate(p: Path): Boolean = {
    val f = fs(p)
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    AtomicCreateSchemes.contains(scheme) ||
      conf.getTrimmedStringCollection("graft.io.atomic-create.schemes")
        .contains(scheme) ||
      ConditionalCreateCapabilities.exists(c =>
        try f.hasPathCapability(p, c) catch { case _: Exception => false })
  }

  override def putIfAbsent(src: String, dst: String): Boolean = {
    val s = hp(src); val d = hp(dst)
    // Every format's optimistic-concurrency claim on a commit version
    // rests on this primitive being an atomic claim. Refusing loudly on
    // a store that silently last-writer-wins beats corrupting a log.
    if (!supportsAtomicCreate(d))
      throw new UnsupportedOperationException(
        s"putIfAbsent($dst): scheme '${Option(fs(d).getUri.getScheme).getOrElse("file")}' " +
        "does not guarantee atomic exclusive create (two racing committers could " +
        "both win). Enable the connector's conditional-create support and add the " +
        "scheme to 'graft.io.atomic-create.schemes' to opt in.")
    val payload = readBytes(src)
    try {
      val claimed =
        try Some(fs(d).create(d, /* overwrite = */ false))
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case _: java.nio.file.FileAlreadyExistsException => None
          case _: java.io.IOException if fs(d).exists(d) => None
        }
      claimed match {
        case Some(out) => try out.write(payload) finally out.close(); true
        case None => false
      }
    } finally { fs(s).delete(s, false); () }
  }

  override def mirror(src: String, dst: String): Unit = {
    val d = hp(dst)
    if (fs(d).exists(d)) return
    val payload = readBytes(src)
    try {
      val out = fs(d).create(d, /* overwrite = */ false)
      try out.write(payload) finally out.close()
    } catch {
      // another publisher of the same immutable content won — fine
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      case _: java.nio.file.FileAlreadyExistsException => ()
      case _: java.io.IOException if fs(d).exists(d) => ()
    }
  }

  override def moveReplace(src: String, dst: String): Unit = {
    val s = hp(src)
    fc(s).rename(s, hp(dst), Options.Rename.OVERWRITE)
  }
  override def move(src: String, dst: String): Unit = {
    val s = hp(src)
    fc(s).rename(s, hp(dst), Options.Rename.NONE)
  }

  override def delete(path: String): Boolean = {
    val p = hp(path)
    try fs(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }
  }
  override def deleteRecursively(path: String): Unit = {
    val p = hp(path)
    try { fs(p).delete(p, true); () }
    catch { case _: java.io.FileNotFoundException => () }
  }
}
