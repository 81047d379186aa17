package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** [[TableIO]] with OBJECT-STORE semantics (the S3 contract), backed by
  * the local filesystem so Spark's parquet reads/writes still resolve.
  * Where [[LocalTableIO]] leans on POSIX (hard links, atomic rename),
  * this implementation permits itself ONLY what an object store
  * offers, making it the conformance surface for the deployment the
  * reference actually runs (three S3 buckets — terraform/main.tf:41-59,
  * every job writing `s3a://` — spark/jobs/gold_aggregation.py:111):
  *
  *  - keys are FLAT: `mkdirs` is a no-op ("directories" exist only as
  *    prefixes of stored objects; a PUT materializes its parents);
  *  - a PUT is atomic per object and last-writer-wins (`writeBytes` /
  *    `moveReplace` stage to a scratch name and move into place);
  *  - there is NO atomic exclusive create unless the store's
  *    conditional PUT (`If-None-Match: *`) is enabled: `putIfAbsent`
  *    REFUSES loudly without the capability — serving it as
  *    check-then-PUT would silently corrupt every format's OCC — and
  *    arbitrates under a store-wide lock with it (the in-process model
  *    of the store's own compare-and-set);
  *  - `mirror` is a SERVER-SIDE COPY (bytes duplicated, never linked;
  *    an existing target wins) — `serverSideCopies` counts them so
  *    conformance tests can pin the path taken;
  *  - `move` is copy+delete with an existence check — NOT atomic; the
  *    formats only call it for names already claimed by other means,
  *    which is exactly why the non-atomicity is tolerable;
  *  - reads/GETs are strongly consistent (today's S3 contract). The
  *    HISTORICAL anomaly — stale LIST after PUT — is available behind
  *    `beginListingLag()`/`settleListing()`: objects PUT through this
  *    seam while lagged are GET-visible but absent from `list()`,
  *    letting tests pin that a format read under a stale listing
  *    yields a consistent OLDER snapshot, never a torn one.
  */
final class ObjectStoreTableIO(val conditionalCreate: Boolean)
    extends TableIO with Serializable {

  def this() = this(false)

  /** Server-side copies performed by `mirror` (conformance pin). */
  val serverSideCopies = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- historical stale-LIST simulation --------------------------------
  @transient private lazy val lagged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var lagListing = false
  /** From now on, objects PUT through this seam stay invisible to
    * `list()` (but GET-visible) until [[settleListing]]. */
  def beginListingLag(): Unit = { lagListing = true }
  /** Listing catches up: every lagged object becomes LIST-visible. */
  def settleListing(): Unit = { lagListing = false; lagged.clear() }
  private def recordPut(path: String): Unit =
    if (lagListing) { lagged.add(norm(path)); () }

  private def norm(p: String): String = PathCodec.absNorm(p)

  override def exists(path: String): Boolean = new File(path).exists()
  override def isDirectory(path: String): Boolean =
    // a "directory" is a prefix with at least one object under it —
    // which is exactly when the local backing dir exists here, because
    // mkdirs is a no-op and parents materialize only on PUT
    new File(path).isDirectory
  override def list(dir: String): Seq[String] =
    Option(new File(dir).list()).map(_.toSeq).getOrElse(Seq.empty)
      .filterNot(n => lagListing && lagged.contains(norm(TableIO.join(dir, n))))
  override def length(path: String): Long = new File(path).length()
  override def lastModified(path: String): Long =
    new File(path).lastModified()
  /** Flat key space: nothing to create. */
  override def mkdirs(dir: String): Unit = ()

  override def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))
  override def readString(path: String): String =
    Files.readString(Paths.get(path))
  override def readLines(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(path)).asScala.toSeq
  }

  /** PUT: atomic per object, last-writer-wins, parents materialize. */
  override def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val scratch = p.resolveSibling(
      s".put-${java.util.UUID.randomUUID()}.tmp")
    Files.write(scratch, bytes)
    Files.move(scratch, p,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    recordPut(path)
  }

  override def putIfAbsent(src: String, dst: String): Boolean = {
    if (!conditionalCreate)
      throw new UnsupportedOperationException(
        s"putIfAbsent($dst): this object store has no atomic exclusive " +
        "create (a plain PUT is last-writer-wins — two racing committers " +
        "could both win). Enable conditional PUT (If-None-Match) support " +
        "to opt in.")
    try ObjectStoreTableIO.claimLock.synchronized {
      // the store's conditional PUT: one compare-and-set per key
      if (new File(dst).exists()) false
      else { writeBytes(dst, readBytes(src)); true }
    } finally { Files.deleteIfExists(Paths.get(src)); () }
  }

  override def mirror(src: String, dst: String): Unit = {
    if (new File(dst).exists()) return // existing immutable content wins
    serverSideCopies.incrementAndGet()
    writeBytes(dst, readBytes(src)) // server-side COPY, src retained
  }

  override def moveReplace(src: String, dst: String): Unit = {
    writeBytes(dst, readBytes(src)) // PUT (atomic per object)
    Files.deleteIfExists(Paths.get(src)); ()
  }

  override def move(src: String, dst: String): Unit = {
    if (new File(dst).exists())
      throw new java.nio.file.FileAlreadyExistsException(dst)
    writeBytes(dst, readBytes(src)) // copy + delete; name is pre-claimed
    Files.deleteIfExists(Paths.get(src)); ()
  }

  override def delete(path: String): Boolean = new File(path).delete()
  override def deleteRecursively(path: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new File(path))
}

object ObjectStoreTableIO {
  /** The store's arbitration point for conditional PUTs (in-process
    * model of S3's server-side compare-and-set; one per JVM exactly as
    * there is one store per endpoint). */
  private[sources] val claimLock = new Object()
}
