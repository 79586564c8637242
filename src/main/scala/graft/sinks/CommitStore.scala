package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The PUT-IF-ABSENT seam of [[SnapshotTable]]'s commit protocol.
  *
  * Everything the snapshot table guarantees — exactly one winner per
  * version, readers never seeing a torn manifest — reduces to ONE
  * primitive: atomically create the next manifest iff it does not exist.
  * Filesystems differ in whether they offer that primitive natively
  * (HDFS: yes, a namenode transaction; POSIX local: via link(2);
  * S3-class object stores: NO — their PUT unconditionally overwrites),
  * which is exactly why Delta ships pluggable LogStores. This trait is
  * that seam: the table calls [[putIfAbsent]], and a deployment whose
  * `_manifests` volume lacks atomic create plugs a store that supplies
  * the mutual exclusion externally (a coordination service, a
  * conditional-put database, single-writer discipline) instead of
  * silently losing commits.
  *
  * Contract for implementors:
  *  - `putIfAbsent(fs, path, bytes)` either (a) makes the COMPLETE
  *    `bytes` visible at `path` where nothing was visible before, or
  *    (b) throws [[SnapshotTable.ConcurrentCommitException]] because
  *    some committer already won `path` — never both, never a partial
  *    write another reader can observe as the manifest.
  *  - Any other failure (permissions, quota, network) must propagate
  *    as its real exception: translating it to the race exception would
  *    spin the append retry loop against a broken volume.
  *  - Readers use the plain filesystem; whatever the store writes must
  *    be readable at `path` via `fs.open`.
  */
trait CommitStore {
  def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit
}

/** The default store: native create-if-absent where the filesystem has
  * it. HDFS `create(path, overwrite=false)` is a namenode transaction —
  * truly atomic. Hadoop's LOCAL filesystems implement the same call as
  * exists-check-then-create and LOSE a real race (observed: the
  * concurrent-append stress spec produced two committers returning the
  * same version), so local publishes write a temp file and HARD-LINK it
  * into place — link(2) is atomic, fails if the target exists, and makes
  * the complete manifest visible in one step (no torn reads either). */
object HadoopCommitStore extends CommitStore {

  override def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val target = java.nio.file.Paths.get(path.toUri.getPath)
      val tmp = target.resolveSibling(".tmp-" + java.util.UUID.randomUUID())
      java.nio.file.Files.write(tmp, bytes)
      try java.nio.file.Files.createLink(target, tmp)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new SnapshotTable.ConcurrentCommitException(
            s"${path.getName} was committed concurrently (${e.getMessage}); retry from latest")
      } finally java.nio.file.Files.deleteIfExists(tmp)
    case _ =>
      // Only the EXISTS failure of create-if-absent means "lost the race":
      // HDFS surfaces it as FileAlreadyExistsException (sometimes wrapped
      // in a RemoteException, incl. AlreadyBeingCreatedException for an
      // in-flight winner). Any other IOException is a REAL I/O failure
      // and must propagate (see the [[CommitStore]] contract).
      def isExistsRace(e: java.io.IOException): Boolean = e match {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
        case re: org.apache.hadoop.ipc.RemoteException =>
          val cn = re.getClassName
          cn == classOf[org.apache.hadoop.fs.FileAlreadyExistsException].getName ||
          cn == "org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException" ||
          cn == "java.io.FileAlreadyExistsException"
        case _ => e.getClass.getSimpleName.contains("FileAlreadyExists")
      }
      val out =
        try fs.create(path, false)
        catch {
          case e: java.io.IOException if isExistsRace(e) =>
            throw new SnapshotTable.ConcurrentCommitException(
              s"${path.getName} was committed concurrently (${e.getMessage}); retry from latest")
        }
      try out.write(bytes)
      finally out.close()
  }
}

/** Put-if-absent for stores WITHOUT native atomic create, supplied by an
  * external mutual-exclusion table — the S3-class deployment shape (one
  * conditional-put row per manifest path arbitrates; the bytes then land
  * through the store's ordinary overwriting PUT, which is safe once this
  * process owns the path). This in-process implementation arbitrates in
  * a JVM-wide map, which makes it correct for every writer IN THIS
  * PROCESS (the single-driver S3 pattern — Delta's
  * S3SingleDriverLogStore); multi-driver deployments back the claim map
  * with a real coordination service and keep the rest verbatim.
  *
  * The write deliberately uses `fs.create(path, overwrite = true)` —
  * modelling an object store's unconditional PUT — so the spec can prove
  * the PROTOCOL (claim first, write after) is what preserves exactly-once
  * where the filesystem primitive alone would not. */
final class SingleProcessCommitStore extends CommitStore {

  private val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit = {
    val key = path.toUri.toString
    // the claim IS the transaction: exactly one caller adds the key
    if (!claimed.add(key))
      throw new SnapshotTable.ConcurrentCommitException(
        s"${path.getName} was committed concurrently (claimed in-process); retry from latest")
    // Any failure BELOW must release the claim: no manifest landed, so the
    // version is still winnable — a kept claim would poison every retry of
    // the same version into a misleading "committed concurrently" spin,
    // exactly the broken-volume failure the CommitStore contract forbids.
    try {
      // a pre-existing file means the path was committed by an EARLIER
      // process lifetime this store never saw: refuse, don't overwrite —
      // and KEEP the claim (the path genuinely is taken)
      if (fs.exists(path))
        throw new SnapshotTable.ConcurrentCommitException(
          s"${path.getName} already exists (committed before this store attached); retry from latest")
      val out = fs.create(path, true) // object-store PUT: overwrites unconditionally
      try out.write(bytes)
      finally out.close()
    } catch {
      case e: SnapshotTable.ConcurrentCommitException => throw e // path taken: claim stands
      case e: Throwable =>
        claimed.remove(key)
        throw e
    }
  }
}
