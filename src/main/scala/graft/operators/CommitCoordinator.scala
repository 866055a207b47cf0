package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE COMMIT-POINT SEAM of [[VersionedTable]] — pluggable atomic
  * no-overwrite publication, the `LogStore` posture Delta Lake ships
  * for exactly this problem. `tryPublish` must atomically publish
  * `tmp`'s bytes at `dest` IF AND ONLY IF `dest` does not already
  * exist:
  *
  *   - returns `true` when this caller WON — `dest` now durably holds
  *     `tmp`'s content and `tmp` has been consumed (deleted/moved);
  *   - returns `false` on a LOST race — `dest` already existed (or
  *     another racer published first); `tmp` is left in place and the
  *     caller deletes it;
  *   - throws on anything else.
  *
  * Two TRUE racers (both past every pre-check, both with a staged temp
  * file, hitting the publish point simultaneously) must resolve to
  * exactly one `true` — never two, never a silent overwrite. The
  * CyclicBarrier race spec in VersionedTableSpec drives BOTH shipped
  * implementations through that exact interleave.
  *
  * Which coordinator runs where:
  *
  *   - [[FsCommitCoordinator]] (the default): `file:` gets POSIX
  *     `link(2)` (atomic `EEXIST`, no check-then-act window); HDFS and
  *     other rename-contract filesystems get no-overwrite `rename`
  *     (atomic at the NameNode). Correct WITHOUT configuration on
  *     local FS and HDFS.
  *   - [[ConditionalPutCoordinator]]: for stores whose `rename` is a
  *     non-atomic copy (S3, GCS, ABFS without the atomic-rename
  *     flag). Models the conditional-put contract those stores expose
  *     natively (S3 `If-None-Match: *` conditional writes, GCS
  *     `x-goog-if-generation-match: 0`, Azure `If-None-Match: *`):
  *     a compare-and-set reservation on the destination key IS the
  *     atomic point, and the upload happens under the reservation.
  *     The shipped implementation keeps the reservation table
  *     IN-MEMORY — correct for all writers in one JVM/driver (the
  *     `local[*]`/single-driver deployment) and the spec vehicle for
  *     the contract; a multi-driver deployment backs the same two
  *     calls (`reserve`, `upload`) with the store's real conditional
  *     PUT or a DynamoDB-style table, exactly Delta's
  *     `S3DynamoDBLogStore` split.
  *
  * Select process-wide via [[VersionedTable.setCommitCoordinator]]
  * (a deployment-level knob set once at startup, like Delta's
  * `spark.delta.logStore.class`).
  */
trait CommitCoordinator {
  /** Atomically publish `tmp` as `dest` iff `dest` is absent.
    * True = won (tmp consumed); false = lost (tmp left for caller). */
  def tryPublish(fs: FileSystem, tmp: Path, dest: Path): Boolean

  /** Human-readable name for logs/specs. */
  def name: String
}

/** Default coordinator: filesystem-native atomic no-overwrite.
  * `file:` → `link(2)` (EEXIST is atomic at the kernel); everything
  * else → the filesystem-contract no-overwrite rename (atomic on
  * HDFS; NOT safe on plain S3/GCS — use [[ConditionalPutCoordinator]]
  * there). */
object FsCommitCoordinator extends CommitCoordinator {
  val name = "fs-native"

  def tryPublish(fs: FileSystem, tmp: Path, dest: Path): Boolean =
    if ("file" == fs.getUri.getScheme) {
      val src = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val dst = java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath)
      try {
        java.nio.file.Files.createLink(dst, src)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      if (fs.exists(dest)) return false
      fs.rename(tmp, dest)
    }
}

/** Conditional-put coordinator for object stores (see trait scaladoc
  * for the deployment split). The atomic point is the reservation:
  * `putIfAbsent` on the fully-qualified destination key — exactly one
  * racer holds it, and only the holder uploads. A destination that
  * already exists durably (e.g. from a previous process) counts as a
  * standing reservation. Instances are independent reservation
  * domains: construct ONE per process and install it via
  * [[VersionedTable.setCommitCoordinator]]. */
final class ConditionalPutCoordinator extends CommitCoordinator {
  val name = "conditional-put"

  private val reserved =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def tryPublish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val key = fs.makeQualified(dest).toUri.toString
    // durable state outranks the in-memory table (a previous process
    // may have published this key before we existed)
    if (fs.exists(dest)) { reserved.add(key); return false }
    // THE atomic point: exactly one concurrent caller adds the key.
    // In a real store this line and the upload below collapse into
    // one conditional PUT (If-None-Match: *).
    if (!reserved.add(key)) return false
    // upload under the reservation: no contender can reach this line
    // for the same key, so a plain rename cannot clobber anyone. A
    // FAILED upload must release the reservation — holding it would
    // wedge the destination key until process restart (no retry, by
    // this caller or any other, could ever publish it again).
    val uploaded =
      try fs.rename(tmp, dest)
      catch { case e: Throwable => reserved.remove(key); throw e }
    if (!uploaded) {
      reserved.remove(key)
      throw new java.io.IOException(
        s"conditional-put upload failed for $dest (reservation released)")
    }
    true
  }
}
