package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions

/**
 * Per-user scratch root for content-fingerprinted caches (PQ
 * codebooks, Bloom filter bytes, fixture round-trip dirs, the embedded
 * Derby gate database). A bare world-writable `/tmp/graft_*` path is a
 * pre-creation attack surface on a shared host: another user can plant
 * a dir with a `_SUCCESS` marker and the correctness gate would load
 * it blindly. The root here is `$TMPDIR/graft_cache_<user>` created
 * `rwx------`, and OWNERSHIP IS VERIFIED on every lookup — a
 * pre-created root owned by someone else fails fast instead of being
 * served from.
 */
object CacheDirs {

  /** Owner-only cache root; created on first use, ownership-checked
    * every time (the check is the defense — creation can be lost to a
    * racing pre-creation, verification cannot). */
  lazy val root: String = {
    val user = sys.props.getOrElse("user.name", "unknown")
    val p: Path = Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_cache_$user")
    if (!Files.exists(p)) {
      try Files.createDirectory(p, PosixFilePermissions.asFileAttribute(
        PosixFilePermissions.fromString("rwx------")))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    val owner = Files.getOwner(p).getName
    require(owner == user,
      s"cache root $p is owned by '$owner', not '$user' — refusing to " +
        "serve caches from a directory another user controls")
    p.toString
  }
}
