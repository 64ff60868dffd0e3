package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** Atomically publish commit-file content at a destination iff no
  * commit exists there yet — the claim primitive under every
  * versioned commit log in the engine (the upsert sink, the IVF index
  * manifest log).
  *
  * The naive protocol — write a private tmp file, then
  * `FileContext.rename(tmp, dst)` with `Rename.NONE` — is atomic and
  * EXCLUSIVE on HDFS (the NameNode checks dst server-side), but on
  * the local filesystem the "throws if dst exists" contract is
  * implemented as check-then-rename, and POSIX `rename(2)` silently
  * REPLACES an existing destination. Two concurrent claimants of the
  * same version can therefore BOTH see success, the second's content
  * clobbering the first's: the clobbered writer believes it
  * committed and its data is silently lost — a lost update the
  * multi-writer stress test reproduced roughly every other run.
  *
  * On local filesystems the claim therefore goes through
  * `Files.createLink` (hard link): `link(2)` fails with `EEXIST`
  * atomically in the kernel, so exactly one claimant ever succeeds.
  * Non-local stores keep the rename protocol, plus the debris-healing
  * retry for stores whose rename is not atomic: a destination that
  * exists but does not parse as commit content is the corpse of a
  * writer that died mid-publish; it must be healed (deleted, claim
  * retried once) or the version number is wedged forever — every
  * writer recomputes it, and every claim loses to the corpse.
  */
object AtomicClaim {

  /** True iff THIS call won the claim on `dst` with `content`.
    * `parseable` classifies existing destination content as a real
    * winner (true → we lost) vs torn debris (false → heal + retry).
    */
  def claim(f: FileSystem, conf: Configuration, dst: Path,
            content: Array[Byte], parseable: () => Boolean): Boolean = {
    val parent = dst.getParent
    if (!f.exists(parent)) f.mkdirs(parent)
    val isLocal = f.isInstanceOf[LocalFileSystem] ||
      f.isInstanceOf[RawLocalFileSystem]
    var attempt = 0
    while (attempt < 2) {
      attempt += 1
      val tmp = new Path(parent,
        s".tmp-${dst.getName}-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(content) finally out.close()
      if (isLocal) {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          f.delete(tmp, false)
          return true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(tmp, false)
            if (parseable()) return false // lost to a real winner
            f.delete(dst, false) // heal the corpse, retry once
        }
      } else {
        try {
          org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
            .rename(tmp, dst) // Rename.NONE: throws if dst exists
          return true
        } catch {
          case e: java.io.IOException =>
            f.delete(tmp, false)
            if (!f.exists(dst)) throw e // a real I/O failure, surface it
            if (parseable()) return false // lost to a real winner
            f.delete(dst, false) // heal the corpse, retry once
        }
      }
    }
    // healed but lost the re-claim too — only a real winner remains
    false
  }
}
