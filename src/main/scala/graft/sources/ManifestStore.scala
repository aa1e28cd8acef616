package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE atomic metadata primitive the manifest-pointer protocol
  * ([[ManifestTable]]) requires from storage: an all-or-nothing
  * put-if-absent of a small object at a name. Everything else the
  * protocol does — list versions, read a manifest body, delete
  * retired files — needs only plain list/read/delete, which every
  * filesystem and object store provides. Isolating the primitive here
  * is the same boundary Delta's `LogStore` draws, and it is what makes
  * the protocol portable off POSIX/HDFS:
  *
  *  - local `file://` → hard-link publish ([[PosixLinkStore]]);
  *  - HDFS → namenode-atomic `create(overwrite=false)` claim + rename
  *    ([[HdfsClaimStore]]);
  *  - S3 / GCS / Azure → a CONDITIONAL PUT: `If-None-Match: *` on S3
  *    (native since 2024) and Azure Blob, `x-goog-if-generation-match:
  *    0` on GCS. One HTTP request, checked and applied atomically
  *    server-side — no rename, no O_EXCL, no lock service needed.
  *    [[ConditionalPutStore]] models exactly those semantics so the
  *    commit/rebase/GC suites can run against them in-process; a real
  *    deployment's store issues the same call through its SDK.
  *
  * Contract: returns true iff THIS caller created `target`; on success
  * the full `body` is visible to any subsequent read (no partial
  * object is ever observable — object-store PUTs are atomic, POSIX
  * link/rename publish a fully-written temp file); concurrent callers
  * on the same `target` see exactly one winner. SCALE.md §commit-seam
  * documents the mapping per backend.
  */
private[graft] trait ManifestStore {
  def putIfAbsent(fs: FileSystem, target: Path, body: Array[Byte]): Boolean
}

/** `file://` publish: write the body to a private temp file, then
  * `Files.createLink` it to the final name — the link atomically fails
  * if the target exists (EEXIST), and the linked name appears with its
  * full content, so the manifest IS the claim and there is no
  * claimed-but-bodyless window. POSIX rename is NOT usable here: it
  * silently overwrites an existing target. */
private[graft] object PosixLinkStore extends ManifestStore {
  def putIfAbsent(fs: FileSystem, target: Path, body: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent,
      target.getName + ".w" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally fs.delete(tmp, false)
  }
}

/** HDFS publish: `create(overwrite=false)` of a claim file is
  * namenode-atomic, so the claim guards the subsequent write+rename of
  * the body. A claim whose writer crashed before the rename is a dead
  * slot; [[ManifestTable.breakStaleClaim]] ages it out (grace window =
  * [[ManifestTable.orphanGraceMs]]) so a conditional committer retrying
  * the same version number isn't wedged forever. */
private[graft] object HdfsClaimStore extends ManifestStore {
  private def claimSlot(fs: FileSystem, p: Path): Boolean =
    try { fs.create(p, false).close(); true }
    catch { case _: java.io.IOException => false }

  def putIfAbsent(fs: FileSystem, target: Path, body: Array[Byte]): Boolean = {
    val claim = new Path(target.getParent, target.getName + ".claim")
    val claimed = claimSlot(fs, claim) ||
      (ManifestTable.breakStaleClaim(fs, claim, target) && claimSlot(fs, claim))
    if (!claimed) false
    else {
      val tmp = new Path(target.getParent, target.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      fs.rename(tmp, target)
    }
  }
}

/** In-process model of an object store's conditional PUT (S3
  * `If-None-Match: *` / GCS generation-0 / Azure `If-None-Match: *`):
  * the existence check and the object creation happen atomically
  * SERVER-side, with no rename and no exclusive-create filesystem
  * primitive. Here "server-side" is a JVM-wide per-name lock: inside
  * it the object either exists (412 → false) or the full body is
  * published in one step. Backed by the real filesystem so readers,
  * listings and GC in the suites exercise the genuine protocol paths —
  * only the atomicity mechanism is swapped. The contention and fuzz
  * suites run against this store to prove the protocol never leans on
  * hard links or O_EXCL, which object stores don't have. */
private[graft] object ConditionalPutStore extends ManifestStore {
  private val names =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  def putIfAbsent(fs: FileSystem, target: Path, body: Array[Byte]): Boolean = {
    // the per-name entry is dropped after the critical section (keyed
    // remove: only if it still maps to OUR lock) — names are version-
    // monotonic and never reused, so without cleanup the map would grow
    // by one entry per commit for the JVM lifetime. A later caller
    // minting a fresh lock is safe: it can only do so after the winner
    // published, and published names exist forever (GC never deletes
    // the live head, and a retired name is never re-PUT).
    val key = target.toString
    val lock = names.computeIfAbsent(key, _ => new Object)
    try lock.synchronized {
      if (fs.exists(target)) false // 412 Precondition Failed
      else {
        // one atomic publish: the lock stands in for the store applying
        // the PUT atomically; the temp+rename inside it is invisible to
        // other writers (they serialize on the same name) and readers
        // never see a partial object, matching object-store semantics
        val tmp = new Path(target.getParent,
          target.getName + ".put" + java.util.UUID.randomUUID().toString.take(8))
        val out = fs.create(tmp, true)
        try out.write(body) finally out.close()
        fs.rename(tmp, target)
      }
    } finally names.remove(key, lock)
  }
}
