package graft

/** Local-filesystem helpers for gates that stage temp files. */
private[graft] object Fs {

  /** Recursive delete for gate-staged temp directories. Never follows
    * a directory symlink: a link inside a staged dir is deleted as a
    * link (the target survives) instead of having its target's
    * contents recursively removed. Extracted from the 16 identical
    * inline copies the gates carried so delete-logic fixes happen in
    * one place. */
  def rmTree(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  /** Root for gate-staged scratch (staged inputs, streaming
    * checkpoints, sinks). Prefers tmpfs (/dev/shm) when writable: the
    * gates' recovery/state semantics are identical on any local fs,
    * and the disk-fsync tax of a disk-backed /tmp is pure harness
    * cost — a real deployment checkpoints to distributed storage, not
    * the bench machine's scratch disk. Override with
    * GRAFT_SCRATCH_DIR. */
  lazy val scratchRoot: String =
    (sys.env.get("GRAFT_SCRATCH_DIR").toSeq ++
      Seq("/dev/shm", System.getProperty("java.io.tmpdir", "/tmp")))
      .find { p =>
        val f = new java.io.File(p)
        f.isDirectory && f.canWrite
      }
      .getOrElse("/tmp")

  /** A fresh unique scratch dir under [[scratchRoot]]; caller removes
    * it with [[rmTree]] when the gate finishes. */
  def scratchDir(prefix: String): String = {
    val d = new java.io.File(scratchRoot,
      s"graft_${prefix}_${System.nanoTime()}")
    d.mkdirs()
    d.getAbsolutePath
  }
}
