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
    * checkpoints, sinks). Prefers tmpfs (/dev/shm) when writable AND
    * roomy (≥ 4 GiB usable — a Docker-default 64 MB shm must not
    * swallow at-scale staging): the gates' recovery/state semantics
    * are identical on any local fs, and the disk-fsync tax of a
    * disk-backed /tmp is pure harness cost — a real deployment
    * checkpoints to distributed storage, not the bench machine's
    * scratch disk. GRAFT_SCRATCH_DIR overrides unconditionally (the
    * dir is created if absent; an unusable override is a loud error,
    * never a silent fallback). */
  lazy val scratchRoot: String = {
    def usable(f: java.io.File): Boolean = f.isDirectory && f.canWrite
    sys.env.get("GRAFT_SCRATCH_DIR") match {
      case Some(p) =>
        val f = new java.io.File(p)
        f.mkdirs()
        require(usable(f), s"GRAFT_SCRATCH_DIR=$p is not a writable dir")
        f.getAbsolutePath
      case None =>
        val shm = new java.io.File("/dev/shm")
        val minShm = 4L << 30
        if (usable(shm) && shm.getUsableSpace >= minShm) "/dev/shm"
        else {
          val tmp = new java.io.File(
            System.getProperty("java.io.tmpdir", "/tmp"))
          if (usable(tmp)) tmp.getAbsolutePath else "/tmp"
        }
    }
  }

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh unique scratch dir under [[scratchRoot]]; caller removes
    * it with [[rmTree]] when the gate finishes. Names carry nanoTime +
    * a process-wide counter (two same-prefix calls in one nanoTime
    * tick must not collide) and creation is verified — a pre-existing
    * same-name dir (stale crash leftover in a world-writable root) is
    * never silently reused. */
  def scratchDir(prefix: String): String = {
    var attempt = 0
    while (true) {
      val d = new java.io.File(scratchRoot, s"graft_${prefix}_" +
        s"${System.nanoTime()}_${scratchSeq.incrementAndGet()}")
      if (d.mkdirs()) return d.getAbsolutePath
      attempt += 1
      require(attempt < 100,
        s"scratchDir: cannot create a fresh dir under $scratchRoot")
    }
    throw new IllegalStateException("unreachable")
  }
}
