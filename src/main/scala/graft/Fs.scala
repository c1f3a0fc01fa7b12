package graft

/** Local-filesystem helpers for gates that stage temp files. */
private[graft] object Fs {

  /** Recursive delete for gate-staged temp directories. Plain
    * File-walk (no symlink following beyond what listFiles exposes);
    * extracted from the 16 identical inline copies the gates carried
    * so delete-logic fixes happen in one place. */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }
}
