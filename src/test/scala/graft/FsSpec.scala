package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Fs.rmTree]]'s symlink behavior: a directory symlink inside
  * a gate-staged temp dir is deleted AS A LINK — the target directory
  * and its contents must survive the recursive delete. */
class FsSpec extends AnyFunSuite {

  test("rmTree deletes a directory symlink without following it") {
    val target = Files.createTempDirectory("fsspec-target")
    val keep = target.resolve("keep.txt")
    Files.write(keep, "survives".getBytes("UTF-8"))

    val staged = Files.createTempDirectory("fsspec-staged")
    Files.write(staged.resolve("scratch.txt"), "x".getBytes("UTF-8"))
    val sub = Files.createDirectory(staged.resolve("sub"))
    Files.write(sub.resolve("nested.txt"), "y".getBytes("UTF-8"))
    val link: Option[Path] =
      try Some(Files.createSymbolicLink(staged.resolve("link"), target))
      catch { // fs without symlink support: nothing to pin
        case _: UnsupportedOperationException => None
      }

    Fs.rmTree(staged.toFile)

    assert(!Files.exists(staged), "staged dir must be removed")
    link.foreach { l =>
      assert(Files.notExists(l), "the symlink itself must be gone")
      assert(Files.exists(target), "link target dir must survive")
      assert(Files.exists(keep), "link target contents must survive")
      assert(new String(Files.readAllBytes(keep), "UTF-8") === "survives")
    }

    Fs.rmTree(target.toFile)
  }

  test("rmTree still removes real nested directories") {
    val d = Files.createTempDirectory("fsspec-plain")
    val sub = Files.createDirectory(d.resolve("a"))
    Files.write(sub.resolve("b.txt"), "z".getBytes("UTF-8"))
    Fs.rmTree(d.toFile)
    assert(!Files.exists(d))
  }

  test("scratchDir yields fresh writable dirs, never a reused one") {
    val a = Fs.scratchDir("fsspec")
    val b = Fs.scratchDir("fsspec") // same prefix, same nanoTime tick ok
    assert(a != b, "two same-prefix calls must not collide")
    for (p <- Seq(a, b)) {
      val f = new java.io.File(p)
      assert(f.isDirectory && f.canWrite, p)
      Fs.rmTree(f)
    }
  }

  test("scratchRoot is a writable directory") {
    val root = new java.io.File(Fs.scratchRoot)
    assert(root.isDirectory && root.canWrite, Fs.scratchRoot)
  }
}
