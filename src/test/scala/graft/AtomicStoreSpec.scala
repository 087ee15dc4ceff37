package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AtomicStore

/** Crash-state matrix for the shared write-then-swap: whatever instant a
  * writer dies at, `live` must name a complete copy. Pure file ops — no
  * Spark needed to pin the protocol. */
class AtomicStoreSpec extends AnyFunSuite {

  private def mk(parent: java.io.File, name: String, content: String): java.io.File = {
    val d = new java.io.File(parent, name)
    d.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(d, "data").toPath, content)
    d
  }

  private def content(f: java.io.File): String =
    java.nio.file.Files.readString(new java.io.File(f, "data").toPath)

  test("normal cycle: read cur, write tmp, promote; old never survives") {
    val parent = java.nio.file.Files.createTempDirectory("astore").toFile
    val p = AtomicStore.paths(parent.getPath, "t")
    assert(AtomicStore.live(p).isEmpty) // bootstrap
    mk(parent, ".t.next", "v1")
    AtomicStore.promote(p, None, "spec")
    assert(AtomicStore.live(p).contains(p.cur) && content(p.cur) == "v1")
    val src = AtomicStore.live(p)
    mk(parent, ".t.next", "v2")
    AtomicStore.promote(p, src, "spec")
    assert(content(p.cur) == "v2" && !p.old.exists() && !p.tmp.exists())
  }

  test("crash between renames: old is live, re-promote recovers") {
    val parent = java.nio.file.Files.createTempDirectory("astore").toFile
    val p = AtomicStore.paths(parent.getPath, "t")
    // simulate: cur renamed to old, then death before tmp -> cur
    mk(parent, ".t.old", "v1")
    assert(AtomicStore.live(p).contains(p.old)) // reader still has v1
    // replayed batch re-reads old, rewrites tmp, promotes
    val src = AtomicStore.live(p)
    mk(parent, ".t.next", "v2")
    AtomicStore.promote(p, src, "spec")
    assert(content(p.cur) == "v2" && !p.old.exists())
  }

  test("stale old left by a pre-crash writer is cleared on the next swap") {
    val parent = java.nio.file.Files.createTempDirectory("astore").toFile
    val p = AtomicStore.paths(parent.getPath, "t")
    mk(parent, "t", "v2")
    mk(parent, ".t.old", "v1") // death AFTER tmp->cur but before delete(old)
    assert(AtomicStore.live(p).contains(p.cur)) // cur wins when both exist
    val src = AtomicStore.live(p)
    mk(parent, ".t.next", "v3")
    AtomicStore.promote(p, src, "spec")
    assert(content(p.cur) == "v3" && !p.old.exists())
  }
}
