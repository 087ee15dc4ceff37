package graft.sources

import java.io.File

/** Single-writer atomic replace for a persisted table directory — the
  * shared write-then-swap used by the store-backed streaming writers
  * (incremental index, dedup fingerprint store). Contract:
  *
  *  - `live` is the complete copy to READ: `cur` normally, `old` if a
  *    crash hit between the two renames of a previous swap (the batch
  *    that died is replayed from the stream checkpoint, so its merge is
  *    redone, not lost).
  *  - the writer materializes its output into `tmp` (the merge reads the
  *    store it replaces — overwrite-in-place would corrupt the input
  *    mid-scan), then `promote` swaps it in with CHECKED renames: at
  *    every instant either `cur` or `old` holds a complete copy.
  *
  * Posix-rename, single-writer assumptions — the same ones the
  * reference's local-mode file writes make; a transactional table format
  * replaces this on a real cluster. */
object AtomicStore {

  final case class Paths(cur: File, old: File, tmp: File)

  def paths(parent: String, name: String): Paths =
    Paths(new File(s"$parent/$name"),
      new File(s"$parent/.$name.old"),
      new File(s"$parent/.$name.next"))

  /** The complete copy to read, if any exists yet. */
  def live(p: Paths): Option[File] =
    if (p.cur.exists()) Some(p.cur)
    else if (p.old.exists()) Some(p.old)
    else None

  /** Swap a fully-written `tmp` live. `readFrom` is what `live` returned
    * when the writer read its input: if it was `cur`, `cur` steps aside to
    * `old` first; if the writer was already recovering from `old`, `old`
    * stays put until the new `cur` lands (never delete the last complete
    * copy before its replacement is in place). */
  def promote(p: Paths, readFrom: Option[File], tag: String): Unit = {
    def rename(from: File, to: File): Unit =
      require(from.renameTo(to), s"$tag: rename $from -> $to failed")
    readFrom match {
      case Some(f) if f == p.cur =>
        if (p.old.exists()) delete(p.old) // stale leftover, cur is live
        rename(p.cur, p.old)
      case _ => () // bootstrapping or recovering: old (if any) is the live copy
    }
    rename(p.tmp, p.cur)
    if (p.old.exists()) delete(p.old)
  }

  /** Checked recursive delete — a silently-failed delete would surface
    * later as an inexplicable rename failure mid-swap. */
  def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(delete)
    if (f.exists() && !f.delete())
      throw new java.io.IOException(s"AtomicStore: failed to delete $f")
  }
}
