package graft.sources

/** Unified-diff parsing — commit-history corpora (message + patch
  * pairs) are a first-class code-training modality, and the per-file
  * add/remove shape is both a quality signal (huge generated diffs,
  * vendored-dependency churn) and the join key to the repo grain.
  * Line-oriented single pass, never throws; tolerates truncated or
  * malformed patches by emitting what it saw.
  */
object DiffCodec {

  final case class FileStat(file: String, added: Long, removed: Long)

  /** Per-file added/removed line counts of a unified diff. A file
    * entry opens at `diff --git`; its path is the `+++ b/…` target
    * (falling back to the `--- a/…` source for deletions, then to the
    * `diff --git` line's second operand); `+`/`-` body lines count,
    * `+++`/`---` headers and `@@` hunk markers don't. Input that never
    * opens an entry (no `diff --git`) is treated as one anonymous
    * entry when it contains hunks, so bare patches still count.
    */
  def stats(text: String): Seq[FileStat] = {
    if (text == null) return Seq.empty
    val out = Seq.newBuilder[FileStat]
    var file: String = null
    var open = false
    var added = 0L
    var removed = 0L
    var sawBody = false
    var inHunk = false
    def flush(): Unit = {
      if (open && (file != null || sawBody))
        out += FileStat(if (file == null) "" else file, added, removed)
      file = null; added = 0L; removed = 0L; sawBody = false
    }
    val lines = text.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      if (line.startsWith("diff --git ")) {
        flush()
        open = true
        inHunk = false
        // "diff --git a/x b/x" → second operand, b/ stripped
        val sp = line.lastIndexOf(' ')
        if (sp > 0 && sp + 1 < line.length) {
          val op = line.substring(sp + 1)
          file = if (op.startsWith("b/")) op.substring(2) else op
        }
      } else if (line.startsWith("+++ ") && !inHunk) {
        // only a header OUTSIDE a hunk: inside one, a body line whose
        // content starts with "++ " renders as "+++ " and must count
        // as an added line, not overwrite the file path
        open = true
        val p = line.substring(4)
        if (p != "/dev/null")
          file = if (p.startsWith("b/")) p.substring(2) else p
      } else if (line.startsWith("--- ") && !inHunk) {
        open = true
        if (file == null) {
          val p = line.substring(4)
          if (p != "/dev/null")
            file = if (p.startsWith("a/")) p.substring(2) else p
        }
      } else if (line.startsWith("@@")) {
        open = true
        sawBody = true
        inHunk = true
      } else if (line.startsWith("+")) {
        if (open) { added += 1; sawBody = true }
      } else if (line.startsWith("-")) {
        if (open) { removed += 1; sawBody = true }
      }
      li += 1
    }
    flush()
    out.result()
  }
}
