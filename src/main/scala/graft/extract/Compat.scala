package graft.extract

/** Reference-bug compatibility layer (SURVEY.md §7 watch-list #5).
  *
  * The reference contains four observable bugs. Where the buggy behavior
  * is REACHABLE and produces output, `strictCompat = true` replicates it
  * byte-for-byte; where the reference CRASHES (no output exists to
  * match), the engine returns the corrected result and documents the
  * divergence here:
  *
  * 1. `arxiv/search_pdf.py:64` — page-URL stride is `200*i + i` (the
  *    author multiplied the wrong term), so page i starts at item 201*i:
  *    pages overlap by skipping 1 item less each page. Reachable;
  *    replicated below behind strictCompat.
  * 2. `search.py:38` — `url + page_idx` concatenates int onto str ⇒
  *    TypeError whenever a search has > 1 page. The reference crashes
  *    before producing page 2+; engine returns the corrected pagination
  *    (nothing to match — divergence documented, not replicated).
  * 3. `conference/openaccess.py:131-133` — threads are built with
  *    2-tuple `args` against a 4-parameter function ⇒ both threads raise
  *    TypeError at start; the IJCAI path downloads nothing. Engine runs
  *    the corrected range split (R9/q13).
  * 4. `new.py:79-82` — the counts row is appended with a LEADING "\n"
  *    and no trailing newline, so the first append lands on the header
  *    line's row. Reachable; `Sinks.countsRow` emits the logical rows,
  *    and `countsFileBody(strictCompat = true)` reproduces the exact
  *    leading-newline file layout.
  */
object Compat {

  /** Bug 1: search_pdf.py:64 pagination. strict → `start=200*i+i`. */
  def pageStartOffsets(totalPages: Int, strictCompat: Boolean): Vector[Long] =
    (0 until totalPages).map { i =>
      if (strictCompat) 200L * i + i else 200L * i
    }.toVector

  /** Bug 4: new.py:79-82 counts-file byte layout. Rows joined with each
    * row PREFIXED by "\n" (strict) vs newline-terminated rows (clean).
    */
  def countsFileBody(rows: Seq[String], strictCompat: Boolean): String =
    if (strictCompat) rows.map("\n" + _).mkString
    else rows.mkString("", "\n", "\n")
}
