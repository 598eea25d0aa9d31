package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** J1 positional zip + J3 link cascade (arxiv/citations.py:50-84). */
class CitationExtractSpec extends AnyFunSuite {
  import CitationExtract._

  private val page =
    """<html><body><div id="col-references">
      |<div class="bib-paper"><a class="notinfluential mathjax"> Paper One </a></div>
      |<div class="bib-paper-links">
      |  <a href="https://semantic.example/x">sem</a>
      |  <a href="https://arxiv.org/abs/2301.00001">arxiv</a>
      |  <a href="https://doi.org/10.1/xyz">doi</a>
      |</div>
      |<div class="bib-paper"><a class="notinfluential mathjax">Paper Two</a></div>
      |<div class="bib-paper-links">
      |  <a href="https://doi.org/10.2/abc">doi</a>
      |  <a href="https://other.example/p2">alt</a>
      |</div>
      |<div class="bib-paper"><a class="notinfluential mathjax">Paper Three</a></div>
      |<div class="bib-paper-links"><a href="https://plain.example/p3">p</a></div>
      |<div class="bib-paper"><span>No title anchor</span></div>
      |<div class="bib-paper-links"><a href="https://x.example/skip">s</a></div>
      |</div></body></html>""".stripMargin

  test("J3 cascade: arxiv (abs→pdf, id=href[22:]) > doi (id=link[16:]) > any") {
    val doc = MiniHtml.parse(page)
    val cs = extractCitations(doc, "col-references")
    assert(cs.length == 3) // 4th has no title anchor (F9 presence guard)
    assert(cs(0) == Citation("Paper One",
      "https://arxiv.org/pdf/2301.00001", "2301.00001"))
    assert(cs(1) == Citation("Paper Two", "https://doi.org/10.2/abc", "10.2/abc"))
    assert(cs(2) == Citation("Paper Three", "https://plain.example/p3", ""))
  }

  test("missing div id yields empty") {
    assert(extractCitations(MiniHtml.parse(page), "col-citations") == Vector())
  }

  test("O2 sort by id (citations.py:145)") {
    val doc = MiniHtml.parse(page)
    val sorted = extractCitations(doc, "col-references").sortBy(_.id)
    assert(sorted.map(_.id) == Vector("", "10.2/abc", "2301.00001"))
  }

  test("next-page detection (citations.py:120-124)") {
    val withNext = MiniHtml.parse(
      """<div id="col-citations"><a title="Page 2" href="/p2">▶</a></div>""")
    assert(CitationExtract.nextPageRef(withNext, "col-citations")
      .contains("/p2"))
    val disabled = MiniHtml.parse(
      """<div id="col-citations"><a title="Page 2" class="disabled" href="/p2">▶</a></div>""")
    assert(CitationExtract.nextPageRef(disabled, "col-citations").isEmpty)
  }
}
