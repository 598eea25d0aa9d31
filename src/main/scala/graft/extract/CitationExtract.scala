package graft.extract

import MiniHtml.Element

/** One-hop citation-graph extraction (arxiv/citations.py:50-84):
  * the positional zip of bib-paper × bib-paper-links divs (J1) and the
  * prioritized link cascade arxiv > doi > any (J3).
  */
object CitationExtract {

  /** {title, url, id} — `id` is the sort key (citations.py:83,145). */
  final case class Citation(title: String, url: String, id: String)

  /** extract_citations(soup, type): type is 'col-references' or
    * 'col-citations' (citations.py:29-32).
    */
  def extractCitations(doc: Element, divId: String): Vector[Citation] = {
    doc.findById(divId) match {
      case None => Vector.empty
      case Some(div) =>
        val papers = div.findAllByClass("div", "bib-paper")
        val linkDivs = div.findAllByClass("div", "bib-paper-links")
        papers.zip(linkDivs).flatMap { case (citation, linkDiv) =>
          citation.findFirstByClass("a", "notinfluential mathjax").map { tt =>
            val title = PyStr.strip(tt.getText, null)
            val hrefs = linkDiv.findAll("a").flatMap(_.attr("href"))
            // cascade: arxiv.org → id = href[22:], abs→pdf
            hrefs.find(_.contains("arxiv.org")) match {
              case Some(h) =>
                Citation(title, h.replace("abs", "pdf"), PyStr.slice(h, 22, h.length))
              case None =>
                hrefs.find(_.contains("doi.org")) match {
                  case Some(h) => Citation(title, h, PyStr.slice(h, 16, h.length))
                  case None =>
                    Citation(title, hrefs.find(_.nonEmpty).getOrElse(null), "")
                }
            }
          }
        }
    }
  }

  /** The citations pager "next" link (citations.py:120-124): an `a` whose
    * title contains "Page" and text contains "▶"; None when disabled.
    */
  def nextPageRef(doc: Element, divId: String): Option[String] =
    doc.findById(divId).flatMap { div =>
      div.findAll("a").find { a =>
        a.attr("title").exists(_.contains("Page")) && a.getText.contains("▶")
      }.filterNot(_.attr("class").exists(_.contains("disabled")))
        .flatMap(_.attr("href"))
    }
}
