package graft.extract

import java.util.regex.Pattern

/** Byte-contract extraction for the conference-family crawlers (ICRA,
  * ISCA) and the GitHub repo-search crawler — the parser families the
  * reference runs beside the arXiv ones. Each function replicates the
  * observable semantics of the cited reference code.
  */
object ConferenceExtract {

  // ---- ICRA / iaarc proceedings (conference/ICRA.py) ---------------------

  final case class IcraItem(url: String, doi: String, label: String,
      title: String)

  private val IcraYearRe = Pattern.compile("(?d)<h2>(\\d{4})\\b.*?</h2>")
  private val IcraPatchRe = Pattern.compile(
    "(?s)<div class=\"article compact\">.*?" +
      "(?=<div class=\"article compact\">|</div></div>)")
  // doi text: NO DOTALL in the reference — greedy `.*` runs to the LAST
  // </a> on the doi anchor's line
  private val IcraDoiRe = Pattern.compile("(?d)<a href=\"https://doi[^>]+>(.*)</a>")
  private val IcraPdfRe = Pattern.compile(
    "(?d)<a href=\"([^\"]+)\">Download fulltext</a>")
  // title: first anchor in the patch whose text has no nested tags
  private val IcraTitleRe = Pattern.compile("(?s)<a href=\"[^\"]+\">([^<]+)</a>")

  /** GetPDFUrl (conference/ICRA.py:30-50): page year from the first
    * `<h2>YYYY…</h2>` ("0000" absent); items from `article compact` div
    * patches needing doi + fulltext + title anchors; spaces in the pdf
    * path %20-escaped; url prefixed with the publications root exactly as
    * the reference hardcodes it.
    */
  def parseIcraProceedings(content: String): (String, Vector[IcraItem]) = {
    val ym = IcraYearRe.matcher(content)
    val year = if (ym.find()) ym.group(1) else "0000"
    val items = Vector.newBuilder[IcraItem]
    val pm = IcraPatchRe.matcher(content)
    while (pm.find()) {
      val patch = pm.group()
      val doiM = IcraDoiRe.matcher(patch)
      val pdfM = IcraPdfRe.matcher(patch)
      val titleM = IcraTitleRe.matcher(patch)
      if (doiM.find() && pdfM.find() && titleM.find()) {
        val pdfUrl = pdfM.group(1).replace(" ", "%20") // fix for space
        items += IcraItem(
          "https://www.iaarc.org/publications/" + pdfUrl,
          doiM.group(1), "pdf", ArxivExtract.removeTags(titleM.group(1)))
      }
    }
    (year, items.result())
  }

  /** ICRA index ParseUrls (conference/ICRA.py:67-77): every `/pub…` href,
    * `&amp;` unescaped, prefixed with the hardcoded site root.
    */
  private val IcraIndexRe = Pattern.compile("(?d)<a\\s+href=\"(/pub[^\"]+)\"")
  def parseIcraIndex(content: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = IcraIndexRe.matcher(content)
    while (m.find())
      out += "https://www.iaarc.org" + m.group(1).replace("&amp;", "&")
    out.result()
  }

  // ---- ISCA archive (conference/ISCA.py) ---------------------------------

  final case class IscaItem(category: String, url: String, fileName: String)

  /** SanitizeFilename (conference/ISCA.py:70-71). */
  def sanitizeFilename(name: String): String =
    name.replace('/', '_').replace('\\', '_')

  /** GetPaper's card walk (conference/ISCA.py:80-92): per
    * `div.w3-card w3-round w3-white w3-padding` card, category from the
    * `h4.w3-center` text (stripped); per `a.w3-text` link:
    *   url   = dirname(pageUrl) + '/' + href.replace("html", "pdf")
    *           — Python str.replace: EVERY occurrence of "html" in the
    *           href changes, not just the extension (bug-compat);
    *   title = the anchor's first `p` full text, stripped, first line;
    *   file  = f"{sanitize(title)}_{year}.pdf".
    */
  def parseIscaYearPage(html: String, pageUrl: String,
      year: String): Vector[IscaItem] = {
    val doc = MiniHtml.parse(html)
    val prefix = { // os.path.dirname of the url
      val i = pageUrl.lastIndexOf('/')
      if (i >= 0) pageUrl.substring(0, i) else pageUrl
    }
    doc.findAllByClass("div", "w3-card w3-round w3-white w3-padding")
      .flatMap { card =>
        val category = card.findFirstByClass("h4", "w3-center")
          .map(_.getText.trim).getOrElse("")
        card.findAllByClass("a", "w3-text").flatMap { a =>
          a.attr("href").flatMap { href =>
            a.findFirst("p").map { p =>
              val title = p.getText.trim.split("\n")(0)
              IscaItem(category, prefix + "/" + href.replace("html", "pdf"),
                s"${sanitizeFilename(title)}_$year.pdf")
            }
          }
        }
      }
  }

  /** ISCA archive index (conference/ISCA.py:102-111): year links are the
    * `a.w3-text-blue w3-margin` anchors inside `div.w3-container
    * w3-padding`; only years ≤ 2016 are crawled (F6: `if 2016 < int(year):
    * continue`). Returns (yearText, href) pairs that survive the filter.
    */
  def parseIscaIndex(html: String): Vector[(String, String)] = {
    val doc = MiniHtml.parse(html)
    doc.findFirstByClass("div", "w3-container w3-padding").toVector
      .flatMap(_.findAllByClass("a", "w3-text-blue w3-margin"))
      .flatMap { a =>
        a.attr("href").map(h => (a.getText, h))
      }
      .filter { case (y, _) =>
        scala.util.Try(y.trim.toInt).toOption.exists(_ <= 2016)
      }
  }

  // ---- GitHub repo search (getrepository.py) -----------------------------

  /** GetPageNum (getrepository.py:58-72): the pagination div is the first
    * div whose class contains all three marker tokens; total pages = the
    * SECOND-TO-LAST anchor's text (the last is "Next"); 0 when absent.
    */
  def parseRepoPageNum(html: String): Int = {
    val doc = MiniHtml.parse(html)
    val div = doc.findAll("div").find { d =>
      d.attr("class").exists(c => c.contains("Box-sc-g0xbh4-0") &&
        c.contains("gukfho") && c.contains("TablePaginationSteps"))
    }
    div.map { d =>
      val links = d.findAll("a")
      if (links.length >= 2) links(links.length - 2).getText.trim.toInt
      else 0
    }.getOrElse(0)
  }

  /** ParseUrls (getrepository.py:74-79): repo hrefs = anchors with the
    * EXACT styled-link class inside the `data-testid="results-list"` div.
    */
  def parseRepoUrls(html: String): Vector[String] = {
    val doc = MiniHtml.parse(html)
    doc.findAll("div")
      .filter(_.attr("data-testid").contains("results-list"))
      .flatMap(_.findAll("a"))
      .filter(_.attr("class").contains("Link__StyledLink-sc-14289xe-0 dheQRw"))
      .flatMap(_.attr("href"))
  }

  /** The clone-name derivation (getrepository.py:174-176): an href
    * "/owner/name" becomes "name_owner"; the clone url prefixes the site.
    */
  def repoCloneTarget(href: String): (String, String) = {
    val parts = href.split("/")
    (s"${parts(2)}_${parts(1)}", "https://github.com" + href)
  }
}
