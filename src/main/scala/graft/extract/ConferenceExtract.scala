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

  // ---- ICML / mlr.press proceedings (conference/ICML.py) -----------------

  /** The reference's volume enumeration (conference/ICML.py:20-23) — an
    * R9-style generator source: type → volume ids → proceedings URLs.
    */
  val IcmlVolumes: Map[String, Vector[String]] = Map(
    "ICML" -> Vector("184", "162", "139", "119", "97", "80", "70", "48",
      "37", "32", "28", "27"),
    "ACML" -> Vector("189", "157", "129", "101", "95", "77", "63", "45",
      "39", "29", "25", "20", "13"),
    "KDD" -> Vector("185", "150", "127", "104", "92", "71", "18", "7"))

  def icmlVolumeUrls(tpe: String): Vector[String] =
    IcmlVolumes(tpe).map(id => s"http://proceedings.mlr.press/v$id/")

  final case class IcmlItem(downloadUrl: String, fileName: String)

  // bug-compat: the reference's lookahead is `(?=.pdf" target="_blank)` —
  // the DOT IS UNESCAPED, so any character followed by `pdf"` terminates
  // the capture
  private val IcmlLinkRe = Pattern.compile(
    "(?<=href=\").+?(?=.pdf\" target=\"_blank)")
  private val HtmlTitleRe = Pattern.compile("(?<=<title>).*?(?=</title>)")
  private val Year4Re = Pattern.compile("\\b\\d{4}\\b")

  /** GetPaper (conference/ICML.py:61-76): pdf-link prefixes via the
    * lookaround regex; year = first 4-digit run of the `<title>`; per
    * link: file name = last '/'-segment + ".pdf", download url = last
    * '"'-segment + ".pdf" (the reference's split-on-quote guard).
    */
  def parseIcmlProceedings(content: String): (String, Vector[IcmlItem]) = {
    val year = {
      val tm = HtmlTitleRe.matcher(content)
      if (tm.find()) {
        val ym = Year4Re.matcher(tm.group())
        if (ym.find()) ym.group() else ""
      } else ""
    }
    val items = Vector.newBuilder[IcmlItem]
    val m = IcmlLinkRe.matcher(content)
    while (m.find()) {
      val url = m.group()
      items += IcmlItem(url.split('"').last + ".pdf",
        url.split('/').last + ".pdf")
    }
    (year, items.result())
  }

  /** ICLR / openreview pdf links (conference/ICLR.py:62): hrefs between
    * `/pdf` and the `pdf-link` class; download url prefixes
    * https://openreview.net/pdf, file name = last '='-segment + ".pdf".
    */
  private val IclrLinkRe = Pattern.compile(
    "(?<=href=\"/pdf).+?(?=\" class=\"pdf-link)")
  def parseIclrPdfLinks(content: String): Vector[IcmlItem] = {
    val out = Vector.newBuilder[IcmlItem]
    val m = IclrLinkRe.matcher(content)
    while (m.find()) {
      val link = m.group()
      out += IcmlItem("https://openreview.net/pdf" + link,
        link.split('=').last + ".pdf")
    }
    out.result()
  }

  // ---- CVF open-access (conference/openaccess.py) ------------------------

  /** Day-page suffixes (openaccess.py:64): the reference's alternation —
    * an (empty-lookbehind) GREEDY `\?.+` ending before `">Day`, or a
    * single-quoted href before `'>Day`. The greedy first branch runs to
    * the LAST `">Day` on the line — bug-compat preserved.
    */
  private val CvfDayRe = Pattern.compile(
    "\\?.+(?=\">Day)|(?<=href=').+(?='>Day)")
  def parseCvfDayPages(content: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = CvfDayRe.matcher(content)
    while (m.find()) out += m.group()
    out.result()
  }

  /** Pdf links (openaccess.py:77): lazy capture between `href="`/`href='`
    * and `">pdf`, required to end in `pdf`; download url prefixes the
    * hardcoded site root, file name = last '/'-segment (openaccess.py:
    * 96,106).
    */
  private val CvfPdfRe = Pattern.compile(
    "(?<=href=\").+?pdf(?=\">pdf)|(?<=href=').+?pdf(?='>pdf)")
  def parseCvfPdfLinks(content: String): Vector[IcmlItem] = {
    val out = Vector.newBuilder[IcmlItem]
    val m = CvfPdfRe.matcher(content)
    while (m.find()) {
      val url = m.group()
      out += IcmlItem("http://openaccess.thecvf.com/" + url,
        url.split('/').last)
    }
    out.result()
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
