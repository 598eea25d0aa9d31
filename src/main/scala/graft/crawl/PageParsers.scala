package graft.crawl

import java.util.regex.Pattern
import graft.extract.{ArxivExtract, ConferenceExtract, MarkdownConvert, MiniHtml}
import graft.frontier.FrontierEntry
import graft.url.UrlCanon

/** Per-page-kind parser dispatch: one fetched page → (records, out-links).
  * Pure and deterministic — runs inside `Dataset.flatMap` on executors and
  * inside the sequential simulator, guaranteeing both see identical bytes.
  *
  * Rank packing (the O1 total order): seed(12) | depth(6) | pageIdx(16) |
  * posInPage(16) | itemIdx(12) — see [[FrontierEntry.rank]]; records get
  * the page's rank plus their in-page item index in the low 12 bits
  * (document order, `re.finditer` order in the reference —
  * arxiv/search_pdf_string.py:61).
  *
  * Every record carries its `parser` family (provenance — sinks and the
  * citation pipeline filter on it, never on URL shape) and a `doi` (the
  * ICRA family extracts one, conference/ICRA.py:47; empty elsewhere).
  */
object PageParsers {

  final case class CrawlRecord(
      url: String,
      label: String,
      title: String,
      abstract_text: String,
      extracted_md: String,
      doi: String,
      parser: String,
      crawl_rank: Long
  )

  final case class OutLink(url: String, kind: String, seed: Int, depth: Int,
      pageIdx: Int, posInPage: Int)

  final case class ParseResult(records: Vector[CrawlRecord],
      links: Vector[OutLink])

  private val FlakyRe =
    Pattern.compile("<meta name=\"flaky\" content=\"(\\d+)\">")

  /** Fetch simulation over the pages table: a page whose html carries a
    * flaky marker fails its first n attempts with 503 (retry semantics
    * R2/R3, conference/ICML.py:47-52); a missing page is 404.
    */
  def fetchStatus(html: Option[String], attempts: Int): Int = html match {
    case None => 404
    case Some(h) =>
      val m = FlakyRe.matcher(h)
      if (m.find() && attempts < m.group(1).toInt) 503 else 200
  }

  /** Parse a successfully-fetched page according to its kind. */
  def parse(e: FrontierEntry, html: String): ParseResult = e.kind match {
    case "search"     => parseSearch(e, html)
    case "paper"      => parsePaper(e, html)
    case "blog"       => parseBlog(e, html)
    case "cite"       => parseCite(e, html)
    case "list"       => parseListing(e, html)
    case "icra_index" => parseIcraIndex(e, html)
    case "icra"       => parseIcraProc(e, html)
    case "isca_index" => parseIscaIndex(e, html)
    case "isca"       => parseIscaYear(e, html)
    case "icml"       => parseIcmlVolume(e, html)
    case "cvf"        => parseCvfDay(e, html)
    case "cvf_index"  => parseCvfIndex(e, html)
    case "repo"       => parseRepo(e, html)
    case _            => ParseResult(Vector.empty, Vector.empty)
  }

  /** Daily listing page (§3.2, new.py:36-49): one record carrying the
    * listing's date (label "listing", title = "YYYY-MM-DD"); out-links =
    * the dl[1] article urls in document order at depth+1 — they resolve
    * to abs pages whose E4+E9 digests feed the per-subject digest sink.
    */
  private def parseListing(e: FrontierEntry, html: String): ParseResult = {
    val (urls, date) = graft.extract.ArxivExtract.parseListing(html)
    val links = urls.zipWithIndex.map { case (u, i) =>
      OutLink(UrlCanon.resolve(e.url, u), "paper", e.seed, e.depth + 1,
        e.pageIdx, i)
    }
    ParseResult(
      Vector(CrawlRecord(e.url, "listing", date, "", "", "", "list",
        e.crawlRank)),
      links)
  }

  /** Search result page: E2 item parse → records; out-links = sibling
    * result pages (pagination, from page 0 only — E18/E19) + each item's
    * abs page at depth+1.
    */
  private def parseSearch(e: FrontierEntry, html: String): ParseResult = {
    val (items, _) = ArxivExtract.parseArxivResult(html, "")
    val records = items.zipWithIndex.map { case (it, i) =>
      CrawlRecord(it.url, it.label, it.title, it.abstractText, "", "",
        "search", e.crawlRank | i.toLong)
    }
    val absRe = Pattern.compile("<a href=\"([^\"]+)\">abs</a>")
    val absLinks = {
      val m = absRe.matcher(html)
      val b = Vector.newBuilder[String]
      while (m.find()) b += m.group(1)
      b.result()
    }
    val itemLinks = absLinks.zipWithIndex.map { case (u, i) =>
      OutLink(UrlCanon.resolve(e.url, u), "paper", e.seed, e.depth + 1,
        e.pageIdx, i)
    }
    val pageLinks =
      if (e.pageIdx != 0) Vector.empty
      else ArxivExtract.getPages(e.url, html).zipWithIndex.collect {
        case (u, i) if i > 0 =>
          OutLink(u, "search", e.seed, e.depth, i, 0)
      }
    ParseResult(records, pageLinks ++ itemLinks)
  }

  /** Article abs page: E4 field extraction + E9 digest; terminal (no
    * out-links).
    */
  private def parsePaper(e: FrontierEntry, html: String): ParseResult = {
    ArxivExtract.extractAbsFields(html) match {
      case None => ParseResult(Vector.empty, Vector.empty)
      case Some(f) =>
        val md = ArxivExtract.digest(f, e.url)
        ParseResult(
          Vector(CrawlRecord(e.url, f.comments, f.title, f.abstractText, md,
            "", "paper", e.crawlRank)),
          Vector.empty)
    }
  }

  /** Citation page (§3.3): J1 positional zip + J3 link cascade → citation
    * records (id in `label`, the O2 sort key); R5 pagination: follow the
    * pager's next link (same depth, pageIdx+1) until disabled.
    */
  private def parseCite(e: FrontierEntry, html: String): ParseResult = {
    val doc = MiniHtml.parse(html)
    val cits = graft.extract.CitationExtract
      .extractCitations(doc, "col-references")
    val records = cits.zipWithIndex.map { case (c, i) =>
      CrawlRecord(c.url, c.id, c.title, "", "", "", "cite",
        e.crawlRank | i.toLong)
    }
    val next = graft.extract.CitationExtract.nextPageRef(doc, "col-references")
      .map(href => OutLink(UrlCanon.resolve(e.url, href), "cite", e.seed,
        e.depth, e.pageIdx + 1, 0))
    ParseResult(records, next.toVector)
  }

  /** Blog page: E12 HTML→Markdown byte-contract + recursive descent (R6):
    * child links in document order at depth+1.
    */
  private def parseBlog(e: FrontierEntry, html: String): ParseResult = {
    val doc = MiniHtml.parse(html)
    val md = MarkdownConvert.convertHtmlToMarkdown(doc, e.url, "out", "out/img")
    val target = MarkdownConvert.cleanHtml(doc)
    val links = target.findAll("a").flatMap(_.attr("href")).zipWithIndex
      .map { case (href, i) =>
        OutLink(UrlCanon.resolve(e.url, href), "blog", e.seed, e.depth + 1,
          e.pageIdx, i)
      }.toVector
    ParseResult(
      Vector(CrawlRecord(e.url, "", MarkdownConvert.firstValidText(target),
        "", md, "", "blog", e.crawlRank)),
      links)
  }

  /** ICRA publications index (conference/ICRA.py:67-77): `/pub…` hrefs →
    * proceedings pages at depth+1, no records.
    */
  private def parseIcraIndex(e: FrontierEntry, html: String): ParseResult = {
    val links = ConferenceExtract.parseIcraIndex(html).zipWithIndex.map {
      case (u, i) => OutLink(u, "icra", e.seed, e.depth + 1, e.pageIdx, i)
    }
    ParseResult(Vector.empty, links)
  }

  /** ICRA proceedings page (conference/ICRA.py:30-50): one year meta
    * record (label "year" — the reference groups its output dir by year)
    * + one record per article with its DOI; terminal.
    */
  private def parseIcraProc(e: FrontierEntry, html: String): ParseResult = {
    val (year, items) = ConferenceExtract.parseIcraProceedings(html)
    val meta = CrawlRecord(e.url, "year", year, "", "", "", "icra",
      e.crawlRank)
    val records = items.zipWithIndex.map { case (it, i) =>
      CrawlRecord(it.url, it.label, it.title, "", "", it.doi, "icra",
        e.crawlRank | (i + 1).toLong)
    }
    ParseResult(meta +: records, Vector.empty)
  }

  /** ISCA archive index (conference/ISCA.py:102-111): year links with the
    * F6 filter (≤ 2016) → year pages at depth+1, no records.
    */
  private def parseIscaIndex(e: FrontierEntry, html: String): ParseResult = {
    val links = ConferenceExtract.parseIscaIndex(html).zipWithIndex.map {
      case ((_, href), i) =>
        OutLink(UrlCanon.resolve(e.url, href), "isca", e.seed, e.depth + 1,
          e.pageIdx, i)
    }
    ParseResult(Vector.empty, links)
  }

  /** ISCA year page (conference/ISCA.py:80-92): per-card category +
    * .html→.pdf link + sanitized `{title}_{year}.pdf` file name; the year
    * comes from the page URL's 4-digit run (the reference passes the index
    * link TEXT down the call chain — in our fixture text == the URL year,
    * which is also true of the real archive's layout); terminal.
    */
  private def parseIscaYear(e: FrontierEntry, html: String): ParseResult = {
    val yearRe = Pattern.compile("(\\d{4})")
    val lastSeg = e.url.substring(e.url.lastIndexOf('/') + 1)
    val m = yearRe.matcher(lastSeg)
    val year = if (m.find()) m.group(1) else "0000"
    val items = ConferenceExtract.parseIscaYearPage(html, e.url, year)
    val records = items.zipWithIndex.map { case (it, i) =>
      CrawlRecord(it.url, it.category, it.fileName, "", "", "", "isca",
        e.crawlRank | i.toLong)
    }
    ParseResult(records, Vector.empty)
  }

  /** ICML/mlr.press volume page (conference/ICML.py:61-76): pdf links via
    * the unescaped-dot lookaround regex; label = the title's year (the
    * reference's `output_year` dir suffix), title = the downloaded file
    * name; terminal.
    */
  private def parseIcmlVolume(e: FrontierEntry, html: String): ParseResult = {
    val (year, items) = ConferenceExtract.parseIcmlProceedings(html)
    val records = items.zipWithIndex.map { case (it, i) =>
      CrawlRecord(it.downloadUrl, year, it.fileName, "", "", "", "icml",
        e.crawlRank | i.toLong)
    }
    ParseResult(records, Vector.empty)
  }

  /** CVF open-access day page (openaccess.py:71-116): pdf links → records
    * (download url + '/'-basename file name, label = the conference+year
    * path segment — the reference's output/ctype/year layout). When the
    * seed `?day=all` page has NO links, fall through to the conference
    * INDEX page for the day list (openaccess.py:57-68: `if get_… return`
    * else enumerate Day pages).
    */
  private def parseCvfDay(e: FrontierEntry, html: String): ParseResult = {
    val items = ConferenceExtract.parseCvfPdfLinks(html)
    if (items.isEmpty && e.pageIdx == 0) {
      val q = e.url.indexOf('?')
      val base = if (q >= 0) e.url.substring(0, q) else e.url
      ParseResult(Vector.empty,
        Vector(OutLink(base, "cvf_index", e.seed, e.depth + 1, 0, 0)))
    } else {
      val confYear = {
        val path = e.url.substring(e.url.indexOf("//") + 2)
        path.split("[/?]").lift(1).getOrElse("")
      }
      val records = items.zipWithIndex.map { case (it, i) =>
        CrawlRecord(it.downloadUrl, confYear, it.fileName, "", "", "", "cvf",
          e.crawlRank | i.toLong)
      }
      ParseResult(records, Vector.empty)
    }
  }

  /** CVF conference index: the Day-page suffix list (openaccess.py:64) →
    * one out-link per day page at depth+1.
    */
  private def parseCvfIndex(e: FrontierEntry, html: String): ParseResult = {
    val links = ConferenceExtract.parseCvfDayPages(html).zipWithIndex.map {
      case (suffix, i) =>
        OutLink(e.url + suffix, "cvf", e.seed, e.depth + 1, i + 1, 0)
    }
    ParseResult(Vector.empty, links)
  }

  /** GitHub repo search (getrepository.py): page 0 is the driver page —
    * GetPageNum from the pagination div, then GenUrls fan-out (E19,
    * including the p=1 twin of the main page, exactly as the reference
    * re-fetches it); result pages parse repo hrefs into clone records
    * labeled by their 0-based page dir (`page_{i}`, the K5 layout).
    */
  private def parseRepo(e: FrontierEntry, html: String): ParseResult = {
    if (e.pageIdx == 0) {
      val n = ConferenceExtract.parseRepoPageNum(html)
      val links = ArxivExtract.genUrls(e.url, n).zipWithIndex.map {
        case (u, i) => OutLink(u, "repo", e.seed, e.depth, i + 1, 0)
      }
      ParseResult(Vector.empty, links)
    } else {
      val records = ConferenceExtract.parseRepoUrls(html).zipWithIndex.map {
        case (href, i) =>
          val (name, cloneUrl) = ConferenceExtract.repoCloneTarget(href)
          CrawlRecord(cloneUrl, s"page_${e.pageIdx - 1}", name, "", "", "",
            "repo", e.crawlRank | i.toLong)
      }
      ParseResult(records, Vector.empty)
    }
  }
}
