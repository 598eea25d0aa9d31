package graft.fixtures

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic web matching the BASELINE.json input_hint shape
  * `pages(url, warc_ts, html, text, lang)` — both test fixture and bench
  * input (FIXTURES.md). All content is a pure function of (seed, host id,
  * page id): no Random, no wall clock, so any two runs (and the engine vs
  * the sequential simulator) see byte-identical bytes.
  *
  * Site families (each exercises specific reference branches):
  *   - search hosts `search{h}.example.org` — result pages with
  *     `<li class="arxiv-result">` blocks and an "of N" total driving the
  *     pagination math (arxiv/search_pdf_string.py:96-109); items link to
  *     article pages on the paired paper host.
  *   - paper hosts `papers{h}.example.org` — abs-style article pages with
  *     title/date/abstract/comments branches (arxiv.py:108-149).
  *   - blog hosts `blog{h}.example.org` — nested list/heading/sup/sub pages
  *     with relative links, driving HTML→Markdown (text/architectural_119
  *     .py:104-168) and recursive descent (depth > 1).
  *   - flaky pages — every page whose pageId % 7 == 3 on a flaky host
  *     carries a `<meta name="flaky" content="n">` marker: the fetch
  *     simulator fails its first n attempts (conference/ICML.py:47-52).
  *
  * Scale knobs per FIXTURES.md §7: (seed, nHosts, pagesPerHost,
  * itemsPerPage, skewFactor). Generation is distributed (`spark.range` →
  * `map`), never a driver-side loop — at bench scale this builds millions
  * of pages in parallel.
  */
object SyntheticWeb {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
      text: String, lang: String)

  final case class Config(
      seed: Long = 42L,
      nHosts: Int = 4,
      pagesPerHost: Int = 3, // search result pages per search host
      itemsPerPage: Int = 5, // items per result page
      blogDepth: Int = 2, // levels of nested blog pages
      blogFanout: Int = 3, // child links per blog page
      skewFactor: Double = 0.0 // >0: host 0 gets extra pages (zipf-ish)
  )

  /** Deterministic 64-bit mix (splitmix64 finalizer) — the only "entropy". */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a13ed58e84d5L
    z ^ (z >>> 31)
  }

  def searchHost(h: Int) = s"search$h.example.org"
  def paperHost(h: Int) = s"papers$h.example.org"
  def blogHost(h: Int) = s"blog$h.example.org"
  def citeHost(h: Int) = s"cite$h.example.org"
  def listHost(h: Int) = s"list$h.example.org"

  /** Number of result pages for search host h (skew: host 0 inflated). */
  def pagesFor(cfg: Config, h: Int): Int =
    if (h == 0 && cfg.skewFactor > 0)
      math.max(1, (cfg.pagesPerHost * (1 + cfg.skewFactor)).toInt)
    else cfg.pagesPerHost

  def searchSeedUrl(h: Int) = s"https://${searchHost(h)}/search?q=q$h"
  def searchPageUrl(h: Int, p: Int): String =
    if (p == 0) searchSeedUrl(h) else s"${searchSeedUrl(h)}&start=${200 * p}"

  def paperId(cfg: Config, h: Int, p: Int, i: Int): String = {
    val n = math.abs(mix(cfg.seed ^ (h.toLong << 40) ^ (p.toLong << 20) ^ i))
    f"24${n % 100000}%05d.${n % 99999}%05d"
  }
  def paperAbsUrl(cfg: Config, h: Int, p: Int, i: Int): String =
    s"https://${paperHost(h)}/abs/${paperId(cfg, h, p, i)}"
  def paperPdfUrl(cfg: Config, h: Int, p: Int, i: Int): String =
    s"https://${paperHost(h)}/pdf/${paperId(cfg, h, p, i)}"

  def blogUrl(h: Int, path: String) = s"https://${blogHost(h)}/$path"

  private val Words = Vector("frontier", "lattice", "spectral", "manifold",
    "gradient", "sparse", "robust", "neural", "causal", "quantum", "optimal",
    "convex", "dynamic", "latent", "adaptive", "bayesian")
  private val Confs = Vector("CVPR", "ICCV", "ECCV", "ICML", "ICLR", "AAAI")
  private val Months = Vector("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  def titleOf(cfg: Config, h: Int, p: Int, i: Int): String = {
    val n = mix(cfg.seed ^ (h.toLong << 41) ^ (p.toLong << 21) ^ (i + 7))
    val w = (k: Int) => Words((math.abs(n >> (k * 4)) % Words.size).toInt)
    s"${w(0).capitalize} ${w(1)} ${w(2)} for ${w(3)} ${w(4)} estimation"
  }

  def labelsOf(cfg: Config, h: Int, p: Int, i: Int): Vector[String] = {
    val n = math.abs(mix(cfg.seed ^ (h.toLong << 42) ^ (p.toLong << 22) ^ (i + 13)))
    val pool = Vector("cs.LG", "cs.CV", "stat.ML", "cs.AI", "math.OC")
    val k = 1 + (n % 3).toInt
    (0 until k).map(j => pool(((n >> (8 * j)) % pool.size).toInt)).toVector.distinct
  }

  def abstractOf(cfg: Config, h: Int, p: Int, i: Int): String = {
    val n = mix(cfg.seed ^ (h.toLong << 43) ^ (p.toLong << 23) ^ (i + 29))
    val w = (k: Int) => Words((math.abs(n >> (k * 3)) % Words.size).toInt)
    s"We study ${w(0)} ${w(1)} methods and prove ${w(2)} bounds " +
      s"under ${w(3)} assumptions, improving ${w(4)} baselines."
  }

  def dateOf(cfg: Config, h: Int, p: Int, i: Int): (Int, String, Int) = {
    val n = math.abs(mix(cfg.seed ^ (h.toLong << 44) ^ (p.toLong << 24) ^ (i + 31)))
    (1 + (n % 28).toInt, Months(((n >> 8) % 12).toInt), 2020 + ((n >> 16) % 5).toInt)
  }

  def tsOf(cfg: Config, key: Long): Timestamp =
    new Timestamp(1700000000000L + math.abs(mix(cfg.seed ^ key)) % (86400L * 1000 * 365))

  // ---- page HTML builders ------------------------------------------------

  /** Search result page: total marker + one li block per item
    * (branch coverage: full-vs-short abstract, cs.CV preference).
    */
  def searchPageHtml(cfg: Config, h: Int, p: Int): String = {
    val totalItems = pagesFor(cfg, h).toLong * cfg.itemsPerPage *
      (200 / cfg.itemsPerPage) // scale so ceil(total/200) == pagesFor
    val items = (0 until cfg.itemsPerPage).map { i =>
      val labels = labelsOf(cfg, h, p, i)
      val spans = labels.map(l => s"""<span class="tag">$l</span>""").mkString
      val (d, mon, y) = dateOf(cfg, h, p, i)
      val abs = abstractOf(cfg, h, p, i)
      val absSpan =
        if (i % 3 == 0)
          s"""<span class="abstract-short">$abs <a href="#">More</a></span>"""
        else
          s"""<span class="abstract-full">$abs
             |Submitted $d $mon, $y; originally announced $mon $y.</span>""".stripMargin
      s"""<li class="arxiv-result">
         |$spans
         |<p class="title is-5 mathjax"> ${titleOf(cfg, h, p, i)} </p>
         |<a href="${paperPdfUrl(cfg, h, p, i)}">pdf</a>
         |<a href="${paperAbsUrl(cfg, h, p, i)}">abs</a>
         |$absSpan
         |</li>""".stripMargin
    }.mkString("\n")
    s"""<html><body>
       |<h1>Showing 1&ndash;${cfg.itemsPerPage} of ${"%,d".format(totalItems)} results</h1>
       |<ol>$items</ol>
       |</body></html>""".stripMargin
  }

  /** Article abs page exercising the E4 branches (arxiv.py:108-149):
    * comments empty / plain / with-span; date in div[2] with div[1]
    * fallback for i%5==0.
    */
  def paperPageHtml(cfg: Config, h: Int, p: Int, i: Int): String = {
    val (d, mon, y) = dateOf(cfg, h, p, i)
    val flaky = if (isFlaky(cfg, h, p, i)) flakyMeta(cfg, h, p, i) else ""
    val comments = (i % 3) match {
      case 0 => ""
      case 1 =>
        s"""<tr><td class="tablecell label">Comments:</td>
           |<td class="tablecell comments mathjax">Accepted to ${Confs(i % Confs.size)} $y</td></tr>""".stripMargin
      case _ =>
        // whitespace-only first text node in td[2] drives the span-fallback
        // branch of GetComments (arxiv.py:110-113)
        s"""<tr><td class="tablecell label">Comments:</td>
           |<td class="tablecell comments mathjax">
           |<span>Camera ready, ${Confs(i % Confs.size)} $y</span></td></tr>""".stripMargin
    }
    val dateBlock =
      if (i % 5 == 0)
        // div[2] text contains "," ⇒ GetDate falls back to div[1]
        s"""<div class="dateline">[Submitted on $d $mon $y]</div><div class="extra">,</div>"""
      else
        s"""<div class="leftcolumn">misc</div><div class="dateline">[Submitted on $d $mon $y]</div>"""
    // the abs-root xpath (arxiv.py: body/div/main/div/div/div/div/div)
    s"""<html>$flaky<body><div><main><div><div><div><div><div class="abs">
       |$dateBlock
       |<h1 class="title mathjax"><span class="descriptor">Title:</span>${titleOf(cfg, h, p, i)}</h1>
       |<blockquote class="abstract mathjax">
       |<span class="descriptor">Abstract:</span>${abstractOf(cfg, h, p, i)}
       |</blockquote>
       |<div class="metatable"><table><tbody>$comments</tbody></table></div>
       |</div></div></div></div></div></main></div></body></html>""".stripMargin
  }

  /** Blog page: nested lists, headings, sup/sub, relative child links. Leaf
    * pages (depth == cfg.blogDepth) have no children.
    */
  def blogPageHtml(cfg: Config, h: Int, path: String, depth: Int): String = {
    val n = mix(cfg.seed ^ path.hashCode.toLong ^ (h.toLong << 17))
    val w = (k: Int) => Words((math.abs(n >> (k * 5)) % Words.size).toInt)
    val children =
      if (depth >= cfg.blogDepth) ""
      else (0 until cfg.blogFanout).map { c =>
        s"""<li><a href="/$path/c$c">${w(c)} chapter $c</a></li>"""
      }.mkString(s"""<ul>""", "\n", "</ul>")
    s"""<html><body><div class="b_con">
       |<h${math.min(depth + 1, 6)}>${w(0)} notes $path</h${math.min(depth + 1, 6)}>
       |<p>Rate  is  x<sup>2</sup> over H<sub>0</sub> for ${w(1)} ${w(2)}.</p>
       |<ol><li>first ${w(3)}</li><li>second ${w(4)}</li></ol>
       |$children
       |</div></body></html>""".stripMargin
  }

  // ---- listing site (new.py:36-49, §3.2 daily-digest pipeline) -----------

  def listPageUrl(h: Int) = s"https://${listHost(h)}/new"
  /** Listing-discovered abs pages live on a synthetic `arxiv.org` host
    * because parseListing prefixes hrefs with the literal
    * "https://arxiv.org" exactly as the reference does (new.py:43).
    */
  def listPaperCoord(h: Int): Int = 1000 + h
  def arxivAbsUrl(cfg: Config, h: Int, i: Int): String =
    s"https://arxiv.org/abs/${paperId(cfg, h, listPaperCoord(h), i)}"

  /** Daily listing page: dl[1] of dt/span/a article hrefs (ONLY_NEW) and
    * a date line with a TWO-digit year (the reference builds the date as
    * "20" + DateNum(line.split(',')[-1]), new.py:48).
    */
  def listPageHtml(cfg: Config, h: Int): String = {
    val (d, mon, y) = dateOf(cfg, h, 999, 0)
    val items = (0 until cfg.itemsPerPage).map { i =>
      val id = paperId(cfg, h, listPaperCoord(h), i)
      s"""<dt><span><a href="/abs/$id">arXiv:$id</a> [pdf]</span></dt>
         |<dd>placeholder</dd>""".stripMargin
    }.mkString("\n")
    s"""<html><body><div><div>
       |<div>Wed, $d $mon ${y % 100}</div>
       |<dl>
       |$items
       |</dl>
       |</div></div></body></html>""".stripMargin
  }

  // ---- citation site (arxiv/citations.py:50-84,112-127) ------------------

  def citePageUrl(h: Int, p: Int) = s"https://${citeHost(h)}/refs?page=$p"
  def citePagesPerHost(cfg: Config): Int = math.max(2, cfg.pagesPerHost - 1)

  def citeId(cfg: Config, h: Int, p: Int, i: Int): String = {
    val n = math.abs(mix(cfg.seed ^ (h.toLong << 47) ^ (p.toLong << 27) ^ (i + 41)))
    f"24${(n % 12) + 1}%02d.${n % 99999}%05d"
  }

  /** Paginated citation page: zip-aligned bib-paper/bib-paper-links divs
    * with the arxiv > doi > other link cascade (i%3 selects the branch)
    * and a pager "▶" next link, disabled on the last page.
    */
  def citePageHtml(cfg: Config, h: Int, p: Int): String = {
    val items = (0 until cfg.itemsPerPage).map { i =>
      val id = citeId(cfg, h, p, i)
      val n = mix(cfg.seed ^ (h.toLong << 48) ^ (p.toLong << 28) ^ (i + 53))
      val w = (k: Int) => Words((math.abs(n >> (k * 5)) % Words.size).toInt)
      val links = (i % 3) match {
        case 0 =>
          s"""<a href="https://arxiv.org/abs/$id">arXiv</a>
             |<a href="https://doi.org/10.999/$id">DOI</a>
             |<a href="https://other.example.org/$id">alt</a>""".stripMargin
        case 1 =>
          s"""<a href="https://doi.org/10.999/$id">DOI</a>
             |<a href="https://other.example.org/$id">alt</a>""".stripMargin
        case _ =>
          s"""<a href="https://other.example.org/$id">alt</a>"""
      }
      s"""<div class="bib-paper">
         |<a class="notinfluential mathjax" href="#cite$i">${w(0).capitalize} ${w(1)} and ${w(2)} methods</a>
         |<div class="bib-paper-links">$links</div>
         |</div>""".stripMargin
    }.mkString("\n")
    val last = citePagesPerHost(cfg) - 1
    val pager =
      if (p < last)
        s"""<a title="Next Page" href="/refs?page=${p + 1}">▶</a>"""
      else
        s"""<a title="Next Page" class="disabled" href="#">▶</a>"""
    s"""<html><body><div id="col-references">
       |$items
       |<div class="pagination">$pager</div>
       |</div></body></html>""".stripMargin
  }

  // ---- conference + repo-search families (ICRA.py / ISCA.py /
  // getrepository.py) ------------------------------------------------------

  def icraIndexUrl(h: Int) = s"https://icra$h.example.org/publications/search.php"
  def icraProcsPerHost = 2
  /** Proceedings live on a synthetic `www.iaarc.org` host because the
    * reference prefixes index hrefs with that literal root
    * (conference/ICRA.py:76), exactly like the listing family's literal
    * arxiv.org.
    */
  /** p == 1 proceedings URLs carry an `&sort=year` suffix so the index's
    * `&amp;`-escaped href MUST be unescaped (ICRA.py:76) to resolve — a
    * broken unescape would 404 that page and drop its records, which the
    * CrawlLoopSpec record contract and q46 then catch.
    */
  def icraProcPath(h: Int, p: Int): String =
    if (p == 1) s"/pub_h${h}_y$p&sort=year" else s"/pub_h${h}_y$p"
  def icraProcUrl(h: Int, p: Int) =
    s"https://www.iaarc.org${icraProcPath(h, p)}"
  def icraYear(p: Int): Int = 2014 + p

  def icraIndexHtml(cfg: Config, h: Int): String = {
    val links = (0 until icraProcsPerHost).map { p =>
      val href = icraProcPath(h, p).replace("&", "&amp;")
      s"""<a href="$href">ISARC ${icraYear(p)}</a>"""
    }.mkString("\n")
    s"""<html><body><div class="pubs">\n$links\n</div></body></html>"""
  }

  /** ICRA proceedings page: h2 year + `article compact` patches, each a
    * title anchor (first — the title regex takes the first anchor), a doi
    * anchor, and a "Download fulltext" anchor whose path contains a SPACE
    * (the %20 fixup, ICRA.py:46). Item divs are left unclosed so the final
    * patch terminates at the literal `</div></div>` the finditer lookahead
    * expects (ICRA.py:37).
    */
  def icraProcHtml(cfg: Config, h: Int, p: Int): String = {
    val year = icraYear(p)
    val items = (0 until cfg.itemsPerPage).map { i =>
      val title = titleOf(cfg, h, 500 + p, i)
      s"""<div class="article compact">
         |<a href="#paper$i">$title</a>
         |<a href="https://doi.org/10.22260/ISARC$year-$i">10.22260/ISARC$year-$i</a>
         |<a href="proceedings/$year/paper $i.pdf">Download fulltext</a>
         |""".stripMargin
    }.mkString("")
    s"""<html><body><h2>$year Proceedings of ISARC</h2><div>
       |$items</div></div></body></html>""".stripMargin
  }

  def iscaIndexUrl(h: Int) = s"https://isca$h.example.org/index.html"
  def iscaYears: Seq[Int] = 2014 to 2018 // F6 keeps ≤ 2016
  def iscaYearUrl(h: Int, y: Int) = s"https://isca$h.example.org/conf_$y.html"

  def iscaIndexHtml(cfg: Config, h: Int): String = {
    val links = iscaYears.map { y =>
      s"""<a class="w3-text-blue w3-margin" href="conf_$y.html">$y</a>"""
    }.mkString("\n")
    s"""<html><body><div class="w3-container w3-padding">
       |$links
       |</div></body></html>""".stripMargin
  }

  /** ISCA year page: category cards with `a.w3-text` paper links. i==1
    * hrefs contain "html" INSIDE the path (the replace-all bug-compat
    * case, ISCA.py:86); i==2 titles contain '/' (SanitizeFilename case).
    */
  def iscaYearHtml(cfg: Config, h: Int, y: Int): String = {
    val cards = (0 until 2).map { c =>
      val links = (0 until cfg.itemsPerPage).map { i =>
        val href =
          if (i == 1) s"htmlpapers/c${c}_p$i.html" else s"papers/c${c}_p$i.html"
        val title0 = titleOf(cfg, h, 600 + y, c * 100 + i)
        val title = if (i == 2) title0.replaceFirst(" ", "/") else title0
        s"""<a class="w3-text" href="$href"><p>$title
           |second line ignored</p></a>""".stripMargin
      }.mkString("\n")
      s"""<div class="w3-card w3-round w3-white w3-padding">
         |<h4 class="w3-center"> Track $c </h4>
         |$links
         |</div>""".stripMargin
    }.mkString("\n")
    s"""<html><body>$cards</body></html>"""
  }

  /** ICML/mlr.press volume pages live on a synthetic `proceedings.mlr.press`
    * host (the reference enumerates literal volume URLs, ICML.py:85); two
    * volumes per h keep the fixture small.
    */
  def icmlVolumesPerHost = 2
  def icmlVolumeUrl(h: Int, v: Int) =
    s"http://proceedings.mlr.press/v${100 + h * icmlVolumesPerHost + v}/"

  def icmlVolumeHtml(cfg: Config, h: Int, v: Int): String = {
    val year = 2010 + (h * icmlVolumesPerHost + v) % 14
    val items = (0 until cfg.itemsPerPage).map { i =>
      val stem = s"p${h}v${v}x$i"
      s"""[<a href="https://proceedings.mlr.press/v${100 + h}/$stem/$stem.pdf" target="_blank">pdf</a>]"""
    }.mkString("\n")
    s"""<html><head><title>Proceedings of Machine Learning Research $year</title></head>
       |<body>$items</body></html>""".stripMargin
  }

  /** CVF open-access (openaccess.py): one conference-year per h on the
    * literal thecvf host (the reference prefixes download urls with it).
    * Even h: the `?day=all` page carries all pdf links (the fast branch);
    * odd h: day=all is EMPTY and the index page lists day pages (the
    * fallback branch, openaccess.py:57-68).
    */
  def cvfConf(h: Int): String =
    Vector("CVPR", "ICCV", "WACV")(h % 3) + (2015 + h)
  def cvfBaseUrl(h: Int) = s"http://openaccess.thecvf.com/${cvfConf(h)}"
  def cvfDayAllUrl(h: Int) = s"${cvfBaseUrl(h)}?day=all"
  def cvfDays = Vector("2024-06-19", "2024-06-20")

  def cvfPdfLinksHtml(cfg: Config, h: Int, day: String): String =
    (0 until cfg.itemsPerPage).map { i =>
      val stem = s"${cvfConf(h)}_${day}_p$i"
      s"""<dt><a href="content/${cvfConf(h)}/papers/$stem.pdf">pdf</a></dt>"""
    }.mkString("\n")

  def cvfDayAllHtml(cfg: Config, h: Int): String =
    if (h % 2 == 1) """<html><body>No papers for day=all</body></html>"""
    else s"""<html><body>
            |${cvfPdfLinksHtml(cfg, h, "all")}
            |</body></html>""".stripMargin

  def cvfIndexHtml(cfg: Config, h: Int): String = {
    val links = cvfDays.map(d =>
      s"""<a href="?day=$d">Day $d</a>""").mkString("\n")
    s"""<html><body>$links</body></html>"""
  }

  def cvfDayUrl(h: Int, d: String) = s"${cvfBaseUrl(h)}?day=$d"
  def cvfDayHtml(cfg: Config, h: Int, d: String): String =
    s"""<html><body>
       |${cvfPdfLinksHtml(cfg, h, d)}
       |</body></html>""".stripMargin

  def repoSearchUrl(h: Int) =
    s"https://github$h.example.org/search?type=repositories&q=q$h"
  def repoPageUrl(h: Int, p: Int) =
    s"https://github$h.example.org/search?type=repositories&p=$p&q=q$h"
  def repoPagesPerHost(cfg: Config): Int = math.max(2, cfg.pagesPerHost - 1)

  /** Repo search driver page: only the pagination div — page count is the
    * SECOND-TO-LAST anchor ("Next" is last, getrepository.py:68).
    */
  def repoMainHtml(cfg: Config, h: Int): String = {
    val n = repoPagesPerHost(cfg)
    val nums = (1 to n).map(i => s"""<a href="?p=$i">$i</a>""").mkString("\n")
    s"""<html><body>
       |<div class="Box-sc-g0xbh4-0 gukfho TablePaginationSteps">
       |$nums
       |<a href="?p=2">Next</a>
       |</div></body></html>""".stripMargin
  }

  /** Repo search result page: results-list div with the exact styled-link
    * class on repo anchors (getrepository.py:75).
    */
  def repoPageHtml(cfg: Config, h: Int, p: Int): String = {
    val items = (0 until cfg.itemsPerPage).map { i =>
      val n = math.abs(mix(cfg.seed ^ (h.toLong << 49) ^ (p.toLong << 29) ^ i))
      s"""<div><a class="Link__StyledLink-sc-14289xe-0 dheQRw"
         | href="/user${n % 50}/repo${n % 997}">repo${n % 997}</a></div>""".stripMargin
    }.mkString("\n")
    s"""<html><body><div data-testid="results-list">
       |$items
       |</div></body></html>""".stripMargin
  }

  /** Flaky marker: pages failing their first n fetch attempts (R2/R3). */
  def isFlaky(cfg: Config, h: Int, p: Int, i: Int): Boolean =
    (math.abs(mix(cfg.seed ^ (h.toLong << 45) ^ (p.toLong << 25) ^ (i + 3))) % 7) == 3
  def flakyAttempts(cfg: Config, h: Int, p: Int, i: Int): Int =
    1 + (math.abs(mix(cfg.seed ^ (h.toLong << 46) ^ (p + i).toLong)) % 2).toInt
  def flakyMeta(cfg: Config, h: Int, p: Int, i: Int): String =
    s"""<meta name="flaky" content="${flakyAttempts(cfg, h, p, i)}">"""

  // ---- table builders ----------------------------------------------------

  /** All (url, kind, h, p, i, depth, path) coordinates, distributed. */
  private def coords(spark: SparkSession, cfg: Config): Dataset[(String, String, Int, Int, Int, Int, String)] = {
    import spark.implicits._
    val hosts = spark.range(cfg.nHosts).map(_.toInt)
    hosts.flatMap { h =>
      val search = (0 until pagesFor(cfg, h)).map { p =>
        (searchPageUrl(h, p), "search", h, p, 0, 0, "")
      }
      val papers = for {
        p <- 0 until pagesFor(cfg, h)
        i <- 0 until cfg.itemsPerPage
      } yield (paperAbsUrl(cfg, h, p, i), "paper", h, p, i, 0, "")
      val blogPaths = {
        def walk(path: String, depth: Int): Seq[(String, Int)] =
          (path, depth) +: (if (depth >= cfg.blogDepth) Seq.empty
          else (0 until cfg.blogFanout).flatMap(c => walk(s"$path/c$c", depth + 1)))
        walk("root", 0)
      }
      val blogs = blogPaths.map { case (path, d) =>
        (blogUrl(h, path), "blog", h, 0, 0, d, path)
      }
      val cites = (0 until citePagesPerHost(cfg)).map { p =>
        (citePageUrl(h, p), "cite", h, p, 0, 0, "")
      }
      val listing = Seq((listPageUrl(h), "list", h, 0, 0, 0, ""))
      val arxivPapers = (0 until cfg.itemsPerPage).map { i =>
        (arxivAbsUrl(cfg, h, i), "paper", h, listPaperCoord(h), i, 0, "")
      }
      val icra = Seq((icraIndexUrl(h), "icra_index", h, 0, 0, 0, "")) ++
        (0 until icraProcsPerHost).map { p =>
          (icraProcUrl(h, p), "icra", h, p, 0, 0, "")
        }
      val isca = Seq((iscaIndexUrl(h), "isca_index", h, 0, 0, 0, "")) ++
        iscaYears.map { y =>
          (iscaYearUrl(h, y), "isca", h, y, 0, 0, "")
        }
      val repo = Seq((repoSearchUrl(h), "repo", h, 0, 0, 0, "")) ++
        (1 to repoPagesPerHost(cfg)).map { p =>
          (repoPageUrl(h, p), "repo", h, p, 0, 0, "")
        }
      val icml = (0 until icmlVolumesPerHost).map { v =>
        (icmlVolumeUrl(h, v), "icml", h, v, 0, 0, "")
      }
      val cvf = Seq(
        (cvfDayAllUrl(h), "cvf", h, 0, 0, 0, ""),
        (cvfBaseUrl(h), "cvf_index", h, 0, 0, 0, "")) ++
        cvfDays.zipWithIndex.map { case (d, di) =>
          (cvfDayUrl(h, d), "cvf", h, di + 1, 0, 0, d)
        }
      search ++ papers ++ blogs ++ cites ++ listing ++ arxivPapers ++
        icra ++ isca ++ repo ++ icml ++ cvf
    }
  }

  /** The canonical pages table (input_hint shape). */
  def pages(spark: SparkSession, cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    coords(spark, cfg).map { case (url, kind, h, p, i, depth, path) =>
      val html = kind match {
        case "search"     => searchPageHtml(cfg, h, p)
        case "paper"      => paperPageHtml(cfg, h, p, i)
        case "cite"       => citePageHtml(cfg, h, p)
        case "list"       => listPageHtml(cfg, h)
        case "icra_index" => icraIndexHtml(cfg, h)
        case "icra"       => icraProcHtml(cfg, h, p)
        case "isca_index" => iscaIndexHtml(cfg, h)
        case "isca"       => iscaYearHtml(cfg, h, p)
        case "icml"       => icmlVolumeHtml(cfg, h, p)
        case "cvf" if p == 0 => cvfDayAllHtml(cfg, h)
        case "cvf"        => cvfDayHtml(cfg, h, path)
        case "cvf_index"  => cvfIndexHtml(cfg, h)
        case "repo" if p == 0 => repoMainHtml(cfg, h)
        case "repo"       => repoPageHtml(cfg, h, p)
        case _            => blogPageHtml(cfg, h, path, depth)
      }
      val text = kind match {
        case "search" => "" // search pages carry no extracted-text contract
        case "paper"  => abstractOf(cfg, h, p, i)
        case _        => ""
      }
      val lang = if (math.abs(mix(url.hashCode.toLong ^ cfg.seed)) % 10 == 0) "zh" else "en"
      Page(url, tsOf(cfg, url.hashCode.toLong), html.getBytes("UTF-8"), text, lang)
    }.toDF()
  }

  final case class Seed(seed_id: Int, url: String, site: String, query: String)

  /** Seed list: one search seed per search host + one blog root per blog
    * host (north_rule: same seed list ⇒ same ordering + seen set).
    */
  def seeds(spark: SparkSession, cfg: Config = Config()): Dataset[Seed] = {
    import spark.implicits._
    val s = (0 until cfg.nHosts).map(h =>
      Seed(h, searchSeedUrl(h), "search", s"q$h"))
    val b = (0 until cfg.nHosts).map(h =>
      Seed(cfg.nHosts + h, blogUrl(h, "root"), "blog", ""))
    val c = (0 until cfg.nHosts).map(h =>
      Seed(2 * cfg.nHosts + h, citePageUrl(h, 0), "cite", ""))
    val l = (0 until cfg.nHosts).map(h =>
      Seed(3 * cfg.nHosts + h, listPageUrl(h), "list", s"subject$h"))
    val ic = (0 until cfg.nHosts).map(h =>
      Seed(4 * cfg.nHosts + h, icraIndexUrl(h), "icra_index", ""))
    val is = (0 until cfg.nHosts).map(h =>
      Seed(5 * cfg.nHosts + h, iscaIndexUrl(h), "isca_index", ""))
    val rp = (0 until cfg.nHosts).map(h =>
      Seed(6 * cfg.nHosts + h, repoSearchUrl(h), "repo", s"q$h"))
    // ICML: the reference enumerates volume URLs directly (no index page)
    val im = (0 until cfg.nHosts).flatMap(h =>
      (0 until icmlVolumesPerHost).map(v =>
        Seed(7 * cfg.nHosts + h * icmlVolumesPerHost + v,
          icmlVolumeUrl(h, v), "icml", "ICML")))
    // CVF: the reference starts at the ?day=all page (openaccess.py:58)
    val cv = (0 until cfg.nHosts).map(h =>
      Seed(7 * cfg.nHosts + cfg.nHosts * icmlVolumesPerHost + h,
        cvfDayAllUrl(h), "cvf", cvfConf(h)))
    spark.createDataset(s ++ b ++ c ++ l ++ ic ++ is ++ rp ++ im ++ cv)
  }

  final case class Robots(host: String, disallow_prefixes: Seq[String],
      crawl_delay_ms: Long)

  /** Synthetic robots: papers hosts disallow /draft/, odd blog hosts carry a
    * larger crawl delay; search hosts have no entry (default-allow).
    */
  def robots(spark: SparkSession, cfg: Config = Config()): Dataset[Robots] = {
    import spark.implicits._
    val r = (0 until cfg.nHosts).flatMap { h =>
      Seq(
        Robots(paperHost(h), Seq("/draft/"), 100L),
        Robots(blogHost(h), Seq.empty, if (h % 2 == 1) 500L else 100L)
      )
    }
    spark.createDataset(r)
  }
}
