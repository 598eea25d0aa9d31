package graft.extract

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Byte-contract extraction functions for the arXiv-family crawlers.
  * Each function replicates the *observable semantics* of the cited
  * reference code (Python regex / lxml pipelines) — not its implementation.
  *
  * Python-regex parity notes (applies throughout):
  *   - Java `(?d)` (UNIX_LINES) makes `.` exclude only `\n` and `$` match
  *     only before a final `\n` — exactly Python's default `re` behavior.
  *   - Python DOTALL → Java `(?s)`.
  *   - Python `str.strip(chars)` → [[PyStr.strip]]; slices → [[PyStr.slice]].
  */
object ArxivExtract {

  /** ITEMS_NUM (arxiv/search_pdf_string.py:32). */
  val ItemsNum = 200

  /** The central Item record (arxiv/search_pdf_string.py:91). */
  final case class Item(url: String, label: String, title: String,
      abstractText: String)

  // ---- E1: RemoveTags (arxiv/search_pdf_string.py:48-52) -----------------
  private val TagRe = Pattern.compile("(?d)<.*?>")
  def removeTags(text: String): String =
    TagRe.matcher(text).replaceAll("")

  // ---- E2: item parse, regex mode (arxiv/search_pdf_string.py:54-93) -----
  private val LiRe =
    Pattern.compile("(?s)<li class=\"arxiv-result\">.*?</li>")
  private val LabelRe = Pattern.compile("(?d)\">([^<]+)</span>")
  private val PdfRe = Pattern.compile("(?d)<a href=\"([^\"]+)\">pdf</a>")
  private val TitleRe = Pattern.compile(
    "(?s)<p class=\"title is-5 mathjax\">\\s*(.*?)\\s*</p>")
  private val AbsFullRe = Pattern.compile(
    "(?s)<span class=\"abstract-full[^\"]*\"[^>]*>(.*)</span>")
  private val AbsShortRe = Pattern.compile(
    "(?s)<span class=\"abstract-short[^\"]*\"[^>]*>(.*)</span>")
  private val AnchorRe = Pattern.compile("(?d)<a[^>]*>.*?</a>")
  private val Submitted1Re = Pattern.compile(
    "(?di)Submitted\\s+\\d+\\s+\\w+,\\s+\\d+;\\s*originally\\s+announced.*$")
  private val Submitted2Re = Pattern.compile(
    "(?di)Submitted\\s+\\d+\\s+\\w+,\\s+\\d+;\\s*v\\d+\\s+submitted\\s+" +
      "\\d+\\s+\\w+,\\s+\\d+;\\s*originally\\s+announced.*$")

  /** Parse one result page's `<li class="arxiv-result">` blocks into Items.
    * Returns (items, hitSentinel): `hitSentinel` is the reference's global
    * INVALID flag — the min_id early-stop (arxiv/search_pdf_string.py:85-89);
    * items up to (excluding) the sentinel are returned.
    */
  def parseArxivResult(content: String, minId: String): (Vector[Item], Boolean) = {
    val items = ArrayBuffer[Item]()
    val m = LiRe.matcher(content)
    while (m.find()) {
      val li = m.group()
      val labels = {
        val lm = LabelRe.matcher(li)
        val b = ArrayBuffer[String]()
        while (lm.find()) b += lm.group(1)
        b.toVector
      }
      val pdfM = PdfRe.matcher(li)
      val pdfFound = pdfM.find()
      val titleM = TitleRe.matcher(li)
      val titleFound = titleM.find()
      if (labels.nonEmpty && pdfFound && titleFound) {
        val label = if (labels.contains("cs.CV")) "cs.CV" else labels.head
        val pdfUrl = pdfM.group(1)
        val title = removeTags(titleM.group(1))
        val absM = AbsFullRe.matcher(li)
        val abstractText =
          if (absM.find()) cleanAbstract(absM.group(1))
          else {
            val shortM = AbsShortRe.matcher(li)
            if (shortM.find()) cleanAbstract(shortM.group(1)) else ""
          }
        if (minId.nonEmpty) {
          val pdfId = pdfUrl.split('/').last
          if (pdfId == minId) return (items.toVector, true)
        }
        items += Item(pdfUrl, label, title, abstractText)
      }
    }
    (items.toVector, false)
  }

  // ---- E3: item parse, xpath mode (arxiv/search_pdf.py:30-52) ------------

  /** E3's title normalization (search_pdf.py:45-46): every char outside
    * `[a-zA-Z0-9#$%&()]` becomes a space, then whitespace runs collapse to
    * single spaces with ends trimmed (Python `" ".join(s.split())`).
    * DIFFERENT from E2's title (which only strips tags) — two of the three
    * search_pdf variants emit titles through this transform.
    */
  def cleanXpathTitle(title: String): String = {
    val sb = new java.lang.StringBuilder(title.length)
    var i = 0
    while (i < title.length) {
      val c = title.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '#' || c == '$' || c == '%' ||
        c == '&' || c == '(' || c == ')'
      sb.append(if (keep) c else ' ')
      i += 1
    }
    sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** E3: xpath-mode item parse (search_pdf.py:30-52). Items are the `li`
    * children of `main/div['content']/ol` (lxml treats the string
    * predicate as constant-true ⇒ div[1]); per item:
    *   url   = div/p/span/a[1]/@href  (item skipped when absent)
    *   label = div/div/span[1]/text() list, "cs.CV" preferred else first
    *   title = li's p[1] text nodes joined, then [[cleanXpathTitle]]
    */
  def parseArxivResultXpath(html: String): Vector[Item] = {
    val doc = MiniHtml.parse(html)
    val ol = for {
      h <- doc.nthChild("html", 1)
      body <- h.nthChild("body", 1)
      main <- body.nthChild("main", 1)
      d <- main.nthChild("div", 1)
      ol <- d.nthChild("ol", 1)
    } yield ol
    ol.toVector.flatMap(_.childElements("li")).flatMap { li =>
      val url = li.childElements("div")
        .flatMap(_.childElements("p"))
        .flatMap(_.childElements("span"))
        .flatMap(_.childElements("a").headOption)
        .flatMap(_.attr("href"))
        .headOption
      val labels = li.childElements("div")
        .flatMap(_.childElements("div"))
        .flatMap(_.childElements("span").headOption)
        .flatMap(_.directTexts.headOption)
      val label =
        if (labels.contains("cs.CV")) "cs.CV" else labels.headOption.getOrElse("")
      val title = cleanXpathTitle(
        li.nthChild("p", 1).map(_.directTexts.mkString("")).getOrElse(""))
      url match {
        case Some(u) if labels.nonEmpty => Some(Item(u, label, title, ""))
        case _ => None
      }
    }
  }

  private def cleanAbstract(raw: String): String = {
    var a = AnchorRe.matcher(raw).replaceAll("")
    a = removeTags(a).trim
    a = Submitted1Re.matcher(a).replaceAll("")
    a = Submitted2Re.matcher(a).replaceAll("")
    a.trim
  }

  // ---- E18+E19: pagination (arxiv/search_pdf_string.py:96-109) -----------
  private val TotalRe =
    Pattern.compile("(?d)of (\\d{1,3}(,\\d{3})*(\\.\\d+)?)")

  /** Page-URL list for a search: [base] if one page, else
    * base&start=200*i for i in [0, total_pages).
    */
  def getPages(baseUrl: String, content: String): Vector[String] = {
    val m = TotalRe.matcher(content)
    if (m.find()) {
      val total = m.group(1).replace(",", "").toLong
      val totalPages = math.ceil(total.toDouble / ItemsNum).toLong
      if (totalPages > 1)
        (0L until totalPages).map(i => s"$baseUrl&start=${ItemsNum * i}").toVector
      else Vector(baseUrl)
    } else Vector(baseUrl)
  }

  /** Seed search URL (arxiv/search_pdf_string.py:134-140): comments-mode if
    * the first token is a conference keyword; quoted query if no '+'.
    */
  val CommentsKeys = Set("cvpr", "iccv", "iclr")
  def buildSearchUrl(key: String, searchType: String = "all"): String = {
    val tpl = "https://arxiv.org/search/?query=%s&searchtype=%s" +
      "&abstracts=show&order=-announced_date_first&size=" + ItemsNum
    if (CommentsKeys.contains(key.split("\\s+")(0).toLowerCase))
      tpl.format(key, "comments")
    else if (key.contains("+")) tpl.format(key, searchType)
    else tpl.format("\"" + key + "\"", searchType)
  }

  /** GitHub-style page-URL generator (arxiv.py:186-193). */
  def genUrls(mainPage: String, pageNum: Int): Vector[String] =
    if (pageNum == 1) Vector(mainPage)
    else (0 until pageNum)
      .map(i => mainPage.replace("&q=", s"&p=${i + 1}&q=")).toVector

  // ---- E5/E6/E7/E8: date + conference helpers (arxiv.py:85-106) ----------
  val DateMap: Map[String, Int] = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5, "Jun" -> 6,
    "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  /** Conference list with its duplicate ICME entry — *order is semantic*
    * (first containment wins, arxiv.py:30-33,102-106).
    */
  val Conferences: Vector[String] = Vector("CVPR", "ICLR", "ICCV", "ECCV",
    "IJCAI", "AAAI", "ICML", "ECAI", "ICRA", "ICAPS", "AAMAS", "ICME",
    "ACCV", "NIPS", "IJCV", "ICME", "IMVIP", "Conference")

  private def pad2(s: String): String = if (s.length >= 2) s else "0" + s

  /** E5: "DD Mon YYYY" → "YYYY-MM-DD" via the month map (arxiv.py:85-87). */
  def dateNum(date: String): String = {
    val sub = PyStr.strip(date, " ").split(' ')
    s"${sub(2)}-${pad2(DateMap(sub(1)).toString)}-${pad2(sub(0))}"
  }

  /** E6: slice between "Submitted on " and ")" then E5 (arxiv.py:89-93). */
  def dateFormat(date: String): String = {
    val prefix = "Submitted on "
    val start = date.indexOf(prefix) + prefix.length
    val end = date.indexOf(")")
    dateNum(PyStr.slice(date, start, end))
  }

  private val YearRe = Pattern.compile("20[0-9][0-9]")

  /** E7: first 20xx match else "" (arxiv.py:95-100). */
  def findYear(data: String): String = {
    val m = YearRe.matcher(data)
    if (m.find()) m.group() else ""
  }

  /** E8: first conference (list order) contained case-insensitively
    * (arxiv.py:102-106).
    */
  def inConference(data: String): String = {
    val lower = data.toLowerCase
    Conferences.find(c => lower.contains(c.toLowerCase)).getOrElse("")
  }

  // ---- E4: abs-page field extraction (arxiv.py:108-149) ------------------
  /** The xpath root `/html/body/div/main/div/div/div/div['content']/
    * div['abs']/` — lxml treats the string predicates as constant-true, so
    * the effective path is body/div/main/div/div/div/div/div.
    */
  def absRoot(doc: MiniHtml.Element): Option[MiniHtml.Element] =
    for {
      html <- doc.nthChild("html", 1)
      body <- html.nthChild("body", 1)
      d1 <- body.nthChild("div", 1)
      main <- d1.nthChild("main", 1)
      d2 <- main.nthChild("div", 1)
      d3 <- d2.nthChild("div", 1)
      d4 <- d3.nthChild("div", 1)
      d5 <- d4.nthChild("div", 1)
      abs <- d5.nthChild("div", 1)
    } yield abs

  /** GetTitle (arxiv.py:148-149): first text node of root's h1, unstripped. */
  def getTitle(root: MiniHtml.Element): String =
    root.childElements("h1").flatMap(_.directTexts).head

  /** GetDate (arxiv.py:137-146): div[2] text, falling back to div[1] when
    * empty or containing a comma; then DateFormat.
    */
  def getDate(root: MiniHtml.Element): String = {
    val div2Texts = root.nthChild("div", 2).map(_.directTexts)
      .getOrElse(Vector.empty)
    val date =
      if (div2Texts.isEmpty) fallbackDiv1(root)
      else {
        val date0 = PyStr.strip(PyStr.strip(div2Texts.head, null), null)
        if (date0.isEmpty || date0.contains(","))
          fallbackDiv1(root)
        else div2Texts.head
      }
    dateFormat(date)
  }

  private def fallbackDiv1(root: MiniHtml.Element): String = {
    val t = root.nthChild("div", 1).map(_.directTexts).getOrElse(Vector.empty)
    PyStr.strip(PyStr.strip(t.head, null), null)
  }

  /** GetAbstract (arxiv.py:123-135): blockquote first text node (+' ' if
    * nonempty), then per child element: text/tail when not 'Abstract:';
    * newlines → spaces.
    */
  def getAbstract(root: MiniHtml.Element): String = {
    val bq = root.childElements("blockquote").head
    var abstractText = PyStr.strip(PyStr.strip(bq.directTexts.head, " "), "\n")
    if (abstractText.nonEmpty) abstractText += " "
    bq.childElements().foreach { a =>
      a.text.foreach { t =>
        if (t != "Abstract:") abstractText += PyStr.strip(t, null)
      }
      bq.tailOf(a).foreach { t =>
        if (t != "Abstract:") abstractText += PyStr.strip(t, null)
      }
    }
    abstractText.replace("\n", " ")
  }

  /** GetComments (arxiv.py:108-121): metatable tr[1]/td[2] text (span
    * fallback when blank) → "CONF year" or "".
    */
  def getComments(root: MiniHtml.Element): String = {
    val td = for {
      meta <- root.childElements("div")
        .find(_.childElements("table").nonEmpty)
      table <- meta.nthChild("table", 1)
      tbody <- table.nthChild("tbody", 1)
      tr <- tbody.nthChild("tr", 1)
      td <- tr.nthChild("td", 2)
    } yield td
    td match {
      case None => ""
      case Some(cell) =>
        val texts = cell.directTexts
        if (texts.isEmpty) ""
        else {
          var comments = PyStr.strip(PyStr.strip(texts.head, "\n"), " ")
          if (comments.isEmpty)
            comments = PyStr.strip(PyStr.strip(
              cell.childElements("span").head.directTexts.head, "\n"), " ")
          val year = findYear(comments)
          val conf = inConference(comments)
          if (conf.nonEmpty) conf + " " + year else ""
        }
    }
  }

  /** Code link: first `blockquote/a/@href` (arxiv.py:167). */
  def getCodeLink(root: MiniHtml.Element): Option[String] =
    root.childElements("blockquote").head.childElements("a").headOption
      .flatMap(_.attr("href"))
      .map(h => PyStr.strip(h, " ").replace("\n", " "))

  // ---- E9: digest formatter (arxiv.py:164-171) ----------------------------
  final case class AbsFields(title: String, date: String, abstractText: String,
      comments: String, code: Option[String])

  /** Extract all abs-page fields from a parsed page. */
  def extractAbsFields(html: String): Option[AbsFields] = {
    val doc = MiniHtml.parse(html)
    absRoot(doc).map { root =>
      AbsFields(getTitle(root), getDate(root), getAbstract(root),
        getComments(root), getCodeLink(root))
    }
  }

  /** The per-paper markdown digest block, byte-exact (arxiv.py:164-171). */
  def digest(f: AbsFields, url: String): String = {
    var txt = s"1. [${f.title}](${url.replace("https://arxiv", "http://cn.arxiv")})  \n"
    txt += s"${f.comments} *${f.date}* [paper]($url) "
    txt += (f.code match {
      case Some(c) => s"| [code]($c)-official    \n"
      case None    => "    \n"
    })
    txt += s"${f.abstractText}  \n\n"
    txt
  }

  // ---- S4: Atom API response parse (name2arxivid.py:160-172) --------------
  private val AtomEntryRe = Pattern.compile("(?s)<entry[\\s>].*?</entry>")
  private val AtomIdRe = Pattern.compile("(?s)<id>(.*?)</id>")
  private val ArxivAbsIdRe = Pattern.compile("arxiv\\.org/abs/(\\d+\\.\\d+)")

  /** First Atom `<entry>`'s `<id>` text, then the
    * `arxiv\.org/abs/(\d+\.\d+)` capture — exactly the reference's
    * `ET.findall('.//entry')[0].find('.//id')` + regex cascade. None when
    * the feed has no entries, the first entry has no id, or the id is not
    * an abs URL (each a distinct reference failure branch).
    */
  def parseAtomFirstId(xml: String): Option[String] = {
    val em = AtomEntryRe.matcher(xml)
    if (!em.find()) return None
    val im = AtomIdRe.matcher(em.group())
    if (!im.find()) return None
    val am = ArxivAbsIdRe.matcher(im.group(1))
    if (am.find()) Some(am.group(1)) else None
  }

  // ---- listing page (new.py:36-49) ----------------------------------------
  /** GetPages for daily listings: first dl's dt/span/a[1] hrefs (ONLY_NEW)
    * prefixed with https://arxiv.org, and the date from div[1] text after
    * the last comma, "20" + DateNum (two-digit-year listing dates).
    */
  def parseListing(html: String): (Vector[String], String) = {
    val doc = MiniHtml.parse(html)
    val content = for {
      h <- doc.nthChild("html", 1)
      body <- h.nthChild("body", 1)
      d <- body.nthChild("div", 1)
      inner <- d.nthChild("div", 1)
    } yield inner
    content match {
      case None => (Vector.empty, "")
      case Some(c) =>
        val dl = c.nthChild("dl", 1)
        val hrefs = dl.toVector.flatMap(_.childElements("dt"))
          .flatMap(_.childElements("span"))
          .flatMap(_.childElements("a").headOption)
          .flatMap(_.attr("href"))
        val urls = hrefs.map("https://arxiv.org" + _)
        val dateLine = c.nthChild("div", 1).map(_.directTexts.head).getOrElse("")
        val date = "20" + dateNum(dateLine.split(",").last)
        (urls, date)
    }
  }
}

/** Python string-op parity helpers. */
object PyStr {
  /** str.strip(chars); chars == null → whitespace strip (Python default). */
  def strip(s: String, chars: String): String = {
    def in(c: Char): Boolean =
      if (chars == null) c.isWhitespace else chars.indexOf(c) >= 0
    var i = 0
    var j = s.length
    while (i < j && in(s.charAt(i))) i += 1
    while (j > i && in(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python slice s[a:b] including negative-index semantics — load-bearing
    * for DateFormat (arxiv.py:91): `date[...:date.find(")")]` where a
    * dateline without "(v1)" makes find return -1, which Python reads as
    * "up to the last char" (dropping the closing "]").
    */
  def slice(s: String, a: Int, b: Int): String = {
    val n = s.length
    def norm(i: Int) = if (i < 0) math.max(0, n + i) else math.min(i, n)
    val start = norm(a)
    val end = math.max(start, norm(b))
    s.substring(start, end)
  }
}
