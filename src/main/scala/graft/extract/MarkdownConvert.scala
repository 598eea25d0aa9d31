package graft.extract

import java.util.regex.Pattern
import graft.url.UrlCanon
import MiniHtml.{Element, Node, Text}

/** HTML→Markdown conversion — the hardest byte-contract in the reference
  * (text/architectural_119.py:104-168) — plus its sibling helpers:
  * absolute-link rewriting (:205-221), header generation (:190-203),
  * first-valid-text (:85-89), pagination-link expansion (:262-276).
  *
  * The converter is a pure recursive function over the [[MiniHtml]] DOM;
  * in the engine it runs inside `Dataset.flatMap`/`map` per page — a
  * deterministic narrow transformation, no state, no shuffle.
  */
object MarkdownConvert {

  private val WsRe = Pattern.compile("[ \\t]+")

  /** clean_content (:109-111): runs of spaces/tabs → single space. */
  def cleanContent(s: String): String = WsRe.matcher(s).replaceAll(" ")

  /** clean_html (:96-102): the div with class token `b_con`, else whole doc. */
  def cleanHtml(doc: Element): Element =
    doc.descendants.find(e => e.name == "div" && e.hasClassToken("b_con"))
      .getOrElse(doc)

  /** E15: extract_first_valid_text (:85-89). */
  def firstValidText(e: Element): String =
    e.strippedStrings.headOption.getOrElse("Untitled")

  /** E14: markdown header — level = dot-count + 1 (:190-197). */
  def markdownHeader(subtitle: String): String = {
    val level = subtitle.count(_ == '.') + 1
    ("#" * level) + " " + subtitle
  }

  /** html header variant (:199-203). */
  def htmlHeader(subtitle: String): String = {
    val level = subtitle.count(_ == '.') + 1
    s"""<h$level style="text-align:center">$subtitle</h$level>""" +
      """<hr style="border: 1px solid #eeeeee" width="">"""
  }

  private val Heads = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** E12: convert_html_to_markdown (:104-168).
    *
    * @param outputDir    where the .md lands (relative-path base)
    * @param outputDirImg image mirror dir; the actual byte download is the
    *                     crawl sink's job — this function only derives the
    *                     relative link exactly as the reference does.
    */
  def convertHtmlToMarkdown(soup: Element, pageUrl: String,
      outputDir: String, outputDirImg: String): String = {
    val target = cleanHtml(soup)

    def processNode(n: Node): String = n match {
      case Text(t)    => cleanContent(t)
      case e: Element => processElement(e)
    }

    def childrenOf(e: Element): String = e.children.map(processNode).mkString

    def processElement(e: Element): String = e.name match {
      case "br" => "\n"
      case "div" => "\n" + childrenOf(e) + "\n"
      case "p" | "span" | "sup" | "sub" =>
        val content = cleanContent(childrenOf(e))
        e.name match {
          case "sup" => s"^$content^"
          case "sub" => s"~$content~"
          case _     => content
        }
      case h if Heads(h) =>
        val level = h.substring(1).toInt
        ("#" * level) + " " + cleanContent(PyStr.strip(e.getText, null)) + "\n"
      case "img" =>
        e.attr("src") match {
          case Some(src) if src.nonEmpty =>
            val fullUrl = UrlCanon.resolve(pageUrl, src)
            val imgName = UrlCanon.basename(UrlCanon.parse(fullUrl).path)
            val savePath = joinPath(outputDirImg, imgName)
            val rel = relPath(savePath, outputDir)
            s"![${e.attr("alt").getOrElse("")}]($rel)"
          case _ => ""
        }
      case "a" =>
        val linkText = cleanContent(childrenOf(e))
        val linkUrl = UrlCanon.resolve(pageUrl, e.attr("href").getOrElse(""))
        s"[$linkText]($linkUrl)"
      case "li" => "* " + cleanContent(childrenOf(e)) + "\n"
      case "ul" =>
        // reference quirk kept: find_all('li') is recursive and each li is
        // re-processed via process_element → "* * item" lines (:154-155)
        e.findAll("li").map(li => "* " + processElement(li))
          .mkString("\n") + "\n"
      case "ol" =>
        e.findAll("li").zipWithIndex
          .map { case (li, i) => s"${i + 1}. ${processElement(li)}" }
          .mkString("\n") + "\n"
      case _ => cleanContent(childrenOf(e))
    }

    val joined = target.children.map(processNode).mkString
    // blank-line squeeze (:166)
    joined.linesIterator.filter(_.trim.nonEmpty).mkString("\n")
  }

  /** E13: convert_html_to_absolute_links (:205-221) — href/src →
    * urljoin(base, rel); imgs get the max-width style. Serialized back in
    * document order.
    */
  def absoluteLinks(html: String, baseUrl: String): String = {
    val doc = MiniHtml.parse(html)
    def renderNode(n: Node): String = n match {
      case Text(t) => t
      case e: Element => render(e)
    }
    def render(e: Element): String = {
      var attrs = e.attrs
      if (e.name == "a" && attrs.contains("href"))
        attrs += ("href" -> UrlCanon.resolve(baseUrl, attrs("href")))
      if (e.name == "img" && attrs.contains("src")) {
        attrs += ("src" -> UrlCanon.resolve(baseUrl, attrs("src")))
        attrs += ("style" -> "max-width: 100%; height: auto;")
      }
      val attrStr = attrs.map { case (k, v) => s"""$k="$v"""" }
        .mkString(" ")
      val open = if (attrStr.isEmpty) s"<${e.name}>"
        else s"<${e.name} $attrStr>"
      if (e.children.isEmpty && MiniHtmlVoid(e.name)) open
      else open + e.children.map(renderNode).mkString + s"</${e.name}>"
    }
    doc.children.map(renderNode).mkString
  }

  private val MiniHtmlVoid = Set("br", "img", "hr", "meta", "link", "input")

  /** get_all_pagination_links (:262-276): from the `pager` div's last link,
    * derive (url, idx) for pages 1..last — returns empty when no pager.
    */
  def paginationLinks(doc: Element, baseUrl: String): Vector[(String, Int)] = {
    doc.descendants.find(e => e.name == "div" && e.hasClassToken("pager")) match {
      case None => Vector.empty
      case Some(pager) =>
        val links = pager.findAll("a").filter(_.attr("href").isDefined)
        if (links.isEmpty) Vector.empty
        else {
          val last = links.last.attr("href").get
          val numM = Pattern.compile("\\d+").matcher(last)
          if (!numM.find()) Vector.empty
          else {
            val lastPage = numM.group().toInt
            val m = Pattern.compile("_(\\d+)(\\.\\w+)$").matcher(last)
            if (m.find()) {
              val baseLink = last.substring(0, m.start(1))
              val suffix = m.group(2)
              (1 to lastPage).map(i =>
                (UrlCanon.resolve(baseUrl, s"$baseLink$i$suffix"), i)).toVector
            } else Vector.empty
          }
        }
    }
  }

  // ---- path helpers replicating os.path semantics -------------------------
  def joinPath(a: String, b: String): String =
    if (a.isEmpty) b
    else if (a.endsWith("/")) a + b
    else a + "/" + b

  /** os.path.relpath(path, start) for the normalized relative layouts the
    * reference produces (image dir beside the markdown dir).
    */
  def relPath(path: String, start: String): String = {
    val p = path.split('/').filter(s => s.nonEmpty && s != ".").toVector
    val s = start.split('/').filter(s0 => s0.nonEmpty && s0 != ".").toVector
    val common = p.zip(s).takeWhile { case (x, y) => x == y }.length
    val ups = Vector.fill(s.length - common)("..")
    val rest = p.drop(common)
    val segs = ups ++ rest
    if (segs.isEmpty) "." else segs.mkString("/")
  }
}
