package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Byte-contract tests for the HTML→Markdown converter (E12-E15).
  * Expected strings are hand-derived by executing the reference walk
  * (text/architectural_119.py:104-168) rule by rule over the fixture —
  * including its quirks: the recursive find_all('li') double-bullet
  * ("* * item", :154-155) and blank-line squeeze (:166).
  */
class MarkdownConvertSpec extends AnyFunSuite {
  import MarkdownConvert._

  private val blog =
    """<html><body><div class="b_con">
      |<h2>1.2 Intro</h2>
      |<p>Hello   <b>world</b></p>
      |<div>block<br>line2</div>
      |<span>a ^sup test: <sup>2</sup></span>
      |<sub>sub</sub>
      |<a href="../page2.html">next page</a>
      |<img src="img/pic1.png" alt="Pic">
      |<ul><li>one</li><li>two <a href="/x">lx</a></li></ul>
      |<ol><li>first</li></ol>
      |text tail
      |</div></body></html>""".stripMargin

  test("E12 convert_html_to_markdown byte-contract") {
    val doc = MiniHtml.parse(blog)
    val md = convertHtmlToMarkdown(doc, "http://site.example/books/b1/page1.html",
      "out/md", "out/md/image")
    val expected = Seq(
      "## 1.2 Intro",
      "Hello world",
      "block",
      "line2",
      "a ^sup test: ^2^",
      "~sub~",
      "[next page](http://site.example/books/page2.html)",
      "![Pic](image/pic1.png)",
      "* * one",
      "* * two [lx](http://site.example/x)",
      "1. * first",
      "text tail").mkString("\n")
    assert(md == expected)
  }

  test("E12 falls back to whole document when no b_con div") {
    val doc = MiniHtml.parse("<div><h1>T</h1></div>")
    val md = convertHtmlToMarkdown(doc, "http://e/", "o", "o/image")
    assert(md == "# T")
  }

  test("E15 first_valid_text") {
    val doc = MiniHtml.parse("<div>  \n <span></span><p> hello </p></div>")
    assert(firstValidText(doc) == "hello")
    assert(firstValidText(MiniHtml.parse("<div>  </div>")) == "Untitled")
  }

  test("E14 header generators: level = dot count + 1") {
    assert(markdownHeader("3.2.1 Deep dive") == "### 3.2.1 Deep dive")
    assert(markdownHeader("Overview") == "# Overview")
    assert(htmlHeader("1.1 X") ==
      """<h2 style="text-align:center">1.1 X</h2>""" +
        """<hr style="border: 1px solid #eeeeee" width="">""")
  }

  test("E13 absolute-link rewrite with img max-width style") {
    val html = """<p><a href="a/b.html">x</a><img src="i.png"></p>"""
    val out = absoluteLinks(html, "http://h.example/base/")
    assert(out.contains("""href="http://h.example/base/a/b.html""""))
    assert(out.contains("""src="http://h.example/base/i.png""""))
    assert(out.contains("max-width: 100%; height: auto;"))
  }

  test("pagination-link expansion (architectural_119.py:262-276)") {
    val doc = MiniHtml.parse(
      """<div class="pager"><a href="page_1.html">1</a>
        |<a href="page_9.html">last</a></div>""".stripMargin)
    val links = paginationLinks(doc, "http://s.example/book/")
    assert(links.length == 9)
    assert(links.head == ("http://s.example/book/page_1.html", 1))
    assert(links.last == ("http://s.example/book/page_9.html", 9))
    assert(paginationLinks(MiniHtml.parse("<div>no pager</div>"), "http://x/")
      == Vector.empty)
  }

  test("relPath mirrors os.path.relpath for sibling layouts") {
    assert(relPath("out/md/image/p.png", "out/md") == "image/p.png")
    assert(relPath("out/img/p.png", "out/md") == "../img/p.png")
    assert(relPath("a/b", "a/b") == ".")
  }
}
