package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the arXiv extraction byte-contract. Expected values
  * were derived by executing the reference's exact regex/string semantics
  * (arxiv/search_pdf_string.py:48-109, arxiv.py:85-106) with CPython `re`
  * over src/test/resources/fixtures/search_page.html — see
  * fixtures/arxiv_golden.json for the captured oracle.
  */
class ArxivExtractSpec extends AnyFunSuite {
  import ArxivExtract._

  private val page = {
    val in = getClass.getResourceAsStream("/fixtures/search_page.html")
    scala.io.Source.fromInputStream(in, "UTF-8").mkString
  }

  test("E2 parseArxivResult matches the reference byte-for-byte") {
    val (items, invalid) = parseArxivResult(page, "")
    assert(!invalid)
    assert(items.map(_.url) == Vector(
      "https://arxiv.org/pdf/2406.01001", "https://arxiv.org/pdf/2406.01002",
      "https://arxiv.org/pdf/2406.01004", "https://arxiv.org/pdf/2406.01005"))
    assert(items.map(_.label) == Vector("cs.CV", "cs.LG", "stat.ML", "cs.CL"))
    assert(items.map(_.title) == Vector("Deep Stereo Matching",
      "Graph Learning at Scale", "Sentinel Paper Here", "After Sentinel"))
    // byte-contract: double space from anchor removal, preserved newline
    // + indentation, entity NOT decoded, dead-second-Submitted-regex tail
    assert(items(0).abstractText ==
      "We propose a deep stereo network for  vision.\n    It works well.")
    assert(items(1).abstractText == "A short abstract about graphs&hellip;")
    assert(items(2).abstractText == "Full text. Submitted 1 May, 2024; v2")
    assert(items(3).abstractText == "after text")
  }

  test("F4 min_id early-stop excludes the sentinel and everything after") {
    val (items, invalid) = parseArxivResult(page, "2406.01004")
    assert(invalid)
    assert(items.map(_.url) == Vector(
      "https://arxiv.org/pdf/2406.01001", "https://arxiv.org/pdf/2406.01002"))
  }

  test("E18/E19 pagination math + page-URL generator") {
    assert(getPages("BASE", page) == Vector("BASE&start=0", "BASE&start=200",
      "BASE&start=400", "BASE&start=600", "BASE&start=800",
      "BASE&start=1000", "BASE&start=1200"))
    assert(getPages("BASE", "only of 7 results here") == Vector("BASE"))
    assert(getPages("BASE", "no total") == Vector("BASE"))
  }

  test("E19 GitHub-style genUrls") {
    assert(genUrls("https://g.com/search?l=C%2B%2B&q=x", 1) ==
      Vector("https://g.com/search?l=C%2B%2B&q=x"))
    assert(genUrls("https://g.com/search?l=C%2B%2B&q=x", 3) == Vector(
      "https://g.com/search?l=C%2B%2B&p=1&q=x",
      "https://g.com/search?l=C%2B%2B&p=2&q=x",
      "https://g.com/search?l=C%2B%2B&p=3&q=x"))
  }

  test("seed URL build (search_pdf_string.py:134-140)") {
    assert(buildSearchUrl("cvpr stereo") ==
      "https://arxiv.org/search/?query=cvpr stereo&searchtype=comments" +
        "&abstracts=show&order=-announced_date_first&size=200")
    assert(buildSearchUrl("stereo+matching") ==
      "https://arxiv.org/search/?query=stereo+matching&searchtype=all" +
        "&abstracts=show&order=-announced_date_first&size=200")
    assert(buildSearchUrl("stereo matching") ==
      "https://arxiv.org/search/?query=\"stereo matching\"&searchtype=all" +
        "&abstracts=show&order=-announced_date_first&size=200")
  }

  test("E5/E6 DateNum + DateFormat") {
    assert(dateNum("3 Jun 2024") == "2024-06-03")
    assert(dateNum(" 13 Jun 24 ") == "24-06-13") // 2-digit listing year
    assert(dateFormat("(Submitted on 3 Jun 2024)") == "2024-06-03")
  }

  test("E7 FindYear / E8 InConference ordered containment") {
    assert(findYear("CVPR 2024 camera ready") == "2024")
    assert(findYear("no year here") == "")
    assert(inConference("accepted at cvpr 2024") == "CVPR")
    // ICCV before ECCV in list order; 'Conference' is last resort
    assert(inConference("eccv and iccv") == "ICCV")
    assert(inConference("some random conference name") == "Conference")
    assert(inConference("a journal") == "")
  }

  test("E1 RemoveTags: non-greedy, does not cross newlines") {
    // CPython-verified: a tag broken across a newline is NOT removed
    assert(removeTags("<b>x</b> <i\nmulti>y") == "x <i\nmulti>y")
  }

  test("E4 abs-page extraction + E9 digest byte-contract") {
    val html =
      """<html><body><div><main><div><div><div><div class="content"><div class="abs">
        |<h1>Flow Matching For All</h1>
        |<div> history junk, with comma</div>
        |<div>  (Submitted on 3 Jun 2024)
        |</div>
        |<blockquote>
        |<span>Abstract:</span>We present flow matching. <a href="https://github.com/x/y">code</a> And more.</blockquote>
        |<div class="metatable"><table><tbody><tr><td>Comments:</td><td>
        |Accepted at CVPR 2024 </td></tr></tbody></table></div>
        |</div></div></div></div></div></main></div></body></html>""".stripMargin
    val f = extractAbsFields(html).get
    assert(f.title == "Flow Matching For All")
    // div[2] has text "  (Submitted on 3 Jun 2024)\n" → no comma → used
    assert(f.date == "2024-06-03")
    // byte-faithful reference quirks: text()[0] is the whitespace before
    // <span> (→ empty after strips, no leading pad); the inline <a>'s text
    // "code" and tails concatenate with NO separators (arxiv.py:127-132)
    assert(f.abstractText == "We present flow matching.codeAnd more.")
    assert(f.comments == "CVPR 2024")
    assert(f.code.contains("https://github.com/x/y"))
    val d = digest(f, "https://arxiv.org/abs/2406.9")
    assert(d ==
      "1. [Flow Matching For All](http://cn.arxiv.org/abs/2406.9)  \n" +
        "CVPR 2024 *2024-06-03* [paper](https://arxiv.org/abs/2406.9) " +
        "| [code](https://github.com/x/y)-official    \n" +
        "We present flow matching.codeAnd more.  \n\n")
  }

  test("E4 date fallback to div[1] when div[2] text has a comma") {
    val html =
      """<html><body><div><main><div><div><div><div><div>
        |<h1>T</h1>
        |<div>(Submitted on 12 Dec 2023)</div>
        |<div>v2, revised</div>
        |<blockquote>abs text</blockquote>
        |</div></div></div></div></div></main></div></body></html>""".stripMargin
    val f = extractAbsFields(html).get
    assert(f.date == "2023-12-12")
    assert(f.comments == "") // no metatable div
  }

  test("listing page parse (new.py:36-49)") {
    val html =
      """<html><body><div><div>
        |<div>New submissions for Thu, 13 Jun 24</div>
        |<dl><dt><span><a href="/abs/2406.11111">[1]</a><a href="/pdf/x">pdf</a></span></dt>
        |<dt><span><a href="/abs/2406.22222">[2]</a></span></dt></dl>
        |<dl><dt><span><a href="/abs/2406.33333">[cross]</a></span></dt></dl>
        |</div></div></body></html>""".stripMargin
    val (urls, date) = ArxivExtract.parseListing(html)
    // ONLY_NEW → first dl only; a[1] per dt; arxiv.org prefix
    assert(urls == Vector("https://arxiv.org/abs/2406.11111",
      "https://arxiv.org/abs/2406.22222"))
    assert(date == "2024-06-13")
  }
}
