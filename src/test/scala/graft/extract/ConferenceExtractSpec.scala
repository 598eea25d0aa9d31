package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases for the conference-family and repo-search parsers,
  * pinned against hand-derived expectations from the cited reference
  * code paths (conference/ICRA.py, conference/ISCA.py, getrepository.py).
  */
class ConferenceExtractSpec extends AnyFunSuite {

  test("ICRA proceedings: year, doi, %20 pdf fixup, tag-stripped title; " +
    "items missing any anchor are skipped") {
    val html =
      """<html><body><h2>2015 Proceedings of ISARC</h2><div>
        |<div class="article compact">
        |<a href="#p0">Robotic Masonry Study</a>
        |<a href="https://doi.org/10.22260/ISARC2015-7">10.22260/ISARC2015-7</a>
        |<a href="proceedings/2015/paper 7.pdf">Download fulltext</a>
        |<div class="article compact">
        |<a href="#p1">No doi here</a>
        |<a href="proceedings/2015/paper 8.pdf">Download fulltext</a>
        |<div class="article compact">
        |<a href="#p2">Tagged <b>title</b> anchor</a>
        |<a href="https://doi.org/10.22260/ISARC2015-9">10.22260/ISARC2015-9</a>
        |<a href="proceedings/2015/p9.pdf">Download fulltext</a>
        |</div></div></body></html>""".stripMargin
    val (year, items) = ConferenceExtract.parseIcraProceedings(html)
    assert(year == "2015")
    assert(items.length == 2) // the doi-less patch is dropped
    val it = items.head
    assert(it.url == "https://www.iaarc.org/publications/proceedings/2015/paper%207.pdf")
    assert(it.doi == "10.22260/ISARC2015-7")
    assert(it.label == "pdf")
    assert(it.title == "Robotic Masonry Study")
    // bug-compat: a title anchor with NESTED TAGS cannot match the
    // reference's `([^<]+)` capture, so its first matchable anchor — the
    // doi link — becomes the title (ICRA.py:41)
    assert(items(1).title == "10.22260/ISARC2015-9")
  }

  test("ICRA proceedings: missing h2 year falls back to 0000") {
    val (year, _) = ConferenceExtract.parseIcraProceedings("<html></html>")
    assert(year == "0000")
  }

  test("ICRA index: /pub hrefs get the literal site root and &amp; unescape") {
    val html =
      """<a href="/pub_a">x</a> <a  href="/pub_b&amp;s=1">y</a>
        |<a href="/other">z</a>""".stripMargin
    assert(ConferenceExtract.parseIcraIndex(html) == Vector(
      "https://www.iaarc.org/pub_a", "https://www.iaarc.org/pub_b&s=1"))
  }

  test("ISCA year page: category from h4, html→pdf replaces EVERY " +
    "occurrence (reference str.replace), sanitized {title}_{year}.pdf") {
    val html =
      """<html><body>
        |<div class="w3-card w3-round w3-white w3-padding">
        |<h4 class="w3-center"> Speech Synthesis </h4>
        |<a class="w3-text" href="papers/p1.html"><p>Neural vocoders
        |ignored second line</p></a>
        |<a class="w3-text" href="htmlpapers/p2.html"><p>A/B prosody test</p></a>
        |</div></body></html>""".stripMargin
    val items = ConferenceExtract.parseIscaYearPage(html,
      "https://isca.example.org/conf_2015.html", "2015")
    assert(items.length == 2)
    assert(items(0) == ConferenceExtract.IscaItem("Speech Synthesis",
      "https://isca.example.org/papers/p1.pdf", "Neural vocoders_2015.pdf"))
    // "html" replaced INSIDE the path too — the reference's replace-all
    assert(items(1).url == "https://isca.example.org/pdfpapers/p2.pdf")
    assert(items(1).fileName == "A_B prosody test_2015.pdf") // '/' sanitized
  }

  test("ISCA index: year links filtered to ≤ 2016 (F6)") {
    val html =
      """<div class="w3-container w3-padding">
        |<a class="w3-text-blue w3-margin" href="conf_2014.html">2014</a>
        |<a class="w3-text-blue w3-margin" href="conf_2016.html">2016</a>
        |<a class="w3-text-blue w3-margin" href="conf_2017.html">2017</a>
        |<a class="w3-text-blue w3-margin" href="conf_2018.html">2018</a>
        |</div>""".stripMargin
    assert(ConferenceExtract.parseIscaIndex(html) == Vector(
      ("2014", "conf_2014.html"), ("2016", "conf_2016.html")))
  }

  test("repo search: page count is the second-to-last pagination anchor; " +
    "0 when the div is absent") {
    val html =
      """<div class="x Box-sc-g0xbh4-0 gukfho TablePaginationSteps y">
        |<a href="?p=1">1</a><a href="?p=2">2</a><a href="?p=3">3</a>
        |<a href="?p=2">Next</a>
        |</div>""".stripMargin
    assert(ConferenceExtract.parseRepoPageNum(html) == 3)
    assert(ConferenceExtract.parseRepoPageNum("<div>no pager</div>") == 0)
  }

  test("repo search: hrefs only from the exact styled-link class inside " +
    "results-list; clone target name is name_owner") {
    val html =
      """<div data-testid="results-list">
        |<a class="Link__StyledLink-sc-14289xe-0 dheQRw" href="/alice/proj">proj</a>
        |<a class="OtherLink" href="/bob/nope">nope</a>
        |</div>
        |<a class="Link__StyledLink-sc-14289xe-0 dheQRw" href="/eve/outside">o</a>""".stripMargin
    assert(ConferenceExtract.parseRepoUrls(html) == Vector("/alice/proj"))
    assert(ConferenceExtract.repoCloneTarget("/alice/proj") ==
      ("proj_alice", "https://github.com/alice/proj"))
  }

  test("ICML volume page: lookaround pdf links (UNESCAPED dot — any char " +
    "before pdf\" terminates), year from <title>, split-derived names") {
    val html =
      """<html><head><title>Proceedings of MLR 2022</title></head><body>
        |[<a href="https://proceedings.mlr.press/v162/abbas22b/abbas22b.pdf" target="_blank">pdf</a>]
        |[<a href="https://proceedings.mlr.press/v162/xupdf" target="_blank">odd</a>]
        |<a href="https://elsewhere/no.pdf">not a target blank</a>
        |</body></html>""".stripMargin
    val (year, items) = ConferenceExtract.parseIcmlProceedings(html)
    assert(year == "2022")
    assert(items.length == 2)
    assert(items(0) == ConferenceExtract.IcmlItem(
      "https://proceedings.mlr.press/v162/abbas22b/abbas22b.pdf",
      "abbas22b.pdf"))
    // the unescaped dot: "xupdf" ends with (any char)pdf ⇒ the capture
    // stops at "x" — faithful to the reference's regex, garbage and all
    assert(items(1).fileName == "x.pdf")
    assert(ConferenceExtract.icmlVolumeUrls("KDD").head ==
      "http://proceedings.mlr.press/v185/")
  }

  test("ICLR pdf links: /pdf…pdf-link lookaround, openreview prefix, " +
    "id-derived file names") {
    val html =
      """<a href="/pdf?id=FPCMqjI0jXN" class="pdf-link" title="Download PDF"
        | target="_blank"><img src="/images/pdf_icon_blue.svg"></a>
        |<a href="/pdf?id=xYz2" class="pdf-link">x</a>
        |<a href="/pdf?id=skip" class="other">no</a>""".stripMargin
    val items = ConferenceExtract.parseIclrPdfLinks(html)
    assert(items == Vector(
      ConferenceExtract.IcmlItem("https://openreview.net/pdf?id=FPCMqjI0jXN",
        "FPCMqjI0jXN.pdf"),
      ConferenceExtract.IcmlItem("https://openreview.net/pdf?id=xYz2",
        "xYz2.pdf")))
  }

  test("CVF open-access: pdf links via the href lookaround (double and " +
    "single quoted), site-root download prefix, basename file names") {
    val html =
      """<dt><a href="content/CVPR2016/papers/He_Deep_paper.pdf">pdf</a></dt>
        |<dt><a href='content/CVPR2016/papers/Alt_Quoted.pdf'>pdf</a></dt>
        |<a href="content/CVPR2016/html/He_Deep.html">abs</a>""".stripMargin
    val items = ConferenceExtract.parseCvfPdfLinks(html)
    assert(items == Vector(
      ConferenceExtract.IcmlItem(
        "http://openaccess.thecvf.com/content/CVPR2016/papers/He_Deep_paper.pdf",
        "He_Deep_paper.pdf"),
      ConferenceExtract.IcmlItem(
        "http://openaccess.thecvf.com/content/CVPR2016/papers/Alt_Quoted.pdf",
        "Alt_Quoted.pdf")))
  }

  test("CVF day-page list: greedy ?-suffix before \">Day (per line), " +
    "single-quote alternative") {
    val html =
      """<a href="?day=2024-06-19">Day 1</a>
        |<a href='?day=2024-06-20'>Day 2</a>
        |<a href="?other=x">Not a day</a>""".stripMargin
    assert(ConferenceExtract.parseCvfDayPages(html) ==
      Vector("?day=2024-06-19", "?day=2024-06-20"))
  }

  test("Atom first-entry id: entry[0] wins over later entries and decoys " +
    "outside entries; non-abs ids and empty feeds yield None") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<link href="http://arxiv.org/abs/0000.00000"/>
        |<entry><id>http://arxiv.org/abs/2401.12345v2</id></entry>
        |<entry><id>http://arxiv.org/abs/9999.99999</id></entry>
        |</feed>""".stripMargin
    assert(ArxivExtract.parseAtomFirstId(xml).contains("2401.12345"))
    assert(ArxivExtract.parseAtomFirstId("<feed></feed>").isEmpty)
    assert(ArxivExtract.parseAtomFirstId(
      "<feed><entry><id>http://example.org/x</id></entry></feed>").isEmpty)
  }

  test("E3 cleanXpathTitle: non-[a-zA-Z0-9#$%&()] chars become spaces, " +
    "runs collapse, ends trim (search_pdf.py:45-46)") {
    assert(ArxivExtract.cleanXpathTitle("  Fast R-CNN: 10% better (v2)!  ")
      == "Fast R CNN 10% better (v2)")
    assert(ArxivExtract.cleanXpathTitle("A&B $5 #tag") == "A&B $5 #tag")
    assert(ArxivExtract.cleanXpathTitle("über—naïve") == "ber na ve")
  }

  test("E3 xpath item parse: url from div/p/span/a[1], label cs.CV " +
    "preference, title through cleanXpathTitle; url-less items skipped") {
    val html =
      """<html><body><main><div><ol>
        |<li><div><p><span><a href="/pdf/1.pdf">pdf</a><a href="/x">no</a></span></p></div>
        |<div><div><span>cs.LG</span><span>cs.CV</span></div></div>
        |<p>Deep: learning, now!</p></li>
        |<li><div><p><span></span></p></div>
        |<div><div><span>cs.AI</span></div></div>
        |<p>Skipped (no url)</p></li>
        |</ol></div></main></body></html>""".stripMargin
    val items = ArxivExtract.parseArxivResultXpath(html)
    assert(items.length == 1)
    assert(items.head.url == "/pdf/1.pdf")
    assert(items.head.title == "Deep learning now")
    // label list = div/div/span[1] texts only — ["cs.LG"]; the cs.CV
    // preference is LIST membership (span[2] never enters the list), so
    // the first span-1 text wins exactly as in the reference
    assert(items.head.label == "cs.LG")
  }
}
