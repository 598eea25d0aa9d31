package graft.url

import org.scalatest.funsuite.AnyFunSuite

class UrlCanonSpec extends AnyFunSuite {
  import UrlCanon._

  test("canonicalize: scheme/host lowering, default ports, dot segments") {
    assert(canonicalize("HTTP://ArXiv.ORG:80/a/../abs/1") ==
      "http://arxiv.org/abs/1")
    assert(canonicalize("https://Example.com:443/") == "https://example.com/")
    assert(canonicalize("https://example.com:8443/x") ==
      "https://example.com:8443/x")
    assert(canonicalize("http://h.example") == "http://h.example/")
  }

  test("canonicalize: percent normalization + reference fixups") {
    assert(canonicalize("http://h/a%2fb%7E") == "http://h/a%2Fb~")
    assert(canonicalize("http://h/a b") == "http://h/a%20b") // ICRA.py:45
    assert(canonicalize("http://h/p?x=1&amp;y=2") == "http://h/p?x=1&y=2") // ICRA.py:76
    assert(canonicalize("http://h/p#frag") == "http://h/p")
  }

  test("resolve: RFC 3986 cases (urljoin parity)") {
    val base = "http://a.example/b/c/d?q"
    assert(resolve(base, "g") == "http://a.example/b/c/g")
    assert(resolve(base, "./g") == "http://a.example/b/c/g")
    assert(resolve(base, "/g") == "http://a.example/g")
    assert(resolve(base, "../g") == "http://a.example/b/g")
    assert(resolve(base, "../../g") == "http://a.example/g")
    assert(resolve(base, "//other.example/x") == "http://other.example/x")
    assert(resolve(base, "https://s.example/y") == "https://s.example/y")
    assert(resolve(base, "?alt") == "http://a.example/b/c/d?alt")
    assert(resolve(base, "") == base)
  }

  test("fixups and filename derivation (E16/E17)") {
    assert(absToPdf("https://arxiv.org/abs/2406.1") ==
      "https://arxiv.org/pdf/2406.1")
    assert(htmlToPdf("http://x/p.html") == "http://x/p.pdf")
    assert(cnMirror("https://arxiv.org/abs/1") == "http://cn.arxiv.org/abs/1")
    assert(basename("https://arxiv.org/pdf/2406.01004") == "2406.01004")
    assert(basename("http://x/a.pdf?b=1") == "a.pdf?b=1") // python basename quirk
    assert(openreviewId("https://openreview.net/pdf?id=AbCd") == "AbCd")
    assert(ownerRepo("https://github.com/apache/spark") == "apache_spark")
    assert(sanitizeIsca("a/b\\c") == "a_b_c")
    assert(sanitizeTitle("my title/x") == "my_title_x")
  }

  test("hostOf") {
    assert(hostOf("https://User@ArXiv.org:8080/x") == "arxiv.org")
    assert(hostOf("relative/path") == "")
  }

  // property (exhaustive enumeration, deterministic): c(c(u)) == c(u)
  test("property: canonicalize is idempotent over the URL grammar") {
    val segChoices = Seq("a", "..", ".", "B%2f", "x y", "%7e")
    for {
      scheme <- Seq("http", "https", "HTTP")
      host <- Seq("ArXiv.org", "a.B.c")
      port <- Seq("", ":80", ":443", ":8080")
      s1 <- segChoices; s2 <- segChoices
      q <- Seq("", "?a=1&amp;b=2", "?x")
    } {
      val u = s"$scheme://$host$port/$s1/$s2$q"
      val c = canonicalize(u)
      assert(canonicalize(c) == c, s"not idempotent for $u → $c")
    }
  }

  // property: resolving a canonical absolute ref against any base is identity
  test("property: resolve(base, absolute-canonical-ref) == ref") {
    val bases = Seq("http://b.example/x/y?q", "https://z.example/")
    val refs = Seq("http://a.example/p/q", "https://h.example/?x=1")
    for (b <- bases; r <- refs) assert(resolve(b, r) == r)
  }
}
