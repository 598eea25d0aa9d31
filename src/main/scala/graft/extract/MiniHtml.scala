package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Minimal deterministic HTML parser producing a DOM with lxml/bs4-style
  * accessors (`text`/`tail`, `getText`, class matching). Zero external
  * deps (the offline classpath has no jsoup); handles the well-formed
  * fixture HTML this engine crawls — tags, double/single-quoted and bare
  * attributes, void elements, comments.
  *
  * The accessors deliberately mirror the Python libraries the reference
  * uses so the extraction semantics (SURVEY.md E4, E12, J1/J3) can be
  * replicated byte-for-byte:
  *   - `text` = lxml `.text` (text before the first child element)
  *   - `tail` = lxml `.tail` (text after the element's end tag)
  *   - `getText` = bs4 `get_text()` (all descendant text, no separator)
  *   - `strippedStrings` = bs4 `.stripped_strings`
  */
object MiniHtml {

  sealed trait Node
  final case class Text(value: String) extends Node
  final case class Element(
      name: String,
      attrs: Map[String, String],
      var children: Vector[Node]
  ) extends Node {

    def attr(k: String): Option[String] = attrs.get(k)

    /** bs4 multi-valued class membership: `class_='x'` matches a token. */
    def hasClassToken(cls: String): Boolean =
      attrs.get("class").exists(_.split("\\s+").contains(cls))

    /** bs4 exact-string class match (used when the query contains spaces,
      * e.g. find('a', class_='notinfluential mathjax')).
      */
    def hasClassExact(cls: String): Boolean =
      if (cls.contains(" ")) attrs.get("class").contains(cls)
      else hasClassToken(cls)

    /** lxml `.text`: text before the first child element (or None). */
    def text: Option[String] = children.headOption match {
      case Some(Text(t)) => Some(t)
      case _             => None
    }

    /** Direct text-node children, in order (xpath `text()`). */
    def directTexts: Vector[String] = children.collect { case Text(t) => t }

    /** Direct child elements, optionally filtered by tag name. */
    def childElements(name: String = null): Vector[Element] =
      children.collect {
        case e: Element if name == null || e.name == name => e
      }

    /** xpath positional child: name[i], 1-based; None if absent. */
    def nthChild(name: String, i: Int): Option[Element] = {
      val cs = childElements(name)
      if (i >= 1 && i <= cs.length) Some(cs(i - 1)) else None
    }

    /** lxml `.tail` of a direct child element. */
    def tailOf(child: Element): Option[String] = {
      val i = children.indexWhere(_ eq child)
      if (i >= 0 && i + 1 < children.length) children(i + 1) match {
        case Text(t) => Some(t)
        case _       => None
      }
      else None
    }

    /** All descendant elements in document order (bs4 find_all). */
    def descendants: Vector[Element] = {
      val out = ArrayBuffer[Element]()
      def rec(e: Element): Unit = e.children.foreach {
        case c: Element => out += c; rec(c)
        case _          =>
      }
      rec(this)
      out.toVector
    }

    def findAll(tag: String): Vector[Element] =
      descendants.filter(_.name == tag)

    def findAllByClass(tag: String, cls: String): Vector[Element] =
      descendants.filter(e => e.name == tag && e.hasClassExact(cls))

    def findFirst(tag: String): Option[Element] = {
      def rec(e: Element): Option[Element] = {
        e.children.foreach {
          case c: Element =>
            if (c.name == tag) return Some(c)
            rec(c) match { case s @ Some(_) => return s; case None => }
          case _ =>
        }
        None
      }
      rec(this)
    }

    def findFirstByClass(tag: String, cls: String): Option[Element] =
      descendants.find(e => e.name == tag && e.hasClassExact(cls))

    def findById(id: String): Option[Element] =
      descendants.find(_.attrs.get("id").contains(id))

    /** bs4 get_text(): concatenated descendant text, no separator. */
    def getText: String = {
      val sb = new StringBuilder
      def rec(n: Node): Unit = n match {
        case Text(t)    => sb.append(t)
        case e: Element => e.children.foreach(rec)
      }
      children.foreach(rec)
      sb.toString
    }

    /** bs4 stripped_strings: stripped, non-empty text descendants. */
    def strippedStrings: Vector[String] = {
      val out = ArrayBuffer[String]()
      def rec(n: Node): Unit = n match {
        case Text(t) =>
          val s = t.trim
          if (s.nonEmpty) out += s
        case e: Element => e.children.foreach(rec)
      }
      children.foreach(rec)
      out.toVector
    }
  }

  private val Void = Set("br", "img", "hr", "meta", "link", "input",
    "area", "base", "col", "embed", "source", "track", "wbr")

  /** Parse an HTML document; returns a synthetic root element whose
    * children are the top-level nodes.
    */
  def parse(html: String): Element = {
    val root = Element("#root", Map.empty, Vector.empty)
    val stack = scala.collection.mutable.Stack[
      (Element, ArrayBuffer[Node])]((root, ArrayBuffer[Node]()))
    var i = 0
    val n = html.length

    def closeTop(): Unit = {
      val (el, kids) = stack.pop()
      el.children = kids.toVector
      stack.top._2 += el
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt == -1) {
        if (i < n) stack.top._2 += Text(html.substring(i))
        i = n
      } else {
        if (lt > i) stack.top._2 += Text(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end == -1) n else end + 3
        } else if (html.startsWith("<!", lt) || html.startsWith("<?", lt)) {
          val end = html.indexOf('>', lt)
          i = if (end == -1) n else end + 1
        } else if (html.startsWith("</", lt)) {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end == -1) n else end)
            .trim.toLowerCase
          // close up to the matching open tag (ignore strays)
          if (stack.exists { case (e, _) => e.name == name }) {
            while (stack.top._1.name != name) closeTop()
            closeTop()
          }
          i = if (end == -1) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end == -1) { stack.top._2 += Text(html.substring(lt)); i = n }
          else {
            val inner = html.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val (name, attrs) = parseTag(body)
            val el = Element(name, attrs, Vector.empty)
            if (selfClose || Void(name)) stack.top._2 += el
            else stack.push((el, ArrayBuffer[Node]()))
            i = end + 1
          }
        }
      }
    }
    while (stack.size > 1) closeTop()
    val (r, kids) = stack.pop()
    r.children = kids.toVector
    r
  }

  private def parseTag(body: String): (String, Map[String, String]) = {
    val sp = body.indexWhere(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
    if (sp == -1) (body.trim.toLowerCase, Map.empty)
    else {
      val name = body.substring(0, sp).toLowerCase
      var attrs = Map.empty[String, String]
      var i = sp
      val n = body.length
      while (i < n) {
        while (i < n && body.charAt(i).isWhitespace) i += 1
        if (i < n) {
          val eq = {
            var j = i
            while (j < n && body.charAt(j) != '=' && !body.charAt(j).isWhitespace) j += 1
            j
          }
          val key = body.substring(i, eq).toLowerCase
          i = eq
          while (i < n && body.charAt(i).isWhitespace) i += 1
          if (i < n && body.charAt(i) == '=') {
            i += 1
            while (i < n && body.charAt(i).isWhitespace) i += 1
            if (i < n && (body.charAt(i) == '"' || body.charAt(i) == '\'')) {
              val q = body.charAt(i)
              val close = body.indexOf(q, i + 1)
              val v = body.substring(i + 1, if (close == -1) n else close)
              if (key.nonEmpty) attrs += (key -> v)
              i = if (close == -1) n else close + 1
            } else {
              var j = i
              while (j < n && !body.charAt(j).isWhitespace) j += 1
              if (key.nonEmpty) attrs += (key -> body.substring(i, j))
              i = j
            }
          } else if (key.nonEmpty) attrs += (key -> "")
        }
      }
      (name, attrs)
    }
  }
}
