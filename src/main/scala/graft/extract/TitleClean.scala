package graft.extract

import java.util.regex.Pattern

/** Title cleaning + fuzzy-search variant generation
  * (arxiv/arxiv_finder/name2arxivid.py:31-133). The regex-replace chain
  * order is semantic: extensions → connectors → prefixes → conference
  * patterns → years → suffix words.
  */
object TitleClean {

  private def re(p: String) =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.UNIX_LINES)

  private val Ext1 = re("\\.pdf.*$")
  private val Ext2 = re("\\.txt.*$")
  private val Connectors = Pattern.compile("[_-]")
  private val MultiSpace = Pattern.compile("\\s+")
  private val Prefixes = Seq(
    re("^paper\\s*[-_:]?\\s*"),
    re("^arxiv\\s*[-_:]?\\s*"),
    re("^preprint\\s*[-_:]?\\s*"),
    re("^draft\\s*[-_:]?\\s*"))
  private val ConfAlt = "(?:CVPR|ICCV|ECCV|ICLR|ICML|NeurIPS|AAAI|IJCAI|ACL|" +
    "EMNLP|NAACL|SIGIR|SIGKDD|WWW|ICDE|SIGMOD|VLDB|ICSE|FSE|ASE|OOPSLA|PLDI|" +
    "POPL|SOSP|OSDI|NSDI|SIGCOMM|INFOCOM|MOBICOM|SIGGRAPH|TOG|SIGCHI|UIST|CHI)"
  private val ConfPatterns = Seq(
    re("\\s*" + ConfAlt + "\\s*(?:20\\d{2})?\\s*(?:paper)?\\s*$"),
    re("\\s*(?:paper)?\\s*" + ConfAlt + "\\s*(?:20\\d{2})?\\s*$"),
    re("\\s*(?:20\\d{2})\\s*" + ConfAlt + "\\s*(?:paper)?\\s*$"))
  private val Years = Pattern.compile("\\s*20\\d{2}\\s*")
  private val Suffixes = Seq(
    re("\\s+paper\\s*$"), re("\\s+preprint\\s*$"), re("\\s+draft\\s*$"),
    re("\\s+version\\s*$"), re("\\s+final\\s*$"), re("\\s+submission\\s*$"))

  /** E10: clean_title (name2arxivid.py:31-91). */
  def cleanTitle(title0: String): String = {
    var t = Ext1.matcher(title0).replaceAll("")
    t = Ext2.matcher(t).replaceAll("")
    t = Connectors.matcher(t).replaceAll(" ")
    t = MultiSpace.matcher(t).replaceAll(" ").trim
    Prefixes.foreach(p => t = p.matcher(t).replaceAll(""))
    ConfPatterns.foreach(p => t = p.matcher(t).replaceAll(""))
    t = Years.matcher(t).replaceAll(" ")
    Suffixes.foreach(p => t = p.matcher(t).replaceAll(""))
    t = MultiSpace.matcher(t).replaceAll(" ").trim
    t.trim
  }

  val StopWords: Set[String] = Set("the", "a", "an", "and", "or", "but",
    "in", "on", "at", "to", "for", "of", "with", "by", "from", "up", "about",
    "into", "through", "during", "before", "after", "above", "below",
    "between", "among")

  /** E11: generate_search_variants (name2arxivid.py:93-133).
    * The reference dedups via `set()` → nondeterministic order run-to-run;
    * the engine fixes first-occurrence order and tests treat the variant
    * SET as the contract (SURVEY.md §7 watch-list 6).
    */
  def searchVariants(title: String): Vector[String] = {
    val variants = scala.collection.mutable.ArrayBuffer[String](title)
    variants += s""""$title""""
    val words = title.split(" ").toVector.filter(_.nonEmpty)
    val filtered = words.filterNot(w => StopWords.contains(w.toLowerCase))
    if (filtered.length > 3) variants += filtered.mkString(" ")
    if (words.length > 4) variants += words.take(4).mkString(" ")
    if (words.length > 3) variants += words.dropRight(1).mkString(" ")
    variants.map(_.trim).filter(_.nonEmpty).distinct.toVector
  }
}
