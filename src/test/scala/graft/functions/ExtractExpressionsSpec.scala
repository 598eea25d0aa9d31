package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** The q28 native expressions must be exact column twins of the ScalaUDF
  * formulations they replaced — same outputs on every input shape,
  * including nulls, empties, and the extraction layer's regex edge cases.
  */
class ExtractExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("extract-expr-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val titles = Seq(
    "Attention Is All You Need",
    "  spaced   out  title ",
    "A an the of short", // stopword-heavy
    "one two three four five six seven", // > 4 words: head + dropRight
    "\"already quoted\"",
    "CVPR 2019 Deep Residual Learning (oral)",
    "arXiv:2106.01234 Learning to Crawl [cs.CL]",
    "x", // single word
    "", // empty
    "word-with-hyphen: and punctuation!")

  private val atomXmls = Seq(
    "<feed><entry><id>http://arxiv.org/abs/2401.12345v1</id></entry></feed>",
    "<feed><entry><id>http://arxiv.org/abs/2401.12345v1</id></entry>" +
      "<entry><id>http://arxiv.org/abs/9999.99999</id></entry></feed>",
    "<feed></feed>", // no entry → null
    "<feed><entry><id>not an arxiv id</id></entry></feed>", // no id → null
    "<feed><entry>no id tag</entry></feed>",
    "")

  test("clean_title / search_variants expressions equal the UDF twins on " +
    "every fixture title (plus null)") {
    import spark.implicits._
    val cleanUdf = udf((t: String) => graft.extract.TitleClean.cleanTitle(t))
    val varUdf = udf((t: String) => graft.extract.TitleClean.searchVariants(t))
    val df = (titles.map(Option(_)) :+ None).toDF("t").repartition(2)
      .select(col("t"),
        ColumnBridge.column(CleanTitle(ColumnBridge.expression(col("t"))))
          .as("ce"),
        when(col("t").isNotNull, cleanUdf(col("t"))).as("cu"),
        ColumnBridge.column(SearchVariants(ColumnBridge.expression(col("t"))))
          .as("ve"),
        when(col("t").isNotNull, varUdf(col("t"))).as("vu"))
    df.collect().foreach { r =>
      assert(r.get(1) == r.get(2), s"clean_title drift on '${r.get(0)}'")
      assert(r.get(3) == r.get(4), s"search_variants drift on '${r.get(0)}'")
    }
    // the variant order contract q28 depends on: original title first
    val v = df.filter(col("t") === titles.head).select("ve")
      .as[Seq[String]].head()
    assert(v.head == titles.head)
  }

  test("atom_first_id expression equals the UDF twin: first entry wins, " +
    "unresolvable feeds are NULL (null-in-null-out)") {
    import spark.implicits._
    val udfTwin = udf((xml: String) => Option(xml)
      .flatMap(graft.extract.ArxivExtract.parseAtomFirstId).orNull)
    val rows = (atomXmls.map(Option(_)) :+ None).toDF("x").repartition(2)
      .select(col("x"),
        ColumnBridge.column(AtomFirstId(ColumnBridge.expression(col("x"))))
          .as("e"),
        udfTwin(col("x")).as("u"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"atom_first_id drift on '${r.get(0)}'")
    }
    // the decoy-second-entry contract (name2arxivid.py:165 parses entry[0])
    val first = rows.find(r => Option(r.getString(0))
      .exists(_.contains("9999.99999"))).get
    assert(first.getString(1) == "2401.12345")
  }

  test("SQL surface: the functions are registered and callable") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT clean_title('CVPR 2019 Foo'), size(search_variants('a b c d e')), " +
        "atom_first_id('<feed><entry><id>http://arxiv.org/abs/2401.00001v2" +
        "</id></entry></feed>')").collect()(0)
    assert(r.getString(0).nonEmpty)
    assert(r.getInt(1) >= 2)
    assert(r.getString(2) == "2401.00001")
  }
}
