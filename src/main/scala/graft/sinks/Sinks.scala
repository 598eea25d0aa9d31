package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink formatters replicating the reference's output byte formats
  * (SURVEY.md §2.1 K1-K5). Each produces the exact file CONTENT as ordered
  * rows; the physical write is `df.write` (distributed) or a
  * single-partition text write where the reference's format demands one
  * serial file.
  *
  * Scale note: every ordered sink sorts by `crawl_rank` — a range-
  * partitioned sort, the one unavoidable shuffle (the contract IS the
  * order). Per-key files use `partitionBy` so each key's file is written
  * by its own task; nothing funnels through the driver.
  */
object Sinks {

  /** K1 (arxiv/search_pdf_string.py:190-200): cleaned, minimally-quoted
    * CSV. Field cleaning: strip + newline/CR → space; quoting rule =
    * Python csv QUOTE_MINIMAL (quote only when the field contains
    * delimiter, quote char, or newline — post-clean, newlines are gone, so
    * comma/quote only; quotes doubled).
    */
  def cleanField(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\r\n]", " "), "^\\s+|\\s+$", ""))

  def quoteMinimal(c: Column): Column =
    when(c.contains(",") || c.contains("\""),
      concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
      .otherwise(c)

  /** One CSV line per row over the given columns, K1 semantics. */
  def csvLine(cols: Seq[Column]): Column =
    concat_ws(",", cols.map(c => quoteMinimal(cleanField(c))): _*)

  /** K2 (arxiv/search_pdf.py:104-110): the naive `','.join(values)` variant
    * — NO quoting, NO cleaning (byte-compat means not using a csv writer).
    */
  def naiveCsvLine(cols: Seq[Column]): Column = concat_ws(",", cols: _*)

  /** K3 (new.py:58-62 + WriteTxt): ordered markdown digest per key — all
    * blocks of a key concatenated in crawl order into one string column
    * (the file body). sort_array on (rank, block) structs keeps the
    * aggregation a single hash-agg instead of a global sort.
    */
  def orderedDigest(df: DataFrame, key: Column, rank: Column,
      block: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(concat_ws("",
        sort_array(collect_list(struct(rank.as("r"), block.as("b"))))
          .getField("b")).as("body"))

  /** K4 (new.py:79-82): the appended counts row
    * `"\n{date},n1,…,n8"` — subjects pivoted wide in the FIXED subject
    * order (dict order in the reference), one formatted line per date.
    */
  def countsRow(df: DataFrame, date: Column, subject: Column,
      subjects: Seq[String]): DataFrame = {
    val wide = df.groupBy(date.as("date"))
      .pivot("subject", subjects)
      .count().na.fill(0L)
    wide.select(col("date"),
      concat_ws(",", col("date") +: subjects.map(s => col(s"`$s`")): _*)
        .as("line"))
  }

  /** K5 (search_pdf_string.py:176-188): dir-per-label artifact layout —
    * rows keyed (label, file_name) with the binary payload; physical form
    * is `write.partitionBy("label")`, mirroring `dir/label/name.pdf`.
    */
  def artifactLayout(df: DataFrame, label: Column, url: Column,
      payload: Column): DataFrame =
    df.select(label.as("label"),
      element_at(split(url, "/"), -1).as("file_name"),
      payload.as("payload"))

  /** K6 (process sink): the reference shells out one command per row —
    * `os.system("cd out/page_i && git clone --recursive <url> <name>&")`
    * (getrepository.py:157,178) and `os.system(f'yt-dlp <url> -o
    * <dir>/<id>.mp4')` (dataset/youtube.py:73-74). The TESTABLE contract
    * is the command BYTES; generation is a distributed projection, and
    * execution — inherently environment-side — is
    * `ds.foreachPartition(_.foreach(cmd => Runtime.exec(...)))` on a
    * cluster with the tools installed (never run in this sandbox).
    */
  def gitCloneCommands(df: DataFrame, outputDir: Column, pageDir: Column,
      url: Column, name: Column): DataFrame =
    df.select(concat(
      lit("cd "), concat_ws("/", outputDir, pageDir),
      lit(" && git clone --recursive "), url, lit(" "), name, lit("&"))
      .as("command"))

  def ytDlpCommands(df: DataFrame, outputDir: Column, videoId: Column): DataFrame =
    df.select(concat(
      lit("yt-dlp https://www.youtube.com/watch?v="), videoId,
      lit(" -o "), concat_ws("/", outputDir, concat(videoId, lit(".mp4"))))
      .as("command"))

  /** K7 (arxiv.py:178-184 / getrepository.py save): timestamped XML dump —
    * file name `YYYYMMDD-HHMMSS .xml` (the reference's strftime pattern
    * ends with a literal SPACE before the extension) opened in APPEND mode.
    * The clock is injected so the contract is testable; production passes
    * `System.currentTimeMillis`. The timezone defaults to the system zone
    * — the reference formats via `time.localtime` — and is a parameter so
    * tests (and multi-zone fleets that want stable names) can pin UTC.
    */
  def tsXmlDump(dir: String, content: String,
      clockMs: () => Long = () => System.currentTimeMillis(),
      zone: java.util.TimeZone = java.util.TimeZone.getDefault): java.nio.file.Path = {
    val fmt = new java.text.SimpleDateFormat("yyyyMMdd-HHmmss ")
    fmt.setTimeZone(zone)
    val name = fmt.format(new java.util.Date(clockMs())) + ".xml"
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val f = d.resolve(name)
    java.nio.file.Files.writeString(f, content,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    f
  }
}
