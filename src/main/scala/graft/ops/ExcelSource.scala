package graft.ops

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable

/** S2 — Excel (.xlsx) source (reference: simple_etl.py:71-72 via
  * openpyxl). No Excel jar ships offline, so this is a dependency-free
  * reader built on what every JVM has: an .xlsx file is a zip of XML
  * parts; we parse `xl/sharedStrings.xml` and the first
  * `xl/worksheets/sheet*.xml` with StAX.
  *
  * Distribution model: one Excel file is one task (`binaryFiles` keeps
  * each file whole — the zip container is not splittable), so a
  * directory of workbooks parallelizes per file, matching how
  * spreadsheet data arrives in practice (many small uploads, never one
  * 100 TB sheet). Values come back as strings, like the reference's
  * all-string fallback (simple_etl.py:169) — EXCEPT date-styled cells,
  * whose day serials are converted to ISO date/date-time strings via
  * the styles.xml number-format lookup (the same lookup openpyxl does
  * for the reference, simple_etl.py:71-72); compose with
  * `Mutation.castColumn` / an explicit select to type them.
  */
object ExcelSource {

  /** Read .xlsx file(s) at `path` (a file or a directory of files) into
    * a DataFrame. `header=true` takes row 1 of each sheet as column
    * names (all files must agree); otherwise columns are `_c0.._cN`.
    *
    * `inferTypes=true` (default) types each column the way openpyxl's
    * primary path hands cells to the reference (simple_etl.py:71-72):
    * a column whose every non-null value is an integral number becomes
    * bigint, else all-numeric becomes double, else it stays string
    * (date-styled cells surface as ISO strings — compose with
    * `Mutation.castColumn` for date typing). Inference is one aggregate
    * job over the parsed strings — the same eager-scan contract as
    * `spark.read.csv(inferSchema=true)`. `inferTypes=false` keeps the
    * reference's all-string fallback (simple_etl.py:169).
    */
  def xlsx(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      inferTypes: Boolean = true): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    def requireRows(rows: Seq[Array[String]], src: String): Seq[Array[String]] = {
      if (rows.isEmpty) throw new IllegalArgumentException(
        s"xlsx workbook has a sheet but no rows: $src")
      rows
    }
    val headerRow: Array[String] =
      if (header) files.map { case (p, s) => requireRows(parseWorkbook(s.toArray()), p).head }.first()
      else {
        val w = files.map { case (p, s) =>
          requireRows(parseWorkbook(s.toArray()), p).map(_.length).max
        }.max()
        Array.tabulate(w)(i => s"_c$i")
      }
    val nCols = headerRow.length
    val dataRdd = files
      .flatMap { case (_, stream) =>
        // header dropped per FILE here (binaryFiles may pack several
        // small files into one partition, so partition-level dropping
        // would be wrong)
        val rows = parseWorkbook(stream.toArray())
        if (header) rows.drop(1) else rows
      }
      .map { cells =>
        Row.fromSeq(Array.tabulate(nCols)(i =>
          if (i < cells.length && cells(i) != null && cells(i).nonEmpty) cells(i) else null))
      }
    val schema = StructType(headerRow.map(n => StructField(n, StringType, nullable = true)))
    val raw = spark.createDataFrame(dataRdd, schema)
    if (inferTypes) inferColumnTypes(raw) else raw
  }

  /** Per-column type inference over an all-string frame: ONE aggregate
    * computes, for every column, (non-null count, integral count,
    * double-castable count); a column is bigint when every non-null
    * value is integral, else double when every non-null value
    * double-casts, else string. "Integral" is double-castable AND
    * numerically equal to its bigint truncation — the explicit check
    * matters because the ANSI-off string→bigint cast does NOT reject
    * "2.5", it silently truncates it to 2. Mixed columns and ISO date
    * strings fail the double cast and stay strings.
    */
  private def inferColumnTypes(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, sum, when}
    val aggs = raw.columns.flatMap { c =>
      val asDouble = col(c).cast("double")
      val integral = asDouble.isNotNull && col(c).cast("bigint").cast("double") === asDouble
      Seq(
        count(col(c)).as(s"__n_$c"),
        sum(when(integral, 1L).otherwise(0L)).as(s"__l_$c"),
        sum(when(asDouble.isNotNull, 1L).otherwise(0L)).as(s"__d_$c"))
    }
    val stats = raw.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val typed = raw.columns.map { c =>
      val n = stats.getAs[Long](s"__n_$c")
      val nLong = stats.getAs[Long](s"__l_$c")
      val nDouble = stats.getAs[Long](s"__d_$c")
      if (n > 0 && nLong == n) col(c).cast("bigint").as(c)
      else if (n > 0 && nDouble == n) col(c).cast("double").as(c)
      else col(c)
    }
    raw.select(typed.toIndexedSeq: _*)
  }

  /** Parse one workbook's bytes: returns rows of cell strings (ragged —
    * trailing empty cells absent). Kept `private[graft]` for direct unit
    * testing.
    */
  private[graft] def parseWorkbook(bytes: Array[Byte]): Seq[Array[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var dateStyles: Set[Int] = Set.empty
    var sheet: Option[Array[Byte]] = None
    var sheetName: String = ""
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (name == "xl/styles.xml") dateStyles = parseDateStyles(zin.readAllBytes())
        else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml") &&
          (sheet.isEmpty || sheetOrder(name) < sheetOrder(sheetName))) {
          // numeric compare: sheet2.xml must beat sheet10.xml (Excel does
          // not renumber parts, so sheet1.xml may be absent entirely)
          sheet = Some(zin.readAllBytes()); sheetName = name
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    sheet match {
      case Some(s) => parseSheet(s, shared, dateStyles)
      case None => throw new IllegalArgumentException(
        "not an .xlsx workbook: no xl/worksheets/sheet*.xml entry")
    }
  }

  /** Indices into cellXfs whose number format is a DATE/TIME format —
    * xlsx stores dates as day serials (45321 = 2024-01-30) typed only by
    * the cell's style, which is why a format-blind reader round-trips
    * date columns as garbage numbers (the reference gets real dates via
    * openpyxl's identical styles.xml lookup). Builtin date format ids
    * (14-22 dates/times, 27-36 era dates, 45-47 durations, 50-58 locale
    * dates) plus custom formatCodes containing date tokens count.
    */
  private[graft] def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val builtinDate: Set[Int] =
      (14 to 22).toSet ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)
    def isDateCode(code: String): Boolean = {
      // strip quoted literals, [color/locale] sections, escaped chars;
      // date formats then contain y/m/d/h tokens (m alone is ambiguous
      // with minutes — still a date/time format either way)
      val s = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\\\\.", "")
      s.exists(c => c == 'y' || c == 'd' || c == 'h' || c == 'm' ||
        c == 'Y' || c == 'D' || c == 'H' || c == 'M')
    }
    val r = newReader(bytes)
    val customDate = mutable.Set.empty[Int]
    val xfFmts = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false // cellStyleXfs also holds <xf>; only cellXfs counts
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
              id.foreach(i => if (isDateCode(code)) customDate += i)
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfFmts.zipWithIndex.collect {
      case (fmt, i) if builtinDate(fmt) || customDate(fmt) => i
    }.toSet
  }

  /** Excel day serial -> ISO string: whole serials become dates,
    * fractional serials date-times (fraction = time of day). Base is
    * 1899-12-30, the standard conversion that absorbs Excel's fictional
    * 1900-02-29 for all modern serials (openpyxl uses the same base).
    */
  private[graft] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    val date = java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    val secs = math.round((serial - days) * 86400.0)
    if (secs == 0L) date.toString
    else s"${date.plusDays(secs / 86400)} ${java.time.LocalTime.ofSecondOfDay(secs % 86400)
      .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))}"
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** sharedStrings.xml: <sst><si><t>text</t></si>...</sst>; rich-text
    * cells use runs (<si><r><t>a</t></r><r><t>b</t></r></si>) which
    * concatenate.
    */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = newReader(bytes)
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** sheetN.xml rows: <row><c r="B2" t="s|inlineStr|str|b|n"><v>..</v>
    * </c></row>. Column position comes from the A1-style `r` attribute
    * (cells for empty columns are simply absent).
    */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
      dateStyles: Set[Int]): Seq[Array[String]] = {
    val r = newReader(bytes)
    val rows = mutable.ArrayBuffer.empty[Array[String]]
    val cells = mutable.ArrayBuffer.empty[(Int, String)]
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    val v = new StringBuilder
    var nextCol = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells.clear(); nextCol = 0
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(-1)
              v.clear()
            case "v" | "t" => inV = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => inV = false
            case "c" =>
              val raw = v.toString
              val value = cellType match {
                case "s" => shared(raw.trim.toInt)
                case "b" => if (raw.trim == "1") "true" else "false"
                case "n" if dateStyles(cellStyle) && raw.nonEmpty =>
                  // date-styled numeric cell: serial -> ISO date string
                  raw.trim.toDoubleOption.map(serialToIso).getOrElse(raw)
                case _ => raw // n, str, inlineStr (t-element text lands in v)
              }
              if (value.nonEmpty) cells += ((cellCol, value))
            case "row" =>
              if (cells.nonEmpty) {
                val width = cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, s) => arr(i) = s }
                rows += arr
              }
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** Numeric sheet index from an entry name ("xl/worksheets/sheet10.xml"
    * -> 10); non-numeric names sort last.
    */
  private def sheetOrder(entryName: String): Long = {
    val digits = entryName.stripPrefix("xl/worksheets/sheet").takeWhile(_.isDigit)
    if (digits.isEmpty) Long.MaxValue else digits.toLong
  }

  /** "BC7" -> 0-based column 54. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}
