package graft.ops

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** K2b — Excel (.xlsx) sink, the write-side counterpart of
  * [[ExcelSource]] (reference: simple_etl.py:71-72 reads workbooks;
  * exporting results back to a workbook is the matching round-trip).
  * Dependency-free like the reader: an .xlsx is a zip of XML parts, so
  * the writer emits the five-part minimal package (content types, rels,
  * workbook, styles, one sheet).
  *
  * Driver-bound BY FORMAT: a worksheet caps at ~1,048,576 rows and a
  * workbook is one unsplittable zip — Excel export is a small-result
  * sink (reports, samples), never a data-scale path, so rows are
  * collected to the driver like any toLocalIterator-style export. Guard
  * with `maxRows` (fail-fast, not silent truncation).
  *
  * Cell typing mirrors the reader's contract: numerics as native
  * number cells, booleans as b-cells, dates/timestamps as day serials
  * carrying a date style (numFmtId 14/22 — the styles.xml lookup
  * [[ExcelSource.parseDateStyles]] resolves back to ISO strings),
  * everything else as XML-escaped inline strings (no sharedStrings
  * part needed).
  */
object ExcelSink {

  def xlsx(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val schema = df.schema
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"xlsx export exceeds $maxRows rows — Excel is a small-result sink; " +
        "write parquet/csv for data-scale output")
    val out = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      // xf index 1 = builtin date (14), 2 = builtin date-time (22)
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
          |</styleSheet>""".stripMargin)
      put("xl/worksheets/sheet1.xml", sheetXml(schema, rows))
    } finally out.close()
  }

  private def sheetXml(schema: StructType, rows: Array[Row]): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sb.append("<row>")
    schema.fields.foreach(f => sb.append(inlineStr(f.name)))
    sb.append("</row>")
    rows.foreach { row =>
      sb.append("<row>")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) sb.append(cellXml(f.dataType, row, i))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  private def cellXml(dt: DataType, row: Row, i: Int): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        _: DecimalType =>
      s"<c><v>${row.get(i)}</v></c>"
    case BooleanType =>
      s"""<c t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>"""
    case DateType =>
      val days = row.getAs[java.sql.Date](i).toLocalDate.toEpochDay -
        java.time.LocalDate.of(1899, 12, 30).toEpochDay
      s"""<c s="1"><v>$days</v></c>"""
    case TimestampType =>
      val ts = row.getAs[java.sql.Timestamp](i).toLocalDateTime
      val days = ts.toLocalDate.toEpochDay - java.time.LocalDate.of(1899, 12, 30).toEpochDay
      val frac = ts.toLocalTime.toSecondOfDay / 86400.0
      s"""<c s="2"><v>${days + frac}</v></c>"""
    case _ => inlineStr(String.valueOf(row.get(i)))
  }

  private def inlineStr(s: String): String = {
    val esc = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s"""<c t="inlineStr"><is><t xml:space="preserve">$esc</t></is></c>"""
  }
}
