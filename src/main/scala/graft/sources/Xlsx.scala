package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** S3 — Excel (.xlsx) ingest (main_etl_pipeline.py:100-126,
  * `pd.read_excel` of gym_recommendation.xlsx / nutrition.xlsx).
  *
  * Zero-egress constraint: no spark-excel/POI dependency is available,
  * so this is a minimal self-contained OOXML reader — a .xlsx file is a
  * zip holding `xl/worksheets/sheetN.xml` (cells with A1-style refs) and
  * an optional `xl/sharedStrings.xml` string pool; both are parsed with
  * the JDK's StAX. Covers the subset the reference files use: shared /
  * inline strings, numbers, blanks (no formulas, styles, or dates-as-
  * serials — values surface as raw strings, typing is the caller's cast,
  * same contract as `pd.read_excel` + `to_numeric(errors='coerce')`).
  *
  * Scale stance: XLSX is a small-file format (the reference's largest is
  * 14,589 rows); parsing happens driver-side and the rows become a
  * DataFrame via `createDataFrame` — mirroring pandas, not a distributed
  * scan. Many-file corpora would wrap this per-file inside
  * `spark.read.binaryFile` + mapPartitions; a single workbook does not
  * shard. */
object Xlsx {

  /** Column index (0-based) from an A1-style ref: A→0, B→1, AA→26. */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def withReader[T](zip: ZipFile, entry: String)(
      f: XMLStreamReader => T): Option[T] = {
    Option(zip.getEntry(entry)).map { e =>
      val in = zip.getInputStream(e)
      // Harden against XXE: a hostile workbook's sheet XML must not be
      // able to pull in DTDs or external entities (driver-side parse).
      val factory = XMLInputFactory.newInstance()
      factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = factory.createXMLStreamReader(in)
      try f(r)
      finally { r.close(); in.close() }
    }
  }

  /** The shared-string pool: one entry per `<si>`, concatenating every
    * `<t>` run inside it. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    withReader(zip, "xl/sharedStrings.xml") { r =>
      val out = IndexedSeq.newBuilder[String]
      val cur = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            cur.appendAll(r.getTextCharacters, r.getTextStart,
              r.getTextLength)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; out += cur.result()
              case "t" => inT = false
              case _ => ()
            }
          case _ => ()
        }
      }
      out.result()
    }.getOrElse(IndexedSeq.empty)

  /** All rows of `sheetN` as dense string cells (None = blank), padded
    * to the widest row. */
  def readRows(path: String, sheet: Int = 1): Seq[IndexedSeq[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      val pool = sharedStrings(zip)
      val rows = withReader(zip, s"xl/worksheets/sheet$sheet.xml") { r =>
        val out = Seq.newBuilder[Map[Int, String]]
        var row = Map.empty[Int, String]
        var cellCol = -1
        var cellType = ""
        var inV = false
        var inInlineT = false
        val v = new StringBuilder
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" => row = Map.empty
                case "c" =>
                  cellCol = Option(r.getAttributeValue(null, "r"))
                    .map(colIndex).getOrElse(cellCol + 1)
                  cellType = Option(r.getAttributeValue(null, "t"))
                    .getOrElse("")
                  v.clear()
                case "v" => inV = true
                case "t" if cellType == "inlineStr" => inInlineT = true
                case _ => ()
              }
            case XMLStreamConstants.CHARACTERS if inV || inInlineT =>
              v.appendAll(r.getTextCharacters, r.getTextStart,
                r.getTextLength)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "row" => out += row
                case "c" =>
                  val raw = v.result()
                  if (raw.nonEmpty) {
                    val value =
                      if (cellType == "s") pool(raw.trim.toInt) else raw
                    row = row.updated(cellCol, value)
                  }
                case "v" => inV = false
                case "t" => inInlineT = false
                case _ => ()
              }
            case _ => ()
          }
        }
        out.result()
      }.getOrElse(Seq.empty)
      val width = rows.foldLeft(0)((w, m) =>
        math.max(w, m.keys.maxOption.map(_ + 1).getOrElse(0)))
      rows.map(m => IndexedSeq.tabulate(width)(m.get))
    } finally zip.close()
  }

  /** Read a workbook sheet as a DataFrame: first row = header (blank
    * header cells become `_c{i}`, the pandas unnamed-column analogue —
    * FIXTURES.md §4's leading index column), every value StringType. */
  def read(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val rows = readRows(path, sheet)
    require(rows.nonEmpty, s"empty sheet $sheet in $path")
    val header = rows.head.zipWithIndex.map {
      case (Some(h), _) if h.trim.nonEmpty => h
      case (_, i) => s"_c$i"
    }
    val schema = StructType(header.map(StructField(_, StringType, true)))
    val data = rows.tail.map(r => Row.fromSeq(r.map(_.orNull)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }
}
