package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S5 JDBC ordered sink (embedded Derby) + S3 minimal XLSX reader. */
class JdbcXlsxSpec extends SparkSpec {
  import spark.implicits._

  test("S5: ordered JDBC load round-trips through embedded Derby") {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dir/wh;create=true"
    val dim = Seq((1, "breakfast"), (2, "lunch")).toDF("meal_key", "meal")
    val fact = Seq((10L, 1, 320.5), (11L, 2, 610.0))
      .toDF("log_id", "meal_key", "calories")
    Sources.writeOrderedJdbc(Seq("dim_meal" -> dim, "fact_log" -> fact), url)
    val back = spark.read.jdbc(url, "fact_log", new java.util.Properties)
    assert(back.count() == 2)
    assert(back.agg(sum("calories")).head().getDouble(0) == 930.5)
    // ordered re-load (append mode) doubles the facts, keeps schema
    Sources.writeOrderedJdbc(Seq("fact_log" -> fact), url, mode = "append")
    assert(spark.read.jdbc(url, "fact_log", new java.util.Properties)
      .count() == 4)
  }

  test("S5: MySQL dialect mapping writeOrderedJdbc would use is pinned") {
    // The reference's actual sink is MySQL (main_etl_pipeline.py:752-794,
    // pandas.to_sql over mysql+pymysql). No MySQL server or driver jar
    // exists in this zero-egress sandbox, so the LIVE round trip can't
    // run — but the dialect translation df.write.jdbc would apply is
    // pure library code, so pin it: Spark resolves MySQLDialect from
    // the URL and maps every warehouse column type to the MySQL DDL
    // the reference's schema (db_schema.sql) declares.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val d = JdbcDialects.get("jdbc:mysql://warehouse-host/fitness")
    assert(d.getClass.getSimpleName == "MySQLDialect")
    def ddl(t: DataType): String =
      d.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse("?")
    // db_schema.sql column classes → MySQL DDL through the dialect
    assert(ddl(DecimalType(10, 2)) == "DECIMAL(10,2)") // money/macros
    assert(ddl(DateType) == "DATE")                    // log_date
    assert(ddl(TimestampType) == "TIMESTAMP")          // created_at
    assert(ddl(LongType) == "BIGINT")                  // surrogate keys
    assert(ddl(IntegerType) == "INTEGER")              // small ids
    assert(ddl(DoubleType) == "DOUBLE PRECISION")      // measurements
    assert(ddl(BooleanType) == "BIT(1)")               // flags
    assert(ddl(StringType) == "LONGTEXT")              // free text
    // identifier quoting is MySQL backticks (reserved words like
    // `order` survive), unlike Derby's double quotes
    assert(d.quoteIdentifier("order") == "`order`")
  }

  private def tinyXlsx(): String = {
    val f = java.nio.file.Files.createTempFile("graft", ".xlsx")
    val z = new ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    def put(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(UTF_8)); z.closeEntry()
    }
    // shared strings incl. a multi-run <si> ("oa"+"ts")
    put("xl/sharedStrings.xml",
      """<sst><si><t>name</t></si><si><t>calories</t></si>""" +
        """<si><r><t>oa</t></r><r><t>ts</t></r></si></sst>""")
    // header starts at B1 (nutrition.xlsx's unnamed leading col);
    // row2: shared string; row3: inline string + blank B-cell handling
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>""" +
        """<row r="1"><c r="B1" t="s"><v>0</v></c>""" +
        """<c r="C1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c>""" +
        """<c r="B2" t="s"><v>2</v></c><c r="C2"><v>389</v></c></row>""" +
        """<row r="3"><c r="A3"><v>2</v></c>""" +
        """<c r="B3" t="inlineStr"><is><t>banana</t></is></c>""" +
        """<c r="C3"><v>89</v></c></row>""" +
        """</sheetData></worksheet>""")
    z.close()
    f.toString
  }

  test("S3: xlsx reader — headers, shared/inline strings, blanks") {
    val df = Xlsx.read(spark, tinyXlsx())
    assert(df.columns.toSeq == Seq("_c0", "name", "calories"))
    val rows = df.orderBy("_c0").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq("oats" -> "389", "banana" -> "89"))
  }

  test("S3: reads the reference's real gym_recommendation.xlsx") {
    val path = "/root/reference/data/gym_recommendation.xlsx"
    assume(new java.io.File(path).exists())
    val df = Xlsx.read(spark, path)
    assert(df.columns.contains("Fitness Goal"))
    assert(df.count() == 14589) // etl_pipeline.log:13
    // numeric casts work through the string surface
    val ages = df.select(col("Age").cast("int")).na.drop()
    assert(ages.count() == 14589)
  }

  test("S3: reads the reference's real nutrition.xlsx with unit strip") {
    val path = "/root/reference/data/nutrition.xlsx"
    assume(new java.io.File(path).exists())
    val df = Xlsx.read(spark, path)
    assert(df.count() == 8789) // etl_pipeline.log:15
    assert(df.columns.contains("name"))
    // T3 unit-strip cast applies directly to the raw string surface
    val fat = df.select(
      graft.etl.Normalize.stripUnitCast(col("total_fat")).as("g")).na.drop()
    assert(fat.count() > 8000)
  }

  test("colIndex decodes A1 refs") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("B7") == 1)
    assert(Xlsx.colIndex("Z1") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("AB12") == 27)
  }
}
