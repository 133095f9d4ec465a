package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("v", DoubleType)))

  test("S1 csv reads with declared schema, skips missing files") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src")
    java.nio.file.Files.writeString(dir.resolve("a.csv"),
      "id,name,v\n1,alpha,1.5\n2,beta,2.5\n")
    val (loaded, missing) = Sources.csvBatch(spark, Map(
      "a" -> (dir.resolve("a.csv").toString, schema),
      "gone" -> (dir.resolve("gone.csv").toString, schema)))
    assert(loaded.keySet == Set("a"))
    assert(missing == Seq("gone"))
    val rows = loaded("a").orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha" && rows(0).getDouble(2) == 1.5)
    assert(loaded("a").schema == schema)
  }

  test("S1 csvPermissive captures malformed rows as data") {
    val dir = java.nio.file.Files.createTempDirectory("csv_perm")
    java.nio.file.Files.writeString(dir.resolve("m.csv"),
      "id,name,v\n1,alpha,1.5\n2,beta,not_a_double\n3,gamma,3.5\n")
    val df = Sources
      .csvPermissive(spark, dir.resolve("m.csv").toString, schema).get
    val rows = df.select("id", "name", "v", "_corrupt_record")
      .orderBy("name").collect()
    assert(rows.length == 3)
    // good rows parse; their corrupt column is null
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(3))
    assert(rows(2).getLong(0) == 3L && rows(2).isNullAt(3))
    // the bad row keeps its parseable cells, nulls the bad one, and
    // carries the raw line for quarantine
    val bad = rows(1)
    assert(bad.isNullAt(2), "unparseable double must be null")
    assert(bad.getString(3).contains("not_a_double"))
    // quantify-bad-rows: aggregates over the corrupt column alone must
    // run on a cached parse (Spark refuses to prune a raw-file scan
    // down to ONLY the corrupt column; see csvPermissive scaladoc)
    val cached = df.cache()
    try assert(
      cached.filter(col("_corrupt_record").isNotNull).count() == 1)
    finally cached.unpersist()
    // absent path stays None (missing-file tolerance)
    assert(Sources.csvPermissive(spark,
      dir.resolve("gone.csv").toString, schema).isEmpty)
  }

  test("S1 jsonl reads with declared schema; corrupt lines don't kill") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_src")
    java.nio.file.Files.writeString(dir.resolve("docs.jsonl"),
      """{"id": 1, "name": "alpha", "v": 1.5}
        |{"id": 2, "name": "beta", "v": 2.5}
        |not json at all
        |{"id": 3, "name": "gamma", "v": 3.5}
        |""".stripMargin)
    val df = Sources.jsonl(spark, dir.resolve("docs.jsonl").toString,
      schema).get
    // PERMISSIVE: the corrupt line becomes an all-null row, the shard
    // survives
    assert(df.count() == 4)
    val good = df.filter(df("id").isNotNull).orderBy("id").collect()
    assert(good.length == 3)
    assert(good(1).getString(1) == "beta" && good(1).getDouble(2) == 2.5)
    assert(Sources.jsonl(spark, dir.resolve("gone.jsonl").toString,
      schema).isEmpty)
  }

  test("S5 ordered load writes tables in caller order") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("wh_out").toString
    val dim = Seq((1, "yoga")).toDF("k", "name")
    val fact = Seq((10, 1)).toDF("id", "k")
    Sources.writeOrdered(Seq("dim_x" -> dim, "fact_y" -> fact), out)
    assert(spark.read.parquet(s"$out/dim_x").count() == 1)
    assert(spark.read.parquet(s"$out/fact_y").count() == 1)
  }

  test("S1 orc round-trip through writeOrdered(format=orc)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("orc_out").toString
    val dim = Seq((1, "yoga"), (2, "run")).toDF("k", "name")
    Sources.writeOrdered(Seq("dim_o" -> dim), out, format = "orc")
    val back = Sources.orc(spark, s"$out/dim_o").get
    // nullability widens through the file round-trip; names+types hold
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      dim.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("yoga", "run"))
    assert(Sources.orc(spark, s"$out/nope").isEmpty)
  }

  test("compact collapses a small-file explosion, preserving content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact")
      .resolve("t").toString
    // 64 tiny files — a streaming-sink-shaped layout
    (1 to 1024).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(64).write.parquet(dir)
    def files(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(dir) == 64)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    Sources.compact(spark, dir)
    assert(files(dir) == 1, "1 GB-of-margin target must yield one file")
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }

  test("compact preserves hive partitions (one file per partition dir)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_p")
      .resolve("t").toString
    (1 to 300).map(i => (i.toLong, i % 3)).toDF("id", "day")
      .repartition(20).write.partitionBy("day").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    Sources.compact(spark, dir, partitionCols = Seq("day"))
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day="))
    assert(partDirs.length == 3)
    partDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not compacted")
    }
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }

  test("expirePartitions drops only partitions below the cutoff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("expire")
      .resolve("t").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"),
        (4L, "2024-01-03"))
      .toDF("id", "day").write.partitionBy("day").parquet(dir)
    val dropped = Sources.expirePartitions(spark, dir, "day", "2024-01-03")
    assert(dropped == Seq("2024-01-01", "2024-01-02"))
    val left = spark.read.parquet(dir)
    assert(left.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(left.select("day").distinct().count() == 1)
    // idempotent: nothing left below the cutoff
    assert(Sources.expirePartitions(spark, dir, "day", "2024-01-03").isEmpty)
    // missing table: no-op
    assert(Sources.expirePartitions(spark, s"$dir-nope", "day", "x").isEmpty)
  }

  test("schema evolution: old and new file generations read together " +
      "with mergeSchema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve")
      .resolve("t").toString
    // generation 1: (id, v); generation 2 adds a column
    Seq((1L, 10.0)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, 20.0, "eu")).toDF("id", "v", "region").write.mode("append")
      .parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "region", "v"))
    val rows = merged.select("id", "v", "region").orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq
    // old-generation rows surface the new column as null
    assert(rows == Seq((1L, 10.0, None), (2L, 20.0, Some("eu"))))
  }

  test("S6 json report sink writes the Quality report shape") {
    val f = java.nio.file.Files.createTempDirectory("rep")
      .resolve("report.json").toString
    Sources.writeJsonReport("""{"quality_score":100.0}""", f)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(f)).contains("quality_score"))
  }
}
