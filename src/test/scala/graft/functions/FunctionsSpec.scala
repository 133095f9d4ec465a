package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("PolyHash matches the SQL-lambda polynomial fold") {
    val df = Seq("hello world", "", "a", "spark graft engine").toDF("s")
    val got = df.select(
      PolyHash($"s").as("native"),
      expr("""aggregate(transform(filter(split(s, ''), ch -> ch <> ''),
              ch -> CAST(ascii(ch) AS BIGINT)), CAST(0 AS BIGINT),
              (acc, c) -> (acc * 31 + c) % 1000000007)""").as("lambda"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("PolyHash works under whole-stage codegen in a real plan") {
    val n = spark.range(1000).toDF("id")
      .withColumn("h", PolyHash(concat(lit("doc_"), $"id".cast("string"))))
      .filter($"h" >= 0)
      .select(countDistinct($"h")).collect()(0).getLong(0)
    assert(n > 990) // essentially collision-free on 1000 distinct strings
  }

  test("SimHash64: identical docs hash equal; near-dups are close") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val near = base + "extra token"
    val far = "completely different words entirely unrelated content here"
    val df = Seq(base, base, near, far).toDF("t")
      .withColumn("sig", SimHash64(split($"t", " ")))
    val sigs = df.collect().map(_.getLong(1))
    assert(sigs(0) == sigs(1))
    val dNear = SimHash64.hamming(sigs(0), sigs(2))
    val dFar = SimHash64.hamming(sigs(0), sigs(3))
    assert(dNear < dFar)
    assert(dNear <= 8)
  }

  test("PlaneDot matches the sign-LSH lambda fold bit-for-bit, " +
      "float and double") {
    def lambdaSql(emb: String) =
      s"""aggregate(transform(sequence(1, size($emb)), i ->
         |  CASE WHEN ((i * 37 + p * 101 + i * p * 13) % 97) % 2 = 0
         |  THEN CAST(element_at($emb, i) AS DOUBLE)
         |  ELSE -CAST(element_at($emb, i) AS DOUBLE) END),
         |  CAST(0.0 AS DOUBLE), (a, v) -> a + v)""".stripMargin
    // no empty-array row: the lambda REFERENCE can't express it
    // (sequence(1, 0) descends), and 64-dim arrays are the kernel's
    // whole domain; PlaneDot itself folds an empty array to 0.0
    val f = Seq((Array.tabulate(64)(i => (math.sin(i) * 10).toFloat), 0L),
      (Array.tabulate(64)(i => (i * 0.37f - 5)), 7L)).toDF("emb", "p")
    f.select(PlaneDot($"emb", $"p").as("native"),
      expr(lambdaSql("emb")).as("lambda")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val d = Seq((Array.tabulate(64)(i => math.cos(i * 1.7) * 3), 11L),
      (Array.tabulate(64)(i => i / 7.0 - 4), 41L)).toDF("emb", "p")
    d.select(PlaneDot($"emb", $"p").as("native"),
      expr(lambdaSql("emb")).as("lambda")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct matches the zip_with lambda fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val got = df.select(
      DotProduct($"a", $"b").as("native"),
      expr("""aggregate(zip_with(a, b,
              (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("lambda"))
      .collect()
    got.foreach { r =>
      // bit-identical, not approximately equal: same fold order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct handles double arrays and codegen in a real plan") {
    val df = spark.range(500).toDF("id")
      .withColumn("v", expr("transform(sequence(0, 7), i -> " +
        "CAST(id * 8 + i AS DOUBLE) / 100.0)"))
    val norms = df.withColumn("n2", DotProduct($"v", $"v"))
      .filter($"n2" > 0).count()
    assert(norms == 500) // every vector has a nonzero element
  }

  test("dot_product is callable from SQL via the function registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("poly_hash is callable from SQL via the function registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    val r = spark.sql("SELECT poly_hash('abc') AS h").collect()(0).getLong(0)
    assert(r == (("a".codePointAt(0) * 31L + 'b') * 31L + 'c') % 1000000007L)
  }
}
