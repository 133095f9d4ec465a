package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests for the transform/resolution
  * kernels (SURVEY.md §5: T3 cast coercion, T6 tokenizer, J1 dedup).
  * Deterministic seeds; each case materializes generated rows through
  * the real Spark expressions, not a reimplementation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val units = Gen.oneOf("g", "mg", "mcg", "IU", "kcal", "G", "Mg")

  test("T3 property: 'N unit' parses back to N for any 2dp decimal") {
    val gen = for {
      cents <- Gen.chooseNum(0L, 999999L)
      unit <- units
      pad <- Gen.oneOf("", " ", "  ")
    } yield (cents / 100.0, f"${cents / 100.0}%.2f$pad$unit")
    val cases = samples(gen, 25)
    val got = cases.map(_._2).toDF("raw")
      .select(Normalize.stripUnitCast($"raw")).as[Option[Double]]
      .collect()
    cases.zip(got).foreach { case ((n, raw), v) =>
      assert(v.exists(x => math.abs(x - n) < 1e-9), s"$raw -> $v != $n")
    }
  }

  test("T3 property: alphabetic garbage coerces to null") {
    val junkGen = Gen.alphaStr.suchThat(s =>
      s.nonEmpty && !s.matches("(?i)\\s*(g|mg|mcg|iu|kcal)"))
    val cases = samples(junkGen, 25)
    val got = cases.toDF("raw")
      .select(Normalize.stripUnitCast($"raw")).as[Option[Double]]
      .collect()
    cases.zip(got).foreach { case (raw, v) =>
      assert(v.isEmpty, s"'$raw' should coerce to null, got $v")
    }
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("T6 property: tokenizer never emits empty/untrimmed/upper tokens") {
    val blobGen = for {
      words <- Gen.nonEmptyListOf(word)
      seps <- Gen.listOfN(words.length,
        Gen.oneOf(", ", ",", "\n", " and ", " AND ", ",,"))
    } yield words.zip(seps).map { case (w, s) => w + s }.mkString
    samples(blobGen, 25).foreach { blob =>
      val toks = Seq(blob).toDF("b")
        .select(Normalize.tokenizeBlob($"b").as("t"))
        .collect()(0).getSeq[String](0)
      toks.foreach { t =>
        assert(t.nonEmpty && t == t.trim && t == t.toLowerCase)
        assert(!t.contains(",") && !t.contains("\n"))
      }
    }
  }

  test("S7 property: quoted ';' and '--' never split or truncate") {
    val litGen = for {
      pre <- Gen.alphaStr
      tricky <- Gen.oneOf(";", "--", "a;b--c", "/*", "*/", ";--;")
      post <- Gen.alphaStr
      q <- Gen.oneOf("'", "\"")
    } yield s"$q$pre$tricky$post$q"
    val stmtGen = litGen.map(l => s"SELECT $l AS v FROM t")
    samples(Gen.nonEmptyListOf(stmtGen).map(_.take(5)), 25)
      .foreach { stmts =>
        val script = stmts.mkString(";\n") + ";"
        val parsed = SqlRunner.parse(script)
        assert(parsed == stmts, s"\n$script\n-> $parsed")
      }
  }

  test("J3 property: minted keys are dense 1..N in order-column order") {
    val keysGen = Gen.nonEmptyListOf(
      Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)).map(_.distinct)
    samples(keysGen, 5).foreach { ks =>
      val minted = EntityResolution.mintKeys(
        ks.toDF("k").repartition(7), "key", $"k")
        .select("k", "key").as[(String, Long)].collect().sortBy(_._2)
      assert(minted.map(_._2).toSeq == (1L to ks.length))
      // key order == global sort order of the order column
      assert(minted.map(_._1).toSeq == ks.sorted)
    }
  }

  test("J1 property: canonical count == distinct hash count, dense keys") {
    val profGen = Gen.nonEmptyListOf(for {
      age <- Gen.chooseNum(13, 99)
      g <- Gen.oneOf("Male", "Female", "male", "FEMALE")
      h <- Gen.chooseNum(100, 250).map(_ / 100.0)
      w <- Gen.chooseNum(3000, 20000).map(_ / 100.0)
    } yield (age, g, h, w))
    samples(profGen, 5).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((a, g, h, w), i) => (i, a, g, h, w) }
        .toDF("id", "age", "gender", "height", "weight")
      val hash = EntityResolution.profileHash(
        $"age", $"gender", $"height", $"weight")
      val (canonical, mapping) =
        EntityResolution.resolve(df, hash, lit(0), $"id")
      val nHashes = df.select(hash).distinct().count()
      assert(canonical.count() == nHashes)
      assert(mapping.count() == rows.length)
      val keys = canonical.select("user_key").as[Long].collect().sorted
      assert(keys.toSeq == (1L to nHashes))
    }
  }
}
