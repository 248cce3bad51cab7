package graft

import graft.functions.{PolyHash, PortableText}
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("PolyHash equals the declarative HOF fold and the Scala reference") {
    PolyHash.register(spark)
    val df = Seq("", "a", "abc", "the quick brown fox", "x" * 1000)
      .toDF("text")
      .select(
        col("text"),
        expr("graft_polyhash(text)").as("native"),
        expr(s"aggregate(split(text, ''), CAST(0 AS BIGINT), " +
          s"(a, c) -> (a * 31 + ascii(c)) % ${PortableText.P})").as("hof"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"native vs hof for '${r.getString(0).take(10)}'")
      assert(r.getLong(1) == PolyHash.hash(r.getString(0)))
    }
  }

  test("PolyHash is callable inside HOF lambdas (token hashing path)") {
    PolyHash.register(spark)
    val out = Seq("aa bb").toDF("text")
      .select(expr("transform(split(text, ' '), t -> graft_polyhash(t))").as("ths"))
      .as[Seq[Long]].collect().head
    assert(out == Seq(PolyHash.hash("aa"), PolyHash.hash("bb")))
  }

  test("CharGrams equals the declarative HOF distinct-3-gram spelling") {
    graft.functions.CharGrams.register(spark)
    val df = Seq("abcdef", "aaaa", "abc").toDF("text")
      .select(
        col("text"),
        expr("graft_grams(text, 3)").as("native"),
        expr("array_distinct(transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3)))").as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), r.getString(0))
    }
    // shorter than n -> empty (matches the DuckDB range() dual)
    val short = Seq("ab").toDF("text")
      .select(expr("graft_grams(text, 3)")).as[Seq[String]].collect().head
    assert(short.isEmpty)
  }

  test("GraftExtensions injects the function via spark.sql.extensions") {
    // verify the builder path compiles/wires; reuse of the shared session
    // means we just check the class instantiates and applies cleanly
    val ext = new GraftExtensions()
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw
  }
}
