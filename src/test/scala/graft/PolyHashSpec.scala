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

  test("two PolyHash calls compile into ONE generated projection " +
      "(freshName regression: shared locals broke Janino and dropped " +
      "the whole stage to the interpreted path)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    // GenerateUnsafeProjection THROWS on a Janino error (no silent
    // fallback at this API level) — exactly the redefinition the
    // hardcoded locals caused with two calls in one generated class
    val proj = GenerateUnsafeProjection.generate(Seq(
      PolyHash(BoundReference(0, StringType, nullable = true)),
      PolyHash(BoundReference(1, StringType, nullable = true))))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      org.apache.spark.unsafe.types.UTF8String.fromString("xyz"))
    val out = proj(row)
    assert(out.getLong(0) == PolyHash.hash("abc"))
    assert(out.getLong(1) == PolyHash.hash("xyz"))
    // and the end-to-end DataFrame path agrees
    PolyHash.register(spark)
    val r = Seq(("abc", "xyz")).toDF("a", "b")
      .selectExpr("graft_polyhash(a)", "graft_polyhash(b)")
      .as[(Long, Long)].collect().head
    assert(r == (PolyHash.hash("abc"), PolyHash.hash("xyz")))
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

  test("MinHashes equals the declarative HOF affine-rehash spelling") {
    PolyHash.register(spark)
    graft.functions.MinHashes.register(spark)
    val df = Seq("the quick brown fox", "a b c", "solo")
      .toDF("text")
      .select(expr(s"transform(array_distinct(${PortableText.tokens}), " +
        "t -> graft_polyhash(t))").as("th"))
      .select(
        expr(s"graft_minhashes(th, ${PortableText.MinHashK})").as("native"),
        expr(s"transform(sequence(0, ${PortableText.MinHashK - 1}), j -> " +
          s"array_min(transform(th, x -> ((2*j + 3) * x + 5*j + 7) % ${PortableText.P})))")
          .as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("SimHash64 equals the declarative HOF vote spelling") {
    PolyHash.register(spark)
    graft.functions.SimHash64.register(spark)
    val bits = PortableText.SimHashBits
    val df = Seq("the quick brown fox", "a b a b", "solo")
      .toDF("text")
      .select(expr(s"transform(array_distinct(${PortableText.tokens}), " +
        "t -> graft_polyhash(t))").as("th"))
      .select(
        expr(s"graft_simhash(th, $bits)").as("native"),
        expr(s"aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (s, i) -> s + " +
          "CASE WHEN aggregate(th, CAST(0 AS BIGINT), (a, x) -> a + " +
          "CASE WHEN shiftright(x, CAST(i AS INT)) % 2 = 1 THEN 1 ELSE -1 END) > 0 " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END)")
          .as("hof"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("PolyHash and CharGrams fold non-BMP text by code point, matching the HOF duals") {
    PolyHash.register(spark)
    graft.functions.CharGrams.register(spark)
    // U+1F600 and U+20000 are surrogate pairs in UTF-16; the engine
    // fragments (split('') / substring) count codepoints.
    val s = "a😀b𠀀c"
    val df = Seq(s).toDF("text").select(
      expr("graft_polyhash(text)").as("ph_native"),
      expr(s"aggregate(split(text, ''), CAST(0 AS BIGINT), " +
        s"(a, c) -> (a * 31 + ascii(c)) % ${PortableText.P})").as("ph_hof"),
      expr("graft_grams(text, 3)").as("g_native"),
      expr("array_distinct(transform(sequence(1, length(text) - 2), " +
        "i -> substring(text, i, 3)))").as("g_hof"))
    val r = df.collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getSeq[String](2) == r.getSeq[String](3))
    assert(r.getSeq[String](2).length == 3) // 5 codepoints -> 3 grams
  }

  test("registry builders validate arity and literal-ness with clear errors") {
    PolyHash.register(spark)
    graft.functions.CharGrams.register(spark)
    graft.functions.VecDot.register(spark)
    val df = Seq(("abc", 3)).toDF("text", "n")
    def analysisFails(sqlExpr: String, fragment: String): Unit = {
      val e = intercept[Exception](df.select(expr(sqlExpr)).collect())
      assert(e.getMessage.contains(fragment), s"$sqlExpr -> ${e.getMessage}")
    }
    analysisFails("graft_grams(text)", "2 arguments")
    analysisFails("graft_grams(text, n)", "literal")
    analysisFails("graft_grams(text, 'x')", "integer literal")
    analysisFails("graft_grams(text, 0)", "positive")
    analysisFails("graft_polyhash(text, text)", "1 argument")
    analysisFails("graft_vecdot(array(1.0))", "2 arguments")
    // BIGINT literal n is accepted (was a ClassCastException before)
    val ok = df.select(expr("graft_grams(text, CAST(2 AS BIGINT))"))
      .as[Seq[String]].collect().head
    assert(ok == Seq("ab", "bc"))
  }

  test("native functions reject wrong input TYPES at analysis, " +
      "never silently misread bytes") {
    PolyHash.register(spark)
    graft.functions.MinHashes.register(spark)
    graft.functions.VecDot.register(spark)
    // graft_vecdot on array<double>: before ExpectsInputTypes the eval
    // loop read interleaved 4-byte halves of the doubles — garbage
    // with no error. Now analysis rejects the signature.
    val dbl = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException](
      dbl.select(expr("graft_vecdot(a, b)")).collect())
    // graft_minhashes on array<int> likewise fails analysis (getLong
    // on packed ints would misread), and graft_polyhash on a number.
    val ints = Seq((Seq(1, 2, 3), 7L)).toDF("xs", "v")
    intercept[org.apache.spark.sql.AnalysisException](
      ints.select(expr("graft_minhashes(xs, 8)")).collect())
    intercept[org.apache.spark.sql.AnalysisException](
      ints.select(expr("graft_polyhash(v)")).collect())
    // full-range 64-bit hashes are legal input and must not wrap into
    // negative signatures (mod-p clamp)
    val big = Seq(Seq(Long.MaxValue, -1L)).toDF("th")
    val mh = big.select(expr("graft_minhashes(th, 8)"))
      .as[Seq[Long]].collect().head
    assert(mh.forall(v => v >= 0 && v < 1000000007L), mh)
  }

  test("VecDot throws on mismatched array lengths instead of truncating") {
    graft.functions.VecDot.register(spark)
    val e = intercept[Exception] {
      Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
        .select(expr("graft_vecdot(a, b)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("GraftExtensions injects the function via spark.sql.extensions") {
    // verify the builder path compiles/wires; reuse of the shared session
    // means we just check the class instantiates and applies cleanly
    val ext = new GraftExtensions()
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw
  }
}
