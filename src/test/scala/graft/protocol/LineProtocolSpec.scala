package graft.protocol

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Spec from the reference's own fixtures (FIXTURES.md §A.3/A.4; refluxdb
  * src/protocol.rs:150-190 round-trip tests done right — the reference's own
  * suite feeds string fields into an f64-only parser and would panic,
  * SURVEY §5.1).
  */
class LineProtocolSpec extends AnyFunSuite {

  import FieldValue.{BoolV, FloatV, IntV, StringV}

  test("README example parses (README.md:20)") {
    val r = LineProtocol
      .parse("test,host=server,region=us-east1 value=0.80 1234567890000000000")
      .toOption.get
    assert(r.measurement == "test")
    assert(r.tags == Vector("host" -> "server", "region" -> "us-east1"))
    assert(r.fields == Vector("value" -> FloatV(0.80)))
    assert(r.timestamp.contains(1234567890000000000L))
  }

  test("multi-field line fans out per field (A.3)") {
    val r = LineProtocol
      .parse("myMultipleFieldKey fieldKey1=1.0,fieldKey2=2.0 1556813561098000000")
      .toOption.get
    assert(r.tags.isEmpty)
    assert(r.fields == Vector("fieldKey1" -> FloatV(1.0), "fieldKey2" -> FloatV(2.0)))
  }

  test("multiple tags keep insertion order (protocol.rs:164)") {
    val r = LineProtocol
      .parse("m,tag1=value1,tag2=value2 fieldKey=2.0 1556813561098000000")
      .toOption.get
    assert(r.tags == Vector("tag1" -> "value1", "tag2" -> "value2"))
  }

  test("error cases (A.4)") {
    assert(LineProtocol.parse("").isLeft) // empty (protocol.rs:79-81)
    assert(LineProtocol.parse("m").isLeft) // no fieldset (protocol.rs:125-127)
    assert(LineProtocol.parse("m f=1.0 notanum").isLeft) // bad ts
    assert(LineProtocol.parse("m fieldnoeq 1").isLeft) // no valid fields
    // D5: unquoted non-numeric value is a clean error (reference panics)
    assert(LineProtocol.parse("m f=abc 1").isLeft)
    assert(LineProtocol.parse("m f=\"unterminated 1").isLeft)
  }

  test("string/bool field values (README.md:50 TODO, implemented here)") {
    val r = LineProtocol.parse(
      "svc,host=a status=\"degraded\",up=true,load=0.7,note=\"a b, c=d\" 1")
      .toOption.get
    assert(r.fields == Vector(
      "status" -> StringV("degraded"), "up" -> BoolV(true),
      "load" -> FloatV(0.7), "note" -> StringV("a b, c=d")))
    // influx bool token forms
    assert(LineProtocol.parse("m f=T").toOption.get.fields ==
      Vector("f" -> BoolV(true)))
    assert(LineProtocol.parse("m f=FALSE").toOption.get.fields ==
      Vector("f" -> BoolV(false)))
    // escaped quote/backslash round-trip inside strings
    val rec = LineRecord("m", Vector.empty,
      Vector("s" -> StringV("say \"hi\" \\ bye")), Some(1L))
    assert(LineProtocol.parse(LineProtocol.serialize(rec)) == Right(rec))
  }

  test("the reference's own 4 round-trip lines parse + serialize verbatim " +
      "(protocol.rs:150-190 — its f64-only parser panics on all of them)") {
    Seq(
      "mySingleTagMeasurement,tag1=value1 fieldKey1=\"fieldValue\" 1556813561098000000",
      "myMultipleTagMeasurement,tag1=value1,tag2=value2 fieldKey=\"fieldValue\" 1556813561098000000",
      "mySingleFieldKey fieldKey=\"fieldValue\" 1556813561098000000",
      "myMultipleFieldKey fieldKey1=\"fieldValue\",fieldKey2=\"oi\" 1556813561098000000"
    ).foreach { line =>
      val r = LineProtocol.parse(line)
      assert(r.isRight, s"parse failed: $line → $r")
      assert(LineProtocol.serialize(r.toOption.get) == line)
    }
  }

  test("integer fields: Influx 42i suffix → IntV (round 2 parity gap)") {
    val r = LineProtocol.parse("m,h=a n=42i,neg=-7i,f=2.5 1").toOption.get
    assert(r.fields == Vector(
      "n" -> IntV(42L), "neg" -> IntV(-7L), "f" -> FloatV(2.5)))
    assert(LineProtocol.serialize(r) == "m,h=a n=42i,neg=-7i,f=2.5 1")
    // Long.MaxValue survives (a double would lose precision)
    assert(LineProtocol.parse(s"m n=${Long.MaxValue}i").toOption.get.fields ==
      Vector("n" -> IntV(Long.MaxValue)))
    // malformed int suffix is a clean error, not silently a double
    assert(LineProtocol.parse("m f=4.2i 1").isLeft)
    assert(LineProtocol.parse("m f=42ii 1").isLeft)
    // bare "i" is not an int; falls through to the non-numeric error
    assert(LineProtocol.parse("m f=i 1").isLeft)
  }

  test("tag escaping: \\  \\, \\= round-trip (D6 — reference quirk Q-H fixed)") {
    // Influx-spec escapes in measurement, tag keys/values, field keys
    val r = LineProtocol.parse(
      """my\ measure,host\ name=a\ b,path=c\,d\=e f\ k=1.0 7""").toOption.get
    assert(r.measurement == "my measure")
    assert(r.tags == Vector("host name" -> "a b", "path" -> "c,d=e"))
    assert(r.fields == Vector("f k" -> FloatV(1.0)))
    // serializer emits the escapes back
    assert(LineProtocol.serialize(r) ==
      """my\ measure,host\ name=a\ b,path=c\,d\=e f\ k=1.0 7""")
    // a backslash NOT before a structural char stays literal (Influx
    // tolerates unescaped backslashes)
    assert(LineProtocol.parse("""m,t=a\b f=1""").toOption.get.tags ==
      Vector("t" -> """a\b"""))
  }

  test("stray quote in a tag value is literal, never eats separators " +
      "(round-2 ADVICE fix)") {
    val r = LineProtocol.parse("""m,t=a"b f=1 1""").toOption.get
    assert(r.tags == Vector("t" -> "a\"b"))
    assert(r.fields == Vector("f" -> FloatV(1.0)))
    assert(r.timestamp.contains(1L))
    // quotes still delimit FIELD string values as before
    assert(LineProtocol.parse("""m,t=a"b s="x y" 1""").toOption.get.fields ==
      Vector("s" -> StringV("x y")))
  }

  test("timestamp optional (D5 deviation; spec-conformant)") {
    val r = LineProtocol.parse("m f=1.0").toOption.get
    assert(r.timestamp.isEmpty)
  }

  test("tag without '=' silently skipped (protocol.rs:98-101)") {
    val r = LineProtocol.parse("m,tagnoeq f=1.0 1").toOption.get
    assert(r.tags.isEmpty)
    assert(r.fields == Vector("f" -> FloatV(1.0)))
  }

  test("empty-VALUE tag/field skipped like reference tag()/field() " +
      "(protocol.rs:34-44 insert only non-empty values)") {
    val r = LineProtocol.parse("m,t= f=,g=2.0 1").toOption.get
    assert(r.tags.isEmpty) // t= dropped
    assert(r.fields == Vector("g" -> FloatV(2.0))) // f= dropped, not an error
    // all fields empty-valued → nothing to insert → error (no valid fields)
    assert(LineProtocol.parse("m f= 1").isLeft)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val fieldValue: Gen[FieldValue] = Gen.oneOf(
    Gen.choose(-1e9, 1e9).map(FloatV.apply),
    Gen.choose(Long.MinValue, Long.MaxValue).map(IntV.apply),
    Gen.oneOf(Gen.const(true), Gen.const(false)).map(BoolV.apply),
    // strings exercise the quote-aware lexer: spaces, commas, '=',
    // escaped quotes and backslashes all must survive the round trip
    Gen.oneOf(ident, Gen.const("hello world"), Gen.const("a,b=c"),
      Gen.const("say \"hi\""), Gen.const("back\\slash"))
      .map(StringV.apply))

  // adversarial tag/measurement values: structural chars, quotes and
  // backslashes must all survive serialize→parse via D6 escaping
  private val tagValue: Gen[String] = Gen.oneOf(
    ident, Gen.const("a b"), Gen.const("x,y"), Gen.const("k=v"),
    Gen.const("q\"uote"), Gen.const("back\\slash"), Gen.const("trail\\"),
    Gen.const("\"quoted\""))

  private val record: Gen[LineRecord] = for {
    m <- Gen.oneOf(ident, Gen.const("my measure"), Gen.const("m,x=y"))
    nt <- Gen.choose(0, 4)
    tags <- Gen.listOfN(nt, Gen.zip(ident, tagValue))
    nf <- Gen.choose(1, 4)
    fields <- Gen.listOfN(nf, Gen.zip(ident, fieldValue))
    ts <- Gen.option(Gen.choose(0L, 2_000_000_000_000_000_000L))
  } yield LineRecord(m,
    tags.toMap.toVector, // unique keys
    fields.toMap.toVector,
    ts)

  test("property: parse(serialize(r)) == r (protocol.rs:150-190 invariant)") {
    (1 to 500).foreach { i =>
      val r = record.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(LineProtocol.parse(LineProtocol.serialize(r)) == Right(r),
        s"round-trip failed for $r")
    }
  }
}
