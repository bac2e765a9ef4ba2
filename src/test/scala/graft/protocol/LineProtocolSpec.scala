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

  test("README example parses (README.md:20)") {
    val r = LineProtocol
      .parse("test,host=server,region=us-east1 value=0.80 1234567890000000000")
      .toOption.get
    assert(r.measurement == "test")
    assert(r.tags == Vector("host" -> "server", "region" -> "us-east1"))
    assert(r.fields == Vector("value" -> 0.80))
    assert(r.timestamp.contains(1234567890000000000L))
  }

  test("multi-field line fans out per field (A.3)") {
    val r = LineProtocol
      .parse("myMultipleFieldKey fieldKey1=1.0,fieldKey2=2.0 1556813561098000000")
      .toOption.get
    assert(r.tags.isEmpty)
    assert(r.fields == Vector("fieldKey1" -> 1.0, "fieldKey2" -> 2.0))
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
    assert(LineProtocol.parse("m f=\"str\" 1").isLeft) // D5: reject, not panic
  }

  test("timestamp optional (D5 deviation; spec-conformant)") {
    val r = LineProtocol.parse("m f=1.0").toOption.get
    assert(r.timestamp.isEmpty)
  }

  test("tag without '=' silently skipped (protocol.rs:98-101)") {
    val r = LineProtocol.parse("m,tagnoeq f=1.0 1").toOption.get
    assert(r.tags.isEmpty)
    assert(r.fields == Vector("f" -> 1.0))
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val record: Gen[LineRecord] = for {
    m <- ident
    nt <- Gen.choose(0, 4)
    tags <- Gen.listOfN(nt, Gen.zip(ident, ident))
    nf <- Gen.choose(1, 4)
    fields <- Gen.listOfN(nf, Gen.zip(ident, Gen.choose(-1e9, 1e9)))
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
