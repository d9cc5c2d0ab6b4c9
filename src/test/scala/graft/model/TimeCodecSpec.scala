package graft.model

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's codec unit tests
  * (`tests/test_incremental_load_orchestration.py:31-46`) plus seeded
  * round-trip property sweeps. */
class TimeCodecSpec extends AnyFunSuite {

  test("datetimeToS3Key matches the reference vector") {
    // datetime(2023,1,7,8,30,15,123000) -> "2023/01/07/08/20230107-083015123"
    val dt = LocalDateTime.of(2023, 1, 7, 8, 30, 15, 123000000)
    assert(TimeCodec.datetimeToS3Key(dt) === "2023/01/07/08/20230107-083015123")
  }

  test("filenameToDatetime matches the reference vector") {
    val dt = LocalDateTime.of(2023, 1, 7, 8, 30, 15, 123000000)
    assert(TimeCodec.filenameToDatetime("20230107-083015123") === dt)
    assert(TimeCodec.filenameToDatetime("20230107-083015123.parquet") === dt)
    assert(TimeCodec.filenameToDatetime("a/b/2023/01/07/08/20230107-083015123.parquet") === dt)
  }

  test("datetime <-> key round-trips at millisecond precision") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val millis = math.abs(rnd.nextLong()) % 4102444800000L // 1970..2100
      val dt = LocalDateTime.ofEpochSecond(millis / 1000,
        (millis % 1000).toInt * 1000000, java.time.ZoneOffset.UTC)
      assert(TimeCodec.filenameToDatetime(TimeCodec.datetimeToS3Key(dt)) === dt)
    }
  }

  test("datetime key order equals chronological order (the CDC index invariant)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % 4102444800000L
      val b = math.abs(rnd.nextLong()) % 4102444800000L
      def dt(m: Long) = LocalDateTime.ofEpochSecond(m / 1000,
        (m % 1000).toInt * 1000000, java.time.ZoneOffset.UTC)
      val (ka, kb) = (TimeCodec.datetimeToS3Key(dt(a)), TimeCodec.datetimeToS3Key(dt(b)))
      assert((a < b) === (ka < kb) || a === b)
    }
  }

  test("seqToFilename emits the reference's two-part zero-padded format") {
    // incremental_load_orchestration.py:288-301: '{1000000000-seq}-{seq}.json'
    assert(TimeCodec.seqToFilename(3L) === "999999997-000000003")
    assert(TimeCodec.seqToFilename(1L) === "999999999-000000001")
  }

  test("filenameToSeq parses reference-format names, with or without suffix/path") {
    assert(TimeCodec.filenameToSeq("999999997-000000003") === 3L)
    assert(TimeCodec.filenameToSeq("999999997-000000003.json") === 3L)
    assert(TimeCodec.filenameToSeq("plans/999999997-000000003.json") === 3L)
    assert(TimeCodec.filenameToSeq("999999997") === 3L) // legacy single part
  }

  test("filenameToSeq rejects inconsistent two-part names") {
    assertThrows[IllegalArgumentException] {
      TimeCodec.filenameToSeq("999999997-000000004")
    }
  }

  test("seq codec round-trips and lists newest-first lexicographically") {
    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      val seq = 1L + math.abs(rnd.nextLong()) % 999999998L
      assert(TimeCodec.filenameToSeq(TimeCodec.seqToFilename(seq)) === seq)
      // later seq sorts lexicographically EARLIER (newest-first listing)
      assert(TimeCodec.seqToFilename(seq + 1) < TimeCodec.seqToFilename(seq))
    }
  }
}
