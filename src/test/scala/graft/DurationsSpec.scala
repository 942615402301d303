package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Durations

/** Port coverage for the reference's normalize_duration
  * (spark_streaming.py:25-44) — including its permissive pass-through
  * behavior for unparseable input.
  */
class DurationsSpec extends AnyFunSuite {
  test("normalizes shorthand units") {
    assert(Durations.normalize("60s") == "60 seconds")
    assert(Durations.normalize("1 min") == "1 minutes")
    assert(Durations.normalize("2hrs") == "2 hours")
    assert(Durations.normalize(" 5  M ") == "5 minutes")
    assert(Durations.normalize("250ms") == "250 milliseconds")
    assert(Durations.normalize("3d") == "3 days")
  }
  test("long-form strings pass through (lowercased/stripped)") {
    assert(Durations.normalize("60 seconds") == "60 seconds")
    assert(Durations.normalize(" 10 Minutes ") == "10 minutes")
  }
  test("unparseable input passes through unchanged (reference behavior)") {
    assert(Durations.normalize("abc") == "abc")
    assert(Durations.normalize("10") == "10")      // bare number: no unit
    assert(Durations.normalize("5 parsecs") == "5 parsecs")
  }
  test("toSeconds is strict") {
    assert(Durations.toSeconds("60s") == 60L)
    assert(Durations.toSeconds("2 min") == 120L)
    assert(Durations.toSeconds("1 day") == 86400L)
    intercept[IllegalArgumentException](Durations.toSeconds("abc"))
    intercept[IllegalArgumentException](Durations.toSeconds("10"))
  }
  test("toSeconds handles milliseconds without silent truncation") {
    assert(Durations.toSeconds("2000 ms") == 2L)
    intercept[IllegalArgumentException](Durations.toSeconds("500 ms"))
    intercept[IllegalArgumentException](Durations.toSeconds("1500ms"))
  }
}
