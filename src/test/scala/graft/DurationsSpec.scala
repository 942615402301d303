package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Durations

/** Port coverage for the reference's normalize_duration
  * (spark_streaming.py:25-43).
  */
class DurationsSpec extends AnyFunSuite {
  test("normalizes shorthand units") {
    assert(Durations.normalize("60s") == "60 seconds")
    assert(Durations.normalize("1 min") == "1 minutes")
    assert(Durations.normalize("2 hours") == "2 hours")
    assert(Durations.normalize("10") == "10 seconds")
    assert(Durations.normalize(" 5  M ") == "5 minutes")
    assert(Durations.normalize("250ms") == "250 milliseconds")
  }
  test("canonical strings pass through") {
    assert(Durations.normalize("60 seconds") == "60 seconds")
    assert(Durations.normalize("10 minutes") == "10 minutes")
  }
  test("rejects garbage") {
    intercept[IllegalArgumentException](Durations.normalize("abc"))
    intercept[IllegalArgumentException](Durations.normalize("5 parsecs"))
  }
  test("toSeconds") {
    assert(Durations.toSeconds("60s") == 60L)
    assert(Durations.toSeconds("2 min") == 120L)
    assert(Durations.toSeconds("1 day") == 86400L)
  }
}
