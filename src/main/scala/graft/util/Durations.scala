package graft.util

/** Duration-string normalizer — faithful port of the reference's
  * `normalize_duration` (src/consumer/spark_streaming.py:25-44):
  *
  *   - strip + lowercase;
  *   - strings already containing a long-form unit (" second",
  *     " minute", " hour", " day") pass through as-is;
  *   - `<n><unit>` shorthand ("60s", "1 min", "2hrs") normalizes to
  *     "<n> <long-unit>";
  *   - anything else (including bare numbers — the reference regex
  *     requires a unit) is returned UNCHANGED, exactly like the
  *     reference, which lets Spark's own parser raise downstream.
  *
  * Pure function — not a plan operator (SURVEY.md §2.2 P10).
  */
object Durations {
  private val Pattern =
    ("""(\d+)\s*(ms|s|sec|secs|second|seconds|m|min|mins|minute|minutes""" +
      """|h|hr|hrs|hour|hours|d|day|days)""").r

  private val unitMap: Map[String, String] = {
    val ms  = Seq("ms").map(_ -> "milliseconds")
    val sec = Seq("s", "sec", "secs", "second", "seconds").map(_ -> "seconds")
    val min = Seq("m", "min", "mins", "minute", "minutes").map(_ -> "minutes")
    val hr  = Seq("h", "hr", "hrs", "hour", "hours").map(_ -> "hours")
    val day = Seq("d", "day", "days").map(_ -> "days")
    (ms ++ sec ++ min ++ hr ++ day).toMap
  }

  /** "60s" → "60 seconds"; "1 min" → "1 minutes"; "60 seconds" →
    * "60 seconds"; unparseable input → returned unchanged (reference
    * behavior, spark_streaming.py:31-33).
    */
  def normalize(raw: String): String = {
    val d = raw.trim.toLowerCase
    if (Seq(" second", " minute", " hour", " day").exists(d.contains)) d
    else d match {
      case Pattern(n, unit) => s"$n ${unitMap(unit)}"
      case _ => raw
    }
  }

  /** Duration in seconds for window arithmetic in tests/oracles.
    * Strict: throws on anything [[normalize]] couldn't canonicalize,
    * including millisecond values that are not a whole number of
    * seconds ("500 ms") — silently truncating those to 0 would lose
    * the value.
    */
  def toSeconds(raw: String): Long = {
    val canonical = normalize(raw)
    canonical.split("\\s+") match {
      case Array(n, u) =>
        val mult = u match {
          case "milliseconds" | "millisecond" =>
            val msVal = n.toLong
            if (msVal % 1000 != 0)
              throw new IllegalArgumentException(
                s"'$raw' is not a whole number of seconds ($msVal ms)")
            return msVal / 1000
          case "seconds" | "second" => 1L
          case "minutes" | "minute" => 60L
          case "hours" | "hour"     => 3600L
          case "days" | "day"       => 86400L
          case _ =>
            throw new IllegalArgumentException(s"unknown unit: '$u'")
        }
        n.toLong * mult
      case _ =>
        throw new IllegalArgumentException(s"cannot parse duration: '$raw'")
    }
  }
}
