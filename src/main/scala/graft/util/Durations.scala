package graft.util

/** Duration-string normalizer — API-parity port of the reference's
  * `normalize_duration` (src/consumer/spark_streaming.py:25-43), which
  * accepts human-ish duration strings ("60s", "1 min", "2 hours") and
  * normalizes them into the canonical "<n> <unit>" form Spark's
  * `window()` / `withWatermark()` accept.
  *
  * Pure function — not a plan operator (SURVEY.md §2.2 P10).
  */
object Durations {
  private val Pattern = """^\s*(\d+)\s*([a-zA-Z]*)\s*$""".r

  private val unitMap: Map[String, String] = {
    val sec = Seq("", "s", "sec", "secs", "second", "seconds").map(_ -> "seconds")
    val min = Seq("m", "min", "mins", "minute", "minutes").map(_ -> "minutes")
    val hr  = Seq("h", "hr", "hrs", "hour", "hours").map(_ -> "hours")
    val day = Seq("d", "day", "days").map(_ -> "days")
    val ms  = Seq("ms", "milli", "millis", "millisecond", "milliseconds")
      .map(_ -> "milliseconds")
    (sec ++ min ++ hr ++ day ++ ms).toMap
  }

  /** "60s" → "60 seconds"; "1 min" → "1 minutes"; bare "90" → "90 seconds".
    * Already-canonical strings pass through unchanged. Throws
    * IllegalArgumentException on unparseable input (the reference raises
    * ValueError).
    */
  def normalize(raw: String): String = raw match {
    case Pattern(n, unit) =>
      unitMap.get(unit.toLowerCase) match {
        case Some(u) => s"$n $u"
        case None =>
          throw new IllegalArgumentException(s"unknown duration unit: '$unit'")
      }
    case _ =>
      throw new IllegalArgumentException(s"cannot parse duration: '$raw'")
  }

  /** Duration in seconds (for window arithmetic in tests/oracles). */
  def toSeconds(raw: String): Long = {
    val canonical = normalize(raw)
    val Array(n, u) = canonical.split(" ")
    val mult = u match {
      case "milliseconds" => return n.toLong / 1000
      case "seconds" => 1L
      case "minutes" => 60L
      case "hours"   => 3600L
      case "days"    => 86400L
    }
    n.toLong * mult
  }
}
