package graft

/** F4 unit-conversion constants (SURVEY.md §2.8 F4; reference PDF p.9
  * Tables 1-2/1-3 use Mt/kt tonnage, g/t grades, koz contained metal).
  */
object Units {
  /** Grams per troy ounce — contained oz = tonnes × g/t ÷ this. */
  val GramsPerTroyOunce: Double = 31.1034768
  val TonnesPerMegatonne: Double = 1e6
  val TonnesPerKilotonne: Double = 1e3

  /** Multiplier to normalize a tonnage unit string to tonnes. */
  val tonnageMultiplier: Map[String, Double] =
    Map("t" -> 1.0, "kt" -> TonnesPerKilotonne, "Mt" -> TonnesPerMegatonne)
}
