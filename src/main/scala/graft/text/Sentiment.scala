package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{udf, when, col, lit}

/** Self-contained VADER-style sentiment scorer (rule framework per the
  * published VADER paper: Hutto & Gilbert, ICWSM 2014), replacing the
  * reference's Python `vaderSentiment` UDF (`ETL-script/Review_ETL.py:41-45,
  * 73-87`) with a JVM-native implementation — no Python worker round trips.
  *
  * Observable contract matched to the reference: a Float compound score in
  * [-1, 1]; 0.0 for null/empty text (`Review_ETL.py:74`); labels at ±0.05
  * (`Review_ETL.py:79-84`). Scores come from OUR embedded compact lexicon —
  * golden values are asserted in SentimentSpec, not ported from Python
  * (SURVEY.md §7.4 "VADER fidelity").
  *
  * Rule set implemented: lexicon valence lookup; negation window (a negator
  * within the 3 preceding tokens flips valence × −0.74); degree boosters/
  * dampeners (±0.293 scaled by distance); ALL-CAPS emphasis (±0.733 when the
  * rest of the text isn't all caps); exclamation amplification (up to 4 '!'
  * × 0.292, sign of the total); compound normalization x/√(x²+15).
  */
object Sentiment {

  /** Compact embedded valence lexicon, VADER-scale [-4, 4]. */
  val lexicon: Map[String, Double] = Map(
    // strong positive
    "amazing" -> 2.8, "awesome" -> 3.1, "excellent" -> 2.7, "fantastic" -> 2.6,
    "outstanding" -> 3.2, "perfect" -> 2.7, "wonderful" -> 2.7, "best" -> 3.2,
    "incredible" -> 2.6, "superb" -> 2.9, "delicious" -> 2.5, "love" -> 3.2,
    "loved" -> 2.9, "loves" -> 2.9, "brilliant" -> 2.8, "phenomenal" -> 3.0,
    // positive
    "good" -> 1.9, "great" -> 3.1, "nice" -> 1.8, "happy" -> 2.7,
    "enjoy" -> 2.0, "enjoyed" -> 2.3, "like" -> 1.5, "liked" -> 1.7,
    "likes" -> 1.6, "friendly" -> 2.2, "helpful" -> 1.9, "fresh" -> 1.3,
    "clean" -> 1.7, "tasty" -> 1.9, "recommend" -> 1.5, "recommended" -> 1.6,
    "pleasant" -> 2.3, "fast" -> 0.9, "fair" -> 1.7, "fun" -> 2.3,
    "win" -> 2.8, "won" -> 2.7, "better" -> 1.9, "impressive" -> 2.3,
    "beautiful" -> 2.9, "cozy" -> 1.7, "polite" -> 2.1, "attentive" -> 1.6,
    // negative
    "bad" -> -2.5, "poor" -> -2.1, "slow" -> -1.2, "dirty" -> -2.0,
    "rude" -> -2.4, "mediocre" -> -1.3, "bland" -> -1.2, "overpriced" -> -1.8,
    "disappointing" -> -2.2, "disappointed" -> -2.1, "annoying" -> -1.9,
    "problem" -> -1.4, "problems" -> -1.5, "wait" -> -0.6, "cold" -> -0.8,
    "stale" -> -1.6, "wrong" -> -2.1, "hate" -> -2.7, "hated" -> -3.2,
    "hates" -> -2.5, "worse" -> -2.1, "lose" -> -1.6, "lost" -> -1.3,
    // strong negative
    "terrible" -> -2.1, "awful" -> -2.0, "horrible" -> -2.5, "worst" -> -3.1,
    "disgusting" -> -2.4, "nasty" -> -2.6, "unacceptable" -> -2.2,
    "atrocious" -> -2.8, "appalling" -> -2.5, "dreadful" -> -2.5)

  val negators: Set[String] = Set(
    "not", "no", "never", "none", "nothing", "neither", "nobody", "nowhere",
    "isnt", "isn't", "arent", "aren't", "wasnt", "wasn't", "werent", "weren't",
    "dont", "don't", "doesnt", "doesn't", "didnt", "didn't", "cant", "can't",
    "cannot", "couldnt", "couldn't", "wont", "won't", "wouldnt", "wouldn't",
    "shouldnt", "shouldn't", "aint", "ain't", "without", "hardly", "barely")

  /** Degree modifiers: positive = booster, negative = dampener. */
  val boosters: Map[String, Double] = Map(
    "very" -> 0.293, "extremely" -> 0.293, "absolutely" -> 0.293,
    "completely" -> 0.293, "incredibly" -> 0.293, "really" -> 0.293,
    "so" -> 0.293, "totally" -> 0.293, "super" -> 0.293, "highly" -> 0.293,
    "especially" -> 0.293, "particularly" -> 0.293, "truly" -> 0.293,
    "remarkably" -> 0.293, "utterly" -> 0.293,
    "slightly" -> -0.293, "somewhat" -> -0.293, "kinda" -> -0.293,
    "kind" -> -0.293, "sorta" -> -0.293, "barely" -> -0.293,
    "marginally" -> -0.293, "occasionally" -> -0.293, "partly" -> -0.293,
    "little" -> -0.293)

  private val NegationScalar = -0.74
  private val CapsBoost = 0.733
  private val ExclBoost = 0.292

  private def stripPunct(t: String): String =
    t.dropWhile(c => !c.isLetterOrDigit && c != '\'')
      .reverse.dropWhile(c => !c.isLetterOrDigit && c != '\'').reverse

  /** VADER compound normalization: x/√(x²+α), α=15, clamped to [-1, 1]. */
  def normalize(x: Double): Double = {
    val n = x / math.sqrt(x * x + 15.0)
    math.max(-1.0, math.min(1.0, n))
  }

  /** Compound sentiment of a text; 0.0 for null/empty (the reference's
    * null contract, `Review_ETL.py:74`).
    */
  def compound(text: String): Float = {
    if (text == null) return 0.0f
    val rawToks = text.split("\\s+").filter(_.nonEmpty)
    if (rawToks.isEmpty) return 0.0f
    val cleaned = rawToks.map(stripPunct).filter(_.nonEmpty)
    if (cleaned.isEmpty) return 0.0f
    val allCaps = cleaned.forall(t => t == t.toUpperCase)
    val lower = cleaned.map(_.toLowerCase)

    var total = 0.0
    var i = 0
    while (i < lower.length) {
      lexicon.get(lower(i)).foreach { base =>
        var v = base
        // ALL-CAPS emphasis, only meaningful when the whole text isn't caps
        if (!allCaps && cleaned(i) == cleaned(i).toUpperCase
            && cleaned(i).exists(_.isLetter))
          v += (if (base >= 0) CapsBoost else -CapsBoost)
        // look back up to 3 tokens for boosters and negators
        var j = math.max(0, i - 3)
        var negate = false
        while (j < i) {
          val d = i - j // distance 1..3
          boosters.get(lower(j)).foreach { b =>
            val scaled = b * (d match {
              case 1 => 1.0; case 2 => 0.95; case _ => 0.9
            })
            v += (if (base >= 0) scaled else -scaled)
          }
          if (negators.contains(lower(j))) negate = true
          j += 1
        }
        if (negate) v *= NegationScalar
        total += v
      }
      i += 1
    }
    // exclamation amplification, sign of the running total
    val excl = math.min(text.count(_ == '!'), 4)
    if (excl > 0 && total != 0.0)
      total += math.signum(total) * excl * ExclBoost
    normalize(total).toFloat
  }

  /** Spark UDF — JVM-native, no Python worker. Deterministic, so Catalyst
    * may still push filters across it. (A codegen'd Catalyst Expression is
    * the stretch path if this ever dominates a profile; at one lexicon
    * lookup per token it has not.)
    */
  val score = udf((t: String) => compound(t))

  /** The reference's ±0.05 label thresholds (`Review_ETL.py:79-84`). */
  def label(scoreCol: Column): Column =
    when(scoreCol > 0.05f, "positive")
      .when(scoreCol < -0.05f, "negative")
      .otherwise("neutral")

  def scoreCol(textCol: Column): Column = score(textCol)
}
