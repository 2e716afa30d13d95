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

  /** Embedded valence lexicon (~380 entries), VADER-scale [-4, 4] — our own
    * curation, not a port of the Python package's 7.5k-entry file. Degree
    * words ("kind", "barely", …) live ONLY in [[boosters]]/[[negators]] so a
    * token never plays two roles.
    */
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
    "atrocious" -> -2.8, "appalling" -> -2.5, "dreadful" -> -2.5) ++ Map(
    // ---- extended lexicon (round 2): same VADER scale, our own curation ----
    // positive: praise & quality
    "admirable" -> 2.6, "adore" -> 2.9, "adored" -> 2.8, "alluring" -> 1.9,
    "astonishing" -> 2.1, "astounding" -> 2.3, "breathtaking" -> 3.0,
    "charming" -> 2.2, "classy" -> 2.0, "commendable" -> 2.2, "dazzling" -> 2.7,
    "delightful" -> 2.8, "divine" -> 2.7, "elegant" -> 2.1, "exceptional" -> 2.7,
    "exquisite" -> 2.9, "extraordinary" -> 2.5, "fabulous" -> 2.9,
    "flawless" -> 2.9, "glorious" -> 2.8, "gorgeous" -> 3.0, "graceful" -> 2.0,
    "grand" -> 2.2, "heavenly" -> 2.9, "ideal" -> 2.3, "immaculate" -> 2.4,
    "impeccable" -> 2.7, "inviting" -> 1.9, "lovely" -> 2.8, "luxurious" -> 2.4,
    "magical" -> 2.6, "magnificent" -> 3.0, "marvelous" -> 2.9,
    "masterful" -> 2.5, "memorable" -> 1.9, "pristine" -> 2.1, "radiant" -> 2.4,
    "refined" -> 1.8, "remarkable" -> 2.4, "spectacular" -> 2.9,
    "splendid" -> 2.8, "stellar" -> 2.8, "striking" -> 1.8, "stunning" -> 2.9,
    "stylish" -> 1.9, "sublime" -> 2.6, "terrific" -> 2.8, "top" -> 1.8,
    "unbeatable" -> 2.7, "unforgettable" -> 2.3, "unmatched" -> 2.4,
    // positive: food & experience
    "appetizing" -> 2.0, "authentic" -> 1.6, "creamy" -> 1.2, "crisp" -> 1.2,
    "crispy" -> 1.3, "decadent" -> 1.5, "delectable" -> 2.7, "divey" -> 0.4,
    "flavorful" -> 2.1, "generous" -> 2.2, "hearty" -> 1.5, "juicy" -> 1.5,
    "mouthwatering" -> 2.6, "rich" -> 1.6, "savory" -> 1.7, "scrumptious" -> 2.7,
    "succulent" -> 2.2, "sweet" -> 1.8, "tender" -> 1.4, "yummy" -> 2.4,
    "zesty" -> 1.4,
    // positive: people & service
    "accommodating" -> 1.9, "caring" -> 2.2, "cheerful" -> 2.4,
    "courteous" -> 2.0, "dedicated" -> 1.8, "efficient" -> 1.7,
    "energetic" -> 1.6, "engaging" -> 1.7, "enthusiastic" -> 2.0,
    "genuine" -> 1.7, "gracious" -> 2.1, "honest" -> 2.1, "hospitable" -> 2.1,
    "knowledgeable" -> 1.9, "passionate" -> 2.0, "patient" -> 1.6,
    "personable" -> 1.9, "professional" -> 1.6, "prompt" -> 1.5,
    "respectful" -> 1.9, "responsive" -> 1.6, "skilled" -> 1.8, "smart" -> 1.7,
    "talented" -> 2.1, "thoughtful" -> 2.1, "warm" -> 1.8, "welcoming" -> 2.1,
    // positive: emotion & outcome
    "amazed" -> 2.3, "appreciate" -> 1.9, "appreciated" -> 2.0, "bliss" -> 2.7,
    "blessed" -> 2.6, "calm" -> 1.3, "comfortable" -> 1.6, "content" -> 1.4,
    "delighted" -> 2.9, "eager" -> 1.5, "ecstatic" -> 3.1, "excited" -> 2.2,
    "fascinated" -> 1.9, "glad" -> 2.0, "grateful" -> 2.2, "gratified" -> 1.9,
    "impressed" -> 2.2, "joy" -> 2.8, "joyful" -> 2.9, "optimistic" -> 1.7,
    "overjoyed" -> 3.0, "pleased" -> 2.2, "proud" -> 2.1, "relaxed" -> 1.6,
    "relieved" -> 1.6, "satisfied" -> 1.9, "satisfying" -> 2.0, "thankful" -> 2.1,
    "thrilled" -> 2.8, "upbeat" -> 1.9,
    // positive: value & recommendation
    "affordable" -> 1.6, "bargain" -> 1.8, "convenient" -> 1.4, "deal" -> 1.3,
    "favorite" -> 2.4, "gem" -> 2.4, "perfectly" -> 2.5, "quality" -> 1.5,
    "reasonable" -> 1.4, "reliable" -> 1.8, "solid" -> 1.2, "spotless" -> 2.1,
    "thorough" -> 1.4, "trustworthy" -> 2.1, "valuable" -> 1.7, "worth" -> 1.3,
    "worthwhile" -> 1.7, "wow" -> 2.8,
    // negative: quality & experience
    "abysmal" -> -3.0, "average" -> -0.5, "boring" -> -1.3, "broken" -> -1.6,
    "chaotic" -> -1.4, "cheap" -> -0.9, "clumsy" -> -1.1, "cramped" -> -1.2,
    "crowded" -> -0.8, "dated" -> -0.9, "defective" -> -1.9, "deficient" -> -1.5,
    "depressing" -> -2.0, "dingy" -> -1.5, "disorganized" -> -1.4,
    "dismal" -> -2.2, "dull" -> -1.2, "faulty" -> -1.7, "filthy" -> -2.5,
    "flavorless" -> -1.5, "greasy" -> -1.1, "grimy" -> -1.8, "gross" -> -2.1,
    "inadequate" -> -1.6, "inedible" -> -2.5, "inferior" -> -1.7,
    "lackluster" -> -1.3, "lousy" -> -2.0, "messy" -> -1.3, "moldy" -> -2.3,
    "noisy" -> -1.1, "outdated" -> -1.0, "pathetic" -> -2.3, "pricey" -> -1.0,
    "rancid" -> -2.5, "rotten" -> -2.4, "rundown" -> -1.4, "shabby" -> -1.5,
    "shoddy" -> -1.9, "sloppy" -> -1.5, "soggy" -> -1.2, "sour" -> -0.9,
    "subpar" -> -1.6, "tasteless" -> -1.6, "underwhelming" -> -1.4,
    "unsanitary" -> -2.4, "worthless" -> -2.4,
    // negative: people & service
    "aggressive" -> -1.6, "arrogant" -> -2.1, "careless" -> -1.7,
    "clueless" -> -1.7, "condescending" -> -2.1, "dishonest" -> -2.3,
    "dismissive" -> -1.7, "disrespectful" -> -2.2, "hostile" -> -2.3,
    "ignorant" -> -1.9, "ignored" -> -1.5, "impatient" -> -1.3,
    "incompetent" -> -2.2, "inconsiderate" -> -1.9, "indifferent" -> -1.2,
    "insulting" -> -2.2, "lazy" -> -1.6, "obnoxious" -> -2.1, "pushy" -> -1.5,
    "rough" -> -1.0, "sketchy" -> -1.5, "snobby" -> -1.8, "unfriendly" -> -1.9,
    "unhelpful" -> -1.8, "unprofessional" -> -2.0, "unresponsive" -> -1.6,
    // negative: emotion & outcome
    "angry" -> -2.3, "annoyed" -> -1.8, "anxious" -> -1.4, "ashamed" -> -1.9,
    "cheated" -> -2.2, "confused" -> -1.1, "disappoint" -> -2.0,
    "disappoints" -> -2.0, "disgusted" -> -2.6, "dissatisfied" -> -2.0,
    "embarrassed" -> -1.7, "enraged" -> -2.8, "frustrated" -> -2.1,
    "frustrating" -> -2.1, "furious" -> -2.7, "heartbroken" -> -2.5,
    "horrified" -> -2.6, "infuriating" -> -2.6, "insulted" -> -2.0,
    "irritated" -> -1.8, "livid" -> -2.6, "miserable" -> -2.4,
    "offended" -> -1.8, "outraged" -> -2.5, "regret" -> -1.9, "sad" -> -2.1,
    "scared" -> -1.8, "shocked" -> -1.4, "sick" -> -1.7, "suffering" -> -2.2,
    "uncomfortable" -> -1.4, "unhappy" -> -2.0, "upset" -> -1.9,
    // negative: failure & problems
    "avoid" -> -1.4, "awry" -> -1.3, "blunder" -> -1.7, "botched" -> -2.0,
    "cancel" -> -1.0, "cancelled" -> -1.2, "complaint" -> -1.4,
    "complaints" -> -1.5, "damaged" -> -1.6, "deceptive" -> -2.1,
    "delay" -> -1.1, "delayed" -> -1.2, "error" -> -1.4, "errors" -> -1.5,
    "fail" -> -2.0, "failed" -> -2.1, "failure" -> -2.2, "fraud" -> -2.7,
    "mess" -> -1.4, "mistake" -> -1.6, "mistakes" -> -1.7, "nightmare" -> -2.6,
    "refund" -> -1.0, "ripoff" -> -2.3, "ruined" -> -2.2, "scam" -> -2.6,
    "trouble" -> -1.5, "unreliable" -> -1.8, "useless" -> -2.1, "waste" -> -1.9,
    "wasted" -> -2.0)

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
