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

  /** Hand-curated core of the valence lexicon (~730 entries), VADER-scale
    * [-4, 4] — our own curation, not a port of the Python package's
    * 7.5k-entry file. Degree words ("kind", "barely", …) live ONLY in
    * [[boosters]]/[[negators]] so a token never plays two roles. The full
    * [[lexicon]] additionally expands [[tagged]] base words through
    * regular English morphology; hand entries always win.
    */
  private val hand: Map[String, Double] = Map(
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
    "wasted" -> -2.0) ++ Map(
    // ---- extended lexicon (round 3): broader general-domain coverage,
    // same VADER [-4, 4] scale, our own curation (not a port) ----
    "abandoned" -> -1.7, "abusive" -> -2.7, "accomplish" -> 1.8,
    "accomplished" -> 2.0, "achievement" -> 2.0, "admire" -> 2.2,
    "admired" -> 2.2, "advantage" -> 1.4, "afraid" -> -1.7,
    "agonizing" -> -2.5, "agreeable" -> 1.6, "alarming" -> -1.8,
    "ambitious" -> 1.4, "amused" -> 1.7, "amusing" -> 1.8, "anger" -> -2.1,
    "angered" -> -2.2, "annoyance" -> -1.6, "apathetic" -> -1.2,
    "appalled" -> -2.4, "approve" -> 1.6, "approved" -> 1.5,
    "aromatic" -> 1.4, "attractive" -> 1.9, "award" -> 1.9,
    "awarded" -> 2.0, "awkward" -> -1.1, "balanced" -> 1.2,
    "beneficial" -> 1.7, "bitter" -> -1.4, "blame" -> -1.5,
    "blamed" -> -1.5, "bogus" -> -1.9, "bold" -> 1.2, "bonus" -> 1.6,
    "boost" -> 1.4, "bother" -> -1.2, "bothered" -> -1.3,
    "bothersome" -> -1.4, "bright" -> 1.5, "brutal" -> -2.3,
    "buttery" -> 1.2, "capable" -> 1.4, "caramelized" -> 1.2,
    "catastrophe" -> -2.8, "catastrophic" -> -2.8, "celebrate" -> 2.2,
    "celebrated" -> 2.1, "champion" -> 2.2, "cherish" -> 2.4,
    "cherished" -> 2.4, "chewy" -> -0.7, "clunky" -> -1.2,
    "complain" -> -1.4, "complained" -> -1.4, "complaining" -> -1.5,
    "con" -> -1.8, "confident" -> 1.7, "consistent" -> 1.3,
    "constructive" -> 1.3, "corrupt" -> -2.4, "crappy" -> -2.2,
    "crash" -> -1.7, "crashed" -> -1.8, "creative" -> 1.7,
    "creepy" -> -1.8, "cringe" -> -1.6, "crisis" -> -2.0, "cruel" -> -2.5,
    "crunchy" -> 1.1, "cry" -> -1.6, "cute" -> 1.9, "dangerous" -> -1.9,
    "deceived" -> -2.2, "defeated" -> -1.7, "defect" -> -1.7,
    "denied" -> -1.4, "deny" -> -1.2, "dependable" -> 1.8,
    "deplorable" -> -2.5, "depressed" -> -2.2, "desperate" -> -1.8,
    "despise" -> -2.6, "destroyed" -> -2.1, "disaster" -> -2.5,
    "disastrous" -> -2.6, "disgrace" -> -2.3, "disgraceful" -> -2.4,
    "disheartening" -> -1.9, "dislike" -> -1.6, "disliked" -> -1.6,
    "dismay" -> -1.7, "displeased" -> -1.8, "disturbing" -> -2.0,
    "doubt" -> -1.0, "doubtful" -> -1.2, "downhill" -> -1.4,
    "drab" -> -1.2, "dread" -> -2.0, "dreary" -> -1.5, "dry" -> -0.8,
    "dynamic" -> 1.2, "earnest" -> 1.3, "easy" -> 1.3, "effective" -> 1.5,
    "effortless" -> 1.7, "egregious" -> -2.4, "empowering" -> 1.8,
    "encouraging" -> 1.8, "enjoyable" -> 2.1, "enrage" -> -2.6,
    "evil" -> -2.7, "excel" -> 1.9, "excellence" -> 2.5, "excels" -> 1.9,
    "exciting" -> 2.2, "excuse" -> -1.1, "excuses" -> -1.3,
    "expensive" -> -0.9, "fake" -> -1.8, "fear" -> -1.8, "fearful" -> -1.8,
    "fiasco" -> -2.2, "fine" -> 0.8, "flaky" -> 1.0, "flaw" -> -1.3,
    "flawed" -> -1.5, "flimsy" -> -1.3, "flourish" -> 1.8, "fluffy" -> 1.3,
    "foolish" -> -1.5, "forgettable" -> -1.2, "forgot" -> -1.2,
    "forgotten" -> -1.2, "fortunate" -> 1.9, "foul" -> -2.1,
    "fragrant" -> 1.4, "fraudulent" -> -2.6, "fright" -> -1.8,
    "frightening" -> -2.0, "fulfilled" -> 1.8, "fulfilling" -> 1.9,
    "garbage" -> -2.2, "gentle" -> 1.4, "gifted" -> 1.9, "glitch" -> -1.4,
    "glitchy" -> -1.5, "glowing" -> 2.1, "grief" -> -2.1,
    "grievance" -> -1.6, "grim" -> -1.8, "grumpy" -> -1.4,
    "guilty" -> -1.5, "handy" -> 1.2, "harmonious" -> 1.7, "harsh" -> -1.5,
    "hassle" -> -1.5, "heartwarming" -> 2.5, "hero" -> 2.2,
    "hideous" -> -2.4, "homemade" -> 1.3, "hope" -> 1.4, "hopeful" -> 1.6,
    "horrendous" -> -2.7, "horrid" -> -2.5, "humble" -> 1.2,
    "humiliating" -> -2.3, "hurt" -> -1.7, "hurtful" -> -2.0,
    "improve" -> 1.3, "improved" -> 1.6, "improvement" -> 1.4,
    "inconvenient" -> -1.3, "innovative" -> 1.7, "inspire" -> 2.0,
    "inspired" -> 2.1, "inspiring" -> 2.3, "insult" -> -2.0,
    "intelligent" -> 1.9, "interesting" -> 1.4, "intuitive" -> 1.4,
    "irate" -> -2.4, "irritating" -> -1.9, "junk" -> -1.9, "keen" -> 1.2,
    "kindly" -> 1.6, "lame" -> -1.6, "laugh" -> 1.9, "laughed" -> 1.8,
    "lie" -> -1.9, "lied" -> -2.0, "lies" -> -1.9, "limp" -> -1.0,
    "lively" -> 1.6, "lucky" -> 1.9, "lukewarm" -> -0.9, "mad" -> -1.9,
    "malfunction" -> -1.7, "mean" -> -1.6, "meaningful" -> 1.6,
    "miserably" -> -2.3, "moist" -> 1.0, "mushy" -> -1.0, "neat" -> 1.5,
    "negative" -> -1.5, "neglect" -> -1.8, "neglected" -> -1.8,
    "nifty" -> 1.5, "nonsense" -> -1.5, "nurturing" -> 1.7,
    "offend" -> -1.8, "offensive" -> -2.0, "outrage" -> -2.4,
    "overcooked" -> -1.3, "overdone" -> -1.1, "overrated" -> -1.3,
    "pain" -> -1.8, "painful" -> -2.0, "panic" -> -1.9, "peaceful" -> 1.9,
    "petty" -> -1.3, "pitiful" -> -1.9, "playful" -> 1.6, "plump" -> 0.9,
    "pointless" -> -1.6, "poorly" -> -1.7, "popular" -> 1.3,
    "positive" -> 1.8, "praise" -> 2.0, "praised" -> 2.1,
    "precious" -> 2.1, "prefer" -> 1.0, "preferred" -> 1.1,
    "premium" -> 1.4, "pretentious" -> -1.5, "pretty" -> 1.6,
    "productive" -> 1.5, "progress" -> 1.4, "promising" -> 1.6,
    "prosperous" -> 1.9, "rage" -> -2.4, "raw" -> -1.0, "reeked" -> -2.1,
    "refreshing" -> 1.9, "regrettable" -> -1.8, "reject" -> -1.4,
    "rejected" -> -1.6, "rejoice" -> 2.4, "repulsive" -> -2.6,
    "resourceful" -> 1.5, "revolting" -> -2.6, "rewarding" -> 2.0,
    "ridiculous" -> -1.6, "robust" -> 1.3, "ruin" -> -2.0, "sadly" -> -1.7,
    "safe" -> 1.3, "salty" -> -0.6, "scary" -> -1.7, "seamless" -> 1.8,
    "seasoned" -> 1.0, "secure" -> 1.3, "sensational" -> 2.6,
    "severe" -> -1.4, "shady" -> -1.7, "sham" -> -2.1, "shame" -> -1.8,
    "shameful" -> -2.1, "shortage" -> -1.1, "silky" -> 1.4,
    "sincere" -> 1.6, "skimpy" -> -1.2, "smoky" -> 0.8, "smooth" -> 1.4,
    "soothing" -> 1.7, "spacious" -> 1.4, "sparkling" -> 1.7,
    "speedy" -> 1.5, "sticky" -> -0.7, "stink" -> -1.8, "stinks" -> -1.9,
    "stress" -> -1.6, "stressful" -> -1.8, "strong" -> 1.3,
    "struggle" -> -1.5, "struggled" -> -1.5, "stupid" -> -1.9,
    "succeed" -> 1.8, "success" -> 2.1, "successful" -> 2.0,
    "superior" -> 1.9, "supportive" -> 1.8, "suspicious" -> -1.4,
    "tacky" -> -1.3, "tangy" -> 0.9, "tense" -> -1.2, "terrified" -> -2.4,
    "threat" -> -1.8, "threatening" -> -2.0, "thrive" -> 1.9,
    "thriving" -> 1.9, "tidy" -> 1.4, "timely" -> 1.3, "tired" -> -1.0,
    "tough" -> -0.8, "toxic" -> -2.2, "tragic" -> -2.3, "tranquil" -> 1.7,
    "trash" -> -2.0, "trashy" -> -1.9, "treasure" -> 2.1, "trust" -> 1.7,
    "trusted" -> 1.9, "ugly" -> -1.9, "unbearable" -> -2.4,
    "unclean" -> -1.9, "undercooked" -> -1.7, "uneven" -> -0.9,
    "unfair" -> -1.8, "unfortunate" -> -1.4, "unimpressed" -> -1.4,
    "uninspired" -> -1.3, "unpleasant" -> -1.8, "unreasonable" -> -1.6,
    "unsafe" -> -1.8, "unsatisfactory" -> -1.8, "untrustworthy" -> -2.1,
    "unusable" -> -1.9, "uplifting" -> 2.2, "useful" -> 1.5,
    "velvety" -> 1.5, "vibrant" -> 1.8, "victory" -> 2.3, "vile" -> -2.6,
    "vivid" -> 1.3, "watery" -> -0.9, "weak" -> -1.2, "weird" -> -0.9,
    "welcome" -> 1.7, "whine" -> -1.2, "wholesome" -> 1.7, "wise" -> 1.6,
    "woeful" -> -2.0, "worthy" -> 1.6, "yuck" -> -2.1, "yucky" -> -2.0)

  // ---- round-7 expansion: tagged base words + regular-morphology forms ----
  //
  // Our own curation continued (same VADER [-4, 4] scale, provenance: the
  // rule framework of Hutto & Gilbert ICWSM 2014; word choice and valences
  // are ours, asserted by this repo's golden tests — NOT a port of the
  // vaderSentiment data file). Each base carries a morphology tag and the
  // expansion below derives the regular inflections at the base valence
  // (VADER's own file carries inflections as near-equal-valence rows):
  //   v  verb       → +s/es, +ed, +ing   (e-drop, y→ie, ≤4-char CVC doubling)
  //   a  adjective  → +ly                (y→ily, le→ly, ic→ically)
  //   e  short adj  → +ly, +er, +est     (y→ier/iest, e→r/st, CVC doubling)
  //   u  adjective  → +ly, +ness         (y→iness)
  //   n  noun       → +s/es              (y→ies)
  //   s  single     → no derived forms   (irregular / already inflected)
  // Only bases whose regular forms are real English words are tagged; the
  // irregulars ride the `s` tag. Hand entries above always win on conflict,
  // and anything colliding with boosters/negators is filtered out at
  // assembly so no token ever plays two roles.
  private val tagged: Seq[(String, Double, Char)] = Seq(
    // --- positive verbs ---
    ("amaze", 2.2, 'v'), ("applaud", 1.9, 'v'), ("assist", 1.5, 'v'),
    ("astonish", 2.1, 'v'), ("attract", 1.3, 'v'), ("beautify", 1.8, 'v'),
    ("benefit", 1.5, 'v'), ("blossom", 1.8, 'v'), ("brighten", 1.8, 'v'),
    ("captivate", 2.2, 'v'), ("charm", 2.0, 'v'), ("cheer", 2.0, 'v'),
    ("comfort", 1.8, 'v'), ("commend", 2.0, 'v'), ("compliment", 2.0, 'v'),
    ("congratulate", 2.0, 'v'), ("cooperate", 1.3, 'v'), ("dazzle", 2.4, 'v'),
    ("delight", 2.6, 'v'), ("educate", 1.3, 'v'), ("elevate", 1.4, 'v'),
    ("embrace", 1.5, 'v'), ("empower", 1.8, 'v'), ("enchant", 2.3, 'v'),
    ("encourage", 1.8, 'v'), ("energize", 1.7, 'v'), ("enhance", 1.4, 'v'),
    ("enlighten", 1.7, 'v'), ("enrich", 1.6, 'v'), ("entertain", 1.6, 'v'),
    ("enthrall", 2.2, 'v'), ("excite", 2.0, 'v'), ("fascinate", 1.9, 'v'),
    ("flatter", 1.3, 'v'), ("gleam", 1.3, 'v'), ("glow", 1.6, 'v'),
    ("gratify", 1.8, 'v'), ("guarantee", 1.2, 'v'), ("heal", 1.6, 'v'),
    ("help", 1.7, 'v'), ("honor", 1.8, 'v'), ("illuminate", 1.3, 'v'),
    ("impress", 2.2, 'v'), ("invigorate", 1.8, 'v'), ("liberate", 1.5, 'v'),
    ("lighten", 1.2, 'v'), ("marvel", 2.0, 'v'), ("mend", 1.2, 'v'),
    ("mentor", 1.3, 'v'), ("motivate", 1.6, 'v'), ("nourish", 1.5, 'v'),
    ("pamper", 1.7, 'v'), ("please", 1.9, 'v'), ("prosper", 1.8, 'v'),
    ("protect", 1.4, 'v'), ("radiate", 1.4, 'v'), ("reassure", 1.5, 'v'),
    ("refresh", 1.7, 'v'), ("rejuvenate", 1.9, 'v'), ("relax", 1.6, 'v'),
    ("relish", 1.7, 'v'), ("renew", 1.3, 'v'), ("rescue", 1.6, 'v'),
    ("resolve", 1.3, 'v'), ("respect", 1.8, 'v'), ("restore", 1.3, 'v'),
    ("revitalize", 1.7, 'v'), ("reward", 1.9, 'v'), ("satisfy", 1.9, 'v'),
    ("savor", 1.7, 'v'), ("shimmer", 1.2, 'v'), ("simplify", 1.2, 'v'),
    ("smile", 1.8, 'v'), ("soothe", 1.7, 'v'), ("sparkle", 1.6, 'v'),
    ("strengthen", 1.3, 'v'), ("stun", 2.0, 'v'), ("surpass", 1.6, 'v'),
    ("thank", 1.9, 'v'), ("treat", 1.2, 'v'), ("triumph", 2.2, 'v'),
    ("uplift", 2.0, 'v'), ("volunteer", 1.4, 'v'), ("adorn", 1.2, 'v'),
    ("accommodate", 1.4, 'v'), ("amuse", 1.7, 'v'), ("calm", 1.3, 'v'),
    ("clarify", 1.0, 'v'), ("collaborate", 1.2, 'v'), ("connect", 1.0, 'v'),
    ("contribute", 1.0, 'v'), ("create", 1.1, 'v'), ("customize", 1.0, 'v'),
    ("defend", 1.0, 'v'), ("discover", 1.2, 'v'), ("donate", 1.4, 'v'),
    ("elate", 2.3, 'v'), ("emphasize", 0.6, 'v'), ("endorse", 1.4, 'v'),
    ("entice", 1.4, 'v'), ("exceed", 1.5, 'v'), ("excuse", -1.1, 's'),
    ("forgive", 1.7, 's'), ("forgave", 1.6, 's'), ("forgiven", 1.7, 's'),
    ("glisten", 1.3, 'v'), ("greet", 1.2, 'v'), ("hug", 1.9, 'v'),
    ("innovate", 1.5, 'v'), ("listen", 0.9, 'v'), ("overachieve", 1.6, 'v'),
    ("recover", 1.2, 'v'), ("replenish", 1.3, 'v'), ("share", 1.0, 'v'),
    ("support", 1.6, 'v'), ("surprise", 1.1, 'v'), ("tailor", 1.0, 'v'),
    ("understand", 1.1, 's'), ("understood", 1.1, 's'), ("unite", 1.3, 'v'),
    ("upgrade", 1.3, 'v'), ("value", 1.3, 'v'), ("wander", 0.5, 'v'),
    // --- negative verbs ---
    ("abandon", -1.7, 'v'), ("abuse", -2.5, 'v'), ("accuse", -1.6, 'v'),
    ("ache", -1.5, 'v'), ("aggravate", -1.9, 'v'), ("agitate", -1.6, 'v'),
    ("alarm", -1.5, 'v'), ("alienate", -1.7, 'v'), ("anger", -2.1, 'v'),
    ("annihilate", -2.2, 'v'), ("annoy", -1.8, 'v'), ("argue", -1.3, 'v'),
    ("attack", -1.8, 'v'), ("betray", -2.4, 'v'), ("bicker", -1.3, 'v'),
    ("boycott", -1.7, 'v'), ("bungle", -1.8, 'v'), ("burden", -1.4, 'v'),
    ("collapse", -1.7, 'v'), ("complicate", -1.2, 'v'), ("condemn", -1.8, 'v'),
    ("confuse", -1.3, 'v'), ("contaminate", -2.0, 'v'), ("corrode", -1.4, 'v'),
    ("criticize", -1.5, 'v'), ("damage", -1.6, 'v'), ("deceive", -2.2, 'v'),
    ("decline", -1.0, 'v'), ("defraud", -2.5, 'v'), ("degrade", -1.8, 'v'),
    ("demolish", -1.5, 'v'), ("deprive", -1.6, 'v'), ("despair", -2.2, 'v'),
    ("destroy", -2.1, 'v'), ("deteriorate", -1.8, 'v'), ("detest", -2.4, 'v'),
    ("disagree", -1.1, 'v'), ("discourage", -1.6, 'v'), ("disgust", -2.4, 'v'),
    ("dismiss", -1.2, 'v'), ("displease", -1.7, 'v'), ("disrupt", -1.4, 'v'),
    ("distress", -1.9, 'v'), ("disturb", -1.6, 'v'), ("drain", -1.2, 'v'),
    ("embarrass", -1.8, 'v'), ("endanger", -1.8, 'v'), ("exaggerate", -1.2, 'v'),
    ("exclude", -1.2, 'v'), ("exploit", -1.8, 'v'), ("falter", -1.3, 'v'),
    ("fumble", -1.2, 'v'), ("grumble", -1.3, 'v'), ("harass", -2.2, 'v'),
    ("harm", -1.8, 'v'), ("hinder", -1.3, 'v'), ("humiliate", -2.3, 'v'),
    ("ignore", -1.4, 'v'), ("inconvenience", -1.4, 'v'), ("infect", -1.6, 'v'),
    ("infuriate", -2.5, 'v'), ("injure", -1.8, 'v'), ("interrupt", -1.2, 'v'),
    ("intimidate", -1.8, 'v'), ("irritate", -1.8, 'v'), ("jeopardize", -1.8, 'v'),
    ("lament", -1.6, 'v'), ("loathe", -2.5, 'v'), ("manipulate", -1.7, 'v'),
    ("mock", -1.6, 'v'), ("oppress", -2.0, 'v'), ("overcharge", -1.9, 'v'),
    ("overcook", -1.3, 'v'), ("overwhelm", -1.1, 'v'), ("pester", -1.5, 'v'),
    ("plague", -1.7, 'v'), ("pollute", -1.8, 'v'), ("postpone", -1.0, 'v'),
    ("provoke", -1.4, 'v'), ("punish", -1.5, 'v'), ("rant", -1.2, 'v'),
    ("reek", -1.9, 'v'), ("resent", -1.7, 'v'), ("ridicule", -1.8, 'v'),
    ("rot", -1.9, 'v'), ("sabotage", -2.0, 'v'), ("scold", -1.4, 'v'),
    ("scream", -1.4, 'v'), ("shatter", -1.5, 'v'), ("shout", -1.1, 'v'),
    ("shun", -1.5, 'v'), ("slam", -1.3, 'v'), ("spoil", -1.6, 'v'),
    ("stain", -1.2, 'v'), ("starve", -1.8, 'v'), ("stumble", -1.1, 'v'),
    ("suck", -1.9, 'v'), ("suffer", -2.0, 'v'), ("tarnish", -1.5, 'v'),
    ("tease", -1.0, 'v'), ("threaten", -1.9, 'v'), ("torment", -2.2, 'v'),
    ("trick", -1.5, 'v'), ("undermine", -1.5, 'v'), ("vomit", -2.0, 'v'),
    ("wail", -1.3, 'v'), ("weaken", -1.2, 'v'), ("whimper", -1.1, 'v'),
    ("worry", -1.6, 'v'), ("wreck", -1.8, 'v'), ("mislead", -2.0, 's'),
    ("misleading", -2.0, 's'), ("misled", -2.0, 's'), ("stole", -2.2, 's'),
    ("stolen", -2.2, 's'), ("steal", -2.2, 's'), ("stealing", -2.2, 's'),
    ("overreact", -1.2, 'v'), ("litter", -1.4, 'v'), ("meddle", -1.3, 'v'),
    ("nag", -1.4, 'v'), ("object", -0.9, 'v'), ("obstruct", -1.5, 'v'),
    ("offload", -0.8, 'v'), ("penalize", -1.5, 'v'), ("protest", -1.2, 'v'),
    ("quarrel", -1.4, 'v'), ("question", -0.6, 'v'), ("refuse", -1.3, 'v'),
    ("revoke", -1.3, 'v'), ("smear", -1.5, 'v'), ("snub", -1.5, 'v'),
    ("squander", -1.7, 'v'), ("stall", -1.1, 'v'), ("suspect", -1.0, 'v'),
    ("swindle", -2.3, 'v'), ("victimize", -2.1, 'v'), ("violate", -1.9, 'v'),
    // --- positive adjectives (+ly) ---
    ("accurate", 1.3, 'a'), ("adorable", 2.2, 'a'), ("adventurous", 1.4, 'a'),
    ("affectionate", 1.9, 'a'), ("ample", 1.2, 'a'), ("angelic", 2.0, 'a'),
    ("artful", 1.3, 'a'), ("blissful", 2.5, 'a'), ("bountiful", 1.7, 'a'),
    ("capable", 1.4, 'a'), ("carefree", 1.5, 's'), ("charitable", 1.7, 'a'),
    ("cheery", 2.0, 'a'), ("colorful", 1.2, 'a'), ("compassionate", 2.1, 'a'),
    ("competent", 1.4, 'a'), ("courageous", 1.9, 'a'), ("decent", 1.2, 'a'),
    ("delicate", 0.9, 'a'), ("desirable", 1.6, 'a'), ("diligent", 1.5, 'a'),
    ("dreamy", 1.9, 'a'), ("durable", 1.4, 'a'), ("eloquent", 1.7, 'a'),
    ("enchanting", 2.3, 'a'), ("endearing", 1.9, 'a'), ("enticing", 1.7, 'a'),
    ("ethical", 1.5, 'a'), ("exuberant", 2.0, 'a'), ("faithful", 1.8, 'a'),
    ("fancy", 1.4, 'a'), ("favorable", 1.6, 'a'), ("fearless", 1.6, 'a'),
    ("festive", 1.7, 'a'), ("fond", 1.5, 'a'), ("frank", 0.9, 'a'),
    ("generously", 2.1, 's'), ("gleeful", 2.2, 'a'), ("harmless", 0.8, 'a'),
    ("heroic", 2.1, 'a'), ("hygienic", 1.4, 'a'), ("imaginative", 1.5, 'a'),
    ("ingenious", 1.9, 'a'), ("irresistible", 2.2, 'a'), ("joyous", 2.7, 'a'),
    ("jubilant", 2.5, 'a'), ("lavish", 1.6, 'a'), ("legendary", 2.2, 'a'),
    ("legitimate", 1.1, 'a'), ("loyal", 1.8, 'a'), ("magnificently", 3.0, 's'),
    ("merry", 2.2, 'a'), ("meticulous", 1.6, 'a'), ("miraculous", 2.4, 'a'),
    ("modern", 0.9, 'a'), ("modest", 1.0, 'a'), ("noble", 1.8, 'a'),
    ("nutritious", 1.5, 'a'), ("obliging", 1.4, 'a'), ("optimal", 1.5, 'a'),
    ("ornate", 1.1, 'a'), ("outgoing", 1.4, 'a'), ("painless", 1.2, 'a'),
    ("palatable", 1.0, 'a'), ("paradisiac", 2.2, 's'), ("passionately", 2.0, 's'),
    ("peppy", 1.5, 'a'), ("picturesque", 2.0, 'a'), ("plentiful", 1.5, 'a'),
    ("poetic", 1.4, 'a'), ("polished", 1.5, 's'), ("powerful", 1.4, 'a'),
    ("practical", 1.1, 'a'), ("praiseworthy", 2.2, 's'), ("precise", 1.2, 'a'),
    ("presentable", 1.0, 'a'), ("prestigious", 1.8, 'a'), ("priceless", 2.2, 'a'),
    ("prime", 1.4, 'a'), ("privileged", 1.5, 's'), ("proactive", 1.4, 'a'),
    ("prudent", 1.2, 'a'), ("punctual", 1.4, 'a'), ("quaint", 1.3, 'a'),
    ("radical", 1.0, 'a'), ("rapturous", 2.5, 'a'), ("ravishing", 2.4, 'a'),
    ("recommendable", 1.8, 's'), ("refreshingly", 1.9, 's'), ("regal", 1.6, 'a'),
    ("resilient", 1.5, 'a'), ("resplendent", 2.3, 'a'), ("righteous", 1.6, 'a'),
    ("romantic", 1.8, 'a'), ("sanitary", 1.2, 'a'), ("satisfactory", 1.2, 'a'),
    ("scenic", 1.6, 'a'), ("selfless", 1.9, 'a'), ("serene", 1.9, 'a'),
    ("skillful", 1.8, 'a'), ("sociable", 1.3, 'a'), ("spirited", 1.5, 's'),
    ("splendidly", 2.8, 's'), ("spontaneous", 1.2, 'a'), ("steadfast", 1.4, 'a'),
    ("stimulating", 1.5, 'a'), ("stupendous", 2.7, 'a'), ("sturdy", 1.3, 'a'),
    ("suave", 1.4, 'a'), ("sumptuous", 2.3, 'a'), ("sunny", 1.6, 'a'),
    ("tactful", 1.3, 'a'), ("tantalizing", 1.9, 'a'), ("tasteful", 1.7, 'a'),
    ("thrifty", 1.1, 'a'), ("tireless", 1.5, 'a'), ("tolerant", 1.2, 'a'),
    ("tremendous", 2.3, 'a'), ("triumphant", 2.4, 'a'), ("unique", 1.3, 'a'),
    ("upscale", 1.3, 's'), ("versatile", 1.3, 'a'), ("vigorous", 1.3, 'a'),
    ("virtuous", 1.7, 'a'), ("warmhearted", 2.1, 's'), ("winsome", 1.8, 'a'),
    ("wondrous", 2.5, 'a'), ("youthful", 1.2, 'a'), ("zealous", 1.3, 'a'),
    // --- negative adjectives (+ly) ---
    ("abrasive", -1.6, 'a'), ("abrupt", -1.0, 'a'), ("absurd", -1.5, 'a'),
    ("alarmingly", -1.8, 's'), ("amateurish", -1.5, 'a'), ("apathetically", -1.2, 's'),
    ("appallingly", -2.5, 's'), ("atrociously", -2.8, 's'), ("barbaric", -2.3, 'a'),
    ("belligerent", -1.9, 'a'), ("bizarre", -1.2, 'a'), ("bleak", -1.7, 'a'),
    ("brash", -1.2, 'a'), ("brutally", -2.3, 's'), ("careless", -1.7, 's'),
    ("chaotically", -1.4, 's'), ("cheerless", -1.5, 'a'), ("childish", -1.3, 'a'),
    ("clueless", -1.7, 's'), ("coarse", -1.0, 'a'), ("confusing", -1.3, 'a'),
    ("contemptuous", -2.0, 'a'), ("corrosive", -1.4, 'a'), ("crass", -1.5, 'a'),
    ("criminal", -2.1, 'a'), ("crude", -1.3, 'a'), ("cynical", -1.4, 'a'),
    ("deadly", -2.2, 's'), ("deceitful", -2.3, 'a'), ("defiant", -1.2, 'a'),
    ("dehumanizing", -2.4, 'a'), ("demeaning", -2.0, 'a'), ("derelict", -1.7, 'a'),
    ("despicable", -2.6, 'a'), ("destructive", -1.9, 'a'), ("detrimental", -1.6, 'a'),
    ("devious", -1.7, 'a'), ("dirtier", -2.0, 's'), ("dirtiest", -2.3, 's'),
    ("disagreeable", -1.5, 'a'), ("disappointingly", -2.2, 's'), ("disdainful", -1.9, 'a'),
    ("disgustingly", -2.4, 's'), ("dishonorable", -2.2, 'a'), ("disloyal", -1.9, 'a'),
    ("dreadfully", -2.5, 's'), ("dubious", -1.3, 'a'), ("dysfunctional", -1.7, 'a'),
    ("erratic", -1.3, 'a'), ("excessive", -1.1, 'a'), ("exorbitant", -1.7, 'a'),
    ("faithless", -1.7, 'a'), ("fatal", -2.3, 'a'), ("feeble", -1.2, 'a'),
    ("fraudulently", -2.6, 's'), ("frigid", -1.2, 'a'), ("frivolous", -1.1, 'a'),
    ("ghastly", -2.3, 's'), ("gloomy", -1.7, 'a'), ("graceless", -1.4, 'a'),
    ("grotesque", -2.2, 'a'), ("gruesome", -2.3, 'a'), ("hapless", -1.3, 'a'),
    ("haphazard", -1.3, 'a'), ("hasty", -1.0, 'a'), ("hateful", -2.5, 'a'),
    ("heartless", -2.3, 'a'), ("heinous", -2.7, 'a'), ("hopeless", -2.1, 'a'),
    ("horrifying", -2.6, 'a'), ("humorless", -1.2, 'a'), ("idiotic", -2.0, 'a'),
    ("immoral", -2.0, 'a'), ("impolite", -1.7, 'a'), ("impractical", -1.2, 'a'),
    ("improper", -1.3, 'a'), ("inattentive", -1.5, 'a'), ("incoherent", -1.4, 'a'),
    ("inconsistent", -1.3, 'a'), ("incorrect", -1.3, 'a'), ("inefficient", -1.5, 'a'),
    ("inept", -1.8, 'a'), ("inexcusable", -2.2, 'a'), ("infamous", -1.8, 'a'),
    ("inhospitable", -1.8, 'a'), ("insane", -1.5, 'a'), ("insecure", -1.3, 'a'),
    ("insufferable", -2.3, 'a'), ("insufficient", -1.3, 'a'), ("intolerable", -2.2, 'a'),
    ("intrusive", -1.4, 'a'), ("irresponsible", -1.8, 'a'), ("joyless", -1.8, 'a'),
    ("malicious", -2.2, 'a'), ("mediocrely", -1.3, 's'), ("merciless", -2.2, 'a'),
    ("mindless", -1.4, 'a'), ("monotonous", -1.3, 'a'), ("morbid", -1.6, 'a'),
    ("needless", -1.2, 'a'), ("negligent", -1.9, 'a'), ("nonsensical", -1.5, 'a'),
    ("obsolete", -1.2, 'a'), ("overbearing", -1.6, 'a'), ("overdue", -1.1, 's'),
    ("pessimistic", -1.5, 'a'), ("pitiless", -2.0, 'a'), ("pointlessly", -1.6, 's'),
    ("questionable", -1.3, 'a'), ("reckless", -1.8, 'a'), ("regretful", -1.7, 'a'),
    ("relentless", -1.2, 'a'), ("reprehensible", -2.4, 'a'), ("repugnant", -2.4, 'a'),
    ("restless", -1.1, 'a'), ("ruthless", -2.0, 'a'), ("scandalous", -2.0, 'a'),
    ("selfish", -1.8, 'a'), ("senseless", -1.6, 'a'), ("shameless", -1.8, 'a'),
    ("sinister", -1.9, 'a'), ("spiteful", -2.1, 'a'), ("stagnant", -1.2, 'a'),
    ("sterile", -0.9, 'a'), ("stingy", -1.5, 'a'), ("subnormal", -1.3, 'a'),
    ("tactless", -1.6, 'a'), ("tedious", -1.4, 'a'), ("terribly", -2.1, 's'),
    ("thankless", -1.4, 'a'), ("thoughtless", -1.7, 'a'), ("treacherous", -2.1, 'a'),
    ("troublesome", -1.5, 'a'), ("tyrannical", -2.2, 'a'), ("unappealing", -1.5, 'a'),
    ("unappetizing", -1.7, 'a'), ("unbearably", -2.4, 's'), ("uncaring", -1.8, 'a'),
    ("uncivil", -1.6, 'a'), ("uncomfortably", -1.4, 's'), ("unconvincing", -1.2, 'a'),
    ("undesirable", -1.5, 'a'), ("uneatable", -2.2, 's'), ("unethical", -2.0, 'a'),
    ("unforgivable", -2.3, 'a'), ("unfortunately", -1.4, 's'), ("unhygienic", -2.1, 'a'),
    ("uninviting", -1.5, 'a'), ("unjust", -1.8, 'a'), ("unkind", -1.8, 'a'),
    ("unlucky", -1.4, 'a'), ("unpalatable", -1.7, 'a'), ("unremarkable", -1.0, 's'),
    ("unruly", -1.3, 's'), ("unsatisfying", -1.7, 'a'), ("unskilled", -1.3, 's'),
    ("unstable", -1.4, 'a'), ("unsuitable", -1.3, 'a'), ("untidy", -1.4, 'a'),
    ("unwelcoming", -1.8, 'a'), ("unworthy", -1.6, 'a'), ("vengeful", -1.9, 'a'),
    ("vicious", -2.2, 'a'), ("vindictive", -2.0, 'a'), ("wasteful", -1.6, 'a'),
    ("wretched", -2.2, 'a'),
    // --- short adjectives (+ly, +er, +est) ---
    ("brave", 1.8, 'e'), ("bright", 1.5, 's'), ("calmer", 1.3, 's'),
    ("cheap", -0.9, 's'), ("classier", 2.0, 's'), ("cleaner", 1.7, 's'),
    ("cleanest", 1.9, 's'), ("clever", 1.8, 'e'), ("close", 0.6, 's'),
    ("cool", 1.3, 'e'), ("cruel", -2.5, 's'), ("cuter", 1.9, 's'),
    ("fond", 1.5, 's'), ("fresher", 1.4, 's'), ("freshest", 1.5, 's'),
    ("friendlier", 2.2, 's'), ("friendliest", 2.4, 's'), ("grander", 2.2, 's'),
    ("grandest", 2.4, 's'), ("greater", 1.9, 's'), ("greatest", 3.2, 's'),
    ("happier", 2.7, 's'), ("happiest", 2.9, 's'), ("kinder", 1.8, 's'),
    ("kindest", 2.0, 's'), ("lucky", 1.9, 's'), ("nicer", 1.9, 's'),
    ("nicest", 2.1, 's'), ("plain", -0.5, 'e'), ("proud", 2.1, 's'),
    ("prouder", 2.1, 's'), ("quick", 1.2, 'e'), ("quiet", 0.8, 'e'),
    ("ruder", -2.4, 's'), ("rudest", -2.6, 's'), ("sadder", -2.1, 's'),
    ("saddest", -2.3, 's'), ("slower", -1.2, 's'), ("slowest", -1.4, 's'),
    ("smarter", 1.7, 's'), ("smartest", 1.9, 's'), ("smoother", 1.4, 's'),
    ("soft", 0.9, 'e'), ("stale", -1.6, 's'), ("stronger", 1.3, 's'),
    ("strongest", 1.5, 's'), ("sweeter", 1.8, 's'), ("sweetest", 2.0, 's'),
    ("tastier", 1.9, 's'), ("tastiest", 2.1, 's'), ("warmer", 1.8, 's'),
    ("warmest", 2.0, 's'), ("weaker", -1.2, 's'), ("worthier", 1.6, 's'),
    // --- adjectives (+ly, +ness) ---
    ("bitter", -1.4, 'u'), ("bold", 1.2, 'u'), ("careful", 1.1, 'u'),
    ("cold", -0.8, 'u'), ("courteous", 2.0, 'u'), ("crisp", 1.2, 'u'),
    ("dark", -0.9, 'u'), ("eager", 1.5, 'u'), ("fierce", -0.8, 'u'),
    ("foul", -2.1, 'u'), ("gentle", 1.4, 'u'), ("gloomy", -1.7, 'u'),
    ("goodness", 1.9, 's'), ("graceful", 2.0, 'u'), ("grateful", 2.2, 'u'),
    ("great", 3.1, 's'), ("greatness", 2.8, 's'), ("happy", 2.7, 'u'),
    ("harsh", -1.5, 'u'), ("hasty", -1.0, 'u'), ("helpful", 1.9, 'u'),
    ("hopeful", 1.6, 'u'), ("kindness", 2.0, 's'), ("lazy", -1.6, 'u'),
    ("lonely", -1.8, 's'), ("loneliness", -1.9, 's'), ("lovely", 2.8, 's'),
    ("loveliness", 2.5, 's'), ("mean", -1.6, 'u'), ("messy", -1.3, 'u'),
    ("mild", 0.5, 'u'), ("naughty", -1.2, 'u'), ("neat", 1.5, 'u'),
    ("nervous", -1.3, 'u'), ("pleasant", 2.3, 'u'), ("polite", 2.1, 'u'),
    ("quickness", 1.0, 's'), ("rude", -2.4, 'u'), ("sad", -2.1, 'u'),
    ("selfish", -1.8, 'u'), ("shy", -0.6, 's'), ("shyness", -0.7, 's'),
    ("sloppy", -1.5, 'u'), ("sly", -1.2, 's'), ("sour", -0.9, 'u'),
    ("stern", -0.9, 'u'), ("sweet", 1.8, 'u'), ("tender", 1.4, 'u'),
    ("thorough", 1.4, 'u'), ("ugly", -1.9, 'u'), ("vague", -0.9, 'u'),
    ("weary", -1.3, 'u'), ("wicked", -2.0, 'u'), ("witty", 1.7, 'u'),
    // --- nouns (+s) ---
    ("accolade", 2.0, 'n'), ("achievement", 2.0, 'n'), ("advantage", 1.4, 'n'),
    ("adversity", -1.5, 'n'), ("affection", 1.9, 'n'), ("agony", -2.5, 'n'),
    ("ally", 1.3, 'n'), ("ambulance", -1.5, 'n'), ("amenity", 1.3, 'n'),
    ("amusement", 1.6, 'n'), ("anguish", -2.4, 'n'), ("animosity", -2.0, 'n'),
    ("apology", -0.8, 'n'), ("applause", 2.0, 'n'), ("atrocity", -2.7, 'n'),
    ("benefit", 1.5, 'n'), ("blessing", 2.3, 'n'), ("blemish", -1.3, 'n'),
    ("blight", -1.8, 'n'), ("bliss", 2.7, 'n'), ("breakdown", -1.7, 'n'),
    ("breakthrough", 2.0, 'n'), ("brilliance", 2.5, 'n'), ("bruise", -1.3, 'n'),
    ("burglary", -2.3, 'n'), ("calamity", -2.4, 'n'), ("celebration", 2.2, 'n'),
    ("charity", 1.7, 'n'), ("comfort", 1.8, 'n'), ("compensation", 0.9, 'n'),
    ("conflict", -1.5, 'n'), ("congestion", -1.3, 'n'), ("contempt", -2.0, 'n'),
    ("courtesy", 1.8, 'n'), ("crime", -2.2, 'n'), ("cruelty", -2.5, 'n'),
    ("curse", -1.9, 'n'), ("deadlock", -1.4, 'n'), ("debacle", -2.1, 'n'),
    ("debt", -1.5, 'n'), ("deficiency", -1.4, 'n'), ("delicacy", 1.6, 'n'),
    ("dilemma", -1.2, 'n'), ("disadvantage", -1.4, 'n'), ("discomfort", -1.5, 'n'),
    ("discount", 1.2, 'n'), ("disgrace", -2.3, 'n'), ("dishonesty", -2.2, 'n'),
    ("dispute", -1.3, 'n'), ("distraction", -1.0, 'n'), ("downfall", -1.8, 'n'),
    ("downgrade", -1.3, 'n'), ("eyesore", -1.7, 'n'), ("elegance", 2.1, 'n'),
    ("emergency", -1.8, 'n'), ("enthusiasm", 2.0, 'n'), ("epidemic", -2.0, 'n'),
    ("excellency", 2.3, 'n'), ("eyeopener", 1.5, 'n'), ("feast", 1.9, 'n'),
    ("fiascoes", -2.2, 's'), ("fight", -1.5, 'n'), ("filth", -2.4, 'n'),
    ("freshness", 1.4, 'n'), ("friendliness", 2.2, 'n'), ("friendship", 1.9, 'n'),
    ("frustration", -2.0, 'n'), ("generosity", 2.2, 'n'), ("gratitude", 2.2, 'n'),
    ("grievances", -1.6, 's'), ("hardship", -1.7, 'n'), ("harmony", 1.8, 'n'),
    ("hazard", -1.7, 'n'), ("headache", -1.6, 'n'), ("highlight", 1.7, 'n'),
    ("honesty", 2.1, 'n'), ("hostility", -2.2, 'n'), ("hygiene", 1.0, 'n'),
    ("improvements", 1.4, 's'), ("inconsistency", -1.3, 'n'), ("infestation", -2.4, 'n'),
    ("injustice", -2.0, 'n'), ("insect", -1.2, 'n'), ("integrity", 1.9, 'n'),
    ("irony", -0.6, 'n'), ("kudos", 2.0, 's'), ("landmark", 1.2, 'n'),
    ("letdown", -1.8, 'n'), ("loyalty", 1.8, 'n'), ("luxury", 1.9, 'n'),
    ("malfunctions", -1.7, 's'), ("masterpiece", 2.8, 'n'), ("mishap", -1.4, 'n'),
    ("misery", -2.4, 'n'), ("misfortune", -1.8, 'n'), ("mold", -2.0, 'n'),
    ("odor", -1.5, 'n'), ("opportunity", 1.4, 'n'), ("ordeal", -1.8, 'n'),
    ("outage", -1.5, 'n'), ("paradise", 2.7, 'n'), ("pest", -1.6, 'n'),
    ("pleasure", 2.3, 'n'), ("plight", -1.6, 'n'), ("predicament", -1.4, 'n'),
    ("prosperity", 1.9, 'n'), ("rat", -1.8, 'n'), ("recommendation", 1.5, 'n'),
    ("reliability", 1.7, 'n'), ("remedy", 1.2, 'n'), ("resentment", -1.8, 'n'),
    ("riot", -1.9, 'n'), ("roach", -2.2, 'n'), ("robbery", -2.3, 'n'),
    ("sadness", -2.1, 'n'), ("sanctuary", 1.7, 'n'), ("setback", -1.5, 'n'),
    ("shortcoming", -1.3, 'n'), ("slur", -1.9, 'n'), ("smirk", -0.9, 'n'),
    ("sorrow", -2.1, 'n'), ("stench", -2.2, 'n'), ("strength", 1.4, 'n'),
    ("tantrum", -1.6, 'n'), ("theft", -2.2, 'n'), ("tragedy", -2.4, 'n'),
    ("turmoil", -1.8, 'n'), ("uproar", -1.5, 'n'), ("vermin", -2.3, 'n'),
    ("warmth", 1.9, 'n'), ("wisdom", 1.8, 'n'), ("wreckage", -1.9, 'n'),
    // --- second block: verbs whose base already rides the hand map get
    // tagged anyway (hand wins per-form; the tag contributes the missing
    // inflections), plus further nouns and irregular singles ---
    ("achieve", 1.8, 'v'), ("admire", 2.2, 'v'), ("adore", 2.9, 'v'),
    ("appreciate", 1.9, 'v'), ("bless", 2.0, 'v'), ("boast", -0.9, 'v'),
    ("brag", -1.1, 'v'), ("bribe", -2.0, 'v'), ("cheat", -2.3, 'v'),
    ("choke", -1.5, 'v'), ("clash", -1.4, 'v'), ("complain", -1.4, 'v'),
    ("cram", -1.0, 'v'), ("crave", 1.0, 'v'), ("cripple", -1.9, 'v'),
    ("crumble", -1.1, 'v'), ("curse", -1.9, 'v'), ("dawdle", -1.1, 'v'),
    ("deface", -1.8, 'v'), ("defame", -2.0, 'v'), ("delay", -1.1, 'v'),
    ("demean", -1.9, 'v'), ("demote", -1.4, 'v'), ("deplete", -1.3, 'v'),
    ("depress", -2.0, 'v'), ("deride", -1.9, 'v'), ("despise", -2.6, 'v'),
    ("discriminate", -1.9, 'v'), ("dishearten", -1.9, 'v'), ("dislike", -1.6, 'v'),
    ("distort", -1.3, 'v'), ("dodge", -1.0, 'v'), ("doom", -1.9, 'v'),
    ("dump", -1.2, 'v'), ("enslave", -2.2, 'v'), ("erode", -1.3, 'v'),
    ("evade", -1.3, 'v'), ("exhaust", -1.4, 'v'), ("expire", -1.1, 'v'),
    ("flounder", -1.3, 'v'), ("frighten", -1.9, 'v'), ("glorify", 1.5, 'v'),
    ("grieve", -2.0, 'v'), ("hamper", -1.3, 'v'), ("hate", -2.7, 'v'),
    ("haunt", -1.5, 'v'), ("heckle", -1.5, 'v'), ("hoard", -1.0, 'v'),
    ("idolize", 1.7, 'v'), ("irk", -1.5, 'v'), ("jam", -1.0, 'v'),
    ("jeer", -1.6, 'v'), ("lag", -1.2, 'v'), ("languish", -1.5, 'v'),
    ("lash", -1.5, 'v'), ("lure", -1.0, 'v'), ("malign", -1.9, 'v'),
    ("mangle", -1.8, 'v'), ("mar", -1.5, 'v'), ("menace", -1.8, 'v'),
    ("mourn", -2.0, 'v'), ("obsess", -1.0, 'v'), ("persecute", -2.1, 'v'),
    ("pinch", -0.9, 'v'), ("pity", -1.4, 'v'), ("plummet", -1.5, 'v'),
    ("praise", 2.0, 'v'), ("punch", -1.4, 'v'), ("ransack", -1.9, 'v'),
    ("ravage", -2.0, 'v'), ("rave", 2.2, 'v'), ("rebuke", -1.6, 'v'),
    ("recoil", -1.3, 'v'), ("redeem", 1.3, 'v'), ("rejoice", 2.4, 'v'),
    ("renounce", -1.2, 'v'), ("reprimand", -1.5, 'v'), ("repulse", -2.2, 'v'),
    ("retaliate", -1.6, 'v'), ("revere", 1.9, 'v'), ("scam", -2.6, 'v'),
    ("scare", -1.8, 'v'), ("scorn", -1.9, 'v'), ("shock", -1.4, 'v'),
    ("slander", -2.0, 'v'), ("slump", -1.2, 'v'), ("smash", -1.3, 'v'),
    ("snap", -1.1, 'v'), ("sneer", -1.6, 'v'), ("soil", -1.4, 'v'),
    ("squeal", -0.9, 'v'), ("stagnate", -1.3, 'v'), ("strand", -1.4, 'v'),
    ("stress", -1.6, 'v'), ("taint", -1.6, 'v'), ("terrify", -2.4, 'v'),
    ("thrash", -1.5, 'v'), ("tolerate", -0.6, 'v'), ("torture", -2.5, 'v'),
    ("trap", -1.4, 'v'), ("traumatize", -2.4, 'v'), ("trivialize", -1.2, 'v'),
    ("vex", -1.6, 'v'), ("whack", -1.1, 'v'), ("wither", -1.4, 'v'),
    ("stinking", -1.9, 's'), ("overpaid", -1.6, 's'), ("stank", -1.9, 's'),
    ("swore", -1.5, 's'), ("swearing", -1.5, 's'),
    ("admiration", 2.0, 'n'), ("aroma", 1.4, 'n'), ("allergy", -1.2, 'n'),
    ("bonuses", 1.6, 's'), ("catastrophes", -2.8, 's'), ("decay", -1.6, 'n'),
    ("dirt", -1.4, 's'), ("discrepancy", -1.2, 'n'), ("flop", -1.6, 'n'),
    ("fraudster", -2.3, 'n'), ("glitch", -1.4, 'n'), ("grime", -1.7, 's'),
    ("grudge", -1.5, 'n'), ("gunk", -1.5, 's'), ("hiccup", -0.9, 'n'),
    ("hype", -0.7, 's'), ("imperfection", -1.2, 'n'), ("leak", -1.3, 'n'),
    ("nuisance", -1.6, 'n'), ("overcrowding", -1.3, 's'), ("perk", 1.4, 'n'),
    ("pestilence", -2.2, 's'), ("scandal", -2.0, 'n'), ("smudge", -1.1, 'n'),
    ("splendor", 2.3, 's'), ("thug", -2.0, 'n'), ("virus", -1.8, 'n'),
    ("wart", -1.2, 'n'), ("woe", -1.9, 'n'))

  private def isVowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  /** ≤4-char consonant-vowel-consonant stems double the final consonant
    * before a vowel suffix (hug → hugged; stress is unambiguous only for
    * these short stems, so longer candidates are simply not tagged). */
  private def doubles(w: String): Boolean =
    w.length <= 4 && w.length >= 3 && {
      val c = w.last
      !isVowel(c) && c != 'w' && c != 'x' && c != 'y' &&
        isVowel(w(w.length - 2)) && !isVowel(w(w.length - 3))
    }

  private def sForm(w: String): String =
    if (w.endsWith("s") || w.endsWith("x") || w.endsWith("z") ||
        w.endsWith("ch") || w.endsWith("sh")) w + "es"
    else if (w.endsWith("y") && w.length > 1 && !isVowel(w(w.length - 2)))
      w.dropRight(1) + "ies"
    else w + "s"

  private def verbForms(w: String): Seq[String] = {
    val stem = if (doubles(w)) w + w.last else w
    val (ed, ing) =
      if (w.endsWith("e")) (w + "d", w.dropRight(1) + "ing")
      else if (w.endsWith("y") && !isVowel(w(w.length - 2)))
        (w.dropRight(1) + "ied", stem + "ing")
      else (stem + "ed", stem + "ing")
    Seq(sForm(w), ed, ing)
  }

  private def lyForm(w: String): String =
    if (w.endsWith("y")) w.dropRight(1) + "ily"
    else if (w.endsWith("le")) w.dropRight(1) + "y"
    else if (w.endsWith("ic")) w + "ally"
    else w + "ly"

  private def erEst(w: String): Seq[String] = {
    val stem = if (doubles(w)) w + w.last else w
    if (w.endsWith("e")) Seq(w + "r", w + "st")
    else if (w.endsWith("y") && !isVowel(w(w.length - 2)))
      Seq(w.dropRight(1) + "ier", w.dropRight(1) + "iest")
    else Seq(stem + "er", stem + "est")
  }

  private def nessForm(w: String): String =
    if (w.endsWith("y")) w.dropRight(1) + "iness" else w + "ness"

  private def expand(w: String, tag: Char): Seq[String] = tag match {
    case 'v' => w +: verbForms(w)
    case 'a' => Seq(w, lyForm(w))
    case 'e' => w +: lyForm(w) +: erEst(w)
    case 'u' => Seq(w, lyForm(w), nessForm(w))
    case 'n' => Seq(w, sForm(w))
    case _   => Seq(w)
  }

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

  /** The full valence lexicon: hand entries + morphology-expanded tagged
    * bases (hand wins on conflict; modifier-role tokens excluded so no
    * token ever plays two roles — declared after [[boosters]]/[[negators]]
    * because object vals initialize in declaration order). */
  val lexicon: Map[String, Double] = {
    val generated = tagged.flatMap { case (w, v, tag) =>
      expand(w, tag).map(_ -> v)
    }.toMap
    (generated ++ hand) -- boosters.keySet -- negators
  }

  /** Rule constants — public so the q32 oracle builder interpolates the
    * exact same values into its SQL mirror (one source of truth).
    */
  val NegationScalar = -0.74
  val CapsBoost = 0.733
  val ExclBoost = 0.292

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
