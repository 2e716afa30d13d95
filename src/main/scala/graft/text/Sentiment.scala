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

  /** Embedded valence lexicon (~730 entries), VADER-scale [-4, 4] — our own
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
