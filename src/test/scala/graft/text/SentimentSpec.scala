package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Golden scores are OUR OWN (embedded lexicon), not the Python package's —
  * the reference's observable contract is only: Float compound in [-1,1],
  * 0.0 for null/empty, labels at ±0.05 (SURVEY.md §7.4).
  */
class SentimentSpec extends SparkSpec {

  test("contract: null/empty/whitespace/punct-only → 0.0") {
    assert(Sentiment.compound(null) == 0.0f)
    assert(Sentiment.compound("") == 0.0f)
    assert(Sentiment.compound("   ") == 0.0f)
    assert(Sentiment.compound("... !!! ???") == 0.0f)
  }

  test("contract: compound always in [-1, 1] (property, 200 seeded samples)") {
    val gen = Gen.listOf(Gen.oneOf(
      Sentiment.lexicon.keys.toSeq ++ Seq("the", "very", "not", "!!!", "FOOD")))
    (0 until 200).foreach { i =>
      val words = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val c = Sentiment.compound(words.mkString(" "))
      assert(c >= -1.0f && c <= 1.0f, s"out of range for: $words")
    }
  }

  test("polarity: positive, negative, neutral texts") {
    assert(Sentiment.compound("great food") > 0.05f)
    assert(Sentiment.compound("terrible service") < -0.05f)
    assert(Sentiment.compound("the food was food") == 0.0f)
  }

  test("negation flips within a 3-token window") {
    val pos = Sentiment.compound("good")
    assert(Sentiment.compound("not good") < 0)
    assert(Sentiment.compound("not very good") < 0)
    // negator 4 tokens back is out of window
    assert(Sentiment.compound("not a a a good") > 0)
    assert(math.abs(Sentiment.compound("not good")) < pos) // dampened flip (×0.74)
  }

  test("boosters amplify, dampeners attenuate") {
    val base = Sentiment.compound("good")
    assert(Sentiment.compound("very good") > base)
    assert(Sentiment.compound("slightly good") < base)
    val nbase = Sentiment.compound("bad")
    assert(Sentiment.compound("very bad") < nbase)
  }

  test("caps emphasis and exclamations amplify") {
    val base = Sentiment.compound("this food is great")
    assert(Sentiment.compound("this food is GREAT") > base)
    assert(Sentiment.compound("this food is great!") > base)
    assert(Sentiment.compound("this food is great!!!!") >=
      Sentiment.compound("this food is great!"))
    // ALL-caps text gets no per-word caps boost
    assert(Sentiment.compound("THIS FOOD IS GREAT") == base)
  }

  test("extended lexicon: breadth, range, no role overlap with modifiers") {
    // round-7 floor: hand entries + regular-morphology expansion
    assert(Sentiment.lexicon.size >= 3000, s"size = ${Sentiment.lexicon.size}")
    assert(Sentiment.lexicon.values.forall(v => v >= -4.0 && v <= 4.0))
    // degree/negation words must not double as valence words
    assert(Sentiment.lexicon.keySet.intersect(Sentiment.boosters.keySet).isEmpty)
    assert(Sentiment.lexicon.keySet.intersect(Sentiment.negators).isEmpty)
    // spot polarity of round-2 additions
    assert(Sentiment.compound("exquisite flavorful meal") > 0.05f)
    assert(Sentiment.compound("unprofessional staff ruined it") < -0.05f)
    assert(Sentiment.compound("not impressed") < 0f)
    // spot polarity of round-7 morphology-expanded forms
    assert(Sentiment.compound("they overcharged and humiliated us") < -0.05f)
    assert(Sentiment.compound("the staff pampered us cheerily") > 0.05f)
    assert(Sentiment.compound("worrying stains and a lingering stench") < -0.05f)
  }

  test("golden scores (embedded lexicon, fixed rule set)") {
    // hand-derived: good=1.9 → 1.9/√(1.9²+15) ≈ 0.44047
    assert(math.abs(Sentiment.compound("good") - 0.44047f) < 1e-4f)
    // not good = 1.9 × -0.74 = -1.406 → -1.406/√(-1.406²+15) ≈ -0.34125
    assert(math.abs(Sentiment.compound("not good") - (-0.34125f)) < 1e-4f)
    // very good = (1.9+0.293) → 2.193/√(2.193²+15) ≈ 0.49273
    assert(math.abs(Sentiment.compound("very good") - 0.49273f) < 1e-4f)
  }

  test("golden scores: booster/negation combinations") {
    // not very good: booster at distance 1 (full 0.293), negator in the
    // window: (1.9+0.293) × −0.74 = −1.62282 → −0.38646
    assert(math.abs(Sentiment.compound("not very good") - (-0.38646f)) < 1e-4f)
    // extremely terrible!!: booster deepens the negative base
    // (−2.1−0.293 = −2.393), two '!' add sign-following 2×0.292:
    // −2.977 → −2.977/√(2.977²+15) ≈ −0.60942
    assert(math.abs(Sentiment.compound("extremely terrible!!") - (-0.60942f)) < 1e-4f)
    // barely plays BOTH roles (dampener and negator):
    // (1.9−0.293) × −0.74 = −1.18918 → −0.29352
    assert(math.abs(Sentiment.compound("barely good") - (-0.29352f)) < 1e-4f)
  }
}
