package graft.analysis.snowball

import graft.analysis.Porter2Stemmer

/** Dispatcher over the Snowball stemmer family — the analog of the
  * reference's `Stemmer` token filter with its `Language` enum
  * (`/root/reference/src/tokenizer/stemmer.rs:12-30`). Languages are added
  * here as their fixture-gated implementations land; `supported` is the
  * source of truth for the analyzer registry and the SQL function.
  */
object SnowballStemmer {

  val stemmers: Map[String, String => String] = Map(
    "english" -> Porter2Stemmer.stem _,
    "danish" -> DanishStemmer.stem _,
    "norwegian" -> NorwegianStemmer.stem _,
    "swedish" -> SwedishStemmer.stem _,
    "german" -> GermanStemmer.stem _,
    "dutch" -> DutchStemmer.stem _,
    "spanish" -> SpanishStemmer.stem _,
    "portuguese" -> PortugueseStemmer.stem _,
    "italian" -> ItalianStemmer.stem _,
    "french" -> FrenchStemmer.stem _,
    "russian" -> RussianStemmer.stem _,
    "romanian" -> RomanianStemmer.stem _,
    "hungarian" -> HungarianStemmer.stem _,
    "finnish" -> FinnishStemmer.stem _,
    "greek" -> GreekStemmer.stem _,
    "arabic" -> ArabicStemmer.stem _,
    "tamil" -> TamilStemmer.stem _,
    "turkish" -> TurkishStemmer.stem _
  )

  def supported: Set[String] = stemmers.keySet

  def apply(language: String): String => String =
    stemmers.getOrElse(
      language.toLowerCase,
      throw new IllegalArgumentException(
        s"unsupported stemmer language '$language' (supported: ${supported.toSeq.sorted.mkString(", ")})"))
}
