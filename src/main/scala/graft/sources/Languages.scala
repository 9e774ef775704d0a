package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The engine's language-data surface, lifted from the reference's `LANGUAGE_CODES`
 * code->name catalog (the tessdata language-pack inventory,
 * uiucprescon/ocr/languages.py:9-127, incl. the pseudo-languages `osd` — orientation/
 * script detection, mandatory for every reader per reader.py:28-30 — and `equ`, the
 * math module). In the engine this becomes:
 *
 *  - a broadcast `Map` for executor-side routing (the reference consults the dict
 *    in-process; we broadcast it by value, it is tiny);
 *  - a small DIMENSION DataFrame for metrics joins — always the broadcast side of a
 *    join (117 rows never justifies a shuffle at any scale).
 */
object Languages {

  /** code -> language name (content per uiucprescon/ocr/languages.py:9-127). */
  val LanguageCodes: Seq[(String, String)] = Seq(
    "afr" -> "Afrikaans", "amh" -> "Amharic", "ara" -> "Arabic", "asm" -> "Assamese",
    "aze" -> "Azerbaijani", "aze_cyrl" -> "Azerbaijani - Cyrilic",
    "bel" -> "Belarusian", "ben" -> "Bengali", "bod" -> "Tibetan", "bos" -> "Bosnian",
    "bre" -> "Breton", "bul" -> "Bulgarian", "cat" -> "Catalan; Valencian",
    "ceb" -> "Cebuano", "ces" -> "Czech", "chi_sim" -> "Chinese - Simplified",
    "chi_tra" -> "Chinese - Traditional", "chr" -> "Cherokee", "cym" -> "Welsh",
    "dan" -> "Danish", "deu" -> "German", "dzo" -> "Dzongkha",
    "ell" -> "Greek, Modern (1453-)", "eng" -> "English",
    "enm" -> "English, Middle 1100-1500", "epo" -> "Esperanto",
    "equ" -> "Math / equation detection module", "est" -> "Estonian",
    "eus" -> "Basque", "fas" -> "Persian", "fin" -> "Finnish", "fra" -> "French",
    "frk" -> "Frankish", "frm" -> "French Middle (ca.1400-1600)", "gle" -> "Irish",
    "glg" -> "Galician", "grc" -> "Greek, Ancient (to 1453)", "guj" -> "Gujarati",
    "hat" -> "Haitian; Haitian Creole", "heb" -> "Hebrew", "hin" -> "Hindi",
    "hrv" -> "Croatian", "hun" -> "Hungarian", "iku" -> "Inuktitut",
    "ind" -> "Indonesian", "isl" -> "Icelandic", "ita" -> "Italian",
    "ita_old" -> "Italian - Old", "jav" -> "Javanese", "jpn" -> "Japanese",
    "kan" -> "Kannada", "kat" -> "Georgian", "kat_old" -> "Georgian - Old",
    "kaz" -> "Kazakh", "khm" -> "Central Khmer", "kir" -> "Kirghiz; Kyrgyz",
    "kor" -> "Korean", "kor_vert" -> "Korean vertical", "kur" -> "Kurdish",
    "kur_ara" -> "Kurdish Arabic", "lao" -> "Lao", "lat" -> "Latin",
    "lav" -> "Latvian", "lit" -> "Lithuanian", "ltz" -> "Luxembourgish",
    "mal" -> "Malayalam", "mar" -> "Marathi", "mkd" -> "Macedonian",
    "mlt" -> "Maltese", "mon" -> "Mongolian", "mri" -> "Maori", "msa" -> "Malay",
    "mya" -> "Burmese", "nep" -> "Nepali", "nld" -> "Dutch; Flemish",
    "nor" -> "Norwegian", "oci" -> "Occitan post 1500", "ori" -> "Oriya",
    "osd" -> "Orientation and script detection module",
    "pan" -> "Panjabi; Punjabi", "pol" -> "Polish", "por" -> "Portuguese",
    "pus" -> "Pushto; Pashto", "que" -> "Quechua",
    "ron" -> "Romanian; Moldavian; Moldovan", "rus" -> "Russian",
    "san" -> "Sanskrit", "sin" -> "Sinhala; Sinhalese", "slk" -> "Slovak",
    "slv" -> "Slovenian", "snd" -> "Sindhi", "spa" -> "Spanish; Castilian",
    "spa_old" -> "Spanish; Castilian - Old", "sqi" -> "Albanian",
    "srp" -> "Serbian", "srp_latn" -> "Serbian - Latin", "sun" -> "Sundanese",
    "swa" -> "Swahili", "swe" -> "Swedish", "syr" -> "Syriac", "tam" -> "Tamil",
    "tat" -> "Tatar", "tel" -> "Telugu", "tgk" -> "Tajik", "tgl" -> "Tagalog",
    "tha" -> "Thai", "tir" -> "Tigrinya", "ton" -> "Tonga", "tur" -> "Turkish",
    "uig" -> "Uighur; Uyghur", "ukr" -> "Ukrainian", "urd" -> "Urdu",
    "uzb" -> "Uzbek", "uzb_cyrl" -> "Uzbek - Cyrilic", "vie" -> "Vietnamese",
    "yid" -> "Yiddish", "yor" -> "Yoruba")

  /** Lookup map (broadcast by value into closures where needed). */
  val LanguageMap: Map[String, String] = LanguageCodes.toMap

  /** The `<code>.traineddata` filename template (uiucprescon/ocr/reader.py:20). */
  def traineddataFile(code: String): String = s"$code.traineddata"

  /** Dimension table (lang_code, lang_name, traineddata) — broadcast-join side. */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    LanguageCodes.toDF("lang_code", "lang_name")
      .withColumn("traineddata", concat(col("lang_code"), lit(".traineddata")))
  }
}
