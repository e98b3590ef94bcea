package graft

import org.apache.spark.sql.functions._

import graft.functions.{Text, Unigram}

/** Trained char-3gram NB language ID (q167) ground truth.
  *
  * The synthetic documents table's `lang` column is a random label over
  * a SHARED English-ish vocabulary (verified: per-language gram tables
  * are ~identical), so it can gate the computation (the q167 hash
  * replay) but not classifier QUALITY — no model can learn a random
  * label. Quality is pinned here on a real multilingual fixture:
  * held-out accuracy, agreement with the 15-marker heuristic on clean
  * English, and a win the heuristic cannot have (marker-free text).
  */
class NbLangIdSpec extends SparkSuite {
  import spark.implicits._

  // genuinely distinct languages, a few sentences each
  private lazy val labeled = Seq(
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "she was reading a book about the history of science and art"),
    ("en", "they have been working on this project for three long years"),
    ("en", "the weather this morning is cold with a chance of light rain"),
    ("en", "every child should learn how to read and write at school"),
    ("de", "der schnelle braune fuchs springt über den faulen hund am fluss"),
    ("de", "sie las ein buch über die geschichte der wissenschaft und kunst"),
    ("de", "wir haben drei jahre lang an diesem projekt gearbeitet"),
    ("de", "das wetter heute morgen ist kalt mit leichtem regen"),
    ("de", "jedes kind sollte in der schule lesen und schreiben lernen"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux"),
    ("fr", "elle lisait un livre sur l'histoire de la science et de l'art"),
    ("fr", "ils travaillent sur ce projet depuis trois longues années"),
    ("fr", "le temps ce matin est froid avec un risque de pluie légère"),
    ("fr", "chaque enfant devrait apprendre à lire et à écrire à l'école"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso del río"),
    ("es", "ella estaba leyendo un libro sobre la historia de la ciencia"),
    ("es", "han estado trabajando en este proyecto durante tres años"),
    ("es", "el tiempo esta mañana es frío con posibilidad de lluvia"),
    ("es", "cada niño debería aprender a leer y escribir en la escuela")
  ).toDF("lang", "text")

  test("held-out sentences classify to their language") {
    val held = Seq(
      (1L, "the children were playing in the garden after the rain", "en"),
      (2L, "this is another simple english sentence about the world", "en"),
      (3L, "die kinder spielten nach dem regen im garten des hauses", "de"),
      (4L, "les enfants jouaient dans le jardin après la pluie du soir", "fr"),
      (5L, "los niños jugaban en el jardín después de la lluvia", "es")
    ).toDF("id", "text", "truth")
    val pred = Unigram.nbLangId(held, "id", "text", labeled, "lang",
      n = 3, minShare = 0.0005).join(held, "id")
    assert(pred.filter(col("lang_pred") =!= col("truth")).isEmpty,
      pred.collect().mkString("\n"))
  }

  test("agrees with the marker heuristic on clean English; beats it on unmarked text") {
    val en = Seq((1L, "the quick brown fox and the lazy dog were in the house"))
      .toDF("id", "text")
    assert(en.select(Text.langId(col("text"))).as[String].head() == "en")
    assert(Unigram.nbLangId(en, "id", "text", labeled, "lang")
      .select("lang_pred").as[String].head() == "en")
    // marker-free English: the heuristic can only say "und"; the
    // trained grams still carry the signal
    val bare = Seq((9L, "neural network training corpus quality filtering"))
      .toDF("id", "text")
    val m = bare.select(Text.langId(col("text"))).as[String].head()
    val p = Unigram.nbLangId(bare, "id", "text", labeled, "lang")
      .select("lang_pred").as[String].head()
    assert(m == "und" && p == "en", s"marker=$m nb=$p")
  }

  test("prediction is deterministic; scores are negative micro-nat longs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    def run() = Unigram.nbLangId(docs, "doc_id", "text", labeled, "lang")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val a = run()
    assert(a == run())
    assert(a.forall(_._3 < 0L), "NB log scores must be negative micro-nats")
  }
}
