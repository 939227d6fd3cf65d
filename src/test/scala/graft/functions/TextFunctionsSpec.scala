package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def doc(t: String) = df("text STRING", Row(t))

  test("nTokens: whitespace tokenization") {
    val d = doc("  the quick\tbrown\n fox ")
    assert(d.select(TextFunctions.nTokens(col("text")))
      .collect()(0).getInt(0) == 4)
  }

  test("nTokensBpeIsh counts subword-ish pieces >= words") {
    val d = doc("hello, world! it's 2024")
    val n = d.select(TextFunctions.nTokensBpeIsh(col("text")))
      .collect()(0).getInt(0)
    assert(n >= 4)
  }

  test("avgTokenLen") {
    val d = doc("ab cdef") // 6 non-space chars / 2 tokens = 3
    val v = d.select(TextFunctions.avgTokenLen(col("text")))
      .collect()(0).getDouble(0)
    assertApprox(v, 3.0)
  }

  test("stopwordRatio counts occurrences not distinct") {
    val d = doc("the cat the dog") // 2 stopword hits / 4 tokens
    val v = d.select(TextFunctions.stopwordRatio(col("text")))
      .collect()(0).getDouble(0)
    assertApprox(v, 0.5)
  }

  test("punct and upper ratios") {
    val d = doc("AB, cd!") // punct: , and ! => 2/7 ; upper: A,B => 2/7
    val r = d.select(TextFunctions.punctRatio(col("text")),
      TextFunctions.upperRatio(col("text"))).collect()(0)
    assertApprox(r.getDouble(0), 2.0 / 7.0)
    assertApprox(r.getDouble(1), 2.0 / 7.0)
  }

  test("qualityScore: prose scores higher than spam") {
    val prose = "The quick brown fox jumps over the lazy dog and then " +
      "it runs to the river where the water is cold and clear in the morning"
    val spam = "BUY NOW!!! CLICK!!! FREE!!! WIN!!! $$$ !!!"
    val d = df("id INT, text STRING", Row(1, prose), Row(2, spam))
    val out = d.select(col("id"), TextFunctions.qualityScore(col("text")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) > out(2))
    assert(out(1) >= 0.0 && out(1) <= 1.0 && out(2) >= 0.0 && out(2) <= 1.0)
  }

  test("bowFingerprint: order and duplicate insensitive") {
    val d = df("id INT, text STRING",
      Row(1, "alpha beta gamma"), Row(2, "gamma alpha beta alpha"),
      Row(3, "alpha beta delta"))
    val fps = d.select(col("id"), TextFunctions.bowFingerprint(col("text")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(fps(1) == fps(2))
    assert(fps(1) != fps(3))
  }

  test("seqFingerprint: order sensitive") {
    val d = df("id INT, text STRING",
      Row(1, "alpha beta"), Row(2, "beta alpha"), Row(3, "alpha beta"))
    val fps = d.select(col("id"), TextFunctions.seqFingerprint(col("text")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(1) == fps(3))
    assert(fps(1) != fps(2))
  }

  test("langId on real-language snippets") {
    val d = df("id INT, text STRING",
      Row(1, "The history of the region is marked by the rise and fall " +
        "of empires that shaped the culture for centuries."),
      Row(2, "Der schnelle braune Fuchs springt über den faulen Hund und " +
        "das ist nicht ungewöhnlich für die Jahreszeit."),
      Row(3, "Le développement économique de la région est soutenu par " +
        "une politique qui est adaptée et des investissements."),
      Row(4, "El desarrollo de la región es el resultado de una política " +
        "que fue adoptada por los gobiernos y las instituciones."),
      Row(5, "这是一个简单的中文测试文本，用来验证语言识别功能是否正常工作。"),
      Row(6, "Lo sviluppo della regione è il risultato di una politica " +
        "che il governo ha adottato per la crescita con gli investimenti."),
      Row(7, "O desenvolvimento da região não é uma questão simples, " +
        "é o resultado de uma política que foi adotada para a população."),
      Row(8, "Развитие региона является результатом политики, которую " +
        "приняли правительства и учреждения за последние годы."),
      Row(9, "この地域の発展は、政府が採用した政策の結果であり、" +
        "ここ数年のさまざまな投資によって支えられています。"))
    val out = d.select(col("id"), TextFunctions.langId(col("text")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en", s"got ${out(1)}")
    assert(out(2) == "de", s"got ${out(2)}")
    assert(out(3) == "fr", s"got ${out(3)}")
    assert(out(4) == "es", s"got ${out(4)}")
    assert(out(5) == "zh", s"got ${out(5)}")
    assert(out(6) == "it", s"got ${out(6)}")
    assert(out(7) == "pt", s"got ${out(7)}")
    assert(out(8) == "ru", s"got ${out(8)}")
    assert(out(9) == "ja", s"got ${out(9)}")
  }
}
