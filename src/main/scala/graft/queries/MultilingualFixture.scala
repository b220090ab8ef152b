package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real zh/ja/th/ko sample text (plus latin-script controls) for the
  * space-free-script gate queries — the synthetic `documents` table
  * is space-delimited pseudo-English under every label, so nothing
  * in the driver's testdata can exercise CJK/Thai tokenization. The
  * fixture rides INLINE through both engines: Spark sees it as a
  * local DataFrame, the DuckDB oracle as a VALUES list carried in
  * the oracle SQL itself, so the gate queries stay hash-checkable
  * with zero new files. doc_ids sit far above any scale factor's
  * range (sf100's documents stay under 5e7).
  *
  * The sentences are generic descriptive text written for this
  * fixture (no quoted sources); each is 15-40 chars so char-5-grams
  * are plentiful, and the ja rows contain kana (the signal that
  * separates ja from zh), th rows contain combining vowel marks (the
  * codepoint-vs-grapheme trap), and ko rows contain spaces (Korean
  * IS space-delimited — the control showing char-gram mode must not
  * be forced on every non-latin script).
  */
object MultilingualFixture {

  /** (doc_id, lang, text) */
  val rows: Seq[(Long, String, String)] = Seq(
    (1000000001L, "zh", "机器学习是人工智能的一个重要分支，研究计算机如何从数据中学习规律。"),
    (1000000002L, "zh", "深度神经网络在图像识别和自然语言处理领域取得了巨大的成功。"),
    (1000000003L, "zh", "大规模语料库的清洗与去重是训练高质量语言模型的关键步骤。"),
    (1000000004L, "ja", "機械学習は人工知能の一分野であり、データから規則を学びます。"),
    (1000000005L, "ja", "日本語のテキストにはひらがなとカタカナと漢字が混ざっています。"),
    (1000000006L, "ja", "大規模なコーパスの重複除去は言語モデルの品質を高めます。"),
    (1000000007L, "th", "การเรียนรู้ของเครื่องเป็นสาขาหนึ่งของปัญญาประดิษฐ์"),
    (1000000008L, "th", "ภาษาไทยเขียนโดยไม่มีช่องว่างระหว่างคำในประโยค"),
    (1000000009L, "th", "การกรองข้อมูลคุณภาพสูงช่วยให้โมเดลภาษาดีขึ้น"),
    (1000000010L, "ko", "기계 학습은 인공 지능의 한 분야입니다"),
    (1000000011L, "ko", "한국어 문장은 공백으로 단어를 구분합니다"),
    (1000000012L, "en", "the quick brown fox jumps over the lazy dog"),
    (1000000013L, "en", "a machine learning model improves with clean training data"),
    (1000000014L, "de", "der schnelle braune fuchs springt und der hund schläft"),
    (1000000015L, "fr", "le modèle de langue apprend la structure des phrases"))

  /** The fixture as a local DataFrame with the `documents` gate
    * columns. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  /** The fixture as a DuckDB VALUES body (texts contain no quotes to
    * escape — pinned by MultilingualFixtureSpec). */
  lazy val sqlValues: String = rows
    .map { case (id, lang, text) => s"($id, '$lang', '$text')" }
    .mkString(",\n  ")

  /** `documents` ∪ fixture as a subquery body, for oracle CTE heads:
    * `(SELECT ... FROM ($sqlCorpus) ...)`. */
  lazy val sqlCorpus: String =
    s"""SELECT doc_id, lang, text FROM documents
       |UNION ALL
       |SELECT * FROM (VALUES $sqlValues) AS mx(doc_id, lang, text)""".stripMargin

  /** [[sqlCorpus]] with the documents side bounded to a constant
    * slice (covers ALL of sf0.01, so gate hashes are scale-stable) —
    * for the char-gram queries whose token stream is ~5× word mode. */
  lazy val sqlCorpusBounded: String =
    s"""SELECT doc_id, lang, text FROM documents WHERE doc_id < 2000
       |UNION ALL
       |SELECT * FROM (VALUES $sqlValues) AS mx(doc_id, lang, text)""".stripMargin

  /** `documents` ∪ fixture on the Spark side — the same corpus the
    * oracle sees. */
  def corpus(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select("doc_id", "lang", "text").unionAll(df(spark))
}
