package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.plans.GraftExtensions

/** The SparkSessionExtensions SQL surface: every registered function
  * must resolve in spark.sql, lower to the SAME codegen expression the
  * Column API uses, and reject non-literal kernel parameters at
  * analysis time.
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val installed: Unit = GraftExtensions.install(spark)

  private def emb = {
    installed
    spark.read.parquet(s"$sf001/embeddings.parquet")
  }
  private def docs = {
    installed
    spark.read.parquet(s"$sf001/documents.parquet")
  }

  test("every registry entry resolves through spark.sql") {
    installed
    val names = GraftExtensions.registry.map(_._1.funcName)
    assert(names.size == names.distinct.size)
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)), n)
    }
  }

  test("vector kernels: SQL == Column API, bit-exact") {
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS d,
        |  vec_l2(embedding, embedding) AS z, vec_norm(embedding) AS nrm,
        |  vec_cosine(embedding, embedding) AS c
        |FROM ext_emb ORDER BY vec_id""".stripMargin).collect()
    val viaCol = emb.select(col("vec_id"),
        vecDot(col("embedding"), col("embedding")).as("d"),
        vecL2(col("embedding"), col("embedding")).as("z"),
        vecNorm(col("embedding")).as("nrm"),
        vecCosine(col("embedding"), col("embedding")).as("c"))
      .orderBy("vec_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("text kernels: SQL == Column API, bit-exact") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, tokenize_words(text) AS toks,
        |  word_shingle_hash60(tokenize_words(text), 3) AS sh,
        |  minhash_sig(word_shingle_hash60(tokenize_words(text), 3), 16) AS sig,
        |  char_shingle_poly(text, 8) AS poly,
        |  rolling_fingerprint(text) AS fp,
        |  winnow_hashes(text, 5, 4) AS wh,
        |  sum_str_len(tokenize_words(text)) AS ssl
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val viaCol = docs.select(col("doc_id"),
        wordTokens(col("text")).as("toks"),
        wordShingleHash60(wordTokens(col("text")), 3).as("sh"),
        minHashSig(wordShingleHash60(wordTokens(col("text")), 3), 16).as("sig"),
        charShinglePoly(col("text"), 8).as("poly"),
        rollingFingerprint(col("text")).as("fp"),
        winnowHashes(col("text"), 5, 4).as("wh"),
        sumStrLen(wordTokens(col("text"))).as("ssl"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("SQL path stays inside whole-stage codegen") {
    emb.createOrReplaceTempView("ext_emb")
    val df = spark.sql(
      "SELECT vec_id, vec_l2sq(embedding, embedding) AS d FROM ext_emb")
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("parameterized kernels reject non-literal arguments") {
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(word_shingle_hash60(tokenize_words(text), 3), doc_id) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")),
      e.getMessage)
  }
}
