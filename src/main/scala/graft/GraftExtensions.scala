package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSimilarity, MinHashSignature, MinHashSketch, RollingHash, SimHash64, SpaceSavingSketch, WordChunks, WordShingles}

/** Session extensions: registers graft's native Catalyst expressions so they
  * are callable from SQL and `call_function`.
  *
  * Install with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSim)
    e.injectFunction(GraftExtensions.minhashSketch)
    e.injectFunction(GraftExtensions.wordShingles)
    e.injectFunction(GraftExtensions.minhashSignature)
    e.injectFunction(GraftExtensions.simhash64)
    e.injectFunction(GraftExtensions.wordChunks)
    e.injectFunction(GraftExtensions.rollingHash)
    e.injectFunction(GraftExtensions.spaceSaving)
  }
}

object GraftExtensions {

  private def sketchBuilder(exprs: Seq[Expression]): Expression = {
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sketch k must be an integer literal, got $other")
    }
    MinHashSketch(exprs(0), k).toAggregateExpression()
  }

  private val cosineSim = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)))

  private val minhashSketch = (
    FunctionIdentifier("minhash_sketch"),
    new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
    (exprs: Seq[Expression]) => sketchBuilder(exprs))

  private def shinglesBuilder(exprs: Seq[Expression]): Expression = {
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_shingles n must be an integer literal, got $other")
    }
    WordShingles(exprs(0), n)
  }

  private val wordShingles = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (exprs: Seq[Expression]) => shinglesBuilder(exprs))

  private def signatureBuilder(exprs: Seq[Expression]): Expression =
    (exprs(1), exprs(2)) match {
      case (Literal(n: Int, _), Literal(k: Int, _)) =>
        MinHashSignature(exprs(0), n, k)
      case other => throw new IllegalArgumentException(
        s"minhash_signature n and k must be integer literals, got $other")
    }

  private val minhashSignature = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    (exprs: Seq[Expression]) => signatureBuilder(exprs))

  private def simhashBuilder(exprs: Seq[Expression]): Expression =
    exprs(1) match {
      case Literal(bits: Int, _) => SimHash64(exprs(0), bits)
      case other => throw new IllegalArgumentException(
        s"simhash64 bits must be an integer literal, got $other")
    }

  private val simhash64 = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => simhashBuilder(exprs))

  private def chunksBuilder(exprs: Seq[Expression]): Expression =
    (exprs(1), exprs(2)) match {
      case (Literal(w: Int, _), Literal(st: Int, _)) =>
        WordChunks(exprs(0), w, st)
      case other => throw new IllegalArgumentException(
        s"word_chunks width and stride must be integer literals, got $other")
    }

  private val wordChunks = (
    FunctionIdentifier("word_chunks"),
    new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
    (exprs: Seq[Expression]) => chunksBuilder(exprs))

  private val rollingHash = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (exprs: Seq[Expression]) => RollingHash(exprs(0)))

  private def spaceSavingBuilder(exprs: Seq[Expression]): Expression =
    exprs(1) match {
      case Literal(capacity: Int, _) =>
        SpaceSavingSketch(exprs(0), capacity).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"space_saving capacity must be an integer literal, got $other")
    }

  private val spaceSaving = (
    FunctionIdentifier("space_saving"),
    new ExpressionInfo(classOf[SpaceSavingSketch].getName, "space_saving"),
    (exprs: Seq[Expression]) => spaceSavingBuilder(exprs))

  /** Imperative registration for sessions built without the extension
    * (idempotent) — keeps library call sites working under any session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sketch", sketchBuilder, "built-in")
    reg.createOrReplaceTempFunction("space_saving", spaceSavingBuilder, "built-in")
    reg.createOrReplaceTempFunction("word_shingles", shinglesBuilder, "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", signatureBuilder, "built-in")
    reg.createOrReplaceTempFunction("simhash64", simhashBuilder, "built-in")
    reg.createOrReplaceTempFunction("word_chunks", chunksBuilder, "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs(0)), "built-in")
  }
}
