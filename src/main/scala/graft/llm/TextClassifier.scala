package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s.{JArray, JDecimal, JDouble, JInt, JLong, JObject, JValue}
import org.json4s.jackson.JsonMethods

/** Imported hashed-bag-of-words linear text classifier — the fastText /
  * CCNet-style quality-filter shape (Joulin et al. 2016 "Bag of Tricks for
  * Efficient Text Classification"; CCNet and the LLaMA/RedPajama data
  * pipelines run exactly this as their corpus quality gate): each token
  * hashes into one of `dim` buckets, the document score is the sum of the
  * bucket weights plus a bias, and the keep decision is a threshold on the
  * score. The model is TRAINED elsewhere (any logistic/linear trainer over
  * hashed token counts exports to this JSON); this engine's job is applying
  * it to a 100 TB corpus, which is one narrow codegen'd expression — no
  * shuffle, no UDF, no model server.
  *
  * Cross-engine exactness contract (the same discipline as
  * [[graft.ops.PortableHash]] and the integer PageRank):
  *  - the token bucket is the first 16 bits of md5(token) mod `dim` —
  *    md5 is bit-identical in every engine, decoded by ascii position
  *    arithmetic (no `conv()`, which DuckDB 1.0 lacks);
  *  - weights, bias, and threshold are INTEGER MILLIUNITS, so the document
  *    score is an exact BIGINT sum — order-independent, no float
  *    accumulation to diverge between engines;
  *  - repeated tokens count once per occurrence (bag of words, not a set).
  *
  * JSON form (what a trainer exports):
  * {{{
  * {"dim": 64, "bias_milli": -1500, "threshold_milli": 0,
  *  "weights_milli": [210, -35, ...]}   // exactly dim entries
  * }}}
  */
final case class LinearTextModel(dim: Int, weightsMilli: Array[Long],
                                 biasMilli: Long, thresholdMilli: Long) {
  require(dim > 0 && weightsMilli.length == dim,
    s"LinearTextModel: weights_milli must have exactly dim=$dim entries, got ${weightsMilli.length}")
}

object LinearTextModel {

  private def asLong(v: JValue, what: String): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) if d.isWhole => d.toLong
    case JDecimal(d) if d.isWhole => d.toLong
    case other => throw new IllegalArgumentException(
      s"LinearTextModel: $what must be an integer, got $other")
  }

  /** Parse the JSON export; fails loudly — a silently truncated weight
    * vector would silently mis-score every document. */
  def fromJson(json: String): LinearTextModel = {
    val root = JsonMethods.parse(json) match {
      case o: JObject => o.obj.toMap
      case other => throw new IllegalArgumentException(
        s"LinearTextModel: expected a JSON object, got $other")
    }
    def req(k: String): JValue = root.getOrElse(k,
      throw new IllegalArgumentException(s"LinearTextModel: missing required key '$k'"))
    val dim = asLong(req("dim"), "dim").toInt
    val weights = req("weights_milli") match {
      case JArray(items) => items.map(asLong(_, "weights_milli entry")).toArray
      case other => throw new IllegalArgumentException(
        s"LinearTextModel: weights_milli must be an array, got $other")
    }
    LinearTextModel(dim, weights,
      asLong(req("bias_milli"), "bias_milli"),
      asLong(req("threshold_milli"), "threshold_milli"))
  }
}

object TextClassifier {

  /** Hex-nibble value of character `i` (1-based) of `h` (a lowercase md5
    * hex string) via ascii arithmetic — '0'-'9' → 0-9, 'a'-'f' → 10-15.
    * Pure built-ins on a lambda variable, so it composes inside
    * `transform`. */
  private def nibble(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    a - lit(48) - when(a >= lit(97), lit(39)).otherwise(lit(0))
  }

  /** First 16 bits of an ALREADY-COMPUTED lowercase md5 hex digest as an int
    * in [0, 65536). Split out from [[md5Bits16]] so callers inside
    * higher-order lambdas can bind the digest once: lambda bodies are
    * evaluated interpreted per element with NO common-subexpression
    * elimination, so an inlined `md5(t)` re-hashes the token once per
    * reference — 8× per token in the old scoreMilli (2 ascii probes × 4
    * nibbles), measured as most of q_text_classifier's wall time. */
  private def bits16OfDigest(h: Column): Column =
    nibble(h, 1) * lit(4096) + nibble(h, 2) * lit(256) +
      nibble(h, 3) * lit(16) + nibble(h, 4)

  /** First 16 bits of md5(c) as an int in [0, 65536) — the Column-lambda
    * twin of [[graft.ops.PortableHash.md5Bits16]]. */
  def md5Bits16(c: Column): Column = bits16OfDigest(md5(c))

  /** Exact BIGINT document score in milliunits: bias + Σ over tokens of
    * weights[md5Bits16(token) mod dim]. One narrow expression — zero
    * shuffle, scales as a map over any corpus size. The token digest is
    * computed ONCE in an inner transform and the weight lookup folds over
    * the digest array, so each token is md5-hashed exactly once (identical
    * values — same digest, same nibble arithmetic, same left-fold order). */
  def scoreMilli(text: Column, model: LinearTextModel): Column = {
    val weightsLit = typedLit(model.weightsMilli.toSeq)
    aggregate(
      transform(split(text, " "), t => md5(t)),
      lit(model.biasMilli),
      (acc, h) => acc + element_at(weightsLit,
        (pmod(bits16OfDigest(h), lit(model.dim)) + lit(1)).cast("int")))
  }

  /** Apply the classifier: (idCol, score_milli, keep). `keep` is the
    * integer-exact threshold decision a corpus filter consumes. */
  def classify(docs: DataFrame, textCol: String, idCol: String,
               model: LinearTextModel): DataFrame =
    docs.select(col(idCol),
      scoreMilli(col(textCol), model).as("score_milli"))
      .withColumn("keep", col("score_milli") >= lit(model.thresholdMilli))
}
