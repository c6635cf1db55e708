package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s.{JArray, JDecimal, JDouble, JInt, JLong, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

/** Learned pair-classifier ingestion — the open-format half of E9
  * (reference `examples/data/model` `.model` files, `learner.py:15-119`).
  *
  * The reference's trained dedupe artifacts are Python pickles, unreadable
  * from the JVM by design; their CONTENT, though, is only a regularized
  * logistic classifier — per-field weights, a bias, a decision threshold —
  * plus the field comparator kinds. dedupe exposes all of it
  * (`deduper.classifier.weights` / `.bias`, `deduper.data_model`), so a
  * one-line Python export produces this JSON form and the clusters become
  * replayable here:
  *
  * {{{
  * {"bias": -1.25, "threshold": 0.5,
  *  "fields": [
  *    {"name": "full_name",  "kind": "string_dist", "weight": 2.0},
  *    {"name": "first_token", "kind": "exact",      "weight": 0.75}]}
  * }}}
  *
  * Kinds map to [[DedupeField.Kind]]: `exact`, `string_dist`, `affine_gap`
  * (dedupe's actual comparator family — the native codegen'd expression).
  *
  * A fixture extracted from the reference's actual trained artifact
  * (`examples/data/model/requirement.model`, a sequential pickle of
  * DataModel + fitted sklearn classifier + predicates) is committed at
  * `src/test/resources/requirement_model_export.json` and replayed
  * end-to-end (block→pair→score→cluster) in ErSpec.
  *
  * Scoring contract: the classifier is applied in its LINEAR form,
  * margin = bias + Σ wᵢ·simᵢ, and the threshold (a probability) becomes the
  * equivalent margin cut logit(p) = ln(p/(1−p)). The sigmoid is monotone, so
  * the selected pairs are exactly dedupe's — but the margin is pure
  * fixed-order IEEE adds/multiplies, bit-reproducible on any engine, where
  * the sigmoid's `exp` may differ in the last ulp between libm
  * implementations (see [[Scoring.logistic]]'s caveat).
  */
final case class DedupeModel(fields: Seq[DedupeField], bias: Double, threshold: Double) {

  /** Margin cut equivalent to P(match) > threshold. */
  def marginCut: Double = math.log(threshold / (1.0 - threshold))

  /** Linear classifier margin over an entity-pair row (`a_` / `b_` columns),
    * evaluated in field order then bias — the fixed order the oracle
    * reproduces. */
  def margin: Column =
    fields.map(f =>
      DedupeField.similarity(f, col(s"a_${f.name}"), col(s"b_${f.name}")) * lit(f.weight))
      .reduceLeft(_ + _) + lit(bias)

  /** E4 with the imported model: score the entity map, keep pairs whose
    * margin clears the cut — (from, to, score), score = the margin. */
  def selectPairs(entityMap: DataFrame): DataFrame =
    entityMap
      .withColumn("score", margin)
      .filter(col("score") > lit(marginCut))
      .select(col("a_node_id").as("from"), col("b_node_id").as("to"), col("score"))
}

object DedupeModel {

  private def asDouble(v: JValue, what: String): Double = v match {
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case other => throw new IllegalArgumentException(
      s"DedupeModel: $what must be a number, got $other")
  }

  private def kindOf(s: String): DedupeField.Kind = s match {
    case "exact" => DedupeField.Exact
    case "string_dist" => DedupeField.StringDist
    case "affine_gap" => DedupeField.AffineGap
    case other => throw new IllegalArgumentException(
      s"DedupeModel: unknown field kind '$other' (expected exact|string_dist|affine_gap)")
  }

  /** Parse the JSON form. Fails loudly on a malformed document — a model
    * import that silently drops a field would silently change every
    * downstream cluster. */
  def fromJson(json: String): DedupeModel = {
    val root = JsonMethods.parse(json) match {
      case o: JObject => o.obj.toMap
      case other => throw new IllegalArgumentException(
        s"DedupeModel: expected a JSON object, got $other")
    }
    def req(k: String): JValue = root.getOrElse(k,
      throw new IllegalArgumentException(s"DedupeModel: missing required key '$k'"))
    val fields = req("fields") match {
      case JArray(items) if items.nonEmpty => items.map {
        case f: JObject =>
          val m = f.obj.toMap
          def freq(k: String): JValue = m.getOrElse(k,
            throw new IllegalArgumentException(s"DedupeModel: field missing '$k'"))
          val name = freq("name") match {
            case JString(n) => n
            case other => throw new IllegalArgumentException(
              s"DedupeModel: field name must be a string, got $other")
          }
          val kind = freq("kind") match {
            case JString(s) => kindOf(s)
            case other => throw new IllegalArgumentException(
              s"DedupeModel: field kind must be a string, got $other")
          }
          DedupeField(name, kind, asDouble(freq("weight"), s"weight of '$name'"))
        case other => throw new IllegalArgumentException(
          s"DedupeModel: each field must be an object, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "DedupeModel: 'fields' must be a non-empty array")
    }
    val threshold = asDouble(req("threshold"), "threshold")
    require(threshold > 0.0 && threshold < 1.0,
      s"DedupeModel: threshold must be in (0,1), got $threshold")
    DedupeModel(fields, asDouble(req("bias"), "bias"), threshold)
  }
}
