package graft

import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payload column survives the typed
  * path, and the stub decoder's features match a driver-side
  * recomputation from the raw text bytes.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  test("asset payload is a real binary column") {
    val schema = llm.Multimodal.assets(spark, SF).toDF().schema
    assert(schema("payload").dataType == BinaryType)
  }

  test("stub decoder features match driver-side recomputation") {
    val texts = T.t(spark, SF, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val feats = llm.Multimodal.mmFeatures(spark, SF)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(feats.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val sampled = bytes.indices.by(64)
      val want = (bytes.length, sampled.size, bytes(0) & 0xFF,
        sampled.map(i => (bytes(i) & 0xFF).toLong).sum)
      assert(feats(id) == want, s"doc $id")
    }
  }

  test("metadata grouping covers all assets") {
    val total = llm.Multimodal.mmMeta(spark, SF)
      .agg(org.apache.spark.sql.functions.sum($"cnt")).collect()(0).getLong(0)
    assert(total == T.t(spark, SF, "documents").count())
  }
}
