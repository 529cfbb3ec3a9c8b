package graft

import graft.ext.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeBatched (mapPartitions stub) agrees with the expression-form metadata") {
    val viaBatches = MultimodalOps.decodeBatched(Tables.documents(spark, sf), batchSize = 16)
      .select("doc_id", "nbytes", "width", "height")
    val viaExprs = Tables.documents(spark, sf)
      .withColumn("nbytes", octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .select(col("doc_id"), col("nbytes"),
        (lit(64L) + col("nbytes") % 576L).as("width"),
        (lit(64L) + (col("nbytes") * 7L) % 416L).as("height"))
    assert(viaBatches.except(viaExprs).count() == 0)
    assert(viaBatches.count() == viaExprs.count())
  }

  test("batched path also resizes (letterboxed) and extracts features") {
    val got = MultimodalOps.decodeBatched(Tables.documents(spark, sf), batchSize = 8)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rw, rh) = (r.getAs[Long]("resized_w"), r.getAs[Long]("resized_h"))
      assert(rw <= 224 && rh <= 224 && (rw == 224 || rh == 224)) // letterbox hits one edge
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 8 && f.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("binary payload column is real binary with correct byte length") {
    val r = Tables.documents(spark, sf)
      .select(col("text"), encode(col("text"), "UTF-8").as("payload"))
      .head()
    assert(r.getAs[Array[Byte]]("payload").length == r.getString(0).getBytes("UTF-8").length)
  }
}
