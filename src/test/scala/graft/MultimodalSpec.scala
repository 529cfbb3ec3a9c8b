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

  test("binary payload column is real binary with correct byte length") {
    val r = Tables.documents(spark, sf)
      .select(col("text"), encode(col("text"), "UTF-8").as("payload"))
      .head()
    assert(r.getAs[Array[Byte]]("payload").length == r.getString(0).getBytes("UTF-8").length)
  }
}
