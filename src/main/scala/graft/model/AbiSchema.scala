package graft.model

import graft.functions.Evm
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** abi.json → schema + decode projections (SURVEY §1.2 / §2.2 R1).
  *
  * The reference loads the contract ABI per event and unpacks logs with it
  * (dsl/schema.go:446-476 ABI load; chainservice/events.go:410-484 decode:
  * indexed inputs come from topics[1..], non-indexed from consecutive data
  * words). This model reproduces exactly that column derivation as Catalyst
  * expressions.
  *
  * Type mapping (generate/utils.go:19-50 + SURVEY §1.2): uintN/intN →
  * DecimalType(38,0); address → StringType (lowercase 0x hex); bool →
  * BooleanType; string/bytesN → StringType (hex passthrough).
  */
final case class AbiInput(name: String, solType: String, indexed: Boolean) {
  def sparkType: DataType = solType match {
    case t if t.startsWith("uint") || t.startsWith("int") => DecimalType(38, 0)
    case "address" => StringType
    case "bool" => BooleanType
    case _ => StringType
  }

  def decode(word: Column): Column = solType match {
    case t if t.startsWith("uint") => Evm.uint(word)
    case t if t.startsWith("int") => Evm.int(word)
    case "address" => Evm.address(word)
    case "bool" => Evm.bool(word)
    case _ => word
  }
}

final case class AbiEvent(name: String, inputs: Seq[AbiInput]) {
  def structType: StructType =
    StructType(inputs.map(i => StructField(i.name, i.sparkType)))

  /** Decode projections for a log row: `topics` an array<string> column
    * (topic 0 = signature), `data` the concatenated non-indexed words.
    * Indexed inputs read topics[1..] in declaration order; non-indexed
    * inputs read consecutive data words — events.go:436-476 exactly. */
  def decodeColumns(topics: Column, data: Column): Seq[(String, Column)] = {
    var topicIdx = 1
    var wordIdx = 0
    inputs.map { in =>
      val raw = if (in.indexed) {
        val c = element_at(topics, topicIdx + 1); topicIdx += 1; c
      } else {
        val c = Evm.word(data, wordIdx); wordIdx += 1; c
      }
      in.name -> in.decode(raw)
    }
  }

  def decodeLog(df: DataFrame, topicsCol: String, dataCol: String): DataFrame =
    decodeColumns(col(topicsCol), col(dataCol)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
}

object AbiSchema {

  /** Parse the events out of an abi.json document (json4s ships with Spark).
    * Methods' outputs use the same input-shape, so they decode with the same
    * machinery (R2, matchABIValue chainservice/utils.go:24-36). */
  def parse(abiJson: String): Seq[AbiEvent] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(abiJson)
    for {
      JArray(entries) <- Seq(ast)
      entry @ JObject(_) <- entries
      if (entry \ "type") == JString("event")
      JString(name) = entry \ "name": @unchecked
    } yield {
      val ins = (entry \ "inputs") match {
        case JArray(xs) => xs.map { in =>
          val JString(n) = in \ "name": @unchecked
          val JString(t) = in \ "type": @unchecked
          val indexed = (in \ "indexed") == JBool(true)
          AbiInput(n, t, indexed)
        }
        case _ => Nil
      }
      AbiEvent(name, ins)
    }
  }
}
