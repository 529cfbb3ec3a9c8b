package graft.model

import org.apache.spark.sql.functions.expr

/** Declarative schema files: the analogue of the reference's HCL surface
  * (dsl/schema.go:381-479 parses HCL; validation :213-250; loop :427-442).
  *
  * A schema document is JSON; transform/filter/save expressions are Spark
  * SQL expression strings compiled by Catalyst's parser — strictly more
  * expressive than the reference's HCL expression language (SURVEY §2.3
  * maps every HCL construct onto SQL expressions). Loop items stamp the
  * template per item with `${item}` substituted, reproducing the "{i}-{name}"
  * keying.
  *
  * Example:
  * {{{
  * {
  *   "variables": {"min_amount": "0"},
  *   "loop": ["ethereum", "arbitrum"],
  *   "queries": [{
  *     "name": "swaps",
  *     "chain": "${item}",
  *     "events": [{"signature": "purchase", "outputs": ["value"]}],
  *     "contracts": [1, 2, 3],
  *     "start_time": "2024-01-05", "end_time": "2024-01-25",
  *     "transforms": {"amount": "value / 100.0"},
  *     "filters": ["amount != ${min_amount}"],
  *     "saves": {"chain": "chain", "block": "blocknumber", "amount": "amount"}
  *   }]
  * }
  * }}}
  */
object JsonSchema {

  def parse(json: String): SchemaSpec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(json)

    // Variables may be scalars (string/number/bool → "${name}") or objects
    // ("${name.attr}") — the reference's cty values support both
    // (dsl/schema.go:40,55-58; schema-ideas.hcl object variables).
    val variables: Map[String, String] = ast \ "variables" match {
      case JObject(fs) => fs.flatMap {
        case (k, JObject(sub)) => sub.map { case (k2, v2) => s"$k.$k2" -> jString(v2) }
        case (k, v) => Seq(k -> jString(v))
      }.toMap
      case _ => Map.empty
    }
    // Loop items may be scalars ("${item}") or objects with attribute access
    // ("${item.chain}", "${item.address}") — reference loop decode binds the
    // whole cty item (dsl/schema.go:427-442; schema-ideas.hcl:111-122).
    val loopItems: Seq[JValue] = ast \ "loop" match {
      case JArray(xs) => xs
      case _ => Nil
    }

    def itemBindings(item: JValue): Map[String, String] = item match {
      case JObject(fs) => fs.map { case (k, v) => s"item.$k" -> jString(v) }.toMap
      case other => Map("item" -> jString(other))
    }

    def substitute(s: String, item: Option[JValue]): String = {
      val binds = variables ++ item.map(itemBindings).getOrElse(Map.empty)
      // "${item}" is a literal token — it never matches inside "${item.x}"
      // (the closing brace must follow immediately), so order is irrelevant.
      binds.foldLeft(s) { case (acc, (k, v)) => acc.replace("${" + k + "}", v) }
    }

    def buildQuery(q: JValue, item: Option[JValue]): QuerySpec = {
      def str(field: String): Option[String] =
        q \ field match { case JString(s) => Some(substitute(s, item)); case _ => None }
      // Method blocks (reference MethodSchema, dsl/schema.go:298-311):
      // name + outputs + optional block_offset (event-triggered calls only).
      def methods(v: JValue): Seq[MethodSpec] = v match {
        case JArray(xs) => xs.map { m =>
          MethodSpec(
            jString(m \ "name"),
            m \ "outputs" match { case JArray(os) => os.map(jString); case _ => Nil },
            m \ "block_offset" match { case JInt(i) => i.toLong; case _ => 0L })
        }
        case _ => Nil
      }
      def eventList(v: JValue): Seq[EventSpec] = v match {
        case JArray(xs) => xs.map { e =>
          EventSpec(substitute(jString(e \ "signature"), item),
            e \ "outputs" match { case JArray(os) => os.map(jString); case _ => Nil },
            methods = methods(e \ "methods"))
        }
        case _ => Nil
      }
      val events = eventList(q \ "events")
      val contractMethods = methods(q \ "methods")
      val blockInterval = q \ "block_interval" match {
        case JInt(i) => Some(i.toLong)
        case _ => None
      }
      // Contract entries are plain addresses (int/string) or objects with
      // contract-scoped transforms and optionally contract-scoped EVENTS:
      // {"address": 5, "transforms": {...}, "events": [...]} (reference
      // contract blocks, dsl/schema.go:276-292 — each contract declares its
      // own events; absent, the query-level event list applies).
      def exprMap(v: JValue): Seq[(String, org.apache.spark.sql.Column)] = v match {
        case JObject(fs) => fs.map { case (n, e) => n -> expr(substitute(jString(e), item)) }
        case _ => Nil
      }
      val contracts: Seq[(Long, Seq[(String, org.apache.spark.sql.Column)], Option[Seq[EventSpec]])] =
        q \ "contracts" match {
          case JArray(xs) => xs.map {
            case JInt(a) => (a.toLong, Nil, None)
            case obj: JObject =>
              val addr = obj \ "address" match {
                case JInt(a) => a.toLong
                case other => substitute(jString(other), item).toLong
              }
              val own = obj \ "events" match {
                case arr: JArray => Some(eventList(arr))
                case _ => None
              }
              (addr, exprMap(obj \ "transforms"), own)
            case other => (substitute(jString(other), item).toLong, Nil, None)
          }
          case _ => Nil
        }
      val transforms = q \ "transforms" match {
        case JObject(fs) => fs.map { case (n, e) => n -> expr(substitute(jString(e), item)) }
        case _ => Nil
      }
      val filters = q \ "filters" match {
        case JArray(xs) => xs.map(f => expr(substitute(jString(f), item)))
        case _ => Nil
      }
      val saves = q \ "saves" match {
        case JObject(fs) => fs.map { case (n, e) => n -> expr(substitute(jString(e), item)) }
        case _ => Nil
      }
      // Aggregate surface (reference roadmap "group by, sum, avg",
      // ROADMAP.md:77): "group_by" = key column names over the saved rows,
      // "aggregates" = name → SQL aggregate expression.
      val groupBy = q \ "group_by" match {
        case JArray(xs) => xs.map(jString)
        case _ => Nil
      }
      val aggregates = q \ "aggregates" match {
        case JObject(fs) => fs.map { case (n, e) => n -> expr(substitute(jString(e), item)) }
        case _ => Nil
      }
      QuerySpec(
        name = jString(q \ "name"),
        chain = str("chain").getOrElse("unknown"),
        contracts =
          if (contracts.isEmpty) Nil
          else contracts.map { case (a, ct, own) =>
            ContractSpec(a, events = own.getOrElse(events),
              methods = contractMethods, transforms = ct)
          },
        globalEvents = if (contracts.isEmpty) events else Nil,
        startTime = str("start_time"),
        endTime = str("end_time"),
        blockInterval = blockInterval,
        transforms = transforms,
        filters = filters,
        saves = saves,
        groupBy = groupBy,
        aggregates = aggregates)
    }

    val queryAsts = ast \ "queries" match {
      case JArray(xs) => xs
      case _ => Nil
    }
    val specs =
      if (loopItems.isEmpty) queryAsts.map(q => buildQuery(q, None))
      else queryAsts.flatMap { q =>
        Loop.expand(loopItems)((item, _) => buildQuery(q, Some(item)))
      }
    SchemaSpec(variables = variables, queries = specs)
  }

  private def jString(v: org.json4s.JValue): String = v match {
    case org.json4s.JString(s) => s
    case org.json4s.JInt(i) => i.toString
    case org.json4s.JDouble(d) => d.toString
    case org.json4s.JBool(b) => b.toString
    case other => throw new IllegalArgumentException(s"expected scalar, got $other")
  }
}
