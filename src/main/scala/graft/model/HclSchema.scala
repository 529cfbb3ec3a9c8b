package graft.model

/** HCL schema-file surface: converts the reference's `.hcl` schema dialect
  * (/root/reference/schema.example.hcl, /root/reference/test/schema.hcl;
  * parser /root/reference/dsl/schema.go:381-479) into the JSON dialect and
  * hands it to [[JsonSchema.parse]] — so a reference user's schema file runs
  * unmodified: `HclSchema.parse(Files.readString(path))`.
  *
  * Supported constructs (everything the reference's own example schemas use):
  * top-level `start_time`/`end_time` (incl. `format_date(goLayout, s)`
  * folding and `end_time = now` → unbounded), `variables = {...}` with
  * literal folding of upper/lower/format_date, `loop { items = [...] }`
  * with `item` binding, `query` blocks with `chain`, `contract` blocks
  * (`address`, `event NAME { outputs }`, `transform`, `method NAME`),
  * query-level (global) `event` blocks, `filter = [...]`, `save {...}`,
  * `block_interval`, `method` blocks with `block_offset`.
  *
  * Expression translation (HCL → Spark SQL): `c ? a : b` → `IF(c, a, b)`
  * (nesting-aware), `&&`/`||` → `AND`/`OR`, variable references → `${var}`
  * substitution markers, `item`/`item.x` → `${item}`/`${item.x}`.
  * parse_decimals/format_date stay by name — they are registered SQL
  * functions ([[graft.functions.GraftFunctions]]).
  *
  * Testbed column mapping (FIXTURES §C): declared event outputs that are not
  * testbed columns read from the log payload as
  * `CAST(get_json_object(props, '$.<name>') AS DOUBLE)` — the decoded-field
  * lookup a live source does from ABI-decoded data (absent fields flow as
  * null, exactly like decoding a log whose ABI lacks the field). The
  * `tx_hash` save-context variable is synthesized deterministically from
  * (blocknumber, contract); `abi` attributes are accepted and recorded but
  * decode in the testbed is by signature. 0x-hex contract addresses fold
  * into the int64 key space of the testbed store (a live DSv2 source keys by
  * the raw address string). Contract-scoped `event` blocks union into the
  * query's event list (per-contract event scoping is available in the Scala
  * DSL; the file dialect scopes transforms per contract, events per query).
  */
object HclSchema {

  // ---------- structural mini-parser (attrs + nested blocks) ----------

  private final case class Body(
      attrs: Seq[(String, String)], // name -> raw value text (may be [..] or {..})
      blocks: Seq[(String, Option[String], Body)]) // kind, label, body

  private def stripComments(s: String): String =
    s.linesIterator.map { line =>
      // cut // and # outside string literals
      var inStr = false
      val sb = new StringBuilder
      var i = 0
      var done = false
      while (i < line.length && !done) {
        val c = line.charAt(i)
        if (inStr) { if (c == '"') inStr = false; sb.append(c) }
        else if (c == '"') { inStr = true; sb.append(c) }
        else if (c == '#' || (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')) done = true
        else sb.append(c)
        i += 1
      }
      sb.toString
    }.mkString("\n")

  /** Parse a block body from `s` starting at `from`; returns (body, next). */
  private def parseBody(s: String, from: Int, topLevel: Boolean): (Body, Int) = {
    val attrs = Seq.newBuilder[(String, String)]
    val blocks = Seq.newBuilder[(String, Option[String], Body)]
    var i = from
    def skipWs(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    skipWs()
    while (i < s.length && s.charAt(i) != '}') {
      val idStart = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      val ident = s.substring(idStart, i)
      require(ident.nonEmpty, s"hcl: expected identifier at offset $i")
      skipWs()
      if (i < s.length && s.charAt(i) == '=') {
        i += 1
        // value: scan to end of line, but balance []/{} across lines
        var depth = 0
        var inStr = false
        val vStart = { skipWs(); i }
        var done = false
        while (i < s.length && !done) {
          val c = s.charAt(i)
          if (inStr) { if (c == '"') inStr = false }
          else c match {
            case '"' => inStr = true
            case '[' | '{' => depth += 1
            // an UNMATCHED '}' closes the enclosing block (one-line blocks:
            // `event e { outputs = [...] }`) — terminate without consuming
            case '}' if depth == 0 => done = true
            case ']' | '}' => depth -= 1
            case '\n' if depth == 0 => done = true
            case _ => ()
          }
          if (!done) i += 1
        }
        attrs += ident -> s.substring(vStart, i).trim
      } else {
        // block: optional label identifier, then '{'
        val label =
          if (i < s.length && s.charAt(i) != '{') {
            val lStart = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            val l = s.substring(lStart, i)
            skipWs()
            Some(l)
          } else None
        require(i < s.length && s.charAt(i) == '{', s"hcl: expected '{' after $ident at offset $i")
        i += 1
        val (body, next) = parseBody(s, i, topLevel = false)
        require(next < s.length && s.charAt(next) == '}', s"hcl: unterminated block $ident")
        i = next + 1
        blocks += ((ident, label.filter(_.nonEmpty), body))
      }
      skipWs()
    }
    (Body(attrs.result(), blocks.result()), i)
  }

  // ---------- expression translation ----------

  /** HCL ternary `c ? a : b` → `IF(c, a, b)`, nesting- and string-aware. */
  private[graft] def rewriteTernary(s: String): String = {
    var depth = 0; var i = 0; var q = -1; var inStr = false
    while (i < s.length && q < 0) {
      val c = s.charAt(i)
      if (inStr) { if (c == '"' || c == '\'') inStr = false }
      else c match {
        case '"' | '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '?' if depth == 0 => q = i
        case _ => ()
      }
      i += 1
    }
    if (q < 0) return rewriteInsideParens(s)
    var nest = 0; var colon = -1
    depth = 0; inStr = false; i = q + 1
    while (i < s.length && colon < 0) {
      val c = s.charAt(i)
      if (inStr) { if (c == '"' || c == '\'') inStr = false }
      else c match {
        case '"' | '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '?' if depth == 0 => nest += 1
        case ':' if depth == 0 => if (nest == 0) colon = i else nest -= 1
        case _ => ()
      }
      i += 1
    }
    require(colon > 0, s"hcl: unterminated ternary in: $s")
    val cond = rewriteTernary(s.substring(0, q)).trim
    val t = rewriteTernary(s.substring(q + 1, colon)).trim
    val f = rewriteTernary(s.substring(colon + 1)).trim
    s"IF($cond, $t, $f)"
  }

  /** No top-level ternary: still rewrite ternaries INSIDE each top-level
    * parenthesized group, e.g. `a ? (x ? y : z) : c`'s true-branch. */
  private def rewriteInsideParens(s: String): String = {
    val out = new StringBuilder
    var i = 0; var inStr = false; var quote = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { out.append(c); if (c == quote) inStr = false; i += 1 }
      else if (c == '"' || c == '\'') { out.append(c); inStr = true; quote = c; i += 1 }
      else if (c == '(') {
        var depth = 1; var j = i + 1; var ins = false; var qt = ' '
        while (j < s.length && depth > 0) {
          val d = s.charAt(j)
          if (ins) { if (d == qt) ins = false }
          else if (d == '"' || d == '\'') { ins = true; qt = d }
          else if (d == '(') depth += 1
          else if (d == ')') depth -= 1
          j += 1
        }
        require(depth == 0, s"hcl: unbalanced parens in: $s")
        out.append('(').append(rewriteTernary(s.substring(i + 1, j - 1))).append(')')
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Apply `f` to the non-string-literal segments of an expression. */
  private def mapOutsideStrings(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inStr = false
    var quote = ' '
    s.foreach { c =>
      if (inStr) { out.append(c); if (c == quote) inStr = false }
      else if (c == '"' || c == '\'') { out.append(f(seg.toString)); seg.clear(); out.append(c); inStr = true; quote = c }
      else seg.append(c)
    }
    out.append(f(seg.toString))
    out.toString
  }

  private def replaceToken(s: String, token: String, replacement: String): String =
    mapOutsideStrings(s)(_.replaceAll("\\b" + java.util.regex.Pattern.quote(token) + "\\b",
      java.util.regex.Matcher.quoteReplacement(replacement)))

  /** Full HCL-expression → Spark-SQL-expression translation. */
  private def toSql(raw: String, outputs: Set[String], varNames: Set[String]): String = {
    var e = rewriteTernary(raw.trim)
    e = mapOutsideStrings(e)(_.replace("&&", " AND ").replace("||", " OR "))
    // HCL string literals are double-quoted; Spark SQL wants single quotes
    // (double quotes would parse as identifiers under default ANSI settings).
    e = e.replace("\"", "'")
    for (o <- outputs)
      e = replaceToken(e, o, s"CAST(get_json_object(props, '$$.$o') AS DOUBLE)")
    for (v <- varNames)
      e = replaceToken(e, v, "${" + v + "}")
    e = replaceToken(e, "item", "${item}")
    e = mapOutsideStrings(e)(_.replaceAll("\\$\\{item\\}\\.(\\w+)", "\\${item.$1}"))
    // save-context tx_hash: deterministic synthetic (no tx hashes in the
    // testbed store; a live source supplies the real column)
    e = replaceToken(e, "tx_hash",
      "md5(concat(CAST(blocknumber AS STRING), '-', CAST(contract_address AS STRING)))")
    e
  }

  // ---------- literal folding (variables, start/end time) ----------

  private val QuotedRe = """^"(.*)"$""".r
  private val UpperRe = """^upper\(\s*"(.*)"\s*\)$""".r
  private val LowerRe = """^lower\(\s*"(.*)"\s*\)$""".r
  private val FormatDateRe = """^format_date\(\s*"(.*)"\s*,\s*"(.*)"\s*\)$""".r

  /** Fold a variable/time value to a plain string at schema-load time — the
    * reference evaluates these with cty at load (dsl/schema.go:372). Returns
    * None for `now` (callers treat it as "unbounded"). */
  private[graft] def foldLiteral(raw: String): Option[String] = raw.trim match {
    case "now" => None
    case QuotedRe(s) => Some(s)
    case UpperRe(s) => Some(s.toUpperCase)
    case LowerRe(s) => Some(s.toLowerCase)
    case FormatDateRe(layout, value) =>
      import java.time.format.DateTimeFormatter
      import java.time.{LocalDate, LocalDateTime}
      val pattern = graft.engine.Functions.goLayoutToJava(layout)
      val fmt = DateTimeFormatter.ofPattern(pattern)
      val dt =
        if (pattern.exists("Hms".contains(_))) LocalDateTime.parse(value, fmt)
        else LocalDate.parse(value, fmt).atStartOfDay()
      Some(dt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
    case other => Some(other) // numbers and bare literals pass through
  }

  /** 0x-hex contract address → the testbed store's int64 key space (low 62
    * bits — deterministic; a live DSv2 source keys by the raw string). */
  private[graft] def addressToLong(a: String): Long = {
    val t = a.trim.stripPrefix("\"").stripSuffix("\"")
    if (t.startsWith("0x") || t.startsWith("0X"))
      (BigInt(t.drop(2), 16) & BigInt("3fffffffffffffff", 16)).toLong
    else t.toLong
  }

  // ---------- assembly ----------

  def parse(hcl: String): SchemaSpec =
    toJsonDocs(hcl).map(JsonSchema.parse)
      .reduceOption((a, b) => SchemaSpec(a.variables ++ b.variables, a.queries ++ b.queries))
      .getOrElse(SchemaSpec())

  /** The JSON-dialect document equivalent to `hcl` (exposed for tests).
    * Schemas mixing a loop block with standalone queries convert to TWO
    * documents — use [[parse]] for those. */
  def toJson(hcl: String): String = {
    val docs = toJsonDocs(hcl)
    require(docs.size == 1,
      "hcl: schema mixes loop and standalone queries — HclSchema.parse handles both")
    docs.head
  }

  /** One JSON document per loop scope (loop queries are stamped per item;
    * standalone queries must not be). */
  private def toJsonDocs(hcl: String): Seq[String] = {
    import org.json4s.JsonDSL._
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    val (top, _) = parseBody(stripComments(hcl), 0, topLevel = true)

    // variables: folded at load; stored as SQL string literals so `${name}`
    // substitution inside expressions yields a literal, not an identifier
    val varEntries: Seq[(String, String)] = top.attrs.collect { case ("variables", v) =>
      require(v.startsWith("{"), s"hcl: variables must be a map, got $v")
      val (body, _) = parseBody(v.drop(1), 0, topLevel = false)
      body.attrs.map { case (k, raw) =>
        k -> foldLiteral(raw).map(s => s"'$s'").getOrElse(
          sys.error(s"hcl: variable $k cannot be `now`"))
      }
    }.flatten
    val varNames = varEntries.map(_._1).toSet

    val startTime = top.attrs.collectFirst { case ("start_time", v) => foldLiteral(v) }.flatten
    val endTime = top.attrs.collectFirst { case ("end_time", v) => foldLiteral(v) }.flatten

    def parseArr(v: String): Seq[String] = {
      require(v.startsWith("[") && v.endsWith("]"), s"hcl: expected a list, got $v")
      val inner = v.substring(1, v.length - 1)
      // split top-level commas
      val items = Seq.newBuilder[String]
      var depth = 0; var inStr = false; val cur = new StringBuilder
      inner.foreach { c =>
        if (inStr) { cur.append(c); if (c == '"') inStr = false }
        else c match {
          case '"' => inStr = true; cur.append(c)
          case '(' | '[' | '{' => depth += 1; cur.append(c)
          case ')' | ']' | '}' => depth -= 1; cur.append(c)
          case ',' if depth == 0 => items += cur.toString; cur.clear()
          case _ => cur.append(c)
        }
      }
      if (cur.toString.trim.nonEmpty) items += cur.toString
      items.result().map(_.trim).filter(_.nonEmpty)
    }

    def unquote(s: String): String = s.trim match {
      case QuotedRe(x) => x
      case x => x
    }

    def methodsOf(body: Body): Seq[JObject] = body.blocks.collect {
      case ("method", Some(name), mb) =>
        val base: JObject =
          ("name" -> name) ~
            ("outputs" -> mb.attrs.collectFirst { case ("outputs", v) => parseArr(v).map(unquote) }
              .getOrElse(Seq.empty[String]))
        mb.attrs.collectFirst { case ("block_offset", v) => v.trim.toLong }
          .fold(base)(off => base ~ ("block_offset" -> off))
    }

    def eventsOf(body: Body, outputsAcc: scala.collection.mutable.Set[String]): Seq[JObject] =
      body.blocks.collect { case ("event", Some(sig), eb) =>
        val outs = eb.attrs.collectFirst { case ("outputs", v) => parseArr(v).map(unquote) }
          .getOrElse(Seq.empty[String])
        outputsAcc ++= outs
        val base: JObject = ("signature" -> sig) ~ ("outputs" -> outs)
        val ms = methodsOf(eb)
        if (ms.isEmpty) base else base ~ ("methods" -> ms)
      }

    def buildQuery(name: String, qb: Body): JObject = {
      // testbed columns that must never be rewritten to payload lookups
      val native = Set("value", "props", "event_id", "ts", "user_id", "event_type",
        "chain", "blocknumber", "timestamp", "contract_address", "tx_hash",
        "sample_ts", "item")
      val declaredOutputs = scala.collection.mutable.Set.empty[String]
      val globalEvents = eventsOf(qb, declaredOutputs)
      val contracts = qb.blocks.collect { case ("contract", _, cb) =>
        val addr = cb.attrs.collectFirst { case ("address", v) => addressToLong(v) }
          .getOrElse(sys.error(s"hcl: contract block in query $name lacks address"))
        (addr, cb, eventsOf(cb, declaredOutputs), methodsOf(cb))
      }
      val outputs = declaredOutputs.toSet -- native
      def sql(e: String): String = toSql(e, outputs, varNames)

      val contractJson: Seq[JObject] = contracts.map { case (addr, cb, ownEvents, _) =>
        val transforms: Seq[(String, String)] = cb.blocks.collect {
          case ("transform", _, tb) => tb.attrs.map { case (k, v) => k -> sql(v) }
        }.flatten
        var base: JObject = JObject("address" -> JInt(addr))
        if (transforms.nonEmpty)
          base = base ~ ("transforms" -> JObject(transforms.map { case (k, v) => k -> (JString(v): JValue) }.toList))
        // contract-scoped events stay ON the contract (reference semantics:
        // each contract declares its own events) — the JSON dialect's
        // per-contract "events" list carries them through
        if (ownEvents.nonEmpty) base = base ~ ("events" -> JArray(ownEvents.toList))
        base
      }
      // query-level (bare) event blocks: global when no contracts declared;
      // with contracts present they act as the default event list for
      // contracts without their own (JsonSchema fallback semantics)
      val allEvents = globalEvents
      val contractMethods = contracts.flatMap(_._4)
      val queryTransforms: Seq[(String, String)] = qb.blocks.collect {
        case ("transform", _, tb) => tb.attrs.map { case (k, v) => k -> sql(v) }
      }.flatten
      val filters = qb.attrs.collectFirst { case ("filter", v) => parseArr(v).map(sql) }
        .getOrElse(Nil)
      val saves: Seq[(String, String)] = qb.blocks.collect {
        case ("save", _, sb) => sb.attrs.map { case (k, v) => k -> sql(v) }
      }.flatten
      val chain = qb.attrs.collectFirst { case ("chain", v) =>
        val c = unquote(v)
        if (c == "item") "${item}" else c
      }.getOrElse("unknown")

      var q: JObject = ("name" -> name) ~ ("chain" -> chain)
      startTime.foreach(t => q = q ~ ("start_time" -> t))
      endTime.foreach(t => q = q ~ ("end_time" -> t))
      qb.attrs.collectFirst { case ("block_interval", v) => v.trim.toLong }
        .foreach(bi => q = q ~ ("block_interval" -> bi))
      if (allEvents.nonEmpty) q = q ~ ("events" -> allEvents)
      if (contractJson.nonEmpty) q = q ~ ("contracts" -> JArray(contractJson.toList))
      if (contractMethods.nonEmpty) q = q ~ ("methods" -> contractMethods)
      if (queryTransforms.nonEmpty)
        q = q ~ ("transforms" -> JObject(queryTransforms.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      if (filters.nonEmpty) q = q ~ ("filters" -> filters)
      q = q ~ ("saves" -> JObject(saves.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      q
    }

    // loop { items, query ... } — ONLY the queries declared INSIDE the loop
    // block are stamped per item (dsl/schema.go:427-442); standalone queries
    // go to a separate loop-free document, since the JSON dialect's `loop`
    // applies to every query in its document.
    val loopBlock = top.blocks.collectFirst { case ("loop", _, lb) => lb }
    val loopItems: Seq[String] = loopBlock.toSeq.flatMap(lb =>
      lb.attrs.collectFirst { case ("items", v) => parseArr(v).map(unquote) }.getOrElse(Nil))
    val loopQueries: Seq[(String, Body)] = loopBlock.toSeq.flatMap(_.blocks).collect {
      case ("query", Some(n), qb) => (n, qb)
    }
    val plainQueries: Seq[(String, Body)] = top.blocks.collect {
      case ("query", Some(n), qb) => (n, qb)
    }

    def doc(items: Seq[String], queries: Seq[(String, Body)]): String = {
      var d: JObject = JObject()
      if (varEntries.nonEmpty)
        d = d ~ ("variables" -> JObject(varEntries.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      if (items.nonEmpty) d = d ~ ("loop" -> items)
      d = d ~ ("queries" -> queries.map { case (n, qb) => buildQuery(n, qb) })
      JsonMethods.compact(JsonMethods.render(d))
    }

    (if (loopQueries.nonEmpty) Seq(doc(loopItems, loopQueries)) else Nil) ++
      (if (plainQueries.nonEmpty || loopQueries.isEmpty) Seq(doc(Nil, plainQueries)) else Nil)
  }
}
