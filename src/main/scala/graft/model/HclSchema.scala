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
  * `block_interval`, `method` blocks with `block_offset`, and top-level
  * `function "name" { params = [..] body = .. }` definitions (ROADMAP v1.1
  * #DEFINE — macro-expanded into every expression, see [[expandMacros]]).
  * Block labels may be bare or quoted.
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
  * into the int64 key space of the testbed store (a live DSv2 source keys
  * by the raw address string; folding fails loud if two declared addresses
  * collide into one key). Contract-scoped `event` blocks stay scoped TO
  * their declaring contract (an event under contract A never captures
  * contract B's address — the 'contract-scoped events stay scoped' fixture
  * locks this); bare query-level `event` blocks are global.
  */
object HclSchema {

  // ---------- structural mini-parser (attrs + nested blocks) ----------

  private final case class Body(
      attrs: Seq[(String, String)], // name -> raw value text (may be [..] or {..})
      blocks: Seq[(String, Option[String], Body)]) // kind, label, body

  private val HeredocOpenRe = """.*=\s*<<-?\s*(\w+)\s*$""".r

  private def stripComments(s: String): String = {
    // heredoc bodies pass through VERBATIM — a '#' or '//' inside one is
    // content, not a comment
    var heredoc: Option[String] = None
    s.linesIterator.map { line =>
      heredoc match {
        case Some(m) =>
          if (line.trim == m) heredoc = None
          line
        case None =>
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
          val out = sb.toString
          out match {
            case HeredocOpenRe(m) => heredoc = Some(m)
            case _ => ()
          }
          out
      }
    }.mkString("\n")
  }

  /** "line L, col C" for an offset into the parsed text — parse errors must
    * point a reference user at the offending expression, not a character
    * count (stripComments preserves line structure, so lines match the
    * user's file). */
  private[graft] def lineCol(s: String, off: Int): String = {
    val upTo = s.substring(0, math.min(off, s.length))
    val line = upTo.count(_ == '\n') + 1
    val col = off - upTo.lastIndexOf('\n') // lastIndexOf = -1 on line 1 → 1-based col
    s"line $line, col $col"
  }

  /** Unsupported-construct detection at VALUE-scan time, where the offset
    * is still known: hclsyntax `for` expressions (`[for x in xs : ...]` /
    * `{for k, v in m : ...}`) and splat expressions (`xs[*].attr` /
    * `xs.*.attr`) ARE evaluated in `variables` values and loop `items`
    * (resolveItems, plan-construction time — r7); in every OTHER context
    * they stay outside the dialect — fail loud WITH position instead of
    * letting the expression translator produce a downstream error that
    * lost it. */
  private def rejectUnsupported(s: String, vStart: Int, vEnd: Int, ident: String): Unit = {
    var i = vStart
    var inStr = false; var qc = ' '
    def fail(what: String, at: Int): Nothing = throw new IllegalArgumentException(
      s"hcl: unsupported HCL construct ($what) in value of `$ident` at ${lineCol(s, at)} — " +
        "this dialect covers the reference's schema surface; rewrite the expression " +
        "without for/splat (e.g. declare the projection in a save/transform block)")
    while (i < vEnd) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < vEnd) i += 1
        else if (c == qc) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; qc = c
        case '<' if i + 1 < vEnd && s.charAt(i + 1) == '<' =>
          // heredoc inside a value is raw TEXT — skip to its closing marker
          i += 2
          if (i < vEnd && s.charAt(i) == '-') i += 1
          val mStart = i
          while (i < vEnd && s.charAt(i) != '\n') i += 1
          val m = s.substring(mStart, i).trim
          var hClosed = m.isEmpty // empty marker: let parseBody's own error fire
          while (!hClosed && i < vEnd) {
            i += 1
            val lStart = i
            while (i < vEnd && s.charAt(i) != '\n') i += 1
            if (s.substring(lStart, i).trim == m) hClosed = true
          }
        case '[' | '{' =>
          // `for` immediately after an opener (modulo whitespace) is the
          // hclsyntax for-expression grammar; `[*]` is the index splat
          var j = i + 1
          while (j < vEnd && s.charAt(j).isWhitespace) j += 1
          if (c == '[' && j < vEnd && s.charAt(j) == '*') fail("splat expression [*]", i)
          if (j + 3 <= vEnd && s.substring(j, j + 3) == "for" &&
            (j + 3 == vEnd || s.charAt(j + 3).isWhitespace)) fail("for expression", i)
        case '.' if i + 1 < vEnd && s.charAt(i + 1) == '*' => fail("attribute splat .*", i)
        case _ => ()
      }
      i += 1
    }
  }

  /** Parse a block body from `s` starting at `from`; returns (body, next). */
  private def parseBody(s: String, from: Int, topLevel: Boolean,
      permissive: Boolean = false): (Body, Int) = {
    val attrs = Seq.newBuilder[(String, String)]
    val blocks = Seq.newBuilder[(String, Option[String], Body)]
    var i = from
    def skipWs(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    skipWs()
    while (i < s.length && s.charAt(i) != '}') {
      val idStart = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      val ident = s.substring(idStart, i)
      require(ident.nonEmpty, s"hcl: expected identifier at ${lineCol(s, i)}")
      skipWs()
      if (i < s.length && s.charAt(i) == '=') {
        i += 1
        skipWs()
        // heredoc value: `<<MARKER` / `<<-MARKER` (indented close + common
        // indent stripping, HCL2 semantics) — collected into a standard
        // double-quoted string token so every downstream consumer
        // (foldLiteral/evalConst/toSql) sees an ordinary literal
        if (i + 1 < s.length && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
          i += 2
          val indented = i < s.length && s.charAt(i) == '-'
          if (indented) i += 1
          val mStart = i
          while (i < s.length && s.charAt(i) != '\n') i += 1
          val marker = s.substring(mStart, i).trim
          require(marker.nonEmpty, s"hcl: heredoc for $ident lacks a marker")
          if (i < s.length) i += 1 // consume the newline
          val lines = Seq.newBuilder[String]
          var closed = false
          while (!closed) {
            require(i < s.length, s"hcl: heredoc for $ident not closed by $marker")
            val lStart = i
            while (i < s.length && s.charAt(i) != '\n') i += 1
            val line = s.substring(lStart, i)
            if (i < s.length) i += 1
            // closing marker may be indented in BOTH forms (HCL2 — the '-'
            // only controls content indent stripping), and stripComments
            // uses the same trim rule: the two scanners must agree or
            // comment stripping resumes mid-body
            if (line.trim == marker) closed = true
            else lines += line
          }
          var content = lines.result()
          if (indented && content.nonEmpty) {
            val indents = content.filter(_.trim.nonEmpty)
              .map(_.takeWhile(c => c == ' ' || c == '\t').length)
            val cut = if (indents.isEmpty) 0 else indents.min
            content = content.map(l => l.drop(math.min(cut, l.takeWhile(c => c == ' ' || c == '\t').length)))
          }
          val text = content.mkString("\n")
          attrs += ident -> ("\"" + text.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
          skipWs()
          // done with this attr — jump back to the loop head
        } else {
        // value: scan to end of line, but balance []/{} across lines.
        // Escape- and heredoc-aware: a \" inside a literal must not close
        // string state, and a heredoc inside a map/list value (e.g. under
        // `variables = {...}`) is raw text — its quotes/braces must not
        // perturb the balance (the inner parseBody re-parses it properly).
        var depth = 0
        var inStr = false
        val vStart = i
        var done = false
        while (i < s.length && !done) {
          val c = s.charAt(i)
          if (inStr) {
            if (c == '\\' && i + 1 < s.length) i += 1
            else if (c == '"') inStr = false
          } else c match {
            case '"' => inStr = true
            case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' =>
              i += 2
              if (i < s.length && s.charAt(i) == '-') i += 1
              val mStart = i
              while (i < s.length && s.charAt(i) != '\n') i += 1
              val m = s.substring(mStart, i).trim
              require(m.nonEmpty, s"hcl: heredoc in value of $ident lacks a marker")
              var hClosed = false
              while (!hClosed) {
                require(i < s.length, s"hcl: heredoc in value of $ident not closed by $m")
                i += 1 // consume the newline
                val lStart = i
                while (i < s.length && s.charAt(i) != '\n') i += 1
                if (s.substring(lStart, i).trim == m) hClosed = true
              }
              i -= 1 // balance the shared increment below
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
        // `variables` values (and the bodies re-parsed from them — the
        // permissive flag) and loop `items` are the contexts where
        // for-expressions and [*] splat ARE evaluated (plan-construction
        // time, see resolveItems) — everywhere else they stay loud errors
        if (!permissive && ident != "variables" && ident != "items")
          rejectUnsupported(s, vStart, i, ident)
        attrs += ident -> s.substring(vStart, i).trim
        }
      } else {
        // block: optional label identifier (bare or "quoted" — HCL2 quotes
        // labels; the reference's examples leave them bare), then '{'
        val label =
          if (i < s.length && s.charAt(i) == '"') {
            i += 1
            val lStart = i
            while (i < s.length && s.charAt(i) != '"') i += 1
            require(i < s.length, s"hcl: unterminated quoted label after $ident")
            val l = s.substring(lStart, i)
            i += 1
            skipWs()
            Some(l)
          } else if (i < s.length && s.charAt(i) != '{') {
            val lStart = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            val l = s.substring(lStart, i)
            skipWs()
            Some(l)
          } else None
        require(i < s.length && s.charAt(i) == '{', s"hcl: expected '{' after $ident at ${lineCol(s, i)}")
        i += 1
        val (body, next) = parseBody(s, i, topLevel = false, permissive)
        require(next < s.length && s.charAt(next) == '}', s"hcl: unterminated block $ident")
        i = next + 1
        blocks += ((ident, label.filter(_.nonEmpty), body))
      }
      skipWs()
    }
    (Body(attrs.result(), blocks.result()), i)
  }

  // ---------- expression translation ----------

  /** HCL ternary `c ? a : b` → `IF(c, a, b)`, nesting- and string-aware.
    * String state tracks WHICH quote char opened the literal (so an
    * apostrophe inside a double-quoted string neither ends the literal
    * early nor hides the real `:`) and skips backslash escapes (so `\"`
    * inside a literal does not flip string state — the same defect class
    * [[mapOutsideStrings]] guards against). */
  private[graft] def rewriteTernary(s: String): String = {
    var depth = 0; var i = 0; var q = -1; var inStr = false; var qc = ' '
    while (i < s.length && q < 0) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) i += 1
        else if (c == qc) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; qc = c
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
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) i += 1
        else if (c == qc) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; qc = c
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
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) { out.append(c).append(s.charAt(i + 1)); i += 2 }
        else { out.append(c); if (c == quote) inStr = false; i += 1 }
      }
      else if (c == '"' || c == '\'') { out.append(c); inStr = true; quote = c; i += 1 }
      else if (c == '(') {
        var depth = 1; var j = i + 1; var ins = false; var qt = ' '
        while (j < s.length && depth > 0) {
          val d = s.charAt(j)
          if (ins) {
            if (d == '\\' && j + 1 < s.length) j += 1
            else if (d == qt) ins = false
          }
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

  /** Apply `f` to the non-string-literal segments of an expression.
    * Backslash-escape-aware INSIDE literals: [[requoteLiterals]] emits
    * `\'` for embedded apostrophes, and a scanner that closed the string
    * at the escaped quote would hand literal content to `f` (which then
    * rewrites tokens inside it). */
  private def mapOutsideStrings(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inStr = false
    var quote = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) { out.append(c).append(s.charAt(i + 1)); i += 1 }
        else { out.append(c); if (c == quote) inStr = false }
      } else if (c == '"' || c == '\'') {
        out.append(f(seg.toString)); seg.clear(); out.append(c); inStr = true; quote = c
      } else seg.append(c)
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  private def replaceToken(s: String, token: String, replacement: String): String =
    mapOutsideStrings(s)(_.replaceAll("\\b" + java.util.regex.Pattern.quote(token) + "\\b",
      java.util.regex.Matcher.quoteReplacement(replacement)))

  /** Custom function definitions — the reference's top ROADMAP v1.1 item
    * ("#DEFINE-like custom function definitions usable elsewhere",
    * /root/reference/ROADMAP.md:58-61). Declared as top-level blocks:
    *
    * {{{
    * function "usd" {
    *   params = [x]
    *   body   = parse_decimals(x, 2)
    * }
    * }}}
    *
    * and callable from any transform/filter/save expression. Semantics are
    * MACRO EXPANSION at schema load ("executed at the block it gets called
    * at" — the expanded expression evaluates in the row's own context, so a
    * body referencing `balance(...)`-style context behaves exactly as if
    * written inline). Arguments are arbitrary expressions; each expansion
    * parenthesizes both arguments and body to preserve precedence. Nested
    * and chained definitions expand to fixpoint; recursion (direct or
    * mutual) cannot terminate and fails loud via a depth cap. */
  private[graft] def expandMacros(
      expr: String,
      fns: Map[String, (Seq[String], String)]): String = {
    if (fns.isEmpty) return expr
    var e = expr
    var rounds = 0
    var changed = true
    while (changed) {
      changed = false
      rounds += 1
      require(rounds <= 16,
        s"hcl: function expansion exceeded depth 16 — recursive function definition? in: $expr")
      var i = 0
      var inStr = false
      var quote = ' '
      while (i < e.length && !changed) {
        val c = e.charAt(i)
        if (inStr) {
          if (c == '\\' && i + 1 < e.length) i += 1
          else if (c == quote) inStr = false
          i += 1
        } else if (c == '"' || c == '\'') { inStr = true; quote = c; i += 1 }
        else if (c.isLetter || c == '_') {
          val start = i
          while (i < e.length && (e.charAt(i).isLetterOrDigit || e.charAt(i) == '_')) i += 1
          val ident = e.substring(start, i)
          val leftBoundary = start == 0 || {
            val p = e.charAt(start - 1); !(p.isLetterOrDigit || p == '_' || p == '.')
          }
          var j = i
          while (j < e.length && e.charAt(j).isWhitespace) j += 1
          if (leftBoundary && fns.contains(ident) && j < e.length && e.charAt(j) == '(') {
            val (args, end) = scanCallArgs(e, j, ident)
            val (params, body) = fns(ident)
            require(args.size == params.size,
              s"hcl: function $ident expects ${params.size} argument(s), got ${args.size}")
            var expanded = body.trim
            for ((p, a) <- params.zip(args))
              expanded = replaceToken(expanded, p, s"(${a.trim})")
            e = e.substring(0, start) + "(" + expanded + ")" + e.substring(end)
            changed = true
          }
        } else i += 1
      }
    }
    e
  }

  /** Scan a call's argument list from the '(' at `open`: balanced-paren +
    * string-aware top-level comma split. Returns (args, index after ')'). */
  private def scanCallArgs(s: String, open: Int, ident: String): (Seq[String], Int) = {
    val args = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 1
    var i = open + 1
    var inStr = false
    var quote = ' '
    while (depth > 0) {
      require(i < s.length, s"hcl: unterminated call of function $ident")
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == quote) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; quote = c; cur.append(c)
        case '(' | '[' | '{' => depth += 1; cur.append(c)
        case ')' | ']' | '}' =>
          depth -= 1; if (depth > 0) cur.append(c)
        case ',' if depth == 1 => args += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    val last = cur.toString
    if (last.trim.nonEmpty) args += last
    val out = args.result()
    require(out.forall(_.trim.nonEmpty), s"hcl: empty argument in call of function $ident")
    (out, i)
  }

  /** Re-quote string literals for Spark SQL: HCL's double-quoted literals
    * become single-quoted, with embedded single quotes backslash-escaped —
    * a blanket char replace would corrupt `"it's"` into `'it's'`. Literals
    * already single-quoted pass through with their content re-escaped. */
  private[graft] def requoteLiterals(s: String): String = {
    val out = new StringBuilder
    var i = 0; var inStr = false; var qc = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr) {
        if (c == '"' || c == '\'') { inStr = true; qc = c; out.append('\'') }
        else out.append(c)
        i += 1
      } else if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        // \" inside "..." is a literal double quote — safe bare in SQL
        if (n == '"' && qc == '"') out.append('"') else out.append('\\').append(n)
        i += 2
      } else if (c == qc) { inStr = false; out.append('\''); i += 1 }
      else if (c == '\'') { out.append('\\').append('\''); i += 1 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Full HCL-expression → Spark-SQL-expression translation. */
  private def toSql(raw: String, outputs: Set[String], varNames: Set[String]): String = {
    var e = rewriteTernary(raw.trim)
    e = mapOutsideStrings(e)(_.replace("&&", " AND ").replace("||", " OR "))
    // HCL string literals are double-quoted; Spark SQL wants single quotes
    // (double quotes would parse as identifiers under default ANSI settings).
    e = requoteLiterals(e)
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

  // ---------- constant folding (variables, start/end time, intervals) ----------

  private val QuotedRe = """^"(.*)"$""".r

  /** A load-time constant: string or number (the reference's cty values,
    * dsl/schema.go:400-408). */
  private[graft] sealed trait Folded
  private[graft] final case class FStr(value: String) extends Folded
  private[graft] final case class FNum(value: BigDecimal) extends Folded

  private def renderFolded(f: Folded): String = f match {
    case FStr(s) => s
    case FNum(n) => if (n.isWhole) n.toBigInt.toString else n.toString
  }

  /** Constant-evaluate an HCL value expression at schema-load time — the
    * reference evaluates full cty expressions here (dsl/schema.go:400-408).
    * Supports string/number literals, +-*'/' arithmetic with parens, and
    * nested upper/lower/format_date calls. Returns None when the expression
    * is not a load-time constant (callers pass it through untouched). */
  private[graft] def evalConst(input: String): Option[Folded] = {
    try {
      val s = input.trim
      var i = 0
      def skip(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
      def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
      def parseString(): String = {
        val q = s.charAt(i); i += 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        require(i < s.length, "unterminated string"); i += 1
        sb.toString
      }
      def asStr(f: Folded): String = renderFolded(f)
      def applyFn(name: String, args: Seq[Folded]): Folded = name match {
        case "upper" => require(args.size == 1, "upper/1"); FStr(asStr(args.head).toUpperCase)
        case "lower" => require(args.size == 1, "lower/1"); FStr(asStr(args.head).toLowerCase)
        case "format_date" =>
          require(args.size == 2, "format_date/2")
          import java.time.format.DateTimeFormatter
          import java.time.{LocalDate, LocalDateTime}
          val pattern = graft.engine.Functions.goLayoutToJava(asStr(args(0)))
          val fmt = DateTimeFormatter.ofPattern(pattern)
          val dt =
            if (pattern.exists("Hms".contains(_))) LocalDateTime.parse(asStr(args(1)), fmt)
            else LocalDate.parse(asStr(args(1)), fmt).atStartOfDay()
          FStr(dt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
        case other => sys.error(s"not a load-time constant function: $other")
      }
      def factor(): Folded = {
        skip()
        peek match {
          case '"' | '\'' => FStr(parseString())
          case '(' =>
            i += 1; val v = expr(); skip()
            require(peek == ')', "expected )"); i += 1; v
          case c if c.isDigit || c == '-' =>
            val st = i
            if (peek == '-') i += 1
            require(i < s.length && s.charAt(i).isDigit, "expected number")
            while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
            FNum(BigDecimal(s.substring(st, i)))
          case c if c.isLetter || c == '_' =>
            val st = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            val name = s.substring(st, i)
            skip()
            require(peek == '(', s"not a constant: $name")
            i += 1
            val args = scala.collection.mutable.ArrayBuffer[Folded]()
            skip()
            if (peek != ')') {
              args += expr(); skip()
              while (peek == ',') { i += 1; args += expr(); skip() }
            }
            require(peek == ')', "expected )"); i += 1
            applyFn(name, args.toSeq)
          case other => sys.error(s"unexpected char '$other'")
        }
      }
      def term(): Folded = {
        var v = factor(); skip()
        while (peek == '*' || peek == '/') {
          val op = peek; i += 1
          val r = factor(); skip()
          v = (v, r) match {
            case (FNum(a), FNum(b)) => FNum(if (op == '*') a * b else a / b)
            case _ => sys.error("arithmetic on non-numbers")
          }
        }
        v
      }
      def expr(): Folded = {
        var v = term(); skip()
        while (peek == '+' || peek == '-') {
          val op = peek; i += 1
          val r = term(); skip()
          v = (v, r) match {
            case (FNum(a), FNum(b)) => FNum(if (op == '+') a + b else a - b)
            case _ => sys.error("arithmetic on non-numbers")
          }
        }
        v
      }
      val v = expr()
      skip()
      if (i != s.length) None else Some(v)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** A bare date/timestamp token (`2024-01-01`, `2024-01-01 12:00`): must
    * NOT be handed to [[evalConst]], which would read its dashes as
    * subtraction and silently fold `2024-01-01` to `2022`. */
  private val BareDateRe = """^\d{4}-\d{2}(-\d{2})?([ T]\d{2}:\d{2}(:\d{2})?)?$""".r

  /** Fold a variable/time value to a plain string at schema-load time.
    * Returns None for `now` (callers treat it as "unbounded"); expressions
    * that are not load-time constants pass through verbatim (old behavior —
    * they fail loud later if a constant was required). */
  private[graft] def foldLiteral(raw: String): Option[String] = raw.trim match {
    case "now" => None
    case QuotedRe(s) if !s.contains("\"") => Some(s)
    case d if BareDateRe.matches(d) => Some(d)
    case other => Some(evalConst(other).map(renderFolded).getOrElse(other))
  }

  /** Canonical numeric value of a declared address — `"0x1"`, `"0x01"` and
    * `1` all canonicalize to the same BigInt, so the collision guard
    * compares ADDRESSES, not spellings. */
  private[graft] def addressValue(a: String): BigInt = {
    val t = a.trim.stripPrefix("\"").stripSuffix("\"")
    if (t.startsWith("0x") || t.startsWith("0X")) BigInt(t.drop(2), 16) else BigInt(t)
  }

  /** 0x-hex contract address → the testbed store's int64 key space (low 62
    * bits — deterministic; a live DSv2 source keys by the raw string). */
  private[graft] def addressToLong(a: String): Long =
    (addressValue(a) & BigInt("3fffffffffffffff", 16)).toLong

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

    val varAttrs: Seq[(String, String)] = top.attrs.collect { case ("variables", v) =>
      require(v.startsWith("{"), s"hcl: variables must be a map, got $v")
      parseBody(v.drop(1), 0, topLevel = false, permissive = true)._1.attrs
    }.flatten

    def parseArr(v: String): Seq[String] = {
      require(v.startsWith("[") && v.endsWith("]"), s"hcl: expected a list, got $v")
      val inner = v.substring(1, v.length - 1)
      // split top-level commas
      val items = Seq.newBuilder[String]
      var depth = 0; var inStr = false; var esc = false; val cur = new StringBuilder
      inner.foreach { c =>
        if (inStr) {
          cur.append(c)
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        }
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

    // ---------- for-expressions and [*] splat (hclsyntax, evaluated at
    // plan-construction time over literal collections — the same contract
    // as the reference's cty evaluation, dsl/schema.go:388) ----------
    // A collection value is: a list literal `[...]` (items stay raw:
    // scalars keep quotes, objects keep `{...}` text), a reference to a
    // list-valued variable, `name[*].attr` splat over an object list, or
    // `[for x in coll : body (if cond)?]`. Resolution returns UNQUOTED
    // scalar strings (or raw object text, which loop stamping binds as
    // `${item.attr}` downstream).
    val SplatRe = """^([A-Za-z_]\w*)\[\*\]\.([A-Za-z_]\w*)$""".r
    val BareIdentRe = """^[A-Za-z_]\w*$""".r
    val varLists = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()

    def objAttrs(item: String): Map[String, String] = {
      val t = item.trim
      require(t.startsWith("{"), s"hcl: splat/attr access needs object items, got $t")
      // HCL2 object-literal entries are comma-separated; parseBody's attr
      // scanner is newline-delimited — rewrite TOP-LEVEL commas (string-
      // and bracket-aware) before parsing
      val body = t.drop(1)
      val sb = new StringBuilder
      var depth = 0; var inStr = false; var esc = false
      body.foreach { c =>
        if (inStr) {
          sb.append(c)
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true; sb.append(c)
          case '(' | '[' | '{' => depth += 1; sb.append(c)
          case ')' | ']' | '}' => depth -= 1; sb.append(c)
          case ',' if depth == 0 => sb.append('\n')
          case _ => sb.append(c)
        }
      }
      parseBody(sb.toString, 0, topLevel = false, permissive = true)._1.attrs.toMap
    }

    def evalScalar(body: String, binds: Map[String, String]): String = {
      val t = body.trim
      if (t.startsWith("\"")) // string template: interpolate ${x}/${x.attr}
        binds.foldLeft(unquote(t)) { case (acc, (k, v)) =>
          acc.replace("${" + k + "}", unquote(v))
        }
      else {
        // bare expression: substitute references (longest key first so
        // `x.attr` wins over `x`); raw binding values keep their own quotes
        // and so stay valid evalConst operands
        val sub = binds.toSeq.sortBy(-_._1.length).foldLeft(t) { case (acc, (k, v)) =>
          acc.replaceAll(
            "(?<![\\w.])" + java.util.regex.Pattern.quote(k) + "(?![\\w.])",
            java.util.regex.Matcher.quoteReplacement(v.trim))
        }
        evalConst(sub) match {
          case Some(f) => renderFolded(f)
          case None => unquote(sub)
        }
      }
    }

    def evalCond(cond: String, binds: Map[String, String]): Boolean = {
      val ops = Seq("==", "!=", "<=", ">=", "<", ">")
      val op = ops.find(cond.contains).getOrElse(
        sys.error(s"hcl: unsupported for-expression condition: $cond"))
      val Array(l, r) = cond.split(java.util.regex.Pattern.quote(op), 2)
      val (lv, rv) = (evalScalar(l, binds), evalScalar(r, binds))
      val num = (s: String) => scala.util.Try(BigDecimal(s)).toOption
      val cmp = (num(lv), num(rv)) match {
        case (Some(a), Some(b)) => a.compare(b)
        case _ => lv.compare(rv)
      }
      op match {
        case "==" => cmp == 0
        case "!=" => cmp != 0
        case "<=" => cmp <= 0
        case ">=" => cmp >= 0
        case "<" => cmp < 0
        case ">" => cmp > 0
      }
    }

    def evalFor(v: String): Seq[String] = {
      // [for <x> in <coll> : <body>] / [for <x> in <coll> : <body> if <cond>]
      val inner = v.trim.stripPrefix("[").stripSuffix("]").trim
      val AfterFor = inner.stripPrefix("for").trim
      val inIdx = AfterFor.indexOf(" in ")
      require(inIdx > 0, s"hcl: malformed for expression: $v")
      val x = AfterFor.substring(0, inIdx).trim
      require(BareIdentRe.matches(x), s"hcl: for-expression variable must be an identifier: $x")
      val rest = AfterFor.substring(inIdx + 4)
      // the collection ends at the first TOP-LEVEL ':' (bracket/brace/string aware)
      var depth = 0; var inStr = false; var colon = -1; var i = 0
      while (i < rest.length && colon < 0) {
        val c = rest.charAt(i)
        if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
        else c match {
          case '"' => inStr = true
          case '(' | '[' | '{' => depth += 1
          case ')' | ']' | '}' => depth -= 1
          case ':' if depth == 0 => colon = i
          case _ => ()
        }
        i += 1
      }
      require(colon > 0, s"hcl: for expression lacks ':': $v")
      val coll = rest.substring(0, colon).trim
      var body = rest.substring(colon + 1).trim
      // optional trailing `if <cond>` at top level
      val ifIdx = {
        var d = 0; var s2 = false; var at = -1; var j = 0
        while (j < body.length - 3) {
          val c = body.charAt(j)
          if (s2) { if (c == '\\') j += 1 else if (c == '"') s2 = false }
          else c match {
            case '"' => s2 = true
            case '(' | '[' | '{' => d += 1
            case ')' | ']' | '}' => d -= 1
            case ' ' if d == 0 && body.startsWith(" if ", j) => at = j
            case _ => ()
          }
          j += 1
        }
        at
      }
      val cond = if (ifIdx >= 0) Some(body.substring(ifIdx + 4).trim) else None
      if (ifIdx >= 0) body = body.substring(0, ifIdx).trim
      resolveItems(coll).flatMap { item =>
        val binds: Map[String, String] =
          (if (item.trim.startsWith("{"))
            objAttrs(item).map { case (k2, v2) => s"$x.$k2" -> v2 }
          else Map.empty[String, String]) + (x -> item)
        if (cond.forall(evalCond(_, binds))) Some(evalScalar(body, binds)) else None
      }
    }

    def resolveItems(v0: String): Seq[String] = {
      val v = v0.trim
      v match {
        case SplatRe(name, attr) =>
          resolveItems(name).map(it => unquote(objAttrs(it).getOrElse(attr,
            sys.error(s"hcl: splat attribute `$attr` missing on an item of `$name`"))))
        case _ if v.startsWith("[") =>
          val afterBracket = v.drop(1).dropWhile(_.isWhitespace)
          if (afterBracket.startsWith("for") &&
            afterBracket.drop(3).headOption.forall(_.isWhitespace)) evalFor(v)
          else parseArr(v).map(it => if (it.startsWith("{")) it else unquote(it))
        case BareIdentRe() =>
          varLists.getOrElse(v, sys.error(
            s"hcl: `$v` is not a list-valued variable (known: ${varLists.keys.mkString(", ")})"))
        case other => sys.error(s"hcl: expected a list, variable, for-expression or splat, got $other")
      }
    }

    // variables: list-valued entries (list literals, for-expressions,
    // splats) resolve in declaration order into varLists — consumable by
    // loop.items and later list variables; scalar entries fold at load and
    // are stored as SQL string literals so `${name}` substitution inside
    // expressions yields a literal, not an identifier
    val varEntries: Seq[(String, String)] = varAttrs.flatMap { case (k, raw) =>
      val t = raw.trim
      if (t.startsWith("[") || SplatRe.matches(t)) {
        varLists(k) = resolveItems(t)
        None
      } else {
        require(t != "now", s"hcl: variable $k cannot be `now`")
        // numbers substitute as bare SQL literals (a quoted number would
        // force string coercion in comparisons); strings as quoted literals
        // with embedded single quotes escaped; bare date tokens stay
        // verbatim (their dashes are not subtraction)
        Some(k -> (if (BareDateRe.matches(t)) s"'$t'"
        else evalConst(raw) match {
          case Some(n: FNum) => renderFolded(n)
          case Some(FStr(s)) => "'" + s.replace("'", "\\'") + "'"
          case None => "'" + raw.replace("'", "\\'") + "'"
        }))
      }
    }

    /** Integer attr (block_interval / block_offset) — arithmetic folds at
      * load: `block_interval = 60 * 60 * 24` is a cty constant expression
      * in the reference (dsl/schema.go:400-408). */
    def toLongConst(v: String, what: String): Long = evalConst(v) match {
      case Some(FNum(n)) if n.isWhole => n.toBigInt.toLong
      case _ => sys.error(s"hcl: $what must be an integer constant expression, got $v")
    }
    val varNames = varEntries.map(_._1).toSet

    val startTime = top.attrs.collectFirst { case ("start_time", v) => foldLiteral(v) }.flatten
    val endTime = top.attrs.collectFirst { case ("end_time", v) => foldLiteral(v) }.flatten

    // function definitions (ROADMAP v1.1 #DEFINE) — parsed before queries so
    // every expression can call them; see [[expandMacros]]
    val reservedFnNames = Set("parse_decimals", "format_date", "upper", "lower", "abs",
      "now", "balance", "token_balance", "is_contract", "get_price", "if", "cast")
    val fnDefs: Map[String, (Seq[String], String)] = {
      val defs = top.blocks.collect { case ("function", label, fb) =>
        val name = label.getOrElse(sys.error("hcl: function block requires a name label"))
        require(!reservedFnNames.contains(name),
          s"hcl: function $name shadows a built-in function — pick another name")
        val params = fb.attrs.collectFirst { case ("params", v) => parseArr(v).map(unquote) }
          .getOrElse(Seq.empty)
        params.foreach(p => require(p.matches("[A-Za-z_]\\w*"),
          s"hcl: function $name: parameter '$p' must be a bare identifier"))
        require(params.distinct.size == params.size,
          s"hcl: function $name declares duplicate parameters")
        val body = fb.attrs.collectFirst { case ("body", v) => v }
          .getOrElse(sys.error(s"hcl: function $name lacks a body attribute"))
        name -> (params, body)
      }
      require(defs.map(_._1).distinct.size == defs.size,
        s"hcl: duplicate function definitions: ${defs.map(_._1).diff(defs.map(_._1).distinct).distinct.mkString(", ")}")
      defs.toMap
    }

    def methodsOf(body: Body): Seq[JObject] = body.blocks.collect {
      case ("method", Some(name), mb) =>
        val base: JObject =
          ("name" -> name) ~
            ("outputs" -> mb.attrs.collectFirst { case ("outputs", v) => parseArr(v).map(unquote) }
              .getOrElse(Seq.empty[String]))
        mb.attrs.collectFirst { case ("block_offset", v) => toLongConst(v, "block_offset") }
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
        "tx_sender", "tx_receiver", "sample_ts", "item")
      val declaredOutputs = scala.collection.mutable.Set.empty[String]
      val globalEvents = eventsOf(qb, declaredOutputs)
      val contracts = qb.blocks.collect { case ("contract", _, cb) =>
        val raw = cb.attrs.collectFirst { case ("address", v) =>
          v.trim.stripPrefix("\"").stripSuffix("\"") }
          .getOrElse(sys.error(s"hcl: contract block in query $name lacks address"))
        // a `${...}` template address stays a STRING through the JSON
        // document — JsonSchema substitutes the loop item / variable per
        // stamped query and folds it then (its string-address branch)
        val addrJson: JValue =
          if (raw.contains("${")) JString(raw) else JInt(addressToLong(raw))
        // An ABSOLUTE `abi = "<path>"` binds the block to a FETCHED
        // abi.json (the `abi <address>` CLI subcommand writes them,
        // reference ROADMAP.md:56): every contract-scoped event signature
        // must exist in the ABI and every declared output must be one of
        // that event's input names — the compile-time contract a live
        // decoder enforces implicitly when it unpacks the log. Testbed
        // decode stays by-signature; the ABI gates the schema, it doesn't
        // re-route column derivation. RELATIVE names (the reference's own
        // schema.example.hcl says `abi = "unipair.abi.json"`) keep the
        // legacy accepted-and-recorded behavior: the parser has no config
        // dir to resolve them against, so it cannot check them here.
        cb.attrs.collectFirst { case ("abi", v) => unquote(v) }
          .filter(p => new java.io.File(p).isAbsolute).foreach { abiPath =>
          val f = new java.io.File(abiPath)
          require(f.isFile, s"hcl: query $name contract $raw: abi file not found: " +
            s"$abiPath (fetch it with `abi <address> --registry <dir>`)")
          // overloaded events (same name, different inputs) are legal ABI —
          // a last-wins toMap would reject inputs that exist only on an
          // earlier overload (round-10 advice), so union the input-name
          // sets per event name
          val evs = AbiSchema.parse(java.nio.file.Files.readString(f.toPath))
            .groupBy(_.name)
            .map { case (n, es) => n -> es.flatMap(_.inputs.map(_.name)).toSet }
          cb.blocks.foreach {
            case ("event", Some(sig), eb) =>
              val inputs = evs.getOrElse(sig, sys.error(
                s"hcl: query $name contract $raw: event '$sig' is not in ABI $abiPath " +
                  s"(ABI declares: ${evs.keys.toSeq.sorted.mkString(", ")})"))
              val outs = eb.attrs.collectFirst { case ("outputs", v) =>
                parseArr(v).map(unquote) }.getOrElse(Seq.empty[String])
              outs.filterNot(inputs.contains).foreach(o => sys.error(
                s"hcl: query $name contract $raw: output '$o' is not an input of " +
                  s"ABI event '$sig' (inputs: ${inputs.toSeq.sorted.mkString(", ")})"))
            case _ => ()
          }
        }
        (raw, addrJson, cb, eventsOf(cb, declaredOutputs), methodsOf(cb))
      }
      // the 62-bit fold must keep declared addresses distinct — a collision
      // would silently merge two contracts' event/transform scopes.
      // Distinctness is judged on the CANONICAL address value ("0x1" and
      // "0x01" are the same contract, not a collision). Template addresses
      // are judged per stamped item downstream, not here.
      val literalAddrs = contracts.map(_._1).filterNot(_.contains("${"))
      val declDistinct = literalAddrs.map(addressValue).distinct
      val foldDistinct = literalAddrs.map(addressToLong).distinct
      require(foldDistinct.size == declDistinct.size,
        s"hcl: query $name: ${declDistinct.size} distinct contract addresses fold to " +
          s"${foldDistinct.size} colliding testbed keys — rename one address or widen the key space")
      val outputs = declaredOutputs.toSet -- native
      // user-defined functions expand FIRST (their bodies then flow through
      // the ordinary ternary/requote/output/variable pipeline like inline text)
      def sql(e: String): String = toSql(expandMacros(e, fnDefs), outputs, varNames)

      val contractJson: Seq[JObject] = contracts.map { case (_, addrJson, cb, ownEvents, _) =>
        val transforms: Seq[(String, String)] = cb.blocks.collect {
          case ("transform", _, tb) => tb.attrs.map { case (k, v) => k -> sql(v) }
        }.flatten
        var base: JObject = JObject("address" -> addrJson)
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
      val contractMethods = contracts.flatMap(_._5)
      val queryTransforms: Seq[(String, String)] = qb.blocks.collect {
        case ("transform", _, tb) => tb.attrs.map { case (k, v) => k -> sql(v) }
      }.flatten
      val filters = qb.attrs.collectFirst { case ("filter", v) => parseArr(v).map(sql) }
        .getOrElse(Nil)
      val saves: Seq[(String, String)] = qb.blocks.collect {
        case ("save", _, sb) => sb.attrs.map { case (k, v) => k -> sql(v) }
      }.flatten
      // aggregate block (reference roadmap "group by, sum, avg",
      // ROADMAP.md:77): `group_by = [keys]` + one attr per aggregate output;
      // aggregates run over the saved rows (save names are in scope).
      val aggBlocks = qb.blocks.collect { case ("aggregate", _, ab) => ab }
      require(aggBlocks.size <= 1,
        s"hcl: query $name declares ${aggBlocks.size} aggregate blocks — at most one")
      val aggGroupBy: Seq[String] = aggBlocks.headOption.toSeq.flatMap(ab =>
        ab.attrs.collectFirst { case ("group_by", v) => parseArr(v).map(unquote) }.getOrElse(Nil))
      val aggregates: Seq[(String, String)] = aggBlocks.headOption.toSeq.flatMap(ab =>
        ab.attrs.filterNot(_._1 == "group_by").map { case (k, v) => k -> sql(v) })
      require(aggBlocks.isEmpty || aggregates.nonEmpty,
        s"hcl: query $name: aggregate block declares no aggregate expressions")
      val chain = qb.attrs.collectFirst { case ("chain", v) =>
        val c = unquote(v)
        if (c == "item") "${item}" else c
      }.getOrElse("unknown")

      var q: JObject = ("name" -> name) ~ ("chain" -> chain)
      startTime.foreach(t => q = q ~ ("start_time" -> t))
      endTime.foreach(t => q = q ~ ("end_time" -> t))
      qb.attrs.collectFirst { case ("block_interval", v) => toLongConst(v, "block_interval") }
        .foreach(bi => q = q ~ ("block_interval" -> bi))
      if (allEvents.nonEmpty) q = q ~ ("events" -> allEvents)
      if (contractJson.nonEmpty) q = q ~ ("contracts" -> JArray(contractJson.toList))
      if (contractMethods.nonEmpty) q = q ~ ("methods" -> contractMethods)
      if (queryTransforms.nonEmpty)
        q = q ~ ("transforms" -> JObject(queryTransforms.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      if (filters.nonEmpty) q = q ~ ("filters" -> filters)
      q = q ~ ("saves" -> JObject(saves.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      if (aggGroupBy.nonEmpty) q = q ~ ("group_by" -> aggGroupBy)
      if (aggregates.nonEmpty)
        q = q ~ ("aggregates" -> JObject(aggregates.map { case (k, v) => k -> (JString(v): JValue) }.toList))
      q
    }

    // loop { items, query ... } — ONLY the queries declared INSIDE the loop
    // block are stamped per item (dsl/schema.go:427-442); standalone queries
    // go to a separate loop-free document, since the JSON dialect's `loop`
    // applies to every query in its document.
    val loopBlock = top.blocks.collectFirst { case ("loop", _, lb) => lb }
    val loopItems: Seq[String] = loopBlock.toSeq.flatMap(lb =>
      lb.attrs.collectFirst { case ("items", v) => resolveItems(v) }.getOrElse(Nil))
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
