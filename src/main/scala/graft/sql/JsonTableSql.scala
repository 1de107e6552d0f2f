package graft.sql

/** Trino/SQL:2016 `JSON_TABLE` — the SQL/JSON table function (part of
  * the pinned Trino 468 surface) — as a source-to-source rewrite onto
  * Spark's native JSON kernels, the same seam MATCH_RECOGNIZE uses
  * ([[MatchRecognizeSql]]): `GraftSqlParser` applies it to plain
  * `spark.sql(...)` text and [[GraftSql.TrinoDialect]] to scripted
  * statements.
  *
  * Supported dialect subset (everything else rejects LOUDLY with the
  * feature named):
  *
  * {{{
  * FROM <rel>, JSON_TABLE(<expr>, '<rowpath>'
  *   COLUMNS (
  *     <name> FOR ORDINALITY,
  *     <name> <type> PATH '<colpath>', ...)) [AS] <alias>
  * }}}
  *
  *  - `<rowpath>`: `[lax|strict] $[*]` or `[lax|strict] $.a.b[*]` — the
  *    row pattern must iterate an ARRAY (`[*]`-terminated). `lax` is
  *    the evaluation Spark's `get_json_object` provides (missing paths
  *    are NULL); `strict` is accepted and downgraded to lax semantics.
  *  - `<colpath>`: `[lax|strict] $.x...` evaluated against each array
  *    element; `<type>` maps Trino names onto Spark CAST targets.
  *  - `FOR ORDINALITY` is the 1-based row number within the array.
  *  - ONE `NESTED [PATH] '<path>[*]' COLUMNS (...)` entry per COLUMNS
  *    block (round 13): the nested path is evaluated against each
  *    parent element and its array flattened with the SQL:2016 DEFAULT
  *    plan — OUTER parent/child (a parent with no nested rows emits
  *    one row with NULL nested columns), which is also Trino 468's
  *    default. SIBLING nested paths (the UNION plan) and a second
  *    nesting LEVEL are named rejections — lower the next level as a
  *    second JSON_TABLE over the inner array.
  *  - PLAN / ERROR ON ERROR / EMPTY ... ON EMPTY are not supported
  *    (named rejections); default NULL ON ERROR semantics is what the
  *    lowering produces naturally.
  *
  * Lowering: the clause becomes a correlated `LATERAL (SELECT
  * CAST(get_json_object(elem, '<colpath>') AS <type>) AS <name>, ...
  * FROM (SELECT [pos]explode(from_json(<array-of-json-strings>,
  * 'array<string>')) ...)) <alias>` — Catalyst's native Generate, one
  * pass, no UDFs, and the alias's columns resolve by NAME everywhere
  * in the statement (no reference rewriting, names survive into the
  * output schema). A NESTED entry adds one more Generate: `LATERAL
  * VIEW OUTER posexplode_outer` over the nested array of each parent
  * element — still one pass, still no UDFs, and the OUTER default plan
  * falls out of the _outer generator.
  *
  * Empty/NULL documents produce zero rows (Trino's default inner
  * semantics).
  */
object JsonTableSql {
  import SqlScan.{maskLiterals, splitTop}

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase.contains("JSON_TABLE")) return sql
    var out = sql
    var guard = 0
    var next = findKeyword(out)
    while (next.isDefined && guard < 32) {
      out = rewriteOne(out, next.get)
      next = findKeyword(out)
      guard += 1
    }
    out
  }

  /** First JSON_TABLE keyword position OUTSIDE string literals. */
  private def findKeyword(sql: String): Option[Int] = {
    val rx = """(?i)\bJSON_TABLE\s*\(""".r
    rx.findAllMatchIn(maskLiterals(sql)).map(_.start).toSeq.headOption
  }

  private def closeParen(sql: String, open: Int): Int =
    SqlScan.closeParen(sql, open, "JSON_TABLE")

  private case class Col(name: String, castType: Option[String], path: Option[String],
                         onMissing: Option[String] = None)
  private case class Nested(path: String, cols: Seq[Col], child: Option[Nested])

  private val trinoTypes: Map[String, String] = Map(
    "VARCHAR" -> "STRING", "CHAR" -> "STRING", "JSON" -> "STRING",
    "INTEGER" -> "INT", "INT" -> "INT", "SMALLINT" -> "SMALLINT",
    "TINYINT" -> "TINYINT", "BIGINT" -> "BIGINT",
    "DOUBLE" -> "DOUBLE", "REAL" -> "FLOAT", "BOOLEAN" -> "BOOLEAN",
    "DATE" -> "DATE", "TIMESTAMP" -> "TIMESTAMP",
    // Spark spellings pass through too: on the SCRIPTED path the
    // TrinoDialect type rewrites (bare VARCHAR -> STRING, VARBINARY ->
    // BINARY) run BEFORE this lowering, so the COLUMNS block may
    // already carry Spark names (r12 review)
    "STRING" -> "STRING", "BINARY" -> "BINARY", "FLOAT" -> "FLOAT")

  private def mapType(t: String): String = {
    val base = t.toUpperCase.replaceAll("""\s*\(.*\)\s*$""", "").trim
    if (base == "DECIMAL" || base == "NUMERIC") t.toUpperCase // keep (p,s)
    else trinoTypes.getOrElse(base, throw new IllegalArgumentException(
      s"JSON_TABLE: unsupported column type '$t' — supported: " +
        trinoTypes.keys.toSeq.sorted.mkString(", ") + ", DECIMAL(p,s)"))
  }

  /** Clause keywords that can follow `JSON_TABLE(...)` when the alias
    * is omitted — never valid aliases (r12 advice). */
  private val aliasReserved = Set(
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET", "FETCH",
    "JOIN", "ON", "USING", "CROSS", "LEFT", "RIGHT", "FULL", "INNER",
    "NATURAL", "LATERAL", "UNION", "EXCEPT", "INTERSECT", "MINUS",
    "WINDOW", "QUALIFY", "AND", "OR")

  /** Strip the SQL/JSON mode keyword; require a '$'-rooted path. */
  private def stripMode(p: String): String = {
    val s = p.trim.replaceAll("""(?i)^(lax|strict)\s+""", "").trim
    require(s.startsWith("$"),
      "JSON_TABLE: path must be $-rooted, got '" + p + "'")
    s
  }

  private def rewriteOne(sql: String, kwStart: Int): String = {
    val open = sql.indexOf('(', kwStart)
    val close = closeParen(sql, open)
    val inside = sql.substring(open + 1, close)

    // alias after the closing paren: [AS] ident. A bare identifier
    // regex would capture a following clause keyword (WHERE/GROUP/...)
    // as the alias when the alias is omitted, silently reshaping the
    // query — reject keywords so the alias-required error fires
    // (r12 advice).
    val aliasRx = """(?is)^\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)""".r
    val tailText = sql.substring(close + 1)
    val aliasM = aliasRx.findFirstMatchIn(tailText)
      .filterNot(m => aliasReserved.contains(m.group(1).toUpperCase))
      .getOrElse(throw new IllegalArgumentException(
        "JSON_TABLE needs an alias: JSON_TABLE(...) [AS] t"))
    val alias = aliasM.group(1)
    val afterAlias = close + 1 + aliasM.end

    // args: <expr> , '<rowpath>' COLUMNS ( ... ) [trailing clause]
    val parts = splitTop(inside)
    require(parts.length == 2,
      s"JSON_TABLE takes (expr, 'row path' COLUMNS (...)), got ${parts.length} " +
        "top-level arguments")
    val expr = parts(0).trim
    val pathCols = parts(1).trim
    val headRx = """(?is)^\s*'((?:[^']|'')*)'\s*COLUMNS\s*\(""".r
    val headM = headRx.findFirstMatchIn(pathCols).getOrElse(
      throw new IllegalArgumentException(
        s"JSON_TABLE: expected '<row path>' COLUMNS (...), got '$pathCols'"))
    val rowPathRaw = headM.group(1)
    val colsOpen = headM.end - 1
    val colsClose = closeParen(pathCols, colsOpen)
    val colsBlock = pathCols.substring(colsOpen + 1, colsClose)
    // anything after COLUMNS(...) is a clause this lowering does not
    // support — name it (Trino 468 accepts PLAN and ON ERROR/ON EMPTY
    // here, so these are honest dialect gaps, pinned in the spec)
    val clauseTail = pathCols.substring(colsClose + 1).trim
    if (clauseTail.nonEmpty) {
      val up = clauseTail.toUpperCase
      if (up.startsWith("PLAN"))
        throw new IllegalArgumentException(
          "JSON_TABLE PLAN clauses are not supported — the lowering implements " +
            "the SQL:2016 default plan (OUTER parent/child), which is also Trino's default")
      if (up.contains("ON ERROR") || up.contains("ON EMPTY"))
        throw new IllegalArgumentException(
          "JSON_TABLE ON ERROR / ON EMPTY clauses are not supported — the lowering " +
            "produces the default NULL ON ERROR semantics")
      throw new IllegalArgumentException(
        s"JSON_TABLE: unsupported trailing clause '$clauseTail'")
    }

    // row path -> the array-of-json-strings expression
    val rowPath = stripMode(rowPathRaw)
    require(rowPath.endsWith("[*]"),
      s"JSON_TABLE: the row path must iterate an array ('$$[*]' or '$$.a[*]'), got '$rowPathRaw'")
    val prefix = rowPath.stripSuffix("[*]")
    val arrayExpr =
      if (prefix == "$") expr
      else s"get_json_object($expr, '${prefix.stripSuffix(".")}')"

    // columns: plain entries + at most ONE NESTED PATH entry
    val ordRx = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+ORDINALITY\s*$""".r
    val colRx = ("""(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s+PATH\s+'((?:[^']|'')*)'\s*(.*?)\s*$""").r
    val nestedRx =
      """(?is)^\s*NESTED\s+(?:PATH\s+)?'((?:[^']|'')*)'\s*COLUMNS\s*\((.*)\)\s*$""".r
    // column-level SQL/JSON behaviors (round 13): `NULL ON EMPTY/ERROR`
    // is the default the lowering already produces (accepted, no-op);
    // `DEFAULT <literal> ON EMPTY/ERROR` coalesces over the NULL. The
    // lowering cannot DISTINGUISH empty from error (get_json_object
    // yields NULL for both) nor raise per-row errors, so `ERROR ON ...`
    // and two DIFFERENT defaults are named rejections.
    val behaviorRx =
      """(?is)^(NULL|ERROR|DEFAULT\s+('(?:[^']|'')*'|[-+0-9.Ee]+))\s+ON\s+(EMPTY|ERROR)\s*(.*)$""".r
    def parseBehaviors(name: String, tail0: String): Option[String] = {
      var tail = tail0.trim
      var dflt: Option[String] = None
      while (tail.nonEmpty) tail match {
        case behaviorRx(kind, lit, _, rest) =>
          val k = kind.toUpperCase
          if (k.startsWith("ERROR")) throw new IllegalArgumentException(
            s"JSON_TABLE column $name: ERROR ON EMPTY/ERROR is not supported — " +
              "the lowering produces NULL (the SQL/JSON default) and cannot " +
              "raise per-row errors")
          if (k.startsWith("DEFAULT")) {
            if (dflt.exists(_ != lit)) throw new IllegalArgumentException(
              s"JSON_TABLE column $name: two DIFFERENT defaults for ON EMPTY vs " +
                "ON ERROR are not supported — the lowering cannot distinguish a " +
                "missing path from a malformed document (both read as NULL)")
            dflt = Some(lit)
          }
          tail = rest.trim
        case other => throw new IllegalArgumentException(
          s"JSON_TABLE column $name: unsupported trailing clause '$other' — " +
            "supported: [NULL | DEFAULT <literal>] ON EMPTY / ON ERROR")
      }
      dflt
    }
    def parseLeaf(entry: String): Col = entry match {
      case ordRx(n) => Col(n, None, None)
      case colRx(n, t, p, tail) =>
        Col(n, Some(mapType(t)), Some(stripMode(p)), parseBehaviors(n, tail))
      case other => throw new IllegalArgumentException(
        s"JSON_TABLE: unsupported COLUMNS entry '${other.trim}' — supported: " +
          "name FOR ORDINALITY | name <type> PATH '<path>' " +
          "[[NULL | DEFAULT <lit>] ON EMPTY/ERROR] | " +
          "NESTED PATH '<path>[*]' COLUMNS (...)")
    }
    // a COLUMNS block = leaf entries + nested entries. ONE nested
    // entry may itself nest (an arbitrary-depth CHAIN); TWO OR MORE
    // nested entries at the OUTERMOST block are SIBLINGS and take the
    // SQL:2016 default UNION plan — supported when every sibling is a
    // LEAF block (round 13). Siblings below the outermost level, or
    // siblings that themselves nest, stay named rejections.
    def parseBlock(block: String, outermost: Boolean): (Seq[Col], Seq[Nested]) = {
      val (nestedEntries, leafEntries) =
        splitTop(block).partition(e => nestedRx.findFirstMatchIn(e).isDefined)
      val leafs = leafEntries.map(parseLeaf)
      require(nestedEntries.length <= 1 || outermost,
        s"JSON_TABLE supports sibling NESTED paths (the UNION plan) only in the " +
          "OUTERMOST COLUMNS block — lower a deeper sibling as another JSON_TABLE")
      val nesteds = nestedEntries.map { e =>
        val m = nestedRx.findFirstMatchIn(e).get
        val np = stripMode(m.group(1))
        require(np.endsWith("[*]"),
          s"JSON_TABLE NESTED PATH must iterate an array ('$$.a[*]'), got '${m.group(1)}'")
        val (innerLeafs, innerNested) = parseBlock(m.group(2), outermost = false)
        Nested(np, innerLeafs, innerNested.headOption)
      }
      require(nesteds.length <= 1 || nesteds.forall(_.child.isEmpty),
        "JSON_TABLE sibling NESTED paths must be LEAF blocks — a sibling that " +
          "itself nests is not supported; lower it as another JSON_TABLE")
      (leafs, nesteds)
    }
    val (cols, nesteds) = parseBlock(colsBlock, outermost = true)
    val nested = nesteds.headOption
    require(cols.nonEmpty || nesteds.nonEmpty,
      "JSON_TABLE: COLUMNS must name at least one column")

    // lower to a LATERAL subquery yielding properly NAMED typed columns
    // — t.ln resolves naturally, SELECT t.ln keeps the name "ln", and
    // no reference rewriting is needed anywhere in the statement
    val hasOrd = cols.exists(_.castType.isEmpty)
    // PATH '$' selects the element ITSELF — required for arrays of
    // SCALARS, whose elements are not parseable JSON documents (a bare
    // string breaks get_json_object; SQL/JSON's identity path applies
    // to the context item directly)
    def leafExpr(elem: String, c: Col): String = {
      val raw =
        if (c.path.get == "$") s"CAST($elem AS ${c.castType.get})"
        else s"CAST(get_json_object($elem, '${c.path.get}') AS ${c.castType.get})"
      val v = c.onMissing.fold(raw)(d => s"coalesce($raw, CAST($d AS ${c.castType.get}))")
      s"$v AS ${c.name}"
    }
    val colExprs = cols.map { c =>
      if (c.castType.isEmpty) s"CAST(__jt_p + 1 AS INT) AS ${c.name}"
      else leafExpr("__jt_e", c)
    }
    // each nesting level adds one LATERAL VIEW OUTER generate over the
    // PARENT level's element; level i's columns read __jt_ne{i} and its
    // FOR ORDINALITY is __jt_np{i} + 1 — NULL on the OUTER padding row
    // (CAST(NULL + 1) stays NULL)
    def levels(n: Option[Nested], acc: Seq[Nested] = Nil): Seq[Nested] =
      n match { case Some(x) => levels(x.child, acc :+ x); case None => acc }
    val chain = levels(nested)
    val nestedExprs = chain.zipWithIndex.flatMap { case (lvl, i) =>
      lvl.cols.map { c =>
        if (c.castType.isEmpty) s"CAST(__jt_np$i + 1 AS INT) AS ${c.name}"
        else leafExpr(s"__jt_ne$i", c)
      }
    }
    val inner =
      if (hasOrd)
        s"(SELECT posexplode(from_json($arrayExpr, 'array<string>')) AS (__jt_p, __jt_e))"
      else
        s"(SELECT explode(from_json($arrayExpr, 'array<string>')) AS __jt_e)"
    val body =
      if (nesteds.length >= 2) {
        // UNION plan over k sibling leaf blocks: per parent element,
        // one combined array of (sibling-id, in-sibling index, element)
        // structs — sibling s's columns are NULL on every other
        // sibling's rows, per-sibling FOR ORDINALITY is the in-sibling
        // index, and a parent whose EVERY sibling array is empty or
        // absent gets ONE padded row (coalesce keeps a missing array
        // from nulling the whole concat; posexplode_outer pads).
        val parts = nesteds.zipWithIndex.map { case (lvl, si) =>
          val p = lvl.path.stripSuffix("[*]")
          val a = if (p == "$") "__jt_e"
                  else s"get_json_object(__jt_e, '${p.stripSuffix(".")}')"
          s"transform(coalesce(from_json($a, 'array<string>'), array()), " +
            s"(__jt_x, __jt_i) -> struct($si AS __sib, __jt_i AS __sp, __jt_x AS __se))"
        }
        val sibExprs = nesteds.zipWithIndex.flatMap { case (lvl, si) =>
          lvl.cols.map { c =>
            val v =
              if (c.castType.isEmpty) s"CAST(__jt_ue.__sp + 1 AS INT)"
              else {
                val raw =
                  if (c.path.get == "$") s"CAST(__jt_ue.__se AS ${c.castType.get})"
                  else s"CAST(get_json_object(__jt_ue.__se, '${c.path.get}') AS ${c.castType.get})"
                // the ON EMPTY default applies within the sibling's own
                // rows; other siblings' rows stay NULL (the CASE gate)
                c.onMissing.fold(raw)(dd => s"coalesce($raw, CAST($dd AS ${c.castType.get}))")
              }
            s"CASE WHEN __jt_ue.__sib = $si THEN $v END AS ${c.name}"
          }
        }
        s"SELECT ${(colExprs ++ sibExprs).mkString(", ")} FROM $inner " +
          s"LATERAL VIEW OUTER posexplode_outer(concat(${parts.mkString(", ")})) " +
          "__jt_uv AS __jt_up, __jt_ue"
      } else {
        val views = chain.zipWithIndex.map { case (lvl, i) =>
          val parentElem = if (i == 0) "__jt_e" else s"__jt_ne${i - 1}"
          val nPrefix = lvl.path.stripSuffix("[*]")
          val nArr =
            if (nPrefix == "$") parentElem
            else s"get_json_object($parentElem, '${nPrefix.stripSuffix(".")}')"
          s"LATERAL VIEW OUTER posexplode_outer(from_json($nArr, 'array<string>')) " +
            s"__jt_nv$i AS __jt_np$i, __jt_ne$i"
        }
        s"SELECT ${(colExprs ++ nestedExprs).mkString(", ")} FROM $inner" +
          views.map(" " + _).mkString
      }
    val lateral = s"LATERAL ($body) $alias"

    // a lateral join needs a left relation: FROM-only JSON_TABLE has no
    // row to evaluate <expr> on; a preceding CROSS JOIN becomes a comma
    val before = sql.substring(0, kwStart)
    require(!before.trim.toUpperCase.endsWith("FROM"),
      "JSON_TABLE must follow a relation: FROM <rel>, JSON_TABLE(...) AS t " +
        "— a FROM-only source has no row to evaluate <expr> on")
    val crossRx = """(?is)^(.*?)\bCROSS\s+JOIN\s*$""".r
    val beforeKept = before match {
      case crossRx(keep) => keep + ", "
      case _ => before
    }
    beforeKept + lateral + sql.substring(afterAlias)
  }
}
